package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.core.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing over synthetic binary payloads (md5 digests of the
  * text column). The batched mapPartitions decode stub is oracle-checked:
  * the SQL recomputes the same header-byte metadata from the md5 hex. */
object MultimodalQueries {

  private def byteSql(i: Int) = s"('0x' || substring(md5(text), ${2 * i + 1}, 2))::BIGINT"

  val all: Seq[Q] = Seq(

    Q("multimodal_decode", {
      val sumBytes = (0 until 16).map(byteSql).mkString(" + ")
      s"""SELECT doc_id, CAST(16 AS INT) AS n_bytes,
         |  CAST(1 + ${byteSql(0)} % 64 AS INT) AS width,
         |  CAST(1 + ${byteSql(1)} % 64 AS INT) AS height,
         |  CAST(1 + ${byteSql(2)} % 3 AS INT) AS channels,
         |  ($sumBytes)::DOUBLE / 16 AS mean_byte
         |FROM documents""".stripMargin
    }) { (s, dir) =>
      Multimodal.decodeDocuments(s, Tables.documents(s, dir))
        .toDF()
        .select("doc_id", "n_bytes", "width", "height", "channels", "mean_byte")
    },

    Q.rowsOnly("multimodal_features") { (s, dir) =>
      // fixed-shape feature vectors + frame samples: binary-array plumbing
      val decoded = Multimodal.decodeDocuments(s, Tables.documents(s, dir)).toDF()
      val framed = Multimodal.withPayload(Tables.documents(s, dir))
        .select(col("doc_id"), Multimodal.frameSample(col("payload"), 4).as("frames"))
      decoded.join(framed, "doc_id")
        .select(col("doc_id"), col("features"), size(col("frames")).as("n_frames"))
    })
}
