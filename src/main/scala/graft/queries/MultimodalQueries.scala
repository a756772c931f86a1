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

    // Fixed-shape feature vectors + frame samples: binary-array plumbing.
    // The 8 feature lanes are projected to scalar columns (the gate can't
    // sort raw arrays); the oracle recomputes each lane from the md5 bytes
    // in FLOAT arithmetic matching the kernel's float32 math exactly.
    Q("multimodal_features", {
      val laneSql = (0 until Multimodal.FeatureDim).map { i =>
        val j = (i * 3 + 1) % 16
        s"CAST((${byteSql(i % 16)} + ${byteSql(j)}) AS FLOAT) / CAST(510 AS FLOAT) AS feature_$i"
      }.mkString(",\n  ")
      s"""SELECT doc_id,
         |  $laneSql,
         |  CAST(4 AS INT) AS n_frames
         |FROM documents""".stripMargin
    }) { (s, dir) =>
      val decoded = Multimodal.decodeDocuments(s, Tables.documents(s, dir)).toDF()
      val framed = Multimodal.withPayload(Tables.documents(s, dir))
        .select(col("doc_id"), Multimodal.frameSample(col("payload"), 4).as("frames"))
      val lanes = (0 until Multimodal.FeatureDim).map(i =>
        element_at(col("features"), i + 1).as(s"feature_$i"))
      decoded.join(framed, "doc_id")
        .select(Seq(col("doc_id")) ++ lanes ++ Seq(size(col("frames")).as("n_frames")): _*)
    })
}
