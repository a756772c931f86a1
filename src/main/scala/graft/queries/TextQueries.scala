package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.core.Tables
import graft.text.TextOps

/** Text-analysis operators over the `documents` table, each mirrored by a
  * term-identical DuckDB oracle (left-fold hashes, split semantics, and
  * double literals all aligned). */
object TextQueries {

  // DuckDB fragments mirroring TextOps
  private val toksSql = """string_split_regex(trim(text), '\s+')"""
  private def wordCountSql(w: String) =
    s"len(list_filter($toksSql, t -> t = '$w'))"
  private def polyHashSql(g: String) =
    s"""CASE WHEN length($g) = 0 THEN 0
       | ELSE list_reduce(list_transform(generate_series(1, length($g)), i -> ascii(substring($g, i, 1))),
       |                  (x, y) -> (x::BIGINT * 31 + y) % 1000000007) END""".stripMargin

  val all: Seq[Q] = Seq(

    Q("text_stats",
      s"""SELECT doc_id,
         |  len($toksSql) AS n_tokens,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
         |  len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
         |  (CASE WHEN (length(text)::DOUBLE - (len($toksSql)::DOUBLE - 1)) / len($toksSql)::DOUBLE >= 3.0
         |          AND (length(text)::DOUBLE - (len($toksSql)::DOUBLE - 1)) / len($toksSql)::DOUBLE <= 10.0
         |        THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END)
         |  + (CASE WHEN ${wordCountSql("the")} + ${wordCountSql("a")} > 0 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
         |  + (CASE WHEN len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE / length(text)::DOUBLE < 0.1
         |        THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END) AS quality
         |FROM documents""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        TextOps.punctCount(col("text")).as("n_punct"),
        TextOps.qualityScore(col("text")).as("quality"))
    },

    Q("text_langid", {
      val scores = TextOps.LangMarkers.map { case (lang, ws) =>
        lang -> ws.map(wordCountSql).mkString(" + ")
      }
      val scoreCols = scores.map { case (l, e) => s"$e AS score_$l" }.mkString(",\n  ")
      val m = s"greatest(${scores.map("score_" + _._1).mkString(", ")})"
      val caseArm = scores.map { case (l, _) => s"WHEN score_$l = $m THEN '$l'" }.mkString(" ")
      s"""WITH s AS (
         |  SELECT doc_id, lang AS lang_true, $scoreCols
         |  FROM documents
         |)
         |SELECT doc_id, lang_true, score_en, score_es, score_fr, score_de, score_zh,
         |  CASE $caseArm ELSE 'und' END AS lang_pred
         |FROM s""".stripMargin
    }) { (s, dir) =>
      val d = Tables.documents(s, dir)
      val scoreCols = TextOps.langScores(col("text")).map { case (l, c) => c.as(s"score_$l") }
      d.select(Seq(col("doc_id"), col("lang").as("lang_true")) ++ scoreCols
        :+ TextOps.langId(col("text")).as("lang_pred"): _*)
    },

    Q("text_fingerprint",
      s"""SELECT doc_id,
         |  ${polyHashSql("text")} AS poly_hash,
         |  list_min(list_transform(
         |    list_transform(generate_series(1, greatest(len($toksSql) - 7, 1)),
         |                   i -> array_to_string(($toksSql)[i:i+7], ' ')),
         |    g -> ${polyHashSql("g")})) AS fingerprint
         |FROM documents""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.polyHash(col("text")).as("poly_hash"),
        TextOps.fingerprint(col("text")).as("fingerprint"))
    })
}
