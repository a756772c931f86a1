package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.core.Tables
import graft.dedup.Dedup

/** Deduplication operators over the `documents` table. To exercise
  * non-trivial duplicate structure at every scale factor, the corpus is
  * deterministically augmented (identically in Spark and the oracle):
  * exact copies for doc_id % 7 = 0 (+2e6) and last-word-truncated
  * near-copies for doc_id % 10 = 0 (+1e6). */
object DedupQueries {

  private val toksSql = """string_split_regex(trim(text), '\s+')"""

  /** Augmented corpus CTE (DuckDB); carries `source` for the token-pipeline
    * queries that share this corpus (TokenQueries). */
  private[queries] val augCte =
    s"""WITH aug AS (
       |  SELECT doc_id, text, source FROM documents
       |  UNION ALL
       |  SELECT doc_id + 2000000, text, source FROM documents WHERE doc_id % 7 = 0
       |  UNION ALL
       |  SELECT doc_id + 1000000,
       |    array_to_string(($toksSql)[1:len($toksSql) - 1], ' '), source
       |  FROM documents WHERE doc_id % 10 = 0
       |)""".stripMargin

  /** Same augmentation in Spark. */
  def augmented(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text", "source")
    val toks = split(trim(col("text")), "\\s+")
    val exact = d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000).as("doc_id"), col("text"), col("source"))
    val near = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat_ws(" ", slice(toks, lit(1), size(toks) - 1)).as("text"), col("source"))
    d.unionByName(exact).unionByName(near)
  }

  private val shinglesSql =
    s"list_distinct(list_transform(generate_series(1, greatest(len($toksSql) - 2, 1)), " +
      s"i -> array_to_string(($toksSql)[i:i+2], ' ')))"

  private def minhashSql(j: Int): String = {
    val a = Dedup.minhashA(j)
    val b = Dedup.minhashB(j)
    s"list_min(list_transform(sh, s -> ($a * (('0x' || substring(md5(s), 1, 15))::BIGINT % 1000000007) + $b) % 1000000007))"
  }

  private def tokHash32Sql = "('0x' || substring(md5(t), 1, 8))::BIGINT"

  private def simhashSql: String = {
    val terms = (0 until Dedup.SimhashBits).map { b =>
      s"""(CASE WHEN list_sum(list_transform($toksSql,
         |    t -> CASE WHEN ($tokHash32Sql >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |  THEN ${1L << b} ELSE 0 END)""".stripMargin
    }
    terms.mkString(" + ")
  }

  val all: Seq[Q] = Seq(

    Q("dedup_exact",
      s"""$augCte, h AS (
         |  SELECT doc_id, md5(text) AS content_hash FROM aug
         |), g AS (
         |  SELECT content_hash, count(*) AS group_size, min(doc_id) AS canonical_id
         |  FROM h GROUP BY content_hash HAVING count(*) > 1
         |)
         |SELECT h.doc_id, g.canonical_id, g.group_size
         |FROM h JOIN g ON h.content_hash = g.content_hash
         |WHERE h.doc_id <> g.canonical_id""".stripMargin) { (s, dir) =>
      // md5 grouping (the 60-bit reduction in Dedup.exactDuplicates is
      // equivalent here; use full md5 for oracle parity) — same
      // spillable-window shape as the operator: no per-hash list row,
      // bounded memory at any duplication factor
      import org.apache.spark.sql.expressions.Window
      val hashed = augmented(s, dir).select(col("doc_id"), md5(col("text")).as("content_hash"))
      val wHash = Window.partitionBy("content_hash")
      hashed
        .withColumn("group_size", count(lit(1)).over(wHash))
        .withColumn("canonical_id", min("doc_id").over(wHash))
        .filter(col("group_size") > 1 && col("doc_id") =!= col("canonical_id"))
        .select("doc_id", "canonical_id", "group_size")
    },

    // The df-cap (HAVING ≤ DefaultDfCap) mirrors Dedup.jaccardPairs — hot
    // boilerplate shingles are excluded from pair generation on BOTH sides.
    Q("dedup_ngram_jaccard",
      s"""$augCte, sh AS (
         |  SELECT doc_id, unnest($shinglesSql) AS shingle FROM aug
         |), sizes AS (
         |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
         |), keep AS (
         |  SELECT shingle FROM sh GROUP BY shingle
         |  HAVING count(*) >= 2 AND count(*) <= ${Dedup.DefaultDfCap}
         |), inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  WHERE a.shingle IN (SELECT shingle FROM keep)
         |  GROUP BY 1, 2
         |)
         |SELECT doc_a, doc_b, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
         |  n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
         |FROM inter
         |JOIN sizes sa ON inter.doc_a = sa.doc_id
         |JOIN sizes sb ON inter.doc_b = sb.doc_id
         |WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= 0.5""".stripMargin) { (s, dir) =>
      Dedup.jaccardPairs(augmented(s, dir), n = 3, threshold = 0.5)
    },

    Q("dedup_minhash_lsh", {
      val bands = (0 until Dedup.NumMinhash / Dedup.BandSize).map { band =>
        val key = (band * Dedup.BandSize until (band + 1) * Dedup.BandSize)
          .map(j => s"${minhashSql(j)}::VARCHAR").mkString(", ")
        s"SELECT doc_id, text, $band AS band_id, concat_ws('_', $key) AS band_key FROM shd"
      }.mkString("\nUNION ALL\n")
      s"""$augCte, shd AS (
         |  SELECT doc_id, text, $shinglesSql AS sh FROM aug
         |), banded AS (
         |$bands
         |), keep AS (
         |  SELECT band_id, band_key FROM banded GROUP BY 1, 2
         |  HAVING count(*) BETWEEN 2 AND ${Dedup.DefaultBucketCap}
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.text AS text_a, b.text AS text_b
         |  FROM banded a
         |  JOIN keep k ON a.band_id = k.band_id AND a.band_key = k.band_key
         |  JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
         |    AND a.doc_id < b.doc_id
         |), verified AS (
         |  SELECT doc_a, doc_b,
         |    len(list_intersect(${shinglesSql.replace("text", "text_a")},
         |                       ${shinglesSql.replace("text", "text_b")}))::DOUBLE /
         |    (len(${shinglesSql.replace("text", "text_a")}) + len(${shinglesSql.replace("text", "text_b")})
         |     - len(list_intersect(${shinglesSql.replace("text", "text_a")},
         |                          ${shinglesSql.replace("text", "text_b")}))) AS jaccard
         |  FROM cand
         |)
         |SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= 0.5""".stripMargin
    }) { (s, dir) =>
      Dedup.minhashLshPairs(augmented(s, dir), n = 3, threshold = 0.5)
    },

    Q("dedup_simhash_values",
      s"""$augCte
         |SELECT doc_id, $simhashSql AS simhash FROM aug""".stripMargin) { (s, dir) =>
      Dedup.simhashValues(augmented(s, dir))
    },

    Q("dedup_simhash_pairs",
      s"""$augCte, sv AS (
         |  SELECT doc_id, $simhashSql AS simhash FROM aug
         |), banded AS (
         |  SELECT doc_id, simhash, b.band_id, (simhash >> (b.band_id * 8)) & 255 AS band_key
         |  FROM sv, (SELECT unnest([0, 1, 2, 3]) AS band_id) b
         |), keep AS (
         |  -- skew-relative occupancy cap, same formula as Dedup.simhashCapFor
         |  SELECT band_id, band_key FROM banded GROUP BY 1, 2
         |  HAVING count(*) BETWEEN 2 AND
         |    greatest(${Dedup.DefaultBucketCap},
         |      16 * CAST(ceil((SELECT count(*) FROM aug) / 256.0) AS BIGINT))
         |)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  bit_count(xor(a.simhash, b.simhash)) AS hamming
         |FROM banded a
         |JOIN keep k ON a.band_id = k.band_id AND a.band_key = k.band_key
         |JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
         |  AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin) { (s, dir) =>
      // default bucketCap = the lazily-derived in-plan corpus cap
      Dedup.simhashPairs(augmented(s, dir), maxHamming = 3)
    },

    // Duplicate clustering: pairwise evidence (exact star-edges to the
    // canonical doc — linear in group size, never the O(g²) clique — plus
    // Jaccard≥0.5 near-dup pairs) → connected components → per-doc cluster
    // id + size. Oracle computes the same components with a recursive CTE
    // (min reachable id over the symmetric edge set).
    Q("dedup_clusters",
      s"""${augCte.replace("WITH aug", "WITH RECURSIVE aug")}, h AS (
         |  SELECT doc_id, md5(text) AS content_hash FROM aug
         |), g AS (
         |  SELECT content_hash, min(doc_id) AS canonical_id
         |  FROM h GROUP BY content_hash HAVING count(*) > 1
         |), exact_e AS (
         |  SELECT h.doc_id AS doc_a, g.canonical_id AS doc_b
         |  FROM h JOIN g USING (content_hash) WHERE h.doc_id <> g.canonical_id
         |), sh AS (
         |  SELECT doc_id, unnest($shinglesSql) AS shingle FROM aug
         |), sizes AS (
         |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
         |), keep AS (
         |  SELECT shingle FROM sh GROUP BY shingle
         |  HAVING count(*) >= 2 AND count(*) <= ${Dedup.DefaultDfCap}
         |), inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  WHERE a.shingle IN (SELECT shingle FROM keep)
         |  GROUP BY 1, 2
         |), jac_e AS (
         |  SELECT doc_a, doc_b FROM inter
         |  JOIN sizes sa ON inter.doc_a = sa.doc_id
         |  JOIN sizes sb ON inter.doc_b = sb.doc_id
         |  WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
         |), edges AS (
         |  SELECT doc_a, doc_b FROM exact_e UNION SELECT doc_a, doc_b FROM jac_e
         |), sym AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM edges
         |  UNION SELECT doc_b, doc_a FROM edges
         |), reach(id, r) AS (
         |  SELECT src, src FROM sym
         |  UNION SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.id
         |), comp AS (
         |  SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
         |), csize AS (
         |  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id
         |)
         |SELECT comp.id AS doc_id, comp.cluster_id, csize.cluster_size
         |FROM comp JOIN csize USING (cluster_id)""".stripMargin) { (s, dir) =>
      val aug = augmented(s, dir)
      val exactEdges = Dedup.exactDuplicates(aug)
        .select(col("doc_id").as("doc_a"), col("canonical_id").as("doc_b"))
      val jacEdges = Dedup.jaccardPairs(aug, n = 3, threshold = 0.5)
        .select("doc_a", "doc_b")
      Dedup.duplicateClusters(exactEdges.union(jacEdges).distinct())
    })
}
