package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sim.{Ivf, Similarity}

/** IVF ANN quality gates: recall@k vs the brute-force oracle on the real
  * embeddings table (learned centroids ⇒ no value-golden check; recall is
  * the honest metric for an ANN index). */
class IvfSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ivf: cells partition the corpus; assignment is deterministic") {
    val emb = Tables.embeddings(spark, sf)
    val index = Ivf.fit(emb, nlist = 8, seed = 42L)
    assert(index.centroids.length == 8)
    val cells = emb.withColumn("c", Ivf.cell(col("embedding"), index))
    val counts = cells.groupBy("c").count().collect()
    assert(counts.map(_.getLong(1)).sum == emb.count())
    assert(counts.length > 1) // corpus actually spreads over cells
    // refit with same seed → identical assignment
    val index2 = Ivf.fit(emb, nlist = 8, seed = 42L)
    val cells2 = emb.withColumn("c", Ivf.cell(col("embedding"), index2))
    assert(cells.select("vec_id", "c").exceptAll(cells2.select("vec_id", "c")).count() == 0)
  }

  test("ivf fitLloyd: deterministic centroids on the 6-decimal grid; full-probe equals brute force") {
    val emb = Tables.embeddings(spark, sf).cache()
    val i1 = Ivf.fitLloyd(emb, nlist = 8, iters = 3)
    val i2 = Ivf.fitLloyd(emb, nlist = 8, iters = 3)
    assert(i1.centroids.map(_.toSeq).toSeq == i2.centroids.map(_.toSeq).toSeq,
      "refit produced different centroids")
    // every component sits on the 6-decimal quantization grid
    i1.centroids.flatten.foreach { x =>
      assert((BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble == x),
        s"centroid component $x off the 6-decimal grid")
    }
    // Lloyd iterations actually moved the centroids off the init picks
    val i0 = Ivf.fitLloyd(emb, nlist = 8, iters = 0)
    assert(i1.centroids.map(_.toSeq).toSeq != i0.centroids.map(_.toSeq).toSeq)

    val queries = emb.filter(col("vec_id") < 5)
    def topSet(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = topSet(Similarity.bruteForceTopK(emb, queries, 10))
    val full = topSet(Ivf.search(emb, queries, i1, k = 10, nprobe = 8, quantized = true))
    assert(full == brute)
    emb.unpersist()
  }

  test("ivf: full-probe search equals brute force; few-probe recall is high") {
    val emb = Tables.embeddings(spark, sf).cache()
    val queries = emb.filter(col("vec_id") < 5)
    val index = Ivf.fit(emb, nlist = 8, seed = 42L)

    def topSet(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val brute = topSet(Similarity.bruteForceTopK(emb, queries, 10))
    // probing ALL cells is exact: identical result set to brute force
    val full = topSet(Ivf.search(emb, queries, index, k = 10, nprobe = 8))
    assert(full == brute)
    // probing half the cells keeps recall high on clustered synthetic data
    val probed = topSet(Ivf.search(emb, queries, index, k = 10, nprobe = 4))
    val recall = (probed intersect brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall@10 with nprobe=4/8 was $recall")
  }
}
