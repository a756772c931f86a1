package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the k-means
  * counterpart to the random-hyperplane LSH path in [[Similarity]].
  *
  * Index: k-means centroids (spark.ml, seeded) fitted on a deterministic
  * sample; every corpus vector is assigned to its nearest centroid cell —
  * a map-only argmax over the broadcast centroid array (no shuffle).
  * Search: each query probes its `nprobe` nearest cells (replicated by
  * explode), candidates come from the cell equi-join, exact cosine + top-k
  * inside the probed cells only.
  *
  * Scale math: with nlist cells and balanced assignment, per-query work is
  * nprobe·N/nlist exact cosines instead of N — at N = 10⁹ and nlist =
  * √N ≈ 32k, a 16-probe search touches ~0.05% of the corpus. The centroid
  * array is nlist×dim floats (32k×64 ≈ 8 MB) — comfortably broadcast. The
  * assignment expression reuses the codegen'd FoldDot kernel per centroid.
  *
  * Like every learned index, cell assignments depend on the fitted
  * centroids, so the driver query is rows-only; IvfSpec gates recall@k
  * against the brute-force oracle instead.
  */
object Ivf {

  final case class Index(dim: Int, centroids: Array[Array[Double]])

  /** Fit nlist centroids on (a sample of) the corpus (seeded k-means). */
  def fit(embeddings: DataFrame, nlist: Int, seed: Long = 42L,
          sampleFraction: Double = 1.0): Index = {
    val sample =
      if (sampleFraction >= 1.0) embeddings
      else embeddings.sample(withReplacement = false, sampleFraction, seed)
    val vecs = sample.select(
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features")
      .fit(vecs)
    Index(model.clusterCenters.head.size,
      model.clusterCenters.map(_.toArray))
  }

  /** Scores against every centroid: x·c − ‖c‖²/2 (argmax ≡ nearest by L2),
    * as one array column; FoldDot per centroid, all map-only. */
  private def cellScores(emb: Column, index: Index): Column =
    array(index.centroids.map { c =>
      graft.functions.TextExpressions.dot(emb, typedLit(c.toSeq)) -
        lit(c.map(x => x * x).sum / 2.0)
    }: _*)

  /** Nearest-centroid cell id (0-based; ties → lowest id). */
  def cell(emb: Column, index: Index): Column = {
    val scores = cellScores(emb, index)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** The query's `nprobe` best cells, as an array (for explode). */
  def probeCells(emb: Column, index: Index, nprobe: Int): Column = {
    val scores = cellScores(emb, index)
    slice(reverse(array_sort(zip_with(
      scores,
      typedLit(index.centroids.indices.map(_.toLong)),
      (s, i) => struct(s.as("score"), i.as("cell"))))), 1, nprobe)
  }

  /** ANN top-k: corpus partitioned by cell once, queries replicated to
    * their nprobe cells, exact cosine within probed cells. */
  def search(embeddings: DataFrame, queries: DataFrame, index: Index,
             k: Int, nprobe: Int): DataFrame = {
    val corpus = embeddings
      .withColumn("ivf_cell", cell(col("embedding"), index))
    val probed = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .withColumn("probe", explode(probeCells(col("q_emb"), index, nprobe)))
      .select(col("query_id"), col("q_emb"), col("probe.cell").cast("int").as("ivf_cell"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    corpus.join(broadcast(probed), Seq("ivf_cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Similarity.cosine(col("q_emb"), col("embedding")).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }
}
