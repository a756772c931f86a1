package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exactness baseline; the scale path is
  * random-hyperplane LSH bucketing (candidates from an equi-join on bucket
  * signature instead of a cross join). All arithmetic is a left-fold over
  * the vector lanes with float→double widening, so Spark and the SQL oracle
  * produce bit-identical doubles.
  */
object Similarity {

  val Dim = 64

  /** Left-fold dot product with double accumulation (deterministic order).
    * Codegen'd kernel; bit-identical to [[dotHof]] (KernelsSpec asserts). */
  def dot(a: Column, b: Column): Column = graft.functions.TextExpressions.dot(a, b)

  /** Round-1 HOF formulation — parity baseline only (interpreted lambdas). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine scores of every query vector against the corpus.
    * The query side is tiny — broadcast it so the corpus never shuffles. */
  def bruteForceScores(embeddings: DataFrame, queries: DataFrame): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    embeddings.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("cosine"))
  }

  /** Exact top-k per query by (cosine desc, vec_id) — rank over the
    * broadcast-joined scores. */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    bruteForceScores(embeddings, queries)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  val NumPlanes = 8

  /** Plane count sized to the corpus: with p planes the signature space has
    * 2^p buckets, so expected occupancy ≈ n / 2^p. Target occupancy T keeps
    * in-bucket pair work (occupancy²/2 per bucket) bounded as n grows:
    * p = ⌈log₂(n / T)⌉, floored at NumPlanes. At n = 10⁹ and T = 4096 this
    * gives 18 planes (~256k buckets, ~4k vectors each) where the fixed
    * 8-plane default would pack ~4M vectors per bucket and explode
    * quadratically — the round-1 scale flaw this knob fixes. Recall lost to
    * finer bucketing is recovered the standard way: multi-probe (flip the
    * lowest-|projection| bits) or banded signatures, both composable with
    * `lshBucket(emb, planes)`. */
  def planesFor(corpusSize: Long, targetOccupancy: Long = 4096,
                minPlanes: Int = NumPlanes): Int =
    // smallest p with corpusSize ≤ targetOccupancy · 2^p, floored at
    // minPlanes. Pure integer math (no float log2) so a SQL oracle computing
    // the same count from the same row count is exact at power-of-two
    // boundaries too.
    (minPlanes to 62).find(p => corpusSize <= (targetOccupancy << p) || (targetOccupancy << p) < 0)
      .getOrElse(62)

  /** Pair-generation occupancy target: exact-cosine verification work per
    * bucket is occupancy²/2, so the near-dup/ANN query paths size buckets to
    * ~[[PairGenOccupancy]] vectors with a low floor (tiny corpora want FEW
    * planes — more collisions, richer candidates — not the production
    * 8-plane default). At n = 10⁹ this yields 24 planes (~16M buckets of
    * ~64); at test SFs it yields 4–6, exercising the non-default path. */
  val PairGenOccupancy = 64L
  val PairGenMinPlanes = 4

  /** Deterministic pseudo-random hyperplane component: lane i of plane p. */
  def planeComponent(p: Int, i: Int): Double = (((p * 73 + i * 179) % 97) - 48).toDouble

  /** Sign bit of the projection onto plane p (left-fold, deterministic). */
  def planeBit(emb: Column, p: Int): Column = {
    val proj = dot(emb, typedLit((0 until Dim).map(i => planeComponent(p, i))))
    when(proj > 0, lit(1L << p)).otherwise(0L)
  }

  /** Random-hyperplane LSH bucket signature (`planes` bits; size with
    * [[planesFor]] at scale). */
  def lshBucket(emb: Column, planes: Int = NumPlanes): Column =
    (0 until planes).map(p => planeBit(emb, p)).reduce(_ + _)

  /** IVF/LSH-style ANN: candidates share the bucket signature with the
    * query; exact cosine + top-k inside the bucket only. At corpus scale the
    * bucket join replaces the O(N·Q) scan with O(occupancy·Q). */
  def lshTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
              planes: Int = NumPlanes): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings.withColumn("bucket", lshBucket(col("embedding"), planes))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .withColumn("bucket", lshBucket(col("q_emb"), planes))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }
}
