package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{SynActions, Tables, TokenCodec}
import graft.streaming.SessionEngine
import graft.vaep.{Features, GameStates, Labels}
import graft.xt.XThreat

/** Driver-run benchmark: times every registered query at the given SF and
  * prints ONE JSON line. Also reports the BASELINE.md headline — end-to-end
  * SPADL+VAEP/xT valuation throughput (action rows/sec) over the tokenized
  * ingest surface — and the core count, so scaling runs at different
  * parallelism are directly comparable. */
object Bench {

  /** The BASELINE metric job: tokens → decode → CEP normalize+label →
    * VAEP feature projection → xT fit → rate. Returns (rows, seconds). */
  def valuationPipeline(spark: SparkSession, sfDir: String): (Long, Double) =
    valuationPipelineOn(spark, SynActions.fromEvents(Tables.events(spark, sfDir)))

  /** The packed-storage variant of the headline job: identical chain, but
    * the one-hot groups materialize as bitmask longs
    * (Features.packedFeaturesPostGoalscore) — same information, ~1/9th the
    * columns. Reported alongside the headline (valuation_packed_*), NOT
    * replacing it: the headline keeps the reference's column-per-feature
    * output contract. */
  def valuationPipelinePacked(spark: SparkSession,
                              actions: org.apache.spark.sql.DataFrame): (Long, Double) = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    val decoded = TokenCodec.decode(TokenCodec.encode(actions))
      .withColumn("seq", col("action_id"))
    val valued = SessionEngine.runBatch(decoded)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = XThreat.fit(valued)
    val states = GameStates.withStates(Features.withGoalscore(valued), 3)
    val rated = states.select(
      Seq(col("game_id"), col("action_id"), col("scores"), col("concedes"),
        XThreat.rateColumn(model).as("xt_value")) ++
        Features.packedFeaturesPostGoalscore(3): _*)
    rated.write.mode("overwrite").format("noop").save()
    val rows = valued.count()
    valued.unpersist(blocking = false)
    (rows, (System.nanoTime() - t0) / 1e9)
  }

  def valuationPipelineOn(spark: SparkSession,
                          actions: org.apache.spark.sql.DataFrame): (Long, Double) = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    val decoded = TokenCodec.decode(TokenCodec.encode(actions))
      .withColumn("seq", col("action_id"))
    // The normalized+labeled stream fans out to the xT fit aggregates, the
    // feature projection, AND the rating pass — persist it once instead of
    // re-running the normalizer per consumer (at 100 TB: a checkpointed
    // intermediate table / reused shuffle output). Batch mode uses the
    // declarative window chain (≡ the stateful CEP scan, cross-checked by
    // the stream_cep_batch oracle) for Tungsten execution.
    val valued = SessionEngine.runBatch(decoded)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = XThreat.fit(valued)
    // goalscore windows over the NARROW frame, then states, then one
    // window-free wide projection on top (see Features.defaultFeatures note)
    val states = GameStates.withStates(Features.withGoalscore(valued), 3)
    // states carries the a0 coordinates, so the rating is a projection on
    // the same frame — no self-join.
    val rated = states.select(
      Seq(col("game_id"), col("action_id"), col("scores"), col("concedes"),
        XThreat.rateColumn(model).as("xt_value")) ++
        Features.defaultFeaturesPostGoalscore(3): _*)
    // a count() would let Catalyst prune the feature projection away —
    // force full evaluation through the no-op DSv2 sink, then count cheaply
    rated.write.mode("overwrite").format("noop").save()
    val rows = valued.count()
    valued.unpersist(blocking = false)
    (rows, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.maxFields", "1200")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table and JIT the hot paths once at small scale
    val warmDir = "/root/testdata/sf0.001"
    try {
      Seq("events", "documents", "embeddings", "lineitem", "orders")
        .foreach(t => Tables.read(spark, sfDir, t).count())
      valuationPipeline(spark, warmDir)
    } catch { case _: Throwable => () }

    // Interleaved min-of-N timing: the sandbox host is time-shared, and a
    // single pass can be skewed 10–30× by co-tenant bursts (the round-2
    // driver record was). Each ROUND runs every query once, per-query time
    // is the minimum across rounds — interleaving decorrelates bursts from
    // any one query, and the min approximates the uncontended time.
    val rounds = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_ROUNDS").flatMap(_.toIntOption).getOrElse(3))
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val best = scala.collection.mutable.Map[String, Double]()
    val failedSet = scala.collection.mutable.Set[String]()
    // the headline valuation pipelines join the same per-round interleave
    // so one sustained co-tenant burst cannot skew all their samples either
    var rows = 0L
    var prows = 0L
    val valSecs = Seq.newBuilder[Double]
    val packSecs = Seq.newBuilder[Double]
    for (_ <- 1 to rounds) {
      for ((name, fn) <- names) {
        val t0 = System.nanoTime()
        // noop sink: forces full column evaluation (count() would be pruned);
        // a query that throws reports -1 so a regression never reads as a speedup
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          val sec = (System.nanoTime() - t0) / 1e9
          best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
        } catch { case e: Throwable =>
          System.err.println(s"BENCH FAIL $name: $e"); failedSet += name
        }
      }
      val v = valuationPipeline(spark, sfDir)
      rows = v._1; valSecs += v._2
      val p = valuationPipelinePacked(spark,
        SynActions.fromEvents(Tables.events(spark, sfDir)))
      prows = p._1; packSecs += p._2
    }
    val results = names.map { case (name, _) =>
      (name, if (failedSet(name) || !best.contains(name)) -1.0 else best(name))
    }
    val pipeSec = valSecs.result().min
    val throughput = rows / pipeSec
    val ppipeSec = packSecs.result().min
    val pthroughput = prows / ppipeSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","rounds":$rounds,"queries":$qs,"failed":$failed,"sf":"$sfDir","cores":$cpus,"valuation_rows":$rows,"valuation_sec":$pipeSec,"valuation_rows_per_sec":$throughput,"valuation_packed_sec":$ppipeSec,"valuation_packed_rows_per_sec":$pthroughput}""")
    spark.stop()
  }
}
