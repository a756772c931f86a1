package graft

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (BASELINE.json north rule): runs the
  * valuation pipeline at local[N] and local[4N] on the same input and
  * reports throughput at both plus the scaling efficiency
  * eff = (thr₄ₙ / thrₙ) / 4 — the achieved fraction of the ideal 4×
  * speedup; the north rule asks ≥ 0.8.
  *
  * The sandbox host is time-shared, so single measurements can be skewed
  * ~10× by steal time; runs at the two sizes are INTERLEAVED and each size
  * takes its minimum (≈ uncontended) time. A raw CPU spin calibration is
  * reported alongside: it bounds what any software can achieve on this box
  * when quadrupling threads.
  *
  * Usage: runMain graft.ScalingBench [sfDir] [nSmall] [rounds] [k]
  *        [kCorpus] [kBenchDecontam] [kCorpusDecontam]
  * (kCorpus defaults to k·15; the decontam pair defaults to 45/20 —
  * overhead-dominated next to the dedicated DecontamScalingBench probe,
  * whose 150/60 sizing is the recorded §2c number.)
  */
object ScalingBench {

  /** Deterministically replicate the events table `k`× (new event ids and
    * players per replica) and widen the game-id space with it, so the
    * measured job has enough independent per-game work (k·25 games) to
    * expose real scaling rather than fixed driver overheads. Both cluster
    * sizes get the identical input. */
  def replicatedActions(spark: SparkSession, sfDir: String, k: Int) = {
    import org.apache.spark.sql.functions._
    import graft.core.{SynActions, Tables}
    // the source parquet is one small file = ONE scan task; spread the rows
    // before the k× explode so row synthesis parallelizes
    val events = Tables.events(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism * 2)
    val rep = events
      .select(explode(sequence(lit(0L), lit(k - 1L))).as("r"), col("*"))
      .select(
        (col("event_id") * k + col("r")).as("event_id"),
        col("ts"),
        (col("user_id") + col("r") * 16).as("user_id"))
    SynActions.fromEvents(rep, numGames = SynActions.NumGames * k)
  }

  /** Compute-bound corpus job: MinHash signatures + SimHash values +
    * fingerprints over a k×-replicated documents table (texts perturbed per
    * replica so hashes differ). Pure hash compute + one aggregation shuffle
    * per operator — the scale-out shape of corpus dedup at 100 TB, and a
    * memory-light counterpoint to the (bandwidth-bound) wide feature job. */
  def corpusJob(spark: SparkSession, sfDir: String, k: Int): (Long, Double) = {
    import org.apache.spark.sql.functions._
    import graft.core.Tables
    import graft.dedup.Dedup
    import graft.text.TextOps
    val t0 = System.nanoTime()
    val docs = Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .select(explode(sequence(lit(0L), lit(k - 1L))).as("r"), col("doc_id"), col("text"))
      .select((col("doc_id") * k + col("r")).as("doc_id"),
        concat(col("text"), lit(" v"), col("r")).as("text"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    noop(Dedup.minhashSignatures(docs))
    noop(Dedup.simhashValues(docs))
    noop(docs.select(col("doc_id"), TextOps.polyHash(col("text")).as("ph"),
      TextOps.fingerprint(col("text")).as("fp")))
    val rows = docs.count()
    (rows, (System.nanoTime() - t0) / 1e9)
  }

  /** Adversarial sequence-packing job: concat-and-chunk over a k×-replicated
    * token table collapsed to ONE source — the case the two-phase prefix-sum
    * offsets exist for. Before round 4 the offset pass was a
    * `Window.partitionBy(source)` running sum, i.e. ONE task for the whole
    * corpus here regardless of core count (scaling ≈ 1×); with the
    * range-partitioned local-prefix + broadcast-base form the work spreads
    * across range partitions and scales with cores. */
  def packJob(spark: SparkSession, sfDir: String, k: Int): (Long, Double) = {
    import org.apache.spark.sql.functions._
    import graft.core.Tables
    import graft.text.TokenPipeline
    val t0 = System.nanoTime()
    val docs = Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .select(explode(sequence(lit(0L), lit(k - 1L))).as("r"), col("doc_id"), col("text"))
      .select(format_string("d%04d%06d", col("r"), col("doc_id")).as("doc_id"),
        concat(col("text"), lit(" v"), col("r")).as("text"),
        // one source, but DATA-derived (non-foldable) like a real corpus
        // column — a literal would let Catalyst fold `source` out of the
        // window partition specs and change the measured plan shape
        format_string("s%d", col("doc_id") % 1).as("source"))
    val tokens = TokenPipeline.fromDocuments(docs)
    TokenPipeline.packChunks(tokens, chunkSize = 128)
      .write.mode("overwrite").format("noop").save()
    val rows = docs.count()
    (rows, (System.nanoTime() - t0) / 1e9)
  }

  /** Adversarial decontamination job: the benchmark side is sized PAST the
    * broadcast budget (kBench × ~236k ≈ 10⁷ distinct window hashes ≈ 80 MB
    * at sf0.1, vs the 10 MB autoBroadcast threshold), so stats degrade the
    * hash-set join to a shuffle join — the documented fallback regime for
    * giant eval suites. Bench replicas shift every token by a
    * replica-dependent offset (every window distinct); 1% of corpus docs
    * get an unshifted benchmark copy, so real hits flow through the
    * per-doc aggregate without the degenerate all-windows-hit case. */
  def decontamJob(spark: SparkSession, sfDir: String, kBench: Int, kCorpus: Int)
      : (Long, Double) = {
    // sequence(1, 0) DESCENDS in Spark — a non-positive k would silently
    // include an unshifted r=0 bench replica (the degenerate
    // all-windows-hit case) instead of disabling the lane
    require(kBench >= 1 && kCorpus >= 1,
      s"decontamJob needs kBench/kCorpus >= 1, got $kBench/$kCorpus")
    import org.apache.spark.sql.functions._
    import graft.core.Tables
    import graft.text.TokenPipeline
    val P = 1000000007L
    val t0 = System.nanoTime()
    val base = TokenPipeline.fromDocuments(
      Tables.documents(spark, sfDir).repartition(spark.sparkContext.defaultParallelism * 2))
    val shiftedBench = base
      .select(explode(sequence(lit(1L), lit(kBench.toLong))).as("r"), col("*"))
      .select(format_string("b%03d%s", col("r"), col("doc_id")).as("doc_id"),
        transform(col("tokens"), t => ((t + col("r") * 1000003L) % P).cast("int")).as("tokens"),
        col("n_tok"), col("source"))
    val bench = shiftedBench.unionByName(
      base.filter(col("doc_id").cast("long") % 100 === 0)
        .select(concat(lit("b_raw"), col("doc_id")).as("doc_id"),
          col("tokens"), col("n_tok"), col("source")))
    val corpus = base
      .select(explode(sequence(lit(0L), lit(kCorpus - 1L))).as("r"), col("*"))
      .select(format_string("c%03d%s", col("r"), col("doc_id")).as("doc_id"),
        col("tokens"), col("n_tok"), col("source"))
    // probe the past-broadcast regime with the shuffled-hash join lever on
    // (§3.1/§3.2): the bench set at the probe's default 150× replication
    // (~3.5e7 hashes) is far past any broadcast budget, and the round-5
    // measured gap was exactly the two corpus-sized sorts the SMJ fallback
    // pays — SHJ shuffles the same bytes but sorts neither side. (A Bloom
    // prefilter was tried first and REJECTED for this regime: a
    // 10-bit/item filter over 3.5e7 hashes is a ~45 MB literal serialized
    // into every task binary — 32 concurrent tasks OOM'd a 4 GB heap.)
    TokenPipeline.contaminatedDocs(corpus, bench, w = 8, shuffleHashJoin = true)
      .write.mode("overwrite").format("noop").save()
    val rows = corpus.count()
    (rows, (System.nanoTime() - t0) / 1e9)
  }

  /** One timed run of both jobs in a fresh local[cores] session:
    * (valuation rows, valuation sec, corpus rows, corpus sec). kCorpus is
    * sized independently: the codegen'd kernels made the corpus job ~10×
    * faster than round 1, so it needs ~10× more rows for the measured
    * window to dwarf fixed per-job overheads. */
  def runOnce(cores: Int, sfDir: String, k: Int, kCorpus: Int,
              kBenchDecontam: Int, kCorpusDecontam: Int)
      : (Long, Double, Long, Double, Double, Long, Double, Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.codegen.maxFields", "1200")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.valuationPipeline(spark, "/root/testdata/sf0.001") // JIT/codegen warmup
    corpusJob(spark, "/root/testdata/sf0.001", 2)
    packJob(spark, "/root/testdata/sf0.001", 2)
    val actions = replicatedActions(spark, sfDir, k)
    val out = Bench.valuationPipelineOn(spark, actions)
    val packed = Bench.valuationPipelinePacked(spark, actions)
    val corpus = corpusJob(spark, sfDir, kCorpus)
    val pack = packJob(spark, sfDir, kCorpus)
    val deco = decontamJob(spark, sfDir, kBenchDecontam, kCorpusDecontam)
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    (out._1, out._2, corpus._1, corpus._2, packed._2, pack._1, pack._2, deco._1, deco._2)
  }

  /** The one shared two-size report line (min-of-rounds throughput at each
    * size + efficiency vs ideal and vs the same-session spin ceiling) —
    * every scaling probe, including [[DecontamScalingBench]], must emit
    * through here so the published methodology can never diverge. */
  def reportLine(name: String, sfDir: String, n: Long, nSmall: Int, nLarge: Int,
      ceiling: Double, small: Seq[Double], large: Seq[Double],
      extraFields: String = ""): Unit = {
    val secS = small.min
    val secL = large.min
    val thrS = n / secS
    val thrL = n / secL
    println(
      s"""{"metric":"scaling_$name","sf":"$sfDir","rows":$n$extraFields,"cores_small":$nSmall,"sec_small":$secS,"rows_per_sec_small":$thrS,"cores_large":$nLarge,"sec_large":$secL,"rows_per_sec_large":$thrL,"speedup":${thrL / thrS},"scaling_efficiency":${(thrL / thrS) / 4.0},"cpu_spin_ceiling_speedup":$ceiling,"efficiency_vs_ceiling":${(thrL / thrS) / ceiling},"times_small":[${small.mkString(",")}],"times_large":[${large.mkString(",")}]}""")
  }

  /** Raw CPU scaling ceiling: spin-loop throughput ratio at 4N vs N threads. */
  def cpuCeiling(n: Int): Double = {
    def spin(threads: Int): Double = {
      val counts = new java.util.concurrent.atomic.AtomicLongArray(threads)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val ts = (0 until threads).map { i =>
        new Thread(() => {
          var x = 0L
          while (!stop.get()) { x += 1; if ((x & 0xFFFFF) == 0) counts.set(i, x) }
          counts.set(i, x)
        })
      }
      ts.foreach(_.start())
      Thread.sleep(3000)
      stop.set(true)
      ts.foreach(_.join())
      (0 until threads).map(counts.get).sum.toDouble / 3.0
    }
    val small = spin(n)
    val large = spin(n * 4)
    large / small
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val nSmall = args.lift(1).map(_.toInt).getOrElse(8)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val k = args.lift(3).map(_.toInt).getOrElse(20)
    val kCorpus = args.lift(4).map(_.toInt).getOrElse(k * 15)
    val nLarge = nSmall * 4

    val ceiling = cpuCeiling(nSmall)

    val kBenchDecontam = args.lift(5).map(_.toInt).getOrElse(45)
    val kCorpusDecontam = args.lift(6).map(_.toInt).getOrElse(20)

    var rows = 0L
    var corpusRows = 0L
    var packRows = 0L
    var decoRows = 0L
    val results = (1 to rounds).map { r =>
      val (rs, ts, cs, tcs, tps, ps, tpk, ds, tds) =
        runOnce(nSmall, sfDir, k, kCorpus, kBenchDecontam, kCorpusDecontam)
      val (rl, tl, cl, tcl, tpl, pl, tpkl, dl, tdl) =
        runOnce(nLarge, sfDir, k, kCorpus, kBenchDecontam, kCorpusDecontam)
      require(rs == rl && cs == cl && ps == pl && ds == dl,
        s"row counts differ: $rs/$rl $cs/$cl $ps/$pl $ds/$dl")
      rows = rs
      corpusRows = cs
      packRows = ps
      decoRows = ds
      System.err.println(
        f"round $r: valuation small=$ts%.1fs large=$tl%.1fs | packed small=$tps%.1fs large=$tpl%.1fs | corpus small=$tcs%.1fs large=$tcl%.1fs | pack1src small=$tpk%.1fs large=$tpkl%.1fs | decontam small=$tds%.1fs large=$tdl%.1fs")
      (ts, tl, tcs, tcl, tps, tpl, tpk, tpkl, tds, tdl)
    }

    def report(name: String, n: Long, small: Seq[Double], large: Seq[Double]): Unit =
      reportLine(name, sfDir, n, nSmall, nLarge, ceiling, small, large)
    report("valuation", rows, results.map(_._1), results.map(_._2))
    report("valuation_packed", rows, results.map(_._5), results.map(_._6))
    report("corpus", corpusRows, results.map(_._3), results.map(_._4))
    report("pack_1source", packRows, results.map(_._7), results.map(_._8))
    report("decontam", decoRows, results.map(_._9), results.map(_._10))
  }
}
