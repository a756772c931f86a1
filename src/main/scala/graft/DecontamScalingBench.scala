package graft

import org.apache.spark.sql.SparkSession

/** Dedicated two-size probe for the adversarial decontamination job
  * (ScalingBench.decontamJob) at sizes where the measured window dwarfs
  * fixed per-job overhead: the default 150×-replicated benchmark carries
  * ~3.5×10⁷ distinct window hashes (~0.3 GB of longs — far past any
  * broadcast budget, forcing the documented shuffle-join fallback) against
  * a 60×-replicated corpus (~1.4×10⁷ windows). Same interleaved min-of-N
  * methodology and same JSON line shape as ScalingBench.
  *
  * Usage: runMain graft.DecontamScalingBench [sfDir] [nSmall] [rounds]
  *        [kBench] [kCorpus]
  */
object DecontamScalingBench {

  def runOnce(cores: Int, sfDir: String, kBench: Int, kCorpus: Int): (Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScalingBench.decontamJob(spark, "/root/testdata/sf0.001", 3, 2) // warmup
    val r = ScalingBench.decontamJob(spark, sfDir, kBench, kCorpus)
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nSmall = args.lift(1).map(_.toInt).getOrElse(8)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val kBench = args.lift(3).map(_.toInt).getOrElse(150)
    val kCorpus = args.lift(4).map(_.toInt).getOrElse(60)
    val nLarge = nSmall * 4
    val ceiling = ScalingBench.cpuCeiling(nSmall)
    var rows = 0L
    val results = (1 to rounds).map { r =>
      val (rs, ts) = runOnce(nSmall, sfDir, kBench, kCorpus)
      val (rl, tl) = runOnce(nLarge, sfDir, kBench, kCorpus)
      require(rs == rl, s"row counts differ: $rs/$rl")
      rows = rs
      System.err.println(f"round $r: decontam small=$ts%.1fs large=$tl%.1fs")
      (ts, tl)
    }
    ScalingBench.reportLine("decontam", sfDir, rows, nSmall, nLarge, ceiling,
      results.map(_._1), results.map(_._2),
      extraFields = s""","k_bench":$kBench,"k_corpus":$kCorpus""")
  }
}
