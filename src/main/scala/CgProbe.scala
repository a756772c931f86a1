object CgProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // phase 1: fitLloyd alone
    val idx = graft.sim.Ivf.fitLloyd(emb, 8, 3)
    println("fitLloyd done")
    // phase 2: search alone
    val q = emb.filter(col("vec_id") < 5)
    graft.sim.Ivf.search(emb, q, idx, 10, 4, quantized = true).count()
    println("search done")
    spark.stop()
  }
}
