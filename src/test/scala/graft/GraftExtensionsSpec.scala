package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** SparkSessionExtensions registration (functions/GraftExtensions.scala):
  * the kernels evaluate from PURE SQL with values identical to the Column
  * surface. Builds a second SparkSession over the shared context with the
  * extensions installed (the shared test session predates them). */
class GraftExtensionsSpec extends SparkSpec {

  private def withExtSession[A](f: SparkSession => A): A = {
    val base = spark // force shared-session init before touching defaults
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate() // reuses the existing SparkContext, new session state
      f(s)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("SQL surface evaluates all five kernels, value-identical to the Column API") {
    withExtSession { s =>
      import s.implicits._
      val df = Seq(
        ("the quick brown fox jumps over the lazy dog", Seq(5, 7, 9, 11), Array(1.0f, 2.0f)),
        ("unicode café straße 中文", Seq(1000000006, 0, 42), Array(0.5f, -1.5f))
      ).toDF("text", "tokens", "vec")
      df.createOrReplaceTempView("probe")
      val viaSql = s.sql(
        """SELECT graft_poly_hash(text) AS ph,
          |  graft_fingerprint(text) AS fp8,
          |  graft_fingerprint(text, 3) AS fp3,
          |  graft_shingles(text, 2) AS sh,
          |  graft_token_window_hashes(tokens, 2) AS twh,
          |  graft_dot(vec, vec) AS dd
          |FROM probe""".stripMargin).collect()
      val viaCols = df.select(
        TextExpressions.polyHash(col("text")).as("ph"),
        TextExpressions.fingerprint(col("text")).as("fp8"),
        TextExpressions.fingerprint(col("text"), 3).as("fp3"),
        TextExpressions.shingles(col("text"), 2).as("sh"),
        TextExpressions.tokenWindowHashes(col("tokens"), 2).as("twh"),
        TextExpressions.dot(col("vec"), col("vec")).as("dd")).collect()
      viaSql.zip(viaCols).foreach { case (a, b) => assert(a == b) }
    }
  }

  test("non-literal size arguments are rejected with a clear message") {
    withExtSession { s =>
      import s.implicits._
      Seq(("a b c", 2)).toDF("text", "n").createOrReplaceTempView("probe2")
      val e = intercept[Exception] {
        s.sql("SELECT graft_shingles(text, n) FROM probe2").collect()
      }
      assert(e.getMessage.contains("integer literal") ||
        Option(e.getCause).exists(_.getMessage.contains("integer literal")))
    }
  }
}
