package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's codegen'd
  * Catalyst kernels as SQL functions, so pure-SQL users (spark.sql, JDBC,
  * SQL files in spark-submit jobs) get the same one-JVM-call-per-row hot
  * paths as the Scala Column API — no UDF fallback.
  *
  * Wire up with either
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or the
  * cluster-wide static conf
  * `spark.sql.extensions=graft.functions.GraftExtensions` (the
  * spark-submit deployment path). GraftExtensionsSpec drives both the
  * registration and SQL evaluation, asserting parity with the Column
  * surface.
  *
  * Registered functions:
  *  - `graft_poly_hash(text)`            → [[PolyHashExpr]]
  *  - `graft_fingerprint(text[, gram])`  → [[FingerprintExpr]] (default 8)
  *  - `graft_shingles(text, n)`          → [[ShinglesExpr]]
  *  - `graft_token_window_hashes(a, w)`  → [[TokenWindowHashesExpr]]
  *  - `graft_dot(a, b)`                  → [[FoldDotExpr]]
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String, arg: String): Int = {
    val value = e match {
      case lit: Literal => lit.value
      case other if other.foldable =>
        // a foldable expression can still be UNRESOLVED at function-binding
        // time, where eval() throws an internal UnresolvedException — route
        // ONLY that into the user-facing rejection below; genuine eval
        // failures (ANSI overflow, divide-by-zero) keep their diagnostics
        try other.eval() catch {
          case _: org.apache.spark.sql.catalyst.analysis.UnresolvedException => null
        }
      case _ => null
    }
    // integral types only — a string or fractional literal must be
    // rejected, not class-cast-crashed or silently truncated
    value match {
      case i: java.lang.Integer => i.intValue
      case s: java.lang.Short => s.intValue
      case b: java.lang.Byte => b.intValue
      case l: java.lang.Long if l >= Int.MinValue && l <= Int.MaxValue => l.intValue
      case _ => throw new IllegalArgumentException(
        s"$fn: $arg must be a non-null integer literal, got $e")
    }
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_poly_hash"),
      info("graft_poly_hash", "graft_poly_hash(text) - left-fold polynomial code-point hash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_poly_hash(text)")
        PolyHashExpr(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("graft_fingerprint"),
      info("graft_fingerprint",
        "graft_fingerprint(text[, gram]) - min rolling hash over word gram-grams"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => FingerprintExpr(t, 8)
        case Seq(t, g) => FingerprintExpr(t, intArg(g, "graft_fingerprint", "gram"))
        case _ => throw new IllegalArgumentException("graft_fingerprint(text[, gram])")
      }))
    ext.injectFunction((FunctionIdentifier("graft_shingles"),
      info("graft_shingles",
        "graft_shingles(text, n) - distinct word n-gram shingles, first-occurrence order"),
      (args: Seq[Expression]) => args match {
        case Seq(t, n) => ShinglesExpr(t, intArg(n, "graft_shingles", "n"))
        case _ => throw new IllegalArgumentException("graft_shingles(text, n)")
      }))
    ext.injectFunction((FunctionIdentifier("graft_token_window_hashes"),
      info("graft_token_window_hashes",
        "graft_token_window_hashes(tokens, w) - stride-1 double-modulus rolling window hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(t, w) =>
          TokenWindowHashesExpr(t, intArg(w, "graft_token_window_hashes", "w"))
        case _ => throw new IllegalArgumentException("graft_token_window_hashes(tokens, w)")
      }))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot",
        "graft_dot(a, b) - ordered left-fold dot product with double accumulation"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => FoldDotExpr(a, b)
        case _ => throw new IllegalArgumentException("graft_dot(a, b)")
      }))
  }
}
