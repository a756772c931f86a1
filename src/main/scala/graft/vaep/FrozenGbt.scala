package graft.vaep

import scala.io.Source

import org.apache.spark.ml.classification.GBTClassificationModel
import org.apache.spark.ml.tree.{ContinuousSplit, InternalNode, LeafNode, Node}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A GBT classifier frozen to literal tree arithmetic.
  *
  * Training is the one non-deterministic-across-engines step of the VAEP
  * model chain; the PREDICT path is pure arithmetic — a fixed chain of
  * `feature <= threshold` branches, a weighted left-fold sum of leaf
  * values, and the log-loss link `p = 1 − 1/(1 + exp(2·raw))` (spark.ml's
  * exact evaluation order, `GBTClassificationModel.predictRaw` +
  * `LogLoss.computeProbability`). Freezing one trained model into a
  * resource makes that path value-golden: [[column]] and [[sql]] walk the
  * SAME parsed tree, so the Spark expression and the DuckDB oracle are
  * term-for-term identical — the same trick that froze the xT fixpoint
  * chain ([[graft.xt.XThreat]]).
  *
  * The resource is produced once by [[graft.FreezeGbt]] (seeded fit on the
  * sf0.001 actions corpus) and committed; thresholds/leaves serialize via
  * `Double.toString` (shortest round-trip repr) and are re-parsed exactly
  * on both engines (`lit(x)` / `CAST('x' AS DOUBLE)`).
  */
object FrozenGbt {

  sealed trait GNode
  final case class GSplit(f: Int, t: Double, left: GNode, right: GNode) extends GNode
  final case class GLeaf(p: Double) extends GNode
  final case class GTree(weight: Double, root: GNode)
  final case class Frozen(featureCols: Array[String], trees: Array[GTree])

  // ---- freeze (spark.ml → Frozen) -------------------------------------------

  def fromMl(model: GBTClassificationModel, featureCols: Array[String]): Frozen = {
    def conv(n: Node): GNode = n match {
      case l: LeafNode => GLeaf(l.prediction)
      case i: InternalNode => i.split match {
        case s: ContinuousSplit =>
          GSplit(s.featureIndex, s.threshold, conv(i.leftChild), conv(i.rightChild))
        case s => throw new IllegalArgumentException(
          s"only continuous splits freeze losslessly, got $s")
      }
    }
    Frozen(featureCols,
      model.trees.zip(model.treeWeights).map { case (t, w) => GTree(w, conv(t.rootNode)) })
  }

  // ---- line-based serialization ---------------------------------------------

  def serialize(m: Frozen): String = {
    val sb = new StringBuilder
    sb.append("features ").append(m.featureCols.mkString(",")).append('\n')
    sb.append("trees ").append(m.trees.length).append('\n')
    def emit(n: GNode): Unit = n match {
      case GLeaf(p) => sb.append("L ").append(p).append('\n')
      case GSplit(f, t, l, r) =>
        sb.append("N ").append(f).append(' ').append(t).append('\n'); emit(l); emit(r)
    }
    m.trees.foreach { t => sb.append("w ").append(t.weight).append('\n'); emit(t.root) }
    sb.result()
  }

  def parse(text: String): Frozen = {
    val it = text.linesIterator.filter(_.nonEmpty).buffered
    def expect(prefix: String): String = {
      val line = it.next()
      require(line.startsWith(prefix), s"expected '$prefix', got '$line'")
      line.drop(prefix.length).trim
    }
    val features = expect("features ").split(",")
    val n = expect("trees ").toInt
    def node(): GNode = it.next() match {
      case l if l.startsWith("L ") => GLeaf(l.drop(2).toDouble)
      case s if s.startsWith("N ") =>
        val parts = s.drop(2).split(" ")
        val (f, t) = (parts(0).toInt, parts(1).toDouble)
        GSplit(f, t, node(), node())
      case other => throw new IllegalArgumentException(s"bad node line '$other'")
    }
    Frozen(features, Array.fill(n) { GTree(expect("w ").toDouble, node()) })
  }

  /** Load a `<name> := serialized` multi-model resource section. */
  def loadResource(path: String, model: String): Frozen = {
    val stream = getClass.getResourceAsStream(path)
    require(stream != null, s"missing resource $path")
    val text = try Source.fromInputStream(stream, "UTF-8").mkString finally stream.close()
    val sections = text.split("(?m)^model ").filter(_.nonEmpty)
    val sec = sections.find(_.startsWith(model + "\n"))
      .getOrElse(throw new IllegalArgumentException(s"no model '$model' in $path"))
    parse(sec.drop(model.length + 1))
  }

  // ---- the two predict walkers (kept term-for-term identical) ---------------

  /** P̂(positive) as a Column: weighted leaf-sum left fold + the log-loss
    * link, spark.ml's evaluation order. */
  def column(m: Frozen): Column = {
    def walk(n: GNode): Column = n match {
      case GLeaf(p) => lit(p)
      case GSplit(f, t, l, r) =>
        when(col(m.featureCols(f)).cast("double") <= t, walk(l)).otherwise(walk(r))
    }
    val raw = m.trees.map(t => lit(t.weight) * walk(t.root)).reduceLeft(_ + _)
    lit(1.0) - lit(1.0) / (lit(1.0) + exp(lit(2.0) * raw))
  }

  /** The DuckDB mirror of [[column]] over the same parsed trees. Literals
    * go through CAST('<shortest-repr>' AS DOUBLE) so both engines hold the
    * identical double. */
  def sql(m: Frozen): String = {
    def d(x: Double): String = s"CAST('${x}' AS DOUBLE)"
    def walk(n: GNode): String = n match {
      case GLeaf(p) => d(p)
      case GSplit(f, t, l, r) =>
        s"(CASE WHEN CAST(${m.featureCols(f)} AS DOUBLE) <= ${d(t)} THEN ${walk(l)} ELSE ${walk(r)} END)"
    }
    val raw = m.trees.map(t => s"${d(t.weight)} * ${walk(t.root)}").mkString(" + ")
    s"(1.0 - 1.0 / (1.0 + exp(2.0 * ($raw))))"
  }
}
