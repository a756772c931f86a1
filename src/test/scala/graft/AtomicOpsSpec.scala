package graft

import graft.core.{SynActions, Tables}
import graft.operators.AtomicOps

/** Equivalence gate for the round-6 typed atomic converter: the per-game
  * scan (`AtomicOps.processAtomicGame`) must reproduce the declarative
  * window/explode chain row for row — action_id included — on real derived
  * corpora, so switching `convertToAtomic` to the scan cannot change any
  * downstream atomic query (each is additionally oracle-hashed). */
class AtomicOpsSpec extends SparkSpec {

  private def assertSame(dir: String): Unit = {
    val actions = SynActions.fromEvents(Tables.events(spark, dir))
    val typed = AtomicOps.convertToAtomic(actions)
    val decl = AtomicOps.convertToAtomicDeclarative(actions)
    // nullability differs by construction (case-class primitives are
    // non-nullable — same as the typed CEP scan); names/types must match
    assert(typed.schema.map(f => (f.name, f.dataType)) ==
      decl.schema.map(f => (f.name, f.dataType)))
    val key = Seq("game_id", "action_id")
    val t = collectSorted(typed, key: _*)
    val d = collectSorted(decl, key: _*)
    assert(t.length == d.length, s"row counts differ: ${t.length} vs ${d.length}")
    t.zip(d).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i differs:\n typed $a\n decl  $b")
    }
  }

  test("typed atomic scan ≡ declarative chain on sf0.001") {
    assertSame("/root/testdata/sf0.001")
  }

  test("typed atomic scan ≡ declarative chain on sf0.01") {
    assertSame("/root/testdata/sf0.01")
  }
}
