package graft.queries
import graft.Q
object AtomicQueries { val all: Seq[Q] = Seq() }
