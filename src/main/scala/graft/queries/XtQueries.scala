package graft.queries
import graft.Q
object XtQueries { val all: Seq[Q] = Seq() }
