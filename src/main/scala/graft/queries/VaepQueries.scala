package graft.queries
import graft.Q
object VaepQueries { val all: Seq[Q] = Seq() }
