package graft.core

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame

/** One-slot cache lifecycle for operators whose persist is load-bearing
  * within a single invocation but must not accumulate across calls (the
  * packChunks metadata frame, the curation survivor frame): each call
  * swaps its freshly-persisted frame in and releases the previous one.
  * The previous frame may belong to an already-stopped session
  * (fresh-session-per-size benchmarks) — unpersist on a stopped context
  * throws, and its cache died with the context anyway, so it is skipped. */
object OneSlotCache {
  def swap(slot: AtomicReference[DataFrame], next: DataFrame): Unit = {
    val prev = slot.getAndSet(next)
    if (prev != null && !prev.sparkSession.sparkContext.isStopped) {
      try { prev.unpersist(); () } catch { case _: Exception => () }
    }
  }
}
