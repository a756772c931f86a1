package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sequence packer — the concat-and-chunk packing of
  * `text/TokenPipeline.packChunks` as a typed stateful Dataset operator:
  * pre-tokenized docs arrive as a stream, state per source carries the
  * partial chunk (buffer + running chunk counter) across micro-batches,
  * and every completed `chunkSize`-token training example is emitted
  * exactly once (append mode; the tail stays buffered for the next
  * micro-batch — a packer that emitted partial examples would break the
  * fixed-shape training contract).
  *
  * Determinism contract: within a micro-batch the group's docs are packed
  * in LEXICOGRAPHIC doc_id order (the same String ordering the batch
  * packer and its oracle use); across micro-batches the source must
  * deliver doc_ids lexicographically monotonically — what a file/Iceberg
  * append source provides when ingest names sort with arrival, i.e.
  * zero-padded or fixed-width ids. Unpadded numeric ids split across
  * micro-batches ("999" then "1000") would violate the contract and
  * diverge from the batch packer — pad at ingest, exactly as batch
  * re-runs over the same table already require. The contract is ENFORCED:
  * state tracks the max doc_id packed per source and a batch delivering
  * an id at or below it fails the query loudly (StreamingPackerSpec
  * asserts) rather than emitting silently-divergent chunks. Under it the
  * emitted chunks are byte-identical to the batch packer's full chunks
  * for the same corpus — asserted in StreamingPackerSpec for multi-batch
  * arrivals, and oracle-checked end-to-end by the `stream_pack_chunks`
  * driver query (single AvailableNow batch, so arrival order is
  * irrelevant there).
  *
  * State is O(chunkSize + one doc) per source; emission is linear in
  * tokens. At cluster scale sources shard the state across executors and
  * each token is buffered at most once — same shuffle budget as the
  * batch packer's single exchange.
  */
object StreamingPacker {

  final case class TokenDoc(doc_id: String, tokens: Seq[Int], n_tok: Int, source: String)

  /** nextChunkId: id the in-progress chunk will get when it completes;
    * docsInCur: docs that have contributed ≥1 token to the in-progress
    * chunk (mirrors the batch packer's per-chunk piece count); maxDocId:
    * largest doc_id ever delivered to this source (zero-token docs
    * included) — the sentinel that turns a violated cross-batch ordering
    * contract into a loud failure instead of silently-divergent chunks.
    *
    * Checkpoint-compat note: this case class IS the stateful operator's
    * state encoder schema (flatMapGroupsWithState and transformWithState
    * alike). Changing its fields — as adding `maxDocId` did — breaks
    * deserialization of checkpoints written by the previous shape; a
    * packer upgraded across such a change must restart from a fresh
    * checkpoint directory (and, for exactly-once sinks, re-emit from the
    * source's retained history). */
  final case class PackState(nextChunkId: Long, buffer: Seq[Int], docsInCur: Long,
      maxDocId: Option[String] = None)

  final case class PackedChunk(source: String, chunk_id: Long, tokens: Seq[Int],
      n_tok: Int, n_docs: Long)

  def packGroup(source: String, docs: Seq[TokenDoc], st: PackState,
      chunkSize: Int): (Seq[PackedChunk], PackState) = {
    // enforce the determinism contract: every id in this batch must sort
    // strictly after everything already packed. A violation (unpadded
    // numeric ids split across batches, replayed docs) would silently
    // produce chunks that diverge from the batch packer — fail fast with
    // the offending ids instead.
    val sorted = docs.sortBy(_.doc_id)
    for (lo <- sorted.headOption.map(_.doc_id); seen <- st.maxDocId if lo <= seen)
      throw new IllegalStateException(
        s"StreamingPacker ordering contract violated for source '$source': " +
          s"doc_id '$lo' arrived after '$seen' was already packed — doc_ids must be " +
          "lexicographically monotonic across micro-batches (zero-pad numeric ids)")
    // replays WITHIN one micro-batch are equally silent divergence:
    // after the sort they sit adjacent, so one pass catches them
    for (Seq(a, b) <- sorted.sliding(2) if a.doc_id == b.doc_id)
      throw new IllegalStateException(
        s"StreamingPacker received doc_id '${a.doc_id}' twice in one micro-batch " +
          s"for source '$source' — replayed docs would be packed twice")
    val maxSeen = (st.maxDocId ++ sorted.lastOption.map(_.doc_id))
      .reduceOption((a, b) => if (a >= b) a else b)
    var buf = st.buffer
    var docsInCur = st.docsInCur
    var chunkId = st.nextChunkId
    val out = Seq.newBuilder[PackedChunk]
    for (d <- sorted if d.n_tok > 0) {
      buf = buf ++ d.tokens
      docsInCur += 1
      while (buf.length >= chunkSize) {
        val (chunk, rest) = buf.splitAt(chunkSize)
        out += PackedChunk(source, chunkId, chunk, chunkSize, docsInCur)
        chunkId += 1
        buf = rest
        // rest (if any) is entirely the tail of the current doc — the
        // buffer was < chunkSize before this doc was appended
        docsInCur = if (rest.nonEmpty) 1L else 0L
      }
    }
    (out.result(), PackState(chunkId, buf, docsInCur, maxSeen))
  }

  def pack(docs: Dataset[TokenDoc], chunkSize: Int = 128): Dataset[PackedChunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[PackState, PackedChunk](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (source: String, rows: Iterator[TokenDoc], state: GroupState[PackState]) =>
          val st = state.getOption.getOrElse(PackState(0L, Nil, 0L, None))
          val (out, next) = packGroup(source, rows.toSeq, st, chunkSize)
          state.update(next)
          out.iterator
      }
  }
}
