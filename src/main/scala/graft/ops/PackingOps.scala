package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the last step of a training-data pipeline: lay
  * documents end-to-end into fixed-capacity token bins ("sequences") so a
  * trainer reads dense, deterministic batches instead of one ragged doc per
  * row.
  *
  * The layout is CONTIGUOUS packing in a canonical order: within each group
  * (typically the source/shard), documents are ordered by (id-hash, id) —
  * the same stateless shuffle `pipeline_split` uses, so the order is stable
  * across runs and engines — and a document starting at cumulative token
  * offset o lands in bin o div capacity. Documents longer than the capacity
  * simply span bins, which is the realistic mode (trainers split on the bin
  * boundary and continue in the next sequence; packing that REJECTS
  * oversized docs is a filter upstream, not a packer concern).
  *
  * Scale shape: the running offset is a window cumsum PARTITIONED BY the
  * group column — groups pack in parallel, one task per group. A corpus
  * sharded into the usual thousands of source-files parallelizes fully; a
  * single monolithic group would serialize, and then the chunked
  * fill-and-repair pattern (TimeSeriesOps.gapFill's chunk cumsum + chunk
  * -total repair) applies verbatim to the cumsum here. All arithmetic is
  * integer, so results are bit-stable everywhere.
  */
object PackingOps {

  /** Sliding-window CHUNKING: split each document's token stream into
    * `size`-token windows advancing by `stride` (overlap = size - stride) —
    * the pre-embedding / pre-packing step for long documents. Windows stop
    * at the FIRST one reaching the end of the document (last start = the
    * smallest multiple of `stride` with start + size >= n): no trailing
    * chunk ever lies fully inside its predecessor, a document no longer
    * than `size` yields exactly one chunk, an empty document none, and
    * every token is covered. Pure per-row integer compute + a bounded
    * explode: map-side at any scale, no shuffle.
    * Output: (idCol, chunk_id, start_tok, end_tok) with
    * `end_tok = min(start_tok + size, n_tokens)` exclusive. */
  def chunkSpans(docs: DataFrame, idCol: String, textCol: String,
                 size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size: size=$size stride=$stride")
    docs.select(col(idCol),
        org.apache.spark.sql.functions.size(TextOps.tokens(col(textCol)))
          .cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .select(col(idCol), col("n_tokens"),
        explode(sequence(lit(0L),
          expr(s"greatest(0L, (n_tokens - $size + $stride - 1) div ${stride}L)")))
          .as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        least(col("chunk_id") * stride + size, col("n_tokens")).as("end_tok"))
  }

  /** Pack `docs` into `capacity`-token bins per `groupCol`.
    * Output: (groupCol, idCol, n_tokens, start_tok, bin_id), where
    * `start_tok` is the document's starting offset within its group's
    * token stream and `bin_id = start_tok div capacity`. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    groupCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val w = Window.partitionBy(groupCol).orderBy(col("hv"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(groupCol), col(idCol),
        TextOps.polyHash(col(idCol).cast("string")).as("hv"),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("start_tok", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("bin_id", expr(s"start_tok div ${capacity}L"))
      .select(col(groupCol), col(idCol), col("n_tokens"),
        col("start_tok"), col("bin_id"))
  }
}
