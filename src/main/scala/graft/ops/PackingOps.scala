package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale shape: the running offset is CHUNK-PARALLEL even inside one group
  * (the gapFill fill-and-repair pattern, TimeSeriesOps.gapFill): the
  * canonical order is (hv, id) with hv = polyHash(id) ∈ [0, P), so an
  * hv-RANGE bucket is a contiguous slice of the sort order. Each
  * (group, chunk) computes its partial cumsum in its own task; the
  * cross-chunk carry comes from a group×chunk-count-sized total table
  * window-summed per group and broadcast back. A monolithic single-source
  * corpus packs across `chunks` tasks instead of one; only the tiny carry
  * table sees a per-group sequential window. All arithmetic is integer, so
  * results are bit-stable everywhere.
  */
object PackingOps {

  /** Default token counter: `[a-z]+` word tokens. The REAL-BPE counter
    * (`c => size(TextOps.bpeMergedTokens(c)).cast("long")`) is what the
    * registered pipeline queries pass — trained-tokenizer counts are what
    * a production packer bins on. */
  val WordTokenCount: Column => Column =
    c => org.apache.spark.sql.functions.size(TextOps.tokens(c)).cast("long")

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
                 size: Int, stride: Int,
                 tokenCount: Column => Column = WordTokenCount): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size: size=$size stride=$stride")
    docs.select(col(idCol),
        tokenCount(col(textCol)).as("n_tokens"))
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
                    groupCol: String, capacity: Long,
                    chunks: Int = 64,
                    tokenCount: Column => Column = WordTokenCount): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    require(chunks > 0, s"chunks must be positive: $chunks")
    // hv-range chunk: monotone in hv, so each chunk is a contiguous slice
    // of the (hv, id) order; docs tying on hv share a chunk by construction.
    // hv is uniform on [0, P) once ids exceed ~4 chars (the polynomial wraps
    // mod P); a corpus of pathologically tiny ids degrades toward fewer
    // chunks but stays correct — the carry repair is chunk-count-agnostic
    val span = TextOps.P / chunks + 1
    // localCheckpoint barrier: both the partial cumsum and the carry
    // aggregate read `base`, and their plans diverge before the exchange
    // (window vs pre-aggregated), so ReuseExchange cannot unify them — the
    // barrier keeps the tokenize+hash pass (the dominant per-row work) from
    // running twice over the corpus. Rows are (group, id, hv, n) — tens of
    // bytes/doc, not the text.
    val base = docs.select(col(groupCol), col(idCol),
        TextOps.polyHash(col(idCol).cast("string")).as("hv"),
        tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("_ck", expr(s"hv div ${span}L"))
      .localCheckpoint(false)
    val wIn = Window.partitionBy(col(groupCol), col("_ck"))
      .orderBy(col("hv"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val partial = base
      .withColumn("_off", coalesce(sum("n_tokens").over(wIn), lit(0L)))
    // cross-chunk carry: rows = groups × non-empty chunks, not documents
    val wCarry = Window.partitionBy(groupCol).orderBy("_ck")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = base.groupBy(col(groupCol), col("_ck"))
      .agg(sum("n_tokens").as("_tot"))
      .select(col(groupCol), col("_ck"),
        coalesce(sum("_tot").over(wCarry), lit(0L)).as("_base"))
    partial.join(broadcast(carry), Seq(groupCol, "_ck"))
      .withColumn("start_tok", col("_off") + col("_base"))
      .withColumn("bin_id", expr(s"start_tok div ${capacity}L"))
      .select(col(groupCol), col(idCol), col("n_tokens"),
        col("start_tok"), col("bin_id"))
  }

  /** Block-diagonal ATTENTION-MASK spans for a packed token stream — the
    * piece a real trainer feed ships beside the packed ids: per (group,
    * bin) the bin-relative [seg_start, seg_end) occupied by each document,
    * so attention can be masked to document blocks (and a doc split across
    * bin boundaries becomes one block per bin — exactly the semantics of
    * sequence-boundary splitting). Input: `packSequences` output; a doc
    * spanning global [start, start+n) intersects every bin it crosses, a
    * bounded ceil(n/capacity)+1 fan-out of 40-byte rows. Map-side only —
    * the pack exchange already happened upstream. */
  def packedSpans(packed: DataFrame, groupCol: String, idCol: String,
                  capacity: Long): DataFrame = {
    val c = lit(capacity)
    packed.filter(col("n_tokens") > 0)
      .select(col(groupCol), col(idCol), col("start_tok"), col("n_tokens"),
        explode(sequence(expr(s"start_tok div ${capacity}L"),
          expr(s"(start_tok + n_tokens - 1) div ${capacity}L"))).as("bin_id"))
      .select(col(groupCol), col("bin_id"), col(idCol),
        greatest(col("start_tok") - col("bin_id") * c, lit(0L)).as("seg_start"),
        least(col("start_tok") + col("n_tokens") - col("bin_id") * c, c)
          .as("seg_end"))
  }

  /** Deterministic corpus shuffle + sharding — the writer stage of a
    * training pipeline: every doc gets a seeded pseudo-random key, a shard
    * by key modulus, and a position within its shard, giving a reproducible
    * global training order (shard-major) that any worker can recompute.
    *
    * Scale shape: the naive phrasing — row_number() over ONE global sort —
    * funnels 100 TB through a single window partition. Hash-sharding first
    * (shard = skey % n) keeps the assignment map-side; only the per-shard
    * position needs a window, and those parallelize across shards (pick
    * nShards >> executor count, which real training-shard layouts do
    * anyway). Key arithmetic is the repo's polynomial form — exact in any
    * engine, no xxhash divergence. Output: (idCol, skey, shard,
    * pos_in_shard). */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int,
                  seed: Long): DataFrame = {
    require(nShards > 0, "shardAssign needs nShards > 0")
    // pmod (not %) everywhere: Spark's % keeps the dividend sign, so a
    // NEGATIVE id would yield a negative skey and an out-of-range shard —
    // pmod keeps both in [0, m) for any integral id. Oracle mirrors with
    // the ((x % m) + m) % m expansion.
    val skey = pmod(pmod(col(idCol), lit(TextOps.P)) * TextOps.B2 + seed,
      lit(TextOps.P))
    val w = Window.partitionBy("shard").orderBy(col("skey"), col(idCol))
    df.select(col(idCol), skey.as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(nShards.toLong)))
      .withColumn("pos_in_shard", row_number().over(w).cast("long") - 1)
  }

  /** EPOCH-SEEDED deterministic global shuffle ORDER — the reproducible
    * training-order stage: every epoch visits the whole corpus in a
    * different pseudorandom permutation, and a restarted job (or a second
    * engine) derives the identical order from (seed, epoch, id) alone.
    *
    * The shuffle key is the epoch-salted polynomial hash
    * `skey = (id·B2 + seed + epoch·B1) mod P`; the epoch's total order is
    * the COMPOSITE (skey mod buckets, skey, id) — bucket-major. Any
    * deterministic pseudorandom total order is a valid shuffle, and the
    * bucket-major one is what makes the rank computation embarrassingly
    * partitionable: positions come from within-bucket window ranks
    * (epochs×buckets parallel window partitions — never a single-task
    * per-epoch sort) plus broadcast bucket-count prefix offsets, the same
    * chunked-cumsum shape as the packer. The offsets table is
    * epochs×buckets rows — histogram-scale at any corpus size.
    *
    * `buckets` sizing (r16 verdict #9): each within-bucket rank is ONE
    * task sorting ~corpus/buckets rows, so choose
    * buckets ≈ corpusRows / targetRowsPerTask (a few million rows per
    * task; a fixed 64 at 100 TB would hand one task corpus/64 rows).
    * Passing 0 (the default) derives 4× the session's default
    * parallelism — right-sized for the CURRENT cluster, but note the
    * bucket count is PART OF THE PERMUTATION IDENTITY (the total order is
    * (skey mod buckets, skey, id)): a training config that must reproduce
    * the same order across differently-sized clusters or engines must PIN
    * buckets explicitly, as the oracle-gated face does. Every bucket
    * count yields a valid permutation — positions are a bijection onto
    * [0, n) per epoch for any value (spec-checked at two counts). */
  def epochShuffleOrder(df: DataFrame, idCol: String, epochs: Int,
                        seed: Long, buckets: Int = 0): DataFrame = {
    require(epochs > 0 && buckets >= 0,
      "epochShuffleOrder needs epochs > 0, buckets >= 0 (0 = derive)")
    val spark = df.sparkSession
    val nBuckets =
      if (buckets > 0) buckets
      else math.max(64, spark.sparkContext.defaultParallelism * 4)
    val eps = spark.range(epochs).select(col("id").as("epoch"))
    val keyed = df.select(col(idCol)).crossJoin(broadcast(eps))
      .withColumn("skey", pmod(
        pmod(col(idCol), lit(TextOps.P)) * TextOps.B2
          + lit(seed) + col("epoch") * TextOps.B1, lit(TextOps.P)))
      .withColumn("bucket", pmod(col("skey"), lit(nBuckets.toLong)))
    val wo = Window.partitionBy("epoch").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = keyed.groupBy("epoch", "bucket").agg(count(lit(1)).as("n"))
      .withColumn("offset", coalesce(sum("n").over(wo), lit(0L)))
      .select("epoch", "bucket", "offset")
    val wr = Window.partitionBy("epoch", "bucket").orderBy(col("skey"), col(idCol))
    keyed.withColumn("rn", row_number().over(wr).cast("long") - 1)
      .join(broadcast(offs), Seq("epoch", "bucket"))
      .select(col("epoch"), col(idCol), col("skey"),
        (col("offset") + col("rn")).as("pos"))
  }
}
