package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
import graft.functions.GraftBloomContains

/** Bloom-filter SEMI-JOIN PRUNING — the "filter the fact table before the
  * shuffle" pattern that decides whether a 100 TB semi-join is one pass or
  * three. A shuffle semi-join exchanges EVERY fact row on the join key;
  * when the dim side is selective (a filtered dimension, a sampled id set)
  * but too large to broadcast raw, the right plan builds a BITSET of the
  * dim keys (m bits — megabytes where the raw key set is gigabytes),
  * broadcasts that, and drops non-matching fact rows IN THE SCAN before
  * they ever reach the exchange. False positives (a tunable few percent)
  * just ride along to the exact join; false negatives are impossible —
  * build and probe share one deterministic hash family
  * ([[GraftBloomContains.setBits]]/[[GraftBloomContains.mightContain]]),
  * so the final result is bit-identical to the plain semi-join and the
  * DuckDB oracle needs no Bloom arithmetic at all.
  *
  * (Spark can inject a runtime bloom under
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` for joins its
  * heuristics pick; this operator is the explicit, deterministic form the
  * pipeline can apply unconditionally — e.g. "keep only documents whose id
  * survived dedup" with a billion-id keep-list.)
  *
  * Sizing: ~10 bits/key with `numHashes`≈5-7 gives ≲1% false positives;
  * the build is one shuffle of DISTINCT dim keys into a single
  * `numBits/64`-long buffer with map-side partial merges (the aggregation
  * form of `df.stat.bloomFilter`, kept inside the plan so the whole
  * operator is ONE job and the bits Column broadcasts like any small dim).
  */
object BloomOps {

  /** Typed aggregation: OR every key's probe bits into one packed
    * `array<bigint>` buffer. Partial buffers merge bitwise in any order —
    * the canonical mergeable-sketch shape (same stance as
    * [[SketchOps.KmvAggregator]]). Buffer size is `numBits/64` longs
    * regardless of key count. */
  final class BloomAggregator(numBits: Int, numHashes: Int)(
      implicit enc: Encoder[Array[Long]])
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
    override def zero: Array[Long] = new Array[Long](numBits / 64)
    override def reduce(buf: Array[Long], key: Long): Array[Long] = {
      GraftBloomContains.setBits(buf, key, numBits, numHashes); buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = enc
    override def outputEncoder: Encoder[Array[Long]] = enc
  }

  private def isIntegral(df: DataFrame, key: String): Boolean =
    df.schema(key).dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }

  /** The 64-bit probe key of a column: integral types pass through (their
    * value IS the key — no hash collision can cross distinct keys);
    * anything else folds through the codegen'd `xxhash64`. Build and probe
    * MUST derive keys identically — callers joining an integral key against
    * a non-integral one would otherwise build and probe DIFFERENT key
    * families and silently drop matching fact rows (a false negative the
    * operator's contract forbids), so [[bloomSemiJoin]] asserts both sides
    * sit on the same side of this boundary. */
  private def probeKey(df: DataFrame, key: String): Column =
    if (isIntegral(df, key)) col(key).cast("long") else xxhash64(col(key))

  /** Fail loudly when fact/dim key types would derive keys from different
    * hash families (e.g. LONG fact key vs STRING dim key — a join Spark's
    * exact semi-join would still match via implicit casts, but the Bloom
    * prune would falsely drop every row). */
  private def requireCompatibleKeys(fact: DataFrame, factKey: String,
                                    dim: DataFrame, dimKey: String): Unit = {
    val (fi, di) = (isIntegral(fact, factKey), isIntegral(dim, dimKey))
    val (ft, dt) = (fact.schema(factKey).dataType, dim.schema(dimKey).dataType)
    // integral pair: both canonicalize to the long VALUE, any widths mix.
    // non-integral pair: xxhash64 hashes the NATIVE type's bytes, so the
    // types must be identical — DOUBLE 2.0 and STRING '2.0' hash apart
    // even though Spark's exact semi-join would match them via casts.
    require(fi && di || ft == dt,
      s"bloomSemiJoin key types are probe-incompatible: $factKey is " +
        s"${ft.simpleString} but $dimKey is ${dt.simpleString} — they " +
        "derive different 64-bit probe keys (integral value vs per-type " +
        "xxhash64) and matching rows would be silently dropped; cast both " +
        "sides to one type first")
  }

  /** One-row DataFrame holding the packed Bloom bits of `dim`'s DISTINCT
    * `dimKey` values. Integral keys enter as their value; other types
    * (strings, timestamps, …) fold through `xxhash64` first — a 64-bit
    * hash collision between a fact key and a dim key shows up as one more
    * false positive for the exact join to discard, never a wrong row. */
  def bloomBits(dim: DataFrame, dimKey: String, numBits: Int,
                numHashes: Int): DataFrame = {
    val spark = dim.sparkSession
    import spark.implicits._
    // nulls drop on the RAW key: xxhash64(NULL) is the seed, not NULL, so
    // dropping after key derivation would let NULL dim keys insert a
    // phantom key (harmless to results — the exact join confirms — but a
    // needless false-positive source on dims with many NULL keys)
    dim.na.drop(Seq(dimKey)).select(probeKey(dim, dimKey).as("k")).distinct()
      .as[Long]
      .select(new BloomAggregator(numBits, numHashes).toColumn)
      .toDF("bits")
  }

  /** `fact` rows whose `factKey` MIGHT be in the Bloom bits — the map-side
    * prune stage alone (exposed for diagnostics and specs; false positives
    * included by construction).
    *
    * The bits enter as a SCALAR SUBQUERY, not a broadcast cross join: a
    * cross-join + filter phrasing leaves a join node the optimizer may
    * REORDER — observed: the confirming semi-join pushed beneath it,
    * running the exact join first and the "prune" after, the exact
    * inversion of the point. A scalar subquery evaluates once and feeds a
    * plain `Filter` directly over the fact scan, which nothing reorders —
    * the same mechanism Spark's own runtime bloom filter injection uses. */
  def bloomPruned(fact: DataFrame, factKey: String, bits: DataFrame,
                  numBits: Int, numHashes: Int): DataFrame = {
    graft.functions.GraftFunctions.register(fact.sparkSession)
    fact.filter(call_function("graft_bloom_contains",
      bits.limit(1).scalar(), probeKey(fact, factKey),
      lit(numBits), lit(numHashes)))
  }

  /** The full pruned semi-join: Bloom-drop fact rows in the scan, then the
    * exact semi-join confirms survivors (removing false positives). Result
    * is exactly `fact SEMI JOIN dim ON factKey = dimKey` — the Bloom only
    * moves work out of the exchange. */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    requireCompatibleKeys(fact, factKey, dim, dimKey)
    val keys = dim.select(col(dimKey)).na.drop.distinct()
    val bits = bloomBits(dim, dimKey, numBits, numHashes)
    val pruned = bloomPruned(fact, factKey, bits, numBits, numHashes)
    pruned.join(keys, pruned(factKey) === keys(dimKey), "left_semi")
  }
}
