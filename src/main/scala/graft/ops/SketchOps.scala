package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Sketch-based distinct counting — the bounded-state path beside the
  * exact `count(DISTINCT …)` surface. At 100 TB an exact distinct shuffles
  * every distinct key; a K-MINIMUM-VALUES sketch shuffles at most `k`
  * hashes per group, with map-side partial merges, and its estimate is a
  * DETERMINISTIC function of the data: the k smallest distinct hash values
  * are the same set no matter how partitions merge, so — unlike
  * HyperLogLog — the sketch is still hash-exact against a DuckDB oracle
  * replaying the same `ORDER BY hash LIMIT k` pick. Estimator: with u_k =
  * kth smallest distinct hash normalized to (0,1], distinct ≈ (k−1)/u_k
  * (Bar-Yossef et al., the standard KMV estimator); groups holding fewer
  * than k distinct hashes are EXACT by construction (the sketch saw every
  * value). Hashes ride the explicit 31-bit polynomial grid
  * ([[TextOps.polyHash]]) so the oracle reproduces them bit-for-bit. */
object SketchOps {

  /** Typed aggregation buffer: the k smallest DISTINCT hashes seen so far —
    * bounded at k longs regardless of input size, mergeable in any order.
    * (A sorted array beats a TreeSet here: k is small, buffers serialize
    * per partial merge, and Spark needs an Encoder — Array[Long] has a
    * primitive one.) */
  /** Insert one hash into a sorted ≤k-element KMV buffer (pure; shared by
    * the batch Aggregator and the streaming face). */
  def kmvInsert(buf: Array[Long], h: Long, k: Int): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present (DISTINCT semantics)
    else {
      val ins = -pos - 1
      if (ins >= k) buf // larger than the current k smallest
      else {
        val out = new Array[Long](math.min(buf.length + 1, k))
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, out.length - ins - 1)
        out
      }
    }
  }

  /** The KMV estimate of a sorted ≤k buffer — EXACT below k, (k−1)/u_k at
    * k. Same association order as the Column/oracle formulations, so all
    * three produce identical double bits. */
  def kmvEstimate(buf: Array[Long], k: Int): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1).toDouble * TextOps.P.toDouble / buf(k - 1).toDouble

  /** Scalar mirror of [[TextOps.polyHash]] (left char fold, mod P). */
  def polyHashScalar(s: String): Long = {
    var h = 0L; var i = 0
    while (i < s.length) { h = (h * TextOps.B1 + s.charAt(i)) % TextOps.P; i += 1 }
    h
  }

  /** Scalar mirror of the field mix (operands positive, no pmod needed). */
  def mixScalar(h: Long): Long = (h * MixA + MixC) % TextOps.P

  final class KmvAggregator(k: Int)(implicit enc: Encoder[Array[Long]])
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    override def zero: Array[Long] = Array.emptyLongArray
    private def trim(sorted: Array[Long]): Array[Long] =
      if (sorted.length <= k) sorted else java.util.Arrays.copyOf(sorted, k)
    override def reduce(buf: Array[Long], h: Long): Array[Long] =
      kmvInsert(buf, h, k)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // sorted-merge with dedup; result bounded at k
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val take =
          if (i >= a.length) { j += 1; b(j - 1) }
          else if (j >= b.length) { i += 1; a(i - 1) }
          else if (a(i) < b(j)) { i += 1; a(i - 1) }
          else if (b(j) < a(i)) { j += 1; b(j - 1) }
          else { i += 1; j += 1; a(i - 1) }
        out(n) = take; n += 1
      }
      trim(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    // ArrayType(LongType) columns (NOT kryo/java blobs): downstream
    // expressions read the sketch with ordinary element_at/size
    override def bufferEncoder: Encoder[Array[Long]] = enc
    override def outputEncoder: Encoder[Array[Long]] = enc
  }

  /** Multiplicative mixing constants: [[TextOps.polyHash]] of SHORT strings
    * (numeric ids) lands in a tiny low range — fine for equality keys,
    * useless for an order statistic that assumes uniformity (the kth
    * smallest of structured hashes estimated 8.8M for a true 150 before
    * this mix). One linear map `(a·h + c) mod P` spreads any input set
    * across the full field — and maps distinct inputs to distinct outputs
    * (a is invertible mod the prime), so DISTINCT semantics survive. */
  val MixA = 1103515245L
  val MixC = 12345L

  /** Per-group distinct-count ESTIMATE via KMV over mixed `polyHash(keyCol)`
    * — SKETCH-ONLY: the registered hot path a user copies must not carry
    * the exact `count(DISTINCT)` the sketch exists to avoid (calibration
    * against exact lives in the oracle SQL and EventOpsSpec, which also
    * plan-asserts no exact-distinct aggregation sneaks back in). Output:
    * (group, kth_hash, n_kmv). `n_kmv` = (k−1)·P/kth as a single
    * left-associated double expression (oracle-identical), or the exact
    * sketch size when the group holds fewer than k distinct hashes. */
  def distinctKmv(df: DataFrame, groupCol: String, keyCol: String,
                  k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new KmvAggregator(k).toColumn
    val hashed = df
      .select(col(groupCol).as("g"),
        pmod(TextOps.polyHash(col(keyCol).cast("string")) * lit(MixA) + lit(MixC),
          lit(TextOps.P)).as("h"))
    val sketches = hashed.as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("kmv"))
      .toDF("g", "kmv")
    val have = size(col("kmv"))
    val kth = element_at(col("kmv"), have).cast("double")
    sketches
      .select(col("g").as(groupCol),
        element_at(col("kmv"), have).as("kth_hash"),
        when(have < k, have.cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(TextOps.P.toDouble) / kth)
          .as("n_kmv"))
      .orderBy(groupCol)
  }
}
