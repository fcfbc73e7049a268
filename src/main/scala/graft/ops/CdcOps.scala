package graft.ops

/** Content-defined chunking (CDC) — the rsync/LBFS-family storage-dedup
  * primitive: chunk boundaries come from the CONTENT (a rolling hash
  * hitting a divisor condition), not from fixed offsets, so an insertion
  * near the head of a document shifts only the chunks it touches — the
  * shared tail re-synchronizes and dedups against every other copy. The
  * fixture exploits exactly that: every doc ends in one shared footer, and
  * the footer's chunks hash identically across the whole corpus despite
  * every doc having a different-length prefix.
  *
  * Boundary rule (pure content-defined): position `i` (1-based, in code
  * points, `i ≥ W`) is a boundary iff `h_i % D == 0`, where `h_i` is the
  * polynomial hash of the `W`-point window ending at `i`
  * (`fold h*B1 + c (mod P)` — the repo's standard shingle arithmetic).
  * The end of the document is always a boundary. Production CDC adds
  * min/max chunk bounds; those make the cut points HISTORY-dependent
  * (a sequential scan), which buys nothing at this fixture's scale and
  * would force a recursive replay — the divisor rule alone carries the
  * shift-resistance property the operator exists to demonstrate.
  *
  * The Spark side computes window hashes by ROLLING update
  * (`h ← (h − c_out·B1^{W−1})·B1 + c_in mod P`, O(n) per doc); the oracle
  * re-folds each window from scratch (O(n·W)) — same values by modular
  * arithmetic, so the cheap path is gated by the obvious one. */
object CdcOps {

  /** Window width (code points) for the rolling hash. */
  val W = 16

  /** Boundary divisor: expected chunk length ≈ D code points. */
  val D = 64L

  /** The shared footer every fixture doc ends with — long enough to
    * contain several content-defined boundaries, so its chunks dedup
    * corpus-wide no matter what precedes them. */
  val Footer: String =
    " -- standard corpus license: redistribution of this document is " +
      "permitted provided the attribution notice and this license text " +
      "are preserved verbatim in every copy, including the checksum " +
      "line that follows the terms and the final acknowledgement of the " +
      "originating archive."

  import TextOps.{B1, P}

  /** `B1^(W-1) mod P` — the outgoing-character weight of the rolling
    * update. */
  val BPow: Long = {
    var r = 1L
    var k = 0
    while (k < W - 1) { r = r * B1 % P; k += 1 }
    r
  }

  /** Chunk the code-point stream: returns (boundaries, chunkHashes,
    * chunkLens), boundaries 1-based END positions (the final position n
    * always closes the last chunk; empty input → no chunks). */
  def chunks(codes: Array[Int]): (Array[Int], Array[Long], Array[Int]) = {
    val n = codes.length
    val bs = Array.newBuilder[Int]
    var h = 0L
    var i = 0
    while (i < n) {
      h =
        if (i < W) (h * B1 + codes(i)) % P
        else ((h - codes(i - W) * BPow % P + P) % P * B1 + codes(i)) % P
      if (i + 1 >= W && h % D == 0 && i + 1 < n) bs += i + 1
      i += 1
    }
    if (n > 0) bs += n
    val bounds = bs.result()
    val hashes = new Array[Long](bounds.length)
    val lens = new Array[Int](bounds.length)
    var start = 0
    var c = 0
    while (c < bounds.length) {
      val end = bounds(c)
      var ch = 0L
      var j = start
      while (j < end) { ch = (ch * B1 + codes(j)) % P; j += 1 }
      hashes(c) = ch
      lens(c) = end - start
      start = end
      c += 1
    }
    (bounds, hashes, lens)
  }
}
