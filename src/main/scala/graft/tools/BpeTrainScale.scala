package graft.tools

/** Trainer-capacity measurement (VERDICT r11 #2): the driver corpus
  * saturates at 89 merges (its synthetic vocabulary is small), so
  * production-vocab feasibility is measured on a deterministic rich
  * histogram instead — like ClusteredVectors does for IVF realism. The
  * histogram is the trainer's exact sufficient statistic, so feeding
  * [[graft.ops.BpeTrainer.localTrain]] a synthetic one measures precisely
  * the post-histogram cost a 100 TB run would pay in the driver after its
  * single corpus-scale pass.
  *
  * Words are seeded pseudo-random letter strings with Zipf-ish counts —
  * enough pair diversity to sustain tens of thousands of merges.
  *
  * Usage: runMain graft.tools.BpeTrainScale [nWords] [merges...]
  */
object BpeTrainScale {
  def main(args: Array[String]): Unit = {
    val nWords = args.headOption.map(_.toInt).getOrElse(200000)
    val targets = if (args.length > 1) args.tail.map(_.toInt).toSeq
                  else Seq(1000, 8000, 32000)
    val hist = synthHistogram(nWords)
    val totalSyms = hist.map(w => w._1.length.toLong).sum
    println(s"histogram: $nWords words, $totalSyms symbol positions")
    targets.foreach { n =>
      val t0 = System.nanoTime()
      val merges = graft.ops.BpeTrainer.localTrain(hist, n)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"merges=$n%6d trained=${merges.size}%6d wall=$sec%8.2f s" +
        f" (${merges.size / math.max(sec, 1e-9)}%.0f merges/s)")
    }
  }

  /** Deterministic histogram: LCG-hashed words of 3–12 lowercase letters,
    * count = Zipf-ish nWords/(rank+1) capped, so top pairs concentrate
    * like real text. */
  def synthHistogram(nWords: Int): Array[(Array[String], Long)] = {
    def mix(x0: Long): Long = {
      var x = x0 * 6364136223846793005L + 1442695040888963407L
      x ^= (x >>> 29); x *= -5840758589994634535L; x ^= (x >>> 32); x
    }
    Array.tabulate(nWords) { r =>
      val len = 3 + (mix(r.toLong) & 0x7fffffff).toInt % 10
      val chars = Array.tabulate(len)(i =>
        ('a' + ((mix(r.toLong * 31 + i) & 0x7fffffff) % 26).toInt).toChar.toString)
      (chars, math.max(1L, (nWords / (r + 1)).toLong))
    }
  }
}
