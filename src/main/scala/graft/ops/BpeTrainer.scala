package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE TRAINING (Sennrich et al. 2016) — the job that produces
  * the merge table [[graft.functions.BpeVocab]] embeds. Tokenizing with a
  * trained vocab is table stakes; a 100 TB pipeline also has to TRAIN that
  * vocab on its own corpus, and that is a Spark-shaped problem:
  *
  *   1. ONE corpus-scale pass builds the weighted word histogram
  *      (pre-token → count). Everything after runs at VOCAB scale
  *      (distinct pre-tokens — millions of rows for a 100 TB corpus,
  *      cluster-trivial), which is the classic trainer optimization:
  *      merge statistics depend only on the histogram, never the corpus.
  *   2. Each merge round is one distributed aggregation over the
  *      histogram: explode adjacent symbol pairs weighted by word count,
  *      pick the max (ties → lexicographically smallest pair, so training
  *      is deterministic), apply the merge to every word's symbol array
  *      with a higher-order fold, and re-contract identical symbol
  *      sequences. Only the single winning pair ever reaches the driver —
  *      the loop is inherently sequential (merge k rewrites the
  *      statistics merge k+1 counts), so a driver-side loop over
  *      executor-side aggregations is the correct distribution, the same
  *      shape as an MLlib training iteration.
  *
  * Lineage is truncated with `localCheckpoint` each round; without it
  * round k would recompute all k-1 previous merge applications and the
  * loop goes quadratic.
  *
  * The per-round merge application folds left-to-right: append each
  * symbol, or fuse it with the accumulator tail when (tail, symbol) is
  * the winning pair. For a SINGLE pair per round this fold is exactly the
  * scan-and-skip left-to-right non-overlapping application (the fused
  * token `a+b` can never equal `a`, since `b` is nonempty, so a fresh
  * merge output never false-matches as a left part in the same round).
  */
object BpeTrainer {

  /** Weighted word histogram: the one corpus-scale pass. Pre-tokens are
    * [[TextOps.bpeTokens]] (letter runs / digit runs / single other
    * chars); symbols start as single CODEPOINTS ("(?s)." — Java regex
    * matches a full surrogate pair, so supplementary-plane text splits on
    * codepoint boundaries, matching the tokenizer's id scheme). */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.bpeTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(regexp_extract_all(col("w"), lit("(?s)."), lit(0)).as("syms"),
        col("c"))

  /** One round's merge application: fold `syms`, fusing adjacent (a, b). */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(size(acc) === 0, array(s)) // ANSI element_at throws on []
        .when(element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Train `nMerges` merges on the corpus; returns them in rank order.
    * Stops early if the vocabulary runs out of adjacent pairs. */
  def train(docs: DataFrame, textCol: String, nMerges: Int)
      : IndexedSeq[(String, String)] = {
    var vocab = wordHistogram(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      // pair statistics: one vocab-scale aggregation; a single row returns
      val best = vocab
        .select(posexplode(slice(col("syms"), lit(1), size(col("syms")) - 1))
            .as(Seq("i", "a")),
          col("syms"), col("c"))
        .select(col("a"), element_at(col("syms"), col("i") + 2).as("b"),
          col("c"))
        .groupBy("a", "b").agg(sum("c").as("n"))
        .orderBy(desc("n"), asc("a"), asc("b")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        val prev = vocab
        vocab = vocab
          .select(applyMerge(col("syms"), a, b).as("syms"), col("c"))
          .groupBy("syms").agg(sum("c").as("c"))
          .localCheckpoint()
        prev.unpersist() // previous round's checkpoint blocks
      }
    }
    vocab.unpersist()
    merges.toIndexedSeq
  }

  /** [[train]] as a relation: (rank BIGINT, lhs, rhs) in rank order. */
  def trainDf(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, nMerges).zipWithIndex
      .map { case ((a, b), r) => (r.toLong, a, b) }
      .toDF("rank", "lhs", "rhs")
  }
}
