package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model scoring — the CCNet/KenLM stage of a
  * real LLM data pipeline: train a cheap LM on a reference corpus (wiki),
  * score every crawl document by how well the reference model predicts it,
  * and filter/stratify on the score. Re-expressed Spark-first:
  *
  *  - TRAINING is two hash aggregations over the reference slice (unigram
  *    and bigram occurrence counts keyed by 8-byte polynomial hashes —
  *    text never shuffles), plus one scalar (vocabulary size). At 100 TB
  *    the count tables are vocabulary-scale, orders of magnitude smaller
  *    than the corpus, and build with map-side partials.
  *  - SCORING streams every document's bigrams (24-byte rows) through two
  *    hash joins against the count tables — AQE broadcasts them when the
  *    vocabulary fits, falls back to a shuffle join when it does not —
  *    then reduces per document. Work ∝ tokens, state ∝ vocabulary.
  *  - The per-token probability is add-one-smoothed
  *    `p = (c(w1,w2) + 1) / (c(w1) + V)` — a single division of integer
  *    counts, bit-identical across engines. The per-doc aggregate folds
  *    probabilities in POSITION order (collect → sort → fold), so
  *    `mean_p` is deterministic and oracle-replayable bit-for-bit; a
  *    deployment that prefers log-space perplexity ranks identically
  *    (log of a mean vs mean of logs differ, but both are monotone
  *    per-doc quality signals — the rational form is the one an exact
  *    cross-engine gate can compare, see PLANS on transcendental drift).
  *
  * Reference analog: none — the reference is a TSDB; this extends the
  * engine toward the curation surface (BASELINE.json north star). */
object NgramLmOps {

  /** (id, per-bigram rows): pos, h1 = hash of token at pos, h12 = 2-gram
    * polynomial hash of tokens [pos, pos+2). Row-local zip of the word-hash
    * array with its 2-shingles — no array duplication per bigram, no
    * shuffle. Docs with < 2 tokens emit nothing. */
  def bigramStream(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    docs.repartition(par)
      .select(col(idCol).as("id"),
        TextOps.wordHashes(TextOps.tokens(col(textCol))).as("whs"))
      .select(col("id"),
        posexplode(arrays_zip(
          when(size(col("whs")) >= 2,
            slice(col("whs"), lit(1), size(col("whs")) - 1))
            .otherwise(array().cast("array<bigint>")).as("h1"),
          TextOps.shingleHashesAll(col("whs"), 2).as("h12"))))
      .select(col("id"), col("pos"),
        col("col.h1").as("h1"), col("col.h12").as("h12"))
  }

  /** Train on `reference` + score `docs`: (idCol, n_bigrams, n_oov,
    * mean_p). `n_oov` counts bigrams unseen in the reference; docs with
    * fewer than 2 tokens are absent (no transitions to score). */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
              reference: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val ref = bigramStream(reference, idCol, textCol).localCheckpoint(false)
    val uni = ref.groupBy("h1").agg(count(lit(1)).as("c1"))
    val big = ref.groupBy("h12").agg(count(lit(1)).as("c2"))
    val vocab = uni.count() // distinct reference unigram types (driver scalar)
    val stream = bigramStream(docs, idCol, textCol)
    val probs = stream
      .join(uni, Seq("h1"), "left")
      .join(big, Seq("h12"), "left")
      .select(col("id"), col("pos"), col("c2").isNull.as("oov"),
        ((coalesce(col("c2"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c1"), lit(0L)) + lit(vocab))).as("p"))
    // position-ordered fold: deterministic float sum (per-doc arrays are
    // document-length-bounded — never corpus-scale state)
    probs.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("oov"), 1L).otherwise(0L)).as("n_oov"),
        aggregate(
          transform(sort_array(collect_list(struct(col("pos"), col("p")))),
            x => x("p")),
          lit(0.0), (a, b) => a + b).as("sum_p"))
      .select(col("id").as(idCol), col("n_bigrams"), col("n_oov"),
        (col("sum_p") / col("n_bigrams")).as("mean_p"))
  }
}
