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

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection via
    * Importance Resampling" — the hashed-n-gram instantiation): every doc
    * scored under TWO bigram LMs — the reference (target-domain) model and
    * the self (raw-corpus) model — and weighted by the likelihood ratio.
    * Docs that look more reference-like than corpus-average carry
    * weight > 1 and are favored by the downstream sampler.
    *
    * Here the per-model signal is the same rational mean transition
    * probability as [[lmScore]] (see that scaladoc for why no
    * transcendental rides the compared output), so
    * `weight = mean_p_ref / mean_p_self` is one further exact division.
    * FUSED plan: one bigram stream, all four count joins in a single pass
    * (the two models' tables probe the same 24-byte rows), both folds from
    * one sorted collect — two LMs cost one extra pair of vocabulary-scale
    * joins, not a second corpus scan.
    * Output: (idCol, n_bigrams, mean_p_ref, mean_p_self, weight). */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  reference: DataFrame): DataFrame = {
    val ref = bigramStream(reference, idCol, textCol).localCheckpoint(false)
    val self = bigramStream(docs, idCol, textCol).localCheckpoint(false)
    val uniR = ref.groupBy("h1").agg(count(lit(1)).as("c1r"))
    val bigR = ref.groupBy("h12").agg(count(lit(1)).as("c2r"))
    val uniS = self.groupBy("h1").agg(count(lit(1)).as("c1s"))
    val bigS = self.groupBy("h12").agg(count(lit(1)).as("c2s"))
    val vR = uniR.count()
    val vS = uniS.count()
    def p(c2: Column, c1: Column, v: Long): Column =
      (coalesce(c2, lit(0L)) + lit(1L)).cast("double") /
        (coalesce(c1, lit(0L)) + lit(v))
    val probs = self // the scoring stream IS the self-training stream
      .join(uniR, Seq("h1"), "left").join(bigR, Seq("h12"), "left")
      .join(uniS, Seq("h1"), "left").join(bigS, Seq("h12"), "left")
      .select(col("id"), col("pos"),
        p(col("c2r"), col("c1r"), vR).as("pr"),
        p(col("c2s"), col("c1s"), vS).as("ps"))
    probs.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sort_array(collect_list(struct(col("pos"), col("pr"), col("ps"))))
          .as("_o"))
      .select(col("id").as(idCol), col("n_bigrams"),
        (aggregate(transform(col("_o"), x => x("pr")), lit(0.0),
          (a, b) => a + b) / col("n_bigrams")).as("mean_p_ref"),
        (aggregate(transform(col("_o"), x => x("ps")), lit(0.0),
          (a, b) => a + b) / col("n_bigrams")).as("mean_p_self"))
      .withColumn("weight", col("mean_p_ref") / col("mean_p_self"))
  }

  /** (id, per-trigram rows): pos plus every hash the backoff chain probes —
    * h123 (3-gram), h12/h23 (the two 2-grams), h2/h3 (the two trailing
    * unigrams). Row-local zip of the word-hash array with its 2- and
    * 3-shingle arrays; docs with < 3 tokens emit nothing. */
  def trigramStream(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val n = size(col("whs"))
    def sl(c: Column, from: Int) =
      when(n >= 3, slice(c, lit(from), n - 2)).otherwise(array().cast("array<bigint>"))
    docs.repartition(par)
      .select(col(idCol).as("id"),
        TextOps.wordHashes(TextOps.tokens(col(textCol))).as("whs"))
      // materialize the 2-shingle array ONCE and slice it for h12 and h23 —
      // same duplicated-HOF trap winnowedFingerprints documents
      .withColumn("sh2", TextOps.shingleHashesAll(col("whs"), 2))
      .select(col("id"),
        posexplode(arrays_zip(
          TextOps.shingleHashesAll(col("whs"), 3).as("h123"),
          sl(col("sh2"), 1).as("h12"),
          sl(col("sh2"), 2).as("h23"),
          sl(col("whs"), 2).as("h2"),
          sl(col("whs"), 3).as("h3"))))
      .select(col("id"), col("pos"), col("col.h123").as("h123"),
        col("col.h12").as("h12"), col("col.h23").as("h23"),
        col("col.h2").as("h2"), col("col.h3").as("h3"))
  }

  /** Stupid-backoff trigram scoring (Brants et al. 2007 — the large-corpus
    * LM shape: unnormalized scores, no discount estimation, exactly the
    * count ratios):
    *   S(w3|w1w2) = c123/c12               when the trigram was seen
    *              = 0.4 * c23/c2           backing off to the bigram
    *              = 0.4*0.4 * (c3+1)/(T+V) at the (add-one) unigram floor
    * Every branch is integer-count divisions and double multiplies —
    * bit-replayable. Output: (idCol, n_trigrams, n_bo_bi, n_bo_uni,
    * mean_s) where the n_bo_* columns count backoff-level hits. Counts
    * build from the reference slice (trigram/bigram tables vocabulary²-
    * scale at worst, unigram + scalars T/V); scoring is four hash joins
    * over the trigram stream + the same position-ordered fold as
    * [[lmScore]]. */
  /** Interpolated KNESER-NEY bigram scoring (the smoothing real LM-filter
    * deployments actually use — KenLM's default): absolute discount D on
    * seen bigrams, mass redistributed through the CONTINUATION
    * distribution (how many distinct contexts a word follows, not how
    * often it occurs — the "San Francisco" insight: "Francisco" is
    * frequent but follows one context, so its continuation probability is
    * tiny). Per transition, with all counts from the reference slice:
    *
    *   p(w2|w1) = max(c(w1,w2) − D, 0)/c(w1) + (D·N1+(w1,·)/c(w1)) · pc(w2)
    *   pc(w2)   = N1+(·,w2) / N1+(·,·)    (floor 1/(N1+(·,·)+1) unseen)
    *   c(w1)=0  → p = pc(w2)              (unseen context backs off whole)
    *
    * Every term is a ratio of integer counts with a fixed fold order, so
    * the oracle replays it bit-for-bit (same no-transcendental stance as
    * [[lmScore]]). Same distributed shape too: vocabulary-scale count
    * tables (c1 + follower-fanout keyed by h1, bigram counts by h12,
    * predecessor-fanout by h2), three hash joins over the 32-byte bigram
    * stream, position-ordered per-doc fold.
    * Output: (idCol, n_bigrams, n_unseen, mean_p). */
  def knScore(docs: DataFrame, idCol: String, textCol: String,
              reference: DataFrame, discount: Double = 0.75): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // (id, pos, h1, h2, h12) — the bigramStream shape plus the SECOND
    // word's hash (the continuation distribution keys on it)
    def stream(src: DataFrame): DataFrame = src.repartition(par)
      .select(col(idCol).as("id"),
        TextOps.wordHashes(TextOps.tokens(col(textCol))).as("whs"))
      .select(col("id"),
        posexplode(arrays_zip(
          when(size(col("whs")) >= 2,
            slice(col("whs"), lit(1), size(col("whs")) - 1))
            .otherwise(array().cast("array<bigint>")).as("h1"),
          when(size(col("whs")) >= 2,
            slice(col("whs"), lit(2), size(col("whs")) - 1))
            .otherwise(array().cast("array<bigint>")).as("h2"),
          TextOps.shingleHashesAll(col("whs"), 2).as("h12"))))
      .select(col("id"), col("pos"), col("col.h1").as("h1"),
        col("col.h2").as("h2"), col("col.h12").as("h12"))
    val ref = stream(reference).localCheckpoint(false)
    val c1t = ref.groupBy("h1")
      .agg(count(lit(1)).as("c1"), countDistinct("h12").as("nf1"))
    val c12t = ref.groupBy("h12").agg(count(lit(1)).as("c12"))
    val nbt = ref.groupBy("h2").agg(countDistinct("h12").as("nb2"))
    val nbb = ref.select(countDistinct("h12")).head().getLong(0)
    val joined = stream(docs)
      .join(c1t, Seq("h1"), "left")
      .join(c12t, Seq("h12"), "left")
      .join(nbt, Seq("h2"), "left")
      .select(col("id"), col("pos"), col("c12").isNull.as("unseen"),
        col("c1"), col("nf1"), col("c12"),
        when(col("nb2").isNull, lit(1.0) / (nbb + 1))
          .otherwise(col("nb2").cast("double") / nbb).as("pcont"))
    val probs = joined.select(col("id"), col("pos"), col("unseen"),
      when(col("c1").isNull, col("pcont"))
        .otherwise(
          greatest(coalesce(col("c12"), lit(0L)) - lit(discount), lit(0.0))
            / col("c1") +
            (lit(discount) * col("nf1") / col("c1")) * col("pcont"))
        .as("p"))
    probs.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("unseen"), 1L).otherwise(0L)).as("n_unseen"),
        aggregate(
          transform(sort_array(collect_list(struct(col("pos"), col("p")))),
            x => x("p")),
          lit(0.0), (a, b) => a + b).as("sum_p"))
      .select(col("id").as(idCol), col("n_bigrams"), col("n_unseen"),
        (col("sum_p") / col("n_bigrams")).as("mean_p"))
  }

  def lmScoreBackoff(docs: DataFrame, idCol: String, textCol: String,
                     reference: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val refWhs = reference.repartition(par)
      .select(TextOps.wordHashes(TextOps.tokens(col(textCol))).as("whs"))
      .localCheckpoint(false)
    val uni = refWhs.select(explode(col("whs")).as("h")).groupBy("h")
      .agg(count(lit(1)).as("c_uni"))
      .localCheckpoint(false)
    val bi = refWhs.select(explode(TextOps.shingleHashesAll(col("whs"), 2)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c_bi"))
    val tri = refWhs.select(explode(TextOps.shingleHashesAll(col("whs"), 3)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c_tri"))
    val totalToks = refWhs.agg(sum(size(col("whs")))).head().getLong(0)
    val vocab = uni.count()
    val stream = trigramStream(docs, idCol, textCol)
    val joined = stream
      .join(tri.select(col("h").as("h123"), col("c_tri")), Seq("h123"), "left")
      .join(bi.select(col("h").as("h12"), col("c_bi").as("c12")), Seq("h12"), "left")
      .join(bi.select(col("h").as("h23"), col("c_bi").as("c23")), Seq("h23"), "left")
      .join(uni.select(col("h").as("h2"), col("c_uni").as("c2")), Seq("h2"), "left")
      .join(uni.select(col("h").as("h3"), col("c_uni").as("c3")), Seq("h3"), "left")
    val s = when(col("c_tri").isNotNull,
        col("c_tri").cast("double") / col("c12"))
      .when(col("c23").isNotNull,
        lit(0.4) * (col("c23").cast("double") / col("c2")))
      .otherwise(lit(0.4) * lit(0.4) *
        ((coalesce(col("c3"), lit(0L)) + lit(1L)).cast("double") /
          (lit(totalToks) + lit(vocab))))
    val level = when(col("c_tri").isNotNull, 0)
      .when(col("c23").isNotNull, 1).otherwise(2)
    joined.select(col("id"), col("pos"), s.as("s"), level.as("lvl"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_bo_bi"),
        sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_bo_uni"),
        aggregate(
          transform(sort_array(collect_list(struct(col("pos"), col("s")))),
            x => x("s")),
          lit(0.0), (a, b) => a + b).as("sum_s"))
      .select(col("id").as(idCol), col("n_trigrams"), col("n_bo_bi"),
        col("n_bo_uni"), (col("sum_s") / col("n_trigrams")).as("mean_s"))
  }
}
