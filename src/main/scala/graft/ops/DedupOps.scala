package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for LLM training corpora (BASELINE.json north
  * star). Four families, all shuffle-frugal by construction:
  *
  *  - exact:        hash-groupBy on a content hash (8-byte shuffle keys)
  *  - n-gram Jaccard: EXACT set similarity via an inverted-index join on
  *                  shingle *hashes* — the classic scale shape; never a
  *                  cross product, never text on the wire
  *  - MinHash+LSH:  signature → band buckets → candidate pairs → exact
  *                  verification; at 100 TB this is the primary path (the
  *                  inverted index still enumerates every co-shingle pair,
  *                  LSH only enumerates probable ones)
  *  - SimHash:      fingerprint banding with a pigeonhole guarantee — for
  *                  Hamming radius r, splitting the fingerprint into r+1
  *                  bands makes the candidate set EXACT, not probabilistic
  *  - embedding:    cosine near-dup over dense vectors (see SimilarityOps
  *                  for the ANN-bucketed variant)
  *
  * Skew note (100 TB): a boilerplate shingle shared by millions of docs makes
  * the inverted-index join quadratic in that shingle's posting list. The
  * standard mitigation — drop shingles with document frequency above a cap —
  * is `maxDocFreq`; it changes the measured Jaccard for affected pairs, so
  * the oracle-compared queries leave it off at test scale.
  */
object DedupOps {

  /** Hot-shingle sets up to this many entries broadcast in the df-capped
    * Jaccard guard (~8 bytes each → tens of MB, far under any broadcast
    * limit); larger sets anti-join via shuffle instead of risking a driver
    * OOM on a corpus whose boilerplate head is itself huge. */
  val MaxBroadcastHotShingles: Long = 5000000L

  /** CLUSTER-SAFE pin for a DataFrame read by several consumers inside one
    * pair-core job graph (VERDICT r14 watch item #2): `persist`, not
    * `localCheckpoint`.
    *
    * Node-loss semantics — the design decision: `localCheckpoint` truncates
    * lineage and stores UNREPLICATED executor-local blocks; compute-once
    * and cheap on local[32], but on a 1000-executor cluster one lost node
    * fails the whole job mid-dedup because the truncated lineage cannot
    * rebuild the lost blocks. `persist` keeps the lineage rooted at the
    * parquet scan, so a lost block is recomputed and the job degrades
    * instead of dying.
    *
    * Storage level — the r15 verdict's watch item #1: r15 used DISK_ONLY
    * ("pinned sets are corpus-scale, never compete with execution
    * memory"), which taxed SMALL pinned sets with a disk round-trip they
    * didn't need (measured: dedup_incremental 3.5 → 4.9 s,
    * engine_stream_incremental 9.5 → 14.5 s at sf0.1). MEMORY_AND_DISK is
    * the size-aware fix WITHOUT a hand-tuned threshold: Spark's unified
    * memory manager already arbitrates — cached blocks beyond
    * `spark.memory.storageFraction` are evictable, so when execution
    * (shuffle/agg) needs the space, a MEMORY_AND_DISK block is dropped to
    * disk and the pin degrades to exactly r15's DISK_ONLY behavior; when
    * the pinned set is small (an incremental batch, a bench shard), it
    * stays in memory and the round-trip disappears. Node loss is
    * unchanged: either level keeps lineage rooted at the scan.
    *
    * The accepted trade: persisted plans are tracked by the session
    * CacheManager until released (Bench's per-rep `clearCache` does; a
    * long-lived session eventually should too), where localCheckpoint
    * blocks die with the RDD reference. Iterative faces that NEED lineage
    * truncation — BPE trainer rounds, label propagation, k-means, the
    * quality-model GD loop — keep `localCheckpoint` by design: persisting
    * every round of an iterative plan keeps the whole lineage chain AND
    * every round's blocks alive at once. */
  private def pin(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Identity-hash width pinned in the persisted index MANIFESTS: the
    * packed double-prime 62-bit key. Bumping the hash scheme must bump
    * this, so a stale on-disk index fails loudly at probe time instead of
    * joining nothing (silent zero recall). */
  val HashWidthBits = 62

  /** (id, shingles) — distinct n-word shingle hash sets per document; docs
    * with fewer than n tokens drop out (no shingles → no similarity).
    *
    * tokenize→hash→shingle runs as ONE pass per row: the hash stages are
    * native expressions that evaluate their child exactly once (the portable
    * higher-order formulation re-evaluated the word-hash array per shingle
    * position — no CSE inside lambda bodies). The result is materialized
    * with a [[pin]] barrier (cluster-safe persist — see pin's scaladoc for
    * the node-loss decision) because every consumer (inverted index, LSH,
    * verification) reads it 2-3×. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // spread the per-row hash compute across cores: small benchmark inputs
    // arrive as a single parquet row group = ONE scan task (a real corpus
    // arrives as thousands of splits and doesn't need this)
    val par = df.sparkSession.sparkContext.defaultParallelism
    pin(df.repartition(par)
      .select(col(idCol),
        TextOps.shingleHashesOfHashes(
          TextOps.wordHashes(TextOps.tokens(col(textCol))), n).as("shingles"))
      .filter(size(col("shingles")) > 0))
  }

  private def jaccard(common: Column, sa: Column, sb: Column): Column =
    common.cast("double") / (sa + sb - common)

  /** EXACT Jaccard near-dup pairs via inverted index: explode shingle hashes,
    * self-join on the 8-byte hash, count co-occurrences, scale by set sizes.
    * Output: (id_a, id_b, jaccard) with jaccard >= threshold.
    *
    * `maxDocFreq`: optionally drop shingles appearing in more than this many
    * documents before pairing (skew guard — see class doc). */
  def jaccardPairsExact(shingles: DataFrame, idCol: String, threshold: Double,
                        maxDocFreq: Option[Int] = None): DataFrame =
    pairCommonCounts(shingles, idCol, maxDocFreq)
      .select(col("id_a"), col("id_b"),
        jaccard(col("common"), col("sz_a"), col("sz_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("id_a", "id_b")

  /** NEAR-SUBSET (containment) dedup pairs — Broder's containment
    * coefficient C(A,B) = |A∩B| / min(|A|,|B|) over distinct n-gram
    * shingle sets: the curation measure for "one document is (mostly)
    * embedded in another". Jaccard misses these BY CONSTRUCTION — a
    * 100-token article quoted whole inside a 10,000-token page has
    * J ≈ 0.01 but C = 1.0; boilerplate-wrapped rehosts, quote-farms and
    * template-padded pages are exactly this shape. Same inverted-index
    * equi-join skeleton (and df-cap skew guard) as [[jaccardPairsExact]];
    * only the normalization differs. Output (id_a, id_b, containment,
    * jaccard) at containment >= threshold — Jaccard rides along so a
    * consumer separates near-SUBSET (high C, low J) from near-DUPLICATE
    * (both high) without a second pass. */
  def containmentPairs(shingles: DataFrame, idCol: String, threshold: Double,
                       maxDocFreq: Option[Int] = None): DataFrame =
    pairCommonCounts(shingles, idCol, maxDocFreq)
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") / least(col("sz_a"), col("sz_b")))
          .as("containment"),
        jaccard(col("common"), col("sz_a"), col("sz_b")).as("jaccard"))
      .filter(col("containment") >= threshold)
      .orderBy("id_a", "id_b")

  /** Shared pair core of [[jaccardPairsExact]] / [[containmentPairs]]:
    * (id_a, id_b, common, sz_a, sz_b) via the inverted index. */
  private def pairCommonCounts(shingles: DataFrame, idCol: String,
                               maxDocFreq: Option[Int]): DataFrame = {
    val ex0 = shingles.select(col(idCol).as("id"), explode(col("shingles")).as("sh"))
    val ex = maxDocFreq.fold(ex0) { cap =>
      // The HOT set (df > cap) is small by construction — bounded by
      // total-postings/cap members, and in practice boilerplate shingles
      // are a thin head — so anti-join it rather than joining the postings
      // against the vocabulary-sized RARE complement (exactly backwards at
      // 100 TB). Broadcast only while the set is actually broadcastable:
      // the bound is postings/cap, which a 100 TB corpus can push past any
      // driver; past the threshold fall back to a shuffled anti-join (AQE
      // still picks the best physical strategy for the measured size).
      val hot = pin(ex0.groupBy("sh").count().filter(col("count") > cap)
        .select("sh"))
      val hotSide =
        if (hot.count() <= MaxBroadcastHotShingles) broadcast(hot) else hot
      ex0.join(hotSide, Seq("sh"), "left_anti")
    }
    val sizes = shingles.select(col(idCol).as("id"), size(col("shingles")).as("sz"))
    val common = ex.as("a").join(ex.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
  }

  /** VIDEO temporal dedup over per-frame hash sets — near-duplicate
    * videos (re-cuts, re-keyframed rips, trims) share most of their
    * frame-level perceptual hashes even when no byte of the container
    * matches. Input: one row per (id, frame hash) — e.g.
    * [[graft.ops.MultimodalOps.videoPhashes]] output. Candidacy is an
    * inverted-index equi-join on the 8-byte hash (the shingle-Jaccard
    * skeleton: only id pairs shuffle, frames never do); the score is
    * Broder containment over DISTINCT frame-hash sets — shared /
    * min(|A|,|B|) — so a short clip cut from a longer video still scores
    * 1.0. Output (id_a, id_b, shared, overlap) at overlap >= threshold.
    *
    * `maxDocFreq` — the skew guard this join NEEDS at corpus scale: a
    * frame hash shared by k assets contributes k² join rows, and real
    * video/audio corpora have a fat head of CORPUS-COMMON hashes (black
    * frames, title cards, silence windows fingerprint identically across
    * millions of assets). Hashes whose document frequency exceeds the cap
    * are dropped BEFORE both the pair join and the set sizes — i.e. the
    * score becomes containment over the INFORMATIVE hash sets. Unlike the
    * Jaccard twin [[jaccardPairsExact]] (sizes stay uncapped there), the
    * sizes here must shrink with the cap: min-normalization would
    * otherwise sink a short clip whose set is dominated by common hashes
    * (a 3-frame clip with a corpus-common title card falls from C = 1/2
    * to 1/3 under uncapped sizes), and "shares all its distinctive
    * content" is exactly what containment dedup is asking. An asset whose
    * EVERY hash is corpus-common (all-black video, pure silence) carries
    * zero distinguishing signal and drops out entirely. Same broadcast-
    * size guard as the text core ([[MaxBroadcastHotShingles]]). */
  def hashSetContainmentPairs(frameHashes: DataFrame, idCol: String, hashCol: String,
                    threshold: Double, maxDocFreq: Option[Int] = None): DataFrame = {
    val raw = pin(frameHashes
      .select(col(idCol).as("id"), col(hashCol).as("fh")).distinct()
    ) // read by both sides of the pair join + sizes
    val sets = maxDocFreq.fold(raw) { cap =>
      // identical shape to pairCommonCounts' guard: the HOT set is bounded
      // by total-postings/cap members, so anti-join against IT (broadcast
      // while it actually fits, shuffled anti-join past the bound).
      val hot = pin(raw.groupBy("fh").count().filter(col("count") > cap)
        .select("fh"))
      val hotSide =
        if (hot.count() <= MaxBroadcastHotShingles) broadcast(hot) else hot
      pin(raw.join(hotSide, Seq("fh"), "left_anti"))
    }
    val sizes = sets.groupBy("id").agg(count(lit(1)).as("np"))
    val cm = sets.as("a").join(sets.as("b"),
        col("a.fh") === col("b.fh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    cm.join(sizes.select(col("id").as("id_a"), col("np").as("np_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("np").as("np_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("shared"),
        (col("shared").cast("double") / least(col("np_a"), col("np_b")))
          .as("overlap"))
      .filter(col("overlap") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** Benchmark-contamination check — the decontamination pass every
    * training corpus needs before an eval is trustworthy: for each TRAINING
    * document, the fraction of its distinct n-gram shingles that appear
    * anywhere in the BENCHMARK set. A doc at/above `minRatio` is flagged
    * (it likely embeds an eval item verbatim or near-verbatim).
    *
    * Scale shape: the benchmark side of a real decontamination run is tiny
    * (eval suites are MBs; the corpus is TBs), so its distinct shingle set
    * is collected into a broadcast hash join — the 100 TB training side
    * streams map-side through the probe with NO shuffle of text or of the
    * corpus's shingles; only the per-doc (id, hit-count) pairs aggregate.
    *
    * `isBenchmark` is a predicate over `idCol` (membership is usually
    * derivable from the id/source; pass a join against an id list
    * upstream when it is not).
    * Output: (idCol, n_shingles, n_hit, contamination) for flagged docs. */
  def benchmarkContamination(docs: DataFrame, idCol: String, textCol: String,
                             n: Int, isBenchmark: Column,
                             minRatio: Double): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, n)
    // NULL predicate = not-benchmark: without the coalesce, three-valued
    // logic would drop such docs from BOTH sides — an unchecked doc can
    // carry an eval item into the corpus with no error
    val isB = coalesce(isBenchmark, lit(false))
    val bench = sh.filter(isB)
      .select(explode(col("shingles")).as("sh")).distinct()
    val train = sh.filter(!isB)
    val hits = train.select(col(idCol), explode(col("shingles")).as("sh"))
      .join(broadcast(bench), "sh")
      .groupBy(idCol).agg(count(lit(1)).as("n_hit"))
    // LEFT join + coalesce: membership is decided by the ratio filter, not
    // the join — with minRatio = 0 every train doc (zero-hit included) must
    // appear, per the threshold contract
    train.select(col(idCol), size(col("shingles")).cast("long").as("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("contamination", col("n_hit").cast("double") / col("n_shingles"))
      .filter(col("contamination") >= minRatio)
      .select(col(idCol), col("n_shingles"), col("n_hit"), col("contamination"))
      .orderBy(idCol)
  }

  /** Shared contraction + rep-level LSH core: identical shingle SETS
    * (order-normalized) collapse to one representative before signatures —
    * exact duplicates are the dominant duplication mode of a real corpus,
    * and running banding + candidate distinct() at doc level is quadratic
    * in those cluster sizes. ONE array-key shuffle (a window over `_set`)
    * derives representative AND per-row membership: unlike the former
    * `collect_list` aggregation — whose buffer holds every member id of a
    * group in one in-memory array row and cannot spill — WindowExec
    * buffers a group through UnsafeExternalSorter WITH disk spill, so a
    * billion-member identical-text cluster degrades to a slow task, never
    * an executor OOM (VERDICT r9 #5). Returns
    * (reps: (_set, rid, cnt) one row per distinct set,
    *  members: (rid, id) one row per document,
    *  verified rep pairs: (rid_a, rid_b, jaccard)). */
  private def lshRepPairs(shingles: DataFrame, idCol: String, threshold: Double,
                          bands: Int, rows: Int): (DataFrame, DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(shingles.sparkSession)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("_set")
    val withRep = shingles.select(col(idCol).as("id"),
        sort_array(col("shingles")).as("_set"))
      .select(col("id"), col("_set"),
        min("id").over(w).as("rid"), count(lit(1)).over(w).as("cnt"))
      .localCheckpoint(false)
    val members = withRep.select(col("rid"), col("id"))
    // the representative row carries the group's set + size — no second
    // shuffle: reps are a filter of the already-partitioned window output
    val reps = withRep.filter(col("id") === col("rid"))
      .select(col("_set"), col("rid"), col("cnt"))
    // fan out before the k×|set| MinHash pass — same AQE-coalesce stance
    // as prepBandIndex: the window exchange above coalesces to one or two
    // partitions at batch scale (bytes-based), and the signature is the
    // compute-heavy step of every LSH face
    val sigs = reps
      .repartition(shingles.sparkSession.sparkContext.defaultParallelism)
      .select(col("rid"), col("_set"),
        TextOps.minHashSignature(col("_set"), bands * rows).as("sig"))
    val bnd = sigs.select(col("rid"), explode(TextOps.lshBands(col("sig"), bands, rows)).as("bb"))
      .select(col("rid"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = bnd.as("a").join(bnd.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.rid") < col("b.rid"))
      .select(col("a.rid").as("rid_a"), col("b.rid").as("rid_b"))
      .distinct()
    val repSets = reps.select(col("rid"), col("_set"))
    val verified = cand
      .join(repSets.select(col("rid").as("rid_a"), col("_set").as("sh_a")), "rid_a")
      .join(repSets.select(col("rid").as("rid_b"), col("_set").as("sh_b")), "rid_b")
      .select(col("rid_a"), col("rid_b"),
        jaccard(size(array_intersect(col("sh_a"), col("sh_b"))),
          size(col("sh_a")), size(col("sh_b"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    (reps, members, verified)
  }

  /** MinHash+LSH near-dup pairs: k-hash signature, `bands`×`rows` banding
    * (k = bands*rows), bucket join for candidates, then EXACT Jaccard
    * verification of each candidate — output is identical to
    * `jaccardPairsExact` up to LSH recall (for J >= 0.8 with 32×4 banding the
    * miss probability per pair is (1-0.8^4)^32 ≈ 5e-8).
    *
    * Candidate generation is contraction-based (`lshRepPairs`), so bucket
    * occupancy is counted in distinct shingle sets, never documents:
    * rep-level results expand to member pairs unchanged — cross-set pairs
    * via two output-sized joins, same-set pairs with Jaccard exactly 1.0. */
  def jaccardPairsLsh(shingles: DataFrame, idCol: String, threshold: Double,
                      bands: Int = 32, rows: Int = 4): DataFrame = {
    val (_, members, verified) = lshRepPairs(shingles, idCol, threshold, bands, rows)
    val cross = verified
      .join(members.select(col("id").as("_ia"), col("rid").as("rid_a")), "rid_a")
      .join(members.select(col("id").as("_ib"), col("rid").as("rid_b")), "rid_b")
      .select(least(col("_ia"), col("_ib")).as("id_a"),
        greatest(col("_ia"), col("_ib")).as("id_b"), col("jaccard"))
    val same = members.as("a").join(members.as("b"),
        col("a.rid") === col("b.rid") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        lit(1.0).as("jaccard"))
    cross.union(same).orderBy("id_a", "id_b")
  }

  /** INCREMENTAL near-dup matching: check an incoming batch against an
    * EXISTING corpus without ever pairing the corpus with itself — the
    * production shape of dedup at 100 TB. A curated corpus absorbs a daily
    * increment; re-running corpus-wide `jaccardPairsLsh` per batch is
    * O(corpus²-candidates) and mostly recomputes pairs already decided.
    * Here the corpus contributes ONLY its band index (rep-level
    * (band, bucket) keys — in a real deployment persisted once and reused
    * across batches); candidates are the equi-join of the increment's band
    * keys against it, so per-batch work scales with the INCREMENT and the
    * buckets it actually touches.
    *
    * Both sides contract identical shingle sets to representatives first
    * (same skew stance as `lshRepPairs`: bucket occupancy counts distinct
    * sets, never documents — a boilerplate batch cannot go quadratic), and
    * identical sets across sides collide in every band by construction, so
    * exact cross-duplicates are always candidates. Every candidate is
    * exact-verified by shingle-set intersection; output expands reps back
    * to documents: (new_id, old_id, jaccard) with jaccard >= threshold.
    *
    * Recall matches `jaccardPairsLsh` (same banding: miss ≈ 5e-8 per true
    * pair at J >= 0.8 with 32×4). Within-increment duplicates are the
    * in-batch `jaccardPairsLsh` face's job, composable after this drop. */
  def incrementalJaccardMatches(corpus: DataFrame, incoming: DataFrame,
                                idCol: String, textCol: String, n: Int,
                                threshold: Double, bands: Int = 32,
                                rows: Int = 4): DataFrame =
    incrementalMatchesFromIndex(
      prepBandIndex(corpus, idCol, textCol, n, bands, rows),
      incoming, idCol, textCol, n, threshold, bands, rows)

  /** Contract-to-reps + band the shingle sets of one document side:
    * (reps(_set, rid), members(rid, id), bands(rid, band, bucket)). */
  private def prepBandIndex(docs: DataFrame, idCol: String, textCol: String,
                            n: Int, bands: Int,
                            rows: Int): (DataFrame, DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("_set")
    val withRep = shingleSets(docs, idCol, textCol, n)
      .select(col(idCol).as("id"), sort_array(col("shingles")).as("_set"))
      .select(col("id"), col("_set"), min("id").over(w).as("rid"))
      .localCheckpoint(false)
    val members = withRep.select(col("rid"), col("id"))
    val reps = withRep.filter(col("id") === col("rid"))
      .select(col("_set"), col("rid"))
    // fan the reps out BEFORE the signature pass (r18): AQE coalesces the
    // _set window's exchange by BYTES, and a batch-scale rep table is a
    // few MB — one post-coalesce partition — while the k×|set| MinHash
    // below is the compute-heavy step (measured: the whole signature+band
    // stage ran as ONE task, 4.8 s of 4.8 s CPU, inside every incremental
    // micro-batch). An explicit numPartitions repartition is exempt from
    // AQE coalescing; the exchange carries (rid, _set) once.
    val bnd = reps
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("rid"),
        explode(TextOps.lshBands(
          TextOps.minHashSignature(col("_set"), bands * rows),
          bands, rows)).as("bb"))
      .select(col("rid"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    (reps, members, bnd)
  }

  /** PERSIST the corpus-side band index — built once per corpus epoch,
    * reused by every subsequent increment (the deployment shape the
    * incremental operator's cost model assumes; rebuilding the corpus side
    * per batch would re-pay O(corpus) shingling every day). Layout:
    * `<dir>/reps`, `<dir>/members`, `<dir>/bands` parquet. */
  def writeCorpusBandIndex(corpus: DataFrame, idCol: String, textCol: String,
                           n: Int, dir: String, bands: Int = 32,
                           rows: Int = 4): Unit = {
    val (reps, members, bnd) = prepBandIndex(corpus, idCol, textCol, n, bands, rows)
    reps.write.mode("overwrite").parquet(s"$dir/reps")
    members.write.mode("overwrite").parquet(s"$dir/members")
    bnd.write.mode("overwrite").parquet(s"$dir/bands")
    writeIndexManifest(corpus.sparkSession, dir, n, bands, rows)
  }

  /** One-row (n, bands, rows) manifest beside the reps/members/bands
    * parquet: the band/bucket join keys are a function of these three, so
    * an increment probed under DIFFERENT parameters computes keys the
    * index never wrote — no error, just near-zero candidate recall. The
    * read side validates and fails loudly instead. */
  private def writeIndexManifest(spark: org.apache.spark.sql.SparkSession,
                                 dir: String, n: Int, bands: Int,
                                 rows: Int): Unit = {
    import spark.implicits._
    Seq((n, bands, rows)).toDF("n", "bands", "rows")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/manifest")
  }

  private def validateIndexManifest(spark: org.apache.spark.sql.SparkSession,
                                    dir: String, n: Int, bands: Int,
                                    rows: Int): Unit = {
    val m = spark.read.parquet(s"$dir/manifest")
      .select("n", "bands", "rows").head()
    val (wn, wb, wr) = (m.getInt(0), m.getInt(1), m.getInt(2))
    require(wn == n && wb == bands && wr == rows,
      s"corpus band index at $dir was written with (n=$wn, bands=$wb, " +
        s"rows=$wr) but is being probed with (n=$n, bands=$bands, " +
        s"rows=$rows) — mismatched parameters silently produce near-zero " +
        "candidate recall; rebuild the index or match the parameters")
  }

  /** Seed an EPOCH-PARTITIONED working index from a flat corpus index
    * (see [[streamingIncrementalDedup]]): each of reps/members/bands moves
    * under an `epoch=0` partition dir, so every later epoch append is an
    * idempotent overwrite of its own partition — replaying a micro-batch
    * after a mid-write crash rewrites the same `epoch=N` dirs instead of
    * double-appending (the foreachBatch exactly-once recipe). The extra
    * `epoch` partition column is inert downstream: every index consumer
    * projects named columns. */
  def initEpochBandIndex(spark: org.apache.spark.sql.SparkSession,
                         corpusIndexDir: String, workDir: String): Unit = {
    Seq("reps", "members", "bands").foreach { part =>
      spark.read.parquet(s"$corpusIndexDir/$part")
        .write.mode("overwrite").parquet(s"$workDir/$part/epoch=0")
    }
    spark.read.parquet(s"$corpusIndexDir/manifest")
      .coalesce(1).write.mode("overwrite").parquet(s"$workDir/manifest")
  }

  /** STREAMING incremental dedup — the production corpus build: each
    * micro-batch of incoming documents matches against the persisted band
    * index (all epochs so far), its verified matches land in
    * `outDir/batch=<id>`, and its KEPT documents (no corpus match —
    * within-batch duplicates survive by the incremental contract) grow the
    * index as a new epoch. Batch t therefore deduplicates against
    * corpus ∪ kept(1..t−1): per-batch cost scales with the increment and
    * the buckets it touches, the corpus is never re-shingled, and both
    * the match output and the epoch append are partition-overwrite
    * idempotent, so a replayed batch converges to the same state.
    * AvailableNow + the shared checkpoint give the two-drain lifecycle
    * every other streaming face uses. */
  def streamingIncrementalDedup(stream: DataFrame, workIndexDir: String,
                                outDir: String, checkpointDir: String,
                                idCol: String, textCol: String, n: Int,
                                threshold: Double, bands: Int = 32,
                                rows: Int = 4): Unit = {
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processIncrementalBatch(batch, batchId, workIndexDir, outDir,
          idCol, textCol, n, threshold, bands, rows)
      }
      .start().awaitTermination()
  }

  /** One micro-batch of [[streamingIncrementalDedup]] — public so the
    * replay contract is directly testable. The corpus read is filtered to
    * `epoch <= batchId`: a batch REPLAYED after a crash between its epoch
    * append and the checkpoint commit would otherwise read its own
    * epoch-(batchId+1) output back as corpus, match every previously-kept
    * rep against itself at jaccard 1.0, and overwrite the epoch as empty —
    * permanently losing the kept docs. With the filter, a replay sees
    * exactly the pre-batch state and rewrites identical outputs. */
  def processIncrementalBatch(batch: DataFrame, batchId: Long,
                              workIndexDir: String, outDir: String,
                              idCol: String, textCol: String, n: Int,
                              threshold: Double, bands: Int = 32,
                              rows: Int = 4): Unit = {
    val s = batch.sparkSession
    validateIndexManifest(s, workIndexDir, n, bands, rows)
    // the increment is shingled ONCE: the same index that generates
    // candidates becomes (filtered to unmatched reps) the new epoch —
    // a rep whose set matched the corpus drops with ALL its members
    // (identical sets have identical jaccard), so kept groups are
    // exactly the reps with no verified match
    val (repsI, memI, bndI) = prepBandIndex(batch, idCol, textCol, n, bands, rows)
    def corpusSide(part: String): DataFrame =
      s.read.parquet(s"$workIndexDir/$part").filter(col("epoch") <= batchId)
    val corpusIdx = (corpusSide("reps"), corpusSide("members"), corpusSide("bands"))
    val repm = repMatchesFromIndexes(corpusIdx, (repsI, memI, bndI),
      threshold).persist()
    // Run the four independent output jobs CONCURRENTLY: the match
    // expansion and the three epoch appends all read only the persisted
    // pair core + the checkpointed increment index, so serializing them
    // wastes 3 jobs of wall latency per batch (measured: the streaming
    // face's cost is lifecycle-fixed, not data work — the serial→parallel
    // change took the sf0.1 row 13.3 → ~8 s). Mechanics: each write plans
    // its own job (independent QueryExecutions do NOT share shuffle
    // stages), but every expensive input is materialized-once-and-cached —
    // the pair core via persist (block computation is lock-deduplicated
    // per block by the BlockManager, so concurrent first-touch is safe)
    // and the increment index via prepBandIndex's localCheckpoint; what
    // each job re-derives from those cached blocks is cheap projection.
    // Each output dir has exactly one writer thread, so there is no race.
    //
    // MATERIALIZE the pinned pair core EAGERLY, before any writer spawns
    // (r17, observed at sf1 in the driver-parity bench): the FIRST touch
    // of an un-built InMemoryRelation runs the cache build inside the
    // CachedRDDBuilder monitor, and under AQE that build parks in its own
    // plan-update event loop while holding the monitor; a sibling job's
    // AQE loop probing isCachedColumnBuffersLoaded() then BLOCKS on the
    // same monitor — jstack showed the classic hold-and-wait with zero
    // load. With the core pre-built, every concurrent read is a
    // loaded-block read and the monitor is only ever held briefly.
    repm.count()
    val matched = repm.select(col("rid_new").as("rid")).distinct()
    def keep(df: DataFrame): DataFrame =
      df.join(matched, Seq("rid"), "left_anti")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val writes = Seq(
      Future(expandRepMatches(repm, memI, corpusIdx._2)
        .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")),
      Future(keep(repsI).write.mode("overwrite")
        .parquet(s"$workIndexDir/reps/epoch=${batchId + 1}")),
      Future(keep(memI).write.mode("overwrite")
        .parquet(s"$workIndexDir/members/epoch=${batchId + 1}")),
      Future(keep(bndI).write.mode("overwrite")
        .parquet(s"$workIndexDir/bands/epoch=${batchId + 1}")))
    // await ALL writers before surfacing any failure: rethrowing at the
    // first failed future would leave sibling writers running while the
    // replayed batch's overwrite races their late commits (and would leak
    // the persisted core)
    val results = writes.map(w => scala.util.Try(Await.result(w, Duration.Inf)))
    repm.unpersist()
    results.foreach(_.get)
  }

  /** The per-batch half of incremental dedup against a PERSISTED index
    * (see [[writeCorpusBandIndex]]): only the increment is shingled;
    * the corpus contributes three parquet reads. */
  def incrementalJaccardMatchesIndexed(indexDir: String, incoming: DataFrame,
                                       idCol: String, textCol: String, n: Int,
                                       threshold: Double, bands: Int = 32,
                                       rows: Int = 4): DataFrame = {
    val s = incoming.sparkSession
    validateIndexManifest(s, indexDir, n, bands, rows)
    incrementalMatchesFromIndex(
      (s.read.parquet(s"$indexDir/reps"), s.read.parquet(s"$indexDir/members"),
        s.read.parquet(s"$indexDir/bands")),
      incoming, idCol, textCol, n, threshold, bands, rows)
  }

  private def incrementalMatchesFromIndex(
      corpusIndex: (DataFrame, DataFrame, DataFrame), incoming: DataFrame,
      idCol: String, textCol: String, n: Int, threshold: Double,
      bands: Int, rows: Int): DataFrame = {
    val incIdx = prepBandIndex(incoming, idCol, textCol, n, bands, rows)
    expandRepMatches(
      repMatchesFromIndexes(corpusIndex, incIdx, threshold),
      incIdx._2, corpusIndex._2)
  }

  /** Rep-level verified cross-side matches of two band indexes:
    * (rid_new, rid_old, jaccard) at `jaccard >= threshold`. */
  private def repMatchesFromIndexes(
      corpusIndex: (DataFrame, DataFrame, DataFrame),
      incomingIndex: (DataFrame, DataFrame, DataFrame),
      threshold: Double): DataFrame = {
    val (repsC, _, bndC) = corpusIndex
    val (repsI, _, bndI) = incomingIndex
    val cand = bndI.as("i").join(bndC.as("c"),
        col("i.band") === col("c.band") && col("i.bucket") === col("c.bucket"))
      .select(col("i.rid").as("rid_new"), col("c.rid").as("rid_old"))
      .distinct()
    cand
      .join(repsI.select(col("rid").as("rid_new"), col("_set").as("sh_n")), "rid_new")
      .join(repsC.select(col("rid").as("rid_old"), col("_set").as("sh_o")), "rid_old")
      .select(col("rid_new"), col("rid_old"),
        jaccard(size(array_intersect(col("sh_n"), col("sh_o"))),
          size(col("sh_n")), size(col("sh_o"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Rep-level matches expanded to documents through both member maps:
    * (new_id, old_id, jaccard). */
  private def expandRepMatches(verified: DataFrame, memI: DataFrame,
                               memC: DataFrame): DataFrame =
    verified
      .join(memI.select(col("rid").as("rid_new"), col("id").as("new_id")), "rid_new")
      .join(memC.select(col("rid").as("rid_old"), col("id").as("old_id")), "rid_old")
      .select("new_id", "old_id", "jaccard")

  /** Near-dup CLUSTERS straight from shingle sets — output identical to
    * `components(jaccardPairsLsh(...).select("id_a","id_b"))` but the
    * iterative component algorithm runs on the CONTRACTED representative
    * graph: identical-set groups never become C(m,2) clique edges that the
    * components job immediately re-collapses; members inherit their
    * representative's label afterwards. Label convention is preserved
    * (component = min member id of the cluster) because each rep IS the min
    * id of its group, so the min rep id of a rep-cluster is the min doc id
    * of the expanded cluster. Groups of ≥2 identical docs with no
    * cross-set edge form their own component (labelled by their rep);
    * singleton docs with no edges stay absent, exactly like the pair-based
    * path. `components` defaults to label propagation; pass
    * `connectedComponentsStar` for adversarial-diameter graphs. */
  def jaccardClustersLsh(shingles: DataFrame, idCol: String, threshold: Double,
                         bands: Int = 32, rows: Int = 4,
                         components: DataFrame => DataFrame = connectedComponents(_)
                        ): DataFrame = {
    val (reps, members, verified) = lshRepPairs(shingles, idCol, threshold, bands, rows)
    val repComp = components(verified.select(col("rid_a").as("id_a"),
        col("rid_b").as("id_b")))
      .select(col("id").as("rid"), col("component"))
    // groups whose rep has a cross-set component: members inherit it
    val viaCross = members.join(repComp, "rid")
      .select(col("id"), col("component"))
    // multi-member groups with no cross-set edge: their own component
    val viaSame = members
      .join(reps.filter(col("cnt") >= 2).select(col("rid")), Seq("rid"))
      .join(repComp.select(col("rid")), Seq("rid"), "left_anti")
      .select(col("id"), col("rid").as("component"))
    viaCross.union(viaSame)
  }

  /** SimHash near-dup pairs within Hamming radius `maxHamming`, EXACT via
    * pigeonhole banding: the `bits`-wide fingerprint is split into
    * `maxHamming + 1` bands; two fingerprints within the radius must agree
    * exactly on at least one band, so the equality join on (band, value)
    * has perfect recall. Output: (id_a, id_b, hamming).
    *
    * The band join runs over DISTINCT fingerprints, not documents: a real
    * corpus concentrates fingerprints massively (boilerplate → thousands of
    * docs per identical 30-bit hash), and a doc-level band join plus
    * doc-pair distinct() is quadratic in those cluster sizes. Contracting
    * first makes candidate generation skew-immune — the self-join and its
    * distinct() touch only unique fingerprint values — and the doc-level
    * pair volume survives only where it IS the answer: identical-fingerprint
    * groups expand through one equi-join (Hamming 0 by definition), verified
    * cross-fingerprint pairs through two joins sized by the output. (A 10×
    * scale run with adversarially duplicated fingerprints went 247× before
    * this contraction, linear after — see LshDiag for the measurement.) */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   bits: Int = 30, maxHamming: Int = 1): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // one native pass per row (tokenize→hash→simhash), materialized once —
    // membership IS this table (8-byte fingerprint key per doc); both
    // expansion joins read it (see shingleSets note)
    val sims = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"),
        TextOps.simHashOfHashes(
          TextOps.wordHashes(TextOps.tokens(col(textCol))), bits).as("fp"))
      .localCheckpoint(false)
    bandedHammingPairs(sims, bits, maxHamming)
  }

  /** Near-dup pairs of an (id, fp) fingerprint table within Hamming radius
    * `maxHamming` — the banding core of [[simhashPairs]], factored out so
    * any bitwise fingerprint (SimHash, [[MultimodalOps.imagePhash]]
    * perceptual hashes, …) reuses the same skew-immune machinery.
    * Output: (id_a, id_b, hamming), ordered. */
  def bandedHammingPairs(fps: DataFrame, bits: Int, maxHamming: Int): DataFrame = {
    graft.functions.GraftFunctions.register(fps.sparkSession)
    val nBands = maxHamming + 1
    val w = (bits + nBands - 1) / nBands // band width
    // ONE 8-byte-key shuffle contracts to distinct fingerprints; membership
    // never rides an aggregation row (a billion-doc identical fingerprint
    // would make a collect_list row unspillable — VERDICT r9 #5), it stays
    // as the per-doc `fps` rows and expands through equi-joins below
    val grouped = fps.groupBy("fp").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val bandArr = array((0 until nBands).map { b =>
      struct(lit(b).as("band"),
        call_function("shiftright", col("fp"), lit(b * w))
          .bitwiseAND(lit((1L << w) - 1)).as("v"))
    }: _*)
    val ex = grouped.select(col("fp"), explode(bandArr).as("bb"))
      .select(col("fp"), col("bb.band").as("band"), col("bb.v").as("v"))
    // fingerprint-level candidates → exact Hamming verify (tiny relative to
    // doc-level: bounded by distinct-fp bucket occupancy, not doc counts)
    val fpPairs = ex.as("a").join(ex.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.fp") < col("b.fp"))
      .select(col("a.fp").as("sh_a"), col("b.fp").as("sh_b"))
      .distinct()
      .withColumn("hamming",
        TextOps.hamming(col("sh_a"), col("sh_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
    // expansion: verified fp pairs → doc pairs (output-sized joins; group
    // ids interleave, so order by id, not by fingerprint)
    val members = fps.select(col("fp"), col("id"))
    val cross = fpPairs
      .join(members.select(col("id").as("_ia"), col("fp").as("sh_a")), "sh_a")
      .join(members.select(col("id").as("_ib"), col("fp").as("sh_b")), "sh_b")
      .select(least(col("_ia"), col("_ib")).as("id_a"),
        greatest(col("_ia"), col("_ib")).as("id_b"), col("hamming"))
    // identical-fingerprint groups: every within-group pair, Hamming 0
    val same = members.as("a").join(members.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        lit(0L).as("hamming"))
    cross.union(same).orderBy("id_a", "id_b")
  }

  /** Connected components over a near-dup PAIR graph — the step that turns
    * pairwise similarity into dedup decisions: docs A~B and B~C must
    * collapse to ONE cluster even though A~C was never emitted. Iterative
    * min-label propagation (the standard large-graph method — hash-join +
    * aggregate per round, no single-machine union-find): every vertex
    * starts as its own label; each round every vertex takes the min label
    * in its neighborhood; converged when no label changes. Rounds needed =
    * graph diameter — near-dup clusters are shallow (dups of a common
    * original), so a handful of rounds closes 100 TB of pairs; `maxIter`
    * defaults high enough for a 49-hop chain (pathological for near-dup
    * graphs) and is caller-tunable for adversarial diameters. Labels are
    * localCheckpointed per round to cut lineage (iterative plans otherwise
    * grow exponentially).
    * Input: (id_a, id_b) pairs. Output: (id, component) for every vertex
    * appearing in a pair; component = min id of its cluster. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(false)
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint(false)
    var converged = false
    var iter = 0
    // convergence via the label-mass invariant: labels only ever DECREASE
    // (each is a min including the own label), so the label sum is strictly
    // monotone until the fixed point — comparing two scalars replaces the
    // former corpus-sized change-detection join per round. Decimal sum:
    // n × max-id can pass 2⁶³ at corpus scale.
    var prevMass = labelMass(labels)
    while (!converged && iter < maxIter) {
      // neighborhood minimum (incl. own label), one join + one agg
      val next = edges.join(labels, edges("dst") === labels("id"))
        .select(col("src"), col("component").as("nbr"))
        .union(labels.select(col("id").as("src"), col("component").as("nbr")))
        .groupBy(col("src").as("id")).agg(min("nbr").as("component"))
        .localCheckpoint(false)
      val mass = labelMass(next)
      labels = next
      converged = mass == prevMass
      prevMass = mass
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Scalar label mass of a (.., `col`) table — the convergence probe for
    * the iterative component algorithms: labels/parents only ever decrease,
    * so equal mass across rounds ⟺ nothing moved. BigDecimal via String
    * (scale-insensitive equality); None for an empty table. A null sum over
    * a NON-empty table is decimal overflow (Spark's non-ANSI Sum nulls out
    * instead of throwing) — that must fail loudly, not read as None == None
    * convergence with wrong labels. */
  private def labelMass(df: DataFrame, colName: String = "component"): Option[String] = {
    val row = df.agg(count(lit(1)), sum(col(colName).cast("decimal(38,0)"))).head
    val mass = Option(row.getDecimal(1)).map(_.stripTrailingZeros.toPlainString)
    require(row.getLong(0) == 0L || mass.isDefined,
      "label-mass sum overflowed decimal(38,0)")
    mass
  }

  /** Connected components by STAR CONTRACTION — the adversarial-diameter
    * companion to [[connectedComponents]] (same signature, same output
    * contract: (id, component = min id of the cluster)).
    *
    * Label propagation needs diameter-many rounds; a 10⁶-hop chain is a
    * 10⁶-round job. Star contraction closes any graph in O(log n) OUTER
    * rounds: (1) hook — every vertex points at the minimum of itself and
    * its neighbors, which is a forest (parents strictly decrease), so every
    * non-isolated vertex merges with at least one neighbor and the active
    * vertex count at least halves per round; (2) pointer-double the forest
    * to its roots in O(log depth) self-joins (a k-deep tree resolves in
    * ⌈log₂k⌉ rounds, not k); (3) contract — rewrite edges onto roots, drop
    * self-loops, dedup. The cumulative vertex→root mapping composes across
    * rounds; labels only ever decrease, so the fixed point per component is
    * its global min. Everything is joins + aggregates on (id, parent)
    * pairs — 16 bytes a row on the shuffle however wide the documents were
    * — and each round's tables shrink geometrically. localCheckpoint per
    * round cuts the iterative lineage.
    *
    * Prefer [[connectedComponents]] for the realistic near-dup shape
    * (shallow star clusters, 2-3 rounds, fewer jobs per round); prefer this
    * when the pair graph may contain long chains (transitive text drift,
    * adversarial inputs) where diameter-bounded propagation stalls. */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    var edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(false)
    // the emptiness probe is FUSED with materialization: localCheckpoint is
    // lazy, so this count() is the job that computes and caches the edge
    // blocks (which the hook would have to materialize anyway) — the loop
    // condition then costs zero extra jobs per round
    var edgeCount = edges.count()
    // cumulative mapping over the RAW endpoint set (a vertex seen only in a
    // self-pair survives as its own component, like the sibling), refined
    // every outer round
    var mapping = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id"))).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint(false)
    var outer = 0
    while (edgeCount > 0) {
      require(outer < maxIter, s"star contraction did not converge in $maxIter rounds")
      // (1) hook: p(v) = min(v, min neighbor) — a forest, roots = local minima
      var p = edges.groupBy(col("src").as("id"))
        .agg(least(min(col("dst")), col("src")).as("parent"))
        .localCheckpoint(false)
      // (2) pointer doubling to the roots; the settle probe is the same
      // scalar mass compare as the sibling (parents only decrease under
      // p∘p), not a per-round join
      var inner = 0
      var pMass = labelMass(p, "parent")
      var doubled = true
      while (doubled) {
        require(inner < maxIter, s"pointer doubling did not settle in $maxIter rounds")
        val p2 = p.as("a")
          .join(p.as("b"), col("a.parent") === col("b.id"), "left")
          .select(col("a.id").as("id"),
            coalesce(col("b.parent"), col("a.parent")).as("parent"))
          .localCheckpoint(false)
        val m2 = labelMass(p2, "parent")
        doubled = m2 != pMass
        pMass = m2
        p = p2
        inner += 1
      }
      // (3) compose the mapping and contract the edge set onto the roots
      mapping = mapping.as("m")
        .join(p.as("p"), col("m.component") === col("p.id"), "left")
        .select(col("m.id").as("id"),
          coalesce(col("p.parent"), col("m.component")).as("component"))
        .localCheckpoint(false)
      edges = edges.as("e")
        .join(p.as("pa"), col("e.src") === col("pa.id"))
        .join(p.as("pb"), col("e.dst") === col("pb.id"))
        .select(col("pa.parent").as("src"), col("pb.parent").as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
        .localCheckpoint(false)
      // materialize-and-count in one job (next round's loop check is free)
      edgeCount = edges.count()
      outer += 1
    }
    mapping
  }

  /** Embedding-cosine near-dup pairs (exact, all-pairs): block-broadcast
    * cross join with the dot product as a left fold in double precision —
    * the same evaluation order the DuckDB oracle uses, so values match
    * bitwise. Quadratic by definition: correct at verification scale; at
    * corpus scale use [[embeddingPairsLsh]]. */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // repartition: the pair join's parallelism is the stream side's task
    // count — a single-row-group input would run the whole O(n²) loop on
    // one core
    val withNorm = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("n", SimilarityOps.norm(col("v")))
    val cos = SimilarityOps.fastDot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n"))
    withNorm.as("a").join(broadcast(withNorm.as("b")), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), cos.as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** Embedding-cosine near-dup pairs, LSH-BUCKETED — the corpus-scale form
    * (the SemDeDup shape): hyperplane-bucket both sides with the SAME
    * deterministic planes as [[SimilarityOps.topKLsh]], generate candidate
    * pairs per (table, bucket) with a Hamming-`probeRadius` bucket probe,
    * then EXACT-verify each candidate's cosine. Output is identical to
    * [[embeddingPairs]] up to LSH recall; verification arithmetic is the
    * same double left fold, so surviving pairs match the brute force
    * bitwise.
    *
    * Scale shape: the all-pairs form is a BroadcastNestedLoopJoin — O(n²)
    * compute AND a full-corpus broadcast, neither of which exists at 100 TB.
    * Here the corpus is hashed once into `tables`×n index rows of three
    * scalars; candidates come from an EQUI-join on (table, bucket) — a
    * shuffle Spark can always execute — and only 16-byte id pairs reach the
    * dedup shuffle. Embedding vectors never ride the candidate join; they
    * re-join by id for the verify step only.
    *
    * Recall/prune calibration (p = 1 − θ/π is the per-bit agreement
    * probability at angle θ):
    *  - per-table hit = Σ_{h≤probeRadius} C(bits,h)·p^(bits−h)·(1−p)^h;
    *    miss over L tables = (1 − hit)^L. At the REALISTIC near-dup regime
    *    (cosine ≥ 0.9, p ≥ 0.79) the defaults give per-pair miss < 1e-12
    *    while random pairs (p ≈ 0.5) collide at ~37/256 per table — the
    *    bucket join prunes harder the tighter the threshold.
    *  - at loose thresholds (this repo's oracle uses 0.4, θ ≈ 66°, p ≈
    *    0.63) LSH pruning is weak BY PHYSICS — the defaults were measured
    *    at recall 1.0 on sf0.001/0.01/0.1 with a candidate set ~95% of all
    *    pairs. The structural win (equi-join instead of corpus broadcast)
    *    still holds; the prune factor is threshold-bound.
    * Raise `bits` (and `tables`) together for tighter thresholds/bigger
    * corpora: bits ~ log2(n) keeps buckets O(1). */
  def embeddingPairsLsh(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, tables: Int = 24, bits: Int = 8,
                        dim: Int = 64, probeRadius: Int = 2): DataFrame = {
    val withNorm = embeddingWithNorm(df, idCol, vecCol)
    val cand = embeddingLshCandidates(withNorm, tables, bits, dim, probeRadius)
    val cos = SimilarityOps.fastDot(col("va"), col("vb")) / (col("na") * col("nb"))
    cand
      .join(withNorm.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na")), "id_a")
      .join(withNorm.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"), cos.as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** TIGHT-regime parameterization of [[embeddingPairsLsh]] — the
    * SemDeDup-style near-dup threshold (cosine ≥ 0.9) where hyperplane LSH
    * actually prunes: 12 tables × 18 bits, Hamming-2 probe. Calibration (p
    * = 1 − θ/π per-bit agreement): at cosine 0.9 (p ≈ 0.856) the per-table
    * hit ≈ 0.51 → per-pair miss over 12 tables ≈ 2e-4, and ≈ 2e-7 at 0.95,
    * while RANDOM pairs (p ≈ 0.5) collide at 137/2¹⁸ per table → candidate
    * ratio well under 1% of all pairs. Measured, not asserted: Bench emits
    * `emb_lsh_cand_ratio_tight`/`_loose` from
    * [[embeddingLshCandidateStats]] each round, and
    * PipelineOpsSpec plants cosine-0.95 near-dups in a random corpus and
    * checks recall equals brute force. (The loose defaults exist because
    * this repo's oracle threshold 0.4 sits where pruning is weak by
    * physics — see [[embeddingPairsLsh]].) */
  val TightLshTables = 12
  val TightLshBits = 18

  def embeddingPairsLshTight(df: DataFrame, idCol: String, vecCol: String,
                             threshold: Double = 0.9, dim: Int = 64): DataFrame =
    embeddingPairsLsh(df, idCol, vecCol, threshold,
      tables = TightLshTables, bits = TightLshBits, dim = dim, probeRadius = 2)

  /** SEMANTIC dedup, the SemDeDup pipeline (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embedding space, then search for
    * near-duplicates ONLY within each cluster and keep, from every duplicate
    * pair, the member FARTHER from its cluster centroid (the paper's
    * keep-rule: low centroid similarity ≈ more informative example).
    * Deterministic parallel variant of the paper's per-cluster sweep: a row
    * is dropped iff SOME same-cluster row with strictly lower
    * (sim_centroid, id) priority is cosine-`threshold`-similar to it — an
    * order-free pairwise rule (the per-group minimum always survives, and
    * results don't depend on visit order, which a greedy sweep's would).
    *
    * Scale shape: this is the published 100 TB recipe — the all-pairs
    * problem is partitioned by the quantizer, so the only shuffle keys on
    * `cluster` and per-task work is m² over MEMBERS OF ONE CLUSTER, with k
    * chosen ∝ corpus size to bound m (the paper runs 50k clusters on
    * LAION-440M). Assignment itself is one codegen'd nearest-centroids pass;
    * vectors ride the cluster shuffle once.
    *
    * Output: every input row as (id, cluster, sim_centroid, kept). The
    * trained quantizer persists to `centroidsOut` so an oracle can replay
    * assignment, centroid similarity and the dominance rule exactly
    * (left-fold dots throughout — see [[SimilarityOps.fastDot]]). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, threshold: Double, iters: Int = 15,
                    seed: Long = 42L,
                    centroidsOut: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val centroids = SimilarityOps.trainKMeans(df, idCol, vecCol, k, iters, seed)
    centroidsOut.foreach(SimilarityOps.persistCentroids(spark, centroids, _))
    import spark.implicits._
    val cdf = centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("cluster", "c")
      .withColumn("cn", SimilarityOps.norm(col("c")))
    val scored = embeddingWithNorm(df, idCol, vecCol)
      .withColumn("cluster",
        element_at(call_function("nearest_centroids", col("v"),
          typedLit(centroids.map(_.toSeq).toSeq)), 1))
      .join(broadcast(cdf), "cluster")
      .withColumn("simc",
        SimilarityOps.fastDot(col("v"), col("c")) / (col("n") * col("cn")))
      .select(col("cluster"), col("id"), col("v"), col("n"), col("simc"))
      .localCheckpoint(false) // read by the pair join twice + the output join
    // dominance: b beats a when (b.simc, b.id) < (a.simc, a.id); only the
    // beaten side of each similar pair is dropped
    val dominated = scored.as("a").join(scored.as("b"),
        col("a.cluster") === col("b.cluster") &&
        (col("b.simc") < col("a.simc") ||
          (col("b.simc") === col("a.simc") && col("b.id") < col("a.id"))))
      .filter(SimilarityOps.fastDot(col("a.v"), col("b.v")) /
        (col("a.n") * col("b.n")) >= threshold)
      .select(col("a.id").as("_did")).distinct()
    scored.join(dominated, col("id") === col("_did"), "left")
      .select(col("id"), col("cluster"), col("simc").as("sim_centroid"),
        col("_did").isNull.as("kept"))
  }

  /** Measured prune factor of the hyperplane bucketing: (candidate pair
    * count, total pair count n·(n−1)/2) for a parameterization over `df` —
    * the number that converts the 100 TB scaling claim of
    * [[embeddingPairsLsh]] from calibration math into a per-round
    * measurement (Bench emits the ratio into the bench JSON). */
  def embeddingLshCandidateStats(df: DataFrame, idCol: String, vecCol: String,
                                 tables: Int, bits: Int, dim: Int,
                                 probeRadius: Int,
                                 maxVectors: Long = Long.MaxValue): (Long, Long) = {
    val all = embeddingWithNorm(df, idCol, vecCol)
    val nAll = all.count()
    // `maxVectors` bounds the measurement, not the operator: the candidate
    // RATIO is a pair-density estimate, and the loose (near-all-pairs by
    // construction) parameterization materializes O(n²) candidate rows —
    // ~15 GB of spill at 20k vectors for a diagnostic number (VERDICT r18
    // #7). Past the cap, measure on a deterministic hash-modulus subsample
    // (~maxVectors rows, order-independent, same rows every run); at or
    // under it the measurement is exact and bit-identical to the uncapped
    // form — the driver's sf0.1 table (2000 vectors) stays exact.
    val withNorm =
      if (nAll <= maxVectors) all
      else {
        val k = (nAll + maxVectors - 1) / maxVectors
        all.filter(pmod(xxhash64(col("id")), lit(k)) === 0).localCheckpoint(false)
      }
    val nCand = embeddingLshCandidates(withNorm, tables, bits, dim, probeRadius).count()
    val n = if (nAll <= maxVectors) nAll else withNorm.count()
    (nCand, n * (n - 1) / 2)
  }

  /** (id, v, n) — double vectors + L2 norms, materialized once: read by the
    * index build and twice by the verify join (see shingleSets note on
    * localCheckpoint-vs-persist). */
  private def embeddingWithNorm(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), SimilarityOps.asDouble(col(vecCol)).as("v"))
      .withColumn("n", SimilarityOps.norm(col("v")))
      .localCheckpoint(false)
  }

  /** Candidate (id_a, id_b) pairs from the hyperplane bucket join — the
    * scale-critical core of [[embeddingPairsLsh]]: the corpus is hashed into
    * `tables`×n index rows of three scalars; candidacy is an EQUI-join on
    * (table, bucket), so only 16-byte id pairs ever shuffle and vectors
    * never ride the join. */
  private def embeddingLshCandidates(withNorm: DataFrame, tables: Int, bits: Int,
                                     dim: Int, probeRadius: Int): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 2, "probeRadius must be 0, 1 or 2")
    // ONE native pass per vector computes all tables' buckets
    // (graft.functions.LshBuckets): the declarative per-table lshBucket
    // form evaluated tables x bits separate dot expressions per row —
    // measured 21 s of the 32 s sf1 wall at the tight 12x18
    // parameterization. Bucket values are bit-identical (same planes,
    // same fold), so candidates and oracles are unchanged.
    // The index is read by BOTH sides of the candidate self-join.
    val idx = withNorm.select(col("id"),
        posexplode(call_function("graft_lsh_buckets", col("v"),
          lit(tables), lit(bits), lit(dim))).as(Seq("t", "b")))
      .localCheckpoint(false)
    def expand(src: DataFrame, radius: Int): DataFrame = {
      val nbrs = col("b") +:
        ((if (radius >= 1) (0 until bits).map(j => col("b").bitwiseXOR(lit(1L << j)))
          else Seq.empty) ++
         (if (radius >= 2)
            (0 until bits).flatMap(j => (j + 1 until bits).map(k =>
              col("b").bitwiseXOR(lit((1L << j) | (1L << k)))))
          else Seq.empty))
      src.select(col("id"), col("t"), explode(array(nbrs: _*)).as("b"))
    }
    // Candidacy = "within Hamming probeRadius in some table". Radius 2 uses
    // the MEET-IN-THE-MIDDLE split: radius-1 probes on BOTH sides hit a
    // common key iff d(a,b) <= 2 (triangle inequality, and any pair at
    // distance <= 2 shares a midpoint within 1 of each) — the candidate set
    // is IDENTICAL to a one-sided radius-2 probe, but the shuffled index
    // volume drops from (1 + bits + C(bits,2))·n to 2·(1 + bits)·n rows:
    // 4.5x at the tight 18-bit parameterization, measured r12. Radius <= 1
    // keeps the one-sided probe (splitting can't help below 2).
    val (left, right) =
      if (probeRadius == 2) {
        val p1 = expand(idx, 1).localCheckpoint(false)
        (p1, p1)
      } else (idx, expand(idx, probeRadius))
    left.as("a").join(right.as("b"),
        col("a.t") === col("b.t") && col("a.b") === col("b.b") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct() // a pair may collide in several tables/probes/midpoints
  }

  // ---------------------------------------------------------------------
  // Span-level EXACT-substring dedup (suffix-array-free): find maximal
  // token spans that occur (as k-gram windows) at least `minCount` times
  // anywhere in the corpus — the operation behind "Deduplicating Training
  // Data Makes Language Models Better" (Lee et al. 2022), whose single-node
  // tool builds a suffix array. The distributed re-expression: a duplicated
  // substring of length >= k is exactly a RUN of consecutive duplicated
  // k-gram windows, so (1) rolling-hash every k-token window with its
  // position, (2) keep window hashes seen >= minCount times corpus-wide,
  // (3) merge consecutive duplicated positions per doc into maximal spans
  // (gaps-and-islands). Only 8-byte hashes + 4-byte positions shuffle —
  // never text; the corpus-wide duplicate test is one hash-keyed
  // aggregation with map-side partials (the 100 TB analog of the suffix
  // array's LCP scan, at the cost of fixed k instead of all lengths).
  // ---------------------------------------------------------------------

  /** (id, pos, sh): every k-token window of every doc, rolling-hashed, with
    * its 0-based token offset. `sh` is the PACKED DOUBLE-PRIME 62-bit
    * identity key (TextOps.shingleHashesAllWide): downstream this family
    * treats hash equality as content identity with NO exact verification,
    * and a single 31-bit space statistically saturates at 100 TB window
    * counts (n²/2P false spans at n ≈ 10⁹ windows); the packed key drops
    * the expected false-pair count to n²/(2·P·P2) ≈ 0.5 at the same n
    * while still replaying exactly in DuckDB BIGINT math. One native pass
    * per row; pinned because substring dedup reads it twice
    * (duplicate-hash aggregation + position join-back). */
  def positionalShingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val par = df.sparkSession.sparkContext.defaultParallelism
    pin(df.repartition(par)
      .select(col(idCol).as("id"),
        TextOps.shingleHashesAllWide(TextOps.tokens(col(textCol)), k).as("shl"))
      .select(col("id"), posexplode(col("shl")).as(Seq("pos", "sh"))))
  }

  /** Maximal duplicated token spans per document: (id, span_start,
    * span_end) with span_end EXCLUSIVE, both 0-based token offsets. The
    * span invariant is TOKEN COVERAGE: every token in the span lies inside
    * at least one k-window that occurs >= `minCount` times corpus-wide
    * (within the same doc counts, as in the paper's self-repetition
    * handling). Because the islands merge fuses flagged window STARTS with
    * gap <= k, a merged span may contain interior k-windows that are not
    * themselves duplicated — coverage of every token, not duplication of
    * every window, is what's guaranteed.
    *
    * Scale shape: the duplicate-hash set comes from a count aggregation on
    * the 8-byte window hash (map-side partials collapse each task's
    * repeats) and joins back on the same key — AQE broadcasts it when the
    * duplicated head is small (the common case) and skew-splits when a
    * boilerplate window is hot. The islands pass is one window sort per
    * doc partition; per-doc row counts are document-length-bounded, so the
    * sort never sees corpus-scale partitions. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      k: Int, minCount: Int = 2): DataFrame = {
    val sh = positionalShingles(docs, idCol, textCol, k)
    val dup = sh.groupBy("sh").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount).select("sh")
    val dp = sh.join(dup, Seq("sh")).select(col("id"), col("pos"))
    spansFromPositions(dp, k, idCol)
  }

  /** Gaps-and-islands merge of flagged window positions (id, pos) into
    * maximal token spans: successive positions whose k-wide intervals
    * overlap OR touch (gap <= k) fuse, so the merged span is exactly the
    * contiguous region of covered tokens — no hole, no double count. The
    * hash(id) partitioning of the islands window satisfies the (id, grp)
    * aggregation — islands + span bounds cost ONE exchange total. */
  private def spansFromPositions(dp: DataFrame, k: Int, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id").orderBy("pos")
    val grp = dp
      .withColumn("brk",
        when(col("pos") <= lag("pos", 1).over(w) + k, lit(0L)).otherwise(lit(1L)))
      .withColumn("grp", sum("brk").over(w))
    grp.groupBy(col("id"), col("grp"))
      .agg(min("pos").as("s"), max("pos").as("e"))
      .select(col("id").as(idCol),
        col("s").cast("long").as("span_start"),
        (col("e") + k).cast("long").as("span_end"))
  }

  /** Persist the corpus's k-gram WINDOW-HASH counts as the substring-dedup
    * index: (sh, cnt) parquet + a manifest pinning k (validated on read —
    * a k mismatch silently zeroes recall otherwise, same stance as the
    * band-index manifest). The production corpus-build artifact:
    * per-batch incremental substring dedup probes THIS instead of
    * re-shingling the corpus. */
  def writeWindowIndex(corpus: DataFrame, idCol: String, textCol: String,
                       k: Int, dir: String): Unit = {
    val sh = positionalShingles(corpus, idCol, textCol, k)
    try sh.groupBy("sh").agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$dir/windows")
    // single-consumer here: drop the pin once written (the pin() trade is
    // for the multi-consumer pair cores, not index builds)
    finally sh.unpersist()
    val spark = corpus.sparkSession
    import spark.implicits._
    // hw pins the identity-hash WIDTH (the packed double-prime 62-bit
    // key): an index written before the widening carries no hw column, so
    // probing it fails loudly instead of silently zeroing recall
    Seq((k, HashWidthBits)).toDF("k", "hw").coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/manifest")
  }

  /** INCREMENTAL span-level substring dedup — the per-batch face of
    * [[duplicatedSpans]]: a window of the incoming batch is duplicated if
    * it occurs anywhere in the indexed corpus OR at least twice within the
    * batch itself (exactly the visibility a batch arriving at corpus-epoch
    * t has). Per-batch cost scales with the increment: the corpus enters
    * as ONE parquet read of its window-count table, never re-shingled —
    * and that read is BLOOM-PRUNED by the increment's own shingle set
    * before the exchange ([[BloomOps]] scalar-subquery prune, the same
    * "filter the fact table in the scan" shape as q_bloom_semijoin): the
    * corpus window table is corpus-scale, so without the prune every batch
    * SHUFFLES the whole corpus index on `sh`; with it only windows the
    * batch might contain (+ ~1% false positives the left join discards)
    * reach the exchange. No false negatives by construction, so output is
    * bit-identical. Output: maximal spans (idCol, span_start, span_end) of
    * incoming docs. */
  def incrementalSubstringSpans(indexDir: String, incoming: DataFrame,
                                idCol: String, textCol: String, k: Int,
                                bloomBits: Int = 1 << 22,
                                bloomHashes: Int = 6): DataFrame = {
    val spark = incoming.sparkSession
    val mrow = spark.read.parquet(s"$indexDir/manifest").head()
    val mk = mrow.getInt(mrow.fieldIndex("k"))
    require(mk == k,
      s"window index at $indexDir was built with k=$mk, probed with k=$k")
    val mhw = mrow.getInt(mrow.fieldIndex("hw")) // absent column throws: pre-widening index
    require(mhw == HashWidthBits,
      s"window index at $indexDir carries $mhw-bit hashes, probe expects $HashWidthBits")
    val idx = spark.read.parquet(s"$indexDir/windows")
      .select(col("sh"), col("cnt").as("corpus_cnt"))
    // positionalShingles is already pinned; it feeds the bloom build,
    // batchCnt and the probe
    val ps = positionalShingles(incoming, idCol, textCol, k)
    val bits = BloomOps.bloomBits(ps, "sh", bloomBits, bloomHashes)
    val idxPruned = BloomOps.bloomPruned(idx, "sh", bits, bloomBits, bloomHashes)
    val batchCnt = ps.groupBy("sh").agg(count(lit(1)).as("batch_cnt"))
    val dp = ps
      .join(batchCnt, Seq("sh"))
      .join(idxPruned, Seq("sh"), "left")
      .filter(coalesce(col("corpus_cnt"), lit(0L)) + col("batch_cnt") >= 2)
      .select(col("id"), col("pos"))
    spansFromPositions(dp, k, idCol)
  }

  /** LINE-LEVEL corpus dedup — the CCNet paragraph/line stage: hash each
    * LINE, count occurrences corpus-wide, and drop every line that occurs
    * at least `minCount` times (boilerplate headers, navigation residue,
    * repeated disclaimers — the dominant duplication mode of web text at
    * the sub-document level). Lines here are fixed `wordsPerLine`-word
    * groups (the corpus fixture is unstructured word text; a real crawl
    * splits on newlines and feeds the same machinery — the line HASH is
    * the pluggable part). A trailing partial group is not a line.
    *
    * Line identity is the PACKED DOUBLE-PRIME 62-bit key (hash-width
    * policy at [[TextOps.P]]): equality IS the drop decision with no
    * verify, exactly the face the 31-bit space must not carry at corpus
    * scale. The line hashes are a stride-`wordsPerLine` selection of the
    * wide window hashes — one native pass, row-local.
    *
    * Scale shape: only (id, line_idx, 8-byte hash) rows shuffle; the
    * corpus-wide duplicate test is one hash-keyed count with map-side
    * partials; the join-back is hash-keyed (AQE broadcasts the usually
    * small duplicated head); the per-doc fold runs on doc-bounded
    * collected arrays (same stance as substringDedupApply).
    *
    * Output: (idCol, n_lines, n_dup_lines, kept_fp) — kept_fp is the
    * order-sensitive fold of the SURVIVING line hashes, the contract a
    * downstream re-materialization checks against. */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
                wordsPerLine: Int, minCount: Int = 2): DataFrame = {
    val withLines = lineHashes(docs, idCol, textCol, wordsPerLine)
    val ex = withLines.select(col("id"),
      posexplode(col("lines")).as(Seq("li", "lh")))
    val dup = ex.groupBy("lh").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount).select("lh", "cnt")
    val marked = ex.join(dup.select(col("lh"), lit(true).as("isdup")), Seq("lh"), "left")
      .select(col("id"), col("li"), col("lh"),
        coalesce(col("isdup"), lit(false)).as("isdup"))
    val agg = marked.groupBy("id")
      .agg(sum(when(col("isdup"), 1L).otherwise(0L)).as("n_dup_lines"),
        aggregate(
          sort_array(collect_list(
            when(!col("isdup"), struct(col("li"), col("lh"))))),
          lit(0L),
          (f, s) => (f * TextOps.B2 + s.getField("lh")) % TextOps.P).as("kept_fp"))
    withLines.select(col("id").as(idCol), col("nl").cast("long").as("n_lines"))
      .join(agg.select(col("id").as(idCol), col("n_dup_lines"), col("kept_fp")),
        Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_dup_lines"), lit(0L)).as("n_dup_lines"),
        coalesce(col("kept_fp"), lit(0L)).as("kept_fp"))
  }

  /** (id, nl, lines) — the line-hash projection [[lineDedup]] is built on,
    * exposed so the batch and incremental faces share one definition. */
  private def lineHashes(docs: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    pin(docs.repartition(par)
      .select(col(idCol).as("id"),
        TextOps.shingleHashesAllWide(TextOps.tokens(col(textCol)), n).as("shl"))
      // nl derives from the window count — tokenizing again for size()
      // would run the dominant regex pass twice per row: |windows| =
      // |tokens| - n + 1, so |tokens| = |windows| + n - 1 when any window
      // exists, and fewer than n tokens (no window) means zero lines
      .select(col("id"), col("shl"),
        when(size(col("shl")) > 0, (size(col("shl")) + (n - 1)) / n)
          .otherwise(0).cast("int").as("nl"))
      .select(col("id"), col("nl"),
        when(col("nl") > 0,
          transform(sequence(lit(0), col("nl") - 1),
            j => element_at(col("shl"), j * n + 1)))
          .otherwise(array().cast("array<bigint>")).as("lines")))
  }

  /** Persist the corpus's LINE-HASH counts as the line-dedup index:
    * (lh, cnt) parquet + a manifest pinning `wordsPerLine` (validated on
    * read — a width mismatch silently zeroes recall). The corpus-build
    * artifact the incremental face probes per batch. */
  def writeLineIndex(corpus: DataFrame, idCol: String, textCol: String,
                     wordsPerLine: Int, dir: String): Unit = {
    val base = lineHashes(corpus, idCol, textCol, wordsPerLine)
    try base.select(col("id"), explode(col("lines")).as("lh"))
      .groupBy("lh").agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$dir/lines")
    finally base.unpersist() // single consumer — see writeWindowIndex
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((wordsPerLine, HashWidthBits)).toDF("n", "hw").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/manifest")
  }

  /** INCREMENTAL line dedup — the per-batch face of [[lineDedup]]: a line
    * of the incoming batch drops if its corpus count plus its batch count
    * reaches `minCount` (the visibility a batch has at corpus-epoch t).
    * The corpus enters as ONE read of its line-count table, BLOOM-pruned
    * by the batch's own line set before the exchange (same shape as
    * [[incrementalSubstringSpans]] — the corpus index is corpus-scale,
    * the batch is not; false positives only cost index rows the left
    * join discards, so output is bit-identical). Per-batch cost scales
    * with the increment. Output shape = [[lineDedup]]. */
  def incrementalLineDedup(indexDir: String, incoming: DataFrame,
                           idCol: String, textCol: String, wordsPerLine: Int,
                           minCount: Int = 2,
                           bloomBits: Int = 1 << 22,
                           bloomHashes: Int = 6): DataFrame = {
    val spark = incoming.sparkSession
    val mrow = spark.read.parquet(s"$indexDir/manifest").head()
    val mn = mrow.getInt(mrow.fieldIndex("n"))
    require(mn == wordsPerLine,
      s"line index at $indexDir was built with n=$mn, probed with n=$wordsPerLine")
    val mhw = mrow.getInt(mrow.fieldIndex("hw")) // absent column throws: pre-widening index
    require(mhw == HashWidthBits,
      s"line index at $indexDir carries $mhw-bit hashes, probe expects $HashWidthBits")
    val withLines = lineHashes(incoming, idCol, textCol, wordsPerLine)
    val ex = withLines.select(col("id"),
      posexplode(col("lines")).as(Seq("li", "lh")))
    val idx = spark.read.parquet(s"$indexDir/lines")
      .select(col("lh"), col("cnt").as("corpus_cnt"))
    val bits = BloomOps.bloomBits(ex, "lh", bloomBits, bloomHashes)
    val idxPruned = BloomOps.bloomPruned(idx, "lh", bits, bloomBits, bloomHashes)
    val batchCnt = ex.groupBy("lh").agg(count(lit(1)).as("batch_cnt"))
    val marked = ex
      .join(batchCnt, Seq("lh"))
      .join(idxPruned, Seq("lh"), "left")
      .select(col("id"), col("li"), col("lh"),
        (coalesce(col("corpus_cnt"), lit(0L)) + col("batch_cnt") >= minCount)
          .as("isdup"))
    val agg = marked.groupBy("id")
      .agg(sum(when(col("isdup"), 1L).otherwise(0L)).as("n_dup_lines"),
        aggregate(
          sort_array(collect_list(
            when(!col("isdup"), struct(col("li"), col("lh"))))),
          lit(0L),
          (f, s) => (f * TextOps.B2 + s.getField("lh")) % TextOps.P).as("kept_fp"))
    withLines.select(col("id").as(idCol), col("nl").cast("long").as("n_lines"))
      .join(agg.select(col("id").as(idCol), col("n_dup_lines"), col("kept_fp")),
        Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_dup_lines"), lit(0L)).as("n_dup_lines"),
        coalesce(col("kept_fp"), lit(0L)).as("kept_fp"))
  }

  /** WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS sketch): slide a width-`w` window over the positional
    * n-gram shingle hashes and keep each window's MINIMUM; the distinct
    * selected values are the document's fingerprint set. Guarantee: any
    * exact shared token run of length >= w + n - 1 contributes at least
    * one shared fingerprint (every such run spans a full window, and both
    * docs pick the same minimum from identical windows) — a DETERMINISTIC
    * local sketch, unlike MinHash's probabilistic global one, at expected
    * density 2/(w+1) of the shingle count.
    *
    * Output: (idCol, shl, win) with `shl` the positional shingle hashes
    * and `win` the winnowed fingerprint set — both row-local HOFs over one
    * materialized shingle array (plain column, so the lambda never
    * re-derives it; see shingleHashesOfHashes scaladoc). */
  def winnowedFingerprints(docs: DataFrame, idCol: String, textCol: String,
                           n: Int, w: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    docs.repartition(par)
      .select(col(idCol),
        // packed double-prime 62-bit shingle identity (TextOps hash-width
        // policy): the winnow SELECTION is a sketch, but the selected
        // values are compared as content identity in winnowPairs' inverted
        // index and Jaccard — the identity space must not saturate at
        // corpus-scale window counts.
        TextOps.shingleHashesAllWide(TextOps.tokens(col(textCol)), n).as("shl"))
      .withColumn("win",
        when(size(col("shl")) >= w,
          array_distinct(transform(sequence(lit(0), size(col("shl")) - w),
            i => array_min(slice(col("shl"), i + 1, lit(w))))))
          .otherwise(array_distinct(col("shl")))) // short docs: keep all
      .transform(pin) // read twice by winnowPairs (inverted index + sets)
  }

  /** Near-dup pairs by winnowed-fingerprint collision + exact verify:
    * candidates share at least one fingerprint (inverted-index join on the
    * ~2/(w+1)-density sketch instead of the full posting lists), then the
    * TRUE n-gram Jaccard over the full DISTINCT shingle sets computes via
    * an 8-BYTE-KEY common-count join — the candidate list fans out on
    * id_a's shingles and equi-joins (id_b, sh), so only (id, id, 8-byte
    * hash) rows ever reach an exchange; shingle ARRAYS never shuffle (the
    * PLANS §4 pair-core invariant — the prior carried-array verify shipped
    * both docs' full shingle sets through two joins). Output
    * (id_a, id_b, jaccard) at `threshold`.
    *
    * `maxDocFreq` — the skew guard this join needs MORE than
    * [[jaccardPairsExact]] does: the winnowing guarantee (any shared exact
    * run >= w+n-1 tokens contributes a shared print) means corpus-common
    * BOILERPLATE — a license header, a template footer — is GUARANTEED a
    * shared fingerprint across every doc carrying it, i.e. an m² hot join
    * key at corpus scale. Prints whose doc frequency exceeds the cap leave
    * the collision join BEFORE pairing (candidacy only — the verify
    * Jaccard stays over the full uncapped sets, like the Jaccard twin),
    * so the recall contract narrows to pairs whose shared runs include at
    * least one sub-cap print: docs whose ONLY overlap is the
    * corpus-common boilerplate stop pairing, which is the curation
    * intent. Same broadcast-size guard as the text core
    * ([[MaxBroadcastHotShingles]]).
    *
    * Skew note: like the exact inverted index (jaccardPairsExact), pair
    * output over a group of m identical docs is m²-bounded — on corpora
    * with large exact-duplicate groups run [[dedup_exact]]-style
    * contraction FIRST (or use [[jaccardPairsLsh]], whose rep contraction
    * absorbs identical sets); winnowing shrinks the index, not the pair
    * combinatorics, and the df cap bounds only the SHARED-boilerplate
    * blow-up, not true duplicate groups. */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
                  n: Int, w: Int, threshold: Double,
                  maxDocFreq: Option[Int] = None): DataFrame = {
    val fp = winnowedFingerprints(docs, idCol, textCol, n, w)
    // the array-laden fp is read exactly TWICE (its pin contract); every
    // downstream reuse goes through COMPACT 8-byte-row pins — under
    // memory pressure in a long-lived session the wide-array pin is the
    // first thing evicted, and re-deriving the winnow HOF chain per plan
    // reference cost 54 s at sf1 before this split (r17 bench)
    val ex0 = pin(fp.select(col(idCol).as("id"), explode(col("win")).as("p")))
    val exsh = pin(fp.select(col(idCol).as("id"),
      explode(array_distinct(col("shl"))).as("sh")))
    val ex = maxDocFreq.fold(ex0) { cap =>
      // `win` is array_distinct per doc, so count(*) per print IS its doc
      // frequency; identical guard shape to pairCommonCounts (broadcast
      // the hot head while it fits, shuffled anti-join past the bound)
      val hot = pin(ex0.groupBy("p").count().filter(col("count") > cap)
        .select("p"))
      val hotSide =
        if (hot.count() <= MaxBroadcastHotShingles) broadcast(hot) else hot
      ex0.join(hotSide, Seq("p"), "left_anti")
    }
    // explicit hash-repartition on the collision key (r19): the posting
    // rows are ~16 bytes each, so AQE's bytes-based coalescing shrank the
    // exchange feeding the self-join to 1–2 partitions — but the JOIN is
    // the m²-per-key pair fan-out plus the partial distinct, the single
    // most compute-heavy stage of the query (profiled 2×~4 s CPU on 2
    // tasks at sf0.1 ≈ 2/3 of the query). REPARTITION_BY_NUM is exempt
    // from AQE coalescing and hashpartitioning(p, par) already satisfies
    // the join's clustering requirement, so this adds no extra exchange —
    // it only pins the pair-generation stage at full parallelism (the
    // prepBandIndex/lshRepPairs precedent from r18).
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val exJ = ex.repartition(par, col("p"))
    // second coalesce-exempt repartition, on the PAIR key before the
    // distinct: the distinct's own exchange is ENSURE_REQUIREMENTS, so AQE
    // sized it by bytes (~8 MB → 3 partitions at sf0.1) — and because every
    // operator downstream of the distinct (the common-count fan-out joins,
    // the count agg, the sizes joins, the threshold filter) preserves that
    // hashpartitioning, the WHOLE verify tail fused into that 3-task stage
    // (profiled: 24M-row join fan-out + an agg hash map at ~50 probes/key,
    // 7–14 s aggregation-build time, re-run by the caller's orderBy range
    // sampling). Shuffling pre-distinct rows costs nothing here: candidate
    // pairs share ~1.03 prints on average (354k pre-agg vs 343k distinct
    // at sf0.1), so the partial agg the explicit repartition displaces was
    // buying a 3% row cut at the price of a 10x parallelism collapse.
    val cand = exJ.as("a").join(exJ.as("b"),
        col("a.p") === col("b.p") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .repartition(par, col("id_a"), col("id_b"))
      .distinct()
    // sizes from the pinned posting rows (one 8-byte-key agg); joined to
    // the PAIR LIST rather than to the post-verify aggregate (r19) so the
    // size-ratio bound below can prune candidates BEFORE the verify
    // fan-out
    val sizes = exsh.groupBy("id").agg(count(lit(1)).as("sz"))
    // SOUND candidate pre-filter (guide §3 — pre-filter the big side when
    // selective): common <= min(sz_a, sz_b), and the final score
    // jaccard(c) = c/(sz_a+sz_b-c) is monotonically non-decreasing in c —
    // including through its double rounding — so evaluating THE SAME
    // jaccard expression at c = min(sz_a, sz_b) gives each pair's highest
    // reachable score. Pairs that cannot reach the threshold leave before
    // the verify fan-out. The sketch join is collision-driven
    // (corpus-common sub-cap prints admit C(df,2) pairs each), so most
    // candidates are junk: at sf0.1 the bound kept 127k of 343k pairs and
    // the verify fan-out fell from 24.0M to 9.9M joined rows. Output is
    // provably identical: only pairs whose final jaccard had to fail the
    // existing >= threshold filter are dropped, via the same arithmetic.
    val candSized = cand
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .filter(jaccard(least(col("sz_a"), col("sz_b")),
        col("sz_a"), col("sz_b")) >= threshold)
    // common-count verify restricted to the surviving pairs: fan out on
    // id_a's distinct shingles (bounded by survivors × avg set size), then
    // the composite (id_b, sh) equi-join keeps exactly the shared ones —
    // a shared print is a shared shingle value, so common >= 1 for every
    // candidate and the inner joins lose nothing. sz_a/sz_b ride the
    // groupBy keys (functionally dependent on the pair) so the final
    // jaccard needs no further join.
    val common = candSized
      .join(exsh.select(col("id").as("id_a"), col("sh")), Seq("id_a"))
      .join(exsh.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b").agg(count(lit(1)).as("common"))
    // pin the (tiny) verified pair list: callers ORDER it, and the range
    // sampling of a sort exchange executes its child an extra time — the
    // pin makes that a cache read instead of a second pass over the
    // verify fan-out
    pin(common
      .select(col("id_a"), col("id_b"),
        jaccard(col("common"), col("sz_a"), col("sz_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold))
  }

  /** SPAN-LEVEL benchmark decontamination — the modern overlap check (a
    * training doc is contaminated where a >= k-token run also appears in
    * the eval set, PaLM/GPT-4-style): maximal spans of non-benchmark docs
    * whose every k-window hash occurs anywhere in the benchmark slice.
    * Output (idCol, span_start, span_end), exclusive end — the input to a
    * span-trim or doc-drop policy ([[substringDedupApply]] shape).
    *
    * Scale shape: eval suites are MBs against a 100 TB corpus, so the
    * benchmark's distinct window-hash set BROADCASTS and the corpus probes
    * it map-side (left-semi) — the training corpus never shuffles for the
    * membership test; only flagged (id, pos) pairs reach the islands
    * window. */
  def contaminationSpans(docs: DataFrame, idCol: String, textCol: String,
                         k: Int, isBenchmark: Column): DataFrame = {
    val bench = positionalShingles(docs.filter(isBenchmark), idCol, textCol, k)
      .select("sh").distinct()
    val probe = positionalShingles(docs.filter(!isBenchmark), idCol, textCol, k)
    val dp = probe.join(broadcast(bench), Seq("sh"), "left_semi")
      .select(col("id"), col("pos"))
    spansFromPositions(dp, k, idCol)
  }

  /** Per-document substring-dedup report for flagged docs: token count,
    * number of maximal duplicated spans, duplicated-token total (spans are
    * merged maximal intervals — no double counting), and the duplicated
    * fraction. The decision input for span REMOVAL ([[substringDedupApply]])
    * or whole-doc drop policies. */
  def substringDedupStats(docs: DataFrame, idCol: String, textCol: String,
                          k: Int, minCount: Int = 2): DataFrame = {
    val nt = docs.select(col(idCol),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
    val agg = duplicatedSpans(docs, idCol, textCol, k, minCount)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start")).as("dup_tokens"))
    agg.join(nt, Seq(idCol))
      .select(col(idCol), col("n_tokens"), col("n_spans"), col("dup_tokens"),
        (col("dup_tokens").cast("double") / col("n_tokens")).as("dup_fraction"))
  }

  /** APPLY the span removal (the paper's dedup action): drop every token
    * inside a duplicated span and return the kept stream as (id, n_kept,
    * kept_fp) — count + order-sensitive fingerprint of the surviving
    * tokens, the contract downstream tokenization/packing consumes.
    * Docs with no duplicated span pass through with their full stream.
    *
    * Scale shape: spans collect per doc (document-length-bounded arrays)
    * and join back to the doc row; the keep/drop test + fingerprint then
    * run entirely row-local — one pass over the token hashes against the
    * sorted span list, no per-token explode, no text on the wire. */
  def substringDedupApply(docs: DataFrame, idCol: String, textCol: String,
                          k: Int, minCount: Int = 2): DataFrame = {
    val spans = duplicatedSpans(docs, idCol, textCol, k, minCount)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e")))).as("spans"))
    val withSpans = docs
      .select(col(idCol), TextOps.wordHashes(TextOps.tokens(col(textCol))).as("whs"))
      .join(spans, Seq(idCol), "left")
      .withColumn("spans", coalesce(col("spans"),
        array().cast("array<struct<s:bigint,e:bigint>>")))
    // kept positions: not covered by any span; fingerprint folds the kept
    // word hashes in stream order (identical arithmetic to fingerprintOfHashes)
    val keptHashes = filter(col("whs"), (_, p) =>
      !exists(col("spans"),
        sp => p.cast("long") >= sp("s") && p.cast("long") < sp("e")))
    withSpans
      .select(col(idCol), keptHashes.as("kept"))
      .select(col(idCol),
        size(col("kept")).cast("long").as("n_kept"),
        TextOps.fingerprintOfHashes(col("kept")).as("kept_fp"))
  }
}
