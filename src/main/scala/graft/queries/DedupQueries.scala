package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, TextOps}
import graft.tables.Tables

/** Near-duplicate detection over `documents` / `embeddings`. The exact
  * operators carry full-value DuckDB oracles; `dedup_minhash_lsh` is oracled
  * against the BRUTE-FORCE result — its LSH candidate generation must reach
  * every true pair (miss probability ≈ 5e-8 per pair at J ≥ 0.8 with 32×4
  * banding), so a hash-mismatch here means the machinery broke, not chance. */
object DedupQueries {

  import OracleText.{SIMHASH, WHS}
  import OracleVec.NORMED

  /** The corpus (doc_id < 250) band index, staged ONCE per JVM per sf dir —
    * the deployment shape: built at corpus-epoch time, read by every
    * increment. Safe to sweep at harness startup (TempHygiene): the DuckDB
    * oracle replays from the source tables, never from this index. */
  private object IncIndexStage {
    private val staged = scala.collection.mutable.Map[String, String]()
    def dir(s: org.apache.spark.sql.SparkSession, dirPath: String): String =
      synchronized {
        staged.getOrElseUpdate(dirPath, {
          val d = java.nio.file.Files.createTempDirectory("graft-incidx-").toString
          DedupOps.writeCorpusBandIndex(
            Tables(s, dirPath, "documents").filter(col("doc_id") < 250),
            "doc_id", "text", 3, d)
          d
        })
      }
  }

  /** Epoch-form corpus band index TEMPLATE, staged once per JVM per sf
    * dir; mutating consumers (engine_stream_incremental appends epochs)
    * take a filesystem copy instead of re-deriving it with Spark jobs. */
  private object IncEpochStage {
    private val staged = scala.collection.mutable.Map[String, String]()
    def copyTo(s: org.apache.spark.sql.SparkSession, dirPath: String,
               dest: String): Unit = {
      val src = synchronized {
        staged.getOrElseUpdate(dirPath, {
          val d = java.nio.file.Files.createTempDirectory("graft-incepoch-").toString
          DedupOps.initEpochBandIndex(s, IncIndexStage.dir(s, dirPath), d)
          d
        })
      }
      import java.nio.file.{Files, Path, Paths, StandardCopyOption}
      val (sp, dp) = (Paths.get(src), Paths.get(dest))
      val walk = Files.walk(sp)
      try walk.forEach { (p: Path) =>
        val t = dp.resolve(sp.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
      } finally walk.close()
    }
  }

  /** Corpus (doc_id < 250) substring WINDOW-HASH index, staged once per
    * JVM per sf dir — the corpus-build artifact incremental substring
    * dedup probes per batch. Safe to sweep at harness startup: the oracle
    * replays from the source tables. */
  private object SubIdxStage {
    private val staged = scala.collection.mutable.Map[String, String]()
    def dir(s: org.apache.spark.sql.SparkSession, dirPath: String): String =
      synchronized {
        staged.getOrElseUpdate(dirPath, {
          val d = java.nio.file.Files.createTempDirectory("graft-subidx-").toString
          DedupOps.writeWindowIndex(
            Tables(s, dirPath, "documents").filter(col("doc_id") < 250),
            "doc_id", "text", SubstringK, d)
          d
        })
      }
  }

  /** Corpus (doc_id < 250) LINE-HASH index, staged once per JVM per sf
    * dir — the corpus-build artifact incremental line dedup probes per
    * batch. Safe to sweep at harness startup: the oracle replays from the
    * source tables. */
  private object LineIdxStage {
    private val staged = scala.collection.mutable.Map[String, String]()
    def dir(s: org.apache.spark.sql.SparkSession, dirPath: String): String =
      synchronized {
        staged.getOrElseUpdate(dirPath, {
          val d = java.nio.file.Files.createTempDirectory("graft-lineidx-").toString
          DedupOps.writeLineIndex(
            Tables(s, dirPath, "documents").filter(col("doc_id") < 250),
            "doc_id", "text", LineWords, d)
          d
        })
      }
  }

  /** Planted multimodal asset corpora, staged to parquet once per JVM per
    * sf dir. The pure-READ dedup consumers (dedup_phash / dedup_video /
    * dedup_audio / dedup_multimodal) score SIGNATURES of existing assets —
    * re-encoding the deterministic fixture inside every timed run benches
    * the encoder, not the dedup operator, exactly like the engine read
    * queries' shared root (EngineQueries.Fixture). The mm_decode_* /
    * mm_*_phash/fp faces keep per-invocation encode: there the codec IS
    * the operator. Safe to sweep at harness startup ("graft-mmstage-"):
    * the oracle replays from the source tables, never from the stage. */
  private object MmAssetStage {
    private val staged = scala.collection.mutable.Map[(String, String), String]()
    def df(s: org.apache.spark.sql.SparkSession, dirPath: String, kind: String)
          (build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val p = synchronized {
        staged.getOrElseUpdate((dirPath, kind), {
          val d = java.nio.file.Files
            .createTempDirectory(s"graft-mmstage-$kind-").toString
          build.write.mode("overwrite").parquet(d)
          d
        })
      }
      s.read.parquet(p)
    }
  }

  /** `shs(doc_id, shingles)`: distinct 3-word shingle hashes per document —
    * the exact arithmetic of `DedupOps.shingleSets(_, _, _, 3)`. */
  private val ShingleCtes =
    s"""whst AS (SELECT doc_id, $WHS AS whs FROM documents),
       |shs AS (SELECT doc_id, ${OracleText.shingleDistinctSql("whs", 3)} AS shingles
       |        FROM whst WHERE len(whs) >= 3)""".stripMargin

  /** Planted similarity-SPECTRUM sample shared by the sketch-quality
    * measurement faces (`dedup_minhash_quality`, `dedup_simhash_quality`):
    * docs < 150 plus companions with every m-th token replaced
    * (m ∈ {4, 8, 16, 32} by doc_id % 4 — ~0.1 to ~0.85 shingle-Jaccard),
    * ending in `u(doc_id, text)` → `shs(doc_id, shingles)`. Bounded by
    * design: sketch quality is corpus-size-independent and the brute-force
    * ground truth is quadratic, so the sample must not grow with the
    * corpus. */
  private val SpectrumMCase =
    "CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 4 WHEN 1 THEN 8 " +
      "WHEN 2 THEN 16 ELSE 32 END"
  private val SpectrumCtes =
    s"""u AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < 150
       |  UNION ALL
       |  SELECT doc_id + 1000000,
       |    array_to_string(list_transform(${OracleText.TOKS}, (t, i) ->
       |      CASE WHEN (i - 1) % ($SpectrumMCase) = 0 THEN 'zqx' ELSE t END), ' ')
       |  FROM documents WHERE doc_id < 150 AND len(${OracleText.TOKS}) >= 40),
       |whst AS (SELECT doc_id, $WHS AS whs FROM u),
       |shs AS (SELECT doc_id,
       |          ${OracleText.shingleDistinctSql("whs", 3)} AS shingles
       |        FROM whst WHERE len(whs) >= 3)""".stripMargin

  /** Brute-force shingle-Jaccard ground truth at t = 0.8 over `shs` +
    * the recall/precision counters over a `cand(ia, ib)` CTE. */
  private val QualityCounterCtes =
    s"""ex AS (SELECT doc_id, unnest(shingles) AS sh FROM shs),
       |sz AS (SELECT doc_id, len(shingles) AS sz FROM shs),
       |cm AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS cnt
       |       FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2),
       |tp AS (SELECT ia, ib FROM cm
       |       JOIN sz sa ON sa.doc_id = cm.ia
       |       JOIN sz sb ON sb.doc_id = cm.ib
       |       WHERE CAST(cnt AS DOUBLE) / (sa.sz + sb.sz - cnt) >= 0.8),
       |nn AS (SELECT
       |        (SELECT CAST(count(*) AS BIGINT) FROM tp) AS n_true,
       |        (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand,
       |        (SELECT CAST(count(*) AS BIGINT)
       |         FROM cand JOIN tp USING (ia, ib)) AS n_hit)""".stripMargin
  private val QualityCounterSelect =
    """SELECT n_true, n_cand, n_hit,
      |  CASE WHEN n_true = 0 THEN 1.0
      |       ELSE CAST(n_hit AS DOUBLE) / n_true END AS recall,
      |  CASE WHEN n_cand = 0 THEN 1.0
      |       ELSE CAST(n_hit AS DOUBLE) / n_cand END AS precision
      |FROM nn""".stripMargin

  /** Spark side of [[SpectrumCtes]]: the same bounded planted sample. */
  private def plantedSpectrum(s: org.apache.spark.sql.SparkSession,
                              dir: String): org.apache.spark.sql.DataFrame = {
    val sample = Tables(s, dir, "documents").filter(col("doc_id") < 150)
      .select(col("doc_id"), col("text"))
    val toks = TextOps.tokens(col("text"))
    val m = when(pmod(col("doc_id"), lit(4)) === 0, 4)
      .when(pmod(col("doc_id"), lit(4)) === 1, 8)
      .when(pmod(col("doc_id"), lit(4)) === 2, 16).otherwise(32)
    val companions = sample
      .filter(size(toks) >= 40)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(transform(toks, (t, i) =>
          when(pmod(i, m) === 0, lit("zqx")).otherwise(t)), " ").as("text"))
    sample.unionByName(companions)
  }

  /** Recall/precision counters of a candidate pair set vs the brute-force
    * shingle-Jaccard truth at t = 0.8 — the Spark side of
    * [[QualityCounterCtes]]. A measurement face may collect its handful of
    * scalars (the ann_recall stance). */
  private def qualityCounters(s: org.apache.spark.sql.SparkSession,
                              cand: org.apache.spark.sql.DataFrame,
                              shs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    import s.implicits._
    // both sides feed two actions each (own count + the hit join): pin so
    // the quadratic brute force and the candidate pipeline run once
    val exact = DedupOps.jaccardPairsExact(shs, "doc_id", 0.8)
      .select(col("id_a").as("ia"), col("id_b").as("ib"))
      .persist(MEMORY_AND_DISK)
    val candP = cand.persist(MEMORY_AND_DISK)
    val nTrue = exact.count()
    val nCand = candP.count()
    val nHit = candP.join(exact, Seq("ia", "ib")).count()
    exact.unpersist()
    candP.unpersist()
    val recall = if (nTrue == 0) 1.0 else nHit.toDouble / nTrue
    val precision = if (nCand == 0) 1.0 else nHit.toDouble / nCand
    Seq((nTrue, nCand, nHit, recall, precision))
      .toDF("n_true", "n_cand", "n_hit", "recall", "precision")
  }

  /** Fixed line width (words) for the CCNet-style line-dedup family. */
  private[queries] val LineWords = 8

  /** CTEs ending in `ln(doc_id, li, lh)` — per-doc wide-key line hashes
    * (stride-[[LineWords]] selection over the wide window hashes; partial
    * tails are not lines) plus `sl(doc_id, nl, …)` for the per-doc line
    * count. Shared by the batch and incremental line-dedup oracles. */
  /** The line-hash CTE chain over an arbitrary (doc_id, text-expression)
    * source — `documents.text` for the standalone faces, the extracted
    * text for the composed web-curation pipeline. Ends in
    * `sl(doc_id, nl, lx)` + `ln(doc_id, li, lh)`. */
  private[queries] def lineCtesOver(srcRel: String, textE: String): String =
    s"""whst AS (SELECT doc_id,
       |           list_transform(${OracleText.toksSql(textE)},
       |             t -> ${OracleText.wordHashSql("t")}) AS whs,
       |           list_transform(${OracleText.toksSql(textE)},
       |             t -> ${OracleText.wordHashSqlMod("t", TextOps.P2)}) AS whs2
       |         FROM $srcRel),
       |shlt AS (SELECT doc_id,
       |           ${OracleText.shingleAllWideSql("whs", "whs2", LineWords)} AS shl,
       |           CAST(len(whs) // $LineWords AS INT) AS nl
       |         FROM whst),
       |sl AS (SELECT doc_id, nl,
       |         list_transform(range(0, nl),
       |           j -> shl[CAST(j * $LineWords + 1 AS INT)]) AS lx
       |       FROM shlt),
       |ln AS (SELECT doc_id, generate_subscripts(lx, 1) - 1 AS li,
       |         unnest(lx) AS lh
       |       FROM sl)""".stripMargin

  private val LineCtes = lineCtesOver("documents", "text")

  /** Per-doc aggregation over a `mk(doc_id, li, lh, isdup)` CTE: dup-line
    * count + order-sensitive fold of the surviving line hashes. */
  private val LineAggCte =
    s"""ag AS (SELECT doc_id,
       |         CAST(SUM(CASE WHEN isdup THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_dup_lines,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list(lh ORDER BY li) FILTER (WHERE NOT isdup)),
       |           (f, h) -> (f * ${TextOps.B2} + h) % ${TextOps.P}) AS kept_fp
       |       FROM mk GROUP BY doc_id)""".stripMargin

  /** Oracle SQL of the whole curation chain from the markup wrap down
    * (normalization → extraction → rule filter → line dedup over
    * survivors → keep). Shared VERBATIM by pipeline_curate_web and
    * pipeline_curate_warc: both ingestion transports are lossless (proven
    * by text_from_gzip / text_from_warc respectively), so the expected
    * values are identical — the two queries differ only in how the markup
    * arrives.
    *
    * r16: the wrapped text carries PLANTED encoding damage
    * (OracleText.damageSql — NFD, mojibake, zero-width/control) and the
    * chain normalizes the arrived markup BEFORE extraction
    * (TextOps.normalizeText / its SQL replay), so the curate capstones
    * gate the normalization stage in composition — without it the planted
    * docs' token counts, language votes and line hashes all shift. */
  private lazy val CurateChainOracleSql: String = {
    val reason =
      s"""CASE WHEN len(${OracleText.toksSql("extracted")}) < 20 THEN 'too_short'
         |     WHEN len(${OracleText.toksSql("extracted")}) > 80 THEN 'too_long'
         |     WHEN ${OracleText.langPredSql("extracted")} <> 'en' THEN 'non_english'
         |     WHEN ${OracleText.swRatioSql("extracted")} < 0.05 THEN 'low_stopword_density'
         |END""".stripMargin.replace("\n", " ")
    s"""WITH ${TextQueries.htmlExtractCtesOver(
            OracleText.damageSql("text"), normalize = true)},
       |f AS (SELECT doc_id, extracted, $reason AS reason FROM j),
       |fk AS (SELECT doc_id, extracted AS text FROM f WHERE reason IS NULL),
       |${lineCtesOver("fk", "text")},
       |dupl AS (SELECT lh FROM ln GROUP BY lh HAVING count(*) >= 2),
       |mk AS (SELECT ln.doc_id, ln.li, ln.lh, (d.lh IS NOT NULL) AS isdup
       |       FROM ln LEFT JOIN dupl d ON ln.lh = d.lh),
       |nd AS (SELECT doc_id,
       |         CAST(SUM(CASE WHEN isdup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
       |       FROM mk GROUP BY doc_id)
       |SELECT f.doc_id, f.reason,
       |  CAST(COALESCE(s.nl, 0) AS BIGINT) AS n_lines,
       |  COALESCE(nd.n_dup, 0) AS n_dup_lines,
       |  (f.reason IS NULL AND
       |   (COALESCE(s.nl, 0) = 0 OR COALESCE(nd.n_dup, 0) * 2 <= s.nl)) AS kept
       |FROM f LEFT JOIN sl s USING (doc_id) LEFT JOIN nd USING (doc_id)
       |ORDER BY f.doc_id""".stripMargin
  }

  /** Stages 2-3 (extraction + rule filter) of [[curateFromMarkup]]:
    * returns `(doc_id, extracted, reason)`, pinned — the line stage and
    * the final join both read it. */
  private def curateFiltered(
      html: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.ops.HtmlOps
    val extracted = html
      .select(col("doc_id"), HtmlOps.blocks(col("html")).as("blocks"))
      .select(col("doc_id"), HtmlOps.keptTexts(col("blocks")).as("kept"))
      .select(col("doc_id"), HtmlOps.joinAndClean(col("kept")).as("extracted"))
    val counted = extracted
      .select(col("doc_id"), col("extracted"),
        graft.ops.TextOps.textCounts(col("extracted")).as("_c"))
    val nWord = col("_c.n_word")
    val (pred, _) = graft.ops.TextOps.langIdFromHits(col("_c.sw_hits"))
    val swRatio = when(nWord === 0, lit(0.0))
      .otherwise(element_at(col("_c.sw_hits"),
        graft.functions.GraftTextCounts.langIndex("en") + 1)
        .cast("double") / nWord)
    val reason = when(nWord < 20, "too_short")
      .when(nWord > 80, "too_long")
      .when(pred =!= "en", "non_english")
      .when(swRatio < 0.05, "low_stopword_density")
    counted
      .select(col("doc_id"), col("extracted"), reason.as("reason"))
      .localCheckpoint(false) // read by the line stage AND the final join
  }

  /** Curation stages over ARRIVED markup `(doc_id, html)`: HTML
    * boilerplate extraction → rule filter (length / language / stopword
    * density) → line-level dedup over the surviving extracted text (cheap
    * map stages first, the one corpus-wide aggregation last — the real
    * order) → keep verdict (filter-kept AND < half the lines
    * corpus-common). The Spark half of [[CurateChainOracleSql]]. */
  private def curateFromMarkup(
      html: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val filtered = curateFiltered(html)
    val lines = DedupOps.lineDedup(
      filtered.filter(col("reason").isNull), "doc_id", "extracted",
      wordsPerLine = LineWords)
    filtered.select(col("doc_id"), col("reason"))
      .join(lines.select(col("doc_id"), col("n_lines"), col("n_dup_lines")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("reason"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_dup_lines"), lit(0L)).as("n_dup_lines"),
        (col("reason").isNull &&
          (coalesce(col("n_lines"), lit(0L)) === 0L ||
            coalesce(col("n_dup_lines"), lit(0L)) * 2 <= col("n_lines")))
          .as("kept"))
      .orderBy("doc_id")
  }

  /** The curated corpus itself — `(doc_id, extracted)` for every doc that
    * survives the rule filter AND the line-dedup verdict. The capstone's
    * tokenize/pack stages consume this. */
  private def curatedSurvivors(
      html: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val filtered = curateFiltered(html)
    val lines = DedupOps.lineDedup(
      filtered.filter(col("reason").isNull), "doc_id", "extracted",
      wordsPerLine = LineWords)
    filtered.filter(col("reason").isNull)
      .join(lines.select(col("doc_id"), col("n_lines"), col("n_dup_lines")),
        Seq("doc_id"), "left")
      .filter(coalesce(col("n_lines"), lit(0L)) === 0L ||
        coalesce(col("n_dup_lines"), lit(0L)) * 2 <= col("n_lines"))
      .select(col("doc_id"), col("extracted"))
  }

  /** Window width (tokens) for span-level substring dedup. The paper uses
    * 50 BPE tokens on web text; the synthetic corpus's docs average ~54
    * word tokens, so 8 keeps the duplicated-run structure non-trivial
    * (47/500 docs flagged at sf0.01) while exercising the same machinery. */
  private val SubstringK = 8

  /** CTEs for the substring-dedup family, mirroring
    * `DedupOps.duplicatedSpans(_, _, _, SubstringK)` step for step:
    * `ps` = positional window hashes, `dupg` = hashes occurring >= 2 times
    * corpus-wide, `dp` = duplicated window start positions, `spans` =
    * maximal merged [span_start, span_end) token intervals per doc. */
  /** Positional window hashes + gaps-and-islands merge (mirrors
    * `DedupOps.spansFromPositions`); the `dp` CTE (flagged positions) is
    * the pluggable part — corpus-wide duplicates for substring dedup,
    * benchmark membership for span decontamination. */
  private val PositionalShingleCtes =
    s"""whst AS (SELECT doc_id, $WHS AS whs, ${OracleText.WHS2} AS whs2
       |         FROM documents),
       |ps AS (SELECT doc_id, unnest(shl) AS sh,
       |         generate_subscripts(shl, 1) - 1 AS pos
       |       FROM (SELECT doc_id,
       |               ${OracleText.shingleAllWideSql("whs", "whs2", SubstringK)} AS shl
       |             FROM whst))""".stripMargin

  private val IslandCtes =
    s"""isl AS (SELECT doc_id, pos,
       |          CASE WHEN pos <= lag(pos) OVER (PARTITION BY doc_id
       |                 ORDER BY pos) + $SubstringK THEN 0 ELSE 1 END AS brk
       |        FROM dp),
       |grps AS (SELECT doc_id, pos,
       |           SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
       |         FROM isl),
       |spans AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |            CAST(max(pos) + $SubstringK AS BIGINT) AS span_end
       |          FROM grps GROUP BY doc_id, g)""".stripMargin

  private val SubstringSpanCtes =
    s"""$PositionalShingleCtes,
       |dupg AS (SELECT sh FROM ps GROUP BY sh HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, pos FROM ps JOIN dupg USING (sh)),
       |$IslandCtes""".stripMargin

  /** `wfp(doc_id, shl, win)`: positional 3-shingle hashes + winnowed
    * (w=4 window-min) fingerprint set — mirrors
    * `DedupOps.winnowedFingerprints(_, _, _, 3, 4)` exactly, including the
    * short-doc keep-all branch. */
  private def winnowCtesOver(src: String) = {
    val w = 4
    s"""whst AS (SELECT doc_id, $WHS AS whs, ${OracleText.WHS2} AS whs2
       |         FROM $src),
       |wfp AS (SELECT doc_id, shl,
       |          CASE WHEN len(shl) >= $w THEN
       |            list_distinct(list_transform(range(0, len(shl) - ${w - 1}),
       |              i -> list_aggregate(list_slice(shl, i + 1, i + $w), 'min')))
       |          ELSE list_distinct(shl) END AS win
       |        FROM (SELECT doc_id,
       |                ${OracleText.shingleAllWideSql("whs", "whs2", 3)} AS shl
       |              FROM whst))""".stripMargin
  }
  private val WinnowCtes = winnowCtesOver("documents")

  /** Corpus-common boilerplate planted ahead of every 3rd doc in the
    * winnow-pairs fixture (the MIT-header shape): 16 tokens >= w+n-1 = 6,
    * so the winnowing guarantee makes its prints GUARANTEED shared across
    * all ~N/3 carriers — doc frequency ~167 at sf0.01, far over
    * [[WinnowDocFreqCap]], exactly the m² hot key the cap must drop. */
  private val WinnowBoilerplate =
    "permission is hereby granted free of charge to any person obtaining" +
      " a copy of this software"

  /** Print doc-frequency cap for `dedup_winnow_pairs`: well above any
    * organic sketch collision in the fixture, well below the planted
    * boilerplate's ~N/3 carriers — so the cap is value-load-bearing in
    * the oracle (skipping it admits boilerplate-only candidate pairs). */
  private val WinnowDocFreqCap = 32

  private val ContaminationSpanCtes =
    s"""$PositionalShingleCtes,
       |bench AS (SELECT DISTINCT sh FROM ps WHERE doc_id % 17 = 0),
       |dp AS (SELECT doc_id, pos FROM ps
       |       WHERE doc_id % 17 <> 0 AND sh IN (SELECT sh FROM bench)),
       |$IslandCtes""".stripMargin

  /** CTE list producing `pairs(id_a, id_b, jaccard)`: brute-force n-gram
    * (3-word shingle) Jaccard pairs at J >= 0.8 — inverted-index CTEs
    * mirroring the Spark arithmetic exactly. Shared by the pair queries and
    * the clustering oracle. `maxDocFreq` models DedupOps' skew guard: drop
    * shingles whose document frequency exceeds the cap before pairing (set
    * sizes stay uncapped, exactly like the Spark side). */
  private def jaccardPairCtes(maxDocFreq: Option[Int]): String = {
    val (capCte, pairSrc) = maxDocFreq match {
      case Some(cap) => (
        s"""exc AS (SELECT ex.doc_id, ex.sh FROM ex
           |        JOIN (SELECT sh FROM ex GROUP BY sh HAVING count(*) <= $cap) r
           |        USING (sh)),
           |""".stripMargin, "exc")
      case None => ("", "ex")
    }
    s"""$ShingleCtes,
       |ex AS (SELECT doc_id, unnest(shingles) AS sh FROM shs),
       |${capCte}sz AS (SELECT doc_id, len(shingles) AS sz FROM shs),
       |cm AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS cnt
       |       FROM $pairSrc a JOIN $pairSrc b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2),
       |pairs AS (
       |  SELECT ia AS id_a, ib AS id_b, CAST(cnt AS DOUBLE) / (sa.sz + sb.sz - cnt) AS jaccard
       |  FROM cm JOIN sz sa ON sa.doc_id = cm.ia JOIN sz sb ON sb.doc_id = cm.ib
       |  WHERE CAST(cnt AS DOUBLE) / (sa.sz + sb.sz - cnt) >= 0.8)""".stripMargin
  }

  private val JaccardPairCtes = jaccardPairCtes(None)

  /** Posting-list cap for the corpus-scale variant: at 100 TB a boilerplate
    * shingle shared by k docs contributes k² join rows, so the capped form
    * is the one that survives scale — the uncapped form is the exactness
    * baseline. */
  private val DocFreqCap = 20

  /** Document-frequency cap for the frame-hash / audio-fingerprint
    * containment joins: the fixtures plant a corpus-common title-card
    * frame (pHash 0, ~115 of 500 videos) and a corpus-common silence
    * fingerprint (fp 0, ~112 of 500 clips) — df ≫ this cap at every SF,
    * so the cap is LOAD-BEARING in the oracle comparison: an uncapped
    * Spark side would report shared/np/overlap values the cap-modeling
    * oracle rejects. */
  private val FrameHashDocFreqCap = 8

  private val JaccardBruteSql =
    s"WITH $JaccardPairCtes\nSELECT id_a, id_b, jaccard FROM pairs ORDER BY 1, 2"

  /** CTE block ending in `comp(id, component)`: connected components of the
    * brute-force `pairs` graph via a recursive CTE. ONE definition — the
    * cluster queries and the apply query must all validate against the same
    * component computation. */
  private val ComponentCtes =
    s"""edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |walk(id, label) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id
       |),
       |comp AS (SELECT id, min(label) AS component FROM walk GROUP BY id)""".stripMargin

  /** Shared by the label-propagation and star-contraction cluster queries
    * (the two must land on identical components). */
  private val ClustersOracle =
    s"""WITH RECURSIVE $JaccardPairCtes,
       |$ComponentCtes
       |SELECT id, component FROM comp ORDER BY id""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // EXACT n-gram Jaccard near-dup pairs: inverted-index join on shingle
    // hashes (only 8-byte keys shuffle; text never leaves the scan).
    QueryDef.withOracle("dedup_ngram_jaccard", JaccardBruteSql) { (s, dir) =>
      DedupOps.jaccardPairsExact(
        DedupOps.shingleSets(Tables(s, dir, "documents"), "doc_id", "text", 3),
        "doc_id", 0.8)
    },

    // The SKEW-GUARDED inverted index — the form that survives 100 TB: drop
    // shingles with document frequency above the cap before pairing, so a
    // boilerplate shingle shared by k docs can never contribute k² join
    // rows. The oracle models the identical cap, so the guard's effect on
    // the measured Jaccard is pinned, not hand-waved.
    QueryDef.withOracle("dedup_ngram_jaccard_capped",
      s"WITH ${jaccardPairCtes(Some(DocFreqCap))}\n" +
        "SELECT id_a, id_b, jaccard FROM pairs ORDER BY 1, 2") { (s, dir) =>
      DedupOps.jaccardPairsExact(
        DedupOps.shingleSets(Tables(s, dir, "documents"), "doc_id", "text", 3),
        "doc_id", 0.8, maxDocFreq = Some(DocFreqCap))
    },

    // NEAR-SUBSET (containment) pairs — Broder C = common/min(|A|,|B|),
    // the measure Jaccard misses BY CONSTRUCTION (a snippet quoted whole
    // inside a long page has C = 1, J ≈ |snippet|/|page|). The synthetic
    // corpus has ZERO containment-only pairs (near-dups are same-length —
    // measured in r11), so the query PLANTS them: every 10th sufficiently
    // long doc contributes a snippet companion (its first 12 tokens
    // rejoined with single spaces — tokenization-stable, so the snippet's
    // shingle set is a strict subset of the original's). The oracle
    // replays the same planting and the same df-capped pair core; the
    // result provably differs from the Jaccard pair set (planted pairs
    // sit at C = 1.0, J ≈ 0.2).
    QueryDef.withOracle("dedup_containment", {
      s"""WITH cdocs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id,
         |         array_to_string(list_slice(${OracleText.TOKS}, 1, 12), ' ') AS text
         |  FROM documents
         |  WHERE doc_id % 10 = 0 AND len(${OracleText.TOKS}) >= 24),
         |whst AS (SELECT doc_id, $WHS AS whs FROM cdocs),
         |shs AS (SELECT doc_id, ${OracleText.shingleDistinctSql("whs", 3)} AS shingles
         |        FROM whst WHERE len(whs) >= 3),
         |ex AS (SELECT doc_id, unnest(shingles) AS sh FROM shs),
         |exc AS (SELECT ex.doc_id, ex.sh FROM ex
         |        JOIN (SELECT sh FROM ex GROUP BY sh HAVING count(*) <= $DocFreqCap) r
         |        USING (sh)),
         |sz AS (SELECT doc_id, len(shingles) AS sz FROM shs),
         |cm AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS cnt
         |       FROM exc a JOIN exc b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT ia AS id_a, ib AS id_b,
         |       CAST(cnt AS DOUBLE) / least(sa.sz, sb.sz) AS containment,
         |       CAST(cnt AS DOUBLE) / (sa.sz + sb.sz - cnt) AS jaccard
         |FROM cm JOIN sz sa ON sa.doc_id = cm.ia JOIN sz sb ON sb.doc_id = cm.ib
         |WHERE CAST(cnt AS DOUBLE) / least(sa.sz, sb.sz) >= 0.9
         |ORDER BY 1, 2""".stripMargin
    }) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val toks = TextOps.tokens(col("text"))
      val snippets = docs
        .filter(col("doc_id") % 10 === 0 && size(toks) >= 24)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat_ws(" ", slice(toks, 1, 12)).as("text"))
      val planted = docs.select("doc_id", "text").unionByName(snippets)
      DedupOps.containmentPairs(
        DedupOps.shingleSets(planted, "doc_id", "text", 3),
        "doc_id", 0.9, maxDocFreq = Some(DocFreqCap))
    },

    // MinHash(128) + LSH(32 bands × 4 rows) candidates, exact-verified.
    // Same oracle as the brute force: candidate recall must be total.
    QueryDef.withOracle("dedup_minhash_lsh", JaccardBruteSql) { (s, dir) =>
      DedupOps.jaccardPairsLsh(
        DedupOps.shingleSets(Tables(s, dir, "documents"), "doc_id", "text", 3),
        "doc_id", 0.8, bands = 32, rows = 4)
    },

    // MinHash-LSH QUALITY measurement (the dedup analog of ann_recall):
    // candidate recall AND precision of a DELIBERATELY LOOSE sketch
    // (32 hashes, 16 bands × 2 rows) against brute-force Jaccard ground
    // truth at t=0.8, on a BOUNDED sample (doc_id < 150 — sketch quality
    // is corpus-size-independent, and the ground truth is quadratic by
    // definition, so the sample cannot grow with the corpus). The
    // production face (dedup_minhash_lsh, 128 hashes, 32×4) is gated
    // recall-total against the same brute force — THIS face puts the
    // approximation trade itself (how many band collisions are false,
    // what a thinner sketch misses) in the gated output. The oracle
    // replays the LCG hash family, the banding, the candidate join and
    // the exact verification end-to-end.
    QueryDef.withOracle("dedup_minhash_quality", {
      import graft.ops.TextOps.P
      s"""WITH $SpectrumCtes,
         |sg AS (SELECT doc_id, list_transform(range(0, 32), k ->
         |         list_min(list_transform(shingles, x ->
         |           (((k * 1103515245 + 12345) % ${P - 1} + 1) * x
         |            + ((k * 69069 + 362437) % $P)) % $P))) AS sig
         |       FROM shs),
         |bd AS (SELECT doc_id, b, sig[CAST(2 * b + 1 AS INT)] AS v1,
         |         sig[CAST(2 * b + 2 AS INT)] AS v2
         |       FROM (SELECT doc_id, sig, unnest(range(0, 16)) AS b FROM sg)),
         |cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
         |         FROM bd a JOIN bd b ON a.b = b.b AND a.v1 = b.v1
         |              AND a.v2 = b.v2 AND a.doc_id < b.doc_id),
         |$QualityCounterCtes
         |$QualityCounterSelect""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val shs = DedupOps.shingleSets(plantedSpectrum(s, dir), "doc_id", "text", 3)
      val sig = shs.select(col("doc_id"),
        call_function("graft_minhash", col("shingles"), lit(32)).as("sig"))
      val bd = sig.select(col("doc_id"),
          explode(transform(sequence(lit(0), lit(15)), b =>
            struct(b.as("b"),
              element_at(col("sig"), (b * 2 + 1).cast("int")).as("v1"),
              element_at(col("sig"), (b * 2 + 2).cast("int")).as("v2"))))
            .as("bk"))
        .select(col("doc_id"), col("bk.b").as("b"),
          col("bk.v1").as("v1"), col("bk.v2").as("v2"))
      val cand = bd.as("a").join(bd.as("b"),
          col("a.b") === col("b.b") && col("a.v1") === col("b.v1") &&
            col("a.v2") === col("b.v2") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
        .distinct()
      qualityCounters(s, cand, shs)
    },

    // SimHash QUALITY on the SAME planted spectrum and the SAME t = 0.8
    // shingle-Jaccard ground truth as dedup_minhash_quality — the two
    // sketches' numbers are directly comparable: a 30-bit SimHash within
    // Hamming radius 3 (exact via pigeonhole banding, so candidate recall
    // measures the SKETCH, not the banding) vs MinHash's 16×2 bands. The
    // published trade surfaces in the gated output: SimHash compresses a
    // whole token multiset into 30 bits, so its candidate set is cheaper
    // but noisier than MinHash's at the same truth threshold.
    QueryDef.withOracle("dedup_simhash_quality", {
      import OracleText.SIMHASH
      s"""WITH $SpectrumCtes,
         |sh AS (SELECT u.doc_id, $SIMHASH AS sh FROM u
         |       JOIN shs ON shs.doc_id = u.doc_id),
         |cand AS (SELECT a.doc_id AS ia, b.doc_id AS ib
         |         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |         WHERE bit_count(xor(a.sh, b.sh)) <= 3),
         |$QualityCounterCtes
         |$QualityCounterSelect""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val planted = plantedSpectrum(s, dir)
      val shs = DedupOps.shingleSets(planted, "doc_id", "text", 3)
      // restrict fingerprints to docs with >= 3 word hashes (the shingle
      // universe) so both sketches measure the same population
      val sims = planted.join(shs.select(col("doc_id")), "doc_id")
        .select(col("doc_id").as("id"),
          TextOps.simHashOfHashes(
            TextOps.wordHashes(TextOps.tokens(col("text"))), 30).as("fp"))
      val cand = DedupOps.bandedHammingPairs(sims, bits = 30, maxHamming = 3)
        .select(col("id_a").as("ia"), col("id_b").as("ib"))
      qualityCounters(s, cand, shs)
    },

    // INCREMENTAL dedup — the production shape: an incoming batch
    // (doc_id >= 250) is matched against the EXISTING corpus (doc_id < 250)
    // through the corpus's PERSISTED band index (staged once per JVM below,
    // exactly as a deployment builds it once per corpus epoch); the corpus
    // never re-pairs with itself and is never re-shingled per batch, so
    // per-batch cost scales with the increment. Oracle = brute-force
    // CROSS-side Jaccard at the same threshold (candidate recall must be
    // total, exactly like dedup_minhash_lsh).
    QueryDef.withOracle("dedup_incremental", {
      val split = 250
      s"""WITH $ShingleCtes,
         |ex AS (SELECT doc_id, unnest(shingles) AS sh FROM shs),
         |sz AS (SELECT doc_id, len(shingles) AS sz FROM shs),
         |cm AS (SELECT a.doc_id AS ni, b.doc_id AS oi, count(*) AS cnt
         |       FROM ex a JOIN ex b ON a.sh = b.sh
         |       WHERE a.doc_id >= $split AND b.doc_id < $split
         |       GROUP BY 1, 2)
         |SELECT ni AS new_id, oi AS old_id,
         |       CAST(cnt AS DOUBLE) / (sa.sz + sb.sz - cnt) AS jaccard
         |FROM cm JOIN sz sa ON sa.doc_id = cm.ni JOIN sz sb ON sb.doc_id = cm.oi
         |WHERE CAST(cnt AS DOUBLE) / (sa.sz + sb.sz - cnt) >= 0.8
         |ORDER BY 1, 2""".stripMargin
    }) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      DedupOps.incrementalJaccardMatchesIndexed(
          IncIndexStage.dir(s, dir), docs.filter(col("doc_id") >= 250),
          "doc_id", "text", 3, 0.8)
        .orderBy("new_id", "old_id")
    },

    // APPLY the incremental decision: the kept increment = incoming docs
    // with NO verified corpus match (id-only anti-join — the corpus-growth
    // step `corpus' = corpus ∪ kept`). Within-batch dups survive here by
    // contract; composing the in-batch apply face after this drop is the
    // full pipeline.
    QueryDef.withOracle("dedup_incremental_apply", {
      val split = 250
      s"""WITH $ShingleCtes,
         |ex AS (SELECT doc_id, unnest(shingles) AS sh FROM shs),
         |sz AS (SELECT doc_id, len(shingles) AS sz FROM shs),
         |cm AS (SELECT a.doc_id AS ni, b.doc_id AS oi, count(*) AS cnt
         |       FROM ex a JOIN ex b ON a.sh = b.sh
         |       WHERE a.doc_id >= $split AND b.doc_id < $split
         |       GROUP BY 1, 2),
         |m AS (SELECT DISTINCT ni FROM cm
         |      JOIN sz sa ON sa.doc_id = cm.ni JOIN sz sb ON sb.doc_id = cm.oi
         |      WHERE CAST(cnt AS DOUBLE) / (sa.sz + sb.sz - cnt) >= 0.8)
         |SELECT doc_id FROM documents
         |WHERE doc_id >= $split AND doc_id NOT IN (SELECT ni FROM m)
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val incoming = docs.filter(col("doc_id") >= 250)
      val matched = DedupOps.incrementalJaccardMatchesIndexed(
          IncIndexStage.dir(s, dir), incoming, "doc_id", "text", 3, 0.8)
        .select(col("new_id")).distinct()
      incoming.join(matched, incoming("doc_id") === matched("new_id"), "left_anti")
        .select("doc_id").orderBy("doc_id")
    },

    // STREAMING incremental dedup — the production corpus BUILD loop
    // (VERDICT r10 #3): micro-batches of incoming docs match against the
    // persisted band index via foreachBatch; each batch's KEPT documents
    // grow the index as a new epoch, so batch 2 deduplicates against
    // corpus ∪ kept(batch 1). Two AvailableNow drains over a shared
    // checkpoint (the standard lifecycle of every engine_stream_* face);
    // match output and epoch appends are partition-overwrite idempotent.
    // Oracle: brute-force cross-side Jaccard with the SAME epoch
    // semantics — batch 1 (250 <= id < 375) vs the corpus (< 250), then
    // batch 2 (>= 375) vs corpus ∪ kept-of-batch-1.
    QueryDef.withOracle("engine_stream_incremental", {
      val (split, mid) = (250, 375)
      s"""WITH $ShingleCtes,
         |ex AS (SELECT doc_id, unnest(shingles) AS sh FROM shs),
         |sz AS (SELECT doc_id, len(shingles) AS sz FROM shs),
         |cm AS (SELECT a.doc_id AS ni, b.doc_id AS oi, count(*) AS cnt
         |       FROM ex a JOIN ex b ON a.sh = b.sh
         |       WHERE a.doc_id >= $split AND b.doc_id < a.doc_id
         |       GROUP BY 1, 2),
         |jm AS (SELECT ni, oi,
         |         CAST(cnt AS DOUBLE) / (sa.sz + sb.sz - cnt) AS jaccard
         |       FROM cm JOIN sz sa ON sa.doc_id = cm.ni
         |               JOIN sz sb ON sb.doc_id = cm.oi
         |       WHERE CAST(cnt AS DOUBLE) / (sa.sz + sb.sz - cnt) >= 0.8),
         |m1 AS (SELECT * FROM jm WHERE ni < $mid AND oi < $split),
         |k1 AS (SELECT doc_id FROM documents
         |       WHERE doc_id >= $split AND doc_id < $mid
         |         AND doc_id NOT IN (SELECT ni FROM m1)),
         |m2 AS (SELECT * FROM jm WHERE ni >= $mid
         |         AND (oi < $split OR oi IN (SELECT doc_id FROM k1)))
         |SELECT ni AS new_id, oi AS old_id, jaccard FROM m1
         |UNION ALL
         |SELECT ni AS new_id, oi AS old_id, jaccard FROM m2
         |ORDER BY 1, 2""".stripMargin
    }) { (s, dir) =>
      val (split, mid) = (250, 375)
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val work = java.nio.file.Files.createTempDirectory("graft-incwork-").toString
      val stage = java.nio.file.Files.createTempDirectory("graft-incstage-").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft-incckpt-").toString
      val out = java.nio.file.Files.createTempDirectory("graft-incout-").toString
      // the run MUTATES its index (epoch appends), so each run gets a
      // private copy — a filesystem copy of the per-JVM epoch-form
      // template (ms), not three Spark read/write jobs per run
      IncEpochStage.copyTo(s, dir, work)
      val docSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
      def drain(): Unit =
        DedupOps.streamingIncrementalDedup(
          s.readStream.schema(docSchema).parquet(stage),
          work, out, ckpt, "doc_id", "text", 3, 0.8)
      docs.filter(col("doc_id") >= split && col("doc_id") < mid)
        .write.mode("append").parquet(stage)
      drain()
      docs.filter(col("doc_id") >= mid).write.mode("append").parquet(stage)
      drain()
      val matchSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("new_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("old_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("jaccard",
          org.apache.spark.sql.types.DoubleType)))
      // at tiny SFs the incoming side can be empty -> no batch dirs at all
      scala.util.Try(s.read.parquet(out).select("new_id", "old_id", "jaccard"))
        .getOrElse(s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), matchSchema))
        .orderBy("new_id", "old_id")
    },

    // Near-dup CLUSTERS — the end of the dedup pipeline: pairwise A~B, B~C
    // must collapse to ONE keep-decision even though A~C was never emitted.
    // Spark side: iterative min-label propagation over the LSH pair graph
    // (DedupOps.connectedComponents); oracle: the same components from a
    // recursive CTE over the brute-force pair set. component = min doc_id
    // of the cluster = the canonical document to keep.
    QueryDef.withOracle("dedup_clusters", ClustersOracle) { (s, dir) =>
      DedupOps.jaccardClustersLsh(
        DedupOps.shingleSets(Tables(s, dir, "documents"), "doc_id", "text", 3),
        "doc_id", 0.8, bands = 32, rows = 4).orderBy("id")
    },

    // The same clusters via STAR CONTRACTION — the O(log n)-round path for
    // adversarial-diameter pair graphs (label propagation is diameter-
    // bounded). Identical oracle: both algorithms must land on identical
    // components.
    QueryDef.withOracle("dedup_clusters_star", ClustersOracle) { (s, dir) =>
      DedupOps.jaccardClustersLsh(
        DedupOps.shingleSets(Tables(s, dir, "documents"), "doc_id", "text", 3),
        "doc_id", 0.8, bands = 32, rows = 4,
        components = DedupOps.connectedComponentsStar(_)).orderBy("id")
    },

    // APPLY the dedup decision — the step that actually shrinks the corpus:
    // every non-representative cluster member drops (component != id), the
    // representative and every never-matched document survive. One anti-join
    // + one flag join on 8-byte ids; the cluster map scales with the
    // DUPLICATE count (can be half the corpus), so no broadcast hint — AQE
    // broadcasts when the measured size allows, shuffles otherwise. The
    // documents themselves never shuffle (id-only projection).
    QueryDef.withOracle("dedup_apply",
      s"""WITH RECURSIVE $JaccardPairCtes,
         |$ComponentCtes
         |SELECT d.doc_id, c.id IS NOT NULL AS is_cluster_rep
         |FROM documents d
         |LEFT JOIN (SELECT id FROM comp WHERE id = component) c ON c.id = d.doc_id
         |WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val comp = DedupOps.jaccardClustersLsh(
        DedupOps.shingleSets(Tables(s, dir, "documents"), "doc_id", "text", 3),
        "doc_id", 0.8, bands = 32, rows = 4)
        .localCheckpoint(false)
      val drop = comp.filter(col("id") =!= col("component"))
        .select(col("id").as("doc_id"))
      val reps = comp.filter(col("id") === col("component"))
        .select(col("id").as("doc_id"), lit(true).as("is_cluster_rep"))
      Tables(s, dir, "documents").select("doc_id")
        .join(drop, Seq("doc_id"), "left_anti")
        .join(reps, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("is_cluster_rep"), lit(false)).as("is_cluster_rep"))
        .orderBy("doc_id")
    },

    // Span-level EXACT-substring dedup (Lee et al. 2022, suffix-array-free:
    // rolling-hash k-gram windows -> corpus-wide duplicate test -> maximal
    // consecutive-window runs). The oracle rebuilds the positional window
    // hashes, the >=2-occurrence set, and the gaps-and-islands merge with
    // identical integer arithmetic.
    QueryDef.withOracle("dedup_substring_spans",
      s"""WITH $SubstringSpanCtes
         |SELECT doc_id, span_start, span_end FROM spans
         |ORDER BY doc_id, span_start""".stripMargin) { (s, dir) =>
      DedupOps.duplicatedSpans(Tables(s, dir, "documents"), "doc_id", "text",
          k = SubstringK)
        .orderBy("doc_id", "span_start")
    },

    // Per-doc substring-dedup report: token count, maximal-span count,
    // duplicated-token total and fraction — the drop/trim decision input.
    QueryDef.withOracle("dedup_substring",
      s"""WITH $SubstringSpanCtes,
         |nt AS (SELECT doc_id, CAST(len(${OracleText.TOKS}) AS BIGINT) AS n_tokens
         |       FROM documents),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |          CAST(SUM(span_end - span_start) AS BIGINT) AS dup_tokens
         |        FROM spans GROUP BY doc_id)
         |SELECT a.doc_id, n.n_tokens, a.n_spans, a.dup_tokens,
         |       CAST(a.dup_tokens AS DOUBLE) / n.n_tokens AS dup_fraction
         |FROM agg a JOIN nt n USING (doc_id) ORDER BY a.doc_id""".stripMargin) {
      (s, dir) =>
      DedupOps.substringDedupStats(Tables(s, dir, "documents"), "doc_id", "text",
          k = SubstringK)
        .orderBy("doc_id")
    },

    // APPLY the span removal: every doc's surviving token stream as a count
    // + order-sensitive fingerprint (docs without duplicated spans pass
    // through whole). The oracle expands covered positions from the
    // duplicated windows and folds the kept hashes in stream order.
    QueryDef.withOracle("dedup_substring_apply",
      s"""WITH $SubstringSpanCtes,
         |tokpos AS (SELECT doc_id, unnest(whs) AS wh,
         |             generate_subscripts(whs, 1) - 1 AS pos
         |           FROM whst),
         |cov AS (SELECT DISTINCT doc_id, pos + o AS pos
         |        FROM dp, range(0, $SubstringK) r(o)),
         |keptl AS (SELECT t.doc_id, t.wh, t.pos
         |          FROM tokpos t LEFT JOIN cov c
         |            ON t.doc_id = c.doc_id AND t.pos = c.pos
         |          WHERE c.pos IS NULL),
         |fpq AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |          list_reduce(list_prepend(CAST(0 AS BIGINT),
         |            list(wh ORDER BY pos)),
         |            (f, h) -> (f * ${TextOps.B2} + h) % ${TextOps.P}) AS fp
         |        FROM keptl GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(f.n_kept, 0) AS n_kept,
         |       COALESCE(f.fp, 0) AS kept_fp
         |FROM documents d LEFT JOIN fpq f USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      DedupOps.substringDedupApply(Tables(s, dir, "documents"), "doc_id", "text",
          k = SubstringK)
        .orderBy("doc_id")
    },

    // LINE-LEVEL corpus dedup (the CCNet paragraph stage): every 8-word
    // line hashed with the 62-bit wide key, corpus-common lines (count >=
    // 2, within-doc repeats included) dropped, surviving line stream
    // fingerprinted in order. The oracle replays the stride selection over
    // the wide window hashes, the corpus count, the drop decision and the
    // ordered fold — exact duplicate docs share EVERY line, so the planted
    // dup structure fires corpus-wide.
    QueryDef.withOracle("dedup_lines",
      s"""WITH $LineCtes,
         |dupl AS (SELECT lh FROM ln GROUP BY lh HAVING count(*) >= 2),
         |mk AS (SELECT ln.doc_id, ln.li, ln.lh, (d.lh IS NOT NULL) AS isdup
         |       FROM ln LEFT JOIN dupl d ON ln.lh = d.lh),
         |$LineAggCte
         |SELECT s.doc_id, CAST(s.nl AS BIGINT) AS n_lines,
         |  COALESCE(a.n_dup_lines, 0) AS n_dup_lines,
         |  COALESCE(a.kept_fp, 0) AS kept_fp
         |FROM sl s LEFT JOIN ag a USING (doc_id)
         |ORDER BY s.doc_id""".stripMargin) { (s, dir) =>
      DedupOps.lineDedup(Tables(s, dir, "documents"), "doc_id", "text",
          wordsPerLine = LineWords)
        .orderBy("doc_id")
    },

    // INCREMENTAL line dedup — the per-batch corpus-build face: incoming
    // docs (doc_id >= 250) probe the PERSISTED corpus line-count index
    // (staged once per epoch, one bloom-pruned parquet read — the corpus
    // is never re-hashed); a batch line drops if corpus count + batch
    // count reaches 2. Per-batch cost scales with the increment.
    QueryDef.withOracle("dedup_lines_incremental",
      s"""WITH $LineCtes,
         |ccnt AS (SELECT lh, CAST(count(*) AS BIGINT) AS cc FROM ln
         |         WHERE doc_id < 250 GROUP BY lh),
         |inc AS (SELECT * FROM ln WHERE doc_id >= 250),
         |bcnt AS (SELECT lh, CAST(count(*) AS BIGINT) AS bc FROM inc GROUP BY lh),
         |mk AS (SELECT i.doc_id, i.li, i.lh,
         |         (COALESCE(c.cc, 0) + b.bc >= 2) AS isdup
         |       FROM inc i JOIN bcnt b ON i.lh = b.lh
         |       LEFT JOIN ccnt c ON i.lh = c.lh),
         |$LineAggCte
         |SELECT s.doc_id, CAST(s.nl AS BIGINT) AS n_lines,
         |  COALESCE(a.n_dup_lines, 0) AS n_dup_lines,
         |  COALESCE(a.kept_fp, 0) AS kept_fp
         |FROM sl s LEFT JOIN ag a USING (doc_id)
         |WHERE s.doc_id >= 250
         |ORDER BY s.doc_id""".stripMargin) { (s, dir) =>
      DedupOps.incrementalLineDedup(LineIdxStage.dir(s, dir),
          Tables(s, dir, "documents").filter(col("doc_id") >= 250),
          "doc_id", "text", LineWords)
        .orderBy("doc_id")
    },

    // WEB-CURATION PIPELINE, end to end (the flagship composition — what
    // a crawl actually goes through before training): gzip-compressed
    // markup lands → RFC 1952 multi-member gunzip → HTML boilerplate
    // extraction → rule filter (length / language / stopword density) →
    // LINE-LEVEL dedup over the surviving extracted text (cheap stages
    // first, corpus-wide stage last — the real order) → final keep
    // verdict (filter-kept AND < half the lines corpus-common). Every
    // stage is individually gated by its own query; here the oracle
    // replays the WHOLE chain from the source text (gunzip∘gzip = id is
    // text_from_gzip's proven contract, so the oracle starts at the
    // markup wrap) — a drift in any stage or in the stage ORDER breaks
    // the value match.
    QueryDef.withOracle("pipeline_curate_web", CurateChainOracleSql) {
      (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      import graft.ops.{HtmlOps, MultimodalOps}
      // stage 1: compressed markup (wrapping encoding-DAMAGED text — NFD /
      // mojibake / zero-width plants) lands as multi-member gzip, gunzips;
      // stage 2 (r16): normalize the arrived markup BEFORE extraction
      curateFromMarkup(MultimodalOps.gunzipText(
          MultimodalOps.gzipAssetsFromDocuments(
            Tables(s, dir, "documents")
              .select(col("doc_id"),
                HtmlOps.htmlFixture(col("doc_id"),
                  graft.ops.TextOps.damageFixture(col("doc_id"), col("text")))
                  .as("text"))))
        .select(col("asset_id").as("doc_id"),
          graft.ops.TextOps.normalizeText(col("text")).as("html")))
    },

    // The SAME curation chain fed by the REAL crawl container: per doc a
    // .warc.gz (warcinfo + request + a 404 that must be status-filtered +
    // the 200-response(s) carrying the markup, each record a gzip member)
    // → record walk → HTTP bodies → extraction → rule filter → line
    // dedup → keep. The oracle is VERBATIM pipeline_curate_web's: both
    // transports are lossless (gzip by text_from_gzip's contract, WARC by
    // text_from_warc's), so a value drift here isolates a transport bug.
    QueryDef.withOracle("pipeline_curate_warc", CurateChainOracleSql) {
      (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      import graft.ops.{HtmlOps, MultimodalOps}
      curateFromMarkup(MultimodalOps.warcTexts(
          MultimodalOps.warcAssetsFromDocuments(
            Tables(s, dir, "documents")
              .select(col("doc_id"),
                HtmlOps.htmlFixture(col("doc_id"),
                  graft.ops.TextOps.damageFixture(col("doc_id"), col("text")))
                  .as("text"))))
        .select(col("asset_id").as("doc_id"),
          graft.ops.TextOps.normalizeText(col("text")).as("html")))
    },

    // WINNOWING fingerprints (Schleimer/MOSS): per-window minima over the
    // positional 3-shingle hashes at w=4 — a deterministic local sketch
    // (expected density 2/(w+1)) whose guarantee is structural: any shared
    // exact run >= w+n-1 tokens shares a fingerprint. Per-doc sketch size
    // + order-free checksum; the oracle replays window minima exactly.
    QueryDef.withOracle("dedup_winnow",
      s"""WITH $WinnowCtes
         |SELECT doc_id, CAST(len(shl) AS BIGINT) AS n_windows,
         |  CAST(len(win) AS BIGINT) AS n_prints,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_sort(win)),
         |    (a, b) -> (a * ${TextOps.B2} + b) % ${TextOps.P}) AS prints_fp
         |FROM wfp ORDER BY doc_id""".stripMargin) { (s, dir) =>
      DedupOps.winnowedFingerprints(Tables(s, dir, "documents"),
          "doc_id", "text", n = 3, w = 4)
        .select(col("doc_id"),
          size(col("shl")).cast("long").as("n_windows"),
          size(col("win")).cast("long").as("n_prints"),
          aggregate(array_sort(col("win")), lit(0L),
            (a, b) => (a * TextOps.B2 + b) % TextOps.P).as("prints_fp"))
        .orderBy("doc_id")
    },

    // CRAWL → TRAINING-ORDER CAPSTONE (the WHOLE feed in one oracled
    // query): .warc.gz of markup → gzip members → WARC records → HTTP
    // bodies → HTML extraction → rule filter → line-level dedup → the
    // CURATED corpus → real greedy-merge BPE token counts → deterministic
    // pack into 2048-token training bins per source. Every stage is
    // individually gated elsewhere; this query pins their COMPOSITION —
    // the oracle replays transport (lossless, so it starts at the markup
    // wrap), curation verdicts, the recursive-CTE merge loop over the
    // EXTRACTED text and the pack cumsum in one statement. A drift in any
    // stage, any stage ORDER, or the survivor set shifts every start_tok
    // after it.
    QueryDef.withOracle("pipeline_build_train", {
      val reason =
        s"""CASE WHEN len(${OracleText.toksSql("extracted")}) < 20 THEN 'too_short'
           |     WHEN len(${OracleText.toksSql("extracted")}) > 80 THEN 'too_long'
           |     WHEN ${OracleText.langPredSql("extracted")} <> 'en' THEN 'non_english'
           |     WHEN ${OracleText.swRatioSql("extracted")} < 0.05 THEN 'low_stopword_density'
           |END""".stripMargin.replace("\n", " ")
      val h = OracleText.wordHashSql("CAST(k.doc_id AS VARCHAR)")
      s"""WITH RECURSIVE ${TextQueries.HtmlExtractCtes},
         |f AS (SELECT doc_id, extracted, $reason AS reason FROM j),
         |fk AS (SELECT doc_id, extracted AS text FROM f WHERE reason IS NULL),
         |${lineCtesOver("fk", "text")},
         |dupl AS (SELECT lh FROM ln GROUP BY lh HAVING count(*) >= 2),
         |mk AS (SELECT ln.doc_id, ln.li, ln.lh, (d.lh IS NOT NULL) AS isdup
         |       FROM ln LEFT JOIN dupl d ON ln.lh = d.lh),
         |nd AS (SELECT doc_id,
         |         CAST(SUM(CASE WHEN isdup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |       FROM mk GROUP BY doc_id),
         |kd AS (SELECT f.doc_id, f.extracted AS text
         |       FROM f LEFT JOIN sl s USING (doc_id) LEFT JOIN nd USING (doc_id)
         |       WHERE f.reason IS NULL AND
         |         (COALESCE(s.nl, 0) = 0 OR COALESCE(nd.n_dup, 0) * 2 <= s.nl)),
         |${OracleText.bpeCtesOver("kd")}
         |SELECT source, doc_id, n_tokens, start_tok,
         |  start_tok // 2048 AS bin_id
         |FROM (SELECT pk.source, pk.doc_id, pk.n_tokens,
         |        CAST(COALESCE(sum(pk.n_tokens) OVER (PARTITION BY pk.source
         |          ORDER BY pk.hv, pk.doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          AS BIGINT) AS start_tok
         |      FROM (SELECT d.source, k.doc_id,
         |              COALESCE(b.n_tokens, 0) AS n_tokens, $h AS hv
         |            FROM kd k JOIN documents d ON d.doc_id = k.doc_id
         |            LEFT JOIN bpe_doc b ON b.doc_id = k.doc_id) pk)
         |ORDER BY source, doc_id""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      import graft.ops.{HtmlOps, MultimodalOps}
      val docs = Tables(s, dir, "documents")
      val arrived = MultimodalOps.warcTexts(
          MultimodalOps.warcAssetsFromDocuments(
            docs.select(col("doc_id"),
              HtmlOps.htmlFixture(col("doc_id"), col("text")).as("text"))))
        .select(col("asset_id").as("doc_id"), col("text").as("html"))
      val curated = curatedSurvivors(arrived)
      val withSource = curated
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      graft.ops.PackingOps.packSequences(withSource,
          "doc_id", "extracted", "source", 2048L,
          tokenCount = c =>
            size(graft.ops.TextOps.bpeMergedTokens(c)).cast("long"))
        .orderBy("source", "doc_id")
    },

    // CONTRASTIVE PAIR MINING (the embedding-training feed built from the
    // dedup machinery): POSITIVES are the verified near-dup pairs (the
    // LSH contraction, oracle-equal to brute force), NEGATIVES one
    // deterministic partner per doc — its successor in (hash, id) order
    // WITHIN a hash chunk (bounded windows, never a global sort), chunk
    // tail wrapping to the chunk head — normalized, deduped, and
    // anti-joined against the positive set so no labeled-0 pair is
    // secretly a near-dup. Both engines define the negative the same
    // chunked way, so the pair list replays exactly.
    QueryDef.withOracle("pipeline_contrastive_pairs", {
      val h = OracleText.wordHashSql("CAST(doc_id AS VARCHAR)")
      val span = TextOps.P / 32 + 1
      s"""WITH $JaccardPairCtes,
         |hvt AS (SELECT doc_id, $h AS hv, ($h) // $span AS ck FROM documents),
         |nxt AS (SELECT doc_id,
         |          COALESCE(
         |            lead(doc_id) OVER (PARTITION BY ck ORDER BY hv, doc_id),
         |            first_value(doc_id) OVER (PARTITION BY ck
         |              ORDER BY hv, doc_id
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
         |            AS partner
         |        FROM hvt),
         |negd AS (SELECT DISTINCT least(doc_id, partner) AS id_a,
         |           greatest(doc_id, partner) AS id_b
         |         FROM nxt WHERE doc_id <> partner),
         |negx AS (SELECT n.id_a, n.id_b FROM negd n
         |         LEFT JOIN pairs p ON p.id_a = n.id_a AND p.id_b = n.id_b
         |         WHERE p.id_a IS NULL)
         |SELECT id_a, id_b, CAST(1 AS BIGINT) AS label, jaccard FROM pairs
         |UNION ALL
         |SELECT id_a, id_b, CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE) FROM negx
         |ORDER BY label DESC, id_a, id_b""".stripMargin
    }) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      graft.functions.GraftFunctions.register(s)
      val docs = Tables(s, dir, "documents")
      val pos = DedupOps.jaccardPairsLsh(
          DedupOps.shingleSets(docs, "doc_id", "text", 3),
          "doc_id", 0.8, bands = 32, rows = 4)
        .localCheckpoint(false) // read by the output AND the anti-join
      val span = TextOps.P / 32 + 1
      val hv = TextOps.polyHash(col("doc_id").cast("string"))
      val w = Window.partitionBy(col("ck")).orderBy(col("hv"), col("doc_id"))
      val wAll = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val neg = docs
        .select(col("doc_id"), hv.as("hv"))
        .withColumn("ck", expr(s"hv div ${span}L"))
        .select(col("doc_id"),
          coalesce(lead(col("doc_id"), 1).over(w),
            first(col("doc_id")).over(wAll)).as("partner"))
        .filter(col("doc_id") =!= col("partner"))
        .select(least(col("doc_id"), col("partner")).as("id_a"),
          greatest(col("doc_id"), col("partner")).as("id_b"))
        .distinct()
        .join(pos.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_anti")
      pos.select(col("id_a"), col("id_b"), lit(1L).as("label"), col("jaccard"))
        .unionAll(neg.select(col("id_a"), col("id_b"), lit(0L).as("label"),
          lit(0.0).as("jaccard")))
        .orderBy(col("label").desc, col("id_a"), col("id_b"))
    },

    // Winnow-collision candidate pairs + exact verify: candidates share a
    // SUB-CAP fingerprint (inverted index over the sketch, ~2/(w+1) the
    // posting volume of the full shingle index, prints with doc frequency
    // over WinnowDocFreqCap dropped BEFORE pairing — the winnowing
    // guarantee makes corpus-common boilerplate a GUARANTEED shared print,
    // i.e. an m² hot join key, so the fixture PLANTS an MIT-style license
    // header on every 3rd doc whose prints the cap MUST drop for the pair
    // list to match), true Jaccard then verifies via the 8-byte
    // common-count join over the full uncapped shingle sets. The oracle
    // replays fixture, sketch, df cap, candidacy AND the Jaccard — a cap
    // drift or a boilerplate-only pair admitted anywhere breaks the gate.
    QueryDef.withOracle("dedup_winnow_pairs",
      s"""WITH bdocs AS (SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 0 THEN '$WinnowBoilerplate ' || text
         |       ELSE text END AS text FROM documents),
         |${winnowCtesOver("bdocs")},
         |ex0 AS (SELECT doc_id, unnest(win) AS p FROM wfp),
         |hot AS (SELECT p FROM ex0 GROUP BY p
         |        HAVING count(*) > $WinnowDocFreqCap),
         |ex AS (SELECT e.doc_id, e.p FROM ex0 e
         |       LEFT JOIN hot h ON e.p = h.p WHERE h.p IS NULL),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM ex a JOIN ex b ON a.p = b.p AND a.doc_id < b.doc_id),
         |sets AS (SELECT doc_id, list_distinct(shl) AS sh FROM wfp)
         |SELECT id_a, id_b,
         |  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |    / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
         |    AS jaccard
         |FROM cand JOIN sets sa ON sa.doc_id = cand.id_a
         |          JOIN sets sb ON sb.doc_id = cand.id_b
         |WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |    / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
         |    >= 0.8
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(lit(WinnowBoilerplate + " "), col("text")))
          .otherwise(col("text")).as("text"))
      DedupOps.winnowPairs(docs, "doc_id", "text",
          n = 3, w = 4, threshold = 0.8,
          maxDocFreq = Some(WinnowDocFreqCap))
        .orderBy("id_a", "id_b")
    },

    // SPAN-LEVEL benchmark decontamination (the modern >= k-token overlap
    // check): maximal spans of training docs whose every window hash
    // appears in the eval slice — the eval's distinct hashes broadcast and
    // the corpus probes map-side, so 100 TB never shuffles for the
    // membership test. Same islands merge as substring dedup.
    QueryDef.withOracle("dedup_contamination_spans",
      s"""WITH $ContaminationSpanCtes
         |SELECT doc_id, span_start, span_end FROM spans
         |ORDER BY doc_id, span_start""".stripMargin) { (s, dir) =>
      DedupOps.contaminationSpans(Tables(s, dir, "documents"), "doc_id", "text",
          k = SubstringK, isBenchmark = pmod(col("doc_id"), lit(17)) === 0)
        .orderBy("doc_id", "span_start")
    },

    // INCREMENTAL span-level substring dedup — the per-batch corpus-build
    // face: incoming docs (doc_id >= 250) probe the PERSISTED corpus
    // window-hash index (staged once per epoch, one parquet read — the
    // corpus is never re-shingled); a batch window is duplicated if it
    // occurs in the corpus OR twice within the batch. Same islands merge;
    // per-batch cost scales with the increment.
    QueryDef.withOracle("dedup_substring_incremental",
      s"""WITH $PositionalShingleCtes,
         |inc AS (SELECT doc_id, pos, sh FROM ps WHERE doc_id >= 250),
         |bcnt AS (SELECT sh, CAST(count(*) AS BIGINT) AS bc FROM inc GROUP BY sh),
         |ccnt AS (SELECT sh, CAST(count(*) AS BIGINT) AS cc FROM ps
         |         WHERE doc_id < 250 GROUP BY sh),
         |dp AS (SELECT i.doc_id, i.pos FROM inc i
         |       JOIN bcnt USING (sh) LEFT JOIN ccnt USING (sh)
         |       WHERE COALESCE(cc, 0) + bc >= 2),
         |$IslandCtes
         |SELECT doc_id, span_start, span_end FROM spans
         |ORDER BY doc_id, span_start""".stripMargin) { (s, dir) =>
      DedupOps.incrementalSubstringSpans(SubIdxStage.dir(s, dir),
          Tables(s, dir, "documents").filter(col("doc_id") >= 250),
          "doc_id", "text", SubstringK)
        .orderBy("doc_id", "span_start")
    },

    // SimHash pairs within Hamming radius 1, EXACT via pigeonhole banding
    // (radius+1 bands -> equality join with perfect recall).
    QueryDef.withOracle("dedup_simhash",
      s"""WITH s AS (SELECT doc_id, $SIMHASH AS sh FROM documents)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
         |FROM s a, s b
         |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 1
         |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      DedupOps.simhashPairs(Tables(s, dir, "documents"), "doc_id", "text",
        bits = 30, maxHamming = 1)
    },

    // PERCEPTUAL-HASH image dedup — the multimodal and dedup families
    // joined end-to-end on real pixels: decode the grayscale-PNG fixture,
    // integer-DCT pHash (MultimodalOps.imagePhash), then the same
    // skew-immune pigeonhole banding as dedup_simhash at radius 4 over 63
    // bits. The fixture PLANTS true positives (every 40th doc gets a
    // globally +16-brightened companion; pHash is brightness-invariant by
    // construction, so each pair MUST surface at Hamming 0) and the
    // brute-force oracle replays hash + distance, so both recall of the
    // planted pairs and absence of false pairs are value-checked.
    QueryDef.withOracle("dedup_phash",
      s"""WITH ${OraclePhash.CTES}
         |SELECT a.asset_id AS id_a, b.asset_id AS id_b,
         |       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
         |FROM ph a, ph b
         |WHERE a.asset_id < b.asset_id
         |  AND bit_count(xor(a.phash, b.phash)) <= 4
         |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      // "imgo" stage = base PNGs + rotated TIFF companions (NOT the "img"
      // stage: dedup_multimodal's < PhashCompanionOffset filter would
      // admit the 2e6-offset rotated ids). Corrected decode restores the
      // base grid, so every (base, rotated) pair MUST surface at
      // Hamming 0 alongside the brightness pairs.
      DedupOps.bandedHammingPairs(
        graft.ops.MultimodalOps.imagePhash(
          MmAssetStage.df(s, dir, "imgo") {
            val base = graft.ops.MultimodalOps.phashAssetsFromDocuments(
              Tables(s, dir, "documents"))
            base.unionByName(
              graft.ops.MultimodalOps.orientedCompanionAssets(base))
          })
          .select(col("asset_id").as("id"), col("phash").as("fp")),
        bits = 63, maxHamming = 4)
    },

    // VIDEO temporal dedup: near-duplicate videos found by frame-hash set
    // containment — shared / min(|A|,|B|) over DISTINCT per-frame pHashes
    // (inverted-index join on the 8-byte hash; frames never shuffle),
    // through the df-capped informative-hash core: hashes in more than
    // FrameHashDocFreqCap assets leave both the join and the set sizes
    // BEFORE pairing (black frames / title cards / intro bumpers are
    // skewed join keys with m² pair fan-out at corpus scale). The fixture
    // plants BOTH shapes: a one-frame-temporal-shift companion for every
    // 7th doc (planted pairs at overlap (nf-1)/nf >= 0.5, invariant under
    // the cap) and a corpus-common constant title card opening every 5th
    // video (pHash 0 in ~115 of 500 assets — the hash the cap MUST drop;
    // skipping the cap shifts shared/np value-visibly). The oracle
    // replays container tiling, the lossy JPEG decode, the pHash chain,
    // the df cap AND the pair scoring.
    QueryDef.withOracle("dedup_video",
      s"""WITH ${OracleVideoPhash.CTES},
         |vset0 AS (SELECT DISTINCT asset_id, phash FROM vph),
         |vset AS (SELECT v.asset_id, v.phash FROM vset0 v
         |         JOIN (SELECT phash FROM vset0 GROUP BY 1
         |               HAVING count(*) <= $FrameHashDocFreqCap) k USING (phash)),
         |vn AS (SELECT asset_id, count(*) AS np FROM vset GROUP BY 1),
         |vcm AS (SELECT a.asset_id AS ia, b.asset_id AS ib, count(*) AS shared
         |        FROM vset a JOIN vset b
         |          ON a.phash = b.phash AND a.asset_id < b.asset_id
         |        GROUP BY 1, 2)
         |SELECT ia AS id_a, ib AS id_b, shared,
         |       CAST(shared AS DOUBLE) / least(na.np, nb.np) AS overlap
         |FROM vcm JOIN vn na ON na.asset_id = ia JOIN vn nb ON nb.asset_id = ib
         |WHERE CAST(shared AS DOUBLE) / least(na.np, nb.np) >= 0.5
         |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      DedupOps.hashSetContainmentPairs(
        graft.ops.MultimodalOps.videoPhashes(
          MmAssetStage.df(s, dir, "vid")(
            graft.ops.MultimodalOps.mjpegCompanionAssetsFromDocuments(
              Tables(s, dir, "documents"))),
          frameStride = 1),
        "asset_id", "phash", threshold = 0.5,
        maxDocFreq = Some(FrameHashDocFreqCap))
    },

    // ANIMATED-GIF temporal dedup (r14): the LOSSLESS twin of dedup_video —
    // GIF decode is exact, so the polynomial hash of each decoded frame's
    // pixels is a frame identity and containment over the frame-hash sets
    // finds re-cuts directly. Same df-capped core: the fixture plants a
    // constant SPLASH frame opening every 5th animation (fixed geometry ⇒
    // ONE hash value in ~117 of 500 assets — the intro-card skew head the
    // cap must drop) and a one-frame temporal-shift companion for every
    // 6th doc (planted pairs at (nf-1)/nf >= 0.5, cap-invariant). The
    // oracle replays the frame tiling, the polynomial hash, the df cap
    // and the pair scoring.
    QueryDef.withOracle("dedup_gif", {
      import graft.ops.MultimodalOps.{GifCompanionOffset, GifCompanionStep,
        GifDedupH, GifDedupW, GifSplashGray, GifSplashStep}
      import graft.ops.TextOps.{B2, P}
      val npx = GifDedupW * GifDedupH
      s"""WITH ga AS (SELECT doc_id AS asset_id, text,
         |         CAST(2 + doc_id % 3 AS INT) AS nf, 0 AS shift,
         |         CASE WHEN doc_id % $GifSplashStep = 0 THEN 1 ELSE 0 END AS sp
         |       FROM documents
         |       UNION ALL
         |       SELECT doc_id + $GifCompanionOffset, text,
         |         CAST(2 + doc_id % 3 AS INT), 1,
         |         CASE WHEN doc_id % $GifSplashStep = 0 THEN 1 ELSE 0 END
         |       FROM documents WHERE doc_id % $GifCompanionStep = 0),
         |gfr AS (SELECT ga.*, CAST(f.f AS INT) AS f
         |        FROM ga, range(5) f(f) WHERE f.f < nf + sp),
         |gpx AS (SELECT asset_id, f,
         |          list_transform(range(0, $npx), i -> CAST(
         |            CASE WHEN sp = 1 AND f = 0 THEN $GifSplashGray
         |                 WHEN length(text) = 0 THEN 0
         |                 ELSE unicode(substr(text,
         |                   CAST((11 * (f - sp + shift) + i) % length(text) + 1
         |                        AS INT), 1)) END AS BIGINT)) AS vs
         |        FROM gfr),
         |gfh AS (SELECT asset_id, f,
         |          list_reduce(list_prepend(CAST(0 AS BIGINT), vs),
         |            (s, x) -> (s * $B2 + x) % $P) * ${TextOps.P2} +
         |          list_reduce(list_prepend(CAST(0 AS BIGINT), vs),
         |            (s, x) -> (s * $B2 + x) % ${TextOps.P2}) AS fh
         |        FROM gpx),
         |gset0 AS (SELECT DISTINCT asset_id, fh FROM gfh),
         |gset AS (SELECT g.asset_id, g.fh FROM gset0 g
         |         JOIN (SELECT fh FROM gset0 GROUP BY 1
         |               HAVING count(*) <= $FrameHashDocFreqCap) k USING (fh)),
         |gn AS (SELECT asset_id, count(*) AS np FROM gset GROUP BY 1),
         |gcm AS (SELECT a.asset_id AS ia, b.asset_id AS ib, count(*) AS shared
         |        FROM gset a JOIN gset b
         |          ON a.fh = b.fh AND a.asset_id < b.asset_id
         |        GROUP BY 1, 2)
         |SELECT ia AS id_a, ib AS id_b, shared,
         |       CAST(shared AS DOUBLE) / least(na.np, nb.np) AS overlap
         |FROM gcm JOIN gn na ON na.asset_id = ia JOIN gn nb ON nb.asset_id = ib
         |WHERE CAST(shared AS DOUBLE) / least(na.np, nb.np) >= 0.5
         |ORDER BY 1, 2""".stripMargin
    }) { (s, dir) =>
      DedupOps.hashSetContainmentPairs(
        graft.ops.MultimodalOps.gifFrameHashes(
          MmAssetStage.df(s, dir, "gif")(
            graft.ops.MultimodalOps.animGifCompanionAssetsFromDocuments(
              Tables(s, dir, "documents")))),
        "asset_id", "fh", threshold = 0.5,
        maxDocFreq = Some(FrameHashDocFreqCap))
    },

    // AUDIO temporal dedup: near-duplicate audio found by fingerprint-set
    // containment — the same inverted-index + Broder-containment core as
    // dedup_video through the same df-capped informative-hash core
    // (silence windows fingerprint identically corpus-wide — the skewed
    // join key the cap drops). The fixture plants BOTH shapes: a
    // polarity-inverted companion for every 9th doc (band powers are
    // exactly negation-invariant, planted pairs at overlap 1.0 — the cap
    // removes fp 0 from both sides of a pair, so 1.0 is cap-invariant)
    // and 4 frames of leading silence in every 5th clip (fp 0 in ~112 of
    // 500 assets, the corpus-common fingerprint the cap MUST drop). The
    // oracle replays the PCM mapping, the integer DFT, the bit rule, the
    // window hash, the df cap and the pair scoring.
    QueryDef.withOracle("dedup_audio",
      s"""WITH ${OracleAudioFp.CTES},
         |aset0 AS (SELECT DISTINCT asset_id, fp FROM aff),
         |aset AS (SELECT a.asset_id, a.fp FROM aset0 a
         |         JOIN (SELECT fp FROM aset0 GROUP BY 1
         |               HAVING count(*) <= $FrameHashDocFreqCap) k USING (fp)),
         |an AS (SELECT asset_id, count(*) AS np FROM aset GROUP BY 1),
         |acm AS (SELECT a.asset_id AS ia, b.asset_id AS ib, count(*) AS shared
         |        FROM aset a JOIN aset b
         |          ON a.fp = b.fp AND a.asset_id < b.asset_id
         |        GROUP BY 1, 2)
         |SELECT ia AS id_a, ib AS id_b, shared,
         |       CAST(shared AS DOUBLE) / least(na.np, nb.np) AS overlap
         |FROM acm JOIN an na ON na.asset_id = ia JOIN an nb ON nb.asset_id = ib
         |WHERE CAST(shared AS DOUBLE) / least(na.np, nb.np) >= 0.5
         |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      DedupOps.hashSetContainmentPairs(
        graft.ops.MultimodalOps.audioFingerprints(
          MmAssetStage.df(s, dir, "aud")(
            graft.ops.MultimodalOps.fpWavAssetsFromDocuments(
              Tables(s, dir, "documents")))),
        "asset_id", "fp", threshold = 0.5,
        maxDocFreq = Some(FrameHashDocFreqCap))
    },

// VIDEO CURATION CAPSTONE — the fourth modality, same one-plan shape:
    // MJPEG corpus (temporal-shift re-cut twins every 7th doc, corpus-
    // common constant-gray title card opening every 5th) → per-frame
    // decode + pHash ONCE (pinned — the signature table feeds BOTH
    // stages) → STATIC-FRAME filter (a constant frame has zero AC energy,
    // so its pHash is exactly 0 — the title card IS the planted static
    // frame; intro-card clips drop) → frame-hash containment DEDUP among
    // survivors (df-capped, components, keep-min) → per-asset verdict.
    // Re-cut twins of kept bases MUST dedup ((nf−1)/nf ≥ the 0.5
    // operating point); the oracle replays the whole JPEG decode chain,
    // the phash-0 rule, capped containment and recursive components.
    QueryDef.withOracle("pipeline_curate_video",
      s"""WITH RECURSIVE ${OracleVideoPhash.CTES},
         |fvv AS MATERIALIZED (SELECT asset_id,
         |          CASE WHEN max(CASE WHEN phash = 0 THEN 1 ELSE 0 END) = 1
         |               THEN 'static' ELSE 'keep' END AS freason
         |        FROM vph GROUP BY 1),
         |vset0 AS (SELECT DISTINCT v.asset_id, v.phash FROM vph v
         |          JOIN fvv ON fvv.asset_id = v.asset_id
         |          WHERE fvv.freason = 'keep'),
         |vset AS (SELECT v.asset_id, v.phash FROM vset0 v
         |         JOIN (SELECT phash FROM vset0 GROUP BY 1
         |               HAVING count(*) <= $FrameHashDocFreqCap) k USING (phash)),
         |vn AS (SELECT asset_id, count(*) AS np FROM vset GROUP BY 1),
         |vcm AS (SELECT a.asset_id AS ia, b.asset_id AS ib, count(*) AS shared
         |        FROM vset a JOIN vset b
         |          ON a.phash = b.phash AND a.asset_id < b.asset_id
         |        GROUP BY 1, 2),
         |prs AS (SELECT ia AS id_a, ib AS id_b
         |        FROM vcm JOIN vn na ON na.asset_id = ia
         |                 JOIN vn nb ON nb.asset_id = ib
         |        WHERE CAST(shared AS DOUBLE) / least(na.np, nb.np) >= 0.5),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM prs
         |          UNION ALL SELECT id_b, id_a FROM prs),
         |walk(id, label) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id),
         |comp AS (SELECT id, min(label) AS component FROM walk GROUP BY id)
         |SELECT fvv.asset_id,
         |  CASE WHEN fvv.freason = 'static' THEN 'filtered_static'
         |       WHEN comp.id IS NOT NULL AND comp.component != fvv.asset_id
         |         THEN 'dup'
         |       ELSE 'kept' END AS status,
         |  CASE WHEN fvv.freason = 'static' THEN NULL
         |       WHEN comp.id IS NOT NULL THEN comp.component
         |       ELSE fvv.asset_id END AS canon
         |FROM fvv LEFT JOIN comp ON comp.id = fvv.asset_id
         |ORDER BY asset_id""".stripMargin) { (s, dir) =>
      import graft.ops.MultimodalOps
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      // ONE decode+hash pass feeds both the static filter and the dedup
      val vph = MultimodalOps.videoPhashes(
          MmAssetStage.df(s, dir, "vid")(
            MultimodalOps.mjpegCompanionAssetsFromDocuments(
              Tables(s, dir, "documents"))),
          frameStride = 1)
        .persist(MEMORY_AND_DISK)
      val fv = vph.groupBy("asset_id")
        .agg(max((col("phash") === 0L).cast("int")).as("st"))
        .select(col("asset_id"),
          when(col("st") === 1, lit("static")).otherwise(lit("keep"))
            .as("freason"))
        .persist(MEMORY_AND_DISK)
      val keptPh = vph.join(
        fv.filter(col("freason") === "keep").select("asset_id"), "asset_id")
      val comp = DedupOps.connectedComponents(
        DedupOps.hashSetContainmentPairs(keptPh, "asset_id", "phash",
            threshold = 0.5, maxDocFreq = Some(FrameHashDocFreqCap))
          .select("id_a", "id_b"))
      fv.join(comp, fv("asset_id") === comp("id"), "left")
        .select(col("asset_id"),
          when(col("freason") === "static", "filtered_static")
            .when(col("id").isNotNull && col("component") =!= col("asset_id"),
              "dup")
            .otherwise("kept").as("status"),
          when(col("freason") === "static", lit(null))
            .when(col("id").isNotNull, col("component"))
            .otherwise(col("asset_id")).as("canon"))
        .orderBy("asset_id")
    },

    // AUDIO CURATION CAPSTONE — the speech-side pipeline as ONE oracled
    // plan (completing the text/vision/audio capstone trilogy): the
    // fingerprint-fixture corpus (polarity twins every 9th doc, 4 planted
    // lead-in silence frames every 5th) → decode + SILENCE filter (clips
    // whose silent-frame share crosses the floor drop — the planted
    // lead-ins make the rule fire exactly on short %5 clips) → fingerprint
    // DEDUP among survivors (Haitsma-Kalker window hashes, df-capped
    // containment >= 0.5, connected components, keep-min canonical) →
    // per-asset verdict. Polarity twins MUST dedup onto their base's
    // component (band powers are invariant under negation); the oracle
    // replays samples, silence audit, the whole fingerprint chain,
    // brute-force containment and recursive-CTE components.
    QueryDef.withOracle("pipeline_curate_audio",
      s"""WITH RECURSIVE ${OracleAudioFp.CTES},
         |sfr AS (SELECT asset_id, f,
         |          coalesce(list_sum(list_transform(
         |            ss[CAST(f * ${graft.ops.MultimodalOps.AudioFpFrame} + 1 AS INT) :
         |               CAST((f + 1) * ${graft.ops.MultimodalOps.AudioFpFrame} AS INT)],
         |            x -> abs(x))), 0) AS en
         |        FROM aft),
         |scnt AS (SELECT asset_id, CAST(count(*) AS BIGINT) AS n_frames,
         |           CAST(sum(CASE WHEN en = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |             AS n_silent
         |         FROM sfr GROUP BY 1),
         |fv AS (SELECT a.asset_id,
         |         CASE WHEN s.n_silent > 0 AND 4 * s.n_silent >= s.n_frames
         |              THEN 'silence' ELSE 'keep' END AS freason
         |       FROM (SELECT DISTINCT asset_id FROM afa) a
         |       LEFT JOIN scnt s USING (asset_id)),
         |aset0 AS (SELECT DISTINCT x.asset_id, x.fp FROM aff x
         |          JOIN fv ON fv.asset_id = x.asset_id
         |          WHERE fv.freason = 'keep'),
         |aset AS (SELECT a.asset_id, a.fp FROM aset0 a
         |         JOIN (SELECT fp FROM aset0 GROUP BY 1
         |               HAVING count(*) <= $FrameHashDocFreqCap) k USING (fp)),
         |an AS (SELECT asset_id, count(*) AS np FROM aset GROUP BY 1),
         |acm AS (SELECT a.asset_id AS ia, b.asset_id AS ib, count(*) AS shared
         |        FROM aset a JOIN aset b
         |          ON a.fp = b.fp AND a.asset_id < b.asset_id
         |        GROUP BY 1, 2),
         |prs AS (SELECT ia AS id_a, ib AS id_b
         |        FROM acm JOIN an na ON na.asset_id = ia
         |                 JOIN an nb ON nb.asset_id = ib
         |        WHERE CAST(shared AS DOUBLE) / least(na.np, nb.np) >= 0.5),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM prs
         |          UNION ALL SELECT id_b, id_a FROM prs),
         |walk(id, label) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id),
         |comp AS (SELECT id, min(label) AS component FROM walk GROUP BY id)
         |SELECT fv.asset_id,
         |  CASE WHEN fv.freason = 'silence' THEN 'filtered_silence'
         |       WHEN comp.id IS NOT NULL AND comp.component != fv.asset_id
         |         THEN 'dup'
         |       ELSE 'kept' END AS status,
         |  CASE WHEN fv.freason = 'silence' THEN NULL
         |       WHEN comp.id IS NOT NULL THEN comp.component
         |       ELSE fv.asset_id END AS canon
         |FROM fv LEFT JOIN comp ON comp.id = fv.asset_id
         |ORDER BY asset_id""".stripMargin) { (s, dir) =>
      import graft.ops.MultimodalOps
      val assets = MmAssetStage.df(s, dir, "aud")(
        MultimodalOps.fpWavAssetsFromDocuments(Tables(s, dir, "documents")))
      // pinned: the silence audit is a full WAV-decode pass and feeds BOTH
      // the kept-filter and the final verdict join
      val fv = MultimodalOps.audioSilence(assets)
        .select(col("asset_id"),
          when(col("n_silent") > 0 &&
              lit(4L) * col("n_silent") >= col("n_frames"),
            lit("silence")).otherwise(lit("keep")).as("freason"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val kept = assets.join(
        fv.filter(col("freason") === "keep").select("asset_id"), "asset_id")
      val comp = DedupOps.connectedComponents(
        DedupOps.hashSetContainmentPairs(
            MultimodalOps.audioFingerprints(kept), "asset_id", "fp",
            threshold = 0.5, maxDocFreq = Some(FrameHashDocFreqCap))
          .select("id_a", "id_b"))
      fv.join(comp, fv("asset_id") === comp("id"), "left")
        .select(col("asset_id"),
          when(col("freason") === "silence", "filtered_silence")
            .when(col("id").isNotNull && col("component") =!= col("asset_id"),
              "dup")
            .otherwise("kept").as("status"),
          when(col("freason") === "silence", lit(null))
            .when(col("id").isNotNull, col("component"))
            .otherwise(col("asset_id")).as("canon"))
        .orderBy("asset_id")
    },

        // MULTIMODAL CORPUS BUILD — the composed keep decision a real
    // multimodal training-data pipeline makes per document: drop any doc
    // that is a near-duplicate of a LOWER-id doc in ANY modality (text
    // shingle Jaccard >= 0.8 through the df-capped pair core, image pHash
    // Hamming <= 4, video frame-hash overlap >= 0.5, audio fingerprint
    // overlap >= 0.5 — each the machinery its own registered query gates).
    // Four pair pipelines + id-level joins; drop sets are duplicate-scale.
    // Output: one row per doc with the per-modality drop flags and the
    // final kept verdict, all replayed by the oracle through every
    // modality's full chain (decode arithmetic included).
    QueryDef.withOracle("dedup_multimodal", {
      import graft.ops.MultimodalOps.{AudioCompanionOffset, PhashCompanionOffset,
        VideoCompanionOffset}
      // text leg rides the MinHash-LSH CONTRACTION (VERDICT r14 watch item
      // #3): at 500k+ docs the exact inverted-index join dominated the
      // composed build's 100× row (28.3× vs 9.6/4.0 for the sibling legs);
      // the rep-contracted banding absorbs exact-duplicate clusters before
      // candidates exist. The oracle stays BRUTE-FORCE (uncapped): LSH must
      // reach every true pair at J >= 0.8 (miss ≈ 5e-8/pair, 32×4 banding),
      // exactly the dedup_minhash_lsh gating contract.
      s"""WITH $JaccardPairCtes,
         |tdrop AS (SELECT DISTINCT id_b AS doc_id FROM pairs),
         |${OraclePhash.CTES},
         |idrop AS (SELECT DISTINCT b.asset_id AS doc_id FROM ph a, ph b
         |          WHERE a.asset_id < b.asset_id
         |            AND a.asset_id < $PhashCompanionOffset
         |            AND b.asset_id < $PhashCompanionOffset
         |            AND bit_count(xor(a.phash, b.phash)) <= 4),
         |${OracleVideoPhash.CTES},
         |vvset0 AS (SELECT DISTINCT asset_id, phash FROM vph
         |           WHERE asset_id < $VideoCompanionOffset),
         |vvset AS (SELECT v.asset_id, v.phash FROM vvset0 v
         |          JOIN (SELECT phash FROM vvset0 GROUP BY 1
         |                HAVING count(*) <= $FrameHashDocFreqCap) k USING (phash)),
         |vvn AS (SELECT asset_id, count(*) AS np FROM vvset GROUP BY 1),
         |vvcm AS (SELECT a.asset_id AS ia, b.asset_id AS ib, count(*) AS sh
         |         FROM vvset a JOIN vvset b
         |           ON a.phash = b.phash AND a.asset_id < b.asset_id
         |         GROUP BY 1, 2),
         |vdrop AS (SELECT DISTINCT ib AS doc_id
         |          FROM vvcm JOIN vvn na ON na.asset_id = ia
         |                    JOIN vvn nb ON nb.asset_id = ib
         |          WHERE CAST(sh AS DOUBLE) / least(na.np, nb.np) >= 0.5),
         |${OracleAudioFp.CTES},
         |aaset0 AS (SELECT DISTINCT asset_id, fp FROM aff
         |           WHERE asset_id < $AudioCompanionOffset),
         |aaset AS (SELECT a.asset_id, a.fp FROM aaset0 a
         |          JOIN (SELECT fp FROM aaset0 GROUP BY 1
         |                HAVING count(*) <= $FrameHashDocFreqCap) k USING (fp)),
         |aan AS (SELECT asset_id, count(*) AS np FROM aaset GROUP BY 1),
         |aacm AS (SELECT a.asset_id AS ia, b.asset_id AS ib, count(*) AS sh
         |         FROM aaset a JOIN aaset b
         |           ON a.fp = b.fp AND a.asset_id < b.asset_id
         |         GROUP BY 1, 2),
         |adrop AS (SELECT DISTINCT ib AS doc_id
         |          FROM aacm JOIN aan na ON na.asset_id = ia
         |                    JOIN aan nb ON nb.asset_id = ib
         |          WHERE CAST(sh AS DOUBLE) / least(na.np, nb.np) >= 0.5)
         |SELECT d.doc_id,
         |  (t.doc_id IS NOT NULL) AS drop_text,
         |  (i.doc_id IS NOT NULL) AS drop_image,
         |  (v.doc_id IS NOT NULL) AS drop_video,
         |  (a.doc_id IS NOT NULL) AS drop_audio,
         |  (t.doc_id IS NULL AND i.doc_id IS NULL
         |   AND v.doc_id IS NULL AND a.doc_id IS NULL) AS kept
         |FROM documents d
         |LEFT JOIN tdrop t ON t.doc_id = d.doc_id
         |LEFT JOIN idrop i ON i.doc_id = d.doc_id
         |LEFT JOIN vdrop v ON v.doc_id = d.doc_id
         |LEFT JOIN adrop a ON a.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    }) { (s, dir) =>
      import graft.ops.MultimodalOps
      val docs = Tables(s, dir, "documents")
      def drops(pairs: org.apache.spark.sql.DataFrame, flag: String) =
        pairs.select(col("id_b").as("doc_id")).distinct()
          .withColumn(flag, lit(true))
      val textDrop = drops(DedupOps.jaccardPairsLsh(
        DedupOps.shingleSets(docs, "doc_id", "text", 3),
        "doc_id", 0.8), "drop_text")
      // base assets only: companions are planted test artifacts, not docs
      // (the asset_id filter pushes into the staged-parquet scan, so
      // companions are pruned before any decode work)
      val imgDrop = drops(DedupOps.bandedHammingPairs(
        MultimodalOps.imagePhash(
          MmAssetStage.df(s, dir, "img")(
            MultimodalOps.phashAssetsFromDocuments(docs))
            .filter(col("asset_id") < MultimodalOps.PhashCompanionOffset))
          .select(col("asset_id").as("id"), col("phash").as("fp")),
        bits = 63, maxHamming = 4), "drop_image")
      // video/audio legs read the PLANTED corpora (title cards, leading
      // silence) so the df cap is exercised here too; companions filtered
      // out up front — the base corpus is what a real build deduplicates.
      val vidDrop = drops(DedupOps.hashSetContainmentPairs(
        MultimodalOps.videoPhashes(
          MmAssetStage.df(s, dir, "vid")(
            MultimodalOps.mjpegCompanionAssetsFromDocuments(docs))
            .filter(col("asset_id") < MultimodalOps.VideoCompanionOffset)),
        "asset_id", "phash", threshold = 0.5,
        maxDocFreq = Some(FrameHashDocFreqCap)), "drop_video")
      val audDrop = drops(DedupOps.hashSetContainmentPairs(
        MultimodalOps.audioFingerprints(
          MmAssetStage.df(s, dir, "aud")(
            MultimodalOps.fpWavAssetsFromDocuments(docs))
            .filter(col("asset_id") < MultimodalOps.AudioCompanionOffset)),
        "asset_id", "fp", threshold = 0.5,
        maxDocFreq = Some(FrameHashDocFreqCap)), "drop_audio")
      docs.select("doc_id")
        .join(textDrop, Seq("doc_id"), "left")
        .join(imgDrop, Seq("doc_id"), "left")
        .join(vidDrop, Seq("doc_id"), "left")
        .join(audDrop, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("drop_text"), lit(false)).as("drop_text"),
          coalesce(col("drop_image"), lit(false)).as("drop_image"),
          coalesce(col("drop_video"), lit(false)).as("drop_video"),
          coalesce(col("drop_audio"), lit(false)).as("drop_audio"),
          (coalesce(col("drop_text"), lit(false)) ||
           coalesce(col("drop_image"), lit(false)) ||
           coalesce(col("drop_video"), lit(false)) ||
           coalesce(col("drop_audio"), lit(false))) === false as "kept")
        .orderBy("doc_id")
    },

    // Embedding-cosine near-dup pairs. Since r10 this registered query IS
    // the corpus-scale LSH path (VERDICT r9 #7): hyperplane-bucket
    // candidates (24 tables × 8 bits, Hamming-2 probe) + exact cosine
    // verify, oracled against the BRUTE-FORCE all-pairs SQL — a hash
    // mismatch means the candidate machinery dropped a true pair (recall
    // measured 1.0 at sf0.001/0.01/0.1 with these parameters). The
    // quadratic Scala brute force (DedupOps.embeddingPairs) stays in the
    // library as the documented verification baseline, exercised by
    // PipelineOpsSpec and mirrored exactly by this oracle SQL; it is no
    // longer a registered query, so the default path a user reaches is the
    // one that survives 100 TB. At this loose 0.4 threshold pruning is weak
    // by physics but the corpus-broadcast cross join is gone — see
    // DedupOps.embeddingPairsLsh scaladoc for the calibration math, and
    // dedup_embedding_lsh_tight for the regime where pruning bites.
    QueryDef.withOracle("dedup_embedding",
      s"""WITH $NORMED
         |SELECT * FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         ${OracleVec.dotSql("a", "b")} / (a.nrm * b.nrm) AS cosine
         |  FROM n a, n b WHERE a.vec_id < b.vec_id
         |) WHERE cosine >= 0.4 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      DedupOps.embeddingPairsLsh(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        0.4, tables = 24, bits = 8, probeRadius = 2)
    },

    // The TIGHT-threshold regime (cosine ≥ 0.9 — the SemDeDup operating
    // point) with the parameterization whose pruning actually bites: 12
    // tables × 18 bits, Hamming-2 probe (per-pair miss ≈ 2e-4 at 0.9, ≈
    // 2e-7 at 0.95). Same brute-force oracle shape. The driver testdata's
    // embeddings are near-orthogonal (max pairwise cosine ≈ 0.51), so both
    // sides are empty here — the gate pins schema + no-false-positives;
    // RECALL at this threshold is proven by the PipelineOpsSpec planted-
    // near-dup test, and the prune factor is MEASURED per round: Bench
    // emits emb_lsh_cand_ratio_tight/_loose into the bench JSON
    // (calibration says ≪1% vs ~95%).
    QueryDef.withOracle("dedup_embedding_lsh_tight",
      s"""WITH $NORMED
         |SELECT * FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         ${OracleVec.dotSql("a", "b")} / (a.nrm * b.nrm) AS cosine
         |  FROM n a, n b WHERE a.vec_id < b.vec_id
         |) WHERE cosine >= 0.9 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      DedupOps.embeddingPairsLshTight(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.9)
    },

    // Benchmark decontamination: docs with doc_id % 17 == 0 stand in for the
    // eval set; every other doc reports the fraction of its distinct 3-gram
    // shingles that appear anywhere in the eval set, flagged at >= 0.1. The
    // benchmark shingle set broadcasts (eval suites are MBs); the training
    // side streams map-side — no corpus-scale shuffle.
    QueryDef.withOracle("dedup_contamination",
      s"""WITH $ShingleCtes,
         |bench AS (SELECT DISTINCT unnest(shingles) AS sh FROM shs WHERE doc_id % 17 = 0),
         |train AS (SELECT doc_id, shingles FROM shs WHERE doc_id % 17 <> 0),
         |ex AS (SELECT doc_id, unnest(shingles) AS sh FROM train),
         |hit AS (SELECT ex.doc_id, count(*) AS n_hit FROM ex JOIN bench USING (sh) GROUP BY 1)
         |SELECT t.doc_id, CAST(len(t.shingles) AS BIGINT) AS n_shingles,
         |       COALESCE(h.n_hit, 0) AS n_hit,
         |       CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / len(t.shingles) AS contamination
         |FROM train t LEFT JOIN hit h ON h.doc_id = t.doc_id
         |WHERE CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / len(t.shingles) >= 0.1
         |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
      DedupOps.benchmarkContamination(Tables(s, dir, "documents"),
        "doc_id", "text", 3, pmod(col("doc_id"), lit(17)) === 0, 0.1)
    },

    // THE COMPOSED CORPUS BUILD — the whole curation pipeline as ONE query
    // plan: near-dup removal (LSH clusters → drop non-representatives) →
    // rule-based quality filter (single-pass native text counts) → per-
    // SOURCE temperature rebalancing (thresholds computed on the FILTERED
    // survivors — pipeline order matters and the oracle replays it) →
    // per-source kept-docs + exact token volume. Every stage is an
    // operator that also ships standalone; this entry proves they COMPOSE
    // in one Catalyst plan with the aggregate-scale output a pipeline
    // report wants. All arithmetic is the standalone stages' (hash grid,
    // IEEE sqrt/mul, integer token counts) — bitwise replayable.
    QueryDef.withOracle("pipeline_curate", {
      val h = OracleText.wordHashSql("CAST(doc_id AS VARCHAR)")
      import OracleText.{LANG_PRED, SW_RATIO, TOKS}
      s"""WITH RECURSIVE $JaccardPairCtes,
         |$ComponentCtes,
         |${OracleText.BPE_CTES},
         |surv AS (SELECT d.* FROM documents d
         |         WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id <> component)),
         |filt AS (SELECT * FROM surv WHERE
         |           CASE WHEN len($TOKS) < 20 THEN 'x'
         |                WHEN len($TOKS) > 80 THEN 'x'
         |                WHEN $LANG_PRED <> 'en' THEN 'x'
         |                WHEN $SW_RATIO < 0.05 THEN 'x' END IS NULL),
         |cnt AS (SELECT source, count(*) AS n FROM filt GROUP BY 1),
         |thr AS (SELECT source,
         |          CAST(floor(1e6 * sqrt(CAST((SELECT min(n) FROM cnt) AS DOUBLE)
         |                 / n)) AS BIGINT) AS keep_below
         |        FROM cnt),
         |kept AS (SELECT f.* FROM filt f JOIN thr USING (source)
         |         WHERE $h % 1000000 < thr.keep_below)
         |SELECT k.source, count(*) AS n_docs,
         |       CAST(sum(COALESCE(b.n_tokens, 0)) AS BIGINT) AS n_tokens
         |FROM kept k LEFT JOIN bpe_doc b USING (doc_id)
         |GROUP BY 1 ORDER BY k.source""".stripMargin
    }) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val comp = DedupOps.jaccardClustersLsh(
        DedupOps.shingleSets(docs, "doc_id", "text", 3),
        "doc_id", 0.8, bands = 32, rows = 4)
        .localCheckpoint(false)
      val drop = comp.filter(col("id") =!= col("component"))
        .select(col("id").as("doc_id"))
      val surv = docs.join(drop, Seq("doc_id"), "left_anti")
      val counted = surv
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("_c", TextOps.textCounts(col("text")))
      val nWord = col("_c.n_word")
      val (predL, _) = TextOps.langIdFromHits(col("_c.sw_hits"))
      val swRatio = when(nWord === 0, lit(0.0))
        .otherwise(element_at(col("_c.sw_hits"),
          graft.functions.GraftTextCounts.langIndex("en") + 1)
          .cast("double") / nWord)
      // keep iff NO filter rule fires (same rule order as text_filter)
      val filt = counted.filter(
        nWord >= 20 && nWord <= 80 && predL === "en" && swRatio >= 0.05)
      val cnt = filt.groupBy("source").agg(count(lit(1)).as("n"))
      val minN = cnt.agg(min("n").as("nmin"))
      val thr = cnt.crossJoin(broadcast(minN))
        .select(col("source"),
          floor(lit(1e6) * sqrt(col("nmin").cast("double") / col("n")))
            .cast("long").as("keep_below"))
      // token VOLUME on real BPE counts (r10 verdict #1 — the number a
      // pipeline report ships is trained-tokenizer tokens, not word runs)
      filt.join(broadcast(thr), "source")
        .filter(pmod(TextOps.polyHash(col("doc_id").cast("string")),
          lit(1000000L)) < col("keep_below"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextOps.bpeMergedTokens(col("text"))).cast("long"))
            .as("n_tokens"))
        .orderBy("source")
    }
  )
}

/** DuckDB fragments for double-exact vector math (DuckDB's own
  * list_cosine_similarity computes in float32 — NOT used; these spell out
  * the same left-fold double arithmetic as graft.ops.SimilarityOps). */
object OracleVec {
  /** CTE `n`: embeddings as double vectors with their L2 norms. */
  val NORMED: String =
    """e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |       FROM embeddings),
      |n AS (SELECT vec_id, label, v,
      |        sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |          list_transform(v, x -> x * x)), (s, x) -> s + x)) AS nrm
      |      FROM e)""".stripMargin

  /** Left-fold dot product of `$a.v` and `$b.v`. */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a.v) + 1), i -> $a.v[i] * $b.v[i])), (s, x) -> s + x)"
}
