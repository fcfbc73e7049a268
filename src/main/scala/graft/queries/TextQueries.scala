package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{HtmlOps, QualityModelOps, TextOps}
import graft.tables.Tables

/** Text-analysis operators over the `documents` table, each oracle-checked:
  * the DuckDB SQL reproduces the exact same integer/double arithmetic
  * (polynomial hashes via `list_reduce`, ratios with identical term order),
  * so results hash-match bit-for-bit. */
object TextQueries {

  import OracleText._

  /** CTE chain ending in `j(doc_id, n_blocks, n_kept, extracted)` — the
    * HTML fixture wrap + the full extraction stack (mirrors ops/HtmlOps
    * stage for stage). ONE definition shared by text_extract_html and the
    * composed curation queries, so they can never drift.
    *
    * `textE` is the text expression the markup wraps (the curate
    * capstones wrap encoding-DAMAGED text, OracleText.damageSql);
    * `normalize` inserts the TextOps.normalizeText replay between arrival
    * and extraction — the r16 curate-chain order: transport → normalize →
    * extract. */
  private[queries] def htmlExtractCtesOver(
      textE: String, normalize: Boolean): String = {
    def tagless(e: String) = s"regexp_replace($e, '${HtmlOps.TagRe}', '', 'g')"
    val linkTxt = "list_reduce(list_prepend('', " +
      s"list_transform(regexp_extract_all(x, '${HtmlOps.LinkRe}'), " +
      s"a -> ${tagless("a")})), (p, q) -> p || q)"
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&").foldLeft(
      "list_reduce(list_prepend('', kept), " +
        "(a, x) -> CASE WHEN a = '' THEN x ELSE a || ' ' || x END)") {
      case (c, (e, r)) => s"replace($c, '$e', '$r')"
    }
    // NOTE: this block is EMBEDDED in queries that call .stripMargin, so
    // no line may begin with '|' after whitespace — concatenation
    // operators sit at line ends (a leading '||' would lose its first
    // pipe to the OUTER stripMargin and bind as bitwise-or)
    val arrived = if (normalize) OracleText.normalizeSql("html0") else "html0"
    s"""h0 AS (SELECT doc_id,
       |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
       |    '</title><style>body { color: #fff; }</style><script>var x = 1 < 2; track(' ||
       |    CAST(doc_id AS VARCHAR) ||
       |    ');</script></head><body><div id="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div><p>' ||
       |    ($textE) ||
       |    ' <a href="/ref">ref</a></p><li><a href="/x">more links</a> <a href="/y">other pages</a></li><p>short &amp; sweet ' ||
       |    CAST(doc_id % 7 AS VARCHAR) ||
       |    '</p><!-- generated page ' || CAST(doc_id AS VARCHAR) ||
       |    ' --><footer><a href="/tos">Terms</a> | <a href="/privacy">Privacy</a></footer></body></html>'
       |    AS html0 FROM documents),
       |h AS (SELECT doc_id, $arrived AS html FROM h0),
       |b AS (SELECT doc_id,
       |        regexp_extract_all(regexp_replace(html, '${HtmlOps.StripRe}', '', 'g'),
       |          '${HtmlOps.BlockRe}') AS blocks
       |      FROM h),
       |k AS (SELECT doc_id, len(blocks) AS n_blocks,
       |        list_transform(list_filter(blocks, x ->
       |          len(${tagless("x")}) > 0 AND
       |          ${HtmlOps.DensityNum} * len($linkTxt) <= len(${tagless("x")})),
       |          x -> ${tagless("x")}) AS kept
       |      FROM b),
       |j AS (SELECT doc_id, n_blocks, len(kept) AS n_kept,
       |        trim(regexp_replace($decoded, '${HtmlOps.WsRe}', ' ', 'g')) AS extracted
       |      FROM k)""".stripMargin
  }

  /** The clean-text, no-normalization instance (text_extract_html and the
    * build_train capstone, whose transport fixtures stay byte-clean). */
  private[queries] val HtmlExtractCtes: String =
    htmlExtractCtesOver("text", normalize = false)

  /** "Curated" source whitelist for the quality-classifier label (the
    * wiki-vs-crawl split of the reference-corpus training recipe).
    * Declared BEFORE `defs` — object vals initialize in order. */
  private val Curated: Seq[String] = (0 to 4).map(i => s"src$i")
  private def CuratedSql = Curated.map(s => s"'$s'").mkString(", ")

  /** Persisted LR weights (one row, w0..w5) — PID-scoped like the ANN
    * quantizers, same outlive-the-JVM contract (the driver's DuckDB replay
    * reads it after Verify exits), same dead-PID + 24h reaper. */
  private val QlrWeightsPath = new java.io.File(
    sys.props("java.io.tmpdir"),
    s"graft-qlr-weights-${ProcessHandle.current().pid()}.parquet").getAbsolutePath
  /** Persisted one-vs-rest language-ID weights (L rows, cand + w0..w32) —
    * same PID-scoped + reaped contract as [[QlrWeightsPath]]. */
  private val LidWeightsPath = new java.io.File(
    sys.props("java.io.tmpdir"),
    s"graft-lid-weights-${ProcessHandle.current().pid()}.parquet").getAbsolutePath
  locally {
    val re = """graft-(?:qlr|lid)-weights-(\d+)\.parquet""".r
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    val self = ProcessHandle.current().pid()
    Option(tmp.listFiles()).toSeq.flatten.foreach { f =>
      f.getName match {
        case re(pid) if pid.toLong != self &&
            !ProcessHandle.of(pid.toLong).map[Boolean](_.isAlive).orElse(false) &&
            f.lastModified() < cutoff =>
          Option(f.listFiles()).toSeq.flatten.foreach(_.delete())
          f.delete(): Unit
        case _ => ()
      }
    }
  }

  /** The interpolated Kneser-Ney per-transition probability chain (see
    * `text_lm_kneser_ney`), as a reusable CTE block ending in
    * `probs(doc_id, pos, unseen, p)` — shared verbatim by the raw scoring
    * face and the CCNet bucket face so the replayed arithmetic cannot
    * drift between them. */
  private lazy val KnProbsCtes: String =
    s"""whst AS (SELECT doc_id, lang, $WHS AS whs FROM documents),
       |bg AS (SELECT doc_id, lang, generate_subscripts(shl, 1) - 1 AS pos,
       |         unnest(shl) AS h12
       |       FROM (SELECT doc_id, lang,
       |               ${shingleAllSql("whs", 2)} AS shl FROM whst)),
       |st AS (SELECT b.doc_id, b.lang, b.pos, w.whs[b.pos + 1] AS h1,
       |         w.whs[b.pos + 2] AS h2, b.h12
       |       FROM bg b JOIN whst w USING (doc_id)),
       |c1t AS (SELECT h1, CAST(count(*) AS BIGINT) AS c1,
       |          CAST(count(DISTINCT h12) AS BIGINT) AS nf1
       |        FROM st WHERE lang = 'en' GROUP BY h1),
       |c12t AS (SELECT h12, CAST(count(*) AS BIGINT) AS c12 FROM st
       |         WHERE lang = 'en' GROUP BY h12),
       |nbt AS (SELECT h2, CAST(count(DISTINCT h12) AS BIGINT) AS nb2
       |        FROM st WHERE lang = 'en' GROUP BY h2),
       |tot AS (SELECT CAST(count(DISTINCT h12) AS BIGINT) AS nbb FROM st
       |        WHERE lang = 'en'),
       |pj AS (SELECT s.doc_id, s.pos, (b.c12 IS NULL) AS unseen,
       |         u.c1, u.nf1, b.c12,
       |         CASE WHEN n.nb2 IS NULL THEN 1.0 / (t.nbb + 1)
       |              ELSE CAST(n.nb2 AS DOUBLE) / t.nbb END AS pcont
       |       FROM st s LEFT JOIN c1t u USING (h1)
       |            LEFT JOIN c12t b USING (h12)
       |            LEFT JOIN nbt n USING (h2), tot t),
       |probs AS (SELECT doc_id, pos, unseen,
       |            CASE WHEN c1 IS NULL THEN pcont
       |                 ELSE greatest(COALESCE(c12, 0) - 0.75, 0.0) / c1
       |                      + (0.75 * nf1 / c1) * pcont END AS p
       |          FROM pj)""".stripMargin

  /** The robots fixture's probe paths — one definition shared by the
    * Spark fixture and the oracle's CASE so they cannot drift. */
  private val RobotsProbePaths: Seq[String] = Seq(
    "/private/ok/page.html", "/private/secret.html", "/data/file.json",
    "/tmp/pub/x.json", "/docs/raw/data.bin")

  val defs: Seq[QueryDef] = Seq(

    // Token counting (whitespace + BPE-ish) and quality scoring:
    // length/punctuation/stopword ratios folded into a composite score.
    QueryDef.withOracle("text_stats",
      s"""SELECT doc_id,
         |  length(text) AS n_chars,
         |  len(regexp_extract_all(text, '\\S+')) AS n_ws_tokens,
         |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens,
         |  len($TOKS) AS n_word_tokens,
         |  $SW_RATIO AS stopword_ratio,
         |  $PUNCT_RATIO AS punct_ratio,
         |  least(len($TOKS) / 100.0, 1.0) * 0.4
         |    + (1.0 - $PUNCT_RATIO) * 0.3
         |    + least($SW_RATIO * 5.0, 1.0) * 0.3 AS quality_score
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      // ONE native pass computes every count (see TextOps.textCounts on why
      // the counts struct gets its own select); ratio/score arithmetic is
      // identical term-for-term to the regex formulation and the oracle
      val counted = Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
          TextOps.textCounts(col("text")).as("_c"))
      val nWord = col("_c.n_word")
      val swRatio = when(nWord === 0, lit(0.0))
        .otherwise(element_at(col("_c.sw_hits"),
          graft.functions.GraftTextCounts.langIndex("en") + 1)
          .cast("double") / nWord)
      val punctRatio = when(col("n_chars") === 0, lit(0.0))
        .otherwise(col("_c.n_punct").cast("double") / col("n_chars"))
      counted.select(
        col("doc_id"), col("n_chars"),
        col("_c.n_ws").as("n_ws_tokens"),
        col("_c.n_bpe").as("n_bpe_tokens"),
        nWord.as("n_word_tokens"),
        swRatio.as("stopword_ratio"),
        punctRatio.as("punct_ratio"),
        (least(nWord.cast("double") / 100.0, lit(1.0)) * 0.4 +
          (lit(1.0) - punctRatio) * 0.3 +
          least(swRatio * 5.0, lit(1.0)) * 0.3).as("quality_score"))
        .orderBy("doc_id")
    },

    // REAL BPE tokenization (graft.functions.BpeVocab — greedy merges over
    // a trained 48-merge table, the standard Sennrich/GPT-2 algorithm):
    // per-doc merged-token count, distinct-token count, and an
    // order-sensitive fingerprint of the full token stream. The oracle
    // REPLAYS THE MERGE LOOP itself (recursive CTE, rank-order fixpoint
    // sweep over delimited strings — see OracleText.BPE_CTES for the
    // equivalence argument), so a wrong merge order, a missed occurrence,
    // or a pre-tokenization drift all break the hash match. This replaces
    // "BPE-ish" counts with numbers a real pipeline would ship; packing
    // and chunking below consume the same counts.
    QueryDef.withOracle("text_tokens_bpe",
      s"""WITH RECURSIVE $BPE_CTES,
         |fp AS (SELECT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(string_split(alltok, '${OracleText.BpeDelim}'),
         |             t -> ${OracleText.wordHashSql("t")})),
         |           (f, wh) -> (f * ${TextOps.B2} + wh) % ${TextOps.P}) AS fp,
         |         len(list_distinct(string_split(alltok, '${OracleText.BpeDelim}'))) AS nd
         |       FROM bpe_doctok)
         |SELECT d.doc_id,
         |  COALESCE(b.n_tokens, 0) AS n_bpe,
         |  CAST(COALESCE(fp.nd, 0) AS BIGINT) AS n_distinct,
         |  COALESCE(fp.fp, 0) AS bpe_fp
         |FROM documents d
         |LEFT JOIN bpe_doc b USING (doc_id)
         |LEFT JOIN fp USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      // merged tokens materialized ONCE (own select) — three aggregates
      // derive from the array without re-running the merge loop (no CSE
      // inside interpreted expressions, see textCounts note)
      Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), TextOps.bpeMergedTokens(col("text")).as("_t"))
        .select(col("doc_id"),
          size(col("_t")).cast("long").as("n_bpe"),
          size(array_distinct(col("_t"))).cast("long").as("n_distinct"),
          TextOps.fingerprintOfHashes(TextOps.wordHashes(col("_t"))).as("bpe_fp"))
        .orderBy("doc_id")
    },

    // TOKENIZER FERTILITY — the standard tokenizer-eval metric: per
    // language, tokens-per-word (fertility) and chars-per-token
    // (compression) of the TRAINED BPE. A tokenizer whose fertility blows
    // up on some language silently multiplies that language's training
    // cost; this face puts the number in the gated output. All moments
    // exact integers; the two ratios are one double division each at the
    // end. Aggregation is language-cardinality — histogram-scale at any
    // corpus size; the heavy part (the merge loop) is the same map-side
    // work every BPE face does.
    QueryDef.withOracle("text_bpe_fertility",
      s"""WITH RECURSIVE $BPE_CTES,
         |w AS (SELECT doc_id, len($TOKS) AS nw, length(text) AS nc
         |      FROM documents),
         |per AS (SELECT d.doc_id, d.lang, COALESCE(b.n_tokens, 0) AS nt,
         |               w.nw, w.nc
         |        FROM documents d LEFT JOIN bpe_doc b USING (doc_id)
         |        JOIN w USING (doc_id))
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(nw) AS BIGINT) AS n_words,
         |  CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  CAST(sum(nc) AS BIGINT) AS n_chars,
         |  CASE WHEN sum(nw) = 0 THEN NULL
         |       ELSE CAST(sum(nt) AS DOUBLE) / sum(nw) END AS fertility,
         |  CASE WHEN sum(nt) = 0 THEN NULL
         |       ELSE CAST(sum(nc) AS DOUBLE) / sum(nt) END AS chars_per_token
         |FROM per GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val agg = Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("lang"),
          size(TextOps.tokens(col("text"))).cast("long").as("nw"),
          size(TextOps.bpeMergedTokens(col("text"))).cast("long").as("nt"),
          length(col("text")).cast("long").as("nc"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("nw").as("n_words"),
          sum("nt").as("n_tokens"), sum("nc").as("n_chars"))
      agg.select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
          col("n_chars"),
          when(col("n_words") === 0, lit(null))
            .otherwise(col("n_tokens").cast("double") / col("n_words"))
            .as("fertility"),
          when(col("n_tokens") === 0, lit(null))
            .otherwise(col("n_chars").cast("double") / col("n_tokens"))
            .as("chars_per_token"))
        .orderBy("lang")
    },

    // BPE token IDS — the integer stream a trainer actually consumes:
    // single-codepoint tokens map to their codepoint, merged tokens to
    // 0x110000 + merge rank (merge outputs are unique in a trained table,
    // and 0x110000 is past the last Unicode codepoint, so the two id
    // spaces cannot collide). One row per (doc, position) with the token
    // and its id — deterministic, and the oracle replays tokenization
    // (the recursive merge loop) AND the id assignment.
    QueryDef.withOracle("text_tokens_bpe_ids", {
      val idVals = graft.functions.BpeVocab.idValuesSql
      s"""WITH RECURSIVE $BPE_CTES,
         |bpe_ids(tok, tid) AS (VALUES
         |    $idVals),
         |tk AS (SELECT doc_id, unnest(string_split(alltok, '${OracleText.BpeDelim}')) AS token,
         |              generate_subscripts(string_split(alltok, '${OracleText.BpeDelim}'), 1) - 1 AS pos
         |       FROM bpe_doctok)
         |SELECT tk.doc_id, CAST(tk.pos AS BIGINT) AS pos, tk.token,
         |       CAST(CASE WHEN length(tk.token) = 1 THEN unicode(tk.token)
         |            ELSE i.tid END AS BIGINT) AS token_id
         |FROM tk LEFT JOIN bpe_ids i ON i.tok = tk.token
         |ORDER BY doc_id, pos""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val idMap = typedLit(graft.functions.BpeVocab.IdMap)
      Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          posexplode(TextOps.bpeMergedTokens(col("text"))).as(Seq("pos", "token")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"),
          // coalesce, not a length()==1 branch: Spark length() counts
          // UTF-16 units, so a supplementary-plane single-CODEPOINT token
          // (surrogate pair, length 2) would miss the branch — but every
          // multi-codepoint token is a merge output by construction, so
          // "not in the merge map" == "single codepoint" exactly
          coalesce(element_at(idMap, col("token")),
            ascii(col("token")).cast("long")).as("token_id"))
        .orderBy("doc_id", "pos")
    },

    // Distributed BPE TRAINING (ops/BpeTrainer) — the job that produces
    // the merge table the tokenizer above consumes. One corpus-scale
    // histogram pass, then 48 vocab-scale merge rounds (driver sees one
    // winning pair per round, nothing else). The oracle is the embedded
    // BpeVocab table itself, which IS the classic algorithm's output on
    // this corpus — trained offline by the reference implementation — so
    // the distributed trainer must reproduce it rank-for-rank: a wrong
    // pair count, tie-break, or merge application diverges immediately.
    QueryDef.withOracle("text_bpe_train",
      s"""SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs
         |FROM (VALUES
         |    ${graft.functions.BpeVocab.mergeValuesSql}) t(rank, lhs, rhs)
         |ORDER BY rank""".stripMargin) { (s, dir) =>
      graft.ops.BpeTrainer.trainDf(
          Tables(s, dir, "documents"), "text",
          graft.functions.BpeVocab.Merges.size)
        .orderBy("rank")
    },

    // BYTE-LEVEL BPE tokenization (graft.functions.ByteBpeVocab — the
    // GPT-2/tiktoken production shape: regex pre-tokens, UTF-8 bytes
    // through the printable alphabet, trained byte-level merges, ids =
    // byte value or 256 + rank). The oracle replays pre-tokenization, the
    // byte mapping, THE MERGE LOOP (recursive CTE, rank-order fixpoint —
    // same technique and equivalence argument as text_tokens_bpe) and the
    // id assignment, then folds the id stream — a pre-tokenizer drift, a
    // wrong merge, or an id-scheme slip all break the hash.
    QueryDef.withOracle("text_tokens_bpe_bytes", {
      val idVals = graft.functions.ByteBpeVocab.idValuesSql
      s"""WITH RECURSIVE ${OracleText.BPE_BYTE_CTES},
         |bb_ids(tok, tid) AS (VALUES
         |    $idVals),
         |tk AS (SELECT doc_id,
         |         unnest(string_split(alltok, '${OracleText.BpeDelim}')) AS token,
         |         generate_subscripts(string_split(alltok, '${OracleText.BpeDelim}'), 1) AS pos
         |       FROM bb_doctok),
         |ids AS (SELECT doc_id, pos,
         |          CAST(${OracleText.BB_ID_CASE} AS BIGINT) AS id
         |        FROM tk LEFT JOIN bb_ids i ON i.tok = tk.token),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |          CAST(count(DISTINCT id) AS BIGINT) AS n_distinct,
         |          list_reduce(list_prepend(CAST(0 AS BIGINT),
         |            list(id ORDER BY pos)),
         |            (f, t) -> (f * ${TextOps.B2} + t) % ${TextOps.P}) AS bpe_fp
         |        FROM ids GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(a.n_tokens, 0) AS n_tokens,
         |  COALESCE(a.n_distinct, 0) AS n_distinct,
         |  COALESCE(a.bpe_fp, 0) AS bpe_fp
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), TextOps.byteBpeIds(col("text")).as("_t"))
        .select(col("doc_id"),
          size(col("_t")).cast("long").as("n_tokens"),
          size(array_distinct(col("_t"))).cast("long").as("n_distinct"),
          aggregate(col("_t"), lit(0L),
            (f, t) => (f * TextOps.B2 + t) % TextOps.P).as("bpe_fp"))
        .orderBy("doc_id")
    },

    // BYTE-LEVEL distributed BPE training — the trainer machinery
    // (histogram sufficient statistic + exact classic merge loop) is
    // alphabet-agnostic, so only the pre-tokenizer and the byte→char base
    // alphabet differ from text_bpe_train. The oracle is the embedded
    // ByteBpeVocab table (classic algorithm's output on this corpus,
    // trained offline by the reference implementation): the distributed
    // byte-level trainer must reproduce it rank-for-rank.
    QueryDef.withOracle("text_bpe_train_bytes",
      s"""SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs
         |FROM (VALUES
         |    ${graft.functions.ByteBpeVocab.mergeValuesSql}) t(rank, lhs, rhs)
         |ORDER BY rank""".stripMargin) { (s, dir) =>
      graft.ops.BpeTrainer.trainBytesDf(
          Tables(s, dir, "documents"), "text",
          graft.functions.ByteBpeVocab.Merges.size)
        .orderBy("rank")
    },

    // UNIGRAM-LM (SentencePiece-style) TOKENIZATION — the second
    // production tokenizer family (T5/Llama; Kudo 2018), r15 verdict gap
    // #4: Viterbi segmentation of each word over a trained piece table
    // with INTEGER millinat costs (functions/UnigramVocab — quantized
    // −log p, pinned like BpeVocab.Merges so the DP replays bit-exactly).
    // The oracle replays the WHOLE algorithm: forward DP per distinct
    // word (recursive CTE growing the dp cost list), backward greedy
    // reconstruction with the longest-piece tie-break (second recursive
    // CTE), then the per-doc piece-stream fold — a wrong cost, a wrong
    // tie-break, or a drifted piece table breaks the hash match. Spark
    // side: one native-expression pass with the per-task distinct-word
    // memo (vocabulary-scale DP, token-stream-scale output).
    QueryDef.withOracle("text_tokens_unigram", {
      import graft.functions.UnigramVocab
      val piecesSql = UnigramVocab.Pieces
        .map { case (s0, c) => s"{'s': '$s0', 'c': CAST($c AS BIGINT)}" }
        .mkString("[", ", ", "]")
      val dpStep = s"""list_aggregate(list_transform($piecesSql, p ->
        |  CASE WHEN length(p.s) <= i + 1
        |         AND substr(w, i + 2 - length(p.s), length(p.s)) = p.s
        |       THEN dl[i + 2 - length(p.s)] + p.c END), 'min')"""
        .stripMargin.replace("\n", " ")
      val candsE = s"""list_filter(list_transform($piecesSql, p ->
        |  CASE WHEN length(p.s) <= b.pos
        |         AND substr(b.w, b.pos + 1 - length(p.s), length(p.s)) = p.s
        |         AND d.dl[b.pos + 1 - length(p.s)] + p.c = d.dl[b.pos + 1]
        |       THEN p.s END), x -> x IS NOT NULL)"""
        .stripMargin.replace("\n", " ")
      s"""WITH RECURSIVE
         |wd AS (SELECT DISTINCT unnest($TOKS) AS w FROM documents),
         |dp AS (
         |  SELECT w, 0 AS i, [CAST(0 AS BIGINT)] AS dl FROM wd
         |  UNION ALL
         |  SELECT w, i + 1, list_append(dl, $dpStep)
         |  FROM dp WHERE i < length(w)),
         |dpf AS (SELECT w, dl FROM dp WHERE i = length(w)),
         |bt AS (
         |  SELECT w, length(w) AS pos, CAST([] AS VARCHAR[]) AS ps FROM wd
         |  UNION ALL
         |  SELECT w, pos - length(ch), list_prepend(ch, ps)
         |  FROM (
         |    SELECT b.w, b.pos, b.ps,
         |      list_filter(cands, x -> length(x) =
         |        list_aggregate(list_transform(cands, y -> length(y)), 'max'))[1]
         |        AS ch
         |    FROM (SELECT b.w, b.pos, b.ps, $candsE AS cands
         |          FROM bt b JOIN dpf d USING (w) WHERE b.pos > 0) b)),
         |seg AS (SELECT w, ps FROM bt WHERE pos = 0),
         |wcost AS (SELECT w, dl[length(w) + 1] AS wc FROM dpf),
         |tk AS (SELECT doc_id, unnest($TOKS) AS w,
         |         generate_subscripts($TOKS, 1) AS wpos FROM documents),
         |jn AS (SELECT t.doc_id, t.wpos, s.ps, c.wc
         |       FROM tk t JOIN seg s USING (w) JOIN wcost c USING (w)),
         |px AS (SELECT doc_id, wpos, generate_subscripts(ps, 1) AS k,
         |         unnest(ps) AS piece FROM jn),
         |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |         CAST(sum(len(ps)) AS BIGINT) AS n_pieces,
         |         CAST(sum(wc) AS BIGINT) AS total_cost
         |       FROM jn GROUP BY doc_id),
         |fpp AS (SELECT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list(${OracleText.wordHashSql("piece")} ORDER BY wpos, k)),
         |           (f, h) -> (f * ${TextOps.B2} + h) % ${TextOps.P})
         |           AS pieces_fp
         |        FROM px GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(ag.n_words, 0) AS n_words,
         |  COALESCE(ag.n_pieces, 0) AS n_pieces,
         |  COALESCE(ag.total_cost, 0) AS total_cost,
         |  COALESCE(fpp.pieces_fp, 0) AS pieces_fp
         |FROM documents d LEFT JOIN ag USING (doc_id)
         |LEFT JOIN fpp USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      import graft.functions.UnigramVocab
      graft.functions.GraftFunctions.register(s)
      val costMap = typedLit(UnigramVocab.Pieces.toMap)
      Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          TextOps.tokens(col("text")).as("_w"),
          call_function("graft_unigram_tokens", col("text")).as("_p"))
        .select(col("doc_id"),
          size(col("_w")).cast("long").as("n_words"),
          size(col("_p")).cast("long").as("n_pieces"),
          aggregate(col("_p"), lit(0L),
            (a, p) => a + element_at(costMap, p).cast("long")).as("total_cost"),
          TextOps.fingerprintOfHashes(TextOps.wordHashes(col("_p")))
            .as("pieces_fp"))
        .orderBy("doc_id")
    },

    // HTML BOILERPLATE EXTRACTION (ops/HtmlOps — the CCNet/trafilatura
    // curation stage): the fixture wraps every document in generated
    // markup (nav/footer/link-heavy-li chrome, script with a literal '<',
    // entities, a comment), the operator strips script/style/comments,
    // segments block elements, culls by EXACT-INTEGER link density
    // (3·len(anchor_text) ≤ len(text)), strips tags, decodes entities and
    // collapses whitespace. Output proves COMPOSITION with the text stack:
    // token count and token-stream fingerprint of the extracted text are
    // the same arithmetic text_stats/text_fingerprint gate. The oracle
    // replays every stage (same regexes — Java∩RE2 subset — same folds).
    QueryDef.withOracle("text_extract_html",
      s"""WITH $HtmlExtractCtes
         |SELECT doc_id, CAST(n_blocks AS BIGINT) AS n_blocks,
         |  CAST(n_kept AS BIGINT) AS n_kept,
         |  CAST(length(extracted) AS BIGINT) AS n_chars,
         |  CAST(len(${OracleText.toksSql("extracted")}) AS BIGINT) AS n_tokens,
         |  ${OracleText.fingerprintSql("extracted")} AS x_fp
         |FROM j ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          HtmlOps.htmlFixture(col("doc_id"), col("text")).as("html"))
        .select(col("doc_id"), HtmlOps.blocks(col("html")).as("blocks"))
        .select(col("doc_id"),
          size(col("blocks")).cast("long").as("n_blocks"),
          HtmlOps.keptTexts(col("blocks")).as("kept"))
        .select(col("doc_id"), col("n_blocks"),
          size(col("kept")).cast("long").as("n_kept"),
          HtmlOps.joinAndClean(col("kept")).as("extracted"))
        .select(col("doc_id"), col("n_blocks"), col("n_kept"),
          length(col("extracted")).cast("long").as("n_chars"),
          TextOps.tokens(col("extracted")).as("_t"))
        .select(col("doc_id"), col("n_blocks"), col("n_kept"), col("n_chars"),
          size(col("_t")).cast("long").as("n_tokens"),
          TextOps.fingerprint(col("_t")).as("x_fp"))
        .orderBy("doc_id")
    },

    // UNICODE NORMALIZATION + ENCODING REPAIR (the stage every real
    // pipeline runs before tokenization — r15 verdict gap #2): fixture
    // plants NFD decomposition, UTF-8-as-Latin-1 mojibake, and zero-
    // width/control garbage on docs %4=0/1/2 (%4=3 stays clean, gating
    // the identity path). The chain — derived repair table, NFC
    // (native graft_nfc / DuckDB nfc_normalize, both UAX #15), control
    // strip — replays verbatim; head40 pins the repaired characters
    // themselves, n_chars both sides of the repair, tokens/fp the
    // downstream composition.
    QueryDef.withOracle("text_normalize",
      s"""WITH raw AS (SELECT doc_id, ${OracleText.damageSql("text")} AS raw
         |             FROM documents),
         |nrm AS (SELECT doc_id, CAST(length(raw) AS BIGINT) AS n_raw,
         |          ${OracleText.normalizeSql("raw")} AS norm FROM raw)
         |SELECT doc_id, n_raw, CAST(length(norm) AS BIGINT) AS n_norm,
         |  substr(norm, 1, 40) AS head40,
         |  CAST(len(${OracleText.toksSql("norm")}) AS BIGINT) AS n_tokens,
         |  ${OracleText.fingerprintSql("norm")} AS fp
         |FROM nrm ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.damageFixture(col("doc_id"), col("text")).as("raw"))
        .select(col("doc_id"), length(col("raw")).cast("long").as("n_raw"),
          TextOps.normalizeText(col("raw")).as("norm"))
        .select(col("doc_id"), col("n_raw"),
          length(col("norm")).cast("long").as("n_norm"),
          substring(col("norm"), 1, 40).as("head40"),
          TextOps.tokens(col("norm")).as("_t"))
        .select(col("doc_id"), col("n_raw"), col("n_norm"), col("head40"),
          size(col("_t")).cast("long").as("n_tokens"),
          TextOps.fingerprint(col("_t")).as("fp"))
        .orderBy("doc_id")
    },

    // GZIP INGESTION (how crawl text actually arrives — WARC/WET files
    // are multi-member gzip): every doc gzipped (every 3rd as TWO
    // concatenated members — a first-member-only reader truncates, which
    // the value gate catches), decompressed in one typed map, then the
    // standard text stats over the RECOVERED text. Losslessness is the
    // oracle contract: n_chars / token count / fingerprint replay from
    // the source text exactly.
    QueryDef.withOracle("text_from_gzip",
      s"""SELECT doc_id AS asset_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len($TOKS) AS BIGINT) AS n_tokens,
         |  $FINGERPRINT AS fp
         |FROM documents ORDER BY asset_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      graft.ops.MultimodalOps.gunzipText(
        graft.ops.MultimodalOps.gzipAssetsFromDocuments(
          Tables(s, dir, "documents")))
        .select(col("asset_id"),
          length(col("text")).cast("long").as("n_chars"),
          TextOps.tokens(col("text")).as("_t"))
        .select(col("asset_id"), col("n_chars"),
          size(col("_t")).cast("long").as("n_tokens"),
          TextOps.fingerprint(col("_t")).as("fp"))
        .orderBy("asset_id")
    },

    // WARC INGESTION (the actual Common Crawl container): per doc a
    // .warc.gz of warcinfo + request + a 404 response + the HTTP-200
    // response record(s), each record its own gzip member. The reader
    // must walk ALL members, keep only response records, STATUS-FILTER
    // to 200 (ingesting the planted 404 poisons the value gate) and
    // concatenate multi-part bodies (every 5th doc splits across two
    // responses). Losslessness of the whole transport — gzip members,
    // WARC record framing, HTTP message framing — is the oracle
    // contract: record counts are fixture arithmetic, text stats replay
    // from the source text exactly.
    QueryDef.withOracle("text_from_warc",
      s"""SELECT doc_id AS asset_id,
         |  CAST(4 + CASE WHEN doc_id % 5 = 0 AND length(text) >= 2
         |           THEN 1 ELSE 0 END AS BIGINT) AS n_records,
         |  CAST(2 + CASE WHEN doc_id % 5 = 0 AND length(text) >= 2
         |           THEN 1 ELSE 0 END AS BIGINT) AS n_responses,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len($TOKS) AS BIGINT) AS n_tokens,
         |  $FINGERPRINT AS fp
         |FROM documents ORDER BY asset_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      graft.ops.MultimodalOps.warcTexts(
        graft.ops.MultimodalOps.warcAssetsFromDocuments(
          Tables(s, dir, "documents")))
        .select(col("asset_id"), col("n_records"), col("n_responses"),
          length(col("text")).cast("long").as("n_chars"),
          TextOps.tokens(col("text")).as("_t"))
        .select(col("asset_id"), col("n_records"), col("n_responses"),
          col("n_chars"),
          size(col("_t")).cast("long").as("n_tokens"),
          TextOps.fingerprint(col("_t")).as("fp"))
        .orderBy("asset_id")
    },

    // CHARSET SNIFF + TRANSCODE (r16 verdict missing #1 — several percent
    // of a real crawl is legacy-charset and an unconditional UTF-8 read
    // mojibakes it): raw HTTP bodies planted in five declaration shapes —
    // BOM'd UTF-8 (no declaration), header-declared windows-1252,
    // Shift_JIS declared ONLY via <meta charset> (bare text/html header,
    // the HTML5 prescan leg), header-declared ISO-8859-1, and undeclared
    // ASCII (UTF-8 default). Each legacy class appends charset-
    // distinctive non-ASCII suffixes, so mis-ordering the precedence or
    // skipping a stage yields value-visible mojibake. The oracle builds
    // the expected UTF-8 literals from fixture arithmetic — the DuckDB
    // side never sees the legacy bytes, so a match proves the transcode.
    QueryDef.withOracle("text_charset",
      s"""SELECT doc_id AS asset_id,
         |  CASE CAST(doc_id % 5 AS INTEGER)
         |    WHEN 1 THEN 'windows-1252'
         |    WHEN 2 THEN 'shift_jis'
         |    WHEN 3 THEN 'iso-8859-1'
         |    ELSE 'utf-8' END AS charset,
         |  CASE CAST(doc_id % 5 AS INTEGER)
         |    WHEN 0 THEN text || ' café'
         |    WHEN 1 THEN text || ' café'
         |    WHEN 2 THEN '<html><head><meta charset=shift_jis></head><body>'
         |      || text || ' 日本</body></html>'
         |    WHEN 3 THEN text || ' ¼½'
         |    ELSE text END AS text
         |FROM documents ORDER BY asset_id""".stripMargin) { (s, dir) =>
      graft.ops.MultimodalOps.httpTexts(
        graft.ops.MultimodalOps.httpAssetsFromDocuments(
          Tables(s, dir, "documents")))
        .orderBy("asset_id")
    },

    // WET INGESTION (Common Crawl's PRE-EXTRACTED text format): per doc a
    // .wet.gz of warcinfo + a WAT-style metadata record (JSON envelope
    // the reader must TYPE-FILTER out) + the text as conversion
    // record(s) with text/plain bodies and NO HTTP framing — every 6th
    // doc splits across two conversions whose record order carries the
    // concatenation. Same losslessness contract as text_from_warc; the
    // record counts are fixture arithmetic.
    QueryDef.withOracle("text_from_wet",
      s"""SELECT doc_id AS asset_id,
         |  CAST(3 + CASE WHEN doc_id % 6 = 0 AND length(text) >= 2
         |           THEN 1 ELSE 0 END AS BIGINT) AS n_records,
         |  CAST(1 + CASE WHEN doc_id % 6 = 0 AND length(text) >= 2
         |           THEN 1 ELSE 0 END AS BIGINT) AS n_conversions,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len($TOKS) AS BIGINT) AS n_tokens,
         |  $FINGERPRINT AS fp
         |FROM documents ORDER BY asset_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      graft.ops.MultimodalOps.wetTexts(
        graft.ops.MultimodalOps.wetAssetsFromDocuments(
          Tables(s, dir, "documents")))
        .select(col("asset_id"), col("n_records"), col("n_conversions"),
          length(col("text")).cast("long").as("n_chars"),
          TextOps.tokens(col("text")).as("_t"))
        .select(col("asset_id"), col("n_records"), col("n_conversions"),
          col("n_chars"),
          size(col("_t")).cast("long").as("n_tokens"),
          TextOps.fingerprint(col("_t")).as("fp"))
        .orderBy("asset_id")
    },

    // STREAMING WARC INGESTION — the crawl arriving CONTINUOUSLY (what a
    // live fetch pipeline actually sees): .warc.gz assets land as a file
    // stream in two batches; the whole reader — gzip member walk, WARC
    // record walk, status filter, multi-response body concat, token
    // stats — is one STATELESS typed map, so exactly-once comes from the
    // file-source + checkpoint contract alone (no state store at all).
    // The oracle is text_from_warc's verbatim: the batch and streaming
    // faces must agree value-for-value.
    QueryDef.withOracle("text_stream_warc",
      s"""SELECT doc_id AS asset_id,
         |  CAST(4 + CASE WHEN doc_id % 5 = 0 AND length(text) >= 2
         |           THEN 1 ELSE 0 END AS BIGINT) AS n_records,
         |  CAST(2 + CASE WHEN doc_id % 5 = 0 AND length(text) >= 2
         |           THEN 1 ELSE 0 END AS BIGINT) AS n_responses,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len($TOKS) AS BIGINT) AS n_tokens,
         |  $FINGERPRINT AS fp
         |FROM documents ORDER BY asset_id""".stripMargin) { (s, dir) =>
      import graft.ops.MultimodalOps
      graft.functions.GraftFunctions.register(s)
      val stage = java.nio.file.Files.createTempDirectory("graft-warcstage-").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft-warcckpt-").toString
      val out = java.nio.file.Files.createTempDirectory("graft-warcout-").toString
      val assets = MultimodalOps.warcAssetsFromDocuments(
          Tables(s, dir, "documents"))
        .localCheckpoint(false) // encode once; both batch writes read it
      val assetSchema = assets.schema
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        def drain(): Unit =
          MultimodalOps.warcTexts(
              s.readStream.schema(assetSchema).parquet(stage).toDF())
            .select(col("asset_id"), col("n_records"), col("n_responses"),
              length(col("text")).cast("long").as("n_chars"),
              TextOps.tokens(col("text")).as("_t"))
            .select(col("asset_id"), col("n_records"), col("n_responses"),
              col("n_chars"),
              size(col("_t")).cast("long").as("n_tokens"),
              TextOps.fingerprint(col("_t")).as("fp"))
            .writeStream.option("checkpointLocation", ckpt)
            .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .format("parquet").option("path", out)
            .start().awaitTermination()
        assets.filter(col("asset_id") % 2 === 0)
          .write.mode("append").parquet(stage)
        drain()
        assets.filter(col("asset_id") % 2 === 1)
          .write.mode("append").parquet(stage)
        drain()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      s.read.parquet(out).orderBy("asset_id")
    },

    // TAR INGESTION (the dataset-dump container, .tar.gz): per doc a
    // gzipped ustar archive — a directory entry to walk over, the text
    // as .txt member(s) (every 4th doc split across TWO, concatenated in
    // ENTRY order) and a .json sidecar the reader must name-filter out.
    // Checksums/magic/end-of-archive are verified by the walk; the
    // transport is lossless, so entry counts are fixture arithmetic and
    // text stats replay from the source text exactly.
    QueryDef.withOracle("text_from_tar",
      s"""SELECT doc_id AS asset_id,
         |  CAST(3 + CASE WHEN doc_id % 4 = 0 AND length(text) >= 2
         |           THEN 1 ELSE 0 END AS BIGINT) AS n_entries,
         |  CAST(2 + CASE WHEN doc_id % 4 = 0 AND length(text) >= 2
         |           THEN 1 ELSE 0 END AS BIGINT) AS n_files,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len($TOKS) AS BIGINT) AS n_tokens,
         |  $FINGERPRINT AS fp
         |FROM documents ORDER BY asset_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      graft.ops.MultimodalOps.tarTexts(
        graft.ops.MultimodalOps.tarAssetsFromDocuments(
          Tables(s, dir, "documents")))
        .select(col("asset_id"), col("n_entries"), col("n_files"),
          length(col("text")).cast("long").as("n_chars"),
          TextOps.tokens(col("text")).as("_t"))
        .select(col("asset_id"), col("n_entries"), col("n_files"),
          col("n_chars"),
          size(col("_t")).cast("long").as("n_tokens"),
          TextOps.fingerprint(col("_t")).as("fp"))
        .orderBy("asset_id")
    },

    // ZSTD INGESTION (RFC 8878 — the transport modern dataset dumps
    // actually use; r15 verdict task 1): per doc the text as zstd
    // frame(s) from the FROM-SCRATCH encoder (FSE+Huffman compressed
    // blocks, content checksums) — every 3rd doc TWO concatenated frames
    // (a first-frame-only reader truncates), every 7th doc a planted
    // SKIPPABLE frame the reader must walk over. The from-scratch decoder
    // (the hot side) recovers the text whole; spec-level interop gates
    // both directions against libzstd. Losslessness is the oracle
    // contract, frame counts are fixture arithmetic (strlen = the byte
    // split's condition, code-point-exact in both engines for ASCII and
    // irrelevant above it since frames concatenate at byte level).
    QueryDef.withOracle("text_from_zstd",
      s"""SELECT doc_id AS asset_id,
         |  CAST(1 + CASE WHEN doc_id % 3 = 0 AND strlen(text) >= 2
         |           THEN 1 ELSE 0 END AS BIGINT) AS n_frames,
         |  CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS n_skippable,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len($TOKS) AS BIGINT) AS n_tokens,
         |  $FINGERPRINT AS fp
         |FROM documents ORDER BY asset_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      graft.ops.MultimodalOps.zstdText(
        graft.ops.MultimodalOps.zstdAssetsFromDocuments(
          Tables(s, dir, "documents")))
        .select(col("asset_id"), col("n_frames"), col("n_skippable"),
          length(col("text")).cast("long").as("n_chars"),
          TextOps.tokens(col("text")).as("_t"))
        .select(col("asset_id"), col("n_frames"), col("n_skippable"),
          col("n_chars"),
          size(col("_t")).cast("long").as("n_tokens"),
          TextOps.fingerprint(col("_t")).as("fp"))
        .orderBy("asset_id")
    },

    // .TAR.ZST INGESTION — the Dolma-class dump container: the SAME ustar
    // archive as text_from_tar but shipped through the from-scratch zstd
    // encoder (one checksummed frame per doc). Same entry arithmetic,
    // same lossless contract — a value drift against text_from_tar's
    // numbers isolates the compression layer.
    QueryDef.withOracle("text_from_tar_zst",
      s"""SELECT doc_id AS asset_id,
         |  CAST(3 + CASE WHEN doc_id % 4 = 0 AND length(text) >= 2
         |           THEN 1 ELSE 0 END AS BIGINT) AS n_entries,
         |  CAST(2 + CASE WHEN doc_id % 4 = 0 AND length(text) >= 2
         |           THEN 1 ELSE 0 END AS BIGINT) AS n_files,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len($TOKS) AS BIGINT) AS n_tokens,
         |  $FINGERPRINT AS fp
         |FROM documents ORDER BY asset_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      graft.ops.MultimodalOps.tarZstTexts(
        graft.ops.MultimodalOps.tarZstAssetsFromDocuments(
          Tables(s, dir, "documents")))
        .select(col("asset_id"), col("n_entries"), col("n_files"),
          length(col("text")).cast("long").as("n_chars"),
          TextOps.tokens(col("text")).as("_t"))
        .select(col("asset_id"), col("n_entries"), col("n_files"),
          col("n_chars"),
          size(col("_t")).cast("long").as("n_tokens"),
          TextOps.fingerprint(col("_t")).as("fp"))
        .orderBy("asset_id")
    },

    // STREAMING ZSTD INGESTION — the dump arriving continuously (a
    // mirror sync delivering .zst shards): assets land as a file stream
    // in two batches; the whole RFC 8878 decode (frame walk, FSE/Huffman,
    // skippable-frame skip, checksum verify) is one STATELESS typed map,
    // so exactly-once comes from the file-source + checkpoint contract
    // alone — the text_stream_warc shape with the modern transport. The
    // oracle is text_from_zstd's verbatim: batch and streaming faces
    // must agree value-for-value.
    QueryDef.withOracle("text_stream_zstd",
      s"""SELECT doc_id AS asset_id,
         |  CAST(1 + CASE WHEN doc_id % 3 = 0 AND strlen(text) >= 2
         |           THEN 1 ELSE 0 END AS BIGINT) AS n_frames,
         |  CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS n_skippable,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len($TOKS) AS BIGINT) AS n_tokens,
         |  $FINGERPRINT AS fp
         |FROM documents ORDER BY asset_id""".stripMargin) { (s, dir) =>
      import graft.ops.MultimodalOps
      graft.functions.GraftFunctions.register(s)
      val stage = java.nio.file.Files.createTempDirectory("graft-zststage-").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft-zstckpt-").toString
      val out = java.nio.file.Files.createTempDirectory("graft-zstout-").toString
      val assets = MultimodalOps.zstdAssetsFromDocuments(
          Tables(s, dir, "documents"))
        .localCheckpoint(false) // encode once; both batch writes read it
      val assetSchema = assets.schema
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        def drain(): Unit =
          MultimodalOps.zstdText(
              s.readStream.schema(assetSchema).parquet(stage).toDF())
            .select(col("asset_id"), col("n_frames"), col("n_skippable"),
              length(col("text")).cast("long").as("n_chars"),
              TextOps.tokens(col("text")).as("_t"))
            .select(col("asset_id"), col("n_frames"), col("n_skippable"),
              col("n_chars"),
              size(col("_t")).cast("long").as("n_tokens"),
              TextOps.fingerprint(col("_t")).as("fp"))
            .writeStream.option("checkpointLocation", ckpt)
            .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .format("parquet").option("path", out)
            .start().awaitTermination()
        assets.filter(col("asset_id") % 2 === 0)
          .write.mode("append").parquet(stage)
        drain()
        assets.filter(col("asset_id") % 2 === 1)
          .write.mode("append").parquet(stage)
        drain()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      s.read.parquet(out).orderBy("asset_id")
    },

    // ROBOTS.TXT EVALUATION (RFC 9309 — the crawl-politeness check every
    // fetch pipeline runs BEFORE a URL is downloaded): the fixture plants
    // three robots.txt shapes (wildcard+anchor rules, an agent-specific
    // group that must EXCLUSIVELY replace the `*` group, a blanket-deny
    // for a different crawler that must not apply) × five probe paths.
    // The Spark side parses the real text (groups, `*`/`$` patterns,
    // longest-match precedence, Allow-beats-Disallow ties — RobotsOps);
    // the oracle replays the closed rule set as VALUES with per-rule
    // regex equivalents and the same (length desc, allow desc) winner
    // pick. Compared: per-doc applicable-rule count, the verdict and the
    // winning pattern.
    QueryDef.withOracle("text_robots_rules", {
      val rules = Seq(
        // (variant, group, allow, pattern, regex)
        (0, "*", false, "/private/", "^/private/"),
        (0, "*", true, "/private/ok/", "^/private/ok/"),
        (0, "*", false, "/*.json$", "^/.*\\.json$"),
        (1, "*", false, "/private/", "^/private/"),
        (1, "*", true, "/private/ok/", "^/private/ok/"),
        (1, "*", false, "/*.json$", "^/.*\\.json$"),
        (1, "graftbot", false, "/tmp/", "^/tmp/"),
        (1, "graftbot", true, "/tmp/pub/", "^/tmp/pub/"),
        (2, "other", false, "/", "^/"),
        (2, "*", true, "/docs", "^/docs"),
        (2, "*", false, "/docs/raw*", "^/docs/raw"))
      val ruleRows = rules.map { case (v, g, a, pat, rx) =>
        s"($v,'$g',$a,'$pat',${pat.length},'$rx')"
      }.mkString(",")
      val pathCase = RobotsProbePaths.zipWithIndex
        .map { case (p, i) => s"WHEN $i THEN '$p'" }.mkString(" ")
      s"""WITH d AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS v,
         |      (CASE CAST(doc_id % 5 AS INT) $pathCase END) AS path
         |    FROM documents),
         |r(v, grp, allow, pattern, plen, rx) AS
         |  (SELECT * FROM (VALUES $ruleRows) t(v, grp, allow, pattern, plen, rx)),
         |ch AS (SELECT d.doc_id, d.path, r.allow, r.pattern, r.plen, r.rx
         |       FROM d JOIN r ON r.v = d.v AND r.grp =
         |         (CASE WHEN d.v = 1 THEN 'graftbot' ELSE '*' END)),
         |nr AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_rules
         |       FROM ch GROUP BY 1),
         |hit AS (SELECT doc_id, allow, pattern, row_number() OVER
         |          (PARTITION BY doc_id ORDER BY plen DESC, allow DESC) AS rk
         |        FROM ch WHERE regexp_matches(path, rx)),
         |w AS (SELECT doc_id, allow, pattern FROM hit WHERE rk = 1)
         |SELECT d.doc_id, d.path, nr.n_rules,
         |  COALESCE(w.allow, TRUE) AS allowed,
         |  COALESCE(w.pattern, '') AS rule
         |FROM d JOIN nr USING (doc_id) LEFT JOIN w USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val v0 = "User-agent: *\nDisallow: /private/\nAllow: /private/ok/\n" +
        "Disallow: /*.json$\n"
      val v1 = v0 + "\nUser-agent: GraftBot\nDisallow: /tmp/\nAllow: /tmp/pub/\n"
      val v2 = "# blanket-deny for one crawler, shallow allow for the rest\n" +
        "User-agent: other\nDisallow: /\n\n" +
        "User-agent: *\nAllow: /docs\nDisallow: /docs/raw*\n"
      val paths = RobotsProbePaths
      Tables(s, dir, "documents")
        .select(col("doc_id"), pmod(col("doc_id"), lit(3L)).as("v"),
          pmod(col("doc_id"), lit(5L)).as("p"))
        .as[(Long, Long, Long)]
        .map { case (id, v, p) =>
          val txt = v match { case 0 => v0; case 1 => v1; case _ => v2 }
          val path = paths(p.toInt)
          val (n, allowed, rule) =
            graft.ops.RobotsOps.evaluate(txt, "GraftBot", path)
          (id, path, n, allowed, rule)
        }
        .toDF("doc_id", "path", "n_rules", "allowed", "rule")
        .orderBy("doc_id")
    },

    // CONTENT-DEFINED CHUNKING (the rsync/LBFS storage-dedup primitive):
    // boundaries where a W-point rolling window hash hits the divisor,
    // so chunking re-synchronizes on content — the fixture's shared
    // footer chunks dedup corpus-wide despite every doc having a
    // different prefix, which is the property the operator exists for
    // (n_dup/dup_len carry it in the gated output). First-occurrence
    // ordering is (doc_id, chunk_idx); chunk identity is (len, hash).
    // The Spark side rolls the window hash in O(n) per doc; the oracle
    // re-folds every window from scratch — same modular values, so the
    // cheap path is gated by the obvious one. The corpus stage is ONE
    // shuffle keyed by chunk identity (the real CDC store's hash index).
    QueryDef.withOracle("text_cdc_chunks", {
      import graft.ops.CdcOps.{D, Footer, W}
      import graft.ops.TextOps.{B1, B2, P}
      s"""WITH ct AS (SELECT doc_id, text || '$Footer' AS t FROM documents),
         |cs AS (SELECT doc_id,
         |         list_transform(range(1, length(t) + 1),
         |           i -> CAST(unicode(substr(t, CAST(i AS INT), 1)) AS BIGINT))
         |           AS c
         |       FROM ct),
         |hs AS (SELECT doc_id, c, len(c) AS n,
         |         list_transform(range($W, len(c) + 1), i ->
         |           list_reduce(list_prepend(CAST(0 AS BIGINT),
         |             c[CAST(i - $W + 1 AS INT):CAST(i AS INT)]),
         |             (h, x) -> (h * $B1 + x) % $P)) AS wh
         |       FROM cs),
         |bl AS (SELECT doc_id, c, n,
         |         list_append(
         |           list_filter(range($W, n),
         |             i -> wh[CAST(i - $W + 1 AS INT)] % $D = 0),
         |           n) AS bs
         |       FROM hs),
         |ch AS (SELECT doc_id, c, bs, generate_subscripts(bs, 1) AS idx,
         |         unnest(bs) AS e
         |       FROM bl),
         |ck AS (SELECT doc_id, idx - 1 AS pos,
         |         CAST(e - st AS BIGINT) AS clen,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           c[CAST(st + 1 AS INT):CAST(e AS INT)]),
         |           (h, x) -> (h * $B1 + x) % $P) AS chash
         |       FROM (SELECT doc_id, c, e, idx,
         |               CASE WHEN idx = 1 THEN 0
         |                    ELSE bs[CAST(idx - 1 AS INT)] END AS st
         |             FROM ch)),
         |fo AS (SELECT doc_id, clen, row_number() OVER
         |         (PARTITION BY clen, chash ORDER BY doc_id, pos) AS rk
         |       FROM ck),
         |da AS (SELECT doc_id,
         |         CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_dup,
         |         CAST(SUM(CASE WHEN rk > 1 THEN clen ELSE 0 END) AS BIGINT)
         |           AS dup_len
         |       FROM fo GROUP BY 1),
         |nb AS (SELECT doc_id, CAST(len(bs) AS BIGINT) AS n_chunks,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(bs, b -> CAST(b AS BIGINT))),
         |           (h, x) -> (h * $B2 + x) % $P) AS bounds_fp
         |       FROM bl)
         |SELECT doc_id, n_chunks, bounds_fp, n_dup, dup_len
         |FROM nb JOIN da USING (doc_id) ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      import graft.ops.{CdcOps, TextOps}
      val per = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val codes = (text + CdcOps.Footer).codePoints.toArray
          val (bs, hs, ls) = CdcOps.chunks(codes)
          val fp = bs.foldLeft(0L)((h, b) => (h * TextOps.B2 + b) % TextOps.P)
          (id, bs.length.toLong, fp, ls.map(_.toLong).sum, hs,
            ls.map(_.toLong))
        }.toDF("doc_id", "n_chunks", "bounds_fp", "total_len", "hs", "ls")
      // skew note: the footer chunks' keys hold the whole corpus, so a
      // row_number window per key (one reducer sees every copy) is the
      // wrong shape. Two aggregations instead, both map-side partial:
      // first occurrence per chunk key, then firsts per doc —
      // n_dup = n_chunks − n_first needs no row-level join back.
      val exploded = per
        .select(col("doc_id"), posexplode(arrays_zip(col("hs"), col("ls"))))
        .select(col("doc_id"), col("pos"),
          col("col.hs").as("chash"), col("col.ls").as("clen"))
      val firstPerDoc = exploded
        .groupBy("clen", "chash")
        .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
        .groupBy(col("first.doc_id").as("doc_id"))
        .agg(count(lit(1)).as("n_first"), sum("clen").as("first_len"))
      per.select("doc_id", "n_chunks", "bounds_fp", "total_len")
        .join(firstPerDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"), col("bounds_fp"),
          (col("n_chunks") - coalesce(col("n_first"), lit(0L))).as("n_dup"),
          (col("total_len") - coalesce(col("first_len"), lit(0L)))
            .as("dup_len"))
        .orderBy("doc_id")
    },

    // CSV INGESTION (RFC 4180 — the tabular dump shape): the doc text
    // rides the `body` field with planted embedded commas, doubled-quote
    // escapes and embedded NEWLINES (every naive split-on-newline reader
    // shears these; the strict state machine recovers them exactly).
    // Ragged rows and bare/dangling quotes throw. Lossless field
    // transport is the oracle contract: the recovered body's stats
    // replay from the same planting arithmetic.
    QueryDef.withOracle("text_from_csv", {
      val b = """text || CASE WHEN doc_id % 3 = 0 THEN ', "q" x' ELSE '' END
                | || CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'second line'
                |    ELSE '' END""".stripMargin.replace("\n", " ")
      s"""WITH p AS (SELECT doc_id, $b AS b FROM documents)
         |SELECT doc_id AS asset_id,
         |  CAST(1 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS n_rows,
         |  CAST(4 AS BIGINT) AS n_fields,
         |  CAST(length(b) AS BIGINT) AS n_chars,
         |  CAST(len(${OracleText.toksSql("b")}) AS BIGINT) AS n_tokens,
         |  ${OracleText.fingerprintSql("b")} AS fp
         |FROM p ORDER BY asset_id""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      graft.ops.MultimodalOps.csvTexts(
        graft.ops.MultimodalOps.csvAssetsFromDocuments(
          Tables(s, dir, "documents")))
        .select(col("asset_id"), col("n_rows"), col("n_fields"),
          length(col("text")).cast("long").as("n_chars"),
          TextOps.tokens(col("text")).as("_t"))
        .select(col("asset_id"), col("n_rows"), col("n_fields"),
          col("n_chars"),
          size(col("_t")).cast("long").as("n_tokens"),
          TextOps.fingerprint(col("_t")).as("fp"))
        .orderBy("asset_id")
    },

    // JSONL INGESTION (the most common corpus dump shape): one JSON
    // object per line, the doc text in the `text` field with a PLANTED
    // escape gauntlet — \" \\ \n \t and a literal A unicode escape
    // — decoded by the REAL JSON parsers on both sides (Spark from_json
    // in FAILFAST mode; DuckDB's native JSON). The oracle reconstructs
    // the expected recovered string from the planting arithmetic, so a
    // decoder that mishandles any escape breaks the value match.
    QueryDef.withOracle("text_from_jsonl", {
      // recovered suffix: space q " w \ e NL r TAB t A
      val b = """text || ' q"w\e' || chr(10) || 'r' || chr(9) || 'tA'"""
      s"""WITH p AS (SELECT doc_id, $b AS b FROM documents)
         |SELECT doc_id, 'en' AS lang,
         |  CAST(length(b) AS BIGINT) AS n_chars,
         |  CAST(len(${OracleText.toksSql("b")}) AS BIGINT) AS n_tokens,
         |  ${OracleText.fingerprintSql("b")} AS fp
         |FROM p ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      import org.apache.spark.sql.types._
      graft.functions.GraftFunctions.register(s)
      val lines = {
        import s.implicits._
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .map { case (id, text) =>
            require(text.forall(c => c >= ' ' && c < 127 && c != '"' &&
              c != '\\'), s"jsonl fixture requires escape-free text (doc $id)")
            (id,
              s"""{"id": $id, "lang": "en", """ +
                s""""text": "$text q\\"w\\\\e\\nr\\tt\\u0041"}""")
          }.toDF("doc_id", "line")
      }
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("lang", StringType),
        StructField("text", StringType)))
      val parsed = lines.select(col("doc_id"),
          from_json(col("line"), schema,
            Map("mode" -> "FAILFAST")).as("j"))
        .select(col("doc_id"), col("j.lang").as("lang"),
          col("j.text").as("b"))
      parsed.select(col("doc_id"), col("lang"),
          length(col("b")).cast("long").as("n_chars"),
          TextOps.tokens(col("b")).as("_t"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(col("_t")).cast("long").as("n_tokens"),
          TextOps.fingerprint(col("_t")).as("fp"))
        .orderBy("doc_id")
    },

    // MARKUP → CURATION composition (the real pipeline's first two
    // stages end-to-end): extract from the generated boilerplate, then
    // apply the text_filter rule stack to the EXTRACTED text — length
    // bounds, language-ID, stopword density. Oracle rides the SAME
    // HtmlExtractCtes as text_extract_html (one definition — the stages
    // cannot drift) with the parametric rule SQL over `extracted`.
    QueryDef.withOracle("text_extract_filter", {
      val reason =
        s"""CASE WHEN len(${OracleText.toksSql("extracted")}) < 20 THEN 'too_short'
           |     WHEN len(${OracleText.toksSql("extracted")}) > 80 THEN 'too_long'
           |     WHEN ${OracleText.langPredSql("extracted")} <> 'en' THEN 'non_english'
           |     WHEN ${OracleText.swRatioSql("extracted")} < 0.05 THEN 'low_stopword_density'
           |END""".stripMargin.replace("\n", " ")
      s"""WITH $HtmlExtractCtes
         |SELECT doc_id, $reason AS reason, ($reason) IS NULL AS kept
         |FROM j ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val extracted = Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          HtmlOps.htmlFixture(col("doc_id"), col("text")).as("html"))
        .select(col("doc_id"), HtmlOps.blocks(col("html")).as("blocks"))
        .select(col("doc_id"), HtmlOps.keptTexts(col("blocks")).as("kept"))
        .select(col("doc_id"), HtmlOps.joinAndClean(col("kept")).as("x"))
      val counted = extracted
        .select(col("doc_id"), TextOps.textCounts(col("x")).as("_c"))
      val nWord = col("_c.n_word")
      val (pred, _) = TextOps.langIdFromHits(col("_c.sw_hits"))
      val swRatio = when(nWord === 0, lit(0.0))
        .otherwise(element_at(col("_c.sw_hits"),
          graft.functions.GraftTextCounts.langIndex("en") + 1)
          .cast("double") / nWord)
      val reason = when(nWord < 20, "too_short")
        .when(nWord > 80, "too_long")
        .when(pred =!= "en", "non_english")
        .when(swRatio < 0.05, "low_stopword_density")
      counted
        .select(col("doc_id"), reason.as("reason"), reason.isNull.as("kept"))
        .orderBy("doc_id")
    },

    // DSIR importance RESAMPLING (the decision layer over
    // text_dsir_weight — the paper's second half): Bernoulli keep with
    // per-doc rate ∝ weight, normalized by the corpus max. The coin is
    // DETERMINISTIC — u = polyhash(doc_id)/P, a rational in [0,1) both
    // engines compute identically — so the sample is reproducible across
    // runs/machines/engines and the oracle replays the keep verdicts
    // exactly (the same no-transcendental stance as the LM scores: no
    // pow/log ever reaches the compared output). One scalar aggregate
    // (max weight) rides beside the weight pass; the verdict is map-side.
    QueryDef.withOracle("pipeline_dsir_sample", {
      def side(sfx: String, where: String): String =
        s"""uni$sfx AS (SELECT h1, CAST(count(*) AS BIGINT) AS c1 FROM st
           |            $where GROUP BY h1),
           |big$sfx AS (SELECT h12, CAST(count(*) AS BIGINT) AS c2 FROM st
           |            $where GROUP BY h12),
           |vv$sfx AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni$sfx),
           |m$sfx AS (SELECT doc_id,
           |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list(p ORDER BY pos)), (a, b) -> a + b) / count(*) AS mean_p
           |  FROM (SELECT s.doc_id, s.pos,
           |          CAST(COALESCE(b.c2, 0) + 1 AS DOUBLE)
           |            / (COALESCE(u.c1, 0) + vv$sfx.v) AS p
           |        FROM st s LEFT JOIN uni$sfx u USING (h1)
           |                  LEFT JOIN big$sfx b USING (h12), vv$sfx)
           |  GROUP BY doc_id)""".stripMargin
      // the salt suffix pushes the polynomial past P so u wraps uniform
      // (a bare short id string hashes far below P -> u would sit ~0)
      val hv = OracleText.wordHashSql("(CAST(doc_id AS VARCHAR) || 'dsirsalt')")
      s"""WITH whst AS (SELECT doc_id, lang, $WHS AS whs FROM documents),
         |bg AS (SELECT doc_id, lang, generate_subscripts(shl, 1) - 1 AS pos,
         |         unnest(shl) AS h12
         |       FROM (SELECT doc_id, lang,
         |               ${shingleAllSql("whs", 2)} AS shl FROM whst)),
         |st AS (SELECT b.doc_id, b.lang, b.pos, w.whs[b.pos + 1] AS h1, b.h12
         |       FROM bg b JOIN whst w USING (doc_id)),
         |${side("r", "WHERE lang = 'en'")},
         |${side("s", "")},
         |wt AS (SELECT mr.doc_id, mr.mean_p / ms.mean_p AS weight
         |       FROM mr JOIN ms USING (doc_id)),
         |mx AS (SELECT max(weight) AS maxw FROM wt)
         |SELECT wt.doc_id, wt.weight,
         |  CAST($hv AS DOUBLE) / ${graft.ops.TextOps.P} AS u,
         |  CAST($hv AS DOUBLE) / ${graft.ops.TextOps.P}
         |    < wt.weight / mx.maxw * 0.5 AS keep
         |FROM wt, mx ORDER BY wt.doc_id""".stripMargin
    }) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val wt = graft.ops.NgramLmOps.dsirWeights(docs, "doc_id", "text",
          docs.filter(col("lang") === "en"))
        .select(col("doc_id"), col("weight"))
        .localCheckpoint(false) // read by the scalar max AND the verdict
      val maxw = wt.agg(max("weight")).head().getDouble(0)
      val u = TextOps.polyHash(concat(col("doc_id").cast("string"),
          lit("dsirsalt")))
        .cast("double") / TextOps.P
      wt.select(col("doc_id"), col("weight"), u.as("u"),
          (u < col("weight") / maxw * 0.5).as("keep"))
        .orderBy("doc_id")
    },

    // Rule-based quality FILTER — the decision layer on top of text_stats:
    // every document gets a keep/drop verdict plus the FIRST failing rule
    // (the reason a doc was dropped is what a pipeline owner debugs with).
    // Pure per-row compute: filters this shape run map-side at any scale.
    QueryDef.withOracle("text_filter",
      s"""SELECT doc_id,
         |  CASE WHEN len($TOKS) < 20 THEN 'too_short'
         |       WHEN len($TOKS) > 80 THEN 'too_long'
         |       WHEN $LANG_PRED <> 'en' THEN 'non_english'
         |       WHEN $SW_RATIO < 0.05 THEN 'low_stopword_density'
         |  END AS reason,
         |  CASE WHEN len($TOKS) < 20 THEN 'too_short'
         |       WHEN len($TOKS) > 80 THEN 'too_long'
         |       WHEN $LANG_PRED <> 'en' THEN 'non_english'
         |       WHEN $SW_RATIO < 0.05 THEN 'low_stopword_density'
         |  END IS NULL AS kept
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val counted = Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), TextOps.textCounts(col("text")).as("_c"))
      val nWord = col("_c.n_word")
      val (pred, _) = TextOps.langIdFromHits(col("_c.sw_hits"))
      val swRatio = when(nWord === 0, lit(0.0))
        .otherwise(element_at(col("_c.sw_hits"),
          graft.functions.GraftTextCounts.langIndex("en") + 1)
          .cast("double") / nWord)
      val reason = when(nWord < 20, "too_short")
        .when(nWord > 80, "too_long")
        .when(pred =!= "en", "non_english")
        .when(swRatio < 0.05, "low_stopword_density")
      counted
        .select(col("doc_id"), reason.as("reason"), reason.isNull.as("kept"))
        .orderBy("doc_id")
    },

    // GOPHER-STYLE QUALITY RULES (the Rae et al. 2021 repetition-free
    // document heuristics beyond text_filter's length/lang/stopword
    // stack): mean word length, alphabetic-word fraction, symbol-to-word
    // ratio (# and ellipsis), bullet-line and ellipsis-line fractions —
    // line-structure rules, so the fixture PLANTS structure (bullet
    // blocks on every 5th doc, an ellipsis line on every 7th, #-symbols
    // on every 11th, a numeric run on every 13th) and each rule fires
    // somewhere in the corpus. First-failing-rule verdict like
    // text_filter. Pure map-side HOF arithmetic, every ratio divided
    // once in double — the oracle replays it bitwise.
    QueryDef.withOracle("text_gopher_rules", {
      val planted =
        """text ||
          |  CASE WHEN doc_id % 5 = 0 THEN chr(10) || '- first point' ||
          |    chr(10) || '- second point' || chr(10) || '- third point'
          |    ELSE '' END ||
          |  CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'to be continued...'
          |    ELSE '' END ||
          |  CASE WHEN doc_id % 11 = 0 THEN chr(10) || '## section # mark #'
          |    ELSE '' END ||
          |  CASE WHEN doc_id % 13 = 0 THEN chr(10) ||
          |    '0 1 2 3 4 5 6 7 8 9 10 11 12 13 14' ELSE '' END"""
          .stripMargin.replace("\n", " ")
      val reason =
        """CASE WHEN mean_word_len < 3.0 OR mean_word_len > 10.0
          |       THEN 'word_length'
          |     WHEN frac_alpha_words < 0.8 THEN 'low_alpha'
          |     WHEN symbol_ratio > 0.1 THEN 'symbol_ratio'
          |     WHEN bullet_line_frac > 0.5 THEN 'bullet_lines'
          |     WHEN ellipsis_line_frac > 0.3 THEN 'ellipsis_lines'
          |END""".stripMargin.replace("\n", " ")
      s"""WITH p AS (SELECT doc_id, $planted AS t FROM documents),
         |m AS (SELECT doc_id,
         |    regexp_extract_all(t, '[^ \\t\\n\\x0B\\f\\r]+') AS ws,
         |    string_split(t, chr(10)) AS lns,
         |    length(t) - length(replace(t, '#', '')) AS n_hash,
         |    len(regexp_extract_all(t, '\\.\\.\\.')) AS n_ell
         |  FROM p),
         |d AS (SELECT doc_id,
         |    CAST(len(ws) AS BIGINT) AS n_words,
         |    CAST(len(lns) AS BIGINT) AS n_lines,
         |    CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
         |      / len(ws) AS mean_word_len,
         |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))
         |      AS DOUBLE) / len(ws) AS frac_alpha_words,
         |    CAST(n_hash + n_ell AS DOUBLE) / len(ws) AS symbol_ratio,
         |    CAST(len(list_filter(lns, l -> l LIKE '- %')) AS DOUBLE)
         |      / len(lns) AS bullet_line_frac,
         |    CAST(len(list_filter(lns, l -> l LIKE '%...')) AS DOUBLE)
         |      / len(lns) AS ellipsis_line_frac
         |  FROM m)
         |SELECT doc_id, n_words, n_lines, mean_word_len, frac_alpha_words,
         |  symbol_ratio, bullet_line_frac, ellipsis_line_frac,
         |  $reason AS reason, ($reason) IS NULL AS kept
         |FROM d ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val planted = concat(col("text"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          lit("\n- first point\n- second point\n- third point"))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(7)) === 0,
          lit("\nto be continued...")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(11)) === 0,
          lit("\n## section # mark #")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(13)) === 0,
          lit("\n0 1 2 3 4 5 6 7 8 9 10 11 12 13 14")).otherwise(lit("")))
      val m = Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), planted.as("t"))
        .select(col("doc_id"),
          // whitespace spelled out (NOT \S): Java's \s includes VT, RE2's
          // does not — the same divergence the byte-BPE pre-tokenizer fixed
          regexp_extract_all(col("t"), lit("[^ \\t\\n\\x0B\\f\\r]+"), lit(0)).as("ws"),
          split(col("t"), "\n").as("lns"),
          (length(col("t")) -
            length(regexp_replace(col("t"), "#", ""))).as("n_hash"),
          size(regexp_extract_all(col("t"), lit("\\.\\.\\."), lit(0)))
            .as("n_ell"))
      val d = m.select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        size(col("lns")).cast("long").as("n_lines"),
        (aggregate(col("ws"), lit(0L), (a, w) => a + length(w))
          .cast("double") / size(col("ws"))).as("mean_word_len"),
        (size(filter(col("ws"), w => w.rlike("[a-zA-Z]")))
          .cast("double") / size(col("ws"))).as("frac_alpha_words"),
        ((col("n_hash") + col("n_ell")).cast("double") / size(col("ws")))
          .as("symbol_ratio"),
        (size(filter(col("lns"), l => l.startsWith("- ")))
          .cast("double") / size(col("lns"))).as("bullet_line_frac"),
        (size(filter(col("lns"), l => l.endsWith("...")))
          .cast("double") / size(col("lns"))).as("ellipsis_line_frac"))
      val reason = when(
          col("mean_word_len") < 3.0 || col("mean_word_len") > 10.0,
          "word_length")
        .when(col("frac_alpha_words") < 0.8, "low_alpha")
        .when(col("symbol_ratio") > 0.1, "symbol_ratio")
        .when(col("bullet_line_frac") > 0.5, "bullet_lines")
        .when(col("ellipsis_line_frac") > 0.3, "ellipsis_lines")
      d.select(col("doc_id"), col("n_words"), col("n_lines"),
          col("mean_word_len"), col("frac_alpha_words"), col("symbol_ratio"),
          col("bullet_line_frac"), col("ellipsis_line_frac"),
          reason.as("reason"), reason.isNull.as("kept"))
        .orderBy("doc_id")
    },

    // BLOCKLIST FILTER (the C4-style lexicon stage): a document drops if
    // ANY token is blocklisted. The lexicon here is an in-plan literal
    // IN-list (codegen'd, zero shuffle); a production 100k-word lexicon
    // becomes a broadcast set or an Aho-Corasick pass — either way
    // map-side, which is the property this face pins. Reports the hit
    // count and the FIRST hit in token order (what a pipeline owner
    // debugs with).
    QueryDef.withOracle("text_blocklist_filter", {
      val lex = "'zorp', 'frobnicate', 'grok'"
      val planted = "text || CASE WHEN doc_id % 9 = 0 THEN ' zorp' ELSE '' END" +
        " || CASE WHEN doc_id % 27 = 0 THEN ' frobnicate grok zorp' ELSE '' END"
      s"""WITH m AS (SELECT doc_id,
         |    list_filter(${OracleText.toksSql(s"($planted)")},
         |      t -> t IN ($lex)) AS hits
         |  FROM documents)
         |SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_hits,
         |  CASE WHEN len(hits) > 0 THEN hits[1] ELSE '' END AS first_hit,
         |  len(hits) = 0 AS kept
         |FROM m ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val lex = Seq("zorp", "frobnicate", "grok")
      val planted = concat(col("text"),
        when(pmod(col("doc_id"), lit(9)) === 0, lit(" zorp"))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(27)) === 0, lit(" frobnicate grok zorp"))
          .otherwise(lit("")))
      Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          filter(TextOps.tokens(planted), t => t.isin(lex: _*))
            .as("hits"))
        .select(col("doc_id"),
          size(col("hits")).cast("long").as("n_hits"),
          when(size(col("hits")) > 0, element_at(col("hits"), 1))
            .otherwise(lit("")).as("first_hit"),
          (size(col("hits")) === 0).as("kept"))
        .orderBy("doc_id")
    },

    // PII REDACTION (the scrubbing stage before text ships): planted
    // doc_id-derived emails / NANP phone / IPv4 (plus a dotted version
    // string whose 4-digit tail must NOT match the word-bounded IP
    // pattern — a boundary-semantics trap in the VALUE gate), counted
    // per category and replaced by digit-free placeholders in the
    // normative email → phone → IP order. Pure map-side regex in the
    // Java∩RE2 subset; the oracle replays the fixture arithmetic, the
    // counts, the redaction chain and the redacted text's stats.
    QueryDef.withOracle("text_pii_redact", {
      import graft.ops.PiiOps
      def m(k: Int, base: Int, mul: Int = 1): String =
        s"CAST(doc_id * $mul % $k + $base AS VARCHAR)"
      val planted =
        s"""text || ' Contact user' || CAST(doc_id AS VARCHAR) || '@mail' ||
           |    ${m(7, 0)} || '.example.org' ||
           |    CASE WHEN doc_id % 3 = 0
           |      THEN ' and admin' || CAST(doc_id AS VARCHAR) || '@example.com'
           |      ELSE '' END ||
           |    CASE WHEN doc_id % 4 = 0 THEN ''
           |      ELSE ' or call +1-' || ${m(700, 200)} || '-' ||
           |           ${m(900, 100)} || '-' || ${m(9000, 1000)} END ||
           |    ' from ' || ${m(223, 1)} || '.' || ${m(256, 0, 7)} || '.' ||
           |    ${m(256, 0, 13)} || '.' || ${m(256, 0, 31)} ||
           |    CASE WHEN doc_id % 6 = 0 THEN ' v1.2.3.4000 released'
           |      ELSE '' END || ' end'""".stripMargin.replace("\n", " ")
      s"""WITH p AS (SELECT doc_id, $planted AS t FROM documents),
         |r AS (SELECT doc_id,
         |    CAST(len(regexp_extract_all(t, '${PiiOps.EmailRe}')) AS BIGINT)
         |      AS n_emails,
         |    CAST(len(regexp_extract_all(t, '${PiiOps.PhoneRe}')) AS BIGINT)
         |      AS n_phones,
         |    CAST(len(regexp_extract_all(t, '${PiiOps.IpRe}')) AS BIGINT)
         |      AS n_ips,
         |    regexp_replace(regexp_replace(regexp_replace(t,
         |      '${PiiOps.EmailRe}', '[EMAIL]', 'g'),
         |      '${PiiOps.PhoneRe}', '[PHONE]', 'g'),
         |      '${PiiOps.IpRe}', '[IP]', 'g') AS red
         |  FROM p)
         |SELECT doc_id, n_emails, n_phones, n_ips,
         |  CAST(length(red) AS BIGINT) AS n_chars,
         |  ${OracleText.fingerprintSql("red")} AS fp
         |FROM r ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      import graft.ops.PiiOps
      graft.functions.GraftFunctions.register(s)
      Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          PiiOps.piiFixture(col("doc_id"), col("text")).as("t"))
        .select(col("doc_id"),
          PiiOps.piiCount(col("t"), PiiOps.EmailRe).as("n_emails"),
          PiiOps.piiCount(col("t"), PiiOps.PhoneRe).as("n_phones"),
          PiiOps.piiCount(col("t"), PiiOps.IpRe).as("n_ips"),
          PiiOps.redact(col("t")).as("red"))
        .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
          length(col("red")).cast("long").as("n_chars"),
          TextOps.tokens(col("red")).as("_t"))
        .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
          col("n_chars"), TextOps.fingerprint(col("_t")).as("fp"))
        .orderBy("doc_id")
    },

    // Language-ID: per-language stopword-hit scores, winner by
    // (score desc, language asc) — same fold order in both engines.
    QueryDef.withOracle("text_langid",
      s"""SELECT doc_id, lang,
         |  $LANG_PRED AS lang_pred,
         |  $LANG_SCORE AS lang_score
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val counted = Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("lang"),
          TextOps.textCounts(col("text")).as("_c"))
      val (pred, score) = TextOps.langIdFromHits(col("_c.sw_hits"))
      counted.select(
        col("doc_id"), col("lang"),
        pred.as("lang_pred"), score.as("lang_score"))
        .orderBy("doc_id")
    },

    // TRAINED language-ID (the CCNet-class classifier; r15 verdict gap
    // #3): hashed char-3-gram bucket shares → one-vs-rest logistic GD,
    // model PERSISTED, prediction = deterministic argmax of the replayed
    // logits. The fixture plants per-language ORTHOGRAPHIC markers
    // (disjoint from every stopword list — see LangIdOps scaladoc: the
    // corpus itself carries no language signal), so the trained model has
    // real character patterns to learn while the stopword-vote baseline
    // (pred_heur, same marked text) stays blind to them. ok/ok_heur put
    // the accuracy gap in the gated output itself.
    QueryDef.withOracle("text_langid_model", {
      import graft.ops.LangIdOps
      val markedCase = LangIdOps.LangMarkers.map { case (l, ms) =>
        val arr = ms.map(m => s"'$m'").mkString(", ")
        s"WHEN '$l' THEN array_to_string(list_slice([$arr], 1, " +
          s"CAST(3 + doc_id % 4 AS INT)), ' ')"
      }.mkString(" ")
      val marked = s"(CASE lang $markedCase ELSE '' END) || ' ' || text"
      val codes = "list_transform(string_split(" +
        "regexp_replace(lower(mtext), '[^a-z ]', '', 'g'), ''), " +
        "ch -> CAST(unicode(ch) AS BIGINT))"
      val grams = s"list_transform(range(0, len(codes) - 2), i -> " +
        s"((((codes[i+1] * ${TextOps.B1} + codes[i+2]) % ${TextOps.P}) " +
        s"* ${TextOps.B1} + codes[i+3]) % ${TextOps.P}) % ${LangIdOps.Buckets})"
      val xs = (0 until LangIdOps.Buckets).map(k =>
        s"CASE WHEN len(g) = 0 THEN 0.0 ELSE " +
          s"CAST(len(list_filter(g, t -> t = $k)) AS DOUBLE) / len(g) END AS x$k")
        .mkString(", ")
      val zchain = (0 until LangIdOps.Buckets)
        .foldLeft("w0")((acc, k) => s"$acc + w${k + 1} * x$k")
      s"""WITH w AS (SELECT * FROM read_parquet('$LidWeightsPath/*.parquet')),
         |m AS (SELECT doc_id, lang, $marked AS mtext FROM documents),
         |cg AS (SELECT doc_id, lang, mtext, $codes AS codes FROM m),
         |gg AS (SELECT doc_id, lang, mtext, $grams AS g FROM cg),
         |f AS (SELECT doc_id, lang, $xs FROM gg),
         |sc AS (SELECT f.doc_id, f.lang, w.cand, $zchain AS logit FROM f, w),
         |pr AS (SELECT doc_id, lang, cand, row_number() OVER
         |         (PARTITION BY doc_id ORDER BY logit DESC, cand) AS rk
         |       FROM sc),
         |h AS (SELECT doc_id, ${langPredSql("mtext")} AS pred_heur FROM m)
         |SELECT p.doc_id, p.lang, p.cand AS pred, h.pred_heur,
         |  (p.cand = p.lang) AS ok, (h.pred_heur = p.lang) AS ok_heur
         |FROM pr p JOIN h USING (doc_id) WHERE rk = 1
         |ORDER BY p.doc_id""".stripMargin
    }) { (s, dir) =>
      import graft.ops.LangIdOps
      graft.functions.GraftFunctions.register(s)
      val docs = Tables(s, dir, "documents")
      val langs = LangIdOps.LangMarkers.map(_._1)
      val present = docs.select("lang").distinct().collect()
        .map(_.getString(0)).toSet // catalog-scale collect
      require(present.subsetOf(langs.toSet),
        s"langs without markers: ${present.diff(langs.toSet).mkString(",")}")
      val marked = docs.select(col("doc_id"), col("lang"),
        LangIdOps.markedFixture(col("doc_id"), col("lang"), col("text"))
          .as("mtext"))
      // pin: three actions consume feats (the trainer's count + sample
      // collect, then the corpus-wide predict) — without it each one
      // re-runs the projection scan (review finding; the DedupOps pin
      // stance: cluster-safe persist, lineage kept)
      val feats = LangIdOps.features(marked, "doc_id", "lang", col("mtext"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ws = LangIdOps.trainOneVsRest(feats, "doc_id", langs)
      val wrows = LangIdOps.weightRows(s, ws)
      wrows.coalesce(1).write.mode("overwrite").parquet(LidWeightsPath)
      val pred = LangIdOps.predict(feats, "doc_id", wrows)
      val heur = marked
        .select(col("doc_id"), TextOps.textCounts(col("mtext")).as("_c"))
        .select(col("doc_id"),
          TextOps.langIdFromHits(col("_c.sw_hits"))._1.as("pred_heur"))
      pred.join(heur, Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("pred"), col("pred_heur"),
          (col("pred") === col("lang")).as("ok"),
          (col("pred_heur") === col("lang")).as("ok_heur"))
        .orderBy("doc_id")
    },

    // Document fingerprinting: order-sensitive rolling hash over the token
    // stream + order-insensitive 30-bit SimHash over the token multiset.
    QueryDef.withOracle("text_fingerprint",
      s"""SELECT doc_id,
         |  $FINGERPRINT AS fingerprint,
         |  $SIMHASH AS simhash
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // the word-hash array is a native single-pass expression now — two
      // digests referencing it just run the compiled loop twice per row,
      // no materialization barrier needed
      graft.functions.GraftFunctions.register(s)
      val whs = TextOps.wordHashes(TextOps.tokens(col("text")))
      Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(
          col("doc_id"),
          TextOps.fingerprintOfHashes(whs).as("fingerprint"),
          TextOps.simHashOfHashes(whs, 30).as("simhash"))
        .orderBy("doc_id")
    },

    // Keyword extraction: each document's 3 RAREST distinct terms by corpus
    // document frequency — the integer/string cousin of TF-IDF (see
    // TextOps.rareTerms on why not ln-based scores). Ties rank by term.
    QueryDef.withOracle("text_keywords",
      s"""WITH terms AS (
         |  SELECT doc_id, unnest(list_distinct($TOKS)) AS term FROM documents),
         |df AS (SELECT term, count(*) AS doc_freq FROM terms GROUP BY term),
         |r AS (SELECT t.doc_id, t.term, df.doc_freq,
         |        CAST(row_number() OVER (PARTITION BY t.doc_id
         |          ORDER BY df.doc_freq, t.term) AS BIGINT) AS "rank"
         |      FROM terms t JOIN df USING (term))
         |SELECT doc_id, "rank", term, doc_freq FROM r WHERE "rank" <= 3
         |ORDER BY doc_id, "rank"""".stripMargin) { (s, dir) =>
      TextOps.rareTerms(
        Tables(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism),
        "doc_id", "text", k = 3)
    },

    // Corpus heavy hitters: top 100 terms by document frequency (the vocab
    // sweep every corpus-QA pipeline starts with). Per-doc distinct explode
    // → vocab-sized hash agg → TakeOrderedAndProject top-k: the full sort
    // never happens, and the shuffle carries (term, count) rows, not text.
    QueryDef.withOracle("text_top_terms",
      s"""WITH terms AS (
         |  SELECT doc_id, unnest(list_distinct($TOKS)) AS term FROM documents)
         |SELECT term, count(*) AS doc_freq FROM terms
         |GROUP BY term ORDER BY doc_freq DESC, term LIMIT 100""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("term")).limit(100)
    },

    // Corpus-level vocabulary stats: exact distinct-term count (vocabulary
    // size), total token volume, docs with >= 1 token. Exact, not HLL — and
    // NOT a multi-distinct aggregate: Spark plans that with an Expand that
    // triplicates every exploded token row before the shuffle. Instead the
    // term side reduces to a vocab-sized (term, count) table first (map-side
    // combined) and folds to one row; the doc count comes from a pre-explode
    // per-doc aggregate. Both branches shuffle ~nothing.
    QueryDef.withOracle("text_vocab",
      s"""WITH toks AS (SELECT doc_id, unnest($TOKS) AS term FROM documents)
         |SELECT CAST(count(DISTINCT term) AS BIGINT) AS vocab_size,
         |       count(*) AS total_tokens,
         |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM toks""".stripMargin) { (s, dir) =>
      val par = s.sparkContext.defaultParallelism
      val docs = Tables(s, dir, "documents").repartition(par)
      val byTerm = docs
        .select(explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("vocab_size"), sum("c").as("total_tokens"))
      val nDocs = docs
        .agg(count(when(size(TextOps.tokens(col("text"))) > 0, 1)).as("n_docs"))
      // both sides are single-row aggregates; the explicit hint pins a
      // BroadcastNestedLoopJoin so no plain CartesianProduct (which would
      // be a full shuffle-and-pair at scale) can enter the plan
      byTerm.crossJoin(broadcast(nDocs))
        .select("vocab_size", "total_tokens", "n_docs")
    },

    // Within-document REPETITION scoring — the Gopher-style quality rule
    // (repeated 2-/3-gram fraction; machine-generated and boilerplate text
    // repeats itself). rep_k = 1 - distinct/total over the doc's k-gram
    // shingle hashes: per-row map work with no aggregation shuffle (the
    // leading repartition only spreads a single-row-group toy input across
    // cores, like shingleSets — a real corpus arrives pre-split and skips
    // it); the only division is one exact-integer ratio, so values are
    // bit-portable. Shingle identity is hash identity, the same contract
    // the dedup family uses.
    QueryDef.withOracle("text_repetition", {
      def distinctK(k: Int) = s"len(${OracleText.shingleDistinctSql("whs", k)})"
      s"""WITH whst AS (SELECT doc_id, $WHS AS whs FROM documents),
         |d AS (SELECT doc_id,
         |        greatest(len(whs) - 1, 0) AS n2_total, ${distinctK(2)} AS n2_distinct,
         |        greatest(len(whs) - 2, 0) AS n3_total, ${distinctK(3)} AS n3_distinct
         |      FROM whst)
         |SELECT doc_id,
         |  CAST(n2_total AS BIGINT) AS n2_total,
         |  CAST(n2_distinct AS BIGINT) AS n2_distinct,
         |  CASE WHEN n2_total > 0
         |       THEN CAST(n2_total - n2_distinct AS DOUBLE) / n2_total
         |       ELSE 0.0 END AS rep2_frac,
         |  CAST(n3_total AS BIGINT) AS n3_total,
         |  CAST(n3_distinct AS BIGINT) AS n3_distinct,
         |  CASE WHEN n3_total > 0
         |       THEN CAST(n3_total - n3_distinct AS DOUBLE) / n3_total
         |       ELSE 0.0 END AS rep3_frac
         |FROM d ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val par = s.sparkContext.defaultParallelism
      // whs staged behind a barrier: both shingle widths read it, and
      // projection collapse would otherwise re-run tokenize+hash per width
      val whs = Tables(s, dir, "documents").repartition(par)
        .select(col("doc_id"),
          TextOps.wordHashes(TextOps.tokens(col("text"))).as("whs"))
        .localCheckpoint(false)
      val d = whs.select(col("doc_id"),
        greatest(size(col("whs")) - 1, lit(0)).cast("long").as("n2_total"),
        size(TextOps.shingleHashesOfHashes(col("whs"), 2)).cast("long").as("n2_distinct"),
        greatest(size(col("whs")) - 2, lit(0)).cast("long").as("n3_total"),
        size(TextOps.shingleHashesOfHashes(col("whs"), 3)).cast("long").as("n3_distinct"))
      def frac(t: org.apache.spark.sql.Column, dc: org.apache.spark.sql.Column) =
        when(t > 0, (t - dc).cast("double") / t).otherwise(lit(0.0))
      d.select(col("doc_id"), col("n2_total"), col("n2_distinct"),
          frac(col("n2_total"), col("n2_distinct")).as("rep2_frac"),
          col("n3_total"), col("n3_distinct"),
          frac(col("n3_total"), col("n3_distinct")).as("rep3_frac"))
        .orderBy("doc_id")
    },

    // EXTENSION: BM25-style ranked retrieval for a fixed query (hash, join,
    // vector) — per-doc tfs via array primitives map-side (no corpus-wide
    // term explode), ONE scalar aggregation for N/avgdl/dfs broadcast back,
    // saturation tf·2.2/(tf + 1.2·(0.25 + 0.75·dl/avgdl)), rational idf
    // (N−df+½)/(df+½) — ln omitted so every step is IEEE-exact across
    // engines (TextOps.bm25Rank scaladoc). Oracle mirrors the expression
    // token-for-token; top-50 by (score desc, doc_id) is a total order.
    QueryDef.withOracle("text_bm25", {
      def tf(t: String) = s"len(list_filter(ts, x -> x = '$t'))"
      s"""WITH d AS (SELECT doc_id, len(ts) AS dl,
         |        ${tf("hash")} AS tf0, ${tf("join")} AS tf1,
         |        ${tf("vector")} AS tf2
         |      FROM (SELECT doc_id, $TOKS AS ts FROM documents)),
         |c AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
         |        sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         |        sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         |        sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
         |      FROM d)
         |SELECT doc_id,
         |  (n - df0 + 0.5) / (df0 + 0.5) * CAST(tf0 AS DOUBLE) * 2.2
         |    / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
         |  + (n - df1 + 0.5) / (df1 + 0.5) * CAST(tf1 AS DOUBLE) * 2.2
         |    / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
         |  + (n - df2 + 0.5) / (df2 + 0.5) * CAST(tf2 AS DOUBLE) * 2.2
         |    / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
         |  AS score, CAST(dl AS BIGINT) AS dl
         |FROM d, c WHERE tf0 + tf1 + tf2 > 0
         |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin
    }) { (s, dir) =>
      TextOps.bm25Rank(Tables(s, dir, "documents"), "doc_id", "text",
        Seq("hash", "join", "vector"), topN = 50)
    },

    // MULTI-query retrieval: three queries ranked in ONE shared corpus
    // pass (union-vocabulary tf columns + one stats aggregation reused by
    // every query), per-query top-20 via a rank window — the eval-suite /
    // dashboard shape where re-scanning the corpus per query is the
    // anti-pattern. Score arithmetic stays a fixed literal chain per
    // query, so doubles replay bitwise (see TextOps.bm25RankMulti).
    QueryDef.withOracle("text_bm25_multi", {
      // union vocabulary in first-appearance order: must match the Scala
      // side's `queries.flatMap(_._2).distinct`
      val terms = Seq("spark", "join", "window", "sort", "merge", "vector", "batch")
      def tf(t: String) = s"len(list_filter(ts, x -> x = '$t'))"
      def ts(i: Int) =
        s"""(n - df$i + 0.5) / (df$i + 0.5) * CAST(tf$i AS DOUBLE) * 2.2
           |    / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))""".stripMargin
      def q(qid: String, is: Seq[Int]) =
        s"""SELECT '$qid' AS query_id, doc_id,
           |  ${is.map(ts).mkString("\n  + ")} AS score, CAST(dl AS BIGINT) AS dl
           |FROM d, c WHERE ${is.map(i => s"tf$i").mkString(" + ")} > 0""".stripMargin
      s"""WITH d AS (SELECT doc_id, len(ts) AS dl,
         |        ${terms.zipWithIndex.map { case (t, i) => s"${tf(t)} AS tf$i" }.mkString(",\n        ")}
         |      FROM (SELECT doc_id, $TOKS AS ts FROM documents)),
         |c AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
         |        ${terms.indices.map(i => s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(",\n        ")}
         |      FROM d),
         |u AS (${q("q_spark_join", Seq(0, 1))}
         |      UNION ALL ${q("q_window_sort_merge", Seq(2, 3, 4))}
         |      UNION ALL ${q("q_vector_batch", Seq(5, 6))}),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS rank FROM u)
         |SELECT query_id, doc_id, score, dl, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= 20 ORDER BY query_id, rank""".stripMargin
    }) { (s, dir) =>
      TextOps.bm25RankMulti(Tables(s, dir, "documents"), "doc_id", "text",
        Seq("q_spark_join" -> Seq("spark", "join"),
          "q_window_sort_merge" -> Seq("window", "sort", "merge"),
          "q_vector_batch" -> Seq("vector", "batch")), topN = 20)
    },

    // MODEL-BASED quality filtering (the fasttext-classifier stage of
    // GPT-3/LLaMA-style curation): logistic regression trained by
    // distributed full-batch GD to separate "curated" sources (src0-4)
    // from the rest, then every doc scored by the learned logit. The query
    // trains, PERSISTS the model, and scores; the oracle replays SCORING
    // from the persisted weights with the identical feature arithmetic and
    // multiply-add chain — keep = logit > 0 (σ is monotone, so the
    // compared output carries no transcendental). Training itself is
    // float-sum order-dependent like all distributed SGD; the persisted
    // model is the contract, exactly as deployed pipelines treat it.
    // Calibration note: the synthetic corpus's features carry no label
    // signal, so the trained model converges to the label base rate
    // (logit ≈ ln(0.25/0.75) ≈ −1.1 for every doc, keep = false) — the
    // measured, correct answer here; the spec's separable fixture shows
    // the same trainer at total separation when signal exists.
    QueryDef.withOracle("text_quality_model",
      s"""WITH w AS (SELECT * FROM read_parquet('$QlrWeightsPath/*.parquet')),
         |f AS (SELECT doc_id, source IN ($CuratedSql) AS label,
         |        $F_LEN AS f_len, $SW_RATIO AS f_stop, $PUNCT_RATIO AS f_punct,
         |        $F_SYM AS f_sym, $F_WLEN AS f_wlen
         |      FROM documents)
         |SELECT doc_id, label,
         |  w0 + w1 * f_len + w2 * f_stop + w3 * f_punct
         |     + w4 * f_sym + w5 * f_wlen AS logit,
         |  w0 + w1 * f_len + w2 * f_stop + w3 * f_punct
         |     + w4 * f_sym + w5 * f_wlen > 0 AS keep
         |FROM f, w ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val feats = QualityModelOps.features(Tables(s, dir, "documents"),
        "doc_id", "text", col("source").isin(Curated: _*))
        .localCheckpoint(false)
      val w = QualityModelOps.trainLogistic(feats)
      val wrow = QualityModelOps.weightsRow(s, w)
      wrow.coalesce(1).write.mode("overwrite").parquet(QlrWeightsPath)
      QualityModelOps.scoreWith(feats, "doc_id", wrow).orderBy("doc_id")
    },

    // N-gram LM scoring (the CCNet/KenLM stage): bigram LM trained on the
    // in-language reference slice (lang='en'), every doc scored by its
    // add-one-smoothed mean transition probability + OOV-bigram count.
    // p = (c2+1)/(c1+V) is a single integer-count division and the per-doc
    // reduce folds in position order, so the oracle replays every value
    // bit-for-bit (the rational form of the perplexity signal — see
    // NgramLmOps scaladoc on why no transcendental rides the compared
    // output). Training counts are vocabulary-scale aggregations; scoring
    // is two hash joins over a 24-byte bigram stream.
    QueryDef.withOracle("text_lm_score",
      s"""WITH whst AS (SELECT doc_id, lang, $WHS AS whs FROM documents),
         |bg AS (SELECT doc_id, lang, generate_subscripts(shl, 1) - 1 AS pos,
         |         unnest(shl) AS h12
         |       FROM (SELECT doc_id, lang,
         |               ${shingleAllSql("whs", 2)} AS shl FROM whst)),
         |st AS (SELECT b.doc_id, b.lang, b.pos, w.whs[b.pos + 1] AS h1, b.h12
         |       FROM bg b JOIN whst w USING (doc_id)),
         |uni AS (SELECT h1, CAST(count(*) AS BIGINT) AS c1 FROM st
         |        WHERE lang = 'en' GROUP BY h1),
         |big AS (SELECT h12, CAST(count(*) AS BIGINT) AS c2 FROM st
         |        WHERE lang = 'en' GROUP BY h12),
         |vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
         |probs AS (SELECT s.doc_id, s.pos, b.c2 IS NULL AS oov,
         |            CAST(COALESCE(b.c2, 0) + 1 AS DOUBLE)
         |              / (COALESCE(u.c1, 0) + vv.v) AS p
         |          FROM st s LEFT JOIN uni u USING (h1)
         |                    LEFT JOIN big b USING (h12), vv)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(p ORDER BY pos)),
         |    (a, b) -> a + b) / count(*) AS mean_p
         |FROM probs GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      graft.ops.NgramLmOps.lmScore(docs, "doc_id", "text",
          docs.filter(col("lang") === "en"))
        .orderBy("doc_id")
    },

    // Interpolated KNESER-NEY bigram scoring (KenLM's default smoothing —
    // what CCNet-style perplexity filters actually run): absolute
    // discount 0.75 on seen bigrams, held-out mass routed through the
    // CONTINUATION distribution (distinct-context counts, not raw
    // frequency), whole-backoff on unseen contexts, a 1/(N+1) floor on
    // unseen words. Every term is a ratio of integer counts folded in
    // position order — no transcendental rides the compared output (the
    // lmScore stance) — so the oracle replays mean_p bit-for-bit.
    QueryDef.withOracle("text_lm_kneser_ney",
      s"""WITH $KnProbsCtes
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(CASE WHEN unseen THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(p ORDER BY pos)),
         |    (a, b) -> a + b) / count(*) AS mean_p
         |FROM probs GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      graft.ops.NgramLmOps.knScore(docs, "doc_id", "text",
          docs.filter(col("lang") === "en"))
        .orderBy("doc_id")
    },

    // CCNet PERPLEXITY BUCKETING (Wenzek et al. 2020 §4.4 — the stage
    // after LM scoring): per-language head/middle/tail terciles of the
    // Kneser-Ney score (higher mean_p = lower perplexity = head). The
    // 100 TB shape: thresholds come from the DISTINCT-SCORE histogram
    // (one agg + a histogram-cardinality window, never a per-doc sort
    // partitioned by ~30 language keys), then broadcast back for a
    // map-side bucket compare. Ties share a score, hence a bucket —
    // thresholds are SCORE-valued (t1 = score at desc-rank ceil(n/3)),
    // so head can exceed n/3 only by tied docs; deterministic in both
    // engines because mean_p replays bit-for-bit (the KN face's gate).
    QueryDef.withOracle("text_ccnet_buckets",
      s"""WITH $KnProbsCtes,
         |sc AS (SELECT p.doc_id,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list(p.p ORDER BY p.pos)), (a, b) -> a + b)
         |           / count(*) AS mean_p
         |       FROM probs p GROUP BY p.doc_id),
         |sl AS (SELECT s.doc_id, d.lang, s.mean_p
         |       FROM sc s JOIN documents d USING (doc_id)),
         |hist AS (SELECT lang, mean_p, CAST(count(*) AS BIGINT) AS cnt
         |         FROM sl GROUP BY 1, 2),
         |cum AS (SELECT lang, mean_p, SUM(cnt) OVER
         |          (PARTITION BY lang ORDER BY mean_p DESC) AS cum
         |        FROM hist),
         |nn AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM sl GROUP BY 1),
         |th AS (SELECT c.lang,
         |         MAX(CASE WHEN c.cum >= (n.n + 2) // 3 THEN c.mean_p END) AS t1,
         |         MAX(CASE WHEN c.cum >= (2 * n.n + 2) // 3 THEN c.mean_p END) AS t2
         |       FROM cum c JOIN nn n USING (lang) GROUP BY 1)
         |SELECT s.doc_id, s.lang, s.mean_p,
         |  CASE WHEN s.mean_p >= t.t1 THEN 'head'
         |       WHEN s.mean_p >= t.t2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM sl s JOIN th t USING (lang)
         |ORDER BY s.doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      val scored = graft.ops.NgramLmOps.knScore(docs, "doc_id", "text",
          docs.filter(col("lang") === "en"))
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("mean_p"))
      val hist = scored.groupBy("lang", "mean_p").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("lang").orderBy(col("mean_p").desc)
      val cum = hist.withColumn("cum", sum("cnt").over(w))
      val nn = scored.groupBy("lang").agg(count(lit(1)).as("n"))
      val th = cum.join(nn, "lang").groupBy("lang").agg(
        max(when(col("cum") >= expr("(n + 2) div 3"), col("mean_p"))).as("t1"),
        max(when(col("cum") >= expr("(2 * n + 2) div 3"), col("mean_p"))).as("t2"))
      scored.join(broadcast(th), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("mean_p"),
          when(col("mean_p") >= col("t1"), "head")
            .when(col("mean_p") >= col("t2"), "middle")
            .otherwise("tail").as("bucket"))
        .orderBy("doc_id")
    },

    // DSIR importance weights (Xie et al. 2023): likelihood ratio of the
    // reference-domain bigram LM (lang='en' slice) to the self (whole-
    // corpus) LM — the hashed-n-gram importance-resampling signal. Both
    // per-model means are the exact rational of text_lm_score; the weight
    // is one further exact division, so the oracle replays everything
    // bit-for-bit. Spark side fuses the two models into ONE stream pass
    // (four vocabulary-scale joins, both folds from one sorted collect).
    QueryDef.withOracle("text_dsir_weight", {
      def side(sfx: String, where: String): String =
        s"""uni$sfx AS (SELECT h1, CAST(count(*) AS BIGINT) AS c1 FROM st
           |            $where GROUP BY h1),
           |big$sfx AS (SELECT h12, CAST(count(*) AS BIGINT) AS c2 FROM st
           |            $where GROUP BY h12),
           |vv$sfx AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni$sfx),
           |m$sfx AS (SELECT doc_id,
           |    CAST(count(*) AS BIGINT) AS n_bigrams,
           |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list(p ORDER BY pos)), (a, b) -> a + b) / count(*) AS mean_p
           |  FROM (SELECT s.doc_id, s.pos,
           |          CAST(COALESCE(b.c2, 0) + 1 AS DOUBLE)
           |            / (COALESCE(u.c1, 0) + vv$sfx.v) AS p
           |        FROM st s LEFT JOIN uni$sfx u USING (h1)
           |                  LEFT JOIN big$sfx b USING (h12), vv$sfx)
           |  GROUP BY doc_id)""".stripMargin
      s"""WITH whst AS (SELECT doc_id, lang, $WHS AS whs FROM documents),
         |bg AS (SELECT doc_id, lang, generate_subscripts(shl, 1) - 1 AS pos,
         |         unnest(shl) AS h12
         |       FROM (SELECT doc_id, lang,
         |               ${shingleAllSql("whs", 2)} AS shl FROM whst)),
         |st AS (SELECT b.doc_id, b.lang, b.pos, w.whs[b.pos + 1] AS h1, b.h12
         |       FROM bg b JOIN whst w USING (doc_id)),
         |${side("r", "WHERE lang = 'en'")},
         |${side("s", "")}
         |SELECT mr.doc_id, mr.n_bigrams, mr.mean_p AS mean_p_ref,
         |  ms.mean_p AS mean_p_self, mr.mean_p / ms.mean_p AS weight
         |FROM mr JOIN ms USING (doc_id) ORDER BY mr.doc_id""".stripMargin
    }) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      graft.ops.NgramLmOps.dsirWeights(docs, "doc_id", "text",
          docs.filter(col("lang") === "en"))
        .orderBy("doc_id")
    },

    // STUPID-BACKOFF trigram LM (Brants et al. 2007 — the web-scale LM
    // recipe: unnormalized count ratios, a fixed 0.4 backoff weight, no
    // discount estimation): S = c123/c12, else 0.4*c23/c2, else
    // 0.4*0.4*(c3+1)/(T+V). Every branch is integer-count divisions and
    // double multiplies, so the oracle replays all three backoff levels
    // bit-for-bit; the n_bo_* columns pin WHICH level every position took.
    QueryDef.withOracle("text_lm_backoff",
      s"""WITH whst AS (SELECT doc_id, lang, $WHS AS whs FROM documents),
         |ref AS (SELECT whs FROM whst WHERE lang = 'en'),
         |uni AS (SELECT h, CAST(count(*) AS BIGINT) AS c_uni
         |        FROM (SELECT unnest(whs) AS h FROM ref) GROUP BY h),
         |bi AS (SELECT h, CAST(count(*) AS BIGINT) AS c_bi
         |       FROM (SELECT unnest(${shingleAllSql("whs", 2)}) AS h FROM ref)
         |       GROUP BY h),
         |tri AS (SELECT h, CAST(count(*) AS BIGINT) AS c_tri
         |        FROM (SELECT unnest(${shingleAllSql("whs", 3)}) AS h FROM ref)
         |        GROUP BY h),
         |tv AS (SELECT (SELECT CAST(sum(len(whs)) AS BIGINT) FROM ref) AS t,
         |              (SELECT CAST(count(*) AS BIGINT) FROM uni) AS v),
         |st AS (SELECT doc_id, generate_subscripts(shl, 1) - 1 AS pos,
         |         unnest(shl) AS h123
         |       FROM (SELECT doc_id, ${shingleAllSql("whs", 3)} AS shl
         |             FROM whst)),
         |stx AS (SELECT s.doc_id, s.pos, s.h123,
         |          (w.whs[s.pos + 1] * ${TextOps.B2} + w.whs[s.pos + 2])
         |            % ${TextOps.P} AS h12,
         |          (w.whs[s.pos + 2] * ${TextOps.B2} + w.whs[s.pos + 3])
         |            % ${TextOps.P} AS h23,
         |          w.whs[s.pos + 2] AS h2, w.whs[s.pos + 3] AS h3
         |        FROM st s JOIN whst w USING (doc_id)),
         |sc AS (SELECT x.doc_id, x.pos,
         |         CASE WHEN t3.c_tri IS NOT NULL
         |                THEN CAST(t3.c_tri AS DOUBLE) / b12.c_bi
         |              WHEN b23.c_bi IS NOT NULL
         |                THEN 0.4 * (CAST(b23.c_bi AS DOUBLE) / u2.c_uni)
         |              ELSE 0.4 * 0.4 * (CAST(COALESCE(u3.c_uni, 0) + 1 AS DOUBLE)
         |                / (tv.t + tv.v)) END AS s,
         |         CASE WHEN t3.c_tri IS NOT NULL THEN 0
         |              WHEN b23.c_bi IS NOT NULL THEN 1 ELSE 2 END AS lvl
         |       FROM stx x
         |       LEFT JOIN tri t3 ON t3.h = x.h123
         |       LEFT JOIN bi b12 ON b12.h = x.h12
         |       LEFT JOIN bi b23 ON b23.h = x.h23
         |       LEFT JOIN uni u2 ON u2.h = x.h2
         |       LEFT JOIN uni u3 ON u3.h = x.h3, tv)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         |  CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bo_bi,
         |  CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bo_uni,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(s ORDER BY pos)),
         |    (a, b) -> a + b) / count(*) AS mean_s
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      graft.ops.NgramLmOps.lmScoreBackoff(docs, "doc_id", "text",
          docs.filter(col("lang") === "en"))
        .orderBy("doc_id")
    }
  )
}

/** DuckDB SQL fragments mirroring graft.ops.TextOps arithmetic exactly.
  * Shared by the text/dedup/similarity oracles. */
object OracleText {
  /** Lowercase word tokens. */
  val TOKS = "regexp_extract_all(lower(text), '[a-z]+')"

  /** A Scala string as a pure-ASCII DuckDB expression: printable-ASCII
    * runs become quoted literals, everything else `chr(codepoint)` —
    * keeps oracle_sql.json ASCII-clean no matter what damage the
    * normalization fixtures plant. */
  def chrSql(s: String): String = {
    if (s.isEmpty) return "''"
    val parts = Seq.newBuilder[String]
    val run = new StringBuilder
    def flush(): Unit =
      if (run.nonEmpty) { parts += s"'${run.toString.replace("'", "''")}'"; run.clear() }
    s.codePoints().toArray.foreach { c =>
      if (c >= 0x20 && c < 0x7f) run.append(c.toChar)
      else { flush(); parts += s"chr($c)" }
    }
    flush()
    val ps = parts.result()
    if (ps.length == 1) ps.head else ps.mkString("(", " || ", ")")
  }

  /** TextOps.normalizeText replayed in DuckDB: the same repair chain
    * (entries rendered via [[chrSql]]), `nfc_normalize` (UAX #15, same
    * form as graft_nfc), the same strip class with the 'g' flag. */
  def normalizeSql(e: String): String = {
    val repaired = TextOps.MojibakeRepairs.foldLeft(e) { case (acc, (m, f)) =>
      s"replace($acc, ${chrSql(m)}, ${chrSql(f)})"
    }
    s"regexp_replace(nfc_normalize($repaired), '${TextOps.StripClassRe}', '', 'g')"
  }

  /** TextOps.damageFixture replayed in DuckDB over a text expression. */
  def damageSql(textE: String): String =
    s"CASE CAST(doc_id % 4 AS INTEGER)" +
      s" WHEN 0 THEN ${chrSql(TextOps.DamageNfd)} || $textE" +
      s" WHEN 1 THEN ${chrSql(TextOps.DamageMojibake)} || $textE" +
      s" WHEN 2 THEN ${chrSql(TextOps.DamageZw)} || $textE" +
      s" ELSE $textE END"

  /** Polynomial char hash of one token `t` (mirrors TextOps.polyHash),
    * parameterized on the prime so both streams of the packed double-prime
    * identity key share one definition. */
  def wordHashSqlMod(tok: String, p: Long): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($tok, ''), ch -> CAST(unicode(ch) AS BIGINT))), " +
      s"(h, c) -> (h * ${TextOps.B1} + c) % $p)"

  def wordHashSql(tok: String): String = wordHashSqlMod(tok, TextOps.P)

  /** Array of token hashes of the document (mirrors TextOps.wordHashes). */
  val WHS = s"list_transform($TOKS, t -> ${wordHashSql("t")})"

  /** Second-prime token-hash stream (mod P2) of the packed double-prime
    * identity key — mirrors the `w2` stream of
    * graft.functions.GraftShinglesAllWide. */
  val WHS2 = s"list_transform($TOKS, t -> ${wordHashSqlMod("t", TextOps.P2)})"

  /** Distinct k-word shingle hashes of a word-hash array expression
    * (mirrors TextOps.shingleHashesOfHashes) — ONE definition keeps the
    * dedup and repetition oracles pinned to the same arithmetic. */
  def shingleDistinctSql(whs: String, k: Int): String =
    s"list_distinct(list_transform(range(0, len($whs) - ${k - 1}), i -> " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice($whs, i + 1, i + $k)), " +
      s"(h, w) -> (h * ${TextOps.B2} + w) % ${TextOps.P})))"

  /** ALL k-word shingle hashes in positional order (mirrors
    * TextOps.shingleHashesAll — the non-distinct sibling of
    * [[shingleDistinctSql]]); element i (1-based in DuckDB lists) hashes
    * tokens [i-1, i-1+k). */
  def shingleAllSql(whs: String, k: Int): String =
    s"list_transform(range(0, len($whs) - ${k - 1}), i -> " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice($whs, i + 1, i + $k)), " +
      s"(h, w) -> (h * ${TextOps.B2} + w) % ${TextOps.P}))"

  /** ALL k-word shingle hashes under the PACKED DOUBLE-PRIME 62-bit
    * identity key (mirrors TextOps.shingleHashesAllWide / the native
    * GraftShinglesAllWide): window i folds `whs1` mod P and `whs2` mod P2
    * with base B2 and packs `h1 * P2 + h2`. Every intermediate < 2^63, so
    * BIGINT arithmetic is exact. */
  def shingleAllWideSql(whs1: String, whs2: String, k: Int): String =
    s"list_transform(range(0, len($whs1) - ${k - 1}), i -> " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice($whs1, i + 1, i + $k)), " +
      s"(h, w) -> (h * ${TextOps.B2} + w) % ${TextOps.P}) * ${TextOps.P2} + " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice($whs2, i + 1, i + $k)), " +
      s"(h, w) -> (h * ${TextOps.B2} + w) % ${TextOps.P2}))"

  /** Lowercase word tokens of an arbitrary string expression. */
  def toksSql(e: String): String = s"regexp_extract_all(lower($e), '[a-z]+')"

  /** Rolling fingerprint over the token hash stream of an arbitrary
    * string expression (mirrors TextOps.fingerprint ∘ tokens). */
  def fingerprintSql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(${toksSql(e)}, t -> ${wordHashSql("t")})), " +
      s"(f, wh) -> (f * ${TextOps.B2} + wh) % ${TextOps.P})"

  /** Rolling fingerprint over the token hash stream. */
  val FINGERPRINT =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $WHS), " +
      s"(f, wh) -> (f * ${TextOps.B2} + wh) % ${TextOps.P})"

  /** 30-bit SimHash (mirrors TextOps.simHash: per-bit ±1 votes, sign bit). */
  val SIMHASH =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       | list_transform(range(0, 30), p ->
       |   CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
       |     list_transform($WHS, wh ->
       |       CASE WHEN (wh >> p) & 1 = 1 THEN CAST(1 AS BIGINT)
       |            ELSE CAST(-1 AS BIGINT) END)), (a, b) -> a + b) > 0
       |   THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END)),
       | (a, b) -> a + b)""".stripMargin.replace("\n", " ")

  /** Token-stream delimiter used by the BPE replay CTEs: TAB, which is
    * WHITESPACE — the pre-tokenizer splits on `\s`, so no pre-token can
    * ever contain it (a '|' delimiter would collide with a literal '|'
    * in document text and silently corrupt counts). */
  val BpeDelim = "\t"

  /** REAL-BPE replay CTEs (mirrors graft.functions.BpeVocab exactly).
    * Queries embedding this block must open with `WITH RECURSIVE`.
    *
    * Mechanism: each distinct pre-token becomes a TAB-delimited symbol
    * string ('abc' → '<T>a<T>b<T>c<T>'); the recursive CTE sweeps the
    * merge table in rank order, applying each merge via
    * `replace('<T>a<T>b<T>' → '<T>ab<T>')` repeatedly until the pattern
    * is gone before advancing to the next rank. For a well-formed table
    * (every BPE-trained table is — a symbol cannot appear in a merge
    * before the merge that creates it) this rank-order fixpoint sweep is
    * equivalent to the Scala side's greedy lowest-rank-first loop; the
    * equivalence is validated over every corpus word plus overlap/repeat
    * stress cases (PipelineOpsSpec property test). Produces:
    *  - `bpe_tok(w, s)`: per distinct pre-token, the final delimited
    *    token string
    *  - `bpe_doc(doc_id, n_tokens)`: per document, total merged-token
    *    count (docs with no pre-tokens absent — LEFT JOIN + COALESCE)
    *  - `bpe_doctok(doc_id, alltok)`: the document's full ordered token
    *    stream, [[BpeDelim]]-joined */
  val BPE_CTES: String = bpeCtesOver("documents")

  /** [[BPE_CTES]] over an arbitrary `(doc_id, text)` relation — the
    * composed crawl→train capstone tokenizes CURATED text, not the raw
    * corpus, through the same replay. */
  def bpeCtesOver(rel: String): String = {
    val nm = graft.functions.BpeVocab.Merges.length
    val D = BpeDelim
    val vals = graft.functions.BpeVocab.Merges.zipWithIndex.map {
      case ((a, b), i) => s"($i, '$D$a$D$b$D', '$D$a$b$D')"
    }.mkString(",\n    ")
    s"""bpe_m(rnk, pat, rep) AS (VALUES
       |    $vals),
       |bpe_pre AS (SELECT doc_id,
       |              regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]') AS ws
       |            FROM $rel),
       |bpe_wd AS (SELECT DISTINCT unnest(ws) AS w FROM bpe_pre),
       |bpe_it(w, s, rnk) AS (
       |  SELECT w, '$D' || regexp_replace(w, '(.)', '\\1$D', 'g'), 0 FROM bpe_wd
       |  UNION ALL
       |  SELECT i.w,
       |    CASE WHEN contains(i.s, m.pat) THEN replace(i.s, m.pat, m.rep)
       |         ELSE i.s END,
       |    CASE WHEN contains(i.s, m.pat) THEN i.rnk ELSE i.rnk + 1 END
       |  FROM bpe_it i JOIN bpe_m m ON m.rnk = i.rnk
       |  WHERE i.rnk < $nm),
       |bpe_tok AS (SELECT w, s FROM bpe_it WHERE rnk = $nm),
       |bpe_wtok AS (SELECT doc_id, w, ord FROM (
       |               SELECT doc_id, unnest(ws) AS w,
       |                      generate_subscripts(ws, 1) AS ord
       |               FROM bpe_pre)),
       |bpe_doc AS (SELECT p.doc_id,
       |              CAST(SUM(length(t.s) - length(replace(t.s, '$D', '')) - 1)
       |                   AS BIGINT) AS n_tokens
       |            FROM bpe_wtok p JOIN bpe_tok t USING (w) GROUP BY 1),
       |bpe_doctok AS (SELECT p.doc_id,
       |                 string_agg(trim(t.s, '$D'), '$D' ORDER BY p.ord) AS alltok
       |               FROM bpe_wtok p JOIN bpe_tok t USING (w) GROUP BY 1)""".stripMargin
  }

  /** BYTE-LEVEL BPE replay CTEs (mirrors graft.functions.ByteBpeVocab):
    * same rank-order fixpoint sweep over [[BpeDelim]]-delimited symbol
    * strings as [[BPE_CTES]] — the equivalence argument carries over
    * verbatim because the merge machinery is alphabet-agnostic — but the
    * initial symbols are the pre-token's UTF-8 bytes mapped through the
    * GPT-2 byte→printable-char table. The corpus is ASCII, so the SQL
    * mapping is the exact ASCII projection of the full table: printable
    * 33..126 identity, DEL(127) → chr(289), controls/space 0..32 →
    * chr(code+256). TAB stays delimiter-safe: no MAPPED char is ever
    * whitespace (that is the point of the GPT-2 alphabet). Produces
    * `bb_doctok(doc_id, alltok)` — the document's ordered byte-level
    * token stream, [[BpeDelim]]-joined. */
  val BPE_BYTE_CTES: String = {
    import graft.functions.ByteBpeVocab
    val nm = ByteBpeVocab.Merges.length
    val D = BpeDelim
    val re = ByteBpeVocab.PreTokenRe.replace("'", "''")
    val vals = ByteBpeVocab.Merges.zipWithIndex.map {
      case ((a, b), i) => s"($i, '$D$a$D$b$D', '$D$a$b$D')"
    }.mkString(",\n    ")
    s"""bb_m(rnk, pat, rep) AS (VALUES
       |    $vals),
       |bb_pre AS (SELECT doc_id, regexp_extract_all(text, '$re') AS ws
       |           FROM documents),
       |bb_wd AS (SELECT DISTINCT unnest(ws) AS w FROM bb_pre),
       |bb_it(w, s, rnk) AS (
       |  SELECT w, '$D' || list_reduce(list_transform(string_split(w, ''),
       |      ch -> CASE WHEN unicode(ch) BETWEEN 33 AND 126 THEN ch
       |                 WHEN unicode(ch) = 127 THEN chr(289)
       |                 ELSE chr(unicode(ch) + 256) END || '$D'),
       |      (a, c) -> a || c), 0
       |  FROM bb_wd
       |  UNION ALL
       |  SELECT i.w,
       |    CASE WHEN contains(i.s, m.pat) THEN replace(i.s, m.pat, m.rep)
       |         ELSE i.s END,
       |    CASE WHEN contains(i.s, m.pat) THEN i.rnk ELSE i.rnk + 1 END
       |  FROM bb_it i JOIN bb_m m ON m.rnk = i.rnk
       |  WHERE i.rnk < $nm),
       |bb_tok AS (SELECT w, s FROM bb_it WHERE rnk = $nm),
       |bb_wtok AS (SELECT doc_id, w, ord FROM (
       |              SELECT doc_id, unnest(ws) AS w,
       |                     generate_subscripts(ws, 1) AS ord
       |              FROM bb_pre)),
       |bb_doctok AS (SELECT p.doc_id,
       |                string_agg(trim(t.s, '$D'), '$D' ORDER BY p.ord) AS alltok
       |              FROM bb_wtok p JOIN bb_tok t USING (w) GROUP BY 1)""".stripMargin
  }

  /** Byte-level token → GPT-2-convention id: single mapped char inverts
    * the byte map (ASCII projection), merge outputs join the VALUES list.
    * `tok` / `tid` reference columns of the embedding query. */
  val BB_ID_CASE: String =
    s"""CASE WHEN length(token) = 1 THEN
       |       CASE WHEN unicode(token) BETWEEN 33 AND 126 THEN unicode(token)
       |            WHEN unicode(token) = 289 THEN 127
       |            ELSE unicode(token) - 256 END
       |     ELSE tid END""".stripMargin.replace("\n", " ")

  private val EnStop = TextOps.StopwordLists.toMap.apply("en")
  private def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")

  /** English stopword-hit ratio (with multiplicity), 0.0 for empty docs —
    * parametric on the string expression so the extraction-composed
    * queries reuse the exact arithmetic. */
  def swRatioSql(e: String): String =
    s"CASE WHEN len(${toksSql(e)}) = 0 THEN 0.0 ELSE " +
      s"CAST(len(list_filter(${toksSql(e)}, t -> list_contains(${inList(EnStop)}, t))) AS DOUBLE)" +
      s" / len(${toksSql(e)}) END"

  val SW_RATIO = swRatioSql("text")

  /** Punctuation char ratio. */
  val PUNCT_RATIO =
    "CASE WHEN length(text) = 0 THEN 0.0 ELSE " +
      "CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)" +
      " / length(text) END"

  private def hitOf(toksE: String, ws: Seq[String]) =
    s"len(list_filter($toksE, t -> list_contains(${inList(ws)}, t)))"
  private def hit(ws: Seq[String]) = hitOf(TOKS, ws)

  /** Parametric language-ID (winner by score desc, language asc) over an
    * arbitrary string expression — same fold as LANG_PRED/LANG_SCORE. */
  def langScoreSql(e: String): String = TextOps.StopwordLists
    .map { case (_, ws) => hitOf(toksSql(e), ws) }
    .reduce((a, b) => s"greatest($a, $b)")
  def langPredSql(e: String): String = {
    val sc = langScoreSql(e)
    val cases = TextOps.StopwordLists.map { case (l, ws) =>
      s"WHEN ${hitOf(toksSql(e), ws)} = $sc THEN '$l'"
    }
    s"CASE ${cases.mkString(" ")} END"
  }

  /** Quality-classifier features (mirror QualityModelOps.features exactly —
    * guarded single divisions of the same integer counts). */
  private val WsRe = "regexp_extract_all(text, '\\S+')"
  private val BpeRe = "regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')"
  val F_LEN = s"least(len($TOKS) / 100.0, 1.0)"
  val F_SYM = s"CASE WHEN len($BpeRe) = 0 THEN 0.0 " +
    s"ELSE CAST(len($WsRe) AS DOUBLE) / len($BpeRe) END"
  val F_WLEN = s"least(CASE WHEN len($WsRe) = 0 THEN 0.0 " +
    s"ELSE CAST(length(text) AS DOUBLE) / (len($WsRe) * 10.0) END, 1.0)"

  /** Winner-by-(score desc, lang asc): same left fold as TextOps.langId. */
  val LANG_SCORE: String = TextOps.StopwordLists.map { case (_, ws) => hit(ws) }
    .reduce((a, b) => s"greatest($a, $b)")

  val LANG_PRED: String = {
    val cases = TextOps.StopwordLists.map { case (l, ws) =>
      s"WHEN ${hit(ws)} = $LANG_SCORE THEN '$l'"
    }
    s"CASE ${cases.mkString(" ")} END"
  }
}
