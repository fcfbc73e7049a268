package graft.tools

import org.apache.spark.sql.SparkSession

/** The scale self-check as ONE command (VERDICT r9 #6 — the hand-run README
  * 10×/100× table, automated and turned into a gate): GenScale the source
  * dir by `factor`, run the representative query subset at both scales in
  * one JVM, print the ratio table, and exit NONZERO if any query's wall
  * ratio exceeds the data factor — the invariant that caught the r9
  * quadratic-banding bug (a linear-work operator may amortize fixed costs,
  * so ratio ≤ factor; a super-linear one blows past it at 10×).
  *
  * The subset covers every operator family whose work scales with the
  * three GenScale-replicated tables (events/documents/embeddings): engine
  * write/stream/retention lifecycles, tsdb transforms, text analysis,
  * shingle/fingerprint dedup + clustering, packing, ANN. Embedding
  * pair-THRESHOLD queries are excluded by design: their output grows
  * ~factor² on this data (cross-replica cosine physics — GenScale scaladoc),
  * which would gate on the data, not the operator.
  *
  * Usage: runMain graft.tools.ScaleBench [sfDir] [factor] [query...]
  */
object ScaleBench {

  val DefaultSubset: Seq[String] = Seq(
    "engine_retention", "tsdb_sessionize", "text_vocab", "text_top_terms",
    "tsdb_difference", "dedup_ngram_jaccard_capped", "engine_reflector",
    "engine_rollup_two_fields", "dedup_minhash_lsh", "pipeline_pack",
    "text_stats", "engine_stream_ingest", "ann_topk", "dedup_simhash",
    "dedup_clusters_star", "engine_stream_rollup",
    // round-10 additions: value-space anomaly (work ∝ points, output ∝
    // outliers), engagement windows (bounded fan-out, bounded output),
    // cube rollup (one Expand, output = grouping-set cells). The
    // stream-stream interval join is EXCLUDED like the pair-threshold
    // queries: its output is clicks × window-density, which grows ~factor²
    // on replicated data and would gate on the data, not the operator.
    "tsdb_anomaly", "events_active_users", "events_rollup_cube",
    // later-round-10 additions: the composed corpus build (its LSH pair
    // stage rides the skew-immune contraction, so replicated docs must NOT
    // go quadratic — exactly what this gate checks), bounded-state
    // cardinality sketch, bounded-prefix path mining, shared-pass
    // multi-query retrieval, LTTB downsample.
    "pipeline_curate", "events_distinct_kmv", "events_top_paths",
    "text_bm25_multi", "tsdb_downsample_lttb",
    // this-round additions: incremental dedup (work ∝ increment + touched
    // postings — replicated docs must stay linear through the rep
    // contraction), streaming funnel (state ∝ users, output ∝ reach
    // facts), value-index pruned read (index build ∝ buckets, read ∝
    // admitted buckets). q_bloom_semijoin reads orders/customer, which
    // GenScale does not replicate — excluded, its scale gate is the spec's
    // measured fp ratio.
    "dedup_incremental", "engine_stream_funnel", "engine_value_prune",
    // one-scan multi-series windows (output ∝ series × windows, both grow
    // at most linearly in data) and ViT patch rows (output ∝ documents)
    "engine_window_all_series", "mm_patches",
    // round-12 additions: IVF-PQ ANN (assignment/encode ∝ corpus, refine
    // output-sized) and pHash dedup (decode+DCT map pass; pair output ∝
    // planted companions, which GenScale replicates linearly)
    "ann_ivf_pq", "dedup_phash", "mm_phash", "mm_decode_jpeg",
    "mm_decode_jpeg_rgb", "mm_video_frames",
    // late-r12 codec faces, all map-only typed passes (work ∝ documents):
    // real GIF LZW, IMA ADPCM state machine, µ-law expansion, lossy resize
    "mm_decode_gif", "mm_decode_adpcm", "mm_decode_ulaw", "mm_resize_jpeg",
    "mm_video_patches",
    // round-11 additions: real-BPE token stats (work ∝ tokens, the merge
    // loop amortizes over distinct words per task), composed IVF×int8 ANN
    // (scan ∝ probed-list occupancy), streaming incremental dedup (work ∝
    // increment per epoch — the replicated-corpus linearity this gate
    // checks end-to-end through foreachBatch), color-PNG decode (map-only)
    "text_tokens_bpe", "ann_ivf_quantized", "engine_stream_incremental",
    "mm_decode_png_rgb",
    // PCA coarse-rank + re-rank: projection is map-side, candidates
    // bounded at rerank × queries; zoom: one count + one aggregation
    "ann_pca", "engine_zoom",
    // distributed BPE training: ONE corpus-scale histogram pass, then 48
    // vocab-scale rounds — wall is iteration-count dominated, so 10× data
    // should cost well under 10× wall (the whole point of training on the
    // histogram instead of the corpus)
    "text_bpe_train",
    // span-level substring dedup: window hashes shuffle linearly; GenScale
    // replicas share every window (posting lists ∝ replication), so the
    // duplicate-set join-back must stay ∝ occurrences, never pairs —
    // exactly the quadratic trap this gate exists to catch
    "dedup_substring",
    // LM scoring: counts ∝ vocabulary, stream ∝ tokens — both linear;
    // quality classifier: iteration-dominated (fixed GD rounds over a
    // 50-byte/doc projection), so wall should grow well under the data
    // factor; sharding: map-side assignment + per-shard windows
    "text_lm_score", "text_quality_model", "pipeline_shard",
    // span decontamination: broadcast eval probe, corpus streams map-side;
    // backoff LM: same linear stream/count shapes as text_lm_score with
    // trigram tables
    "dedup_contamination_spans", "text_lm_backoff",
    // DSIR: two vocabulary-scale models over one token-linear stream;
    // engine_count: the listing-fix regression gate (pruned single-series
    // reads must stay horizon-independent — this was 23.6× before the
    // per-series bucket-path read landed)
    "text_dsir_weight", "engine_count",
    // incremental substring dedup: per-batch cost must scale with the
    // increment (corpus enters as one index read)
    "dedup_substring_incremental",
    // winnow sketching: two row-local HOFs, work ∝ tokens (the PAIRS query
    // is excluded like the other pair-threshold queries — replicas make
    // its OUTPUT quadratic); masked packing: map-side bin intersection
    // after the pack cumsum, output ∝ docs + straddles
    "dedup_winnow", "pipeline_pack_masked",
    // pipeline_pack_tokens re-joined the gate in r13: the doc-level slot
    // join (explode AFTER the pack join, not before) took it from 12.7 s
    // to 4.7 s at 10× data (ratio 2.2) even though GenScale's replica
    // token prefix ('z??q') rarely merges and the OUTPUT grows ~29× for
    // 10× data — comfortably inside the wall gate now
    "pipeline_pack_tokens",
    // round-13 additions: 4:2:0 JPEG + 16-bit/Adam7 PNG (map-only typed
    // codec passes, work ∝ documents), the all-series zoom dispatch (one
    // count pre-pass + one conditional-key aggregation), and containment
    // pairs (rides the df-capped pair core exactly like
    // dedup_ngram_jaccard_capped — replica-shared shingles exceed the cap
    // and drop before pairing, so the join stays linear)
    "mm_decode_jpeg_420", "mm_decode_png16", "engine_zoom_all_series",
    "dedup_containment",
    // video temporal dedup: the phash stage is a map-only decode pass and
    // companion planting replicates linearly with the docs (GenScale
    // replica texts carry distinct prefixes, so cross-replica frames never
    // hash-collide; identical-text groups replicate as disjoint groups)
    "mm_video_phash", "dedup_video",
    // audio fingerprint dedup: map-only DFT pass; polarity companions
    // replicate linearly with the docs
    "mm_audio_fp", "dedup_audio",
    // the composed multimodal corpus build: four pair pipelines (each
    // individually gated above) + id-level joins, drop sets duplicate-scale
    "dedup_multimodal",
    // round-14 additions: progressive JPEG + 16-bit truecolor PNG (map-only
    // typed codec passes, work ∝ documents; the GIF face above now also
    // carries interlace/LCT variants through the same map pass)
    "mm_decode_jpeg_prog", "mm_decode_png16_rgb", "mm_decode_jpeg_422",
    "mm_decode_jpeg_411", "mm_decode_jpeg_prog_rgb", "mm_gif_frames", "mm_audio_resample", "mm_resize_bilinear",
    // OPQ rotation is a map-side 64-dot pass per row; assignment ∀ corpus,
    // refine output-sized — same linear shape as ann_ivf_pq
    "ann_opq_pq",
    // streaming asset ingest: stateless map over the file stream — decode
    // work ∝ landed assets, fixed two-drain lifecycle amortizes
    "mm_stream_decode",
    // animated-GIF temporal dedup: lossless frame-hash map pass + the
    // df-capped containment core (splash-frame skew head planted)
    "dedup_gif",
    // round-15 additions: byte-level BPE tokenize (map pass, merge loop
    // amortized over distinct pre-tokens per task) and train (histogram
    // sufficient statistic → driver merges, like text_bpe_train); HTML
    // extraction (map-side regex/HOF string ops, work ∝ markup bytes);
    // FLAC + TIFF decode (map-only typed codec passes, work ∝ documents)
    "text_tokens_bpe_bytes", "text_bpe_train_bytes", "text_extract_html",
    "mm_decode_flac", "mm_decode_flac_stereo", "mm_decode_tiff",
    "mm_tiff_pages",
    // line-level corpus dedup: one hash-keyed count + join-back, 8-byte
    // keys only (GenScale replicas duplicate whole docs, so line posting
    // lists grow with replication — the join-back must stay ∝ occurrences);
    // the markup→curation composition is the extract map pass + per-row rules
    "dedup_lines", "text_extract_filter",
    // incremental line dedup: per-batch cost ∝ increment; the corpus
    // enters as one bloom-pruned index read (staged once per epoch)
    "dedup_lines_incremental",
    // gzip ingestion: one typed decompress map pass, work ∝ compressed bytes
    "text_from_gzip",
    // the composed web-curation pipeline: gunzip/extract/filter map stages
    // + ONE corpus-wide line count over the survivors
    "pipeline_curate_web",
    // late-r15 additions — container walks are typed map passes (work ∝
    // payload bytes): WARC record walk over gzip members (batch +
    // streaming faces), ustar walk, and the WARC-fed curation composition
    "text_from_warc", "text_stream_warc", "text_from_tar",
    "pipeline_curate_warc",
    // map-side regex/HOF curation rules: PII scrub, Gopher heuristics,
    // lexicon blocklist, URL parse — all per-row compute, zero state
    "text_pii_redact", "text_gopher_rules", "text_blocklist_filter",
    "text_url_parse",
    // per-domain quota: the salted two-stage top-Q — GenScale replicas
    // re-derive domains from fresh ids (same skewed distribution), and no
    // window task ever sees a whole domain, so wall must stay ∝ docs
    "pipeline_domain_quota",
    // LPC-FLAC and AIFF decode: map-only typed codec passes
    "mm_decode_flac_lpc", "mm_decode_aiff",
    // the crawl→train capstone: transport + curation map stages, ONE
    // corpus-wide line count, then the chunked pack cumsum — every stage
    // individually linear, the composition must stay so
    "pipeline_build_train",
    // final-r15 additions: MP3 header walk (never reads payload bodies),
    // netpbm decode, CSV/JSONL parses (typed map passes), the unlabeled
    // mixed-corpus sniff+dispatch, Kneser-Ney scoring (vocabulary-scale
    // count tables + three hash joins over the bigram stream — the
    // lmScore shape plus one join), and DSIR resampling (the weight pass
    // + one scalar max + a map-side verdict)
    "mm_mp3_scan", "mm_decode_pnm", "text_from_csv", "text_from_jsonl",
    "mm_detect_format", "text_lm_kneser_ney", "pipeline_dsir_sample",
    // trainer-feed formatting (map-side after tokenize), the chunked
    // token-budget cut (pack cumsum as ONE group), contrastive mining
    // (LSH positives — individually gated — + chunk-bounded negative
    // windows), winsorization (quantile tables broadcast, clamp
    // map-side) and histogram equalization (decode-fused map pass)
    "pipeline_sft_pack", "pipeline_fim_pack", "pipeline_token_budget",
    "pipeline_contrastive_pairs", "tsdb_winsorize", "mm_hist_equalize",
    // matryoshka recall: two truncated exact scans + the full exact scan,
    // all the ann_topk shape (broadcast queries × corpus)
    "ann_matryoshka",
    // round-16 additions — all typed map passes or already-gated shapes:
    // zstd decode (FSE/Huffman work ∝ compressed bytes), the .tar.zst
    // walk, WET conversion-record walk, unicode normalization (map-side
    // replace chain + NFC with the isNormalized fast path),
    // canonicalization (map-side regex/HOFs), trained language-ID
    // (bounded-sample train + broadcast-weights argmax scoring), unigram
    // Viterbi (merge-memo map pass like text_tokens_bpe), mel filterbank
    // (the mm_audio_fp DFT pass + an integer weight fold)
    "text_from_zstd", "text_from_tar_zst", "text_from_wet",
    "text_normalize", "text_url_canonical", "text_langid_model",
    "text_tokens_unigram", "mm_audio_mel",
    // r16 second half: MFCC (the mel pass + a log/DCT fold),
    // CCNet buckets (the KN scoring joins + a histogram-scale window +
    // broadcast threshold join), streaming zstd (stateless decode map
    // under the file-source/checkpoint lifecycle)
    "mm_audio_mfcc", "text_ccnet_buckets", "text_stream_zstd",
    // VAD (one typed map, the mel pass + a per-asset scan), robots (pure
    // map-side parse+match per row)
    "mm_audio_vad", "text_robots_rules",
    // CDC (map-side chunking + two partial aggs keyed by chunk identity),
    // PageRank (5 Pregel-style join+agg exchanges over a pinned edge list),
    // minhash quality (bounded sample — constant work at any corpus size)
    "text_cdc_chunks", "pipeline_pagerank", "dedup_minhash_quality",
    // blur detection (typed-map codec pass + per-asset integer moments)
    "mm_image_blur",
    // epoch shuffle (bucketed windows + broadcast offsets — no global sort)
    "pipeline_shuffle",
    // image curation filter (one typed decode pass + integer rule chain),
    // tokenizer fertility (map-side BPE + language-cardinality agg)
    "mm_image_filter", "text_bpe_fertility",
    // pack stats (pack cumsum + source-cardinality agg)
    "pipeline_pack_stats",
    // corpus diff (map-side fingerprints + one full-outer id join)
    "pipeline_corpus_diff",
    // simhash quality (bounded sample — constant work at any corpus size)
    "dedup_simhash_quality",
    // dataset card (one corpus fold + one fingerprint-distinct)
    "pipeline_dataset_card",
    // cepstral deltas (typed decode map, one row per asset)
    "mm_audio_deltas",
    // vision curation capstone (decode map -> filter -> banded pHash dedup)
    "pipeline_curate_images",
    // audio curation capstone (decode map -> silence filter -> fp dedup)
    "pipeline_curate_audio",
    // exact-K sample (TakeOrderedAndProject — per-partition heads only)
    "pipeline_sample_k",
    // video curation capstone (one decode+hash pass -> filter -> dedup)
    "pipeline_curate_video",
    // r17 additions: charset sniff+transcode (typed map over raw HTTP
    // bodies), eTLD+1 extraction (codegen'd isin chain, map-side),
    // MP4 box walk + EXIF APP1 walk (metadata-only typed maps),
    // WebP-VP8L decode (bit-level map pass), WAT link ingestion
    // (record walk + native from_json + the pinned Pregel rounds)
    "text_charset", "text_etld", "mm_mp4_scan", "mm_exif",
    "mm_decode_webp", "pipeline_pagerank_wat",
    // frontier capstone (canonicalize -> eTLD+1 -> robots -> quota: one
    // pinned map pass + the salted two-stage quota windows)
    "pipeline_frontier")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val subset = if (args.length > 2) args.drop(2).toSeq else DefaultSubset
    val unknown = subset.toSet.diff(graft.SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val scaled = s"/tmp/graft-scalebench-x$factor"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      GenScale.generate(spark, src, scaled, factor)

      def run(name: String, dir: String): Double = {
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // warm-up (untimed): session/codegen/parquet-reader init, and the
      // shared engine fixture for each dir (engine_count builds it)
      Seq(src, scaled).foreach { d =>
        try run("engine_count", d) catch { case _: Throwable => () }
      }
      val rows = subset.map { name =>
        val base = run(name, src)
        val big = run(name, scaled)
        val ratio = big / base
        println(f"$name%-28s base=$base%7.2fs x$factor=$big%8.2fs ratio=$ratio%6.2f" +
          (if (ratio > factor) "  <-- SUPER-LINEAR" else ""))
        (name, base, big, ratio)
      }
      val baseTot = rows.map(_._2).sum
      val bigTot = rows.map(_._3).sum
      println(f"TOTAL base=$baseTot%.1fs x$factor=$bigTot%.1fs " +
        f"ratio=${bigTot / baseTot}%.2f (data factor $factor)")
      val offenders = rows.filter(_._4 > factor)
      if (offenders.nonEmpty) {
        System.err.println("SCALE REGRESSION: wall ratio exceeded the data factor for: " +
          offenders.map(r => f"${r._1} (${r._4}%.1f×)").mkString(", "))
        spark.stop()
        sys.exit(1)
      }
    } finally {
      // the scaled dir is large (factor × sf); never leave it behind
      try {
        val root = java.nio.file.Paths.get(scaled)
        if (java.nio.file.Files.isDirectory(root)) {
          val walk = java.nio.file.Files.walk(root)
          try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
          finally walk.close()
        }
      } catch { case _: Exception => () }
    }
    spark.stop()
  }
}
