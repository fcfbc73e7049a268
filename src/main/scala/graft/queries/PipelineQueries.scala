package graft.queries

import org.apache.spark.sql.functions._
import graft.tables.Tables

/** LLM-training-data pipeline operators over `documents` / `embeddings`
  * (BASELINE.json north star: dedup, similarity search, multimodal, text
  * analysis). Grows as operators land; each is a QueryDef with a DuckDB
  * oracle whenever the computation is portable SQL. */
object PipelineQueries {

  val defs: Seq[QueryDef] = Seq(

    // Exact deduplication: hash-groupBy on content; keep the lowest doc_id
    // (at sf0.1 documents has real duplicate texts). Scale note: grouping on
    // sha2(text) shuffles 32-byte keys instead of the full document corpus —
    // at 100 TB that is the difference between shuffling hashes and shuffling
    // 100 TB of text through the exchange.
    QueryDef.withOracle("dedup_exact",
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(sha2(col("text"), 256).as("text_hash"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    },

    // Salted two-stage variant of exact dedup — the skew-defense shape for
    // hot keys (boilerplate documents duplicated millions of times land on
    // ONE reducer under plain groupBy). Stage 1 spreads each hash over 16
    // deterministic salts; stage 2 merges 16 partials per key. For algebraic
    // aggregates (min/count) Spark's map-side partial aggregation already
    // bounds the damage — this registered query demonstrates the pattern
    // that holistic per-key state (collect_set, exact distinct) and skewed
    // joins need, with identical results to dedup_exact.
    QueryDef.withOracle("dedup_exact_salted",
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("text_hash", sha2(col("text"), 256))
        .withColumn("salt", pmod(col("doc_id"), lit(16)))
        .groupBy("text_hash", "salt")
        .agg(min("doc_id").as("m"), count(lit(1)).as("c"))
        .groupBy("text_hash")
        .agg(min("m").as("keep_id"), sum("c").as("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    }
  )
}
