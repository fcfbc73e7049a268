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
    }
  )
}
