package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps
import graft.tables.Tables

/** Similarity search over the `embeddings` table: exact brute-force top-k
  * (oracled), the LSH-bucketed approximate path (rows-only — approximate by
  * design), and a recall@k measurement of the latter against the former. */
object SimilarityQueries {

  import OracleVec.{NORMED, dotSql}

  private val K = 5
  /** Query set: the first 10 vectors. */
  private val NQ = 10

  val defs: Seq[QueryDef] = Seq(

    // Exact cosine top-5 for 10 query vectors: broadcast queries x corpus,
    // rank by (cosine desc, id). The correctness baseline for ANN.
    QueryDef.withOracle("ann_topk",
      s"""WITH $NORMED,
         |q AS (SELECT * FROM n WHERE vec_id < $NQ),
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |             ${dotSql("q", "c")} / (q.nrm * c.nrm) AS cosine
         |           FROM n c, q WHERE q.vec_id <> c.vec_id),
         |r AS (SELECT query_id, neighbor_id, cosine,
         |        CAST(row_number() OVER (PARTITION BY query_id
         |          ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS "rank"
         |      FROM scored)
         |SELECT query_id, "rank", neighbor_id, cosine FROM r
         |WHERE "rank" <= $K ORDER BY query_id, "rank"""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      SimilarityOps.topKExact(emb, emb.filter(col("vec_id") < NQ),
        "vec_id", "embedding", K)
    },

    // LSH-bucketed approximate top-5 (4 tables x 4 sign-bits): the corpus is
    // probed per-bucket instead of scanned. Approximate -> rows-only check;
    // its quality is measured by ann_recall below.
    QueryDef.rowsOnly("ann_lsh") { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      SimilarityOps.topKLsh(emb, emb.filter(col("vec_id") < NQ),
        "vec_id", "embedding", K, tables = 4, bits = 4)
    },

    // IVF-bucketed approximate top-5 (16 lists, 4 probed): sample-trained
    // coarse quantizer, corpus scanned at ~nProbe/nLists cost per query.
    QueryDef.rowsOnly("ann_ivf") { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      SimilarityOps.topKIvf(emb, emb.filter(col("vec_id") < NQ),
        "vec_id", "embedding", K, nLists = 16, nProbe = 4)
    },

    // recall@5 of each approximate path vs ann_topk — one row per method.
    // NOTE: the synthetic embeddings are near-uniform random (max pair
    // cosine ~0.5) — the hardest possible case for ANN — so recall here is
    // a floor, not a ceiling.
    QueryDef.rowsOnly("ann_recall") { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < NQ)
      val exact = SimilarityOps.topKExact(emb, q, "vec_id", "embedding", K)
      SimilarityOps.recallAtK(exact,
          SimilarityOps.topKLsh(emb, q, "vec_id", "embedding", K, tables = 4, bits = 4))
        .withColumn("method", lit("lsh"))
        .unionByName(
          SimilarityOps.recallAtK(exact,
            SimilarityOps.topKIvf(emb, q, "vec_id", "embedding", K, nLists = 16, nProbe = 4))
          .withColumn("method", lit("ivf")))
        .select("method", "n_exact", "n_found", "recall")
    }
  )
}
