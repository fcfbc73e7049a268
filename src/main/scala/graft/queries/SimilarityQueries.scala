package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, SimilarityOps}
import graft.tables.Tables

/** Similarity search over the `embeddings` table — exact brute-force
  * top-k, multi-probe LSH, IVF, corpus clustering, and the recall@k
  * measurement, ALL fully oracled: the LSH planes are deterministic
  * literals and the trained quantizers are persisted to parquet, so the
  * DuckDB SQL replays every bucketing, candidate set, ranking and the
  * recall arithmetic bit-for-bit (exhaustive-probe == exact is additionally
  * proved in PipelineOpsSpec). */
object SimilarityQueries {

  import OracleVec.{NORMED, dotSql}

  private val K = 5
  /** Query set: the first 10 vectors. */
  private val NQ = 10
  private val TABLES = 4
  private val BITS = 4
  private val DIM = 64
  /** Hamming-2 multi-probe: 1 + bits + C(bits,2) buckets probed per table —
    * the fan-out multiplies only the QUERY side; measured recall@5 = 1.0 at
    * sf0.1 (0.88 at radius 1). */
  private val PROBE_RADIUS = 2
  /** 12 of 16 lists probed: recall@5 = 1.0 at sf0.1 (0.90 at nProbe 8). The
    * synthetic embeddings are near-uniform random — ANN's hardest case — so
    * a realistic corpus reaches the same recall at far lower probe cost. */
  private val NPROBE = 12

  /** Where ann_ivf persists its trained quantizer for the oracle to replay
    * (same machine for Verify and the driver's DuckDB run; the query writes
    * it before any oracle executes, and the oracle SQL embedding the path is
    * dumped by the SAME JVM). PID-scoped: concurrent Verify/bench processes
    * must not clobber each other's quantizer between write and replay. */
  private val Pid = ProcessHandle.current().pid()
  private val CentroidsPath = new java.io.File(
    sys.props("java.io.tmpdir"), s"graft-ivf-centroids-$Pid.parquet").getAbsolutePath
  private val ClusterCentroidsPath = new java.io.File(
    sys.props("java.io.tmpdir"), s"graft-cluster-centroids-$Pid.parquet").getAbsolutePath
  private val IvfqCentroidsPath = new java.io.File(
    sys.props("java.io.tmpdir"), s"graft-ivfq-centroids-$Pid.parquet").getAbsolutePath
  private val PcaPath = new java.io.File(
    sys.props("java.io.tmpdir"), s"graft-pca-centroids-$Pid.parquet").getAbsolutePath
  private val IvfPqCentroidsPath = new java.io.File(
    sys.props("java.io.tmpdir"), s"graft-ivfpq-centroids-$Pid.parquet").getAbsolutePath
  private val PqCodebooksPath = new java.io.File(
    sys.props("java.io.tmpdir"), s"graft-pqcb-centroids-$Pid.parquet").getAbsolutePath
  private val SemCentroidsPath = new java.io.File(
    sys.props("java.io.tmpdir"), s"graft-sem-centroids-$Pid.parquet").getAbsolutePath
  private val OpqCentroidsPath = new java.io.File(
    sys.props("java.io.tmpdir"), s"graft-opqc-centroids-$Pid.parquet").getAbsolutePath
  private val OpqCodebooksPath = new java.io.File(
    sys.props("java.io.tmpdir"), s"graft-opqcb-centroids-$Pid.parquet").getAbsolutePath
  private val OpqRotationPath = new java.io.File(
    sys.props("java.io.tmpdir"), s"graft-opqrot-centroids-$Pid.parquet").getAbsolutePath
  /** PQ geometry: 64 dims → 8 subspaces × 16 codewords (4-bit codes). */
  private val PQ_M = 8
  private val PQ_KS = 16
  /** Exact-cosine refine window over the coarse ADC order. */
  private val PQ_RERANK = 150
  // PID-scoped dirs would otherwise accumulate one pair per process across
  // CI/bench runs. They must OUTLIVE this JVM (the oracle's DuckDB replay
  // runs after Verify exits), so exit-time cleanup is wrong — instead each
  // startup reaps dirs left by processes that are no longer alive AND old
  // enough that no pending replay can still need them: the driver's DuckDB
  // pass runs minutes after its Verify JVM exits, so a dead PID alone does
  // not mean the dir is garbage (a new run starting in that window would
  // otherwise delete centroids the pending replay is about to read).
  locally {
    val re = """graft-(?:ivf|ivfq|ivfpq|pqcb|cluster|pca|sem|opqc|opqcb|opqrot)-centroids-(\d+)\.parquet""".r
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    Option(tmp.listFiles()).toSeq.flatten.foreach { f =>
      f.getName match {
        case re(pid) if pid.toLong != Pid &&
            !ProcessHandle.of(pid.toLong).map[Boolean](_.isAlive).orElse(false) &&
            f.lastModified() < cutoff =>
          Option(f.listFiles()).toSeq.flatten.foreach(_.delete())
          f.delete(): Unit
        case _ => ()
      }
    }
  }

  /** The LSH hyperplanes as a DuckDB VALUES list — the same literals the
    * Spark plan bakes in (SimilarityOps.planes), Double.toString round-trips
    * exactly. */
  private def planesSql: String =
    (0 until TABLES).flatMap { t =>
      SimilarityOps.planes(t, BITS, DIM).zipWithIndex.map { case (p, j) =>
        s"($t, $j, [${p.mkString(", ")}]::DOUBLE[])"
      }
    }.mkString(",\n    ")

  /** Fold dot of a vector column `v` against a plane column `p` — the same
    * strict left fold as the Spark side. */
  private def planeDot(v: String, p: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($v) + 1), i -> $v[i] * $p[i])), (s, x) -> s + x)"

  // --- shared CTE chains, each ending in <path>_r(query_id, neighbor_id,
  // cosine, rk) — the per-path oracles select their top-k from them, and
  // the ann_recall oracle composes all three ---

  private def exactCtes: String =
    s"""exq AS (SELECT * FROM n WHERE vec_id < $NQ),
       |ex_s AS (SELECT exq.vec_id AS query_id, c.vec_id AS neighbor_id,
       |           ${dotSql("exq", "c")} / (exq.nrm * c.nrm) AS cosine
       |         FROM n c, exq WHERE exq.vec_id <> c.vec_id),
       |ex_r AS (SELECT query_id, neighbor_id, cosine,
       |           CAST(row_number() OVER (PARTITION BY query_id
       |             ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rk
       |         FROM ex_s)""".stripMargin

  private def lshCtes: String =
    s"""planes(t, j, p) AS (VALUES
       |    $planesSql),
       |cb AS (SELECT n.vec_id, pl.t,
       |         CAST(sum(CASE WHEN ${planeDot("n.v", "pl.p")} > 0
       |           THEN CAST(1 << pl.j AS BIGINT) ELSE 0 END) AS BIGINT) AS b
       |       FROM n, planes pl GROUP BY 1, 2),
       |qp AS (SELECT vec_id, t, b FROM cb WHERE vec_id < $NQ
       |       UNION
       |       SELECT vec_id, t, xor(b, CAST(1 << j AS BIGINT))
       |       FROM cb, range($BITS) r(j) WHERE vec_id < $NQ
       |       UNION
       |       SELECT vec_id, t,
       |         xor(b, CAST((1 << j) | (1 << j2) AS BIGINT))
       |       FROM cb, range($BITS) r(j), range($BITS) r2(j2)
       |       WHERE j2 > j AND vec_id < $NQ),
       |lcand AS (SELECT DISTINCT qp.vec_id AS query_id, c.vec_id AS neighbor_id
       |          FROM qp JOIN cb c ON c.t = qp.t AND c.b = qp.b
       |          WHERE c.vec_id <> qp.vec_id),
       |lsh_s AS (SELECT lcand.query_id, lcand.neighbor_id,
       |            ${dotSql("q", "c")} / (q.nrm * c.nrm) AS cosine
       |          FROM lcand JOIN n q ON q.vec_id = lcand.query_id
       |                    JOIN n c ON c.vec_id = lcand.neighbor_id),
       |lsh_r AS (SELECT query_id, neighbor_id, cosine,
       |            CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rk
       |          FROM lsh_s)""".stripMargin

  private def ivfCtes: String = {
    def c2 = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      "list_transform(cents.c, x -> x * x)), (s, x) -> s + x)"
    def vc = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      "list_transform(range(1, len(n.v) + 1), i -> n.v[i] * cents.c[i])), (s, x) -> s + x)"
    s"""cents AS (SELECT list_id, list_transform(c, x -> CAST(x AS DOUBLE)) AS c
       |          FROM read_parquet('$CentroidsPath/*.parquet')),
       |cd AS (SELECT n.vec_id, cents.list_id, $c2 - 2.0 * $vc AS d FROM n, cents),
       |cr AS (SELECT vec_id, list_id,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS crk
       |       FROM cd),
       |assign AS (SELECT vec_id, list_id FROM cr WHERE crk = 1),
       |probes AS (SELECT vec_id, list_id FROM cr WHERE crk <= $NPROBE AND vec_id < $NQ),
       |icand AS (SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
       |          FROM probes p JOIN assign a USING (list_id)
       |          WHERE a.vec_id <> p.vec_id),
       |ivf_s AS (SELECT icand.query_id, icand.neighbor_id,
       |            ${dotSql("q", "c")} / (q.nrm * c.nrm) AS cosine
       |          FROM icand JOIN n q ON q.vec_id = icand.query_id
       |                     JOIN n c ON c.vec_id = icand.neighbor_id),
       |ivf_r AS (SELECT query_id, neighbor_id, cosine,
       |            CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rk
       |          FROM ivf_s)""".stripMargin
  }

  /** Assignment/probing CTEs of an IVF quantizer persisted at `path`
    * (shared structure with `ivfCtes`, which additionally scores by
    * cosine; this one feeds the quantized scorer). */
  private def ivfAssignCtes(path: String): String = {
    def c2 = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      "list_transform(cents.c, x -> x * x)), (s, x) -> s + x)"
    def vc = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      "list_transform(range(1, len(n.v) + 1), i -> n.v[i] * cents.c[i])), (s, x) -> s + x)"
    s"""cents AS (SELECT list_id, list_transform(c, x -> CAST(x AS DOUBLE)) AS c
       |          FROM read_parquet('$path/*.parquet')),
       |cd AS (SELECT n.vec_id, cents.list_id, $c2 - 2.0 * $vc AS d FROM n, cents),
       |cr AS (SELECT vec_id, list_id,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS crk
       |       FROM cd),
       |assign AS (SELECT vec_id, list_id FROM cr WHERE crk = 1),
       |probes AS (SELECT vec_id, list_id FROM cr WHERE crk <= $NPROBE AND vec_id < $NQ)""".stripMargin
  }

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

    // MATRYOSHKA truncation recall (Kusupati et al. 2022 — the modern
    // serve-cheap trick: an MRL-trained embedding's PREFIX dims are
    // themselves a usable embedding, so search can run at half/quarter
    // width and 2-4× the throughput): exact top-5 over the first 32 and
    // first 16 of 64 dims, measured against the full-width exact top-5.
    // On these near-uniform random vectors prefix-truncation recall is
    // the WORST case (no MRL training concentrated information in the
    // prefix) — the measured value is the floor a real MRL model beats.
    // Every arithmetic step (slice, fold dot, rank, recall ratio) replays
    // exactly, so even this measurement face is hash-gated.
    QueryDef.withOracle("ann_matryoshka", {
      def truncCtes(d: Int): String =
        s"""t$d AS (SELECT vec_id, list_slice(v, 1, $d) AS v FROM e),
           |n$d AS (SELECT vec_id, v,
           |          sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |            list_transform(v, x -> x * x)), (s, x) -> s + x)) AS nrm
           |        FROM t$d),
           |q$d AS (SELECT * FROM n$d WHERE vec_id < $NQ),
           |s$d AS (SELECT q$d.vec_id AS query_id, c.vec_id AS neighbor_id,
           |          ${dotSql(s"q$d", "c")} / (q$d.nrm * c.nrm) AS cosine
           |        FROM n$d c, q$d WHERE q$d.vec_id <> c.vec_id),
           |r$d AS (SELECT query_id, neighbor_id,
           |          CAST(row_number() OVER (PARTITION BY query_id
           |            ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rk
           |        FROM s$d),
           |tk$d AS (SELECT query_id, neighbor_id FROM r$d WHERE rk <= $K)"""
          .stripMargin
      def row(d: Int): String =
        s"""SELECT 'matryoshka_$d' AS method,
           |  (SELECT count(*) FROM ex_tk) AS n_exact,
           |  (SELECT count(*) FROM ex_tk JOIN tk$d USING (query_id, neighbor_id)) AS n_found,
           |  CAST((SELECT count(*) FROM ex_tk JOIN tk$d USING (query_id, neighbor_id)) AS DOUBLE)
           |    / (SELECT count(*) FROM ex_tk) AS recall""".stripMargin
      s"""WITH $NORMED,
         |$exactCtes,
         |ex_tk AS (SELECT query_id, neighbor_id FROM ex_r WHERE rk <= $K),
         |${truncCtes(32)},
         |${truncCtes(16)}
         |SELECT * FROM (
         |${row(32)}
         |UNION ALL
         |${row(16)}
         |) ORDER BY method""".stripMargin
    }) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < NQ)
      val exact = SimilarityOps.topKExact(emb, q, "vec_id", "embedding", K)
        .persist() // both recall branches probe it; materialize once
      exact.count()
      def tr(d: Int) = emb.select(col("vec_id"),
        slice(col("embedding"), 1, d).as("embedding"))
      def row(d: Int) = SimilarityOps.recallAtK(exact,
          SimilarityOps.topKExact(tr(d), tr(d).filter(col("vec_id") < NQ),
            "vec_id", "embedding", K))
        .withColumn("method", lit(s"matryoshka_$d"))
      // eager 2-row materialization so the pinned exact table can be
      // dropped before the result leaves the closure (no leaked blocks)
      val out = row(32).unionAll(row(16))
        .select(col("method"), col("n_exact"), col("n_found"), col("recall"))
        .orderBy("method")
        .localCheckpoint()
      exact.unpersist()
      out
    },

    // INT8-QUANTIZED top-5 (SimilarityOps.topKQuantized): unit-normalize,
    // one global symmetric scale, clamp(floor(x/absmax*127 + 0.5)) per
    // component, integer-dot ranking — the 4×-compression scan that keeps
    // 100 TB of embeddings RAM-resident. Every step (IEEE divide, explicit
    // rounding, integer fold) replays in SQL, so this APPROXIMATE operator
    // hash-matches its oracle like LSH/IVF before it.
    QueryDef.withOracle("ann_quantized",
      s"""WITH $NORMED,
         |u AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS uv FROM n),
         |am AS (SELECT max(list_max(list_transform(uv, x -> abs(x)))) AS am FROM u),
         |qz AS (SELECT vec_id, list_transform(uv, x ->
         |         greatest(-127, least(127,
         |           CAST(floor(x / am.am * 127 + 0.5) AS INT)))) AS q
         |       FROM u, am),
         |qq AS (SELECT * FROM qz WHERE vec_id < $NQ),
         |scored AS (SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
         |             list_reduce(list_prepend(CAST(0 AS BIGINT),
         |               list_transform(range(1, len(qq.q) + 1),
         |                 i -> CAST(qq.q[i] AS BIGINT) * c.q[i])),
         |               (s, x) -> s + x) AS qdot
         |           FROM qz c, qq WHERE qq.vec_id <> c.vec_id),
         |r AS (SELECT query_id, neighbor_id, qdot,
         |        CAST(row_number() OVER (PARTITION BY query_id
         |          ORDER BY qdot DESC, neighbor_id) AS BIGINT) AS "rank"
         |      FROM scored)
         |SELECT query_id, "rank", neighbor_id, qdot FROM r WHERE "rank" <= $K
         |ORDER BY query_id, "rank"""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      SimilarityOps.topKQuantized(emb, emb.filter(col("vec_id") < NQ),
        "vec_id", "embedding", K)
    },

    // IVF × INT8 COMPOSED top-5 — the production 100 TB ANN shape: the
    // coarse quantizer prunes the scan to ~nProbe/nLists of the corpus AND
    // the scanned lists rank by the integer dot of 4×-compressed vectors
    // (neither half alone is the deployment form: IVF-with-float-scan
    // still holds full vectors in RAM, quantized-full-scan still reads
    // every row). Assignment replays from the persisted quantizer exactly
    // like ann_ivf; quantization replays like ann_quantized; so the
    // composed APPROXIMATE operator still hash-matches its oracle.
    QueryDef.withOracle("ann_ivf_quantized",
      s"""WITH $NORMED,
         |${ivfAssignCtes(IvfqCentroidsPath)},
         |u AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS uv FROM n),
         |am AS (SELECT max(list_max(list_transform(uv, x -> abs(x)))) AS am FROM u),
         |qz AS (SELECT vec_id, list_transform(uv, x ->
         |         greatest(-127, least(127,
         |           CAST(floor(x / am.am * 127 + 0.5) AS INT)))) AS q
         |       FROM u, am),
         |icand AS (SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
         |          FROM probes p JOIN assign a USING (list_id)
         |          WHERE a.vec_id <> p.vec_id),
         |scored AS (SELECT icand.query_id, icand.neighbor_id,
         |             list_reduce(list_prepend(CAST(0 AS BIGINT),
         |               list_transform(range(1, len(q1.q) + 1),
         |                 i -> CAST(q1.q[i] AS BIGINT) * q2.q[i])),
         |               (s, x) -> s + x) AS qdot
         |           FROM icand JOIN qz q1 ON q1.vec_id = icand.query_id
         |                      JOIN qz q2 ON q2.vec_id = icand.neighbor_id),
         |r AS (SELECT query_id, neighbor_id, qdot,
         |        CAST(row_number() OVER (PARTITION BY query_id
         |          ORDER BY qdot DESC, neighbor_id) AS BIGINT) AS rk
         |      FROM scored)
         |SELECT query_id, rk AS "rank", neighbor_id, qdot FROM r WHERE rk <= $K
         |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      SimilarityOps.topKIvfQuantized(emb, emb.filter(col("vec_id") < NQ),
        "vec_id", "embedding", K, nLists = 16, nProbe = NPROBE,
        centroidsOut = Some(IvfqCentroidsPath))
    },

    // IVF × PRODUCT-QUANTIZATION composed top-5 — the memory shape real
    // 100 TB deployments run (faiss IVFPQ + refine, by_residual=false/IP):
    // coarse quantizer prunes the scan to ~nProbe/nLists, inside probed
    // lists each vector is m=8 sub-space codeword ids from ks=16-entry
    // codebooks (≈4 BYTES per vector vs 64 for int8, 256 for floats), a
    // query's m×ks ADC table ranks candidates by a fixed-order chain of 8
    // lookups, and only the top-150 ADC candidates pay a full-dimension
    // exact cosine (the refine stage — 4-bit ADC alone measured recall
    // 0.12 on near-uniform vectors; refined it measures 0.92, spec-gated
    // >= 0.85).
    // Assignment replays from the persisted coarse quantizer like ann_ivf;
    // encoding, ADC and refine replay from the persisted codebooks — so
    // the doubly-approximate operator still hash-matches its oracle.
    QueryDef.withOracle("ann_ivf_pq", {
      val sub = DIM / PQ_M // components per subspace
      def cbc2 = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(cb.c, x -> x * x)), (s, x) -> s + x)"
      def subDot(vec: String) =
        s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          s"list_transform(range(1, $sub + 1), " +
          s"i -> $vec[cb.m * $sub + i] * cb.c[i])), (s, x) -> s + x)"
      // ADC score: the same left-to-right chain of 8 lookups as the Spark
      // side (flat LUT ordered by (m, j); entry (m, j) at m*ks + j + 1)
      val adcChain = (0 until PQ_M).map(ms =>
        s"l.lut[${ms * PQ_KS} + e.code[${ms + 1}] + 1]").mkString(" + ")
      s"""WITH $NORMED,
         |${ivfAssignCtes(IvfPqCentroidsPath)},
         |cbk AS (SELECT m, j, list_transform(c, x -> CAST(x AS DOUBLE)) AS c
         |        FROM read_parquet('$PqCodebooksPath/*.parquet')),
         |u AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS uv FROM n),
         |ed AS (SELECT u.vec_id, cb.m, cb.j,
         |         $cbc2 - 2.0 * ${subDot("u.uv")} AS d
         |       FROM u, cbk cb),
         |enc AS (SELECT vec_id, list(j ORDER BY m) AS code FROM (
         |          SELECT vec_id, m, j,
         |            row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rk
         |          FROM ed) WHERE rk = 1 GROUP BY vec_id),
         |lt AS (SELECT u.vec_id, cb.m, cb.j, ${subDot("u.uv")} AS ip
         |       FROM u, cbk cb WHERE u.vec_id < $NQ),
         |lutl AS (SELECT vec_id, list(ip ORDER BY m, j) AS lut FROM lt GROUP BY 1),
         |icand AS (SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
         |          FROM probes p JOIN assign a USING (list_id)
         |          WHERE a.vec_id <> p.vec_id),
         |scored AS (SELECT icand.query_id, icand.neighbor_id,
         |             $adcChain AS adc
         |           FROM icand JOIN lutl l ON l.vec_id = icand.query_id
         |                      JOIN enc e ON e.vec_id = icand.neighbor_id),
         |cand AS (SELECT query_id, neighbor_id FROM (
         |           SELECT query_id, neighbor_id,
         |             row_number() OVER (PARTITION BY query_id
         |               ORDER BY adc DESC, neighbor_id) AS crk
         |           FROM scored) WHERE crk <= $PQ_RERANK),
         |rr AS (SELECT cand.query_id, cand.neighbor_id,
         |         ${dotSql("qn", "cn")} / (qn.nrm * cn.nrm) AS cosine
         |       FROM cand JOIN n qn ON qn.vec_id = cand.query_id
         |                 JOIN n cn ON cn.vec_id = cand.neighbor_id),
         |r AS (SELECT query_id, neighbor_id, cosine,
         |        CAST(row_number() OVER (PARTITION BY query_id
         |          ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rk
         |      FROM rr)
         |SELECT query_id, rk AS "rank", neighbor_id, cosine FROM r WHERE rk <= $K
         |ORDER BY query_id, rk""".stripMargin
    }) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      SimilarityOps.topKIvfPq(emb, emb.filter(col("vec_id") < NQ),
        "vec_id", "embedding", K, nLists = 16, nProbe = NPROBE,
        m = PQ_M, ks = PQ_KS, rerank = PQ_RERANK,
        centroidsOut = Some(IvfPqCentroidsPath),
        codebooksOut = Some(PqCodebooksPath))
    },

    // OPQ x IVF x PQ (r14): ann_ivf_pq with the OPQ-P rotation of Ge et
    // al. 2013 in front of product quantization — PCA-rotate the unit
    // vectors, allocate principal directions to the 8 subspaces balancing
    // eigenvalue products, then the same 4-bit ADC + exact-cosine refine
    // (faiss "OPQ8,IVF16,PQ8x4"). The rotation persists beside the
    // centroids/codebooks and the oracle replays rotated vectors, code
    // assignment, LUT, the fixed-order ADC chain and the refine ranking —
    // the TRIPLY-approximate operator still hash-matches exactly.
    QueryDef.withOracle("ann_opq_pq", {
      val sub = DIM / PQ_M
      def cbc2 = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(cb.c, x -> x * x)), (s, x) -> s + x)"
      def subDot(vec: String) =
        s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          s"list_transform(range(1, $sub + 1), " +
          s"i -> $vec[cb.m * $sub + i] * cb.c[i])), (s, x) -> s + x)"
      val rdot = s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(range(1, $DIM + 1), i -> u0.uv[i] * rot.c[i])), " +
        "(s, x) -> s + x)"
      val adcChain = (0 until PQ_M).map(ms =>
        s"l.lut[${ms * PQ_KS} + e.code[${ms + 1}] + 1]").mkString(" + ")
      s"""WITH $NORMED,
         |${ivfAssignCtes(OpqCentroidsPath)},
         |cbk AS (SELECT m, j, list_transform(c, x -> CAST(x AS DOUBLE)) AS c
         |        FROM read_parquet('$OpqCodebooksPath/*.parquet')),
         |rot AS (SELECT r, list_transform(c, x -> CAST(x AS DOUBLE)) AS c
         |        FROM read_parquet('$OpqRotationPath/*.parquet')),
         |u0 AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS uv FROM n),
         |ru AS (SELECT vec_id, list(d ORDER BY r) AS uv FROM (
         |         SELECT u0.vec_id, rot.r, $rdot AS d FROM u0, rot)
         |       GROUP BY vec_id),
         |ed AS (SELECT ru.vec_id, cb.m, cb.j,
         |         $cbc2 - 2.0 * ${subDot("ru.uv")} AS d
         |       FROM ru, cbk cb),
         |enc AS (SELECT vec_id, list(j ORDER BY m) AS code FROM (
         |          SELECT vec_id, m, j,
         |            row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rk
         |          FROM ed) WHERE rk = 1 GROUP BY vec_id),
         |lt AS (SELECT ru.vec_id, cb.m, cb.j, ${subDot("ru.uv")} AS ip
         |       FROM ru, cbk cb WHERE ru.vec_id < $NQ),
         |lutl AS (SELECT vec_id, list(ip ORDER BY m, j) AS lut FROM lt GROUP BY 1),
         |icand AS (SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
         |          FROM probes p JOIN assign a USING (list_id)
         |          WHERE a.vec_id <> p.vec_id),
         |scored AS (SELECT icand.query_id, icand.neighbor_id,
         |             $adcChain AS adc
         |           FROM icand JOIN lutl l ON l.vec_id = icand.query_id
         |                      JOIN enc e ON e.vec_id = icand.neighbor_id),
         |cand AS (SELECT query_id, neighbor_id FROM (
         |           SELECT query_id, neighbor_id,
         |             row_number() OVER (PARTITION BY query_id
         |               ORDER BY adc DESC, neighbor_id) AS crk
         |           FROM scored) WHERE crk <= $PQ_RERANK),
         |rr AS (SELECT cand.query_id, cand.neighbor_id,
         |         ${dotSql("qn", "cn")} / (qn.nrm * cn.nrm) AS cosine
         |       FROM cand JOIN n qn ON qn.vec_id = cand.query_id
         |                 JOIN n cn ON cn.vec_id = cand.neighbor_id),
         |r AS (SELECT query_id, neighbor_id, cosine,
         |        CAST(row_number() OVER (PARTITION BY query_id
         |          ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rk
         |      FROM rr)
         |SELECT query_id, rk AS "rank", neighbor_id, cosine FROM r WHERE rk <= $K
         |ORDER BY query_id, rk""".stripMargin
    }) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      SimilarityOps.topKOpqPq(emb, emb.filter(col("vec_id") < NQ),
        "vec_id", "embedding", K, nLists = 16, nProbe = NPROBE,
        m = PQ_M, ks = PQ_KS, rerank = PQ_RERANK,
        centroidsOut = Some(OpqCentroidsPath),
        codebooksOut = Some(OpqCodebooksPath),
        rotationOut = Some(OpqRotationPath))
    },

    // PCA-PROJECTED approximate top-5 — the third embedding-compression
    // path beside int8 quantization and IVF pruning: every vector projects
    // to 16 principal dimensions (4× fewer floats) and ranks by cosine in
    // the reduced space. Training is deterministic power iteration on the
    // hash-ordered sample; the trained (mean, components) persist to
    // parquet and the oracle replays the centering, the 16 projection
    // dots, the reduced-space norms and the ranking — another APPROXIMATE
    // operator that hash-matches exactly. Quality is spectrum-dependent
    // and MEASURED (spec floors on both the near-uniform and clustered
    // fixtures), not assumed.
    QueryDef.withOracle("ann_pca", {
      val fold = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(range(1, len(ctr.cv) + 1), i -> ctr.cv[i] * cp.c[i])), " +
        "(s, x) -> s + x)"
      def nrmOf(p: String) =
        s"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          s"list_transform($p, x -> x * x)), (s, x) -> s + x))"
      val pdot = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(range(1, len(q.p) + 1), i -> q.p[i] * c.p[i])), " +
        "(s, x) -> s + x)"
      s"""WITH $NORMED,
         |pca AS (SELECT kind, idx, list_transform(c, x -> CAST(x AS DOUBLE)) AS c
         |        FROM read_parquet('$PcaPath/*.parquet')),
         |mn AS (SELECT c FROM pca WHERE kind = 'mean'),
         |cmp AS (SELECT idx, c FROM pca WHERE kind = 'comp'),
         |ctr AS (SELECT n.vec_id,
         |          list_transform(range(1, len(n.v) + 1), i -> n.v[i] - mn.c[i]) AS cv
         |        FROM n, mn),
         |pr AS (SELECT vec_id, list(d ORDER BY idx) AS p FROM (
         |         SELECT ctr.vec_id, cp.idx, $fold AS d FROM ctr, cmp cp)
         |       GROUP BY vec_id),
         |pn AS (SELECT vec_id, p, ${nrmOf("p")} AS nrm FROM pr),
         |coarse AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |             $pdot / (q.nrm * c.nrm) AS pcos
         |           FROM pn c, pn q
         |           WHERE q.vec_id < $NQ AND q.vec_id <> c.vec_id),
         |cand AS (SELECT query_id, neighbor_id FROM (
         |           SELECT query_id, neighbor_id,
         |             row_number() OVER (PARTITION BY query_id
         |               ORDER BY pcos DESC, neighbor_id) AS crk
         |           FROM coarse) WHERE crk <= 50),
         |ex AS (SELECT cand.query_id, cand.neighbor_id,
         |         ${dotSql("qv", "cv")} / (qv.nrm * cv.nrm) AS cosine
         |       FROM cand JOIN n qv ON qv.vec_id = cand.query_id
         |                 JOIN n cv ON cv.vec_id = cand.neighbor_id),
         |r AS (SELECT query_id, neighbor_id, cosine,
         |        CAST(row_number() OVER (PARTITION BY query_id
         |          ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rk
         |      FROM ex)
         |SELECT query_id, rk AS "rank", neighbor_id, cosine FROM r WHERE rk <= $K
         |ORDER BY query_id, rk""".stripMargin
    }) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      SimilarityOps.topKPca(emb, emb.filter(col("vec_id") < NQ),
        "vec_id", "embedding", K, dims = 16, rerank = 50,
        pcaOut = Some(PcaPath))
    },

    // Multi-probe LSH top-5 (4 tables x 4 sign-bits, probe radius 2): the
    // corpus is probed per-bucket instead of scanned. The planes are
    // deterministic literals, so the oracle replays bucketing + probing +
    // candidate generation + ranking exactly — a full hash-match on an
    // APPROXIMATE operator (its quality is measured by ann_recall below).
    QueryDef.withOracle("ann_lsh",
      s"""WITH $NORMED,
         |$lshCtes
         |SELECT query_id, rk AS "rank", neighbor_id, cosine FROM lsh_r
         |WHERE rk <= $K ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      SimilarityOps.topKLsh(emb, emb.filter(col("vec_id") < NQ),
        "vec_id", "embedding", K, tables = TABLES, bits = BITS, dim = DIM,
        probeRadius = PROBE_RADIUS)
    },

    // IVF-bucketed approximate top-5 (16 lists, 12 probed, k-means++ init):
    // sample-trained coarse quantizer, corpus scanned at ~nProbe/nLists cost
    // per query. The quantizer is data-trained, so the query PERSISTS the
    // trained centroids and the oracle re-derives assignment + probing from
    // them: the ranking distance is the same ||c||²−2·v·c left-fold
    // expansion NearestCentroids computes (ties broken by list id), and the
    // cosine is the shared left-fold dot — a full hash-match on the second
    // approximate operator (LSH set the precedent with literal planes).
    QueryDef.withOracle("ann_ivf", {
      s"""WITH $NORMED,
         |$ivfCtes
         |SELECT query_id, rk AS "rank", neighbor_id, cosine FROM ivf_r
         |WHERE rk <= $K ORDER BY query_id, rk""".stripMargin
    }) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      SimilarityOps.topKIvf(emb, emb.filter(col("vec_id") < NQ),
        "vec_id", "embedding", K, nLists = 16, nProbe = NPROBE,
        centroidsOut = Some(CentroidsPath))
    },

    // Corpus CLUSTERING for curation (topic bucketing, per-cluster quotas,
    // diversity sampling): every embedding assigned to its nearest of 16
    // sample-trained k-means++ centroids in one distributed pass — ONE
    // codegen'd nearest_centroids evaluation per row, centroids riding as a
    // reference object. The oracle replays assignment from the persisted
    // quantizer exactly like ann_ivf's assign CTE.
    QueryDef.withOracle("pipeline_cluster", {
      def c2 = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(cents.c, x -> x * x)), (s, x) -> s + x)"
      def vc = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(range(1, len(e.v) + 1), i -> e.v[i] * cents.c[i])), (s, x) -> s + x)"
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |cents AS (SELECT list_id, list_transform(c, x -> CAST(x AS DOUBLE)) AS c
         |          FROM read_parquet('$ClusterCentroidsPath/*.parquet')),
         |cd AS (SELECT e.vec_id, cents.list_id, $c2 - 2.0 * $vc AS d FROM e, cents),
         |cr AS (SELECT vec_id, list_id,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rk
         |       FROM cd)
         |SELECT vec_id, list_id AS cluster FROM cr WHERE rk = 1
         |ORDER BY vec_id""".stripMargin
    }) { (s, dir) =>
      SimilarityOps.clusterAssign(Tables(s, dir, "embeddings"),
          "vec_id", "embedding", k = 16,
          centroidsOut = Some(ClusterCentroidsPath))
        .orderBy("vec_id")
    },

    // SEMANTIC dedup — the full SemDeDup pipeline (cluster, then near-dup
    // search WITHIN clusters only, keep the pair member farther from its
    // centroid). The quantizer persists, so the oracle replays the whole
    // chain: assignment (same ||c||²−2·v·c ranking as pipeline_cluster),
    // centroid cosine, within-cluster pairwise cosine, and the
    // (sim_centroid, id) dominance rule — a full hash-match on every row's
    // kept/dropped verdict. Threshold 0.4 because this corpus is
    // near-orthogonal (max pairwise cosine ≈ 0.51 — see
    // dedup_embedding_lsh_tight's note); the production operating point
    // (≥ 0.9) is exercised by the planted-near-dup spec.
    QueryDef.withOracle("dedup_semantic", {
      def c2 = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(cents.c, x -> x * x)), (s, x) -> s + x)"
      def vc = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(range(1, len(e.v) + 1), i -> e.v[i] * cents.c[i])), (s, x) -> s + x)"
      def fold(expr: String) =
        s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $expr), (s, x) -> s + x)"
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |cents AS (SELECT list_id, list_transform(c, x -> CAST(x AS DOUBLE)) AS c,
         |            sqrt(${fold("list_transform(c, x -> x * x)")}) AS cn
         |          FROM read_parquet('$SemCentroidsPath/*.parquet')),
         |cd AS (SELECT e.vec_id, cents.list_id, $c2 - 2.0 * $vc AS d FROM e, cents),
         |asg AS (SELECT vec_id, list_id AS cluster FROM (
         |          SELECT vec_id, list_id,
         |            row_number() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rk
         |          FROM cd) WHERE rk = 1),
         |s AS (SELECT e.vec_id, e.v, cluster,
         |        sqrt(${fold("list_transform(e.v, x -> x * x)")}) AS nrm,
         |        ${fold("list_transform(range(1, len(e.v) + 1), i -> e.v[i] * cents.c[i])")}
         |          / (sqrt(${fold("list_transform(e.v, x -> x * x)")}) * cents.cn) AS simc
         |      FROM e JOIN asg USING (vec_id) JOIN cents ON cents.list_id = asg.cluster),
         |drp AS (SELECT DISTINCT a.vec_id FROM s a JOIN s b ON a.cluster = b.cluster
         |          AND (b.simc < a.simc OR (b.simc = a.simc AND b.vec_id < a.vec_id))
         |        WHERE ${fold("list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])")}
         |                / (a.nrm * b.nrm) >= 0.4)
         |SELECT s.vec_id, cluster, simc AS sim_centroid,
         |  (drp.vec_id IS NULL) AS kept
         |FROM s LEFT JOIN drp ON s.vec_id = drp.vec_id
         |ORDER BY s.vec_id""".stripMargin
    }) { (s, dir) =>
      DedupOps.semanticDedup(Tables(s, dir, "embeddings"),
          "vec_id", "embedding", k = 16, threshold = 0.4,
          centroidsOut = Some(SemCentroidsPath))
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
    },

    // recall@5 of each approximate path vs ann_topk — one row per method.
    // FULLY ORACLED: with the IVF quantizer persisted and the LSH planes
    // literal, all three top-k sets are SQL-replayable, so DuckDB computes
    // the identical recall (one n_found/n_exact division — deterministic).
    // NOTE: the synthetic embeddings are near-uniform random (max pair
    // cosine ~0.5) — the hardest possible case for ANN — so recall here is
    // a floor, not a ceiling.
    QueryDef.withOracle("ann_recall", {
      def pairs(r: String) = s"SELECT query_id, neighbor_id FROM $r WHERE rk <= $K"
      def row(method: String, tk: String) =
        s"""SELECT '$method' AS method,
           |  (SELECT count(*) FROM ex_tk) AS n_exact,
           |  (SELECT count(*) FROM ex_tk JOIN $tk USING (query_id, neighbor_id)) AS n_found,
           |  CAST((SELECT count(*) FROM ex_tk JOIN $tk USING (query_id, neighbor_id)) AS DOUBLE)
           |    / (SELECT count(*) FROM ex_tk) AS recall""".stripMargin
      s"""WITH $NORMED,
         |$exactCtes,
         |$lshCtes,
         |$ivfCtes,
         |ex_tk AS (${pairs("ex_r")}),
         |lsh_tk AS (${pairs("lsh_r")}),
         |ivf_tk AS (${pairs("ivf_r")})
         |SELECT * FROM (
         |${row("lsh", "lsh_tk")}
         |UNION ALL
         |${row("ivf", "ivf_tk")}
         |) ORDER BY method""".stripMargin
    }) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < NQ)
      // persisted AND force-materialized: both recall branches reference the
      // exact pipeline. persist() alone is lazy — the union's two branches
      // then race to compute the same InMemoryRelation partitions
      // concurrently inside one action, each paying the full exact-top-k
      // cost (r4 bench: 50 s for ann_recall vs 21 s for its parts). The
      // count() runs the pipeline once; the branches then read 50 cached
      // rows. The harness clears caches between queries (Bench/Verify).
      val exact = SimilarityOps.topKExact(emb, q, "vec_id", "embedding", K).persist()
      exact.count()
      SimilarityOps.recallAtK(exact,
          SimilarityOps.topKLsh(emb, q, "vec_id", "embedding", K,
            tables = TABLES, bits = BITS, dim = DIM, probeRadius = PROBE_RADIUS))
        .withColumn("method", lit("lsh"))
        .unionByName(
          SimilarityOps.recallAtK(exact,
            SimilarityOps.topKIvf(emb, q, "vec_id", "embedding", K,
              nLists = 16, nProbe = NPROBE,
              centroidsOut = Some(CentroidsPath)))
          .withColumn("method", lit("ivf")))
        .select("method", "n_exact", "n_found", "recall")
        .orderBy("method")
    }
  )
}
