package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over dense embedding columns (`Array[Float]`).
  *
  * Two paths, per the standard ANN playbook:
  *  - `topKExact`: brute-force cosine top-k — broadcast the (small) query
  *    set against the corpus; the corpus is never shuffled, the per-row work
  *    is a codegen'd fold. This is the correctness baseline and the right
  *    tool whenever |queries| × |corpus| compute fits the cluster.
  *  - `topKLsh`: random-hyperplane LSH — L independent hash tables of b
  *    sign-bits each; the corpus is bucketed once, each query probes only
  *    its own buckets. At 100 TB the bucket join prunes the scan to
  *    |corpus| × L / 2^b candidates per query. Hyperplanes are derived from
  *    a fixed LCG (deterministic across runs, executors and engines).
  *
  * All dot products are strict left folds in double precision — the same
  * evaluation order the DuckDB oracle SQL uses, so cosines match bitwise.
  */
object SimilarityOps {

  /** Strict left-fold dot product of two double arrays — portable HOF
    * formulation (interpreted; bit-identical to `fastDot`). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  /** Codegen'd dot product (graft.functions.DotProductDouble): same
    * accumulation order as `dot`, ~100× faster inside pair joins. Requires
    * `GraftFunctions.register(spark)` (the DataFrame entry points below do). */
  def fastDot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** L2 norm via the same left fold (`sqrt(v·v)`). */
  def norm(v: Column): Column = sqrt(fastDot(v, v))

  /** Vector column cast to double elements (embeddings arrive as float). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    * splitmix-style LCG of the (table, bit, dim) index. */
  private def planeComponent(seed: Long): Double = {
    var x = seed * 6364136223846793005L + 1442695040888963407L
    x ^= (x >>> 29); x *= -5840758589994634535L; x ^= (x >>> 32)
    ((x >>> 11).toDouble / (1L << 53).toDouble) - 0.5
  }

  /** The `bits` hyperplanes of LSH table `table`, as literal arrays baked
    * into the plan (tiny: bits × dim doubles). Public so the DuckDB oracle
    * SQL can embed the SAME planes and replay the bucketing exactly. */
  def planes(table: Int, bits: Int, dim: Int): Seq[Array[Double]] =
    (0 until bits).map(j =>
      (0 until dim).map(i => planeComponent(((table * bits + j).toLong * dim + i) + 1L)).toArray)

  /** Sign-bit bucket id of vector `v` in table `table`. */
  def lshBucket(v: Column, table: Int, bits: Int, dim: Int): Column =
    planes(table, bits, dim).zipWithIndex.map { case (p, j) =>
      when(fastDot(v, lit(p)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact cosine top-k: for each query vector, the `k` nearest corpus
    * vectors by (cosine desc, id asc), self-pairs excluded.
    * Output: (query_id, rank, neighbor_id, cosine). */
  def topKExact(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // repartition: join parallelism = corpus-side task count (benchmark
    // input is one parquet row group = one task; real corpora arrive split)
    val c = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (fastDot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .orderBy("query_id", "rank")
  }

  /** INT8-QUANTIZED exact-scan top-k — the production memory-compression
    * path: normalize every vector to unit length, derive ONE global
    * symmetric scale (max |component| over all normalized corpus vectors),
    * quantize each component to `clamp(floor(x/absmax·127 + 0.5))` ∈
    * [−127, 127], and rank by the INTEGER dot product of quantized vectors.
    * One global scalar scale keeps the per-dimension map uniform, so the
    * integer score is cosine scaled by (127/absmax)² up to quantization
    * error — ranking-preserving in expectation, with recall MEASURED by
    * the spec rather than asserted. 4 bytes → 1 byte per component: at
    * 100 TB of embeddings the difference between a RAM-resident scan and a
    * spilling one (the scan shape is `topKExact`'s — corpus unshuffled,
    * queries broadcast). Deterministic end-to-end: IEEE divide + explicit
    * floor(x+0.5) rounding and an integer fold replay bit-for-bit in SQL,
    * so even this approximate operator hash-matches its oracle.
    * Output: (query_id, rank, neighbor_id, qdot). */
  def topKQuantized(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    def unit(v: Column): Column = {
      val n = norm(v)
      transform(v, x => x / n)
    }
    val c0 = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("neighbor_id"), unit(asDouble(col(vecCol))).as("cnv"))
    // the global scale: one scalar aggregation broadcast as a 1-row dim
    // (a scalar SUBQUERY would be cleaner, but Catalyst rejects subquery
    // expressions inside higher-order-function lambdas — the quantize map
    // below references the scale per component)
    val amDf = c0.agg(max(array_max(transform(col("cnv"), x => abs(x)))).as("am"))
    def quant(v: Column): Column =
      transform(v, x => greatest(lit(-127),
        least(lit(127), floor(x / col("am") * 127 + 0.5).cast("int"))))
    val c = c0.crossJoin(broadcast(amDf))
      .select(col("neighbor_id"), quant(col("cnv")).as("cq"))
    val q = queries
      .select(col(idCol).as("query_id"), unit(asDouble(col(vecCol))).as("qnv"))
      .crossJoin(broadcast(amDf))
      .select(col("query_id"), quant(col("qnv")).as("qq"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        call_function("graft_idot", col("qq"), col("cq")).as("qdot"))
    val w = Window.partitionBy("query_id").orderBy(col("qdot").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "qdot")
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed approximate top-k: candidates = corpus rows sharing at
    * least one of the query's L bucket ids; exact cosine + rank within the
    * candidate set. With `probeRadius = 1` each query additionally probes
    * the buckets at Hamming distance 1 from its own (multi-probe LSH, Lv et
    * al. VLDB'07): recall rises steeply while the CORPUS index stays L
    * entries/vector — the probe fan-out multiplies only the (small) query
    * side, which is the scale-friendly direction. Deterministic planes make
    * the whole candidate set SQL-replayable (see SimilarityQueries). */
  def topKLsh(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, tables: Int = 4, bits: Int = 4,
              dim: Int = 64, probeRadius: Int = 1): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 2, "probeRadius must be 0, 1 or 2")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    def bucketed(df: DataFrame, idAs: String, vAs: String, nAs: String): DataFrame = {
      val base = df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as(vAs))
        .withColumn(nAs, norm(col(vAs)))
      // ONE native pass computes all tables' buckets (LshBuckets) instead
      // of tables x bits separate dot expressions; posexplode's pos IS the
      // table index, and bucket values are bit-identical by construction
      base.select(col(idAs), col(vAs), col(nAs),
          posexplode(call_function("graft_lsh_buckets", col(vAs),
            lit(tables), lit(bits), lit(dim))).as(Seq("t", "b")))
    }
    val c = bucketed(corpus, "neighbor_id", "cv", "cn")
    val q0 = bucketed(queries, "query_id", "qv", "qn")
    val probes = col("b") +:
      ((if (probeRadius >= 1) (0 until bits).map(j => col("b").bitwiseXOR(lit(1L << j)))
        else Seq.empty) ++
       (if (probeRadius >= 2)
          (0 until bits).flatMap(j => (j + 1 until bits).map(j2 =>
            col("b").bitwiseXOR(lit((1L << j) | (1L << j2)))))
        else Seq.empty))
    val q = if (probeRadius == 0) q0 else
      q0.select(col("query_id"), col("qv"), col("qn"), col("t"),
        explode(array(probes: _*)).as("b"))
    // cosine computed BEFORE the pair dedup: the dedup shuffle then carries
    // three scalars per candidate instead of two embedding vectors
    val scored = c.join(broadcast(q), Seq("t", "b"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (fastDot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id") // pair may collide in several tables
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .orderBy("query_id", "rank")
  }

  /** Mini k-means(++) on a bounded, deterministically-seeded sample —
    * IVF/cluster training is offline/sample-based by design. The sample is
    * the hash-order top-N: deterministic for given data AND representative
    * regardless of partition layout (a bare limit() takes whatever rows the
    * first partition yields — first-file biased). Driver-side by contract:
    * the sample is ≤ max(k·32, 512) vectors whatever the corpus size. */
  def trainKMeans(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
                  iters: Int = 15, seed: Long = 42L): Array[Array[Double]] = {
    val sample = corpus
      .select(asDouble(col(vecCol)).as("v"), xxhash64(col(idCol)).as("_h"))
      .orderBy("_h").limit(math.max(k * 32, 512)).collect()
      .map(_.getSeq[Double](0).toArray)
    kMeansOnSample(sample, k, iters, seed)
  }

  /** Deterministic k-means++ + Lloyd on an in-driver sample — the training
    * core shared by [[trainKMeans]] (whole vectors) and [[trainPq]] (one
    * codebook per subspace). Bitwise-stable given (sample, k, iters, seed):
    * fixed iteration count, ties by index, empty clusters keep their
    * centroid. */
  private def kMeansOnSample(sample: Array[Array[Double]], k: Int,
                             iters: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    // k-means++ seeding: spread the initial centroids (D² sampling) — on
    // near-uniform data random init leaves clusters lopsided and recall low.
    // The D² array is maintained INCREMENTALLY (min with the newest
    // centroid only): identical values to the recompute-from-scratch form —
    // min over centroids commutes — but O(sample·k) instead of O(sample·k²)
    // distance evaluations, which is what lets k grow ∝ corpus (SemDeDup's
    // m² bound needs exactly that) without the seeding loop going quadratic.
    var centroids = {
      val init = scala.collection.mutable.ArrayBuffer(sample(rnd.nextInt(sample.length)))
      val d2 = sample.map(v => sqDist(v, init(0)))
      while (init.length < k) {
        val total = d2.sum
        var r = rnd.nextDouble() * total
        var i = 0
        while (i < sample.length - 1 && r > d2(i)) { r -= d2(i); i += 1 }
        init += sample(i)
        val c = sample(i)
        var j = 0
        while (j < sample.length) {
          val d = sqDist(sample(j), c)
          if (d < d2(j)) d2(j) = d
          j += 1
        }
      }
      init.toArray
    }
    val assign = new Array[Int](sample.length)
    for (_ <- 1 to iters) {
      // assignment is a pure read-only function per sample — parallelize
      // it (the dominant cost at large k); the SUMS accumulate afterwards
      // in sequential sample order, so centroid arithmetic is bit-identical
      // to the sequential loop regardless of thread scheduling
      val cents = centroids
      java.util.Arrays.parallelSetAll(assign, (i: Int) => nearest(sample(i), cents))
      val sums = Array.fill(k)(new Array[Double](centroids(0).length))
      val counts = new Array[Int](k)
      var s = 0
      while (s < sample.length) {
        val v = sample(s)
        val c = assign(s)
        counts(c) += 1
        var i = 0; while (i < v.length) { sums(c)(i) += v(i); i += 1 }
        s += 1
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    centroids
  }

  /** Persist a trained quantizer as (list_id, c) parquet an oracle can
    * re-derive assignment/probing from (the ranking arithmetic is
    * SQL-replayable — see NearestCentroids' distance expansion). */
  def persistCentroids(spark: org.apache.spark.sql.SparkSession,
                       centroids: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "c").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Corpus CLUSTERING for curation: every vector assigned to its nearest
    * sample-trained k-means centroid in one distributed pass — the
    * bucketing step of cluster-based data curation (topic balancing,
    * per-cluster quotas, diversity sampling). Same quantizer machinery as
    * [[topKIvf]]; output (idCol, cluster). */
  def clusterAssign(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int = 15, seed: Long = 42L,
                    centroidsOut: Option[String] = None): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val centroids = trainKMeans(corpus, idCol, vecCol, k, iters, seed)
    centroidsOut.foreach(persistCentroids(corpus.sparkSession, centroids, _))
    corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol),
        element_at(call_function("nearest_centroids",
          asDouble(col(vecCol)), typedLit(centroids.map(_.toSeq).toSeq)), 1)
          .as("cluster"))
  }

  /** IVF-bucketed approximate top-k: a coarse quantizer of `nLists`
    * centroids ([[trainKMeans]]), the corpus assigned to its nearest list
    * in one distributed pass, and each query probing its `nProbe` nearest
    * lists. Scan cost per query ≈ |corpus| × nProbe / nLists. Exhaustive
    * probing (nProbe = nLists) degenerates to exact. */
  def topKIvf(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nLists: Int = 16, nProbe: Int = 4,
              iters: Int = 15, seed: Long = 42L,
              centroidsOut: Option[String] = None): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val centroids = trainKMeans(corpus, idCol, vecCol, nLists, iters, seed)
    centroidsOut.foreach(persistCentroids(corpus.sparkSession, centroids, _))
    // --- distributed assignment: centroid ids ranked by distance via ONE
    // codegen'd expression (graft.functions.NearestCentroids) — centroids
    // ride along as a reference object instead of nLists × dim plan
    // literals evaluated through interpreted HOFs ---
    def ranked(v: Column): Column =
      call_function("nearest_centroids", v,
        typedLit(centroids.map(_.toSeq).toSeq))
    def listOf(v: Column): Column = element_at(ranked(v), 1)
    def probesOf(v: Column): Column = slice(ranked(v), 1, nProbe)
    val c = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("list", listOf(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .select(col("query_id"), col("qv"), col("qn"),
        explode(probesOf(col("qv"))).as("probe"))
      .select(col("query_id"), col("qv"), col("qn"), col("probe").as("list"))
    val scored = c.join(broadcast(q), Seq("list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (fastDot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .orderBy("query_id", "rank")
  }

  /** IVF × INT8 composed — the production 100 TB ANN shape: the coarse
    * quantizer prunes the scan to ~nProbe/nLists of the corpus AND the
    * scanned lists rank by the integer dot of 4×-compressed vectors, so
    * the per-query cost is both list-pruned and RAM-resident. Neither
    * half alone is the deployment shape: IVF-with-float-scan still holds
    * full vectors in memory; quantized-full-scan still reads every row.
    * Assignment/probing are [[topKIvf]]'s (raw-vector k-means++, ranked
    * centroid distances); ranking is [[topKQuantized]]'s (unit-normalize,
    * one global symmetric scale, clamp(floor(x/absmax·127+0.5)), integer
    * fold) — every stage deterministic and SQL-replayable, so even the
    * composed approximate operator hash-matches its oracle.
    * Output: (query_id, rank, neighbor_id, qdot). */
  def topKIvfQuantized(corpus: DataFrame, queries: DataFrame, idCol: String,
                       vecCol: String, k: Int, nLists: Int = 16,
                       nProbe: Int = 4, iters: Int = 15, seed: Long = 42L,
                       centroidsOut: Option[String] = None): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val centroids = trainKMeans(corpus, idCol, vecCol, nLists, iters, seed)
    centroidsOut.foreach(persistCentroids(corpus.sparkSession, centroids, _))
    def ranked(v: Column): Column =
      call_function("nearest_centroids", v,
        typedLit(centroids.map(_.toSeq).toSeq))
    def unit(v: Column): Column = {
      val n = norm(v)
      transform(v, x => x / n)
    }
    val c0 = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cnv", unit(col("cv")))
    val amDf = c0.agg(max(array_max(transform(col("cnv"), x => abs(x)))).as("am"))
    def quant(v: Column): Column =
      transform(v, x => greatest(lit(-127),
        least(lit(127), floor(x / col("am") * 127 + 0.5).cast("int"))))
    // corpus: one pass computes BOTH the list assignment (raw vector) and
    // the quantized form (normalized vector); floats never leave the stage
    val c = c0.crossJoin(broadcast(amDf))
      .select(col("neighbor_id"),
        element_at(ranked(col("cv")), 1).as("list"),
        quant(col("cnv")).as("cq"))
    val q = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qnv", unit(col("qv")))
      .crossJoin(broadcast(amDf))
      .select(col("query_id"), quant(col("qnv")).as("qq"),
        explode(slice(ranked(col("qv")), 1, nProbe)).as("list"))
    val scored = c.join(broadcast(q), Seq("list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        call_function("graft_idot", col("qq"), col("cq")).as("qdot"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("qdot").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "qdot")
      .orderBy("query_id", "rank")
  }

  /** Product-quantization codebooks: the unit-normalized hash-ordered
    * sample (same contract as [[trainKMeans]]) splits into `m` contiguous
    * subspaces of dim/m components each, and every subspace trains its own
    * `ks`-entry k-means codebook (seed offset by subspace, so codebooks are
    * independent but each deterministic). Training on UNIT vectors (not
    * residuals) keeps ADC an approximation of cosine directly — the
    * faiss `by_residual=false` inner-product configuration.
    * @return codebooks(m)(ks)(dim/m) */
  def trainPq(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int, ks: Int, iters: Int = 15, seed: Long = 42L,
              rot: Option[Array[Array[Double]]] = None,
              sampleIn: Option[Array[Array[Double]]] = None)
      : Array[Array[Array[Double]]] = {
    val sample0 = sampleIn.getOrElse(
      unitSample(corpus, idCol, vecCol, math.max(ks * 32, 512)))
    val sample = rot.fold(sample0)(r => sample0.map(rotate(r, _)))
    val d = sample(0).length
    require(m > 0 && d % m == 0, s"dim $d must split evenly into $m subspaces")
    val sub = d / m
    Array.tabulate(m) { ms =>
      val slice = sample.map(v => java.util.Arrays.copyOfRange(v, ms * sub, (ms + 1) * sub))
      kMeansOnSample(slice, ks, iters, seed + ms)
    }
  }

  /** Unit-normalized hash-ordered sample (the [[trainKMeans]] contract),
    * shared by PQ and OPQ training. */
  private def unitSample(corpus: DataFrame, idCol: String, vecCol: String,
                         n: Int): Array[Array[Double]] =
    corpus
      .select(asDouble(col(vecCol)).as("v"), xxhash64(col(idCol)).as("_h"))
      .orderBy("_h").limit(n).collect()
      .map(_.getSeq[Double](0).toArray)
      .map { v =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        val nm = math.sqrt(s)
        if (nm == 0) v else v.map(_ / nm)
      }

  private def rotate(rot: Array[Array[Double]], v: Array[Double]): Array[Double] =
    Array.tabulate(rot.length) { r =>
      var s = 0.0; var i = 0
      val row = rot(r)
      while (i < row.length) { s += row(i) * v(i); i += 1 }
      s
    }

  /** Full eigendecomposition of a symmetric d×d matrix by CYCLIC JACOBI
    * with a FIXED sweep count (no convergence branching — the same
    * determinism contract as [[trainPca]]'s fixed-iteration power method).
    * Returns (eigenvalues, eigenvector ROWS): M ≈ Vᵀ·diag(λ)·V with
    * V·Vᵀ = I; residuals property-tested in the spec. d = 64 here, so
    * this is sub-millisecond driver work. */
  def jacobiEigen(m0: Array[Array[Double]], sweeps: Int = 16)
      : (Array[Double], Array[Array[Double]]) = {
    val d = m0.length
    val a = m0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < sweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            // closed-form diagonal update; rotate the remaining rows/cols
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = app - t * apq
            a(q)(q) = aqq + t * apq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            var k = 0
            while (k < d) {
              if (k != p && k != q) {
                val akp = a(k)(p); val akq = a(k)(q)
                a(k)(p) = c * akp - s * akq; a(p)(k) = a(k)(p)
                a(k)(q) = s * akp + c * akq; a(q)(k) = a(k)(q)
              }
              k += 1
            }
            k = 0
            while (k < d) {
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - s * vqk
              v(q)(k) = s * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** OPQ rotation — the PARAMETRIC solution of Ge et al., CVPR 2013
    * ("Optimized Product Quantization", OPQ-P): eigendecompose the unit
    * sample's second-moment matrix (uncentered — an orthogonal rotation
    * must preserve inner products, which centering would break), then
    * allocate principal directions to the `m` PQ subspaces BALANCING the
    * product of eigenvalues (greedy on log-λ sums, largest eigenvalue
    * first), so every subspace carries comparable variance instead of the
    * raw layout's arbitrary split. Deterministic end-to-end: hash-ordered
    * sample, fixed-sweep Jacobi, ties broken by eigen index. Returns the
    * d×d rotation as ROWS (rotated(r) = Σᵢ R(r)(i)·u(i)); subspace ms
    * owns rows [ms·d/m, (ms+1)·d/m). */
  def trainOpqRotation(corpus: DataFrame, idCol: String, vecCol: String,
                       m: Int, seed: Long = 42L,
                       sampleIn: Option[Array[Array[Double]]] = None)
      : Array[Array[Double]] = {
    val sample = sampleIn.getOrElse(unitSample(corpus, idCol, vecCol, 512))
    val d = sample(0).length
    require(m > 0 && d % m == 0, s"dim $d must split evenly into $m subspaces")
    val sub = d / m
    val mom = Array.ofDim[Double](d, d)
    sample.foreach { u =>
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) { mom(i)(j) += u(i) * u(j); j += 1 }
        i += 1
      }
    }
    var i = 0
    while (i < d) {
      var j = 0
      while (j < i) { mom(i)(j) = mom(j)(i); j += 1 }
      i += 1
    }
    val (evals, evecs) = jacobiEigen(mom)
    // eigen pairs by descending eigenvalue (ties by index — determinism)
    val order = (0 until d).sortBy(i => (-evals(i), i))
    // greedy balanced allocation: next-largest direction goes to the
    // open subspace with the smallest log-eigenvalue sum so far
    val slots = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val logSum = new Array[Double](m)
    order.foreach { ei =>
      val target = (0 until m).filter(slots(_).length < sub)
        .minBy(ms => (logSum(ms), ms))
      slots(target) += ei
      logSum(target) += math.log(math.max(evals(ei), 1e-12))
    }
    slots.flatMap(_.map(evecs)).toArray
  }

  /** Persist the OPQ rotation as (r, c) parquet rows — one row per output
    * dimension — so the oracle re-derives the rotated vectors exactly. */
  def persistOpqRotation(spark: org.apache.spark.sql.SparkSession,
                         rot: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    rot.zipWithIndex.map { case (row, r) => (r, row.toSeq) }
      .toSeq.toDF("r", "c").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Persist PQ codebooks as (m, j, c) parquet — one row per codeword — so
    * the oracle re-derives encoding and ADC lookup exactly. */
  def persistPqCodebooks(spark: org.apache.spark.sql.SparkSession,
                         codebooks: Array[Array[Array[Double]]],
                         path: String): Unit = {
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cb, ms) =>
      cb.zipWithIndex.map { case (c, j) => (ms, j, c.toSeq) }
    }.toSeq.toDF("m", "j", "c").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** IVF × PRODUCT-QUANTIZATION composed top-k — the memory shape real
    * 100 TB ANN deployments run (faiss IVFPQ): the coarse quantizer prunes
    * the scan to ~nProbe/nLists of the corpus, and inside the probed lists
    * every vector is represented by `m` sub-space codeword ids (dim 64,
    * m=8, ks=16 → 8 nibbles ≈ 4 BYTES per vector vs 256 for floats and 64
    * for int8 — the step beyond [[topKIvfQuantized]]'s one global scale).
    * Ranking is ADC (asymmetric distance computation): each query builds an
    * m×ks lookup table of sub-dot products against the codebooks ONCE, and
    * a candidate's score is the fixed-order sum of m table entries — no
    * per-candidate float vector is ever read. Every stage is deterministic
    * and SQL-replayable: assignment ranks by the same (||c||²−2v·c, index)
    * key as IVF, encoding by per-subspace (distance, codeword) rank, LUT
    * and score by strict left folds — so even this doubly-approximate
    * operator hash-matches its DuckDB oracle from the persisted
    * centroids + codebooks. Output: (query_id, rank, neighbor_id, adc). */
  def topKIvfPq(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nLists: Int = 16, nProbe: Int = 4,
                m: Int = 8, ks: Int = 16, rerank: Int = 150,
                iters: Int = 15, seed: Long = 42L,
                centroidsOut: Option[String] = None,
                codebooksOut: Option[String] = None,
                rotation: Option[Array[Array[Double]]] = None,
                pqSample: Option[Array[Array[Double]]] = None): DataFrame = {
    require(rerank >= k, s"rerank window $rerank must cover k=$k")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val centroids = trainKMeans(corpus, idCol, vecCol, nLists, iters, seed)
    centroidsOut.foreach(persistCentroids(corpus.sparkSession, centroids, _))
    val codebooks = trainPq(corpus, idCol, vecCol, m, ks, iters, seed, rotation,
      sampleIn = pqSample)
    codebooksOut.foreach(persistPqCodebooks(corpus.sparkSession, codebooks, _))
    val sub = codebooks(0)(0).length
    def ranked(v: Column): Column =
      call_function("nearest_centroids", v,
        typedLit(centroids.map(_.toSeq).toSeq))
    def unit(v: Column): Column = {
      val n = norm(v)
      transform(v, x => x / n)
    }
    // OPQ hook: with a rotation, PQ codes and ADC tables compute in the
    // rotated space (d codegen'd strict-fold dots, map-side, fused into
    // the same pass); the coarse quantizer and the refine stay raw
    def maybeRotated(uv: Column): Column = rotation.fold(uv) { rot =>
      array(rot.indices.map(r => fastDot(uv, typedLit(rot(r).toSeq))): _*)
    }
    def subv(v: Column, ms: Int): Column = slice(v, ms * sub + 1, sub)
    // per-subspace codeword id: the same codegen'd ranked-centroids
    // expression, fed the subvector and that subspace's codebook
    def code(v: Column): Column = array((0 until m).map { ms =>
      element_at(call_function("nearest_centroids", subv(v, ms),
        typedLit(codebooks(ms).map(_.toSeq).toSeq)), 1)
    }: _*)
    // the (id, v, norm) base is read twice: code/list derivation and the
    // refine join (see shingleSets note on localCheckpoint-vs-persist)
    val base = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nn", norm(col("v")))
      .localCheckpoint(false)
    // corpus: ONE pass computes the list id (raw vector, like IVF) and the
    // m-nibble PQ code (unit vector); floats never ride the candidate join
    val c = base.select(col("id").as("neighbor_id"),
      element_at(ranked(col("v")), 1).as("list"),
      code(maybeRotated(transform(col("v"), x => x / col("nn")))).as("code"))
    // queries: nProbe probed lists + the m×ks ADC lookup table, built by
    // codegen'd strict-left-fold dots against codebook literals (m·ks=128
    // dots per QUERY row — queries are the tiny side)
    val lut = array((0 until m).map { ms =>
      array((0 until ks).map { j =>
        fastDot(subv(col("qnv"), ms), typedLit(codebooks(ms)(j).toSeq))
      }: _*)
    }: _*)
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qnv", maybeRotated(unit(col("qv"))))
      .select(col("query_id"), lut.as("lut"),
        explode(slice(ranked(col("qv")), 1, nProbe)).as("list"))
    // ADC: fixed left-to-right chain of m table lookups — the same
    // evaluation order as the oracle's lookup chain, so doubles match
    val adc = (0 until m).map(ms =>
        element_at(element_at(col("lut"), ms + 1),
          element_at(col("code"), ms + 1) + 1))
      .reduceLeft(_ + _)
    val scored = c.join(broadcast(q), Seq("list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), adc.as("adc"))
      .dropDuplicates("query_id", "neighbor_id")
    // REFINE (the faiss refine/RFlat stage): the coarse ADC order only
    // SELECTS `rerank` candidates per query; those — and only those — pay
    // a full-dimension exact cosine, which produces the output ranking.
    // 4-bit ADC alone on near-uniform vectors measured recall@5 = 0.12;
    // the 150-candidate refine measures 0.92 (spec-gated >= 0.85). The
    // refine join is output-sized (nq × rerank rows against `base`).
    val wAdc = Window.partitionBy("query_id").orderBy(col("adc").desc, col("neighbor_id"))
    val cand = scored.withColumn("crk", row_number().over(wAdc))
      .filter(col("crk") <= rerank).select("query_id", "neighbor_id")
    val qvec = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv2"))
      .withColumn("qn2", norm(col("qv2")))
    val refined = cand
      .join(base.select(col("id").as("neighbor_id"), col("v").as("cv"),
        col("nn").as("cn")), "neighbor_id")
      .join(broadcast(qvec), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        (fastDot(col("qv2"), col("cv")) / (col("qn2") * col("cn"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    refined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .orderBy("query_id", "rank")
  }

  /** OPQ × IVF × PQ composed top-k — [[topKIvfPq]] with the
    * [[trainOpqRotation]] rotation applied before product quantization
    * (faiss's `OPQ8,IVF16,PQ8x4` index-factory shape): codebooks train on
    * ROTATED unit vectors, corpus codes and query LUTs compute in the
    * rotated space (an orthogonal rotation preserves inner products, so
    * ADC still approximates cosine), while the coarse IVF quantizer and
    * the exact-cosine refine stay in the ORIGINAL space. Every stage is
    * deterministic and SQL-replayable from the persisted rotation +
    * centroids + codebooks. Output contract identical to [[topKIvfPq]]. */
  def topKOpqPq(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nLists: Int = 16, nProbe: Int = 4,
                m: Int = 8, ks: Int = 16, rerank: Int = 150,
                iters: Int = 15, seed: Long = 42L,
                centroidsOut: Option[String] = None,
                codebooksOut: Option[String] = None,
                rotationOut: Option[String] = None): DataFrame = {
    // ONE sample job feeds both the rotation and the PQ codebooks (the
    // ks*32 floor and the 512 rotation floor coincide at the defaults)
    val sample = unitSample(corpus, idCol, vecCol, math.max(ks * 32, 512))
    val rot = trainOpqRotation(corpus, idCol, vecCol, m, seed, Some(sample))
    rotationOut.foreach(persistOpqRotation(corpus.sparkSession, rot, _))
    // everything downstream IS topKIvfPq with the rotation threaded into
    // the PQ training, the corpus code derivation and the query ADC table
    // — one pipeline, so any fix to the ADC/refine machinery applies to
    // both registered operators
    topKIvfPq(corpus, queries, idCol, vecCol, k, nLists, nProbe, m, ks,
      rerank, iters, seed, centroidsOut, codebooksOut,
      rotation = Some(rot), pqSample = Some(sample))
  }

  /** Deterministic PCA training on the hash-ordered sample (same sampling
    * contract as [[trainKMeans]]): mean + top-`dims` principal components
    * by power iteration with deflation. Determinism is by construction —
    * fixed LCG init vectors, a FIXED iteration count (no convergence
    * branching), and deflation in component order — so the same data
    * yields the same projection on every run and engine.
    * @return (mean[d], components[dims][d]) */
  def trainPca(corpus: DataFrame, idCol: String, vecCol: String, dims: Int,
               iters: Int = 60, seed: Long = 7L): (Array[Double], Array[Array[Double]]) = {
    val sample = corpus
      .select(asDouble(col(vecCol)).as("v"), xxhash64(col(idCol)).as("_h"))
      .orderBy("_h").limit(512).collect()
      .map(_.getSeq[Double](0).toArray)
    val d = sample(0).length
    require(dims > 0 && dims <= d, s"dims must be in [1, $d]")
    val n = sample.length
    val mean = new Array[Double](d)
    sample.foreach { v => var i = 0; while (i < d) { mean(i) += v(i); i += 1 } }
    var i = 0; while (i < d) { mean(i) /= n; i += 1 }
    val centered = sample.map { v =>
      val c = new Array[Double](d)
      var j = 0; while (j < d) { c(j) = v(j) - mean(j); j += 1 }
      c
    }
    // covariance times vector, without materializing the d×d matrix:
    // C·x = Σ_v (v·x)·v / n  over centered sample vectors
    def covTimes(x: Array[Double], deflate: Seq[Array[Double]]): Array[Double] = {
      // deflate x against already-found components first
      val xd = x.clone()
      deflate.foreach { c =>
        var dot = 0.0; var k = 0
        while (k < d) { dot += xd(k) * c(k); k += 1 }
        k = 0; while (k < d) { xd(k) -= dot * c(k); k += 1 }
      }
      val out = new Array[Double](d)
      centered.foreach { v =>
        var dot = 0.0; var k = 0
        while (k < d) { dot += v(k) * xd(k); k += 1 }
        k = 0; while (k < d) { out(k) += dot * v(k); k += 1 }
      }
      var k = 0; while (k < d) { out(k) /= n; k += 1 }
      out
    }
    def normalize(x: Array[Double]): Array[Double] = {
      var s = 0.0; var k = 0
      while (k < d) { s += x(k) * x(k); k += 1 }
      val nn = math.sqrt(s)
      if (nn == 0) x else x.map(_ / nn)
    }
    val comps = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    for (c <- 0 until dims) {
      var x = normalize((0 until d).map(k =>
        planeComponent((c.toLong * d + k) + seed)).toArray)
      var it = 0
      while (it < iters) { x = normalize(covTimes(x, comps.toSeq)); it += 1 }
      comps += x
    }
    (mean, comps.toArray)
  }

  /** Persist a trained PCA as (kind, idx, c) parquet: row kind 'mean' once
    * and kind 'comp' per component — the oracle re-derives the projection
    * from it exactly. */
  def persistPca(spark: org.apache.spark.sql.SparkSession,
                 mean: Array[Double], comps: Array[Array[Double]],
                 path: String): Unit = {
    import spark.implicits._
    (("mean", -1, mean.toSeq) +:
      comps.zipWithIndex.map { case (c, i) => ("comp", i, c.toSeq) }.toSeq)
      .toDF("kind", "idx", "c").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** PCA coarse-rank + EXACT re-rank top-k — the third
    * embedding-compression path beside int8 quantization and IVF pruning,
    * in its production form: every vector projects to `dims` principal
    * dimensions (4× fewer floats at 64→16), the REDUCED-space cosine
    * selects `rerank` candidates per query, and only those candidates pay
    * the full-dimension exact cosine. The reduced scan is the memory/
    * bandwidth win; the re-rank caps the quality loss (reduced-space
    * rank alone degrades sharply on isotropic-noise data — dims/d of
    * evenly-spread variance — which is exactly why real pipelines
    * re-rank). Projection is `dims` codegen'd dot products against
    * literal component arrays — map-side, corpus unshuffled, queries
    * broadcast; candidates per query are bounded at `rerank`. Quality is
    * spectrum-dependent and MEASURED on both the near-uniform and
    * clustered fixtures. Output: (query_id, rank, neighbor_id, cosine). */
  def topKPca(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, dims: Int = 16, rerank: Int = 50,
              pcaOut: Option[String] = None): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    require(rerank >= k, s"rerank pool must cover k: $rerank < $k")
    val (mean, comps) = trainPca(corpus, idCol, vecCol, dims)
    pcaOut.foreach(persistPca(corpus.sparkSession, mean, comps, _))
    val meanLit = typedLit(mean.toSeq)
    def proj(v: Column): Column = {
      val centered = zip_with(v, meanLit, (x, m) => x - m)
      array(comps.map(c => fastDot(centered, typedLit(c.toSeq))): _*)
    }
    val c = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cp", proj(col("cv")))
      .withColumn("cpn", norm(col("cp")))
      .withColumn("cn", norm(col("cv")))
    val q = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qp", proj(col("qv")))
      .withColumn("qpn", norm(col("qp")))
      .withColumn("qn", norm(col("qv")))
    // stage 1: coarse rank in the reduced space, keep `rerank` candidates
    val coarse = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (fastDot(col("qp"), col("cp")) / (col("qpn") * col("cpn"))).as("pcos"),
        (fastDot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine"))
    val wc = Window.partitionBy("query_id").orderBy(col("pcos").desc, col("neighbor_id"))
    val cand = coarse.withColumn("crk", row_number().over(wc))
      .filter(col("crk") <= rerank)
    // stage 2: exact re-rank of the bounded candidate pool. (At this
    // fixture scale the full cosine rides along from stage 1; in a
    // deployed reduced-space scan the full vectors would be FETCHED for
    // only these `rerank` rows per query — the candidate set is what the
    // reduced representation exists to shrink.)
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .orderBy("query_id", "rank")
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  private def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bd = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0; var i = 0
      while (i < v.length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    best
  }

  /** recall@k of an approximate result against the exact one: fraction of
    * exact top-k (query, neighbor) pairs the approximate result found.
    * Lazy and single-pass — one left join + one agg, so each input pipeline
    * runs exactly once when the result is materialized (the eager two-count
    * formulation ran the exact pipeline twice per call). */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame = {
    val hit = approx.select("query_id", "neighbor_id").withColumn("hit", lit(1))
    exact.select("query_id", "neighbor_id")
      .join(hit, Seq("query_id", "neighbor_id"), "left_outer")
      .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_found"),
        coalesce(count(col("hit")).cast("double") / count(lit(1)), lit(0.0))
          .as("recall"))
  }
}
