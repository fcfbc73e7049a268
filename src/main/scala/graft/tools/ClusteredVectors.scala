package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic CLUSTERED embedding fixture — the realism check the
  * driver's near-uniform random embeddings cannot provide. Near-uniform
  * vectors are ANN's hardest case for RECALL but its easiest case for IVF
  * LIST BALANCE (every k-means list ends up equally loaded); real
  * embeddings cluster, which flips the difficulty: probing the right lists
  * is easy, but skewed list occupancy makes the scanned fraction — and a
  * 100 TB scan plan — depend on which lists the query probes. The bench
  * measures IVF recall AND list-occupancy skew on this fixture every round
  * (fields `ann_ivf_recall_clustered`, `ivf_list_skew_clustered`) so a
  * quantizer/training regression shows up as a number, not an anecdote.
  *
  * Construction (pure Catalyst expressions, fully distributed, no RNG
  * state): `nClusters` centers with components from a splitmix-style fold
  * of (cluster, dim); vector v(id) = center(cluster(id)) + noise·u(id, i)
  * with u a per-(id, dim) hash uniform in [-0.5, 0.5). Cluster membership
  * is SKEWED on purpose (density ∝ u², cluster 0 the heaviest) — balanced
  * synthetic clusters would again hide the list-imbalance failure mode. */
object ClusteredVectors {

  /** Deterministic pseudo-random center component in [-1, 1). */
  private def centerComponent(seed: Long): Double = {
    var x = seed * 6364136223846793005L + 1442695040888963407L
    x ^= (x >>> 29); x *= -5840758589994634535L; x ^= (x >>> 32)
    ((x >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
  }

  /** (vec_id, embedding float array) with `nClusters` skew-sized clusters. */
  def generate(spark: SparkSession, n: Long, dim: Int, nClusters: Int,
               noise: Double = 0.25, seed: Long = 11L): DataFrame = {
    val centers = (0 until nClusters).map(c =>
      (0 until dim).map(i => centerComponent((c.toLong * dim + i) + seed)).toSeq).toSeq
    val centersLit = typedLit(centers)
    // skewed membership: u ∈ [0,1) hashed per id, cluster = floor(u²·k)
    val u = pmod(hash(col("id"), lit(seed.toInt)), lit(1000000)).cast("double") / 1e6
    val cl = floor(u * u * nClusters).cast("int")
    spark.range(0, n)
      .select(col("id").as("vec_id"), cl.as("_c"))
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          (element_at(element_at(centersLit, col("_c") + 1), i + 1) +
            lit(noise) * (pmod(hash(col("vec_id"), i, lit(seed.toInt + 1)),
              lit(1000000)).cast("double") / 1e6 - 0.5)).cast("float"))
          .as("embedding"))
  }

  /** IVF list-occupancy skew of a trained quantizer over `vectors`:
    * (max list size) / (mean list size). 1.0 = perfectly balanced;
    * at 100 TB a skew of s means the hottest list scans s× the average —
    * the number that decides whether probing stays sublinear. */
  def ivfListSkew(vectors: DataFrame, nLists: Int): Double = {
    val assigned = graft.ops.SimilarityOps.clusterAssign(
      vectors, "vec_id", "embedding", k = nLists)
    val counts = assigned.groupBy("cluster").count()
      .select("count").collect().map(_.getLong(0))
    if (counts.isEmpty) 0.0
    else counts.max.toDouble / (counts.sum.toDouble / counts.length)
  }
}
