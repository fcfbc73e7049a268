package graft

import graft.ops.BloomOps
import graft.functions.GraftBloomContains
import org.apache.spark.sql.functions._

/** Bloom semi-join pruning: exactness (no false negatives by
  * construction), a MEASURED prune ratio on disjoint keys, and the probe's
  * codegen placement in the fact scan stage. */
class BloomOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("bloomSemiJoin is exactly the plain semi-join") {
    val fact = (1L to 5000L).map(i => (i, i % 997)).toDF("id", "key")
    val dim = (0L to 996L by 13L).toDF("dkey") // ~77 of 997 keys
    val got = BloomOps.bloomSemiJoin(fact, "key", dim, "dkey",
        numBits = 1 << 12, numHashes = 5)
      .select("id").as[Long].collect().sorted.toSeq
    val want = fact.join(dim, col("key") === col("dkey"), "left_semi")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == want && want.nonEmpty)
  }

  test("no false negatives ever; prune ratio on disjoint keys is measured small") {
    // dim keys 0..999, fact keys 1_000_000+ (fully disjoint): every
    // surviving row is a false positive. 10 bits/key, k=5 -> ~1% fpp.
    val dim = (0L until 1000L).toDF("dkey")
    val bits = BloomOps.bloomBits(dim, "dkey", numBits = 1 << 14, numHashes = 5)
    val members = (0L until 1000L).toDF("key")
    val strangers = (1000000L until 1010000L).toDF("key")
    // every member passes the probe: false negatives are structurally
    // impossible, but this guards the build/probe hash families drifting
    assert(BloomOps.bloomPruned(members, "key", bits, 1 << 14, 5).count() == 1000L)
    val fp = BloomOps.bloomPruned(strangers, "key", bits, 1 << 14, 5).count()
    assert(fp < 500L, s"false-positive count $fp of 10000 — prune is not pruning")
  }

  test("probe sits in the scan-side stage, before the confirming join's exchange") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val fact = (1L to 2000L).map(i => (i, i % 100)).toDF("id", "key")
    val dim = (0L to 99L by 7L).toDF("dkey")
    val df = BloomOps.bloomSemiJoin(fact, "key", dim, "dkey",
      numBits = 1 << 10, numHashes = 5)
    df.collect()
    // STRUCTURAL walk (not plan-string offsets, which vary with AQE
    // formatting across Spark versions): the Filter evaluating
    // GraftBloomContains must be a DESCENDANT of the LeftSemi join's
    // stream side — fact rows are pruned before they reach the join.
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec        => unwrap(q.plan)
      case other                    => other
    }
    def collectNodes(p: SparkPlan): Seq[SparkPlan] = {
      val n = unwrap(p)
      n +: n.children.flatMap(collectNodes)
    }
    def hasBloomFilter(p: SparkPlan): Boolean = collectNodes(p).exists {
      case f: FilterExec =>
        f.condition.exists(_.isInstanceOf[graft.functions.GraftBloomContains])
      case _ => false
    }
    val joins = collectNodes(df.queryExecution.executedPlan).collect {
      case j: BaseJoinExec if j.joinType == LeftSemi => j
    }
    assert(joins.nonEmpty, df.queryExecution.executedPlan.toString)
    // the probe filter lives under the semi-join (its stream side), and
    // NOT above it — the whole point is pruning before the join
    assert(joins.exists(j => j.children.exists(hasBloomFilter)),
      df.queryExecution.executedPlan.toString)
    assert(!collectNodes(df.queryExecution.executedPlan)
      .takeWhile(n => !n.isInstanceOf[BaseJoinExec])
      .exists {
        case f: FilterExec =>
          f.condition.exists(_.isInstanceOf[graft.functions.GraftBloomContains])
        case _ => false
      }, "bloom probe found ABOVE the semi-join — prune placement inverted")
  }

  test("probe-incompatible key types are rejected loudly, not dropped silently") {
    val fact = (1L to 10L).map(i => (i, i)).toDF("id", "key") // LONG key
    val dim = Seq("1", "2", "3").toDF("dkey") // STRING key
    val e = intercept[IllegalArgumentException] {
      BloomOps.bloomSemiJoin(fact, "key", dim, "dkey", numBits = 1 << 10, numHashes = 5)
    }
    assert(e.getMessage.contains("probe-incompatible"))
    // two DIFFERENT non-integral types also reject: xxhash64 hashes the
    // native type's bytes, so DOUBLE 2.0 and STRING '2.0' hash apart
    val dfact = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "key")
    val sdim = Seq("2.0", "3.0").toDF("dkey")
    val e2 = intercept[IllegalArgumentException] {
      BloomOps.bloomSemiJoin(dfact, "key", sdim, "dkey", numBits = 1 << 10, numHashes = 5)
    }
    assert(e2.getMessage.contains("probe-incompatible"))
    // mixed integral WIDTHS stay accepted (both canonicalize to the value)
    val ifact = Seq((1L, 5), (2L, 6)).toDF("id", "key") // INT key
    val ldim = Seq(5L, 9L).toDF("dkey")                 // LONG key
    assert(BloomOps.bloomSemiJoin(ifact, "key", ldim, "dkey",
      numBits = 1 << 10, numHashes = 5).select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("NULL dim keys never enter the filter bits") {
    val dim = Seq(Some("alpha"), None, Some("beta"), None).toDF("dkey")
    val bits = BloomOps.bloomBits(dim, "dkey", numBits = 1 << 10, numHashes = 5)
    // a filter built from the 2 non-null keys: identical bits to building
    // without the NULL rows at all — xxhash64(NULL)'s phantom key is gone
    val clean = BloomOps.bloomBits(Seq("alpha", "beta").toDF("dkey"),
      "dkey", numBits = 1 << 10, numHashes = 5)
    assert(bits.as[Array[Long]].head().toSeq == clean.as[Array[Long]].head().toSeq)
  }

  test("string keys fold through xxhash64 identically on both sides") {
    val fact = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"),
      (5L, "alpha"), (6L, "epsilon")).toDF("id", "key")
    val dim = Seq("alpha", "gamma", "zeta").toDF("dkey")
    val got = BloomOps.bloomSemiJoin(fact, "key", dim, "dkey",
        numBits = 1 << 10, numHashes = 5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L, 5L))
  }

  test("property: bloomSemiJoin equals the plain semi-join for random key sets") {
    val rng = new scala.util.Random(23)
    for (trial <- 1 to 4) {
      // adversarial shapes rotate: negative keys, Long extremes, overlaps
      val universe = Seq(Long.MinValue, Long.MaxValue, -1L, 0L) ++
        (1 to 300).map(_ => rng.nextLong() % 1000L)
      val factKeys = rng.shuffle(universe).take(150 + rng.nextInt(100))
      val dimKeys = rng.shuffle(universe).take(30 + rng.nextInt(60))
      val fact = factKeys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("id", "key")
      val dim = dimKeys.toDF("dkey")
      val got = BloomOps.bloomSemiJoin(fact, "key", dim, "dkey",
          numBits = 1 << 11, numHashes = 5)
        .select("id").as[Long].collect().sorted.toSeq
      val want = fact.join(dim, col("key") === col("dkey"), "left_semi")
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == want, s"trial $trial")
    }
  }

  test("hash family: build and probe agree on every probed position") {
    // published splitmix64 test vector: first output of seed 0 (the
    // SplittableRandom/xoshiro reference implementations agree on this)
    assert(GraftBloomContains.splitmix64(0L) == 0xE220A8397B1DCDAFL)
    val bits = new Array[Long](16) // 1024 bits
    GraftBloomContains.setBits(bits, 42L, 1024, 7)
    val ad = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(bits)
    assert(GraftBloomContains.mightContain(ad, 42L, 1024, 7))
    // a different key with k=7 probes in 1024 bits of a 1-key filter is
    // essentially never all-hits — deterministic, so pin one
    assert(!GraftBloomContains.mightContain(ad, 43L, 1024, 7))
  }
}
