package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** Executable plan gate for the bucketed co-located join: the whole point
  * of `q_bucketed_join` is that the join itself runs with ZERO exchange —
  * the shuffle was paid once at table-write time. A regression that
  * silently reintroduces an exchange (bucket count mismatch, a lost sort
  * spec, bucketing disabled) still returns correct ROWS, so only a plan
  * assertion can catch it. */
class RelationalPlanSpec extends SparkTestBase {

  test("bucketed fact-fact join plans with no exchange under the SortMergeJoin") {
    val dir = "/root/testdata/sf0.001"
    val (ot, lt) = graft.queries.RelationalQueries.BucketedStage.tables(spark, dir)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // at test scale the planner would BROADCAST the small side (and then
    // rightly ignore bucketing); at the 100 TB fact-fact scale this query
    // models, neither side broadcasts — force that regime
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val join = spark.table(ot)
        .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
        .select("o_orderpriority", "l_extendedprice")
      val plan = join.queryExecution.executedPlan
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      val smjs = plan.collect { case j: SortMergeJoinExec => j }
      assert(smjs.size == 1, s"expected one SortMergeJoin:\n$plan")
      assert(exchanges.isEmpty, s"bucketed join must not shuffle:\n$plan")
      // and the result is the ordinary join's result
      val got = join.count()
      val expect = graft.tables.Tables(spark, dir, "orders")
        .join(graft.tables.Tables(spark, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("ANN scans keep the corpus unshuffled: query side broadcasts, one rank exchange") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledHashJoinExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.SparkPlan
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    def flat(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
      case s: QueryStageExec        => flat(s.plan)
      case other                    => other +: other.children.flatMap(flat)
    }).distinct
    // the invariant of every scan-shaped ANN operator: corpus rows meet
    // the (small) query side through BROADCAST joins — the only shuffle
    // is the per-query rank window. A silently reintroduced SortMergeJoin
    // would still return correct rows, so only the plan catches it.
    for ((name, df) <- Seq(
      "ivf_quantized" -> graft.ops.SimilarityOps.topKIvfQuantized(
        emb, q, "vec_id", "embedding", 5, nLists = 16, nProbe = 4),
      "pca" -> graft.ops.SimilarityOps.topKPca(
        emb, q, "vec_id", "embedding", 5, dims = 16, rerank = 50))) {
      df.collect()
      val nodes = flat(df.queryExecution.executedPlan)
      assert(nodes.exists(n => n.isInstanceOf[BroadcastHashJoinExec] ||
          n.isInstanceOf[BroadcastNestedLoopJoinExec]),
        s"$name: query side should broadcast\n${df.queryExecution.executedPlan}")
      assert(!nodes.exists(n => n.isInstanceOf[SortMergeJoinExec] ||
          n.isInstanceOf[ShuffledHashJoinExec]),
        s"$name: corpus must never shuffle against the query side\n" +
          df.queryExecution.executedPlan)
    }
  }

  test("pipeline_pack_tokens joins at DOC level: no explode below a join") {
    import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.PipelineQueries.defs.find(_.name == "pipeline_pack_tokens").get
    val df = q.fn(spark, dir)
    df.write.format("noop").mode("overwrite").save() // finalize AQE stages
    def subtree(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => subtree(a.executedPlan)
      case s: QueryStageExec        => subtree(s.plan)
      case other                    => other +: other.children.flatMap(subtree)
    }
    val nodes = subtree(df.queryExecution.executedPlan)
    val joins = nodes.filter(n => n.isInstanceOf[SortMergeJoinExec] ||
      n.isInstanceOf[ShuffledHashJoinExec] || n.isInstanceOf[BroadcastHashJoinExec])
    assert(joins.nonEmpty, "pack_tokens should contain the pack/doc join")
    // the slot join must move one row per DOCUMENT; a Generate (the
    // token posexplode) under a join means the token stream is being
    // shuffled/sorted — ~50x the rows of the doc-level shape (the r12
    // regression this guards: 12.7 s -> 4.7 s at 10x data)
    for (j <- joins) {
      val below = j.children.flatMap(subtree)
      assert(!below.exists(_.isInstanceOf[GenerateExec]),
        s"token explode below a join:\n$j")
    }
  }

  test("no registered text query plans a plain CartesianProduct") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.SparkPlan
    val dir = "/root/testdata/sf0.001"
    def flat(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
      case s: QueryStageExec        => flat(s.plan)
      case other                    => other +: other.children.flatMap(flat)
    }).distinct
    // a CartesianProduct pairs every partition with every partition — at
    // corpus scale that's quadratic task count. Single-row cross joins
    // (text_vocab) must carry a broadcast hint instead; this gate keeps
    // an accidental hint-loss from regressing silently.
    for (q <- graft.queries.TextQueries.defs) {
      val df = q.fn(spark, dir)
      val bad = flat(df.queryExecution.executedPlan)
        .filter(_.isInstanceOf[CartesianProductExec])
      assert(bad.isEmpty,
        s"${q.name} plans a CartesianProduct:\n${df.queryExecution.executedPlan}")
    }
  }
}
