package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.TimeSeriesOps.sumExact2
import graft.tables.Tables

/** General relational queries over the TPC-H-ish tables. The reference has
  * no joins or general group-bys (SURVEY.md §2.4) — these prove the engine
  * safely generalizes beyond its surface, and exercise the plans that matter
  * at 100 TB: partial aggregation, broadcast joins, top-k.
  *
  * Float discipline: fixed-2-decimal money columns are summed as
  * DECIMAL(18,2) then surfaced as double, so results are bitwise independent
  * of partial-aggregation order (Spark) vs sequential order (DuckDB). Sums
  * of integral-valued doubles (l_quantity) are exact in binary f.p. already.
  */
object RelationalQueries {

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1-shaped pricing summary: map-side partial agg, 6 groups.
    QueryDef.withOracle("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       SUM(l_quantity) / COUNT(l_quantity) AS avg_qty,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate").cast("date") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"),
             sumExact2(col("l_extendedprice")).as("sum_base_price"),
             (sum("l_quantity") / count("l_quantity")).as("avg_qty"),
             count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Star join: orders -> customer -> nation, dims broadcast (at 100 TB the
    // fact side shuffles zero times; both dims stay broadcast-able).
    QueryDef.withOracle("q_join_agg",
      """SELECT n_name, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
             sumExact2(col("o_totalprice")).as("revenue"))
        .orderBy("n_name")
    },

    // Top-K: TakeOrderedAndProject — never a full sort at scale.
    QueryDef.withOracle("q_topk_orders",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // Semi-join shaped filter: customers with at least one high-value order.
    QueryDef.withOracle("q_semijoin",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val hi = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > 100000.0).select("o_custkey")
      Tables(s, dir, "customer")
        .join(hi, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // BLOOM-pruned semi-join (ops/BloomOps.bloomSemiJoin): the dim keys
    // (high-balance customers) collapse into a broadcast BITSET and fact
    // rows that fail the probe drop in the scan, BEFORE the exchange the
    // exact confirming semi-join shuffles — at 100 TB the pattern that
    // makes "keep only rows whose id is in this billion-key list" one
    // cheap pass instead of a full-fact shuffle. The probe is a native
    // codegen'd expression; false negatives are impossible (build and
    // probe share one deterministic hash family), so the oracle is the
    // PLAIN semi-join with no Bloom arithmetic. BloomOpsSpec pins the
    // measured prune ratio and the scan-side placement.
    QueryDef.withOracle("q_bloom_semijoin",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      graft.ops.BloomOps.bloomSemiJoin(
          Tables(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
          "o_custkey",
          Tables(s, dir, "customer").filter(col("c_acctbal") > 9000.0),
          "c_custkey",
          numBits = 1 << 16, numHashes = 5)
        .orderBy("o_orderkey")
    },

    // Analytic window: each customer's top-2 orders by price. The window
    // partitions by customer — parallelism scales with customers, and
    // AQE-coalesced exchanges keep small partitions merged. (Window
    // functions are absent from the reference, SURVEY §2.4 — extension.)
    QueryDef.withOracle("q_top_orders_per_cust",
      """SELECT o_custkey, "rank", o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS "rank"
        |  FROM orders)
        |WHERE "rank" <= 2 ORDER BY o_custkey, "rank"""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 2)
        .select("o_custkey", "rank", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rank")
    },

    // BUCKETED co-located join: both sides written ONCE per JVM as
    // bucket-by-key sorted tables (8 buckets on the order key), then the
    // fact-fact join runs with ZERO exchange — bucketed scans feed the
    // SortMergeJoin directly. At 100 TB this is THE technique for repeated
    // fact-fact joins: the shuffle is paid once at write time (layout),
    // not per query. The oracle is the plain join (bucketing is physical
    // only); the no-Exchange plan property is pinned by a spec
    // (RelationalPlanSpec), not just claimed.
    QueryDef.withOracle("q_bucketed_join",
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val (ot, lt) = BucketedStage.tables(s, dir)
      s.table(ot)
        .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sumExact2(col("l_extendedprice")).as("revenue"))
        .orderBy("o_orderpriority")
    }
  )

  /** Bucketed copies of orders/lineitem, written once per JVM per sf dir
    * (external tables under a temp dir): 8 buckets + in-bucket sort on the
    * join key — the layout investment that repeated fact-fact joins
    * amortize against. */
  object BucketedStage {
    private val staged = scala.collection.mutable.Map[String, (String, String)]()
    def tables(s: org.apache.spark.sql.SparkSession, dir: String): (String, String) =
      synchronized {
        staged.getOrElseUpdate(dir, {
          val tag = math.abs(dir.hashCode).toString
          val root = java.nio.file.Files.createTempDirectory("graft-bkt-").toString
          val ot = s"graft_bkt_orders_$tag"
          val lt = s"graft_bkt_lineitem_$tag"
          s.sql(s"DROP TABLE IF EXISTS $ot")
          s.sql(s"DROP TABLE IF EXISTS $lt")
          Tables(s, dir, "orders")
            .write.format("parquet").option("path", s"$root/orders")
            .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ot)
          Tables(s, dir, "lineitem")
            .write.format("parquet").option("path", s"$root/lineitem")
            .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(lt)
          (ot, lt)
        })
      }
  }
}
