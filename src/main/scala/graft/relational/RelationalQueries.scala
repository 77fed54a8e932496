package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics over the star schema — the beyond-reference
  * workload that exercises the engine at real data volume (lineitem is the
  * fact table: ~600 K rows at sf0.1, the 100 TB table in production).
  *
  * Scale design, per query:
  *   - scans read only referenced columns (ReadSchema pruning) and push
  *     filters into the parquet reader (PushedFilters);
  *   - dimension joins (nation/region/customer at TPC-H ratios) broadcast —
  *     the fact side never shuffles for them;
  *   - aggregates are partial map-side before the single shuffle;
  *   - top-k is TakeOrderedAndProject, never a global sort.
  *
  * Money sums go through DECIMAL(18,4) so totals are exact and independent
  * of float summation order (the per-row product is a single double op,
  * deterministic on both engines).
  */
object RelationalQueries {

  private[relational] def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** revenue term: exact decimal of the per-row double product. Shared
    * with TpchMoreQueries — the money-decimal contract has ONE home. */
  private[relational] val revenue =
    (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast("decimal(18,4)")

  /** timestamp literal for the fixture's date columns. */
  private[relational] def date(d: String) = lit(d).cast("timestamp")

  /** Q18's large-order cut (the canonical TPC-H value). */
  val Q18MinQty = 300

  /** Q17's part filter (the fixture has no p_container; the brand cut
    * alone stands in for Brand+container selectivity). */
  val Q17Brand = "Brand#23"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-shaped pricing summary: single scan, partial agg, one shuffle
    "q1_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= date("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_base_price"),
          sum(revenue).cast("double").as("sum_disc_price"),
          count("*").as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // revenue by nation: fact ⋈ three broadcast dimensions, one shuffle agg
    "q5_nation_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val supp = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(revenue).cast("double").as("revenue"),
          count("*").as("n_items"))
        .orderBy("r_name", "n_name")
    }),

    // TPC-H Q3-shaped shipping priority: segment-filtered customer
    // dimension broadcasts; the orders filter pushes to its scan before
    // the fact join; unshipped revenue aggregates per order and the
    // result is a TakeOrdered top-10, never a global sort. Dates flow as
    // integer epoch-µs so the output is engine-neutral. NOTE: true TPC-H
    // Q3 groups by o_shippriority, which the fixture's orders table does
    // not carry — o_orderpriority substitutes (same plan shape; the
    // substitution is declared here and in the README row).
    "q3_shipping_priority" -> ((s, dir) => {
      val cutoff = date("1995-03-15")
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        // the file's TIMESTAMP_NTZ needs an explicit cast before
        // unix_micros; the session is pinned to UTC so the wall time IS
        // the epoch time, matching DuckDB's epoch_us on the naive value
        .groupBy(col("l_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_date_us"),
          col("o_orderpriority"))
        .agg(sum(revenue).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_date_us"), col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q17 (small-quantity-order revenue): the correlated-subquery
    // shape `l_quantity < 0.2 * (SELECT avg(...) WHERE same part)`,
    // decorrelated into a single window pass instead of the textbook
    // aggregate+self-join: ONE scan of lineitem (brand-filtered through
    // the broadcast part dimension, so the shuffle moves 1/#brands of
    // the fact), windowed per-part sum+count, then the threshold test
    // cross-multiplied into exact arithmetic — `qty·5·cnt < sum_qty`
    // never computes the float average that would make the cut
    // partition-order-dependent across engines.
    "q17_small_quantity_revenue" -> ((s, dir) => {
      val pf = t(s, dir, "part").filter(col("p_brand") === Q17Brand)
        .select("p_partkey")
      val w = Window.partitionBy("l_partkey")
      t(s, dir, "lineitem")
        .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"),
          col("l_quantity").cast("decimal(18,2)").as("qty"),
          col("l_extendedprice").cast("decimal(18,2)").as("price"))
        .withColumn("sum_qty", sum("qty").over(w))
        .withColumn("cnt", count("*").over(w))
        .filter(col("qty") * 5 * col("cnt") < col("sum_qty"))
        .agg((sum("price").cast("double") / 7.0).as("avg_yearly"))
    }),

    // TPC-H Q18 (large-volume customers): the aggregate-semi-join shape —
    // a HAVING over the fact table's per-order quantity sum selects the
    // big orders, then the survivors join back to orders/customer. Plan:
    // ONE corpus-sized shuffle (the partial-agg'd groupBy over lineitem);
    // everything after runs on the tiny survivor set, with the customer
    // dimension broadcast. The decimal sum keeps the HAVING cut exact —
    // a double sum could flip a boundary order across partitionings.
    "q18_large_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"))
        .filter(col("sum_qty") > Q18MinQty)
      big.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_date_us"),
          col("o_totalprice"), col("sum_qty").cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // top-10 customers by revenue: fact ⋈ orders ⋈ customer, then top-k
    "top_customers_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(sum(revenue).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)
    }),

    // top-3 customers per nation: the windowed top-k-per-group pattern —
    // one shuffle on the partition key, per-partition sort, rank filter;
    // unlike the global top-k there is no TakeOrdered shortcut, so this
    // is the shape that matters when "top k" is per-entity at scale.
    // The pre-aggregation (groupBy before the window) bounds the sorted
    // data to one row per (nation, customer); note window parallelism is
    // capped at #nations — with huge groups and few keys, switch to a
    // per-partition-heap + merge two-stage top-k instead
    "top_customers_per_nation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      val rev = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "c_custkey")
        .agg(sum(revenue).cast("double").as("revenue"))
      rev.withColumn("rnk", row_number().over(
          Window.partitionBy("n_name")
            .orderBy(col("revenue").desc, col("c_custkey"))).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("n_name"), col("rnk"), col("c_custkey"), col("revenue"))
        .orderBy("n_name", "rnk")
    }),

    // the same top-3-per-nation by the TWO-STAGE shape the windowed form's
    // comment names: when groups are huge and keys few, one window per
    // group serializes on #groups tasks. Stage 1 salts each group into 8
    // sub-partitions and takes a partial top-3 per (group, salt) — 8×
    // the parallelism, each sub-partition a per-partition heap; stage 2
    // re-ranks the ≤ 24 survivors per group. Identical output (a true
    // top-3 always survives its salt's top-3), checked against the SAME
    // oracle as the single-window form.
    "top_customers_per_nation_2stage" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      val rev = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "c_custkey")
        .agg(sum(revenue).cast("double").as("revenue"))
      val partial = rev
        .withColumn("salt", pmod(graft.hash.Fnv1a32
          .fnv1a32(col("c_custkey").cast("string")), lit(8L)))
        .withColumn("prnk", row_number().over(
          Window.partitionBy("n_name", "salt")
            .orderBy(col("revenue").desc, col("c_custkey"))))
        .filter(col("prnk") <= 3)
      partial.withColumn("rnk", row_number().over(
          Window.partitionBy("n_name")
            .orderBy(col("revenue").desc, col("c_custkey"))).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("n_name"), col("rnk"), col("c_custkey"), col("revenue"))
        .orderBy("n_name", "rnk")
    }),

    // selective filter + projection: the pushdown showcase (PushedFilters
    // carries the equality AND the string-contains predicate into the
    // parquet reader; predicates chosen to stay non-empty at every SF)
    "filter_pushdown_scan" -> ((s, dir) =>
      t(s, dir, "part")
        .filter(col("p_size") === 15 && col("p_name").contains("a"))
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")),

    // TPC-H Q4-shaped priority check: the EXISTS shape — orders with at
    // least one late lineitem (shipped > 60 days after order; the fixture
    // carries no l_commitdate/l_receiptdate, so ship-vs-order lateness
    // substitutes). Plans as a LEFT SEMI join with the non-equi lateness
    // predicate attached to the orderkey equi-join: each order emits at
    // most once no matter how many lines are late — no DISTINCT, no
    // post-join dedup, and the date filter pushes to the orders scan.
    "q4_order_priority" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= date("1995-01-01") &&
          col("o_orderdate") < date("1996-01-01"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      ord.join(li,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count("*").as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q13 (customer order-count distribution): the outer-join-
    // distribution shape, built scale-right — orders pre-aggregate to one
    // row per customer BEFORE the outer join (classic Q13 joins first and
    // drags every order row through the join; pre-shrinking moves the
    // same one corpus shuffle but joins #customers × #customers rows).
    // Customers with no qualifying order surface through the LEFT join as
    // coalesce(0) — the bucket the inner-join form silently drops.
    "q13_customer_distribution" -> ((s, dir) => {
      val perCust = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy("o_custkey").agg(count("*").as("n"))
      t(s, dir, "customer").select("c_custkey")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("n"), lit(0L)).as("c_count"))
        .groupBy("c_count").agg(count("*").as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q16-shaped supplier diversity: the NOT-IN anti-join +
    // count-distinct shape (the oracle spells it NOT EXISTS — the
    // null-safe form that matches LEFT ANTI semantics even if a
    // regenerated fixture ever carried a NULL supplier key; NOT IN
    // would go all-NULL). The part cut broadcasts (brand/type/size
    // predicates prune the dimension before it ever meets the fact), the
    // excluded-supplier set broadcasts as a LEFT ANTI join (the fixture
    // has no supplier comments — the low-balance cut `s_acctbal < 1000`
    // stands in, declared here and in the README row), and the distinct
    // count runs as Spark's two-level partial-distinct aggregate — the
    // fact table shuffles once, on the group keys.
    "q16_supplier_cnt" -> ((s, dir) => {
      val pf = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#45" &&
          !col("p_type").startsWith("MEDIUM") &&
          col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val excl = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 1000).select("s_suppkey")
      t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc,
          col("p_brand"), col("p_type"), col("p_size"))
    }),

    // TPC-H Q14 (promo revenue share): the conditional-aggregate-ratio
    // shape — both the filtered and the total sum come out of ONE pass
    // over the month's lineitem (a WHERE p_type='PROMO' twin query would
    // scan twice). Sums stay exact decimal; the percentage is written as
    // the same two double ops on both engines (100·promo, then /total)
    // so the final double is bit-identical.
    "q14_promo_revenue" -> ((s, dir) => {
      val pf = t(s, dir, "part").select("p_partkey", "p_type")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= date("1995-09-01") &&
          col("l_shipdate") < date("1995-10-01"))
        .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", revenue)
            .otherwise(lit(0).cast("decimal(18,4)"))).cast("double")
            .as("promo_revenue"),
          sum(revenue).cast("double").as("total_revenue"),
          count("*").as("n_items"))
        .withColumn("promo_pct",
          lit(100.0) * col("promo_revenue") / col("total_revenue"))
    }),

    // TPC-H Q19 (disjunctive brand/size/quantity bands): the OR-of-ANDs
    // join predicate that mixes columns from BOTH sides. Catalyst splits
    // the disjunction per side — the part scan receives the OR of the
    // brand+size conjunctions and the lineitem scan the OR of the
    // quantity bands (both visible as PushedFilters, plan-pinned) — so
    // each scan prunes before the join instead of evaluating the full
    // predicate on the joined stream. Third band is empty at sf0.001 by
    // selectivity; the aggregate stays non-empty from the other two.
    "q19_disjunctive_revenue" -> ((s, dir) => {
      val pf = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
      val bands =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 25)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 35))
      t(s, dir, "lineitem")
        .join(broadcast(pf), col("l_partkey") === col("p_partkey") && bands)
        .agg(sum(revenue).cast("double").as("revenue"),
          count("*").as("n_items"))
    }),

    // TPC-H Q15 (top supplier by quarterly revenue): the filter-by-
    // aggregate-max shape, WITH ties — the per-supplier revenue view is
    // computed once (checkpointed: both its max and the equality cut read
    // the materialized #suppliers-sized view, so the fact table is
    // scanned once — without it the two branches each re-derive the
    // whole view, and plan audit showed no exchange reuse), its 1-row
    // max broadcast back over it, and the equality cut is exact because
    // both sides are the SAME decimal sum (a double max could tie-break
    // differently across engines; decimal cannot).
    // NOTE: localCheckpoint() is EAGER — constructing this DataFrame
    // (even just to print its schema or plan) executes the lineitem
    // scan+aggregate and pins the result's blocks until unpersisted.
    // Verify/Bench unpersist between queries; other callers should be
    // aware construction is not free.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= date("1996-01-01") &&
          col("l_shipdate") < date("1996-04-01"))
        .groupBy("l_suppkey")
        .agg(sum(revenue).as("total_rev"))
        .localCheckpoint()
      val top = rev.agg(max(col("total_rev")).as("max_rev"))
      rev.crossJoin(broadcast(top))
        .filter(col("total_rev") === col("max_rev"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q22-shaped dormant high-balance customers: the decorrelated
    // scalar-subquery + anti-join shape. The above-average-balance cut is
    // the 1-row aggregate broadcast back over the customer scan, compared
    // cross-multiplied in exact decimal (`bal·n > sum` — never the float
    // average, which would make the boundary partition-order-dependent);
    // "dormant" = no order since 2000-01-01, a LEFT ANTI join against the
    // date-pruned orders scan (every customer in the fixture has SOME
    // order, so plain Q22 NOT EXISTS would be empty; the recency cut is
    // the declared substitution).
    "q22_dormant_customers" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val thr = cust.filter(col("c_acctbal") > 0)
        .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("s"),
          count("*").as("n"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= date("2000-01-01"))
        .select("o_custkey")
      cust.crossJoin(broadcast(thr))
        .filter(col("c_acctbal").cast("decimal(18,2)") * col("n") > col("s"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count("*").as("numcust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("totacctbal"))
        .orderBy("n_name")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, epoch_us(o_orderdate) AS o_date_us,
        |  o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_date_us, o_orderpriority
        |ORDER BY revenue DESC, o_date_us, l_orderkey LIMIT 10""".stripMargin,

    "q17_small_quantity_revenue" ->
      s"""SELECT CAST(sum(price) AS DOUBLE) / 7.0 AS avg_yearly FROM (
         |  SELECT CAST(l_quantity AS DECIMAL(18,2)) AS qty,
         |         CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
         |         sum(CAST(l_quantity AS DECIMAL(18,2)))
         |           OVER (PARTITION BY l_partkey) AS sum_qty,
         |         count(*) OVER (PARTITION BY l_partkey) AS cnt
         |  FROM lineitem
         |  JOIN (SELECT p_partkey FROM part WHERE p_brand = '$Q17Brand') p
         |    ON l_partkey = p_partkey
         |) WHERE qty * 5 * cnt < sum_qty""".stripMargin,

    "q18_large_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey,
         |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > $Q18MinQty
         |)
         |SELECT c_custkey, c_name, o_orderkey,
         |       epoch_us(o_orderdate) AS o_date_us, o_totalprice,
         |       CAST(sum_qty AS DOUBLE) AS sum_qty
         |FROM big
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "top_customers_revenue" ->
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,

    "top_customers_per_nation" -> topPerNationSql,

    // the two-stage form must produce the identical top-3: one oracle
    "top_customers_per_nation_2stage" -> topPerNationSql,

    "filter_pushdown_scan" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE p_size = 15 AND p_name LIKE '%a%'
        |ORDER BY p_partkey""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q13_customer_distribution" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, count(*) AS n FROM orders
        |  WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey
        |)
        |SELECT c_count, count(*) AS custdist FROM (
        |  SELECT coalesce(n, 0) AS c_count
        |  FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
        |  AND NOT EXISTS (SELECT 1 FROM supplier
        |                  WHERE s_suppkey = l_suppkey AND s_acctbal < 1000)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q14_promo_revenue" ->
      """SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |                THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
        |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |    AS promo_revenue,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_revenue,
        |  count(*) AS n_items,
        |  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |                THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
        |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS promo_pct
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 25)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 35)""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
        |           AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey
        |)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM rev
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q22_dormant_customers" ->
      """WITH thr AS (
        |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s, count(*) AS n
        |  FROM customer WHERE c_acctbal > 0
        |)
        |SELECT n_name, count(*) AS numcust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         AS totacctbal
        |FROM customer
        |CROSS JOIN thr
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
  )

  private lazy val topPerNationSql: String =
    """WITH rev AS (
      |  SELECT n_name, c_custkey,
      |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name, c_custkey
      |)
      |SELECT n_name, rnk, c_custkey, revenue FROM (
      |  SELECT *, row_number() OVER (PARTITION BY n_name
      |    ORDER BY revenue DESC, c_custkey) AS rnk
      |  FROM rev)
      |WHERE rnk <= 3 ORDER BY n_name, rnk""".stripMargin
}
