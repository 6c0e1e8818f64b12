package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.StableStats

/** Purchase-log analytics over the orders/customer side of the schema —
  * the reference's "shopping history" dimension (the order flow feeding
  * the basket assistant: reference/salim/README.md "Smart Shopping
  * Baskets", reference/salim/app/server/routes/mcp.py:309
  * find_best_basket; stats rollups: routes/utils.py:35 get_stats),
  * expressed as the classic multi-way join rollups a 100 TB engine must
  * plan well.
  *
  * Scale posture: fact-fact joins (orders ⋈ lineitem) shuffle on the
  * shared orderkey; customer is mid-sized (shuffle join, AQE decides);
  * nation/region broadcast. Aggregations are partial-combine on
  * high-cardinality grouping keys; top-k uses sort+limit fused into
  * TakeOrderedAndProject (no global sort materialization).
  */
object Purchases {

  private def eff = Pricing.effPrice

  /** Revenue by customer nation for one year, local suppliers only
    * (TPC-H Q5 shape): 6-way join, broadcast dims, single agg. */
  def revenueByNation(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame,
      yearStart: String = "1997-01-01", yearEnd: String = "1998-01-01"): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit(yearStart).cast("timestamp") &&
        col("o_orderdate") < lit(yearEnd).cast("timestamp"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(
        StableStats.stableSum(eff, 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("nation"))

  /** Top open-order values for one market segment (TPC-H Q3 shape):
    * filters pushed to all three scans, top-k fused. */
  def topOpenOrders(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      segment: String = "BUILDING", cutoff: String = "1998-01-01",
      topN: Int = 10): DataFrame =
    customer.filter(col("c_mktsegment") === segment)
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(StableStats.stableSum(eff, 4).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(topN)

  /** Retention cohorts: customers grouped by first-order month, counted
    * by activity month — the classic engagement matrix. */
  def retentionCohorts(orders: DataFrame): DataFrame = {
    // cohort month as a per-customer window min: one scan and one
    // customer-keyed shuffle (the aggregate-then-self-join form scans
    // orders twice — Spark re-executes a subplan per consumer)
    orders
      .withColumn("cohort_month", date_trunc("month",
        min("o_orderdate").over(org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey"))))
      .groupBy(col("cohort_month"),
        date_trunc("month", col("o_orderdate")).as("activity_month"))
      .agg(
        countDistinct("o_custkey").as("n_active_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy("cohort_month", "activity_month")
  }

  /** Retention matrix pivoted wide: per cohort month, distinct active
    * customers 0..`horizon` months after first order — conditional
    * aggregates rather than `pivot` so the column set is static and
    * the plan stays a single pass. */
  def cohortPivot(orders: DataFrame, horizon: Int = 5): DataFrame = {
    val monthsAfter =
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))) -
        (year(col("cohort_month")) * 12 + month(col("cohort_month")))
    val cols = (0 to horizon).map(k =>
      countDistinct(when(col("months_after") === k, col("o_custkey"))).as(s"m$k"))
    // same single-pass window shape as retentionCohorts
    orders
      .withColumn("cohort_month", date_trunc("month",
        min("o_orderdate").over(org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey"))))
      .withColumn("months_after", monthsAfter)
      .groupBy("cohort_month")
      .agg(cols.head, cols.tail: _*)
      .orderBy("cohort_month")
  }

  /** Retail price histogram: fixed-width buckets via width_bucket —
    * single-pass, partial-combine, the distribution view behind the
    * price-range search filters. */
  def priceHistogram(
      part: DataFrame, lo: Double = 900.0, hi: Double = 2100.0, buckets: Int = 12): DataFrame = {
    // explicit width-bucket formula (identical IEEE arithmetic in the
    // DuckDB oracle; built-in width_bucket implementations differ in
    // operation order at bucket boundaries)
    val x = col("p_retailprice")
    val bucket = when(x < lo, 0L)
      .when(x >= hi, buckets + 1L)
      .otherwise(floor((x - lo) / (hi - lo) * buckets) + 1L)
    part.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_products"),
        round(min("p_retailprice"), 2).as("min_price"),
        round(max("p_retailprice"), 2).as("max_price"))
      .orderBy("bucket")
  }

  /** Exact grouped price percentiles (the price-distribution view the
    * stats endpoint implies): Spark's sort-based `percentile` with
    * linear interpolation — DuckDB's quantile_cont twin. */
  def pricePercentiles(part: DataFrame): DataFrame =
    part.groupBy(col("p_type").as("category"))
      .agg(percentile(col("p_retailprice"), lit(0.5)).as("p50_raw"),
        percentile(col("p_retailprice"), lit(0.9)).as("p90_raw"))
      .select(col("category"),
        round(col("p50_raw"), 2).as("p50_price"),
        round(col("p90_raw"), 2).as("p90_price"))
      .orderBy("category")

  /** Per-segment customer stats (the reference's /stats rollup applied
    * to the purchase dimension). */
  def segmentStats(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(
        countDistinct(col("c_custkey")).as("n_customers"),
        count(col("o_orderkey")).as("n_orders"),
        StableStats.stableSum(col("o_totalprice"), 2).as("total_spend"),
        StableStats.stableAvg(col("o_totalprice"), 2).as("avg_order_value"))
      .orderBy("segment")

  /** Per-order sorted distinct item arrays — the shared single-pass
    * basket shape behind [[coPurchasePairs]] and [[basketRules]]: one
    * fact scan, one order-keyed shuffle with map-side combine. */
  private def orderBaskets(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey").as("okey"), col("l_partkey"))
      .groupBy("okey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))

  /** Unordered co-occurrence counts from basket arrays: a<b pairs
    * explode from each sorted array (O(basket²) per order — bounded by
    * basket size, never a corpus-level product — with no self-join and
    * no fact rescan), then one pair-keyed partial-combined count. */
  private def basketPairCounts(baskets: DataFrame, countName: String): DataFrame =
    baskets
      .select(explode(expr(
        """flatten(transform(parts, (x, i) ->
          |  transform(slice(parts, i + 2, size(parts)),
          |    y -> struct(x AS part_a, y AS part_b))))""".stripMargin)).as("p"))
      .select(col("p.part_a"), col("p.part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as(countName))

  /** Frequently-bought-together pairs (market-basket co-occurrence):
    * distinct parts per order, counted per unordered pair, exact
    * top-k. Distinct-within-order (the basket set) so multi-line items
    * (same part, several lines) cannot inflate counts. Top-k is a
    * TakeOrdered with a total (count desc, pair asc) order. */
  def coPurchasePairs(lineitem: DataFrame, k: Int = 20): DataFrame =
    basketPairCounts(orderBaskets(lineitem), "n_orders")
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(k)

  /** The full weighted co-purchase GRAPH (no top-k cut): one basket
    * pass, pair-keyed partial-combined counts — the bounded
    * product-graph input for [[Graph.pageRank]] centrality. */
  def coPurchaseGraph(lineitem: DataFrame, minCount: Long = 1L): DataFrame =
    basketPairCounts(orderBaskets(lineitem), "w")
      .filter(col("w") >= minCount)
      .select(col("part_a").as("src"), col("part_b").as("dst"), col("w"))

  /** Market-basket association rules: support / confidence / lift for
    * the most frequent unordered co-purchase pairs. Builds on the
    * [[coPurchasePairs]] shape (order-keyed self-join over distinct
    * basket items, O(Σ basket²)); per-item order counts join back onto
    * the pair set BY PART KEY after pair aggregation, so the heavy
    * basket join carries part keys only and the metric joins run on
    * the |pairs| and |parts| aggregates, never the fact table. `minCount`
    * prunes the rule set before the metric joins; the final top-k is a
    * TakeOrdered on a total (lift desc, pair asc) order. The ratio math
    * is exact-integer division in double, deterministic IEEE on any
    * engine, snapped at 6 decimals. */
  def basketRules(lineitem: DataFrame, k: Int = 20, minCount: Long = 2L): DataFrame = {
    // ONE wide pass over the baskets emits every count the rule
    // metrics need as kind-tagged keys — (0,·,·) one token per order,
    // (1,part,·) per distinct item, (2,a,b) per a<b pair — through a
    // SINGLE partial-combined shuffle. The resulting aggregate (order
    // count + item supports + minCount-surviving pairs, tiny next to
    // the fact table) is localCheckpoint'd because three consumers
    // branch from it and Spark does not reuse aggregate stages across
    // consumers: without the checkpoint each branch would re-scan the
    // fact table (measured: 3 wide scans), with it the whole rule set
    // costs one scan + one shuffle.
    val counted = orderBaskets(lineitem)
      .select(explode(expr(
        """concat(
          |  array(named_struct('kind', 0L, 'k1', CAST(NULL AS BIGINT),
          |                     'k2', CAST(NULL AS BIGINT))),
          |  transform(parts, x -> named_struct('kind', 1L, 'k1', x,
          |                                     'k2', CAST(NULL AS BIGINT))),
          |  flatten(transform(parts, (x, i) ->
          |    transform(slice(parts, i + 2, size(parts)),
          |      y -> named_struct('kind', 2L, 'k1', x, 'k2', y)))))"""
          .stripMargin)).as("t"))
      .groupBy(col("t.kind").as("kind"), col("t.k1").as("k1"), col("t.k2").as("k2"))
      .agg(count(lit(1)).as("n"))
      .filter(col("kind") < 2 || col("n") >= minCount)
      .localCheckpoint()
    val nOrders = counted.filter(col("kind") === 0)
      .select(col("n").as("n_total"))
    val itemSupport = counted.filter(col("kind") === 1)
      .select(col("k1").as("l_partkey"), col("n").as("n_item"))
    val pairs = counted.filter(col("kind") === 2)
      .select(col("k1").as("part_a"), col("k2").as("part_b"), col("n").as("n_both"))
    pairs
      .join(itemSupport.select(col("l_partkey").as("part_a"), col("n_item").as("n_a")), "part_a")
      .join(itemSupport.select(col("l_partkey").as("part_b"), col("n_item").as("n_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(
        col("part_a"), col("part_b"), col("n_both"), col("n_a"), col("n_b"),
        round(col("n_both").cast("double") / col("n_total"), 6).as("support"),
        round(col("n_both").cast("double") / col("n_a"), 6).as("confidence"),
        // denominator in double BEFORE multiplying: a long product of
        // two web-scale item counts overflows, a double product cannot
        round(col("n_total").cast("double") * col("n_both")
          / (col("n_a").cast("double") * col("n_b")), 6).as("lift"))
      .orderBy(col("lift").desc, col("part_a"), col("part_b"))
      .limit(k)
  }

  /** Late-shipment counts per order priority (TPC-H Q4 shape): orders
    * with ANY line shipped more than `lateDays` after the order date,
    * counted by priority. The EXISTS is a left-semi join carrying the
    * correlated date condition — the semi join stops probing an order
    * on its first late line (never materializes the multiplicity), and
    * both scans keep only the two join/date columns. */
  def latePriorityCounts(
      orders: DataFrame, lineitem: DataFrame, lateDays: Int = 90): DataFrame =
    orders
      .join(lineitem.select("l_orderkey", "l_shipdate"),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy("o_orderpriority")
}
