package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every implemented operator appears in `queries` (Spark side) and,
  * when ANSI-SQL-expressible, in `oracleSql` (DuckDB side) with
  * IDENTICAL column aliases and a deterministic ORDER BY on both sides.
  * Money/ratio outputs are rounded then cast to DECIMAL in both engines
  * so value hashes are bit-stable across summation orders.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Pricing.pricingSummary(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  // Fixed, deterministic parameters for the parameterized operators.
  private val comparedParts = Seq(25L, 125L, 615L, 1111L)
  private val basketParts = Seq(3L, 42L, 77L, 256L, 512L, 999L, 1024L, 1500L, 1776L, 1999L)
  private val historyPart = 42L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, d) => Pricing.pricingSummary(Tables.lineitem(s, d))),
    "q_search_products" -> ((s, d) =>
      Catalog.searchProducts(Tables.part(s, d),
        nameContains = Some("red"), category = Some("ECONOMY"),
        minSize = Some(1), maxSize = Some(40),
        minPrice = Some(900.0), maxPrice = Some(1800.0),
        limit = 100, offset = 10)),
    "q_price_compare" -> ((s, d) => Pricing.priceCompare(Tables.lineitem(s, d), comparedParts)),
    "q_lowest_price_per_store" -> ((s, d) => Pricing.lowestPricePerStore(Tables.lineitem(s, d))),
    "q_price_history" -> ((s, d) =>
      Pricing.priceHistory(Tables.lineitem(s, d), historyPart, "1996-01-01", "2001-12-31")),
    "q_price_trend" -> ((s, d) => Pricing.priceTrend(Tables.lineitem(s, d))),
    "q_best_basket" -> ((s, d) => Pricing.bestBasket(Tables.lineitem(s, d), basketParts)),
    "q_store_products" -> ((s, d) =>
      Catalog.storeProducts(Tables.lineitem(s, d), Tables.part(s, d), 7L, Some("ECONOMY"))),
    "q_distinct_categories" -> ((s, d) => Catalog.distinctCategories(Tables.part(s, d))),
    "q_distinct_brands" -> ((s, d) => Catalog.distinctBrands(Tables.part(s, d))),
    "q_stats" -> ((s, d) => Catalog.stats(Tables.lineitem(s, d))),
    "q_store_dim" -> ((s, d) =>
      Catalog.storeDim(Tables.supplier(s, d), Tables.nation(s, d), Tables.region(s, d))),
  )

  private val eff = "l_extendedprice*(1-l_discount)"

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | CAST(round(sum(l_quantity),2) AS DECIMAL(18,2)) AS sum_qty,
         | CAST(round(sum(l_extendedprice),2) AS DECIMAL(18,2)) AS sum_base_price,
         | CAST(round(sum($eff),2) AS DECIMAL(18,2)) AS sum_disc_price,
         | CAST(round(sum($eff*(1+l_tax)),2) AS DECIMAL(18,2)) AS sum_charge,
         | CAST(round(avg(l_quantity),2) AS DECIMAL(18,2)) AS avg_qty,
         | CAST(round(avg(l_extendedprice),2) AS DECIMAL(18,2)) AS avg_price,
         | CAST(round(avg(l_discount),4) AS DECIMAL(18,4)) AS avg_disc,
         | count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_search_products" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size,
        | CAST(round(p_retailprice,2) AS DECIMAL(18,2)) AS retail_price
        |FROM part
        |WHERE lower(p_name) LIKE '%red%' AND p_type = 'ECONOMY'
        |  AND p_size BETWEEN 1 AND 40 AND p_retailprice BETWEEN 900.0 AND 1800.0
        |ORDER BY p_partkey LIMIT 100 OFFSET 10""".stripMargin,
    "q_price_compare" ->
      s"""SELECT l_partkey, l_suppkey,
         | CAST(round(min(l_extendedprice),2) AS DECIMAL(18,2)) AS list_price,
         | CAST(round(min($eff),2) AS DECIMAL(18,2)) AS effective_price,
         | CAST(round(min(l_extendedprice) - min($eff),2) AS DECIMAL(18,2)) AS savings,
         | count(*) AS n_observations
         |FROM lineitem WHERE l_partkey IN (25,125,615,1111)
         |GROUP BY l_partkey, l_suppkey
         |ORDER BY l_partkey, effective_price, l_suppkey""".stripMargin,
    "q_lowest_price_per_store" ->
      s"""WITH eff AS (SELECT l_suppkey, l_partkey, $eff AS eff FROM lineitem),
         |m AS (SELECT l_suppkey, min(eff) AS min_eff FROM eff GROUP BY 1),
         |w AS (SELECT DISTINCT e.l_suppkey, e.l_partkey, e.eff
         |      FROM eff e JOIN m ON e.l_suppkey = m.l_suppkey AND e.eff = m.min_eff)
         |SELECT l_suppkey, l_partkey,
         | CAST(round(eff,2) AS DECIMAL(18,2)) AS effective_price,
         | CAST(round((max(eff) OVER () - eff) / max(eff) OVER () * 100,1) AS DECIMAL(18,1)) AS savings_percent
         |FROM w ORDER BY l_suppkey, l_partkey""".stripMargin,
    "q_price_history" ->
      s"""SELECT l_partkey, l_suppkey, l_shipdate AS collected_at,
         | CAST(round(l_extendedprice,2) AS DECIMAL(18,2)) AS price,
         | CAST(round($eff,2) AS DECIMAL(18,2)) AS effective_price,
         | l_orderkey, l_linenumber
         |FROM lineitem
         |WHERE l_partkey = 42 AND l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate <= TIMESTAMP '2001-12-31'
         |ORDER BY collected_at DESC, l_orderkey, l_linenumber""".stripMargin,
    "q_price_trend" ->
      s"""WITH t AS (SELECT l_partkey,
         |  avg(CASE WHEN l_shipdate >= TIMESTAMP '1999-06-01' THEN $eff END) AS r_avg,
         |  avg(CASE WHEN l_shipdate < TIMESTAMP '1999-06-01' THEN $eff END) AS o_avg
         | FROM lineitem GROUP BY l_partkey)
         |SELECT l_partkey,
         | CAST(round(r_avg,2) AS DECIMAL(18,2)) AS recent_avg,
         | CAST(round(o_avg,2) AS DECIMAL(18,2)) AS older_avg,
         | CASE WHEN r_avg > o_avg*1.05 THEN 'increasing'
         |      WHEN r_avg < o_avg*0.95 THEN 'decreasing'
         |      ELSE 'stable' END AS trend
         |FROM t WHERE r_avg IS NOT NULL AND o_avg IS NOT NULL
         |ORDER BY l_partkey""".stripMargin,
    "q_best_basket" ->
      s"""WITH pp AS (SELECT l_suppkey, l_partkey,
         |  min($eff) AS best_eff, min(l_extendedprice) AS best_list
         | FROM lineitem WHERE l_partkey IN (3,42,77,256,512,999,1024,1500,1776,1999)
         | GROUP BY l_suppkey, l_partkey)
         |SELECT l_suppkey, count(*) AS n_products,
         | CAST(round(sum(best_eff),2) AS DECIMAL(18,2)) AS total_price,
         | CAST(round(sum(best_list - best_eff),2) AS DECIMAL(18,2)) AS total_savings,
         | CAST(round(avg(best_eff),2) AS DECIMAL(18,2)) AS avg_price_per_product
         |FROM pp GROUP BY l_suppkey
         |ORDER BY n_products DESC, total_price, l_suppkey LIMIT 10""".stripMargin,
    "q_store_products" ->
      s"""SELECT p_partkey, p_name, p_brand, p_type,
         | CAST(round(min($eff),2) AS DECIMAL(18,2)) AS best_price,
         | count(*) AS n_observations
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_suppkey = 7 AND p_type = 'ECONOMY'
         |GROUP BY p_partkey, p_name, p_brand, p_type
         |ORDER BY p_partkey LIMIT 100""".stripMargin,
    "q_distinct_categories" ->
      "SELECT DISTINCT p_type AS category FROM part ORDER BY category",
    "q_distinct_brands" ->
      "SELECT DISTINCT p_brand AS brand FROM part ORDER BY brand",
    "q_stats" ->
      """SELECT count(*) AS total_observations,
        | count(DISTINCT l_suppkey) AS total_stores,
        | count(DISTINCT l_partkey) AS total_products,
        | count(CASE WHEN l_discount > 0 THEN 1 END) AS on_promo,
        | CAST(round(avg(l_extendedprice),2) AS DECIMAL(18,2)) AS avg_price,
        | CAST(round(count(CASE WHEN l_discount > 0 THEN 1 END) * 100.0 / count(*),1) AS DECIMAL(18,1)) AS promo_percent
        |FROM lineitem""".stripMargin,
    "q_store_dim" ->
      """SELECT r_name AS region, n_name AS nation, count(*) AS n_suppliers,
        | CAST(round(avg(s_acctbal),2) AS DECIMAL(18,2)) AS avg_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY region, nation""".stripMargin,
  )
}
