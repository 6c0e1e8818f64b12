package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.StableStats

/** Price analytics over the observations fact table (`lineitem`).
  *
  * Reference semantics (WHAT, not HOW):
  *   - reference/salim/app/server/routes/products.py:69 `get_lowest_prices`
  *     (per-store min effective price + join-back + savings%),
  *   - products.py:160 `get_products_by_barcode` (cross-store price
  *     comparison for one product, sorted by effective price),
  *   - products.py:222 `get_price_history` (time-ranged series + trend:
  *     recent-half avg vs older-half avg, ±5% band),
  *   - salim/app/server/routes/mcp.py:309 `handle_find_best_basket`
  *     (stores carrying the whole basket, ranked by total effective price).
  *
  * Mapping: store = l_suppkey, product(barcode) = l_partkey,
  * list price = l_extendedprice, effective (promo) price =
  * l_extendedprice * (1 - l_discount), collected_at = l_shipdate.
  *
  * Scale posture: every operator is a single shuffle on a high-cardinality
  * key (suppkey or partkey) with map-side partial aggregation; no
  * driver-side loops; final tiny post-aggregation steps (global max for
  * savings%) run as windows over the already-reduced result, not the fact
  * table. Money outputs are rounded DOUBLEs (see StableStats) so results
  * are bit-stable across engines and summation orders.
  */
object Pricing {

  /** Effective (promo-adjusted) price of an observation. */
  def effPrice: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  private def ts(s: String): Column = lit(s).cast("timestamp")

  /** Flagship rollup (TPC-H Q1 shape): per return-flag/status price and
    * quantity summary — the "global stats" aggregate family. One shuffle,
    * map-side combine, all codegen'd built-ins. */
  def pricingSummary(li: DataFrame, cutoff: String = "2001-09-02"): DataFrame =
    li.filter(col("l_shipdate") <= ts(cutoff))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        StableStats.stableSum(col("l_quantity"), 2).as("sum_qty"),
        StableStats.stableSum(col("l_extendedprice"), 2).as("sum_base_price"),
        StableStats.stableSum(effPrice, 4).as("sum_disc_price"),
        StableStats.stableSum(effPrice * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        StableStats.stableAvg(col("l_quantity"), 2).as("avg_qty"),
        StableStats.stableAvg(col("l_extendedprice"), 2).as("avg_price"),
        StableStats.stableAvg(col("l_discount"), 2, 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Cross-store price comparison for a product set: per (product, store)
    * best list/effective price, cheapest store first. */
  def priceCompare(li: DataFrame, partKeys: Seq[Long]): DataFrame =
    li.filter(col("l_partkey").isin(partKeys: _*))
      .groupBy("l_partkey", "l_suppkey")
      .agg(
        round(min("l_extendedprice"), 2).as("list_price"),
        round(min(effPrice), 2).as("effective_price"),
        round(min("l_extendedprice") - min(effPrice), 2).as("savings"),
        count(lit(1)).as("n_observations"))
      .orderBy(col("l_partkey"), col("effective_price"), col("l_suppkey"))

  /** Product comparison card (mcp.py:197 `handle_compare_results` /
    * products.py:148 `get_product`): one product's CURRENT state per
    * store — each store's latest observation (the upsert-read
    * semantics of latestPerKey, scoped to one product) joined to the
    * store dimension for names, sorted cheapest-effective first. The
    * partkey filter pushes to the scan, the per-store latest is a
    * window over the already-filtered slice, and the dimension join
    * broadcasts. */
  def productCard(li: DataFrame, supplier: DataFrame, partKey: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_suppkey")
      .orderBy(col("l_shipdate").desc, col("l_orderkey").desc, col("l_linenumber").desc)
    li.filter(col("l_partkey") === partKey)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(supplier.select(col("s_suppkey").as("l_suppkey"), col("s_name"))),
        Seq("l_suppkey"))
      .select(
        col("l_suppkey").as("store_id"),
        col("s_name").as("store_name"),
        col("l_shipdate").as("collected_at"),
        round(col("l_extendedprice"), 2).as("list_price"),
        round(effPrice, 2).as("effective_price"),
        (col("l_discount") > 0).as("on_promo"))
      .orderBy(col("effective_price"), col("store_id"))
  }

  /** Per-store minimum effective price and the product(s) attaining it,
    * with savings% vs the most expensive winning price. The global-max
    * window runs over the |stores|-sized aggregate, never the fact table.
    *
    * `category` (products.py:87–90) scopes observations to one product
    * category via a semi-join against the broadcast filtered catalog;
    * `rowLimit` (products.py:115) keeps only the overall-cheapest
    * winners — mirroring the reference, limited results are ordered
    * cheapest-first and savings% is computed against the max of the
    * RETURNED set. */
  def lowestPricePerStore(
      li: DataFrame,
      part: Option[DataFrame] = None,
      category: Option[String] = None,
      rowLimit: Option[Int] = None): DataFrame = {
    require(part.isDefined || category.isEmpty,
      "category filter needs the product catalog (part)")
    val obs = category.fold(li)(c =>
      li.join(broadcast(part.get.filter(col("p_type") === c)
          .select(col("p_partkey").as("l_partkey"))),
        Seq("l_partkey"), "left_semi"))
    // per-(store, product) mins first as a partial-combined aggregate —
    // a hot store's observation history collapses map-side instead of
    // sorting in one window task (the documented skew hazard) — then the
    // per-store min window runs over at most |catalog| rows per store.
    // Winner set (incl. ties) is identical: eff == store min ⇔ the
    // product's own min == store min. The global max for savings% is a
    // single-partition window over the ALREADY-REDUCED winner set
    // (≤ one row per store), mirroring the oracle's max(eff) OVER ()
    val w = org.apache.spark.sql.expressions.Window
    val perProduct = obs.select(col("l_suppkey"), col("l_partkey"), effPrice.as("eff"))
      .groupBy("l_suppkey", "l_partkey").agg(min("eff").as("eff"))
    val winners = perProduct
      .withColumn("min_eff", min("eff").over(w.partitionBy("l_suppkey")))
      .filter(col("eff") === col("min_eff"))
      .select("l_suppkey", "l_partkey", "eff")
    val returned = rowLimit.fold(winners)(n =>
      winners.orderBy(col("eff"), col("l_suppkey"), col("l_partkey")).limit(n))
    val ranked = returned
      .withColumn("max_eff", max("eff").over(w.partitionBy()))
      .select(
        col("l_suppkey"),
        col("l_partkey"),
        round(col("eff"), 2).as("effective_price"),
        round((col("max_eff") - col("eff")) / col("max_eff") * 100, 1)
          .as("savings_percent"))
    if (rowLimit.isDefined)
      ranked.orderBy("effective_price", "l_suppkey", "l_partkey")
    else ranked.orderBy("l_suppkey", "l_partkey")
  }

  /** Time-ranged price series for one product across stores, newest
    * first (products.py get_price_history). */
  def priceHistory(li: DataFrame, partKey: Long, start: String, end: String): DataFrame =
    li.filter(col("l_partkey") === partKey &&
        col("l_shipdate") >= ts(start) && col("l_shipdate") <= ts(end))
      .select(
        col("l_partkey"), col("l_suppkey"),
        col("l_shipdate").as("collected_at"),
        round(col("l_extendedprice"), 2).as("price"),
        round(effPrice, 2).as("effective_price"),
        col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("collected_at").desc, col("l_orderkey"), col("l_linenumber"))

  /** Per-product price trend: recent-window avg vs older avg, classified
    * increasing/decreasing/stable with the reference's ±5% band. */
  def priceTrend(li: DataFrame, split: String = "1999-06-01"): DataFrame = {
    val recent = col("l_shipdate") >= ts(split)
    li.groupBy("l_partkey")
      .agg(
        (round(sum(when(recent, effPrice)), 4) / count(when(recent, effPrice))).as("r_avg"),
        (round(sum(when(!recent, effPrice)), 4) / count(when(!recent, effPrice))).as("o_avg"))
      .filter(col("r_avg").isNotNull && col("o_avg").isNotNull)
      .select(
        col("l_partkey"),
        round(col("r_avg"), 2).as("recent_avg"),
        round(col("o_avg"), 2).as("older_avg"),
        when(col("r_avg") > col("o_avg") * 1.05, "increasing")
          .when(col("r_avg") < col("o_avg") * 0.95, "decreasing")
          .otherwise("stable").as("trend"))
      .orderBy("l_partkey")
  }

  /** Per-product price-anomaly detection: flag observations more than
    * `sigma` sample standard deviations from the product's mean price —
    * the data-quality screen a price pipeline runs before publishing
    * (bad scrapes, unit-mixups, decimal shifts).
    *
    * Engine-stable by construction: the per-product first/second
    * moments are exact-scale rounded (StableStats), so mean, variance,
    * the σ-threshold comparison, and the emitted z-score are identical
    * deterministic IEEE arithmetic in any engine — no knife-edge flag
    * flips between Spark and the oracle. One aggregation shuffle on
    * l_partkey plus one fact⋈stats join on the same key (stats is
    * |products|-sized; AQE picks broadcast when it fits). */
  def priceAnomalies(li: DataFrame, sigma: Double = 3.0): DataFrame = {
    val stats = li.groupBy("l_partkey")
      .agg(
        count(lit(1)).as("n"),
        StableStats.stableSumRaw(col("l_extendedprice"), 2).as("s1"),
        StableStats.stableSumSqRaw(col("l_extendedprice"), 2).as("s2"))
      .filter(col("n") >= 2)
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("variance",
        (col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
      .withColumn("std", sqrt(greatest(col("variance"), lit(0.0))))
    li.join(stats, "l_partkey")
      .filter(col("std") > 0 &&
        abs(col("l_extendedprice") - col("mean")) > lit(sigma) * col("std"))
      .select(
        col("l_partkey"), col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("price"),
        round(col("mean"), 2).as("mean_price"),
        round((col("l_extendedprice") - col("mean")) / col("std"), 2).as("z_score"))
      .orderBy("l_partkey", "l_orderkey", "l_linenumber")
  }

  /** Best shopping basket (mcp.py find_best_basket): per store, the
    * basket products it carries at their best effective price, ranked by
    * coverage (stores carrying the whole basket first, generalizing the
    * reference's complete-baskets-only filter to sparse data) then total
    * price. Two cascaded aggregations on suppkey-dominant keys — AQE
    * coalesces the second, already-tiny shuffle. */
  def bestBasket(li: DataFrame, partKeys: Seq[Long], topN: Int = 10): DataFrame = {
    val perStoreProduct = li
      .filter(col("l_partkey").isin(partKeys: _*))
      .groupBy("l_suppkey", "l_partkey")
      .agg(min(effPrice).as("best_eff"), min(col("l_extendedprice")).as("best_list"))
    perStoreProduct
      .groupBy("l_suppkey")
      .agg(
        count(lit(1)).as("n_products"),
        StableStats.stableSum(col("best_eff"), 4).as("total_price"),
        StableStats.stableSum(col("best_list") - col("best_eff"), 4).as("total_savings"),
        StableStats.stableAvg(col("best_eff"), 4).as("avg_price_per_product"))
      .orderBy(col("n_products").desc, col("total_price"), col("l_suppkey"))
      .limit(topN)
  }
}
