package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.StableStats

/** Catalog / dimension queries: product search, per-store listings,
  * distinct dimensions, global stats.
  *
  * Reference semantics:
  *   - reference/salim/app/server/routes/products.py:20 `search_products`
  *     (name ILIKE + category/brand equality + price range + pagination),
  *   - supermarkets.py:39 `get_supermarket_products` (per-store filtered
  *     listing with pagination),
  *   - utils.py:12/24 `get_categories`/`get_brands` (DISTINCT dims),
  *   - utils.py:35 `get_stats` (global counts, promo share, avg price).
  *
  * Mapping: product catalog = `part` (p_type = category, p_brand = brand),
  * store dim = `supplier` (+ nation/region geo).
  *
  * Scale posture: all filters are sargable and reach the parquet scan;
  * pagination is deterministic (sort on unique key before limit/offset);
  * the store-products join broadcasts the `part` dimension; DISTINCT on a
  * low-cardinality column is a partial-agg shuffle of a few bytes.
  */
object Catalog {

  /** Multi-filter product search with deterministic pagination.
    *
    * `onPromo`/`storeId` mirror the reference's promo and
    * supermarket_id filters (products.py:49–62): there a product row IS
    * a (store, product) observation, so here a product qualifies when an
    * observation in `li` (scoped to `storeId` when given) matches the
    * promo condition — promo ⇔ l_discount > 0, regular ⇔ l_discount = 0.
    * Implemented as a semi-join against the DISTINCT qualifying
    * partkeys: the fact side collapses map-side to unique keys before
    * the join shuffle, so the catalog never rides through a fact-sized
    * shuffle. */
  def searchProducts(
      part: DataFrame,
      nameContains: Option[String] = None,
      category: Option[String] = None,
      brand: Option[String] = None,
      minSize: Option[Int] = None,
      maxSize: Option[Int] = None,
      minPrice: Option[Double] = None,
      maxPrice: Option[Double] = None,
      li: Option[DataFrame] = None,
      onPromo: Option[Boolean] = None,
      storeId: Option[Long] = None,
      limit: Int = 100,
      offset: Int = 0,
      bestMatchFor: Option[String] = None): DataFrame = {
    require(li.isDefined || (onPromo.isEmpty && storeId.isEmpty),
      "onPromo/storeId filters need the observations frame (li)")
    var df = part
    nameContains.foreach(q => df = df.filter(lower(col("p_name")).contains(q.toLowerCase)))
    category.foreach(c => df = df.filter(col("p_type") === c))
    brand.foreach(b => df = df.filter(lower(col("p_brand")).contains(b.toLowerCase)))
    minSize.foreach(s => df = df.filter(col("p_size") >= s))
    maxSize.foreach(s => df = df.filter(col("p_size") <= s))
    minPrice.foreach(p => df = df.filter(col("p_retailprice") >= p))
    maxPrice.foreach(p => df = df.filter(col("p_retailprice") <= p))
    if (onPromo.isDefined || storeId.isDefined) {
      var obs = li.get
      storeId.foreach(s => obs = obs.filter(col("l_suppkey") === s))
      onPromo.foreach(p =>
        obs = obs.filter(if (p) col("l_discount") > 0 else col("l_discount") === 0))
      df = df.join(obs.select(col("l_partkey").as("p_partkey")).distinct(),
        Seq("p_partkey"), "left_semi")
    }
    val paged = df
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        col("p_size"), round(col("p_retailprice"), 2).as("retail_price"))
      .orderBy("p_partkey")
      .offset(offset)
      .limit(limit)
    // mcp.py:330–338 best-match pick: among the returned results (in
    // result order), prefer the first whose name contains the query or
    // is contained in it (bidirectional ILIKE containment); fall back
    // to the first result. A rank-and-limit over the ALREADY-paginated
    // set (≤ `limit` rows), so cost is nil at any scale.
    bestMatchFor.fold(paged) { bm =>
      val q = bm.toLowerCase
      paged
        .withColumn("matched",
          lower(col("p_name")).contains(q) || lit(q).contains(lower(col("p_name"))))
        .orderBy(col("matched").desc, col("p_partkey"))
        .limit(1)
    }
  }

  /** Trigram fuzzy-name search — the Spark twin of the reference's
    * pg_trgm GIN index (tables.sql:2 `CREATE EXTENSION pg_trgm`, :48
    * GIN (canonical_name gin_trgm_ops)): rank catalog names by Jaccard
    * similarity between character-3-gram sets of the lowercased name
    * and the query, keep those at/above `threshold` (0.3 = pg_trgm's
    * default similarity_threshold), best first.
    *
    * Shape: gram positions explode through codegen `sequence` +
    * `substring` (no interpreted lambda); per-name distinct-gram and
    * shared-distinct-gram counts come from ONE partial-combined
    * aggregation keyed by the unique part key, with the query's gram
    * set folded in as an `IN <literal set>` predicate — no join at
    * all for a single query. The `shared > 0` filter is the GIN
    * index-probe semantic (only names sharing ≥1 trigram are scored).
    * At catalog scales where even one gram pass per query is too much,
    * persist the exploded (gram, p_partkey, n_grams) frame as parquet
    * bucketed by gram — the literal GIN analog — and semi-join the
    * query grams against it; the scoring aggregate is unchanged. */
  def fuzzySearch(
      part: DataFrame,
      query: String,
      threshold: Double = 0.3,
      limit: Int = 10): DataFrame = {
    val q = query.toLowerCase
    val qGrams: Seq[String] = (0 to q.length - 3).map(i => q.substring(i, i + 3)).distinct
    require(qGrams.nonEmpty, "query must be at least 3 characters")
    val stats = part
      .select(col("p_partkey"), col("p_name"), lower(col("p_name")).as("s"))
      .filter(length(col("s")) >= 3)
      .select(col("p_partkey"), col("p_name"), col("s"),
        explode(sequence(lit(1), length(col("s")) - 2)).as("pos"))
      .select(col("p_partkey"), col("p_name"), expr("substring(s, pos, 3)").as("g"))
      // explicit distinct-then-count instead of countDistinct: the
      // distinct partial-aggregates map-side on (key, gram) and ships
      // each gram once, where countDistinct's Expand doubles the gram
      // stream through the first exchange
      .distinct()
      .groupBy("p_partkey", "p_name")
      .agg(
        count(lit(1)).as("n_grams"),
        count(when(col("g").isInCollection(qGrams), lit(1))).as("shared"))
      .filter(col("shared") > 0)
    rankBySimilarity(stats, qGrams.size, threshold, limit)
  }

  /** Shared scoring tail of the fuzzy-search family: trigram Jaccard
    * from (n_grams, shared), threshold, best-first deterministic cut. */
  private def rankBySimilarity(
      stats: DataFrame, nQueryGrams: Int, threshold: Double, limit: Int): DataFrame =
    stats
      .withColumn("similarity",
        round(col("shared").cast("double") /
          (col("n_grams") + lit(nQueryGrams) - col("shared")), 6))
      .filter(col("similarity") >= threshold)
      .select(col("p_partkey"), col("p_name"), col("similarity"))
      .orderBy(col("similarity").desc, col("p_partkey"))
      .limit(limit)

  /** Persisted trigram inverted index — the literal GIN analog
    * (tables.sql:48): one row per (name, distinct gram) with the
    * name's total distinct-gram count riding along, so a probe needs
    * no second pass over the catalog. Build once, write as parquet
    * (ideally sorted/bucketed by `g` so posting-list probes prune at
    * the scan); [[fuzzySearchIndexed]] queries it. */
  def trigramIndex(part: DataFrame): DataFrame =
    part
      .select(col("p_partkey"), col("p_name"), lower(col("p_name")).as("s"))
      .filter(length(col("s")) >= 3)
      .select(col("p_partkey"), col("p_name"), col("s"),
        explode(sequence(lit(1), length(col("s")) - 2)).as("pos"))
      .select(col("p_partkey"), col("p_name"), expr("substring(s, pos, 3)").as("g"))
      .distinct()
      // per-name gram totals over the distinct rows: partition = one
      // name's grams (bounded by name length), never a hot key
      .withColumn("n_grams", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("p_partkey", "p_name")))

  /** [[fuzzySearch]] against a prebuilt [[trigramIndex]]: the probe
    * touches ONLY the query's posting lists (`g IN <query grams>` —
    * with a gram-sorted/bucketed parquet index that prunes at the
    * scan, the pg_trgm GIN probe semantic), then scores exactly like
    * the online form (bit-equality asserted in spec). This is the
    * shape that answers a fuzzy query on a 100 TB catalog without
    * scanning it. */
  def fuzzySearchIndexed(
      index: DataFrame,
      query: String,
      threshold: Double = 0.3,
      limit: Int = 10): DataFrame = {
    val q = query.toLowerCase
    val qGrams: Seq[String] = (0 to q.length - 3).map(i => q.substring(i, i + 3)).distinct
    require(qGrams.nonEmpty, "query must be at least 3 characters")
    val stats = index
      .filter(col("g").isInCollection(qGrams))
      .groupBy("p_partkey", "p_name", "n_grams")
      .agg(count(lit(1)).as("shared"))
    rankBySimilarity(stats, qGrams.size, threshold, limit)
  }

  /** Products offered by one store with their best observed price
    * (supermarkets.py get_supermarket_products; `search` is the
    * canonical_name ILIKE filter of supermarkets.py:55). `part` is
    * broadcast with both filters applied before the join. */
  def storeProducts(
      li: DataFrame,
      part: DataFrame,
      suppkey: Long,
      category: Option[String] = None,
      search: Option[String] = None,
      limit: Int = 100): DataFrame = {
    var dim = category.fold(part)(c => part.filter(col("p_type") === c))
    search.foreach(q => dim = dim.filter(lower(col("p_name")).contains(q.toLowerCase)))
    li.filter(col("l_suppkey") === suppkey)
      .join(broadcast(dim), col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey", "p_name", "p_brand", "p_type")
      .agg(
        round(min(Pricing.effPrice), 2).as("best_price"),
        count(lit(1)).as("n_observations"))
      .orderBy("p_partkey")
      .limit(limit)
  }

  /** DISTINCT product categories (utils.py get_categories). */
  def distinctCategories(part: DataFrame): DataFrame =
    part.select(col("p_type").as("category")).distinct().orderBy("category")

  /** DISTINCT brands (utils.py get_brands). */
  def distinctBrands(part: DataFrame): DataFrame =
    part.select(col("p_brand").as("brand")).distinct().orderBy("brand")

  /** Global scalar stats (utils.py get_stats): totals, promo share, avg
    * price. Single full-scan aggregate with partial combine. */
  def stats(li: DataFrame): DataFrame =
    li.agg(
        count(lit(1)).as("total_observations"),
        countDistinct(col("l_suppkey")).as("total_stores"),
        countDistinct(col("l_partkey")).as("total_products"),
        count(when(col("l_discount") > 0, 1)).as("on_promo"),
        StableStats.stableAvg(col("l_extendedprice"), 2).as("avg_price"))
      .withColumn("promo_percent",
        round(col("on_promo") * 100.0 / col("total_observations"), 1))

  /** Single-store profile card (mcp.py:519 handle_get_store_info):
    * the store dimension row plus aggregated product statistics —
    * distinct products carried, distinct products on promo, sale
    * percentage, distinct categories and their sorted list. One
    * filtered fact scan (store filter pushed to the parquet scan) with
    * a broadcast catalog join; the scalar aggregate rides a broadcast
    * cross join onto the single dimension row. */
  def storeInfo(
      li: DataFrame, part: DataFrame, supplier: DataFrame, storeId: Long): DataFrame = {
    val obs = li.filter(col("l_suppkey") === storeId)
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
    val agg = obs.agg(
      countDistinct("l_partkey").as("total_products"),
      countDistinct(when(col("l_discount") > 0, col("l_partkey"))).as("products_on_sale"),
      countDistinct("p_type").as("categories_available"),
      concat_ws(",", array_sort(collect_set("p_type"))).as("category_list"))
    supplier.filter(col("s_suppkey") === storeId)
      .select(col("s_suppkey").as("store_id"), col("s_name").as("store_name"))
      .crossJoin(broadcast(agg))
      .withColumn("sale_percentage",
        round(col("products_on_sale") * 100.0 / col("total_products"), 2))
      .select(col("store_id"), col("store_name"), col("total_products"),
        col("products_on_sale"), col("sale_percentage"),
        col("categories_available"), col("category_list"))
  }

  /** Multi-granularity catalog stats via ROLLUP: (category, brand)
    * cells, per-category subtotals, and the grand total in ONE pass —
    * Spark's Expand + partial aggregation keeps it a single shuffle
    * over grouping-set-tagged rows instead of three scans unioned. The
    * OLAP form of the `/stats` endpoint for dashboard drill-down.
    * Subtotal rows are labeled 'ALL' (these dims carry no real nulls),
    * which also keeps oracle ordering engine-neutral: Spark sorts ASC
    * NULLS FIRST, DuckDB NULLS LAST, so sorting on labels instead of
    * grouping nulls sidesteps the divergence. */
  def statsRollup(part: DataFrame): DataFrame =
    part.rollup(col("p_type").as("category"), col("p_brand").as("brand"))
      .agg(
        count(lit(1)).as("n_products"),
        StableStats.stableAvg(col("p_retailprice"), 2).as("avg_price"),
        round(min(col("p_retailprice")), 2).as("min_price"),
        round(max(col("p_retailprice")), 2).as("max_price"))
      .select(
        coalesce(col("category"), lit("ALL")).as("category"),
        coalesce(col("brand"), lit("ALL")).as("brand"),
        col("n_products"), col("avg_price"), col("min_price"), col("max_price"))
      .orderBy("category", "brand")

  /** Approximate global stats — the 100 TB form of `stats`: HLL++
    * distinct counts and approximate price quantiles replace exact
    * countDistinct (whose dedup shuffle dominates at scale). Bounded
    * error, single pass, mergeable sketches. Rows-only check (sketch
    * results are engine-specific); accuracy asserted in spec. */
  def statsApprox(li: DataFrame): DataFrame =
    li.agg(
        count(lit(1)).as("total_observations"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("approx_stores"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_products"),
        // one quantile sketch serves every requested percentile
        percentile_approx(col("l_extendedprice"), array(lit(0.5), lit(0.95)), lit(1000))
          .as("price_quantiles"))
      .select(col("total_observations"), col("approx_stores"), col("approx_products"),
        col("price_quantiles").getItem(0).as("median_price"),
        col("price_quantiles").getItem(1).as("p95_price"))

  /** Cheaper-substitute suggestions (the reference chatbot's "suggest
    * cheaper substitutes", salim/app README): products whose names share
    * tokens with the target (same category), carrying a lower best
    * observed price. Token-overlap candidates come from an inverted
    * token index (equi-join on token, never all-pairs), prices from a
    * per-product min aggregate joined back. */
  def substitutes(
      li: DataFrame,
      part: DataFrame,
      targetPartKey: Long,
      minShared: Int = 1,
      limit: Int = 10): DataFrame = {
    val toks = part.select(col("p_partkey"), col("p_type"), col("p_name"),
        explode(split(lower(col("p_name")), " ", -1)).as("tok"))
    val target = toks.filter(col("p_partkey") === targetPartKey)
      .select(col("tok"), col("p_type").as("t_type"))
    val candidates = toks
      .join(broadcast(target), Seq("tok"))
      .filter(col("p_type") === col("t_type") && col("p_partkey") =!= targetPartKey)
      .groupBy("p_partkey", "p_name")
      .agg(countDistinct("tok").as("shared_tokens"))
      .filter(col("shared_tokens") >= minShared)
    val bestPrice = li.groupBy(col("l_partkey")).agg(min(Pricing.effPrice).as("best_eff"))
    val targetPrice = bestPrice.filter(col("l_partkey") === targetPartKey)
      .select(col("best_eff").as("target_price"))
    candidates
      .join(bestPrice, col("p_partkey") === col("l_partkey"))
      .crossJoin(broadcast(targetPrice))
      .filter(col("best_eff") < col("target_price"))
      .select(col("p_partkey"), col("p_name"), col("shared_tokens"),
        round(col("best_eff"), 2).as("best_price"),
        round(col("target_price") - col("best_eff"), 2).as("savings"))
      .orderBy(col("best_price"), col("p_partkey"))
      .limit(limit)
  }

  /** Filtered store-dimension lookup (mcp.py:469 handle_get_stores:
    * city/name ILIKE %..% filters over the supermarkets table). Mapping:
    * store = supplier, city = nation name. Pure dimension scan with
    * sargable contains-filters + broadcast geo joins — no fact table. */
  def storeLookup(
      supplier: DataFrame,
      nation: DataFrame,
      region: DataFrame,
      nameContains: Option[String] = None,
      cityContains: Option[String] = None): DataFrame = {
    var dim = supplier
    nameContains.foreach(q => dim = dim.filter(lower(col("s_name")).contains(q.toLowerCase)))
    val geo = dim
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
    val filtered = cityContains.fold(geo)(q =>
      geo.filter(lower(col("n_name")).contains(q.toLowerCase)))
    filtered.select(
        col("s_suppkey").as("store_id"),
        col("s_name").as("store_name"),
        col("n_name").as("city"),
        col("r_name").as("region"))
      .orderBy("store_id")
  }

  /** Store dimension rollup: suppliers per region/nation with average
    * account balance — broadcast snowflake joins (supermarkets listing). */
  def storeDim(supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        StableStats.stableAvg(col("s_acctbal"), 2).as("avg_acctbal"))
      .orderBy("region", "nation")
}
