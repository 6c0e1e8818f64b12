package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution: match a dirty RECORD FEED against a canonical
  * CATALOG by blocked fuzzy-name comparison — the master-data-
  * management step a price-comparison pipeline runs on every ingest
  * (the reference's per-chain product feeds name the same product
  * differently; its fuzzy search, reference `products.py:149`, answers
  * one query — this resolves the whole feed).
  *
  * Scale posture mirrors the tokenizer/dictionary family, NOT the
  * dedup family: the catalog is a BOUNDED dictionary (canonical
  * products grow like a vocabulary, sublinearly in feed volume), so
  * candidate generation is a token-blocking join feed → catalog whose
  * cost is linear in the feed at fixed dictionary — never a feed ×
  * feed self-join. The token blocking index is df-capped on the
  * CATALOG side (tokens naming more than `dfCap` canonicals are
  * stopwords for blocking, the pg_trgm/BM25 df-cap lesson), and the
  * per-pair score is exact integer arithmetic end to end —
  * `levenshtein` similarity and token Jaccard in integer micro units,
  * truncating division — so ranking is engine-portable and the whole
  * match cascade has a FULL DuckDB oracle (`levenshtein` agrees
  * integer-for-integer across engines).
  *
  * Survivorship ([[goldenRecords]]) folds the rank-1 matches into one
  * golden row per canonical entity (match count + exact integer cent
  * price bounds) — the classic merge step after linkage (Fellegi &
  * Sunter 1969 frame the match/ non-match decision; blocking-key
  * candidate generation is the standard scale device).
  */
object Resolution {

  /** Canonical name normalization: lowercase, trim, collapse internal
    * whitespace — applied to BOTH sides before blocking and scoring so
    * case/spacing never masquerade as entity difference. */
  def normalizeName(c: Column): Column =
    trim(regexp_replace(lower(c), " +", " "))

  /** Token blocking index over the catalog: (token, canon_id) pairs
    * with tokens naming more than `dfCap` canonicals dropped — a
    * partial-combined df count + broadcast-able stopword anti-join,
    * the same discipline as the trigram index's df cap. The index is
    * dictionary-sized (tokens-per-name × |catalog|), the artifact a
    * serving path persists. */
  def catalogTokenIndex(catalog: DataFrame, dfCap: Int): DataFrame = {
    require(dfCap >= 1, s"dfCap must be >= 1, got $dfCap")
    val toks = catalog
      .select(col("canon_id"),
        explode(array_distinct(split(normalizeName(col("name")), " ", -1)))
          .as("token"))
      .filter(length(col("token")) > 0)
    val stop = toks.groupBy("token")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap)
      .select("token")
    toks.join(stop, Seq("token"), "left_anti")
  }

  /** Pre-flight candidate-mass meter for the blocking join — the
    * [[Dedup.minhashBucketOccupancy]] discipline applied to entity
    * resolution: BEFORE a 100 TB feed pays the token-blocking join,
    * report per-token posting size (catalog side) × feed hit count —
    * the exact candidate-pair mass each blocking token would emit
    * (an upper bound on the join output before the per-record
    * distinct). A mega-token (posting list near the df cap meeting a
    * feed-side majority token) tops the report; the operator is two
    * partial-combined aggregates (dictionary-sized and
    * feed-vocabulary-sized) and one vocabulary-keyed join — never the
    * blocking join itself.
    *
    * Output: (token, catalog_df, feed_hits, est_candidates) ordered
    * by (est_candidates DESC, token), tokens contributing fewer than
    * `minCandidates` pairs dropped. */
  def blockingOccupancy(
      feed: DataFrame, index: DataFrame, minCandidates: Long = 2L): DataFrame = {
    val postings = index.groupBy("token").agg(count(lit(1)).as("catalog_df"))
    val hits = feed
      .select(explode(array_distinct(
        split(normalizeName(col("name")), " ", -1))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("feed_hits"))
    postings.join(hits, Seq("token"))
      .withColumn("est_candidates", col("catalog_df") * col("feed_hits"))
      .filter(col("est_candidates") >= minCandidates)
      .orderBy(desc("est_candidates"), col("token"))
  }

  /** Match feed records (feed_id, name) against catalog entries
    * (canon_id, name): token-blocked candidates through a catalog
    * index in [[catalogTokenIndex]] layout, exact integer scoring,
    * per-feed-record top-`k` under the total order (score DESC,
    * canon_id ASC), thresholded at `minScoreMicro`.
    *
    * Score components (all exact integers, truncating division):
    *   lev_sim_micro  = (maxLen − lev) · 10⁶ div maxLen
    *   jacc_micro     = |tokens∩| · 10⁶ div |tokens∪|
    *   score_micro    = (lev_sim_micro + jacc_micro) div 2
    * An identical name scores exactly 1 000 000. The blocking join is
    * the only shuffle over the feed; everything after operates on the
    * candidate pairs (bounded per feed record by the df cap). */
  def entityMatchWithIndex(
      feed: DataFrame, catalog: DataFrame, index: DataFrame,
      minScoreMicro: Long = 600000L, k: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minScoreMicro >= 0L && minScoreMicro <= 1000000L,
      s"minScoreMicro must be in [0, 1e6], got $minScoreMicro")
    val f = feed.select(col("feed_id"),
      normalizeName(col("name")).as("fname"))
    val c = catalog.select(col("canon_id"),
      normalizeName(col("name")).as("cname"))
    // the per-record candidate dedup keys ONLY (feed_id, fname,
    // canon_id) — ftoks is a deterministic function of fname
    // (split on space) and recomputes after the exchange for free,
    // where carrying the exploded token ARRAY through the distinct
    // made every shuffled row several times wider and every
    // hash-aggregate key an array comparison (guide §2.3: project
    // before the exchange; the r13 driver measured this join
    // anti-scaling 4.4× at 32 shuffle partitions).
    val cand = f
      .select(col("feed_id"), col("fname"),
        explode(array_distinct(split(col("fname"), " ", -1))).as("token"))
      .join(index, Seq("token"))
      .select("feed_id", "fname", "canon_id").distinct()
      .withColumn("ftoks", split(col("fname"), " ", -1))
      .join(c, Seq("canon_id"))
    val mx = greatest(length(col("fname")), length(col("cname")))
    val scored = cand
      .withColumn("lev", levenshtein(col("fname"), col("cname")))
      .withColumn("lev_sim_micro",
        when(mx === 0, lit(1000000L)).otherwise(
          expr("(CAST(greatest(length(fname), length(cname)) " +
            "- least(lev, greatest(length(fname), length(cname))) AS BIGINT) " +
            "* 1000000) div greatest(length(fname), length(cname))")))
      .withColumn("ctoks", split(col("cname"), " ", -1))
      .withColumn("jacc_micro", expr(
        "(CAST(size(array_intersect(ftoks, ctoks)) AS BIGINT) * 1000000) " +
          "div size(array_union(ftoks, ctoks))"))
      .withColumn("score_micro",
        expr("(lev_sim_micro + jacc_micro) div 2"))
      .filter(col("score_micro") >= minScoreMicro)
    // top-k under the TOTAL order (score DESC, canon_id ASC). k = 1
    // (every declared entry) collapses map-side via one
    // partial-combined min(struct) — the (−score, canon_id) prefix
    // decides and the trailing fields are uniquely determined by
    // (feed_id, canon_id), so the argmin is exact — where the window
    // form shuffles EVERY scored candidate to its feed_id partition
    // and sorts it (guide §2.3: aggregate before you shuffle).
    // Equality with the window form is spec-asserted and
    // oracle-hash-proven.
    if (k == 1)
      scored
        .groupBy("feed_id")
        .agg(min(struct(
          (-col("score_micro")).as("neg_score"), col("canon_id"),
          col("lev"), col("lev_sim_micro"), col("jacc_micro"))).as("best"))
        .select(col("feed_id"), col("best.canon_id").as("canon_id"),
          col("best.lev").as("lev"),
          col("best.lev_sim_micro").as("lev_sim_micro"),
          col("best.jacc_micro").as("jacc_micro"),
          (-col("best.neg_score")).as("score_micro"),
          lit(1).cast("int").as("rank"))
        .orderBy("feed_id", "rank")
    else {
      val w = Window.partitionBy("feed_id")
        .orderBy(col("score_micro").desc, col("canon_id"))
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("feed_id"), col("canon_id"), col("lev"),
          col("lev_sim_micro"), col("jacc_micro"), col("score_micro"),
          col("rank").cast("int").as("rank"))
        .orderBy("feed_id", "rank")
    }
  }

  /** [[entityMatchWithIndex]] with the blocking index built inline
    * (serving paths persist [[catalogTokenIndex]] fingerprint-keyed
    * and skip the build). */
  def entityMatch(
      feed: DataFrame, catalog: DataFrame,
      minScoreMicro: Long = 600000L, dfCap: Int = 100, k: Int = 1): DataFrame =
    entityMatchWithIndex(feed, catalog,
      catalogTokenIndex(catalog, dfCap), minScoreMicro, k)

  /** Survivorship: fold rank-1 matches into one GOLDEN RECORD per
    * canonical entity — match count plus exact integer cent price
    * bounds over the matched feed rows (`price` cents = half-up
    * integer snap of 100·price, the classifierEval rounding posture).
    * Canonicals nothing matched still appear with n_matched = 0 (the
    * catalog is the spine — an unmatched canonical is a finding, not
    * an absent row). */
  def goldenRecords(
      matches: DataFrame, feedAttrs: DataFrame, catalog: DataFrame): DataFrame = {
    val cents = expr(
      "CAST(floor(CAST(price AS DECIMAL(28,6)) * 100 + 0.5) AS BIGINT)")
    val folded = matches.filter(col("rank") === 1)
      .join(feedAttrs.select(col("feed_id"), cents.as("price_cents")),
        Seq("feed_id"))
      .groupBy("canon_id")
      .agg(count(lit(1)).as("n_matched"),
        min("price_cents").as("min_price_cents"),
        max("price_cents").as("max_price_cents"))
    catalog.select(col("canon_id"), normalizeName(col("name")).as("name"))
      .join(folded, Seq("canon_id"), "left")
      .withColumn("n_matched", coalesce(col("n_matched"), lit(0L)))
      .orderBy("canon_id")
  }
}
