package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches — the pre-aggregated-rollup pattern
  * a 100 TB corpus needs for distinct counts: per-partition (here
  * per-source; in production per day/shard) HLL sketch partials are
  * persisted ONCE, and any cross-partition distinct — per source, all
  * sources, any subset — is answered by UNIONING the tiny sketch blobs
  * with no rescan of the corpus. Exact distincts would need a
  * full-width shuffle of every token occurrence per question asked;
  * sketch partials make each question cost |partials| bytes.
  *
  * Built on Spark's native DataSketches HLL aggregates
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`,
  * Spark 3.5+) — codegen'd, partial-combined, and the sketch binary is
  * the Apache DataSketches wire format, mergeable by any DataSketches
  * runtime, not just Spark.
  *
  * Reference scope: the reference reports distinct values per column
  * (salim/app/server/routes/utils.py:17,28 — `.distinct()` over
  * categories/brands); this family is that semantics' sublinear-memory
  * web-scale form.
  */
object Sketches {

  /** Per-source HLL sketch partial over lowercased tokens:
    * (source, sk BINARY, n_tokens) — the persistable artifact. One
    * partial-combined aggregate; the shuffle carries one ≤2^lgK-bucket
    * sketch per (source, input partition), never token rows. */
  def sketchPartials(docs: DataFrame, lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21], got $lgK")
    docs.select(col("source"),
        explode(split(lower(col("text")), " ", -1)).as("t"))
      .groupBy("source")
      .agg(hll_sketch_agg(col("t"), lit(lgK)).as("sk"),
        count(lit(1)).as("n_tokens"))
  }

  /** Serve the rollup from sketch partials (fresh or read back from a
    * persisted parquet artifact — the result is identical, asserted in
    * spec): one row per source plus the `__all__` union row, whose
    * sketch is merged from the partials WITHOUT touching the corpus.
    * Estimates are DataSketches HLL doubles (~1.04/√2^lgK relative
    * error). */
  def sketchRollup(partials: DataFrame): DataFrame = {
    val per = partials.select(col("source"),
      col("n_tokens"),
      // Spark's estimate is already an integer (BIGINT) — engine-stable
      hll_sketch_estimate(col("sk")).as("est_distinct_tokens"))
    val all = partials.agg(
        sum("n_tokens").as("n_tokens"),
        hll_sketch_estimate(
          hll_union_agg(col("sk"), lit(false))).as("est_distinct_tokens"))
      .select(lit("__all__").as("source"), col("n_tokens"),
        col("est_distinct_tokens"))
    per.unionByName(all).orderBy("source")
  }

  /** Convenience end-to-end form: partials built inline. */
  def sketchDistinct(docs: DataFrame, lgK: Int = 12): DataFrame =
    sketchRollup(sketchPartials(docs, lgK))

  /** Pairwise SOURCE-OVERLAP matrix from the same persisted HLL
    * partials — the curation question behind source mixing ("how much
    * of source B's vocabulary is already in A?") answered by sketch
    * algebra alone: HLL unions are exact over sketches, so
    * |A∩B| ≈ est(A) + est(B) − est(A∪B) (inclusion–exclusion; the
    * standard HLL intersection estimator, error ~1.04/√2^lgK on each
    * term). No corpus rescan: the join is |sources|² sketch blobs.
    *
    * The raw I−E difference of three estimates can dip below 0 on
    * near-disjoint sources; it clamps to 0 (and the Jaccard micro
    * snap to [0, 1e6]) — the spec asserts the clamped estimates track
    * exact intersections within sketch tolerance. Output: one row per
    * unordered source pair (source_a < source_b) with both per-source
    * estimates, the union/intersection estimates, and
    * jaccard_micro. */
  def sketchOverlap(partials: DataFrame): DataFrame = {
    val a = partials.select(col("source").as("source_a"), col("sk").as("sk_a"))
    val b = partials.select(col("source").as("source_b"), col("sk").as("sk_b"))
    a.join(broadcast(b), col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        hll_sketch_estimate(col("sk_a")).as("est_a"),
        hll_sketch_estimate(col("sk_b")).as("est_b"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))).as("est_union"))
      .withColumn("est_intersect",
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
      .withColumn("jaccard_micro", expr(
        """CASE WHEN est_union <= 0 THEN CAST(0 AS BIGINT)
          | ELSE least(CAST(1000000 AS BIGINT),
          |   (est_intersect * 2000000 + est_union) div (est_union * 2)) END"""
          .stripMargin))
      .orderBy("source_a", "source_b")
  }

  // ---- Mergeable integer histograms → quantile rollups --------------

  /** Per-(source, bin) token-count histogram partial — the mergeable
    * quantile state for a bounded-domain metric (per-doc token counts;
    * bin = count div `width`). Like the HLL partials, these persist
    * once and answer every quantile question — per source, merged,
    * any subset — by summing tiny (source × bins) frames, no rescan.
    * Unlike probabilistic sketches the merge is EXACT integer
    * arithmetic, so the rollup below carries a full DuckDB oracle. */
  def histPartials(docs: DataFrame, width: Int = 1): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    docs.select(col("source"),
        size(split(col("text"), " ", -1)).cast("long").as("m"))
      .select(col("source"), expr(s"m div $width").as("bin"))
      .groupBy("source", "bin").agg(count(lit(1)).as("cnt"))
  }

  /** Quantile rollup from histogram partials: per source plus the
    * `__all__` merge, p50/p90/p99 as the matching bin's lower bound
    * (exact for width = 1 on an integer metric; max error `width − 1`
    * otherwise). Ranks are pure-rational integer arithmetic
    * (ceil(n·num/den) = (n·num + den − 1) div den), so both engines
    * agree bit-for-bit — no float quantile definitions involved.
    *
    * Scale shape: the only window runs over the BOUNDED per-source
    * histogram (≤ value-space/width rows per source — the ccnetBuckets
    * posture), never over documents; everything upstream is
    * partial-combined aggregation of the persisted partials. */
  def histQuantiles(partials: DataFrame, width: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = partials.groupBy("bin").agg(sum("cnt").as("cnt"))
      .select(lit("__all__").as("source"), col("bin"), col("cnt"))
    val h = partials.select("source", "bin", "cnt").unionByName(all)
    val tot = h.groupBy("source").agg(sum("cnt").as("n"))
    val cum = h.withColumn("cum",
      sum("cnt").over(Window.partitionBy("source").orderBy("bin")))
      .join(tot, "source")
    def q(num: Int, den: Int): Column =
      min(when(col("cum") >= expr(s"(n * $num + ${den - 1}) div $den"),
        col("bin"))) * width
    cum.groupBy("source").agg(
        max("n").as("n_docs"),
        q(1, 2).as("p50_tokens"),
        q(9, 10).as("p90_tokens"),
        q(99, 100).as("p99_tokens"))
      .orderBy("source")
  }

  /** Count-min sketch over corpus tokens (Cormode & Muthukrishnan
    * 2005): `depth` hash rows × `width` buckets of exact counts — the
    * mergeable POINT-FREQUENCY artifact next to the HLL (distinct) and
    * Misra-Gries (top-k) sketches: "how often does term X occur" for
    * arbitrary later X, answered from depth×width integers with no
    * corpus rescan, O(1/width) additive overestimate w.h.p.
    *
    * The row hashes are md5 prefixes ([[graft.functions
    * .DeterministicHash.md5Prefix]] convention — universal, so ANY
    * engine reproduces bucket assignment and therefore the EXACT
    * estimates: unusually for a sketch, the estimator itself has a
    * DuckDB oracle twin). Spark shape: one token explode × depth
    * (a constant), then ONE partial-combined groupBy whose output is
    * ≤ depth·width rows per partition before the exchange — hot terms
    * collapse map-side. Partials from different shards/days merge by
    * bucket-wise sum ([[cmsMerge]]; merge == direct asserted in
    * spec). */
  def cmsPartials(docs: DataFrame, depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    docs.select(explode(split(lower(col("text")), " ", -1)).as("t"))
      .select(col("t"), explode(expr(s"sequence(0, ${depth - 1})")).as("d"))
      .withColumn("bucket", cmsBucket(col("d"), col("t"), width))
      .groupBy("d", "bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("d", "bucket")
  }

  /** The single bucket-hash definition (callers and the estimator must
    * agree or estimates silently break — the assignSplits lesson). */
  private def cmsBucket(d: Column, t: Column, width: Int): Column =
    (conv(substring(md5(concat_ws(":", lit("cms"), d, t)), 1, 8), 16, 10)
      .cast("long") % width)

  /** Merge sketch partials from several shards: bucket-wise sum —
    * CMS's defining property (counts are linear). */
  def cmsMerge(partials: Seq[DataFrame]): DataFrame = {
    require(partials.nonEmpty, "cmsMerge needs at least one partial")
    partials.reduce(_ unionByName _)
      .groupBy("d", "bucket").agg(sum("cnt").as("cnt"))
      .orderBy("d", "bucket")
  }

  /** Point-frequency estimates for a term set: est(t) = min over d of
    * counter[d][h_d(t)] — never underestimates. The sketch is
    * depth×width rows and rides a broadcast; the term set streams
    * through narrowly. Terms the sketch never saw estimate ≥ 0 from
    * whatever collisions their buckets hold (the CMS contract). */
  def cmsEstimate(
      partials: DataFrame, terms: DataFrame,
      depth: Int = 4, width: Int = 1024): DataFrame =
    terms.select(col("term")).distinct()
      .select(col("term"), explode(expr(s"sequence(0, ${depth - 1})")).as("d"))
      .withColumn("bucket", cmsBucket(col("d"), col("term"), width))
      .join(broadcast(partials), Seq("d", "bucket"), "left")
      .groupBy("term").agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      .orderBy("term")

  /** Sketch fidelity report (the [[graft.operators.Dedup
    * .minhashCalibration]] posture): every corpus term's exact count
    * next to its sketch estimate and the overestimate err ≥ 0 — the
    * check a rollout runs before trusting a width. One exact
    * term-keyed aggregation + the broadcast-sketch estimate join. */
  def cmsCalibration(
      docs: DataFrame, partials: DataFrame,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    // exact feeds the report join AND the estimate's term set — the
    // corpus aggregation must not re-execute per consumer
    val exact = docs
      .select(explode(split(lower(col("text")), " ", -1)).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n_exact"))
      .localCheckpoint()
    exact.join(
        cmsEstimate(partials, exact.select("term"), depth, width), Seq("term"))
      .select(col("term"), col("n_exact"), col("est"),
        (col("est") - col("n_exact")).as("err"))
      .orderBy("term")
  }
}
