package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.StableStats

/** Pipeline transform stages: raw→typed normalization, idempotent
  * dedup, upsert/latest-per-key, change detection, sessionization,
  * micro-batch windowing.
  *
  * Reference semantics:
  *   - reference/examples/docker-compose examples/rabbitmq-to-postgres/
  *     app.py (typed casts, per-item normalization, idempotent load),
  *   - reference/salim/tables.sql UNIQUE(supermarket_id, barcode,
  *     collected_at) + "current price" reads → latest-per-key,
  *   - price_update_date semantics → price-change detection,
  *   - the queue consumer's batch windows → event windowing/sessions.
  *
  * Scale posture: normalization is a pure narrow map (no shuffle);
  * dedup is one hash shuffle on the dedup key; latest-per-key and
  * change detection are one window shuffle on the entity key with all
  * downstream window ops reusing that partitioning; sessionization
  * shuffles once on user_id. All expressions are codegen'd built-ins
  * (JSON parse via get_json_object, no UDFs).
  */
object Etl {

  /** Raw event normalization: trim/case-fold the type tag, round the
    * measure, extract the typed payload field from the JSON props blob
    * (the rabbitmq consumer's per-item transform). Narrow map only. */
  def normalizeEvents(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      col("ts"),
      col("user_id"),
      upper(trim(col("event_type"))).as("event_type"),
      round(col("value"), 2).as("value"),
      get_json_object(col("props"), "$.k").cast("int").as("prop_k"))
      .orderBy("event_id")

  /** Idempotent ingest: replaying the same feed must not duplicate rows
    * (raw_hash semantics). Doubles the input, exact-dedups on an md5
    * raw-hash of the full row — the reference's literal design
    * (generate_products.py:171 `hashlib.md5(raw_data).hexdigest()` into
    * the products.raw_hash column) — and proves the count is restored.
    * The dedup key projects down to a 32-char digest BEFORE the
    * exchange, so the shuffle carries hashes, not full-width fact
    * rows (a full-row distinct ships every column as key). The digest
    * is over a STRUCTURAL encoding (to_json of the row struct): a
    * delimited concat can collide distinct rows via separator
    * injection — ("a\\u0001b","c") vs ("a","b\\u0001c") — and a null
    * sentinel collides with a literal sentinel value, both silently
    * undercounting; JSON quoting handles embedded delimiters and nulls
    * natively. One partial-combined hash shuffle. */
  def dedupExactReplay(li: DataFrame): DataFrame = {
    val rawHash = md5(to_json(struct(li.columns.map(col): _*)))
    li.unionAll(li).select(rawHash.as("raw_hash"))
      .distinct()
      .agg(count(lit(1)).as("n_rows_after_dedup"))
  }

  /** Corpus snapshot diff (incremental-ingest delta detection):
    * classify every doc across two corpus versions as added / removed
    * / changed / unchanged by content hash — the frame an incremental
    * pipeline feeds downstream so re-sketch/re-embed work touches only
    * added+changed docs instead of the whole 100 TB corpus.
    *
    * Scale shape: each side projects to (doc_id, md5) before anything
    * shuffles — 32-char hashes through the exchange, never document
    * text — and the diff is ONE full-outer hash join on the uniform
    * doc_id key. No windows, no skew surface. Assumes doc_id is unique
    * within each snapshot (the corpus contract); duplicated ids would
    * fan out the join — run [[dedupExactReplay]]-style id dedup first
    * on untrusted feeds. */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame =
    oldDocs.select(col("doc_id"), md5(col("text")).as("h_old"))
      .join(newDocs.select(col("doc_id"), md5(col("text")).as("h_new")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, lit("added"))
          .when(col("h_new").isNull, lit("removed"))
          .when(col("h_old") === col("h_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
      .orderBy("doc_id")

  /** Per-doc rollup metrics — the narrow projection feeding
    * [[corpusRollup]] and [[rollupIncremental]]'s signed deltas. */
  private def rollupMetrics(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("lang"),
      size(split(col("text"), " ", -1)).cast("long").as("toks"),
      length(col("text")).cast("long").as("chars"))

  /** Per-(source, lang) corpus rollup: doc/token/char totals — the
    * materialized summary a pipeline maintains over its corpus. One
    * partial-combined aggregation; all metrics exact integers. */
  def corpusRollup(docs: DataFrame): DataFrame =
    rollupMetrics(docs).groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("toks").as("n_tokens"),
        sum("chars").as("n_chars"))
      .orderBy("source", "lang")

  /** Incremental rollup maintenance: merge the PREVIOUS snapshot's
    * persisted rollup with signed per-group deltas derived from the
    * snapshot diff, instead of re-aggregating the whole corpus — the
    * core incremental-ETL contract at 100 TB (daily ingest touches a
    * sliver; the rollup update should cost the sliver, not the lake).
    * Identity is the full payload hash (text + lang + source), so a
    * metadata-only move between groups still produces a −old/+new
    * delta pair ([[snapshotDiff]]'s text-only hash would miss it).
    * Removed/changed docs contribute negated old metrics; added/changed
    * docs contribute new metrics; groups whose doc count reaches zero
    * drop from the merged rollup. The result is EXACTLY equal (integer
    * arithmetic throughout) to [[corpusRollup]] over the new snapshot —
    * the driver oracle recomputes directly, so the hash gate proves
    * incremental == full.
    *
    * Scale shape: both snapshots are scanned once, narrowly, to hash
    * and measure (in production the diff usually arrives pre-computed
    * from the ingest log — pass it through the same signed-union path);
    * the only shuffles are the doc_id full-outer diff join and the
    * delta aggregation, both delta-sized after partial combine; the
    * prior rollup frame is group-cardinality-sized. */
  def rollupIncremental(
      prevRollup: DataFrame, prev: DataFrame, cur: DataFrame): DataFrame = {
    def keyed(df: DataFrame) = df.select(col("doc_id"), col("source"),
      col("lang"),
      size(split(col("text"), " ", -1)).cast("long").as("toks"),
      length(col("text")).cast("long").as("chars"),
      md5(to_json(struct(col("text"), col("lang"), col("source"))))
        .as("ph"))
    val p = keyed(prev).select(col("doc_id"), col("ph").as("ph_old"),
      col("source").as("src_old"), col("lang").as("lang_old"),
      col("toks").as("toks_old"), col("chars").as("chars_old"))
    val c = keyed(cur).select(col("doc_id"), col("ph").as("ph_new"),
      col("source").as("src_new"), col("lang").as("lang_new"),
      col("toks").as("toks_new"), col("chars").as("chars_new"))
    val diff = p.join(c, Seq("doc_id"), "full_outer")
      .filter(col("ph_old").isNull || col("ph_new").isNull ||
        col("ph_old") =!= col("ph_new"))
    val minus = diff.filter(col("ph_old").isNotNull)
      .select(col("src_old").as("source"), col("lang_old").as("lang"),
        lit(-1L).as("d_docs"), (-col("toks_old")).as("d_toks"),
        (-col("chars_old")).as("d_chars"))
    val plus = diff.filter(col("ph_new").isNotNull)
      .select(col("src_new").as("source"), col("lang_new").as("lang"),
        lit(1L).as("d_docs"), col("toks_new").as("d_toks"),
        col("chars_new").as("d_chars"))
    prevRollup.select(col("source"), col("lang"),
        col("n_docs").as("d_docs"), col("n_tokens").as("d_toks"),
        col("n_chars").as("d_chars"))
      .unionByName(minus).unionByName(plus)
      .groupBy("source", "lang")
      .agg(sum("d_docs").as("n_docs"),
        sum("d_toks").as("n_tokens"),
        sum("d_chars").as("n_chars"))
      .filter(col("n_docs") > 0)
      .orderBy("source", "lang")
  }

  /** Upsert read: latest observation per (store, product) — the
    * "current price" view over an append-only observation log. */
  def latestPerKey(li: DataFrame): DataFrame = {
    // max_by instead of a row_number window: the window form shuffles
    // EVERY observation and sorts whole key partitions, while the
    // aggregate partial-combines map-side, so the exchange carries one
    // row per (store, product) per partition — at 100 TB that is the
    // observation count vs the key count. The (shipdate, orderkey,
    // linenumber) struct is a total order, so the winner is identical.
    li.groupBy("l_suppkey", "l_partkey")
      .agg(max_by(
        struct(col("l_shipdate").as("collected_at"),
          round(col("l_extendedprice"), 2).as("price")),
        struct(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))).as("m"))
      .select(
        col("l_suppkey"), col("l_partkey"),
        col("m.collected_at").as("collected_at"),
        col("m.price").as("price"))
      .orderBy("l_suppkey", "l_partkey")
  }

  /** Change detection: emit an observation when a (store, product)
    * price differs from its previous observation (price_update_date
    * semantics). Same single window shuffle as latestPerKey. */
  def priceChanges(li: DataFrame): DataFrame = {
    val w = Window.partitionBy("l_suppkey", "l_partkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    li.withColumn("prev_price", lag("l_extendedprice", 1).over(w))
      .filter(col("prev_price").isNotNull && col("prev_price") =!= col("l_extendedprice"))
      .select(
        col("l_suppkey"), col("l_partkey"),
        col("l_shipdate").as("changed_at"),
        col("l_orderkey"), col("l_linenumber"),
        round(col("prev_price"), 2).as("old_price"),
        round(col("l_extendedprice"), 2).as("new_price"),
        round(col("l_extendedprice") - col("prev_price"), 2).as("delta"))
      .orderBy("l_suppkey", "l_partkey", "changed_at", "l_orderkey", "l_linenumber")
  }

  /** Single-pass numeric column profiling (the data-quality summary an
    * ingest pipeline publishes with each load): per column, non-null
    * and distinct counts, min/max, engine-stable mean. One aggregation
    * over one scan — the distinct counts share the Expand; the wide
    * one-row result is unpivoted to long form with `stack` (no extra
    * shuffle). Raw min/max are untouched data values (already
    * bit-identical across engines); the mean uses the StableStats
    * shape. */
  def profileColumns(
      df: DataFrame, cols: Seq[String], exactScale: Int = 2): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        StableStats.stableAvg(col(c), exactScale, 4).as(s"${c}__mean"))
    }
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nonnull, ${c}__distinct, ${c}__min, ${c}__max, ${c}__mean")
      .mkString(", ")
    wide.selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, n_nonnull, n_distinct, min_value, max_value, mean_value)")
      .select(col("column_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_value"), col("max_value"), col("mean_value"))
      .orderBy("column_name")
  }

  /** Gap-based sessionization: a new session starts after `gapMinutes`
    * of user inactivity. lag → flag → running sum → session rollup; one
    * shuffle on user_id, both windows share it. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val flagged = events
      .withColumn("prev_ts", lag("ts", 1).over(order))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr(s"INTERVAL $gapMinutes MINUTES"), 1)
          .otherwise(0))
    flagged
      .withColumn("session_seq",
        sum("new_session").over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_seq")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("user_id", "session_seq")
  }

  /** Native session-window sessionization: Spark's `session_window`
    * merges events within `gapMinutes` directly in the aggregation —
    * the streaming-compatible formulation of `sessionize` (same
    * boundaries; window end = last event + gap by definition). */
  def sessionWindows(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        StableStats.stableSum(col("value"), 2).as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")

  /** Tumbling-window event aggregation (batch twin of the streaming
    * consumer; see graft.streaming.EventsStream for the readStream
    * variant with a watermark). */
  def eventWindows(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        StableStats.stableSum(col("value"), 2).as("total_value"),
        StableStats.stableAvg(col("value"), 2).as("avg_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"), col("avg_value"))
      .orderBy("window_start", "event_type")

  /** Ordered funnel conversion over the event stream: a user reaches
    * stage k when the FIRST touch of every stage 1..k forms a
    * non-decreasing timestamp chain (the standard first-touch funnel).
    * One user-keyed shuffle computes all per-stage first touches as
    * conditional mins in a single aggregation; the chain flags and the
    * final per-stage counts are then a scalar aggregate — no joins, no
    * per-stage passes, no collect. Output: one row per stage with
    * reached-user counts and percent of the entry stage. */
  def funnelConversion(
      events: DataFrame,
      stages: Seq[String] = Seq("signup", "view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty)
    val firsts = events
      .filter(col("event_type").isin(stages: _*))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === stages.head, col("ts"))).as(s"t_0"),
        stages.tail.zipWithIndex.map { case (s, i) =>
          min(when(col("event_type") === s, col("ts"))).as(s"t_${i + 1}")
        }: _*)
    val reached = stages.indices.map { k =>
      (1 to k).map(i => col(s"t_$i") >= col(s"t_${i - 1}"))
        .foldLeft(col("t_0").isNotNull)(_ && _)
    }
    // coalesce: sum over zero rows is NULL — an empty event stream must
    // yield zero counts, not null rows
    val counts = firsts.agg(
      coalesce(sum(reached.head.cast("long")), lit(0L)).as("n_0"),
      reached.tail.zipWithIndex.map { case (c, i) =>
        coalesce(sum(c.cast("long")), lit(0L)).as(s"n_${i + 1}")
      }: _*)
    val stageRows = stages.indices.map { i =>
      struct(
        lit(i + 1).as("stage_idx"), lit(stages(i)).as("stage"),
        col(s"n_$i").as("n_users"),
        when(col("n_0") > 0, round(col(s"n_$i") * 100.0 / col("n_0"), 2))
          .otherwise(lit(null).cast("double")).as("pct_of_first"))
    }
    counts.select(explode(array(stageRows: _*)).as("s"))
      .select(col("s.stage_idx"), col("s.stage"), col("s.n_users"), col("s.pct_of_first"))
      .orderBy("stage_idx")
  }
}
