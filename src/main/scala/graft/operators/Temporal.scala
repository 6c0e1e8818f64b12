package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: as-of join and
  * bounded range (interval-proximity) join.
  *
  * Both are composed from relational primitives rather than a custom
  * SparkPlan because the composition already yields the right
  * distributed shape: the as-of join is one union + one window over
  * the shared key (single shuffle, streaming-friendly ordering); the
  * range join buckets time so candidates meet in an equi-join
  * (shuffle O(events + qualifying pairs)) instead of an O(n²)
  * inequality nested loop.
  */
object Temporal {

  /** As-of join: for every query row, the latest observation with
    * `obsTs` ≤ the query's `queryTs` within the same `keys` group
    * (left-join semantics — query rows with no prior observation keep
    * nulls). Implemented as union + last(ignoreNulls) over one
    * key-partitioned window: observations sort before queries at
    * equal timestamps, so an observation AT the query time matches.
    *
    * `obsCols` are the observation columns to carry (must not collide
    * with query column names). */
  def asOfJoin(
      queries: DataFrame,
      observations: DataFrame,
      keys: Seq[String],
      queryTs: String,
      obsTs: String,
      obsCols: Seq[String]): DataFrame = {
    val qPayload = queries.columns.filterNot(keys.contains)
    val q2 = obsCols.foldLeft(
      queries.withColumn("__ts", col(queryTs)).withColumn("__isObs", lit(0))) {
      (df, c) => df.withColumn(c, lit(null))
    }
    val o2 = qPayload.foldLeft(
      observations.withColumn("__ts", col(obsTs)).withColumn("__isObs", lit(1))) {
      (df, c) => df.withColumn(c, lit(null))
    }
    val unioned = q2.unionByName(o2.select(q2.columns.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__isObs").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = obsCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__isObs") === 0).drop("__ts", "__isObs")
  }

  /** Last-touch attribution: every purchase attributed to the user's
    * most recent view within `horizonMinutes` — the batch twin of the
    * watermarked stream-stream attribution join
    * (streaming/EventsStream.attributionJoin), built on [[asOfJoin]]
    * (one shuffle) with the horizon applied as a post-join predicate:
    * purchases whose nearest view is older than the horizon (or who
    * have none) keep NULL attribution rather than dropping, so the
    * output stays one row per purchase. */
  def lastTouchAttribution(events: DataFrame, horizonMinutes: Int = 60): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value"), 2).as("purchase_value"))
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("viewed_at"),
        round(col("value"), 2).as("view_value"))
    val inHorizon =
      col("viewed_at") >= col("ts") - expr(s"INTERVAL $horizonMinutes MINUTES")
    asOfJoin(purchases, views, Seq("user_id"), "ts", "viewed_at",
        Seq("viewed_at", "view_value"))
      .select(col("event_id"), col("user_id"), col("ts"), col("purchase_value"),
        when(inHorizon, col("viewed_at")).as("attributed_view_at"),
        when(inHorizon, col("view_value")).as("attributed_value"),
        coalesce(inHorizon, lit(false)).as("attributed"))
      .orderBy("event_id")
  }

  /** Bounded range self-join on events: ordered pairs (a, b) from
    * DIFFERENT users with 0 < b.ts − a.ts ≤ `windowSeconds`, rolled up
    * per day. Time is bucketed at the window width and the left side
    * exploded into (bucket, bucket+1), so candidates meet in an
    * equi-join and the inequality filter only sees adjacent-bucket
    * candidates. */
  def eventPairsWithin(events: DataFrame, windowSeconds: Int = 60): DataFrame = {
    val winMicros = windowSeconds * 1000000L
    val e = events.select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("ts"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("bucket", floor(col("us") / winMicros))
    val left = e.withColumn("jbucket",
      explode(array(col("bucket"), col("bucket") + 1)))
    val pairs = left.as("a")
      .join(e.as("b"), col("a.jbucket") === col("b.bucket") &&
        col("a.user_id") =!= col("b.user_id") &&
        col("b.us") > col("a.us") &&
        col("b.us") <= col("a.us") + winMicros)
    pairs
      .groupBy(to_date(col("a.ts")).as("day"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("day")
  }
}
