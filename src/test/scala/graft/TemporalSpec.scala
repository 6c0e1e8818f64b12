package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

/** Temporal join specs: as-of semantics and bounded range pairing. */
class TemporalSpec extends AnyFunSuite with SparkSessionTestBase {

  test("asOfJoin picks the latest observation at-or-before each query") {
    import spark.implicits._
    val queries = Seq((1L, 100L, "2024-01-01 10:00:00"), (2L, 100L, "2024-01-01 12:00:00"),
      (3L, 200L, "2024-01-01 09:00:00"))
      .toDF("qid", "k", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val obs = Seq((100L, "2024-01-01 09:30:00", 1.0), (100L, "2024-01-01 11:00:00", 2.0),
      (100L, "2024-01-01 12:00:00", 3.0), (200L, "2024-01-01 10:00:00", 9.0))
      .toDF("k", "ots", "v").withColumn("ots", col("ots").cast("timestamp"))
    val out = Temporal.asOfJoin(queries, obs, Seq("k"), "ts", "ots", Seq("v"))
      .orderBy("qid").collect()
    assert(out(0).getAs[Double]("v") === 1.0) // 10:00 → obs 09:30
    assert(out(1).getAs[Double]("v") === 3.0) // 12:00 → obs AT 12:00 matches
    assert(out(2).isNullAt(out(2).fieldIndex("v"))) // no prior obs for k=200
  }

  test("lastTouchAttribution keeps one row per purchase, horizon applied") {
    import spark.implicits._
    val events = Seq(
      (1L, "2024-01-01 10:00:00", 7L, "view", 1.0),
      (2L, "2024-01-01 10:30:00", 7L, "purchase", 50.0), // view 30m ago -> attributed
      (3L, "2024-01-01 13:00:00", 7L, "purchase", 60.0), // view 3h ago -> NOT attributed
      (4L, "2024-01-01 09:00:00", 8L, "purchase", 70.0)) // no view at all
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Temporal.lastTouchAttribution(events, horizonMinutes = 60)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Boolean]("attributed"), r.getAs[Any]("attributed_view_at"))).toMap
    assert(out.size === 3) // one row per purchase
    assert(out(2L)._1 === true)
    assert(out(2L)._2 !== null)
    assert(out(3L) === ((false, null))) // nearest view exists but is stale
    assert(out(4L) === ((false, null))) // never viewed
  }

  test("eventPairsWithin matches the naive inequality join") {
    val events = Tables.events(spark, sfDir)
    val bucketed = Temporal.eventPairsWithin(events, windowSeconds = 120).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    // naive reference computed directly in Spark
    val e = events.select(col("event_id"), col("user_id"),
      col("ts").cast("timestamp").as("ts"))
    val naive = e.as("a").join(e.as("b"),
        col("a.user_id") =!= col("b.user_id") &&
          col("b.ts") > col("a.ts") &&
          col("b.ts") <= col("a.ts") + expr("INTERVAL 120 SECONDS"))
      .groupBy(to_date(col("a.ts")).as("day")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(bucketed === naive)
  }
}
