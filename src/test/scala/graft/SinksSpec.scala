package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

/** Write-side specs: partitioned landing, upsert-by-key, bucketed
  * shuffle-free joins. */
class SinksSpec extends AnyFunSuite with SparkSessionTestBase {

  test("writePartitioned lays out one directory per partition value") {
    val out = java.nio.file.Files.createTempDirectory("part_sink").toString
    val li = Tables.lineitem(spark, sfDir)
      .withColumn("ship_year", year(col("l_shipdate")))
    Sinks.writePartitioned(li, out, Seq("ship_year"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("ship_year=")) >= 5)
    val back = spark.read.parquet(out)
    assert(back.count() === li.count())
  }

  test("upsertByKey keeps the newest row per key across loads") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("upsert").toString + "/state"
    val day1 = Seq((1L, "a", "2024-01-01", 10.0), (2L, "b", "2024-01-01", 20.0))
      .toDF("id", "name", "collected_at", "price")
    Sinks.upsertByKey(spark, day1, path, Seq("id"), "collected_at")
    val day2 = Seq((2L, "b", "2024-01-02", 25.0), (3L, "c", "2024-01-02", 30.0))
      .toDF("id", "name", "collected_at", "price")
    Sinks.upsertByKey(spark, day2, path, Seq("id"), "collected_at")
    val state = spark.read.parquet(path).orderBy("id").collect()
    assert(state.length === 3)
    assert(state(1).getAs[Double]("price") === 25.0) // id=2 updated
    assert(state(0).getAs[Double]("price") === 10.0) // id=1 untouched
  }

  test("bucketed tables join without an Exchange") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_extendedprice")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    Sinks.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Sinks.writeBucketed(o, "o_bucketed", "o_orderkey", 8)
    // hint a sort-merge join: tables this small would broadcast, which
    // bypasses bucketing entirely (the scale scenario is SMJ)
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(joined.count() > 0)
  }
}
