package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the star schema.
  *
  * Scale posture: plain `spark.read.parquet` keeps the scan declarative so
  * Catalyst pushes filters/projections into the parquet reader
  * (PushedFilters / ReadSchema); at 100 TB the fact tables (`lineitem`,
  * `events`, `documents`) are assumed partitioned/bucketed on their join
  * keys by the writer, while `region/nation/supplier/part` stay
  * broadcast-sized dimensions.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark's reader
    * rejects outright. Read nanos as long (legacy conf) and convert to a
    * microsecond TIMESTAMP_NTZ — the source values are µs-aligned, so no
    * precision is lost. The conf only affects nanos columns. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view (plus graft's native SQL
    * functions) so the whole surface is usable via `spark.sql`. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
    graft.functions.VectorFunctions.register(spark)
  }
}
