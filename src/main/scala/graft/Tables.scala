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
  /** `events.ts` arrives in either of two writer encodings: INT64
    * TIMESTAMP(NANOS) — which Spark's reader rejects outright, so it is
    * read as a long (legacy conf) and converted; the source values are
    * µs-aligned, so no precision is lost — or a plain µs timestamp,
    * which passes through. Both land on TIMESTAMP_NTZ so every
    * downstream operator sees one type regardless of the writer. The
    * conf only affects nanos columns. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts")
    }
    raw.withColumn("ts", ts.cast("timestamp_ntz"))
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
