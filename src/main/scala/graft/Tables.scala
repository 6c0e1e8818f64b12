package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table loaders for the star schema.
  *
  * Scale posture: plain `spark.read.parquet` keeps the scan declarative so
  * Catalyst pushes filters/projections into the parquet reader
  * (PushedFilters / ReadSchema); at 100 TB the fact tables (`lineitem`,
  * `events`, `documents`) are assumed partitioned/bucketed on their join
  * keys by the writer, while `region/nation/supplier/part` stay
  * broadcast-sized dimensions.
  *
  * Every loader dispatches on the READ schema and normalizes writer
  * physical-type drift against the table's canonical logical schema —
  * INT32 vs INT64 keys, REAL vs DOUBLE measures, float vs double
  * embedding elements, µs vs legacy-nanos vs UTC-adjusted timestamps —
  * so downstream operators see ONE type per column regardless of which
  * writer produced the parquet. (Round 6's regenerated `events.ts`
  * encoding flip, which silently redden 14 suites until the events
  * loader learned to dispatch, generalized to every table.) When the
  * read schema already matches, the loader returns the scan untouched —
  * no projection is added, so pushdown behavior is identical.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** TIMESTAMP_NTZ (UTC wall clock) from an epoch-micros expression by
    * pure integer arithmetic — NO session-time-zone dependence. A plain
    * `cast(ts as timestamp_ntz)` extracts the wall clock in the SESSION
    * zone, which silently shifts values for any consumer not pinned to
    * UTC when the writer emitted UTC-adjusted instants. */
  private def ntzFromMicros(micros: String): Column =
    expr(s"timestampadd(MICROSECOND, $micros, timestamp_ntz'1970-01-01 00:00:00')")

  /** Coerce one drifted column to its canonical type. Timestamp-bearing
    * cases avoid tz-dependent casts entirely; everything else is a
    * plain cast (widening for keys, narrowing float/double element
    * types — value-preserving for the schema's ranges). */
  private def coerce(name: String, from: DataType, to: DataType): Column =
    (from, to) match {
      // INT64 TIMESTAMP(NANOS): Spark's reader rejects the annotation,
      // so it arrives as a long under the legacy nanosAsLong conf; the
      // driver's source values are µs-aligned, so `div 1000` is exact
      case (LongType, TimestampNTZType) => ntzFromMicros(s"(`$name` div 1000)")
      // UTC-adjusted INT64 TIMESTAMP(MICROS) reads as TimestampType (an
      // instant): recover the UTC wall clock tz-independently
      case (TimestampType, TimestampNTZType) => ntzFromMicros(s"unix_micros(`$name`)")
      case _ => col(name).cast(to)
    }

  /** Normalize a scanned frame against the table's canonical types.
    * Columns absent from the canonical map (and any extra writer
    * columns) pass through untouched; a fully matching schema returns
    * the scan itself (no projection node). Type comparison is by
    * catalogString so parquet's element-nullability defaults cannot
    * masquerade as drift. */
  private def normalize(df: DataFrame, canon: Map[String, DataType]): DataFrame = {
    def drifted(f: StructField): Boolean =
      canon.get(f.name).exists(_.catalogString != f.dataType.catalogString)
    if (!df.schema.fields.exists(drifted)) df
    else df.select(df.schema.fields.map { f =>
      (if (drifted(f)) coerce(f.name, f.dataType, canon(f.name))
       else col(f.name)).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Canonical logical schema per table (typed columns only — string
    * columns have no drift axis worth normalizing). */
  private val canon: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Map("event_id" -> LongType, "user_id" -> LongType,
      "ts" -> TimestampNTZType, "value" -> DoubleType),
    "documents" -> Map("doc_id" -> LongType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  /** Read + normalize. The legacy nanosAsLong conf is set up front so
    * an INT64 TIMESTAMP(NANOS) writer column arrives as a long (it
    * only affects nanos columns; every other encoding is untouched)
    * instead of failing the scan outright. */
  private def readNormalized(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalize(table(spark, dir, name), canon(name))
  }

  def region(spark: SparkSession, dir: String): DataFrame = readNormalized(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = readNormalized(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = readNormalized(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = readNormalized(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = readNormalized(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = readNormalized(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = readNormalized(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = readNormalized(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = readNormalized(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = readNormalized(spark, dir, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view (plus graft's native SQL
    * functions) so the whole surface is usable via `spark.sql`. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    names.foreach(n => readNormalized(spark, dir, n).createOrReplaceTempView(n))
    graft.functions.VectorFunctions.register(spark)
  }
}
