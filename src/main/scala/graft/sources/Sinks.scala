package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Write-side of the pipeline: partitioned parquet landing, upsert by
  * key (the reference's get-or-create / UNIQUE(supermarket, barcode,
  * collected_at) load semantics), and bucketed tables for shuffle-free
  * repeated joins.
  *
  * Scale posture: partition columns are low-cardinality (date, store);
  * data is repartitioned on them before the write so each partition
  * directory is written by one task (no small-file explosion); upsert
  * keeps the newest observation per key via one window; bucketed tables
  * pre-shuffle once at write time so every later equi-join on the
  * bucket key runs without an Exchange.
  */
object Sinks {

  /** Partitioned parquet landing zone. One writer task per partition
    * value → no small files at high parallelism. */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write.mode(mode)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Upsert-by-key load: merge incoming rows into the existing parquet
    * state keeping the newest row per key (ordered by `versionCol`,
    * ties by the remaining sort columns). Reference semantics:
    * rabbitmq-to-postgres get_or_create + collected_at versioning. */
  def upsertByKey(
      spark: SparkSession, incoming: DataFrame, path: String,
      keyCols: Seq[String], versionCol: String): Unit = {
    val existing =
      try spark.read.parquet(path)
      catch { case _: Throwable => spark.emptyDataFrame }
    val unioned =
      if (existing.columns.isEmpty) incoming
      else existing.select(incoming.columns.map(col): _*).unionAll(incoming)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).desc)
    val merged = unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    // two-phase write: parquet sources cannot overwrite themselves
    val tmp = path + "__staging"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetFileBytes` files. Streaming upserts and incremental loads
    * accrete files over time; at cluster scale the resulting
    * file-open/footers overhead dominates scan cost long before data
    * volume does. File count = ceil(bytes-on-disk / target), measured
    * from the source files themselves (no count() job, no sampling
    * pass); two-phase rewrite because a parquet source cannot
    * overwrite itself. */
  def compact(
      spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val df = spark.read.parquet(path)
    // size via the Hadoop FileSystem of the path (works on HDFS/S3/
    // local alike) — java.io.File would report 0 bytes for any remote
    // URI and silently funnel the whole dataset into one file
    val hconf = spark.sparkContext.hadoopConfiguration
    val bytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = path + "__compact"
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(tmp)
    // coalesce on the rewrite: the tmp read re-splits each file at
    // spark.sql.files.maxPartitionBytes, so without it the final write
    // would cap file sizes at the session split size instead of the
    // requested target
    spark.read.parquet(tmp).coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(path)
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    tmpPath.getFileSystem(hconf).delete(tmpPath, true): Unit
  }

  /** Range-partitioned, sorted-within-file write: rows are range
    * partitioned then sorted on `rangeCol`, so each output file covers
    * a DISJOINT value range and its parquet min/max statistics actually
    * prune — a point or range predicate on `rangeCol` skips every other
    * file (row-group stats do the same within files). The
    * Spark-native form of clustering/Z-ordering on one key; the
    * standard layout for time-series landing zones queried by time
    * range. */
  def writeRangePartitioned(
      df: DataFrame, path: String, rangeCol: String, partitions: Int): Unit =
    df.repartitionByRange(partitions, col(rangeCol))
      .sortWithinPartitions(rangeCol)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Persist as a bucketed+sorted table: pays the shuffle once at write
    * time; later equi-joins between tables bucketed on the same key
    * plan without an Exchange. */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // clear a leftover managed-table location from a crashed writer —
    // saveAsTable refuses to reuse it otherwise. Via the warehouse's
    // Hadoop FileSystem so the cleanup also works when the warehouse
    // lives on HDFS/S3 (java.io.File would silently no-op there and
    // leave the stale location to fail the write)
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true): Unit
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir
  }
}
