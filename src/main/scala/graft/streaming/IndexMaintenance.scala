package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Shared maintenance for the gates' batch_id-partitioned index
  * directories ([[DedupStream]]'s signature index, [[AnnStream]]'s
  * quantized index): collapse any key present more than once (keep
  * the FIRST arrival — lowest batch_id — so maintenance never changes
  * which corpus row a future pair reports) and rewrite each batch
  * partition as one file, killing the per-micro-batch small-file tax.
  *
  * The rewrite is [[DeltaLayout.swapLive]]'s RENAME SWAP, not a
  * second in-place overwrite: an overwrite deletes the live index
  * before writing, so a crash mid-write would leave it partially
  * written and the gate would silently under-report duplicates
  * against the lost rows. The swap keeps a complete artifact at the
  * live or a recoverable path at every instant. Safe to run between
  * micro-batches. */
private[streaming] object IndexMaintenance {

  def collapseAndCompact(
      spark: SparkSession, indexPath: String, keyCol: String): Unit = {
    val idx = spark.read.parquet(indexPath)
    val payload = idx.columns.filter(_ != keyCol)
    require(payload.contains("batch_id"),
      s"$indexPath is not a batch_id-partitioned gate index")
    val deduped = idx.groupBy(keyCol)
      .agg(min_by(struct(payload.map(col): _*), col("batch_id")).as("s"))
      .select(col(keyCol) +: payload.map(c => col(s"s.$c").as(c)): _*)
    val tmp = indexPath + "__maint"
    // repartition ON the partition column: every row of a batch_id
    // lands in one task, so each partition directory gets exactly one
    // file (modulo hash collisions, which only co-locate two batches)
    deduped.repartition(col("batch_id"))
      .write.mode("overwrite").partitionBy("batch_id").parquet(tmp)
    val fs = new Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    DeltaLayout.swapLive(fs, tmp, indexPath)
  }
}
