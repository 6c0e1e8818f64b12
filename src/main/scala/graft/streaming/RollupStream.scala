package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Etl

/** Streaming rollup maintenance: keep the per-(source, lang) corpus
  * rollup current while documents ARRIVE, without ever re-aggregating
  * the lake — the streaming face of [[Etl.rollupIncremental]] (whose
  * batch form handles removals/changes via the snapshot diff; an
  * append-only stream only adds).
  *
  * State layout is the exactly-once trick: the maintained state is
  * NOT one mutable rollup file but `seed rollup + per-batch delta
  * partitions`. Each micro-batch writes its OWN delta partition
  * (partitionBy batch_id, dynamic overwrite), so a RETRIED batch
  * replaces its previous attempt instead of double-counting — the
  * [[DriftStream]] sink contract, applied to cumulative state. Serving
  * merges seed + deltas with one tiny aggregation (group-cardinality ×
  * batches rows, never corpus rows); a compaction that folds old
  * deltas into the seed is the standard artifact-maintenance move and
  * does not change served values.
  *
  * The measured driver entry seeds from half the corpus, streams the
  * other half, and must land EXACTLY on the direct full-corpus rollup
  * — the same DuckDB oracle as the batch operator, so the hash gate
  * proves stream-maintained == recomputed.
  */
object RollupStream {

  /** Seed (or rebuild) the persisted base rollup. */
  def seedRollup(docs: DataFrame, seedPath: String): Unit =
    Etl.corpusRollup(docs).write.mode("overwrite").parquet(seedPath)

  /** Launch maintenance over a streaming documents frame: each batch
    * lands as its own delta partition under `deltaPath`. */
  def rollupMaintain(
      newDocs: DataFrame,
      deltaPath: String,
      checkpoint: String): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Etl.corpusRollup(batch.toDF())
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(deltaPath)
      }
      .start()

  /** Serve the current rollup: seed + all delta partitions, one small
    * aggregation (rows = groups × (1 + batches), never the corpus). */
  def serveRollup(
      spark: SparkSession, seedPath: String, deltaPath: String): DataFrame = {
    val seed = spark.read.parquet(seedPath)
    val deltas = spark.read.parquet(deltaPath)
      .select("source", "lang", "n_docs", "n_tokens", "n_chars")
    seed.unionByName(deltas)
      .groupBy("source", "lang")
      .agg(sum("n_docs").as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("n_chars").as("n_chars"))
      .filter(col("n_docs") > 0)
      .orderBy("source", "lang")
  }

  /** Bounded end-to-end run — the measured driver entry
    * (q_stream_rollup): even doc_ids seed the base rollup, odd ones
    * stream through maintenance, and the served merge must hash-match
    * the direct rollup over the WHOLE table (shared oracle with
    * q_rollup_incremental's recompute). localCheckpoint'd so the
    * staged source/state can be deleted before returning. */
  def rollupMaintainRun(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("graft_rollup_stream")
    val src = root.resolve("src").toString
    docs.filter(col("doc_id") % 2 =!= 0).write.mode("overwrite").parquet(src)
    seedRollup(docs.filter(col("doc_id") % 2 === 0), root.resolve("seed").toString)

    val q = rollupMaintain(
      spark.readStream.schema(docs.schema).parquet(src),
      root.resolve("delta").toString,
      root.resolve("ckpt").toString)
    try q.processAllAvailable() finally q.stop()

    val result = serveRollup(spark,
        root.resolve("seed").toString, root.resolve("delta").toString)
      .localCheckpoint()
      .orderBy("source", "lang")
    def rm(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    rm(root)
    result
  }
}
