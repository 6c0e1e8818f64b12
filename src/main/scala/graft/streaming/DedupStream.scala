package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming ingest-time near-duplicate gate: the operational mode a
  * 100 TB pipeline actually runs — documents arrive as a stream and
  * dedup against a PERSISTED MinHash signature index
  * ([[Dedup.minhashSignatures]] written to parquet), never
  * re-sketching the corpus. The streaming twin of q_dedup_incremental
  * (reference raw_hash idempotency, rabbitmq-to-postgres/app.py,
  * extended to near-duplicates).
  *
  * Per micro-batch, inside foreachBatch:
  *   1. sketch the batch (one narrow codegen pass),
  *   2. band-join it against the index snapshot and emit the
  *      above-threshold (doc_new, doc_corpus, est_jaccard) pairs —
  *      exactly [[Dedup.minhashPairsAgainst]], so batch/stream pair
  *      sets are identical by construction (asserted in spec),
  *   3. optionally APPEND the batch's signatures to the index so later
  *      batches also dedup against earlier stream arrivals — the index
  *      grows with the corpus, still without any re-sketch.
  *
  * Exactly-once: the pairs sink partitions by batch_id with dynamic
  * partition overwrite, so a retried micro-batch REPLACES its own
  * output instead of double-appending. Index growth is a plain append:
  * a retry can append a batch's signatures twice, which is benign for
  * correctness (duplicate index rows produce duplicate candidates that
  * [[Dedup.minhashPairsAgainst]]'s pair-dedup collapses) and costs
  * only the duplicate rows' storage — compact the index offline if
  * retries are common.
  */
object DedupStream {

  /** Launch the gate over a streaming documents frame (doc_id, text,
    * ...). `indexPath` must hold an existing signature index; pairs
    * land under `pairsPath` partitioned by batch_id. */
  def nearDupGate(
      newDocs: DataFrame,
      indexPath: String,
      pairsPath: String,
      checkpoint: String,
      shingleLen: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      growIndex: Boolean = true): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val docs = batch.toDF()
        // index snapshot for THIS batch: the file listing is taken
        // here, before any growth append below lands
        val idx = spark.read.parquet(indexPath)
          .select(col("doc_id"), col("sig"))
        Dedup.minhashPairsAgainst(docs, idx, shingleLen, numHashes, bands, threshold)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(pairsPath)
        if (growIndex) {
          Dedup.minhashSignatures(docs, shingleLen, numHashes)
            .write.mode("append").parquet(indexPath)
        }
      }
      .start()
}
