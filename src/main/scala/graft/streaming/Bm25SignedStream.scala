package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Retrieval

/** REMOVAL-AWARE streaming BM25 index maintenance — the deletion
  * lifecycle extended beyond the graph family to the RETRIEVAL one
  * (the reference's upserts REPLACE rows and its deletes cascade:
  * rabbitmq-to-postgres/app.py:98 — a document index over that data
  * model must honor replacement and deletion, not only arrival).
  * Where [[Bm25Stream]] carries the append-only contract, this
  * harness takes signed rows (doc_id, text, op ∈ add|remove) with
  * LAST-WRITER-WINS semantics:
  *
  *  - an `add` of a NEW id indexes it; an `add` of an EXISTING id is
  *    a REPLACE (the old postings leave the served index, the new
  *    text's enter — the upsert case);
  *  - a `remove` deletes BY ID (no text needed — deletion events
  *    carry keys, not bodies), dropping the doc's postings and its
  *    contribution to n_docs/avgdl;
  *  - net state per doc resolves by LAST op in batch order, exactly
  *    the [[SignedGraphStream]] contract: added-then-removed nets
  *    out, removed-then-re-added serves the re-add's text.
  *
  * Layout: each batch lands its (doc_id, op) rows under
  * `deltaPath/ops/batch_id=` and its adds' postings under
  * `deltaPath/postings/batch_id=` (both dynamic-overwrite — a
  * retried batch replaces its own attempt); the seed holds postings
  * only. Serving reconstructs the live postings as `untouched seed
  * docs ∪ each net-added doc's postings from its LAST add batch`,
  * and recomputes (n_docs, tot_tokens) from the live frame's
  * per-doc lengths — one distinct + one tiny aggregate, which is
  * what makes removal exact: a dropped doc vanishes from df, idf,
  * AND avgdl, so a search served from the signed state is provably
  * identical to a full rebuild over the surviving corpus (the
  * driver entry hash-matches the SAME full-corpus DuckDB oracle as
  * q_bm25_search). Landing guards raise LOUDLY on an unknown op or
  * a doc_id appearing twice in one batch (two texts for one id, or
  * add+remove, is ambiguous — across batches order decides, inside
  * one there is no order). */
object Bm25SignedStream {

  /** Seed (or rebuild) the persisted postings from a corpus frame —
    * postings only: the signed serving path derives meta from the
    * live postings, because removals must subtract from it. */
  def seedIndex(docs: DataFrame, seedPath: String): Unit =
    Retrieval.bm25Index(docs)._1
      .write.mode("overwrite").parquet(s"$seedPath/postings")

  /** Launch maintenance over a streaming signed frame
    * (doc_id, text, op). Batches at or below the compaction
    * watermark are skipped (already folded in). */
  def indexMaintain(
      newOps: DataFrame, seedPath: String, deltaPath: String,
      checkpoint: String): StreamingQuery =
    newOps.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (batchId > DeltaLayout.foldedThrough(batch.sparkSession, seedPath)) {
          val guarded = batch.toDF()
            .select(col("doc_id"), col("text"),
              when(col("op").isin("add", "remove"), col("op"))
                .otherwise(raise_error(concat(
                  lit("Bm25SignedStream: op must be add|remove, got "),
                  col("op")))).as("op"))
          val dup = guarded.groupBy("doc_id")
            .agg(count(lit(1)).as("n_rows")).filter(col("n_rows") > 1)
          val checked = guarded.join(dup, Seq("doc_id"), "left")
            .select(col("doc_id"), col("text"),
              when(col("n_rows").isNotNull, raise_error(concat(
                  lit("Bm25SignedStream: doc_id "), col("doc_id").cast("string"),
                  lit(" appears more than once in one batch — ambiguous"))))
                .otherwise(col("op")).as("op"))
            .localCheckpoint()
          Retrieval.bm25Index(
              checked.filter(col("op") === "add").select("doc_id", "text"))
            ._1
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(s"$deltaPath/postings")
          checked.select("doc_id", "op")
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(s"$deltaPath/ops")
        }
      }
      .start()

  /** The live postings under last-writer-wins: untouched seed docs
    * pass through; each net-added doc serves the postings of its
    * LAST add batch (seed rows of a replaced doc drop); net-removed
    * docs vanish. */
  private def livePostings(
      spark: SparkSession, seedPath: String, deltaPath: String,
      upTo: Long): DataFrame = {
    val folded = DeltaLayout.foldedThrough(spark, seedPath)
    val cols = Seq("term", "doc_id", "tf", "dl")
    val seedP = spark.read.parquet(s"$seedPath/postings")
      .select(cols.map(col): _*)
    if (!DeltaLayout.hasDeltaPartitions(spark, s"$deltaPath/ops"))
      return seedP
    def live = col("batch_id").cast("long") > folded &&
      col("batch_id").cast("long") <= upTo
    val deltaP =
      if (!DeltaLayout.hasDeltaPartitions(spark, s"$deltaPath/postings"))
        seedP.withColumn("src_batch", lit(-1L)).limit(0)
      else spark.read.parquet(s"$deltaPath/postings")
        .filter(live)
        .select(col("term"), col("doc_id"), col("tf"), col("dl"),
          col("batch_id").cast("long").as("src_batch"))
    val allP = seedP.withColumn("src_batch", lit(-1L)).unionByName(deltaP)
    val net = spark.read.parquet(s"$deltaPath/ops")
      .filter(live)
      .select(col("doc_id"), col("op"), col("batch_id").cast("long").as("batch_id"))
      .groupBy("doc_id")
      .agg(max(struct(col("batch_id"), col("op"))).as("last"))
      .select(col("doc_id"), col("last.op").as("op"),
        col("last.batch_id").as("last_batch"))
      .localCheckpoint()
    val untouched = allP.join(net, Seq("doc_id"), "left_anti")
    val lastAdds = allP
      .join(net.filter(col("op") === "add").select("doc_id", "last_batch"),
        Seq("doc_id"))
      .filter(col("src_batch") === col("last_batch"))
      .drop("last_batch")
    untouched.unionByName(lastAdds).select(cols.map(col): _*)
  }

  /** Serve a BM25 search over the signed live state: meta
    * (n_docs, tot_tokens) recomputes from the live per-doc lengths so
    * removals subtract from df, idf, and avgdl exactly. */
  def serveSearch(
      spark: SparkSession, seedPath: String, deltaPath: String,
      queries: DataFrame, termsLiteral: Seq[String], k: Int = 10): DataFrame = {
    val p = livePostings(spark, seedPath, deltaPath, Long.MaxValue)
      .localCheckpoint()
    val meta = p.select("doc_id", "dl").distinct()
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_tokens"))
    Retrieval.bm25FromIndex(p, meta, queries, termsLiteral, k = k)
  }

  /** Fold the net signed state into a fresh postings seed (watermark
    * + crash-safe swap; a batch committed mid-compact stays live). */
  def compact(spark: SparkSession, seedPath: String, deltaPath: String): Unit = {
    import org.apache.hadoop.fs.Path
    if (!DeltaLayout.hasDeltaPartitions(spark, s"$deltaPath/ops")) return
    val fs = DeltaLayout.fs(spark, seedPath)
    val maxBatch = DeltaLayout.maxBatchId(spark, s"$deltaPath/ops")
    val newP = livePostings(spark, seedPath, deltaPath, maxBatch)
      .localCheckpoint()
    val tmp = seedPath + "__maint"
    newP.write.mode("overwrite").parquet(s"$tmp/postings")
    val newFolded = math.max(maxBatch,
      DeltaLayout.foldedThrough(spark, seedPath))
    if (newFolded >= 0) DeltaLayout.writeFoldedMarker(fs, tmp, newFolded)
    DeltaLayout.swapLive(fs, tmp, seedPath)
    DeltaLayout.deleteFoldedPartitions(
      fs, new Path(s"$deltaPath/ops"), newFolded)
    DeltaLayout.deleteFoldedPartitions(
      fs, new Path(s"$deltaPath/postings"), newFolded)
  }

  /** Bounded end-to-end run — the measured driver entry
    * (q_stream_bm25_signed): the seed index holds yesterday's corpus
    * — a third of today's docs verbatim, a third with STALE text
    * (the upsert-replace case), and an alien slice that today
    * DELETES; the stream delivers today's adds (new + replacing) and
    * the alien removals (by id, empty text), compacts mid-lifecycle,
    * and serves the driver's query set — which must hash-match the
    * SAME full-corpus DuckDB oracle as q_bm25_search: signed
    * stream-maintained == full rebuild over the surviving corpus,
    * proven by the gate. */
  def searchMaintainRun(
      spark: SparkSession, dir: String,
      queries: DataFrame, termsLiteral: Seq[String]): DataFrame = {
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_bm25s_stream")
    val src = root.resolve("src").toString
    val seedPath = root.resolve("seed").toString
    val deltaP = root.resolve("delta").toString
    def rm(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    try {
      val staged = StreamMeter.timeSeed("q_stream_bm25_signed") {
        val stale = docs.filter(col("doc_id") % 3 === 1)
          .withColumn("text", concat(col("text"), lit(" stalecopy")))
        val alien = docs.filter(col("doc_id") % 3 === 2)
          .select((col("doc_id") + 50000000L).as("doc_id"), col("text"))
        seedIndex(
          docs.filter(col("doc_id") % 3 === 0)
            .unionByName(stale).unionByName(alien),
          seedPath)
        val d = docs.filter(col("doc_id") % 3 =!= 0)
          .withColumn("op", lit("add"))
          .unionByName(alien.select(col("doc_id"),
            lit("").as("text"), lit("remove").as("op")))
        d.repartition(2).write.mode("overwrite").parquet(src)
        d
      }
      val q = indexMaintain(
        spark.readStream.schema(staged.schema)
          .option("maxFilesPerTrigger", 1).parquet(src),
        seedPath, deltaP, root.resolve("ckpt").toString)
      try q.processAllAvailable() finally q.stop()
      // mid-lifecycle compaction: the served search must be unchanged
      compact(spark, seedPath, deltaP)
      serveSearch(spark, seedPath, deltaP, queries, termsLiteral)
        .localCheckpoint()
    } finally rm(root)
  }
}
