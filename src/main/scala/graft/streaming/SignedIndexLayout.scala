package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The REMOVAL-AWARE document-index state machine shared by the
  * signed retrieval streams ([[Bm25SignedStream]],
  * [[PhraseSignedStream]]) — one machinery, two indexes, the same
  * move as [[graft.operators.Dedup.fingerprintPairs]] carrying both
  * text SimHash and image dHash. Signed rows (doc_id, text,
  * op ∈ add|remove) with LAST-WRITER-WINS semantics:
  *
  *  - batches land their guarded (doc_id, op) rows under
  *    `deltaPath/ops/batch_id=` and their adds' postings (whatever
  *    frame `indexOf` derives) under `deltaPath/postings/batch_id=`,
  *    both dynamic-overwrite — a retried batch replaces its own
  *    attempt;
  *  - landing guards raise LOUDLY on an unknown op or a doc_id
  *    appearing twice in one batch (two texts for one id, or
  *    add+remove, is ambiguous: across batches order decides, inside
  *    one there is no order);
  *  - the live postings reconstruct as `untouched seed docs ∪ each
  *    net-added doc's postings from its LAST add batch` — a replace
  *    drops the seed rows, a net remove drops the doc entirely, an
  *    added-then-removed doc nets out, a removed-then-re-added doc
  *    serves the re-add's text;
  *  - compaction folds the net state into a fresh postings seed
  *    under the standard watermark + crash-safe swap.
  *
  * Serving-side corpus statistics (df/avgdl for BM25) are the
  * instantiator's job — this layout owns only the postings frame,
  * which is why removals here make those statistics exact: a
  * vanished doc's rows are simply not in the frame the instantiator
  * aggregates. */
private[streaming] object SignedIndexLayout {

  /** Launch maintenance over a streaming signed frame
    * (idCol, payloadCol, op). `indexOf` maps the adds slice
    * (idCol, payloadCol) to its postings frame; `who` names the
    * instantiator in the loud guard messages. Text indexes use the
    * default (doc_id, text); the vector index rides the same machine
    * with (vec_id, embedding). */
  def maintain(
      newOps: DataFrame, seedPath: String, deltaPath: String,
      checkpoint: String, indexOf: DataFrame => DataFrame,
      who: String, idCol: String = "doc_id",
      payloadCol: String = "text"): StreamingQuery =
    newOps.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (batchId > DeltaLayout.foldedThrough(batch.sparkSession, seedPath)) {
          val guarded = batch.toDF()
            .select(col(idCol), col(payloadCol),
              when(col("op").isin("add", "remove"), col("op"))
                .otherwise(raise_error(concat(
                  lit(s"$who: op must be add|remove, got "),
                  col("op")))).as("op"))
          val dup = guarded.groupBy(idCol)
            .agg(count(lit(1)).as("n_rows")).filter(col("n_rows") > 1)
          val checked = guarded.join(dup, Seq(idCol), "left")
            .select(col(idCol), col(payloadCol),
              when(col("n_rows").isNotNull, raise_error(concat(
                  lit(s"$who: $idCol "), col(idCol).cast("string"),
                  lit(" appears more than once in one batch — ambiguous"))))
                .otherwise(col("op")).as("op"))
            .localCheckpoint()
          indexOf(checked.filter(col("op") === "add").select(idCol, payloadCol))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(s"$deltaPath/postings")
          checked.select(col(idCol), col("op"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(s"$deltaPath/ops")
        }
      }
      .start()

  /** The live postings under last-writer-wins; `cols` is the
    * instantiator's postings schema (must contain `idCol`). */
  def livePostings(
      spark: SparkSession, seedPath: String, deltaPath: String,
      upTo: Long, cols: Seq[String], idCol: String = "doc_id"): DataFrame = {
    val folded = DeltaLayout.foldedThrough(spark, seedPath)
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
        .select((cols.map(col) :+
          col("batch_id").cast("long").as("src_batch")): _*)
    val allP = seedP.withColumn("src_batch", lit(-1L)).unionByName(deltaP)
    val net = spark.read.parquet(s"$deltaPath/ops")
      .filter(live)
      .select(col(idCol), col("op"),
        col("batch_id").cast("long").as("batch_id"))
      .groupBy(idCol)
      .agg(max(struct(col("batch_id"), col("op"))).as("last"))
      .select(col(idCol), col("last.op").as("op"),
        col("last.batch_id").as("last_batch"))
      .localCheckpoint()
    val untouched = allP.join(net, Seq(idCol), "left_anti")
    val lastAdds = allP
      .join(net.filter(col("op") === "add").select(idCol, "last_batch"),
        Seq(idCol))
      .filter(col("src_batch") === col("last_batch"))
      .drop("last_batch")
    untouched.unionByName(lastAdds).select(cols.map(col): _*)
  }

  /** Fold the net signed state into a fresh postings seed (watermark
    * + crash-safe swap; a batch committed mid-compact stays live).
    * `carryFaces` are immutable sibling faces under the seed root
    * (e.g. the IVF centroids) rewritten verbatim into the new seed so
    * the swap carries them across. */
  def compact(
      spark: SparkSession, seedPath: String, deltaPath: String,
      cols: Seq[String], idCol: String = "doc_id",
      carryFaces: Seq[String] = Nil): Unit = {
    import org.apache.hadoop.fs.Path
    if (!DeltaLayout.hasDeltaPartitions(spark, s"$deltaPath/ops")) return
    val fs = DeltaLayout.fs(spark, seedPath)
    val maxBatch = DeltaLayout.maxBatchId(spark, s"$deltaPath/ops")
    val newP = livePostings(spark, seedPath, deltaPath, maxBatch, cols, idCol)
      .localCheckpoint()
    val carried = carryFaces.map(f =>
      f -> spark.read.parquet(s"$seedPath/$f").localCheckpoint())
    val tmp = seedPath + "__maint"
    newP.write.mode("overwrite").parquet(s"$tmp/postings")
    carried.foreach { case (f, df) =>
      df.write.mode("overwrite").parquet(s"$tmp/$f") }
    val newFolded = math.max(maxBatch,
      DeltaLayout.foldedThrough(spark, seedPath))
    if (newFolded >= 0) DeltaLayout.writeFoldedMarker(fs, tmp, newFolded)
    DeltaLayout.swapLive(fs, tmp, seedPath)
    DeltaLayout.deleteFoldedPartitions(
      fs, new Path(s"$deltaPath/ops"), newFolded)
    DeltaLayout.deleteFoldedPartitions(
      fs, new Path(s"$deltaPath/postings"), newFolded)
  }

  /** The measured signed-run corpus staging shared by the driver
    * entries: the seed indexes YESTERDAY'S corpus — doc_id %3==0
    * verbatim, %3==1 with STALE text (today's stream replaces them),
    * and an id-shifted alien slice that today DELETES — and the
    * staged stream delivers today's adds (new + replacing) plus the
    * alien removals by id, split in two files so the stream sees
    * more than one micro-batch. Returns the staged frame (its schema
    * seeds the file source). */
  def stageSignedCorpus(
      docs: DataFrame, seedWith: DataFrame => Unit, src: String): DataFrame = {
    val stale = docs.filter(col("doc_id") % 3 === 1)
      .withColumn("text", concat(col("text"), lit(" stalecopy")))
    val alien = docs.filter(col("doc_id") % 3 === 2)
      .select((col("doc_id") + 50000000L).as("doc_id"), col("text"))
    seedWith(docs.filter(col("doc_id") % 3 === 0)
      .unionByName(stale).unionByName(alien))
    val d = docs.filter(col("doc_id") % 3 =!= 0)
      .withColumn("op", lit("add"))
      .unionByName(alien.select(col("doc_id"),
        lit("").as("text"), lit("remove").as("op")))
    d.repartition(2).write.mode("overwrite").parquet(src)
    d
  }
}
