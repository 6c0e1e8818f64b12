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
  * instantiator's job — the layout owns id-keyed FACES (the primary
  * `postings` plus any instantiator-declared extras, each a frame
  * derived from the same adds slice and reconstructed by the same
  * last-writer-wins fold), which is why removals make those
  * statistics exact: a vanished doc's rows are simply not in the
  * faces the instantiator aggregates. */
private[graft] object SignedIndexLayout {

  /** High-bit tag for the staged runs' alien ids (the slice the
    * stream deletes): `id | AlienIdBit` stays collision-free for ALL
    * real ids below 2^40 — an additive offset silently collides once
    * ids reach it (the defect class [[graft.sources.Multimodal]]'s
    * TwinIdBit fixed for media ids). */
  private[graft] val AlienIdBit: Long = 1L << 40

  /** Launch maintenance over a streaming signed frame
    * (idCol, payloadCols..., op). `indexOf` maps the adds slice
    * (idCol, payloadCols...) to the primary `postings` face; `who`
    * names the instantiator in the loud guard messages. Text indexes
    * use the default (doc_id, text); the vector index rides the same
    * machine with (vec_id, embedding); the image index carries the
    * whole media record as several payload columns. `extraFaces`
    * land additional per-batch faces derived from the SAME adds
    * slice (e.g. BM25's per-doc lengths) — every face writes BEFORE
    * the ops face, which commits the batch: [[livePostings]] serves
    * only batches whose ops partition landed, so a crash between
    * face writes leaves the half-landed batch invisible (not
    * half-served) until the replay overwrites it. */
  def maintain(
      newOps: DataFrame, seedPath: String, deltaPath: String,
      checkpoint: String, indexOf: DataFrame => DataFrame,
      who: String, idCol: String = "doc_id",
      payloadCols: Seq[String] = Seq("text"),
      extraFaces: Seq[(String, (DataFrame, DataFrame) => DataFrame)] = Nil)
      : StreamingQuery =
    newOps.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (batchId > DeltaLayout.foldedThrough(batch.sparkSession, seedPath)) {
          // ONE pass lands the dup guard (guide §2.4): a window count
          // over idCol flags a doc_id appearing twice in this batch in
          // the same exchange that groups it — the previous
          // groupBy + join-back shape scanned the batch source twice
          // and paid two exchanges for the same verdict.
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col(idCol))
          val checked = batch.toDF()
            .select((col(idCol) +: payloadCols.map(col)) :+
              when(col("op").isin("add", "remove"), col("op"))
                .otherwise(raise_error(concat(
                  lit(s"$who: op must be add|remove, got "),
                  col("op")))).as("op"): _*)
            .withColumn("n_rows", count(lit(1)).over(w))
            .select((col(idCol) +: payloadCols.map(col)) :+
              when(col("n_rows") > 1, raise_error(concat(
                  lit(s"$who: $idCol "), col(idCol).cast("string"),
                  lit(" appears more than once in one batch — ambiguous"))))
                .otherwise(col("op")).as("op"): _*)
            .localCheckpoint()
          val adds = checked.filter(col("op") === "add")
            .select((idCol +: payloadCols).map(col): _*)
          // the primary face is computed ONCE: extra faces receive it
          // alongside the adds slice, so a face that is a projection
          // of the postings (BM25's doclen) reuses the materialized
          // frame instead of re-deriving the whole index per batch
          // (guide §1.2 — don't compute things twice)
          val primary =
            if (extraFaces.isEmpty) indexOf(adds)
            else indexOf(adds).localCheckpoint()
          // the non-commit faces are independent writes against
          // disjoint paths — overlap them (guide §2.6); ops still
          // lands strictly AFTER, it is the batch's commit face
          DeltaLayout.overlap(
            (("postings" -> primary) +: extraFaces.map { case (face, f) =>
              face -> f(adds, primary)
            }).map { case (face, df) =>
              () => df.withColumn("batch_id", lit(batchId))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(s"$deltaPath/$face")
            })
          // ops lands LAST — the batch's commit face
          checked.select(col(idCol), col("op"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(s"$deltaPath/ops")
        }
      }
      .start()

  /** The live rows of one face under last-writer-wins; `cols` is the
    * instantiator's schema for that face (must contain `idCol`). */
  def livePostings(
      spark: SparkSession, seedPath: String, deltaPath: String,
      upTo: Long, cols: Seq[String], idCol: String = "doc_id",
      face: String = "postings"): DataFrame = {
    val folded = DeltaLayout.foldedThrough(spark, seedPath)
    val seedP = spark.read.parquet(s"$seedPath/$face")
      .select(cols.map(col): _*)
    if (!DeltaLayout.hasDeltaPartitions(spark, s"$deltaPath/ops"))
      return seedP
    def live = col("batch_id").cast("long") > folded &&
      col("batch_id").cast("long") <= upTo
    // trust only postings partitions whose batch also landed its ops
    // partition: maintenance writes postings first and ops LAST (the
    // commit face), so a crash between the two leaves an orphan
    // postings partition — without this filter its docs would serve
    // via the `untouched` anti-join ALONGSIDE the seed rows for the
    // same doc (duplicate postings) until the batch replays. The id
    // list is a driver-side partition listing, bounded by batch count,
    // and `isin` on the partition column prunes at planning time.
    val landedOps = DeltaLayout.batchIds(spark, s"$deltaPath/ops")
      .filter(b => b > folded && b <= upTo)
    val deltaP =
      if (!DeltaLayout.hasDeltaPartitions(spark, s"$deltaPath/$face"))
        seedP.withColumn("src_batch", lit(-1L)).limit(0)
      else spark.read.parquet(s"$deltaPath/$face")
        .filter(live)
        .filter(col("batch_id").cast("long").isin(landedOps: _*))
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

  /** Fold the net signed state into a fresh seed (watermark +
    * crash-safe swap; a batch committed mid-compact stays live).
    * `extraFaces` are additional maintained faces ((name, schema) —
    * e.g. BM25's per-doc lengths), each folded through the same
    * last-writer-wins reconstruction. `carryFaces` are immutable
    * sibling faces under the seed root (e.g. the IVF centroids)
    * rewritten verbatim into the new seed so the swap carries them
    * across. */
  def compact(
      spark: SparkSession, seedPath: String, deltaPath: String,
      cols: Seq[String], idCol: String = "doc_id",
      carryFaces: Seq[String] = Nil,
      extraFaces: Seq[(String, Seq[String])] = Nil): Unit = {
    import org.apache.hadoop.fs.Path
    if (!DeltaLayout.hasDeltaPartitions(spark, s"$deltaPath/ops")) return
    val fs = DeltaLayout.fs(spark, seedPath)
    val maxBatch = DeltaLayout.maxBatchId(spark, s"$deltaPath/ops")
    val faces = ("postings" -> cols) +: extraFaces
    val tmp = seedPath + "__maint"
    // each face's reconstruction chain and each carried copy is an
    // independent job against a disjoint tmp path — overlap them
    // (guide §2.6); everything reads the OLD seed root, which only
    // swaps after all writes land, so no checkpoint is needed
    DeltaLayout.overlap(
      faces.map { case (face, fcols) =>
        () => livePostings(
            spark, seedPath, deltaPath, maxBatch, fcols, idCol, face)
          .write.mode("overwrite").parquet(s"$tmp/$face")
      } ++ carryFaces.map { f =>
        () => spark.read.parquet(s"$seedPath/$f")
          .write.mode("overwrite").parquet(s"$tmp/$f")
      })
    val newFolded = math.max(maxBatch,
      DeltaLayout.foldedThrough(spark, seedPath))
    if (newFolded >= 0) DeltaLayout.writeFoldedMarker(fs, tmp, newFolded)
    DeltaLayout.swapLive(fs, tmp, seedPath)
    DeltaLayout.deleteFoldedPartitions(
      fs, new Path(s"$deltaPath/ops"), newFolded)
    faces.foreach { case (face, _) =>
      DeltaLayout.deleteFoldedPartitions(
        fs, new Path(s"$deltaPath/$face"), newFolded) }
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
      .select(col("doc_id").bitwiseOR(AlienIdBit).as("doc_id"), col("text"))
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
