package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, Graph}

/** Streaming connected-component maintenance — the SIXTH
  * [[DeltaLayout]] instance, and the first for a state the counter
  * instances cannot carry: component LABELS are not additive (a later
  * batch's bridge edge rewrites earlier labels — no per-batch counter
  * delta can express "these two components are now one"). The split
  * that still fits the layout exactly: EDGES are additive. Each
  * micro-batch lands its canonical edge delta under its batch_id
  * partition (append-only; dynamic overwrite makes a retried batch
  * replace its previous attempt), and SERVING re-contracts only the
  * delta-TOUCHED components against the seed labeling
  * ([[Graph.componentsIncremental]] — untouched components' labels
  * pass through verbatim, the iterative star-contraction runs on the
  * touched subgraph only). Compaction folds live deltas into the seed
  * pair (edges ∪ deltas; labels re-merged through the same
  * incremental path) under the standard watermark/rename-swap
  * discipline, bounding serve cost over stream lifetime.
  *
  * The measured driver entry seeds from the co-purchase graph missing
  * one order slice, streams the remaining edges, compacts mid-stream,
  * and serves the component stats — which must hash-match the SAME
  * full-graph reachability oracle as q_components: stream-maintained
  * == full recompute, proven by the gate.
  */
object ComponentsStream {

  /** Seed (or rebuild) the persisted (edges, labels) pair. */
  def seedComponents(edges: DataFrame, seedRoot: String): Unit = {
    val canon = Graph.canonicalEdges(edges).localCheckpoint()
    canon.write.mode("overwrite").parquet(s"$seedRoot/edges")
    Dedup.duplicateLabelsStar(
        canon.select(col("a").as("doc_a"), col("b").as("doc_b")))
      .write.mode("overwrite").parquet(s"$seedRoot/labels")
  }

  /** Launch maintenance over a streaming raw edge frame
    * (src, dst, w): each batch canonicalizes ONLY its own edges and
    * lands them under its batch_id partition; batches at or below the
    * seed's compaction watermark are skipped (already folded in). */
  def componentsMaintain(
      newEdges: DataFrame, seedRoot: String, deltaPath: String,
      checkpoint: String): StreamingQuery =
    newEdges.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (batchId > DeltaLayout.foldedThrough(batch.sparkSession, seedRoot)) {
          Graph.canonicalEdges(batch.toDF())
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(deltaPath)
        }
      }
      .start()

  private def liveDeltaEdges(
      spark: SparkSession, seedRoot: String, deltaPath: String,
      upTo: Long): DataFrame =
    DeltaLayout.liveDeltaRows(spark, seedRoot, deltaPath, upTo,
      Seq("a", "b"), s"$seedRoot/edges", distinctRows = true)

  /** The live component stats: seed labeling + live edge deltas
    * through the touched-only incremental re-contraction — the
    * [[Graph.components]] output contract over everything ingested so
    * far. A missing/empty delta directory serves the seed alone. */
  def serveComponents(
      spark: SparkSession, seedRoot: String, deltaPath: String): DataFrame =
    serveBounded(spark, seedRoot, deltaPath, Long.MaxValue)

  private def serveBounded(
      spark: SparkSession, seedRoot: String, deltaPath: String,
      upTo: Long): DataFrame =
    // EMPTY-DELTA FAST PATH (guide §2.4): with no live batch (fresh
    // seed, or right after compaction folded everything) the
    // incremental fold is a provable no-op — untouched rows pass
    // through, the refreshed slice of an empty subgraph is empty — so
    // serving is the two bounded aggregations over the seed pair,
    // skipping the touched-set scoping + star contraction job chain.
    // Row-identity with the incremental path is spec-asserted.
    if (!DeltaLayout.hasLiveBatches(spark, seedRoot, deltaPath))
      Graph.componentStatsOf(
        spark.read.parquet(s"$seedRoot/labels"),
        spark.read.parquet(s"$seedRoot/edges"))
    else Graph.componentsIncremental(
      spark.read.parquet(s"$seedRoot/edges"),
      spark.read.parquet(s"$seedRoot/labels"),
      liveDeltaEdges(spark, seedRoot, deltaPath, upTo)
        .select(col("a").as("src"), col("b").as("dst"), lit(1L).as("w")))

  /** Fold live deltas into the seed pair: edges union, labels
    * re-merged through the incremental path, watermark + rename swap
    * (the Bm25Stream discipline — a batch committed mid-compact stays
    * a live delta above the new watermark). */
  def compact(spark: SparkSession, seedRoot: String, deltaPath: String): Unit = {
    import org.apache.hadoop.fs.Path
    if (!DeltaLayout.hasDeltaPartitions(spark, deltaPath)) return
    val fs = DeltaLayout.fs(spark, seedRoot)
    val maxBatch = DeltaLayout.maxBatchId(spark, deltaPath)
    val seedE = spark.read.parquet(s"$seedRoot/edges")
    val seedL = spark.read.parquet(s"$seedRoot/labels")
    val delta = liveDeltaEdges(spark, seedRoot, deltaPath, maxBatch)
      .localCheckpoint()
    // lazy — materialized by its face write below
    val newE = seedE.select("a", "b").unionByName(delta.select("a", "b"))
      .distinct()
    val tmp = seedRoot + "__maint"
    // the two faces are independent job chains — overlap them (§2.6)
    DeltaLayout.overlap(Seq(
      () => newE.write.mode("overwrite").parquet(s"$tmp/edges"),
      () => Graph.incrementalLabels(seedE, seedL,
          delta.select(col("a").as("src"), col("b").as("dst"),
            lit(1L).as("w")))
        .write.mode("overwrite").parquet(s"$tmp/labels")))
    val newFolded = math.max(maxBatch,
      DeltaLayout.foldedThrough(spark, seedRoot))
    if (newFolded >= 0) DeltaLayout.writeFoldedMarker(fs, tmp, newFolded)
    DeltaLayout.swapLive(fs, tmp, seedRoot)
    DeltaLayout.deleteFoldedPartitions(fs, new Path(deltaPath), newFolded)
  }

  /** Bounded end-to-end run — the measured driver entry
    * (q_stream_components): seed from the PERSISTED prior artifact
    * (yesterday's graph — the co-purchase graph missing the %20==9
    * order slice; prior ⊆ full because pair counts only grow — built
    * once per data version, a READ here: production has yesterday's
    * state, it does not re-contract it per run), stream the
    * remaining edge delta in micro-batches, compact mid-stream,
    * serve the stats — must hash-match the full-graph q_components
    * oracle. The stream owns a private COPY of the seed because
    * compaction rewrites it. */
  def componentsMaintainRun(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, dir)
    val full = Graph.canonicalEdges(
      graft.operators.Purchases.coPurchaseGraph(li, minCount = 2L))
      .localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("graft_cc_stream")
    val srcDir = root.resolve("src").toString
    val seedRoot = root.resolve("seed").toString
    val deltaP = root.resolve("delta").toString
    def rm(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    // try/finally: any failure in seed staging/stream/compact/serve
    // must not leak the graft_cc_stream* tree under tmpdir.
    try {
      val delta = StreamMeter.timeSeed("q_stream_components") {
        val (priorE, priorL) = graft.SparkEntry.cpIndexShared(spark, dir)
        // the arriving delta, staged as raw edges in two files so the
        // stream sees more than one micro-batch; derived from the
        // SAME artifact frame the edges copy writes
        val d = full.join(
            priorE.select("a", "b"), Seq("a", "b"), "left_anti")
          .select(col("a").as("src"), col("b").as("dst"), lit(1L).as("w"))
        // three independent writes — overlap them (guide §2.6)
        DeltaLayout.overlap(Seq(
          () => priorE.write.mode("overwrite").parquet(s"$seedRoot/edges"),
          () => priorL.write.mode("overwrite").parquet(s"$seedRoot/labels"),
          () => d.repartition(2).write.mode("overwrite").parquet(srcDir)))
        d
      }
      val q = componentsMaintain(
        spark.readStream.schema(delta.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir),
        seedRoot, deltaP, root.resolve("ckpt").toString)
      StreamMeter.timePhase("q_stream_components", "batch") {
        try q.processAllAvailable() finally q.stop()
      }
      // mid-lifecycle compaction: served stats must be unchanged by it
      StreamMeter.timePhase("q_stream_components", "compact") {
        compact(spark, seedRoot, deltaP)
      }
      // localCheckpoint (eager), NOT collect: one row per component is
      // unbounded in general (singletons dominate real crawl graphs) —
      // the materialized blocks keep the result off-driver and
      // independent of the temp dirs rm() deletes. Trade-off: the
      // checkpoint blocks are NOT replicated, so losing an executor
      // after rm() fails the query loudly rather than recomputing —
      // accepted for family consistency with the sibling harnesses
      StreamMeter.timePhase("q_stream_components", "serve") {
        serveComponents(spark, seedRoot, deltaP).localCheckpoint()
      }.orderBy("component")
    } finally rm(root)
  }
}
