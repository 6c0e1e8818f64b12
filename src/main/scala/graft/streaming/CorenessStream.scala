package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, Graph}

/** Streaming CORENESS maintenance — the SEVENTH [[DeltaLayout]]
  * instance, completing the density family's lifecycle matrix (batch
  * [[Graph.coreness]] / sharded [[Graph.corenessSharded]] /
  * incremental [[Graph.corenessIncremental]] / streaming): core
  * numbers are even less additive than component labels (one bridge
  * edge can re-peel a whole merged component), but the
  * [[ComponentsStream]] split applies verbatim — EDGES are additive,
  * so each micro-batch lands its canonical edge delta under its
  * batch_id partition, and SERVING re-peels only the delta-TOUCHED
  * components against the seed (edges, labels, coreness) triple
  * ([[Graph.corenessIncremental]] — untouched components' coreness
  * rows pass through verbatim, touched ones re-peel
  * component-sharded in-executor). Compaction folds live deltas into
  * the seed triple under the standard watermark / [[DeltaLayout
  * .swapLive]] discipline.
  *
  * The measured driver entry seeds from the PERSISTED prior graph
  * artifact (the co-purchase graph missing one order slice — read,
  * not recomputed), streams the remaining edges, compacts mid-stream,
  * and serves — which must hash-match the SAME full-graph 23-CTE
  * peel-ladder oracle as q_coreness: stream-maintained == full
  * recompute, proven by the gate. */
object CorenessStream {

  /** Seed (or rebuild) the persisted (edges, labels, coreness) triple. */
  def seedCoreness(edges: DataFrame, seedRoot: String): Unit = {
    val canon = Graph.canonicalEdges(edges).localCheckpoint()
    canon.write.mode("overwrite").parquet(s"$seedRoot/edges")
    Dedup.duplicateLabelsStar(
        canon.select(col("a").as("doc_a"), col("b").as("doc_b")))
      .write.mode("overwrite").parquet(s"$seedRoot/labels")
    Graph.corenessSharded(
        canon.select(col("a").as("src"), col("b").as("dst")))
      .write.mode("overwrite").parquet(s"$seedRoot/coreness")
  }

  /** Launch maintenance over a streaming raw edge frame (src, dst, w):
    * the [[ComponentsStream.componentsMaintain]] contract — each batch
    * canonicalizes ONLY its own edges; batches at or below the seed's
    * compaction watermark are skipped (already folded in). */
  def corenessMaintain(
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

  /** The live coreness decomposition: seed triple + live edge deltas
    * through the touched-only incremental re-peel. A missing/empty
    * delta directory serves the seed alone. */
  def serveCoreness(
      spark: SparkSession, seedRoot: String, deltaPath: String): DataFrame =
    serveBounded(spark, seedRoot, deltaPath, Long.MaxValue)

  private def serveBounded(
      spark: SparkSession, seedRoot: String, deltaPath: String,
      upTo: Long): DataFrame =
    // EMPTY-DELTA FAST PATH (guide §2.4): with no live batch the
    // incremental re-peel is a provable no-op (every prior row passes
    // through untouched, the empty subgraph re-peels to nothing), so
    // serving reads the coreness face straight off the seed artifact.
    // Row-identity with the incremental path is spec-asserted.
    if (!DeltaLayout.hasLiveBatches(spark, seedRoot, deltaPath))
      spark.read.parquet(s"$seedRoot/coreness").select("node", "coreness")
    else Graph.corenessIncremental(
      spark.read.parquet(s"$seedRoot/edges"),
      spark.read.parquet(s"$seedRoot/labels"),
      spark.read.parquet(s"$seedRoot/coreness"),
      liveDeltaEdges(spark, seedRoot, deltaPath, upTo)
        .select(col("a").as("src"), col("b").as("dst"), lit(1L).as("w")))

  /** Fold live deltas into the seed triple: edges union, labels
    * re-merged through the incremental contraction, coreness through
    * the incremental re-peel; watermark + crash-safe swap. */
  def compact(spark: SparkSession, seedRoot: String, deltaPath: String): Unit = {
    import org.apache.hadoop.fs.Path
    if (!DeltaLayout.hasDeltaPartitions(spark, deltaPath)) return
    val fs = DeltaLayout.fs(spark, seedRoot)
    val maxBatch = DeltaLayout.maxBatchId(spark, deltaPath)
    val seedE = spark.read.parquet(s"$seedRoot/edges")
    val seedL = spark.read.parquet(s"$seedRoot/labels")
    val seedC = spark.read.parquet(s"$seedRoot/coreness")
    val delta = liveDeltaEdges(spark, seedRoot, deltaPath, maxBatch)
      .localCheckpoint()
    val dRaw = delta.select(col("a").as("src"), col("b").as("dst"),
      lit(1L).as("w"))
    // lazy — materialized by its face write below (a localCheckpoint
    // here would compute the distinct twice: once to blocks, once out)
    val newE = seedE.select("a", "b").unionByName(delta.select("a", "b"))
      .distinct()
    // ONE shared fold scope feeds both faces (guide §1.2): the labels
    // face and the coreness re-peel previously each recomputed the
    // full-prior-edge semi-join AND the iterative star contraction
    val scope = Graph.foldScope(seedE, seedL, dRaw, None)
    val tmp = seedRoot + "__maint"
    // the three faces are independent job chains over shared
    // materialized inputs — overlap them (guide §2.6)
    DeltaLayout.overlap(Seq(
      () => newE.write.mode("overwrite").parquet(s"$tmp/edges"),
      () => Graph.labelsFromScope(seedL, scope)
        .write.mode("overwrite").parquet(s"$tmp/labels"),
      () => Graph.corenessFromScope(seedL, seedC, scope)
        .write.mode("overwrite").parquet(s"$tmp/coreness")))
    val newFolded = math.max(maxBatch,
      DeltaLayout.foldedThrough(spark, seedRoot))
    if (newFolded >= 0) DeltaLayout.writeFoldedMarker(fs, tmp, newFolded)
    DeltaLayout.swapLive(fs, tmp, seedRoot)
    DeltaLayout.deleteFoldedPartitions(fs, new Path(deltaPath), newFolded)
  }

  /** Bounded end-to-end run — the measured driver entry
    * (q_stream_coreness): seed from the PERSISTED prior artifact
    * (yesterday's graph — prior ⊆ full because pair counts only
    * grow), stream the remaining edge delta in micro-batches, compact
    * mid-stream, serve the decomposition — must hash-match the
    * full-graph q_coreness oracle. The stream owns a private COPY of
    * the seed because compaction rewrites it. */
  def corenessMaintainRun(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, dir)
    val full = Graph.canonicalEdges(
      graft.operators.Purchases.coPurchaseGraph(li, minCount = 2L))
      .localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("graft_core_stream")
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
    try {
      val delta = StreamMeter.timeSeed("q_stream_coreness") {
        val (priorE, priorL) = graft.SparkEntry.cpIndexShared(spark, dir)
        val d = full.join(
            priorE.select("a", "b"), Seq("a", "b"), "left_anti")
          .select(col("a").as("src"), col("b").as("dst"), lit(1L).as("w"))
        // four independent writes — overlap them (guide §2.6)
        DeltaLayout.overlap(Seq(
          () => priorE.write.mode("overwrite").parquet(s"$seedRoot/edges"),
          () => priorL.write.mode("overwrite").parquet(s"$seedRoot/labels"),
          () => graft.SparkEntry.cpCorenessShared(spark, dir)
            .write.mode("overwrite").parquet(s"$seedRoot/coreness"),
          () => d.repartition(2).write.mode("overwrite").parquet(srcDir)))
        d
      }
      val q = corenessMaintain(
        spark.readStream.schema(delta.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir),
        seedRoot, deltaP, root.resolve("ckpt").toString)
      StreamMeter.timePhase("q_stream_coreness", "batch") {
        try q.processAllAvailable() finally q.stop()
      }
      // mid-lifecycle compaction: served decomposition unchanged by it
      StreamMeter.timePhase("q_stream_coreness", "compact") {
        compact(spark, seedRoot, deltaP)
      }
      // localCheckpoint (eager), NOT collect: the frame is one row per
      // NODE — unbounded, unlike ComponentsStream's per-component
      // stats — so it must stay off-driver; the materialized blocks
      // keep the result independent of the temp dirs rm() deletes
      StreamMeter.timePhase("q_stream_coreness", "serve") {
        serveCoreness(spark, seedRoot, deltaP).localCheckpoint()
      }.orderBy("node")
    } finally rm(root)
  }
}
