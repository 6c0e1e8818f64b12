package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, Graph}

/** Streaming K-TRUSS maintenance — the NINTH [[DeltaLayout]] instance,
  * completing the density family's full lifecycle on its densest rung
  * (batch [[Graph.kTruss]] / sharded [[Graph.kTrussSharded]] /
  * incremental [[Graph.kTrussIncremental]] / streaming): the
  * [[CorenessStream]] split applies verbatim because the truss obeys
  * the same component-locality argument one rung deeper (a triangle
  * never crosses a component boundary) — EDGES are additive, so each
  * micro-batch lands its canonical edge delta under its batch_id
  * partition, and SERVING re-peels only the delta-TOUCHED components
  * against the seed (edges, labels, truss) triple
  * ([[Graph.kTrussIncremental]] — untouched components' truss edges
  * pass through verbatim with exact within-component support).
  * Compaction folds the triple under the standard watermark /
  * [[DeltaLayout.swapLive]] discipline.
  *
  * The measured driver entry seeds from the PERSISTED prior graph
  * artifact, streams the remaining edges, compacts mid-stream, and
  * serves — which must exactly equal the full-graph peel
  * (spec-asserted; rows-only at the driver because the truss peel has
  * no tractable SQL twin). */
object KTrussStream {

  /** Seed (or rebuild) the persisted (edges, labels, truss) triple. */
  def seedTruss(edges: DataFrame, seedRoot: String, k: Int): Unit = {
    val canon = Graph.canonicalEdges(edges).localCheckpoint()
    canon.write.mode("overwrite").parquet(s"$seedRoot/edges")
    Dedup.duplicateLabelsStar(
        canon.select(col("a").as("doc_a"), col("b").as("doc_b")))
      .write.mode("overwrite").parquet(s"$seedRoot/labels")
    Graph.kTrussSharded(
        canon.select(col("a").as("src"), col("b").as("dst")), k)
      .write.mode("overwrite").parquet(s"$seedRoot/truss")
  }

  /** Launch maintenance over a streaming raw edge frame (src, dst, w):
    * the [[CorenessStream.corenessMaintain]] contract — each batch
    * canonicalizes ONLY its own edges; batches at or below the seed's
    * compaction watermark are skipped (already folded in). */
  def trussMaintain(
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

  /** The live k-truss: seed triple + live edge deltas through the
    * touched-only incremental re-peel. A missing/empty delta
    * directory serves the seed alone. */
  def serveTruss(
      spark: SparkSession, seedRoot: String, deltaPath: String,
      k: Int): DataFrame =
    // EMPTY-DELTA FAST PATH (guide §2.4): with no live batch the
    // incremental re-peel is a provable no-op (untouched truss edges
    // pass through, the empty subgraph peels to nothing), so serving
    // reads the truss face straight off the seed artifact.
    // Row-identity with the incremental path is spec-asserted.
    if (!DeltaLayout.hasLiveBatches(spark, seedRoot, deltaPath))
      spark.read.parquet(s"$seedRoot/truss").select("a", "b", "support")
    else Graph.kTrussIncremental(
      spark.read.parquet(s"$seedRoot/edges"),
      spark.read.parquet(s"$seedRoot/labels"),
      spark.read.parquet(s"$seedRoot/truss"),
      liveDeltaEdges(spark, seedRoot, deltaPath, Long.MaxValue)
        .select(col("a").as("src"), col("b").as("dst"), lit(1L).as("w")),
      k)

  /** Fold live deltas into the seed triple: edges union, labels
    * re-merged through the incremental contraction, truss through the
    * incremental re-peel; watermark + crash-safe swap. */
  def compact(
      spark: SparkSession, seedRoot: String, deltaPath: String,
      k: Int): Unit = {
    import org.apache.hadoop.fs.Path
    if (!DeltaLayout.hasDeltaPartitions(spark, deltaPath)) return
    val fs = DeltaLayout.fs(spark, seedRoot)
    val maxBatch = DeltaLayout.maxBatchId(spark, deltaPath)
    val seedE = spark.read.parquet(s"$seedRoot/edges")
    val seedL = spark.read.parquet(s"$seedRoot/labels")
    val seedT = spark.read.parquet(s"$seedRoot/truss")
    val delta = liveDeltaEdges(spark, seedRoot, deltaPath, maxBatch)
      .localCheckpoint()
    val dRaw = delta.select(col("a").as("src"), col("b").as("dst"),
      lit(1L).as("w"))
    // lazy — materialized by its face write below
    val newE = seedE.select("a", "b").unionByName(delta.select("a", "b"))
      .distinct()
    // ONE shared fold scope feeds both faces (guide §1.2): the labels
    // face and the truss re-peel previously each recomputed the
    // full-prior-edge semi-join AND the iterative star contraction
    val scope = Graph.foldScope(seedE, seedL, dRaw, None)
    val tmp = seedRoot + "__maint"
    // independent face chains over shared materialized inputs —
    // overlap them (guide §2.6)
    DeltaLayout.overlap(Seq(
      () => newE.write.mode("overwrite").parquet(s"$tmp/edges"),
      () => Graph.labelsFromScope(seedL, scope)
        .write.mode("overwrite").parquet(s"$tmp/labels"),
      () => Graph.kTrussFromScope(seedL, seedT, scope, k)
        .write.mode("overwrite").parquet(s"$tmp/truss")))
    val newFolded = math.max(maxBatch,
      DeltaLayout.foldedThrough(spark, seedRoot))
    if (newFolded >= 0) DeltaLayout.writeFoldedMarker(fs, tmp, newFolded)
    DeltaLayout.swapLive(fs, tmp, seedRoot)
    DeltaLayout.deleteFoldedPartitions(fs, new Path(deltaPath), newFolded)
  }

  /** Bounded end-to-end run — the measured driver entry
    * (q_stream_ktruss): seed from the PERSISTED prior artifact
    * (yesterday's graph — prior ⊆ full because pair counts only
    * grow), stream the remaining edge delta in micro-batches, compact
    * mid-stream, serve the truss — must exactly equal the full-graph
    * peel (spec-asserted). The stream owns a private COPY of the seed
    * because compaction rewrites it. */
  def trussMaintainRun(spark: SparkSession, dir: String): DataFrame = {
    val k = 3
    val li = graft.Tables.lineitem(spark, dir)
    val full = Graph.canonicalEdges(
      graft.operators.Purchases.coPurchaseGraph(li, minCount = 2L))
      .localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("graft_truss_stream")
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
      val delta = StreamMeter.timeSeed("q_stream_ktruss") {
        val (priorE, priorL) = graft.SparkEntry.cpIndexShared(spark, dir)
        val d = full.join(
            priorE.select("a", "b"), Seq("a", "b"), "left_anti")
          .select(col("a").as("src"), col("b").as("dst"), lit(1L).as("w"))
        // four independent writes — overlap them (guide §2.6)
        DeltaLayout.overlap(Seq(
          () => priorE.write.mode("overwrite").parquet(s"$seedRoot/edges"),
          () => priorL.write.mode("overwrite").parquet(s"$seedRoot/labels"),
          () => graft.SparkEntry.cpTrussShared(spark, dir)
            .write.mode("overwrite").parquet(s"$seedRoot/truss"),
          () => d.repartition(2).write.mode("overwrite").parquet(srcDir)))
        d
      }
      val q = trussMaintain(
        spark.readStream.schema(delta.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir),
        seedRoot, deltaP, root.resolve("ckpt").toString)
      StreamMeter.timePhase("q_stream_ktruss", "batch") {
        try q.processAllAvailable() finally q.stop()
      }
      // mid-lifecycle compaction: served truss unchanged by it
      StreamMeter.timePhase("q_stream_ktruss", "compact") {
        compact(spark, seedRoot, deltaP, k)
      }
      // localCheckpoint, NOT collect: one row per truss EDGE is
      // unbounded — the materialized blocks keep the result off-driver
      // and independent of the temp dirs rm() deletes
      StreamMeter.timePhase("q_stream_ktruss", "serve") {
        serveTruss(spark, seedRoot, deltaP, k).localCheckpoint()
      }.orderBy("a", "b")
    } finally rm(root)
  }
}
