package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared primitives of the `seed artifact + per-batch delta
  * partitions` exactly-once state layout ([[RollupStream]],
  * [[Bm25Stream]], [[CmsStream]]):
  *
  *  - the compaction watermark rides INSIDE the seed directory
  *    ("_"-prefixed: invisible to the parquet reader, like _SUCCESS),
  *    so a compact's rename swap commits artifact + watermark
  *    atomically;
  *  - maintenance skips batches at or below the watermark (already
  *    folded — a late retry must not double-count);
  *  - serving excludes delta partitions at or below it (their content
  *    lives in the seed);
  *  - compaction deletes ONLY the folded partitions: a micro-batch the
  *    stream commits mid-compact sits above the new watermark, the
  *    streaming checkpoint never replays a committed batch, and a
  *    blanket delete of the delta root would lose it permanently.
  */
private[graft] object DeltaLayout {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Run INDEPENDENT driver actions concurrently (guide §2.6 — overlap
    * independent jobs so one job's straggler tail back-fills with the
    * next job's tasks): the compaction/seed face writes each trigger
    * their own bounded job chain against disjoint output paths, and
    * serializing them leaves most cores idle through every tail. The
    * pool is sized to the task list (compactions have 2-5 faces);
    * failures propagate — the first failed task's exception rethrows
    * after the pool drains, exactly as the sequential form would. */
  private[streaming] def overlap(tasks: Seq[() => Unit]): Unit = {
    if (tasks.sizeIs <= 1) { tasks.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(
          tasks.map(t => scala.concurrent.Future(t()))),
        scala.concurrent.duration.Duration.Inf): Unit
    finally pool.shutdown()
  }

  private def foldedMarker(seedPath: String) =
    new Path(seedPath + "/_folded_through")

  /** Batches with id ≤ this are folded into the seed (−1 = none). */
  def foldedThrough(spark: SparkSession, seedPath: String): Long = {
    val p = foldedMarker(seedPath)
    val f = fs(spark, seedPath)
    if (!f.exists(p)) -1L
    else {
      val in = f.open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  /** Write the watermark marker into `dir` (the pre-swap tmp seed). */
  def writeFoldedMarker(f: FileSystem, dir: String, value: Long): Unit = {
    val out = f.create(new Path(dir + "/_folded_through"), true)
    try out.write(value.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** True iff `dir` holds at least one batch_id partition — a bare
    * existence check would hand a partition-less directory (all
    * partitions just compacted away) to the parquet reader, which
    * fails schema inference. */
  def hasDeltaPartitions(spark: SparkSession, dir: String): Boolean = {
    val dp = new Path(dir)
    val f = fs(spark, dir)
    f.exists(dp) &&
      f.listStatus(dp).exists(_.getPath.getName.startsWith("batch_id="))
  }

  /** True iff at least one landed delta batch is LIVE (above the
    * seed's compaction watermark) — a driver-side directory listing,
    * no Spark job. The empty-serve fast path every stream face shares:
    * right after a compaction folded everything, serving is a plain
    * read of the seed artifact, and the incremental fold machinery
    * (touched-set scoping, star contraction, re-peels — each a chain
    * of Spark jobs) is provably a no-op over an empty delta (the
    * untouched pass-through keeps every prior row and the refreshed
    * slice of an empty subgraph is empty; spec-asserted per face). */
  def hasLiveBatches(
      spark: SparkSession, seedPath: String, deltaPath: String): Boolean = {
    val folded = foldedThrough(spark, seedPath)
    batchIds(spark, deltaPath).exists(_ > folded)
  }

  /** The batch ids with a landed partition under `dir` — a driver-side
    * directory listing, bounded by the number of micro-batches. What a
    * multi-face writer consults to serve only batches whose COMMIT
    * face landed (a crash between two faces' writes must leave the
    * half-landed batch invisible, not half-served). */
  def batchIds(spark: SparkSession, dir: String): Seq[Long] = {
    val dp = new Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(dp)) Seq.empty
    else f.listStatus(dp).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("batch_id="))
        scala.util.Try(n.stripPrefix("batch_id=").toLong).toOption
      else None
    }
  }

  /** Crash-safe replacement of the live artifact directory by the
    * complete `tmp` one. The old delete-then-rename left a window with
    * NO live directory at all (crash after the delete → serving fails,
    * or silently sees watermark −1, until someone hand-restores the
    * maint dir). Here the live root renames ASIDE first, so a COMPLETE
    * artifact exists at the live or a recoverable path at every
    * instant:  live → live__old,  tmp → live,  delete __old. A crash
    * between the renames leaves __old (prior) AND tmp (new) both
    * complete; a crash before the final delete leaves a stale __old
    * that the next swap clears. A failed second rename restores the
    * prior live before failing loudly. (Object-store renames are
    * copies — run this against a filesystem with atomic-ish rename or
    * behind a path pointer.) */
  def swapLive(f: FileSystem, tmp: String, live: String): Unit = {
    val liveP = new Path(live)
    val oldP = new Path(live + "__old")
    if (f.exists(oldP)) f.delete(oldP, true): Unit // stale from a prior crash
    if (f.exists(liveP) && !f.rename(liveP, oldP))
      throw new java.io.IOException(
        s"swapLive: rename $live -> $oldP failed; live artifact untouched, " +
          s"complete new artifact remains at $tmp")
    if (!f.rename(new Path(tmp), liveP)) {
      // the restore can itself fail — report what actually happened,
      // not what was attempted (an operator acting on "restored" when
      // nothing was would look for a serving artifact that isn't there)
      val restored = f.exists(oldP) && f.rename(oldP, liveP)
      throw new java.io.IOException(
        s"swapLive: rename $tmp -> $live failed; " +
          (if (restored) "prior live restored"
           else s"restore ALSO failed — recover manually from $oldP") +
          s", complete new artifact remains at $tmp")
    }
    f.delete(oldP, true): Unit
  }

  /** The live (unfolded) delta rows: batches above the seed's
    * watermark and at or below `upTo`, projected to `cols` —
    * the serving/compaction read every DeltaLayout stream shares. A
    * missing or partition-less delta directory yields an empty frame
    * with the schema of `emptySchemaFrom` (a seed subdirectory).
    * `distinctRows` dedups across batches (set-valued states: edges);
    * additive states (weight increments) must keep duplicates. */
  def liveDeltaRows(
      spark: SparkSession, seedPath: String, deltaPath: String,
      upTo: Long, cols: Seq[String], emptySchemaFrom: String,
      distinctRows: Boolean): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val folded = foldedThrough(spark, seedPath)
    if (!hasDeltaPartitions(spark, deltaPath))
      spark.read.parquet(emptySchemaFrom)
        .select(cols.map(col): _*).limit(0)
    else {
      val live = spark.read.parquet(deltaPath)
        .filter(col("batch_id").cast("long") > folded
          && col("batch_id").cast("long") <= upTo)
        .select(cols.map(col): _*)
      if (distinctRows) live.distinct() else live
    }
  }

  /** Highest landed batch id in the delta directory (−1 when none). */
  def maxBatchId(spark: SparkSession, deltaPath: String): Long =
    spark.read.parquet(deltaPath)
      .agg(org.apache.spark.sql.functions
        .max(org.apache.spark.sql.functions.col("batch_id").cast("long")))
      .head() match {
        case r if r.isNullAt(0) => -1L
        case r => r.getLong(0)
      }

  /** Delete ONLY the delta partitions folded into the seed
    * (batch_id ≤ `upTo`) — see the class doc for why a blanket delete
    * is a data-loss bug. */
  def deleteFoldedPartitions(f: FileSystem, dir: Path, upTo: Long): Unit =
    if (f.exists(dir)) {
      f.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        val folded = n.startsWith("batch_id=") &&
          scala.util.Try(n.stripPrefix("batch_id=").toLong).toOption
            .exists(_ <= upTo)
        if (folded) f.delete(st.getPath, true): Unit
      }
    }
}
