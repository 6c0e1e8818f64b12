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
      if (f.exists(oldP)) f.rename(oldP, liveP): Unit // put the prior back
      throw new java.io.IOException(
        s"swapLive: rename $tmp -> $live failed; prior live restored, " +
          s"complete new artifact remains at $tmp")
    }
    f.delete(oldP, true): Unit
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
