package graft.streaming

/** Seed-build seconds recorded by the measured stream harnesses
  * (q_stream_* driver entries): each runner's steady-state median is a
  * whole maintenance LIFECYCLE — seed staging + micro-batches +
  * mid-stream compaction + serve — so without this split the seed cost
  * inside the measured path is invisible (a reader would misread the
  * harness total as serving cost). [[graft.Bench]] folds the snapshot
  * into the published build map (and bench_full.json's full one);
  * values are the LAST run's measurement, which at steady state is the
  * stable per-run seed cost. */
object StreamMeter {

  private val seeds =
    scala.collection.concurrent.TrieMap.empty[String, Double]

  /** Time `f` as `entry`'s seed phase and record it. */
  def timeSeed[T](entry: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    seeds.put(entry, (System.nanoTime() - t0) / 1e9): Unit
    r
  }

  def snapshot: Map[String, Double] = seeds.toMap
}
