package graft.streaming

/** Seed-build seconds recorded by the measured stream harnesses
  * (q_stream_* driver entries): each runner's steady-state median is a
  * whole maintenance LIFECYCLE — seed staging + micro-batches +
  * mid-stream compaction + serve — so without this split the seed cost
  * inside the measured path is invisible (a reader would misread the
  * harness total as serving cost). [[graft.Bench]] folds the snapshot
  * into the published build map (and bench_full.json's full one);
  * values are the LAST run's measurement, which at steady state is the
  * stable per-run seed cost.
  *
  * The OTHER lifecycle phases (batch = the micro-batch drain, compact,
  * serve) record through [[timePhase]] into a separate map published
  * only in bench_full.json ("phases") — the optimization guide's §1
  * measure-first split: without it the per-entry total cannot say
  * WHICH phase carries the cost. */
object StreamMeter {

  private val seeds =
    scala.collection.concurrent.TrieMap.empty[String, Double]

  private val phases =
    scala.collection.concurrent.TrieMap.empty[(String, String), Double]

  /** Time `f` as `entry`'s seed phase and record it. */
  def timeSeed[T](entry: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    seeds.put(entry, sec): Unit
    phases.put((entry, "seed"), sec): Unit
    r
  }

  /** Time `f` as one named lifecycle phase of `entry` (batch /
    * compact / serve); the last run's value wins, like the seed map. */
  def timePhase[T](entry: String, phase: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    phases.put((entry, phase), (System.nanoTime() - t0) / 1e9): Unit
    r
  }

  def snapshot: Map[String, Double] = seeds.toMap

  /** entry -> phase -> seconds (seed included), last run wins. */
  def phaseSnapshot: Map[String, Map[String, Double]] =
    phases.toMap.groupBy(_._1._1).map { case (e, m) =>
      e -> m.map { case ((_, p), v) => p -> v }
    }
}
