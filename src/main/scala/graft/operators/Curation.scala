package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset curation: deterministic train/val/test assignment and
  * stratified sampling.
  *
  * Scale posture: split assignment is a pure narrow map on a hash of
  * the stable id — no shuffle, no state, reproducible across runs and
  * cluster sizes (the property RNG-based splits lack); stratified
  * sampling uses Spark's per-stratum Bernoulli sampling, also a
  * narrow op.
  */
object Curation {

  /** Stable split assignment: hash the id with a salt, bucket into
    * percent space, map cumulative weight ranges to split names.
    * Same row → same split, forever, on any cluster. */
  def assignSplits(
      df: DataFrame,
      idCol: String = "doc_id",
      weights: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5),
      salt: String = "graft-split-v1"): DataFrame = {
    require(weights.map(_._2).sum == 100, "split weights must total 100")
    val bucket = pmod(xxhash64(col(idCol), lit(salt)), lit(100L))
    val cum = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val split = weights.zip(cum).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), upper)) =>
        when(acc.isNotNull, acc).when(bucket < upper, name).otherwise(lit(null))
    }
    df.withColumn("split", split)
  }

  /** Split size summary (the driver-visible rollup of assignSplits). */
  def splitCounts(df: DataFrame, idCol: String = "doc_id"): DataFrame =
    assignSplits(df, idCol)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("split")

  /** Stratified sample: per-stratum fractions with a fixed seed
    * (Bernoulli per row — deterministic, narrow). */
  def stratifiedSample(
      df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)
}
