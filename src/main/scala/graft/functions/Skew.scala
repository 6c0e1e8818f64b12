package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers: salted two-phase aggregation and salted
  * broadcast-side replication joins.
  *
  * AQE's skew-join split handles sort-merge skew at runtime; these
  * helpers cover the cases AQE does not: a single hot GROUP BY key
  * saturating one reducer, and a hot join key against a replicable
  * small side. Salting is deterministic (hash of a row-unique column),
  * so results are reproducible and exactly equal to the unsalted plan.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) partial-agg,
    * then re-agg by key. `partials` maps each wanted output column to
    * (partialExpr, finalExpr-over-partial). Example for sum+count:
    *   saltedAgg(df, Seq($"k"), 16, $"row_id",
    *     Map("s" -> (sum($"x"), sum), "n" -> (count(lit(1)), sum)))
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[Column],
      saltBuckets: Int,
      saltSource: Column,
      partials: Map[String, (Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltBuckets.toLong)))
    val phase1 = salted
      .groupBy((keys :+ col("__salt")): _*)
      .agg(partials.head._2._1.as(s"__p_${partials.head._1}"),
        partials.tail.map { case (n, (p, _)) => p.as(s"__p_$n") }.toSeq: _*)
    phase1
      .groupBy(keys: _*)
      .agg(partials.head._2._2(col(s"__p_${partials.head._1}")).as(partials.head._1),
        partials.tail.map { case (n, (_, f)) => f(col(s"__p_$n")).as(n) }.toSeq: _*)
  }

  /** Salted join for a skewed left key against a small right side: the
    * left gets a deterministic salt in [0, buckets), the right is
    * replicated across every salt value, and the join key becomes
    * (key, salt) — splitting a hot key across `buckets` reducers. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      buckets: Int, leftRowId: Column): DataFrame = {
    val saltedLeft = left.withColumn("__salt", pmod(xxhash64(leftRowId), lit(buckets.toLong)))
    val replicatedRight = right.withColumn("__salt", explode(
      expr(s"sequence(0L, ${buckets - 1}L)")))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
