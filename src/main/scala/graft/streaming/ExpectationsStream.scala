package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Expectations
import graft.operators.Expectations.Check

/** Structured Streaming form of the data-quality gate: the per-row
  * check subset of [[Expectations]] ([[Expectations.rowAudit]]) runs
  * on an ingest stream exactly as in batch — NotNull / InRange /
  * AcceptedValues are pure projections and the referential check is a
  * stream-static join against the (broadcast) parent key set, so the
  * frame is legal in append mode with no watermark and no state. This
  * is the gate a warehouse load puts in front of a landing sink:
  * every arriving row reports which declared constraints it violates
  * BEFORE it lands, instead of poisoning downstream aggregates
  * ([[Expectations.verify]] stays the per-load batch verdict).
  * Stateless + stream-static → the micro-batch union is row-identical
  * to the batch scan, so the measured entry shares its full SQL
  * oracle (equality asserted in StreamingSpec). */
object ExpectationsStream {

  /** Last memory-sink view per session (the CurationStream convention:
    * at most one result table stays registered). */
  private val lastGateTables =
    scala.collection.concurrent.TrieMap.empty[SparkSession, String]

  /** Bounded end-to-end run: stage the fact table as a parquet source,
    * stream it through [[Expectations.rowAudit]] with static parents,
    * return the complete per-row verdict set (ordered — the sink table
    * is bounded). */
  def gateRun(
      spark: SparkSession, facts: DataFrame,
      parents: Map[String, DataFrame], idCols: Seq[String],
      checks: Seq[Check]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft_expect_stream")
    val src = root.resolve("src").toString
    facts.write.mode("overwrite").parquet(src)

    val name = "graft_expect_" + java.util.UUID.randomUUID.toString.replace("-", "")
    lastGateTables.put(spark, name)
      .foreach(old => spark.catalog.dropTempView(old))
    val q = Expectations.rowAudit(
        spark.readStream.schema(facts.schema).parquet(src),
        parents, idCols, checks, ordered = false)
      .writeStream.outputMode("append")
      .format("memory").queryName(name)
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()

    def rm(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    rm(root)

    spark.table(name).orderBy(idCols.map(col) :+ col("violated"): _*)
  }
}
