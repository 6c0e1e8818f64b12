package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  * Results are materialized through the noop sink so column pruning
  * cannot skip the measured work (a bare count() would). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup outside the timed region
    SparkEntry.queries.get("q1_pricing_summary")
      .foreach(fn => fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // The harness keeps only the last ~2000 chars of stdout (plus sbt's
    // trailing "[success]" line), so the JSON line must stay well under
    // that or its head — including the opening brace — is cut off and
    // the line is unparseable. 3-decimal seconds and a short sf tag keep
    // the current ~70-query line under the cutoff, with a 2-decimal
    // fallback as the query count grows.
    val total = results.map(_._2).sum
    val sfTag = sfDir.split('/').last
    // Locale.ROOT: a comma-decimal default locale (de_DE, fr_FR) would
    // format 71.234 as "71,234" and corrupt the JSON
    def fmt(dp: Int, v: Double): String =
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    def line(dp: Int): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(dp, v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(3, total)},"unit":"sec","queries":$qs,"sf":"$sfTag"}"""
    }
    // the harness keeps the last ~2000 stdout chars and sbt appends a
    // ~70-char [success] line, so the printed line must stay ≤ ~1880 or
    // its head (the opening brace) is cut off. Cascade 3 → 2 → 1
    // decimals; when even 1dp no longer fits (the query count keeps
    // growing), keep the slowest queries individually and fold the
    // rest into "_rest" — the heavy tail is what per-query numbers are
    // for. The FULL 3dp line always lands in target/bench_full.json.
    def lineTop(dp: Int, topN: Int): String = {
      val bySlowest = results.sortBy(-_._2)
      val top = bySlowest.take(topN).sortBy(_._1)
      val rest = bySlowest.drop(topN).map(_._2).sum
      val qs = (top.map { case (k, v) => "\"" + k + "\":" + fmt(dp, v) } :+
        ("\"_rest\":" + fmt(dp, rest))).mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(3, total)},"unit":"sec","queries":$qs,"sf":"$sfTag"}"""
    }
    try {
      val dir = java.nio.file.Paths.get("target")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve("bench_full.json"),
        (line(3) + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // forensic copy only — never fail the bench
    println(Seq(line(3), line(2), line(1), lineTop(2, 45))
      .find(_.length <= 1880).getOrElse(lineTop(1, 30)))
    spark.stop()
  }
}
