package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Resolution

class ResolutionSpec extends AnyFunSuite with SparkSessionTestBase {
  import spark.implicits._

  private def catalog = Seq(
    (10L, "red widget brand#1"),
    (11L, "blue widget brand#1"),
    (12L, "red gizmo brand#2"),
    (13L, "green bolt brand#3")).toDF("canon_id", "name")

  test("catalogTokenIndex drops tokens over the df cap, keeps the rest") {
    val idx = Resolution.catalogTokenIndex(catalog, dfCap = 2)
    val toks = idx.select("token").as[String].collect().toSet
    // "widget" (df 2) and "red" (df 2) survive at cap 2; every brand
    // token (df 1-2) survives; nothing has df > 2 here except none
    assert(toks.contains("widget") && toks.contains("brand#1"))
    val idx1 = Resolution.catalogTokenIndex(catalog, dfCap = 1)
    val toks1 = idx1.select("token").as[String].collect().toSet
    // at cap 1 the df-2 tokens (red, widget, brand#1) are stopwords
    assert(!toks1.contains("widget") && !toks1.contains("red")
      && !toks1.contains("brand#1"))
    assert(toks1.contains("gizmo") && toks1.contains("bolt"))
  }

  test("entityMatch: exact name scores exactly 1e6; best match wins rank 1") {
    val feed = Seq(
      (1L, "red widget brand#1"),   // exact
      (2L, "red widgett brand#1"),  // 1 edit
      (3L, "GREEN  bolt   Brand#3"), // normalization only
      (4L, "purple sprocket brand#9")) // no blocking token overlap
      .toDF("feed_id", "name")
    val got = Resolution.entityMatch(feed, catalog,
      minScoreMicro = 400000L, dfCap = 10, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toList
    assert(got === List(
      (1L, 10L, 1000000L),
      // lev 1 over maxlen 19 -> (18*1e6) div 19 = 947368; jacc: ftoks
      // {red,widgett,brand#1} ∩ {red,widget,brand#1} = 2 of union 4 ->
      // 500000; score = (947368+500000) div 2 = 723684
      (2L, 10L, 723684L),
      (3L, 13L, 1000000L)))
  }

  test("entityMatch scoring matches an independent local computation") {
    val feed = Seq((1L, "red widgett brand#1")).toDF("feed_id", "name")
    val r = Resolution.entityMatch(feed, catalog,
      minScoreMicro = 0L, dfCap = 10, k = 4).collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val cat = catalog.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    r.foreach { row =>
      val (cid, fname) = (row.getLong(1), "red widgett brand#1")
      val cname = cat(cid)
      val l = lev(fname, cname)
      val mx = math.max(fname.length, cname.length)
      val levSim = (mx - math.min(l, mx)).toLong * 1000000L / mx
      val ft = fname.split(" ").toSet
      val ct = cname.split(" ").toSet
      val jacc = (ft & ct).size.toLong * 1000000L / (ft | ct).size
      assert(row.getInt(2) === l)
      assert(row.getLong(3) === levSim)
      assert(row.getLong(4) === jacc)
      assert(row.getLong(5) === (levSim + jacc) / 2)
    }
    // ranks are dense from 1 in (score DESC, canon_id ASC) order
    assert(r.map(_.getInt(6)).toList === (1 to r.length).toList)
    assert(r.map(_.getLong(5)).toList ===
      r.map(_.getLong(5)).toList.sortBy(-_))
  }

  test("entityMatch recovers corrupted testdata feed rows at rank 1") {
    val feed = SparkEntry.erFeed(spark, sfDir)
    val cat = SparkEntry.erCatalog(spark, sfDir)
    val got = Resolution.entityMatch(feed, cat,
      minScoreMicro = 500000L, dfCap = 100, k = 1)
    // truth: the canonical that bears the UNcorrupted name
    val truth = SparkEntry.erBase(spark, sfDir)
      .select(col("p_partkey").as("feed_id"), col("name"))
      .join(cat, Seq("name"))
      .select(col("feed_id"), col("canon_id").as("true_id"))
    val n = feed.count()
    val joined = got.join(truth, Seq("feed_id"))
    val nMatched = joined.count()
    val nRight = joined.filter(col("canon_id") === col("true_id")).count()
    assert(nMatched >= (n * 9) / 10, s"matched $nMatched of $n")
    assert(nRight.toDouble / nMatched >= 0.95,
      s"recovery ${nRight.toDouble / nMatched}")
    // uncorrupted rows (feed_id % 4 == 0) must self-match exactly
    val exact = joined.filter(col("feed_id") % 4 === 0)
    assert(exact.filter(col("canon_id") =!= col("true_id")).count() === 0)
    assert(exact.filter(col("score_micro") =!= 1000000L).count() === 0)
  }

  test("indexed serving is bit-equal to inline and plan-locked corpus-free") {
    val feed = SparkEntry.erFeed(spark, sfDir)
    val cat = SparkEntry.erCatalog(spark, sfDir)
    val inline = Resolution.entityMatch(feed, cat,
      minScoreMicro = 500000L, dfCap = 100, k = 1)
    val idx = SparkEntry.erIndexShared(spark, sfDir)
    val served = Resolution.entityMatchWithIndex(feed, cat, idx,
      minScoreMicro = 500000L, k = 1)
    assert(served.collect().map(_.toString).toSeq ===
      inline.collect().map(_.toString).toSeq)
    // the artifact read is a FileScan; the served plan carries no
    // df-count aggregation rebuild of the blocking index
    assert(idx.queryExecution.executedPlan.toString.contains("FileScan"))
  }

  test("goldenRecords folds rank-1 matches with exact cent bounds; unmatched canonicals stay") {
    val feed = Seq(
      (1L, "red widget brand#1"), (2L, "red widgett brand#1"),
      (3L, "red gizmo brand#2")).toDF("feed_id", "name")
    val attrs = Seq((1L, 10.005), (2L, 12.004), (3L, 7.5))
      .toDF("feed_id", "price")
    val matches = Resolution.entityMatch(feed, catalog,
      minScoreMicro = 400000L, dfCap = 10, k = 1)
    val g = Resolution.goldenRecords(matches, attrs, catalog)
      .collect().map(r => (r.getLong(0), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toList
    // 10.005 -> 1001 cents (half-up), 12.004 -> 1200, 7.5 -> 750
    assert(g === List(
      (10L, 2L, Some(1001L), Some(1200L)),
      (11L, 0L, None, None),
      (12L, 1L, Some(750L), Some(750L)),
      (13L, 0L, None, None)))
  }

  test("golden records fold the persisted match artifact bit-equally") {
    // q_entity_golden consumes the fingerprint-keyed match artifact;
    // it must equal survivorship over the inline match exactly
    val feed = SparkEntry.erFeed(spark, sfDir)
    val cat = SparkEntry.erCatalog(spark, sfDir)
    val viaArtifact = SparkEntry.queries("q_entity_golden")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val inline = Resolution.goldenRecords(
        Resolution.entityMatch(feed, cat,
          minScoreMicro = 500000L, dfCap = 100, k = 1),
        feed.select(col("feed_id"), col("price")), cat)
      .collect().map(_.toString).toSeq
    assert(viaArtifact === inline)
    // and the artifact really is a parquet FileScan, not a rebuild
    assert(SparkEntry.erMatchShared(spark, sfDir)
      .queryExecution.executedPlan.toString.contains("graft_er_match"))
  }

  test("blockingOccupancy reports exact candidate mass; mega-tokens top it") {
    // catalog where "widget" names 3 canonicals (df cap 3 keeps it)
    // and the feed hits it from every record — the mega-token
    val cat = Seq((1L, "red widget"), (2L, "blue widget"),
      (3L, "green widget"), (4L, "lone bolt")).toDF("canon_id", "name")
    val feed = Seq((1L, "red widget"), (2L, "blue  widget"),
      (3L, "WIDGET green"), (4L, "bolt lone")).toDF("feed_id", "name")
    val idx = Resolution.catalogTokenIndex(cat, dfCap = 3)
    val got = Resolution.blockingOccupancy(feed, idx, minCandidates = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    // widget: df 3 × 3 feed hits = 9 candidate pairs — tops the report
    assert(got.head === ("widget", 3L, 3L, 9L))
    // the per-color tokens each contribute 1×1 < minCandidates → dropped;
    // lone/bolt each df 1 × 1 hit → dropped too
    assert(got.map(_._1) === List("widget"))
    // the meter is EXACT per token: est_candidates equals the
    // blocking join's row count for that token
    val widgetPairs = feed
      .select(col("feed_id"), explode(array_distinct(
        split(Resolution.normalizeName(col("name")), " ", -1))).as("token"))
      .join(idx, Seq("token"))
      .filter(col("token") === "widget").count()
    assert(widgetPairs === 9L)
  }

  test("streaming entityGateRun equals the batch match twin") {
    val streamed = graft.streaming.ResolutionStream
      .entityGateRun(spark, sfDir)
      .collect().map(_.toString).toSeq
    val batch = Resolution.entityMatchWithIndex(
        SparkEntry.erFeed(spark, sfDir), SparkEntry.erCatalog(spark, sfDir),
        SparkEntry.erIndexShared(spark, sfDir),
        minScoreMicro = 500000L, k = 1)
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("empty feed and empty catalog degrade to empty matches") {
    val emptyFeed = Seq.empty[(Long, String)].toDF("feed_id", "name")
    val emptyCat = Seq.empty[(Long, String)].toDF("canon_id", "name")
    assert(Resolution.entityMatch(emptyFeed, catalog).count() === 0)
    assert(Resolution.entityMatch(
      Seq((1L, "red widget brand#1")).toDF("feed_id", "name"),
      emptyCat).count() === 0)
    // golden over no matches keeps the catalog spine at zero
    val g = Resolution.goldenRecords(
      Resolution.entityMatch(emptyFeed, catalog),
      emptyFeed.withColumn("price", lit(0.0)), catalog)
    assert(g.count() === 4)
    assert(g.filter(col("n_matched") =!= 0L).count() === 0)
  }
}
