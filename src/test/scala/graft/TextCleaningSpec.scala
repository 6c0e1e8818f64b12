package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextCleaning

/** Text cleaning specs: PII redaction, unicode normalization,
  * sequence packing. */
class TextCleaningSpec extends AnyFunSuite with SparkSessionTestBase {

  test("piiRedact replaces every planted email/phone/url") {
    val docs = TextCleaning.withSyntheticPii(Tables.documents(spark, sfDir))
    val rows = TextCleaning.piiRedact(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[String]("clean_text")
      assert(t.contains("<EMAIL>") && t.contains("<PHONE>") && t.contains("<URL>"))
      assert(!t.contains("@example.com"))
      assert(!t.contains("https://"))
    }
  }

  test("piiStats counts match what piiRedact would replace") {
    val docs = TextCleaning.withSyntheticPii(Tables.documents(spark, sfDir))
    val rows = TextCleaning.piiStats(docs).collect()
    assert(rows.nonEmpty)
    // every synthetic doc plants exactly one of each PII kind
    rows.foreach { r =>
      assert(r.getAs[Int]("n_urls") === 1)
      assert(r.getAs[Int]("n_emails") === 1)
      assert(r.getAs[Int]("n_phones") === 1)
      assert(r.getAs[Boolean]("has_pii"))
    }
    // clean text has no PII
    import spark.implicits._
    val clean = Seq((1L, "nothing to see here")).toDF("doc_id", "text")
    val c = TextCleaning.piiStats(clean).collect().head
    assert(c.getAs[Int]("n_urls") + c.getAs[Int]("n_emails") +
      c.getAs[Int]("n_phones") === 0)
    assert(!c.getAs[Boolean]("has_pii"))
  }

  test("graft_nfc normalizes decomposed unicode and keeps ascii intact") {
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    val decomposed = "école" // e + combining acute
    val df = Seq((1L, decomposed), (2L, "plain ascii")).toDF("doc_id", "text")
    val out = TextCleaning.normalizeUnicode(df).collect()
    assert(out(0).getAs[String]("norm_text") === "école") // composed é
    assert(out(1).getAs[String]("norm_text") === "plain ascii")
  }

  test("domainStats counts docs and urls per extracted domain") {
    import spark.implicits._
    val docs = Seq(
      (1L, "visit https://a.example.org/x and https://a.example.org/y today"),
      (2L, "see http://b.example.net/z"),
      (3L, "no urls at all")).toDF("doc_id", "text")
    val rows = TextCleaning.domainStats(docs).collect()
    val byDomain = rows.map(r => r.getAs[String]("domain") -> r).toMap
    assert(byDomain.keySet === Set("a.example.org", "b.example.net"))
    assert(byDomain("a.example.org").getAs[Long]("n_docs") === 1L)
    assert(byDomain("a.example.org").getAs[Long]("n_urls") === 2L)
    assert(byDomain("b.example.net").getAs[Long]("n_urls") === 1L)
    // synthetic injection yields the full rotating domain set
    val injected = TextCleaning.domainStats(
      TextCleaning.withSyntheticUrls(Tables.documents(spark, sfDir)))
    assert(injected.count() === 10) // site0-6.example.org + cdn0-2.example.net
  }

  test("assignSplits is complete, disjoint, deterministic, and near the weights") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val a = graft.operators.Curation.assignSplits(docs).select("doc_id", "split").collect()
    val b = graft.operators.Curation.assignSplits(docs).select("doc_id", "split").collect()
    assert(a.map(r => (r.getLong(0), r.getString(1))).toSet ===
      b.map(r => (r.getLong(0), r.getString(1))).toSet) // deterministic
    val byKind = a.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byKind.keySet === Set("train", "val", "test"))
    assert(byKind.values.sum === 500) // complete
    assert(byKind("train") > 400 && byKind("train") < 480) // ~90%
  }

  test("stratifiedSample respects per-stratum fractions roughly") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val sampled = graft.operators.Curation.stratifiedSample(docs, "lang",
      Map("en" -> 0.5, "de" -> 0.1, "es" -> 0.0, "fr" -> 0.0, "zh" -> 0.0))
    val counts = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("es") && !counts.contains("zh"))
    assert(counts.getOrElse("en", 0L) > counts.getOrElse("de", 0L))
  }

  test("packSequences fills bins to capacity within each source shard") {
    val docs = Tables.documents(spark, sfDir)
    val bins = TextCleaning.packSequences(docs, windowTokens = 256).collect()
    assert(bins.nonEmpty)
    val totalDocs = bins.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs === docs.count())
    // non-final bins of a source hold at least a window's worth of
    // tokens minus one straddling doc
    bins.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("bin"))
      sorted.dropRight(1).foreach { b =>
        assert(b.getAs[Long]("total_tokens") >= 1)
      }
      // bins are contiguous 0..n
      assert(sorted.map(_.getAs[Long]("bin")).toSeq === sorted.indices.map(_.toLong))
    }
  }

  test("bucketed two-level prefix sum equals the flat per-source window") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    // tiny buckets force many cross-bucket offsets on the test corpus
    val bucketed = TextCleaning.packSequences(docs, windowTokens = 256, bucketDocs = 7)
      .collect().map(_.toString).toSeq
    // reference: the single-window formulation the operator replaced
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val flat = docs.select(col("doc_id"), col("source"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|\\S"), lit(0))).as("n_tokens"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0)))
      .withColumn("bin", floor(col("cum_before") / 256))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "bin")
      .collect().map(_.toString).toSeq
    assert(bucketed === flat)
    assert(bucketed.nonEmpty)
  }

  test("urlDedup collapses scheme/www/query/fragment/slash variants") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a https://www.Example.com/Page?utm_source=x&y=1#frag"),
      (2L, "b http://example.com/page/"),
      (3L, "c https://example.com/page"),
      (4L, "d https://other.com/a https://other.com/a")
    ).toDF("doc_id", "text")
    val rows = TextCleaning.urlDedup(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // three spellings of one page collapse; keeper is the lowest doc_id
    val page = rows("example.com/page")
    assert(page.getAs[Long]("n_docs") === 3L)
    assert(page.getAs[Long]("n_urls") === 3L)
    assert(page.getAs[Long]("keeper_doc") === 1L)
    // a doc repeating one URL counts urls, not docs
    val other = rows("other.com/a")
    assert(other.getAs[Long]("n_docs") === 1L)
    assert(other.getAs[Long]("n_urls") === 2L)
    assert(rows.size === 2)
  }

  test("urlDedup on the synthetic dup-url corpus pairs both spellings") {
    val docs = Tables.documents(spark, sfDir)
    val r = TextCleaning.urlDedup(TextCleaning.withSyntheticDupUrls(docs))
    // every canonical page gets exactly 2 URLs per referencing doc
    // (the https+www+query spelling and the http+slash+fragment one)
    assert(r.filter(col("n_urls") =!= col("n_docs") * 2).count() === 0)
    // page identity is (doc_id % 7, doc_id % 50): docs collide across
    // the lcm-350 classes, so there are at most 350 canonical pages
    assert(r.count() <= 350)
  }
}
