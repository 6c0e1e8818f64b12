package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data text cleaning: PII redaction, unicode normalization,
  * and context-window sequence packing.
  *
  * Scale posture: redaction/normalization are narrow per-row maps
  * (codegen'd regexp/normalizer); packing is one window pass ordered
  * by a stable key. Patterns stay in the RE2∩Java-regex common subset
  * so the DuckDB oracle evaluates them identically.
  */
object TextCleaning {

  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val phoneRe = "\\+?[0-9]{1,3}[- ][0-9]{3,4}[- ]?[0-9]{3,4}"
  val urlRe = "https?://[^ ]+"

  /** Redact emails, phone numbers, and URLs with typed placeholders.
    * (`withSyntheticPii` plants deterministic PII per doc so the
    * redaction is observable on the synthetic corpus.) */
  def piiRedact(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), urlRe, "<URL>"),
            emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("clean_text"))
      .orderBy("doc_id")

  /** Per-document PII inventory (the audit report that decides whether
    * a source needs redaction at all): counts of URLs, emails and
    * phone numbers per doc, matched in the SAME cascade order as
    * [[piiRedact]] (emails counted after URL stripping, phones after
    * both) so the counts equal the number of placeholders redaction
    * would emit. Pure narrow map — three codegen regexp passes, no
    * shuffle. */
  def piiStats(docs: DataFrame): DataFrame = {
    val noUrl = regexp_replace(col("text"), urlRe, "<URL>")
    val noEmail = regexp_replace(noUrl, emailRe, "<EMAIL>")
    docs.select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(urlRe), lit(0))).as("n_urls"),
        size(regexp_extract_all(noUrl, lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(noEmail, lit(phoneRe), lit(0))).as("n_phones"))
      .withColumn("has_pii",
        col("n_urls") + col("n_emails") + col("n_phones") > 0)
      .orderBy("doc_id")
  }

  /** Append deterministic synthetic PII (email, phone, url) per doc. */
  def withSyntheticPii(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-01"),
      col("doc_id"), lit(" via https://example.com/d/"), col("doc_id")))

  /** Append deterministic synthetic URLs per doc (two URLs across a
    * small rotating set of domains) so the extraction operators are
    * observable on the synthetic corpus. */
  def withSyntheticUrls(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      lit(" see https://site"), pmod(col("doc_id"), lit(7)),
      lit(".example.org/p/"), col("doc_id"),
      lit(" and http://cdn"), pmod(col("doc_id"), lit(3)),
      lit(".example.net/a/"), col("doc_id")))

  /** Append deterministic synthetic near-duplicate URLs per doc: the
    * SAME logical page in two spellings (https+www+tracking params vs
    * bare http+trailing slash+fragment), with the page identity keyed
    * on (doc_id mod 7, doc_id mod 50) so distinct docs also collide —
    * the observable fixture for [[urlDedup]] on the synthetic corpus. */
  def withSyntheticDupUrls(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      lit(" https://www.shop"), pmod(col("doc_id"), lit(7)),
      lit(".example.com/item/"), pmod(col("doc_id"), lit(50)),
      lit("?utm_source=feed&ref=tw"),
      lit(" http://shop"), pmod(col("doc_id"), lit(7)),
      lit(".example.com/item/"), pmod(col("doc_id"), lit(50)),
      lit("/#reviews")))

  /** Canonical URL form: lowercase; fragment, query string, scheme,
    * leading `www.`, and trailing slash stripped — the normalization a
    * crawl pipeline applies before URL-level dedup so tracking-param
    * and scheme variants of one page collapse. Anchored regexes, so
    * first-match-vs-all replace semantics cannot diverge between
    * engines. */
  private[operators] def canonicalizeUrl(u: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(u), "#.*$", ""),
            "\\?.*$", ""),
          "^https?://", ""),
        "^www\\.", ""),
      "/$", "")

  /** URL-level exact dedup (the first dedup pass of a web-crawl
    * pipeline — CommonCrawl-style pipelines drop recrawled pages by
    * canonical URL before any text is compared): extract every URL,
    * canonicalize, and report per canonical page the referencing-doc
    * count, raw URL count, and the keeper (lowest doc_id — the
    * first-occurrence ownership rule [[graft.operators.Dedup]] uses
    * throughout). Narrow regexp extraction + canonicalization, then
    * ONE partial-combined aggregation keyed by canonical URL;
    * count(DISTINCT doc_id) expands to the standard two-phase
    * distinct-aggregate. No windows, no collect. */
  def urlDedup(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(urlRe), lit(0))).as("url"))
      .withColumn("canonical", canonicalizeUrl(col("url")))
      .groupBy("canonical")
      .agg(
        countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_urls"),
        min("doc_id").as("keeper_doc"))
      .orderBy("canonical")

  /** Per-domain URL statistics (the domain-frequency pass a web-crawl
    * curation pipeline runs before blocklist filtering): extract every
    * URL, parse its domain, count referencing docs and total URLs.
    * Narrow regexp extraction (codegen, RE2∩Java subset) followed by
    * one domain-keyed aggregation; count(DISTINCT doc_id) expands to
    * Spark's standard two-phase distinct-aggregate — no collect, no
    * broadcast. */
  def domainStats(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(urlRe), lit(0))).as("url"))
      .withColumn("domain", regexp_extract(col("url"), "https?://([^/ ]+)", 1))
      .groupBy("domain")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_urls"))
      .orderBy("domain")

  /** Unicode NFC normalization via the native graft_nfc expression. */
  def normalizeUnicode(docs: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"), expr("graft_nfc(text)").as("norm_text"))
      .orderBy("doc_id")
  }

  /** Context-window sequence packing: within each `source` shard,
    * documents in stable doc_id order are assigned to fixed-capacity
    * token bins by exclusive cumulative token count (the cheap
    * streaming-packing scheme — a document may straddle a boundary;
    * bin id = floor(cum_before / window)).
    *
    * The running sum is a bucketed TWO-LEVEL prefix sum, not one
    * window per source: a single `Window.partitionBy(source)` puts a
    * source's entire corpus in one sorted task — the serial-scan trap
    * for any large source. Instead doc_id ranges of `bucketDocs` form
    * buckets; within-bucket running sums parallelize across buckets
    * (partition size bounded by `bucketDocs` at any corpus size), and
    * the cross-bucket offsets are a window over per-bucket SUBTOTALS
    * (|buckets| rows, broadcast back). Because bucket order equals
    * doc_id order, offset + within-bucket sum ≡ the flat running sum
    * (bit-equality with the single-window form asserted in spec). The
    * tokenized projection is localCheckpoint'd (eager, released by the
    * ContextCleaner when the result frame is GC'd — never a pinned
    * internal .cache(), per the repo's persistence contract) so
    * subtotals and per-doc sums share one tokenization pass. */
  def packSequences(
      docs: DataFrame, windowTokens: Int = 2048,
      bucketDocs: Int = 65536): DataFrame = {
    val counted = docs.select(col("doc_id"), col("source"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|\\S"), lit(0))).as("n_tokens"))
      .withColumn("bucket", floor(col("doc_id") / bucketDocs))
      .localCheckpoint()
    // exclusive cross-bucket offsets: a window over bucket subtotals
    val wB = Window.partitionBy("source").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counted.groupBy("source", "bucket")
      .agg(sum("n_tokens").as("bucket_tokens"))
      .withColumn("bucket_offset", coalesce(sum("bucket_tokens").over(wB), lit(0L)))
      .select("source", "bucket", "bucket_offset")
    // exclusive within-bucket running sum: partitions ≤ bucketDocs rows
    val wD = Window.partitionBy("source", "bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    counted
      .withColumn("cum_in_bucket", coalesce(sum("n_tokens").over(wD), lit(0)))
      .join(broadcast(offsets), Seq("source", "bucket"))
      .withColumn("cum_before", col("bucket_offset") + col("cum_in_bucket"))
      .withColumn("bin", floor(col("cum_before") / windowTokens))
      .groupBy("source", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("source", "bin")
  }
}
