package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document deduplication family for LLM-training-data pipelines:
  * exact (content hash), MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * These extend the reference's `raw_hash` idempotency idea
  * (reference/examples/docker-compose examples/rabbitmq-to-postgres/
  * app.py) to corpus-scale near-duplicate detection.
  *
  * Scale posture (100 TB): every candidate-generation step is an
  * equi-join on a small bucket key — never an all-pairs product.
  * MinHash explodes |bands| (16) rows per doc, SimHash 4 chunk rows;
  * signatures are re-joined by doc_id only for surviving candidate
  * pairs, so shuffle volume is O(docs·bands + candidates), not
  * O(docs²). All hashing is codegen'd xxhash64 on array expressions —
  * no UDFs, no driver-side state. n-gram Jaccard is the only O(pairs)
  * verifier and is meant to run on LSH survivors (here blocked by
  * `lang` to keep the oracle SQL-expressible).
  */
object Dedup {

  /** Exact dedup via sha256 content hash: one row per distinct content,
    * keeping the smallest doc_id (idempotent replay semantics). */
  def exactDocs(docs: DataFrame): DataFrame =
    docs.groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .select("keep_doc_id", "n_copies", "content_hash")
      .orderBy("keep_doc_id")

  /** doc_id + xxhash64'd word n-gram shingles. */
  private def shingleHashes(docs: DataFrame, n: Int): DataFrame =
    docs.withColumn("toks", split(lower(col("text")), " ", -1))
      .filter(size(col("toks")) >= n)
      .withColumn("sh", expr(
        s"array_distinct(transform(sequence(1, size(toks)-${n - 1}), " +
          s"i -> xxhash64(concat_ws(' ', slice(toks, i, $n)))))"))
      .select("doc_id", "sh")

  /** MinHash signatures (k hash functions as xxhash64(shingle, seed))
    * + banded LSH self-join → near-duplicate pairs with the estimated
    * Jaccard from signature agreement. Deterministic by construction. */
  def minhashPairs(
      docs: DataFrame,
      shingleLen: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0)
    val rowsPerBand = numHashes / bands
    val sigs = shingleHashes(docs, shingleLen)
      .withColumn("sig", expr(
        s"transform(sequence(0, ${numHashes - 1}), " +
          "i -> array_min(transform(sh, h -> xxhash64(h, i))))"))
      .select("doc_id", "sig")

    // Slim bucket table: |bands| rows per doc, key = (band, band hash).
    val buckets = sigs.select(col("doc_id"),
        explode(expr(
          s"transform(sequence(0, ${bands - 1}), " +
            s"b -> named_struct('band', b, 'bh', xxhash64(slice(sig, b*$rowsPerBand + 1, $rowsPerBand), b)))")).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))

    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")

    candidates
      .join(sigs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sig", "sig_a"), "doc_a")
      .join(sigs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sig", "sig_b"), "doc_b")
      .withColumn("est_jaccard", expr(
        s"aggregate(zip_with(sig_a, sig_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), " +
          s"0, (acc, v) -> acc + v) / ${numHashes}.0D"))
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash (sign of per-bit token-hash vote) + 16-bit chunk
    * LSH (hamming ≤ maxHamming ⇒ ≥1 of 4 chunks equal) → pairs. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sims = docs.withColumn("toks", split(lower(col("text")), " ", -1))
      .filter(size(col("toks")) >= 1)
      .withColumn("hs", expr("transform(toks, t -> xxhash64(t))"))
      .withColumn("simhash", expr(
        // bitwise accumulate (|, <<) — ANSI-safe even for the sign bit
        "aggregate(sequence(0, 63), 0L, (acc, j) -> acc | " +
          "(CASE WHEN aggregate(hs, 0L, (a, h) -> a + " +
          "CASE WHEN ((h >> (63 - j)) & 1) = 1 THEN 1L ELSE -1L END) > 0 THEN 1L ELSE 0L END " +
          "<< (63 - j)))"))
      .select("doc_id", "simhash")

    val chunks = sims.select(col("doc_id"), col("simhash"),
        explode(expr(
          "transform(sequence(0, 3), c -> named_struct('c', c, 'v', (simhash >> (c*16)) & 65535))")).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.c").as("c"), col("ck.v").as("v"))

    chunks.as("a")
      .join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** Word n-gram Jaccard similarity over candidate pairs (blocked by
    * `lang`; at corpus scale the block key would be an LSH bucket). */
  def ngramJaccard(docs: DataFrame, n: Int = 3, threshold: Double = 0.3): DataFrame = {
    val g = docs.withColumn("w", split(lower(col("text")), " ", -1))
      .filter(size(col("w")) >= n)
      .withColumn("grams", expr(
        s"array_distinct(transform(sequence(1, size(w)-${n - 1}), " +
          s"i -> concat_ws(' ', slice(w, i, $n))))"))
      .select("doc_id", "lang", "grams")
    g.as("a")
      .join(g.as("b"), col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(array_intersect(col("a.grams"), col("b.grams"))).cast("double") /
          size(array_union(col("a.grams"), col("b.grams"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }
}
