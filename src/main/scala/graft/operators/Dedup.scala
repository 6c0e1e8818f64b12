package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Chunk-level exact dedup (the paragraph-dedup shape for corpora
    * without paragraph structure): each document is cut into
    * fixed-width word chunks, chunks are keyed by an md5 content hash,
    * and the corpus-wide FIRST occurrence (min (doc_id, chunk_idx))
    * owns each distinct chunk — every later occurrence is a duplicate.
    * Output: per-doc chunk counts and duplicate ratio, the signal a
    * curation pass thresholds to drop boilerplate-heavy documents.
    *
    * Scale posture: ownership is a partial-combined min-of-struct
    * aggregation on the chunk hash — map-side combine collapses
    * mega-duplicated boilerplate chunks BEFORE the shuffle, which a
    * window-rank formulation cannot (one partition per hash value would
    * hot-spot on boilerplate). There is NO join back on the hash:
    * per-doc duplicate counts follow from n_dups(doc) = n_chunks(doc) −
    * n_owned(doc) (each distinct chunk contributes exactly one owned
    * occurrence), so chunk-level rows cross exactly one shuffle and the
    * 32-char hashes never ride a join. n_chunks itself is a narrow
    * arithmetic on the doc row. md5 (not xxhash64) so any engine
    * reproduces the ownership decision. */
  def chunkDedup(docs: DataFrame, chunkWords: Int = 10): DataFrame = {
    val base = docs
      .withColumn("w", split(lower(col("text")), " ", -1))
      .withColumn("n_full", (size(col("w")) / chunkWords).cast("int"))
      .filter(col("n_full") >= 1)
    // explode the chunk INDEX, then hash with plain projections: slice/
    // concat_ws/md5 are all codegen'd, where the equivalent transform()
    // lambda would evaluate an interpreted closure per chunk
    val chunks = base
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), col("n_full"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        md5(concat_ws(" ",
          slice(col("w"), (col("chunk_idx") - 1) * chunkWords + 1, lit(chunkWords)))).as("h"))
    val ownedPerDoc = chunks
      .groupBy("h").agg(min(struct(col("doc_id"), col("chunk_idx"))).as("owner"))
      .groupBy(col("owner.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("n_owned"))
    base.select(col("doc_id"), col("n_full").cast("long").as("n_chunks"))
      .join(ownedPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        (col("n_chunks") - coalesce(col("n_owned"), lit(0L))).as("n_dup_chunks"))
      .withColumn("dup_ratio",
        round(col("n_dup_chunks").cast("double") / col("n_chunks"), 4))
      .orderBy("doc_id")
  }

  /** Span-level exact-dedup TRANSFORM (Lee et al. 2021,
    * arXiv:2107.06499 — public): the REWRITE counterpart of
    * [[chunkDedup]]'s detection. Documents are cut into fixed
    * `spanWords`-word spans; each distinct span (case-folded md5) is
    * owned by its corpus-wide first occurrence (lexicographically
    * least (doc_id, pos) — the repo's standard ownership rule); every
    * LATER occurrence is dropped from the rewritten text, so verbatim
    * boilerplate survives exactly once in the corpus. The sub-span
    * word tail always survives; original casing is preserved (only
    * the hash case-folds).
    *
    * Scale shape: span hashing is a narrow per-doc projection (32-char
    * md5 through the shuffle, never span text); ownership is ONE
    * partial-combined min-of-struct aggregate on the hash key — a
    * mega-duplicated span collapses map-side, and there is NO join
    * back on the hash: a document's kept positions are exactly the
    * owner rows naming it, so the verdict re-keys by the uniform
    * doc_id. Reassembly is bounded by each document's own span count
    * (the per-doc bound every text op here carries). No windows. */
  def spanDedup(docs: DataFrame, spanWords: Int = 20): DataFrame = {
    require(spanWords >= 1, s"spanWords must be >= 1, got $spanWords")
    val base = docs
      .withColumn("w", split(col("text"), " ", -1))
      .withColumn("n_full", (size(col("w")) / spanWords).cast("int"))
    val spans = base
      .filter(col("n_full") >= 1)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), col("n_full"))).as("pos"))
      .select(col("doc_id"), col("pos"),
        md5(lower(concat_ws(" ",
          slice(col("w"), (col("pos") - 1) * spanWords + 1, lit(spanWords))))).as("h"))
    val keptPos = spans
      .groupBy("h").agg(min(struct(col("doc_id"), col("pos"))).as("o"))
      .groupBy(col("o.doc_id").as("doc_id"))
      .agg(sort_array(collect_list(col("o.pos"))).as("kept_pos"))
    base.join(keptPos, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_full").cast("long").as("n_spans"),
        coalesce(size(col("kept_pos")), lit(0)).cast("long").as("n_kept_spans"),
        when(col("n_full") === 0, concat_ws(" ", col("w")))
          .otherwise(concat_ws(" ", concat(
            flatten(transform(coalesce(col("kept_pos"), expr("cast(array() as array<int>)")),
              p => slice(col("w"), (p - 1) * spanWords + 1, lit(spanWords)))),
            slice(col("w"), col("n_full") * spanWords + 1,
              size(col("w")) - col("n_full") * spanWords)))).as("clean_text"))
      .orderBy("doc_id")
  }

  /** Cross-source duplicate provenance: for every pair of sources, how
    * many exact-duplicate chunk pairs they share — the curation view
    * that shows WHICH sources copy from which (mirror sites, scraped
    * re-posts, common boilerplate) before a mix treats them as
    * independent. Chunking matches [[chunkDedup]] (non-overlapping
    * `chunkWords`-word windows, md5-keyed). `source_a <= source_b`;
    * the diagonal counts within-source pairs; `n_shared_chunks` is the
    * number of distinct duplicated chunks the pair shares and
    * `n_dup_pairs` the total pair mass (n·(n−1)/2 within a source,
    * n_a·n_b across).
    *
    * Scale shape: (chunk-hash, source) counts are one partial-combined
    * corpus-sized shuffle; hashes appearing once in the WHOLE corpus —
    * the overwhelming mass — are pruned by a partial-combined total
    * BEFORE the self-join shuffles, so the join's input is only the
    * duplicated-chunk set and its candidate mass is the true duplicate
    * mass (the exact-form analog of the LSH bucket joins' posture).
    * The output is at most |sources|² rows. */
  def dupProvenance(docs: DataFrame, chunkWords: Int = 10): DataFrame = {
    require(chunkWords >= 1, s"chunkWords must be >= 1, got $chunkWords")
    val hs = docs
      .withColumn("w", split(lower(col("text")), " ", -1))
      .withColumn("n_full", (size(col("w")) / chunkWords).cast("int"))
      .filter(col("n_full") >= 1)
      .select(col("source"), explode(sequence(lit(1), col("n_full"))).as("i"), col("w"))
      .select(col("source"), md5(concat_ws(" ",
        slice(col("w"), (col("i") - 1) * chunkWords + 1, lit(chunkWords)))).as("h"))
      .groupBy("h", "source").agg(count(lit(1)).as("n"))
      // feeds the dup-hash prune and both sides of the self-join —
      // localCheckpoint per the persistence contract
      .localCheckpoint()
    val dupHashes = hs.groupBy("h").agg(sum("n").as("tn"))
      .filter(col("tn") > 1).select("h")
    val d = hs.join(dupHashes, Seq("h"))
    val pairs = d.as("a").join(d.as("b"),
      col("a.h") === col("b.h") && col("a.source") <= col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        when(col("a.source") === col("b.source"),
          (col("a.n") * (col("a.n") - 1) / 2).cast("long"))
          .otherwise(col("a.n") * col("b.n")).as("np"))
      .filter(col("np") > 0)
    pairs.groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared_chunks"), sum("np").as("n_dup_pairs"))
      .orderBy("source_a", "source_b")
  }

  /** doc_id + xxhash64'd word n-gram shingles (native codegen
    * graft_grams — bit-identical to the transform/concat_ws lambda
    * form, asserted in spec, with no interpreted per-window closure). */
  private def shingleHashes(docs: DataFrame, n: Int): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    docs.withColumn("toks", split(lower(col("text")), " ", -1))
      .filter(size(col("toks")) >= n)
      .withColumn("sh", expr(s"graft_grams(toks, $n, true)"))
      .select("doc_id", "sh")
  }

  /** One-permutation MinHash (Li et al., NIPS 2012) + banded LSH
    * self-join → near-duplicate pairs with the estimated Jaccard from
    * signature agreement. One hash per shingle (not k): the hash's
    * residue picks 1 of k buckets and the signature is each bucket's
    * minimum, with circular densification for empty buckets — k×
    * cheaper signatures than classic k-permutation MinHash at equal
    * sketch width. Deterministic by construction (no RNG). */
  /** Corpus MinHash signature index: one (doc_id, sig) row per doc,
    * computed in a single narrow codegen pass (graft_minhash). This is
    * the frame to PERSIST (parquet) in production: incoming batches
    * dedup against it via [[minhashPairsAgainst]] without ever
    * re-shingling the corpus — band keys re-derive from signatures
    * narrowly. */
  def minhashSignatures(
      docs: DataFrame, shingleLen: Int = 3, numHashes: Int = 64): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    shingleHashes(docs, shingleLen)
      .select(col("doc_id"), expr(s"graft_minhash(sh, doc_id, $numHashes)").as("sig"))
  }

  /** Slim banded bucket table from a signature frame: |bands| rows per
    * doc, key = (band, band hash) — a narrow explode, no shuffle. */
  private def bandKeys(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    sigs.select(col("doc_id"),
        explode(expr(
          s"transform(sequence(0, ${bands - 1}), " +
            s"b -> named_struct('band', b, 'bh', xxhash64(slice(sig, b*$rowsPerBand + 1, $rowsPerBand), b)))")).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
  }

  /** Signature-agreement Jaccard estimate for two `sig` columns. */
  private def estJaccard(numHashes: Int): org.apache.spark.sql.Column = expr(
    s"aggregate(zip_with(sig_a, sig_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), " +
      s"0, (acc, v) -> acc + v) / ${numHashes}.0D")

  /** Bucket-occupancy cap for LSH candidate generation: drop bucket
    * keys holding more than `cap` rows BEFORE the self-join, because a
    * bucket of occupancy n emits n(n-1)/2 candidate pairs — k exact
    * copies of one boilerplate document collapse every band into a
    * k-doc bucket and the join goes quadratic in k. The cap is LOSSY
    * by design (those pairs genuinely are duplicates): a pair is lost
    * only if EVERY bucket it shares exceeds the cap, and the dropped
    * mass is exactly what an occupancy report ([[minhashBucketOccupancy]])
    * surfaces — meter first, cap when the report shows quadratic hot
    * spots. df computed partial-combined (groupBy, never a window) and
    * pruned via a small-hot-set anti-join, the ngramJaccard dfCap
    * pattern. */
  private[operators] def capBuckets(
      buckets: DataFrame, keys: Seq[String], cap: Long): DataFrame =
    if (cap == Long.MaxValue) buckets
    else {
      val hot = buckets.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > cap)
        .select(keys.map(col): _*)
      buckets.join(hot, keys, "left_anti")
    }

  /** Band-bucket occupancy report: the pre-flight a 100 TB dedup run
    * does before the candidate self-join. Occupancy n yields n(n-1)/2
    * candidate pairs, so the top rows ARE the quadratic hot spots —
    * feed the observed ceiling into `bucketCap` (or split the
    * offending cluster upstream) before paying the join. */
  def minhashBucketOccupancy(
      docs: DataFrame,
      shingleLen: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      minOccupancy: Long = 2L): DataFrame = {
    require(numHashes % bands == 0)
    bandKeys(minhashSignatures(docs, shingleLen, numHashes), numHashes, bands)
      .groupBy("band", "bh")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minOccupancy)
      .select(col("band"), col("bh"), col("n_docs"),
        (col("n_docs") * (col("n_docs") - 1) / 2).as("est_pairs"))
      .orderBy(desc("n_docs"), col("band"), col("bh"))
  }

  def minhashPairs(
      docs: DataFrame,
      shingleLen: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      bucketCap: Long = Long.MaxValue): DataFrame = {
    require(numHashes % bands == 0)
    // Signature as a narrow per-row codegen expression (slot minima +
    // circular densification in one pass over the shingle array) — the
    // relational formulation (explode → slot-min agg → re-assembly)
    // shuffled |docs|·k slot rows twice; graft_minhash computes the
    // identical signature (asserted in spec) with ZERO shuffles.
    // localCheckpoint'd: reused by the bucket self-join (2 branches)
    // and both signature re-joins — once instead of 4× — and released
    // by the ContextCleaner when the result is GC'd (an internal
    // .cache() would pin blocks forever; persistence contract, see
    // minhashPairsAgainst).
    val sigs = minhashSignatures(docs, shingleLen, numHashes).localCheckpoint()

    val buckets = capBuckets(bandKeys(sigs, numHashes, bands), Seq("band", "bh"), bucketCap)
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")

    candidates
      .join(sigs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sig", "sig_a"), "doc_a")
      .join(sigs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sig", "sig_b"), "doc_b")
      .withColumn("est_jaccard", estJaccard(numHashes))
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Incremental near-dup: an incoming batch against a PERSISTED
    * corpus signature index ([[minhashSignatures]]) — the operational
    * 100 TB mode, where re-sketching the corpus per batch is the cost
    * that matters. The batch sketches in one narrow pass; candidate
    * generation is a band-key equi-join of batch bands against
    * corpus bands (both derived narrowly from signatures); the exact
    * signature rerank uses the same agreement math as
    * [[minhashPairs]], so batch-vs-corpus results are identical to the
    * cross-group subset of a full-corpus run (asserted in spec).
    * Returns (doc_new, doc_corpus, est_jaccard).
    *
    * Persistence contract: `index` feeds two consumers (band keys +
    * the signature re-join) and Spark re-executes a branching subplan
    * per consumer — a parquet-backed index simply scans twice (cheap,
    * columnar), while a COMPUTED index should be persisted or
    * localCheckpoint'd BY THE CALLER, who owns its lifetime. No
    * internal `.cache()`: repeated incremental calls in a long-lived
    * session/stream must not accumulate pinned blocks this function
    * can never safely release. The batch's own signatures are
    * localCheckpoint'd — eager, small (one row per incoming doc), and
    * released by the ContextCleaner when the result frame is GC'd. */
  def minhashPairsAgainst(
      newDocs: DataFrame,
      index: DataFrame,
      shingleLen: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0)
    val newSigs = minhashSignatures(newDocs, shingleLen, numHashes).localCheckpoint()
    val idx = index
    val candidates = bandKeys(newSigs, numHashes, bands).as("a")
      .join(bandKeys(idx, numHashes, bands).as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
      .select(col("a.doc_id").as("doc_new"), col("b.doc_id").as("doc_corpus"))
      .dropDuplicates("doc_new", "doc_corpus")
    candidates
      .join(newSigs.select(col("doc_id").as("doc_new"), col("sig").as("sig_a")), "doc_new")
      .join(idx.select(col("doc_id").as("doc_corpus"), col("sig").as("sig_b")), "doc_corpus")
      .withColumn("est_jaccard", estJaccard(numHashes))
      .filter(col("est_jaccard") >= threshold)
      .select("doc_new", "doc_corpus", "est_jaccard")
      .orderBy("doc_new", "doc_corpus")
  }

  /** Sketch calibration report: for every MinHash candidate pair,
    * the signature-agreement estimate next to the EXACT shingle
    * Jaccard — the fidelity check a dedup rollout runs before trusting
    * a threshold (64 hashes ⇒ σ ≈ √(J(1−J)/64) ≈ 0.06 near J=0.5).
    * Exact verification touches only the LSH survivors (never all
    * pairs): shingle sets re-join by doc id and intersect per pair.
    * Same shingle definition on both paths, so `err` isolates pure
    * sketch noise. */
  def minhashCalibration(
      docs: DataFrame,
      shingleLen: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val pairs = minhashPairs(docs, shingleLen, numHashes, bands, threshold)
    val sets = shingleHashes(docs, shingleLen)
      .select(col("doc_id"), array_distinct(col("sh")).as("g"))
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("g").as("ga")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("g").as("gb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("exact_jaccard",
        round(col("inter").cast("double") /
          (size(col("ga")) + size(col("gb")) - col("inter")), 6))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"), col("exact_jaccard"),
        round(abs(col("est_jaccard") - col("exact_jaccard")), 6).as("err"))
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash (sign of per-bit token-hash vote) + 16-bit chunk
    * LSH (hamming ≤ maxHamming ⇒ ≥1 of 4 chunks equal) → pairs.
    * The fingerprint is the native codegen `graft_simhash` over the
    * token array — zero shuffles (the relational formulation pushed
    * the exploded token stream through a 64-column vote aggregation;
    * bit-equality asserted in VectorExpressionsSpec). */
  def simhashPairs(
      docs: DataFrame, maxHamming: Int = 3,
      bucketCap: Long = Long.MaxValue): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    val sims = docs.withColumn("toks", split(lower(col("text")), " ", -1))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), expr("graft_simhash(toks)").as("simhash"))
    fingerprintPairs(sims.withColumnRenamed("simhash", "fp"),
      maxHamming, bucketCap)
  }

  /** Hamming near-dup pairs over PRECOMPUTED 64-bit fingerprints —
    * the chunk-LSH half of [[simhashPairs]] factored out so any
    * 64-bit fingerprint family rides the same machinery (text SimHash,
    * image dHash, rolling document hashes): 16-bit chunk buckets
    * (hamming ≤ 3 ⇒ ≥1 of 4 chunks equal by pigeonhole; larger
    * maxHamming trades recall, the standard SimHash-LSH deal), bucket
    * cap against quadratic hot spots ([[capBuckets]] — meter first
    * with [[fingerprintBucketOccupancy]]), slim self-join, exact
    * bit_count verify. Input: (doc_id, fp: long). Output: (doc_a,
    * doc_b, hamming) for pairs at hamming ≤ maxHamming, ordered. */
  def fingerprintPairs(
      fps: DataFrame, maxHamming: Int = 3,
      bucketCap: Long = Long.MaxValue): DataFrame = {
    val chunks = capBuckets(
      fps.select(col("doc_id"), col("fp"),
          explode(expr(
            "transform(sequence(0, 3), c -> named_struct('c', c, 'v', (fp >> (c*16)) & 65535))")).as("ck"))
        .select(col("doc_id"), col("fp"), col("ck.c").as("c"), col("ck.v").as("v")),
      Seq("c", "v"), bucketCap)

    chunks.as("a")
      .join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", expr("bit_count(fp_a ^ fp_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** Hamming near-dup pairs of NEW fingerprints against a PERSISTED
    * fingerprint index — the [[minhashPairsAgainst]] posture for the
    * 64-bit chunk-LSH family: the ingest-time gate never self-joins
    * the corpus, it probes the index with the (small) arriving batch.
    * Same 16-bit chunk buckets and recall bound as
    * [[fingerprintPairs]]; `bucketCap` caps INDEX-side bucket
    * occupancy (the quadratic side — the batch side is bounded by the
    * micro-batch). Input: (doc_id, fp) on both sides. Output:
    * (doc_new, doc_corpus, hamming) at hamming ≤ maxHamming, ordered;
    * identical ids never pair (a re-arrival of an already-indexed id
    * is an exact-dedup concern, not a near-dup one). */
  def fingerprintPairsAgainst(
      newFps: DataFrame, indexFps: DataFrame, maxHamming: Int = 3,
      bucketCap: Long = Long.MaxValue): DataFrame = {
    def chunks(fps: DataFrame) = fps
      .select(col("doc_id"), col("fp"),
        explode(expr(
          "transform(sequence(0, 3), c -> named_struct('c', c, 'v', (fp >> (c*16)) & 65535))")).as("ck"))
      .select(col("doc_id"), col("fp"), col("ck.c").as("c"), col("ck.v").as("v"))
    val idx = capBuckets(chunks(indexFps), Seq("c", "v"), bucketCap)
    chunks(newFps).as("n")
      .join(idx.as("i"),
        col("n.c") === col("i.c") && col("n.v") === col("i.v") &&
          col("n.doc_id") =!= col("i.doc_id"))
      .select(col("n.doc_id").as("doc_new"), col("i.doc_id").as("doc_corpus"),
        col("n.fp").as("fp_n"), col("i.fp").as("fp_i"))
      // hamming BEFORE the pair collapse: if an out-of-band writer
      // left two fp rows for one index id (stale + fresh), a
      // pre-filter dropDuplicates keeps an ARBITRARY row and a true
      // near-dup is nondeterministically lost — filtering first means
      // any within-bound match survives, and min() makes the reported
      // distance deterministic (for a well-formed one-fp-per-id index
      // the two orderings are identical)
      .withColumn("hamming", expr("bit_count(fp_n ^ fp_i)"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("doc_new", "doc_corpus")
      .agg(min("hamming").as("hamming"))
      .select("doc_new", "doc_corpus", "hamming")
      .orderBy("doc_new", "doc_corpus")
  }

  /** Chunk-bucket occupancy report for a 64-bit fingerprint frame —
    * the [[minhashBucketOccupancy]] pre-flight for the
    * [[fingerprintPairs]] join: occupancy n yields n(n-1)/2 candidate
    * pairs, so the top rows ARE the quadratic hot spots; feed the
    * observed ceiling into `bucketCap` before paying the join. */
  def fingerprintBucketOccupancy(
      fps: DataFrame, minOccupancy: Long = 2L): DataFrame =
    fps.select(col("doc_id"),
        explode(expr(
          "transform(sequence(0, 3), c -> named_struct('c', c, 'v', (fp >> (c*16)) & 65535))")).as("ck"))
      .select(col("ck.c").as("c"), col("ck.v").as("v"))
      .groupBy("c", "v")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minOccupancy)
      .select(col("c"), col("v"), col("n_docs"),
        (col("n_docs") * (col("n_docs") - 1) / 2).as("est_pairs"))
      .orderBy(desc("n_docs"), col("c"), col("v"))

  /** Substring-overlap duplicate pairs via winnowed fingerprints
    * (Schleimer et al. 2003, "Winnowing: Local Algorithms for Document
    * Fingerprinting" — the MOSS sketch): the substring-level
    * complement of whole-document MinHash. Two documents sharing one
    * long verbatim passage score HIGH here even when their overall
    * Jaccard is low — exactly the near-copy mode Lee et al. 2021
    * ("Deduplicating Training Data Makes Language Models Better")
    * show matters for training corpora, and the one q_dedup_minhash's
    * whole-doc sketch underweights.
    *
    * Per doc: word `gramLen`-gram hashes → O(n) winnow window minima
    * (`graft_winnow`) → distinct fingerprint set, all in one narrow
    * codegen pass. The winnowing guarantee makes matches
    * position-robust: any shared verbatim run of ≥ gramLen+window-1
    * words shares at least one selected fingerprint regardless of
    * where it sits in either document. Candidate generation is the
    * repo's standard inverted-index shape: explode fingerprints, drop
    * ultra-common ones (boilerplate passages) via partial-combined
    * groupBy + anti-join against the small over-cap hot set — never a
    * window over the fingerprint key — then a slim id-only self-join
    * with map-side pair counting. `overlap` = shared /
    * min(|fps_a|, |fps_b|) is CONTAINMENT, so a short document fully
    * embedded in a long one scores 1.0. */
  def substringDupPairs(
      docs: DataFrame, gramLen: Int = 5, window: Int = 4,
      minShared: Int = 2, dfCap: Long = 1000L): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    // localCheckpoint: read by the index build and the two size joins;
    // eager + ContextCleaner-released (persistence contract)
    val fps = docs.withColumn("toks", split(lower(col("text")), " ", -1))
      .filter(size(col("toks")) >= gramLen + window - 1)
      .select(col("doc_id"),
        expr(s"array_distinct(graft_winnow(graft_grams(toks, $gramLen, false), $window))")
          .as("fps"))
      .localCheckpoint()
    val inv = fps.select(col("doc_id"), explode(col("fps")).as("fp"))
    val hot = inv.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap)
      .select("fp")
    val capped = inv.join(hot, Seq("fp"), "left_anti")
    val pairs = capped.as("a")
      .join(capped.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
    val sizes = fps.select(col("doc_id"), size(col("fps")).as("n_fps"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_fps").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_fps").as("n_b")), "doc_b")
      .withColumn("overlap",
        round(col("shared_fps") / least(col("n_a"), col("n_b")), 6))
      .select("doc_a", "doc_b", "shared_fps", "overlap")
      .orderBy("doc_a", "doc_b")
  }

  /** EXACT duplicated-substring spans: for every document, the maximal
    * token ranges whose every `windowWords`-word window appears at
    * least `minCount` times verbatim in the WHOLE corpus — the exact
    * face of Lee et al. 2021's ExactSubstr dedup (their suffix-array
    * pass; relationally, hashing EVERY overlapping window is the same
    * linear-in-tokens cost class), where [[substringDupPairs]] is the
    * winnowed SAMPLED face (pairs, no boundaries) and [[spanDedup]] the
    * position-QUANTIZED face (non-overlapping spans — a duplicate
    * shifted by one token escapes its grid; overlapping windows catch
    * any alignment, the reason Lee et al. run suffixes, not chunks).
    *
    * Output: one row per maximal span — (doc_id, span_start, span_end,
    * span_words, n_windows), token positions 1-based inclusive, spans
    * disjoint per doc with ≥1-token gaps between them (windows merge
    * when they overlap or touch: next.pos ≤ prev.pos + windowWords).
    *
    * Scale shape (100 TB): window hashing is a narrow per-doc codegen
    * projection — one row per token position, only (doc_id, pos,
    * 32-char md5) ever crossing a shuffle, the text never. Duplicate
    * detection is ONE partial-combined count on the hash key; the
    * flagged-window selection is a LEFT SEMI join against the
    * duplicated-hash set (duplicate-mass-sized, the Zipf tail pruned
    * map-side), which cannot fan out — a boilerplate window repeated
    * 10⁶× keeps each occurrence once, never 10⁶ pair rows (the
    * all-pairs trap this family always dodges). Span merge is a lag +
    * running-sum island pass per doc — bounded by each document's own
    * flagged-window count. Windows have equal length, so interval ends
    * are monotone in start and the single-lag island test is exact (no
    * cumulative-max needed). FULL DuckDB oracle through the whole
    * cascade (string_split / list_slice / md5 / the island sum agree
    * engine-for-engine). */
  /** One row per overlapping window: (doc_id, pos, h) — the narrow
    * codegen projection [[exactSubstringSpans]] /
    * [[substringHashIndex]] / [[exactSubstringSpansAgainst]] share. */
  private def substringWindows(docs: DataFrame, windowWords: Int): DataFrame =
    docs
      .withColumn("toks", split(lower(col("text")), " ", -1))
      .filter(size(col("toks")) >= windowWords)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - windowWords + 1)).as("pos"))
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ", slice(col("toks"), col("pos"), lit(windowWords))))
          .as("h"))

  /** Flagged (doc_id, pos) windows → maximal merged spans (the lag +
    * running-sum island pass; equal-length windows make the single-lag
    * test exact). */
  private def mergeFlaggedWindows(
      flagged: DataFrame, windowWords: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    flagged
      .withColumn("new_span",
        when(lag("pos", 1).over(byDoc).isNull ||
          col("pos") > lag("pos", 1).over(byDoc) + windowWords, 1).otherwise(0))
      .withColumn("span_id", sum("new_span").over(byDoc))
      .groupBy("doc_id", "span_id")
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + windowWords - 1).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .withColumn("span_words", col("span_end") - col("span_start") + 1)
      .select("doc_id", "span_start", "span_end", "span_words", "n_windows")
      .orderBy("doc_id", "span_start")
  }

  def exactSubstringSpans(
      docs: DataFrame, windowWords: Int = 15, minCount: Long = 2L): DataFrame = {
    require(windowWords >= 1, s"windowWords must be >= 1, got $windowWords")
    require(minCount >= 2L, s"minCount must be >= 2, got $minCount")
    val wins = substringWindows(docs, windowWords)
    val dup = wins.groupBy("h").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select("h")
    mergeFlaggedWindows(wins.join(dup, Seq("h"), "left_semi"), windowWords)
  }

  /** The persistable window-hash count table (h, cnt) — the artifact
    * an ingest gate probes so arriving documents get the FULL-corpus
    * duplicated-substring verdict without re-hashing the corpus
    * ([[exactSubstringSpansAgainst]]; the bm25Index / erIndex
    * fingerprint-keyed-artifact convention). Corpus-token-sized build,
    * duplicate-skew collapsed by the partial-combined count. */
  def substringHashIndex(docs: DataFrame, windowWords: Int = 15): DataFrame = {
    require(windowWords >= 1, s"windowWords must be >= 1, got $windowWords")
    substringWindows(docs, windowWords)
      .groupBy("h").agg(count(lit(1)).as("cnt"))
  }

  /** INCREMENTAL [[exactSubstringSpans]]: spans for an arriving BATCH
    * against corpus ∪ batch, served from the persisted
    * [[substringHashIndex]] — a batch window is duplicated iff its
    * in-batch count plus its indexed corpus count reaches `minCount`,
    * EXACTLY the full-corpus condition restricted to batch documents
    * (the driver entry's oracle is literally the full-corpus SQL with
    * a batch predicate — incremental == full, proven through serving).
    * Batch-token-sized work: one partial-combined count over the batch
    * windows, one hash-keyed LEFT join against the index, never a
    * corpus re-hash. The batch window frame is localCheckpoint'd —
    * it feeds both the count and the flag join, and a batch is
    * delta-sized, so materializing beats tokenizing it twice (the
    * full-corpus [[exactSubstringSpans]] makes the OPPOSITE call:
    * its window frame is corpus-token-sized, so it streams the scan
    * twice rather than persist it). */
  def exactSubstringSpansAgainst(
      batch: DataFrame, index: DataFrame,
      windowWords: Int = 15, minCount: Long = 2L): DataFrame = {
    require(windowWords >= 1, s"windowWords must be >= 1, got $windowWords")
    require(minCount >= 2L, s"minCount must be >= 2, got $minCount")
    val wins = substringWindows(batch, windowWords).localCheckpoint()
    val dup = wins.groupBy("h").agg(count(lit(1)).as("bc"))
      .join(index.select(col("h"), col("cnt")), Seq("h"), "left")
      .filter(col("bc") + coalesce(col("cnt"), lit(0L)) >= minCount)
      .select("h")
    mergeFlaggedWindows(wins.join(dup, Seq("h"), "left_semi"), windowWords)
  }

  /** EXACT duplicated-substring REMOVAL — the transform half of
    * [[exactSubstringSpans]] (Lee et al. 2021 cut the duplicated
    * substring from all but one occurrence; this is that cut): rebuild
    * each document keeping one canonical copy of every duplicated run.
    *
    * Ownership is per window hash: the lexicographically-least
    * (doc_id, pos) occurrence, compared as a STRUCT — a scalar
    * doc_id·10⁹ + pos key would wrap a Long once doc_id exceeds
    * ~9.2e9 and silently pick wrong owners at billion-doc scale;
    * struct min is partial-combinable and overflow-free, and both
    * engines order structs lexicographically. A token is
    * REMOVED iff some duplicated window covers it and NO owner window
    * does — owner protection keeps the canonical copy intact even
    * where owner and non-owner windows overlap (staggered three-way
    * shares). Case preserved: hashes are computed over the lowercased
    * window ([[spanDedup]]'s posture), the rebuilt text keeps original
    * tokens.
    *
    * Output: (doc_id, n_tokens, n_removed, clean_text), every doc
    * present (short docs carry no windows and pass through verbatim).
    *
    * Scale shape: the token-coverage explode is `windowWords` rows per
    * FLAGGED window — duplicate-mass-sized, never corpus-sized; the
    * removal list rejoins the corpus doc_id-keyed (slim), and the
    * rebuild is one codegen'd indexed-lambda filter per doc (cost
    * bounded by |doc| · its own removal count — no shuffle carries
    * text). FULL DuckDB oracle (the coverage/ownership algebra is
    * bool_or over the same integer keys). */
  def exactSubstringClean(
      docs: DataFrame, windowWords: Int = 15, minCount: Long = 2L): DataFrame = {
    require(windowWords >= 1, s"windowWords must be >= 1, got $windowWords")
    require(minCount >= 2L, s"minCount must be >= 2, got $minCount")
    val base = docs.withColumn("toks", split(col("text"), " ", -1))
    val okeyOf = struct(col("doc_id"), col("pos"))
    val wins = base
      .filter(size(col("toks")) >= windowWords)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - windowWords + 1)).as("pos"))
      .select(col("doc_id"), col("pos"),
        md5(lower(concat_ws(" ",
          slice(col("toks"), col("pos"), lit(windowWords))))).as("h"))
    val owners = wins.groupBy("h")
      .agg(count(lit(1)).as("cnt"), min(okeyOf).as("okey"))
      .filter(col("cnt") >= minCount)
      .select("h", "okey")
    val removed = wins.join(owners, Seq("h"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(windowWords - 1))).as("tpos"),
        (okeyOf === col("okey")).as("is_owner"))
      .groupBy("doc_id", "tpos")
      .agg(max(col("is_owner")).as("any_owner"))
      .filter(!col("any_owner"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("tpos"))).as("rm_pos"))
    base.join(removed, Seq("doc_id"), "left")
      .withColumn("rm_pos",
        coalesce(col("rm_pos"), expr("cast(array() as array<int>)")))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("rm_pos")).cast("long").as("n_removed"),
        concat_ws(" ", filter(col("toks"),
          (_, i) => !array_contains(col("rm_pos"), i + 1))).as("clean_text"))
      .orderBy("doc_id")
  }

  /** Resolve near-duplicate PAIRS into duplicate CLUSTERS (connected
    * components). Adaptive strategy: LSH-surviving pair sets are tiny
    * relative to the corpus, so below `driverThreshold` pairs a driver
    * union-find resolves them in one pass; above it,
    * [[duplicateLabelsStar]] large-star/small-star contraction
    * (O(log² n) rounds independent of component diameter).
    * Returns one row per cluster: representative (min doc_id), size,
    * sorted members. */
  def duplicateClusters(
      pairs: DataFrame, maxIter: Int = 64, driverThreshold: Long = 1000000L): DataFrame =
    duplicateClustersFromLabels(duplicateLabels(pairs, maxIter, driverThreshold))

  /** [[duplicateClusters]] from a precomputed (id, label) frame — the
    * label propagation is the expensive step, so callers resolving
    * BOTH clusters and survivors from one pair set (q_dedup_clusters /
    * q_dedup_survivors) compute labels once and feed both. */
  def duplicateClustersFromLabels(labels: DataFrame): DataFrame =
    labels
      .groupBy(col("label").as("cluster_rep"))
      .agg(count(lit(1)).as("n_docs"), collect_list("id").as("member_sample"))
      .select(col("cluster_rep"), col("n_docs"),
        sort_array(col("member_sample")).as("members"))
      .orderBy("cluster_rep")

  /** (id, label) connected-component labels for every doc appearing in
    * a pair — label = the component's minimum doc_id. The slim form
    * [[duplicateClusters]] aggregates and [[dedupSurvivors]] anti-joins
    * on. */
  def duplicateLabels(
      pairs: DataFrame, maxIter: Int = 64, driverThreshold: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    // localCheckpoint, not .cache(): eager, ContextCleaner-released
    // when the result is GC'd — an internal cache would pin blocks
    // this function can never safely release (persistence contract,
    // see minhashPairsAgainst)
    val cached = pairs.select(col("doc_a"), col("doc_b")).localCheckpoint()
    val labels =
      if (cached.count() <= driverThreshold) {
        // driver union-find: pairs fit comfortably (≤ ~16MB per 1M)
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        cached.collect().foreach { row =>
          val (a, b) = (row.getLong(0), row.getLong(1))
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val ids = parent.keySet ++ parent.values
        import spark.implicits._
        ids.toSeq.map(id => (id, find(id))).toDF("id", "label")
      } else {
        duplicateLabelsStar(cached, maxIter)
      }
    labels
  }

  /** Distributed connected-component labels by alternating
    * large-star / small-star contraction (Kiveris, Lattanzi, Mirrokni,
    * Rastogi & Vassilvitskii, "Connected Components in MapReduce and
    * Beyond", SoCC 2014, Two-Phase algorithm) — the scale path behind
    * [[duplicateLabels]].
    *
    * Why not min-label propagation: propagation needs O(diameter)
    * rounds, and a chain-shaped duplicate cluster (doc₁↔doc₂↔…↔docₙ,
    * the classic template-drift shape) makes diameter O(cluster size) —
    * a capped loop then returns WRONG labels silently. Star contraction
    * halves component height every round pair (O(log² n) worst case,
    * ~2·log n observed), and this implementation REFUSES to return
    * unconverged labels instead of truncating.
    *
    * Spark shape per round: two groupBy-min + two equi-joins + two
    * distincts, all on (long, long) frames — ids only, no payloads.
    * `localCheckpoint` truncates the iterative lineage (the classic
    * iterative-Spark trap). Convergence test is exact set equality
    * (equal distinct counts + empty anti-join), and at the fixpoint the
    * edge set is a forest of stars centered at component minima, so
    * labels read directly off the final edges.
    *
    * Input: (doc_a, doc_b) pair rows (any extra columns ignored);
    * output (id, label) with label = component minimum, the
    * [[duplicateClustersFromLabels]] / [[dedupSurvivorsFromLabels]]
    * contract. */
  def duplicateLabelsStar(
      pairs: DataFrame, maxIter: Int = 64,
      localMaxEdges: Long = 2000000L): DataFrame = {
    val canon = pairs
      .select(
        greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    // PARTITION-LOCAL UNION-FIND PRE-PASS (guide §1.2/§2.3 — fewer
    // rounds, shuffle fewer bytes): each task collapses ITS edges to
    // the spanning star forest (node → local-set minimum, path
    // compression at emission). Connectivity is exactly preserved —
    // an edge's endpoints share a local root, so the forest path
    // u—root—v replaces it — while the frame entering the distributed
    // rounds shrinks from one row per EDGE to at most one row per
    // (node, partition), already star-shaped inside each task, so the
    // round loop below typically converges in one or two rounds
    // instead of ~2·log n. Labels are unchanged: the fixpoint (min-id
    // star labels) is unique whatever the contraction order, and the
    // per-task output is order-independent (the emitted set depends
    // only on the task's edge SET), so retries are safe. Per-task
    // state is one long→long map bounded by the task's edge count —
    // the §5 memory bound that advisory partition sizing already
    // enforces for every hash aggregate. Long ids only (every caller
    // keys on bigint ids); any other id type skips the pre-pass.
    val longIds = canon.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    val seed =
      if (!longIds) canon
      else {
        val spark = pairs.sparkSession
        import spark.implicits._
        canon.as[(Long, Long)]
          .mapPartitions { it =>
            val parent = scala.collection.mutable.LongMap.empty[Long]
            def find(x: Long): Long = {
              var r = x
              while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
              var c = x
              while (c != r) { val n = parent(c); parent(c) = r; c = n }
              r
            }
            it.foreach { case (a, b) =>
              val ra = find(a); val rb = find(b)
              if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
            }
            val members = parent.keysIterator.toArray
            members.iterator.map(n => (n, find(n))).filter(p => p._1 != p._2)
          }
          .toDF("u", "v")
          .distinct()
      }
    var e = seed.localCheckpoint()
    var prevCount = e.count()
    // IN-EXECUTOR LEAF (the corenessSharded/localCoreness discipline
    // applied to the label fixpoint): the pre-pass above already
    // collapsed each task's slice to its star forest, so when the
    // SURVIVING forest is bounded (at most `localMaxEdges` rows — the
    // same cap the local peels use), ONE constant-keyed task resolves
    // it by union-find and emits the exact min-id labels the round
    // loop would converge to (the fixpoint is unique, so the outputs
    // are row-identical; spec-asserted against the forced-distributed
    // loop). The distributed rounds below remain the over-cap path —
    // this gate scales with DATA (post-collapse forest size), not with
    // the session core count.
    if (longIds && prevCount > 0L && prevCount <= localMaxEdges) {
      val spark = pairs.sparkSession
      import spark.implicits._
      return e.as[(Long, Long)]
        .groupByKey(_ => true)
        .flatMapGroups { (_, it) =>
          val parent = scala.collection.mutable.LongMap.empty[Long]
          val seen = scala.collection.mutable.LongMap.empty[Boolean]
          val order = scala.collection.mutable.ArrayBuffer.empty[Long]
          def note(x: Long): Unit =
            if (!seen.contains(x)) { seen(x) = true; order += x }
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
            var c = x
            while (c != r) { val n = parent(c); parent(c) = r; c = n }
            r
          }
          it.foreach { case (a, b) =>
            note(a); note(b)
            val ra = find(a); val rb = find(b)
            if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
          }
          order.iterator.map(n => (n, find(n)))
        }
        .toDF("id", "label")
    }
    var converged = prevCount == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star: for every node u, attach each strictly-larger
      // neighbor to m = min(Γ(u) ∪ {u}); edges with v < u are emitted
      // by the other endpoint's group (nbrs is symmetric)
      val nbrs = e.select(col("u"), col("v"))
        .unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val largeMins = nbrs.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val large = nbrs.join(largeMins, "u")
        .filter(col("v") > col("u"))
        // v > u ≥ m, so (v, m) is never a self-loop
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star: orient every edge to its smaller endpoint, then
      // attach u and all its smaller neighbors to the minimum
      val dir = large.select(
        greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      val smallMins = dir.groupBy("u").agg(min("v").as("m"))
      val next = dir.join(smallMins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionAll(smallMins.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint()
      val nextCount = next.count()
      // exact set equality: both sides are distinct, so equal counts +
      // (next ∖ e) = ∅ ⇒ next = e — the fixpoint is a forest of stars
      converged = nextCount == prevCount &&
        next.join(e, Seq("u", "v"), "left_anti").count() == 0L
      prevCount = nextCount
      e = next
      iter += 1
    }
    require(converged,
      s"duplicateLabelsStar: not converged after $maxIter rounds " +
        s"(${prevCount} edges) — raise maxIter; refusing to emit partial labels")
    e.select(col("u").as("id"), col("v").as("label"))
      .unionAll(e.select(col("v").as("id"), col("v").as("label")))
      .distinct()
  }

  /** End-to-end dedup: keep exactly one document per near-duplicate
    * cluster (the cluster's minimum doc_id) plus every unpaired
    * document — the operator that actually SHRINKS the corpus, closing
    * the pairs → clusters → survivors pipeline. The drop set is the
    * slim (id ≠ label) half of the label table, removed by a LEFT ANTI
    * join on doc_id — ids only, no text or vectors ride the shuffle,
    * and the corpus side streams through unaggregated. */
  def dedupSurvivors(docs: DataFrame, pairs: DataFrame): DataFrame =
    dedupSurvivorsFromLabels(docs, duplicateLabels(pairs))

  /** [[dedupSurvivors]] from a precomputed (id, label) frame — see
    * [[duplicateClustersFromLabels]]. */
  def dedupSurvivorsFromLabels(docs: DataFrame, labels: DataFrame): DataFrame = {
    val drop = labels
      .filter(col("id") =!= col("label"))
      .select(col("id").as("doc_id"))
    docs.join(drop, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** Word n-gram Jaccard similarity over candidate pairs (blocked by
    * `lang`; at corpus scale the block key would be an LSH bucket, and
    * the right side would be the LSH-survivor set instead of a full
    * broadcast). Grams are xxhash64'd to longs so set ops never touch
    * strings.
    *
    * Candidate generation uses an inverted gram index with a
    * document-frequency cap: grams appearing in more than `dfCap` docs
    * (stopword runs, boilerplate) are dropped from the INDEX before the
    * self-join — exactly those grams make candidate pairs quadratic at
    * corpus scale. The verify step still computes EXACT Jaccard over the
    * full gram sets of each surviving pair, so the cap only loses a pair
    * when ALL of its shared grams exceed the cap — impossible for real
    * near-duplicates above any useful threshold, asserted exact on the
    * test corpus (LlmOpsSpec). Shuffle is O(capped gram instances +
    * candidates), never O(docs²). */
  def ngramJaccard(
      docs: DataFrame, n: Int = 3, threshold: Double = 0.3,
      dfCap: Long = 1000L): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    val g = docs.withColumn("w", split(lower(col("text")), " ", -1))
      .filter(size(col("w")) >= n)
      .withColumn("grams", expr(s"graft_grams(w, $n, true)"))
      .select(col("doc_id"), col("lang"), col("grams"), size(col("grams")).as("sz"))
      // read by the index build and both verify-join branches;
      // localCheckpoint per the persistence contract (ContextCleaner-
      // released, never a pinned internal cache)
      .localCheckpoint()
    val inv = g.select(col("doc_id"), col("lang"), explode(col("grams")).as("gh"))
    // df via partial-combined aggregation: a boilerplate gram collapses
    // map-side to ONE row per input partition before the shuffle, so no
    // task ever holds a hot gram's full posting list (the window-over-
    // gram-key formulation's failure mode — same reasoning as
    // tfidfTopTerms' df stage). The over-cap "hot set" is the Zipf
    // head — at most total-gram-instances / dfCap rows of (lang, long) —
    // so AQE broadcasts the anti-join in practice and the postings never
    // shuffle before the candidate self-join; if the hot set ever
    // outgrows the broadcast threshold, AQE's skew-split still bounds
    // the sort-merge anti-join (LeftAnti splits the streamed side).
    val hot = inv.groupBy("lang", "gh").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap)
      .select("lang", "gh")
    val capped = inv.join(hot, Seq("lang", "gh"), "left_anti")
    // per-doc count of capped-out (index-invisible) grams, for the
    // lossless candidate bound below
    val docMeta = g.select(col("doc_id"), col("sz"))
      .join(capped.groupBy("doc_id").agg(count(lit(1)).as("n_idx")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("sz"),
        (col("sz") - coalesce(col("n_idx"), lit(0L))).as("n_capped"))
    // shared-index-gram count per pair — map-side combine collapses the
    // per-gram pair stream before the shuffle (a pair sharing 40 grams
    // ships once, not 40×)
    val pairCounts = capped.as("a")
      .join(capped.as("b"),
        col("a.gh") === col("b.gh") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter_idx"))
    // lossless prune: J ≥ t ⇔ inter ≥ t·(szA+szB)/(1+t), and the true
    // intersection is at most inter_idx + min(capped_a, capped_b) —
    // pairs failing the bound cannot reach the threshold, so only
    // near-threshold survivors pay the exact array verify
    // docMeta is one row PER DOCUMENT — never broadcast it (the corpus
    // can be arbitrarily large); AQE picks the join strategy
    val survivors = pairCounts
      .join(docMeta.select(col("doc_id").as("doc_a"),
        col("sz").as("sz_a"), col("n_capped").as("cap_a")), "doc_a")
      .join(docMeta.select(col("doc_id").as("doc_b"),
        col("sz").as("sz_b"), col("n_capped").as("cap_b")), "doc_b")
      .filter((col("inter_idx") + least(col("cap_a"), col("cap_b"))).cast("double") *
        (1.0 + threshold) >= lit(threshold) * (col("sz_a") + col("sz_b")) - 1e-9)
      .select("doc_a", "doc_b")
    survivors
      .join(g.select(col("doc_id").as("doc_a"), col("grams").as("grams_a"),
        col("sz").as("sz_a")), "doc_a")
      .join(g.select(col("doc_id").as("doc_b"), col("grams").as("grams_b"),
        col("sz").as("sz_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("grams_a"), col("grams_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** N-gram CONTAINMENT pairs — Broder 1997's second measure next to
    * [[ngramJaccard]]'s resemblance: C(A,B) = |A∩B| / |A|. Jaccard
    * misses the doc-inside-doc case by construction (a page quoted
    * whole inside a 100× larger page has J ≈ 0.01 but C(A,B) = 1), and
    * that asymmetric duplication — boilerplate wrappers, quoted
    * articles, concatenated shards — is exactly what corpus audits
    * chase. A pair reports when max(C(A,B), C(B,A)) ≥ `threshold`.
    *
    * Same candidate machinery as [[ngramJaccard]] (df-capped inverted
    * index, partial-combined pair counts — never all-pairs) with the
    * containment-specific LOSSLESS prune: max-containment ≥ t needs
    * inter ≥ t·min(|A|,|B|), and the true intersection is at most
    * inter_idx + min(capped_a, capped_b). No size-ratio prune exists
    * here — the tiny-inside-huge pair IS the target — so the bound on
    * the indexed intersection does all the pruning. Ratios snap
    * half-up to integer micros → FULL DuckDB oracle.
    *
    * Output: (doc_a, doc_b, sz_a, sz_b, n_common, containment_a_micro,
    * containment_b_micro) ordered by (doc_a, doc_b). */
  def ngramContainment(
      docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
      dfCap: Long = 1000L): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    val tMicro = math.round(threshold * 1e6)
    val g = docs.withColumn("w", split(lower(col("text")), " ", -1))
      .filter(size(col("w")) >= n)
      .withColumn("grams", expr(s"graft_grams(w, $n, true)"))
      .select(col("doc_id"), col("lang"), col("grams"), size(col("grams")).as("sz"))
      .localCheckpoint()
    val inv = g.select(col("doc_id"), col("lang"), explode(col("grams")).as("gh"))
    val hot = inv.groupBy("lang", "gh").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap)
      .select("lang", "gh")
    val capped = inv.join(hot, Seq("lang", "gh"), "left_anti")
    val docMeta = g.select(col("doc_id"), col("sz"))
      .join(capped.groupBy("doc_id").agg(count(lit(1)).as("n_idx")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("sz"),
        (col("sz") - coalesce(col("n_idx"), lit(0L))).as("n_capped"))
    val pairCounts = capped.as("a")
      .join(capped.as("b"),
        col("a.gh") === col("b.gh") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter_idx"))
    val survivors = pairCounts
      .join(docMeta.select(col("doc_id").as("doc_a"),
        col("sz").as("sz_a"), col("n_capped").as("cap_a")), "doc_a")
      .join(docMeta.select(col("doc_id").as("doc_b"),
        col("sz").as("sz_b"), col("n_capped").as("cap_b")), "doc_b")
      .filter((col("inter_idx") + least(col("cap_a"), col("cap_b"))).cast("double")
        >= lit(threshold) * least(col("sz_a"), col("sz_b")).cast("double") - 1e-9)
      .select("doc_a", "doc_b")
    survivors
      .join(g.select(col("doc_id").as("doc_a"), col("grams").as("grams_a"),
        col("sz").as("sz_a")), "doc_a")
      .join(g.select(col("doc_id").as("doc_b"), col("grams").as("grams_b"),
        col("sz").as("sz_b")), "doc_b")
      .withColumn("n_common",
        size(array_intersect(col("grams_a"), col("grams_b"))).cast("long"))
      .select(col("doc_a"), col("doc_b"),
        col("sz_a").cast("long").as("sz_a"), col("sz_b").cast("long").as("sz_b"),
        col("n_common"),
        expr("(n_common * 2000000 + sz_a) div (CAST(sz_a AS BIGINT) * 2)")
          .as("containment_a_micro"),
        expr("(n_common * 2000000 + sz_b) div (CAST(sz_b AS BIGINT) * 2)")
          .as("containment_b_micro"))
      .filter(greatest(col("containment_a_micro"), col("containment_b_micro"))
        >= tMicro)
      .orderBy("doc_a", "doc_b")
  }
}
