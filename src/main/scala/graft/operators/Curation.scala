package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    * Same row → same split across runs, partitionings, and cluster
    * sizes FOR A GIVEN (salt, hash) convention — the hash changed from
    * xxhash64 to the md5 prefix below in round 4, which reassigned
    * splits once; pin `salt` per dataset generation and treat any
    * future hash change as a new generation.
    *
    * The bucket hash is an md5 prefix (like [[mixSources]]), not
    * xxhash64: a train/val/test assignment must be reproducible by ANY
    * engine auditing the dataset later — md5 is universal, xxhash64's
    * seeding is Spark-specific. It also makes the assignment
    * oracle-checkable (the DuckDB twin reproduces it bit-for-bit). */
  def assignSplits(
      df: DataFrame,
      idCol: String = "doc_id",
      weights: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5),
      salt: String = "graft-split-v1"): DataFrame = {
    require(weights.map(_._2).sum == 100, "split weights must total 100")
    val bucket = graft.functions.DeterministicHash.md5Prefix(salt, col(idCol)) % 100
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

  /** Deterministic source-mixture sampling (training-data mixing):
    * keep each doc with its source's rate, decided by a uniform hash of
    * the doc id — md5-prefix based so ANY engine reproduces the exact
    * row set (the DuckDB oracle twin does, bit-for-bit), independent of
    * partitioning and cluster size. Pure narrow map: no shuffle, no RNG
    * state. Sources absent from `rates` keep `defaultRate`. */
  def mixSources(
      docs: DataFrame,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      seed: String = "mix"): DataFrame = {
    val u = graft.functions.DeterministicHash.md5Prefix(seed, col("doc_id"))
      .cast("double") / 4294967296.0
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(col("source") === src, lit(r)).otherwise(acc)
    }
    docs.filter(u < rate)
  }

  /** [[flagContaminated]] with a Bloom-filter pre-prune on the doc-gram
    * stream — the form that scales when the corpus side dwarfs the
    * benchmark side: a compact sketch of the benchmark grams rides the
    * plan, and the corpus grams that cannot match (1 − fpp of them) are
    * dropped NARROWLY, before the join ever shuffles or probes. The
    * exact join over the survivors eliminates the sketch's false
    * positives, so output is bit-equal to [[flagContaminated]]
    * (asserted in spec) — the sketch only cuts shuffle volume.
    *
    * At 100 TB this is the difference between joining every corpus gram
    * and joining ~only the contaminated ones; it also lifts the
    * requirement that the benchmark grams broadcast — the exact join is
    * AQE-planned here, because after the prune both sides are small. */
  def flagContaminatedBloom(
      docs: DataFrame, benchmark: DataFrame, n: Int = 8,
      fpp: Double = 0.01): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    def grams(df: DataFrame) = df
      .withColumn("w", split(lower(col("text")), " ", -1))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(expr(s"graft_grams(w, $n, true)")).as("gh"))
    // persist: the benchmark gram set feeds three evaluations (the size
    // count, the sketch build, and the exact join in the returned plan)
    // — without it the explode+distinct lineage recomputes each time
    val benchGrams = grams(benchmark).select("gh").distinct().persist()
    val nGrams = benchGrams.count()
    if (nGrams == 0) {
      // no benchmark grams → nothing is contaminated (stat.bloomFilter
      // cannot sketch an empty frame)
      benchGrams.unpersist()
      return docs.select(col("doc_id"))
        .withColumn("n_contaminated_grams", lit(0L))
        .withColumn("contaminated", lit(false))
        .orderBy("doc_id")
    }
    val bloom = benchGrams.stat.bloomFilter("gh", nGrams, fpp)
    val bloomBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val pruned = grams(docs)
      .filter(call_udf("graft_bloom_contains", col("gh"), lit(bloomBytes)))
    val hits = pruned
      .join(benchGrams, Seq("gh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_grams"))
    docs.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_contaminated_grams"), lit(0L)).as("n_contaminated_grams"))
      .withColumn("contaminated", col("n_contaminated_grams") > 0)
      .orderBy("doc_id")
  }

  /** SEMANTIC benchmark decontamination: flag training docs whose
    * embedding is cosine-near any eval-set embedding — the
    * embedding-space complement of [[flagContaminated]], catching the
    * contamination n-gram overlap misses (paraphrases, translations,
    * light rewrites of benchmark items). One row per training vector:
    * hit count, best est_cos, nearest eval id (NULL when clean).
    *
    * Shape: the eval set is tiny by construction, so it rides
    * [[Similarity.sqNearDupAgainst]] as the broadcast side against a
    * one-pass scan of the int8-quantized training corpus
    * ([[Similarity.sqIndex]] built inline here; at 100 TB persist the
    * index through Sinks and call sqNearDupAgainst directly) — LSH
    * bucket equi-join for candidates, never corpus×eval. est_cos is the
    * int8 approximation (coordinate error ~1e-2); thresholds should sit
    * clear of that band, and borderline audits can exact-rerank the
    * (few) flagged rows. */
  def flagContaminatedSemantic(
      train: DataFrame, eval: DataFrame, threshold: Double = 0.9,
      planes: Int = 12, tables: Int = 4,
      bucketCap: Long = Long.MaxValue): DataFrame = {
    val idx = Similarity.sqIndex(train)
    val pairs = Similarity.sqNearDupAgainst(
      eval, idx, threshold, planes, tables, bucketCap)
    val hits = pairs
      .groupBy(col("vec_corpus").as("vec_id"))
      .agg(count(lit(1)).as("n_eval_hits"),
        max("est_cos").as("max_cos"),
        max_by(col("vec_new"), struct(col("est_cos"), -col("vec_new")))
          .as("nearest_eval"))
    train.select("vec_id")
      .join(hits, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        col("max_cos"), col("nearest_eval"))
      .withColumn("contaminated", col("n_eval_hits") > 0)
      .orderBy("vec_id")
  }

  /** Deterministic training-shard assignment + within-shard order: the
    * reproducible global shuffle a distributed training run needs.
    * Shard = md5-prefix hash mod nShards (any engine reproduces it,
    * like [[assignSplits]]); position = rank of the hash within the
    * shard (ties broken by doc_id, so the order is total). One shuffle
    * keyed by shard; at 100 TB the window sorts each shard's slice,
    * which is exactly the sort a shard writer needs anyway. */
  def shardAssign(
      docs: DataFrame, nShards: Int = 8, seed: String = "shard-v1"): DataFrame = {
    val h = graft.functions.DeterministicHash.md5Prefix(seed, col("doc_id"))
    docs.select(col("doc_id"), h.as("h"))
      .withColumn("shard", col("h") % nShards)
      .withColumn("pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy(col("h"), col("doc_id"))))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("doc_id")
  }

  /** Quality-weighted (importance) sampling: keep each document with
    * probability equal to its classifier quality score — the standard
    * move for up-weighting high-quality text in a training mix without
    * a hard threshold. The coin flip is the same md5-prefix uniform as
    * [[mixSources]] (bit-reproducible in any engine, no RNG state);
    * the score is the exact [[TextAnalysis.classifierScore]]
    * formulation, already oracle-proven. One doc_id-keyed aggregation
    * (the classifier's token sum); the sampling itself is narrow. */
  def qualitySample(docs: DataFrame, seed: String = "qsample-v1"): DataFrame = {
    val u = graft.functions.DeterministicHash.md5Prefix(seed, col("doc_id"))
      .cast("double") / 4294967296.0
    TextAnalysis.classifierScore(docs)
      .select(col("doc_id"), col("score"))
      .withColumn("kept", u < col("score"))
      .orderBy("doc_id")
  }

  /** End-to-end curation gate (the quality funnel a training-data run
    * applies before mixing): every document gets a keep/drop decision
    * and the FIRST failing stage as its reason, in fixed precedence —
    * `lang` (heuristic prediction ≠ wanted), `length` (token count out
    * of bounds), `quality` (composite score gate), `repetition`
    * (Gopher repeated-n-gram rule), `duplicate` (exact-content loser:
    * any doc whose content hash is owned by a smaller doc_id). Keeps
    * carry reason NULL.
    *
    * Shape: the per-row signals (lang/quality/tokens) are narrow maps;
    * repetition adds its own (doc, gram)-keyed aggregation; the
    * duplicate stage shuffles a SLIM (doc_id, content-hash) projection
    * once. Everything re-keys to doc_id, so the final joins co-locate
    * under AQE. Reusing the exact component formulations keeps every
    * stage bit-identical to its standalone (oracle-proven) operator. */
  def curationPipeline(
      docs: DataFrame, wantLang: String = "en",
      minTokens: Int = 20, maxTokens: Int = 5000): DataFrame = {
    // per-row stages in ONE narrow pass (shared with curationSignals)
    val signals = curationSignals(docs, wantLang, minTokens, maxTokens)
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"),
        col("row_reason"))
    // repetitionScore omits docs with < 2 words (no bigrams) — they are
    // not repetitive, so the left join's NULL coalesces to false
    val rep = TextAnalysis.repetitionScore(docs).select(col("doc_id"), col("flagged"))
    // duplicate stage: content-hash ownership via a partial-combined min
    // aggregate (the [[Dedup.chunkDedup]] shape) — map-side combine
    // collapses mega-duplicated boilerplate BEFORE the shuffle, where a
    // window over the hash would land every copy of one hot value in a
    // single task. No join back on the hash either: doc_id is unique, so
    // a doc survives iff its OWN id won some hash group — a uniform
    // doc_id-keyed left join marks owners; NULL ⇒ duplicate.
    val owners = docs
      .select(sha2(col("text"), 256).as("h"), col("doc_id"))
      .groupBy("h").agg(min("doc_id").as("doc_id"))
      .select(col("doc_id"), lit(true).as("is_owner"))
    signals
      .join(rep, Seq("doc_id"), "left")
      .join(owners, Seq("doc_id"), "left")
      .withColumn("reason",
        coalesce(col("row_reason"),
          when(coalesce(col("flagged"), lit(false)), "repetition")
            .when(col("is_owner").isNull, "duplicate")
            .otherwise(lit(null).cast("string"))))
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"),
        col("reason").isNull.as("keep"), col("reason"))
      .orderBy("doc_id")
  }

  /** The STATELESS per-row stages of [[curationPipeline]] (lang /
    * length / quality) as one narrow projection — no sort, no join, no
    * shuffle, so the same frame works on a batch table or a streaming
    * source unchanged (the streaming quality gate in front of a
    * landing sink; pair with `dropDuplicatesWithinWatermark` for the
    * duplicate stage). `row_reason` is the first failing per-row stage
    * or NULL; the corpus-level stages (repetition, duplicate) are
    * batch concerns layered on top by [[curationPipeline]], sharing
    * these exact expressions via [[TextAnalysis]]'s column builders. */
  def curationSignals(
      docs: DataFrame, wantLang: String = "en",
      minTokens: Int = 20, maxTokens: Int = 5000): DataFrame = {
    val w = split(lower(col("text")), " ", -1)
    val scores = TextAnalysis.langScoreCols(array_distinct(w))
    docs.select(
        col("doc_id"),
        TextAnalysis.predictedLangCol(scores).as("lang_pred"),
        TextAnalysis.tokenCountCol(col("text")).as("n_tokens"),
        TextAnalysis.qualityKeepCol(col("text"), w).as("q_keep"))
      .withColumn("row_reason",
        when(col("lang_pred") =!= wantLang, "lang")
          .when(col("n_tokens") < minTokens || col("n_tokens") > maxTokens, "length")
          .when(!col("q_keep"), "quality")
          .otherwise(lit(null).cast("string")))
      .withColumn("row_keep", col("row_reason").isNull)
  }

  /** Token-budget per-source sampling: each source contributes documents
    * in deterministic md5-hash order until its token budget is reached —
    * the "take N tokens of each source" step of assembling a training
    * mix with absolute token targets (complement of [[mixSources]],
    * whose targets are RATES). A doc is kept iff it STARTS before the
    * budget is exhausted (`cum_before < budget`), so the kept set is a
    * deterministic hash-order prefix, reproducible by any engine and
    * independent of partitioning.
    *
    * Scale shape: the per-source running sum is the [[TextCleaning
    * .packSequences]] two-level prefix sum, not one flat window — docs
    * land in hash-ORDERED buckets (the md5 prefix's high bits, monotone
    * in the hash), within-bucket windows are bounded at ~|source| /
    * `hashBuckets` rows, and cross-bucket offsets ride a broadcast of
    * |sources|·`hashBuckets` subtotal rows. A flat
    * Window.partitionBy(source) would serialize a whole source — at
    * 100 TB likely the majority of the corpus — into one task. */
  /** TEMPERATURE-reweighted source mixing — the multilingual/
    * multi-source LM sampling rule (Conneau & Lample, NeurIPS 2019
    * §3.1; mT5, Xue et al. 2021 §3.2): sources draw proportional to
    * nᵢ^α, α ∈ (0, 1] flattening the head so low-resource sources are
    * not drowned (α = 1 is the raw mix; [[mixSources]] is the
    * hand-set-rates cousin). Per-doc acceptance is the deterministic
    * md5-uniform of [[mixSources]] against a PER-SOURCE INTEGER
    * micro-rate from [[mixTemperatureRates]]. Rates clamp at 1 — a
    * small source cannot be sampled beyond itself
    * (sampling-without-replacement cap; the standard caveat).
    *
    * Spark shape: one partial-combined count per source (bounded
    * frame, collected — sources are a handful of rows), the integer
    * rate table broadcast back onto the corpus as LITERALS, one
    * narrow filter — no shuffle of the docs. FULL oracle: the oracle
    * SQL consumes the SAME integer r_micro literals, so no float op
    * is duplicated across engines. Returns the sampled docs with
    * their `r_micro`. */
  def mixTemperature(
      docs: DataFrame, alpha: Double, budget: Long,
      seed: String = "mixt"): DataFrame =
    mixTemperatureApply(docs, mixTemperatureRates(docs, alpha, budget), seed)

  /** Per-source (source, n, pwm, r_micro) temperature rates, computed
    * ONCE on the driver: the single float op — pow(nᵢ, α),
    * micro-snapped to the integer pwmᵢ BEFORE summation — runs in JVM
    * Math.pow only, and everything after it is exact BigInt
    * arithmetic: rᵢ = min(10⁶, budget·pwmᵢ·10⁶ div (Σpwm·nᵢ)). Both
    * the Spark plan and the engine-twin oracle SQL consume these
    * INTEGER rates as literals, so a pow() whose last ulp differs
    * between the JVM and another engine's libm can never flip a rate
    * at a .5 rounding boundary (neither pow is correctly rounded —
    * computing it twice was a platform-dependent flake). Sorted by
    * source for deterministic output. */
  def mixTemperatureRates(
      docs: DataFrame, alpha: Double,
      budget: Long): Seq[(String, Long, Long, Long)] = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"mixTemperature: alpha must be in (0, 1], got $alpha")
    require(budget >= 0L, s"mixTemperature: budget must be >= 0, got $budget")
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val withPwm = counts.map { case (s, n) =>
      (s, n, math.round(math.pow(n.toDouble, alpha) * 1e6)) }
    val tot = withPwm.iterator.map(t => BigInt(t._3)).sum
    withPwm.map { case (s, n, w) =>
      val r =
        if (tot == 0 || n == 0L) 0L
        else ((BigInt(budget) * w * 1000000) / (tot * n)).min(1000000).toLong
      (s, n, w, r)
    }
  }

  /** Apply precomputed [[mixTemperatureRates]]: broadcast the literal
    * rate table onto the corpus, filter by the exact integer md5
    * acceptance — u/2³² < r/10⁶ ⟺ u·10⁶ < r·2³². */
  def mixTemperatureApply(
      docs: DataFrame, rates: Seq[(String, Long, Long, Long)],
      seed: String = "mixt"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rdf = rates.map { case (s, _, _, r) => (s, r) }
      .toDF("source", "r_micro")
    val u = graft.functions.DeterministicHash.md5Prefix(seed, col("doc_id"))
    docs.join(broadcast(rdf), Seq("source"))
      .filter(u * lit(1000000L) < col("r_micro") * lit(4294967296L))
  }

  def tokenBudgetSample(
      docs: DataFrame,
      budgets: Map[String, Long] = Map.empty,
      defaultBudget: Long = 800L,
      seed: String = "budget-v1",
      hashBuckets: Int = 4096): DataFrame = {
    require(hashBuckets >= 1 && hashBuckets <= (1 << 20),
      s"hashBuckets must be in [1, 2^20], got $hashBuckets")
    // bucket = the hash's high bits: floor(h / width) is monotone in h,
    // so (bucket, h, doc_id) order IS global (h, doc_id) order
    val bucketWidth = 4294967296L / hashBuckets
    val counted = docs.select(col("doc_id"), col("source"),
        TextAnalysis.tokenCountCol(col("text")).as("n_tokens"))
      .withColumn("h", graft.functions.DeterministicHash.md5Prefix(seed, col("doc_id")))
      .withColumn("bucket", floor(col("h") / bucketWidth))
      // localCheckpoint per the persistence contract: feeds both the
      // subtotal aggregation and the within-bucket windows
      .localCheckpoint()
    // exclusive cross-bucket offsets: a window over bucket subtotals
    val wB = Window.partitionBy("source").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counted.groupBy("source", "bucket")
      .agg(sum("n_tokens").as("bucket_tokens"))
      .withColumn("bucket_offset", coalesce(sum("bucket_tokens").over(wB), lit(0L)))
      .select("source", "bucket", "bucket_offset")
    // exclusive within-bucket running sum in (h, doc_id) order
    val wD = Window.partitionBy("source", "bucket").orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (src, b)) =>
      when(col("source") === src, lit(b)).otherwise(acc)
    }
    counted
      .withColumn("cum_in_bucket", coalesce(sum("n_tokens").over(wD), lit(0L)))
      .join(broadcast(offsets), Seq("source", "bucket"))
      .withColumn("cum_before", col("bucket_offset") + col("cum_in_bucket"))
      .withColumn("kept", col("cum_before") < budget)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_before"), col("kept"))
      .orderBy("doc_id")
  }

  /** DSIR importance-resampling weights (Xie et al. 2023,
    * arXiv:2302.03169 "Data Selection via Importance Resampling" —
    * public): score every raw doc by how target-like its hashed n-gram
    * features look. Features are unigrams + adjacent bigrams hashed
    * into `nBuckets` buckets (the paper's hashed generative model);
    * target and raw bucket distributions are Laplace-smoothed over the
    * bucket space; a doc's log importance weight is
    * Σ_b c_b · (ln p̂_target(b) − ln p̂_raw(b)). `keep` is the
    * deterministic `log_weight > 0` gate ("more target-like than
    * raw") — production DSIR resamples ∝ weight with Gumbel top-k,
    * which is RNG-bearing and so deliberately out of the oracle path.
    *
    * Scale shape: features are built NARROWLY (one array transform per
    * doc — no position self-join) and collapse immediately into the
    * per-(doc, bucket) count frame — the ONLY corpus-sized shuffle;
    * both model distributions re-aggregate that frame (bounded at
    * |docs| × min(feats, nBuckets) rows), the model itself is
    * `nBuckets` rows and rides a broadcast into the scoring join, and
    * the per-doc sum reuses the doc_id-prefixed partitioning.
    * Log-ratios snap to INTEGER micro-nats (round(lr·1e6) as long), so
    * the per-doc sum is an exact integer — order-independent across
    * partial-aggregation trees and engine-identical — and `keep`
    * compares that raw integer (the [[TextAnalysis.classifierScore]]
    * margin idiom; a float sum here measurably flips the 4th decimal
    * run-to-run). The reported double is derived from the integer by
    * one deterministic division. */
  def dsirWeights(
      docs: DataFrame, targetSources: Seq[String],
      nBuckets: Int = 1024, seed: String = "dsir-v1"): DataFrame = {
    require(targetSources.nonEmpty, "targetSources must be non-empty")
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val words = docs.select(col("doc_id"), col("source"),
      split(lower(col("text")), " ", -1).as("w"))
    // unigrams ++ adjacent bigrams; sequence(2, 1) DESCENDS in Spark,
    // so single-token docs must take the empty-array branch
    val feats = words.select(col("doc_id"), col("source"), explode(concat(
        col("w"),
        when(size(col("w")) >= 2, expr(
          "transform(sequence(2, size(w)), " +
            "i -> concat(element_at(w, i - 1), ' ', element_at(w, i)))"))
          .otherwise(expr("cast(array() as array<string>)")))).as("f"))
      .select(col("doc_id"), col("source"),
        (graft.functions.DeterministicHash.md5Prefix(seed, col("f")) % nBuckets).as("b"))
    // the one corpus-sized aggregation; feeds the raw model, the target
    // model, and the scoring join — localCheckpoint per the persistence
    // contract
    val perDocBucket = feats.groupBy("doc_id", "source", "b")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val raw = perDocBucket.groupBy("b").agg(sum("c").as("cr"))
    val tgt = perDocBucket.filter(col("source").isInCollection(targetSources))
      .groupBy("b").agg(sum("c").as("ct"))
    val tTot = tgt.agg(sum("ct").as("t"))
    val rTot = raw.agg(sum("cr").as("r"))
    // nBuckets-row model: Laplace-smoothed log-ratio per bucket. Every
    // scored bucket exists in `raw` by construction, so the inner
    // scoring join below loses nothing.
    val model = raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("b"), round((
        log((coalesce(col("ct"), lit(0L)).cast("double") + 1.0) /
          // a target filter matching zero docs sums to NULL; smoothing
          // then degrades p̂_target to the uniform 1/nBuckets
          (coalesce(col("t"), lit(0L)).cast("double") + nBuckets)) -
          log((col("cr").cast("double") + 1.0) /
            (col("r").cast("double") + nBuckets))) * 1e6)
        .cast("long").as("lr_micro"))
    perDocBucket
      .join(broadcast(model), Seq("b"))
      .groupBy("doc_id", "source")
      .agg(sum("c").as("n_feats"),
        sum(col("c") * col("lr_micro")).as("wm"))
      .select(col("doc_id"), col("source"), col("n_feats"),
        // report at the micro-nat's OWN scale: wm/1e6 is exactly a
        // 1e-6 multiple, so round(·, 6) is an identity snap that can
        // never sit on a rounding boundary — a 4-decimal report put
        // wm ≡ ±50 (mod 100) EXACTLY on the x.xxxx5 half-boundary,
        // where the engines' decimal round-trips legitimately disagree
        // (observed at sf0.1: 4 rows flipped the 4th decimal)
        round(col("wm").cast("double") / 1e6, 6).as("log_weight"),
        (col("wm") > 0).as("keep"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: flag training docs sharing any word
    * n-gram with a benchmark/eval set (the standard n-gram overlap
    * check). Benchmark grams are hash-distinct and broadcast (eval sets
    * are tiny by construction — for a genuinely large right side drop
    * the hint and AQE shuffles); doc grams stream through the join, so
    * the cost is one scan of the corpus + a per-doc count. Output: one
    * row per doc with the overlapping-gram count and flag. */
  def flagContaminated(
      docs: DataFrame, benchmark: DataFrame, n: Int = 8): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    graft.functions.VectorFunctions.register(benchmark.sparkSession)
    def grams(df: DataFrame) = df
      .withColumn("w", split(lower(col("text")), " ", -1))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(expr(s"graft_grams(w, $n, true)")).as("gh"))
    val benchGrams = grams(benchmark).select("gh").distinct()
    val hits = grams(docs)
      .join(broadcast(benchGrams), Seq("gh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_grams"))
    docs.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_contaminated_grams"), lit(0L)).as("n_contaminated_grams"))
      .withColumn("contaminated", col("n_contaminated_grams") > 0)
      .orderBy("doc_id")
  }

  /** GRADED contamination: per-doc fraction of its DISTINCT word
    * n-grams that appear anywhere in the benchmark set — the overlap
    * measure the GPT-3 appendix-C "dirtiness" analysis reports (a doc
    * quoting one eval question is a different animal from a doc that
    * IS one), where [[flagContaminated]] only gives the binary
    * verdict. The ratio snaps half-up to integer micros (the
    * Classifier ratio posture) so the report has a FULL DuckDB
    * oracle; docs shorter than n words report 0/0 → 0.
    *
    * Same join shape as the flag form: benchmark grams hash-distinct
    * and broadcast, one corpus scan, per-doc counts. Output:
    * (doc_id, n_grams, n_overlap, overlap_micro) ordered by doc_id. */
  def contaminationOverlap(
      docs: DataFrame, benchmark: DataFrame, n: Int = 8): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    def grams(df: DataFrame) = df
      .withColumn("w", split(lower(col("text")), " ", -1))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(expr(s"graft_grams(w, $n, true)")).as("gh"))
    val benchGrams = grams(benchmark).select("gh").distinct()
    val per = grams(docs)
      .join(broadcast(benchGrams).withColumn("hit", lit(1L)), Seq("gh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
    docs.select("doc_id")
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("overlap_micro", expr(
        """CASE WHEN n_grams = 0 THEN CAST(0 AS BIGINT)
          | ELSE (n_overlap * 2000000 + n_grams) div (n_grams * 2) END""".stripMargin))
      .orderBy("doc_id")
  }

  /** END-TO-END corpus construction: one call takes a raw document
    * table to a per-document training disposition — the operator a
    * pipeline runs nightly to BUILD the corpus, composed entirely
    * from the library's oracle-proven stage formulations so the whole
    * build itself has a DuckDB oracle twin:
    *
    *   1. exact dedup — first occurrence (min doc_id) per md5(text)
    *      owns the payload; later copies → `dup_exact`
    *   2. near-dup resolution over the exact survivors — ngramJaccard
    *      candidate pairs → star-contraction components → the
    *      component minimum survives; others → `dup_near`
    *   3. benchmark decontamination — any doc sharing a word n-gram
    *      with the eval set → `contaminated` (running the benchmark
    *      docs through the build marks THEM contaminated too — eval
    *      data never reaches training, the intended semantics)
    *   4. Gopher quality rules — failing docs → `low_quality`
    *   5. survivors → `kept` with deterministic split + shard
    *      assignments (md5-prefix hashes, engine-reproducible)
    *
    * Precedence is first-fail in stage order (a doc that is both a
    * near-dup and low quality reports `dup_near` — the
    * curationPipeline convention). Scale shape: every stage is the
    * already-audited formulation (partial-combined exact ownership,
    * bucketed candidate pairs — never all-pairs, O(log² n)
    * star-contraction rounds, broadcast benchmark grams, one
    * token-keyed quality aggregation); the final assembly is slim
    * doc_id-keyed joins. Output: (doc_id, status, split, shard) —
    * split/shard NULL unless kept. */
  def corpusBuild(
      docs: DataFrame, benchmark: DataFrame,
      contamN: Int = 5, minWords: Int = 20, minStopHits: Int = 1,
      splitWeights: Seq[(String, Int)] =
        Seq("train" -> 90, "val" -> 5, "test" -> 5),
      nShards: Int = 8): DataFrame = {
    // stage 1 — exact ownership via a partial-combined min aggregate
    // (the curationPipeline shape: a window over the content hash
    // would land every copy of one hot payload in a single task; no
    // join back on the hash either — a doc is a duplicate iff its own
    // id won no hash group). Feeds the survivor semi-join AND the
    // final disposition join.
    val owners = docs
      .select(md5(col("text")).as("h"), col("doc_id"))
      .groupBy("h").agg(min("doc_id").as("doc_id"))
      .select(col("doc_id"), lit(true).as("is_owner"))
      .localCheckpoint()
    // stage 2 — near-dup components over exact survivors only (exact
    // copies would otherwise re-flag as trivial near-dups)
    val s1 = docs.join(owners.select("doc_id"), Seq("doc_id"), "left_semi")
    val nearDropped = Dedup
      .duplicateLabelsStar(Dedup.ngramJaccard(s1).select("doc_a", "doc_b"))
      .filter(col("id") =!= col("label"))
      .select(col("id").as("doc_id"), lit(true).as("dup_near"))
    // stages 3 + 4 — flags over the full corpus; precedence decides
    val contam = flagContaminated(docs, benchmark, contamN)
      .select(col("doc_id"), col("contaminated"))
    val quality = TextAnalysis
      .gopherRules(docs, minWords = minWords, minStopHits = minStopHits)
      .select(col("doc_id"), col("keep"))
    val status = docs.select("doc_id")
      .join(owners, Seq("doc_id"), "left")
      .join(nearDropped, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"))
      .join(quality, Seq("doc_id"))
      .withColumn("status",
        when(col("is_owner").isNull, lit("dup_exact"))
          .when(coalesce(col("dup_near"), lit(false)), lit("dup_near"))
          .when(col("contaminated"), lit("contaminated"))
          .when(!col("keep"), lit("low_quality"))
          .otherwise(lit("kept")))
    val shard = graft.functions.DeterministicHash
      .md5Prefix("shard-v1", col("doc_id")) % nShards
    assignSplits(status, weights = splitWeights)
      .select(col("doc_id"), col("status"),
        when(col("status") === "kept", col("split"))
          .otherwise(lit(null).cast("string")).as("split"),
        when(col("status") === "kept", shard)
          .otherwise(lit(null).cast("long")).as("shard"))
      .orderBy("doc_id")
  }

  /** Attrition report over a [[corpusBuild]] result: docs per
    * disposition (the numbers a corpus-build run is reviewed on). */
  def corpusBuildReport(built: DataFrame): DataFrame =
    built.groupBy("status").agg(count(lit(1)).as("n_docs"))
      .orderBy("status")

  /** PER-SOURCE scorecard over a [[corpusBuild]] result — the
    * provenance question the attrition report can't answer: WHICH
    * source is shedding documents, and to what. A crawl pipeline
    * reads this table per ingest (source X suddenly 80 % dup_exact =
    * a re-crawled snapshot; source Y spiking contaminated = eval
    * leakage at the supplier). One doc_id-keyed join + one
    * aggregation over the build's disposition frame; the kept-rate
    * snaps half-up to integer micros, so the whole scorecard rides
    * the SAME composed DuckDB oracle as the build itself.
    *
    * Output: (source, n_docs, n_dup_exact, n_dup_near,
    * n_contaminated, n_low_quality, n_kept, kept_rate_micro) ordered
    * by source. */
  def corpusAudit(docs: DataFrame, built: DataFrame): DataFrame = {
    val statuses =
      Seq("dup_exact", "dup_near", "contaminated", "low_quality", "kept")
    val aggs = count(lit(1)).as("n_docs") +:
      statuses.map(st =>
        sum(when(col("status") === st, 1L).otherwise(0L)).as(s"n_$st"))
    built.join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("kept_rate_micro",
        expr("(n_kept * 2000000 + n_docs) div (n_docs * 2)"))
      .orderBy("source")
  }

  /** FUZZY benchmark decontamination: flag training docs that are
    * MinHash NEAR-duplicates of any benchmark doc — the overlap mode
    * exact n-gram matching misses (paraphrased eval items, reformatted
    * copies; the reason production decontamination runs a near-dup
    * pass alongside the exact one). Completes the decontamination
    * matrix: exact n-gram ([[flagContaminated]]), Bloom-pruned exact
    * ([[flagContaminatedBloom]]), semantic
    * ([[flagContaminatedSemantic]]), and lexical-fuzzy (this).
    *
    * Shape: the benchmark side is sketched ONCE
    * (Dedup.minhashSignatures, caller-scale tiny) and the training
    * corpus streams through [[Dedup.minhashPairsAgainst]]'s banded
    * bucket join — LSH candidates only, never all pairs; the corpus is
    * sketched once and crosses the shuffle as (id, band) keys.
    * Rows-only (LSH candidate generation has no SQL twin); planted
    * near-dup detection and clean-doc pass-through asserted in spec. */
  def flagContaminatedFuzzy(
      docs: DataFrame, benchmark: DataFrame,
      shingleLen: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val idx = Dedup.minhashSignatures(benchmark, shingleLen, numHashes)
      .localCheckpoint()
    val hits = Dedup
      .minhashPairsAgainst(docs, idx, shingleLen, numHashes, bands, threshold)
      .groupBy(col("doc_new").as("doc_id"))
      .agg(count(lit(1)).as("n_matched_eval_docs"),
        max("est_jaccard").as("max_est_jaccard"))
    docs.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matched_eval_docs"), lit(0L)).as("n_matched_eval_docs"),
        coalesce(col("max_est_jaccard"), lit(0.0)).as("max_est_jaccard"))
      .withColumn("contaminated", col("n_matched_eval_docs") > 0)
      .orderBy("doc_id")
  }
}
