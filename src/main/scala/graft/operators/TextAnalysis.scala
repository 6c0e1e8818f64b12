package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: language ID, quality
  * scoring, token counting, document fingerprinting, perplexity,
  * repetition and classifier quality gates.
  *
  * Scale posture: the per-doc signals (langId, quality, tokens,
  * fingerprints) are narrow per-row maps built from codegen'd
  * string/array expressions — no shuffles, no UDFs, no vocabulary
  * broadcast beyond literal stopword arrays. The corpus-statistics
  * operators (perplexity, repetition, classifier) add only
  * partial-combined aggregations on high-cardinality keys; the
  * perplexity model join is AQE-planned, never force-broadcast.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists (heuristic language ID). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "you", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "ich", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "ser", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "un", "que", "pour", "dans", "ce", "pas"),
    "zh" -> Seq("的", "一", "是", "不", "了", "人", "我", "在", "有", "他"))

  // ---- Column-level per-row signal builders --------------------------
  // Pure narrow expressions (no sort, no shuffle, no state): the single
  // source of truth shared by the batch operators below and the
  // stream-safe curation gate (Curation.curationSignals) — batch and
  // streaming results are bit-identical by construction.

  /** Per-language stopword-hit scores over a DISTINCT word array. */
  private[operators] def langScoreCols(wDistinct: Column): Seq[(String, Column)] =
    stopwords.map { case (lang, words) =>
      lang -> size(array_intersect(wDistinct, typedLit(words)))
    }

  /** First language (declaration order) attaining the max score. */
  private[operators] def predictedLangCol(scores: Seq[(String, Column)]): Column = {
    val Seq(en, de, es, fr, zh) = scores.map(_._2)
    when(en >= de && en >= es && en >= fr && en >= zh, "en")
      .when(de >= es && de >= fr && de >= zh, "de")
      .when(es >= fr && es >= zh, "es")
      .when(fr >= zh, "fr")
      .otherwise("zh")
  }

  /** BPE-ish token count (alpha runs, digit runs, single symbols). */
  private[operators] def tokenCountCol(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|\\S"), lit(0)))

  /** Composite quality keep decision over (text, words). Exactly the
    * [[qualityScore]] formulation: raw (un-snapped) ratios, weighted
    * half/half, thresholded with a minimum word count. */
  private[operators] def qualityKeepCol(text: Column, w: Column): Column = {
    val sw = stopwords.head._2
    val nChars = length(text)
    val nWords = size(w)
    val alpha = length(regexp_replace(lower(text), "[^a-z ]", "")).cast("double") / nChars
    val stop = size(filter(w, t => t.isin(sw: _*))).cast("double") / nWords
    (alpha * 0.5 + stop * 0.5 >= 0.3) && (nWords >= 10)
  }

  /** Stopword-hit language ID: score = |distinct tokens ∩ stopwords_L|,
    * prediction = first language (in declaration order) attaining the
    * max — a deterministic n-gram-free heuristic. */
  def langId(docs: DataFrame): DataFrame = {
    val base = docs
      .withColumn("w", array_distinct(split(lower(col("text")), " ", -1)))
    val scores = langScoreCols(col("w"))
    val scored = scores.foldLeft(base) { case (df, (lang, c)) =>
      df.withColumn(s"s_$lang", c)
    }
    scored.select(
        col("doc_id") +: col("lang") +:
          predictedLangCol(scores.map { case (l, _) => l -> col(s"s_$l") }).as("predicted") +:
          stopwords.map { case (l, _) => col(s"s_$l") }: _*)
      .orderBy("doc_id")
  }

  /** Document quality signals: length, word stats, alpha/stopword
    * ratios, and a composite keep/drop decision. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val sw = stopwords.head._2 // english function-word list
    val swList = sw.map(s => s"'$s'").mkString(", ")
    docs
      .withColumn("n_chars", length(col("text")))
      .withColumn("w", split(lower(col("text")), " ", -1))
      .withColumn("n_words", size(col("w")))
      .withColumn("avg_word_len_raw",
        (col("n_chars") - col("n_words") + lit(1)).cast("double") / col("n_words"))
      .withColumn("alpha_ratio_raw",
        length(regexp_replace(lower(col("text")), "[^a-z ]", "")).cast("double") / col("n_chars"))
      .withColumn("stopword_ratio_raw",
        expr(s"size(filter(w, t -> t in ($swList)))").cast("double") / col("n_words"))
      .withColumn("score_raw",
        col("alpha_ratio_raw") * 0.5 + col("stopword_ratio_raw") * 0.5)
      .select(
        col("doc_id"),
        col("n_chars"),
        col("n_words"),
        round(col("avg_word_len_raw"), 2).as("avg_word_len"),
        round(col("alpha_ratio_raw"), 4).as("alpha_ratio"),
        round(col("stopword_ratio_raw"), 4).as("stopword_ratio"),
        round(col("score_raw"), 4).as("quality_score"),
        qualityKeepCol(col("text"), col("w")).as("keep"))
      .orderBy("doc_id")
  }

  /** BPE-ish token counting: alpha runs, digit runs, or single
    * non-space symbols (the classic pre-tokenizer split). */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        tokenCountCol(col("text")).as("n_tokens"))
      .orderBy("doc_id")

  /** Unigram "perplexity" quality score (CCNet-style filtering): build
    * corpus unigram frequencies, score each document by its mean token
    * negative log-probability — outliers (too predictable / too random
    * vs the corpus) are filter candidates. Two passes: one aggregation
    * for the model, one join to score; per-token surprisals snap to
    * INTEGER micro-nats (round(−ln p · 1e6) as long — the
    * [[graft.operators.Curation.dsirWeights]] idiom) so the per-doc sum
    * is an exact integer: order-independent across partial-aggregation
    * trees and engine-identical. The mean is computed half-up in PURE
    * INTEGER arithmetic — (2·sum + n) div (2·n) — so no rational
    * quantity ever meets a float rounding boundary; the reported double
    * is the integer's own-scale 1e-6 identity snap (a 4-decimal mean
    * put sums ≡ ±50 (mod 100)·count EXACTLY on the x.xxxx5
    * half-boundary where engine decimal round-trips legitimately
    * disagree — the class that flipped dsirWeights rows at sf0.1).
    *
    * Scale posture: the model join carries NO broadcast hint — AQE
    * broadcasts while the vocabulary fits the auto-broadcast threshold
    * and falls back to a shuffle join beyond it (a web-scale vocab is
    * unbounded). `minTokenCount` floors the model to tokens seen at
    * least that often — the CCNet move that keeps the vocab bounded —
    * with floored-out tokens scored at singleton surprisal
    * (-ln(1/total)) via the left join's fallback. The default floor of
    * 1 keeps every corpus token in the model, so results are identical
    * to the unfloored formulation (the oracle's). */
  def perplexityScore(docs: DataFrame, minTokenCount: Long = 1L): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(split(lower(col("text")), " ", -1)).as("t"))
    // One tokenization pass builds the vocabulary; localCheckpoint it
    // because two consumers branch from it (the scalar token total and
    // the model) and Spark re-executes a subplan per consumer — without
    // it the corpus is tokenized once per branch (the scoring join
    // below makes pass two; this held passes three and four). The
    // materialized frame is the vocab — the shuffle already produced
    // exactly these rows, so the checkpoint adds storage, not compute.
    val counts = toks.groupBy("t").agg(count(lit(1)).as("n")).localCheckpoint()
    // exact corpus token count: the vocab already carries it
    val total = counts.agg(sum("n").as("total"))
    val model = counts
      .filter(col("n") >= minTokenCount)
      .crossJoin(broadcast(total))
      .select(col("t"),
        round(-log(col("n").cast("double") / col("total")) * 1e6)
          .cast("long").as("s_unat"))
    toks.join(model, Seq("t"), "left")
      .crossJoin(broadcast(total))
      .withColumn("su",
        coalesce(col("s_unat"),
          round(-log(lit(1.0) / col("total")) * 1e6).cast("long")))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum("su").as("surprisal_unat"))
      // half-up integer mean: floor((2·sum + n) / (2·n)) for the
      // nonnegative surprisal sum — rounding happens before any float
      .withColumn("avg_surprisal_unat",
        expr("(2 * surprisal_unat + n_tokens) div (2 * n_tokens)"))
      .select(col("doc_id"), col("n_tokens"), col("surprisal_unat"),
        col("avg_surprisal_unat"),
        round(col("avg_surprisal_unat").cast("double") / 1e6, 6)
          .as("avg_surprisal"))
      .orderBy("doc_id")
  }

  /** Perplexity scoring against an EXPLICIT persisted unigram model (a
    * [[termCounts]] frame) — the serving mode: at 100 TB the LM is
    * trained ONCE per corpus version and every scoring pass (batch or
    * stream) reads the artifact instead of re-aggregating the corpus,
    * exactly the divergenceAgainst / indexed-BPE posture. Identical
    * rounding discipline to [[perplexityScore]], so scoring a corpus
    * against its own termCounts is bit-equal to the self-trained form
    * (asserted in spec); tokens ABSENT from the model score at the
    * singleton surprisal −ln(1/total) — the same fallback the
    * frequency floor uses, so an out-of-vocabulary token degrades like
    * a count-1 token instead of producing ln(0).
    *
    * Scale shape: one narrow tokenization of the scored docs, one
    * AQE-planned left join against the model (broadcast while it fits,
    * shuffle beyond), one partial-combined per-doc aggregation. The
    * model total rides a broadcast scalar. */
  def perplexityAgainst(docs: DataFrame, model: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(lower(col("text")), " ", -1)).as("t"))
    val total = model.agg(sum("cnt").as("total"))
    val scored = model.crossJoin(broadcast(total))
      .select(col("t"),
        round(-log(col("cnt").cast("double") / col("total")) * 1e6)
          .cast("long").as("s_unat"))
    toks.join(scored, Seq("t"), "left")
      .crossJoin(broadcast(total))
      // an EMPTY (or zero-count) model makes total NULL/0, which would
      // silently score every token NULL — a mis-pointed LM artifact
      // must fail loudly instead. Scoring zero docs against an empty
      // model stays legal (no row ever evaluates the guard).
      .withColumn("su",
        coalesce(col("s_unat"),
          when(col("total") > 0,
            round(-log(lit(1.0) / col("total")) * 1e6).cast("long")),
          raise_error(lit("perplexityAgainst: model is empty or has zero" +
            " total count — every score would be NULL; check the LM" +
            " artifact path")).cast("long")))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum("su").as("surprisal_unat"))
      .withColumn("avg_surprisal_unat",
        expr("(2 * surprisal_unat + n_tokens) div (2 * n_tokens)"))
      .select(col("doc_id"), col("n_tokens"), col("surprisal_unat"),
        col("avg_surprisal_unat"),
        round(col("avg_surprisal_unat").cast("double") / 1e6, 6)
          .as("avg_surprisal"))
      .orderBy("doc_id")
  }

  /** Bigram perplexity with Jelinek-Mercer interpolation — the stronger
    * LM-quality score one step up from [[perplexityScore]]'s unigram
    * model: each transition scores `−ln(λ·P(w2|w1) + (1−λ)·P(w2))`,
    * where P(w2|w1) = c(w1,w2)/c(w1·) over corpus bigrams and P(w2) is
    * the corpus unigram probability. The unigram backoff term keeps
    * every probability positive, so a floored-out (or unseen) bigram
    * degrades smoothly instead of producing ln(0). Output per doc:
    * transition count, the exact integer micro-nat surprisal sum and
    * half-up integer mean, the mean's 1e-6 identity snap, and
    * perplexity `exp(mean)`; docs under 2 tokens carry 0 transitions
    * and NULLs.
    *
    * Scale shape: bigrams are built NARROWLY (one array transform per
    * doc — no position self-join); the model is two partial-combined
    * aggregations; scoring joins carry no broadcast hint — AQE
    * broadcasts while the (floored) model fits and shuffles beyond,
    * exactly the [[perplexityScore]] posture. `minBigramCount` is the
    * CCNet-style floor that bounds the bigram table at web scale — the
    * default 1 keeps results identical to the unfloored form (the
    * oracle's). Surprisals snap to integer micro-nats so the engines'
    * last ulp of ln() cannot perturb the exact-integer mean. */
  def bigramPerplexity(
      docs: DataFrame, lambda: Double = 0.75,
      minBigramCount: Long = 1L): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0, s"lambda must be in (0, 1), got $lambda")
    val words = docs.select(col("doc_id"), split(lower(col("text")), " ", -1).as("w"))
    // adjacent pairs, narrowly: element i-1 → i for i in [2, |w|]
    val bigrams = words.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(2, size(w)), " +
          "i -> struct(element_at(w, i - 1) AS w1, element_at(w, i) AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      // feeds the history counts, the bigram counts, and the scoring
      // join — localCheckpoint per the persistence contract
      .localCheckpoint()
    val uni = words.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n")).localCheckpoint()
    val total = uni.agg(sum("n").as("total"))
    val uniP = uni.crossJoin(broadcast(total))
      .select(col("t").as("w2"), (col("n").cast("double") / col("total")).as("pu"))
    val hist = bigrams.groupBy("w1").agg(count(lit(1)).as("c1"))
    val bi = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= minBigramCount)
      .join(hist, "w1")
      .select(col("w1"), col("w2"), (col("cb").cast("double") / col("c1")).as("pb"))
    val scored = bigrams
      .join(bi, Seq("w1", "w2"), "left")
      .join(uniP, Seq("w2"))
      // integer micro-nat surprisals, exactly the [[perplexityScore]]
      // discipline: exact integer sums, half-up integer mean, own-scale
      // identity snap for the reported double
      .withColumn("su", round(-log(
        lit(lambda) * coalesce(col("pb"), lit(0.0)) +
          lit(1.0 - lambda) * col("pu")) * 1e6).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("su").as("surprisal_unat"))
      .withColumn("avg_surprisal_unat",
        expr("(2 * surprisal_unat + n_bigrams) div (2 * n_bigrams)"))
    docs.select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("surprisal_unat"),
        col("avg_surprisal_unat"),
        round(col("avg_surprisal_unat").cast("double") / 1e6, 6)
          .as("avg_surprisal"),
        // exp of the bit-identical snapped double; 6-decimal snap (the
        // residual exp-ulp straddle risk is engine libm divergence on
        // an identical input — never observed, and no exact-rational
        // boundary class remains anywhere in this family)
        round(exp(round(col("avg_surprisal_unat").cast("double") / 1e6, 6)),
          6).as("ppl"))
      .orderBy("doc_id")
  }

  /** Trigram perplexity with stupid backoff (Brants et al. 2007,
    * "Large Language Models in Machine Translation") — the web-scale
    * LM-scoring recipe one step up from [[bigramPerplexity]]: each
    * position scores `−ln S(w3|w1,w2)` where
    * `S = c(w1w2w3)/c(w1w2)` when the trigram survives the count
    * floor, else `α·c(w2w3)/c(w2)` when the bigram survives, else
    * `α²·c(w3)/N` — relative frequencies with a constant backoff
    * penalty, no normalization pass (that absence is the whole point
    * of stupid backoff at corpus scale). The count floors
    * (`minTrigramCount`/`minBigramCount`, CCNet-style) are what bound
    * the model tables on a 100 TB corpus AND what makes backoff real
    * when scoring the training corpus against itself (an unfloored
    * self-scored model never backs off — every observed trigram has
    * count ≥ 1).
    *
    * Scale shape: trigram/bigram streams are built NARROWLY (one array
    * transform per doc); the three model frames are partial-combined
    * aggregations; scoring joins are AQE-planned (floored trigram and
    * bigram tables broadcast while small, shuffle beyond). Surprisals
    * snap to integer micro-nats — exact integer sums, half-up integer
    * mean, own-scale identity snap — the [[perplexityScore]]
    * discipline, so no engine's last ulp can flip a reported digit. */
  def trigramPerplexity(
      docs: DataFrame, alpha: Double = 0.4,
      minTrigramCount: Long = 2L, minBigramCount: Long = 2L): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0, 1), got $alpha")
    val words = docs.select(col("doc_id"), split(lower(col("text")), " ", -1).as("w"))
    val trigrams = words.filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(3, size(w)), " +
          "i -> struct(element_at(w, i - 2) AS w1, element_at(w, i - 1) AS w2, " +
          "element_at(w, i) AS w3))")).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))
      // feeds the trigram model and the scoring join — localCheckpoint
      // per the persistence contract
      .localCheckpoint()
    val bigramPairs = words.filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(2, size(w)), " +
          "i -> struct(element_at(w, i - 1) AS a, element_at(w, i) AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val uni = words.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n")).localCheckpoint()
    val total = uni.agg(sum("n").as("total"))
    // raw adjacent-pair counts: the trigram model's denominator AND the
    // backoff bigram model's numerator
    val c2 = bigramPairs.groupBy("a", "b").agg(count(lit(1)).as("c2"))
      .localCheckpoint()
    val tri = trigrams.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
      .filter(col("c3") >= minTrigramCount)
      .join(c2.select(col("a").as("w1"), col("b").as("w2"), col("c2")),
        Seq("w1", "w2"))
      .select(col("w1"), col("w2"), col("w3"),
        (col("c3").cast("double") / col("c2")).as("p3"))
    val bi = c2.filter(col("c2") >= minBigramCount)
      .join(uni.select(col("t").as("a"), col("n").as("c1")), Seq("a"))
      .select(col("a").as("w2"), col("b").as("w3"),
        (col("c2").cast("double") / col("c1")).as("p2"))
    val uniP = uni.crossJoin(broadcast(total))
      .select(col("t").as("w3"),
        (col("n").cast("double") / col("total")).as("p1"))
    val scored = trigrams
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(bi, Seq("w2", "w3"), "left")
      .join(uniP, Seq("w3"))
      // α·(α·p1), NOT (α²)·p1: both engines must take the identical
      // float path — a pre-multiplied α² literal would round once in
      // Scala and differently in SQL decimal arithmetic
      .withColumn("su", round(-log(
        when(col("p3").isNotNull, col("p3"))
          .when(col("p2").isNotNull, lit(alpha) * col("p2"))
          .otherwise(lit(alpha) * (lit(alpha) * col("p1")))) * 1e6)
        .cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum("su").as("surprisal_unat"))
      .withColumn("avg_surprisal_unat",
        expr("(2 * surprisal_unat + n_trigrams) div (2 * n_trigrams)"))
    docs.select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        col("surprisal_unat"),
        col("avg_surprisal_unat"),
        round(col("avg_surprisal_unat").cast("double") / 1e6, 6)
          .as("avg_surprisal"),
        round(exp(round(col("avg_surprisal_unat").cast("double") / 1e6, 6)),
          6).as("ppl"))
      .orderBy("doc_id")
  }

  /** Bigram perplexity with interpolated Kneser-Ney smoothing (Kneser &
    * Ney 1995; Chen & Goodman 1998, "An Empirical Study of Smoothing
    * Techniques for Language Modeling") — THE standard n-gram
    * smoothing (what KenLM ships) and the principled upgrade over
    * [[bigramPerplexity]]'s Jelinek-Mercer mix: instead of backing off
    * to raw unigram frequency, mass freed by absolute discounting goes
    * to the CONTINUATION distribution — how many distinct histories a
    * word follows — so "francisco" (frequent but only ever after
    * "san") stops stealing probability from genuinely versatile words.
    * Each transition scores
    * `−ln( max(c(w1w2)−D,0)/c(w1·) + (D·N1+(w1·)/c(w1·))·Pcont(w2) )`
    * with `Pcont(w2) = N1+(·w2)/N1+(··)` over bigram TYPES.
    *
    * All model statistics derive from the ONE floored bigram-type
    * table, which keeps the distribution self-consistent
    * (Σ_w2 P(w2|w1) = 1 exactly — asserted in spec) and bounds every
    * model frame at web scale by the same `minBigramCount` CCNet-style
    * floor as the other LMs. Degradations mirror the family's
    * singleton idiom: a floored-out transition keeps its continuation
    * mass (discounted numerator hits the max(·,0) floor), an unseen
    * continuation scores as a type-count-1 continuation, and a history
    * absent from the model backs off to Pcont alone. Surprisals snap
    * to integer micro-nats — exact integer sums, half-up integer mean,
    * own-scale identity snap — the [[perplexityScore]] discipline.
    *
    * Scale shape: one narrow bigram build (array transform, no
    * position self-join), one partial-combined type aggregation that
    * feeds history/continuation/total frames, AQE-planned scoring
    * joins (broadcast while the floored model fits, shuffle beyond);
    * N1+(··) rides a broadcast scalar. */
  def knPerplexity(
      docs: DataFrame, discount: Double = 0.75,
      minBigramCount: Long = 1L): DataFrame = {
    val bigrams = knBigrams(docs, checkpoint = true)
    // the ONE type table every model statistic derives from —
    // localCheckpoint per the persistence contract (feeds the scoring
    // join plus three model aggregations)
    val bi = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= minBigramCount)
      .localCheckpoint()
    knScore(docs, bigrams, bi, discount)
  }

  /** The KN model ARTIFACT: the floored bigram-type table alone —
    * history totals, forward/backward continuation type counts, and
    * the type total all derive from it with bounded model-sized
    * aggregations, so one slim (w1, w2, cb) parquet is the whole
    * persisted language model. */
  def knModel(docs: DataFrame, minBigramCount: Long = 1L): DataFrame =
    knBigrams(docs).groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= minBigramCount)

  /** KN scoring against an EXPLICIT persisted [[knModel]] artifact —
    * the serving mode (the [[perplexityAgainst]] posture): the LM
    * trains once per corpus version; every scoring pass reads the
    * slim type table and re-derives the model statistics from it
    * (model-sized aggregations, never a corpus re-scan). Bit-equal to
    * the self-trained form when scoring the corpus against its own
    * model (same type table → same float path — asserted in spec). A
    * mis-pointed EMPTY artifact fails loudly instead of scoring
    * everything against a zero-type model. */
  def knAgainst(
      docs: DataFrame, model: DataFrame,
      discount: Double = 0.75): DataFrame =
    knScore(docs, knBigrams(docs), model, discount)

  /** TRIGRAM interpolated Kneser-Ney — the full KenLM model SHAPE at
    * trigram order (Chen & Goodman 1998 §4.1.6): the trigram level
    * discounts raw counts and interpolates into a bigram level that
    * uses CONTINUATION counts (how many distinct left contexts a
    * bigram has — N1+(·w2w3)), which itself interpolates into the
    * continuation-unigram distribution; using type counts below the
    * top order is the defining KN move ([[trigramPerplexity]]'s
    * stupid backoff uses raw relative frequencies instead and never
    * normalizes). Per position:
    * `P(w3|w1w2) = max(c3−D,0)/c2(w1w2·) + γ3·Pkn2(w3|w2)`,
    * `Pkn2 = max(N1+(·w2w3)−D,0)/N1+(·w2·) + γ2·Pcont(w3)`,
    * `Pcont(w3) = N1+(·w3)/N1+(··)`, with every statistic derived
    * from the ONE floored trigram-type table (so each level's
    * distribution sums to exactly 1 over its support — the knScore
    * self-consistency at both orders, spec-asserted). Unseen
    * histories cascade down the levels like [[knPerplexity]]'s
    * fallbacks; an unseen continuation degrades at type-count 1.
    * Integer micro-nat discipline; FULL DuckDB oracle through both
    * interpolation levels. Scale shape: one narrow trigram stream,
    * four partial-combined model aggregations off two shared
    * checkpointed frames, AQE-planned scoring joins, the type total
    * a broadcast scalar. */
  def knTrigramPerplexity(
      docs: DataFrame, discount: Double = 0.75,
      minTrigramCount: Long = 1L): DataFrame = {
    val trigrams = knTrigrams(docs, checkpoint = true)
    // the ONE type table; feeds the trigram history stats, the middle
    // continuation table, and the scoring join
    val t3 = trigrams.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
      .filter(col("c3") >= minTrigramCount)
      .localCheckpoint()
    kn3Score(docs, trigrams, t3, discount)
  }

  /** The trigram-KN model ARTIFACT: the floored trigram-type table —
    * like [[knModel]], every statistic at every interpolation level
    * derives from this one slim frame. */
  def kn3Model(docs: DataFrame, minTrigramCount: Long = 1L): DataFrame =
    knTrigrams(docs).groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
      .filter(col("c3") >= minTrigramCount)

  /** Trigram-KN scoring against an explicit [[kn3Model]] type table —
    * the serving/held-out mode: scoring a corpus the model has not
    * seen makes the level-cascade fallbacks LIVE (unseen trigram
    * history → drop to the continuation-bigram level; unseen middle
    * word → drop to the continuation unigram; unseen continuation →
    * type-count-1), all of which the q_kn3_holdout oracle proves
    * branch for branch. */
  def knTrigramAgainst(
      docs: DataFrame, model: DataFrame,
      discount: Double = 0.75): DataFrame =
    kn3Score(docs, knTrigrams(docs), model, discount)

  /** Narrow per-doc trigram build shared by the train and serve
    * paths; `checkpoint` only in train mode (two consumers). */
  private def knTrigrams(
      docs: DataFrame, checkpoint: Boolean = false): DataFrame = {
    val t = docs.select(col("doc_id"), split(lower(col("text")), " ", -1).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(3, size(w)), " +
          "i -> struct(element_at(w, i - 2) AS w1, element_at(w, i - 1) AS w2, " +
          "element_at(w, i) AS w3))")).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))
    if (checkpoint) t.localCheckpoint() else t
  }

  private def kn3Score(
      docs: DataFrame, trigrams: DataFrame, t3: DataFrame,
      discount: Double): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0, 1), got $discount")
    val h3 = t3.groupBy("w1", "w2")
      .agg(sum("c3").as("c2h"), count(lit(1)).as("nfwd3"))
    // N1+(·w2w3): distinct left contexts per bigram — the middle-order
    // "counts"; feeds its own history stats, the unigram continuation
    // table, and the scoring join
    val m2 = t3.groupBy("w2", "w3").agg(count(lit(1)).as("m2c"))
      .localCheckpoint()
    val h2 = m2.groupBy("w2")
      .agg(sum("m2c").as("sumn"), count(lit(1)).as("nfwd2"))
    val c1 = m2.groupBy("w3").agg(count(lit(1)).as("nrev1"))
    val nt1 = m2.agg(count(lit(1)).as("nt1"))
    val pk1 =
      when(col("nt1") > 0,
        coalesce(col("nrev1"), lit(1L)).cast("double") / col("nt1"))
        .otherwise(raise_error(lit("knTrigramPerplexity: model is empty —" +
          " every score would be degenerate")).cast("double"))
    val pk2 =
      when(col("sumn").isNotNull,
        greatest(coalesce(col("m2c"), lit(0L)).cast("double") - lit(discount),
          lit(0.0)) / col("sumn") +
          ((lit(discount) * col("nfwd2")) / col("sumn")) * pk1)
        .otherwise(pk1)
    val p =
      when(col("c2h").isNotNull,
        greatest(coalesce(col("c3"), lit(0L)).cast("double") - lit(discount),
          lit(0.0)) / col("c2h") +
          ((lit(discount) * col("nfwd3")) / col("c2h")) * pk2)
        .otherwise(pk2)
    val scored = trigrams
      .join(t3, Seq("w1", "w2", "w3"), "left")
      .join(h3, Seq("w1", "w2"), "left")
      .join(m2, Seq("w2", "w3"), "left")
      .join(h2, Seq("w2"), "left")
      .join(c1, Seq("w3"), "left")
      .crossJoin(broadcast(nt1))
      .withColumn("su", round(-log(p) * 1e6).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum("su").as("surprisal_unat"))
      .withColumn("avg_surprisal_unat",
        expr("(2 * surprisal_unat + n_trigrams) div (2 * n_trigrams)"))
    docs.select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        col("surprisal_unat"),
        col("avg_surprisal_unat"),
        round(col("avg_surprisal_unat").cast("double") / 1e6, 6)
          .as("avg_surprisal"),
        round(exp(round(col("avg_surprisal_unat").cast("double") / 1e6, 6)),
          6).as("ppl"))
      .orderBy("doc_id")
  }

  /** MODIFIED Kneser-Ney (Chen & Goodman 1998 §3; the estimator KenLM
    * ships): instead of one fixed discount, three per-count-class
    * discounts D1/D2/D3+ estimated from the type-count-of-counts
    * n1..n4 — `Y = n1/(n1+2n2)`, `D1 = 1−2Y·n2/n1`,
    * `D2 = 2−3Y·n3/n2`, `D3+ = 3−4Y·n4/n3` — with the freed mass
    * `γ(w1) = (D1·N1(w1)+D2·N2(w1)+D3+·N3+(w1))/c(w1·)` going to the
    * same continuation distribution as [[knPerplexity]]. The n1..n4
    * statistics are ONE bounded aggregate row collected driver-side
    * and the discounts ride the plan as literals (the classifierApply
    * posture); per-history class counts join from the same floored
    * type table as everything else. KenLM's sanity check applies: if
    * any count class is empty or an estimate leaves [0, k], the three
    * discounts FALL BACK to the fixed 0.75 (deterministic, mirrored
    * in the oracle) rather than producing negative probabilities —
    * tiny or degenerate corpora degrade to plain interpolated KN
    * behavior instead of NaN. FULL DuckDB oracle: the oracle
    * re-derives the same discounts from the same integer counts with
    * the same IEEE +−×/ chain (no libm in the estimator), so the
    * float paths are bit-identical by construction. */
  def mknPerplexity(
      docs: DataFrame, minBigramCount: Long = 1L): DataFrame = {
    val bigrams = knBigrams(docs, checkpoint = true)
    val bi = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= minBigramCount)
      .localCheckpoint()
    mknScore(docs, bigrams, bi)
  }

  /** [[mknPerplexity]] served from the SAME persisted [[knModel]]
    * type-table artifact as plain KN — one artifact, two smoothings
    * (everything either needs derives from the type table). */
  def mknAgainst(docs: DataFrame, model: DataFrame): DataFrame =
    mknScore(docs, knBigrams(docs), model)

  private def mknScore(
      docs: DataFrame, bigrams: DataFrame, bi: DataFrame): DataFrame = {
    // type count-of-counts: one bounded row, driver-collected (the
    // IRLS/PCA bounded-scalar posture)
    val r = bi.agg(
      sum(when(col("cb") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("cb") === 2, 1L).otherwise(0L)).as("n2"),
      sum(when(col("cb") === 3, 1L).otherwise(0L)).as("n3"),
      sum(when(col("cb") === 4, 1L).otherwise(0L)).as("n4")).head()
    val (n1, n2, n3, n4) =
      if (r.isNullAt(0)) (0L, 0L, 0L, 0L)
      else (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // the exact double chain the oracle mirrors: integer operands,
    // +−×/ only — bit-identical across engines
    val (d1, d2, d3) =
      if (n1 == 0 || n2 == 0 || n3 == 0 || n4 == 0) (0.75, 0.75, 0.75)
      else {
        val y = n1.toDouble / (n1 + 2 * n2)
        val e1 = 1.0 - 2.0 * y * (n2.toDouble / n1)
        val e2 = 2.0 - 3.0 * y * (n3.toDouble / n2)
        val e3 = 3.0 - 4.0 * y * (n4.toDouble / n3)
        if (e1 < 0 || e1 > 1 || e2 < 0 || e2 > 2 || e3 < 0 || e3 > 3)
          (0.75, 0.75, 0.75)
        else (e1, e2, e3)
      }
    val hist = bi.groupBy("w1").agg(
      sum("cb").as("c1"),
      sum(when(col("cb") === 1, 1L).otherwise(0L)).as("h1"),
      sum(when(col("cb") === 2, 1L).otherwise(0L)).as("h2"),
      sum(when(col("cb") >= 3, 1L).otherwise(0L)).as("h3"))
    val cont = bi.groupBy("w2").agg(count(lit(1)).as("nrev"))
    val ntypes = bi.agg(count(lit(1)).as("ntypes"))
    val scored = bigrams
      .join(bi, Seq("w1", "w2"), "left")
      .join(hist, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(ntypes))
      .withColumn("pc",
        when(col("ntypes") > 0,
          coalesce(col("nrev"), lit(1L)).cast("double") / col("ntypes"))
          .otherwise(raise_error(lit("mknScore: model is empty — every" +
            " score would be degenerate; check the LM artifact path"))
            .cast("double")))
      .withColumn("dcb", coalesce(
        when(col("cb") === 1, lit(d1))
          .when(col("cb") === 2, lit(d2))
          .when(col("cb") >= 3, lit(d3)), lit(0.0)))
      .withColumn("su", round(-log(
        when(col("c1").isNotNull,
          greatest(coalesce(col("cb"), lit(0L)).cast("double") - col("dcb"),
            lit(0.0)) / col("c1") +
            ((lit(d1) * col("h1") + lit(d2) * col("h2") +
              lit(d3) * col("h3")) / col("c1")) * col("pc"))
          .otherwise(col("pc"))) * 1e6).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("su").as("surprisal_unat"))
      .withColumn("avg_surprisal_unat",
        expr("(2 * surprisal_unat + n_bigrams) div (2 * n_bigrams)"))
    docs.select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("surprisal_unat"),
        col("avg_surprisal_unat"),
        round(col("avg_surprisal_unat").cast("double") / 1e6, 6)
          .as("avg_surprisal"),
        round(exp(round(col("avg_surprisal_unat").cast("double") / 1e6, 6)),
          6).as("ppl"))
      .orderBy("doc_id")
  }

  /** Incremental MAINTENANCE of the [[knModel]] artifact — the
    * rollupIncremental contract on the bigram-type table: daily ingest
    * touches a sliver of a 100 TB corpus, so the LM refresh must cost
    * the sliver, not a full re-count. Type counts are additive
    * integers, so the update is exact: removed/changed docs contribute
    * NEGATED bigram counts (tokenized from the old snapshot,
    * delta-sized), added/changed docs contribute fresh counts, one
    * signed merge, types whose count reaches zero drop. The prior
    * model must be UNFLOORED (minBigramCount = 1, the default) — a
    * floored artifact has already forgotten the base counts an exact
    * update needs; apply a serving-time floor with `model.filter` if
    * bounding is required. Proven THROUGH serving: the driver entry
    * scores the corpus against the maintained artifact and
    * hash-matches the SAME full oracle as q_perplexity_kn, so the
    * hash gate IS the incremental == full-retrain proof. */
  def knModelIncremental(
      priorModel: DataFrame, oldDocs: DataFrame,
      newDocs: DataFrame): DataFrame = {
    val diff = Etl.snapshotDiff(oldDocs, newDocs)
      .filter(col("status") =!= "unchanged").localCheckpoint()
    val addedIds = diff.filter(col("status").isin("added", "changed"))
      .select("doc_id")
    val goneIds = diff.filter(col("status").isin("removed", "changed"))
      .select("doc_id")
    val added = knBigrams(newDocs.join(addedIds, Seq("doc_id"), "left_semi"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("dcb"))
    val removed = knBigrams(oldDocs.join(goneIds, Seq("doc_id"), "left_semi"))
      .groupBy("w1", "w2").agg((-count(lit(1))).as("dcb"))
    priorModel.select(col("w1"), col("w2"), col("cb").as("dcb"))
      .unionByName(added).unionByName(removed)
      .groupBy("w1", "w2").agg(sum("dcb").as("cb"))
      .filter(col("cb") > 0)
  }

  /** Narrow per-doc adjacent-pair build shared by the KN train and
    * serve paths (one array transform — no position self-join).
    * `checkpoint` only when MULTIPLE consumers branch from the frame
    * (train mode: model + scoring) — the serving paths consume it
    * exactly once, and materializing a corpus-sized stream for one
    * consumer is pure wasted IO at 100 TB. */
  private def knBigrams(
      docs: DataFrame, checkpoint: Boolean = false): DataFrame = {
    val b = docs.select(col("doc_id"), split(lower(col("text")), " ", -1).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(2, size(w)), " +
          "i -> struct(element_at(w, i - 1) AS w1, element_at(w, i) AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    if (checkpoint) b.localCheckpoint() else b
  }

  private def knScore(
      docs: DataFrame, bigrams: DataFrame, bi: DataFrame,
      discount: Double): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0, 1), got $discount")
    val hist = bi.groupBy("w1")
      .agg(sum("cb").as("c1"), count(lit(1)).as("nfwd"))
    val cont = bi.groupBy("w2").agg(count(lit(1)).as("nrev"))
    val ntypes = bi.agg(count(lit(1)).as("ntypes"))
    val scored = bigrams
      .join(bi, Seq("w1", "w2"), "left")
      .join(hist, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(ntypes))
      // float path mirrored operation-for-operation in the oracle SQL
      // (explicit DOUBLE casts there — DuckDB numeric literals are
      // DECIMAL, the trigram lesson). The ntypes guard only evaluates
      // when a scored bigram meets an empty model: scoring zero docs
      // (or a transition-free corpus) stays legal.
      .withColumn("pc",
        when(col("ntypes") > 0,
          coalesce(col("nrev"), lit(1L)).cast("double") / col("ntypes"))
          .otherwise(raise_error(lit("knScore: model is empty — every" +
            " score would be degenerate; check the LM artifact path"))
            .cast("double")))
      .withColumn("su", round(-log(
        when(col("c1").isNotNull,
          greatest(coalesce(col("cb"), lit(0L)).cast("double") - lit(discount),
            lit(0.0)) / col("c1") +
            ((lit(discount) * col("nfwd")) / col("c1")) * col("pc"))
          .otherwise(col("pc"))) * 1e6).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("su").as("surprisal_unat"))
      .withColumn("avg_surprisal_unat",
        expr("(2 * surprisal_unat + n_bigrams) div (2 * n_bigrams)"))
    docs.select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("surprisal_unat"),
        col("avg_surprisal_unat"),
        round(col("avg_surprisal_unat").cast("double") / 1e6, 6)
          .as("avg_surprisal"),
        round(exp(round(col("avg_surprisal_unat").cast("double") / 1e6, 6)),
          6).as("ppl"))
      .orderBy("doc_id")
  }

  /** Hashed-linear classifier inference (the fasttext-style quality
    * classifier step of a training-data pipeline): per-token integer
    * weights in [-500, 500] derived from an md5 prefix — the honest
    * stand-in for trained weights, since no model artifacts exist in
    * this environment — summed per doc and squashed through a sigmoid.
    * The INFERENCE PLUMBING is the real part: hashed features need no
    * vocab broadcast at all, the per-doc sum is an exact integer (order
    * independent, engine identical), and `keep` compares the raw
    * integer margin so no float boundary can flip it. One
    * partial-combined shuffle on doc_id. */
  def classifierScore(docs: DataFrame, seed: String = "qc-v1"): DataFrame =
    docs.select(col("doc_id"),
        explode(split(lower(col("text")), " ", -1)).as("t"))
      .withColumn("wgt",
        graft.functions.DeterministicHash.md5Prefix(seed, col("t")) % 1001 - 500)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("wgt").as("margin"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("margin"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(col("margin").cast("double") / (col("n_tokens") * 1000.0)))), 6)
          .as("score"),
        (col("margin") > 0).as("keep"))
      .orderBy("doc_id")

  /** Repetition-based quality filter (the Gopher/MassiveText
    * repeated-n-gram rule): fraction of a document's word n-grams taken
    * by its single most frequent n-gram — boilerplate and
    * degenerate-loop text score high. Relational shape: explode n-gram
    * hashes → per-(doc, gram) count → per-doc total/max; one shuffle
    * keyed on (doc, gram), partial-combined map-side, then a per-doc
    * aggregation reusing the doc_id-prefixed partitioning. The flag
    * compare is on an exact rational (count/count in double), so it is
    * engine-identical. */
  def repetitionScore(
      docs: DataFrame, n: Int = 2, maxTopFraction: Double = 0.1): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    val g = docs.withColumn("w", split(lower(col("text")), " ", -1))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(expr(s"graft_grams(w, $n, false)")).as("gh"))
    g.groupBy("doc_id", "gh").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_ngrams"), max("c").as("top_count"))
      .select(
        col("doc_id"),
        col("n_ngrams"),
        col("top_count"),
        round(col("top_count").cast("double") / col("n_ngrams"), 6).as("top_fraction"),
        // a doc whose grams are all unique is not repetitive, however
        // short — require an actually-repeated gram above the fraction
        (col("top_count") > 1 &&
          col("top_count").cast("double") / col("n_ngrams") > maxTopFraction).as("flagged"))
      .orderBy("doc_id")
  }

  /** Per-document top-k TF-IDF terms (keyword extraction for corpus
    * triage / topic tagging). Three partial-combined aggregations: term
    * frequency keyed (doc, term), document frequency keyed term, and
    * the scalar corpus size broadcast in. The idf ln() is snapped to 6
    * decimals (same move as [[perplexityScore]]) so the engine-specific
    * last ulp cannot reorder the top-k; ties break on the term string,
    * so ranks are total and deterministic.
    *
    * Scale posture: no vocabulary broadcast — the df side joins tf on
    * the term key under AQE (broadcast while it fits, shuffle beyond);
    * the per-doc top-k is a bounded window rank, not a collect. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // tf is localCheckpoint'd because two consumers branch from it
    // (document frequency and the scoring join) and Spark re-executes
    // a subplan per consumer — without it the corpus is tokenized and
    // tf-aggregated twice. df must NOT be a count().over(partitionBy
    // term) window: a stopword's partition holds ~|docs| rows on one
    // task with no map-side combine (the boilerplate hot-spot), where
    // the groupBy partial-aggregates before the exchange. The
    // materialized frame is tf itself — the shuffle already produced
    // exactly these rows, so the checkpoint adds storage, not compute.
    val tf = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ", -1)).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * round(log(col("n_docs").cast("double") / col("df")), 6), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("tfidf"))
      .orderBy("doc_id", "rank")
  }

  /** Exact top-k terms by TOTAL occurrence via a bounded-memory
    * two-pass: Misra-Gries candidate generation (native
    * `graft_heavyhits` TypedImperativeAggregate — fixed `capacity`
    * counters per buffer, NO key-space shuffle in pass 1), then an
    * exact recount restricted to the candidates by broadcast semi-join.
    *
    * This is the 100 TB form of frequency top-k when the key
    * cardinality is itself unbounded (URLs, n-grams): a plain
    * groupBy(term) shuffles the whole key space; pass 1 here moves only
    * `capacity`-sized summaries. The result is exact and deterministic
    * whenever the k-th true count exceeds N/(capacity+1) — the MG
    * guarantee that every such key survives candidate generation
    * regardless of the aggregation tree; size capacity accordingly
    * (counts are Zipfian in practice, so modest capacities cover large
    * k). The recount makes the output independent of which
    * below-threshold keys happened to survive. */
  def heavyHitterTerms(docs: DataFrame, k: Int = 10, capacity: Int = 256): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    val toks = docs.select(explode(split(lower(col("text")), " ", -1)).as("term"))
    val cands = toks.agg(expr(s"graft_heavyhits(term, $capacity)").as("cand"))
      .select(explode(col("cand")).as("term"))
    toks.join(broadcast(cands), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("term"))
      .limit(k)
  }

  /** Corpus-wide top-k terms by document frequency (vocabulary triage /
    * stopword discovery). Distinct-within-doc is a narrow map before the
    * single term-keyed shuffle; the top-k is a TakeOrdered, never a full
    * sort. */
  def topTerms(docs: DataFrame, k: Int = 20): DataFrame =
    docs
      .select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), " ", -1))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("term"))
      .limit(k)

  /** Per-source vocabulary profile (the Heaps-law / lexical-diversity
    * triage view): token occurrences, distinct terms, and the
    * type-token ratio per source — low TTR flags templated or
    * machine-generated sources before they dilute a mix. One
    * source-keyed aggregate with a partial-combined distinct. */
  /** The C4 line-level cleaning rules (Raffel et al. 2020,
    * arXiv:1910.10683 §2.2 — public): keep only lines ending in
    * terminal punctuation with at least `minLineWords` words and no
    * "javascript"; drop whole pages containing "lorem ipsum" or a
    * curly brace, or with fewer than `minKeptLines` surviving lines.
    * Returns the REWRITTEN text (surviving lines re-joined in original
    * order) alongside the per-rule signals — a transform, not just a
    * flag. The synthetic test corpus has no line structure or
    * punctuation, so the driver entry's rows are uniformly
    * keep = false with empty clean_text; the rules are exercised on
    * realistic multi-line docs in spec.
    *
    * Scale shape: line signals are a narrow posexplode projection; the
    * per-doc reassembly is one partial-combined aggregation whose
    * collect_list is bounded by a document's own line count (the same
    * per-doc bound every per-doc text op here carries); doc-level
    * phrase flags join back on the uniform doc_id key. No windows. */
  def c4Rules(
      docs: DataFrame, minLineWords: Int = 3,
      minKeptLines: Int = 5): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n", -1)).as(Seq("pos", "line")))
    val keptLine = trim(col("line")).rlike("[.!?\"]$") &&
      size(split(col("line"), " ", -1)) >= minLineWords &&
      !lower(col("line")).contains("javascript")
    val perDoc = lines.groupBy("doc_id").agg(
      count(lit(1)).as("n_lines"),
      sum(when(keptLine, 1L).otherwise(0L)).as("n_kept_lines"),
      // surviving lines re-joined in original order: collect_list drops
      // the null non-kept entries, array_sort orders by pos (the
      // struct's first field)
      concat_ws("\n", transform(
        array_sort(collect_list(when(keptLine, struct(col("pos"), col("line"))))),
        s => s.getField("line"))).as("clean_text"))
    docs.select(col("doc_id"),
        lower(col("text")).contains("lorem ipsum").as("has_lorem"),
        col("text").contains("{").as("has_brace"))
      .join(perDoc, Seq("doc_id"))
      .select(col("doc_id"), col("n_lines"), col("n_kept_lines"),
        col("clean_text"), col("has_lorem"), col("has_brace"),
        (col("n_kept_lines") >= minKeptLines &&
          !col("has_lorem") && !col("has_brace")).as("keep"))
      .orderBy("doc_id")
  }

  /** Reference unigram distribution: the (term, count) table
    * [[divergenceAgainst]] and the streaming drift monitor score
    * batches against. Persist it once per corpus version (the drift
    * monitor's seed artifact). One partial-combined aggregation. */
  def termCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(col("text")), " ", -1)).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))

  /** Per-source Jensen-Shannon divergence against an EXPLICIT
    * reference distribution (a [[termCounts]] frame) — the batch
    * primitive behind the streaming drift monitor: score arriving
    * docs against a persisted known-good corpus distribution and flag
    * sources whose language shifted (scraper broke, spam flood,
    * template change). Unlike [[sourceDivergence]] (each source vs
    * the rest of the SAME frame), the reference here is independent —
    * batch terms absent from it carry the q = 0 integrand (ln 2)/2·p,
    * and an empty reference yields exactly ln 2 for every source.
    *
    * Same scale shape and exactness discipline as [[sourceDivergence]]:
    * one corpus-sized (source, term) aggregation, term-keyed reference
    * join (AQE-planned), broadcast totals, absent-reference-term mass
    * in closed form over exact integers, contributions snapped to
    * integer micro-nats. */
  def divergenceAgainst(
      docs: DataFrame, ref: DataFrame,
      threshold: Double = 0.1): DataFrame = {
    val st = docs
      .select(col("source"), explode(split(lower(col("text")), " ", -1)).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("cst"))
      .localCheckpoint()
    val srcTot = st.groupBy("source").agg(sum("cst").as("ts"))
    val refTot = ref.agg(sum("cnt").as("rt"))
    val p = col("cst").cast("double") / col("ts").cast("double")
    val q = when(col("cnt").isNotNull,
      col("cnt").cast("double") / col("rt").cast("double")).otherwise(lit(0.0))
    val contrib = lit(0.5) * (
      p * log(lit(2.0) * p / (p + q)) +
        when(col("cnt").isNotNull, q * log(lit(2.0) * q / (p + q)))
          .otherwise(lit(0.0)))
    st.join(ref.select(col("t"), col("cnt")), Seq("t"), "left")
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(refTot))
      .select(col("source"), col("ts"), col("rt"),
        round(contrib * 1e6).cast("long").as("c_micro"),
        coalesce(col("cnt"), lit(0L)).as("ref_n"))
      .groupBy("source", "ts", "rt")
      .agg(count(lit(1)).as("n_terms"),
        sum("c_micro").as("a_micro"), sum("ref_n").as("s1"))
      .select(col("source"), col("ts").as("n_tokens"), col("n_terms"),
        round(
          col("a_micro").cast("double") / 1e6 +
            lit(0.5 * math.log(2.0)) *
              (lit(1.0) - when(col("rt") > 0,
                col("s1").cast("double") / col("rt").cast("double"))
                .otherwise(lit(0.0))), 6)
          .as("js_divergence"))
      .withColumn("drifted", col("js_divergence") > threshold)
      .orderBy("source")
  }

  /** Per-source distribution drift: the Jensen-Shannon divergence (in
    * nats) between each source's unigram distribution and the REST of
    * the corpus — the monitoring view that catches a templated,
    * machine-generated, or off-domain source before it dilutes a mix
    * (0 = indistinguishable, ln 2 ≈ 0.693 = disjoint vocabularies).
    *
    * Scale shape: one corpus-sized partial-combined shuffle builds the
    * (source, term) counts; term totals re-aggregate that frame
    * (vocab-sized); the scoring join is term-keyed and AQE-planned,
    * with the |sources|-row totals riding broadcasts. The sum over
    * terms ABSENT from a source never materializes: for p = 0 the
    * JS integrand collapses to (ln 2)/2 · q, so the absent-term mass
    * is the closed form (ln 2)/2 · (1 − Σ_{t∈s} q_t) computed from
    * exact integer counts — only terms PRESENT in each source are
    * rowed. Per-term contributions snap to integer micro-nats so the
    * per-source sum is exact (the [[classifierScore]] margin idiom).
    *
    * Requires at least two sources; a source holding the entire corpus
    * has no rest-of-corpus distribution and returns a null
    * js_divergence rather than dividing by zero. */
  def sourceDivergence(docs: DataFrame): DataFrame = {
    // the one corpus-sized aggregation; feeds source totals, term
    // totals, and the scoring join — localCheckpoint per the
    // persistence contract
    val st = docs
      .select(col("source"), explode(split(lower(col("text")), " ", -1)).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("cst"))
      .localCheckpoint()
    val srcTot = st.groupBy("source").agg(sum("cst").as("ts"))
    val termTot = st.groupBy("t").agg(sum("cst").as("ct"))
    val tot = srcTot.agg(sum("ts").as("tt"))
    val p = col("cst").cast("double") / col("ts").cast("double")
    val q = (col("ct") - col("cst")).cast("double") /
      (col("tt") - col("ts")).cast("double")
    // 2m = p + q; a term exclusive to the source has q = 0 and only
    // the p-branch; p > 0 always (the row exists because cst > 0)
    val contrib = lit(0.5) * (
      p * log(lit(2.0) * p / (p + q)) +
        when(col("ct") > col("cst"), q * log(lit(2.0) * q / (p + q)))
          .otherwise(lit(0.0)))
    st.join(termTot, Seq("t"))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("ts"), col("tt"),
        when(col("tt") > col("ts"), round(contrib * 1e6))
          .otherwise(lit(null)).cast("long").as("c_micro"),
        (col("ct") - col("cst")).as("rest_n"))
      .groupBy("source", "ts", "tt")
      .agg(count(lit(1)).as("n_terms"),
        sum("c_micro").as("a_micro"), sum("rest_n").as("s1"))
      .select(col("source"), col("ts").as("n_tokens"), col("n_terms"),
        round(
          col("a_micro").cast("double") / 1e6 +
            lit(0.5 * math.log(2.0)) *
              (lit(1.0) - col("s1").cast("double") /
                (col("tt") - col("ts")).cast("double")), 6)
          .as("js_divergence"))
      .orderBy("source")
  }

  def vocabStats(docs: DataFrame): DataFrame =
    docs.select(col("source"), explode(split(lower(col("text")), " ", -1)).as("term"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct("term").as("n_terms"),
        round(countDistinct("term").cast("double") / count(lit(1)), 6)
          .as("type_token_ratio"))
      .orderBy("source")

  /** Per-source corpus profile (the triage report a mixing run starts
    * from): document counts, exact token totals, token-count extremes
    * and percentiles, engine-stable mean char length. One
    * partial-combined shuffle keyed by source; the token count is the
    * same codegen'd pre-tokenizer split as [[tokenCount]], computed as
    * a narrow map before the aggregation. Percentiles are exact
    * (sort-based `percentile`) — at 100 TB swap to approx_percentile
    * per the [[graft.operators.Catalog.statsApprox]] pattern if the
    * per-source row sets outgrow a partition. */
  def corpusStats(docs: DataFrame): DataFrame = {
    val t = docs.select(col("source"), col("n_chars"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|\\S"), lit(0))).as("n_tokens"))
    t.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        min("n_tokens").as("min_tokens"),
        max("n_tokens").as("max_tokens"),
        round(percentile(col("n_tokens"), lit(0.5)), 2).as("p50_tokens"),
        round(percentile(col("n_tokens"), lit(0.9)), 2).as("p90_tokens"),
        graft.functions.StableStats.stableAvg(col("n_chars"), 0, 2).as("avg_chars"))
      .orderBy("source")
  }

  /** Winnowing fingerprint: per-window minimum of word 5-gram hashes
    * (window 4), deduplicated — the standard near-copy sketch. The
    * window minima run through the native codegen `graft_winnow`
    * (O(n) monotonic deque) instead of an interpreted O(n·window)
    * transform/array_min/slice lambda; bit-equality asserted in
    * VectorExpressionsSpec. */
  def docFingerprint(docs: DataFrame, gramLen: Int = 5, window: Int = 4): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    docs.withColumn("toks", split(lower(col("text")), " ", -1))
      .filter(size(col("toks")) >= gramLen + window - 1)
      .withColumn("hs", expr(s"graft_grams(toks, $gramLen, false)"))
      .withColumn("fps", expr(s"array_distinct(graft_winnow(hs, $window))"))
      .select(col("doc_id"), size(col("fps")).as("n_fingerprints"),
        expr("xxhash64(fps)").as("fp_hash"))
      .orderBy("doc_id")
  }

  /** The Gopher document-quality rules (Rae et al. 2021,
    * arXiv:2112.11446 §A1.1.1 — public): word-count bounds, mean word
    * length bounds, symbol-to-word ratio ('#' and '…' as '...'),
    * minimum fraction of words containing a letter, and the
    * ≥ `minStopHits`-distinct-stopwords requirement. Defaults are the
    * paper's canonical thresholds; every one is a parameter because
    * real curation runs tune them per corpus.
    *
    * Shape: one (doc, token) aggregation feeds every per-word
    * statistic — the (doc_id, tok) pre-aggregation collapses repeated
    * tokens map-side AND makes the stopword hit count distinct by
    * construction (no countDistinct Expand); the symbol counts are a
    * narrow projection on the doc row joined back on the unique
    * doc_id. Raw (unrounded) ratios drive `keep` in BOTH engines —
    * integer-ratio doubles are deterministic — while the reported
    * columns are display-rounded. */
  def gopherRules(
      docs: DataFrame,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minAlphaFrac: Double = 0.8,
      stopWords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minStopHits: Int = 2): DataFrame = {
    val perTok = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ", -1)).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
    val agg = perTok.groupBy("doc_id").agg(
      sum("n").as("n_words"),
      sum(when(col("tok").rlike("[a-z]"), col("n")).otherwise(lit(0L))).as("n_alpha"),
      sum(col("n") * length(col("tok"))).as("len_sum"),
      count(when(col("tok").isInCollection(stopWords), lit(1))).as("n_stop_hits"))
    val sym = docs.select(col("doc_id"),
      (length(col("text")) - length(translate(col("text"), "#", ""))).as("n_hash"),
      ((length(col("text")) - length(expr("replace(text, '...', '')"))) / 3)
        .cast("long").as("n_ellipsis"))
    val meanLen = col("len_sum").cast("double") / col("n_words")
    val symbolRatio = (col("n_hash") + col("n_ellipsis")).cast("double") / col("n_words")
    val alphaFrac = col("n_alpha").cast("double") / col("n_words")
    agg.join(sym, "doc_id")
      .select(
        col("doc_id"),
        col("n_words"),
        round(meanLen, 4).as("mean_word_len"),
        round(symbolRatio, 6).as("symbol_ratio"),
        round(alphaFrac, 6).as("alpha_frac"),
        col("n_stop_hits"),
        (col("n_words").between(minWords, maxWords) &&
          meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen &&
          symbolRatio <= maxSymbolRatio &&
          alphaFrac >= minAlphaFrac &&
          col("n_stop_hits") >= minStopHits).as("keep"))
      .orderBy("doc_id")
  }

  /** CCNet-style perplexity partition (Wenzek et al. 2020,
    * arXiv:1911.00359 §4.3 — public): within each language, rank
    * documents by the unigram LM score ([[perplexityScore]]'s mean
    * surprisal) and split into head / middle / tail thirds — the
    * standard curation partition where "head" is the most
    * corpus-typical slice and "tail" the filter candidate.
    *
    * Scale shape: NO window over the documents. The per-language
    * cut points come from a score HISTOGRAM on the INTEGER micro-nat
    * mean ([[perplexityScore]]'s avg_surprisal_unat), so
    * `groupBy(lang, avg_surprisal_unat)` is partial-combined and its
    * output is bounded by |langs| × value-space (a constant in the
    * corpus size — ~10⁶ per unit of surprisal range), never by |docs|.
    * The cumulative count is a TWO-LEVEL prefix sum (the packSequences
    * pattern): within-block running sums over `blk = score div 2^16`
    * partitions (≤ 2^16 distinct scores per partition, a constant) plus
    * cross-block offsets windowed over the tiny per-(lang, blk)
    * subtotal frame (≤ value-space / 2^16 ≈ 300 rows per language) —
    * the micro-nat key space is ~100× the old 4-decimal space, and a
    * flat per-language window would serialize the whole histogram into
    * one task as it approaches the cap. The integers are identical to
    * a flat window's, so the ORACLE keeps the simple one-window form.
    * Documents get their bucket back through a hash join on
    * (lang, integer score) — a tie group lands in one bucket as a unit
    * (the only deterministic choice; fractional-rank tie-splitting
    * would order arbitrary doc_ids). Bucket rule is exact integer math
    * (3·cum_le vs n_lang) on an exact integer key, so no float
    * boundary exists anywhere in the partition. */
  def ccnetBuckets(docs: DataFrame): DataFrame = {
    // scored feeds the histogram AND the final bucket attachment —
    // without the checkpoint the whole perplexity subplan (two corpus
    // passes + the model join) re-executes per consumer
    val scored = perplexityScore(docs)
      .select("doc_id", "avg_surprisal_unat", "avg_surprisal")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .localCheckpoint()
    // bounded histogram: feeds the within-block window, the block
    // subtotals, AND the per-lang totals — localCheckpoint per the
    // persistence contract
    val hist = scored.groupBy("lang", "avg_surprisal_unat")
      .agg(count(lit(1)).as("nv"))
      .withColumn("blk", expr("avg_surprisal_unat div 65536"))
      .localCheckpoint()
    val wIn = Window.partitionBy("lang", "blk").orderBy("avg_surprisal_unat")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.partitionBy("lang").orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.groupBy("lang", "blk").agg(sum("nv").as("bn"))
      .withColumn("off", coalesce(sum("bn").over(wOff), lit(0L)))
      .select("lang", "blk", "off")
    val cum = hist.withColumn("cum_in", sum("nv").over(wIn))
      .join(broadcast(offsets), Seq("lang", "blk"))
      .withColumn("cum_le", col("cum_in") + col("off"))
    val totals = hist.groupBy("lang").agg(sum("nv").as("n_lang"))
    val buckets = cum.join(totals, "lang")
      .select(col("lang"), col("avg_surprisal_unat"),
        when(col("cum_le") * 3 <= col("n_lang"), lit("head"))
          .when(col("cum_le") * 3 <= col("n_lang") * 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
    scored.join(buckets, Seq("lang", "avg_surprisal_unat"))
      .select("doc_id", "lang", "avg_surprisal", "bucket")
      .orderBy("doc_id")
  }

  /** PMI collocation mining (Church & Hanks 1990 — public): corpus
    * bigrams occurring at least `minCount` times, scored by pointwise
    * mutual information `ln(P(xy) / (P(x)·P(y)))` with P(xy) over the
    * bigram total and P(x) over the token total — the collocation
    * ranking a tokenizer/vocabulary audit runs to find multi-word
    * units ("new york") worth atomizing.
    *
    * Scale shape: bigrams build NARROWLY (one array transform per doc,
    * no position self-join) into a partial-combined (w1, w2) count;
    * the `minCount` floor bounds the surviving bigram table at web
    * scale (the CCNet-floor move). Unigram attachment is two
    * AQE-planned joins on the floored table — no broadcast hint, no
    * window. Totals ride one narrow per-doc aggregate (token count and
    * bigram count derive from the same array sizes). The top-k is a
    * TakeOrdered over (pmi desc, w1, w2), never a full sort; the PMI
    * expression keeps one association order on both engines so the
    * rounded double is bit-identical. */
  def collocations(
      docs: DataFrame, minCount: Long = 5L, k: Int = 50): DataFrame = {
    val words = docs.select(split(lower(col("text")), " ", -1).as("w"))
    val totals = words.agg(
      sum(size(col("w"))).as("nt"),
      sum(greatest(size(col("w")) - 1, lit(0))).as("nb"))
    val uni = words.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
      // feeds both unigram attachment joins — persistence contract
      .localCheckpoint()
    val bg = words.filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(2, size(w)), " +
          "i -> struct(element_at(w, i - 1) AS w1, element_at(w, i) AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    bg.join(uni.select(col("t").as("w1"), col("n").as("n_x")), "w1")
      .join(uni.select(col("t").as("w2"), col("n").as("n_y")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("n_xy"), col("n_x"), col("n_y"),
        round(log(
          (col("n_xy").cast("double") * col("nt") * col("nt")) /
            (col("nb").cast("double") * col("n_x") * col("n_y"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
