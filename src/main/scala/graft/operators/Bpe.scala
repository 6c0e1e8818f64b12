package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application, relationally
  * (Sennrich et al. 2016, the standard subword-vocabulary algorithm of
  * LLM training pipelines).
  *
  * The key scale property of BPE training is that it never iterates
  * over the corpus: merges are learned from the WORD-COUNT table. One
  * corpus-sized aggregation produces (word, count); every Lloyd-like
  * refinement pass after that runs on the bounded vocabulary frame
  * (`vocabSize` rows — the [[Similarity]] train/add split, applied to
  * text). Each merge step is one partial-combined pair aggregation +
  * one narrow fold that rewrites the symbol arrays; the chosen pair
  * rides a broadcast, so nothing in the loop shuffles more than the
  * vocabulary. Applying the tokenizer is a JOIN against the trained
  * segmentation table — the corpus is touched exactly twice end to end
  * (once to count words, once to tokenize).
  */
object Bpe {

  /** Train BPE merges: returns (merges, segments).
    *
    * `merges`: one row per learned merge — rank (1-based), left/right
    * symbol, merged symbol, weighted pair count at selection time.
    * `segments`: the final segmentation of every vocabulary word —
    * word, its subword symbol array, corpus count. Deterministic: the
    * argmax pair breaks ties by (count DESC, left ASC, right ASC), and
    * the vocabulary cut is (count DESC, word ASC), so any engine/run
    * reproduces the identical merge sequence.
    *
    * The merge loop is a bounded MODEL-training loop on the driver (the
    * [[Similarity]] ivfModel lloydIters precedent): `nMerges`
    * iterations, each building a plan over the localCheckpoint'd
    * vocabulary frame; the only driver-side data access is the 1-row
    * emptiness probe that ends the loop early when no adjacent pair is
    * left to merge. Per-merge plan-build latency (~0.1 s) — not data
    * volume — bounds practical `nMerges` to the low thousands; a
    * production 32k-merge vocabulary would train this same loop on a
    * word-count table from a corpus SAMPLE (the standard practice), so
    * the corpus-scale path is tokenization, which is one join. */
  def bpeTrain(
      docs: DataFrame, nMerges: Int = 50,
      vocabSize: Int = 5000): (DataFrame, DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val spark = docs.sparkSession
    // the ONE corpus pass: word counts, cut to the top-vocabSize model
    // frame (deterministic order; limit after the sort is the bounded
    // TakeOrdered pattern). Symbols start as single characters.
    var words = docs
      .select(explode(split(lower(col("text")), " ", -1)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(vocabSize)
      .withColumn("syms",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .localCheckpoint()

    // greedy left-to-right non-overlapping merge of (a, b) in a symbol
    // array: a fold carrying (emitted, pending) — "aaa" + (a,a) → [aa, a]
    val mergeFold =
      "aggregate(syms, named_struct('out', cast(array() as array<string>), " +
        "'pend', cast(null as string)), " +
        "(acc, s) -> IF(acc.pend IS NULL, named_struct('out', acc.out, 'pend', s), " +
        "IF(acc.pend = a AND s = b, " +
        "named_struct('out', array_append(acc.out, concat(a, b)), " +
        "'pend', cast(null as string)), " +
        "named_struct('out', array_append(acc.out, acc.pend), 'pend', s))), " +
        "acc -> IF(acc.pend IS NULL, acc.out, array_append(acc.out, acc.pend)))"

    var merges = Seq.empty[DataFrame]
    var exhausted = false
    for (m <- 1 to nMerges if !exhausted) {
      // weighted adjacent-pair counts over the vocabulary frame
      // (partial-combined: a pair hot across many words collapses
      // map-side), then the deterministic argmax pair
      val top = words
        // sequence(1, 0) DESCENDS in Spark — fully-merged single-symbol
        // words must skip the pair stage, not index element 0
        .filter(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> named_struct('a', element_at(syms, i), 'b', element_at(syms, i + 1)))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .localCheckpoint()
      if (top.head(1).isEmpty) exhausted = true // every word is one symbol
      else {
        merges :+= top.select(lit(m).as("rank"), col("a").as("left"),
          col("b").as("right"), concat(col("a"), col("b")).as("merged"), col("cnt"))
        // rewrite every word's symbols with the chosen pair merged; the
        // 1-row winner rides a broadcast, the fold is narrow, and the
        // checkpoint severs the per-iteration lineage
        words = words.crossJoin(broadcast(top))
          .withColumn("syms", expr(mergeFold))
          .select("word", "n", "syms")
          .localCheckpoint()
      }
    }
    val mergesDf =
      if (merges.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "rank INT, left STRING, right STRING, merged STRING, cnt BIGINT"))
      else merges.reduce(_ unionAll _)
    (mergesDf.orderBy("rank"), words.orderBy("word"))
  }

  /** The driver-visible training report: the learned merge table. */
  def bpeMerges(docs: DataFrame, nMerges: Int = 50, vocabSize: Int = 5000): DataFrame =
    bpeTrain(docs, nMerges, vocabSize)._1

  /** The slim serving artifact of a trained segmentation: word →
    * subword count. This — not the symbol arrays — is what a serving
    * path persists and broadcasts: vocabSize rows, two narrow columns,
    * the tokenizer file of a production pipeline. */
  def segmentsIndex(segments: DataFrame): DataFrame =
    segments.select(col("word"), size(col("syms")).as("n_sub"))

  /** Tokenize the corpus with a trained segmentation table: per doc,
    * word count, BPE token count, and character count. In-vocabulary
    * words join their trained segment length; out-of-vocabulary words
    * fall back to character tokens (length(word) — the byte/char
    * fallback every production BPE carries). */
  def bpeTokenize(docs: DataFrame, segments: DataFrame): DataFrame =
    tokenizeWithIndex(docs, segmentsIndex(segments))

  /** The serving path: tokenize against a prebuilt slim (word, n_sub)
    * artifact — train once, persist, tokenize 100 TB without ever
    * re-running the merge loop. The join is the entire encode cost:
    * the bounded artifact against the exploded corpus, AQE-planned (a
    * broadcast is automatic while the vocabulary fits). */
  def tokenizeWithIndex(docs: DataFrame, index: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(lower(col("text")), " ", -1)).as("word"))
      .filter(length(col("word")) > 0)
      .join(index.select(col("word"), col("n_sub").cast("int").as("n_sub")),
        Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_sub"), length(col("word")).cast("int")))
          .as("n_bpe_tokens"),
        sum(length(col("word"))).as("n_word_chars"))
      .orderBy("doc_id")

  /** Tokenizer FERTILITY comparison — the eval a tokenizer choice is
    * made on (pieces per word, chars per piece; lower fertility =
    * better compression at equal vocab): one summary row per
    * tokenizer from its per-doc tokenize frame (any frame with
    * n_words / n_pieces / n_word_chars columns — both
    * [[tokenizeWithIndex]] families qualify after a rename). Ratios
    * are exact rationals reported via half-up integer micro snaps
    * (the classifierEval pattern), so rows are engine-stable;
    * rows-only only because the tokenizers themselves are. */
  def fertilityStats(tokenized: Seq[(String, DataFrame)]): DataFrame = {
    require(tokenized.nonEmpty, "fertilityStats needs at least one tokenizer")
    tokenized.map { case (name, df) =>
      df.agg(
          count(lit(1)).as("n_docs"),
          coalesce(sum("n_words"), lit(0L)).as("n_words"),
          coalesce(sum("n_pieces"), lit(0L)).as("n_pieces"),
          coalesce(sum("n_word_chars"), lit(0L)).as("n_chars"))
        .select(lit(name).as("tokenizer"), col("n_docs"), col("n_words"),
          col("n_pieces"), col("n_chars"))
    }.reduce(_ unionByName _)
      .withColumn("pieces_per_word_m", expr(
        """CASE WHEN n_words = 0 THEN NULL ELSE
          | (CAST(n_pieces AS DECIMAL(38,0)) * 2000000 + n_words)
          |  div (CAST(n_words AS DECIMAL(38,0)) * 2) END""".stripMargin))
      .withColumn("chars_per_piece_m", expr(
        """CASE WHEN n_pieces = 0 THEN NULL ELSE
          | (CAST(n_chars AS DECIMAL(38,0)) * 2000000 + n_pieces)
          |  div (CAST(n_pieces AS DECIMAL(38,0)) * 2) END""".stripMargin))
      .select(col("tokenizer"), col("n_docs"), col("n_words"), col("n_pieces"),
        col("n_chars"),
        round(col("pieces_per_word_m").cast("double") / 1e6, 6)
          .as("pieces_per_word"),
        round(col("chars_per_piece_m").cast("double") / 1e6, 6)
          .as("chars_per_piece"))
      .orderBy("tokenizer")
  }
}
