package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenizer training and application, relationally
  * (Schuster & Nakajima 2012; Wu et al. 2016 §4.1 — the BERT/mBERT
  * tokenizer; the third production subword family next to [[Bpe]] and
  * [[Unigram]], completing the matrix a tokenizer choice is made
  * over).
  *
  * Identical scale posture to [[Bpe.bpeTrain]]: merges are learned
  * from the bounded WORD-COUNT frame — the corpus is touched once to
  * count words and once to tokenize, never inside the merge loop. The
  * one algorithmic delta is the merge OBJECTIVE: where BPE merges the
  * most frequent adjacent pair, WordPiece merges the pair maximizing
  * the unigram-LM likelihood gain score(a,b) = count(ab) /
  * (count(a)·count(b)) — the greedy step that most increases corpus
  * likelihood under a unigram piece model (the publicly documented
  * training rule). Scores are compared as EXACT integer quotients
  * (count(ab)·10^12 `div` count(a)·count(b), DECIMAL operands — the
  * classifierEval posture), so the argmax is engine- and
  * partition-stable with ties broken by (score DESC, pair count DESC,
  * left ASC, right ASC). Continuation pieces carry the "##" prefix
  * (the BERT wordpiece convention): a word's first symbol is its bare
  * first character, every later symbol is "##"-prefixed, and a merge
  * of (a, ##b) yields a·b with a's own prefix preserved — so "play" =
  * [p, ##l, ##a, ##y] merges toward [play] while "##er" stays a
  * recognizable suffix piece.
  */
object Wordpiece {

  /** Train WordPiece merges: returns (merges, segments) in
    * [[Bpe.bpeTrain]]'s layout (merges additionally carry the
    * selection-time likelihood score in pico units). Deterministic by
    * the integer score comparison; the loop is the same bounded
    * driver-side model loop (per-iteration plans over the
    * localCheckpoint'd vocabulary frame, 1-row emptiness probe, early
    * stop when no adjacent pair remains). */
  def wordpieceTrain(
      docs: DataFrame, nMerges: Int = 50,
      vocabSize: Int = 5000): (DataFrame, DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val spark = docs.sparkSession
    // the ONE corpus pass: word counts, cut to the top-vocabSize model
    // frame. First char bare, continuations "##"-prefixed.
    var words = docs
      .select(explode(split(lower(col("text")), " ", -1)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(vocabSize)
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> " +
          "IF(i = 1, substring(word, 1, 1), concat('##', substring(word, i, 1))))"))
      .localCheckpoint()

    // greedy left-to-right non-overlapping merge of (a, b) → m in a
    // symbol array (the Bpe.mergeFold shape, emitting the prefix-aware
    // merged symbol instead of plain concat)
    val mergeFold =
      "aggregate(syms, named_struct('out', cast(array() as array<string>), " +
        "'pend', cast(null as string)), " +
        "(acc, s) -> IF(acc.pend IS NULL, named_struct('out', acc.out, 'pend', s), " +
        "IF(acc.pend = a AND s = b, " +
        "named_struct('out', array_append(acc.out, m), " +
        "'pend', cast(null as string)), " +
        "named_struct('out', array_append(acc.out, acc.pend), 'pend', s))), " +
        "acc -> IF(acc.pend IS NULL, acc.out, array_append(acc.out, acc.pend)))"

    var merges = Seq.empty[DataFrame]
    var exhausted = false
    for (r <- 1 to nMerges if !exhausted) {
      // weighted symbol totals (the score denominators) and adjacent
      // pair counts — both partial-combined aggregations over the
      // bounded vocabulary frame, nothing corpus-sized
      val symCounts = words
        .select(col("n"), explode(col("syms")).as("s"))
        .groupBy("s").agg(sum("n").as("cs"))
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> named_struct('a', element_at(syms, i), 'b', element_at(syms, i + 1)))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("n").as("cnt"))
        .join(symCounts.select(col("s").as("a"), col("cs").as("ca")), Seq("a"))
        .join(symCounts.select(col("s").as("b"), col("cs").as("cb")), Seq("b"))
        // exact integer likelihood-gain quotient: cnt ≤ min(ca, cb) so
        // the pico score fits a long; DECIMAL operands keep the
        // product cnt·10^12 exact
        .withColumn("score_pico", expr(
          "(CAST(cnt AS DECIMAL(38,0)) * 1000000000000) div " +
            "(CAST(ca AS DECIMAL(38,0)) * cb)").cast("long"))
        .orderBy(col("score_pico").desc, col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .withColumn("m", concat(col("a"),
          when(col("b").startsWith("##"), expr("substring(b, 3)"))
            .otherwise(col("b"))))
        .localCheckpoint()
      if (top.head(1).isEmpty) exhausted = true // every word is one symbol
      else {
        merges :+= top.select(lit(r).as("rank"), col("a").as("left"),
          col("b").as("right"), col("m").as("merged"), col("cnt"),
          col("score_pico"))
        words = words.crossJoin(broadcast(top.select("a", "b", "m")))
          .withColumn("syms", expr(mergeFold))
          .select("word", "n", "syms")
          .localCheckpoint()
      }
    }
    val mergesDf =
      if (merges.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "rank INT, left STRING, right STRING, merged STRING, " +
              "cnt BIGINT, score_pico BIGINT"))
      else merges.reduce(_ unionAll _)
    (mergesDf.orderBy("rank"), words.orderBy("word"))
  }

  /** The driver-visible training report: the learned merge table with
    * selection-time likelihood scores. */
  def wordpieceMerges(
      docs: DataFrame, nMerges: Int = 50, vocabSize: Int = 5000): DataFrame =
    wordpieceTrain(docs, nMerges, vocabSize)._1

  /** Tokenize against a trained segmentation's slim (word, n_sub)
    * artifact ([[Bpe.segmentsIndex]] layout — train once, persist,
    * tokenize 100 TB through one join). The WordPiece delta vs
    * [[Bpe.tokenizeWithIndex]] is the OOV rule: a word absent from
    * the trained vocabulary maps to the single [UNK] piece (the BERT
    * convention), not a character fallback. Output column is
    * `n_pieces`, feeding [[Bpe.fertilityStats]] rename-free. */
  def tokenizeWithIndex(docs: DataFrame, index: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(lower(col("text")), " ", -1)).as("word"))
      .filter(length(col("word")) > 0)
      .join(index.select(col("word"), col("n_sub").cast("int").as("n_sub")),
        Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_sub"), lit(1))).as("n_pieces"),
        sum(length(col("word"))).as("n_word_chars"))
      .orderBy("doc_id")

  /** Tokenize with a freshly trained segmentation (the inline form;
    * serving paths persist [[Bpe.segmentsIndex]] and use
    * [[tokenizeWithIndex]]). */
  def wordpieceTokenize(docs: DataFrame, segments: DataFrame): DataFrame =
    tokenizeWithIndex(docs, Bpe.segmentsIndex(segments))
}
