package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model subword tokenizer, relationally (Kudo 2018,
  * "Subword Regularization" — the SentencePiece unigram algorithm; the
  * other standard subword vocabulary next to [[Bpe]]'s merge-based
  * one).
  *
  * Shares [[Bpe]]'s key scale property: the corpus is touched exactly
  * twice end to end — once to count words, once to tokenize via a
  * join. Everything in between (seeding, EM, pruning, Viterbi
  * segmentation) runs on the BOUNDED word-count frame with the piece
  * model riding as one broadcast map row. The E-step is a single
  * narrow projection per word: forward/backward sum-product over the
  * segmentation lattice expressed as nested `aggregate` higher-order
  * functions — interpreted per element, but only over `wordLimit`
  * rows × ≤`maxPieceLen`·L lattice edges, never the corpus. No
  * per-position driver loop, no UDFs, no MLlib.
  *
  * Fidelity notes (documented divergences from SentencePiece):
  * pruning keeps the top pieces by EXPECTED COUNT rather than by
  * leave-one-out loss delta (the common simplification), and the seed
  * is position-frequency-ranked substrings rather than suffix-array
  * ESA candidates. Single-character pieces are never pruned, so every
  * in-vocabulary word stays segmentable (SentencePiece's character
  * coverage = 1.0 case).
  *
  * Determinism: EM weights are float sums (spec pins them against an
  * independent local forward-backward at 1e-9 relative); the SERVED
  * model quantizes costs to integer micro-nats (−ln p · 1e6, the
  * dsirWeights pattern), so Viterbi segmentation is exact integer DP
  * with an explicit (cost, piece count, boundary) tie-break — any
  * engine reproduces the identical segmentation from the same
  * artifact.
  */
object Unigram {

  private val Inf = 1000000000000000L // > any real path cost; < Long.Max/2

  /** Train the unigram piece model: returns (model, segments).
    *
    * `model`: one row per surviving piece — (piece, expected_count,
    * p, cost_micro). `segments`: the Viterbi segmentation of every
    * vocabulary word under the quantized model — (word, n, pieces,
    * n_pieces).
    *
    * `emIters` total EM rounds on the bounded frame; the seed is
    * pruned to `vocabSize` multi-character pieces (plus the full
    * single-character alphabet) after the first round. */
  def unigramTrain(
      docs: DataFrame,
      vocabSize: Int = 200,
      seedSize: Int = 2000,
      maxPieceLen: Int = 6,
      emIters: Int = 3,
      wordLimit: Int = 5000): (DataFrame, DataFrame) = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(seedSize >= vocabSize, s"seedSize ($seedSize) must be >= vocabSize ($vocabSize)")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(emIters >= 1, s"emIters must be >= 1, got $emIters")
    val k = maxPieceLen - 1

    // the ONE corpus pass: word counts, cut to the bounded model frame
    // (deterministic TakeOrdered cut, the Bpe.bpeTrain pattern)
    val words = docs
      .select(explode(split(lower(col("text")), " ", -1)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(wordLimit)
      .localCheckpoint()

    // seed: every substring occurrence up to maxPieceLen, weighted by
    // word count; all single chars (coverage) + top-seedSize multis
    val occ = words
      .select(col("n"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)),
           |  i -> transform(sequence(i, least(length(word), i + $k)),
           |    j -> substring(word, i, j - i + 1))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("n").as("c"))
      .localCheckpoint()
    var vocab = occ.filter(length(col("piece")) === 1)
      .unionAll(occ.filter(length(col("piece")) > 1)
        .orderBy(col("c").desc, col("piece")).limit(seedSize))
      .select(col("piece"), col("c").cast("double").as("wgt"))
      .localCheckpoint()

    // forward: alpha[t+1] = α(t) = Σ_i α(i−1)·p(word[i..t]); α(0) = 1
    val alphaExpr =
      s"""aggregate(sequence(1, length(word)), array(cast(1.0 as double)),
         |  (acc, j) -> array_append(acc,
         |    aggregate(sequence(greatest(1, j - $k), j), cast(0.0 as double),
         |      (s, i) -> s + element_at(acc, i) *
         |        coalesce(element_at(m, substring(word, i, j - i + 1)),
         |                 cast(0.0 as double)))))""".stripMargin
    // backward, stored reversed: beta[t+1] = β(L−t); β(L) = 1 —
    // β(i) = Σ_j p(word[i+1..j])·β(j), with β(j) = beta[L−j+1]
    val betaExpr =
      s"""aggregate(sequence(1, length(word)), array(cast(1.0 as double)),
         |  (acc, t) -> array_append(acc,
         |    aggregate(sequence(length(word) - t + 1,
         |                       least(length(word), length(word) - t + $maxPieceLen)),
         |      cast(0.0 as double),
         |      (s, j) -> s + coalesce(element_at(m,
         |          substring(word, length(word) - t + 1, j - (length(word) - t))),
         |          cast(0.0 as double)) * element_at(acc, length(word) - j + 1))))""".stripMargin
    // every lattice edge (i, j): piece word[i..j]
    val spanExpr =
      s"""flatten(transform(sequence(1, length(word)),
         |  i -> transform(sequence(i, least(length(word), i + $k)),
         |    j -> named_struct('i', i, 'j', j,
         |      'piece', substring(word, i, j - i + 1)))))""".stripMargin

    // one EM round: γ(edge) = n·α(i−1)·p·β(j)/α(L); M-step = Σγ per
    // piece (p renormalizes from the weights next round)
    def emStep(v: DataFrame): DataFrame = {
      val total = v.agg(sum("wgt").as("tw"))
      val modelRow = v.crossJoin(broadcast(total))
        .select(col("piece"), (col("wgt") / col("tw")).as("p"))
        .agg(map_from_entries(collect_list(struct(col("piece"), col("p")))).as("m"))
      words.crossJoin(broadcast(modelRow))
        .withColumn("alpha", expr(alphaExpr))
        .withColumn("beta", expr(betaExpr))
        .select(col("word"), col("n"), col("m"), col("alpha"), col("beta"),
          explode(expr(spanExpr)).as("sp"))
        .select(col("sp.piece").as("piece"),
          (col("n") * element_at(col("alpha"), col("sp.i")) *
            element_at(col("m"), col("sp.piece")) *
            element_at(col("beta"), length(col("word")) - col("sp.j") + lit(1)) /
            element_at(col("alpha"), length(col("word")) + lit(1))).as("g"))
        .filter(col("g").isNotNull && col("g") > 0.0)
        .groupBy("piece").agg(sum("g").as("wgt"))
    }

    for (it <- 1 to emIters) {
      vocab = emStep(vocab).localCheckpoint()
      if (it == 1) {
        // prune: full alphabet + top-vocabSize multis by expected count
        vocab = vocab.filter(length(col("piece")) === 1)
          .unionAll(vocab.filter(length(col("piece")) > 1)
            .orderBy(col("wgt").desc, col("piece")).limit(vocabSize))
          .localCheckpoint()
      }
    }

    val tot = vocab.agg(sum("wgt").as("tw"))
    val model = vocab.crossJoin(broadcast(tot))
      .select(col("piece"), col("wgt").as("expected_count"),
        (col("wgt") / col("tw")).as("p"),
        round(-log(col("wgt") / col("tw")) * 1e6).cast("long").as("cost_micro"))
      .orderBy("piece")
      .localCheckpoint()
    (model, viterbiSegments(words, model))
  }

  /** Viterbi-segment the vocabulary words under a quantized model —
    * exact integer min-cost DP (cost_micro), deterministic tie-break
    * (lower cost, then fewer pieces, then earliest boundary). `words`
    * is (word, n); `model` carries (piece, cost_micro). */
  def viterbiSegments(words: DataFrame, model: DataFrame): DataFrame = {
    val maxLen = 32 // piece lookups beyond the map just miss; DP bound only
    val cmRow = model
      .agg(map_from_entries(collect_list(
        struct(col("piece"), col("cost_micro")))).as("cm"))
    // vt[j+1] = best path to position j: struct(cost, np, bp) where bp
    // is the 0-based start of the final piece
    val viterbiExpr =
      s"""aggregate(sequence(1, length(word)),
         |  array(named_struct('cost', cast(0 as bigint), 'np', 0, 'bp', -1)),
         |  (acc, j) -> array_append(acc,
         |    aggregate(
         |      filter(transform(sequence(greatest(1, j - ${maxLen - 1}), j),
         |        i -> named_struct(
         |          'cost', IF(element_at(cm, substring(word, i, j - i + 1)) IS NULL
         |                     OR element_at(acc, i)['cost'] >= cast($Inf as bigint),
         |            cast($Inf as bigint),
         |            element_at(acc, i)['cost'] +
         |              element_at(cm, substring(word, i, j - i + 1))),
         |          'np', element_at(acc, i)['np'] + 1,
         |          'bp', i - 1)),
         |        c -> c.cost < cast($Inf as bigint)),
         |      named_struct('cost', cast($Inf as bigint), 'np', 0, 'bp', -1),
         |      (b, c) -> IF(c.cost < b.cost
         |          OR (c.cost = b.cost AND (c.np < b.np
         |              OR (c.np = b.np AND c.bp < b.bp))), c, b))))""".stripMargin
    val backtraceExpr =
      """aggregate(sequence(1, length(word)),
        |  named_struct('j', length(word), 'ps', cast(array() as array<string>)),
        |  (st, t) -> IF(st.j <= 0, st,
        |    named_struct('j', element_at(vt, st.j + 1)['bp'],
        |      'ps', array_append(st.ps,
        |        substring(word, element_at(vt, st.j + 1)['bp'] + 1,
        |          st.j - element_at(vt, st.j + 1)['bp'])))),
        |  st -> reverse(st.ps))""".stripMargin
    words.crossJoin(broadcast(cmRow))
      .withColumn("vt", expr(viterbiExpr))
      .withColumn("pieces", expr(backtraceExpr))
      .select(col("word"), col("n"), col("pieces"),
        size(col("pieces")).as("n_pieces"))
      .orderBy("word")
  }

  /** The driver-visible training report: the learned piece model. */
  def unigramModel(
      docs: DataFrame, vocabSize: Int = 200, seedSize: Int = 2000): DataFrame =
    unigramTrain(docs, vocabSize = vocabSize, seedSize = seedSize)._1

  /** The slim serving artifact: word → Viterbi piece count — the
    * [[Bpe.segmentsIndex]] contract, so [[Bpe.tokenizeWithIndex]]
    * serves either tokenizer's artifact unchanged. */
  def segmentsIndex(segments: DataFrame): DataFrame =
    segments.select(col("word"), col("n_pieces").as("n_sub"))

  /** Tokenize the corpus under a trained segmentation (per-doc word /
    * subword / char counts; OOV words fall back to character tokens —
    * the [[Bpe.bpeTokenize]] contract with honest column names). */
  def unigramTokenize(docs: DataFrame, segments: DataFrame): DataFrame =
    Bpe.tokenizeWithIndex(docs, segmentsIndex(segments))
      .withColumnRenamed("n_bpe_tokens", "n_pieces")
}
