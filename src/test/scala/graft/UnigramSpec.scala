package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, Unigram}

class UnigramSpec extends AnyFunSuite with SparkSessionTestBase {

  private val docDir = "/root/testdata/sf0.01"
  private val maxPieceLen = 6

  /** Independent reference: one soft-EM round (forward-backward over
    * the segmentation lattice) in plain Scala loops — different
    * summation order from the Spark expressions on purpose. */
  private def localEmStep(
      words: Map[String, Long], weights: Map[String, Double]): Map[String, Double] = {
    val tw = weights.values.sum
    val p = weights.map { case (k, v) => k -> v / tw }
    val out = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
    for ((w, n) <- words) {
      val L = w.length
      val alpha = Array.fill(L + 1)(0.0); alpha(0) = 1.0
      for (j <- 1 to L; i <- math.max(1, j - maxPieceLen + 1) to j)
        alpha(j) += alpha(i - 1) * p.getOrElse(w.substring(i - 1, j), 0.0)
      val beta = Array.fill(L + 1)(0.0); beta(L) = 1.0
      for (i <- (L - 1) to 0 by -1; j <- (i + 1) to math.min(L, i + maxPieceLen))
        beta(i) += p.getOrElse(w.substring(i, j), 0.0) * beta(j)
      for (i0 <- 0 until L; j <- (i0 + 1) to math.min(L, i0 + maxPieceLen)) {
        p.get(w.substring(i0, j)).foreach { pp =>
          val g = n * alpha(i0) * pp * beta(j) / alpha(L)
          if (g > 0) out(w.substring(i0, j)) += g
        }
      }
    }
    out.toMap
  }

  private def localSeed(words: Map[String, Long]): Map[String, Double] = {
    val out = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
    for ((w, n) <- words; i <- 0 until w.length;
         j <- (i + 1) to math.min(w.length, i + maxPieceLen))
      out(w.substring(i, j)) += n.toDouble
    out.toMap
  }

  test("unigramTrain EM matches an independent local forward-backward at 1e-9") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abab abab cdcd"), (2L, "abab cdcd cdcd x"),
      (3L, "abcd abcd x abab")).toDF("doc_id", "text")
    val wordCounts = Map("abab" -> 4L, "cdcd" -> 3L, "abcd" -> 2L, "x" -> 2L)
    // seedSize large enough that pruning keeps every candidate: the
    // comparison is then pure EM, no cut interference
    val (model, _) = Unigram.unigramTrain(docs, vocabSize = 1000,
      seedSize = 1000, maxPieceLen = maxPieceLen, emIters = 1)
    val got = model.collect()
      .map(r => r.getString(0) -> r.getAs[Double]("expected_count")).toMap
    val want = localEmStep(wordCounts, localSeed(wordCounts))
    assert(got.keySet === want.keySet)
    for ((k, v) <- want)
      assert(math.abs(got(k) - v) <= 1e-9 * math.max(1.0, v), k)
    // expected counts conserve total token mass: Σ_pieces E[count] ==
    // Σ_words n·E[pieces per word] — at minimum every word contributes
    // ≥ 1 piece, and probabilities in the model sum to 1
    val psum = model.agg(sum("p")).head().getDouble(0)
    assert(math.abs(psum - 1.0) < 1e-9)
  }

  test("viterbiSegments: exact integer DP with deterministic tie-breaks") {
    import spark.implicits._
    val words = Seq(("abcd", 5L), ("aa", 3L), ("zq", 1L)).toDF("word", "n")
    val model = Seq(
      ("a", 8L), ("b", 8L), ("c", 8L), ("d", 8L), ("z", 9L), ("q", 9L),
      ("ab", 10L), ("cd", 10L), ("abc", 25L), ("aa", 20L))
      .toDF("piece", "cost_micro")
    val segs = Unigram.viterbiSegments(words, model).collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    // ab+cd = 20 beats a+b+c+d = 32 and abc+d = 33
    assert(segs("abcd") === Seq("ab", "cd"))
    // aa (cost 20, 1 piece) ties a+a (cost 16? no: 16 < 20) — a+a wins
    // on cost alone; plant a true tie instead: with a = 10, aa = 20
    assert(segs("zq") === Seq("z", "q"))
    val model2 = Seq(("a", 10L), ("aa", 20L)).toDF("piece", "cost_micro")
    val segs2 = Unigram.viterbiSegments(
      Seq(("aa", 1L)).toDF("word", "n"), model2).collect()
    // equal cost 20: fewer pieces wins — ["aa"], not ["a","a"]
    assert(segs2.head.getSeq[String](2) === Seq("aa"))
  }

  test("trained segments concatenate to their words; tokenize adds up with OOV fallback") {
    import spark.implicits._
    val docs = Tables.documents(spark, docDir)
    val (model, segs) = Unigram.unigramTrain(docs, vocabSize = 50, seedSize = 500)
    val rows = segs.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](2).mkString === r.getString(0), r.getString(0))
      assert(r.getInt(3) === r.getSeq[String](2).length)
    }
    // the alphabet survives pruning: every char of every vocab word
    val alphabet = rows.flatMap(_.getString(0).toSeq).map(_.toString).toSet
    val pieces = model.collect().map(_.getString(0)).toSet
    assert(alphabet.subsetOf(pieces))
    // tokenize: per-doc piece count = Σ over words of the segment's
    // n_pieces; an OOV word falls back to one piece per char
    val probe = Seq((900L, rows.head.getString(0)), (901L, "zzzqqq"))
      .toDF("doc_id", "text")
    val tok = Unigram.unigramTokenize(probe, segs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_pieces")).toMap
    assert(tok(900L) === rows.head.getInt(3).toLong)
    assert(tok(901L) === 6L)
    // serving-artifact contract: the slim index reproduces bpe-style
    // tokenization byte for byte
    val viaIndex = Bpe.tokenizeWithIndex(probe, Unigram.segmentsIndex(segs))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_bpe_tokens")).toMap
    assert(viaIndex === tok)
  }

  test("pruning bounds the model: alphabet + at most vocabSize multis") {
    val docs = Tables.documents(spark, docDir)
    val model = Unigram.unigramModel(docs, vocabSize = 5, seedSize = 500)
    val ps = model.collect().map(_.getString(0))
    assert(ps.count(_.length > 1) <= 5)
    assert(ps.count(_.length == 1) >= 1)
    // costs are positive finite micro-nats
    assert(model.collect().forall { r =>
      val c = r.getAs[Long]("cost_micro"); c > 0L && c < 100L * 1000000L
    })
  }
}
