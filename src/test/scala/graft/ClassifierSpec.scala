package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classifier

class ClassifierSpec extends AnyFunSuite with SparkSessionTestBase {

  // planted corpus: "good" docs are stopword-rich with varied words,
  // "bad" docs repeat one rare token — separable on stop_ratio and
  // top_token_frac, the features the trained weights must discover
  private def planted(n: Int) = {
    import spark.implicits._
    val good = (0 until n).map { i =>
      val filler = (0 until 20).map(j => s"word${(i * 7 + j) % 50}")
      (i.toLong, ("the be to of and that have with" + " " +
        filler.mkString(" ")), 1.0)
    }
    val bad = (0 until n).map { i =>
      val tok = s"zz${i % 17}"
      ((n + i).toLong, Seq.fill(25)(tok).mkString(" "), 0.0)
    }
    val df = (good ++ bad).toDF("doc_id", "text", "label")
    (df.select("doc_id", "text"), df.select("doc_id", "label"))
  }

  test("classifierTrain separates planted labels; apply reproduces them") {
    val (docs, labels) = planted(60)
    val model = Classifier.classifierTrain(docs, labels)
    val rows = model.collect()
    assert(rows.length === Classifier.featureNames.length)
    assert(rows.map(_.getAs[String]("term")).toSeq ===
      Classifier.featureNames)
    assert(rows.forall(_.getAs[Long]("n_rows") === 120L))
    val loss = rows.head.getAs[Double]("final_logloss")
    assert(loss >= 0.0 && loss < 0.1, s"separable data should fit; loss=$loss")
    val w = rows.map(_.getAs[Double]("weight")).toSeq
    assert(w.forall(x => !x.isNaN && !x.isInfinite))
    val scored = Classifier.classifierApply(docs, w).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    val truth = labels.collect().map(r => r.getLong(0) -> (r.getDouble(1) > 0.5)).toMap
    val acc = truth.count { case (id, y) => scored(id) == y }.toDouble / truth.size
    assert(acc >= 0.95, s"in-sample accuracy $acc")
  }

  test("classifierTrain matches an independent local IRLS to 1e-6") {
    val (docs, labels) = planted(40)
    val iters = 6
    val ridge = 1e-2
    // tol = 0: exactly `iters` passes, matching the reference loop
    val sparkW = Classifier.classifierTrain(docs, labels, iters = iters,
      ridge = ridge, tol = 0.0).collect().map(_.getAs[Double]("weight"))

    // independent reference: same model, plain Scala loops over the
    // collected feature frame (different summation order on purpose)
    val xy = Classifier.features(docs)
      .join(labels, Seq("doc_id"))
      .collect()
      .map(r => (r.getSeq[Double](r.fieldIndex("x")).toArray,
        r.getAs[Double]("label")))
    val d = Classifier.featureNames.length
    var w = Array.fill(d)(0.0)
    for (_ <- 1 to iters) {
      val a = Array.ofDim[Double](d, d)
      val b = Array.fill(d)(0.0)
      for ((x, y) <- xy) {
        val eta = (0 until d).map(j => x(j) * w(j)).sum
        val mu = 1.0 / (1.0 + math.exp(-eta))
        val s = math.max(mu * (1.0 - mu), 1e-12)
        val z = eta + (y - mu) / s
        for (j <- 0 until d; k <- 0 until d) a(j)(k) += s * x(j) * x(k)
        for (j <- 0 until d) b(j) += s * x(j) * z
      }
      // ridge solve via the same elimination, re-derived independently
      val m = Array.tabulate(d, d + 1) { (i, j) =>
        if (j == d) b(i) else a(i)(j) + (if (i == j) ridge else 0.0)
      }
      for (p <- 0 until d) {
        var piv = p
        for (r <- p + 1 until d) if (math.abs(m(r)(p)) > math.abs(m(piv)(p))) piv = r
        val t = m(p); m(p) = m(piv); m(piv) = t
        for (r <- p + 1 until d) {
          val f = m(r)(p) / m(p)(p)
          for (c <- p to d) m(r)(c) -= f * m(p)(c)
        }
      }
      val nw = new Array[Double](d)
      for (i <- (d - 1) to 0 by -1) {
        var s = m(i)(d)
        for (j <- i + 1 until d) s -= m(i)(j) * nw(j)
        nw(i) = s / m(i)(i)
      }
      w = nw
    }
    for (j <- 0 until d)
      assert(math.abs(sparkW(j) - w(j)) <= 1e-6 * math.max(1.0, math.abs(w(j))),
        s"weight $j: spark=${sparkW(j)} ref=${w(j)}")
  }

  test("early stop converges to the exhaustive-run solution") {
    val (docs, labels) = planted(40)
    val converged = Classifier.classifierTrain(docs, labels, iters = 50)
      .collect()
    val exhaustive = Classifier.classifierTrain(docs, labels, iters = 50,
      tol = 0.0).collect()
    converged.zip(exhaustive).foreach { case (c, e) =>
      val (wc, we) = (c.getAs[Double]("weight"), e.getAs[Double]("weight"))
      assert(math.abs(wc - we) <= 1e-6 * math.max(1.0, math.abs(we)),
        s"${c.getAs[String]("term")}: converged=$wc exhaustive=$we")
    }
    assert(math.abs(converged.head.getAs[Double]("final_logloss") -
      exhaustive.head.getAs[Double]("final_logloss")) < 1e-8)
  }

  test("degenerate inputs: one-class labels stay finite, empty returns zeros") {
    import spark.implicits._
    val (docs, labels) = planted(20)
    val oneClass = Classifier.classifierTrain(docs,
      labels.withColumn("label", lit(1.0)), iters = 4)
    assert(oneClass.collect().forall { r =>
      val x = r.getAs[Double]("weight"); !x.isNaN && !x.isInfinite
    })
    val empty = Classifier.classifierTrain(docs.limit(0), labels.limit(0))
      .collect()
    assert(empty.length === Classifier.featureNames.length)
    assert(empty.forall(_.getAs[Double]("weight") === 0.0))
    assert(empty.forall(_.isNullAt(empty.head.fieldIndex("final_logloss"))))
    assert(empty.forall(_.getAs[Long]("n_rows") === 0L))
  }

  // hand-countable NB corpus: pos tokens {apple 3, banana 1, cherry 1}
  // (T_pos = 5), neg tokens {durian 3, banana 2, cherry 1} (T_neg = 6),
  // vocabulary V = 4
  private def nbTiny = {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana"), (2L, "apple cherry"),
      (3L, "durian banana banana"), (4L, "durian durian cherry"))
      .toDF("doc_id", "text")
    val labels = Seq((1L, 1), (2L, 1), (3L, 0), (4L, 0)).toDF("doc_id", "label")
    (docs, labels)
  }

  // Spark round() is decimal HALF_UP — mirror it, not math.round
  // (which rounds negative halves toward +inf)
  private def halfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def tinyLlr(np: Long, nn: Long): Long =
    halfUp((math.log((np + 1.0) / (5 + 4.0)) -
      math.log((nn + 1.0) / (6 + 4.0))) * 1e6)

  test("nbTrain computes Laplace-smoothed log-likelihood ratios exactly") {
    val (docs, labels) = nbTiny
    val m = Classifier.nbTrain(docs, labels).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(m.keySet === Set("apple", "banana", "cherry", "durian"))
    assert(m("apple") === ((3L, 0L, tinyLlr(3, 0))))
    assert(m("banana") === ((1L, 2L, tinyLlr(1, 2))))
    assert(m("cherry") === ((1L, 1L, tinyLlr(1, 1))))
    assert(m("durian") === ((0L, 3L, tinyLlr(0, 3))))
  }

  test("nbScore sums integer ratios; OOV takes the smoothed zero-count ratio") {
    import spark.implicits._
    val (docs, labels) = nbTiny
    val model = Classifier.nbTrain(docs, labels).localCheckpoint()
    val probe = Seq((10L, "apple apple"), (11L, "durian unseen")).toDF("doc_id", "text")
    val got = Classifier.nbScore(probe, model).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4))))
      .toMap
    val oov = halfUp((math.log(6 + 4.0) - math.log(5 + 4.0)) * 1e6)
    assert(got(10L) === ((2L, 2L * tinyLlr(3, 0), true)))
    assert(got(11L) === ((2L, tinyLlr(0, 3) + oov, false)))
    // scoring the training docs separates the classes in-sample
    val self = Classifier.nbScore(docs, model).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(self === Map(1L -> true, 2L -> true, 3L -> false, 4L -> false))
  }

  test("nbScore against an empty model fails loudly") {
    import spark.implicits._
    val (docs, _) = nbTiny
    val empty = Seq.empty[(String, Long, Long, Long)]
      .toDF("term", "n_pos", "n_neg", "llr_micro")
    val e = intercept[Exception] {
      Classifier.nbScore(docs, empty).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("model is empty")))
  }

  // ---- nbModelIncremental ----

  test("nbModelIncremental equals a full retrain across add/remove/change/label-flip") {
    import spark.implicits._
    val (oldDocs, oldLabels) = nbTiny
    // new corpus: doc 1 text changed, doc 2 removed, doc 5 added,
    // doc 3 label FLIPPED with unchanged text (0 -> 1), doc 4 as-is
    val newDocs = Seq(
      (1L, "apple apple banana elderberry"),
      (3L, "durian banana banana"), (4L, "durian durian cherry"),
      (5L, "fig fig apple"))
      .toDF("doc_id", "text")
    val newLabels = Seq((1L, 1), (3L, 1), (4L, 0), (5L, 0)).toDF("doc_id", "label")
    val maintained = Classifier.nbModelIncremental(
        Classifier.nbTrain(oldDocs, oldLabels),
        oldDocs, oldLabels, newDocs, newLabels)
      .collect().map(_.toString).toSeq
    val full = Classifier.nbTrain(newDocs, newLabels)
      .collect().map(_.toString).toSeq
    assert(maintained === full)
    // vocabulary shrinks exactly: cherry survives (doc 4), the removed
    // doc 2's exclusive terms are gone only if nothing else has them
    assert(maintained.nonEmpty)
  }

  test("nbModelIncremental drops terms whose counts both reach zero (V matches)") {
    import spark.implicits._
    val oldDocs = Seq((1L, "apple unique"), (2L, "banana")).toDF("doc_id", "text")
    val oldLabels = Seq((1L, 1), (2L, 0)).toDF("doc_id", "label")
    val newDocs = Seq((2L, "banana")).toDF("doc_id", "text")
    val newLabels = Seq((2L, 0)).toDF("doc_id", "label")
    val maintained = Classifier.nbModelIncremental(
      Classifier.nbTrain(oldDocs, oldLabels),
      oldDocs, oldLabels, newDocs, newLabels)
    assert(maintained.select("term").as[String].collect().toSet === Set("banana"))
    assert(maintained.collect().map(_.toString).toSeq ===
      Classifier.nbTrain(newDocs, newLabels).collect().map(_.toString).toSeq)
  }

  test("nbModelIncremental with no changes is the identity") {
    val (docs, labels) = nbTiny
    val prior = Classifier.nbTrain(docs, labels)
    val maintained = Classifier.nbModelIncremental(
      prior, docs, labels, docs, labels)
    assert(maintained.collect().map(_.toString).toSeq ===
      prior.collect().map(_.toString).toSeq)
  }

  // ---- classifierEval ----

  private def evalDf(rows: Seq[(Long, Long, Int)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "score_micro", "y")
  }

  /** Independent mid-rank AUC + confusion metrics with the operator's
    * half-up micro snapping. */
  private def localEval(rows: Seq[(Long, Long, Int)]) = {
    val pos = rows.filter(_._3 == 1).map(_._2)
    val neg = rows.filter(_._3 == 0).map(_._2)
    val u2 = pos.map(s => 2L * neg.count(_ < s) + neg.count(_ == s)).sum
    val (p, n) = (pos.size.toLong, neg.size.toLong)
    val tp = pos.count(_ > 0).toLong
    val fp = neg.count(_ > 0).toLong
    def ratio(a: Long, d: Long): Option[Double] =
      if (d == 0) None else Some(((2 * a * 1000000L + d) / (2 * d)).toDouble / 1e6)
    (p, n, tp, fp, p - tp, n - fp, u2,
      ratio(tp, tp + fp), ratio(tp, p), ratio(2 * tp, 2 * tp + fp + (p - tp)),
      if (p == 0 || n == 0) None else Some({
        val d = 2 * p * n
        ((2 * u2 * 1000000L + d) / (2 * d)).toDouble / 1e6
      }))
  }

  test("classifierEval matches an independent computation, ties included") {
    // ties across classes at score 500000 and at -3; scores straddle
    // the 2^16 block boundary so the two-level prefix sum is exercised
    val rows = Seq[(Long, Long, Int)](
      (0L, 500000L, 1), (1L, 500000L, 0), (2L, 900000L, 1), (3L, -3L, 0),
      (4L, -3L, 1), (5L, 70000L, 0), (6L, 70001L, 1), (7L, -900000L, 0),
      (8L, 123L, 1), (9L, 123L, 1), (10L, 123L, 0), (11L, 65536L, 0))
    val got = Classifier.classifierEval(evalDf(rows)).collect().head
    val (p, n, tp, fp, fn, tn, u2, prec, rec, f1, auc) = localEval(rows)
    assert(got.getLong(0) === p); assert(got.getLong(1) === n)
    assert(got.getLong(2) === tp); assert(got.getLong(3) === fp)
    assert(got.getLong(4) === fn); assert(got.getLong(5) === tn)
    // u2 REPORTS as double (SURVEY §5: never emit DECIMAL); the
    // accumulator stays decimal — exact here, far below 2^53
    assert(got.getDouble(6) === u2.toDouble)
    def d(i: Int): Option[Double] = if (got.isNullAt(i)) None else Some(got.getDouble(i))
    assert(d(7) === prec); assert(d(8) === rec); assert(d(9) === f1)
    assert(d(10) === auc)
  }

  test("classifierEval: perfect separation gives AUC exactly 1") {
    val rows = (0 until 50).map(i => (i.toLong, 1000L + i, 1)) ++
      (50 until 100).map(i => (i.toLong, -1000L - i, 0))
    val got = Classifier.classifierEval(evalDf(rows)).collect().head
    assert(got.getDouble(10) === 1.0)
    assert(got.getDouble(7) === 1.0 && got.getDouble(8) === 1.0 &&
      got.getDouble(9) === 1.0)
  }

  test("classifierEval: single-class and empty inputs degrade to NULL ratios") {
    val onePos = Classifier.classifierEval(evalDf(Seq((0L, 5L, 1)))).collect().head
    assert(onePos.isNullAt(10)) // auc undefined without both classes
    assert(onePos.getDouble(8) === 1.0) // recall defined
    val empty = Classifier.classifierEval(evalDf(Seq.empty)).collect().head
    assert(empty.getLong(0) === 0L && empty.getDouble(6) === 0.0)
    assert(empty.isNullAt(7) && empty.isNullAt(8) && empty.isNullAt(10))
  }

  test("classifierEval on NB resubstitution scores separates the planted domains") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val labels = docs.select(col("doc_id"),
      col("source").isInCollection(Seq("src0", "src1")).cast("int").as("label"))
    val scored = Classifier
      .nbScore(docs, Classifier.nbTrain(docs, labels))
      .join(labels.select(col("doc_id"), col("label").as("y")), Seq("doc_id"))
      .select("doc_id", "score_micro", "y")
    val got = Classifier.classifierEval(scored).collect().head
    assert(got.getLong(0) + got.getLong(1) === docs.count())
    assert(got.getDouble(10) > 0.5, "NB must beat chance on its own training labels")
  }

  // ---- calibrationReport ----

  test("calibrationReport bins by logit literals and snaps exact ratios") {
    // hand-computed: sigmoid(-5)·1e6 rounds to 6693, sigmoid(0) to
    // 500000 (score 0 lands in bin 5 — the logit(0.5)=0 boundary is
    // inclusive), sigmoid(5) to 993307
    val rows = Seq[(Long, Long, Int)](
      (0L, -5000000L, 0), (1L, -5000000L, 0), (2L, -5000000L, 0),
      (3L, -5000000L, 1),
      (4L, 0L, 1), (5L, 0L, 0),
      (6L, 5000000L, 1), (7L, 5000000L, 1))
    val got = Classifier.calibrationReport(evalDf(rows))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // ece = half-up((4·243307 + 2·0 + 2·6693) / 8) = 123327
    assert(got.toSet === Set(
      (0, 4L, 1L, 250000L, 6693L, -243307L, 123327L),
      (5, 2L, 1L, 500000L, 500000L, 0L, 123327L),
      (9, 2L, 2L, 1000000L, 993307L, -6693L, 123327L)))
    // empty bins are absent rows, not zero rows
    assert(got.length === 3)
    // repartition-invariance
    val again = Classifier.calibrationReport(evalDf(rows).repartition(5))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(6)))
    assert(again.map(t => (t._1, t._2)).toSet ===
      got.map(t => (t._1, t._2)).toSet)
    assert(again.forall(_._3 === 123327L))
  }

  test("calibrationReport: a perfectly calibrated score has near-zero gaps") {
    // 100 docs at llr = logit(0.3): 30 positives → observed rate
    // 300000 vs mean confidence 300000 ⇒ gap 0 in its bin
    val llr = math.round(math.log(0.3 / 0.7) * 1e6)
    val rows = (0 until 100).map(i => (i.toLong, llr, if (i < 30) 1 else 0))
    val got = Classifier.calibrationReport(evalDf(rows)).collect()
    assert(got.length === 1)
    assert(got.head.getInt(0) === 3)
    assert(math.abs(got.head.getLong(5)) <= 1L) // half-up snap wiggle
    assert(got.head.getLong(6) <= 1L)
  }
}
