package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, when}

import graft.operators.Graph

/** DELETION-lifecycle specs for the signed graph incrementals:
  * componentsSigned / corenessSigned / trianglesSigned / kTrussSigned
  * fold an (adds, removals) pair into a prior artifact and must equal
  * the full recompute over (prior − removals) ∪ adds — including the
  * genuinely new deletion cases the grow-only incrementals never see:
  * a removed BRIDGE splitting a component, a node stripped of its
  * last edge dropping out, and triangle support falling under k. */
class GraphSignedSpec extends AnyFunSuite with SparkSessionTestBase {

  import spark.implicits._

  // prior: dumbbell 1-2-3 =bridge(3,4)= 4-5-6 (two triangles joined
  // by a bridge) | K4 10..13 (untouched by every delta below) |
  // pendant pair 20-21
  private val priorRaw = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (4L, 6L),
    (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L),
    (20L, 21L))

  private def df(pairs: Seq[(Long, Long)]): DataFrame =
    pairs.map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "w")

  private lazy val priorDf = df(priorRaw)
  private lazy val priorE = Graph.canonicalEdges(priorDf)
  private lazy val priorL = Graph.componentLabels(priorDf)

  private def newGraph(adds: Seq[(Long, Long)], removals: Seq[(Long, Long)])
      : DataFrame = {
    val rm = removals.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    df(priorRaw.filterNot { case (a, b) =>
      rm.contains((math.min(a, b), math.max(a, b))) } ++ adds)
  }

  test("componentsSigned: a removed bridge SPLITS the component; " +
      "signed == full over prior − removals ∪ adds") {
    def m(d: DataFrame) = d.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // remove the bridge, add a merge edge between the pendant pair
    // and a NEW node 22 — one split, one growth, in the same batch
    val adds = Seq((21L, 22L))
    val removals = Seq((3L, 4L))
    val out = m(Graph.componentsSigned(priorE, priorL, df(adds), df(removals)))
    val full = m(Graph.components(newGraph(adds, removals)))
    assert(out === full)
    // the split is real: the dumbbell's single prior component (label
    // 1, 6 nodes) is now TWO components labeled by each side's min id
    assert(out(1L) === ((3L, 3L)) && out(4L) === ((3L, 3L)))
    assert(out(10L) === ((4L, 6L)) && out(20L) === ((3L, 2L)))
  }

  test("componentsSigned: a node stripped of its last edge drops out; " +
      "removing a whole component removes its row") {
    def m(d: DataFrame) = d.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // delete the pendant pair's only edge: both nodes are edgeless in
    // the new graph, so the component vanishes (labels derive from
    // edges — matching the full run's edge-derived node set)
    val removals = Seq((20L, 21L))
    val none = Seq.empty[(Long, Long)]
    val out = m(Graph.componentsSigned(priorE, priorL, df(none), df(removals)))
    assert(out === m(Graph.components(newGraph(none, removals))))
    assert(!out.contains(20L) && out.size === 2)
  }

  test("corenessSigned folds both directions; untouched rows pass verbatim") {
    def m(d: DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val priorC = Graph.coreness(
      priorE.select(col("a").as("src"), col("b").as("dst")))
    // remove a triangle edge on the dumbbell's left lobe (1..3 drop
    // from the 2-core) and close a brand-new triangle on the pendant
    // pair (20, 21, 22 enter it); K4 untouched
    val adds = Seq((21L, 22L), (20L, 22L))
    val removals = Seq((1L, 2L))
    val out = m(Graph.corenessSigned(
      priorE, priorL, priorC, df(adds), df(removals)))
    val full = m(Graph.coreness(newGraph(adds, removals)))
    assert(out === full)
    assert(out(1L) === 1L && out(20L) === 2L && out(10L) === 3L)
    // PASS-THROUGH proof: poison the untouched K4's prior rows — the
    // signed path must carry them VERBATIM while touched components
    // recompute
    val poisoned = priorC.withColumn("coreness",
      when(col("node") >= 10L && col("node") <= 13L, lit(99L))
        .otherwise(col("coreness")))
    val outP = m(Graph.corenessSigned(
      priorE, priorL, poisoned, df(adds), df(removals)))
    assert(Seq(10L, 11L, 12L, 13L).forall(outP(_) === 99L))
    assert(outP.filterNot(kv => kv._1 >= 10L && kv._1 <= 13L)
      === full.filterNot(kv => kv._1 >= 10L && kv._1 <= 13L))
  }

  test("trianglesSigned recounts touched components only; signed == full") {
    def rows(d: DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val priorT = Graph.triangles(priorDf)
    // kill the left lobe's triangle and grow one on the pendant pair;
    // resend an existing edge (4,5) as an add — must be a no-op
    val adds = Seq((21L, 22L), (20L, 22L), (4L, 5L))
    val removals = Seq((1L, 3L))
    val out = rows(Graph.trianglesSigned(
      priorE, priorL, priorT, df(adds), df(removals)))
    val full = rows(Graph.triangles(newGraph(adds, removals)))
    assert(out === full)
    // PASS-THROUGH proof: poison an untouched K4 node's prior count —
    // carried verbatim (cc_micro poison too: the row is NOT recomputed)
    val poisoned = priorT.withColumn("n_triangles",
      when(col("node") === 11L, lit(77L)).otherwise(col("n_triangles")))
    val outP = rows(Graph.trianglesSigned(
        priorE, priorL, poisoned, df(adds), df(removals)))
      .map(t => t._1 -> t._3).toMap
    assert(outP(11L) === 77L)
    assert(outP.filterNot(_._1 == 11L)
      === full.map(t => t._1 -> t._3).toMap.filterNot(_._1 == 11L))
  }

  test("kTrussSigned: removal drops support below k; signed == full; " +
      "inconsistent artifacts fail loudly") {
    def m(d: DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val priorT = Graph.kTruss(
      priorE.select(col("a").as("src"), col("b").as("dst")), 3)
    // remove one K4 edge: the 4-clique degrades to a 4-cycle plus one
    // diagonal — two triangles sharing edge (11,12), each edge's
    // support drops to 1..2; the dumbbell's lobes stay 3-trusses
    val adds = Seq.empty[(Long, Long)]
    val removals = Seq((10L, 13L))
    val out = m(Graph.kTrussSigned(
      priorE, priorL, priorT, df(adds), df(removals), 3))
    val full = m(Graph.kTruss(newGraph(adds, removals), 3))
    assert(out === full)
    assert(out.contains((1L, 2L)) && out.contains((11L, 12L)))
    assert(!out.contains((10L, 13L)))
    // FAIL-LOUDLY: a prior truss row whose endpoint is missing from
    // the labels frame is an inconsistent artifact triple — the
    // untouched path must raise, not silently drop the edge
    val alien = priorT.unionByName(
      Seq((777L, 778L, 2L)).toDF("a", "b", "support"))
    val ex = intercept[Exception] {
      Graph.kTrussSigned(priorE, priorL, alien, df(adds), df(removals), 3)
        .collect()
    }
    def rootMsg(t: Throwable): String =
      (Option(t.getMessage).getOrElse("")) +
        Option(t.getCause).map(rootMsg).getOrElse("")
    assert(rootMsg(ex).contains("missing from priorLabels"))
  }

  test("pageRankSigned: the weight-delta fold == direct warm pageRank " +
      "over today's graph; vanished nodes drop; bad deltas raise") {
    val priorW = Seq(
      (1L, 2L, 3L), (2L, 3L, 2L), (1L, 3L, 1L), (3L, 4L, 1L),
      (10L, 11L, 4L), (20L, 21L, 1L)).toDF("a", "b", "w")
    val priorRanks = Graph.pageRank(
        priorW.select(col("a").as("src"), col("b").as("dst"), col("w")))
      .select("node", "rank_micro")
    // delist the pendant pair (dw = −w), shift a support (+2 on 1-2),
    // add a brand-new pair (22,23)
    val deltas = Seq(
      (20L, 21L, -1L), (1L, 2L, 2L), (22L, 23L, 3L)).toDF("a", "b", "dw")
    val todayW = Seq(
      (1L, 2L, 5L), (2L, 3L, 2L), (1L, 3L, 1L), (3L, 4L, 1L),
      (10L, 11L, 4L), (22L, 23L, 3L)).toDF("a", "b", "w")
    val signed = Graph.pageRankSigned(priorW, priorRanks, deltas)
      .collect().map(_.toString).toSeq
    val direct = Graph.pageRank(
        todayW.select(col("a").as("src"), col("b").as("dst"), col("w")),
        startRanks = Some(priorRanks))
      .collect().map(_.toString).toSeq
    // bit-exact: same folded frame, same warm start, same iteration
    assert(signed === direct)
    // vanished nodes (20, 21) are gone; new nodes (22, 23) rank
    val nodes = Graph.pageRankSigned(priorW, priorRanks, deltas)
      .select("node").collect().map(_.getLong(0)).toSet
    assert(!nodes.contains(20L) && !nodes.contains(21L))
    assert(nodes.contains(22L) && nodes.contains(23L))
    // LOUD: a delta below −w_prior disagrees with the artifact
    val bad = Seq((1L, 3L, -5L)).toDF("a", "b", "dw")
    val ex = intercept[Exception] {
      Graph.pageRankSigned(priorW, priorRanks, bad).collect()
    }
    def rootMsg(t: Throwable): String =
      (Option(t.getMessage).getOrElse("")) +
        Option(t.getCause).map(rootMsg).getOrElse("")
    assert(rootMsg(ex).contains("folded weight < 0"))
  }

  test("signed forms with an empty removal slice match the grow-only " +
      "incrementals (shared scope machinery)") {
    def m(d: DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val priorC = Graph.coreness(
      priorE.select(col("a").as("src"), col("b").as("dst")))
    val adds = Seq((21L, 22L), (20L, 22L))
    val none = Seq.empty[(Long, Long)]
    assert(m(Graph.corenessSigned(priorE, priorL, priorC, df(adds), df(none)))
      === m(Graph.corenessIncremental(priorE, priorL, priorC, df(adds))))
  }
}
