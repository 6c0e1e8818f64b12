package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the performance properties the
  * operators were designed around, asserted against the actual
  * physical plans so a refactor cannot silently lose them. */
class PlanRegressionSpec extends AnyFunSuite with SparkSessionTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("search filters reach the parquet scan") {
    val p = plan("q_search_products")
    // toString elides long filter lists; assert the scan carries pushed
    // filters and the plan has no extra Exchange (scan → filter → topK)
    assert(p.contains("PushedFilters: [IsNotNull(p_name)"))
    assert(!p.contains("Exchange"))
  }

  test("price history prunes by part key and date at the scan") {
    val p = plan("q_price_history")
    assert(p.contains("PushedFilters: [IsNotNull(l_partkey)"))
  }

  test("store products broadcasts the part dimension") {
    val p = plan("q_store_products")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters: [IsNotNull(l_suppkey)"))
  }

  test("store dim snowflake joins broadcast both dimensions") {
    val p = plan("q_store_dim")
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 2)
  }

  test("top-k queries fuse sort and limit (no global sort materialization)") {
    assert(plan("q_search_products").contains("TakeOrderedAndProject"))
    assert(plan("q_top_open_orders").contains("TakeOrderedAndProject"))
  }

  test("scan column pruning: q1 reads only the needed lineitem columns") {
    val p = plan("q1_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"))
  }

  test("embed top-k broadcasts the query set, not the corpus") {
    val p = plan("q_embed_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }
}
