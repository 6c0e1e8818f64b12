package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout contract: one JSON line that survives the
  * harness's stdout tail cap at ANY query count — the property that
  * silently broke in rounds 1-3 (parsed: null) and must not regress
  * as operators keep being added. */
class BenchLineSpec extends AnyFunSuite {

  private def results(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => f"q_some_fairly_long_query_name_$i%03d" -> i * 0.137)

  private def parseable(line: String): Boolean =
    line.startsWith("{") && line.endsWith("}") &&
      line.contains("\"metric\":\"total\"") && line.contains("\"queries\":{")

  test("stdout line stays under the tail budget at any query count") {
    for (n <- Seq(1, 40, 85, 120, 200, 500)) {
      val rs = results(n)
      val line = Bench.stdoutLine(rs, rs.map(_._2).sum, "sf0.1")
      assert(line.length <= Bench.MaxLine, s"n=$n length=${line.length}")
      assert(parseable(line), s"n=$n")
    }
  }

  test("small result sets keep full 3-decimal per-query detail") {
    val rs = results(40)
    val line = Bench.stdoutLine(rs, rs.map(_._2).sum, "sf0.1")
    assert(line === Bench.fullLine(rs, rs.map(_._2).sum, "sf0.1", 3))
    assert(!line.contains("_rest"))
  }

  test("oversized result sets keep the slowest queries and fold the rest") {
    val rs = results(200)
    val line = Bench.stdoutLine(rs, rs.map(_._2).sum, "sf0.1")
    assert(line.contains("\"_rest\":"))
    // the single slowest query must survive individually
    assert(line.contains("q_some_fairly_long_query_name_200"))
    // totals are preserved exactly regardless of representation
    assert(line.contains("\"value\":" + Bench.fmt(3, rs.map(_._2).sum)))
  }

  test("the build map rides the line when it fits and degrades before precision") {
    // realistic name lengths (the driver surface averages ~18 chars)
    def real(n: Int): Seq[(String, Double)] =
      (1 to n).map(i => f"q_entity_match_$i%03d" -> i * 0.137)
    val rs = real(40)
    val build = rs.sortBy(-_._2).take(10).map { case (k, _) => k -> 1.5 }
    val line = Bench.stdoutLine(rs, rs.map(_._2).sum, "sf0.1", build)
    assert(line.length <= Bench.MaxLine)
    assert(line.contains("\"build\":{"))
    assert(line.contains("\"q_entity_match_040\":1.500"))
    // at the full driver-surface count the split SURVIVES the
    // top-N fold (that is the point of publishing it)
    val big = real(210)
    val bigLine = Bench.stdoutLine(big, big.map(_._2).sum, "sf0.1",
      big.sortBy(-_._2).take(10).map { case (k, _) => k -> 1.5 })
    assert(bigLine.length <= Bench.MaxLine && parseable(bigLine))
    assert(bigLine.contains("\"build\":{"))
    // pathological name lengths still produce a fitting parseable line
    val long = results(500)
    val longLine = Bench.stdoutLine(long, long.map(_._2).sum, "sf0.1",
      long.sortBy(-_._2).take(10).map { case (k, _) => k -> 1.5 })
    assert(longLine.length <= Bench.MaxLine && parseable(longLine))
    // no build map → no build key (the pre-split line shape)
    assert(!Bench.stdoutLine(rs, rs.map(_._2).sum, "sf0.1").contains("\"build\""))
  }

  test("seed map rides the line as its own key, disjoint from build") {
    def real(n: Int): Seq[(String, Double)] =
      (1 to n).map(i => f"q_entity_match_$i%03d" -> i * 0.137)
    val rs = real(40)
    val build = Seq("q_entity_match_001" -> 1.5)
    val seed = Seq("q_entity_match_002" -> 0.7)
    val line = Bench.stdoutLine(rs, rs.map(_._2).sum, "sf0.1", build, seed)
    assert(line.length <= Bench.MaxLine && parseable(line))
    // two maps, two semantics: build is EXCLUDED from the median
    // (add them), seed sits INSIDE it (never add) — a consumer
    // summing median+build must not double-count a stream seed
    assert(line.contains("\"build\":{\"q_entity_match_001\":1.500}"))
    assert(line.contains("\"seed\":{\"q_entity_match_002\":0.700}"))
    // no seed map → no seed key
    assert(!Bench.stdoutLine(rs, rs.map(_._2).sum, "sf0.1", build)
      .contains("\"seed\""))
    // at the full driver-surface count both maps survive the fold
    val big = real(230)
    val bigLine = Bench.stdoutLine(big, big.map(_._2).sum, "sf0.1",
      big.sortBy(-_._2).take(8).map { case (k, _) => k -> 1.5 },
      big.sortBy(-_._2).drop(8).take(8).map { case (k, _) => k -> 0.7 })
    assert(bigLine.length <= Bench.MaxLine && parseable(bigLine))
    assert(bigLine.contains("\"build\":{") && bigLine.contains("\"seed\":{"))
  }

  test("values format with a dot decimal separator in any locale") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(Bench.fmt(3, 71.234) === "71.234")
    } finally java.util.Locale.setDefault(prev)
  }
}
