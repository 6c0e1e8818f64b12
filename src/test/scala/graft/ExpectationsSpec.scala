package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Expectations
import graft.operators.Expectations.Check._

/** [[graft.operators.Expectations]] — declarative constraint
  * verification: exact violation counters per check type, declaration
  * ordering, and the one-aggregation-per-table shape. */
class ExpectationsSpec extends AnyFunSuite with SparkSessionTestBase {

  test("each check type counts violations exactly") {
    import spark.implicits._
    val child = Seq(
      (Some(1L), Some(1), 5.0, "A"),  // clean
      (Some(1L), Some(1), 5.0, "A"),  // duplicate key of row 1
      (Some(2L), Some(1), -1.0, "B"), // below range
      (Some(3L), Some(2), 99.0, "C"), // above range, value C not accepted
      (None, Some(3), 5.0, "A"),      // null id (skipped by range/unique)
      (Some(9L), None, 5.0, "A"))     // orphan id 9; null k2 skips unique
      .toDF("id", "k2", "v", "s")
    val parent = Seq(1L, 2L, 3L).toDF("pid")
    val out = Expectations.verify(
      Map("child" -> child, "parent" -> parent),
      Seq(
        "child" -> NotNull("id"),
        "child" -> Unique(Seq("id", "k2")),
        "child" -> InRange("v", 0.0, 10.0),
        "child" -> AcceptedValues("s", Seq("A", "B")),
        "child" -> ForeignKey("id", "parent", "pid")))
      .collect().map(r => (r.getInt(0), r.getString(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq === Seq(
      (1, "not_null(id)", 6L, 1L, false),
      (2, "unique(id,k2)", 4L, 1L, false),
      (3, "in_range(v,0.0,10.0)", 6L, 2L, false),
      (4, "accepted_values(s,A|B)", 6L, 1L, false),
      (5, "foreign_key(id->parent.pid)", 5L, 1L, false)))
  }

  test("clean data passes every check; unknown tables fail loudly") {
    import spark.implicits._
    val t = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val out = Expectations.verify(Map("t" -> t), Seq(
        "t" -> NotNull("id"), "t" -> Unique(Seq("id")),
        "t" -> InRange("id", 1.0, 2.0),
        "t" -> AcceptedValues("s", Seq("x", "y")),
        "t" -> ForeignKey("id", "t", "id")))
      .collect()
    assert(out.length === 5)
    assert(out.forall(_.getBoolean(5)))
    assert(out.forall(_.getLong(4) === 0L))
    intercept[IllegalArgumentException] {
      Expectations.verify(Map("t" -> t), Seq("nope" -> NotNull("id")))
    }
    intercept[IllegalArgumentException] {
      Expectations.verify(Map("t" -> t),
        Seq("t" -> ForeignKey("id", "nope", "id")))
    }
  }

  test("the driver battery verdicts are internally consistent on the fixture") {
    val out = SparkEntry.queries("q_expectations")(spark, sfDir).collect()
    assert(out.map(_.getInt(0)).toSeq === (1 to out.length).toSeq)
    out.foreach { r =>
      assert(r.getLong(4) >= 0L && r.getLong(4) <= r.getLong(3))
      assert((r.getLong(4) == 0L) === r.getBoolean(5))
    }
    // the synthetic builder emits duplicate (l_orderkey, l_linenumber)
    // pairs — the uniqueness row must demonstrate a REAL failure
    val uniq = out.find(_.getString(2).startsWith("unique(l_orderkey")).get
    assert(!uniq.getBoolean(5) && uniq.getLong(4) > 0L)
    // referential integrity holds in the generated data
    out.filter(_.getString(2).startsWith("foreign_key"))
      .foreach(r => assert(r.getBoolean(5), r.getString(2)))
  }

  test("merged partials serve verify()'s exact verdicts across loads") {
    import spark.implicits._
    val checks = Seq(
      "t" -> NotNull("id"),
      "t" -> Unique(Seq("id")),
      "t" -> InRange("v", 0.0, 10.0),
      "t" -> ForeignKey("id", "p", "pid"))
    // load 1: id 9 is an ORPHAN (parent 9 hasn't arrived); id 1 clean
    val t1 = Seq((Some(1L), 5.0), (Some(9L), 5.0), (None, 99.0)).toDF("id", "v")
    val p1 = Seq(1L, 2L).toDF("pid")
    // load 2: id 1 DUPLICATES load 1's (cross-load dup — invisible to
    // either load alone); parent 9 arrives and RESOLVES the orphan
    val t2 = Seq((Some(1L), 5.0), (Some(2L), -3.0)).toDF("id", "v")
    val p2 = Seq(9L).toDF("pid")
    val merged = Expectations.mergePartials(Seq(
      Expectations.partials(Map("t" -> t1, "p" -> p1), checks),
      Expectations.partials(Map("t" -> t2, "p" -> p2), checks)))
    val served = Expectations.serveVerdicts(merged, checks)
      .collect().map(_.toString).toSeq
    val full = Expectations.verify(
        Map("t" -> t1.unionByName(t2), "p" -> p1.unionByName(p2)), checks)
      .collect().map(_.toString).toSeq
    assert(served === full)
    // the cross-load facts really are in the verdicts: one dup (id 1),
    // one range violation, one null, zero orphans after resolution
    val byLabel = Expectations.serveVerdicts(merged, checks)
      .collect().map(r => r.getString(2) -> r.getLong(4)).toMap
    assert(byLabel("unique(id)") === 1L)
    assert(byLabel("in_range(v,0.0,10.0)") === 2L) // 99.0 and -3.0
    assert(byLabel("not_null(id)") === 1L)
    assert(byLabel("foreign_key(id->p.pid)") === 0L)
    // per-load verification alone misses the cross-load duplicate
    val solo1 = Expectations.serveVerdicts(
      Expectations.partials(Map("t" -> t1, "p" -> p1), checks), checks)
      .collect().map(r => r.getString(2) -> r.getLong(4)).toMap
    assert(solo1("unique(id)") === 0L)
    assert(solo1("foreign_key(id->p.pid)") === 1L) // orphan before load 2
    // re-merging the merged state is idempotent for the parent key set
    val twice = Expectations.serveVerdicts(
      Expectations.mergePartials(Seq(merged,
        Expectations.partials(
          Map("t" -> t1.limit(0), "p" -> p2), checks))), checks)
      .collect().map(_.toString).toSeq
    assert(twice === served)
  }

  test("artifact-served verdicts bit-equal the inline incremental form") {
    // q_expectations_indexed folds tonight's delta into the PERSISTED
    // base partials; the inline form rebuilds both halves. Same
    // verdicts, bit-for-bit — and both equal the full verify() (the
    // driver oracle proves that independently at every SF)
    val inline = SparkEntry.queries("q_expectations_incremental")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val served = SparkEntry.queries("q_expectations_indexed")(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(served === inline)
    val full = SparkEntry.queries("q_expectations")(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(served === full)
    // the artifact is kind-partitioned and the split server filters
    // each branch BEFORE any union, so the kind predicate reaches the
    // artifact scan as a PARTITION filter — file pruning, plan-locked
    // (the old merge-then-checkpoint path read every partition for
    // every branch)
    val plan = SparkEntry.queries("q_expectations_indexed")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [kind"),
      s"expected a kind partition filter on the partials artifact scan:\n$plan")
  }

  test("a malformed check fails at construction, not at verify time") {
    // names are interpolated into stack/oracle SQL — a quoted or
    // spaced identifier must be rejected at the DECLARATION
    intercept[IllegalArgumentException](NotNull("bad name"))
    intercept[IllegalArgumentException](InRange("x'; DROP", 0, 1))
    intercept[IllegalArgumentException](Unique(Seq("ok", "not ok")))
    intercept[IllegalArgumentException](ForeignKey("c", "par ent", "k"))
    intercept[IllegalArgumentException](AcceptedValues("c", Seq.empty))
    // AcceptedValues VALUES are free-form — a quote-bearing value must
    // flow through verify and its label unharmed (escaped, not broken)
    import spark.implicits._
    val t = Seq("it's", "fine").toDF("s")
    val out = Expectations.verify(Map("t" -> t),
      Seq("t" -> AcceptedValues("s", Seq("it's")))).collect()
    assert(out.head.getString(2) === "accepted_values(s,it's)")
    assert(out.head.getLong(4) === 1L) // "fine" violates
    // backslash-bearing values too: Spark's literal parser interprets
    // \-escapes (DuckDB's does not), so the Spark-side interpolation
    // must double them or the label diverges between the engines
    val t2 = Seq("a\\nb", "other").toDF("s")
    val out2 = Expectations.verify(Map("t2" -> t2),
      Seq("t2" -> AcceptedValues("s", Seq("a\\nb")))).collect()
    assert(out2.head.getString(2) === "accepted_values(s,a\\nb)")
    assert(out2.head.getLong(4) === 1L) // "other" violates
  }

  test("empty tables verify without error") {
    import spark.implicits._
    val e = Seq.empty[(Option[Long], String)].toDF("id", "s")
    val out = Expectations.verify(Map("e" -> e), Seq(
        "e" -> NotNull("id"), "e" -> Unique(Seq("id")),
        "e" -> InRange("id", 0.0, 1.0), "e" -> ForeignKey("id", "e", "id")))
      .collect()
    assert(out.length === 4)
    assert(out.forall(r => r.getLong(3) === 0L && r.getLong(4) === 0L
      && r.getBoolean(5)))
  }
}
