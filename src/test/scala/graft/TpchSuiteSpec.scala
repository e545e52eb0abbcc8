package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape and semantic checks for the completed TPC-H suite
  * (value correctness is driver-gated vs DuckDB per query; these
  * pin the SCALE properties the oracle can't see). */
class TpchSuiteSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf001)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("every TPC-H query returns rows at sf0.001") {
    for (n <- TpchSuite.queries.keys.toSeq.sorted) {
      val rows = SparkEntry.queries(n)(spark, sf001).count()
      assert(rows > 0, s"$n returned 0 rows")
    }
  }

  test("dimension joins broadcast: q7's two nation roles are broadcast joins") {
    val p = plan("q_tpch_q7")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("scalar thresholds are one-row broadcast joins, never a driver collect") {
    // the BroadcastNestedLoopJoin against a 1-row aggregate IS the
    // intended shape (O(n) pass over a broadcast scalar); what must
    // NOT appear is a shuffled CartesianProduct
    for (n <- Seq("q_tpch_q11a", "q_tpch_q20a", "q_tpch_q22a", "q_tpch_q15")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n plans a CartesianProduct")
    }
  }

  test("EXISTS/NOT EXISTS compile to semi/anti joins (q4a, q21a)") {
    assert(plan("q_tpch_q4a").contains("LeftSemi"))
    val p21 = plan("q_tpch_q21a")
    assert(p21.contains("LeftSemi") && p21.contains("LeftAnti"))
  }

  test("q13 keeps zero-order customers (left join, count of non-null)") {
    val df = SparkEntry.queries("q_tpch_q13")(spark, sf001)
    val byCount = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sf0.001: 150 customers, 1500 orders — every count bucket must be
    // represented in the distribution's total
    assert(byCount.values.sum == 150L)
  }

  test("q15 ties: every max-revenue supplier appears (equality, not limit 1)") {
    val df = SparkEntry.queries("q_tpch_q15")(spark, sf001)
    val revs = df.collect().map(_.getDouble(2)).distinct
    assert(revs.length == 1, "all surviving rows share the max revenue")
  }

  test("q17's correlated avg decorrelates to a per-part aggregate join") {
    val p = plan("q_tpch_q17")
    // one aggregate on the part key feeding a join — no per-row
    // re-aggregation, no nested-loop
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }
}
