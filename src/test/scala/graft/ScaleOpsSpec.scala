package graft

import org.apache.spark.sql.functions._
import graft.operators.ScaleOps

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed table join on bucket keys plans without an exchange on either side") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "bv")
    ScaleOps.saveBucketed(a, "graft_bkt_a", Seq("k"), 4, Seq("k"))
    ScaleOps.saveBucketed(b, "graft_bkt_b", Seq("k"), 4, Seq("k"))
    val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), Seq("k"))
    assert(joined.count() == 1000)
    val plan = joined.queryExecution.executedPlan.toString
    // co-bucketed layout: no shuffle exchange anywhere in the join plan
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
    spark.sql("DROP TABLE graft_bkt_a"); spark.sql("DROP TABLE graft_bkt_b")
  }

  test("salted join preserves equi-join semantics") {
    // skewed large side: one hot key
    val large = ((1 to 900).map(_ => 1L) ++ (1 to 100).map(_.toLong))
      .toDF("k").withColumn("v", monotonically_increasing_id())
    val small = (1 to 100).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).count()
    val salted = ScaleOps.saltedInnerJoin(large, small, "k", buckets = 8).count()
    assert(salted == plain)
    // salt distributes the hot key across buckets
    val (l, _, _) = ScaleOps.saltedForJoin(large, small, "k", 8)
    val spread = l.filter(col("k") === 1L).select("__salt").distinct().count()
    assert(spread > 1)
  }
}
