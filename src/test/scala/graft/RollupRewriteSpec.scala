package graft

import org.apache.spark.sql.functions._
import graft.operators.Rollup
import graft.plans.RollupRewriteRule
import graft.sources.{DeltaScan, DeltaWrite}

/** The materialized-rollup rewrite: serves eligible aggregations from
  * the rollup, refuses every shape whose semantics it cannot prove. */
class RollupRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def freshPaths(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft_rwr").toString
    (s"$root/corpus", s"$root/rollup")
  }

  private def corpusDf = Seq(
    ("en", 10L, 1.5), ("en", 20L, 2.5), ("de", 5L, 0.5), ("fr", 7L, 1.0)
  ).toDF("lang", "tokens", "score")

  private def plansOverRollup(df: org.apache.spark.sql.DataFrame, rollupPath: String): Boolean = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten.exists(_.contains(rollupPath))
  }

  test("eligible count+sum groupBy is served from the rollup, results exact") {
    val (corpus, rollup) = freshPaths()
    DeltaWrite.create(spark, corpusDf, corpus)
    Rollup.build(spark, corpus, rollup, Seq("lang"), Seq("tokens"))
    RollupRewriteRule.install(spark)
    RollupRewriteRule.register(corpus, rollup)
    try {
      val q = DeltaScan.read(spark, corpus)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("tokens").as("t"))
      assert(plansOverRollup(q, rollup), q.queryExecution.optimizedPlan.toString)
      val got = q.orderBy("lang").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == Seq(("de", 1L, 5L), ("en", 2L, 30L), ("fr", 1L, 7L)))
      assert(q.schema.map(_.name) == Seq("lang", "n", "t"))

      // no-key-subset case: global count over group subset (empty keys)
      // is NOT a key attr list → untouched, still correct
      val global = DeltaScan.read(spark, corpus).agg(count(lit(1)).as("n"))
      assert(global.head().getLong(0) == 4L)
      // Count semantics survive the rewrite: the served count column is
      // non-nullable and never NULL (the Sum(n_rows) rewrite wraps in
      // Coalesce(..., 0) so nullability and empty-input value match)
      assert(!q.schema("n").nullable,
        "rewritten count flipped to nullable — Coalesce(Sum, 0) missing")
      assert(q.collect().forall(!_.isNullAt(1)))
    } finally RollupRewriteRule.clear()
  }

  test("stale rollup disables the rewrite; maintain re-enables it") {
    val (corpus, rollup) = freshPaths()
    DeltaWrite.create(spark, corpusDf, corpus)
    Rollup.build(spark, corpus, rollup, Seq("lang"), Seq("tokens"))
    RollupRewriteRule.install(spark)
    RollupRewriteRule.register(corpus, rollup)
    try {
      DeltaWrite.append(spark, Seq(("en", 100L, 9.0)).toDF("lang", "tokens", "score"), corpus)
      val q1 = DeltaScan.read(spark, corpus)
        .groupBy("lang").agg(sum("tokens").as("t"))
      assert(!plansOverRollup(q1, rollup))
      assert(q1.filter(col("lang") === "en").head().getLong(1) == 130L) // correct anyway
      Rollup.maintain(spark, corpus, rollup)
      val q2 = DeltaScan.read(spark, corpus)
        .groupBy("lang").agg(sum("tokens").as("t"))
      assert(plansOverRollup(q2, rollup), q2.queryExecution.optimizedPlan.toString)
      assert(q2.filter(col("lang") === "en").head().getLong(1) == 130L)
    } finally RollupRewriteRule.clear()
  }

  test("ineligible shapes are never rewritten") {
    val (corpus, rollup) = freshPaths()
    DeltaWrite.create(spark, corpusDf, corpus)
    DeltaWrite.append(spark, Seq(("zz", 1L, 0.0)).toDF("lang", "tokens", "score"), corpus)
    Rollup.build(spark, corpus, rollup, Seq("lang"), Seq("tokens"))
    RollupRewriteRule.install(spark)
    RollupRewriteRule.register(corpus, rollup)
    try {
      // time travel reads a different file set
      val tt = DeltaScan.read(spark, corpus, versionAsOf = Some(0L))
        .groupBy("lang").agg(count(lit(1)).as("n"))
      assert(!plansOverRollup(tt, rollup))
      assert(tt.count() == 3L) // v0 had 3 langs
      // double sums are order-observable → untouched
      val dbl = DeltaScan.read(spark, corpus)
        .groupBy("lang").agg(sum("score").as("s"))
      assert(!plansOverRollup(dbl, rollup))
      // distinct counts are not maintainable → untouched
      val dist = DeltaScan.read(spark, corpus)
        .groupBy("lang").agg(countDistinct("tokens").as("d"))
      assert(!plansOverRollup(dist, rollup))
      // a filtered corpus is not the full live set → untouched
      val filt = DeltaScan.read(spark, corpus)
        .filter(col("tokens") > 5L).groupBy("lang").agg(count(lit(1)).as("n"))
      assert(!plansOverRollup(filt, rollup))
      // count(NULL) is always 0, never n_rows → untouched AND correct
      val cn = DeltaScan.read(spark, corpus)
        .groupBy("lang").agg(count(lit(null)).as("n"))
      assert(!plansOverRollup(cn, rollup))
      assert(cn.collect().forall(_.getLong(1) == 0L))
      // empty funnel report: zero counts, no NPE (Events regression)
      val emptyRep = graft.operators.Events.funnelReport(
        graft.operators.Events.funnel(
          Seq.empty[(Long, Long, java.sql.Timestamp, String)]
            .toDF("event_id", "user_id", "ts", "event_type"),
          "user_id", "ts", "event_type", Seq("a", "b")),
        Seq("a", "b"))
      assert(emptyRep.collect().map(_.getLong(2)).toSeq == Seq(0L, 0L))
      // unregistered corpus → untouched even when shapes match
      RollupRewriteRule.clear()
      val off = DeltaScan.read(spark, corpus)
        .groupBy("lang").agg(count(lit(1)).as("n"))
      assert(!plansOverRollup(off, rollup))
    } finally RollupRewriteRule.clear()
  }
}
