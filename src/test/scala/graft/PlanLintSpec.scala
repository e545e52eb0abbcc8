package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tools.PlanLint

/** The plan lint must flag each scale-killer shape and stay quiet on
  * the engine's own (deliberately chosen) plans. */
class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 100L).map(i => (i, s"t$i", i % 7)).toDF("id", "s", "k")

  test("flags a cartesian product; quiet on a keyed join") {
    val cross = docs.as("a").crossJoin(docs.as("b"))
    assert(PlanLint.lint(cross).exists(_.rule == "cartesian-product"))
    val keyed = docs.as("a").join(docs.as("b"), "k")
    assert(!PlanLint.lint(keyed).exists(_.rule == "cartesian-product"))
  }

  test("flags a global window; quiet on a partitioned one") {
    val global = docs.withColumn("rn", row_number().over(Window.orderBy("id")))
    assert(PlanLint.lint(global).exists(_.rule == "global-window"))
    val part = docs.withColumn("rn",
      row_number().over(Window.partitionBy("k").orderBy("id")))
    assert(!PlanLint.lint(part).exists(_.rule == "global-window"))
  }

  test("flags a single-partition exchange; quiet on hash exchange") {
    val single = docs.repartition(1).groupBy("k").count()
    val hash = docs.groupBy("k").count()
    assert(PlanLint.lint(single).exists(_.rule == "single-partition-exchange"))
    assert(!PlanLint.lint(hash).exists(_.rule == "single-partition-exchange"))
  }

  test("flags lost parquet pushdown; quiet when the filter pushed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lint").toString
    docs.write.mode("overwrite").parquet(dir)
    val t = spark.read.parquet(dir)
    // cast around the column defeats pushdown
    val lost = t.filter(col("id").cast("string") === "5")
    assert(PlanLint.lint(lost).exists(_.rule == "unpushed-scan-filter"),
      lost.queryExecution.executedPlan.toString)
    val pushed = t.filter(col("id") === 5L)
    assert(!PlanLint.lint(pushed).exists(_.rule == "unpushed-scan-filter"))
    // inherently un-pushable predicates (arithmetic/function wrappers)
    // are NOT lost pushdown — parquet source filters can never express
    // them, so they must stay quiet (sf1-bench false-positive class)
    val modulo = t.filter(col("id") % 20 =!= 0)
    assert(!PlanLint.lint(modulo).exists(_.rule == "unpushed-scan-filter"),
      modulo.queryExecution.executedPlan.toString)
    val fn = t.filter(length(col("k")) > 0)
    assert(!PlanLint.lint(fn).exists(_.rule == "unpushed-scan-filter"))
    // ...while a cast-wrapped column in the SAME plan still flags
    val mixed = t.filter(col("id") % 20 =!= 0 && col("id").cast("string") === "5")
    assert(PlanLint.lint(mixed).exists(_.rule == "unpushed-scan-filter"))
  }

  test("flags an unpartitioned JDBC scan; quiet on a range-partitioned one") {
    System.setProperty("derby.stream.error.file", "/tmp/graft_derby_lint.log")
    val url = "jdbc:derby:memory:graft_lint_" +
      java.util.UUID.randomUUID().toString.replace("-", "") + ";create=true"
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")
    graft.sources.JdbcWrite.write(df, url, "t", mode = "overwrite",
      options = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    val single = Tidier.readJdbc(spark, url, "t").df
    assert(PlanLint.lint(single).exists(_.rule == "single-partition-jdbc-scan"),
      single.queryExecution.executedPlan.toString)
    val ranged = Tidier.readJdbc(spark, url, "t", "id", 1L, 21L, 4).df
    assert(!PlanLint.lint(ranged).exists(_.rule == "single-partition-jdbc-scan"))
  }

  test("the engine's own composed pipelines lint clean") {
    val d = (1L to 50L).map(i => (i, s"some words here number $i")).toDF("doc_id", "text")
    val prep = graft.operators.Chunking.chunkBySentences(
      graft.functions.TextFns.dropBlockedTerms(d, "text", Seq("zzz")), "text", 16)
    assert(PlanLint.lint(prep).isEmpty, PlanLint.lint(prep).mkString("; "))
  }

  test("sink-collect detector: repo sources are clean; a naked sink collect is flagged") {
    // every .collect() under graft/sources/ must justify its bound —
    // this is the mechanized form of the ArrowWrite.write review
    // finding (whole-frame driver collect in a sink)
    val root = java.nio.file.Paths.get("src/main/scala/graft/sources")
    assume(java.nio.file.Files.isDirectory(root))
    val findings = PlanLint.lintSinkCollects(root)
    assert(findings.isEmpty, findings.mkString("; "))
    // and the detector actually fires on the pattern it guards against
    val tmp = java.nio.file.Files.createTempDirectory("lint_sink")
    java.nio.file.Files.write(tmp.resolve("BadWrite.scala"),
      "object BadWrite { def write(df: DataFrame) = df.collect().foreach(emit) }"
        .getBytes("UTF-8"))
    val flagged = PlanLint.lintSinkCollects(tmp)
    assert(flagged.size == 1 && flagged.head.rule == "unbounded-sink-collect")
    // a [lint:bounded]-marked collect passes
    java.nio.file.Files.write(tmp.resolve("BadWrite.scala"),
      "object OkWrite { val x = df.limit(1).collect() // [lint:bounded] one row }"
        .getBytes("UTF-8"))
    assert(PlanLint.lintSinkCollects(tmp).isEmpty)
  }
}
