package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Dev-only A/B: the two hottest native kernels — word-shingle hashing
  * (every dedup path) and char-n-gram langid scoring (every langid
  * pass) — with real `doGenCode` (static-invoke into
  * WholeStageCodegen) versus a `CodegenFallback` twin of the SAME
  * compute kernel. Isolates pure dispatch overhead: per-row interpreted
  * eval + InternalRow packing vs a direct generated call. Not library
  * code. */
object KernelBench {

  /** CodegenFallback twin of [[graft.plans.HashedWordShingles]] */
  case class FallbackShingles(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      TypeCheckResult.TypeCheckSuccess
    override def nullSafeEval(input: Any): Any =
      graft.plans.HashedWordShingles.compute(input.asInstanceOf[UTF8String], k)
    override protected def withNewChildInternal(newChild: Expression): FallbackShingles =
      copy(child = newChild)
  }

  /** CodegenFallback twin of [[graft.plans.CharNgramBuckets]] */
  case class FallbackBuckets(child: Expression, n: Int, nBuckets: Int, seed: String)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      TypeCheckResult.TypeCheckSuccess
    override def nullSafeEval(input: Any): Any =
      graft.plans.CharNgramBuckets.compute(
        input.asInstanceOf[UTF8String], n, nBuckets, seed)
    override protected def withNewChildInternal(newChild: Expression): FallbackBuckets =
      copy(child = newChild)
  }

  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val docs = (1 to 8).map(i => base.withColumn("rep", lit(i)))
      .reduce(_ unionAll _).repartition(32).cache()
    println(s"[kernel] corpus rows: ${docs.count()}")

    def time(label: String)(c: org.apache.spark.sql.Column): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        docs.select(c.as("x")).selectExpr("size(x) AS n").agg(sum("n")).collect()
        println(f"[kernel] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    def timeStr(label: String)(c: org.apache.spark.sql.Column): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        docs.select(c.as("x")).agg(count("x")).collect()
        println(f"[kernel] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    val text = GraftShim.expression(col("text"))
    time("shingles-codegen")(
      GraftShim.column(graft.plans.HashedWordShingles(text, 5)))
    time("shingles-fallback")(GraftShim.column(FallbackShingles(text, 5)))
    time("charngram-codegen")(
      GraftShim.column(graft.plans.CharNgramBuckets(text, 3, 2048, "graft")))
    time("charngram-fallback")(
      GraftShim.column(FallbackBuckets(text, 3, 2048, "graft")))

    // langid scorer over a small in-bench model (weights shape matches
    // the LangId gate: 4 langs × 2048 buckets)
    val langs = Seq("en", "de", "fr", "es")
    val priors = Array.fill(4)(0L)
    val rng = new scala.util.Random(7)
    val weights = Array.fill(4)(Array.fill(2048)(rng.nextInt(1000).toLong))
    timeStr("nbscore-codegen")(GraftShim.column(
      graft.plans.CharNgramNbScore(text, 3, 2048, "graft", langs, priors, weights)))
    spark.stop()
  }
}
