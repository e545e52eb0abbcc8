package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.{Dedup, Pipelines}

/** Dev-only stage profiler for the composed cleanCorpus pipeline — not
  * library code. Times each stage in isolation (forced with count) and
  * the full composition, to attribute q_pipeline_clean's wall time. */
object PipelineProfile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val quality = time("quality+langid filter (count)")(
        docs.filter(TextFns.qualityScore(col("text")) >= 0.5)
          .filter(TextFns.langId(col("text")).isin("en")))
      time("  forced")(quality.count())
      val exact = Dedup.exactDedup(quality, "doc_id", Seq("text"))
      time("exactDedup (count)")(exact.count())
      val filtered = exact.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def release(): Unit = { filtered.unpersist(); () }
      time("materialize filtered")(filtered.count())
      val pairsAuto = Dedup.minHashDupPairs(filtered, "doc_id", "text",
        shingleSize = 3, numHashes = 12, bands = 6, threshold = 0.4,
        materialize = Dedup.Materialize.Cache, saltBuckets = 0)
      time("minHashDupPairs saltAuto (count)")(pairsAuto.count())
      pairsAuto.unpersist()
      val pairsNoSalt = Dedup.minHashDupPairs(filtered, "doc_id", "text",
        shingleSize = 3, numHashes = 12, bands = 6, threshold = 0.4,
        materialize = Dedup.Materialize.Cache, saltBuckets = 1)
      time("minHashDupPairs salt=1 (count)")(pairsNoSalt.count())
      val clusters = time("dupClustersClosure")(
        Dedup.dupClustersClosure(pairsNoSalt))
      time("  clusters count")(clusters.count())
      pairsNoSalt.unpersist()
      val survivors = filtered.join(
        clusters.filter(col("id") =!= col("rep")).select(col("id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      time("left_anti survivors (count)")(survivors.count())
      release()
      time("FULL cleanCorpus")(
        Pipelines.cleanCorpus(docs, "doc_id", "text",
          minQuality = 0.5, langs = Seq("en"), jaccardThreshold = 0.4).count())
    }
    spark.stop()
  }
}
