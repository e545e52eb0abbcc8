package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Pipelines
import graft.sources.DeltaScan

/** Incremental ingestion with near-duplicate screening: in-batch and
  * cross-batch, exact and MinHash, against a persisted band index. */
class IngestNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): (String, String) = {
    val d = Files.createTempDirectory("graft_ndingest").toString
    (s"$d/corpus", s"$d/index")
  }

  private val base = (1 to 20).map(i => s"w$i").mkString(" ")
  private def variant(tail: String) = base.split(" ").dropRight(1).mkString(" ") + " " + tail
  // changing the final token of 20 leaves 15 of 18 shingles shared:
  // jaccard 15/21 ≈ 0.714 — above the 0.5 default

  test("in-batch: exact dups collapse, near-dups keep the cluster minimum") {
    val (corpus, index) = tmp()
    val batch = Seq(
      (1L, base),              // cluster min — survives
      (2L, base),              // exact dup of 1 — exact stage
      (3L, variant("zz")),     // near-dup of 1 — minhash stage
      (4L, "completely different words about gardens and weather today ok")
    ).toDF("doc_id", "text")
    val out = Pipelines.ingestIncrementNearDup(
      spark, corpus, index, batch, "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
    assert(DeltaScan.read(spark, corpus).count() == 2)
    // index holds bands+bases for exactly the ingested docs
    assert(DeltaScan.read(spark, s"$index/bases").select("id").as[Long]
      .collect().toSet == Set(1L, 4L))
  }

  test("in-batch transitive chain keeps only the minimum") {
    val (corpus, index) = tmp()
    // 1~2 and 2~3 overlap; 1~3 may not — closure must still collapse all
    val batch = Seq(
      (1L, base),
      (2L, variant("aa")),
      (3L, variant("aa").split(" ").drop(1).mkString(" ") + " bb")
    ).toDF("doc_id", "text")
    val out = Pipelines.ingestIncrementNearDup(
      spark, corpus, index, batch, "doc_id", "text")
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L))
    assert(!kept.contains(2L)) // direct near-dup of 1
  }

  test("cross-batch: near-dups of ingested docs drop without rescanning text") {
    val (corpus, index) = tmp()
    val b1 = Seq((1L, base)).toDF("doc_id", "text")
    Pipelines.ingestIncrementNearDup(spark, corpus, index, b1, "doc_id", "text")
    val b2 = Seq(
      (10L, variant("qq")),    // near-dup of corpus doc 1 — dropped
      (11L, base),             // exact dup of corpus doc 1 — dropped
      (12L, "entirely new content on cooking pasta with fresh basil leaves")
    ).toDF("doc_id", "text")
    val out = Pipelines.ingestIncrementNearDup(
      spark, corpus, index, b2, "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSet == Set(12L))
    assert(DeltaScan.read(spark, corpus).select("doc_id").as[Long]
      .collect().toSet == Set(1L, 12L))
    // second ingest appended index rows only for the kept doc
    assert(DeltaScan.read(spark, s"$index/bases").select("id").as[Long]
      .collect().toSet == Set(1L, 12L))
  }

  test("re-ingesting the same batch is a no-op") {
    val (corpus, index) = tmp()
    val b = Seq((1L, base), (2L, "other text entirely about gardens"))
      .toDF("doc_id", "text")
    Pipelines.ingestIncrementNearDup(spark, corpus, index, b, "doc_id", "text")
    val again = Pipelines.ingestIncrementNearDup(
      spark, corpus, index, b, "doc_id", "text")
    assert(again.count() == 0)
    assert(DeltaScan.read(spark, corpus).count() == 2)
  }
}
