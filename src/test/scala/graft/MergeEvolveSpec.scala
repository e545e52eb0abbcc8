package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

import graft.sources.{DeltaScan, DeltaWrite, IcebergScan, IcebergWrite}

/** MERGE with automatic schema evolution on both formats: source-only
  * columns are added metadata-only (no rewrite of untouched files),
  * target-only columns keep their value on matched rows and take NULL
  * on inserts, and the evolved table keeps working for strict appends
  * and plain merges afterwards. */
class MergeEvolveSpec extends SparkSpec {

  private def docs0 = {
    import spark.implicits._
    (1L to 20L).map(i => (i, s"g${i % 3}", s"t$i")).toDF("id", "grp", "text")
  }

  private def source = {
    import spark.implicits._
    // updates ids 2..20 even (with a NEW column), inserts 101..103
    ((2L to 20L by 2L).map(i => (i, s"U$i", i * 10)) ++
      (101L to 103L).map(i => (i, s"N$i", i * 10)))
      .toDF("id", "text", "score")
  }

  private def expect: Seq[(Long, String, String, Option[Long])] =
    (1L to 20L).map { i =>
      if (i % 2 == 0) (i, s"g${i % 3}", s"U$i", Some(i * 10))
      else (i, s"g${i % 3}", s"t$i", None)
    } ++ (101L to 103L).map(i => (i, null: String, s"N$i", Some(i * 10)))

  private def check(actual: org.apache.spark.sql.DataFrame): Unit = {
    val got = actual.select("id", "grp", "text", "score").orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1),
        r.getString(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got == expect)
  }

  test("Delta mergeEvolve: adds score, keeps grp on matches, nulls on inserts") {
    val dir = Files.createTempDirectory("graft_me_d").toString + "/t"
    DeltaWrite.create(spark, docs0.repartition(3), dir)
    val (u, i) = DeltaWrite.mergeEvolve(spark, dir, source, Seq("id"))
    assert((u, i) == ((10L, 3L)))
    check(DeltaScan.read(spark, dir))
    // the evolved schema is the table schema now: strict appends carry it
    import spark.implicits._
    DeltaWrite.append(spark,
      Seq((200L, "g0", "x", 5L)).toDF("id", "grp", "text", "score"), dir)
    assert(DeltaScan.read(spark, dir).count() == 24)
    // a second mergeEvolve with NO new columns degrades to a plain merge
    val (u2, i2) = DeltaWrite.mergeEvolve(spark, dir,
      Seq((200L, "seen", 6L)).toDF("id", "text", "score"), Seq("id"))
    assert((u2, i2) == ((1L, 0L)))
    val r = DeltaScan.read(spark, dir).filter(col("id") === 200L).head()
    assert(r.getAs[String]("grp") == "g0" && r.getAs[String]("text") == "seen"
      && r.getAs[Long]("score") == 6L)
  }

  test("Delta addColumns is metadata-only and type-safe") {
    val dir = Files.createTempDirectory("graft_me_d2").toString + "/t"
    DeltaWrite.create(spark, docs0, dir)
    val before = DeltaScan.latestVersion(spark, dir)
    DeltaWrite.addColumns(spark, dir, Seq(StructField("score", LongType)))
    assert(DeltaScan.latestVersion(spark, dir) == before + 1)
    assert(DeltaScan.read(spark, dir).filter(col("score").isNotNull).count() == 0)
    intercept[IllegalArgumentException] {
      DeltaWrite.addColumns(spark, dir, Seq(StructField("score", LongType)))
    }
    // conflicting type on a shared column refuses
    intercept[IllegalArgumentException] {
      DeltaWrite.mergeEvolve(spark, dir,
        { import spark.implicits._
          Seq((1L, 1.5)).toDF("id", "score") }, Seq("id"))
    }
  }

  test("Iceberg mergeEvolve: same semantics, metadata-only schema bump") {
    val dir = Files.createTempDirectory("graft_me_i").toString + "/t"
    IcebergWrite.create(spark, docs0.repartition(3), dir)
    val vBefore = IcebergScan.latestMetadataVersion(spark, dir)
    val (u, i) = IcebergWrite.mergeEvolve(spark, dir, source, Seq("id"))
    assert((u, i) == ((10L, 3L)))
    check(IcebergScan.read(spark, dir))
    // addColumns bumped the metadata version without a new snapshot
    assert(IcebergScan.latestMetadataVersion(spark, dir) > vBefore)
    // fresh field id assigned after last-column-id
    val meta = {
      val v = IcebergScan.latestMetadataVersion(spark, dir)
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        Files.readAllBytes(java.nio.file.Paths.get(dir, "metadata", s"v$v.metadata.json")))
    }
    assert(meta.get("last-column-id").asInt() == 4)
    val names = meta.get("schema").get("fields").elements()
    var seen = Seq.empty[(String, Int)]
    while (names.hasNext) { val f = names.next(); seen :+= ((f.get("name").asText(), f.get("id").asInt())) }
    assert(seen == Seq(("id", 1), ("grp", 2), ("text", 3), ("score", 4)))
  }

  test("Iceberg mergeEvolve on a MOR table rides write.merge.mode") {
    val dir = Files.createTempDirectory("graft_me_i2").toString + "/t"
    IcebergWrite.create(spark, docs0, dir)
    IcebergWrite.setProperties(spark, dir, Map("write.merge.mode" -> "merge-on-read"))
    val (u, i) = IcebergWrite.mergeEvolve(spark, dir, source, Seq("id"))
    assert((u, i) == ((10L, 3L)))
    check(IcebergScan.read(spark, dir))
  }
}
