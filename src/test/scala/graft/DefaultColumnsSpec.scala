package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{DeltaScan, DeltaWrite, IcebergScan, IcebergWrite}

/** Column default values, both formats' semantics: Iceberg v3
  * initial-default (pre-column rows READ the default) + write-default
  * (omitted columns fill at write); Delta CURRENT_DEFAULT (write-time
  * only — pre-column rows stay NULL per the protocol). */
class DefaultColumnsSpec extends SparkSpec {

  private def base0 = {
    import spark.implicits._
    (1L to 12L).map(i => (i, s"t$i")).toDF("id", "text")
  }

  test("Iceberg: initial-default on pre-column rows, typed; write-default fills") {
    val dir = Files.createTempDirectory("graft_dflt_i").toString + "/t"
    IcebergWrite.create(spark, base0.repartition(2), dir)
    IcebergWrite.upgradeFormatVersion(spark, dir)
    IcebergWrite.addColumns(spark, dir,
      Seq(StructField("tag", StringType), StructField("score", LongType),
        StructField("w", DoubleType), StructField("ok", BooleanType),
        StructField("d", DateType), StructField("ts", TimestampType)),
      Map("tag" -> "legacy", "score" -> 7L, "w" -> 1.5,
        "ok" -> java.lang.Boolean.TRUE,
        "d" -> java.sql.Date.valueOf("2024-02-29"),
        "ts" -> java.sql.Timestamp.valueOf("2024-02-29 12:00:00")))
    val r = IcebergScan.read(spark, dir).filter(col("id") === 1L).head()
    assert(r.getAs[String]("tag") == "legacy")
    assert(r.getAs[Long]("score") == 7L)
    assert(r.getAs[Double]("w") == 1.5)
    assert(r.getAs[Boolean]("ok"))
    assert(r.getAs[java.sql.Date]("d") == java.sql.Date.valueOf("2024-02-29"))
    assert(r.getAs[java.sql.Timestamp]("ts") ==
      java.sql.Timestamp.valueOf("2024-02-29 12:00:00"))

    // explicit append: stored values win over every default
    import spark.implicits._
    val explicit = Seq((100L, "x", "mine", 1L, 0.5, false,
      java.sql.Date.valueOf("2020-01-01"),
      java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      .toDF("id", "text", "tag", "score", "w", "ok", "d", "ts")
    IcebergWrite.append(spark, explicit, dir)
    // omitted columns: write-default fills at write time
    IcebergWrite.append(spark, Seq((200L, "y")).toDF("id", "text"), dir)

    val byId = IcebergScan.read(spark, dir)
      .select("id", "tag", "score").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(byId(1L) == (("legacy", 7L)))
    assert(byId(100L) == (("mine", 1L)))
    assert(byId(200L) == (("legacy", 7L)))
    assert(IcebergScan.read(spark, dir).count() == 14)

    // a default-filled append with an UNDECLARED extra column must
    // still fail loudly — filling 'score' must not silently swallow
    // the caller's 'bogus' data
    val err = intercept[IllegalArgumentException] {
      IcebergWrite.append(spark,
        Seq((300L, "z", 9L)).toDF("id", "text", "bogus"), dir)
    }
    assert(err.getMessage.contains("does not match"))
    assert(IcebergScan.read(spark, dir).count() == 14, "nothing committed")
  }

  test("Iceberg: defaults refuse below format-version 3") {
    val dir = Files.createTempDirectory("graft_dflt_i2").toString + "/t"
    IcebergWrite.create(spark, base0, dir)
    intercept[IllegalArgumentException] {
      IcebergWrite.addColumns(spark, dir,
        Seq(StructField("tag", StringType)), Map("tag" -> "x"))
    }
    // without defaults the add still works on v2
    IcebergWrite.addColumns(spark, dir, Seq(StructField("tag", StringType)))
    assert(IcebergScan.read(spark, dir)
      .filter(col("tag").isNotNull).count() == 0)
  }

  test("Iceberg: compaction materializes defaults; DML sees them") {
    val dir = Files.createTempDirectory("graft_dflt_i3").toString + "/t"
    IcebergWrite.create(spark, base0.repartition(3), dir)
    IcebergWrite.upgradeFormatVersion(spark, dir)
    IcebergWrite.addColumns(spark, dir,
      Seq(StructField("tag", StringType)), Map("tag" -> "legacy"))
    // a delete whose predicate reads the DEFAULTED column
    assert(IcebergWrite.deleteWhere(spark, dir,
      col("tag") === "legacy" && col("id") > 10L) == 2L)
    IcebergWrite.compact(spark, dir, smallFileBytes = 1L << 30, targetFiles = 1)
    val out = IcebergScan.read(spark, dir).select("id", "tag").collect()
    assert(out.length == 10 && out.forall(_.getString(1) == "legacy"))
  }

  test("Delta: CURRENT_DEFAULT fills writes; pre-column rows stay NULL") {
    val dir = Files.createTempDirectory("graft_dflt_d").toString + "/t"
    DeltaWrite.create(spark, base0.repartition(2), dir)
    DeltaWrite.addColumns(spark, dir,
      Seq(StructField("tag", StringType), StructField("score", LongType)),
      Map("tag" -> "fresh", "score" -> 3L))
    import spark.implicits._
    DeltaWrite.append(spark, Seq((100L, "x")).toDF("id", "text"), dir)
    DeltaWrite.append(spark,
      Seq((101L, "y", "mine", 9L)).toDF("id", "text", "tag", "score"), dir)
    val byId = DeltaScan.read(spark, dir).select("id", "tag", "score").collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(1)), if (r.isNullAt(2)) scala.None else Some(r.getLong(2))))).toMap
    assert(byId(1L) == ((scala.None, scala.None)),
      "Delta defaults never rewrite history: pre-column rows read NULL")
    assert(byId(100L) == ((Some("fresh"), Some(3L))))
    assert(byId(101L) == ((Some("mine"), Some(9L))))
    // the protocol upgrade lists the writer feature
    val log = java.nio.file.Paths.get(dir, "_delta_log")
    val all = java.nio.file.Files.list(log).toArray.map(_.toString).sorted
      .map(p => new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8")).mkString
    assert(all.contains("allowColumnDefaults"))
    // exactly-once sink path fills too
    DeltaWrite.appendWithTxn(spark, Seq((102L, "z")).toDF("id", "text"), dir,
      "app", 1L)
    assert(DeltaScan.read(spark, dir).filter(col("id") === 102L)
      .head().getAs[String]("tag") == "fresh")
  }
}
