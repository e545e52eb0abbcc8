package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.DeltaScan

/** Built-in Delta Lake reader against hand-fabricated tables — the log
  * JSON is written per the public protocol spec, so what's tested is
  * the replay semantics, not a connector round-trip. */
class DeltaScanSpec extends SparkSpec {
  import spark.implicits._

  private val schemaJson =
    """{"type":"struct","fields":[
      |{"name":"id","type":"long","nullable":true,"metadata":{}},
      |{"name":"v","type":"string","nullable":true,"metadata":{}}]}"""
      .stripMargin.replaceAll("\n", "")

  private def metaAction(partCols: String = "[]", conf: String = "{}") =
    s"""{"metaData":{"id":"tbl-1","format":{"provider":"parquet","options":{}},
       |"schemaString":"${schemaJson.replace("\"", "\\\"")}",
       |"partitionColumns":$partCols,"configuration":$conf,"createdTime":1700000000000}}"""
      .stripMargin.replaceAll("\n", "")

  private val protoAction = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  /** Writes `df` as ONE parquet file at tableDir/relPath, returns its size. */
  private def writeDataFile(df: DataFrame, tableDir: Path, relPath: String): Long = {
    val tmp = Files.createTempDirectory("graft_delta_part").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    val dest = tableDir.resolve(relPath)
    Files.createDirectories(dest.getParent)
    Files.move(part, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.size(dest)
  }

  private def addAction(relPath: String, size: Long, pv: String = "{}") =
    s"""{"add":{"path":"$relPath","partitionValues":$pv,"size":$size,""" +
      """"modificationTime":1700000000000,"dataChange":true}}"""

  private def removeAction(relPath: String) =
    s"""{"remove":{"path":"$relPath","deletionTimestamp":1700000001000,"dataChange":true}}"""

  private def writeCommit(tableDir: Path, version: Long, actions: Seq[String]): Unit = {
    val log = tableDir.resolve("_delta_log")
    Files.createDirectories(log)
    Files.write(log.resolve(f"$version%020d.json"),
      actions.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  private def freshDir(name: String): Path = {
    val d = Files.createTempDirectory(name)
    d.toFile.deleteOnExit(); d
  }

  test("unpartitioned: add/remove replay, time travel, latestVersion") {
    val dir = freshDir("graft_delta_basic")
    val s0 = writeDataFile(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir, "f0.parquet")
    val s1 = writeDataFile(Seq((3L, "c")).toDF("id", "v"), dir, "f1.parquet")
    val s2 = writeDataFile(Seq((4L, "d")).toDF("id", "v"), dir, "f2.parquet")
    writeCommit(dir, 0, Seq(protoAction, metaAction(),
      addAction("f0.parquet", s0), addAction("f1.parquet", s1)))
    writeCommit(dir, 1, Seq(removeAction("f1.parquet"), addAction("f2.parquet", s2)))

    assert(DeltaScan.latestVersion(spark, dir.toString) == 1L)
    val now = DeltaScan.read(spark, dir.toString)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(now == Seq((1L, "a"), (2L, "b"), (4L, "d"))) // f1 removed
    val v0 = DeltaScan.read(spark, dir.toString, versionAsOf = Some(0L))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(v0 == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("hive-layout partitioned table: partition column from dirs, pruning-capable plan") {
    val dir = freshDir("graft_delta_part")
    val partSchema = """["v"]"""
    val s0 = writeDataFile(Seq(Tuple1(1L)).toDF("id"), dir, "v=x/f0.parquet")
    val s1 = writeDataFile(Seq(Tuple1(2L)).toDF("id"), dir, "v=y/f1.parquet")
    writeCommit(dir, 0, Seq(protoAction, metaAction(partCols = partSchema),
      addAction("v=x/f0.parquet", s0, pv = """{"v":"x"}"""),
      addAction("v=y/f1.parquet", s1, pv = """{"v":"y"}""")))
    val out = DeltaScan.read(spark, dir.toString)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "x"), (2L, "y")))
    // partition filter prunes to one file (PartitionFilters in scan)
    val plan = DeltaScan.read(spark, dir.toString).filter(col("v") === "x")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(v"))
  }

  test("non-hive partition layout: values injected from partitionValues map") {
    val dir = freshDir("graft_delta_flatpart")
    val s0 = writeDataFile(Seq(Tuple1(1L)).toDF("id"), dir, "fa.parquet")
    val s1 = writeDataFile(Seq(Tuple1(2L)).toDF("id"), dir, "fb.parquet")
    writeCommit(dir, 0, Seq(protoAction, metaAction(partCols = """["v"]"""),
      addAction("fa.parquet", s0, pv = """{"v":"x"}"""),
      addAction("fb.parquet", s1, pv = """{"v":"y"}""")))
    val out = DeltaScan.read(spark, dir.toString)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "x"), (2L, "y")))
  }

  test("checkpoint: replay starts from the checkpoint, later commits apply on top") {
    val dir = freshDir("graft_delta_cp")
    val s0 = writeDataFile(Seq((1L, "a")).toDF("id", "v"), dir, "f0.parquet")
    val s1 = writeDataFile(Seq((2L, "b")).toDF("id", "v"), dir, "f1.parquet")
    val s2 = writeDataFile(Seq((3L, "c")).toDF("id", "v"), dir, "f2.parquet")
    writeCommit(dir, 0, Seq(protoAction, metaAction(), addAction("f0.parquet", s0)))
    writeCommit(dir, 1, Seq(addAction("f1.parquet", s1)))

    // checkpoint at v1: protocol + metaData + live adds, as parquet
    val cpSchema = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("dataChange", BooleanType)))),
      StructField("remove", StructType(Seq(StructField("path", StringType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType))))),
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType))))))
    val schemaStr = schemaJson
    val rows = Seq(
      Row(Row("f0.parquet", Map.empty[String, String], s0, true), null, null, null),
      Row(Row("f1.parquet", Map.empty[String, String], s1, true), null, null, null),
      Row(null, null, Row("tbl-1", schemaStr, Seq.empty[String], Map.empty[String, String]), null),
      Row(null, null, null, Row(1)))
    val tmp = Files.createTempDirectory("graft_delta_cpw").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), cpSchema)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp))
      .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
    val log = dir.resolve("_delta_log")
    Files.move(part, log.resolve(f"${1L}%020d.checkpoint.parquet"))
    Files.write(log.resolve("_last_checkpoint"),
      """{"version":1,"size":4}""".getBytes(StandardCharsets.UTF_8))
    // simulate log cleanup: delete the pre-checkpoint commits
    Files.delete(log.resolve(f"${0L}%020d.json"))
    Files.delete(log.resolve(f"${1L}%020d.json"))
    // a post-checkpoint commit removes f0 and adds f2
    writeCommit(dir, 2, Seq(removeAction("f0.parquet"), addAction("f2.parquet", s2)))

    val out = DeltaScan.read(spark, dir.toString)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "b"), (3L, "c")))
  }

  test("unsupported features fail loudly: column mapping, deletion vectors") {
    val dir = freshDir("graft_delta_unsup")
    val s0 = writeDataFile(Seq((1L, "a")).toDF("id", "v"), dir, "f0.parquet")
    writeCommit(dir, 0, Seq(protoAction,
      metaAction(conf = """{"delta.columnMapping.mode":"name"}"""),
      addAction("f0.parquet", s0)))
    val e1 = intercept[IllegalArgumentException] { DeltaScan.read(spark, dir.toString) }
    assert(e1.getMessage.contains("column mapping"))

    val dir2 = freshDir("graft_delta_dv")
    val s1 = writeDataFile(Seq((1L, "a")).toDF("id", "v"), dir2, "f0.parquet")
    val dvAdd = s"""{"add":{"path":"f0.parquet","partitionValues":{},"size":$s1,""" +
      """"modificationTime":1,"dataChange":true,""" +
      """"deletionVector":{"storageType":"u","pathOrInlineDv":"x","offset":1,"sizeInBytes":1,"cardinality":1}}}"""
    writeCommit(dir2, 0, Seq(protoAction, metaAction(), dvAdd))
    val e2 = intercept[IllegalArgumentException] { DeltaScan.read(spark, dir2.toString) }
    assert(e2.getMessage.contains("deletion vectors"))
  }

  test("Tidier.read(format=delta) falls back to the built-in reader without a connector") {
    val dir = freshDir("graft_delta_tidier")
    val s0 = writeDataFile(Seq((7L, "z")).toDF("id", "v"), dir, "f0.parquet")
    writeCommit(dir, 0, Seq(protoAction, metaAction(), addAction("f0.parquet", s0)))
    val out = Tidier.read(spark, dir.toString, "delta").df
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((7L, "z")))
  }
}
