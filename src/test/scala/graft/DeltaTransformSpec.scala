package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.sources.{DeltaScan, DeltaTransforms, DeltaWrite}

/** Delta generated-column partitioning — the hidden-partitioning twin:
  * `delta.generationExpression` metadata, derivation on every write
  * path, source-column pruning through partition values. */
class DeltaTransformSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def mkTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_delta_tr").toString + "/t"
    val df = Seq(
      (1L, ts("2021-03-05 10:00:00"), "alpha"),
      (2L, ts("2021-03-05 23:59:59"), "alpine"),
      (3L, ts("2021-03-06 00:00:01"), "beta"),
      (4L, ts("2021-04-01 12:00:00"), "bravo"),
      (5L, ts("2022-01-15 08:30:00"), "gamma")).toDF("id", "ts", "cat")
    DeltaWrite.create(spark, df, dir,
      partitionBy = Seq("day(ts)", "truncate(2, cat)"))
    dir
  }

  test("create records generationExpression metadata, derives hive dirs, reads back exactly") {
    val dir = mkTable()
    val got = DeltaScan.read(spark, dir)
    // derived columns are REAL schema columns (Delta's model), with the
    // generation expression in the DECLARED schema's field metadata
    // (partition DISCOVERY mints fresh attributes, so assert on the
    // log's schemaString — what every other engine reads)
    assert(got.columns.toSeq == Seq("id", "ts", "cat", "ts_day", "cat_trunc"))
    val metaLine = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "_delta_log", "00000000000000000000.json"))
      .asScala.find(_.contains("\"metaData\"")).get
    val declared = org.apache.spark.sql.types.DataType.fromJson(
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(metaLine)
        .get("metaData").get("schemaString").asText())
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val gens = DeltaTransforms.generatedFields(declared).map {
      case (f, sql) => f.name -> sql }.toMap
    assert(gens("ts_day") == "CAST(ts AS DATE)")
    assert(gens("cat_trunc") == "substring(cat, 1, 2)")
    // hive layout carries the derived values
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("ts_day=2021-03-05")), dirs.mkString(","))
    // values round-trip, derived values correct
    val rows = got.orderBy("id")
      .select("id", "ts", "cat", "ts_day", "cat_trunc").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(rows(0).getDate(3).toString == "2021-03-05" && rows(0).getString(4) == "al")
    assert(rows(4).getDate(3).toString == "2022-01-15" && rows(4).getString(4) == "ga")
  }

  test("appends derive the generated columns; caller-provided values are recomputed, never trusted") {
    val dir = mkTable()
    // source columns only — the hidden-partitioning UX
    DeltaWrite.append(spark,
      Seq((6L, ts("2021-03-05 11:00:00"), "alto")).toDF("id", "ts", "cat"), dir)
    // a LYING writer provides wrong derived values — recomputed
    DeltaWrite.append(spark,
      Seq((7L, ts("2021-03-06 09:00:00"), "bison", java.sql.Date.valueOf("1999-01-01"), "zz"))
        .toDF("id", "ts", "cat", "ts_day", "cat_trunc"), dir)
    val got = DeltaScan.read(spark, dir).filter(col("id") >= 6L)
      .select("id", "ts_day", "cat_trunc").orderBy("id").collect()
    assert(got(0).getDate(1).toString == "2021-03-05" && got(0).getString(2) == "al")
    assert(got(1).getDate(1).toString == "2021-03-06" && got(1).getString(2) == "bi")
  }

  test("source-column filters prune files through partition values — even with stats stripped") {
    val dir = mkTable()
    def dayCond = col("ts") >= lit(ts("2021-03-05 00:00:00")) &&
      col("ts") < lit(ts("2021-03-06 00:00:00"))
    val all = DeltaScan.read(spark, dir).inputFiles.toSet
    val kept = DeltaScan.read(spark, dir, skippingFilter = Some(dayCond)).inputFiles.toSet
    assert(kept.nonEmpty && kept.size < all.size, s"kept ${kept.size} of ${all.size}")
    assert(kept.forall(_.contains("ts_day=2021-03-05")))
    // truncate prefix pruning on the string source
    val ga = DeltaScan.read(spark, dir,
      skippingFilter = Some(col("cat") === "gamma")).inputFiles.toSet
    assert(ga.nonEmpty && ga.forall(_.contains("cat_trunc=ga")))

    // strip footer stats from the log — pruning must now come from the
    // PARTITION VALUES alone (the stats-less-file path: foreign writers)
    val logFile = java.nio.file.Paths.get(dir, "_delta_log",
      "00000000000000000000.json")
    val noStats = new String(java.nio.file.Files.readAllBytes(logFile), "UTF-8")
      .replaceAll(""","stats":"(\\.|[^"\\])*"""", "")
    assert(!noStats.contains("\"stats\""), "stats strip failed")
    java.nio.file.Files.write(logFile, noStats.getBytes("UTF-8"))
    // drop the stale hadoop-LocalFS checksum of the rewritten log file
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir,
      "_delta_log", ".00000000000000000000.json.crc"))
    val kept2 = DeltaScan.read(spark, dir, skippingFilter = Some(dayCond)).inputFiles.toSet
    assert(kept2 == kept, s"pv-only pruning diverged: ${kept2.size} vs ${kept.size}")
    // physically delete the ruled-out files; the pruned read still answers
    (all -- kept).foreach(p => java.nio.file.Files.delete(
      java.nio.file.Paths.get(new java.net.URI(p))))
    assert(DeltaScan.read(spark, dir, skippingFilter = Some(dayCond))
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("foreign tables without the write-timezone property never prune TZ-dependent shapes") {
    val dir = mkTable()
    // graft's create stamped the property (its generation expressions
    // ran under the pinned-UTC session)
    val logFile = java.nio.file.Paths.get(dir, "_delta_log",
      "00000000000000000000.json")
    val log0 = new String(java.nio.file.Files.readAllBytes(logFile), "UTF-8")
    assert(log0.contains(DeltaTransforms.WriteTimezoneKey),
      "create must record the generation timezone")

    def dayCond = col("ts") >= lit(ts("2021-03-05 00:00:00")) &&
      col("ts") < lit(ts("2021-03-06 00:00:00"))
    val all = DeltaScan.read(spark, dir).inputFiles.toSet
    assert(DeltaScan.read(spark, dir, skippingFilter = Some(dayCond))
      .inputFiles.toSet.size < all.size, "UTC-stamped table prunes")

    // simulate a FOREIGN writer: strip footer stats AND the property —
    // CAST(ts AS DATE) under an unknown session TZ yields partition
    // values whose UTC-derived bounds could exclude rows actually in
    // the file, so day/month/year over TimestampType must NOT prune
    val noStats = log0
      .replaceAll(""","stats":"(\\.|[^"\\])*"""", "")
      .replace(s""""${DeltaTransforms.WriteTimezoneKey}":"UTC"""", "")
    assert(!noStats.contains("\"stats\"") &&
      !noStats.contains(DeltaTransforms.WriteTimezoneKey))
    java.nio.file.Files.write(logFile, noStats.getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir,
      "_delta_log", ".00000000000000000000.json.crc"))

    val keptDay = DeltaScan.read(spark, dir,
      skippingFilter = Some(dayCond)).inputFiles.toSet
    assert(keptDay == all,
      s"day(TimestampType) must not prune on unknown write TZ: kept ${keptDay.size}/${all.size}")
    // ... but the read stays correct (filter still applies row-level)
    assert(DeltaScan.read(spark, dir, skippingFilter = Some(dayCond))
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // TZ-independent shapes still prune on foreign tables: truncate
    val ga = DeltaScan.read(spark, dir,
      skippingFilter = Some(col("cat") === "gamma")).inputFiles.toSet
    assert(ga.nonEmpty && ga.size < all.size && ga.forall(_.contains("cat_trunc=ga")),
      s"truncate must keep pruning without the TZ property: $ga")
  }

  test("parseGenExpr: oversized foreign truncate widths degrade to no-pruning, never fail the scan") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType)))
    // a valid foreign table may carry widths past Int.MaxValue — the
    // documented fallback is derive-without-pruning, not a crash
    assert(DeltaTransforms.parseGenExpr("p", "substring(s, 1, 9999999999)", schema).isEmpty)
    assert(DeltaTransforms.parseGenExpr("p", "(n - pmod(n, 99999999999))", schema).isEmpty)
    // sane widths still parse
    assert(DeltaTransforms.parseGenExpr("p", "substring(s, 1, 2)", schema)
      .exists(pf => pf.transform == "truncate" && pf.param == 2))
    // TZ-independence classification: hour computes on unix_seconds
    import graft.sources.IcebergTransforms.PartField
    val tsF = org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.TimestampType)
    val ntzF = org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.TimestampNTZType)
    assert(!DeltaTransforms.tzIndependent(PartField("d", "day", 0, tsF)))
    assert(!DeltaTransforms.tzIndependent(PartField("m", "month", 0, tsF)))
    assert(DeltaTransforms.tzIndependent(PartField("h", "hour", 0, tsF)))
    assert(DeltaTransforms.tzIndependent(PartField("d", "day", 0, ntzF)))
  }

  test("DML composes on the generated layout: merge migrates dirs, update refuses the source, delete/compact fold") {
    val dir = mkTable()
    // updates to unrelated columns are fine
    assert(DeltaWrite.updateWhere(spark, dir, col("id") === 4L,
      Seq("id" -> (col("id") + 100L))) == 1L)
    // assigning the SOURCE of a generated partition column refuses
    val e1 = intercept[IllegalArgumentException](
      DeltaWrite.updateWhere(spark, dir, col("id") === 1L,
        Seq("ts" -> lit(ts("2022-01-01 00:00:00")))))
    assert(e1.getMessage.contains("derives from it"), e1.getMessage)
    // ... and so does assigning the generated column itself
    val e2 = intercept[IllegalArgumentException](
      DeltaWrite.updateWhere(spark, dir, col("id") === 1L,
        Seq("ts_day" -> lit(java.sql.Date.valueOf("2022-01-01")))))
    // the (earlier) partition-column guard covers the generated column
    assert(e2.getMessage.contains("partition column") ||
      e2.getMessage.contains("generated column"), e2.getMessage)
    // merge RELOCATES: id=1 moves from 2021-03-05 to a 2022 day dir
    val (u, i) = DeltaWrite.merge(spark, dir,
      Seq((1L, ts("2022-05-05 05:00:00"), "alpha"),
        (9L, ts("2021-03-05 01:00:00"), "ash")).toDF("id", "ts", "cat"), Seq("id"))
    assert(u == 1L && i == 1L)
    val moved = DeltaScan.read(spark, dir,
      skippingFilter = Some(col("ts") >= lit(ts("2022-05-05 00:00:00")) &&
        col("ts") < lit(ts("2022-05-06 00:00:00"))))
    assert(moved.inputFiles.forall(_.contains("ts_day=2022-05-05")))
    assert(moved.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // delete by source predicate + compact keep the model
    assert(DeltaWrite.deleteWhere(spark, dir,
      col("ts") < lit(ts("2021-04-01 00:00:00"))) == 3L) // ids 2, 3, 9
    DeltaWrite.compact(spark, dir, smallFileBytes = 1L << 30, targetFiles = 1)
    val ids = DeltaScan.read(spark, dir).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 104L, 5L), ids.toString)
  }

  test("evolution guards: renaming or dropping a generation source refuses; bucket refuses on Delta") {
    val dir = mkTable()
    val eR = intercept[IllegalArgumentException](
      DeltaWrite.renameColumn(spark, dir, "ts", "event_ts"))
    assert(eR.getMessage.contains("derives from it"), eR.getMessage)
    val eD = intercept[IllegalArgumentException](
      DeltaWrite.dropColumn(spark, dir, "cat"))
    assert(eD.getMessage.contains("derives from it"), eD.getMessage)
    // unrelated columns still rename (and the mapped table keeps reading)
    DeltaWrite.renameColumn(spark, dir, "id", "doc_id")
    assert(DeltaScan.read(spark, dir).select("doc_id").count() == 5L)
    val eB = intercept[IllegalArgumentException](
      DeltaWrite.create(spark, Seq((1L, "x")).toDF("k", "v"),
        java.nio.file.Files.createTempDirectory("graft_delta_tr_bad").toString + "/t",
        partitionBy = Seq("bucket(4, k)")))
    assert(eB.getMessage.contains("Iceberg-only"), eB.getMessage)
  }

  test("exactly-once txn appends and streaming-style writes derive too") {
    val dir = java.nio.file.Files.createTempDirectory("graft_delta_tr_txn").toString + "/t"
    DeltaWrite.create(spark,
      Seq((1L, ts("2024-01-05 10:00:00"))).toDF("id", "ts"), dir,
      partitionBy = Seq("day(ts)"))
    DeltaWrite.appendWithTxn(spark,
      Seq((2L, ts("2024-01-06 11:00:00"))).toDF("id", "ts"), dir, "app", 1L)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.contains("ts_day=2024-01-05") && dirs.contains("ts_day=2024-01-06"), dirs)
    assert(DeltaScan.read(spark, dir).count() == 2L)
  }
}
