package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{IcebergScan, IcebergWrite}

/** MANIFEST-LEVEL PRUNING: the manifest-list `partitions` field
  * summaries (field 507) let the planner skip whole manifests before
  * reading them. Proven the adversarial way this repo proves pruning:
  * the manifest files the summaries rule out are PHYSICALLY DELETED —
  * a read that still returns the right rows cannot have opened them. */
class IcebergManifestPruneSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def events(day: String, lo: Long, hi: Long) = {
    import spark.implicits._
    (lo to hi).map(i => (i, ts(s"$day 0${i % 9}:00:00"), s"e$i"))
      .toDF("id", "etime", "payload")
  }

  private def manifestsOf(dir: String): Seq[String] =
    Files.list(Paths.get(dir, "metadata")).toArray.map(_.toString)
      .filter(p => p.contains("manifest-") && p.endsWith(".avro")).toSeq

  test("transform layout: far manifests are skipped (proven by deleting them)") {
    val dir = Files.createTempDirectory("graft_mprune1").toString + "/t"
    IcebergWrite.create(spark, events("2024-01-05", 1, 40), dir,
      partitionBy = Seq("day(etime)"))
    val m1 = manifestsOf(dir)
    IcebergWrite.append(spark, events("2024-06-15", 41, 80), dir)
    val m2 = manifestsOf(dir).filterNot(m1.contains)
    assert(m1.size == 1 && m2.size == 1)

    // June filter with the JANUARY manifest gone: only manifest-level
    // skipping can survive this read
    Files.delete(Paths.get(m1.head))
    val june = IcebergScan.read(spark, dir, skippingFilter = Some(
      col("etime") >= lit(ts("2024-06-01 00:00:00"))))
    assert(june.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == (41L to 80L))
    // an unfiltered read MUST still fail loudly — nothing silently
    // pretends the deleted manifest's rows never existed
    intercept[Throwable] { IcebergScan.read(spark, dir).count() }
  }

  test("identity layout + carried summaries survive unrelated commits") {
    val dir = Files.createTempDirectory("graft_mprune2").toString + "/t"
    import spark.implicits._
    IcebergWrite.create(spark,
      (1L to 30L).map(i => (i, "a", s"x$i")).toDF("id", "grp", "v"), dir,
      partitionBy = Seq("grp"))
    val m1 = manifestsOf(dir)
    IcebergWrite.append(spark,
      (31L to 60L).map(i => (i, "b", s"x$i")).toDF("id", "grp", "v"), dir)
    val m2 = manifestsOf(dir).filterNot(m1.contains)
    // an unrelated third commit carries both manifests' summaries
    // forward in its new list
    IcebergWrite.append(spark,
      (61L to 70L).map(i => (i, "c", s"x$i")).toDF("id", "grp", "v"), dir)

    Files.delete(Paths.get(m1.head))
    Files.delete(Paths.get(m2.head))
    val c = IcebergScan.read(spark, dir,
      skippingFilter = Some(col("grp") === "c"))
    assert(c.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == (61L to 70L))
    intercept[Throwable] {
      IcebergScan.read(spark, dir,
        skippingFilter = Some(col("grp") === "a")).count()
    }
  }

  test("delete manifests are never skipped; bucket fields never prune") {
    val dir = Files.createTempDirectory("graft_mprune3").toString + "/t"
    import spark.implicits._
    IcebergWrite.create(spark,
      (1L to 50L).map(i => (i, s"p$i")).toDF("id", "v").repartition(2), dir,
      partitionBy = Seq("bucket(4, id)"))
    IcebergWrite.deleteWhere(spark, dir, col("id") % 5 === 0)
    // a filtered read over a bucket-only layout: bucket summaries are
    // not range-expressible, nothing may be pruned, and the delete
    // manifest must still apply
    val r = IcebergScan.read(spark, dir,
      skippingFilter = Some(col("id") > 10L))
    assert(r.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == (11L to 50L).filter(_ % 5 != 0))
  }

  test("range queries prune through min/max summaries, not just equality") {
    val dir = Files.createTempDirectory("graft_mprune4").toString + "/t"
    import spark.implicits._
    IcebergWrite.create(spark,
      (1L to 20L).map(i => (i, i / 10, s"x$i")).toDF("id", "g", "v"), dir,
      partitionBy = Seq("g"))
    val m1 = manifestsOf(dir)
    IcebergWrite.append(spark,
      (1000L to 1020L).map(i => (i, i / 10, s"x$i")).toDF("id", "g", "v"), dir)
    Files.delete(Paths.get(m1.head))
    // g in [100, 102] for the second batch; [0, 2] for the first
    val r = IcebergScan.read(spark, dir,
      skippingFilter = Some(col("g") >= 50L))
    assert(r.count() == 21L)
  }

  test("void spec slots: summaries pair by ORIGINAL slot, not filtered index") {
    // a v1 spec whose dropped partition left a leading `void` slot —
    // field summaries are positional over ALL spec slots, so pairing
    // the real field with index 0 would read the void slot's summary
    // as its own (foreign tables write bounds there; wrong pruning)
    val dir = Files.createTempDirectory("graft_mprune5").toString + "/t"
    import spark.implicits._
    IcebergWrite.create(spark,
      (1L to 20L).map(i => (i, i / 10, s"x$i")).toDF("id", "g", "v"), dir,
      partitionBy = Seq("g"))
    // doctor the current metadata: prepend a void slot to every spec
    val hint = Paths.get(dir, "metadata", "version-hint.text")
    val v = new String(Files.readAllBytes(hint)).trim.toInt
    val metaPath = Paths.get(dir, "metadata", s"v$v.metadata.json")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(Files.readAllBytes(metaPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val voidField = om.readTree(
      """{"name":"dead_col","transform":"void","source-id":1,"field-id":999}""")
    Seq(Option(root.get("partition-spec")),
        Option(root.get("partition-specs")).map(_.elements().next().get("fields")))
      .flatten.foreach { n =>
        val arr = n.asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
        arr.insert(0, voidField)
      }
    Files.write(metaPath, om.writeValueAsBytes(root))
    // the local FS keeps a checksum sidecar; a doctored file must drop it
    Files.deleteIfExists(
      metaPath.resolveSibling("." + metaPath.getFileName + ".crc"))
    // appends under the doctored spec summarize their manifests with
    // slot-indexed summaries (slot 0 = the void slot, unbounded)
    val before = manifestsOf(dir)
    IcebergWrite.append(spark,
      (1000L to 1020L).map(i => (i, i / 10, s"x$i")).toDF("id", "g", "v"), dir)
    val mNew = manifestsOf(dir).filterNot(before.contains)
    IcebergWrite.append(spark,
      (2000L to 2009L).map(i => (i, i / 10, s"x$i")).toDF("id", "g", "v"), dir)
    assert(mNew.size == 1)
    // the g∈[100,102] manifest is ruled out by g >= 150 — delete it:
    // only correct slot pairing lets the planner skip it
    Files.delete(Paths.get(mNew.head))
    val r = IcebergScan.read(spark, dir,
      skippingFilter = Some(col("g") >= 150L))
    assert(r.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == (2000L to 2009L))
  }

  test("fromSpecJsonIndexed keeps original slot positions across void fields") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val specJson =
      """[{"name":"dead","transform":"void","source-id":1,"field-id":1000},
         |{"name":"a","transform":"identity","source-id":1,"field-id":1001},
         |{"name":"b_bucket","transform":"bucket[4]","source-id":2,"field-id":1002}]"""
        .stripMargin
    val indexed = graft.sources.IcebergTransforms.fromSpecJsonIndexed(
      specJson, Map(1 -> "a", 2 -> "b"), schema)
    assert(indexed.map(_._1) == Seq(1, 2),
      "void slot 0 is skipped but later fields keep slots 1 and 2")
    assert(indexed.map(_._2.specName) == Seq("a", "b_bucket"))
  }
}
