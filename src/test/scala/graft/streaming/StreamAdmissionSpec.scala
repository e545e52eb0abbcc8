package graft.streaming

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{DeltaWrite, IcebergWrite}

/** ADMISSION CONTROL on the lakehouse streaming sources
  * (maxFilesPerTrigger / maxBytesPerTrigger): the 100 TB knob — the
  * initial snapshot and any huge commit must split across bounded
  * micro-batches instead of arriving as one giant batch, and a
  * checkpoint restart must resume at the exact FILE boundary inside a
  * partially-consumed commit. */
class StreamAdmissionSpec extends graft.SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** rows (id, v) written as `files` separate parquet files in ONE commit */
  private def nFileDf(ids: Range, files: Int) =
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(files)

  // run a capped stream to completion (AvailableNow drains in bounded
  // batches then stops); returns (delivered ids, per-batch sizes)
  private def drain(provider: Class[_], dir: String, ck: String,
      options: Map[String, String]): (Set[Long], Seq[Int]) = {
    val sizes = scala.collection.mutable.ListBuffer[Int]()
    val seen = scala.collection.mutable.ListBuffer[Long]()
    var reader = spark.readStream.format(provider.getName)
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load(dir)
      .writeStream.option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ids = b.collect().map(_.getLong(0))
        seen.synchronized { seen ++= ids; if (ids.nonEmpty) sizes += ids.length }
        ()
      }.start()
    q.awaitTermination(120000)
    (seen.synchronized(seen.toSet), sizes.synchronized(sizes.toList))
  }

  test("Delta: maxFilesPerTrigger splits the initial snapshot into bounded batches") {
    val dir = tmp("graft_admit_d") + "/t"
    DeltaWrite.create(spark, nFileDf(0 until 40, files = 8), dir)
    val (ids, sizes) = drain(classOf[DeltaStreamProvider], dir,
      tmp("graft_admit_d_ck"), Map("maxFilesPerTrigger" -> "3"))
    assert(ids == (0L until 40L).toSet, "every row exactly once")
    assert(sizes.size >= 3,
      s"8 files at 3/trigger need >= 3 batches, got ${sizes.size} ($sizes)")
  }

  test("Delta: restart mid-commit resumes at the file boundary — no dupes, no loss") {
    val dir = tmp("graft_admit_dr") + "/t"
    val ck = tmp("graft_admit_dr_ck")
    DeltaWrite.create(spark, nFileDf(0 until 30, files = 6), dir)

    // first drain is capped at 2 files per batch; run only the FIRST
    // trigger by using Trigger.Once semantics: AvailableNow with a stop
    // after the first batch is racy, so instead drain fully, then
    // append a 5-file commit and drain again from the SAME checkpoint
    // with a cap that forces a mid-commit offset after each batch.
    val (ids1, _) = drain(classOf[DeltaStreamProvider], dir, ck,
      Map("maxFilesPerTrigger" -> "2"))
    assert(ids1 == (0L until 30L).toSet)

    DeltaWrite.append(spark, nFileDf(100 until 125, files = 5), dir)
    val (ids2, sizes2) = drain(classOf[DeltaStreamProvider], dir, ck,
      Map("maxFilesPerTrigger" -> "2"))
    assert(ids2 == (100L until 125L).toSet,
      s"restart from checkpoint must deliver exactly the appended rows, got ${ids2.size}")
    assert(sizes2.size >= 3,
      s"5 new files at 2/trigger need >= 3 batches, got ${sizes2.size} ($sizes2)")
  }

  test("Delta: maxBytesPerTrigger admits at least one file per batch") {
    val dir = tmp("graft_admit_db") + "/t"
    DeltaWrite.create(spark, nFileDf(0 until 20, files = 4), dir)
    // 1 byte per trigger: every file exceeds the cap — each batch must
    // still admit exactly one file (progress guarantee), never zero
    val (ids, sizes) = drain(classOf[DeltaStreamProvider], dir,
      tmp("graft_admit_db_ck"), Map("maxBytesPerTrigger" -> "1"))
    assert(ids == (0L until 20L).toSet)
    assert(sizes.size == 4, s"4 files at 1 byte/trigger = 4 batches, got $sizes")
  }

  test("Delta: uncapped AvailableNow still drains everything in one batch") {
    val dir = tmp("graft_admit_du") + "/t"
    DeltaWrite.create(spark, nFileDf(0 until 12, files = 3), dir)
    val (ids, sizes) = drain(classOf[DeltaStreamProvider], dir,
      tmp("graft_admit_du_ck"), Map.empty)
    assert(ids == (0L until 12L).toSet)
    assert(sizes.size == 1, s"no cap => one batch, got $sizes")
  }

  test("Delta: pre-admission checkpoints (bare version offsets) deserialize as fully consumed") {
    val dir = tmp("graft_admit_compat") + "/t"
    DeltaWrite.create(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    val stream = new DeltaMicroBatchStream(
      dir, graft.sources.DeltaScan.read(spark, dir).schema, 0L, None, None)
    val off = stream.deserializeOffset("""{"version":3}""")
    assert(off == DeltaStreamOffset(3L, Long.MaxValue),
      "a bare {version} offset must read as version-3-fully-consumed")
    // round trip through the new json carries the index explicitly
    val off2 = stream.deserializeOffset(off.json())
    assert(off2 == off)
  }

  test("Delta: a mid-commit offset range plans exactly the sliced files") {
    val dir = tmp("graft_admit_slice") + "/t"
    DeltaWrite.create(spark, nFileDf(0 until 30, files = 6), dir)
    val schema = graft.sources.DeltaScan.read(spark, dir).schema
    val stream = new DeltaMicroBatchStream(
      dir, schema, 0L, None, None)
    val all = stream.planInputPartitions(
      DeltaStreamOffset(-1L, Long.MaxValue),
      DeltaStreamOffset(0L, Long.MaxValue))
    assert(all.length == 6)
    // files [2, 5) of commit 0
    val slice = stream.planInputPartitions(
      DeltaStreamOffset(0L, 2L),
      DeltaStreamOffset(0L, 5L))
    assert(slice.length == 3)
    // the slice is positional: same files as all[2..4]
    val absOf = (p: org.apache.spark.sql.connector.read.InputPartition) =>
      p.asInstanceOf[DeltaFilePartition].absPath
    assert(slice.map(absOf).toSeq == all.slice(2, 5).map(absOf).toSeq)
    // capped walk returns the matching boundary
    val end = stream.latestOffset(
      DeltaStreamOffset(0L, 2L), ReadLimit.maxFiles(3))
    assert(end == DeltaStreamOffset(0L, 5L))
  }

  test("Delta CDF x admission: a rate-limited change-feed stream over a " +
    "high-churn table neither skips nor double-serves change files") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = tmp("graft_admit_cdf") + "/t"
    val ck = tmp("graft_admit_cdf_ck")
    // partitioned so one DML commit writes SEVERAL cdc files — with
    // maxFilesPerTrigger=1 every trigger boundary lands mid-commit
    val seed = (0 until 30).map(i => (i.toLong, i.toLong % 3, s"v$i"))
      .toDF("id", "p", "v")
    DeltaWrite.create(spark, seed, dir, partitionBy = Seq("p"))
    DeltaWrite.enableChangeDataFeed(spark, dir)
    // churn: each commit touches all 3 partitions
    DeltaWrite.deleteWhere(spark, dir, col("id") % 5 === 0)
    DeltaWrite.updateWhere(spark, dir, col("id") % 7 === 1, Seq("v" -> lit("u")))

    def drainCdf(): (Seq[(String, Long, Long)], Seq[Int]) = {
      val sizes = scala.collection.mutable.ListBuffer[Int]()
      val seen = scala.collection.mutable.ListBuffer[(String, Long, Long)]()
      val q = spark.readStream
        .format(classOf[DeltaStreamProvider].getName)
        .option("readChangeFeed", "true")
        .option("maxFilesPerTrigger", "1")
        .load(dir)
        .writeStream.option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val rows = b.select("_change_type", "id", "_commit_version")
            .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          seen.synchronized { seen ++= rows; if (rows.nonEmpty) sizes += rows.length }
          ()
        }.start()
      q.awaitTermination(120000)
      (seen.synchronized(seen.toList), sizes.synchronized(sizes.toList))
    }

    val (got1, sizes1) = drainCdf()
    assert(sizes1.size >= 5,
      s"1 change file per trigger over multi-file commits needs many batches, got $sizes1")

    // more churn while the stream is DOWN, then resume from the SAME
    // checkpoint — the restart offset sits mid-feed
    DeltaWrite.append(spark, (100 until 106).map(i =>
      (i.toLong, i.toLong % 3, s"n$i")).toDF("id", "p", "v"), dir,
      partitionBy = Seq("p"))
    DeltaWrite.deleteWhere(spark, dir, col("id") === 100L)
    val (got2, _) = drainCdf()

    // exactly-once against the batch change feed: the delivered
    // MULTISET must equal readCdf over the full version range
    val latest = graft.sources.DeltaScan.latestVersion(spark, dir)
    val expect = graft.sources.DeltaScan.readCdf(spark, dir, 0L, latest)
      .select("_change_type", "id", "_commit_version")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    val delivered = got1 ++ got2
    assert(delivered.sorted == expect.sorted,
      s"delivered ${delivered.size} change rows, batch feed has ${expect.size}")
  }

  test("Iceberg: maxFilesPerTrigger splits snapshot + later commits; restart resumes") {
    val dir = tmp("graft_admit_i") + "/t"
    val ck = tmp("graft_admit_i_ck")
    IcebergWrite.create(spark, nFileDf(0 until 24, files = 6), dir)
    val (ids, sizes) = drain(classOf[IcebergStreamProvider], dir, ck,
      Map("maxFilesPerTrigger" -> "2"))
    assert(ids == (0L until 24L).toSet)
    assert(sizes.size >= 3,
      s"6 files at 2/trigger need >= 3 batches, got ${sizes.size} ($sizes)")

    IcebergWrite.append(spark, nFileDf(100 until 115, files = 3), dir)
    val (ids2, _) = drain(classOf[IcebergStreamProvider], dir, ck,
      Map("maxFilesPerTrigger" -> "2"))
    assert(ids2 == (100L until 115L).toSet,
      "restart from checkpoint must deliver exactly the appended rows")
  }

  test("Iceberg: maxBytesPerTrigger single-file progress + capped boundary math") {
    val dir = tmp("graft_admit_ib") + "/t"
    IcebergWrite.create(spark, nFileDf(0 until 12, files = 3), dir)
    val (ids, sizes) = drain(classOf[IcebergStreamProvider], dir,
      tmp("graft_admit_ib_ck"), Map("maxBytesPerTrigger" -> "1"))
    assert(ids == (0L until 12L).toSet)
    assert(sizes.size == 3, s"3 files at 1 byte/trigger = 3 batches, got $sizes")

    val schema = graft.sources.IcebergScan.tableSchema(spark, dir)
    val stream = new IcebergMicroBatchStream(
      dir, schema, 1L, None, None)
    val end = stream.latestOffset(
      IcebergStreamOffset(0L, Long.MaxValue), ReadLimit.maxFiles(2))
    assert(end == IcebergStreamOffset(1L, 2L),
      s"2 of 3 snapshot files consumed => mid-commit offset, got $end")
    val rest = stream.latestOffset(end, ReadLimit.maxFiles(10))
    assert(rest == IcebergStreamOffset(1L, Long.MaxValue),
      "an uncapped drain marks the latest version fully consumed")
    // nothing new: offset must not move (no spurious batches)
    assert(stream.latestOffset(rest, ReadLimit.maxFiles(10)) == rest)
  }
}
