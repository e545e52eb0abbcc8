package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{DeltaScan, DeltaWrite}

/** Change data feed, protocol form: cdc actions + `_change_data/`
  * change files written in the SAME commit as the DML; readCdf serves
  * per-version changes, derives insert-only commits from adds, and
  * refuses where the feed is not reconstructible. */
class DeltaCdfSpec extends SparkSpec {

  private def base0 = {
    import spark.implicits._
    (1L to 20L).map(i => (i, s"g${i % 3}", s"t$i")).toDF("id", "grp", "text")
  }

  private def changesOf(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "text", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet

  test("update/delete/merge write change files; readCdf serves them per version") {
    val dir = Files.createTempDirectory("graft_cdf1").toString + "/t"
    DeltaWrite.create(spark, base0.repartition(3), dir) // v0
    DeltaWrite.enableChangeDataFeed(spark, dir) // v1
    DeltaWrite.updateWhere(spark, dir, col("id") <= 3L,
      Seq("text" -> concat(lit("U:"), col("text")))) // v2
    DeltaWrite.deleteWhere(spark, dir, col("id") % 10 === 0) // v3: ids 10, 20
    import spark.implicits._
    DeltaWrite.merge(spark, dir,
      Seq((1L, "g1", "m1"), (100L, "gX", "m100")).toDF("id", "grp", "text"),
      Seq("id")) // v4: update id 1, insert id 100
    DeltaWrite.append(spark, Seq((200L, "g0", "a200")).toDF("id", "grp", "text"), dir) // v5

    // change files exist under _change_data
    assert(Files.list(Paths.get(dir, "_change_data")).count() > 0)

    assert(changesOf(DeltaScan.readCdf(spark, dir, 2, 2)) ==
      (1L to 3L).flatMap(i => Seq(
        (i, s"t$i", "update_preimage", 2L),
        (i, s"U:t$i", "update_postimage", 2L))).toSet)
    assert(changesOf(DeltaScan.readCdf(spark, dir, 3, 3)) ==
      Set((10L, "t10", "delete", 3L), (20L, "t20", "delete", 3L)))
    assert(changesOf(DeltaScan.readCdf(spark, dir, 4, 4)) ==
      Set((1L, "U:t1", "update_preimage", 4L), (1L, "m1", "update_postimage", 4L),
        (100L, "m100", "insert", 4L)))
    // insert-only commit: derived from the add actions, no cdc needed
    assert(changesOf(DeltaScan.readCdf(spark, dir, 5, 5)) ==
      Set((200L, "a200", "insert", 5L)))
    // the full range composes, including the metadata-only v1 (empty)
    assert(DeltaScan.readCdf(spark, dir, 1, 5).count() == 12L)
    // the table itself reads correctly after all of it
    assert(DeltaScan.read(spark, dir).count() == 20L)
  }

  test("a pre-CDF data-changing remove refuses; DV DML and restore refuse on CDF tables") {
    val dir = Files.createTempDirectory("graft_cdf2").toString + "/t"
    DeltaWrite.create(spark, base0, dir) // v0
    DeltaWrite.deleteWhere(spark, dir, col("id") === 1L) // v1, no CDF yet
    DeltaWrite.enableChangeDataFeed(spark, dir) // v2
    intercept[IllegalArgumentException] {
      DeltaScan.readCdf(spark, dir, 1, 2).count()
    }
    intercept[IllegalArgumentException] {
      DeltaWrite.deleteWhereDV(spark, dir, col("id") === 2L)
    }
    intercept[IllegalArgumentException] {
      DeltaWrite.updateWhereDV(spark, dir, col("id") === 2L, Seq("text" -> lit("x")))
    }
    intercept[IllegalArgumentException] {
      import spark.implicits._
      DeltaWrite.mergeDV(spark, dir,
        Seq((2L, "g2", "y")).toDF("id", "grp", "text"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      DeltaWrite.restore(spark, dir, 0L)
    }
  }

  test("partitioned CDF: change files land partitioned, values injected back") {
    val dir = Files.createTempDirectory("graft_cdf3").toString + "/t"
    DeltaWrite.create(spark, base0, dir, partitionBy = Seq("grp"))
    DeltaWrite.enableChangeDataFeed(spark, dir)
    DeltaWrite.deleteWhere(spark, dir, col("id") % 4 === 0) // v2
    val ch = DeltaScan.readCdf(spark, dir, 2, 2)
    assert(ch.select("id", "grp").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ==
      (1L to 20L).filter(_ % 4 == 0).map(i => i -> s"g${i % 3}").toMap)
    assert(ch.filter(col("_change_type") =!= "delete").count() == 0)
    // vacuum never reclaims the feed
    DeltaWrite.vacuum(spark, dir, retainMs = 0L)
    assert(DeltaScan.readCdf(spark, dir, 2, 2).count() == 5L)
  }

  test("applyChanges: exactly-once medallion hop, upserts + deletes in one commit") {
    val src = Files.createTempDirectory("graft_cdf_ac_s").toString + "/t"
    val tgt = Files.createTempDirectory("graft_cdf_ac_t").toString + "/t"
    DeltaWrite.create(spark, base0, src)
    DeltaWrite.create(spark, base0, tgt) // replica starts in sync
    DeltaWrite.enableChangeDataFeed(spark, src)

    DeltaWrite.updateWhere(spark, src, col("id") <= 2L,
      Seq("text" -> concat(lit("U:"), col("text"))))
    DeltaWrite.deleteWhere(spark, src, col("id") === 9L)
    import spark.implicits._
    DeltaWrite.merge(spark, src,
      Seq((2L, "g2", "m2"), (300L, "gY", "m300")).toDF("id", "grp", "text"),
      Seq("id"))

    // apply versions 2..4: id1 -> U:t1, id2 -> m2 (the LATER merge wins
    // over the earlier update), id9 deleted, id300 inserted
    val (u, i, d) = DeltaWrite.applyChanges(spark, src, tgt, Seq("id"), "rep1", startVersion = 2L)
    assert((u, i, d) == ((2L, 1L, 1L)))
    val got = DeltaScan.read(spark, tgt).select("id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "U:t1" && got(2L) == "m2" && got(300L) == "m300")
    assert(!got.contains(9L) && got.size == 20)

    // re-delivery is a no-op (txn ledger)
    assert(DeltaWrite.applyChanges(spark, src, tgt, Seq("id"), "rep1") ==
      ((0L, 0L, 0L)))
    // the next increment picks up only the new versions
    DeltaWrite.deleteWhere(spark, src, col("id") === 300L)
    assert(DeltaWrite.applyChanges(spark, src, tgt, Seq("id"), "rep1") ==
      ((0L, 0L, 1L)))
    assert(DeltaScan.read(spark, tgt).count() == 19L)
    // target state equals source state throughout
    assert(DeltaScan.read(spark, tgt).select("id", "text").collect().toSet ==
      DeltaScan.read(spark, src).select("id", "text").collect().toSet)
  }

  test("clone of a CDF table keeps the property; compaction stays feed-silent") {
    val dir = Files.createTempDirectory("graft_cdf4").toString + "/t"
    DeltaWrite.create(spark, base0.repartition(4), dir)
    DeltaWrite.enableChangeDataFeed(spark, dir)
    DeltaWrite.updateWhere(spark, dir, col("id") === 5L, Seq("text" -> lit("u5"))) // v2
    DeltaWrite.compact(spark, dir, smallFileBytes = 1L << 30, targetFiles = 1) // v3: dataChange=false
    // the compaction commit contributes NOTHING to the feed
    assert(DeltaScan.readCdf(spark, dir, 3, 3).count() == 0L)
    assert(DeltaScan.readCdf(spark, dir, 2, 3).count() == 2L)
  }
}
