package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{DeltaScan, DeltaWrite}

/** Delta IDENTITY columns (protocol §Identity Columns): generated
  * values are unique and strictly beyond the recorded high-water mark,
  * the mark advances in the same commit as the data, GENERATED ALWAYS
  * refuses explicit values everywhere, and row-preserving DML keeps
  * assigned values intact. */
class DeltaIdentitySpec extends SparkSpec {

  private def docs(lo: Long, hi: Long) = {
    import spark.implicits._
    (lo to hi).map(i => (i, s"t$i")).toDF("k", "text")
  }

  private def idsOf(dir: String): Seq[Long] =
    DeltaScan.read(spark, dir).select("rid").collect().map(_.getLong(0)).toSeq

  private def hwmOf(dir: String): Long = {
    val schema = DeltaScan.read(spark, dir).schema
    schema("rid").metadata.getLong("delta.identity.highWaterMark")
  }

  test("create + appends: unique, above the mark, mark advances atomically") {
    val dir = Files.createTempDirectory("graft_id1").toString + "/t"
    DeltaWrite.createWithIdentity(spark, docs(1, 50).repartition(4), dir,
      "rid", start = 100L, step = 3L)
    val ids0 = idsOf(dir)
    assert(ids0.size == 50 && ids0.distinct.size == 50)
    assert(ids0.min == 100L && ids0.max == 100L + 3L * 49)
    assert(hwmOf(dir) == ids0.max)

    DeltaWrite.append(spark, docs(51, 80).repartition(3), dir)
    val ids1 = idsOf(dir)
    assert(ids1.size == 80 && ids1.distinct.size == 80)
    assert(ids1.max == hwmOf(dir))
    assert((ids1.toSet -- ids0.toSet).min > ids0.max,
      "every appended id lies above the previous high-water mark")

    // the identity column is GENERATED ALWAYS: explicit values refuse
    import spark.implicits._
    val explicit = Seq((99L, "x", 1L)).toDF("k", "text", "rid")
    intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, explicit, dir)
    }
  }

  test("negative step descends; commit 0 itself lists identityColumns") {
    val dir = Files.createTempDirectory("graft_id2").toString + "/t"
    DeltaWrite.createWithIdentity(spark, docs(1, 10), dir,
      "rid", start = 0L, step = -5L)
    val ids = idsOf(dir)
    assert(ids.min == -45L && ids.max == 0L && hwmOf(dir) == -45L)
    // the feature gate is ATOMIC with the create: the identity schema
    // metadata must never be visible without the protocol feature
    val proto0 = Files.readAllLines(
      java.nio.file.Paths.get(dir, "_delta_log", f"${0L}%020d.json"))
    assert(proto0.toString.contains("identityColumns"))
    DeltaWrite.append(spark, docs(11, 12), dir)
    assert(idsOf(dir).min == -55L && hwmOf(dir) == -55L)
  }

  test("identity assignment is single-pass: nondeterministic upstream " +
    "cannot out-run the committed high-water mark") {
    val dir = Files.createTempDirectory("graft_id5").toString + "/t"
    // a sampled (nondeterministic) upstream: if count/zipWithIndex/write
    // re-evaluated the plan, row counts could diverge between the mark
    // computation and the written values
    val nondet = docs(1, 200).sample(withReplacement = false, 0.5, seed = 0L)
      .repartition(4)
    DeltaWrite.createWithIdentity(spark, nondet, dir, "rid")
    val ids0 = idsOf(dir)
    assert(ids0.distinct.size == ids0.size)
    assert(hwmOf(dir) == ids0.max,
      "committed mark must equal the max value actually written")
    DeltaWrite.append(spark,
      docs(300, 500).sample(withReplacement = false, 0.5, seed = 1L), dir)
    val ids1 = idsOf(dir)
    assert(ids1.distinct.size == ids1.size, "no duplicate identity values")
    assert(hwmOf(dir) == ids1.max)
  }

  test("row-preserving DML keeps ids; value-fabricating DML refuses") {
    val dir = Files.createTempDirectory("graft_id3").toString + "/t"
    DeltaWrite.createWithIdentity(spark, docs(1, 30).repartition(2), dir, "rid")
    val before = DeltaScan.read(spark, dir)
      .select("k", "rid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    DeltaWrite.deleteWhere(spark, dir, col("k") % 3 === 0) // CoW rewrite
    val after = DeltaScan.read(spark, dir)
      .select("k", "rid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.keySet == before.keySet.filterNot(_ % 3 == 0))
    assert(after.forall { case (k, rid) => before(k) == rid },
      "the copy-on-write rewrite preserves assigned identity values")

    intercept[IllegalArgumentException] {
      DeltaWrite.updateWhere(spark, dir, col("k") === 1L, Seq("rid" -> lit(7L)))
    }
    intercept[IllegalArgumentException] {
      import spark.implicits._
      DeltaWrite.merge(spark, dir,
        Seq((1L, "u", 7L)).toDF("k", "text", "rid"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      import spark.implicits._
      DeltaWrite.appendEvolve(spark, Seq((500L, "n", 1)).toDF("k", "text", "extra"), dir)
    }
    // appends after DML keep climbing from the recorded mark
    DeltaWrite.append(spark, docs(100, 105), dir)
    val ids = idsOf(dir)
    assert(ids.distinct.size == ids.size)
  }

  test("allowExplicitInsert: explicit values pass through, mark untouched") {
    val dir = Files.createTempDirectory("graft_id4").toString + "/t"
    DeltaWrite.createWithIdentity(spark, docs(1, 5), dir, "rid",
      start = 1L, step = 1L, allowExplicitInsert = true)
    val h0 = hwmOf(dir)
    import spark.implicits._
    DeltaWrite.append(spark, Seq((50L, "x", 1000L)).toDF("k", "text", "rid"), dir)
    assert(hwmOf(dir) == h0, "explicit inserts must not move the mark")
    // generated appends still work and chain from the mark
    DeltaWrite.append(spark, docs(60, 61), dir)
    assert(idsOf(dir).count(_ > h0) == 3) // 1000 + the two generated (6, 7)
    assert(idsOf(dir).contains(h0 + 1) && idsOf(dir).contains(h0 + 2))
  }
}
