package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{CboJoin, DeltaScan, DeltaWrite, IcebergScan, IcebergWrite}

/** Seeded equivalence fuzz for the stats-driven planners: whatever the
  * strategy, cap degradation, format mix, or filter draw, planPruned
  * and planStar must return EXACTLY the rows of the plain Spark join
  * of the same inputs — the pruning/ordering/broadcast levers are
  * plan-level and value-invisible by contract. Null fact keys, dim
  * keys outside the fact range, empty filtered dims, and the IN-set →
  * range fallback all get drawn. */
class CboJoinFuzzSpec extends SparkSpec {

  private def writeTable(df: DataFrame, path: String, delta: Boolean): Unit =
    if (delta) DeltaWrite.create(spark, df, path)
    else IcebergWrite.create(spark, df, path)

  private def readTable(path: String, delta: Boolean): DataFrame =
    if (delta) DeltaScan.read(spark, path) else IcebergScan.read(spark, path)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("planPruned == plain join across random tables, formats, caps, filters") {
    val rnd = new scala.util.Random(20261108L)
    (1 to 8).foreach { trial =>
      val base = Files.createTempDirectory(s"graft_cbofuzz_$trial").toString
      val n = 200 + rnd.nextInt(600)
      val keyMod = 1 + rnd.nextInt(40)
      val fact = spark.range(0, n).select(
        col("id"),
        when(col("id") % 13 === 0, lit(null).cast("long"))
          .otherwise(col("id") % keyMod).as("k"),
        (col("id") * 2).as("v"))
        .repartitionByRange(4, col("id"))
      val m = 1 + rnd.nextInt(30)
      // dim keys half inside the fact key range, half outside
      val dimRows = (0 until m).map { i =>
        val k = if (rnd.nextBoolean()) rnd.nextInt(keyMod).toLong
                else keyMod.toLong + rnd.nextInt(50)
        (k, s"name_$k")
      }.distinct
      import spark.implicits._
      val dim = dimRows.toDF("dk", "name")
      val (factDelta, dimDelta) = (rnd.nextBoolean(), rnd.nextBoolean())
      writeTable(fact, s"$base/f", factDelta)
      writeTable(dim, s"$base/d", dimDelta)
      val dimFilter = rnd.nextInt(3) match {
        case 0 => scala.None
        case 1 => Some(col("dk") % 3 === 0)
        case _ => Some(col("dk") < lit(keyMod / 2))
      }
      val how = if (rnd.nextBoolean()) "inner" else "left_semi"
      // half the trials join on TWO keys (k AND a coarse bucket of it)
      // — every key's domain filter must AND soundly
      val twoKeys = rnd.nextBoolean()
      val keys = if (twoKeys) Seq("k" -> "dk", "kb" -> "dkb") else Seq("k" -> "dk")
      val prevCap = CboJoin.maxRuntimeFilterKeys
      try {
        CboJoin.maxRuntimeFilterKeys = if (rnd.nextBoolean()) 3 else 1000
        val (factP, dimP) =
          if (!twoKeys) (s"$base/f", s"$base/d")
          else {
            val f2 = readTable(s"$base/f", factDelta)
              .withColumn("kb", col("k") % 5)
            val d2 = readTable(s"$base/d", dimDelta)
              .withColumn("dkb", col("dk") % 5)
            writeTable(f2, s"$base/f2", factDelta)
            writeTable(d2, s"$base/d2", dimDelta)
            (s"$base/f2", s"$base/d2")
          }
        val (pruned, d) = CboJoin.planPruned(spark, factP, dimP,
          keys, how = how, dimFilter = dimFilter)
        val factDf = readTable(factP, factDelta)
        val dimDf0 = readTable(dimP, dimDelta)
        val dimDf = dimFilter.map(dimDf0.where).getOrElse(dimDf0)
        val cond = keys.map { case (fk, dk2) =>
          col(s"l.$fk") === col(s"r.$dk2") }.reduce(_ && _)
        val plain = factDf.alias("l").join(dimDf.alias("r"), cond, how)
        assert(sortedRows(pruned) == sortedRows(plain),
          s"trial $trial (${d.strategy}; ${d.reason}; how=$how; keys=$keys; " +
            s"factDelta=$factDelta dimDelta=$dimDelta cap=${CboJoin.maxRuntimeFilterKeys})")
      } finally CboJoin.maxRuntimeFilterKeys = prevCap
    }
  }

  test("planStar == plain join chain across random dim mixes") {
    val rnd = new scala.util.Random(77002213L)
    (1 to 5).foreach { trial =>
      val base = Files.createTempDirectory(s"graft_starfuzz_$trial").toString
      val n = 300 + rnd.nextInt(300)
      val (modA, modB) = (1 + rnd.nextInt(20), 1 + rnd.nextInt(9))
      val fact = spark.range(0, n).select(
        col("id"), (col("id") % modA).as("ka"), (col("id") % modB).as("kb"))
        .repartitionByRange(4, col("id"))
      import spark.implicits._
      val dimA = (0 until 1 + rnd.nextInt(modA)).map(i => (i.toLong, s"a_$i"))
        .toDF("ak", "aname")
      val dimB = (0 until 1 + rnd.nextInt(modB + 3)).map(i => (i.toLong, s"b_$i"))
        .toDF("bk", "bname")
      val factDelta = rnd.nextBoolean()
      writeTable(fact, s"$base/f", factDelta)
      writeTable(dimA, s"$base/dA", rnd.nextBoolean())
      writeTable(dimB, s"$base/dB", rnd.nextBoolean())
      val howB = if (rnd.nextBoolean()) "inner" else "left"
      val (df, sd) = CboJoin.planStar(spark, s"$base/f", Seq(
        CboJoin.DimSpec(s"$base/dA", "ka", "ak"),
        CboJoin.DimSpec(s"$base/dB", "kb", "bk", how = howB)))
      val f0 = readTable(s"$base/f", factDelta).alias("f")
      val plain = f0
        .join(dimA.alias("da"), col("f.ka") === col("da.ak"), "inner")
        .join(dimB.alias("db"), col("f.kb") === col("db.bk"), howB)
      assert(sortedRows(df.select("id", "aname", "bname")) ==
        sortedRows(plain.select("id", "aname", "bname")),
        s"trial $trial ($sd; howB=$howB)")
    }
  }
}
