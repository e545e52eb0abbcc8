package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.{DeltaScan, DeltaWrite, ParquetStats}

/** [[DeltaWrite.zorder]]: live files rewritten clustered by the
  * interleaved key so [[DeltaScan]] data skipping prunes on EITHER
  * dimension — the property a single-column sort cannot give. */
class DeltaZorderSpec extends SparkSpec {
  import spark.implicits._

  /** 64×64 grid of (x, y) — uniform, independent dims */
  private def gridTable(): String = {
    val base = Files.createTempDirectory("graft_zorder").toString
    val df = spark.range(0, 4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"),
        col("id").as("payload"))
      .repartition(6) // deliberately scattered: every file sees all of x and y
    DeltaWrite.create(spark, df, base)
    base
  }

  private def dataFiles(base: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(base)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && !p.toString.contains("_delta_log"))
      .toSeq
  }

  /** live files whose stats keep them for `pred` */
  private def keptFiles(base: String, pred: org.apache.spark.sql.Column): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val sch = DeltaScan.read(spark, base).schema
    val e = ParquetStats.predicateExpr(spark, sch, pred)
    // consult the LOG's stats (what the scan actually prunes with)
    val latest = DeltaScan.latestVersion(spark, base)
    val log = spark.read.json(s"$base/_delta_log/" + f"$latest%020d.json")
    val adds = log.select("add.path", "add.stats").na.drop("any", Seq("path")).collect()
    adds.count { r =>
      val st = if (r.isNullAt(1)) None else ParquetStats.parse(r.getString(1))
      ParquetStats.mayMatch(st, e)
    }
  }

  test("zorder rewrite preserves rows exactly and reader transparency") {
    val base = gridTable()
    val before = DeltaScan.read(spark, base).orderBy("payload")
      .as[(Long, Long, Long)].collect()
    DeltaWrite.zorder(spark, base, Seq("x", "y"), bitsPerCol = 6, targetFiles = 16)
    val after = DeltaScan.read(spark, base).orderBy("payload")
      .as[(Long, Long, Long)].collect()
    assert(before.toSeq == after.toSeq)
    // pre-zorder time travel intact
    val v0 = DeltaScan.read(spark, base, versionAsOf = Some(0L)).count()
    assert(v0 == 4096)
  }

  test("after zorder, skipping prunes on BOTH dims; before, on neither") {
    val base = gridTable()
    val xSlice = col("x") >= 0 && col("x") < 8   // 1/8 of x
    val ySlice = col("y") >= 56 && col("y") < 64 // 1/8 of y
    // scattered layout: every file spans the full domain → nothing prunes
    assert(keptFiles(base, xSlice) == 6)
    assert(keptFiles(base, ySlice) == 6)
    DeltaWrite.zorder(spark, base, Seq("x", "y"), bitsPerCol = 6, targetFiles = 16)
    val kx = keptFiles(base, xSlice)
    val ky = keptFiles(base, ySlice)
    // a 1/8 slice of a 16-file z-curve touches ~sqrt-scaled file counts;
    // anything ≤ half proves multi-dim locality (row-major would keep
    // all 16 for one of the two dims)
    assert(kx <= 8, s"x-slice kept $kx of 16 files")
    assert(ky <= 8, s"y-slice kept $ky of 16 files")
    // and the pruned reads stay exact
    val gotX = DeltaScan.read(spark, base, skippingFilter = Some(xSlice))
      .agg(count(lit(1)), sum("payload")).as[(Long, Long)].collect()(0)
    assert(gotX._1 == 512)
    val expX = (0L until 4096L).filter(i => i % 64 < 8).sum
    assert(gotX._2 == expX)
  }

  test("zorder on a hive-partitioned table clusters within each partition") {
    val base = Files.createTempDirectory("graft_zorder_part").toString
    val df = spark.range(0, 2048)
      .select((col("id") % 2).cast("string").as("side"),
        (col("id") % 32).as("x"), ((col("id") / 32) % 32).as("y"), col("id").as("payload"))
      .repartition(4)
    DeltaWrite.create(spark, df, base, partitionBy = Seq("side"))
    DeltaWrite.zorder(spark, base, Seq("x", "y"), bitsPerCol = 5, targetFiles = 4)
    val after = DeltaScan.read(spark, base)
    assert(after.count() == 2048)
    assert(after.filter(col("side") === "1").count() == 1024)
    // partition dirs each hold exactly targetFiles live files
    val files = dataFiles(base).map(_.toString)
    Seq("side=0", "side=1").foreach { p =>
      // old scattered files still on disk for time travel; live set via log
      val latest = DeltaScan.latestVersion(spark, base)
      val log = spark.read.json(s"$base/_delta_log/" + f"$latest%020d.json")
      val adds = log.select("add.path").na.drop().as[String].collect()
      assert(adds.count(_.startsWith(p)) == 4, s"partition $p live files")
    }
  }

  test("string dims and DV tables are refused loudly") {
    val base = Files.createTempDirectory("graft_zorder_bad").toString
    DeltaWrite.create(spark,
      spark.range(0, 10).select(col("id"), lit("a").as("s")), base)
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.zorder(spark, base, Seq("s"))
    }
    assert(e.getMessage.contains("numeric/date/timestamp"))
    val e2 = intercept[IllegalArgumentException] {
      DeltaWrite.zorder(spark, base, Seq("nope"))
    }
    assert(e2.getMessage.contains("not in data columns"))
  }
}
