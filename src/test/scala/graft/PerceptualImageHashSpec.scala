package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}
import graft.plans.{ImageCodec, PerceptualImageHash}

/** Perceptual image hash (aHash/dHash) + image near-dup pairs.
  *
  * The anchor tests re-derive expected signatures INDEPENDENTLY from
  * the published hash definitions (not from the implementation's cell
  * machinery): a 3×2 image hits the nearest-sample path where every
  * grid cell reads exactly one pixel, so the dHash bits reduce to two
  * pixel comparisons per row band — computable by hand. The invariance
  * tests assert the exact-arithmetic claims in the scaladoc
  * (brightness-shift and pixel-replication invariance are EXACT, not
  * approximate, because every comparison is an integer
  * cross-multiplication). */
class PerceptualImageHashSpec extends SparkSpec {

  private def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] =
    ImageCodec.grayPng(w, h, f)

  private def hash(b: Array[Byte], kind: String): Option[Long] =
    PerceptualImageHash.hash(b, kind)

  test("uniform image hashes to 0 for both kinds (no strict winner anywhere)") {
    val b = png(16, 16, (_, _) => 77)
    assert(hash(b, "ahash").contains(0L))
    assert(hash(b, "dhash").contains(0L))
  }

  test("3x2 dhash matches the hand-derived nearest-sample signature") {
    // g(x, y): 3 columns, 2 rows — chosen so both comparisons differ by row
    val g = Map((0, 0) -> 200, (1, 0) -> 100, (2, 0) -> 150,
      (0, 1) -> 10, (1, 1) -> 20, (2, 1) -> 15)
    val b = png(3, 2, (x, y) => g((x, y)))
    // 9×8 grid over w=3: cx∈{0,1,2}→col0, {3,4,5}→col1, {6,7,8}→col2;
    // h=2: cy∈{0..3}→row0, {4..7}→row1. bit(cy*8+cx) = cell(cx) > cell(cx+1):
    // only cx=2 (col0 vs col1) and cx=5 (col1 vs col2) cross a column edge.
    var expected = 0L
    for (cy <- 0 until 8) {
      val y = if (cy < 4) 0 else 1
      if (g((0, y)) > g((1, y))) expected |= 1L << (cy * 8 + 2)
      if (g((1, y)) > g((2, y))) expected |= 1L << (cy * 8 + 5)
    }
    assert(hash(b, "dhash").contains(expected))
    assert(expected != 0L) // the fixture must exercise set bits
  }

  test("brightness shift is exactly invariant for both kinds") {
    val base = png(16, 16, (x, y) => 40 + (x * 7 + y * 13) % 150)
    val shifted = png(16, 16, (x, y) => 40 + (x * 7 + y * 13) % 150 + 60)
    for (kind <- Seq("ahash", "dhash")) {
      assert(hash(base, kind).isDefined)
      assert(hash(base, kind) == hash(shifted, kind), kind)
    }
  }

  test("2x pixel replication (lossless resize) is exactly invariant") {
    val small = png(8, 8, (x, y) => 30 + (x * 11 + y * 5) % 190)
    val big = png(16, 16, (x, y) => 30 + ((x / 2) * 11 + (y / 2) * 5) % 190)
    for (kind <- Seq("ahash", "dhash"))
      assert(hash(small, kind) == hash(big, kind), kind)
  }

  test("single-pixel perturbation lands within small Hamming distance") {
    val a = png(16, 16, (x, y) => 40 + (x * 7 + y * 13) % 150)
    val b = png(16, 16, (x, y) =>
      if (x == 3 && y == 5) 255 else 40 + (x * 7 + y * 13) % 150)
    val d = java.lang.Long.bitCount(
      hash(a, "dhash").get ^ hash(b, "dhash").get)
    assert(d <= 3, s"hamming $d")
  }

  test("undecodable bytes and NULL input give NULL, never a throw") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, Array[Byte](1, 2, 3, 4, 5)),
        org.apache.spark.sql.Row(2L, null))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("img", org.apache.spark.sql.types.BinaryType))))
    val out = df.select(Multimodal.imageHash(col("img"), "ahash").as("h")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("SQL surface: perceptual_image_hash agrees with the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq((1L, png(16, 16, (x, y) => (x * y) % 256))).toDF("id", "img")
    df.createOrReplaceTempView("phash_imgs")
    val viaSql = spark.sql(
      "SELECT perceptual_image_hash(img, 'dhash') AS h FROM phash_imgs").head.getLong(0)
    val viaCol = df.select(Multimodal.imageHash(col("img"), "dhash")).head.getLong(0)
    assert(viaSql == viaCol)
  }

  test("imageDupPairs finds re-encode/shift near-dups, skips undecodable") {
    import spark.implicits._
    val orig = png(16, 16, (x, y) => 40 + (x * 7 + y * 13) % 150)
    val shift = png(16, 16, (x, y) => 40 + (x * 7 + y * 13) % 150 + 40)
    val poke = png(16, 16, (x, y) =>
      if (x == 9 && y == 2) 0 else 40 + (x * 7 + y * 13) % 150)
    val other = png(16, 16, (x, y) => (x * 16 + y) % 256)
    val junk = Array[Byte](9, 9, 9, 9, 9)
    val df = Seq((1L, orig), (2L, shift), (3L, poke), (4L, other), (5L, junk))
      .toDF("id", "img")
    val pairs = Dedup.imageDupPairs(df, "id", "img", kind = "dhash", maxHamming = 3)
      .orderBy("id_a", "id_b").collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((1L, 2L))) // brightness shift: hamming 0
    assert(found.contains((1L, 3L))) // one-pixel poke: small hamming
    assert(!pairs.exists(r => r.getLong(0) == 5L || r.getLong(1) == 5L))
    assert(!found.contains((1L, 4L)) && !found.contains((2L, 4L)))
  }
}
