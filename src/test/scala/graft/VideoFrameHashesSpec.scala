package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}
import graft.plans.{ImageCodec, PerceptualImageHash, VideoFrameHashes}

/** Per-frame video perceptual hashes + aligned video near-dup pairs.
  * The cross-format anchor is load-bearing: an AVI frame and a PNG of
  * the SAME pixels must produce the same signature (this catches both
  * cell-geometry drift and the bottom-up-DIB flip). */
class VideoFrameHashesSpec extends SparkSpec {

  // range [30, 199]: stays a valid byte even after a +50 gain shift
  private def px(f: Int, x: Int, y: Int): Int = 30 + (f * 17 + x * 7 + y * 13) % 170

  private def avi(nFrames: Int, w: Int = 16, h: Int = 16,
      pixel: (Int, Int, Int) => Int = px): Array[Byte] =
    ImageCodec.grayAvi(w, h, 30, 1, nFrames, pixel)

  test("AVI frame hash equals the PNG hash of the same pixels") {
    for (kind <- Seq("ahash", "dhash")) {
      val fromAvi = VideoFrameHashes.frameHashes(avi(1), kind, 1).get
      val fromPng = PerceptualImageHash.hash(
        ImageCodec.grayPng(16, 16, (x, y) => px(0, x, y)), kind).get
      assert(fromAvi.length == 1)
      assert(fromAvi(0) == fromPng, kind)
    }
  }

  test("one hash per frame; frameStride samples every n-th") {
    val all = VideoFrameHashes.frameHashes(avi(6), "ahash", 1).get
    val strided = VideoFrameHashes.frameHashes(avi(6), "ahash", 2).get
    assert(all.length == 6)
    assert(strided.toSeq == Seq(all(0), all(2), all(4)))
  }

  test("per-frame brightness shift is exactly invariant") {
    val shifted = avi(3, pixel = (f, x, y) => px(f, x, y) + 50)
    assert(VideoFrameHashes.frameHashes(avi(3), "dhash", 1).get.toSeq ==
      VideoFrameHashes.frameHashes(shifted, "dhash", 1).get.toSeq)
  }

  test("non-AVI bytes give NULL, never a throw") {
    assert(VideoFrameHashes.frameHashes(Array[Byte](1, 2, 3, 4, 5), "ahash", 1).isEmpty)
    assert(VideoFrameHashes.frameHashes("RIFF1234AVI x".getBytes, "ahash", 1).isEmpty)
  }

  test("SQL surface agrees with the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq((1L, avi(2))).toDF("id", "vid")
    df.createOrReplaceTempView("vfh_rows")
    val viaSql = spark.sql(
      "SELECT video_frame_hashes(vid, 'dhash', 1) AS h FROM vfh_rows")
      .head.getSeq[Long](0)
    val viaCol = df.select(Multimodal.videoFrameHashes(col("vid"), "dhash"))
      .head.getSeq[Long](0)
    assert(viaSql == viaCol)
  }

  test("videoDupPairs: aligned near-dups found, others and junk excluded") {
    import spark.implicits._
    val base = avi(4)
    val shifted = avi(4, pixel = (f, x, y) => px(f, x, y) + 40) // hamming 0 per frame
    val other = avi(4, pixel = (f, x, y) => (f * 31 + x * 29 + y * 3) % 256)
    val junk = Array[Byte](7, 7, 7, 7)
    val df = Seq((1L, base), (2L, shifted), (3L, other), (4L, junk))
      .toDF("id", "vid")
    val pairs = Dedup.videoDupPairs(df, "id", "vid", minMatches = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains((1L, 2L, 4L))) // all 4 aligned frames match
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }
}
