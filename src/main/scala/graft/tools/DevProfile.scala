package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.Dedup

/** Dev-only phase profiler for the minhash pipeline — not library code. */
object DevProfile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val df = time("read")(spark.read.parquet(s"$sf/documents.parquet"))
      val based = df
        .select(col("doc_id").as("id"), TextFns.tokens(col("text")).as("__tk"))
        .withColumn("sh", array_distinct(TextFns.wordShinglesFromTokens(col("__tk"), 3)))
        .filter(size(col("sh")) > 0)
        .select(col("id"), Dedup.hashedShingles(col("sh")).as("bases"))
      val hashed = time("checkpoint(based)")(based.localCheckpoint())
      val sig = hashed
        .withColumn("sig", Dedup.minHashFromBases(col("bases"), 12))
        .withColumn("band", explode(Dedup.bandKeys(col("sig"), 12, 6)))
        .select("band", "id")
      val l = sig.select(col("band"), col("id").as("id_a"))
      val r = sig.select(col("band"), col("id").as("id_b"))
      val cand = l.join(r, Seq("band"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .distinct()
      val nCand = time("band join + distinct count")(cand.count())
      println(s"  candidates: $nCand")
      val withSh = cand
        .join(hashed.select(col("id").as("id_a"), col("bases").as("b_a")), Seq("id_a"))
        .join(hashed.select(col("id").as("id_b"), col("bases").as("b_b")), Seq("id_b"))
      val pairs = withSh
        .withColumn("jaccard",
          size(array_intersect(col("b_a"), col("b_b"))).cast("double") /
            size(array_union(col("b_a"), col("b_b"))))
        .filter(col("jaccard") >= 0.4)
        .select("id_a", "id_b", "jaccard")
      val out = time("verify + checkpoint(pairs)")(pairs.localCheckpoint())
      time("count result")(out.count())
      hashed.unpersist(); out.unpersist()
    }
    spark.stop()
  }
}
