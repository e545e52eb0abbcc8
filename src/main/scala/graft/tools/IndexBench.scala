package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev-only: LSH index-build timing, native DotProduct vs interpreted
  * HOF bucket path. Not library code. */
object IndexBench {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // replicate the fixture corpus so per-row cost dominates scheduling
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val e = (1 to 256).map(i => base.withColumn("rep", lit(i)))
      .reduce(_ unionAll _).select("vec_id", "embedding")
      .repartition(32).cache()
    println(s"[idx] corpus rows: ${e.count()}")
    val lsh = Similarity.RandomHyperplaneLsh(dim = 64, numPlanes = 12)
    def time(label: String)(c: org.apache.spark.sql.Column): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        e.select(c.as("b")).agg(sum("b")).collect()
        println(f"[idx] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    time("native-bucket")(lsh.bucket(col("embedding")))
    time("hof-bucket")(lsh.bucketHof(col("embedding")))
    spark.stop()
  }
}
