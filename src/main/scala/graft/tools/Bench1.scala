package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer (see tools/bench1.sh) — not part of the
  * library surface. Mirrors graft.Bench's session config. */
object Bench1 {
  def main(args: Array[String]): Unit = {
    val q = sys.props("bench1.query")
    val sf = sys.props.getOrElse("bench1.sf", "/root/testdata/sf0.1")
    val reps = sys.props.getOrElse("bench1.reps", "1").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => () }
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sf).count()
      println(f"[bench1] $q rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
