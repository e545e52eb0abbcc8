package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer (see tools/bench1.sh) — not part of the
  * library surface. Mirrors graft.Bench's session config.
  *
  * Round-12 upgrades (measurement hygiene, guide §1): warms the TARGET
  * query at sf0.001 (not just q1_agg) so rep 1 is not a codegen storm;
  * counts Spark jobs/stages per rep (host-noise-independent plan-shape
  * evidence); reports per-rep stolen CPU from the stall probe;
  * `-Dbench1.noop=1` times the noop sink (full materialization)
  * instead of count().
  */
object Bench1 {
  def main(args: Array[String]): Unit = {
    val q = sys.props("bench1.query")
    val sf = sys.props.getOrElse("bench1.sf", "/root/testdata/sf0.1")
    val reps = sys.props.getOrElse("bench1.reps", "1").toInt
    val noop = sys.props.getOrElse("bench1.noop", "0") == "1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageSubmitted(
            s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
          stages.incrementAndGet()
      })
    graft.Bench.startStallProbe()
    val fn = graft.SparkEntry.queries(q)
    try fn(spark, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => () }
    (1 to reps).foreach { i =>
      val (j0, s0) = (jobs.get(), stages.get())
      val st0 = graft.Bench.stallNanos.get()
      val t0 = System.nanoTime()
      val df = fn(spark, sf)
      val n =
        if (noop) { df.write.format("noop").mode("overwrite").save(); -1L }
        else df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener events are async
      val stolen = (graft.Bench.stallNanos.get() - st0) / 1e9
      println(f"[bench1] $q rep$i: $sec%.2f s, $n rows, " +
        f"jobs ${jobs.get() - j0}, stages ${stages.get() - s0}, stolen $stolen%.2f s")
    }
    spark.stop()
  }
}
