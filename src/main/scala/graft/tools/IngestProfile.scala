package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only job-level attribution for q_ingest_neardup — not library
  * code. Logs every Spark job's wall time + call site during one gate
  * execution so the 2-ingest Delta workflow's cost is attributable. */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.get(j.jobId)).foreach { case (t0, site) =>
          println(f"[job ${j.jobId}%3d] ${(System.nanoTime() - t0) / 1e9}%6.2f s  $site")
        }
      }
    })
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("q_ingest_neardup")(spark, sf)
      val n = df.count()
      println(f"=== rep $rep: q_ingest_neardup total ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows) ===")
    }
    spark.stop()
  }
}
