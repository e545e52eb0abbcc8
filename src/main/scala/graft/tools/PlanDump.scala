package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: write the formatted physical plan of selected headline
  * queries to files (plans/r11/<query>_<tag>.txt) — the optimization
  * round's before/after plan evidence. Not library code.
  *
  * Usage: java ... graft.tools.PlanDump <sfDir> <outDir> <tag> [q1,q2,...]
  * (no names = every query in graft.Bench's headline list that also
  * exists in SparkEntry.queries). Queries whose construction itself
  * runs DML (the lakehouse gates) execute their writes; the dumped
  * plan is the final returned frame's.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names: Seq[String] =
      if (args.length > 3) args(3).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      else graft.Bench.headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = new java.io.File(outDir)
    dir.mkdirs()
    names.foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case Some(fn) =>
          try {
            val df = fn(spark, sf)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            val w = new java.io.PrintWriter(
              new java.io.File(dir, s"${n}_$tag.txt"), "UTF-8")
            try w.println(plan) finally w.close()
            val nEx = "Exchange".r.findAllIn(plan).length
            println(s"[plandump] $n exchanges=$nEx -> ${n}_$tag.txt")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
          }
        case None => System.err.println(s"[plandump] unknown query: $n")
      }
    }
    spark.stop()
  }
}
