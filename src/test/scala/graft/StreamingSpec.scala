package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Structured Streaming helpers driven by the events fixture through a
  * memory sink (batch parquet drives the stream synchronously). */
class StreamingSpec extends SparkSpec {

  // file streaming sources need a DIRECTORY; stage the fixture file
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("tumbling window counts: streaming result equals batch result") {
    val stream = Streams.readEventsStream(spark, eventsDir)
    val agg = Streams.tumblingCounts(stream, watermark = "1 hour", windowLen = "6 hours")
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("tumbling_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .select("w_start", "event_type", "n")
        .orderBy("w_start", "event_type")
        .collect()
      // batch equivalent over the same data
      val batch = Streams.tumblingCounts(
        spark.read.schema(Streams.eventsSchema).parquet(s"$sf001/events.parquet")
          .withColumn("ts", timestamp_micros(expr("ts div 1000"))),
        watermark = "1 hour", windowLen = "6 hours")
        .select("w_start", "event_type", "n")
        .orderBy("w_start", "event_type")
        .collect()
      assert(streamed.nonEmpty)
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    } finally q.stop()
  }

  test("sessionize produces gap-bounded sessions") {
    val events = spark.read.schema(Streams.eventsSchema).parquet(s"$sf001/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val sessions = Streams.sessionize(events, watermark = "1 hour", gap = "30 minutes")
    val rows = sessions.collect()
    assert(rows.nonEmpty)
    // session bounds sane: start < end, counts positive
    assert(rows.forall(r =>
      r.getTimestamp(0).getTime < r.getTimestamp(1).getTime && r.getLong(3) > 0))
  }
}
