package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed agg buckets by tumbling window and type") {
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 00:50:00"), 1L, "click", 2.0),
      (3L, ts("2024-01-01 01:10:00"), 2L, "view", 4.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val res = EventStreams.windowedAgg(df, "1 hour").orderBy("window_start").collect()
    res should have length 2
    res(0).getAs[Long]("n_events") shouldBe 2L
    res(0).getAs[Double]("sum_value") shouldBe 3.0
  }

  test("sessionize splits on gap, preserves micros, counts and sums") {
    val t0 = ts("2024-01-01 00:00:00.000123")
    val events = Seq(
      EventStreams.Event(1L, t0, 7L, "a", 1.0),
      EventStreams.Event(2L, ts("2024-01-01 00:10:00"), 7L, "a", 2.0),
      EventStreams.Event(3L, ts("2024-01-01 05:00:00"), 7L, "a", 4.0), // gap > 4h ⇒ new session
      EventStreams.Event(4L, ts("2024-01-01 00:30:00"), 8L, "a", 8.0),
    ).toDS()
    val res = EventStreams.sessionize(events, gapMs = 4L * 3600 * 1000)
      .orderBy("user_id", "start").collect()
    res should have length 3
    res(0).getAs[Timestamp]("start") shouldBe t0 // micros preserved
    res(0).getAs[Long]("n_events") shouldBe 2L
    res(0).getAs[Double]("total_value") shouldBe 3.0
    res(1).getAs[Long]("n_events") shouldBe 1L
    res(2).getAs[Long]("user_id") shouldBe 8L
  }

  test("sessionizeBatch (window form) agrees with stateful sessionize") {
    val t0 = ts("2024-01-01 00:00:00.000123")
    val raw = Seq(
      EventStreams.Event(1L, t0, 7L, "a", 1.0),
      EventStreams.Event(2L, ts("2024-01-01 00:10:00"), 7L, "a", 2.0),
      EventStreams.Event(3L, ts("2024-01-01 05:00:00"), 7L, "a", 4.0),
      EventStreams.Event(4L, ts("2024-01-01 00:30:00"), 8L, "a", 8.0),
      EventStreams.Event(5L, ts("2024-01-01 09:30:01"), 7L, "a", 16.0),
    )
    val cols = Seq("user_id", "start", "end", "n_events", "total_value")
    val batch = EventStreams.sessionizeBatch(
        raw.toDS().toDF(), gapMs = 4L * 3600 * 1000)
      .select(cols.map(col): _*).orderBy("user_id", "start").collect()
    val stateful = EventStreams.sessionize(raw.toDS(), gapMs = 4L * 3600 * 1000)
      .select(cols.map(col): _*).orderBy("user_id", "start").collect()
    batch.toSeq shouldBe stateful.toSeq
    batch should have length 4 // 09:30:01 is > 4h past 05:00 ⇒ own session
  }

  test("windowed agg runs as a real stream (MemoryStream, update mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "2 hours")
    val agg = EventStreams.windowedAgg(streamDf, "1 hour")
    val q = agg.writeStream.format("memory").queryName("win_test")
      .outputMode("complete").start()
    try {
      mem.addData((1L, ts("2024-01-01 00:10:00"), 1L, "click", 1.0),
        (2L, ts("2024-01-01 00:20:00"), 1L, "click", 2.0))
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM win_test").collect()
      out should have length 1
      out.head.getAs[Long]("n_events") shouldBe 2L
    } finally q.stop()
  }
}
