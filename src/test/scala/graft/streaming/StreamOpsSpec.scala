package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.operators.CrawlOps

/** Streaming results must equal their batch twins under AvailableNow. */
class StreamOpsSpec extends AnyFunSuite with SparkSpec {

  private lazy val eventsDir: String = {
    // file streaming sources want a directory
    val dir = Files.createTempDirectory("graft-stream-events").toString
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(s"$dir/events.parquet"))
    dir
  }
  private lazy val batchEvents = spark.read.parquet(eventsDir)

  test("watermarked windowed counts equal the batch aggregate") {
    val stream = StreamOps.parquetStream(spark, eventsDir, batchEvents.schema)
    val out = StreamOps.runAvailableNow(spark,
      StreamOps.windowedCounts(stream), "win_counts")
      .orderBy(col("hour"), col("event_type")).collect()
    val batch = CrawlOps.windowCounts(batchEvents).collect()
    assert(out.length == batch.length && out.length > 0)
    out.zip(batch).foreach { case (s, b) =>
      assert(s.getTimestamp(0) == b.getTimestamp(0))
      assert(s.getString(1) == b.getString(1))
      assert(s.getLong(2) == b.getLong(2))
      assert(math.abs(s.getDouble(3) - b.getDouble(3)) < 1e-9)
    }
  }

  test("session_window sessionization equals the lag+running-sum formulation") {
    // two independent formulations of the same gap rule must agree row-for-row
    // ts is timestamp_ntz in the driver tables → collect as LocalDateTime
    val viaWindow = CrawlOps.sessionizeWindow(batchEvents).collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2), r.getLong(3))).toSet
    val viaLag = CrawlOps.sessionize(batchEvents)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2), r.getLong(3))).toSet
    assert(viaWindow.nonEmpty && viaWindow == viaLag)
  }

  test("exact-gap boundary: the two sessionize twins agree (closed 30-min gap)") {
    import spark.implicits._
    import java.sql.Timestamp
    // user 1: second event EXACTLY gap after the first → same session in
    // both formulations (sessionize breaks only on diff > gap, and Spark
    // merges session windows inclusively at the boundary — verified here,
    // since an exclusive-end reading would predict a split).
    // user 2: gap + 1µs → new session in both.
    val df = Seq(
      (1L, 1L, Timestamp.valueOf("2026-01-01 00:00:00")),
      (1L, 2L, Timestamp.valueOf("2026-01-01 00:30:00")),
      (2L, 3L, Timestamp.valueOf("2026-01-01 00:00:00")),
      (2L, 4L, Timestamp.valueOf("2026-01-01 00:30:00.000001"))
    ).toDF("user_id", "event_id", "ts")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.get(1), r.get(2), r.getLong(3))
    val viaLag = CrawlOps.sessionize(df)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect().map(key).toSet
    val viaWin = CrawlOps.sessionizeWindow(df).collect().map(key).toSet
    assert(viaLag == viaWin, s"lag=$viaLag window=$viaWin")
    // semantics, not just agreement: user 1 one session of 2; user 2 split
    assert(viaLag.count(_._1 == 1L) == 1 && viaLag.count(_._1 == 2L) == 2)
  }

  test("mapGroupsWithState session counts equal the batch sessionize") {
    import spark.implicits._
    val stream = StreamOps.parquetStream(spark, eventsDir, batchEvents.schema)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tsMicros"))
      .as[StreamOps.UserEvent]
    val out = StreamOps.runAvailableNow(spark,
      StreamOps.sessionCounts(stream).toDF(), "sess_counts", OutputMode.Update())
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val batch = CrawlOps.sessionize(batchEvents)
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == batch)
  }
}
