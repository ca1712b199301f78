package graft

import graft.operators.Sketches
import graft.sources.ParquetTableIO
import graft.streaming.StreamingSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming sketch table must give EXACTLY the one-pass batch
  * estimate (HLL union is register-wise max — split-independent), stay
  * kilobyte-sized per batch, and be idempotent under batch replay. */
class StreamingSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  private def estMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(r.length - 1)).toMap

  test("3 MemoryStream batches: merged streaming estimate == one-pass batch estimate") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sksink").toString
    val io = new ParquetTableIO(root)

    val rows = events.select($"event_type", $"event_id")
      .as[(String, Long)].collect()
    val stream = MemoryStream[(String, Long)]
    val q = StreamingSketch.start(
      stream.toDS().toDF("event_type", "event_id"),
      Seq("event_type"), "event_id", io, s"$root/_ckpt")
    try {
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        stream.addData(chunk.toSeq); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = estMap(StreamingSketch.estimate(spark, io, Seq("event_type")))
    val direct = estMap(Sketches.hllDirectEstimate(events, Seq("event_type"), "event_id"))
    assert(streamed == direct,
      "streaming-maintained sketch table diverged from the one-pass sketch")
    // the state really is sketches, not rows: each shard table is tiny
    val nShardRows = StreamingSketch.partials(spark, io).count()
    assert(nShardRows <= 3 * 5, s"expected ≤ (batches × groups) sketch rows, got $nShardRows")
  }

  test("replaying a batch overwrites the same shard table — estimate unchanged (idempotent)") {
    val root = java.nio.file.Files.createTempDirectory("graft_skrep").toString
    val io = new ParquetTableIO(root)
    val b0 = events.where(col("event_id") % 2 === 0)
    val b1 = events.where(col("event_id") % 2 =!= 0)
    StreamingSketch.processBatch(b0, 0L, Seq("event_type"), "event_id", io)
    StreamingSketch.processBatch(b1, 1L, Seq("event_type"), "event_id", io)
    val before = estMap(StreamingSketch.estimate(spark, io, Seq("event_type")))
    // at-least-once delivery: batch 1 re-processed
    StreamingSketch.processBatch(b1, 1L, Seq("event_type"), "event_id", io)
    val after = estMap(StreamingSketch.estimate(spark, io, Seq("event_type")))
    assert(after == before)
    val direct = estMap(Sketches.hllDirectEstimate(events, Seq("event_type"), "event_id"))
    assert(after == direct)
  }
}
