package graft

import graft.operators.IncrementalAgg
import graft.sources.ParquetTableIO
import graft.streaming.StreamingAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming exact-aggregate fold must equal the one-pass batch
  * aggregate after any batch split, survive replay without
  * double-counting (generation discipline), and resume from the latest
  * complete generation. */
class StreamingAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[String, (Long, BigDecimal)] =
    df.select(col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap

  private lazy val full = asMap(
    IncrementalAgg.aggregate(events, Seq("event_type"), Seq("value")))

  test("3 MemoryStream batches fold to the one-pass aggregate exactly") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sagg").toString
    val io = new ParquetTableIO(root)
    val rows = events.select($"event_type", $"value").as[(String, Double)].collect()
    val stream = MemoryStream[(String, Double)]
    val q = StreamingAgg.start(stream.toDS().toDF("event_type", "value"),
      Seq("event_type"), Seq("value"), io, s"$root/_ckpt")
    try {
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        stream.addData(chunk.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    assert(StreamingAgg.latestGen(spark, io).contains(2L))
    assert(asMap(StreamingAgg.state(spark, io).get) == full)
  }

  test("replaying a batch recomputes its generation from the prior one — no double count") {
    val root = java.nio.file.Files.createTempDirectory("graft_saggrep").toString
    val io = new ParquetTableIO(root)
    val b0 = events.where(col("event_id") % 2 === 0)
    val b1 = events.where(col("event_id") % 2 =!= 0)
    StreamingAgg.processBatch(b0, 0L, Seq("event_type"), Seq("value"), io)
    StreamingAgg.processBatch(b1, 1L, Seq("event_type"), Seq("value"), io)
    val before = asMap(StreamingAgg.state(spark, io).get)
    // at-least-once: batch 1 re-delivered — must fold into gen 0 again,
    // not into its own complete gen 1 output
    StreamingAgg.processBatch(b1, 1L, Seq("event_type"), Seq("value"), io)
    assert(asMap(StreamingAgg.state(spark, io).get) == before)
    assert(before == full)
  }
}
