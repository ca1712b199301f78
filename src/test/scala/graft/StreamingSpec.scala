package graft

import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming windowed aggregation equals its batch twin") {
    import spark.implicits._
    val q = StreamingIngest.startMemoryStream(spark, "/root/testdata/sf0.001", "ev_win")
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_win")
      val batch = StreamingIngest.windowedAgg(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      assert(streamed.count() > 0)
      assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
      // and consistent with the oracle-checked q_events_window shape
      val viaQuery = RelQueries.queries("q_events_window")(spark, "/root/testdata/sf0.001")
      val agg = streamed.groupBy($"win_start".cast("long").as("win_start"), $"event_type")
        .agg(sum($"n").as("n"), sum($"sum_value").as("sum_value"))
      assert(agg.count() == viaQuery.count())
    } finally q.stop()
  }

  test("stateful stream: per-user running counts via mapGroupsWithState semantics") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val events = spark.readStream
      .schema(StreamingIngest.eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet("/root/testdata/sf0.001")
      .selectExpr("user_id", "event_type")
      .as[(Long, String)]
    val counted = events
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val now = prev + rows.size
          state.update(now)
          (user, now)
      }
    val q = counted.toDF("user_id", "n_events").writeStream
      .outputMode(OutputMode.Update).format("memory").queryName("user_counts").start()
    try {
      q.processAllAvailable()
      val got = spark.table("user_counts")
        .groupBy($"user_id").agg(max($"n_events").as("n_events"))
      val expected = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy($"user_id").agg(count(lit(1)).as("n_events"))
      assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    } finally q.stop()
  }
}
