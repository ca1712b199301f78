package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming ingest: the incremental path for new corpus
  * files/events. Batch and streaming share the same tumbling-window
  * aggregation logic, so `q_events_window` (batch, oracle-checked) is
  * the golden twin of this stream — StreamingSpec asserts equality.
  *
  * Scale notes: the watermark bounds state only in append/update output
  * modes (complete mode keeps every window by definition) — the
  * in-memory sink below runs `complete` as a test/demo surface, while
  * the production shape is `append` with finalized windows emitted once
  * the watermark passes, from a file/Kafka source with
  * checkpointLocation on durable storage. The incremental-ER path in
  * [[StreamingEr]] is the stateful-pipeline twin.
  */
object StreamingIngest {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The shared windowed aggregation: 5-min tumbling windows per
    * event_type, decimal-exact value sums. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Append-mode variant over an arbitrary streaming DataFrame (same
    * schema as `eventSchema`'s ts/event_type/value columns): only
    * FINALIZED windows are emitted — each window exactly once, after
    * the watermark (max event time − 10 min) passes the window end —
    * and closed-window state is evicted. This is the production shape
    * (bounded state, exactly-once window emission); the complete-mode
    * memory sink below is the test/demo surface. StreamingSpec drives
    * it through a MemoryStream and asserts the exactly-once emission
    * and late-event drop. */
  def startAppendMemoryStream(events: DataFrame, sinkName: String): StreamingQuery =
    windowedAgg(events)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkName)
      .start()

  /** Custom keyed state via `mapGroupsWithState`: a per-key running
    * aggregate (count + value sum) maintained across micro-batches —
    * the arbitrary-state primitive for logic the windowed built-ins
    * can't express (sessionization, per-entity counters/quotas,
    * per-repo ingest accounting). State is one tiny struct per key,
    * partitioned by key across executors; add a timeout conf for
    * bounded-lifetime keys at corpus scale. StreamingSpec drives it
    * through a MemoryStream and checks the cumulative counts against
    * a batch groupBy. */
  def runningUserStats(events: DataFrame): org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (pn, psum) = state.getOption.getOrElse((0L, 0.0))
          var n = pn
          var sum = psum
          rows.foreach { r => n += 1; sum += r._2 }
          state.update((n, sum))
          (user, n, sum)
      }
  }

  /** One closed user session: contiguous activity with no gap larger
    * than the sessionization gap. */
  final case class SessionRow(
      user_id: Long,
      start_ts: Long,   // epoch seconds
      end_ts: Long,
      n_events: Long)

  /** Internal per-user session accumulator (public: the state encoder's
    * generated code must construct/read it). */
  final case class SessionState(start: Long, end: Long, n: Long)

  /** The open (not yet watermark-closed) sessions of one user, sorted by
    * start — more than one can be live at once when out-of-order events
    * inside the watermark delay create islands that a later arrival may
    * still bridge. */
  final case class SessionBuf(open: Seq[SessionState])

  /** Event-time sessionization via `flatMapGroupsWithState`: per user,
    * contiguous activity separated by gaps ≤ `gapSeconds` folds into one
    * session. Each invocation merges the batch's event times into the
    * user's OPEN session intervals (an islands sweep — a late event may
    * land inside, before, or BETWEEN open sessions and bridge them,
    * which is why state is a list, not a single open session), then
    * closes exactly the sessions the watermark can no longer touch
    * (`end + gap < watermark`): those are emitted once and freed, so
    * state size tracks concurrent in-delay activity, not history. The
    * event-time timeout re-invokes the same logic when activity stops.
    * This is the zero-or-more-rows custom state shape
    * (`mapGroupsWithState` emits exactly one row per key). The
    * watermark is applied HERE (the timeout requires the watermarked
    * timestamp column to reach the stateful operator — a projection to
    * seconds upstream would strip it); out-of-order arrivals within
    * `watermarkDelay` reproduce the batch twin exactly (StreamingSpec
    * asserts both the in-order and the out-of-order equivalence). */
  def sessionize(events: DataFrame, gapSeconds: Long,
                 watermarkDelay: String = "0 seconds"): org.apache.spark.sql.Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionBuf, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rowsTs: Iterator[(Long, java.sql.Timestamp)], state: GroupState[SessionBuf]) =>
          val wmMs = state.getCurrentWatermarkMs()
          val existing = state.getOption.map(_.open).getOrElse(Seq.empty)
          val pts = rowsTs.map(_._2.getTime / 1000L).toArray.sorted
          // islands sweep over (open intervals ∪ new points) by start:
          // adjacent items within the gap merge (n adds, end maxes)
          val items = (existing ++ pts.map(t => SessionState(t, t, 1)))
            .sortBy(s => (s.start, s.end))
          var acc = List.empty[SessionState]
          items.foreach { it =>
            acc match {
              case h :: tail if it.start - h.end <= gapSeconds =>
                acc = SessionState(h.start, math.max(h.end, it.end), h.n + it.n) :: tail
              case _ => acc ::= it
            }
          }
          val all = acc.reverse
          val wmSec = wmMs / 1000L
          val (closed, open) = all.partition(s => s.end + gapSeconds < wmSec)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionBuf(open))
            // strictly after the current watermark or Spark rejects it
            state.setTimeoutTimestamp(
              math.max((open.map(_.end).min + gapSeconds) * 1000L, wmMs + 1))
          }
          closed.iterator.map(s => SessionRow(user, s.start, s.end, s.n))
      }
  }

  /** Batch twin of [[sessionize]] — the classic islands-and-gaps window
    * pattern: a session break is a per-user gap > `gapSeconds`, the
    * running break count is the session id, and each (user, session)
    * group aggregates to one row. Session semantics are defined ONCE by
    * this pair: StreamingSpec asserts stream ≡ batch, and the DuckDB
    * oracle recomputes this twin independently (q_sessions). */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("sec"))
    events
      .select(col("user_id").cast("long"), unix_timestamp(col("ts")).as("sec"))
      .withColumn("brk",
        when(col("sec") - lag(col("sec"), 1).over(byUser) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("sess", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess"))
      .agg(min(col("sec")).as("start_ts"), max(col("sec")).as("end_ts"),
        count(lit(1)).as("n_events"))
      .drop("sess")
  }

  /** Start a streaming query over the events parquet directory into an
    * in-memory sink (complete mode: emit every window each trigger). */
  def startMemoryStream(spark: SparkSession, sfDir: String, sinkName: String): StreamingQuery = {
    // the sf dirs store each table as a single parquet FILE; a file
    // source needs a directory, so stream the parent dir with a glob
    val stream = spark.readStream
      .schema(eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    windowedAgg(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sinkName)
      .start()
  }
}
