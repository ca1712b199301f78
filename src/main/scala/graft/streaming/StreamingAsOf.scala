package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXACT event-time as-of join on a stream — an operator Structured
  * Streaming has no builtin for (stream-stream joins support interval
  * conditions but not "most recent at-or-before" semantics, and the
  * naive latest-value-state approach is wrong under out-of-order
  * arrival: a right row landing late but before an unmatched left's
  * event time must still win the match).
  *
  * Design: both sides union into ONE keyed stream (so they share a
  * watermark), then `flatMapGroupsWithState` buffers per key:
  *
  *  - a left row is emitted only once the watermark passes its event
  *    time — at that point no right row at-or-before it can still
  *    arrive, so the match is FINAL (exactly the batch semantics;
  *    StreamingAsOfSpec asserts stream ≡ `AsOfJoin.asOf` under
  *    shuffled cross-batch arrival orders).
  *  - state is minimal by construction: pending lefts are only those
  *    inside the watermark delay, and of the rights behind the
  *    watermark only the single LATEST survives (it is the standing
  *    as-of value for every future left; older rights are dominated).
  *    Steady-state size per key is O(rate × watermarkDelay) + 1 —
  *    unbounded streams run forever in bounded memory, and fully
  *    drained keys remove their state (asserted via state metrics).
  *
  * Same tie rule as the batch operator's `latestPerKeyTs`: among right
  * rows sharing a timestamp the highest `rid` wins. No-match lefts
  * emit -1 sentinels (the batch query q_asof_join coalesces to the
  * same sentinels).
  */
object StreamingAsOf {

  final case class RightRow(sec: Long, rid: Long, value: Double)
  final case class LeftRow(sec: Long, eventId: Long)
  /** Per-key buffers (public: the state encoder constructs it). */
  final case class AsOfBuf(rights: Seq[RightRow], lefts: Seq[LeftRow])
  final case class AsOfMatch(user_id: Long, event_id: Long, sec: Long,
                             ref_sec: Long, ref_rid: Long, ref_value: Double)

  /** `left`: (user_id, ts, event_id); `right`: (user_id, ts, rid,
    * value). Returns the finalized matches, one row per left event. */
  def asOfStream(left: DataFrame, right: DataFrame,
                 watermarkDelay: String = "30 minutes"): Dataset[AsOfMatch] = {
    val spark = left.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    val l = left.select(col("user_id").cast("long"), col("ts").cast("timestamp"),
      lit(1).as("side"), col("event_id").cast("long").as("id"), lit(0.0).as("value"))
    val r = right.select(col("user_id").cast("long"), col("ts").cast("timestamp"),
      lit(0).as("side"), col("rid").cast("long").as("id"), col("value").cast("double"))

    r.unionByName(l)
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, Int, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsOfBuf, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Int, Long, Double)],
         state: GroupState[AsOfBuf]) =>
          val wmMs = state.getCurrentWatermarkMs()
          val buf = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
          var rights = buf.rights
          var lefts = buf.lefts
          rows.foreach { case (_, ts, side, id, value) =>
            val sec = ts.getTime / 1000L
            if (side == 0) rights :+= RightRow(sec, id, value)
            else lefts :+= LeftRow(sec, id)
          }
          // strictly-less: a future row may still carry ts == watermark,
          // so a left at the watermark is not final yet
          val (ready, pending) = lefts.partition(_.sec * 1000L < wmMs)
          val sortedRights = rights.sortBy(rr => (rr.sec, rr.rid))
          val out = ready.sortBy(lr => (lr.sec, lr.eventId)).map { lr =>
            // latest right at-or-before the left; ties on sec → max rid
            // (sortedRights order makes it the LAST qualifying element)
            sortedRights.foldLeft(Option.empty[RightRow]) { (acc, rr) =>
              if (rr.sec <= lr.sec) Some(rr) else acc
            } match {
              case Some(rr) => AsOfMatch(user, lr.eventId, lr.sec, rr.sec, rr.rid, rr.value)
              case None     => AsOfMatch(user, lr.eventId, lr.sec, -1L, -1L, -1.0)
            }
          }
          // evict: rights at-or-past the watermark all stay (any may be
          // the match of a future left); of those behind it only the
          // latest survives — it dominates for every left still to come
          val (ahead, behind) = sortedRights.partition(_.sec * 1000L >= wmMs)
          val keptRights = behind.lastOption.toSeq ++ ahead
          if (keptRights.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update(AsOfBuf(keptRights, pending))
            if (pending.nonEmpty)
              // re-invoke when the watermark passes the oldest pending
              // left (must be strictly after the current watermark)
              state.setTimeoutTimestamp(
                math.max(pending.map(_.sec).min * 1000L + 1, wmMs + 1))
          }
          out.iterator
      }
  }
}
