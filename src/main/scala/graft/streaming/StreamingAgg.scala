package graft.streaming

import graft.operators.IncrementalAgg
import graft.sources.TableIO
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the EXACT incremental aggregate table
  * ([[IncrementalAgg]]): each micro-batch folds its delta into the
  * persisted per-group (count, decimal-sum) state.
  *
  * Unlike the sketch table (whose union is idempotent by itself), an
  * exact-sum fold applied twice DOUBLE-COUNTS — so replay safety comes
  * from the same generation discipline as StreamingEr: batch n writes
  * `state_b{n}` computed from `state_b{n-1}` ⊕ agg(delta_n), both
  * `_SUCCESS`-gated. Re-delivering batch n recomputes `state_b{n}`
  * from the UNCHANGED `state_b{n-1}` — same result, not a double
  * application. Reads resume from the latest complete generation.
  * Each generation is #groups rows — metadata-sized, O(delta) work per
  * batch, never an O(history) rescan.
  */
object StreamingAgg {

  val TablePrefix = "agg_state_b"

  /** Latest complete generation number, if any. */
  def latestGen(spark: SparkSession, io: TableIO): Option[Long] =
    io.listTables(spark, TablePrefix)
      .map(_.stripPrefix(TablePrefix).toLong).sorted.lastOption

  /** Current state (latest complete generation). */
  def state(spark: SparkSession, io: TableIO): Option[DataFrame] =
    latestGen(spark, io).map(g => io.read(spark, s"$TablePrefix$g"))

  /** Fold one micro-batch: state_b{batchId} = prev ⊕ agg(batch). */
  def processBatch(batch: DataFrame, batchId: Long, groupCols: Seq[String],
                   sumCols: Seq[String], io: TableIO): Unit = {
    val spark = batch.sparkSession
    val deltaAgg = IncrementalAgg.aggregate(batch, groupCols, sumCols)
    // resume from the latest generation BELOW this batch id — a replay
    // of batch n must not fold into n's own (possibly complete) output
    val prev = io.listTables(spark, TablePrefix)
      .map(_.stripPrefix(TablePrefix).toLong).filter(_ < batchId).sorted.lastOption
      .map(g => io.read(spark, s"$TablePrefix$g"))
    val next = prev match {
      case Some(st) => IncrementalAgg.merge(st, deltaAgg, groupCols, sumCols)
      case None => deltaAgg
    }
    io.write(next, s"$TablePrefix$batchId")
  }

  /** foreachBatch wiring for a streaming source. */
  def start[T](stream: Dataset[T], groupCols: Seq[String], sumCols: Seq[String],
               io: TableIO, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[T], batchId: Long) =>
        processBatch(batch.toDF(), batchId, groupCols, sumCols, io)
      }
      .start()
}
