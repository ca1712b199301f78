package graft.streaming

import graft.sources.TableIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Stream enrichment against a SLOWLY-CHANGING dimension.
  *
  * A plain stream-static join freezes the static side's content at
  * query planning for most sources — a dim row updated mid-stream is
  * not reliably observed by later micro-batches. The dependable
  * pattern, used here, is `foreachBatch`: every micro-batch re-reads
  * the dimension through [[TableIO]] (so it sees the latest
  * `_SUCCESS`-complete snapshot — a half-written dim update is never
  * observed) and broadcast-joins it into the batch. The dim read is
  * one small table listing per batch; the join never shuffles the
  * stream side. Upstream, the dim itself is maintained with
  * `Upsert.upsert` + `TableIO.write` — together they are the
  * SCD-enrichment loop a 100 TB ingest runs continuously.
  *
  * StreamingEnrichSpec updates the dim between batches and asserts
  * each batch joined against the snapshot current AT ITS TIME — and
  * that rows with no dim entry pass through null-enriched rather than
  * being dropped (left join: enrichment must never lose events).
  */
object StreamingEnrich {

  /** `stream`: any streaming DataFrame with `keyCol`; the dim table
    * `dimTable` (read via `io`) must also contain `keyCol`. Each
    * micro-batch is left-joined against the CURRENT dim snapshot and
    * appended to the parquet directory `outPath` (tagged with the
    * batch id, so replays of a failed batch are identifiable). */
  def enrichedStream(stream: DataFrame, io: TableIO, dimTable: String,
                     keyCol: String, outPath: String): StreamingQuery = {
    val spark = stream.sparkSession
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dim = io.read(spark, dimTable)
        batch.join(broadcast(dim), Seq(keyCol), "left")
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
  }
}
