package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Shared LSH-style candidate-pair generation: rows keyed by a 64-bit
  * block key → deduplicated intra-block pairs (idA < idB).
  *
  * One `groupBy(key)` shuffle + one `distinct` shuffle; the per-block
  * member cap is applied BEFORE pairs are emitted (keep the `cap`
  * smallest ids, deterministic), so a hot key can never emit more than
  * cap·(cap−1)/2 pairs — the skew guard that makes this safe at
  * 10^12-row scale. Used by ZSS blocking, MinHash/SimHash near-dup, and
  * embedding-LSH similarity alike.
  */
object CandidateGen {

  def pairsFromKeys(keyed: Dataset[(Long, Long)], cap: Int): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    // Cap BEFORE materializing the block: row_number streams through a
    // sort within the key's partition, so a degenerate hot key (10^9
    // members at corpus scale) never has to fit in one collect_list
    // buffer — at most `cap` rows per key survive to the aggregation.
    // The window and the groupBy share the same hash partitioning, so
    // Catalyst plans a single exchange for both.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"key").orderBy($"id")
    keyed
      .toDF("key", "id")
      .withColumn("__rn", row_number().over(w))
      .where($"__rn" <= cap)
      .groupBy($"key")
      .agg(collect_list($"id").as("ids"))
      .select($"ids")
      .as[Seq[Long]]
      .flatMap { ids =>
        if (ids.length < 2) Iterator.empty
        else {
          val arr = ids.toArray
          java.util.Arrays.sort(arr)
          for {
            i <- Iterator.range(0, arr.length)
            j <- Iterator.range(i + 1, arr.length)
          } yield (arr(i), arr(j))
        }
      }
      .toDF("idA", "idB")
      .distinct()
  }
}
