package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** `keyed` must have columns (key, id); the id may be any orderable
    * type — int64 driver ids and 128-bit hex ER ids alike. Pair emission
    * is pure codegen'd array algebra (transform/slice/explode), no typed
    * lambda, so the generic id costs nothing.
    */
  /** Capped block membership: keep the `cap` smallest ids per key,
    * deterministic. THE single definition of cap semantics — batch pair
    * generation and the streaming new-vs-bucket join both use it, so the
    * two paths can never drift. row_number streams through a sort within
    * the key's partition, so a degenerate hot key (10^9 members at
    * corpus scale) never has to fit in one buffer. */
  def capByKey(keyed: DataFrame, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("id"))
    keyed
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= cap)
      .drop("__rn")
  }

  def pairsFromKeys(keyed: DataFrame, cap: Int): DataFrame = {
    // Cap BEFORE materializing the block — at most `cap` rows per key
    // survive to the aggregation. The window and the groupBy share the
    // same hash partitioning, so Catalyst plans a single exchange for
    // both.
    capByKey(keyed, cap)
      .groupBy(col("key"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) >= 2)
      // all (i < j) pairs of the sorted block, emitted as one nested
      // transform: element i pairs with every element after it
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(x.as("idA"), y.as("idB")))))).as("p"))
      .select(col("p.idA"), col("p.idB"))
      .distinct()
  }
}
