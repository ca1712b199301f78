package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  /** Capped block membership: keep the `cap` smallest DISTINCT ids per
    * key, deterministic. THE single definition of cap semantics — batch
    * pair generation and the streaming new-vs-bucket join both use it,
    * so the two paths can never drift. The rank streams through a sort
    * within the key's partition, so a degenerate hot key (10^9 members
    * at corpus scale) never has to fit in one buffer. NOTE: duplicate
    * rows of a KEPT (key,id) pass through (dense_rank ties) — callers
    * must aggregate with set semantics (collect_set/distinct), as both
    * callers here do. */
  def capByKey(keyed: DataFrame, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("id"))
    keyed
      // dense_rank, not row_number: a duplicate (key,id) row (e.g. a
      // 64-bit band-key collision inside one doc) must not consume a cap
      // slot here while mergeCappedMembers' collect_set/array_union path
      // dedups — both cap definitions must see set semantics. dense_rank
      // gives exactly that (ties share a rank) within the SAME single
      // (key)-partitioned exchange; surviving duplicate copies of a kept
      // id are collapsed by pairsFromKeys' collect_set below.
      .withColumn("__rn", dense_rank().over(w))
      .where(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Incremental form of [[capByKey]] over an aggregated block index:
    * merge a persisted capped index `(key, members: sorted array)` with a
    * micro-batch's new `(key, id)` rows and re-cap. Correct because the
    * cap keeps the LOWEST ids per key, which is subset-monotone:
    * cap(old ∪ new) = cap(cap(old) ∪ new) — an id once evicted can only
    * rank further out as ids accumulate, so capped-only state loses
    * nothing. This is what lets streaming state live as a bucketed table
    * (hash-distributed by key): the state side of the merge join reads
    * pre-distributed with ZERO exchange, and only the delta shuffles.
    *
    * Returns `(key, members, new_members)` where `members` is the
    * re-capped sorted membership and `new_members` this batch's arrivals
    * for the key (uncapped; intersect with `members` for "new AND kept").
    */
  def mergeCappedMembers(oldIdx: Option[DataFrame], newKeyed: DataFrame, cap: Int): DataFrame = {
    // one small shuffle: the delta aggregates to (key, sorted new ids)
    val newAgg = newKeyed.groupBy(col("key"))
      .agg(sort_array(collect_set(col("id"))).as("new_members"))
    oldIdx match {
      case None =>
        newAgg.select(col("key"),
          slice(col("new_members"), 1, cap).as("members"),
          col("new_members"))
      case Some(old) =>
        // element type follows the caller's id column (string ER ids,
        // long doc ids alike — same genericity as pairsFromKeys)
        val empty = array().cast(
          org.apache.spark.sql.types.ArrayType(newKeyed.schema("id").dataType))
        old.join(newAgg, Seq("key"), "full_outer")
          .select(col("key"),
            slice(array_sort(array_union(
              coalesce(col("members"), empty),
              coalesce(col("new_members"), empty))), 1, cap).as("members"),
            coalesce(col("new_members"), empty).as("new_members"))
    }
  }

  /** Pairs touching at least one NEW member, from a merged index row
    * (see [[mergeCappedMembers]]): each new id that survived the cap is
    * paired with every other kept member — the streaming new-vs-bucket
    * candidate set, as pure codegen'd array algebra (no join: the block's
    * membership is already colocated in the row). Equals the batch pair
    * set restricted to pairs whose later member arrived this batch. */
  def pairsWithNewMember(merged: DataFrame): DataFrame =
    merged
      .where(size(col("members")) >= 2 && size(col("new_members")) >= 1)
      .select(explode(flatten(transform(
        array_intersect(col("new_members"), col("members")), n =>
          transform(filter(col("members"), m => m =!= n), m =>
            struct(least(n, m).as("idA"), greatest(n, m).as("idB")))))).as("p"))
      .select(col("p.idA"), col("p.idB"))
      .distinct()

  /** THE pair-emission algebra: all (i < j) element pairs of a sorted
    * array column as one nested codegen'd transform — element i pairs
    * with every element after it that passes `keep`, rendered by `emit`.
    * Shared by ZSS blocking, meta-blocking, sorted-neighborhood, and the
    * exact set-similarity join, so the slice-origin arithmetic lives in
    * exactly one place. */
  def pairwise(ms: Column, emit: (Column, Column) => Column,
      keep: (Column, Column) => Column = (_, _) => lit(true)): Column =
    flatten(transform(ms, (x, i) =>
      transform(filter(slice(ms, i + lit(2), size(ms)), y => keep(x, y)),
        y => emit(x, y))))

  def pairsFromKeys(keyed: DataFrame, cap: Int): DataFrame = {
    // Cap BEFORE materializing the block — at most `cap` rows per key
    // survive to the aggregation. The window and the groupBy share the
    // same hash partitioning, so Catalyst plans a single exchange for
    // both.
    capByKey(keyed, cap)
      .groupBy(col("key"))
      // collect_set: a duplicate (key,id) row that survived the set-
      // semantic cap must not enter the block twice (a duplicated value
      // in `ids` would pair with itself below)
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .where(size(col("ids")) >= 2)
      .select(explode(pairwise(col("ids"),
        (x, y) => struct(x.as("idA"), y.as("idB")))).as("p"))
      .select(col("p.idA"), col("p.idB"))
      .distinct()
  }
}
