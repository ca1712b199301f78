package graft.util

import org.apache.spark.sql.DataFrame

/** Stats-safe lineage truncation for iterative DataFrame fixpoints.
  *
  * Spark 4's `Dataset.localCheckpoint` truncates the LOGICAL lineage
  * but copies the pre-checkpoint plan's ESTIMATED statistics into the
  * resulting `LogicalRDD` (stats propagation through checkpoints). In a
  * fixpoint loop where round N+1's state is built by joining round N's
  * state with projections of itself, the size-in-bytes estimate is a
  * PRODUCT of the two sides — i.e. it SQUARES every round. Measured on
  * a minimal self-join loop: `sizeInBytes.bitLength` 19 → 37 → 74 →
  * … → 37 106 by round 12, doubling per round. The numbers stay
  * mathematically exact BigInts, so by round ~40 every stats visit
  * (join-strategy selection consults `plan.stats` on each planning
  * pass) multiplies numbers with tens of thousands of bits and the
  * DRIVER freezes inside `SizeInBytesOnlyStatsPlanVisitor` — cores
  * busy, no jobs running. Short loops (≤ a dozen rounds: star-CC,
  * pivot MIS, match-merge) pay only a mild, bounded tax; anything that
  * can run tens-to-hundreds of rounds (CENTER's sequential-chain worst
  * case) must not inherit the estimate at all.
  *
  * `localTruncated` eagerly local-checkpoints and then rebuilds the
  * frame from the checkpointed RDD, so the new leaf carries NO origin
  * estimate (it reverts to the constant size-unknown default, which no
  * longer compounds across rounds). Cost: one InternalRow↔Row
  * conversion when the state is read — noise next to the joins the
  * state feeds, and only paid by loops that opt in.
  */
object Checkpoints {
  def localTruncated(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(eager = true)
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }
}
