package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit salted equi-join for hot-key skew (north_rule requirement).
  *
  * AQE's skew-join split only rebalances existing shuffle blocks of a
  * sort-merge join; when ONE key holds a large share of the probe side
  * (e.g. a tree id appearing in millions of candidate pairs), salting
  * spreads that key across `salts` sub-partitions up front: the skewed
  * (left/probe) side derives a deterministic salt from a high-entropy
  * column, the small-per-key (right/build) side is replicated `salts`
  * times. Replication multiplies the right side's shuffle volume — use
  * for joins where the right side is per-key small (here: one tree row
  * per id) and pick `salts` ≈ executor-count / hot-key-share.
  */
object SaltedJoin {

  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int,
      leftSaltBy: Column): DataFrame = {
    require(salts > 0)
    val sl = left.withColumn("__salt", pmod(xxhash64(leftSaltBy), lit(salts)).cast("int"))
    val sr = right.withColumn(
      "__salt",
      explode(array((0 until salts).map(lit): _*)))
    sl.join(sr, Seq(key, "__salt")).drop("__salt")
  }
}
