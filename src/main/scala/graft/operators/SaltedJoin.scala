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

  /** Adaptive variant: salt ONLY keys whose probe-side degree exceeds
    * `hotThreshold`; the build side is replicated `salts`× for those
    * keys alone and shipped once for everything else. Flat salting
    * multiplies the entire build side's shuffle volume by `salts` even
    * when no key is hot — at 10^12-row scale that is the dominant cost
    * of the join, so pay the one cheap map-side-combinable degree count
    * (narrow probe columns) instead and replicate surgically. The hot
    * set is tiny by construction (≤ |probe| / hotThreshold keys), so it
    * broadcasts. */
  def adaptiveSaltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int,
      leftSaltBy: Column,
      hotThreshold: Long = 2048L): DataFrame =
    adaptiveSaltedEquiJoin(left, right, key, salts, leftSaltBy,
      hotKeysOf(left, key, hotThreshold))

  /** Probe-side keys whose degree exceeds the threshold — one narrow
    * map-side-combinable aggregate. Compute this from the NARROW
    * relation that carries the key (e.g. the raw pairs table) rather
    * than a wide join output: the degree of a key is invariant under
    * the upstream 1:1 enrichment joins, and counting on the wide plan
    * would re-execute it. */
  def hotKeysOf(probe: DataFrame, key: String, hotThreshold: Long): DataFrame =
    probe.groupBy(col(key)).agg(count(lit(1)).as("__deg"))
      .where(col("__deg") > hotThreshold)
      .select(col(key))

  /** As [[adaptiveSaltedEquiJoin]] but with a precomputed hot-key set
    * (single column named `key`). */
  def adaptiveSaltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int,
      leftSaltBy: Column,
      hotKeys: DataFrame): DataFrame = {
    require(salts > 0)
    val sl = left
      .join(broadcast(hotKeys.withColumn("__hot", lit(true))), Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot").isNotNull, pmod(xxhash64(leftSaltBy), lit(salts)).cast("int"))
          .otherwise(lit(0)))
      .drop("__hot")
    val srCold = right
      .join(broadcast(hotKeys), Seq(key), "left_anti")
      .withColumn("__salt", lit(0))
    val srHot = right
      .join(broadcast(hotKeys), Seq(key), "left_semi")
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    sl.join(srCold.unionByName(srHot), Seq(key, "__salt")).drop("__salt")
  }
}
