package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95 — public
  * paper): order the corpus by a cheap sort key, slide a fixed window
  * over the sorted sequence, and emit every pair closer than `window`
  * positions. The classic complement to hash/LSH blocking — it catches
  * near-duplicates whose hash keys disagree but whose sort keys land
  * adjacent (the reference itself has no blocking at all; SURVEY.md §3b).
  *
  * Scale design (10^12-row rationale):
  *  - The global rank is computed WITHOUT a single-partition sort or a
  *    global window: range-repartition on the sort key, count rows per
  *    range partition (ONE metadata-sized aggregate — `parts` rows reach
  *    the driver, the same bounded class as the IVF training sample),
  *    broadcast the cumulative offsets, and row_number WITHIN each range
  *    partition. rank = offset + local rank is exact because range
  *    partitions are order-disjoint; every per-partition sort runs in
  *    parallel.
  *  - Pair emission reuses the capped-block shape: each row lands in
  *    tile ⌊(rank−1)/w⌋ and the successor tile, so any pair within w
  *    positions shares ≥ 1 tile; tiles hold ≤ 2w rows by construction —
  *    bounded blocks, no skew, no self-join, no w-sized shuffle fan-out.
  */
object SortedNeighborhood {

  /** `rows` plus an exact 1-based global `rank` column under
    * ORDER BY sortCols. The final sort column should make the order
    * total (e.g. a unique id); ranks are then fully deterministic. The
    * range-partitioned input is persisted so the offset pass and the
    * rank pass see identical partition boundaries — and released before
    * returning: the ranked result is eagerly localCheckpoint'ed (narrow
    * — callers rank a projected (id, sort-key) input), so downstream
    * double-reads never recompute and no per-invocation cache leaks. */
  def withGlobalRank(rows: DataFrame, sortCols: Seq[String], parts: Int): DataFrame = {
    val (lazyRanked, ordered) = rankedLazy(rows, sortCols, parts)
    // eager: ranks materialize NOW against the same cached partitions
    // the offsets were counted on, then the big cache is dropped
    val ranked = lazyRanked.localCheckpoint(true)
    ordered.unpersist(false)
    ranked
  }

  /** The un-checkpointed rank plan plus the persisted range-partitioned
    * input (for the caller to release) — split out so the plan-shape
    * spec can assert on the window's physical form, which the eager
    * checkpoint in [[withGlobalRank]] otherwise hides behind a Scan
    * ExistingRDD. */
  private[graft] def rankedLazy(rows: DataFrame, sortCols: Seq[String],
      parts: Int): (DataFrame, DataFrame) = {
    val spark = rows.sparkSession
    val ordered = rows.repartitionByRange(math.max(parts, 1), sortCols.map(col): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one metadata-sized job: per-range-partition row counts → offsets
    val counts = ordered.groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offs = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _))
    import spark.implicits._
    val offDf = broadcast(offs.toSeq.toDF("pid", "off"))
    val w = Window.partitionBy(col("pid")).orderBy(sortCols.map(col): _*)
    val ranked = ordered.withColumn("pid", spark_partition_id())
      .withColumn("__lr", row_number().over(w))
      .join(offDf, "pid")
      .withColumn("rank", col("off") + col("__lr"))
      .drop("pid", "off", "__lr")
    (ranked, ordered)
  }

  /** All pairs (idA < idB) strictly fewer than `window` positions apart
    * in the sortCols order — i.e. each row pairs with its `window − 1`
    * successors, the standard SNM candidate set. */
  def pairs(rows: DataFrame, idCol: String, sortCols: Seq[String], window: Int,
      parts: Int = 32): DataFrame = {
    require(window >= 2, "window must be >= 2")
    val ranked = withGlobalRank(rows, sortCols, parts)
      .select(col(idCol).as("id"), col("rank"))
    val tile = floor((col("rank") - 1) / window)
    // single pass: each row lands in its tile AND the successor tile
    val keyed = ranked.select(explode(array(tile, tile + 1)).as("key"),
      struct(col("rank"), col("id")).as("m"))
    keyed.groupBy(col("key"))
      .agg(array_sort(collect_set(col("m"))).as("ms")) // struct sort ⇒ rank order
      .where(size(col("ms")) >= 2)
      .select(explode(CandidateGen.pairwise(col("ms"),
        (x, y) => struct(least(x("id"), y("id")).as("idA"),
          greatest(x("id"), y("id")).as("idB")),
        (x, y) => y("rank") - x("rank") < window)).as("p"))
      .select(col("p.idA"), col("p.idB"))
      .distinct() // a pair within one tile also appears in the overlap tile
  }
}
