package graft

import graft.operators.BlockSplit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BlockSplit (exact skew-balanced pair enumeration): differential
  * against brute-force within-block pairs across odd/even/degenerate
  * block sizes, exactly-once emission, the ≤ 1 per-row imbalance
  * invariant (counting zero-emitters), duplicate-row set semantics, and
  * cross-block dedup of the user-facing pair set. */
class BlockSplitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Blocks of every size 0..9 (odd, even, n=1 isolate, n=2 minimal)
    * plus one hot 101-member and one hot 100-member block; ids
    * deliberately non-contiguous so idx ≠ id. */
  private def mixedBlocks = {
    import spark.implicits._
    val rows = for {
      (n, k) <- (0 to 9).zipWithIndex ++ Seq((101, 10), (100, 11))
      i <- 0 until n
    } yield (k.toLong, 1000L * k + 7L * i + (i % 3))
    rows.toDF("key", "id")
  }

  private def brute(df: org.apache.spark.sql.DataFrame) =
    df.select(col("key"), col("id")).distinct().as("a")
      .join(df.select(col("key"), col("id")).distinct().as("b"),
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.key").as("key"), col("a.id").as("idA"),
        col("b.id").as("idB"))

  test("balancedPairs equals brute force per block, each pair exactly once") {
    val in = mixedBlocks
    val got = BlockSplit.balancedPairs(in)
      .select(col("key"), col("idA"), col("idB"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = brute(in).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly once: no duplicates even before a distinct
    assert(got.length === got.toSet.size)
    assert(got.toSet === want.toSet)
  }

  test("per-row emission imbalance <= 1 within every block, zero-emitters included") {
    val in = mixedBlocks
    val ix = BlockSplit.indexed(in).where(col("n") >= 2)
    val emCnt = BlockSplit.balancedPairs(in)
      .groupBy(col("key"), col("emitter_idx").as("idx"))
      .agg(count(lit(1)).as("m"))
    val spread = ix.join(emCnt, Seq("key", "idx"), "left")
      .select(col("key"), coalesce(col("m"), lit(0L)).as("m"))
      .groupBy(col("key"))
      .agg((max(col("m")) - min(col("m"))).as("imb"), max(col("m")).as("mx"))
    val rows = spread.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("imb") <= 1L,
      s"block ${r.get(0)} imbalance ${r.getAs[Long]("imb")}"))
    // the hot blocks really do cap per-row work at ~n/2, not n-1:
    val hot = ix.where(col("n") >= 100).select(col("key")).distinct()
      .collect().map(_.getLong(0)).toSet
    spread.collect().filter(r => hot(r.getLong(0)))
      .foreach(r => assert(r.getAs[Long]("mx") <= 51L))
  }

  test("duplicate (key,id) rows do not duplicate pairs (set semantics)") {
    import spark.implicits._
    val dup = Seq((1L, 10L), (1L, 10L), (1L, 20L), (1L, 30L), (1L, 20L))
      .toDF("key", "id")
    val got = BlockSplit.balancedPairs(dup)
      .select(col("idA"), col("idB")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === 3)
    assert(got.toSet === Set((10L, 20L), (10L, 30L), (20L, 30L)))
  }

  test("pairs() dedups across blocks; empty and singleton blocks emit nothing") {
    import spark.implicits._
    // {10,20} share TWO keys; key 3 is a singleton
    val in = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (2L, 30L),
      (3L, 99L)).toDF("key", "id")
    val got = BlockSplit.pairs(in).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 20L), (10L, 30L), (20L, 30L)))
    assert(BlockSplit.pairs(spark.emptyDataset[(Long, Long)]
      .toDF("key", "id")).count() === 0L)
  }
}
