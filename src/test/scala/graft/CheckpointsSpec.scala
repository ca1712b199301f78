package graft

import graft.util.Checkpoints.localTruncated
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Checkpoints.localTruncated` — the stats-safe lineage truncation the
  * long-chain fixpoints (CENTER and anything that can run dozens-to-
  * hundreds of rounds) use instead of plain `localCheckpoint`.
  *
  * Two properties:
  *  1. IDENTITY — same rows, same schema, still consumable by further
  *     joins/aggregates (it is a drop-in replacement).
  *  2. STATS DO NOT COMPOUND — in a self-join fixpoint loop, plain
  *     `localCheckpoint` copies the pre-checkpoint plan's estimated
  *     sizeInBytes into the new leaf, so the estimate MULTIPLIES every
  *     round (bitLength roughly doubles per round; by round ~40 every
  *     `plan.stats` visit is BigInt arithmetic on tens of thousands of
  *     bits and the driver freezes inside the stats visitor).
  *     `localTruncated` rebuilds the frame from the checkpointed RDD,
  *     which reverts the leaf to the constant size-unknown default —
  *     the bitLength stays flat no matter how many rounds run.
  */
class CheckpointsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** One fixpoint round of the shape CENTER/star-CC use: state joined
    * against a projection of itself, then re-truncated. */
  private def round(st: DataFrame, truncate: DataFrame => DataFrame): DataFrame = {
    val nxt = st.join(
        st.select(col("id").as("id2"), col("v").as("v2")),
        col("id") === col("id2"))
      .select(col("id"), (col("v") + col("v2")).as("v"))
    truncate(nxt)
  }

  private def statsBits(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.bigInteger.bitLength()

  test("identity: same rows and schema, still joinable downstream") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("id", "v")
    val t = localTruncated(df)
    assert(t.schema === df.schema)
    assert(t.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
    // downstream consumption: a join + aggregate over the truncated frame
    val joined = t.join(df.select(col("id"), col("v").as("w")), "id")
      .agg(sum(col("v") + col("w"))).head().getLong(0)
    assert(joined === 12L)
  }

  test("stats stay flat across self-join rounds (localCheckpoint compounds)") {
    val s = spark; import s.implicits._
    val init = Seq(("a", 1L), ("b", 2L)).toDF("id", "v")

    // plain localCheckpoint: the inherited estimate compounds per round
    var plain = init.localCheckpoint(true)
    val plainBits = (1 to 6).map { _ =>
      plain = round(plain, _.localCheckpoint(true))
      statsBits(plain)
    }
    // strictly growing and super-linear by the end (doubling-ish)
    assert(plainBits.last > plainBits.head * 4,
      s"expected compounding growth, got $plainBits")

    // localTruncated: flat — every round's leaf restarts from the
    // size-unknown default, so round 6's estimate equals round 1's
    var trunc = localTruncated(init)
    val truncBits = (1 to 6).map { _ =>
      trunc = round(trunc, localTruncated)
      statsBits(trunc)
    }
    assert(truncBits.distinct.size === 1,
      s"expected flat stats bits, got $truncBits")
    assert(truncBits.last < plainBits.last)

    // and the values are still right after 6 rounds: v doubles per round
    assert(trunc.orderBy("id").collect().map(_.getLong(1)).toSeq ===
      Seq(64L, 128L))
  }
}
