package graft

import graft.operators.{Blocking, ParseStage}
import graft.sources.{BucketedState, CorpusGen}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed state layout must deliver its one promise: joins and
  * aggregations on the bucket column read the table pre-distributed —
  * NO exchange on the state side. This is the local demonstration of
  * the 100 TB incremental-join shape (persistent block index bucketed
  * by key; each batch joins against it without re-shuffling the
  * corpus-sized state).
  */
class BucketedStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fmt(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  private def exchanges(s: String): Int =
    s.linesIterator.count(_.matches(".*\\bExchange \\(\\d+\\).*"))

  test("bucketed block index: key joins and aggregations run shuffle-free") {
    val root = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val trees = ParseStage.parse(CorpusGen.corpus(spark, "/root/testdata/sf0.001"))
    val keyed = Blocking.keyedIds(trees, Blocking.BlockingConfig())

    BucketedState.write(keyed, "block_index", s"$root/block_index", 8, "key")
    assert(BucketedState.exists(spark, "block_index"))
    val state = BucketedState.read(spark, "block_index")
    assert(state.count() == keyed.count())

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the incremental shape: a (small) batch of new keys probing the
      // persistent index — the bucketed side must contribute ZERO
      // exchanges; only the new side shuffles to the bucket layout
      val newKeys = keyed.where(pmod(col("key"), lit(97)) === 0) // narrow "new batch"
      val probe = fmt(newKeys.join(state.withColumnRenamed("id", "old_id"), "key"))
      assert(probe.contains("SortMergeJoin") || probe.contains("ShuffledHashJoin"))
      assert(exchanges(probe) <= 1,
        s"bucketed state side must not re-shuffle (expected <=1 exchange for the new side)\n$probe")

      // self-join of the state on its bucket column: no exchange at all
      val self = fmt(state.join(state.withColumnRenamed("id", "id2"), "key"))
      assert(exchanges(self) == 0, s"bucketed self-join must be shuffle-free\n$self")

      // per-key aggregation: the bucketed distribution satisfies the
      // aggregate's requirement — no exchange before the final result
      val agg = fmt(state.groupBy(col("key")).agg(count(lit(1))))
      assert(exchanges(agg) == 0, s"bucketed aggregation must be shuffle-free\n$agg")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS block_index")
    }
  }
}
