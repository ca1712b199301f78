package graft.tools

import graft.operators.BlockSplit
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-block stress for the exact balanced pair enumerator: ONE block
  * of n members (the worst case capping exists to avoid — a single
  * degenerate key holding C(n,2) pairs) pushed through
  * [[BlockSplit.balancedPairs]], against the `collect_list`-shaped
  * baseline that aggregates the whole block onto one task and explodes
  * pairs there. Reports wall time and the pair-count share of the
  * busiest task (spark_partition_id over the pre-aggregation rows) —
  * the number that decides whether a skewed key stalls a 1000-executor
  * stage or spreads across it.
  *
  * Usage: GRAFT_HOT_N=20000 SPARK_GRAFT_CPUS=32 \
  *   sbt -batch "runMain graft.tools.DriveBlockSplit"
  * Prints one JSON line per path.
  */
object DriveBlockSplit {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("GRAFT_HOT_N", "10000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one hot block + background blocks (10% of rows spread over small
    // keys) so the stage has normal work alongside the skewed key
    val keyed = spark.range(n).select(lit(0L).as("key"), col("id"))
      .unionAll(spark.range(n / 10)
        .select((col("id") % 64L + 1L).as("key"), (col("id") + 1000000L).as("id")))
      .persist()
    keyed.count()
    val expect = n * (n - 1) / 2

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // balanced path: count + busiest-task share measured over the rows
    // as emitted (before any final exchange could rebalance them)
    locally {
      val (rows, w) = time {
        BlockSplit.balancedPairs(keyed)
          .where(col("key") === 0L)
          .select(spark_partition_id().as("p"))
          .groupBy(col("p")).count()
          .agg(sum(col("count")).as("n"), max(col("count")).as("mx"))
          .collect()(0)
      }
      val (total, mx) = (rows.getLong(0), rows.getLong(1))
      require(total == expect, s"balanced emitted $total, want $expect")
      println(f"""{"path":"balanced","n":$n,"pairs":$total,""" +
        f""""max_task_share":${mx.toDouble / total}%.4f,"wall_sec":$w%.2f}""")
    }

    // single-reducer baseline: the block's members aggregate onto ONE
    // task and all pairs explode there (what groupBy+collect_list does).
    // Measured to OOM at n = 30 000 (the row's C(n,2)-element pair array
    // must materialize in one task's heap before the explode streams
    // it), so it is skipped above the bound — that failure, vs the
    // balanced path's 42 s / 0.034 max-task share at the same n, IS the
    // result
    val baselineMax = sys.env.getOrElse("GRAFT_HOT_BASELINE_MAX", "20000").toLong
    if (n > baselineMax) {
      println(s"""{"path":"collect_list","n":$n,"skipped":"per-task pair array OOMs above n=$baselineMax"}""")
    } else locally {
      val (rows, w) = time {
        keyed.groupBy(col("key"))
          .agg(sort_array(collect_set(col("id"))).as("ids"))
          .where(col("key") === 0L)
          .select(explode(graft.operators.CandidateGen.pairwise(col("ids"),
            (x, y) => struct(x.as("idA"), y.as("idB")))).as("p"))
          .select(spark_partition_id().as("p"))
          .groupBy(col("p")).count()
          .agg(sum(col("count")).as("n"), max(col("count")).as("mx"))
          .collect()(0)
      }
      val (total, mx) = (rows.getLong(0), rows.getLong(1))
      require(total == expect, s"baseline emitted $total, want $expect")
      println(f"""{"path":"collect_list","n":$n,"pairs":$total,""" +
        f""""max_task_share":${mx.toDouble / total}%.4f,"wall_sec":$w%.2f}""")
    }
    spark.stop()
  }
}
