package graft.tools

import graft.streaming.StreamingPprl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the streaming PPRL fold: synthetic band-key
  * batches (hash-deterministic) folded through the purge-tombstone
  * state machine, per-batch wall + state size reported so the fold's
  * growth curve is measured, not assumed. The corpus shape mirrors the
  * real one: duplicate pairs share all 16 band keys, singletons carry
  * unique keys, and a small fraction of keys are hot (shared by many
  * ids) so the purge path is exercised.
  *
  * Usage: GRAFT_PPRL_DOCS=1000000 GRAFT_PPRL_BATCHES=8 \
  *   SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.DrivePprlScale"
  */
object DrivePprlScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = sys.env.getOrElse("GRAFT_PPRL_DOCS", "1000000").toLong
    val nBatches = sys.env.getOrElse("GRAFT_PPRL_BATCHES", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bands = 16
    // doc i belongs to group i>>1 (duplicate pairs; integer shift — Spark / is double division); 1 % of band keys
    // collapse onto 64 hot values to exercise the purge path
    def batchKeys(b: Int) = spark.range(nDocs / nBatches)
      .select((col("id") + b * (nDocs / nBatches)).as("i"))
      .select(col("i"), explode(sequence(lit(0), lit(bands - 1))).as("t"))
      .select(
        concat(lit("d"), col("i")).as("id"),
        when(pmod(xxhash64(shiftright(col("i"), 1), col("t"), lit(9)), lit(100)) < 1,
          concat(col("t"), lit(":hot"), pmod(xxhash64(col("t")), lit(64))))
          .otherwise(concat(col("t"), lit(":"),
            xxhash64(shiftright(col("i"), 1), col("t")))).as("key"))

    var st: Option[StreamingPprl.State] = None
    for (b <- 0 until nBatches) {
      val t0 = System.nanoTime()
      st = Some(StreamingPprl.foldBatch(st, batchKeys(b)))
      val wall = (System.nanoTime() - t0) / 1e9
      val rows = st.get.blocks.count()
      val dead = st.get.blocks.where(col("dead")).count()
      println(s"""{"batch":$b,"fold_sec":${math.round(wall * 100) / 100.0},""" +
        s""""state_keys":$rows,"dead_keys":$dead}""")
    }
    val t1 = System.nanoTime()
    val nPairs = StreamingPprl.pairs(st.get).count()
    val pairSec = (System.nanoTime() - t1) / 1e9
    println(s"""{"docs":$nDocs,"batches":$nBatches,"pairs":$nPairs,""" +
      s""""pair_view_sec":${math.round(pairSec * 100) / 100.0}}""")
    spark.stop()
  }
}
