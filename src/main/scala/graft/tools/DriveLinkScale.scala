package graft.tools

import graft.operators.OneToOneMatching
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the distributed greedy 1:1 matching: synthetic
  * bipartite edge sets (hash-deterministic, no RNG state) at parametric
  * size, in two shapes — uniform degrees (the post-FS linkage graph's
  * normal shape) and a skewed right side (a hub catalog entry attracting
  * many candidates). Prints one JSON line per round (accepted edges /
  * live edges remaining) plus a summary per run, so the geometric
  * live-set decay that bounds MaxRounds is measured, not assumed.
  *
  * Usage: GRAFT_LINK_EDGES=2000000 SPARK_GRAFT_CPUS=32 \
  *   sbt -batch "runMain graft.tools.DriveLinkScale"
  */
object DriveLinkScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nEdges = sys.env.getOrElse("GRAFT_LINK_EDGES", "2000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~4 candidate edges per left record (the capped-blocking shape);
    // weights 6-dp uniform like the rounded FS log-likelihood ratios
    def uniform(n: Long) = {
      val nL = n / 4
      spark.range(n).select(
        concat(lit("l"), pmod(xxhash64(col("id"), lit(1)), lit(nL))).as("lft"),
        concat(lit("r"), pmod(xxhash64(col("id"), lit(2)), lit(nL))).as("rgt"),
        round(pmod(xxhash64(col("id"), lit(3)), lit(1000000L)) / 1e6, 6).as("w"))
        // max-w, not dropDuplicates: colliding (lft, rgt) cells must
        // resolve deterministically or the BENCH.md traces drift
        .groupBy(col("lft"), col("rgt")).agg(max(col("w")).as("w"))
    }
    // skewed: right ids drawn quadratically concentrated — the hottest
    // right vertex collects ~sqrt-scale candidate mass
    def skewed(n: Long) = {
      val nL = n / 4
      val u = pmod(xxhash64(col("id"), lit(2)), lit(1000000L)) / lit(1000000.0)
      spark.range(n).select(
        concat(lit("l"), pmod(xxhash64(col("id"), lit(1)), lit(nL))).as("lft"),
        concat(lit("r"), floor(u * u * (nL / 2).toDouble).cast("long")).as("rgt"),
        round(pmod(xxhash64(col("id"), lit(3)), lit(1000000L)) / 1e6, 6).as("w"))
        .groupBy(col("lft"), col("rgt")).agg(max(col("w")).as("w"))
    }

    for ((shape, gen) <- Seq("uniform" -> uniform _, "skewed" -> skewed _)) {
      val edges = gen(nEdges).localCheckpoint(true)
      val nE = edges.count()
      val rounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
      val t0 = System.nanoTime()
      val matched = OneToOneMatching.greedyMatch(edges, maxRounds = 64,
        onRound = (r, acc, live) => rounds += ((r, acc, live)))
      val nM = matched.count()
      val wall = (System.nanoTime() - t0) / 1e9
      rounds.foreach { case (r, acc, live) =>
        println(s"""{"tool":"link_scale","shape":"$shape","edges":$nE,"round":$r,"accepted":$acc,"live":$live}""")
      }
      println(s"""{"tool":"link_scale_summary","shape":"$shape","edges":$nE,"matched":$nM,"rounds":${rounds.size},"wall_sec":$wall,"edges_per_sec":${(nE / wall).toLong}}""")
    }

    // incremental fold-cost curve (GRAFT_LINK_BATCHES > 0): the honest
    // per-batch price of StreamingLink's recompute-over-retained-edges
    // design as the cumulative edge set grows
    val nBatches = sys.env.getOrElse("GRAFT_LINK_BATCHES", "0").toInt
    if (nBatches > 0) {
      val edges = uniform(nEdges).localCheckpoint(true)
      def part(b: Int) = edges.where(
        pmod(xxhash64(col("lft"), col("rgt")), lit(nBatches)) === b)
      var st: Option[graft.streaming.StreamingLink.LinkState] = None
      for (b <- 0 until nBatches) {
        val t0 = System.nanoTime()
        st = Some(graft.streaming.StreamingLink.update(spark, part(b), st))
        val nM = st.get.matched.count()
        val nEdg = st.get.edges.count()
        val w = (System.nanoTime() - t0) / 1e9
        println(s"""{"tool":"link_fold","batch":${b + 1},"cum_edges":$nEdg,"matched":$nM,"batch_sec":$w}""")
      }
    }
    spark.stop()
  }
}
