package graft.tools

import graft.operators.PivotClustering
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for distributed CC-Pivot: synthetic match graphs
  * (hash-deterministic, no RNG state) in the two shapes that bracket
  * the operator — near-clique duplicate groups (the ER match graph's
  * normal shape, where 2–3 MIS rounds should decide everyone) and one
  * long PATH (the adversarial dependency chain: parallel greedy MIS
  * depth is O(log n) w.h.p., so this measures the real constant behind
  * MaxRounds instead of assuming it). Prints one JSON line per round
  * (pivots promoted / undecided remaining) plus a summary per shape.
  *
  * Usage: GRAFT_PIVOT_NODES=2000000 SPARK_GRAFT_CPUS=32 \
  *   sbt -batch "runMain graft.tools.DrivePivotScale"
  */
object DrivePivotScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nNodes = sys.env.getOrElse("GRAFT_PIVOT_NODES", "2000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nodeIds = spark.range(nNodes)
      .select(concat(lit("n"), col("id")).as("id"))

    // near-clique groups of 5: node i edges to each later member of its
    // group, each edge present with ~0.8 hash probability — the shape a
    // τ-thresholded scorer produces over duplicate groups
    def cliques = spark.range(nNodes)
      .select(col("id"), explode(sequence(lit(1L), lit(4L))).as("off"))
      .select(col("id"), (col("id") + col("off")).as("j"))
      // stay inside the 5-node group: base = id - id % 5 (integer ops
      // only — Spark `/` is double division)
      .where(col("j") <= col("id") - pmod(col("id"), lit(5)) + 4 &&
        col("j") < lit(nNodes))
      .where(pmod(xxhash64(col("id"), col("j")), lit(10)) < 8)
      .select(concat(lit("n"), col("id")).as("src"),
        concat(lit("n"), col("j")).as("dst"))

    // one path over every node: the longest dependency chains a
    // pseudo-random order can produce — the MIS round-depth stressor
    def path = spark.range(nNodes - 1)
      .select(concat(lit("n"), col("id")).as("src"),
        concat(lit("n"), col("id") + 1).as("dst"))

    for ((shape, gen) <- Seq("cliques" -> cliques, "path" -> path)) {
      val edges = gen.localCheckpoint(true)
      val nE = edges.count()
      val t0 = System.nanoTime()
      val rounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
      val out = PivotClustering.cluster(edges, nodeIds, maxRounds = 64,
        onRound = Some((r, piv, undec) => rounds += ((r, piv, undec))))
      val nAssigned = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      rounds.foreach { case (r, piv, undec) =>
        println(s"""{"shape":"$shape","round":$r,"pivots":$piv,"undecided":$undec}""")
      }
      println(s"""{"shape":"$shape","nodes":$nNodes,"edges":$nE,""" +
        s""""rounds":${rounds.size},"assigned":$nAssigned,""" +
        s""""wall_sec":${math.round(wall * 10) / 10.0},""" +
        s""""nodes_per_sec":${math.round(nNodes / wall)}}""")
    }
    spark.stop()
  }
}
