package graft.tools

import graft.operators.CenterClustering
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for parallel CENTER clustering: hash-deterministic
  * weighted graphs in the shapes that bracket the operator.
  *
  *  - `cliques` (2M nodes default): near-clique duplicate groups of 5
  *    with hash-random weights — the ER match graph's normal shape.
  *  - `hubs` (2M nodes default): stars of 1 000 spokes with weights
  *    increasing along the spokes — the shape where the C,U rule's
  *    one-round mass absorption matters (a min-pending-only scheme
  *    would pay O(degree) rounds here).
  *  - `path_rand` / `path_mono` (small, 500 nodes): one path with
  *    hash-random vs monotonically increasing edge weights — random
  *    order resolves in ~log rounds; the monotone order is the
  *    documented inherently-sequential worst case (≈ 2 edges per
  *    round), measured rather than assumed.
  *
  * Per-shape: decided-per-round decay plus a one-line summary.
  *
  * Usage: GRAFT_CENTER_NODES=2000000 SPARK_GRAFT_CPUS=32 \
  *   sbt -batch "runMain graft.tools.DriveCenterScale"
  */
object DriveCenterScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nNodes = sys.env.getOrElse("GRAFT_CENTER_NODES", "2000000").toLong
    val nPath = sys.env.getOrElse("GRAFT_CENTER_PATH_NODES", "500").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def ids(n: Long) = spark.range(n).select(concat(lit("n"), col("id")).as("id"))
    def hashW = (pmod(xxhash64(col("src"), col("dst")), lit(1000)).cast("double")
      / 1000.0).as("w")

    // near-clique groups of 5, ~0.8 edge probability, hash weights
    def cliques = spark.range(nNodes)
      .select(col("id"), explode(sequence(lit(1L), lit(4L))).as("off"))
      .select(col("id"), (col("id") + col("off")).as("j"))
      .where(col("j") <= col("id") - pmod(col("id"), lit(5)) + 4 &&
        col("j") < lit(nNodes))
      .where(pmod(xxhash64(col("id"), col("j")), lit(10)) < 8)
      .select(concat(lit("n"), col("id")).as("src"),
        concat(lit("n"), col("j")).as("dst"))
      .select(col("src"), col("dst"), hashW)

    // stars of 1 000: hub = group base, spoke weights increase outward
    def hubs = spark.range(nNodes)
      .where(pmod(col("id"), lit(1000)) =!= 0)
      .select(concat(lit("n"), col("id") - pmod(col("id"), lit(1000))).as("src"),
        concat(lit("n"), col("id")).as("dst"),
        (pmod(col("id"), lit(1000)).cast("double") / 1000.0).as("w"))

    // mono paths are INHERENTLY sequential (≈ 2 edges per round) — keep
    // that shape short or the probe itself pays the worst case it exists
    // to demonstrate
    val nMono = math.max(8L, nPath / 4)
    def path(mono: Boolean, n: Long) = spark.range(n - 1)
      .select(concat(lit("n"), col("id")).as("src"),
        concat(lit("n"), col("id") + 1).as("dst"),
        if (mono) (col("id").cast("double") / n).as("w")
        else (pmod(xxhash64(col("id")), lit(1000)).cast("double") / 1000.0).as("w"))

    val shapes = Seq(
      ("cliques", cliques, nNodes, 64),
      ("hubs", hubs, nNodes, 64),
      ("path_rand", path(mono = false, nPath), nPath, 512),
      ("path_mono", path(mono = true, nMono), nMono, 512))
    for ((shape, gen, n, maxR) <- shapes) {
      val edges = gen.localCheckpoint(true)
      val nE = edges.count()
      val t0 = System.nanoTime()
      val out = CenterClustering
        .cluster(edges, ids(n), maxRounds = maxR)
        .localCheckpoint(true)
      val decided = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val perRound = out.groupBy(col("round")).agg(count(lit(1)).as("n"))
        .orderBy(col("round")).collect()
      // long decays: print the head and the total, not 200 lines
      perRound.take(8).foreach(r =>
        println(s"""{"shape":"$shape","round":${r.getInt(0)},"decided":${r.getLong(1)}}"""))
      val rounds = perRound.map(_.getInt(0)).max
      println(s"""{"shape":"$shape","nodes":$n,"edges":$nE,"rounds":$rounds,""" +
        s""""decided":$decided,"wall_sec":${math.round(wall * 10) / 10.0},""" +
        s""""nodes_per_sec":${math.round(n / wall)}}""")
    }
    spark.stop()
  }
}
