package graft.tools

import graft.operators.MatchMerge
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the iterative match-merge fixpoint: the
  * q_match_merge chained-triple profile shape (inner-left, inner-right,
  * outer — the outer matches only the UNION of the inners) generated at
  * N records, so every entity needs exactly two merge rounds plus the
  * matchless convergence round. Measures the per-round wall (each round
  * = one exact SetSimJoin over the shrinking entity table + one CC +
  * one union-merge) and validates the fixpoint shape (every complete
  * triple → one 3-member 8-feature entity). Prints one JSON line per
  * round plus a summary.
  *
  * Usage: GRAFT_MM_DOCS=900000 SPARK_GRAFT_CPUS=32 \
  *   sbt -batch "runMain graft.tools.DriveMatchMergeScale"
  */
object DriveMatchMergeScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = sys.env.getOrElse("GRAFT_MM_DOCS", "900000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the q_match_merge profile rule at N records (one expression,
    // see TextQueries.swooshProfiles)
    val b = expr("(id DIV 3) * 10")
    val r = pmod(col("id"), lit(3))
    val profiles = spark.range(nDocs).select(col("id"),
      when(r === 0, array(b + lit(1), b + lit(2), b + lit(3), b + lit(4)))
        .when(r === 1, array(b + lit(3), b + lit(4), b + lit(5), b + lit(6)))
        .otherwise(array(b + lit(1), b + lit(2), b + lit(5), b + lit(6),
          b + lit(7), b + lit(8))).as("toks"))

    val t0 = System.nanoTime()
    var tPrev = t0
    val resolved = MatchMerge.resolve(profiles, 1, 3, onRound = Some {
      (round, nEntities) =>
        val now = System.nanoTime()
        println(s"""{"round":$round,"n_entities":$nEntities,""" +
          s""""round_sec":${(now - tPrev) / 1e9}}""")
        tPrev = now
    })
    val shape = resolved.groupBy(col("n_members"), col("n_toks"))
      .agg(count(lit(1)).as("n_records"))
      .collect().map(rw => (rw.getInt(0), rw.getInt(1), rw.getLong(2)))
      .sortBy(x => (x._1, x._2))
    val wall = (System.nanoTime() - t0) / 1e9
    val complete = shape.collect { case (3, 8, n) => n }.sum
    println(s"""{"n_docs":$nDocs,"wall_sec":$wall,""" +
      s""""n_in_complete_triples":$complete,""" +
      s""""shape":${shape.map(s => s"[${s._1},${s._2},${s._3}]")
        .mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
