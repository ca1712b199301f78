package graft.tools

import graft.operators.TruthDiscovery
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the truth-discovery fixpoints: a synthetic
  * claims table (hash-deterministic, no RNG state) at parametric size —
  * GRAFT_TRUTH_CLAIMS rows over a CLAIMS/SOURCES-entity grid (one
  * claim per source-entity cell) with GRAFT_TRUTH_SOURCES sources,
  * half the sources planted 80 % noisy
  * with per-entity collusion (the same regime as the er_truth_* model,
  * scaled up). Times each Investment round separately so the
  * flat-per-round property is measured, not assumed (every round is
  * one broadcast join + two hash aggregates over the same claims
  * table — nothing accumulates), and reports resolved-truth accuracy
  * vs majority vote at the end.
  *
  * Usage: GRAFT_TRUTH_CLAIMS=10000000 SPARK_GRAFT_CPUS=32 \
  *   sbt -batch "runMain graft.tools.DriveTruthScale"
  */
object DriveTruthScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nClaims = sys.env.getOrElse("GRAFT_TRUTH_CLAIMS", "10000000").toLong
    val nSources = sys.env.getOrElse("GRAFT_TRUTH_SOURCES", "100").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one claim per (source, entity) grid cell: id = entity·S + source
    val nEntities = math.max(1L, nClaims / nSources)
    // source s claims entity (id / nSources); truth = hash(entity);
    // careless half (s >= nSources/2) wrong w.p. 0.8, colluding on the
    // per-entity wrong value hash(entity)+1..3
    val sCol = pmod(col("id"), lit(nSources.toLong))
    val eCol = floor(col("id") / nSources.toLong).cast("long")
    val tIdx = pmod(xxhash64(lit("tv"), eCol), lit(4L))
    val off = pmod(xxhash64(lit("tw"), eCol), lit(3L)) + lit(1L)
    val noisy = sCol >= lit(nSources.toLong / 2)
    val fires = pmod(xxhash64(lit("tn"), col("id")), lit(100L)) <
      when(noisy, lit(80L)).otherwise(lit(5L))
    val claims = spark.range(nClaims).select(
      concat(lit("s"), sCol).as("source"),
      concat(lit("e"), eCol).as("entity"),
      concat(lit("v"),
        when(fires, pmod(tIdx + off, lit(4L))).otherwise(tIdx)).as("value"),
      concat(lit("v"), tIdx).as("truth"))
      .localCheckpoint(true)
    val n = claims.count()
    println(s"""{"claims":$n,"entities":$nEntities,"sources":$nSources,"cpus":$cpus}""")

    // per-round timing via the operator's OWN round callback — no
    // replicated loop body that could drift from the real algebra
    val c = claims.select(col("source"), col("entity"), col("value"))
    val r = TruthDiscovery.investment(c,
      onRound = (round, sec) => println(s"""{"round":$round,"sec":$sec}"""))

    // accuracy vs vote over the full entity set (resolveFrom = the
    // operator's own winner/tie algebra over the computed fixpoint)
    val resolved = TruthDiscovery.resolveFrom(c, r)
      .select(col("entity"), col("value"))
    val truthv = claims.select(col("entity"), col("truth")).distinct()
    val accInv = resolved.join(truthv, "entity")
      .agg(avg(when(col("value") === col("truth"), 1.0).otherwise(0.0))).head().getDouble(0)
    val accVote = TruthDiscovery.majorityVote(c).join(truthv, "entity")
      .agg(avg(when(col("vote_value") === col("truth"), 1.0).otherwise(0.0))).head().getDouble(0)
    println(s"""{"acc_investment":$accInv,"acc_vote":$accVote}""")
    spark.stop()
  }
}
