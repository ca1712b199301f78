package graft.tools

import graft.Pipeline
import graft.operators.{PqGrams, Scoring}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for the pq-gram prefilter (Pipeline.Config
  * .pqPrefilter): score the SAME candidate set with and without the
  * prefilter and report pairs scored, DP cells (Σ nA·nB — the actual
  * O(n²) cost unit), wall seconds, and the matched-pair recall the
  * cutoff keeps.
  *
  * Candidate set = the pipeline's LSH token-shingle candidates UNION
  * the pq-gram structure-blocking channel's candidates — the "wider
  * structure-recalled net" a deployment that can afford a prefilter
  * would run (the LSH channel alone at the default config is precise
  * enough that a prefilter has nothing to drop; the structure channel
  * carries genuine negatives, which is exactly where the prefilter
  * pays — er_pqgram_tradeoff's curve, now measured end-to-end).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_CPUS=16 \
  *   sbt -batch "runMain graft.tools.DrivePqPrefilter"
  */
object DrivePqPrefilter {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val tauPq = sys.env.getOrElse("GRAFT_PQ_TAU",
      Pipeline.PqPrefilterTau.toString).toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val files = graft.sources.CorpusGen.corpus(spark, sfDir)
    val r = Pipeline.run(spark, files)
    val trees = r.trees
    val lsh = r.pairs.select(col("idA"), col("idB"))
    val structure = graft.operators.CandidateGen.pairsFromKeys(
      PqGrams.blockKeys(trees),
      Pipeline.Config().blocking.maxBlockSize)
    val cands = lsh.unionByName(structure).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCands = cands.count()

    val prof = PqGrams.profiles(trees)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    prof.count()

    def cells(pairs: org.apache.spark.sql.DataFrame): Long = {
      val t = trees.toDF().select(col("id"), col("n"))
      val row = pairs
        .join(t.select(col("id").as("idA"), col("n").as("nA")), "idA")
        .join(t.select(col("id").as("idB"), col("n").as("nB")), "idB")
        .agg(sum(col("nA").cast("long") * col("nB"))).head()
      if (row.isNullAt(0)) 0L else row.getLong(0) // sum over 0 rows is null
    }

    def scoreAll(pairs: org.apache.spark.sql.DataFrame): (Long, Double, Set[(String, String)]) = {
      val t0 = System.nanoTime()
      val scored = Scoring.score(
        Scoring.attachTrees(pairs, trees), Pipeline.Config().tau, None).toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = scored.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val matched = scored.where(col("isMatch"))
        .select(col("idA"), col("idB")).collect()
        .map(x => (x.getString(0), x.getString(1))).toSet
      (n, sec, matched)
    }

    // baseline: every candidate pays the DP
    val (nAll, secAll, matchedAll) = scoreAll(cands)
    val cellsAll = cells(cands)

    // prefiltered: pq-gram distance gates the DP
    val t0 = System.nanoTime()
    val kept = PqGrams.pairDistances(cands, prof)
      .where(col("pq_dist") <= tauPq)
      .select(col("idA"), col("idB"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nKept = kept.count()
    val prefilterSec = (System.nanoTime() - t0) / 1e9
    val (nPre, secPre, matchedPre) = scoreAll(kept)
    val cellsPre = cells(kept)

    val lost = matchedAll -- matchedPre
    println(
      s"""{"sf":"$sfDir","cpus":$cpus,"tau_pq":$tauPq,"n_cands":$nCands""" +
        s""","n_scored_unfiltered":$nAll,"n_scored_prefiltered":$nPre""" +
        s""","dp_cells_unfiltered":$cellsAll,"dp_cells_prefiltered":$cellsPre""" +
        s""","cell_reduction":${
          if (cellsAll == 0) 0.0 else 1.0 - cellsPre.toDouble / cellsAll}""" +
        s""","score_sec_unfiltered":$secAll,"score_sec_prefiltered":$secPre""" +
        s""","prefilter_overhead_sec":$prefilterSec""" +
        s""","matches_unfiltered":${matchedAll.size},"matches_prefiltered":${matchedPre.size}""" +
        s""","matches_lost":${lost.size}}""")
    spark.stop()
  }
}
