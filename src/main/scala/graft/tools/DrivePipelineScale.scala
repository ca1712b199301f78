package graft.tools

import graft.Pipeline
import graft.sources.CorpusGen
import org.apache.spark.sql.SparkSession

/** End-to-end pipeline wall clock at a multiplied corpus: parse →
  * block → score → cluster → pairwise F1, cold (fresh session, no
  * warm-up) — the holistic number a deployment sees, complementing
  * ScalingBench's isolated-kernel rate. One JSON line per run.
  *
  * SPARK_GRAFT_CPUS / SPARK_GRAFT_SF_DIR / GRAFT_BENCH_MULT as usual.
  */
object DrivePipelineScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("GRAFT_BENCH_MULT", "16").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val files = CorpusGen.corpus(spark, sfDir, mult)
    val nFiles = files.count() // corpus generation outside the timed region

    val t0 = System.nanoTime()
    val r = Pipeline.run(spark, files)
    val nClusters = r.clusters.select("clusterId").distinct().count()
    val nMatches = r.matches.count()
    val wall = (System.nanoTime() - t0) / 1e9
    val f1 = Pipeline.pairwiseF1(r.scores, r.trees)
      .select("f1").head().getDouble(0)

    println(f"""{"files":$nFiles,"cpus":$cpus,"mult":$mult,"sf":"$sfDir",""" +
      f""""wall_sec":$wall%.2f,"files_per_sec":${nFiles / wall}%.1f,""" +
      f""""n_clusters":$nClusters,"n_matches":$nMatches,"f1":$f1%.4f}""")
    spark.stop()
  }
}
