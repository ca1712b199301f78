package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-timing for the iterative clustering operators on the real
  * pipeline match graph — measure-first harness for the optimization
  * rounds (guide §1). Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.tools.DriveIterTiming <sfDir> [reps]
  * Times each operator end-to-end (forced with a noop-equivalent count
  * over the final frame) and reports wall seconds + total Spark jobs.
  */
object DriveIterTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nJobs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          nJobs.incrementAndGet(); ()
        }
      })

    val r = graft.Pipeline.run(spark, graft.sources.CorpusGen.corpus(spark, sfDir))
    val matches = r.matches
    matches.count() // warm the pipeline outside the timed region
    val nodes = r.trees.toDF().select(col("id"))
    nodes.count()
    val wEdges = r.scores.toDF().where(col("isMatch"))
      .select(col("idA").as("src"), col("idB").as("dst"),
        col("normDist").as("w"))
    wEdges.count()

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to reps).foreach { i =>
        val j0 = nJobs.get()
        val t0 = System.nanoTime()
        val n = mk.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[iter] $name%-16s rep=$i wall=$dt%7.3f s jobs=${nJobs.get() - j0}%3d rows=$n")
      }
    }

    time("cc_star") {
      graft.operators.Clustering.connectedComponents(matches, nodes)
    }
    time("hashmin") {
      graft.operators.HashToMin.connectedComponents(matches, nodes)
    }
    time("center") {
      graft.operators.CenterClustering.cluster(wEdges, nodes)
    }
    time("pivot") {
      graft.operators.PivotClustering.cluster(
        matches.select(col("idA").as("src"), col("idB").as("dst")), nodes)
    }
    spark.stop()
  }
}
