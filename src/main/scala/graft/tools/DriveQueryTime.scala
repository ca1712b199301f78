package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual declared queries in isolation (after warming their
  * shared layers exactly as Bench does). Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.tools.DriveQueryTime <sfDir> <q1,q2,...> [reps]
  */
object DriveQueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ErQueries.warm(spark, sfDir)
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      val fn = qs(n)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        println(f"[qt] $n%-24s rep=$i wall=${(System.nanoTime() - t0) / 1e9}%7.3f s rows=$c")
      }
    }
    spark.stop()
  }
}
