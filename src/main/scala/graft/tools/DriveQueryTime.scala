package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual declared queries in isolation (after warming their
  * shared layers exactly as Bench does). Forces with count() by default
  * (the frozen Bench action) and ALSO with the noop sink (guide §1.4 —
  * computes every column of every row, so a count-only timing cannot
  * hide work behind column pruning) when mode=both. Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.tools.DriveQueryTime <sfDir> <q1,q2,...> [reps] [count|both]
  */
object DriveQueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val mode = if (args.length > 3) args(3) else "count"
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
        println(f"[qt] $n%-24s rep=$i count wall=${(System.nanoTime() - t0) / 1e9}%7.3f s rows=$c")
        if (mode == "both") {
          val t1 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"[qt] $n%-24s rep=$i noop  wall=${(System.nanoTime() - t1) / 1e9}%7.3f s")
        }
      }
    }
    spark.stop()
  }
}
