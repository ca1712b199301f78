import org.apache.spark.sql.SparkSession
object DriveEditScripts {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.ErQueries.warm(spark, dir)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("er_edit_scripts")(spark, dir).count()
      println(f"er_edit_scripts iter$i rows=$n secs=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
