package graft

import graft.operators.FellegiSunter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DriveFs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fs = ErQueries.FsResults.cached(spark, "/root/testdata/sf0.001")
    fs.vectors.groupBy("pattern").count().orderBy(col("pattern")).show(40)
    println("m=" + fs.params.m.mkString(",") + " u=" + fs.params.u.mkString(",") +
      " p=" + fs.params.p)
    fs.weighted.groupBy("decision").count().show()
    FellegiSunter.evalDecisions(fs.weighted).show(false)
    spark.stop()
  }
}
