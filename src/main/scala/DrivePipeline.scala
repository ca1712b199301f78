import graft._
import graft.sources.CorpusGen
import org.apache.spark.sql.SparkSession

object DrivePipeline {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime
    val files = CorpusGen.corpus(spark, "/root/testdata/sf0.001")
    val r = Pipeline.run(spark, files)
    println(s"files=${files.count()} trees=${r.trees.count()} pairs=${r.pairs.count()} " +
      s"matches=${r.matches.count()} clusters=${r.clusters.select("clusterId").distinct().count()}")
    r.scores.toDF().describe("dist", "normDist").show()
    Pipeline.pairwiseF1(r.scores, r.trees).show(false)
    r.metrics.show(5, false)
    println(f"wall=${(System.nanoTime-t0)/1e9}%.1f s")
    spark.stop()
  }
}
