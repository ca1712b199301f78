package graft.tools

import graft.operators.ParseStage
import graft.sources.CorpusGen
import org.apache.spark.sql.SparkSession

/** Dump a sample of flattened trees (hashed labels + lmds + keyroots) to
  * parquet for the single-node Python baseline
  * (tools/py_zss_baseline.py). */
object TreesDump {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/trees_sample"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val trees = ParseStage.parse(CorpusGen.corpus(spark, "/root/testdata/sf0.001"))
    trees.toDF().select($"id", $"labelsH", $"lmds", $"keyroots")
      .coalesce(1).write.mode("overwrite").parquet(out)
    println(s"dumped ${trees.count()} trees to $out")
    spark.stop()
  }
}
