package graft.tools

import graft._
import graft.operators._
import graft.sources.CorpusGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Blocking-recall measurement: true intra-group pairs found/missed by
  * candidatePairs under a given BlockingConfig, plus pair volume. */
object DriveRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("GRAFT_BENCH_MULT", "16").toInt
    val variant = sys.env.getOrElse("GRAFT_RECALL_VARIANT", "base")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Pipeline.tune(spark)

    val mh = variant match {
      case "base"   => ParseStage.MinHashConfig()                       // 12 hashes, 6x2, K=4
      case "b8r2"   => ParseStage.MinHashConfig(numHashes = 16, bands = 8, shingleK = 4)
      case "k3"     => ParseStage.MinHashConfig(numHashes = 12, bands = 6, shingleK = 3)
      case "b8r2k3" => ParseStage.MinHashConfig(numHashes = 16, bands = 8, shingleK = 3)
    }
    val cfg = Blocking.BlockingConfig(mh = mh)

    val files = CorpusGen.corpus(spark, sfDir, mult)
    val trees = ParseStage.parse(files, CodeParserCfg.cfg, mh).persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = Blocking.candidatePairs(trees, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairs.count()

    val labeled = trees.toDF().select($"id", $"groupId", $"nTokens").where($"groupId" >= 0)
    val truePairs = labeled.as("a").join(labeled.as("b"),
        $"a.groupId" === $"b.groupId" && $"a.id" < $"b.id")
      .select($"a.id".as("idA"), $"b.id".as("idB"),
        least($"a.nTokens", $"b.nTokens").as("minTok"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nTrue = truePairs.count()
    val missed = truePairs.join(pairs, Seq("idA", "idB"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nMissed = missed.count()
    val missedHist = missed.groupBy((floor($"minTok" / 16) * 16).as("tok_bucket"))
      .count().orderBy($"tok_bucket").collect()
      .map(r => s"${r.get(0)}:${r.get(1)}").mkString(" ")
    println(s"""RECALL {"variant":"$variant","pairs":$nPairs,"true":$nTrue,"missed":$nMissed,""" +
      s""""recall":${1.0 - nMissed.toDouble / nTrue},"missed_by_min_tokens":"$missedHist"}""")
    spark.stop()
  }
}
object CodeParserCfg { val cfg = graft.parse.CodeParser.defaultConfig }
