package graft

import graft.sources.{CorpusGen, ParquetTableIO}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class ResumeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("pipeline resumes from stage checkpoints (north_rule)") {
    val root = Files.createTempDirectory("graft_ckpt").toString
    val io = new ParquetTableIO(root)
    val cfg = Pipeline.Config(io = Some(io))
    val files = CorpusGen.corpus(spark, "/root/testdata/sf0.001")

    // first run writes every stage
    val r1 = Pipeline.run(spark, files, cfg)
    val clusters1 = r1.clusters.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(io.exists(spark, "trees") && io.exists(spark, "pairs") &&
      io.exists(spark, "scores") && io.exists(spark, "matches") &&
      io.exists(spark, "clusters") && io.exists(spark, "metrics"))

    // simulate a failure after blocking: drop later stages, keep the rest
    for (t <- Seq("scores", "matches", "clusters")) {
      val p = new org.apache.hadoop.fs.Path(s"$root/$t")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    assert(!io.exists(spark, "scores") && io.exists(spark, "pairs"))

    // resume: earlier stages read back, later stages recomputed; results identical
    val r2 = Pipeline.run(spark, files, cfg)
    val clusters2 = r2.clusters.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(clusters2 == clusters1)

    // a half-written stage directory (no _SUCCESS) does not count as done
    val scoresPath = new org.apache.hadoop.fs.Path(s"$root/scores/_SUCCESS")
    val fs = scoresPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(scoresPath, false)
    assert(!io.exists(spark, "scores"), "_SUCCESS-gated atomicity")
  }
}
