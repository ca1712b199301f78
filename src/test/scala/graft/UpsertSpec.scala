package graft

import graft.operators.Upsert
import graft.sources.ParquetTableIO
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UpsertSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("upsert replaces same-key rows, appends new keys, passes the rest through") {
    import spark.implicits._
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "v", "n")
    val updates = Seq((2L, "B2", 99), (9L, "z", 90)).toDF("id", "v", "n")
    val got = Upsert.upsert(base, updates, "id")
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a", 10), (2L, "B2", 99), (3L, "c", 30), (9L, "z", 90)))
  }

  test("upsert rejects a schema mismatch loudly") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("id", "v")
    val bad = Seq((1L, "a", 1)).toDF("id", "v", "extra")
    val e = intercept[IllegalArgumentException](Upsert.upsert(base, bad, "id"))
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("latestPerKey keeps exactly the highest-version row per key") {
    import spark.implicits._
    val updates = Seq((1L, "old", 1L), (1L, "new", 2L), (2L, "only", 5L))
      .toDF("id", "v", "version")
    val got = Upsert.latestPerKey(updates, "id", "version")
      .select($"id", $"v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "new"), (2L, "only")))
  }

  test("partitioned write prunes to the filtered partition at planning time") {
    import org.apache.spark.sql.execution.FormattedMode
    val root = java.nio.file.Files.createTempDirectory("graft_part").toString
    val io = new ParquetTableIO(root)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    io.writePartitioned(docs, "docs_by_lang", Seq("lang"))

    val q = io.read(spark, "docs_by_lang").where(col("lang") === "es")
    val plan = q.queryExecution.explainString(FormattedMode)
    // the lang predicate must be a PartitionFilter (directory prune),
    // not a row-level PushedFilter over every file
    assert(plan.contains("PartitionFilters") &&
      plan.linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("lang")),
      s"lang filter not applied at partition level\n$plan")
    // and the pruned scan must actually read only the one partition
    def partitionsRead(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves()
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount.toLong }.sum
    val scannedFiles = partitionsRead(q)
    val allFiles = partitionsRead(io.read(spark, "docs_by_lang"))
    assert(scannedFiles < allFiles, s"pruning read $scannedFiles of $allFiles files")
    // value-correct roundtrip (partition column restored from the path)
    val expected = docs.where(col("lang") === "es").count()
    assert(q.count() == expected)
  }
}
