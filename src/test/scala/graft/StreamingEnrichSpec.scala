package graft

import graft.operators.Upsert
import graft.sources.ParquetTableIO
import graft.streaming.StreamingEnrich
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingEnrichSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("each micro-batch joins the dim snapshot current at its time; unmatched keys survive") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_enrich").toString
    val io = new ParquetTableIO(root)
    val out = s"$root/enriched"

    // dim v1
    io.write(Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment"), "dim")

    val src = MemoryStream[(Long, Long)]
    val q = StreamingEnrich.enrichedStream(
      src.toDF().toDF("user_id", "event_id"), io, "dim", "user_id", out)
    try {
      // batch against dim v1: user 7 has no dim row — must pass through
      src.addData((1L, 10L), (7L, 70L))
      q.processAllAvailable()

      // the SCD loop: upsert a changed + a new dim row, then stream on.
      // Materialize v2 BEFORE overwriting — the lazy plan reads the very
      // directory the write replaces (self-overwrite), so an unforced
      // io.write(v2) would scan already-deleted files
      val v2 = Upsert.upsert(io.read(spark, "dim"),
          Seq((1L, "platinum"), (7L, "bronze")).toDF("user_id", "segment"), "user_id")
        .as[(Long, String)].collect().toSeq
      io.write(v2.toDF("user_id", "segment"), "dim")
      src.addData((1L, 11L), (7L, 71L))
      q.processAllAvailable()

      val rows = spark.read.parquet(out)
        .select($"event_id", $"segment")
        .as[(Long, Option[String])].collect().toSet
      assert(rows == Set(
        (10L, Some("gold")),     // batch 1: dim v1
        (70L, None),             // batch 1: unmatched key survives, null-enriched
        (11L, Some("platinum")), // batch 2: sees the upserted snapshot
        (71L, Some("bronze"))),  // batch 2: newly-added dim key now matches
        s"got $rows")
      // each batch carries its id — replayed batches are identifiable
      val batches = spark.read.parquet(out).select($"batch_id").distinct().count()
      assert(batches == 2)
    } finally q.stop()
  }
}
