package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bm25 on a hand-computable corpus matches the closed-form score") {
    import spark.implicits._
    // 3 docs, query = {cat}: df(cat)=2, N=3, dl = 2/3/2, avgdl = 7/3
    val docs = Seq(
      (1L, "cat dog"), (2L, "cat cat fish"), (3L, "dog fish"))
      .toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, Seq("cat"), 10)
      .select(col("doc_id"), col("score")).as[(Long, Double)].collect().toMap
    val (k1, b) = (Retrieval.K1, Retrieval.B)
    val idf = math.log((3.0 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def s(tf: Int, dl: Int) = {
      val raw = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / (7.0 / 3)))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.keySet == Set(1L, 2L)) // doc 3 has no query term
    assert(math.abs(got(1L) - s(1, 2)) < 1e-9)
    assert(math.abs(got(2L) - s(2, 3)) < 1e-9)
  }

  test("bm25 ranks the doc with more distinct matching terms above single-term docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha delta x"), (3L, "zeta eta theta"))
      .toDF("doc_id", "text")
    val ranked = Retrieval.bm25TopK(docs, Seq("alpha", "beta"), 10)
      .select(col("rank"), col("doc_id")).as[(Int, Long)].collect().sortBy(_._1)
    assert(ranked.map(_._2).toSeq == Seq(1L, 2L)) // both terms beats one
  }

  test("bm25 respects k and emits dense ranks from 1") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = Retrieval.bm25TopK(docs, Seq("spark", "merge", "window"), 5).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    assert(rows.forall(_.getAs[Double]("score") > 0))
  }

  test("plan: df and corpus stats broadcast back — no shuffle of the posting table for the join") {
    import org.apache.spark.sql.execution.FormattedMode
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val s = Retrieval.bm25TopK(docs, Seq("spark", "merge"), 10)
      .queryExecution.explainString(FormattedMode)
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastNestedLoopJoin"),
      s"df/stats must broadcast, not shuffle-join\n$s")
  }
}
