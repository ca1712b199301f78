package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Two well-separated groups plus an exact near-duplicate pair inside
    * each group; vectors are unit-ish so cosine ≈ direction match. */
  private def corpus() = {
    import spark.implicits._
    def v(x: Double, y: Double, jitter: Double) =
      Seq((1.0 + jitter) * x, (1.0 + jitter) * y, jitter).map(_.toFloat)
    Seq(
      (0L, v(1, 0, 0.00)), (1L, v(1, 0, 0.01)),   // near-dups, group A
      (2L, v(0.9, 0.1, 0.3)),                     // group A, not a dup
      (10L, v(0, 1, 0.00)), (11L, v(0, 1, 0.02)), // near-dups, group B
      (12L, v(0.1, 0.9, 0.3))                     // group B, not a dup
    ).toDF("vec_id", "embedding")
  }

  test("semDedupPairs finds within-cluster near-dups and nothing cross-group") {
    import spark.implicits._
    val pairs = Similarity.semDedupPairs(corpus(), nlist = 2, minCosine = 0.999)
      .select($"idA", $"idB").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (10L, 11L)), s"got $pairs")
  }

  test("keepers drop exactly the non-minimal member of each dup component") {
    import spark.implicits._
    val c = corpus()
    val keepers = Dedup.nearDupKeepers(c, "vec_id",
        Similarity.semDedupPairs(c, nlist = 2, minCosine = 0.999))
      .as[Long].collect().toSet
    assert(keepers == Set(0L, 2L, 10L, 12L), s"got $keepers")
  }

  test("kmeansAssign is deterministic and covers every vector exactly once") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows1 = Similarity.kmeansAssign(e, 16).as[(Int, Long)].collect()
    val a1 = rows1.toSet
    val a2 = Similarity.kmeansAssign(e, 16).as[(Int, Long)].collect().toSet
    assert(a1 == a2, "assignment not deterministic")
    // one output ROW per vector (rows1.length) and every id distinct —
    // the row count catches double assignment, the id-set catches gaps
    assert(rows1.length == e.count(), "a vector double-assigned")
    assert(a1.map(_._2).size == e.count(), "a vector missing")
    // density-following: the 16 clusters are all non-trivially populated
    assert(a1.groupBy(_._1).size > 1)
  }

  test("mega-cluster cost is bounded by the cap, not the cluster size") {
    import spark.implicits._
    // all vectors in ONE direction → one cluster; pairs must be capped
    val n = 50
    val cap = 8
    val e = (0 until n).map(i => (i.toLong, Seq(1.0f, (i * 1e-4).toFloat)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.semDedupPairs(e, nlist = 1, minCosine = -1.0, cap = cap)
    assert(pairs.count() <= cap.toLong * (cap - 1) / 2)
  }
}
