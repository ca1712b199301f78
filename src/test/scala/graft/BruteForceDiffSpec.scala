package graft

import graft.sources.CorpusGen
import graft.zs.{PTree, Scorer}
import org.scalatest.funsuite.AnyFunSuite

/** Differential test against an independent in-memory reference: score
  * ALL O(N²) pairs with the kernel directly (no blocking, no Spark
  * plan), threshold, union-find the matches, and require the pipeline
  * to produce the identical clustering. Catches blocking recall gaps,
  * join bugs, and clustering bugs without relying on groupId labels.
  */
class BruteForceDiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("pipeline clusters == brute-force all-pairs clusters (sf0.001)") {
    import spark.implicits._
    val files = CorpusGen.corpus(spark, "/root/testdata/sf0.001")
    val r = Pipeline.run(spark, files)
    val tau = Pipeline.Config().tau

    val trees = r.trees.toDF()
      .select($"id", $"labelsH", $"lmds", $"keyroots").collect()
      .map(row => (row.getString(0),
        PTree(Array.empty, row.getSeq[Int](2).toArray, row.getSeq[Int](3).toArray),
        row.getSeq[Long](1).toArray))
    val n = trees.length
    assert(n == 500)

    // brute force all pairs with the raw kernel
    val scorer = new Scorer
    val eh = graft.util.Hashing.hashString("")
    val pr = scala.collection.mutable.Map[String, String](trees.map(t => t._1 -> t._1).toSeq: _*)
    def find(x: String): String = { var r0 = x; while (pr(r0) != r0) r0 = pr(r0); r0 }
    def union(a: String, b: String): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) pr(rb) = ra else pr(ra) = rb } // lexicographic min = unsigned 128-bit min
    }
    for (i <- 0 until n; j <- (i + 1) until n) {
      val (ia, ta, ha) = trees(i)
      val (ib, tb, hb) = trees(j)
      val maxD = (tau * (ha.length + hb.length)).toInt
      val d = scorer.distHashedBounded(ha, ta.lmds, ta.keyroots, hb, tb.lmds, tb.keyroots, eh, maxD)
      if (d <= maxD) union(ia, ib)
    }
    val bruteClusters = trees.map(_._1).map(id => id -> find(id)).toMap

    val pipelineClusters = r.clusters.collect()
      .map(row => row.getString(0) -> row.getString(1)).toMap
    assert(pipelineClusters.keySet == bruteClusters.keySet)
    val mismatches = bruteClusters.count { case (id, c) => pipelineClusters(id) != c }
    assert(mismatches == 0, s"$mismatches of $n rows clustered differently than brute force")
  }

  test("pipeline is deterministic across runs") {
    import spark.implicits._
    def sig(): (Long, Long, Long) = {
      val files = CorpusGen.corpus(spark, "/root/testdata/sf0.001")
      val r = Pipeline.run(spark, files)
      val c = r.clusters.select(
        org.apache.spark.sql.functions.expr("bit_xor(xxhash64(id, clusterId))")).head().getLong(0)
      val s = r.scores.toDF().select(
        org.apache.spark.sql.functions.expr("bit_xor(xxhash64(idA, idB, dist))")).head().getLong(0)
      (r.pairs.count(), c, s)
    }
    assert(sig() == sig())
  }
}
