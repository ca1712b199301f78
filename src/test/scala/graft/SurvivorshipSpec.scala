package graft

import graft.operators.{Clustering, Survivorship}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-record survivorship rules + cluster retraction. */
class SurvivorshipSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def attrs(rows: (String, String, String, String, Long)*) = {
    import spark.implicits._
    rows.toDF("id", "lang", "commit", "sha256", "content_len")
  }

  private def clusters(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("id", "clusterId")
  }

  test("golden record: rollups, modal lang, best-source sha, deterministic ties") {
    val cl = clusters(("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"))
    val at = attrs(
      ("a", "scala", "c2", "shaA", 10L),
      ("b", "java", "c1", "shaB", 30L),
      ("c", "scala", "c3", "shaC", 30L),
      ("d", "go", "c9", "shaD", 5L))
    val got = Survivorship.goldenRecords(cl, at)
      .collect().map(r => r.getString(0) -> r).toMap
    val g = got("a")
    assert(g.getLong(1) == 3L) // n_members
    assert(g.getString(2) == "a") // canonical_id
    assert(g.getString(3) == "c1") // first_commit
    assert(g.getLong(4) == 70L) // total_bytes
    assert(g.getString(5) == "scala") // modal lang (2 vs 1)
    // rep: len 30 tie between shaB and shaC → smaller sha wins
    assert(g.getString(6) == "shaB")
    val d = got("d")
    assert(d.getLong(1) == 1L && d.getString(5) == "go" && d.getString(6) == "shaD")
  }

  test("modal-lang tie breaks to the lexicographically smallest lang") {
    val cl = clusters(("a", "a"), ("b", "a"))
    val at = attrs(
      ("a", "scala", "c1", "s1", 1L),
      ("b", "java", "c1", "s2", 1L))
    val got = Survivorship.goldenRecords(cl, at).collect().head
    assert(got.getString(5) == "java")
  }

  test("one output row per cluster") {
    val cl = clusters(("a", "a"), ("b", "a"), ("x", "x"), ("y", "x"))
    val at = attrs(
      ("a", "go", "c", "s", 1L), ("b", "go", "c", "s", 1L),
      ("x", "js", "c", "s", 1L), ("y", "js", "c", "s", 1L))
    val out = Survivorship.goldenRecords(cl, at)
    assert(out.count() == 2)
    assert(out.select("clusterId").distinct().count() == 2)
  }

  // ---------------- leakage-safe split ----------------

  test("split is deterministic and cluster-atomic (no member straddles)") {
    import spark.implicits._
    val cl = (0 until 50).map(i => (f"m$i%02d", f"c${i / 5}%02d")).toDF("id", "clusterId")
    val s1 = Survivorship.leakageSafeSplit(cl)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val s2 = Survivorship.leakageSafeSplit(cl)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(s1.toSet == s2.toSet)
    // every cluster maps to exactly one split
    val perCluster = s1.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(perCluster.values.forall(_.size == 1))
    // both splits are populated at this bound on 10 clusters
    assert(s1.map(_._3).toSet == Set("train", "eval"))
  }

  test("evalBound 00 sends everything to train; ff sends nearly all to eval") {
    import spark.implicits._
    val cl = (0 until 20).map(i => (s"m$i", s"c$i")).toDF("id", "clusterId")
    val all = Survivorship.leakageSafeSplit(cl, "00")
      .collect().map(_.getString(2)).toSet
    assert(all == Set("train"))
  }

  // ---------------- retraction ----------------

  private def df2(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("idA", "idB")
  }
  private def ids(rows: String*) = {
    import spark.implicits._
    rows.toDF("id")
  }

  private def cc(edges: org.apache.spark.sql.DataFrame, nodes: org.apache.spark.sql.DataFrame,
      del: org.apache.spark.sql.DataFrame): Map[String, String] =
    Clustering.retract(edges, nodes, del)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("deleting a bridge node splits its cluster") {
    // a-b, b-c: b bridges a and c
    val got = cc(df2(("a", "b"), ("b", "c")), ids("a", "b", "c"), ids("b"))
    assert(got == Map("a" -> "a", "c" -> "c"))
  }

  test("deleting a leaf keeps the rest connected; deleted ids vanish") {
    val got = cc(df2(("a", "b"), ("b", "c"), ("a", "c")), ids("a", "b", "c", "d"), ids("c"))
    assert(got == Map("a" -> "a", "b" -> "a", "d" -> "d"))
  }

  test("empty delete set is the identity") {
    val base = Clustering.connectedComponents(df2(("a", "b")), ids("a", "b", "c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val got = cc(df2(("a", "b")), ids("a", "b", "c"), ids())
    assert(got == base)
  }

  test("retraction matches a from-scratch CC over the retained graph") {
    val edges = df2(("a", "b"), ("b", "c"), ("c", "d"), ("e", "f"), ("f", "a"))
    val nodes = ids("a", "b", "c", "d", "e", "f", "g")
    val del = ids("b", "f")
    val expected = Clustering.connectedComponents(
      edges.where(!col("idA").isin("b", "f") && !col("idB").isin("b", "f")),
      nodes.where(!col("id").isin("b", "f")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc(edges, nodes, del) == expected)
  }
}
