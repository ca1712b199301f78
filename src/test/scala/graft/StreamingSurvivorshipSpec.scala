package graft

import graft.operators.Survivorship
import graft.streaming.StreamingSurvivorship
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Incremental golden-record maintenance: stream-of-batches folds must
  * land on exactly the from-scratch survivorship, while recomputing only
  * the clusters a batch touched. */
class StreamingSurvivorshipSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def attrs(rows: (String, String, String, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "lang", "commit", "sha256", "content_len")
  }
  private def cl(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "clusterId")
  }
  private def attrRow(id: String): (String, String, String, String, Long) =
    (id, s"lang${id.hashCode.abs % 3}", s"c$id", s"sha$id", 10L + id.length)

  private def goldenSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("2-batch fold == from-scratch survivorship (incl. a cluster merge)") {
    // batch 1: {a,b} cluster a; {x} singleton
    val c1 = cl(("a", "a"), ("b", "a"), ("x", "x"))
    val a1 = attrs(attrRow("a"), attrRow("b"), attrRow("x"))
    val s1 = StreamingSurvivorship.update(c1, a1, None)
    assert(s1.nRecomputed == 2)
    // batch 2: doc m links x into cluster a (merge: x's members re-label),
    // plus a brand-new singleton z
    val c2 = cl(("a", "a"), ("b", "a"), ("x", "a"), ("m", "a"), ("z", "z"))
    val a2 = attrs(attrRow("m"), attrRow("z"))
    val s2 = StreamingSurvivorship.update(c2, a2,
      Some(s1))
    val scratch = Survivorship.goldenRecords(c2,
      attrs(attrRow("a"), attrRow("b"), attrRow("x"), attrRow("m"), attrRow("z")))
    assert(goldenSet(s2.golden) == goldenSet(scratch))
    // only the merged cluster and the new singleton were recomputed
    assert(s2.nRecomputed == 2)
    // the merged-away cluster's old golden row is gone
    assert(!s2.golden.collect().map(_.getString(0)).contains("x"))
  }

  test("an untouched cluster is carried, not recomputed") {
    val c1 = cl(("a", "a"), ("b", "a"), ("p", "p"), ("q", "p"))
    val s1 = StreamingSurvivorship.update(c1,
      attrs(attrRow("a"), attrRow("b"), attrRow("p"), attrRow("q")), None)
    // batch 2 only adds a new disjoint singleton
    val c2 = cl(("a", "a"), ("b", "a"), ("p", "p"), ("q", "p"), ("n", "n"))
    val s2 = StreamingSurvivorship.update(c2, attrs(attrRow("n")), Some(s1))
    assert(s2.nRecomputed == 1) // ONLY cluster n
    val scratch = Survivorship.goldenRecords(c2,
      attrs(attrRow("a"), attrRow("b"), attrRow("p"), attrRow("q"), attrRow("n")))
    assert(goldenSet(s2.golden) == goldenSet(scratch))
  }

  test("3-batch random growth == from-scratch at every step") {
    val rnd = new scala.util.Random(5)
    val all = (0 until 24).map(i => f"d$i%02d")
    // assignment evolves: each batch adds docs and may merge clusters by
    // re-labeling (simulating CC output after new match edges)
    val steps = Seq(
      all.take(8).map(id => (id, s"c${id.hashCode.abs % 4}")),
      all.take(16).map(id => (id, s"c${id.hashCode.abs % 3}")),
      all.map(id => (id, s"c${id.hashCode.abs % 2}")))
    var st: Option[StreamingSurvivorship.GoldenState] = None
    var seen = Set.empty[String]
    for (step <- steps) {
      val ids = step.map(_._1).toSet
      val batchIds = (ids -- seen).toSeq.sorted
      seen = ids
      val c = cl(step.map { case (id, cid) =>
        (id, step.filter(_._2 == cid).map(_._1).min) // clusterId = min member
      }: _*)
      st = Some(StreamingSurvivorship.update(c,
        attrs(batchIds.map(attrRow): _*), st))
      val scratch = Survivorship.goldenRecords(c, attrs(seen.toSeq.sorted.map(attrRow): _*))
      assert(goldenSet(st.get.golden) == goldenSet(scratch))
    }
  }
}
