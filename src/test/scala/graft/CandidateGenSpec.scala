package graft

import graft.operators.CandidateGen
import graft.util.Hashing
import org.apache.spark.sql.functions.explode
import org.scalatest.funsuite.AnyFunSuite

/** Direct unit coverage for the generic (id-type-agnostic) pair
  * emission: ordering, dedupe across keys, the pre-aggregation cap, and
  * long/string id parity. */
class CandidateGenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("emits exactly the i<j pairs per block, deduped across keys") {
    import spark.implicits._
    val keyed = Seq(
      (1L, "c"), (1L, "a"), (1L, "b"), // block 1: 3 pairs
      (2L, "a"), (2L, "b"), // block 2: duplicate of (a,b)
      (3L, "z") // singleton: nothing
    ).toDF("key", "id")
    val got = CandidateGen.pairsFromKeys(keyed, cap = 64)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("cap keeps the lowest ids and bounds pair count") {
    import spark.implicits._
    val keyed = (1 to 100).map(i => (7L, f"id$i%03d")).toDF("key", "id")
    val got = CandidateGen.pairsFromKeys(keyed, cap = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.size == 10) // C(5,2)
    val members = got.flatMap(p => Set(p._1, p._2))
    assert(members == (1 to 5).map(i => f"id$i%03d").toSet)
  }

  test("long ids produce the same pair structure as their string twins") {
    import spark.implicits._
    val longKeyed = Seq((1L, 30L), (1L, 10L), (1L, 20L)).toDF("key", "id")
    val gotLong = CandidateGen.pairsFromKeys(longKeyed, cap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotLong == Set((10L, 20L), (10L, 30L), (20L, 30L)))
  }

  test("property: incremental capped merge == batch capByKey over any arrival order") {
    import spark.implicits._
    // the identity the bucketed streaming path rests on:
    // cap(old ∪ new) = cap(cap(old) ∪ new), for every split into batches
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 8) {
      val cap = 1 + rnd.nextInt(6)
      val rows = (0 until 40 + rnd.nextInt(80)).map { _ =>
        (rnd.nextInt(7).toLong, f"id${rnd.nextInt(60)}%03d")
      }.distinct
      val nBatches = 1 + rnd.nextInt(4)
      val batches = rows.groupBy(_ => rnd.nextInt(nBatches)).values.toSeq

      var idx: Option[org.apache.spark.sql.DataFrame] = None
      for (b <- batches) {
        val merged = CandidateGen.mergeCappedMembers(idx, b.toDF("key", "id"), cap)
        idx = Some(merged.select($"key", $"members").localCheckpoint(true))
      }
      val inc = idx.get.select($"key", explode($"members").as("id"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val batch = CandidateGen.capByKey(rows.toDF("key", "id"), cap)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(inc == batch, s"trial $trial (cap=$cap, ${batches.size} batches)")
    }
  }

  test("rowId128Hex: 32 lowercase hex chars, stable, component-sensitive") {
    val a = Hashing.rowId128Hex("repo", "path", "commit")
    assert(a.length == 32 && a.matches("[0-9a-f]{32}"))
    assert(a == Hashing.rowId128Hex("repo", "path", "commit"))
    // component boundaries matter: ("ab","c") != ("a","bc")
    assert(Hashing.rowId128Hex("ab", "c", "x") != Hashing.rowId128Hex("a", "bc", "x"))
    // equals the sha256 prefix contract the DuckDB oracle recomputes
    assert(a == Hashing.sha256Hex("repo\npath\ncommit").substring(0, 32))
  }
}
