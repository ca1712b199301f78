package graft.zs

import graft.zs.TreeDistOps.{Op, Operation}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class TreeDistOpsSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    var seed = Seed(17L)
    (0 until n).map { _ =>
      val r = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  private val labelGen = Gen.oneOf("a", "b", "c", "d")
  private def treeGen(depth: Int): Gen[TNode] =
    if (depth <= 0) labelGen.map(new TNode(_))
    else for {
      l <- labelGen
      w <- Gen.choose(0, 3)
      kids <- Gen.listOfN(w, treeGen(depth - 1))
    } yield { val n = new TNode(l); kids.foreach(n.addkid(_)); n }
  private val ptrees = samples(treeGen(3).map(Tree.annotate), 25)

  /** Validity of an edit script under unit costs:
    * - cost == #remove + #insert + #update,
    * - each A node consumed exactly once by remove/update/match,
    * - each B node produced exactly once by insert/update/match,
    * - match ops really have equal labels, update ops different. */
  private def validate(a: PTree, b: PTree, cost: Int, ops: List[Operation]): Unit = {
    val nRem = ops.count(_.op == Op.Remove)
    val nIns = ops.count(_.op == Op.Insert)
    val nUpd = ops.count(_.op == Op.Update)
    assert(cost == nRem + nIns + nUpd, s"cost $cost vs ops $ops")
    val aTouched = ops.filter(o => o.op != Op.Insert).map(_.aIdx)
    val bTouched = ops.filter(o => o.op != Op.Remove).map(_.bIdx)
    assert(aTouched.sorted == (0 until a.n).toList, s"A coverage: $aTouched")
    assert(bTouched.sorted == (0 until b.n).toList, s"B coverage: $bTouched")
    ops.foreach {
      case Operation(Op.Match, i, j) => assert(a.labels(i) == b.labels(j))
      case Operation(Op.Update, i, j) => assert(a.labels(i) != b.labels(j))
      case _ =>
    }
  }

  test("paper example: cost 2 with a valid script") {
    val a = Tree.annotate(SExpr.parse("(f (d a (c b)) e)"))
    val b = Tree.annotate(SExpr.parse("(f (c (d a b)) e)"))
    val (cost, ops) = TreeDistOps.distanceWithOps(a, b)
    assert(cost == 2)
    validate(a, b, cost, ops)
  }

  test("identity: all-match script") {
    val a = Tree.annotate(SExpr.parse("(f (d a (c b)) e)"))
    val (cost, ops) = TreeDistOps.distanceWithOps(a, a)
    assert(cost == 0)
    assert(ops.forall(_.op == Op.Match) && ops.length == a.n)
  }

  test("property: ops cost equals kernel distance, scripts valid") {
    for (a <- ptrees.take(15); b <- ptrees.take(15)) {
      val (cost, ops) = TreeDistOps.distanceWithOps(a, b)
      assert(cost == TreeDist.unit(a, b))
      validate(a, b, cost, ops)
    }
  }
}
