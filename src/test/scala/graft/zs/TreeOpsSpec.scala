package graft.zs

import org.scalatest.funsuite.AnyFunSuite

class TreeOpsSpec extends AnyFunSuite {
  // the canonical reference tree: f(d(a, c(b)), e)
  private def tree = SExpr.parse("(f (d a (c b)) e)")

  test("get: first match by preorder descent") {
    assert(TreeOps.get(tree, "c").label == "c")
    assert(TreeOps.get(tree, "f").label == "f")
    assert(TreeOps.get(tree, "zzz") == null)
    // preorder-first: in f(a(x), a(y)) the left 'a' wins
    val t = SExpr.parse("(f (a x) (a y))")
    assert(TreeOps.get(t, "a").children.head.label == "x")
  }

  test("iter: breadth-first order") {
    assert(TreeOps.iter(tree).map(_.label).toSeq == Seq("f", "d", "e", "a", "c", "b"))
  }

  test("contains: label membership") {
    assert(TreeOps.contains(tree, "b"))
    assert(!TreeOps.contains(tree, "q"))
  }
}
