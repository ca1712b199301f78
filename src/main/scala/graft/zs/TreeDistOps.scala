package graft.zs


/** Edit-script variant of the kernel — the reference's
  * `return_operations=True` path (upstream master zss/compare.py anchor
  * `class Operation`, op constants remove=0, insert=1, update=2,
  * match=3; SURVEY.md §3a R11 marks this fork-uncertain, so it ships as
  * an optional API, not in the bulk scoring path).
  *
  * Nodes are referenced by postorder index into the respective tree
  * (the reference passes Node objects; a flattened engine uses indices
  * — `labels(i)` recovers the label). Per-cell op chains are persistent
  * ropes (structurally shared binary concat trees): appending one op
  * and splicing a whole memoized subtree script are both O(1), so the
  * DP costs O(1) extra per cell and memory stays O(cells) — a naive
  * list splice would re-materialize the subtree script per cell,
  * O(cells · script length), which dominated wall time on big trees.
  */
object TreeDistOps {

  object Op {
    val Remove: Byte = 0
    val Insert: Byte = 1
    val Update: Byte = 2
    val Match: Byte = 3
  }

  /** One edit operation: `aIdx` is a postorder index in A (or -1),
    * `bIdx` in B (or -1). */
  final case class Operation(op: Byte, aIdx: Int, bIdx: Int)

  // persistent rope: ops in left-to-right order; null = empty.
  // Snoc = prev ++ [op] (ONE allocation per appended cell — the DP's
  // common path); Cat is the O(1) splice of a memoized subtree script.
  private sealed trait Chain
  private final class Snoc(val prev: Chain, val op: Operation) extends Chain
  private final class Cat(val l: Chain, val r: Chain) extends Chain

  private def append(c: Chain, op: Operation): Chain = new Snoc(c, op)

  private def concat(a: Chain, b: Chain): Chain =
    if (a == null) b else if (b == null) a else new Cat(a, b)

  private def toList(c: Chain): List[Operation] = {
    // walk rightmost-first, building by prepend, so the result is in
    // left-to-right op order without recursion
    var out = List.empty[Operation]
    var stack: List[Chain] = c :: Nil
    while (stack.nonEmpty) {
      val h = stack.head
      stack = stack.tail
      h match {
        case null => ()
        case s: Snoc => out = s.op :: out; stack = s.prev :: stack
        case t: Cat => stack = t.r :: t.l :: stack
      }
    }
    out
  }

  /** Unit-cost distance + edit script transforming A into B. */
  def distanceWithOps(a: PTree, b: PTree): (Int, List[Operation]) = {
    val na = a.n
    val nb = b.n
    val al = a.lmds
    val bl = b.lmds
    val td = Array.ofDim[Int](na, nb)
    val tdOps = Array.ofDim[Chain](na, nb)

    def rem(i: Int): Int = if (a.labels(i).isEmpty) 0 else 1
    def ins(j: Int): Int = if (b.labels(j).isEmpty) 0 else 1
    def upd(i: Int, j: Int): Int = if (a.labels(i) == b.labels(j)) 0 else 1

    for (i <- a.keyroots; j <- b.keyroots) {
      val ali = al(i)
      val blj = bl(j)
      val m = i - ali + 2
      val n = j - blj + 2
      val ioff = ali - 1
      val joff = blj - 1
      val fd = Array.ofDim[Int](m, n)
      val fdOps = Array.ofDim[Chain](m, n)
      var x = 1
      while (x < m) {
        fd(x)(0) = fd(x - 1)(0) + rem(x + ioff)
        fdOps(x)(0) = append(fdOps(x - 1)(0), Operation(Op.Remove, x + ioff, -1))
        x += 1
      }
      var y = 1
      while (y < n) {
        fd(0)(y) = fd(0)(y - 1) + ins(y + joff)
        fdOps(0)(y) = append(fdOps(0)(y - 1), Operation(Op.Insert, -1, y + joff))
        y += 1
      }
      x = 1
      while (x < m) {
        val xa = x + ioff
        y = 1
        while (y < n) {
          val yb = y + joff
          val dRem = fd(x - 1)(y) + rem(xa)
          val dIns = fd(x)(y - 1) + ins(yb)
          if (ali == al(xa) && blj == bl(yb)) {
            val c = upd(xa, yb)
            val dUpd = fd(x - 1)(y - 1) + c
            if (dUpd <= dRem && dUpd <= dIns) {
              fd(x)(y) = dUpd
              fdOps(x)(y) = append(fdOps(x - 1)(y - 1),
                Operation(if (c == 0) Op.Match else Op.Update, xa, yb))
            } else if (dRem <= dIns) {
              fd(x)(y) = dRem
              fdOps(x)(y) = append(fdOps(x - 1)(y), Operation(Op.Remove, xa, -1))
            } else {
              fd(x)(y) = dIns
              fdOps(x)(y) = append(fdOps(x)(y - 1), Operation(Op.Insert, -1, yb))
            }
            td(xa)(yb) = fd(x)(y)
            tdOps(xa)(yb) = fdOps(x)(y)
          } else {
            val p = al(xa) - 1 - ioff
            val q = bl(yb) - 1 - joff
            val dSub = fd(p)(q) + td(xa)(yb)
            if (dSub <= dRem && dSub <= dIns) {
              fd(x)(y) = dSub
              // splice the memoized subtree script onto the outer chain:
              // O(1) rope concat, no re-materialization
              fdOps(x)(y) = concat(fdOps(p)(q), tdOps(xa)(yb))
            } else if (dRem <= dIns) {
              fd(x)(y) = dRem
              fdOps(x)(y) = append(fdOps(x - 1)(y), Operation(Op.Remove, xa, -1))
            } else {
              fd(x)(y) = dIns
              fdOps(x)(y) = append(fdOps(x)(y - 1), Operation(Op.Insert, -1, yb))
            }
          }
          y += 1
        }
        x += 1
      }
    }
    (td(na - 1)(nb - 1), toList(tdOps(na - 1)(nb - 1)))
  }
}
