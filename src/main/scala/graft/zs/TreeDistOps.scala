package graft.zs

import scala.collection.mutable.ArrayBuffer

/** Edit-script variant of the kernel — the reference's
  * `return_operations=True` path (upstream master zss/compare.py anchor
  * `class Operation`, op constants remove=0, insert=1, update=2,
  * match=3; SURVEY.md §3a R11 marks this fork-uncertain, so it ships as
  * an optional API, not in the bulk scoring path).
  *
  * Nodes are referenced by postorder index into the respective tree
  * (the reference passes Node objects; a flattened engine uses indices
  * — `labels(i)` recovers the label). Per-cell op chains are persistent
  * (structurally shared) lists, so memory is O(cells), not O(cells ·
  * script length).
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

  // persistent chain cell: prepend-only, shared tails
  private final case class Chain(op: Operation, prev: Chain)

  private def toList(c: Chain): List[Operation] = {
    var out = List.empty[Operation]
    var cur = c
    while (cur != null) { out = cur.op :: out; cur = cur.prev }
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
        fdOps(x)(0) = Chain(Operation(Op.Remove, x + ioff, -1), fdOps(x - 1)(0))
        x += 1
      }
      var y = 1
      while (y < n) {
        fd(0)(y) = fd(0)(y - 1) + ins(y + joff)
        fdOps(0)(y) = Chain(Operation(Op.Insert, -1, y + joff), fdOps(0)(y - 1))
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
              fdOps(x)(y) = Chain(
                Operation(if (c == 0) Op.Match else Op.Update, xa, yb), fdOps(x - 1)(y - 1))
            } else if (dRem <= dIns) {
              fd(x)(y) = dRem
              fdOps(x)(y) = Chain(Operation(Op.Remove, xa, -1), fdOps(x - 1)(y))
            } else {
              fd(x)(y) = dIns
              fdOps(x)(y) = Chain(Operation(Op.Insert, -1, yb), fdOps(x)(y - 1))
            }
            td(xa)(yb) = fd(x)(y)
            tdOps(xa)(yb) = fdOps(x)(y)
          } else {
            val p = al(xa) - 1 - ioff
            val q = bl(yb) - 1 - joff
            val dSub = fd(p)(q) + td(xa)(yb)
            if (dSub <= dRem && dSub <= dIns) {
              fd(x)(y) = dSub
              // splice the memoized subtree script onto the outer chain
              var chain = fdOps(p)(q)
              toList(tdOps(xa)(yb)).foreach(op => chain = Chain(op, chain))
              fdOps(x)(y) = chain
            } else if (dRem <= dIns) {
              fd(x)(y) = dRem
              fdOps(x)(y) = Chain(Operation(Op.Remove, xa, -1), fdOps(x - 1)(y))
            } else {
              fd(x)(y) = dIns
              fdOps(x)(y) = Chain(Operation(Op.Insert, -1, yb), fdOps(x)(y - 1))
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
