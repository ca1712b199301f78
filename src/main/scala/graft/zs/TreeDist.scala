package graft.zs

/** Pluggable per-operation costs — the analogue of the reference's
  * first-class `insert_cost` / `remove_cost` / `update_cost` parameters
  * (zss/compare.py anchor `def distance(A, B, get_children, insert_cost,
  * remove_cost, update_cost)` ~L163).
  */
trait CostModel extends Serializable {
  def insert(label: String): Double
  def remove(label: String): Double
  def update(a: String, b: String): Double
}

/** Default `simple_distance` semantics (zss/compare.py anchor
  * `def simple_distance` ~L123-160): every cost is `strdist` against the
  * relevant label, with insert/remove measured against the empty string —
  * so inserting or removing an empty-labeled node is free.
  */
object UnitCost extends CostModel {
  def insert(label: String): Double = if (label.isEmpty) 0.0 else 1.0
  def remove(label: String): Double = if (label.isEmpty) 0.0 else 1.0
  def update(a: String, b: String): Double = if (a == b) 0.0 else 1.0
}

/** Label-Levenshtein variant — mirrors the reference's optional
  * `label_dist=editdist` path (zss/compare.py anchor `def strdist`
  * fallback ~L20-28, C `editdist`/`editdistance` modules).
  */
object LevenshteinCost extends CostModel {
  def insert(label: String): Double = label.length.toDouble
  def remove(label: String): Double = label.length.toDouble
  def update(a: String, b: String): Double = lev(a, b).toDouble

  private[zs] def lev(a: String, b: String): Int = {
    if (a == b) return 0
    val n = b.length
    var prev = Array.tabulate(n + 1)(identity)
    var cur = new Array[Int](n + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= n) {
        val sub = prev(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        cur(j) = math.min(sub, math.min(del, ins))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n)
  }
}

/** Zhang–Shasha ordered-tree edit distance.
  *
  * Semantics: zss/compare.py inner `def treedist(i, j)` + the ascending
  * keyroot double loop (`~L163-215`); spec restated in SURVEY.md §2.2.
  * Two kernels:
  *  - [[TreeDist.distance]] — generic [[CostModel]], Double costs
  *    (faithful to the reference's pluggable-cost entry point);
  *  - [[Scorer]] — unit-cost Int hot path with reusable flat scratch
  *    buffers and interned label codes, built for `mapPartitions` where
  *    one Scorer instance is reused across every pair in a partition.
  */
object TreeDist {

  def unit(a: PTree, b: PTree): Int = new Scorer().dist(a, b)

  def distance(a: PTree, b: PTree, costs: CostModel): Double = {
    val na = a.n
    val nb = b.n
    val al = a.lmds
    val bl = b.lmds
    val td = new Array[Double](na * nb)
    val fd = new Array[Double]((na + 1) * (nb + 1))
    var ki = 0
    while (ki < a.keyroots.length) {
      val i = a.keyroots(ki)
      val ali = al(i)
      val m = i - ali + 2
      val ioff = ali - 1
      var kj = 0
      while (kj < b.keyroots.length) {
        val j = b.keyroots(kj)
        val blj = bl(j)
        val n = j - blj + 2
        val joff = blj - 1
        // fd is an m x n matrix stored row-major in a flat array.
        fd(0) = 0.0
        var x = 1
        while (x < m) { fd(x * n) = fd((x - 1) * n) + costs.remove(a.labels(x + ioff)); x += 1 }
        var y = 1
        while (y < n) { fd(y) = fd(y - 1) + costs.insert(b.labels(y + joff)); y += 1 }
        x = 1
        while (x < m) {
          val xa = x + ioff
          val row = x * n
          val prow = (x - 1) * n
          y = 1
          while (y < n) {
            val yb = y + joff
            val d1 = fd(prow + y) + costs.remove(a.labels(xa))
            val d2 = fd(row + y - 1) + costs.insert(b.labels(yb))
            if (ali == al(xa) && blj == bl(yb)) {
              // both prefixes are whole subtrees → this cell is a tree dist
              val d3 = fd(prow + y - 1) + costs.update(a.labels(xa), b.labels(yb))
              val mn = math.min(d1, math.min(d2, d3))
              fd(row + y) = mn
              td(xa * nb + yb) = mn
            } else {
              // splice the memoized subtree distance (the regression-test
              // sensitive branch — p/q offsets per SURVEY.md §2.2)
              val p = al(xa) - 1 - ioff
              val q = bl(yb) - 1 - joff
              val d3 = fd(p * n + q) + td(xa * nb + yb)
              fd(row + y) = math.min(d1, math.min(d2, d3))
            }
            y += 1
          }
          x += 1
        }
        kj += 1
      }
      ki += 1
    }
    td((na - 1) * nb + (nb - 1))
  }
}

/** Unit-cost kernel with per-instance reusable scratch. NOT thread-safe —
  * allocate one per partition/thread (`mapPartitions { it => val s = new
  * Scorer; ... }`). Buffers grow monotonically to the largest pair seen,
  * so a partition scores thousands of pairs with zero steady-state
  * allocation; label strings are interned to Int codes once per pair so
  * the O(n² · d²) inner loop never touches a String.
  */
final class Scorer {
  private var td: Array[Int] = new Array[Int](0)
  private var fd: Array[Int] = new Array[Int](0)
  private var la: Array[Int] = new Array[Int](0)
  private var lb: Array[Int] = new Array[Int](0)
  private var ra: Array[Int] = new Array[Int](0) // remove cost per A-node
  private var ib: Array[Int] = new Array[Int](0) // insert cost per B-node
  private val codes = new java.util.HashMap[String, Integer]()

  /** Pairs scored by this instance (per-partition metric). */
  var pairsScored: Long = 0L
  /** Total DP cells touched (throughput denominator for bench). */
  var cellsTouched: Long = 0L

  def dist(a: PTree, b: PTree): Int = {
    val na = a.n
    val nb = b.n
    if (td.length < na * nb) td = new Array[Int](na * nb)
    if (fd.length < (na + 1) * (nb + 1)) fd = new Array[Int]((na + 1) * (nb + 1))
    if (la.length < na) { la = new Array[Int](na); ra = new Array[Int](na) }
    if (lb.length < nb) { lb = new Array[Int](nb); ib = new Array[Int](nb) }
    codes.clear()
    var next = 0
    var i0 = 0
    while (i0 < na) {
      val s = a.labels(i0)
      var c = codes.get(s)
      if (c == null) { c = Integer.valueOf(next); codes.put(s, c); next += 1 }
      la(i0) = c.intValue()
      ra(i0) = if (s.isEmpty) 0 else 1
      i0 += 1
    }
    var j0 = 0
    while (j0 < nb) {
      val s = b.labels(j0)
      var c = codes.get(s)
      if (c == null) { c = Integer.valueOf(next); codes.put(s, c); next += 1 }
      lb(j0) = c.intValue()
      ib(j0) = if (s.isEmpty) 0 else 1
      j0 += 1
    }

    val al = a.lmds
    val bl = b.lmds
    val kra = a.keyroots
    val krb = b.keyroots
    var ki = 0
    while (ki < kra.length) {
      val i = kra(ki)
      val ali = al(i)
      val m = i - ali + 2
      val ioff = ali - 1
      var kj = 0
      while (kj < krb.length) {
        val j = krb(kj)
        val blj = bl(j)
        val n = j - blj + 2
        val joff = blj - 1
        cellsTouched += m.toLong * n
        fd(0) = 0
        var x = 1
        while (x < m) { fd(x * n) = fd((x - 1) * n) + ra(x + ioff); x += 1 }
        var y = 1
        while (y < n) { fd(y) = fd(y - 1) + ib(y + joff); y += 1 }
        x = 1
        while (x < m) {
          val xa = x + ioff
          val alxa = al(xa)
          val rxa = ra(xa)
          val laxa = la(xa)
          val row = x * n
          val prow = row - n
          val tdrow = xa * nb
          val whole = ali == alxa
          y = 1
          while (y < n) {
            val yb = y + joff
            var mn = fd(prow + y) + rxa
            val d2 = fd(row + y - 1) + ib(yb)
            if (d2 < mn) mn = d2
            if (whole && blj == bl(yb)) {
              val d3 = fd(prow + y - 1) + (if (laxa == lb(yb)) 0 else 1)
              if (d3 < mn) mn = d3
              fd(row + y) = mn
              td(tdrow + yb) = mn
            } else {
              val p = alxa - 1 - ioff
              val q = bl(yb) - 1 - joff
              val d3 = fd(p * n + q) + td(tdrow + yb)
              if (d3 < mn) mn = d3
              fd(row + y) = mn
            }
            y += 1
          }
          x += 1
        }
        kj += 1
      }
      ki += 1
    }
    pairsScored += 1
    td((na - 1) * nb + (nb - 1))
  }
}
