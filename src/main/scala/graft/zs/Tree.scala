package graft.zs

import scala.collection.mutable.ArrayBuffer

/** Rooted, ordered, labeled tree — construction/test surface.
  *
  * Mirrors the reference's fluent builder API (`Node(label).addkid(...)`),
  * reference: zss/simple_tree.py, anchors `class Node`/`def addkid` ~L11-70
  * (see SURVEY.md §0: citations target the canonical public upstream since
  * /root/reference was empty at survey time). Unlike the reference, trees
  * never cross a Spark shuffle in this form — they are flattened to
  * [[PTree]] postorder arrays at parse time.
  */
final class TNode(val label: String) {
  val children: ArrayBuffer[TNode] = new ArrayBuffer[TNode]()
  /** Append (or prepend) a child, return this — fluent chaining like the
    * reference's `addkid(node, before=False)`. */
  def addkid(c: TNode, before: Boolean = false): TNode = {
    if (before) children.prepend(c) else children.append(c)
    this
  }
}

object TNode {
  def apply(label: String, kids: TNode*): TNode = {
    val n = new TNode(label)
    kids.foreach(k => n.addkid(k))
    n
  }
}

/** Reference traversal/lookup helpers (zss/simple_tree.py anchors
  * `def get`, `def iter`, `def __contains__` ~L75-105): `get` finds the
  * first node with a label by preorder descent, `iter` walks
  * breadth-first (the reference uses a deque), `contains` is label
  * membership. Convenience only — never used by the distance kernel,
  * exactly as in the reference. */
object TreeOps {
  /** First node with `label` in preorder, or null (reference `get`). */
  def get(root: TNode, label: String): TNode = {
    if (root.label == label) return root
    var i = 0
    while (i < root.children.length) {
      val r = get(root.children(i), label)
      if (r != null) return r
      i += 1
    }
    null
  }

  /** Breadth-first node iterator (reference `iter`). */
  def iter(root: TNode): Iterator[TNode] = new Iterator[TNode] {
    private val q = new scala.collection.mutable.ArrayDeque[TNode]()
    q.append(root)
    def hasNext: Boolean = q.nonEmpty
    def next(): TNode = {
      val n = q.removeHead()
      n.children.foreach(q.append)
      n
    }
  }

  /** Label membership (reference `__contains__`). */
  def contains(root: TNode, label: String): Boolean =
    iter(root).exists(_.label == label)
}

/** Flattened postorder tree — the shuffle-safe IR of this engine.
  *
  * Equivalent of the reference's `AnnotatedTree` (zss/compare.py anchor
  * `class AnnotatedTree` ~L33-90): three parallel arrays in postorder.
  *  - `labels(i)`  — label of the i-th node in postorder
  *  - `lmds(i)`    — postorder index of the leftmost leaf descendant of i
  *  - `keyroots`   — ascending postorder indices k s.t. no k' > k has
  *                   lmd(k') == lmd(k); the root is always last
  */
final case class PTree(labels: Array[String], lmds: Array[Int], keyroots: Array[Int]) {
  def n: Int = labels.length
}

object Tree {

  /** Iterative (stack-based, recursion-free) postorder annotation.
    * Reference: zss/compare.py `AnnotatedTree.__init__` ~L40-90 uses an
    * iterative two-stack sweep for the same reason — source trees can be
    * deeper than any recursion limit.
    */
  def annotate(root: TNode): PTree = {
    val labels = new ArrayBuffer[String]()
    val lmds = new ArrayBuffer[Int]()

    // Frame: node, next child index to descend into, lmd propagated up
    // from the first completed child (-1 = no child finished yet).
    final class Frame(val node: TNode) {
      var ci: Int = 0
      var lmd: Int = -1
    }
    val stack = new ArrayBuffer[Frame]()
    stack += new Frame(root)
    while (stack.nonEmpty) {
      val f = stack(stack.length - 1)
      if (f.ci < f.node.children.length) {
        stack += new Frame(f.node.children(f.ci))
        f.ci += 1
      } else {
        val idx = labels.length
        val myLmd = if (f.lmd == -1) idx else f.lmd // leaf → own index
        labels += f.node.label
        lmds += myLmd
        stack.remove(stack.length - 1)
        if (stack.nonEmpty) {
          val parent = stack(stack.length - 1)
          if (parent.lmd == -1) parent.lmd = myLmd // first child completed
        }
      }
    }
    val lmdArr = lmds.toArray
    PTree(labels.toArray, lmdArr, keyrootsOf(lmdArr))
  }

  /** Keyroots: for each distinct lmd keep the LARGEST postorder index,
    * sorted ascending. Reference: zss/compare.py anchor
    * `self.keyroots = sorted(` ~L80-90 (dict-overwrite during the sweep
    * has last-seen-wins semantics — identical to this loop). Ascending
    * order is load-bearing: inner subtrees must be memoized before outer
    * keyroot pairs read them (SURVEY.md §2.2).
    */
  def keyrootsOf(lmds: Array[Int]): Array[Int] = {
    val m = new java.util.HashMap[Int, Int]()
    var i = 0
    while (i < lmds.length) { m.put(lmds(i), i); i += 1 }
    val out = new Array[Int](m.size)
    val it = m.values().iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    java.util.Arrays.sort(out)
    out
  }
}
