package graft.parse

import graft.zs.{PTree, TNode, Tree}
import scala.collection.mutable.ArrayBuffer

/** Language-agnostic lexer + tree builder: file content → rooted ordered
  * labeled tree → flattened [[PTree]] postorder arrays.
  *
  * This replaces the reference's manual `Node.addkid` construction
  * (zss/simple_tree.py anchor `def addkid`): the reference takes trees as
  * given; a corpus pipeline must derive them from raw text. The
  * annotation step (reference zss/compare.py anchor `class AnnotatedTree`)
  * runs here, once per FILE at parse time, instead of once per distance
  * CALL as the reference's API forces — amortizing it across the O(pairs)
  * scoring stage (SURVEY.md §4 E2).
  *
  * Grammar (deterministic, no language configs):
  *  - identifiers `[A-Za-z_][A-Za-z0-9_]*` and numbers are leaf tokens,
  *    label = verbatim text (truncated to [[ParseConfig.maxLabelLen]]);
  *  - string/char literals collapse to one leaf labeled with their
  *    (truncated) contents;
  *  - `(` `{` `[` open an internal node labeled `()` / `{}` / `[]` whose
  *    children are the tokens/scopes inside; unbalanced closers are
  *    ignored, unclosed scopes close at EOF;
  *  - `// … \n`, `/* … */` and `# … \n` comments and all whitespace are
  *    skipped;
  *  - every other printable char is a single-char punctuation leaf;
  *  - the root is a synthetic `root` node, so every file yields a
  *    non-empty tree.
  *
  * Node-count cap: parsing stops after [[ParseConfig.maxNodes]] nodes and
  * sets `truncated` — this bounds the scorer's O(n²) scratch per pair
  * (SURVEY.md §5 physical-execution decisions).
  */
object CodeParser {

  final case class ParseConfig(maxNodes: Int = 2048, maxLabelLen: Int = 24)
  val defaultConfig: ParseConfig = ParseConfig()

  final case class Parsed(tree: PTree, nTokens: Int, truncated: Boolean)

  def parse(content: String, cfg: ParseConfig = defaultConfig): Parsed = {
    val root = new TNode("root")
    val stack = new ArrayBuffer[TNode]()
    stack += root
    var nodeCount = 1
    var nTokens = 0
    var truncated = false
    val s = content
    val len = s.length
    var i = 0

    def cap(label: String): String =
      if (label.length <= cfg.maxLabelLen) label else label.substring(0, cfg.maxLabelLen)

    def addLeaf(label: String): Unit = {
      if (nodeCount < cfg.maxNodes) {
        stack(stack.length - 1).addkid(new TNode(cap(label)))
        nodeCount += 1
        nTokens += 1
      } else truncated = true
    }

    while (i < len && !truncated) {
      val c = s.charAt(i)
      if (c.isWhitespace) {
        i += 1
      } else if (c == '/' && i + 1 < len && s.charAt(i + 1) == '/') {
        val nl = s.indexOf('\n', i)
        i = if (nl < 0) len else nl + 1
      } else if (c == '/' && i + 1 < len && s.charAt(i + 1) == '*') {
        val end = s.indexOf("*/", i + 2)
        i = if (end < 0) len else end + 2
      } else if (c == '#') {
        val nl = s.indexOf('\n', i)
        i = if (nl < 0) len else nl + 1
      } else if (c == '"' || c == '\'') {
        val quote = c
        val start = i + 1
        var j = start
        while (j < len && s.charAt(j) != quote) {
          if (s.charAt(j) == '\\' && j + 1 < len) j += 2 else j += 1
        }
        addLeaf("$" + s.substring(start, math.min(j, len)))
        i = math.min(j + 1, len)
      } else if (c == '(' || c == '{' || c == '[') {
        if (nodeCount < cfg.maxNodes) {
          val label = c match { case '(' => "()"; case '{' => "{}"; case _ => "[]" }
          val scope = new TNode(label)
          stack(stack.length - 1).addkid(scope)
          stack += scope
          nodeCount += 1
        } else truncated = true
        i += 1
      } else if (c == ')' || c == '}' || c == ']') {
        if (stack.length > 1) stack.remove(stack.length - 1) // unmatched closers ignored
        i += 1
      } else if (c.isLetter || c == '_') {
        var j = i + 1
        while (j < len && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
        addLeaf(s.substring(i, j))
        i = j
      } else if (c.isDigit) {
        var j = i + 1
        while (j < len && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '.')) j += 1
        addLeaf(s.substring(i, j))
        i = j
      } else {
        addLeaf(c.toString)
        i += 1
      }
    }
    Parsed(Tree.annotate(root), nTokens, truncated)
  }

  /** Token stream only (no tree) — feeds MinHash shingling and token
    * counting without paying tree construction where it isn't needed. */
  def tokens(content: String, cfg: ParseConfig = defaultConfig): Array[String] = {
    val p = parseTokensOnly(content, cfg)
    p
  }

  /** Uncapped lexer EVENT stream: one entry per node-creating event in
    * source order — 'O' for a scope opener, 'L' for a leaf token;
    * closers create no node and are not emitted. `parse()`'s count
    * bookkeeping is an exact function of this stream and the cap:
    *   n         = min(1 + #events, maxNodes)
    *   nTokens   = #{'L' among the first maxNodes−1 events}
    *   truncated = #events > maxNodes − 1
    * (each event increments nodeCount by one while nodeCount < maxNodes,
    * nodeCount starts at 1 for the synthetic root, and the parse loop
    * stops at the first event past the cap). ParserAndSkewSpec
    * property-tests this equivalence against `parse` across the corpus
    * and adversarial inputs; Verify dumps the stream so the
    * er_tree_stats oracle recomputes n / n_tokens / truncated in SQL. */
  def lexEvents(content: String): Array[Char] = {
    val out = new ArrayBuffer[Char]()
    val s = content
    val len = s.length
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < len && s.charAt(i + 1) == '/') {
        val nl = s.indexOf('\n', i); i = if (nl < 0) len else nl + 1
      } else if (c == '/' && i + 1 < len && s.charAt(i + 1) == '*') {
        val e = s.indexOf("*/", i + 2); i = if (e < 0) len else e + 2
      } else if (c == '#') {
        val nl = s.indexOf('\n', i); i = if (nl < 0) len else nl + 1
      } else if (c == '"' || c == '\'') {
        val q = c; var j = i + 1
        while (j < len && s.charAt(j) != q) { if (s.charAt(j) == '\\' && j + 1 < len) j += 2 else j += 1 }
        out += 'L'
        i = math.min(j + 1, len)
      } else if (c == '(' || c == '{' || c == '[') {
        out += 'O'; i += 1
      } else if (c == ')' || c == '}' || c == ']') {
        i += 1 // pops a scope in parse(); creates no node
      } else if (c.isLetter || c == '_') {
        var j = i + 1
        while (j < len && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
        out += 'L'; i = j
      } else if (c.isDigit) {
        var j = i + 1
        while (j < len && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '.')) j += 1
        out += 'L'; i = j
      } else { out += 'L'; i += 1 }
    }
    out.toArray
  }

  private def parseTokensOnly(content: String, cfg: ParseConfig): Array[String] = {
    // Reuse the full parser for one-pass simplicity; leaf labels in
    // postorder minus structural nodes = token stream in source order is
    // NOT guaranteed by postorder, so lex directly instead.
    val out = new ArrayBuffer[String]()
    val s = content
    val len = s.length
    var i = 0
    def cap(t: String): String =
      if (t.length <= cfg.maxLabelLen) t else t.substring(0, cfg.maxLabelLen)
    while (i < len) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < len && s.charAt(i + 1) == '/') {
        val nl = s.indexOf('\n', i); i = if (nl < 0) len else nl + 1
      } else if (c == '/' && i + 1 < len && s.charAt(i + 1) == '*') {
        val e = s.indexOf("*/", i + 2); i = if (e < 0) len else e + 2
      } else if (c == '#') {
        val nl = s.indexOf('\n', i); i = if (nl < 0) len else nl + 1
      } else if (c == '"' || c == '\'') {
        val q = c; val st = i + 1; var j = st
        while (j < len && s.charAt(j) != q) { if (s.charAt(j) == '\\' && j + 1 < len) j += 2 else j += 1 }
        out += cap("$" + s.substring(st, math.min(j, len)))
        i = math.min(j + 1, len)
      } else if (c.isLetter || c == '_') {
        var j = i + 1
        while (j < len && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
        out += cap(s.substring(i, j)); i = j
      } else if (c.isDigit) {
        var j = i + 1
        while (j < len && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '.')) j += 1
        out += cap(s.substring(i, j)); i = j
      } else { out += c.toString; i += 1 }
    }
    out.toArray
  }
}
