package graft.sources

import graft.model.FileRow
import graft.util.Hashing
import graft.util.Hashing.DetRng
import org.apache.spark.sql.{Dataset, SparkSession}
import scala.collection.mutable.ArrayBuffer

/** Deterministic synthetic source-code corpus with known duplicate groups.
  *
  * The driver's `documents.parquet` provides the row count and ids at each
  * scale factor (TESTDATA.md says use driver tables as inputs); every byte
  * of content is a pure function of `doc_id` under seed 42, so the corpus
  * is identical across runs/executors and the ground-truth `groupId`
  * column gives labeled pairs for the F1 ≥ 0.99 gate (BASELINE.json
  * north_rule). No reference code involved: the reference has no corpus
  * or generator at all (SURVEY.md §3b "Scans: none").
  *
  * Group model: docs are chunked 4-per-group; each group draws a size in
  * 1..4, members beyond it become singleton groups (realistic mix of
  * duplicated and unique files). Member 0 is the group base program;
  * members k>0 apply 1..3 token-level mutations (relabel / insert /
  * delete of non-bracket tokens), so intra-group tree edit distance is
  * small while inter-group programs differ structurally.
  */
object CorpusGen {

  val Seed = 42L
  private val Langs = Array("scala", "java", "python", "go", "js", "rust")
  private val Keywords = Array("def", "if", "while", "return", "val", "for", "else", "match")
  private val Ops = Array("+", "-", "*", "<", ">", "==", "=")

  def langOf(groupId: Long): String = Langs(((Hashing.hashLong(groupId, 7L) >>> 1) % Langs.length).toInt)

  /** Pure generator: doc_id → FileRow. */
  def fileFor(docId: Long): FileRow = {
    val rawGroup = docId / 4
    val memberIdx = (docId % 4).toInt
    val groupSize = 1 + ((Hashing.hashLong(rawGroup, 13L) >>> 1) % 4).toInt // 1..4
    val (groupId, member) =
      if (memberIdx < groupSize) (rawGroup, memberIdx)
      else (1000000000L + docId, 0) // overflow member → its own singleton group
    val tokens = memberTokens(groupId, member)
    val content = render(tokens)
    val lang = langOf(groupId)
    FileRow(
      repo = s"repo-${(Hashing.hashLong(groupId, 3L) >>> 1) % 97}",
      path = s"g$groupId/m$member.src",
      commit = f"${Hashing.hashLong(docId, 29L)}%016x",
      lang = lang,
      content = content,
      groupId = groupId)
  }

  /** The corpus as a Dataset, driven by documents.parquet row ids.
    * `mult` fans each doc id out to `mult` synthetic files (bench knob:
    * the documents table is small at every sf, so throughput runs scale
    * the corpus deterministically instead). */
  def corpus(spark: SparkSession, sfDir: String, mult: Int = 1): Dataset[FileRow] = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id").as[Long]
    if (mult == 1) ids.map(fileFor _)
    else ids.flatMap(d => (0 until mult).iterator.map(j => fileFor(d * mult + j)))
  }

  // --- base program generation -------------------------------------------

  private def baseTokens(groupId: Long): Array[String] = {
    val rng = new DetRng(Hashing.hashLong(groupId, 101L))
    val idPool = Array.tabulate(8 + rng.nextInt(8))(i => s"v${rng.nextInt(999)}_$i")
    val fnPool = Array.tabulate(2 + rng.nextInt(4))(i => s"fn${rng.nextInt(999)}_$i")
    val out = new ArrayBuffer[String]()
    def ident(): String = idPool(rng.nextInt(idPool.length))
    def expr(depth: Int): Unit = {
      if (depth > 0 && rng.nextInt(3) == 0) {
        out += "("; expr(depth - 1); out += Ops(rng.nextInt(Ops.length)); expr(depth - 1); out += ")"
      } else if (rng.nextInt(4) == 0) out += rng.nextInt(100).toString
      else out += ident()
    }
    def stmt(depth: Int): Unit = rng.nextInt(5) match {
      case 0 if depth < 3 =>
        out += Keywords(1 + rng.nextInt(2)) // if / while
        out += "("; expr(1); out += ")"; out += "{"
        val k = 1 + rng.nextInt(3)
        for (_ <- 0 until k) stmt(depth + 1)
        out += "}"
      case _ =>
        out += "val"; out += ident(); out += "="; expr(2); out += ";"
    }
    for (f <- fnPool) {
      out += "def"; out += f; out += "("
      val na = rng.nextInt(3)
      for (a <- 0 until na) { if (a > 0) out += ","; out += ident() }
      out += ")"; out += "{"
      val ns = 2 + rng.nextInt(5)
      for (_ <- 0 until ns) stmt(0)
      out += "return"; expr(2); out += ";"
      out += "}"
    }
    out.toArray
  }

  /** Apply `member`-specific bounded mutations to the group base. Only
    * non-bracket tokens are touched, so bracket nesting (and therefore
    * tree well-formedness) is preserved. */
  private def memberTokens(groupId: Long, member: Int): Array[String] = {
    val base = baseTokens(groupId)
    if (member == 0) return base
    val rng = new DetRng(Hashing.hashLong(groupId * 31L + member, 211L))
    val toks = ArrayBuffer.from(base)
    val nMut = 1 + rng.nextInt(3)
    def isBracket(t: String): Boolean =
      t == "(" || t == ")" || t == "{" || t == "}"
    var applied = 0
    var attempts = 0
    while (applied < nMut && attempts < 50) {
      attempts += 1
      val pos = rng.nextInt(toks.length)
      if (!isBracket(toks(pos))) {
        rng.nextInt(3) match {
          case 0 => toks(pos) = s"mut${rng.nextInt(999)}" // relabel
          case 1 => toks.insert(pos, s"x${rng.nextInt(99)}") // insert
          case 2 => toks.remove(pos) // delete
        }
        applied += 1
      }
    }
    toks.toArray
  }

  private def render(tokens: Array[String]): String = {
    val sb = new java.lang.StringBuilder(tokens.length * 5)
    var i = 0
    while (i < tokens.length) {
      sb.append(tokens(i))
      if (tokens(i) == ";" || tokens(i) == "{" || tokens(i) == "}") sb.append('\n')
      else sb.append(' ')
      i += 1
    }
    sb.toString
  }
}
