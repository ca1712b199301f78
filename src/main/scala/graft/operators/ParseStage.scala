package graft.operators

import graft.model.{FileRow, PartMetrics, TreeRow}
import graft.parse.CodeParser
import graft.util.Hashing
import org.apache.spark.TaskContext
import org.apache.spark.sql.Dataset
import org.apache.spark.util.CollectionAccumulator

/** Stage 1: content → flattened postorder tree + blocking features.
  *
  * One narrow `Dataset.map` — embarrassingly parallel, no shuffle. The
  * reference re-annotates both trees on every `distance()` call
  * (zss/compare.py anchor `def distance` constructs two AnnotatedTrees
  * per invocation); here annotation and MinHash run ONCE per file and the
  * O(pairs) scoring stage reuses the arrays (SURVEY.md §4 E2).
  */
object ParseStage {

  /** MinHash parameters: numHashes signatures, banded as bands×rows for
    * LSH blocking. Defaults measured on the 80k-file corpus (BENCH.md
    * round 2): 8 bands × 2 rows over 3-token shingles give end-to-end
    * blocking recall 99.986 % (vs 99.78 % for 6×2 over 4-shingles) at
    * 1.33× the candidate-pair volume — shorter shingles keep small
    * files' Jaccard high under token mutations, and the extra bands
    * cover the tail: P(band hit) = 1−(1−J²)⁸. */
  final case class MinHashConfig(numHashes: Int = 16, bands: Int = 8, shingleK: Int = 3) {
    require(numHashes % bands == 0)
    def rows: Int = numHashes / bands
  }

  /** Seeded-minimum MinHash over token k-shingles — hand-rolled on
    * [[Hashing]] (not spark.ml MinHashLSH) so the signature is a pure,
    * documented function of the token stream: deterministic across runs,
    * executors, and resume (SURVEY.md §3b Blocking/LSH row). */
  def minHash(tokens: Array[String], cfg: MinHashConfig): Array[Long] = {
    val k = cfg.shingleK
    val th = new Array[Long](tokens.length)
    var i = 0
    while (i < tokens.length) { th(i) = Hashing.hashString(tokens(i)); i += 1 }
    val nSh = math.max(1, tokens.length - k + 1)
    val shingles = new Array[Long](nSh)
    i = 0
    while (i < nSh) {
      var h = 0L
      var j = 0
      while (j < k && i + j < tokens.length) { h = Hashing.mix64(h ^ th(i + j)); j += 1 }
      shingles(i) = h
      i += 1
    }
    Hashing.minSig(shingles, cfg.numHashes,
      (e, s) => Hashing.hashLong(e, 0x5eed0000L + s))
  }

  def parse(files: Dataset[FileRow],
            cfg: CodeParser.ParseConfig = CodeParser.defaultConfig,
            mh: MinHashConfig = MinHashConfig(),
            metricsAcc: Option[CollectionAccumulator[PartMetrics]] = None): Dataset[TreeRow] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      val t0 = System.nanoTime()
      var rows = 0L
      metricsAcc.foreach { acc =>
        val tc = TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          acc.add(PartMetrics(
            stage = "parse",
            partitionId = tc.partitionId(),
            rowsIn = rows,
            rowsOut = rows,
            pairsScored = 0L,
            dpCells = 0L,
            wallNs = System.nanoTime() - t0))
        }
      }
      it.map { f =>
      rows += 1
      val p = CodeParser.parse(f.content, cfg)
      val toks = CodeParser.tokens(f.content, cfg)
      TreeRow(
        id = Hashing.rowId128Hex(f.repo, f.path, f.commit),
        repo = f.repo,
        path = f.path,
        commit = f.commit,
        lang = f.lang,
        sha256 = Hashing.sha256Hex(f.content),
        labels = p.tree.labels,
        labelsH = p.tree.labels.map(Hashing.hashString(_)),
        lmds = p.tree.lmds,
        keyroots = p.tree.keyroots,
        n = p.tree.n,
        nTokens = p.nTokens,
        truncated = p.truncated,
        minhash = minHash(toks, mh),
        groupId = f.groupId)
      }
    }
  }
}
