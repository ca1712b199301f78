package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (builder-side
    // fast iteration; the driver always passes exactly two args). With a
    // filter, aux dumps are skipped — the full run has already written
    // them — and oracle_sql.json still carries EVERY entry.
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, None)
      case Array(a, b, f) => (a, b, Some(f.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // auxiliary oracle inputs: the deterministic raw corpus, raw scoring
    // metrics, streaming match edges, and the dedup/ANN stage tables
    // (signatures, block keys, buckets, inverted-file assignments) — the
    // DuckDB oracle recomputes ids/hashes/rollups/pair-algebra/cosines
    // from these independently (oracles read '{OUT}/_aux/...' paths,
    // interpolated below). The aux root is a SIBLING of the query
    // out-dir, not a child: the driver globs every directory under the
    // out-dir as a query result, and ~57 heterogeneous stage dumps under
    // one child directory made pyarrow die merging their schemas (the
    // round-4 `_aux` err row). DuckDB reads by absolute path, so the
    // sibling is invisible to the driver's glob and fully visible to
    // the oracle.
    val auxDir = new java.io.File(outDir).getAbsolutePath + "_aux"
    if (only.isEmpty)
      Seq[(String, (SparkSession, String, String) => Unit)](
        ("er", ErQueries.dumpAux), ("text", TextQueries.dumpAux),
        ("sim", SimQueries.dumpAux),
        ("sketch", SketchQueries.dumpAux),
        ("dsketch", DsSketchQueries.dumpAux)).foreach { case (tag, dump) =>
        try dump(spark, sfDir, auxDir)
        catch { case e: Throwable =>
          System.err.println(s"[verify] $tag aux dump failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // '{OUT}' in oracle SQL = the absolute dump dir (the oracle runs on
    // the same host, so dumped stage tables are read back by path);
    // '{OUT}/_aux' maps to the sibling aux root FIRST so the longer
    // pattern wins before the bare '{OUT}' substitution
    val outAbs = new java.io.File(outDir).getAbsolutePath
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(
        v.replace("{OUT}/_aux", auxDir).replace("{OUT}", outAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
