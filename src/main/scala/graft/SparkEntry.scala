package graft

import graft.sources.CorpusGen
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` is filled progressively, one entry per operator; oracle SQL
  * (DuckDB-runnable) exists for every SQL-expressible query — the ZSS DP
  * itself and hash-dependent blocking internals are covered by golden
  * ScalaTest suites instead (SURVEY.md §6).
  */
object SparkEntry {

  /** Flagship: full record-linkage pipeline (parse → block → ZSS score →
    * cluster) over the synthetic source-code corpus at sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val files = CorpusGen.corpus(spark, "/root/testdata/sf0.001")
    Pipeline.run(spark, files).clusters
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ErQueries.queries ++ RelQueries.queries ++ TextQueries.queries ++
      SimQueries.queries ++ SketchQueries.queries ++ LayoutQueries.queries ++
      DsSketchQueries.queries

  def oracleSql: Map[String, String] =
    ErQueries.oracleSql ++ RelQueries.oracleSql ++ TextQueries.oracleSql ++
      SimQueries.oracleSql ++ SketchQueries.oracleSql ++ LayoutQueries.oracleSql ++
      DsSketchQueries.oracleSql
}
