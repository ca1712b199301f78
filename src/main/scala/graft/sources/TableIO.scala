package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table persistence boundary for checkpoint/resume (north_rule:
  * "resumable from checkpoint with per-partition lineage + metrics").
  *
  * At deployment scale this is an Iceberg catalog (`format("iceberg")`)
  * — the runtime jar is not present in this sandbox (SURVEY.md §8
  * environment facts), so the local implementation is parquet with
  * Iceberg-shaped atomicity: a stage directory is only readable once its
  * `_SUCCESS` marker exists (Hadoop committers write it last), which
  * gives the same all-or-nothing stage semantics resume depends on.
  * Every stage consumer goes through this trait, so swapping in Iceberg
  * is a constructor change, not a pipeline change.
  */
trait TableIO extends Serializable {
  def write(df: DataFrame, table: String): Unit

  /** Hive-style partitioned write (one directory level per column
    * value). A reader filtering on a partition column prunes whole
    * directories at planning time — `PartitionFilters` in the scan, no
    * file of a pruned partition is even listed. This is the layout the
    * 100 TB corpus uses for its coarse axes (lang, date, repo shard);
    * with Iceberg the same call becomes a partition-spec write and the
    * pruning moves to manifest level. UpsertSpec locks the pruned-scan
    * plan shape. */
  def writePartitioned(df: DataFrame, table: String, cols: Seq[String]): Unit

  def read(spark: SparkSession, table: String): DataFrame
  def exists(spark: SparkSession, table: String): Boolean

  /** Drop a table that is no longer needed (streaming state-generation
    * GC). Must be safe on a missing table. With Iceberg this is a
    * DROP TABLE / expire-snapshots; locally it deletes the directory. */
  def delete(spark: SparkSession, table: String): Unit
}

final class ParquetTableIO(root: String) extends TableIO {
  private def path(table: String) = s"$root/$table"

  def write(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path(table))

  def writePartitioned(df: DataFrame, table: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path(table))

  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))

  def exists(spark: SparkSession, table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(table), "_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  def delete(spark: SparkSession, table: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path(table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    ()
  }

  /** Compact a stage table's small files into `targetFiles` larger
    * ones — the small-files maintenance pass every long-lived
    * incremental table needs (each streaming micro-batch and each
    * task writes its own file; a year of 5-minute batches is 10^5
    * files whose open/seek overhead dominates the scan). Values are
    * untouched; only the file layout changes. Written to a sibling
    * directory first and swapped in by rename, so a reader never sees
    * a half-compacted table and a crash mid-compaction leaves the
    * original intact (the stale `_compact_tmp` is simply overwritten
    * by the next attempt). With Iceberg this is rewrite_data_files;
    * the atomicity moves to a snapshot commit. */
  def compact(spark: SparkSession, table: String, targetFiles: Int): Unit = {
    val tmp = s"${table}_compact_tmp"
    read(spark, table).repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(path(tmp))
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(path(tmp))
    val dst = new org.apache.hadoop.fs.Path(path(table))
    val fs = dst.getFileSystem(conf)
    fs.delete(dst, true)
    require(fs.rename(src, dst), s"compaction swap failed for $table")
  }
}
