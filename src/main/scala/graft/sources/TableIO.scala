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

  /** Names of COMPLETE tables whose name starts with `prefix` —
    * versioned-snapshot discovery (StreamingEnrich's dim versions).
    * With Iceberg this is a catalog listTables; locally it lists
    * `_SUCCESS`-gated directories. */
  def listTables(spark: SparkSession, prefix: String): Seq[String]

  /** Like [[listTables]] but INCLUDING incomplete/partial remnants
    * (no `_SUCCESS` gate) where the backend can see them — the GC
    * listing: a crash between a generation's delete steps can strip
    * the completeness marker before the data files, and a
    * complete-only listing would then never show the remnant to any
    * later prune (a permanent storage leak). Catalog backends with
    * atomic commits have no partial remnants, so the default falls
    * back to [[listTables]]. */
  def listTablesAll(spark: SparkSession, prefix: String): Seq[String] =
    listTables(spark, prefix)
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

  def listTables(spark: SparkSession, prefix: String): Seq[String] =
    listTablesAll(spark, prefix).filter(exists(spark, _))

  override def listTablesAll(spark: SparkSession, prefix: String): Seq[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(_.getPath.getName)
  }

  /** Compact a stage table's small files into `targetFiles` larger
    * ones — the small-files maintenance pass every long-lived
    * incremental table needs (each streaming micro-batch and each
    * task writes its own file; a year of 5-minute batches is 10^5
    * files whose open/seek overhead dominates the scan). Values are
    * untouched; only the file layout changes.
    *
    * Swap protocol: write to `_compact_tmp`, rename the live dir to
    * `_compact_old`, rename tmp into place, delete old. The data is
    * never in fewer than one complete directory, so nothing is lost
    * at ANY crash point; a crash between the two renames leaves the
    * table invisible at its primary name until the next compact()
    * call, which starts by restoring `_compact_old` (tested). True
    * single-operation atomicity — no invisible window at all — is
    * what an Iceberg rewrite_data_files snapshot commit adds.
    *
    * Hive-PARTITIONED layouts are refused loudly: a flat rewrite
    * would silently destroy the directory layout (and the
    * planning-time pruning that comes with it); compact each
    * partition's directory as its own table instead. */
  def compact(spark: SparkSession, table: String, targetFiles: Int): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(path(table))
    val old = new org.apache.hadoop.fs.Path(path(s"${table}_compact_old"))
    val tmp = new org.apache.hadoop.fs.Path(path(s"${table}_compact_tmp"))
    val fs = dst.getFileSystem(conf)
    // crash recovery: a previous attempt renamed the live dir away but
    // died before the replacement landed — restore it first
    if (!fs.exists(dst) && fs.exists(old)) {
      require(fs.rename(old, dst), s"crash recovery failed for $table")
    }
    require(!fs.listStatus(dst).exists(st =>
        st.isDirectory && st.getPath.getName.contains("=")),
      s"$table is Hive-partitioned; compact each partition directory instead " +
        "(a flat rewrite would destroy the partition layout and its pruning)")
    read(spark, table).repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(old, true) // stale leftover from an interrupted earlier run
    require(fs.rename(dst, old), s"compaction swap (live->old) failed for $table")
    require(fs.rename(tmp, dst), s"compaction swap (tmp->live) failed for $table")
    fs.delete(old, true)
    ()
  }
}
