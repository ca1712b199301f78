package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Placeholder — filled in M7 with DuckDB-oracle-checked relational and
  * text/dedup queries over the driver's parquet tables. */
object RelQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map.empty
  def oracleSql: Map[String, String] = Map.empty
}
