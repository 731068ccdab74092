package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Registry, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's full operator surface is registered in
  * [[graft.queries.Registry]] as named queries, each paired (when
  * SQL-expressible) with a DuckDB oracle over the same parquet tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The J1+A5 analogue: fact⨝fact join + ratio-of-sums by group
    * (ref: Reporting.py:109-135). */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.a05RatioByStatus.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
