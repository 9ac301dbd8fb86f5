package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ GraphOps.queries ++ Analytics.queries ++
      Dedup.queries ++ Similarity.queries ++ TextOps.queries ++
      Multimodal.queries ++ graft.sources.Formats.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Every CTE is marked MATERIALIZED: DuckDB otherwise inlines CTEs
    * referenced more than once, which makes the unrolled fixed-iteration
    * oracles (pagerank/cc/bfs chains) exponentially slow (~8 min → ~1 s
    * for connected components at sf0.01). Pure planner hint, no
    * semantic change. */
  def oracleSql: Map[String, String] =
    (Relational.oracleSql ++ GraphOps.oracleSql ++ Analytics.oracleSql ++
      Dedup.oracleSql ++ Similarity.oracleSql ++ TextOps.oracleSql ++
      Multimodal.oracleSql ++ graft.sources.Formats.oracleSql)
      .map { case (k, v) =>
        // protect SQL `WINDOW w AS (...)` clauses from the CTE rewrite
        k -> v.replace("AS (", "AS MATERIALIZED (")
          .replace("WINDOW w AS MATERIALIZED (", "WINDOW w AS (")
      }
}
