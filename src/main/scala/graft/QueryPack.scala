package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-contract queries.
  *
  * Each operator from SURVEY.md §2 is exposed as a `(SparkSession, sfDir) =>
  * DataFrame` plus, where SQL-expressible, a DuckDB oracle with IDENTICAL
  * column names and aliases (the driver sorts columns by name before hashing,
  * so names must match bit-for-bit).
  *
  * Conventions shared by every pack:
  *  - floating outputs are `round(x, d)` with the same `d` on both sides;
  *  - timestamps are truncated to seconds (Spark reads ns parquet at µs
  *    precision, DuckDB keeps ns — truncation makes them comparable);
  *  - every query carries a deterministic ORDER BY (metric, then key) so the
  *    comparison never depends on engine row order;
  *  - top-k ties are broken by a unique key column.
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame

  /** Query name -> runnable. Names are globally unique across packs. */
  def queries: Map[String, Q]

  /** Query name -> DuckDB SQL oracle. Subset of `queries` keys; a query
    * absent here gets the driver's weaker rows-only check.
    */
  def oracles: Map[String, String]
}
