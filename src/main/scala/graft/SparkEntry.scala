package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.{CounterDef, CounterType}
import graft.dedup.Dedup
import graft.functions.Canonical
import graft.graph.GraphOps
import graft.multimodal.Multimodal
import graft.operators.{Counters, Intermediate, JqTransform}
import graft.similarity.Ann
import graft.textops.{TextAnalysis, UrlOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a `queries` entry; those
  * with exactly-checkable semantics also have an `oracleSql` entry (DuckDB,
  * same parquet tables). Approximate operators (HLL) get an exact twin that
  * IS oracle-checked, with the approximate variant asserted by ε-tests in
  * ScalaTest (mirroring the reference's 5% tolerance,
  * `/root/reference/counter_test.go:66`).
  *
  * The query/oracle definitions live in per-set files under `entry/`
  * ([[CounterSet]], [[DedupSet]], [[SimilaritySet]], [[TextSet]],
  * [[RelationalSet]], [[MultimodalSet]]), with shared fixtures in
  * [[EntryHelpers]]; this object is the concatenation the driver calls.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Counters.run(
      EntryHelpers.events(spark, "/root/testdata/sf0.001"), "ts",
      EntryHelpers.cRequestCount)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CounterSet.queries ++ DedupSet.queries ++ SimilaritySet.queries ++
      TextSet.queries ++ RelationalSet.queries ++ MultimodalSet.queries

  /** DuckDB-equivalent SQL per query (column names/aliases must match the
    * Spark result exactly — the driver sorts columns by name then hashes).
    */
  def oracleSql: Map[String, String] =
    CounterSet.oracle ++ DedupSet.oracle ++ SimilaritySet.oracle ++
      TextSet.oracle ++ RelationalSet.oracle ++ MultimodalSet.oracle
}
