package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.{CounterDef, CounterType}
import graft.operators.{Counters, JqTransform}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a `queries` entry; those
  * with exactly-checkable semantics also have an `oracleSql` entry (DuckDB,
  * same parquet tables). Approximate operators (HLL) get an exact twin that
  * IS oracle-checked, with the approximate variant asserted by ε-tests in
  * ScalaTest (mirroring the reference's 5% tolerance,
  * `/root/reference/counter_test.go:66`).
  */
object SparkEntry {

  private val Hour = "1 hour"

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  // --- counter definitions used by the query surface -----------------------
  private val cRequestCount =
    CounterDef("request_count", CounterType.Count, targetColumn = Some("*"), windowDuration = Hour)
  private val cColumnCount =
    CounterDef("user_events", CounterType.Count, targetColumn = Some("user_id"), windowDuration = Hour)
  private val cUserAcd =
    CounterDef("unique_users", CounterType.ApproxCountDistinct, targetColumn = Some("user_id"), windowDuration = Hour)
  private val cClickCount =
    CounterDef("click_count", CounterType.Count,
      targetExpr = Some("""if(string_contains(event_type, "click"), 1, nil)"""), windowDuration = Hour)
  private val cClickUsersAcd =
    CounterDef("click_users", CounterType.ApproxCountDistinct,
      targetExpr = Some("""if(event_type == "click", user_id, nil)"""), windowDuration = Hour)
  private val cRequestCount2p = cRequestCount.copy(id = "request_count_2p")
  private val cUserAcd2p = cUserAcd.copy(id = "unique_users_2p")
  private val cBigValueCount =
    CounterDef("big_value_count", CounterType.Count, targetExpr = Some("k > 50"), windowDuration = Hour)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Counters.run(events(spark, "/root/testdata/sf0.001"), "ts", cRequestCount)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O8+O12+O13: tumbling-window count of every record (target_column "*")
    "c01_window_count" -> ((s, dir) =>
      Counters.run(events(s, dir), "ts", cRequestCount)),
    // O5/O6: null-rejecting column count (target_column projection)
    "c02_column_count" -> ((s, dir) =>
      Counters.run(events(s, dir), "ts", cColumnCount)),
    // O9 exact twin: COUNT(DISTINCT) ground truth for the HLL counter
    "c03_distinct_exact" -> ((s, dir) =>
      Counters.runExactDistinct(events(s, dir), "ts", cUserAcd)),
    // O9: HLL++ approx_count_distinct at the reference's precision 16
    "c04_window_acd" -> ((s, dir) =>
      Counters.run(events(s, dir), "ts", cUserAcd)),
    // O7: target_expr dialect, count semantics (non-null ∧ non-false)
    "c05_expr_count" -> ((s, dir) =>
      Counters.run(events(s, dir), "ts", cClickCount)),
    // O7+O9 exact twin: expr-valued distinct (ACD variant ε-tested)
    "c06_expr_distinct_exact" -> ((s, dir) =>
      Counters.runExactDistinct(events(s, dir), "ts", cClickUsersAcd)),
    // O10/O11: explicit two-phase per-shard partial → cross-shard merge
    "c07_twophase_count" -> ((s, dir) =>
      Counters.runTwoPhase(
        events(s, dir).withColumn("shard", pmod(col("user_id"), lit(8))),
        "ts", "shard", cRequestCount2p)),
    // O10 for HLL: per-shard DataSketches sketches, hll_union merge
    "c08_twophase_acd" -> ((s, dir) =>
      Counters.runTwoPhase(
        events(s, dir).withColumn("shard", pmod(col("user_id"), lit(8))),
        "ts", "shard", cUserAcd2p)),
    // O14: jq_expr output transform (object-construction subset)
    "c09_jq_output" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """{"time": .window_start, "name": "events.request_count", "value": .value}""")),
    // O16: multi-counter fan-out — N counters, ONE scan + ONE shuffle
    "c10_fanout" -> ((s, dir) =>
      Counters.fanOut(events(s, dir), "ts", Seq(cRequestCount, cClickCount))),
    // O4/O5 dynamic payload: JSON key extraction from the props column
    "c11_props_count" -> ((s, dir) =>
      Counters.run(
        events(s, dir).withColumn("k", get_json_object(col("props"), "$.k").cast("long")),
        "ts", cBigValueCount)),
  )

  /** DuckDB-equivalent SQL per query (column names/aliases must match the
    * Spark result exactly — the driver sorts columns by name then hashes).
    */
  def oracleSql: Map[String, String] = {
    val win =
      """epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS window_start,
        | epoch_ms(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour') AS window_end""".stripMargin
    Map(
      "c01_window_count" ->
        s"""SELECT $win, 'request_count' AS counter_id, 'count' AS counter_type,
           | count(*) AS value FROM events GROUP BY 1, 2""".stripMargin,
      "c02_column_count" ->
        s"""SELECT $win, 'user_events' AS counter_id, 'count' AS counter_type,
           | count(user_id) AS value FROM events GROUP BY 1, 2""".stripMargin,
      "c03_distinct_exact" ->
        s"""SELECT $win, 'unique_users' AS counter_id,
           | 'approx_count_distinct' AS counter_type,
           | count(DISTINCT user_id) AS value FROM events GROUP BY 1, 2""".stripMargin,
      "c05_expr_count" ->
        s"""SELECT $win, 'click_count' AS counter_id, 'count' AS counter_type,
           | count(*) FILTER (WHERE event_type LIKE '%click%') AS value
           | FROM events GROUP BY 1, 2""".stripMargin,
      "c06_expr_distinct_exact" ->
        s"""SELECT $win, 'click_users' AS counter_id,
           | 'approx_count_distinct' AS counter_type,
           | count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS value
           | FROM events GROUP BY 1, 2""".stripMargin,
      "c07_twophase_count" ->
        s"""SELECT $win, 'request_count_2p' AS counter_id, 'count' AS counter_type,
           | count(*) AS value FROM events GROUP BY 1, 2""".stripMargin,
      "c09_jq_output" ->
        """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS time,
          | 'events.request_count' AS name, count(*) AS value
          | FROM events GROUP BY 1""".stripMargin,
      "c10_fanout" ->
        s"""SELECT * FROM (
           | SELECT $win, 'request_count' AS counter_id, 'count' AS counter_type,
           |  count(*) AS value FROM events GROUP BY 1, 2
           | UNION ALL
           | SELECT $win, 'click_count' AS counter_id, 'count' AS counter_type,
           |  count(*) FILTER (WHERE event_type LIKE '%click%') AS value
           |  FROM events GROUP BY 1, 2)""".stripMargin,
      "c11_props_count" ->
        s"""SELECT $win, 'big_value_count' AS counter_id, 'count' AS counter_type,
           | count(*) FILTER (WHERE CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) > 50) AS value
           | FROM events GROUP BY 1, 2""".stripMargin,
    )
  }
}
