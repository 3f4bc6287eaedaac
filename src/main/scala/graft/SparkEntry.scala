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
  */
object SparkEntry {

  private val Hour = "1 hour"

  // t44's literal retrieval workload — corpus-vocabulary terms so every
  // query has real hits; the oracle embeds the same VALUES table
  private val Bm25Queries: Seq[(Long, String)] = Seq(
    1L -> "spark query fast",
    2L -> "table scan filter",
    3L -> "vector merge batch window")

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
  private val cBoolFloorCount =
    CounterDef("bool_floor_count", CounterType.Count,
      targetExpr = Some(
        """if(as_bool(if(value >= 50.0, "t", "f")) && floor(min(value, 150.0)) % 2 == 0, 1, nil)"""),
      windowDuration = Hour)
  private val cRequestCount2p = cRequestCount.copy(id = "request_count_2p")
  private val cUserAcd2p = cUserAcd.copy(id = "unique_users_2p")
  // engine-extension counter types as CONFIG citizens (CounterType
  // beyond the reference's enum): p90 of the record value / top-3 users
  private val cValueP90 =
    CounterDef("value_p90", CounterType.ValueQuantile,
      targetColumn = Some("value"), windowDuration = Hour, quantilePpm = 900000L)
  private val cTopUsers =
    CounterDef("top_users", CounterType.HeavyHitters,
      targetColumn = Some("user_id"), windowDuration = Hour, topK = 3)
  private val cValueSum =
    CounterDef("revenue_cents", CounterType.ValueSum,
      targetColumn = Some("value"), windowDuration = Hour)
  private val cBigValueCount =
    CounterDef("big_value_count", CounterType.Count, targetExpr = Some("k > 50"), windowDuration = Hour)
  private val cValueMin =
    CounterDef("value_min_cents", CounterType.ValueMin,
      targetColumn = Some("value"), windowDuration = Hour)
  private val cValueMax =
    CounterDef("value_max_cents", CounterType.ValueMax,
      targetColumn = Some("value"), windowDuration = Hour)

  /** Per-language sampling rates (ppm) for the stratified-sample query —
    * the kind of language-balancing mix a multilingual training run uses.
    */
  private val SampleRates = Map(
    "en" -> 900000L, "de" -> 600000L, "es" -> 600000L,
    "fr" -> 600000L, "zh" -> 300000L)

  /** BM25 query terms for t20: one rare term (high idf) and two common
    * ones, so the ranking exercises both idf spread and length
    * normalization.
    */
  private val Bm25Query = Seq("dup", "scan", "key")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Counters.run(events(spark, "/root/testdata/sf0.001"), "ts", cRequestCount)

  /** Stateful-stream state sizing: `spark.sql.shuffle.partitions` is ALSO
    * the stateful-operator state-store count, and a real deployment sizes
    * it per stream volume, not per batch parallelism — every micro-batch
    * commits every store, so 32 stores for a trickle stream is pure
    * overhead (measured ~1.5× on the parity queries). The streaming parity
    * queries run their stream under `n` partitions and restore the
    * session's batch setting after.
    */
  /** Run `body` with one session-conf key overridden, restoring (or
    * unsetting) it after — the scoped-config primitive the streaming
    * queries use for state sizing and store-provider selection.
    */
  private def withConf[T](s: SparkSession, key: String, value: String)(body: => T): T = {
    val prev = s.conf.getOption(key)
    s.conf.set(key, value)
    try body finally prev.fold(s.conf.unset(key))(s.conf.set(key, _))
  }

  private def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T =
    withConf(s, "spark.sql.shuffle.partitions", n.toString)(body)

  /** Measured ε-gate for the approximate-distinct queries. Two engines'
    * HLL sketches cannot hash-match, so the ESTIMATE stays out of the
    * hashed output; instead each window row carries the Spark-side exact
    * `count(distinct)` — which the DuckDB oracle reproduces — plus a
    * `within_eps` verdict holding iff the sketch estimate is within the
    * reference's own 5% test tolerance of that exact count
    * (`counter_test.go:66`; the lgK=16 sketch's expected error is ~0.4%).
    * A window whose estimate drifts past ε flips the flag to false and
    * fails the oracle's `TRUE` hash compare — a per-window
    * regression-guarded bound instead of a `no_oracle` abstention. The
    * full join makes a window MISSING on either side fail too (null
    * counter_id / false flag).
    */
  private def acdEpsilonGate(est: DataFrame, exact: DataFrame): DataFrame = {
    val e = est.select(col("window_start").as("ws"),
      col("window_end").as("we"), col("value").as("est"))
    exact.join(e,
        col("window_start") === col("ws") && col("window_end") === col("we"),
        "full")
      .select(
        coalesce(col("window_start"), col("ws")).as("window_start"),
        coalesce(col("window_end"), col("we")).as("window_end"),
        col("counter_id"), col("counter_type"),
        col("value").as("exact_value"),
        (col("est").isNotNull && col("value").isNotNull &&
          abs(col("est") - col("value")) * lit(1000000L) <=
            col("value") * lit(50000L)).as("within_eps"))
  }

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
    // O9: HLL++ approx_count_distinct at the reference's precision 16,
    // ε-gated per window against the exact count (see acdEpsilonGate)
    "c04_window_acd" -> ((s, dir) => {
      val ev = events(s, dir)
      acdEpsilonGate(
        Counters.run(ev, "ts", cUserAcd),
        Counters.runExactDistinct(ev, "ts", cUserAcd))
    }),
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
    // O10 for HLL: per-shard DataSketches sketches, hll_union merge —
    // the merged estimate ε-gated per window against the exact count
    "c08_twophase_acd" -> ((s, dir) => {
      val ev = events(s, dir)
      acdEpsilonGate(
        Counters.runTwoPhase(
          ev.withColumn("shard", pmod(col("user_id"), lit(8))),
          "ts", "shard", cUserAcd2p),
        Counters.runExactDistinct(ev, "ts", cUserAcd2p))
    }),
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
    // O4/O5 via the VARIANT type — the 100 TB path for dynamic payloads:
    // parse once into the binary variant encoding, typed access after
    "c12_variant_count" -> ((s, dir) =>
      Counters.run(
        events(s, dir).withColumn("k",
          variant_get(parse_json(col("props")), "$.k", "long")),
        "ts", cBigValueCount.copy(id = "big_value_count_variant"))),
    // O10 through the SERIALIZED intermediate-record hop: partial state →
    // JSON records (the aggregate-stream payload) → parse+filter → merge
    "c13_intermediate_roundtrip" -> ((s, dir) => {
      val c = cRequestCount.copy(id = "request_count_rt")
      val sharded = events(s, dir).withColumn("shard", pmod(col("user_id"), lit(8)))
      Intermediate.mergeRecords(
        Intermediate.toRecords(
          Counters.partialState(sharded, "ts", "shard", c),
          c, "arn:aws:kinesis:ap-northeast-1:111122223333:stream/in"),
        c, requiredVersion = Some(">=0.1.0"))
    }),

    // O14 general jq: stage pipes + select() filter + value-level function
    // pipe (counter.go:441-465 — 0..N outputs; here the select drops half
    // the fan-out records and tostring rewrites the value)
    "c14_jq_select_pipe" -> ((s, dir) =>
      JqTransform(
        Counters.fanOut(events(s, dir), "ts", Seq(cRequestCount, cClickCount)),
        """select(.counter_id == "click_count")
          | {"time": .window_start, "name": .counter_id, "value": (.value | tostring)}""")),
    // O13 per-shard topology: shard_id in the output record
    // (counter.go:423-425)
    "c15_per_shard_count" -> ((s, dir) =>
      Counters.runPerShard(
        events(s, dir).withColumn("shard", pmod(col("user_id"), lit(8))),
        "ts", "shard", cRequestCount.copy(id = "request_count_shard"))),

    // O1/O2/O12 streaming semantics, oracle-checked: the SAME counter run
    // through Structured Streaming (file-stream source → tumbling window →
    // memory sink) must hash-match the batch oracle — batch/stream
    // semantic unification, end to end
    "c16_streaming_parity" -> ((s, dir) => withStatePartitions(s, 8) {
      val c = cRequestCount.copy(id = "request_count_stream")
      val out = graft.streaming.StreamingCounters.run(
        Tables.eventsStream(s, dir), "ts", c)
      val sink = "c16_streaming_parity_sink"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
    }),

    // O2 explicit-state protocol, oracle-checked: the flatMapGroupsWithState
    // CounterState path (state carried per window, emitted on the
    // event-time timeout = final invoke) must hash-match the batch oracle
    // for every window the watermark closed — all but the stream's last
    "c17_custom_state_parity" -> ((s, dir) => withStatePartitions(s, 8) {
      val c = cRequestCount.copy(id = "request_count_state")
      val out = graft.streaming.StreamingCounters.runCustomState(
        Tables.eventsStream(s, dir), "ts", c,
        valueCol = lit("x"), watermarkDelay = "0 seconds")
      val sink = "c17_custom_state_sink"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
    }),

    // windowing EXTENSIONS beyond the reference's tumbling-only surface:
    // sliding windows (each record in window/slide overlapping buckets)
    "c18_sliding_count" -> ((s, dir) =>
      Counters.runSliding(events(s, dir), "ts",
        cRequestCount.copy(id = "sliding_count"), slide = "30 minutes")),
    // session windows (gap-merged per-user activity)
    "c19_session_count" -> ((s, dir) =>
      Counters.runSessions(events(s, dir), "ts", "user_id",
        cRequestCount.copy(id = "session_events"), gap = "2 hours")),
    // O14 jq map + array construction + iteration composed: per output
    // record build an array, map over it (element-bound '.'), then emit
    // one row per element — 0..N outputs through one generator
    "c26_jq_map_iterate" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """{pair: ([.value, .value * 2] | map(. * 10)), time: .window_start} | .pair[]""")),
    // O14 jq if/then/elif/else: conditional output classification with
    // jq-truthy conditions — one codegen'd when-chain
    "c27_jq_conditional" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """{"time": .window_start,
          | "level": (if .value > 15 then "high" elif .value > 12 then "mid" else "low" end),
          | "value": .value}""".stripMargin)),
    // O2 on Spark 4's transformWithState (the modern arbitrary-state API:
    // named ValueState + explicit event-time timers, RocksDB-backed),
    // oracle-checked against the same watermark-closed-window bound as c17
    "c29_tws_state_parity" -> ((s, dir) => withStatePartitions(s, 8) {
      withConf(s, "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
        val c = cRequestCount.copy(id = "request_count_tws")
        val out = graft.streaming.StreamingCounters.runCustomStateTws(
          Tables.eventsStream(s, dir), "ts", c,
          valueCol = lit("x"), watermarkDelay = "0 seconds")
        val sink = "c29_tws_state_sink"
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        s.table(sink)
      }
    }),
    // stream-stream INTERVAL JOIN, oracle-checked: purchases ⋈ clicks of
    // the same user within a 1-hour lookback, both sides live streams
    // with watermark-bounded join state — must hash-match the batch
    // range join
    "c28_interval_join_parity" -> ((s, dir) => withStatePartitions(s, 8) {
      val out = graft.streaming.StreamingJoins.purchaseClickPairs(
        Tables.eventsStream(s, dir))
      val sink = "c28_interval_join_sink"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
    }),
    // STREAM-STATIC enrichment parity: the event stream joins a static
    // per-type weight dimension (broadcast, stateless, re-planned per
    // micro-batch) and the weighted counts aggregate per window — the
    // third streaming-join class beside c28's stream-stream interval
    // join and t30/t33's broadcast-model literals
    "c51_stream_static_enrich" -> ((s, dir) => {
      import s.implicits._
      val dim = Seq(("click", 1L), ("view", 2L), ("purchase", 5L),
        ("signup", 3L), ("error", 0L)).toDF("event_type", "weight")
      val enriched = graft.streaming.StreamingJoins.staticEnrich(
        Tables.eventsStream(s, dir), dim, "event_type")
      val out = enriched.withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(sum(col("weight")).as("value"))
        .select(unix_millis(col("window.start")).as("window_start"),
          unix_millis(col("window.end")).as("window_end"),
          col("value"))
      val sink = "c51_static_enrich_sink"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
    }),
    // THE WHOLE ENGINE from config, oracle-checked: YAML in (env-template
    // loader), ARN wildcard routing selects the matching counter, its
    // pipeline runs target_expr + jq — records out must hash-match the
    // oracle. The non-matching counter proves routing drops it.
    // the WHOLE STREAMING ENGINE from config, oracle-checked — the
    // streaming twin of c25: YAML → ARN routing → KPL-parse path →
    // watermark pipeline (target_expr + jq) → RecordPutter sinks; the
    // emitted sink RECORDS (not a query handle) parse back and must
    // hash-match the relational oracle for every closed window
    "c52_stream_engine_e2e" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val yaml =
        """counters:
          |  - id: cfg_clicks_stream
          |    counter_type: count
          |    input_stream_arn: arn:aws:kinesis:ap-northeast-1:111122223333:stream/events*
          |    output_stream_arn: arn:aws:kinesis:ap-northeast-1:111122223333:stream/out
          |    target_expr: 'if(string_contains(event_type, "click"), 1, nil)'
          |    jq_expr: '{"time": .window_start, "name": "metric.\(.counter_id)", "value": .value}'
          |  - id: cfg_other
          |    counter_type: count
          |    input_stream_arn: arn:aws:kinesis:ap-northeast-1:111122223333:stream/other
          |    target_column: "*"
          |""".stripMargin
      val cfg = graft.config.ConfigLoader.fromYaml(yaml)
        .fold(e => throw new IllegalArgumentException(e), identity)
      val src = graft.config.Arn.parse(
          "arn:aws:kinesis:ap-northeast-1:111122223333:stream/events-prod")
        .fold(e => throw new IllegalArgumentException(e), identity)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType)))
      val raw = Tables.eventsStream(s, dir)
        .select(to_json(struct(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))).cast("binary").as("value"))
      graft.sinks.Sinks.CollectingPutter.drain() // clear prior runs
      val queries = graft.streaming.StreamingEngine.run(
        raw, schema, "ts", cfg, src, new graft.sinks.Sinks.CollectingPutter,
        watermarkDelay = "0 seconds")
      require(queries.keySet == Set("cfg_clicks_stream"),
        s"routing must launch exactly cfg_clicks_stream, got ${queries.keySet}")
      try queries.values.foreach(_.processAllAvailable())
      finally queries.values.foreach(_.stop())
      val recs = graft.sinks.Sinks.CollectingPutter.drain().map(_._3)
      import s.implicits._
      s.read.json(recs.toDS)
    }),
    "c25_engine_config_e2e" -> ((s, dir) => {
      val yaml =
        """counters:
          |  - id: cfg_clicks
          |    counter_type: count
          |    input_stream_arn: arn:aws:kinesis:ap-northeast-1:111122223333:stream/events*
          |    target_expr: 'if(string_contains(event_type, "click"), 1, nil)'
          |    jq_expr: '{"time": .window_start, "name": "metric.\(.counter_id)", "value": .value}'
          |  - id: cfg_other
          |    counter_type: count
          |    input_stream_arn: arn:aws:kinesis:ap-northeast-1:111122223333:stream/other
          |    target_column: "*"
          |""".stripMargin
      val cfg = graft.config.ConfigLoader.fromYaml(yaml)
        .fold(e => throw new IllegalArgumentException(e), identity)
      val src = graft.config.Arn.parse(
          "arn:aws:kinesis:ap-northeast-1:111122223333:stream/events-prod")
        .fold(e => throw new IllegalArgumentException(e), identity)
      val outs = Engine.process(events(s, dir), "ts", cfg, src)
      require(outs.map(_._1.id) == Seq("cfg_clicks"),
        s"routing must select exactly cfg_clicks, got ${outs.map(_._1.id)}")
      outs.head._2
    }),
    // the EXTENSION counter type end-to-end through the SAME config
    // machinery as c25: YAML (value_quantile + quantile_ppm), ARN
    // routing, Engine.pipeline dispatch, and a jq transform over the
    // quantile's O13 output record
    "c44_quantile_engine_e2e" -> ((s, dir) => {
      val yaml =
        """counters:
          |  - id: cfg_p90
          |    counter_type: value_quantile
          |    quantile_ppm: 900000
          |    input_stream_arn: arn:aws:kinesis:ap-northeast-1:111122223333:stream/events*
          |    target_column: value
          |    window_duration: 1 hour
          |    jq_expr: '{"time": .window_start, "name": "metric.\(.counter_id)", "p90": .value}'
          |""".stripMargin
      val cfg = graft.config.ConfigLoader.fromYaml(yaml)
        .fold(e => throw new IllegalArgumentException(e), identity)
      val src = graft.config.Arn.parse(
          "arn:aws:kinesis:ap-northeast-1:111122223333:stream/events-prod")
        .fold(e => throw new IllegalArgumentException(e), identity)
      Engine.process(events(s, dir), "ts", cfg, src).head._2
    }),
    // O16 through Structured Streaming, oracle-checked: N counters share
    // ONE streaming aggregation (single state store) + one generator
    // unpivot; every watermark-closed window hash-matches the batch
    // fan-out oracle
    "c24_fanout_streaming_parity" -> ((s, dir) => withStatePartitions(s, 8) {
      val cs = Seq(
        cRequestCount.copy(id = "request_count_fo_stream"),
        cClickCount.copy(id = "click_count_fo_stream"))
      val out = graft.streaming.StreamingCounters.fanOut(
        Tables.eventsStream(s, dir), "ts", cs, watermarkDelay = "0 seconds")
      val sink = "c24_fanout_stream_sink"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
    }),
    // EP3 as a real stream, oracle-checked: per-shard partials serialized
    // to intermediate-record JSON (the aggregate-stream payload), CONSUMED
    // via readStream → parse/filter/version-gate → merge per window —
    // the reference's two-job topology (counter.go:348-412) end to end
    "c23_intermediate_streaming_parity" -> ((s, dir) => withStatePartitions(s, 8) {
      val c = cRequestCount.copy(id = "request_count_rt_stream")
      val sharded = events(s, dir).withColumn("shard", pmod(col("user_id"), lit(8)))
      // per-application path: concurrent runs on one host must not clobber
      // each other's record files mid-stream; deleted once drained (the
      // memory sink holds the rows — the files are scratch)
      val recDir = s"/tmp/graft_c23_records_${s.sparkContext.applicationId}"
      try {
        Intermediate.toRecords(
            Counters.partialState(sharded, "ts", "shard", c),
            c, "arn:aws:kinesis:ap-northeast-1:111122223333:stream/in")
          .write.mode("overwrite").parquet(recDir)
        val recStream = s.readStream
          .schema("partition_key STRING, value STRING")
          .parquet(recDir)
        val merged = graft.streaming.StreamingCounters.mergeIntermediate(
          recStream, c, watermarkDelay = "0 seconds")
        val sink = "c23_intermediate_stream_sink"
        val q = merged.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        s.table(sink)
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(recDir))
      }
    }),
    // sliding windows through Structured Streaming, oracle-checked like
    // c17: every overlapping bucket the watermark closed must hash-match
    // the batch sliding result
    "c22_sliding_streaming_parity" -> ((s, dir) => withStatePartitions(s, 8) {
      val c = cRequestCount.copy(id = "sliding_count_stream")
      val out = graft.streaming.StreamingCounters.runSliding(
        Tables.eventsStream(s, dir), "ts", c,
        slide = "30 minutes", watermarkDelay = "0 seconds")
      val sink = "c22_sliding_stream_sink"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
    }),
    // session windows through Structured Streaming, oracle-checked like
    // c17: zero-delay watermark closes every session whose reach (last
    // event + gap) precedes the stream's max event time; the oracle
    // mirrors with the same HAVING bound
    "c21_session_streaming_parity" -> ((s, dir) => withStatePartitions(s, 8) {
      val c = cRequestCount.copy(id = "session_events_stream")
      val out = graft.streaming.StreamingCounters.runSessions(
        Tables.eventsStream(s, dir), "ts", "user_id", c,
        gap = "2 hours", watermarkDelay = "0 seconds")
      val sink = "c21_session_stream_sink"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
    }),
    // O14 jq `//` alternative + dynamic-object semantics: absent fields
    // read as null (counter.go:274) and fall through to the alternative;
    // the name falls back to an interpolated string
    "c20_jq_alternative" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """{"time": .window_start,
          | "name": (.metric_name // "metric.\(.counter_id)"),
          | "value": (.shard_id // .value)}""".stripMargin)),

    // ---- relational analytics over the TPC-H-shaped tables ----
    // Q1 shape: single-scan small-group pricing summary, integer-exact
    "h01_pricing_summary" -> ((s, dir) =>
      graft.relational.Relational.pricingSummary(Tables.lineitem(s, dir))),
    // Q3 shape: segment filter → orders ⋈ lineitem → top-k by revenue
    "h02_top_orders" -> ((s, dir) =>
      graft.relational.Relational.topOrdersByRevenue(
        Tables.customer(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // Q5 shape: broadcast region/nation dims → customer/orders/lineitem
    "h03_region_revenue" -> ((s, dir) =>
      graft.relational.Relational.regionRevenue(
        Tables.region(s, dir), Tables.nation(s, dir), Tables.customer(s, dir),
        Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // Q9-ish shape: broadcast part/supplier dims → fact scan, no shuffle
    // before the final small-group aggregate
    "h04_brand_profit" -> ((s, dir) =>
      graft.relational.Relational.brandProfit(
        Tables.part(s, dir), Tables.supplier(s, dir), Tables.nation(s, dir),
        Tables.lineitem(s, dir))),
    // Q18 shape: aggregate-then-join — HAVING on the fact pre-aggregate
    // bounds both joins by qualifying orders
    "h05_large_orders" -> ((s, dir) =>
      graft.relational.Relational.largeOrders(
        Tables.customer(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // Q7 shape: nation-pair revenue by direction and ship year; supplier
    // side broadcast, customer side left to AQE
    "h06_volume_shipping" -> ((s, dir) =>
      graft.relational.Relational.volumeShipping(
        Tables.supplier(s, dir), Tables.customer(s, dir), Tables.nation(s, dir),
        Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // Q14 shape: promo/total conditional-aggregate ratio in one pass
    "h07_promo_share" -> ((s, dir) =>
      graft.relational.Relational.promoRevenueShare(
        Tables.part(s, dir), Tables.lineitem(s, dir))),
    // Q4 shape: EXISTS → left-semi join (probe side never duplicates)
    "h08_late_priority" -> ((s, dir) =>
      graft.relational.Relational.latePriority(
        Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // Q16 shape: NOT IN → broadcast anti-join + two-phase count(DISTINCT)
    "h09_supplier_diversity" -> ((s, dir) =>
      graft.relational.Relational.supplierDiversity(
        Tables.part(s, dir), Tables.supplier(s, dir), Tables.lineitem(s, dir))),
    // Q2 shape: correlated min subquery decorrelated to aggregate-then-join
    "h10_min_cost_supplier" -> ((s, dir) =>
      graft.relational.Relational.minCostSupplier(
        Tables.part(s, dir), Tables.supplier(s, dir), Tables.lineitem(s, dir))),
    // Q22 shape: broadcast scalar aggregate + NOT EXISTS anti-join,
    // integer-exact above-average test via cross-multiplication
    "h11_idle_rich" -> ((s, dir) =>
      graft.relational.Relational.idleRichCustomers(
        Tables.customer(s, dir), Tables.orders(s, dir))),

    // ---- temporal / event-sequence analytics (events table) ----
    // as-of join: most recent click at-or-before each purchase, via the
    // union-and-carry encoding (ONE shuffle, no range-join blow-up)
    "e01_asof_attribution" -> ((s, dir) =>
      graft.relational.Temporal.purchaseAttribution(events(s, dir))),
    // first-seen cohorts × active-day offsets (retention triangle)
    "e02_retention" -> ((s, dir) =>
      graft.relational.Temporal.retentionCohorts(events(s, dir))),
    // ordered funnel signup → click → purchase: deepest stage per user
    "e03_funnel" -> ((s, dir) =>
      graft.relational.Temporal.funnelStages(events(s, dir))),
    // RANGE-framed trailing-week sums over the calendar-bounded daily agg
    "e04_rolling_activity" -> ((s, dir) =>
      graft.relational.Temporal.rollingActivity(events(s, dir))),
    // Q21 shape: double EXISTS decorrelated into per-order counters
    "h12_lonely_late" -> ((s, dir) =>
      graft.relational.Relational.lonelyLateSupplier(
        Tables.orders(s, dir), Tables.lineitem(s, dir), Tables.supplier(s, dir))),
    // Q13 shape: zero-inclusive order-count histogram, aggregate-then-
    // outer-join (orders collapse before meeting customer)
    "h13_order_histogram" -> ((s, dir) =>
      graft.relational.Relational.customerOrderHistogram(
        Tables.customer(s, dir), Tables.orders(s, dir))),
    // Q10 shape: returned-item revenue per customer, star join with the
    // revenue aggregate collapsed BEFORE the dimension joins, heap top-k
    "h15_returned_items" -> ((s, dir) =>
      graft.relational.Relational.returnedItemReport(
        Tables.customer(s, dir), Tables.orders(s, dir),
        Tables.lineitem(s, dir), Tables.nation(s, dir))),
    // Q6 shape: zero-join pushed-filter aggregate (the pushdown showcase)
    "h16_revenue_change" -> ((s, dir) =>
      graft.relational.Relational.revenueChange(Tables.lineitem(s, dir))),
    // Q15 shape: scalar-max subquery decorrelated to a broadcast scalar
    // equality join; ties surface
    "h18_top_supplier" -> ((s, dir) =>
      graft.relational.Relational.topSupplier(
        Tables.supplier(s, dir), Tables.lineitem(s, dir))),
    // Q19 shape: OR-of-ANDs disjunctive revenue with hand-hoisted
    // convex hulls so both scans still prune (Catalyst won't derive them)
    "h19_disjunctive_revenue" -> ((s, dir) =>
      graft.relational.Relational.disjunctiveRevenue(
        Tables.part(s, dir), Tables.lineitem(s, dir))),
    // Q12 shape: per-line lateness × priority conditional-count matrix,
    // both counts from ONE aggregate pass over the hash join
    "h20_lateness_matrix" -> ((s, dir) =>
      graft.relational.Relational.latenessPriorityMatrix(
        Tables.orders(s, dir), Tables.lineitem(s, dir))),
    // Q20 shape (adapted — no partsupp in this schema): correlated nested
    // aggregate decorrelated to stacked aggregates + join-back; exact
    // integer 8·S > T threshold (share > 1/8 — this corpus's max share is ~0.21)
    "h21_dominant_suppliers" -> ((s, dir) =>
      graft.relational.Relational.dominantSuppliers(
        Tables.supplier(s, dir), Tables.part(s, dir), Tables.lineitem(s, dir))),
    // Q11 shape: groupwise share vs a broadcast global scalar, exact
    // DECIMAL(38,0) cross-multiply, scale-free relative threshold
    "h22_important_parts" -> ((s, dir) =>
      graft.relational.Relational.importantParts(Tables.lineitem(s, dir))),
    // CUBE over the pricing-summary dims: detail + both margins + grand
    // total in one Expand pass, grouping_id disambiguation
    "h24_revenue_cube" -> ((s, dir) =>
      graft.relational.Relational.revenueCube(Tables.lineitem(s, dir))),
    // skew-salted equi-join (the manual hot-key escape hatch): salting
    // must be INVISIBLE — the aggregate equals the plain join's
    "h23_salted_join" -> ((s, dir) =>
      graft.relational.Relational.saltedEquiJoin(
          Tables.lineitem(s, dir).withColumnRenamed("l_orderkey", "okey"),
          Tables.orders(s, dir).withColumnRenamed("o_orderkey", "okey"),
          "okey", salts = 8, saltSource = col("l_linenumber"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).as("rev_cents"))),
    // Q8 shape: per-year national market share — two-level conditional-
    // aggregate ratio over a 6-table star, dims broadcast, ONE agg pass
    "h17_market_share" -> ((s, dir) =>
      graft.relational.Relational.marketShare(
        Tables.region(s, dir), Tables.nation(s, dir), Tables.customer(s, dir),
        Tables.orders(s, dir), Tables.lineitem(s, dir), Tables.supplier(s, dir))),
    // gaps-and-islands sessionization: per-(user, session) analytic rows
    "e05_user_sessions" -> ((s, dir) =>
      graft.relational.Temporal.userSessions(events(s, dir))),
    // count spike detection: integer-exact trailing z² flags over the
    // hourly per-type counts (the alerting step on counter output)
    "e06_count_spikes" -> ((s, dir) =>
      graft.relational.Temporal.countSpikes(events(s, dir))),
    // STREAMING face of spike detection: hourly per-type counts close in
    // order under the watermark, so the z² flagging half runs per batch
    // over the accumulated closed hours and must match batch e06 rows
    // for every closed hour
    "e12_stream_spikes_parity" -> ((s, dir) => withStatePartitions(s, 8) {
      val counts = Tables.eventsStream(s, dir).withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("window.start").as("hour"), col("event_type"), col("n_events"))
      val sink = "e12_spikes_sink"
      val q = counts.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      graft.relational.Temporal.spikesFromHourly(s.table(sink))
    }),
    // windowed heavy hitters: per-hour top-k users — rank runs over the
    // per-(window, user) aggregate, never the raw events
    "e07_heavy_hitters" -> ((s, dir) =>
      graft.relational.Temporal.windowHeavyHitters(events(s, dir))),
    // exact inter-event-gap quantiles per type (histogram method — the
    // cumulative window runs over distinct gaps, never the events)
    "e08_gap_quantiles" -> ((s, dir) =>
      graft.relational.Temporal.gapQuantiles(events(s, dir))),
    // hour-over-hour count deltas — the raw derivative read beside e06's
    // spike flags; delta vs the previous OBSERVED hour, first hour NULL
    "e15_count_deltas" -> ((s, dir) =>
      graft.relational.Temporal.countDeltas(events(s, dir))),
    // percentile counter type (ENGINE EXTENSION): exact per-window value
    // quantiles in cents — latency percentiles next to request counts
    "e09_value_quantiles" -> ((s, dir) =>
      graft.relational.Temporal.windowValueQuantiles(events(s, dir))),
    // percentile counter by MERGEABLE SKETCH + measured ε-gate (the a01
    // HLL pattern for quantiles): exact values hash-compared, the O(1/ε)
    // sketch's rank drift breaks the within_eps column instead
    "e13_quantile_sketch_gate" -> ((s, dir) =>
      graft.relational.Temporal.quantileSketchGate(events(s, dir))),
    // heavy-hitter counter by MERGEABLE Misra–Gries SKETCH + measured
    // bound gate (the a01/e13 pattern for frequencies): exact top-k
    // counts hash-compared, the O(capacity) summary's estimate drift
    // breaks the within_bound column instead
    "e14_hitter_sketch_gate" -> ((s, dir) =>
      graft.relational.Temporal.hitterSketchGate(events(s, dir))),
    // percentile counter through the SERIALIZED two-phase topology
    // (counter.go:483-512 analog for the engine-extension counter type):
    // per-shard cents histograms → JSON intermediate records → parse +
    // version gate → cross-shard histogram merge → exact quantile pick.
    // Oracle = e09's SQL: shard decomposition must be invisible.
    "e10_twophase_quantiles" -> ((s, dir) => {
      val sharded = events(s, dir).withColumn("shard", pmod(col("user_id"), lit(8)))
      Intermediate.mergeQuantileRecords(
        Intermediate.toQuantileRecords(
          graft.relational.Temporal.partialQuantileState(sharded, "ts", "shard"),
          "value_quantiles_2p", "arn:aws:kinesis:ap-northeast-1:111122223333:stream/in"),
        "value_quantiles_2p", requiredVersion = Some(">=0.1.0"))
    }),
    // heavy-hitter counter through the SERIALIZED two-phase topology (the
    // second engine-extension counter type): per-shard user-count tables →
    // JSON intermediate records → parse + version gate → cross-shard
    // re-sum → per-window rank. Oracle = e07's SQL: the shard hop must be
    // invisible.
    "e11_twophase_hitters" -> ((s, dir) => {
      val sharded = events(s, dir).withColumn("shard", pmod(col("user_id"), lit(8)))
      Intermediate.mergeHitterRecords(
        Intermediate.toHitterRecords(
          graft.relational.Temporal.partialHitterState(sharded, "ts", "shard"),
          "heavy_hitters_2p", "arn:aws:kinesis:ap-northeast-1:111122223333:stream/in"),
        "heavy_hitters_2p", requiredVersion = Some(">=0.1.0"))
    }),
    // Q17 shape: correlated scalar aggregate decorrelated — per-part avg
    // via (sum, count) join-back, integer cross-multiplied threshold
    "h14_small_qty_revenue" -> ((s, dir) =>
      graft.relational.Relational.smallQuantityRevenue(
        Tables.part(s, dir), Tables.lineitem(s, dir))),

    // ---- text analysis (training-data pipeline ops) ----
    "t01_token_count" -> ((s, dir) =>
      TextAnalysis.tokenCounts(Tables.documents(s, dir))),
    "t02_quality_score" -> ((s, dir) =>
      TextAnalysis.qualityScore(Tables.documents(s, dir))),
    "t03_lang_id" -> ((s, dir) =>
      TextAnalysis.languageId(Tables.documents(s, dir))),
    "t04_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(Tables.documents(s, dir))),
    // winnowing fingerprint sets (Schleimer et al., SIGMOD'03)
    "t05_winnow" -> ((s, dir) =>
      TextAnalysis.winnow(Tables.documents(s, dir))),
    // vocabulary building: global token top-k (tokenizer-training precursor)
    "t06_vocab" -> ((s, dir) =>
      TextAnalysis.vocabulary(Tables.documents(s, dir))),
    // TF-IDF top-k terms per doc (integer-exact idf, per-doc window top-k)
    "t07_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(Tables.documents(s, dir))),
    // Gopher-style repetition/quality signals (dup words, top-bigram mass)
    "t08_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(Tables.documents(s, dir))),
    // deterministic hash-based stratified sampling (reproducible data mix)
    "t09_sample" -> ((s, dir) =>
      TextAnalysis.stratifiedSample(Tables.documents(s, dir), SampleRates)),
    // data-mixture accounting per (lang, source) stratum
    "t10_mixture" -> ((s, dir) =>
      TextAnalysis.mixtureReport(Tables.documents(s, dir))),
    // fixed-size token chunking (sequence packing / context-window prep)
    "t11_chunks" -> ((s, dir) =>
      TextAnalysis.chunk(Tables.documents(s, dir))),
    // rollup subtotals in one Expand+aggregate pass (grouping-sets surface)
    "t12_mixture_rollup" -> ((s, dir) =>
      TextAnalysis.mixtureRollup(Tables.documents(s, dir))),
    // exact per-lang length quantiles via histogram + cumulative window
    "t13_length_quantiles" -> ((s, dir) =>
      TextAnalysis.lengthQuantiles(Tables.documents(s, dir))),
    // token-frequency spectrum (Zipf / corpus-health): two stacked aggs
    "t14_token_spectrum" -> ((s, dir) =>
      TextAnalysis.tokenSpectrum(Tables.documents(s, dir))),
    // PII scrubbing: count + redact emails / IPv4s / long digit runs in
    // one codegen'd scan. The corpus is synthetic word-soup with no PII,
    // so the carrier text is constructed from customer fields — the
    // construction is part of the query and fully deterministic.
    "t15_pii_scrub" -> ((s, dir) =>
      TextAnalysis.piiScrub(
        Tables.customer(s, dir).select(col("c_custkey").as("custkey"),
          concat(
            col("c_name"), lit(" <customer"), col("c_custkey"),
            lit("@shop.example.com> ip 10."), pmod(col("c_custkey"), lit(250)),
            lit(".0."), col("c_nationkey"), lit(" acct "),
            col("c_custkey") * 1009 + 1000000).as("contact")),
        "custkey", "contact")),

    // composite quality gate: per-rule fail flags + pass verdict in ONE
    // narrow scan — the filter step the scoring ops feed
    "t16_quality_gate" -> ((s, dir) =>
      TextAnalysis.qualityGate(Tables.documents(s, dir))),
    // bigram novelty: ppm of a doc's distinct bigrams appearing in no
    // other doc — corpus-wide boilerplate/memorization signal
    "t17_bigram_novelty" -> ((s, dir) =>
      TextAnalysis.bigramNovelty(Tables.documents(s, dir))),
    // deterministic stratified train/val/test split: membership is a pure
    // hash of doc_id (no shuffle decides it), accounting per stratum
    "t18_train_split" -> ((s, dir) =>
      TextAnalysis.trainValTestSplit(Tables.documents(s, dir))),
    // token-budget shard packing: contiguous ≈50k-token shards, boundary
    // never splits a doc; per-shard accounting
    "t19_shard_packing" -> ((s, dir) =>
      TextAnalysis.shardPacking(Tables.documents(s, dir))),
    // BM25 ranked retrieval: literal query, integer fixed-point scoring,
    // one-row broadcast stats, TakeOrderedAndProject top-k
    "t20_bm25" -> ((s, dir) =>
      TextAnalysis.bm25TopK(Tables.documents(s, dir), Bm25Query)),
    // C4-style boilerplate scrub: corpus-frequent chunks removed from
    // every doc, survivors rejoined in order; digest-only count shuffle
    "t21_boilerplate" -> ((s, dir) =>
      TextAnalysis.boilerplateScrub(Tables.documents(s, dir))),
    // temperature-reweighted mixture sampling (α=0.5): integer-ppm rates
    // sized to a half-corpus budget, deterministic md5 Bernoulli draws
    "t22_temperature_sample" -> ((s, dir) =>
      TextAnalysis.temperatureSample(Tables.documents(s, dir))),
    // first-round BPE pair statistics over the distinct vocabulary
    "t23_bpe_pairs" -> ((s, dir) =>
      TextAnalysis.bpePairStats(Tables.documents(s, dir))),
    // DSIR importance scores: floor-log2-quantized hashed-bigram
    // likelihood ratios against the en slice as the target distribution
    "t24_dsir_score" -> ((s, dir) =>
      TextAnalysis.dsirScore(Tables.documents(s, dir))),
    // CCNet-style bigram-LM perplexity proxy: quantized -log2 p(w2|w1)
    // per transition, digest-only count-table joins
    "t25_lm_perplexity" -> ((s, dir) =>
      TextAnalysis.lmPerplexity(Tables.documents(s, dir))),
    // the Gopher rule battery (word count / mean word length / alpha
    // fraction / distinct stopwords) as one shuffle-free projection
    "t26_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(Tables.documents(s, dir))),
    // OOV rate vs the corpus top-1000 vocabulary: broadcast vocab join,
    // only (doc_id, counts) shuffle — the tokenizer-health read
    "t27_oov_rate" -> ((s, dir) =>
      TextAnalysis.oovRate(Tables.documents(s, dir))),
    // the CCNet/C4 filter chain end-to-end: langid agreement + Gopher
    // rules + LM-perplexity band, one keep verdict per doc
    "t28_ccnet_pipeline" -> ((s, dir) =>
      TextAnalysis.ccnetPipeline(Tables.documents(s, dir))),
    // the MODERN pipeline in one call (v2): LSH near-dup dedup with the
    // QUALITY keeper -> benchmark decontamination -> CCNet verdict ->
    // per-(lang, source) survivor accounting
    "t38_training_pipeline_v2" -> ((s, dir) =>
      graft.pipeline.TrainingData.runV2(Tables.documents(s, dir))),
    // v3, the WEB-CORPUS composition: URL dedup (d25's raw-variant
    // formula) → exact content dedup → Gopher gate, reported per host
    // with the host-graph PageRank prior joined on — the round-9 ops
    // (UrlOps, GraphOps) composing with the dedup/quality stages
    "t46_training_pipeline_v3" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val res = expr("doc_id div 4")
      val variant = col("doc_id") % 4
      val raw = concat(
        when(variant === 0, lit("HTTPS://WWW.")).otherwise(lit("https://")),
        lit("site"), res % 5, lit(".example.com"),
        when(variant === 1, lit(":443")).otherwise(lit("")),
        when(variant === 0, lit("//page//")).otherwise(lit("/page/")),
        res,
        when(variant === 2, lit("/")).otherwise(lit("")),
        when(variant === 0, lit("?utm_source=feed&fbclid=x")).otherwise(lit("")),
        when(variant === 3, lit("#frag")).otherwise(lit("")))
      def site(c: org.apache.spark.sql.Column) =
        concat(lit("site"), c.cast("string"), lit(".example.com"))
      val ks = d.select((res % 5).as("k")).distinct()
      val he = ks.select(site(col("k")).as("src"),
          site((col("k") * 2 + 1) % 5).as("dst"))
        .unionAll(ks.select(site(col("k")).as("src"),
          site((col("k") * col("k") + 1) % 5).as("dst")))
        .distinct()
      graft.pipeline.TrainingData.runV3(d, raw, he)
    }),
    // the whole training-data pipeline in ONE call: exact dedup -> CCNet
    // filter -> stratified sample -> token-budget shard packing; output
    // is the packed set's per-shard accounting
    "t29_training_pipeline" -> ((s, dir) =>
      graft.pipeline.TrainingData.run(Tables.documents(s, dir), budget = 2000L)),
    // vocab coverage curve: token-occurrence ppm covered by top-k
    // vocabularies — the vocab-size design read, one corpus aggregate
    "t31_vocab_coverage" -> ((s, dir) =>
      TextAnalysis.vocabCoverage(Tables.documents(s, dir))),
    // Naive-Bayes hashed-bag-of-words classifier (the fastText-style
    // quality/domain classifier, trained AND scored in-engine): dense
    // label×bucket weight table broadcast, integer-bits scores,
    // max(struct) argmax — raw text never shuffles. On THIS fixture the
    // text vocabulary is shared across langs, so the majority prior
    // correctly dominates (the oracle checks the exact math; the
    // discrimination path is asserted on label-dependent vocab in
    // ExtensionOpsSpec).
    "t32_nb_classifier" -> ((s, dir) =>
      TextAnalysis.nbClassifier(Tables.documents(s, dir))),
    // broadcast-model STREAM scoring: DSIR lambda trained batch-side,
    // shipped into the stream as a literal — scoring is a stateless
    // projection whose rows must hash-match the batch operator exactly
    "t30_stream_dsir_parity" -> ((s, dir) => {
      val lam = TextAnalysis.dsirLambda(Tables.documents(s, dir))
      val out = graft.streaming.StreamingText.dsirScoreStream(
        Tables.documentsStream(s, dir), lam)
      val sink = "t30_stream_dsir_sink"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
    }),
    // Unicode scrub: the pre-tokenization cleanup pass (invisible code
    // points, NBSP family, control chars, whitespace collapse) — one
    // codegen'd regexp chain, no shuffle. The fixture corpus is already
    // clean ([a-z0-9 ]), so changed=0 everywhere — the oracle checks the
    // pass-through exactness; dirty-input semantics live in the spec
    "t37_unicode_scrub" -> ((s, dir) =>
      TextAnalysis.unicodeScrub(Tables.documents(s, dir))),
    // NFC normalization on a DECOMPOSED fixture: every doc gets a suffix
    // with e + COMBINING ACUTE (composes to é under NFC) and the fi
    // ligature U+FB01 (untouched by NFC — that's NFKC's compatibility
    // fold, spec-asserted). Partition-local batched java.text.Normalizer
    // transform — no ScalaUDF at the Column level, text never shuffles;
    // DuckDB's nfc_normalize is the oracle
    // C4's blocklist gate: any doc containing a blocklisted token drops —
    // the coarse content filter before the quality battery; blocklist
    // folds into codegen as one literal array, shuffle-free projection
    "t40_blocklist_gate" -> ((s, dir) =>
      TextAnalysis.blocklistGate(Tables.documents(s, dir),
        Seq("dup", "spam", "scan"))),
    // URL canonicalization + registrable-domain rollup (UrlOps): the
    // web-corpus stage before any text analysis. URLs are CONSTRUCTED
    // per doc (the corpus carries none) to exercise every normalization:
    // case, www, default vs explicit port, duplicate slashes, trailing
    // slash, utm/tracking params, unsorted query, fragment; the oracle
    // derives the canonical form analytically. try_parse_url kernels,
    // one map-side-combined groupBy — no UDF, text never read
    // BPE merge TRAINING (not just t23's first-round pair stats): 4
    // learn iterations, each a vocab-bounded pair count + 1-row argmax
    // collect + one literal-replace merge apply — the oracle replays the
    // same 4 rounds as chained CTEs over the identical double-space
    // token-string representation
    "t42_bpe_train" -> ((s, dir) =>
      TextAnalysis.bpeTrain(Tables.documents(s, dir), merges = 4)),
    // the learned merges APPLIED: per-doc word / base-token / BPE-token
    // counts under the 4 trained merges — one corpus scan, the merge
    // table folded in as literal replaces
    "t43_bpe_encode" -> ((s, dir) =>
      TextAnalysis.bpeEncode(Tables.documents(s, dir), merges = 4)),
    // BM25 retrieval over a literal 3-query workload: integer-exact
    // scoring (rational idf surrogate + DECIMAL-exact saturation term),
    // query terms folded into the scan as ONE isin filter
    "t44_bm25" -> ((s, dir) =>
      TextAnalysis.bm25Batch(Tables.documents(s, dir), Bm25Queries)),
    // exact-k stratified carve: min(k, |stratum|) docs per (lang,
    // source) by the shared md5 sampling coordinate — the eval-set
    // shape Bernoulli rates can't hit exactly
    "t45_budget_sample" -> ((s, dir) =>
      TextAnalysis.budgetSample(Tables.documents(s, dir))),
    "t41_url_profile" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val tld = element_at(
        array(lit("com"), lit("org"), lit("co.uk")),
        (col("doc_id") % 3 + 1).cast("int"))
      val raw = concat(
        lit("HTTPS://"),
        when(col("doc_id") % 2 === 0, lit("WWW.")).otherwise(lit("")),
        upper(col("source")), lit(".Example."), tld,
        when(col("doc_id") % 5 === 0, lit(":443"))
          .otherwise(when(col("doc_id") % 5 === 1, lit(":8443")).otherwise(lit(""))),
        lit("//docs//"), col("doc_id").cast("string"),
        when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=feed&z=9&a="), (col("doc_id") % 7).cast("string"),
        lit("&m=2#sec"))
      val host = UrlOps.hostOf(raw)
      d.groupBy(
          UrlOps.registrableDomain(host).as("domain"), host.as("host"))
        .agg(count(lit(1)).as("n_docs"),
          min(UrlOps.canonicalizeUrl(raw)).as("url_min"))
    }),
    "t39_nfc_normalize" -> ((s, dir) =>
      TextAnalysis.nfcNormalize(
        Tables.documents(s, dir).select(col("doc_id"),
          // decomposed: U+0065 U+0301 (e + combining acute) composes under
          // NFC; U+FB01 (fi ligature) is NFKC-only and must pass through
          concat(col("text"), lit(" caf" + "e\u0301 \uFB01n")).as("text")))),
    // CCNet head/middle/tail split: per-lang exact perplexity terciles
    // over the t25 scores — histogram quantiles, broadcast cutoffs
    "t36_ccnet_buckets" -> ((s, dir) =>
      TextAnalysis.ccnetBuckets(Tables.documents(s, dir))),
    // per-source distribution drift: quantized-KL token-distribution
    // divergence vs the whole corpus — digest-only map-side aggregates,
    // broadcast slice totals (the distribution-level twin of d21)
    "t35_source_divergence" -> ((s, dir) =>
      TextAnalysis.sourceDivergence(Tables.documents(s, dir))),
    // the classifier's measured gate: confusion matrix + per-truth-row
    // ppm shares — labels²-bounded output, AQE-sized joins
    "t34_nb_confusion" -> ((s, dir) =>
      TextAnalysis.nbConfusion(Tables.documents(s, dir))),
    // the NB classifier's streaming face: model trained batch-side
    // (labels + priors + dense flattened weights as literal arrays),
    // scoring a stateless stream projection — one transform hashes
    // tokens to buckets, one aggregate folds the per-label score vector,
    // argmax ties to the greater label exactly like the batch scorer
    "t33_stream_nb_parity" -> ((s, dir) => {
      val model = TextAnalysis.nbModel(Tables.documents(s, dir))
      val out = graft.streaming.StreamingText.nbScoreStream(
        Tables.documentsStream(s, dir), model)
      val sink = "t33_stream_nb_sink"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
    }),

    // ---- deduplication ----
    "d01_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(Tables.documents(s, dir))),
    "d02_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(Tables.documents(s, dir))),
    "d03_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir))),
    "d04_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir))),
    "d05_embed_neardup" -> ((s, dir) =>
      Dedup.cosineNearDupPairs(Tables.embeddings(s, dir))),
    // cross-split n-gram leakage matrix: shared distinct 3-grams between
    // every ordered split pair + the share of a's grams leaked — the QA
    // read on t18's content-independent hash split (doc-disjoint but not
    // gram-disjoint); digest-only shuffles, ≤3 rows per digest key
    "d23_split_leakage" -> ((s, dir) =>
      Dedup.splitLeakage(Tables.documents(s, dir))),
    // exact substring dedup's APPLY step (Lee et al. 2022): tokens under
    // any corpus-wide ≥3× word-5-gram are masked; docs re-emit scrubbed
    "d24_span_scrub" -> ((s, dir) =>
      Dedup.spanScrub(Tables.documents(s, dir))),
    // URL-level dedup: four raw variants per resource (www+dup-slash+utm,
    // explicit default port, trailing slash, fragment) all canonicalize
    // to ONE url; keep = min doc_id. The oracle derives the canonical
    // form analytically from the same doc_id formula (t41 convention)
    "d25_url_dedup" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val res = expr("doc_id div 4")
      val variant = col("doc_id") % 4
      val raw = concat(
        when(variant === 0, lit("HTTPS://WWW.")).otherwise(lit("https://")),
        lit("site"), res % 5, lit(".example.com"),
        when(variant === 1, lit(":443")).otherwise(lit("")),
        when(variant === 0, lit("//page//")).otherwise(lit("/page/")),
        res,
        when(variant === 2, lit("/")).otherwise(lit("")),
        when(variant === 0, lit("?utm_source=feed&fbclid=x")).otherwise(lit("")),
        when(variant === 3, lit("#frag")).otherwise(lit("")))
      Dedup.urlDedup(d, raw)
    }),
    // Bloom seen-set membership (the incremental-crawl d11 at fixed
    // memory): even docs' URLs build the filter, odd docs' URLs probe it
    // (mod 301 keeps both parities on every residue, so the overlap is
    // real). Exact member/probe counts hash-compare; the Bloom's
    // zero-false-negative theorem and measured FP budget are the gate
    "d26_bloom_seen" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val url = concat(lit("https://ex.com/p"),
        (col("doc_id") % 301).cast("string")).as("key")
      Dedup.bloomMembership(
        d.where(col("doc_id") % 2 === 0).select(url),
        d.where(col("doc_id") % 2 === 1).select(url))
    }),
    // pair list → duplicate clusters (keeper = min doc_id per component)
    "d06_dup_clusters" -> ((s, dir) =>
      Dedup.connectedComponents(
        Dedup.minhashLshPairs(Tables.documents(s, dir)).select(col("a"), col("b")))),
    // embedding near-dup at SCALE: sign-LSH bucket equi-join candidates +
    // exact cosine verify (the sub-quadratic substitute for d05). 4 planes
    // because this corpus's "near" is θ≈69° (max cosine ≈ 0.5) — per-plane
    // agreement 0.62, so 4 planes ≈ 15% per-table recall; production stacks
    // tables/planes per its own similarity floor
    "d07_lsh_neardup" -> ((s, dir) =>
      Dedup.lshNearDupPairs(Tables.embeddings(s, dir), tau = 0.35, nPlanes = 4)),
    // benchmark contamination: corpus docs sharing a word k-gram with the
    // (broadcast) benchmark subset
    "d08_contamination" -> ((s, dir) =>
      Dedup.contamination(Tables.documents(s, dir), col("doc_id") % 25 === 0, k = 3)),
    // decontamination APPLIED: contaminated docs and the benchmark slice
    // itself drop; one AQE-sized anti-join against the contaminated set
    "d19_decontaminate_apply" -> ((s, dir) =>
      Dedup.applyDecontamination(
        Tables.documents(s, dir), col("doc_id") % 25 === 0, k = 3)),
    // the full dedup story applied: pairs → clusters → surviving corpus
    "d09_dedup_apply" -> ((s, dir) =>
      Dedup.applyDedup(
        Tables.documents(s, dir),
        Dedup.minhashLshPairs(Tables.documents(s, dir)).select(col("a"), col("b")))),
    // dedup apply with the QUALITY keeper policy: inside each duplicate
    // cluster the highest-quality member survives (ties → smaller id),
    // not the smallest id — what production pipelines actually keep
    "d22_quality_dedup_apply" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.applyDedupByQuality(
        docs,
        Dedup.minhashLshPairs(docs).select(col("a"), col("b")),
        TextAnalysis.qualityScore(docs).select(col("doc_id"), col("quality_ppm")))
    }),
    // snapshot delta by content digest (set-operation surface): docs in
    // the even-id snapshot whose content the odd-id snapshot lacks
    "d11_snapshot_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.snapshotDiff(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1))
    }),
    // asymmetric containment (the subset-duplication signal Jaccard
    // misses): either direction ≥ 0.8 of the smaller side's grams
    "d12_containment" -> ((s, dir) =>
      Dedup.containmentPairs(Tables.documents(s, dir))),
    // multi-table LSH (OR-construction): the recall lever over d07 — 3
    // independent plane families, candidate if ANY table collides; pairs
    // dedup'd before the single cosine verify
    "d10_lsh_multitable" -> ((s, dir) =>
      Dedup.lshNearDupPairsMulti(Tables.embeddings(s, dir),
        tau = 0.35, nPlanes = 4, tables = 3)),
    // chunk-level exact dedup (C4/RefinedWeb line dedup at this corpus's
    // chunk granularity): first occurrence survives, per-doc accounting
    "d13_chunk_dedup" -> ((s, dir) =>
      Dedup.chunkDedupStats(Tables.documents(s, dir))),
    // verbatim shared-substring runs (the suffix-array substring-dedup
    // signal as a distributed k-gram diagonal join): maximal ≥12-token
    // spans shared between doc pairs, digest-only shuffles
    "d17_substring_runs" -> ((s, dir) =>
      Dedup.substringRuns(Tables.documents(s, dir))),
    // MinHash estimate vs exact Jaccard per candidate pair — the
    // parameter-calibration gate; exact pass is candidate-bounded
    "d18_minhash_calibration" -> ((s, dir) =>
      Dedup.minhashCalibration(Tables.documents(s, dir))),
    // within-doc repeated spans (the self-diagonal of d17): longest
    // internal repeat + repeat count per doc — the copy-paste signal
    "d20_self_repeats" -> ((s, dir) =>
      Dedup.selfRepeats(Tables.documents(s, dir), k = 2, minTokens = 3)),
    // corpus-overlap matrix: MinHash-estimated Jaccard between the
    // distinct-shingle sets of corpus SOURCES — min commutes with set
    // union, so each slice signature is ONE map-side-combinable
    // aggregate; nothing but (slice, digest) pairs ever shuffles
    "d21_corpus_overlap" -> ((s, dir) =>
      Dedup.corpusOverlap(Tables.documents(s, dir))),
    // ingest-time exact dedup, oracle-checked: a horizon wider than the
    // dataset makes within-watermark dedup ≡ global DISTINCT, and keying
    // the OUTPUT by content digest (not row identity) makes the result
    // independent of which arrival won the first-occurrence race
    "d14_stream_dedup_parity" -> ((s, dir) => {
      val deduped = graft.streaming.StreamingDedup.dropExactDuplicates(
        Tables.eventsStream(s, dir), "ts", "props", watermarkDelay = "3650 days")
      // null-props rows pass through dedup untouched by design; the oracle
      // excludes them (WHERE props IS NOT NULL), so exclude them here too —
      // parity must not depend on the fixture having no null props
      val out = deduped.where(col("props").isNotNull)
        .select(md5(col("props").cast("binary")).as("content_md5"))
      val sink = "d14_stream_dedup_sink"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
    }),

    // ingest-time URL-level dedup (the live crawl frontier's first
    // stage): d25's raw fetch variants arrive as a stream, canonicalize,
    // first arrival per canonical URL survives — the surviving URL SET
    // is arrival-independent and ≡ batch DISTINCT canonical urls
    "d27_stream_url_dedup" -> ((s, dir) => {
      val stream = Tables.documentsStream(s, dir)
        .withColumn("ts", timestamp_micros(col("doc_id") + lit(86400000000L)))
      val res = expr("doc_id div 4")
      val variant = col("doc_id") % 4
      val raw = concat(
        when(variant === 0, lit("HTTPS://WWW.")).otherwise(lit("https://")),
        lit("site"), res % 5, lit(".example.com"),
        when(variant === 1, lit(":443")).otherwise(lit("")),
        when(variant === 0, lit("//page//")).otherwise(lit("/page/")),
        res,
        when(variant === 2, lit("/")).otherwise(lit("")),
        when(variant === 0, lit("?utm_source=feed&fbclid=x")).otherwise(lit("")),
        when(variant === 3, lit("#frag")).otherwise(lit("")))
      val out = graft.streaming.StreamingDedup.dropSeenUrls(
          stream, "ts", raw, watermarkDelay = "3650 days")
        .select(col("__url").as("url"))
      val sink = "d27_stream_url_sink"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
    }),

    // ingest-time NEAR-dup suppression, oracle-checked the same way:
    // horizon ≥ dataset ⇒ exactly one keeper per sign-LSH bucket, so the
    // recomputed bucket ids of the survivors ≡ the distinct bucket set
    // (which doc won each bucket is arrival-dependent; the bucket set
    // is not)
    "d15_stream_neardup_parity" -> ((s, dir) => {
      val stream = Tables.embeddingsStream(s, dir)
        .withColumn("ts", timestamp_micros(col("vec_id")))
      val kept = graft.streaming.StreamingDedup.dropNearDuplicatesWithinWatermark(
        stream, "ts", "embedding", nPlanes = 8, watermarkDelay = "3650 days")
      val out = kept.select(graft.similarity.Ann.bucketExprOn(
        transform(col("embedding"), x => x.cast("double")), 8).as("bucket"))
      val sink = "d15_stream_neardup_sink"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
    }),

    // near-dup suppression v2, oracle-checked: multi-band transformWithState
    // state (one ListState per (table, bucket) — the batch equi-join key)
    // with an EXACT-cosine verify against each colliding earlier document.
    // Horizon ≥ dataset ⇒ the verified-match set ≡ the batch multi-table
    // pair set (d10), so the anti-joined survivors are deterministic —
    // unlike d15, which docs win is NOT arrival-dependent here, because
    // only genuine cosine-near-dups (vs the EARLIER doc by (ts, id)) drop
    "d16_stream_neardup_verified" -> ((s, dir) => withStatePartitions(s, 8) {
      withConf(s, "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
        // +1 day: an event time EQUAL to the initial watermark (epoch 0)
        // is filtered as late by transformWithState's strict > check —
        // unlike dropDuplicatesWithinWatermark's — and vec_id 0 would
        // silently never register
        val stream = Tables.embeddingsStream(s, dir)
          .withColumn("ts", timestamp_micros(col("vec_id") + lit(86400000000L)))
        val flags = graft.streaming.StreamingDedup.nearDupBandFlags(
          stream, "ts", "embedding", watermarkDelay = "3650 days")
        val sink = "d16_stream_neardup_sink"
        val q = flags.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        val dropped = s.table(sink).where(col("matched_id").isNotNull)
          .select(col("vec_id")).distinct()
        Tables.embeddings(s, dir)
          .join(dropped, Seq("vec_id"), "left_anti")
          .select(col("vec_id"))
      }
    }),

    // ---- similarity search ----
    "s01_ann_topk" -> ((s, dir) =>
      Ann.bruteForceTopK(Tables.embeddings(s, dir), col("vec_id") % 50 === 0)),
    "s02_ann_ivf" -> ((s, dir) =>
      Ann.ivfTopK(Tables.embeddings(s, dir), col("vec_id") % 50 === 0)),
    // corpus-wide k-NN graph: multi-table sign-LSH candidates, exact
    // cosine rank per source doc — the graph-based-dedup input structure
    "s22_knn_graph" -> ((s, dir) =>
      Ann.knnGraph(Tables.embeddings(s, dir))),
    // MRR@5 of the IVF index vs the exact top-1 — recall's graded twin:
    // integer reciprocal-rank points, 0 on a miss
    "s23_mrr_eval" -> ((s, dir) =>
      Ann.mrrEval(Tables.embeddings(s, dir), col("vec_id") % 50 === 0)),
    // sign-LSH (random-hyperplane) bucketing — candidate generator at scale
    "s03_lsh_buckets" -> ((s, dir) =>
      Ann.signLshBuckets(Tables.embeddings(s, dir))),
    // shuffle-exact per-label centroid accumulation (k-means building block)
    "s04_centroid_sums" -> ((s, dir) =>
      Ann.centroidSums(Tables.embeddings(s, dir))),
    // distributed k-means (2 Lloyd iterations), engine-exact via
    // scaled-integer centroid updates — the ITERATIVE path oracle-checked
    "s05_kmeans" -> ((s, dir) =>
      Ann.kmeansCentroids(Tables.embeddings(s, dir))),
    // product-quantization codes: 8×8-dim subspaces, nearest codebook
    // entry per subspace via broadcast join + map-side min_by
    "s06_pq_codes" -> ((s, dir) =>
      Ann.pqCodes(Tables.embeddings(s, dir))),
    // PQ codebook TRAINING: 2 per-subspace Lloyd rounds, all subspaces
    // in ONE keyed shuffle per round, integer-ppm centroid updates —
    // the oracle replays both rounds as chained CTEs
    "s20_pq_train" -> ((s, dir) =>
      Ann.pqTrain(Tables.embeddings(s, dir))),
    // train → encode closed: assignment counts + floor-ppm integer
    // quantization error per (subspace, cell) under the TRAINED codebook
    "s21_pq_train_encode" -> ((s, dir) =>
      Ann.pqTrainEncode(Tables.embeddings(s, dir))),
    // recall@k eval: IVF result graded against the exact top-k — the
    // accept/reject gate for any approximate index
    // IVF tuning curve: recall@5 vs brute-force truth for nprobe 1/2/4 —
    // truth computes once (localCheckpoint), each point probe-bounded
    "s17_ivf_tuning" -> ((s, dir) =>
      Ann.ivfTuningCurve(Tables.embeddings(s, dir), col("vec_id") % 50 === 0)),
    // embedding-table health: per-dim count/NaN/scaled sum/min/max — the
    // dead-dim / NaN / unnormalized-slice read before any index builds;
    // scaled-integer stats so the oracle hash-matches exactly
    "s19_embedding_health" -> ((s, dir) =>
      Ann.embeddingHealth(Tables.embeddings(s, dir))),
    "s07_recall_eval" -> ((s, dir) =>
      Ann.recallAtK(
        Ann.bruteForceTopK(Tables.embeddings(s, dir), col("vec_id") % 50 === 0),
        Ann.ivfTopK(Tables.embeddings(s, dir), col("vec_id") % 50 === 0))),
    // hybrid retrieval: BM25 sparse top-20 + dense cosine top-20 for one
    // query, fused by reciprocal-rank (integer points, rank-only — the
    // two systems' score scales never touch); each system's top-k does
    // the scalable work upstream, the fusion ranks ≤ 40 rows
    "s18_hybrid_rrf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dense = Ann.bruteForceTopK(
          Tables.embeddings(s, dir), col("vec_id") === 0, k = 20)
        .select(col("neighbor_id").as("id"), col("rank"))
      val sparse = TextAnalysis.bm25TopK(
          Tables.documents(s, dir), Bm25Query, k = 20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score_m").desc, col("doc_id").asc)).cast("long"))
        .select(col("doc_id").as("id"), col("rank"))
      Ann.rrfFuse(Seq(dense, sparse), k = 10)
    }),
    // IVF-PQ ADC search: probed cells scored from 8-byte PQ codes via
    // per-query flattened lookup tables — the production index shape
    "s08_ivfpq_search" -> ((s, dir) =>
      Ann.ivfPqTopK(Tables.embeddings(s, dir), col("vec_id") % 50 === 0)),
    // k-means with deterministic k-means|| seeding (md5-Bernoulli
    // oversampling, integer cost/threshold math) + 2 Lloyd iterations —
    // the whole init→weight→reduce→train pipeline is engine-exact
    "s09_kmeans_pp" -> ((s, dir) =>
      Ann.kmeansParallel(Tables.embeddings(s, dir))),
    // SQ8 scalar-quantization codes: per-dim (min, max) train agg collected
    // driver-local, encode as a shuffle-free literal-array projection
    "s11_sq8_codes" -> ((s, dir) =>
      Ann.sq8Codes(Tables.embeddings(s, dir))),
    // SQ8 symmetric search: integer code-space L2² — exact scores, no
    // float-order rank caveats; queries broadcast, corpus streams
    "s12_sq8_search" -> ((s, dir) =>
      Ann.sq8TopK(Tables.embeddings(s, dir), col("vec_id") % 50 === 0)),
    // SemDeDup: cluster-bounded semantic dedup — shuffle-free assignment
    // to k deterministic seed centroids, greedy keep-first cosine prune
    // inside each cell (equi-join on cell, never n²), anti-join survivors
    "s10_semdedup" -> ((s, dir) =>
      Ann.semDedupSurvivors(Tables.embeddings(s, dir))),
    // two-stage refine (faiss IndexRefineFlat shape): IVF-PQ shortlist of
    // 20 from 8-byte codes, exact-cosine re-rank to top-5 — candidates
    // broadcast into the corpus scan, raw vectors never shuffle
    "s13_ivfpq_rerank" -> ((s, dir) =>
      Ann.ivfPqRerankTopK(Tables.embeddings(s, dir), col("vec_id") % 50 === 0)),
    // metadata-filtered exact search (vector-DB filtered search,
    // PRE-filter): neighbors must be lang='en' docs; ids-only semi-join
    "s14_filtered_ann" -> ((s, dir) =>
      Ann.filteredTopK(Tables.embeddings(s, dir), Tables.documents(s, dir),
        col("vec_id") % 50 === 0, col("lang") === "en")),
    // exact MIPS top-k: dot-product ranking (the dual-encoder score),
    // left-to-right summation so order reproduces cross-engine
    "s15_mips_topk" -> ((s, dir) =>
      Ann.mipsTopK(Tables.embeddings(s, dir), col("vec_id") % 50 === 0)),
    // recall eval for the REFINE path: the measured proof that the
    // exact-cosine re-rank recovers brute-force recall from ADC codes
    "s16_refine_recall" -> ((s, dir) =>
      Ann.recallAtK(
        Ann.bruteForceTopK(Tables.embeddings(s, dir), col("vec_id") % 50 === 0),
        Ann.ivfPqRerankTopK(Tables.embeddings(s, dir), col("vec_id") % 50 === 0))),

    // ---- multimodal columns ----
    "m01_media_meta" -> ((s, dir) =>
      Multimodal.extractMeta(Multimodal.asMedia(Tables.documents(s, dir))).toDF()),
    "m02_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.asMedia(Tables.documents(s, dir))).toDF()),
    // resize plumbing: binary in → binary out, 1→1, partition-local
    "m03_resize" -> ((s, dir) =>
      Multimodal.resize(Multimodal.asMedia(Tables.documents(s, dir)))
        .select(col("doc_id"), col("n_bytes"), md5(col("media")).as("media_md5"))),
    // media near-dup signal: frames shared across documents
    "m04_shared_frames" -> ((s, dir) =>
      Multimodal.sharedFrames(Multimodal.asMedia(Tables.documents(s, dir)))),
    // media near-dup clusters: shared-frame star edges → the same
    // connected-components path as text near-dups
    "m05_media_clusters" -> ((s, dir) =>
      Multimodal.mediaDupClusters(Multimodal.asMedia(Tables.documents(s, dir)))),
    // media dedup APPLIED: clusters → keeper per component → surviving
    // docs via left-anti join (the multimodal mirror of d09)
    "m06_media_dedup_apply" -> ((s, dir) =>
      Multimodal.applyMediaDedup(Multimodal.asMedia(Tables.documents(s, dir)))),
    // perceptual near-dup: aHash frames + pigeonhole Hamming join —
    // catches near-identical frames where m04's exact digests can't
    "m07_perceptual_pairs" -> ((s, dir) =>
      Multimodal.perceptualDupPairs(Multimodal.asMedia(Tables.documents(s, dir)))),
    // REAL image decode end-to-end: per doc a deterministic grayscale PNG
    // (dims and pixel values are formulas of doc_id) goes through the
    // JRE's actual PNG encoder, then ImageIoCodec's actual decoder —
    // recovered dims and the luma aHash must match the oracle computing
    // the same formulas in pure SQL. Encode is fixture; decode is the
    // tested path (real pixels, not StubCodec fakes).
    "m08_imageio_decode" -> ((s, dir) => {
      import s.implicits._
      val pngs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val w = (id % 13 + 8).toInt
          val h = (id % 7 + 8).toInt
          (id, Multimodal.syntheticGrayPng(w, h,
            (x, y) => (((id * 31 + y.toLong * w + x) * 17) % 256).toInt))
        }).toDF("doc_id", "media").withColumn("media_type", lit("image"))
      Multimodal.decodeImages(pngs).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("ahash"))
    }),

    // REAL image resize: the m08 formula PNGs through the explicit
    // nearest-neighbor raster mapping (src(x·sw/dw, y·sh/dh)) to 8×6 gray
    // PNGs — the luma-sum checksum is RE-DECODED from the resized bytes,
    // and the oracle recomputes the identical integer mapping in SQL
    "m13_resize_real" -> ((s, dir) => {
      import s.implicits._
      val pngs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val w = (id % 13 + 8).toInt
          val h = (id % 7 + 8).toInt
          (id, Multimodal.syntheticGrayPng(w, h,
            (x, y) => (((id * 31 + y.toLong * w + x) * 17) % 256).toInt))
        }).toDF("doc_id", "media").withColumn("media_type", lit("image"))
      Multimodal.resizeImages(pngs, dw = 8, dh = 6).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("luma_sum"))
    }),

    // REAL multi-frame decode: per doc a deterministic animated grayscale
    // GIF ((id%3)+2 frames; dims and pixels are formulas of (doc_id,
    // frame, pixel)) goes through the JRE's real GIF sequence writer,
    // then the reader's frame index + per-frame luma aHash — the
    // video-shaped plumbing on actually-decoded rasters. Encode is
    // fixture; the decode path is what's tested.
    // ANIMATION-level near-dup through the REAL GIF decode path: docs in
    // one group (doc_id div 10) share 2 of 3 frames by formula, the third
    // is per-doc — same-group pairs land at Jaccard 0.5 (2 of 4 distinct
    // hashes), cross-group pairs share nothing. Group size is FIXED at 10
    // regardless of corpus scale, so output stays linear in docs.
    // TEMPORAL animation alignment: same-group GIFs share a 3-frame run
    // at DIFFERENT offsets (even ids at frames 1-3, odd at 0-2), so the
    // order-aware run detector must find every within-group pair with the
    // right start positions — the case m11's set-Jaccard cannot localize
    "m12_gif_run_align" -> ((s, dir) => {
      import s.implicits._
      val gifs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val g = id / 10
          def luma(seed: Long, i: Long): Int = {
            val t = seed % 65521L + i * 31L
            ((t * t % 65521L) % 256L).toInt
          }
          val off = (id % 2).toInt // 0: shared at frames 1..3; 1: at 0..2
          (id, Multimodal.syntheticGrayGif(8, 8, 5, (k, x, y) => {
            val i = y.toLong * 8 + x
            val j = k - (1 - off)
            if (j >= 0 && j < 3) luma(g * 997 + j * 101, i)
            else luma(id * 1000003L + k * 13 + 7, i)
          }))
        }).toDF("doc_id", "media").withColumn("media_type", lit("video"))
      Multimodal.animationRunPairs(Multimodal.decodeGifFrames(gifs).toDF())
    }),
    "m11_gif_neardup" -> ((s, dir) => {
      import s.implicits._
      val gifs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val g = id / 10
          // non-linear in the pixel index over a wide modulus: a LINEAR
          // formula mod 256 yields ≤256 distinct threshold patterns, and
          // the hash index join would go quadratic on those hot keys at
          // corpus scale — the mix below makes hashes ~unique per (g, k)
          def luma(seed: Long, i: Long): Int = {
            val t = seed % 65521L + i * 31L
            ((t * t % 65521L) % 256L).toInt
          }
          (id, Multimodal.syntheticGrayGif(8, 8, 3, (k, x, y) =>
            if (k < 2) luma(g * 997 + k * 101, y.toLong * 8 + x)
            else luma(id * 1000003L + 7, y.toLong * 8 + x)))
        }).toDF("doc_id", "media").withColumn("media_type", lit("video"))
      Multimodal.animationDupPairs(Multimodal.decodeGifFrames(gifs).toDF())
    }),
    "m10_gif_frames" -> ((s, dir) => {
      import s.implicits._
      val gifs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val w = (id % 9 + 8).toInt
          val h = (id % 5 + 8).toInt
          val n = (id % 3 + 2).toInt
          (id, Multimodal.syntheticGrayGif(w, h, n,
            (k, x, y) => (((id * 31 + k.toLong * 101 + y.toLong * w + x) * 17) % 256).toInt))
        }).toDF("doc_id", "media").withColumn("media_type", lit("video"))
      Multimodal.decodeGifFrames(gifs).toDF()
        .select(col("doc_id"), col("n_frames"), col("frame_idx"), col("ahash"))
    }),

    // REAL WAV decode (JRE javax.sound): deterministic 16-bit PCM fixtures
    // (rate/channels/length/samples all pure formulas of doc_id) written
    // through the real RIFF encoder, decoded back — header fields and the
    // amplitude-delta fingerprint must reproduce the formula exactly
    "m09_wav_decode" -> ((s, dir) => {
      import s.implicits._
      val wavs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val ns = (80 + id % 40).toInt
          val samples = Array.tabulate(ns)(i =>
            (((id * 37 + i) * 251) % 4096 - 2048).toInt)
          (id, Multimodal.syntheticPcmWav(
            (8000 + (id % 5) * 1000).toInt, (1 + id % 2).toInt, samples))
        }).toDF("doc_id", "media").withColumn("media_type", lit("audio"))
      Multimodal.decodeAudio(wavs).toDF()
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("n_samples"), col("fp"))
    }),

    // REAL audio resample to 4 kHz over the m09 WAV fixtures: rates
    // 8000..12000 downsample by the explicit nearest-neighbor index
    // formula, re-encode through the real RIFF writer, re-decode — the
    // header rate/count and the position-weighted sample checksum must
    // reproduce the oracle's replay of the same integer mapping
    "m15_audio_resample" -> ((s, dir) => {
      import s.implicits._
      val wavs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val ns = (80 + id % 40).toInt
          val samples = Array.tabulate(ns)(i =>
            (((id * 37 + i) * 251) % 4096 - 2048).toInt)
          (id, Multimodal.syntheticPcmWav(
            (8000 + (id % 5) * 1000).toInt, (1 + id % 2).toInt, samples))
        }).toDF("doc_id", "media").withColumn("media_type", lit("audio"))
      Multimodal.resampleAudio(wavs, dstRate = 4000).toDF()
        .select(col("doc_id"), col("dst_rate"), col("n_samples"), col("checksum"))
    }),

    // Windowed ZERO-CROSSING RATE over REAL decoded WAV — the
    // voiced/unvoiced read beside m14's energy gate. Every third
    // 16-sample stretch is a CONSTANT +500 (zero crossings), the rest is
    // the alternating-sign m09 formula (high ZCR), so the voiced verdict
    // genuinely splits; the oracle replays adjacent-sign changes and the
    // strict ppm gate from the formula
    "m16_audio_zcr" -> ((s, dir) => {
      import s.implicits._
      val wavs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val ns = (80 + id % 40).toInt
          val samples = Array.tabulate(ns)(i =>
            if ((i / 16) % 3 == 0) 500
            else ((((id * 37 + i) * 251) % 4096 - 2048) * (1 - 2 * (i % 2))).toInt)
          (id, Multimodal.syntheticPcmWav(
            (8000 + (id % 5) * 1000).toInt, (1 + id % 2).toInt, samples))
        }).toDF("doc_id", "media").withColumn("media_type", lit("audio"))
      Multimodal.audioZeroCrossings(wavs, windowSamples = 32,
          voicedMaxZcrPpm = 600000L).toDF()
        .select(col("doc_id"), col("win_idx"), col("n_samples"),
          col("crossings"), col("voiced"))
    }),

    // Windowed RMS-energy + silence detection over REAL decoded WAV — the
    // VAD/speech-prep read. The fixture embeds true silence: every third
    // 16-sample stretch is zeroed (i div 16 mod 3 == 0), the rest is the
    // m09 sample formula, so 32-sample analysis windows mix silent and
    // loud regions and the last window is partial (ns = 80 + id%40). The
    // oracle recomputes exact integer Σs² per window and the strict
    // mean-square gate from the same formula.
    "m14_audio_energy" -> ((s, dir) => {
      import s.implicits._
      val wavs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val ns = (80 + id % 40).toInt
          val samples = Array.tabulate(ns)(i =>
            if ((i / 16) % 3 == 0) 0
            else (((id * 37 + i) * 251) % 4096 - 2048).toInt)
          (id, Multimodal.syntheticPcmWav(
            (8000 + (id % 5) * 1000).toInt, (1 + id % 2).toInt, samples))
        }).toDF("doc_id", "media").withColumn("media_type", lit("audio"))
      Multimodal.audioEnergy(wavs, windowSamples = 32,
          silenceMeanSq = 1000000L).toDF()
        .select(col("doc_id"), col("win_idx"), col("n_samples"),
          col("energy"), col("silent"))
    }),

    // ---- host-graph centrality (web-corpus link structure) ----

    // Integer-exact PageRank over a synthetic host link graph: each doc
    // contributes two out-links between formula hosts (id%97 →
    // (7id+3)%97 and (13id+11)%97 — hosts ≪ docs, the real web-graph
    // shape; in production the edges come from UrlOps.hostOf over page/
    // out-link URL pairs). Three damped rounds at d = 0.85 ppm-exact; the
    // oracle replays the identical truncating-division formula as chained
    // CTEs, so every rank is bit-exact — no float convergence lore.
    "g01_host_pagerank" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      def host(c: org.apache.spark.sql.Column) =
        concat(lit("h"), c.cast("string"))
      val e1 = docs.select(host(col("doc_id") % 97).as("src"),
        host((col("doc_id") * 7 + 3) % 97).as("dst"))
      val e2 = docs.select(host(col("doc_id") % 97).as("src"),
        host((col("doc_id") * 13 + 11) % 97).as("dst"))
      GraphOps.pageRank(e1.unionAll(e2).distinct(), iterations = 3)
    }),

    // Integer-exact HITS over the same host graph: two rounds of
    // hub→authority→hub mass passing, each half-round normalized to
    // Σ = 10^12 by ONE DECIMAL(38,0) integral division per node — the
    // hub/directory-page signal PageRank's single score cannot separate.
    // The oracle replays both rounds as chained HUGEINT CTEs.
    "g02_host_hits" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      def host(c: org.apache.spark.sql.Column) =
        concat(lit("h"), c.cast("string"))
      val e1 = docs.select(host(col("doc_id") % 97).as("src"),
        host((col("doc_id") * 7 + 3) % 97).as("dst"))
      val e2 = docs.select(host(col("doc_id") % 97).as("src"),
        host((col("doc_id") * 13 + 11) % 97).as("dst"))
      GraphOps.hits(e1.unionAll(e2).distinct(), iterations = 2)
    }),

    // HyperBall neighborhood function over the same host graph: radius-2
    // out-balls as ITERATED HLL sketches (one hll_union_agg per round —
    // the web-scale reachability read), gated by the exact ball size the
    // oracle replays as chained frontier CTEs (the a01 pattern: exact
    // hash-compared, sketch drift breaks within_eps)
    "g04_neighborhood_gate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      def host(c: org.apache.spark.sql.Column) =
        concat(lit("h"), c.cast("string"))
      val e1 = docs.select(host(col("doc_id") % 97).as("src"),
        host((col("doc_id") * 7 + 3) % 97).as("dst"))
      val e2 = docs.select(host(col("doc_id") % 97).as("src"),
        host((col("doc_id") * 13 + 11) % 97).as("dst"))
      GraphOps.neighborhoodGate(e1.unionAll(e2).distinct(), radius = 2)
    }),

    // Host-graph weakly-connected components — site clusters, through the
    // REAL UrlOps.hostOf extraction (lowercase + www-strip on raw page/
    // out-link URLs) and the shared CC machinery on portable md5 host
    // ids. The link formula cycles inside groups of 7 residues, so the
    // corpus collapses to 14 islands the oracle's recursive CTE replays.
    "g03_host_components" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val r = col("doc_id") % 97
      val r2 = expr("((doc_id % 97) div 7) * 7 + (((doc_id % 97) % 7) + 1) % 7")
      val edges = docs.select(
        graft.textops.UrlOps.hostOf(concat(lit("https://WWW.h"),
          r.cast("string"), lit(".example.com/page/"), col("doc_id"))).as("src"),
        graft.textops.UrlOps.hostOf(concat(lit("http://h"),
          r2.cast("string"), lit(".example.com/link?x=1"))).as("dst"))
      GraphOps.weakComponents(edges)
    }),

    // ---- custom Catalyst expression in a real plan (DuckDB has no
    //      siphash, so the sketched values can't be reproduced — the
    //      ESTIMATE is ε-gated per window instead; value parity proven by
    //      the SipHash vectors spec). The NON-default key routes through
    //      the config → acdAgg path, changing the sketched domain exactly
    //      as in the reference ----
    "a01_siphash_acd" -> ((s, dir) => {
      val c = cUserAcd.copy(id = "unique_users_siphash",
        siphashKeyHex = "000102030405060708090a0b0c0d0e0f")
      val ev = events(s, dir)
      acdEpsilonGate(
        Counters.run(ev, "ts", c),
        Counters.runExactDistinct(ev, "ts", c))
    }),

    // O1 oracle-checked: events dumped as Kinesis-wire shard logs, read
    // back through the graft-shards DSv2 connector, counted per tumbling
    // window — hash-matches counting the same subset of the parquet
    "c30_shard_source_parity" -> ((s, dir) => shardSourceParity(s, dir)),

    // O14 jq extension notch: else-less if (emits '.' on the false path),
    // keys (sorted, schema-static for objects), has — composed in one
    // program: keys|length folds to a constant offset, select(has(...))
    // keeps rows, map(if...end) scales only the over-threshold elements
    "c31_jq_keys_has" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """{pair: ([.value + ({"a": 1, "b": 2} | keys | length), .value * 2]
          |        | map(if . > 15 then . * 100 end)),
          | ok: ({"m": 1} | has("m"))}
          || select(.ok) | .pair[]""".stripMargin)),

    // O14 round-7 notch: value-position `T as $x | body` bindings (jq's
    // Term-level precedence — `-2 as $m | …` negates OUTSIDE the binding,
    // matching jq's '-' Exp grammar) + right-biased shallow object merge
    // `+`, over the O13 counter record
    "c54_jq_bindings" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """{time: .window_start,
          | scaled: (.value as $v | $v * 3 + 1),
          | neg: (-2 as $m | $m * .value),
          | tagged: ({"src": "ctr", "k": 0} + {"k": .value})}""".stripMargin)),

    // O14 assignment operators over the O13 record: `|=` (old-value
    // scoped), `=` (row scoped, appends the new key), `+=` polymorphic —
    // each lowered to one withColumn/withField projection
    // O14 round-8 notch: NESTED destructuring + `?//` alternatives — the
    // stage binds through a two-level array pattern (first
    // type-compatible alternative wins; the object alternative is
    // rejected by the array-typed value at plan time)
    "c65_jq_destructure_alt" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """{t: .window_start, m: [[.value], [.value * 2, .value * 3]]}
          || .m as [[$a], [$b, $c]] ?// {z: $z}
          || {t: .t, a: $a, b: $b, c: $c, span: ($c - $a)}""".stripMargin)),

    // O14 round-8 notch: RECURSIVE def through the bounded static unroll
    // (12 levels single-call) — factorial of a data-dependent argument
    // over the counter record; rows never reach the raise_error cap
    "c64_jq_recursive_def" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """def fact($n): if $n <= 1 then 1 else $n * fact($n - 1) end;
          |{t: .window_start, f: fact(.value % 6 + 1)}""".stripMargin)),

    // O14 round-8 notch: def FILTER params (macro substitution — jq
    // re-evaluates a filter arg in the caller's context at every
    // reference, so `twice(f)` evaluates `.value` twice) composed with a
    // mixed $-value/filter signature in one program
    "c66_jq_def_filter_params" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """def twice(f): f + f;
          |def scale($k; g): g * $k;
          |{t: .window_start, d: twice(.value), s: scale(3; .value + 1)}"""
          .stripMargin)),

    // O14 round-8 notch: walk(f) — bottom-up schema recursion with the
    // type-dispatch idiom; static branch pruning compiles exactly the
    // applicable branch per node (strings lowercase, numbers double,
    // containers pass through), nested arrays included
    "c67_jq_walk" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """{t: .window_start,
          | o: ({id: "W\(.window_start)", n: .value,
          |      inner: {s: "AbC", arr: [.value, 3]}}
          |     | walk(if type == "string" then ascii_downcase
          |            elif type == "number" then . * 2 else . end))}"""
          .stripMargin)),

    // O14 round-8 notch: until(cond; update) — the jq-source PRELUDE def
    // riding the filter-param + bounded-recursive-unroll machinery;
    // smallest power of 2 ≥ (value mod 50 + 2), ≤ 6 doublings per row
    "c68_jq_until" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """(.value % 50 + 2) as $v
          || {t: .window_start, p2: (1 | until(. >= $v; . * 2))}"""
          .stripMargin)),

    // O14 round-8 notch: the datetime triangle (gmtime → strftime with a
    // C-format translated to a Spark pattern at parse time; nth over the
    // broken-down array) + unique_by's keyed dedup + non-overlapping
    // string indices — all codegen'd expressions, no UDF
    "c69_jq_datetime" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """{t: .window_start,
          | iso: ((.window_start / 1000) | gmtime | strftime("%Y-%m-%dT%H:%M:%SZ")),
          | wd: (((.window_start / 1000) | gmtime) | nth(6)),
          | u: ([.value, .value + 1, .value] | unique_by(. % 2)),
          | ix: ("abcabcab" | indices("ab"))}"""
          .stripMargin)),

    // O14 round-8 notch: DATA-DEPENDENT try/catch — the body compiles but
    // fails per-row (zero divisor when value ≡ 0 mod 3; tonumber on a
    // non-numeric counter_id), and error rows route to the catch handler
    // through the runtime error channel (a per-row conditional, no
    // interpreter); gojq raises these at runtime (counter.go:449-457)
    "c62_jq_runtime_try" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """{t: .window_start,
          | r: (try (100 / (.value % 3)) catch -1),
          | n: (try (.counter_id | tonumber) catch 0)}""".stripMargin)),

    // O14 round-8 notch: jq's TRUE multi-output stream semantics at
    // record level — a stream-valued field in a stage construction emits
    // one object per element (ONE explode generator: (value mod 3)+1 rows
    // per window), and the follow-on select/interpolation stages see the
    // exploded records exactly as jq's 0..N output iterator would
    // (counter.go:449-457)
    "c63_jq_stream_explode" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """{t: .window_start, v: .value, i: range(.value % 3 + 1)}
          || select(.i >= 1) | {t: .t, key: "w\(.i)", vi: (.v + .i)}""".stripMargin)),

    "c55_jq_assign" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """.value |= . * 2 | .rate = .value - 1 | .rate += .value
          || {time: .window_start, v2: .value, rate: .rate}""".stripMargin)),

    // O14 one-level destructuring: array pattern binds element i as a
    // hidden column per name (stage-level), feeding later stages
    "c56_jq_destructure" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """{pair: [.value, .value * 3], t: .window_start}
          || .pair as [$a, $b] | {time: .t, lo: $a, hi: $b, sum: ($a + $b)}""".stripMargin)),

    // O14 round-7 third tranche: with_entries (entry-map sugar), setpath
    // (literal-path writer) and DEEP containment — composed over the
    // counter record with the count riding in through a stage binding
    "c57_jq_builtins3" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """.value as $v
          || {time: .window_start,
          |   dbl: (((({"lo": 0, "hi": 0} | with_entries({key: .key, value: $v}))
          |          | .lo)) + $v),
          |   sp: (({"a": {"b": 0}} | setpath(["a", "b"]; $v)) | .a.b),
          |   ok: ({"k": {"n": $v}, "s": "graft"} | contains({"k": {"n": $v}, "s": "raf"}))}""".stripMargin)),

    // O14 jq total-order notch: sort_by under jq's order (null keys first,
    // stable within equal keys — the two data keys flip order per window),
    // plus the cross-type comparison constants (number < string,
    // null < false, array element-wise, object sorted-key-list) gating a
    // select that must keep every row
    "c32_jq_sort_order" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """{vs: ([{k: .value, v: .value}, {k: 168 - .value, v: .value + 1},
          |       {k: null, v: 0}] | sort_by(.k) | map(.v)),
          | ok: ((.value < "s") and (null < false) and ([1, 2] < [1, 3])
          |      and ({"a": 9} < {"b": 0}))}
          || select(.ok) | .vs[]""".stripMargin)),
    // O14 def+foreach notch: program-head def bindings feeding a reduce
    // fold, then a whole-stage foreach scan with an object accumulator —
    // cumulative steps stream out as rows (3 per window), the def-scaled
    // fold rides alongside; all one generator, no per-row interpreter
    "c34_jq_def_foreach" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """def double($x): $x + $x;
          |{vals: [.value, .value * 3, 7], t: .window_start}
          || {t: .t, s: (reduce .vals[] as $v (0; . + double($v))), vals: .vals}
          || foreach .vals[] as $v ({t: .t, s: .s, c: 0}; {t: .t, s: .s, c: (.c + $v)})""".stripMargin)),
    // O7 dialect completion: as_bool (coercion-family face) + min/floor
    // extensions composed in one counter predicate — count semantics
    // (non-nil ∧ non-false) over the evaluator result
    "c33_expr_dialect" -> ((s, dir) =>
      Counters.run(events(s, dir), "ts", cBoolFloorCount)),
    // O14 slurp notch: jq -s per hour window — the window's events become
    // ONE ordered array (stream order pinned by event_id) and the program
    // runs once over it: length, an order-exact integer fold, an
    // order-free max, and a first that only the pinned order makes
    // deterministic. One shuffle (the groupBy); arrays built reducer-side.
    "c35_jq_slurp" -> ((s, dir) =>
      JqTransform.slurpBy(
        events(s, dir)
          .withColumn("window_start",
            (unix_timestamp(date_trunc("hour", col("ts"))) * 1000).cast("long"))
          .select("window_start", "event_id", "event_type", "value"),
        groupCols = Seq("window_start"), orderCols = Seq("event_id"),
        """{n: (. | length), sum_id: (map(.event_id) | add),
          | vmax: (map(.value) | max),
          | first_type: (map(.event_type) | first)}""".stripMargin)),
    // O14 regex + try/catch notch (counter.go:439-466 accepts any gojq
    // program; test/match/capture are the most-used regex constructs in
    // real configs): a regex-gated select, named-group capture projected
    // through a path stage, match-object offset as a scalar, and a
    // try/catch fallback over a missing field — all codegen'd regexp_*
    // kernels, no per-row interpreter.
    "c36_jq_regex" -> ((s, dir) =>
      JqTransform(
        events(s, dir).select("event_id", "event_type"),
        """select(.event_type | test("^(?:click|view|signup)$"))
          || {id: .event_id, et: .event_type,
          |   cap: (.event_type | capture("^(?<head>[a-z])(?<tail>[a-z]+)$")),
          |   m: (.event_type | match("i"))}
          || {id: .id, et: .et, head: .cap.head,
          |   tail_len: (.cap.tail | length), i_off: .m.offset,
          |   scrubbed: (.et | gsub("[aeiou]"; "*")),
          |   fb: (try (.missing | unique) catch "none")}""".stripMargin)),
    // O14 builtin-surface notch (round-6 tranche): math (fabs/sqrt/round),
    // dates (todate over epoch seconds — the natural transform on this
    // engine's epoch-millis window output), type introspection, substring
    // positions (index/rindex), containment, two-arg regex split, and
    // tojson — all codegen'd kernels, no per-row interpreter.
    "c37_jq_builtins" -> ((s, dir) =>
      JqTransform(
        events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"),
            unix_seconds(col("ts")).as("ts_sec")),
        """{id: .event_id,
          | day: (.ts_sec | todate),
          | rt: (.value | fabs | sqrt | round),
          | ty: (.event_type | type),
          | pos: (.event_type | index("i")),
          | rpos: (.event_type | rindex("i")),
          | has_ick: (.event_type | contains("ick")),
          | parts: (.event_type | split("[aeiou]"; "") | length),
          | blen: (.event_type | utf8bytelength),
          | js: (.event_type | tojson)}""".stripMargin)),
    // O14 paths notch: document-order field paths per row (the descent
    // family's location face), joined to strings by a follow-on stage
    "c39_jq_paths" -> ((s, dir) =>
      JqTransform(
        events(s, dir)
          .select(col("event_id"),
            struct(col("event_type").as("type"),
              struct(col("user_id").as("uid")).as("ids")).as("payload")),
        """paths | {p: (.path | join("/"))}""")),
    // O14 round-8 notch: FILTERED path enumeration — paths(f) with the
    // predicate compiled per candidate ('.' bound to the candidate's
    // value, type-dispatch folding on each candidate's static type)
    "c72_jq_paths_filtered" -> ((s, dir) =>
      JqTransform(
        events(s, dir)
          .select(col("event_id"),
            struct(col("event_type").as("type"),
              struct(col("user_id").as("uid")).as("ids")).as("payload")),
        """paths(type == "number") | {p: (.path | join("/"))}""")),
    // O14 round-6 second-tranche notch: code-point explode/implode
    // round-trip, JSON re-parse via fromjson (VARIANT) piped into `| .k`,
    // the stream builtins scan/splits/range with their [collect] forms,
    // limit over a collected stream, and pow — all codegen'd kernels
    // (regexp_extract_all / split / sequence / surrogate-pair decode),
    // no per-row interpreter.
    "c47_jq_builtins2" -> ((s, dir) =>
      JqTransform(
        events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"), col("props")),
        """{id: .event_id,
          | cps_n: (.event_type | explode | length),
          | first_cp: (.event_type | explode | first),
          | rt: (.event_type | explode | implode),
          | k: (.props | fromjson | .k | tonumber),
          | letters: ([.props | scan("[a-z_]+")] | length),
          | parts: ([.event_type | splits("i")] | length),
          | lim: (limit(2; [.event_type | splits("i")]) | length),
          | rng: ([range(.event_type | explode | first)] | add),
          | pw: pow(2; 10)}""".stripMargin)),
    // O14 recursive-descent notch: `..` emits the row object and every
    // sub-value depth-first as ONE array<variant> + explode (no per-row
    // interpreter); the follow-on stage exercises the variant-aware
    // type/tojson builtins. 6 output rows per input row.
    "c38_jq_descend" -> ((s, dir) =>
      JqTransform(
        events(s, dir)
          .select(col("event_id"),
            struct(col("event_type").as("type"),
              struct(col("user_id").as("uid")).as("ids")).as("payload")),
        """.. | {ty: (. | type), js: (. | tojson)}""")),
    // O14 round-8 notch: while(cond; update) — jq's emit-and-iterate
    // stream, natively unrolled with cumulative keep-flags (the cap
    // raises loudly); the collected form rides the stream-tail unwrap
    "c71_jq_while" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount),
        """(.value % 9 + 1) as $v
          || {t: .window_start, w: [$v | while(. < 30; . * 3)]}"""
          .stripMargin)),

    // O14 round-8 notch: a SECOND `..` over the variant stream — the
    // depth-bounded variant_explode unroll; a node at depth d appears
    // d+1 times (once per ancestor-or-self), jq's subtree-of-subtree
    // multiset, which the oracle recomputes with multiplicity tables
    "c70_jq_double_descend" -> ((s, dir) =>
      JqTransform(
        events(s, dir)
          .select(col("event_id"), struct(col("user_id").as("uid")).as("m")),
        """.. | .. | {ty: (. | type), js: (. | tojson)}""")),
    // engine-extension counter TYPES through the config surface: exact
    // per-window p90 of the record value as a value_quantile counter
    // (single-phase; the O13 record carries the quantile in `value`)
    "c40_quantile_counter" -> ((s, dir) =>
      Counters.run(events(s, dir), "ts", cValueP90)),
    // top-3 users per window as a heavy_hitters counter, run through the
    // TWO-PHASE shard topology — the hop must be invisible vs the oracle
    "c41_hitter_counter" -> ((s, dir) =>
      Counters.runTwoPhase(
        events(s, dir).withColumn("shard", pmod(col("user_id"), lit(8))),
        "ts", "shard", cTopUsers)),
    // the per-shard topology for the quantile type: shard_id in the O13
    // record, one quantile per (window, shard) — completing the
    // type × topology matrix with an oracle row
    "c45_quantile_per_shard" -> ((s, dir) =>
      Counters.runPerShard(
        events(s, dir).withColumn("shard", pmod(col("user_id"), lit(4))),
        "ts", "shard", cValueP90)),
    // ...and the same matrix row for heavy_hitters: top-3 per (window,
    // shard), member/rank beside the conditional shard_id
    "c46_hitter_per_shard" -> ((s, dir) =>
      Counters.runPerShard(
        events(s, dir).withColumn("shard", pmod(col("user_id"), lit(4))),
        "ts", "shard", cTopUsers)),
    // ...and the per-shard topology row for value_sum, completing the
    // type x topology matrix (one sum per (window, shard), shard_id in
    // the O13 record)
    "c53_sum_per_shard" -> ((s, dir) =>
      Counters.runPerShard(
        events(s, dir).withColumn("shard", pmod(col("user_id"), lit(4))),
        "ts", "shard", cValueSum)),
    // THIRD engine-extension counter type as a config citizen: per-window
    // SUM of the record value in integer cents (the basic aggregate the
    // reference lacks) — same O13 record, single-phase topology
    "c48_sum_counter" -> ((s, dir) =>
      Counters.run(events(s, dir), "ts", cValueSum)),
    // FOURTH/FIFTH extension counter types: per-window MIN and MAX of the
    // value in cents (the latency-floor/spike read) — BOTH through the
    // shared fanOut pass: one scan, one shuffle, two counters
    "c58_extremes_fanout" -> ((s, dir) =>
      Counters.fanOut(events(s, dir), "ts", Seq(cValueMin, cValueMax))),
    // ...and value_max through the SERIALIZED intermediate-record hop:
    // partials ride the JSON envelope as the {extreme_cents} union member
    // with the same id/type/version gating — hop invisible vs the oracle
    "c59_max_twophase" -> ((s, dir) => {
      val c = cValueMax.copy(id = "value_max_2p")
      val sharded = events(s, dir).withColumn("shard", pmod(col("user_id"), lit(8)))
      Intermediate.mergeRecords(
        Intermediate.toRecords(
          Counters.partialState(sharded, "ts", "shard", c),
          c, "arn:aws:kinesis:ap-northeast-1:111122223333:stream/in"),
        c, requiredVersion = Some(">=0.1.0"))
    }),
    // ...and the PER-SHARD topology for value_min, completing the
    // extreme types' topology matrix (one extreme per (window, shard))
    "c61_min_per_shard" -> ((s, dir) =>
      Counters.runPerShard(
        events(s, dir).withColumn("shard", pmod(col("user_id"), lit(4))),
        "ts", "shard", cValueMin)),
    // ...and value_min's STREAMING face via the generic windowed-agg path
    "c60_min_streaming_parity" -> ((s, dir) => {
      val c = cValueMin.copy(id = "value_min_stream")
      val out = graft.streaming.StreamingCounters.run(
        Tables.eventsStream(s, dir), "ts", c, watermarkDelay = "0 seconds")
      val sink = "c60_min_sink"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
    }),
    // ...and through the SERIALIZED intermediate-record hop: partials ride
    // the JSON envelope as the {sum_cents} union member with the same
    // id/type/version gating — the hop must be invisible vs c48's oracle
    "c49_sum_twophase" -> ((s, dir) => {
      val c = cValueSum.copy(id = "revenue_cents_2p")
      val sharded = events(s, dir).withColumn("shard", pmod(col("user_id"), lit(8)))
      Intermediate.mergeRecords(
        Intermediate.toRecords(
          Counters.partialState(sharded, "ts", "shard", c),
          c, "arn:aws:kinesis:ap-northeast-1:111122223333:stream/in"),
        c, requiredVersion = Some(">=0.1.0"))
    }),
    // ...and its STREAMING face: the generic windowed-agg path (aggExpr
    // composes into the watermark aggregation unchanged) — rows must
    // hash-match the batch counter for every closed window
    "c50_sum_streaming_parity" -> ((s, dir) => {
      val c = cValueSum.copy(id = "revenue_cents_stream")
      val out = graft.streaming.StreamingCounters.run(
        Tables.eventsStream(s, dir), "ts", c, watermarkDelay = "0 seconds")
      val sink = "c50_sum_sink"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
    }),
    // STREAMING face of the value_quantile counter: append-mode histogram
    // state, pick per closed window — rows must hash-match the batch
    // counter for every window the watermark closed (all but the last)
    "c42_quantile_streaming_parity" -> ((s, dir) => withStatePartitions(s, 8) {
      val c = cValueP90.copy(id = "value_p90_stream")
      val hist = graft.streaming.StreamingCounters.counterHistogram(
        Tables.eventsStream(s, dir), "ts", c, watermarkDelay = "0 seconds")
      val sink = "c42_quantile_hist_sink"
      val q = hist.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.StreamingCounters.counterQuantileOfClosedWindows(s.table(sink), c)
    }),
    // STREAMING face of the heavy_hitters counter: member-count state,
    // rank per closed window — same closed-window parity bar
    "c43_hitter_streaming_parity" -> ((s, dir) => withStatePartitions(s, 8) {
      val c = cTopUsers.copy(id = "top_users_stream")
      val counts = graft.streaming.StreamingCounters.counterMemberCounts(
        Tables.eventsStream(s, dir), "ts", c, watermarkDelay = "0 seconds")
      val sink = "c43_hitter_counts_sink"
      val q = counts.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      graft.streaming.StreamingCounters.counterHittersOfClosedWindows(s.table(sink), c)
    }),
  )

  /** Build the `c30` fixture: a 5% events subset written as per-shard
    * JSON-lines logs (the connector's wire format, 4 shards by user id),
    * then read back via `graft-shards` and counted. The write is a
    * driver-side TEST FIXTURE only — the scan, parse and count all run
    * through the connector's executor-side readers.
    */
  // one fixture per (JVM, sfDir) — bench re-invocations of c30 reuse it
  private val c30Fixtures = new scala.collection.concurrent.TrieMap[String, String]

  private def shardSourceParity(s: SparkSession, dir: String): DataFrame = {
    val path = c30Fixtures.getOrElseUpdate(dir, writeC30Fixture(s, dir))
    Counters.run(
      s.read.format("graft-shards").load(path)
        .select(col("arrival_ts").as("ts")),
      "ts", cRequestCount.copy(id = "shard_source_count"))
  }

  private def writeC30Fixture(s: SparkSession, dir: String): String = {
    import java.nio.charset.StandardCharsets
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft_shards_c30")
    tmp.toFile.deleteOnExit()
    val enc = java.util.Base64.getEncoder
    events(s, dir).where(col("event_id") % 20 === 0)
      .select(col("event_id"), unix_millis(col("ts")).as("ms"),
        coalesce(col("user_id"), lit(-1L)).as("uid"))
      .collect()
      .groupBy(r => Math.floorMod(r.getLong(2), 4L))
      .foreach { case (shard, rs) =>
        val lines = rs.sortBy(_.getLong(0)).map { r =>
          val data = enc.encodeToString(
            s"""{"user_id":${r.getLong(2)}}""".getBytes(StandardCharsets.UTF_8))
          s"""{"partitionKey":"${r.getLong(2)}","sequenceNumber":"${r.getLong(0)}",""" +
            s""""approximateArrivalTimestamp":${r.getLong(1)},"data":"$data"}"""
        }
        val f = tmp.resolve(f"shard-$shard%03d.jsonl")
        f.toFile.deleteOnExit()
        Files.write(f, java.util.Arrays.asList(lines: _*))
      }
    tmp.toString
  }

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
      // c40: exact lower discrete p90 per window (histogram + cumulative
      // pick — the value passes through untouched, so doubles are exact)
      "c40_quantile_counter" ->
        """WITH h AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w, value AS v,
          |           count(*) AS cnt FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
          |q AS (SELECT w, v, sum(cnt) OVER (PARTITION BY w ORDER BY v) AS cum,
          |             sum(cnt) OVER (PARTITION BY w) AS tot FROM h)
          |SELECT epoch_ms(w) AS window_start,
          | epoch_ms(w + INTERVAL '1 hour') AS window_end,
          | 'value_p90' AS counter_id, 'value_quantile' AS counter_type,
          | min(v) AS value
          |FROM q WHERE cum * 1000000 >= 900000 * tot GROUP BY 1, 2""".stripMargin,
      // c41: top-3 members per window; ranks tie-break on the STRING
      // member (the counter casts members to string), and the serialized
      // two-phase hop on the Spark side must be invisible
      "c41_hitter_counter" ->
        """WITH c AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w,
          |           user_id::VARCHAR AS member, count(*) AS value
          |           FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
          |r AS (SELECT w, member, value,
          |        row_number() OVER (PARTITION BY w ORDER BY value DESC, member ASC) AS rank
          |      FROM c)
          |SELECT epoch_ms(w) AS window_start,
          | epoch_ms(w + INTERVAL '1 hour') AS window_end,
          | 'top_users' AS counter_id, 'heavy_hitters' AS counter_type,
          | member, rank::BIGINT AS rank, value::BIGINT AS value
          |FROM r WHERE rank <= 3""".stripMargin,
      // c44: c40's quantile through the engine + jq rename — the hop from
      // counter record to transformed output must be exact
      "c44_quantile_engine_e2e" ->
        """WITH h AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w, value AS v,
          |           count(*) AS cnt FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
          |q AS (SELECT w, v, sum(cnt) OVER (PARTITION BY w ORDER BY v) AS cum,
          |             sum(cnt) OVER (PARTITION BY w) AS tot FROM h)
          |SELECT epoch_ms(w) AS time, 'metric.cfg_p90' AS name, min(v) AS p90
          |FROM q WHERE cum * 1000000 >= 900000 * tot GROUP BY 1, 2""".stripMargin,
      // c45: c40 with the shard in the group keys and the O13 shard_id
      "c45_quantile_per_shard" ->
        """WITH h AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w,
          |           (user_id % 4)::VARCHAR AS shard_id, value AS v,
          |           count(*) AS cnt FROM events
          |           WHERE value IS NOT NULL GROUP BY 1, 2, 3),
          |q AS (SELECT w, shard_id, v,
          |        sum(cnt) OVER (PARTITION BY w, shard_id ORDER BY v) AS cum,
          |        sum(cnt) OVER (PARTITION BY w, shard_id) AS tot FROM h)
          |SELECT epoch_ms(w) AS window_start,
          | epoch_ms(w + INTERVAL '1 hour') AS window_end,
          | 'value_p90' AS counter_id, 'value_quantile' AS counter_type,
          | shard_id, min(v) AS value
          |FROM q WHERE cum * 1000000 >= 900000 * tot GROUP BY 1, 2, 5""".stripMargin,
      // c46: c41's rank per (window, shard); member tie-break on string
      "c46_hitter_per_shard" ->
        """WITH c AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w,
          |           (user_id % 4)::VARCHAR AS shard_id,
          |           user_id::VARCHAR AS member, count(*) AS value
          |           FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2, 3),
          |r AS (SELECT w, shard_id, member, value,
          |        row_number() OVER (PARTITION BY w, shard_id
          |          ORDER BY value DESC, member ASC) AS rank
          |      FROM c)
          |SELECT epoch_ms(w) AS window_start,
          | epoch_ms(w + INTERVAL '1 hour') AS window_end,
          | 'top_users' AS counter_id, 'heavy_hitters' AS counter_type,
          | shard_id, member, rank::BIGINT AS rank, value::BIGINT AS value
          |FROM r WHERE rank <= 3""".stripMargin,
      // c42/c43: the streaming faces — batch SQL restricted to windows the
      // watermark closed (same predicate as c23: all but max-ts's window)
      "c42_quantile_streaming_parity" ->
        """WITH h AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w, value AS v,
          |           count(*) AS cnt FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
          |q AS (SELECT w, v, sum(cnt) OVER (PARTITION BY w ORDER BY v) AS cum,
          |             sum(cnt) OVER (PARTITION BY w) AS tot FROM h)
          |SELECT epoch_ms(w) AS window_start,
          | epoch_ms(w + INTERVAL '1 hour') AS window_end,
          | 'value_p90_stream' AS counter_id, 'value_quantile' AS counter_type,
          | min(v) AS value
          |FROM q WHERE cum * 1000000 >= 900000 * tot GROUP BY 1, 2
          |HAVING window_end <= (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', max(ts)))
          |                      FROM events)""".stripMargin,
      "c43_hitter_streaming_parity" ->
        """WITH c AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w,
          |           user_id::VARCHAR AS member, count(*) AS value
          |           FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
          |r AS (SELECT w, member, value,
          |        row_number() OVER (PARTITION BY w ORDER BY value DESC, member ASC) AS rank
          |      FROM c)
          |SELECT epoch_ms(w) AS window_start,
          | epoch_ms(w + INTERVAL '1 hour') AS window_end,
          | 'top_users_stream' AS counter_id, 'heavy_hitters' AS counter_type,
          | member, rank::BIGINT AS rank, value::BIGINT AS value
          |FROM r WHERE rank <= 3
          |  AND epoch_ms(w + INTERVAL '1 hour') <=
          |      (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', max(ts))) FROM events)"""
          .stripMargin,
      "c30_shard_source_parity" ->
        """WITH e AS (SELECT make_timestamp(epoch_ms(ts) * 1000) AS ts
          |           FROM events WHERE event_id % 20 = 0)
          |SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS window_start,
          | epoch_ms(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour') AS window_end,
          | 'shard_source_count' AS counter_id, 'count' AS counter_type,
          | count(*) AS value FROM e GROUP BY 1, 2""".stripMargin,
      "c02_column_count" ->
        s"""SELECT $win, 'user_events' AS counter_id, 'count' AS counter_type,
           | count(user_id) AS value FROM events GROUP BY 1, 2""".stripMargin,
      "c03_distinct_exact" ->
        s"""SELECT $win, 'unique_users' AS counter_id,
           | 'approx_count_distinct' AS counter_type,
           | count(DISTINCT user_id) AS value FROM events GROUP BY 1, 2""".stripMargin,
      // ACD ε-gate trio: the oracle reproduces the exact count and asserts
      // within_eps=TRUE — a Spark estimate drifting past the reference's
      // 5% tolerance (counter_test.go:66) flips the flag and fails the hash
      "c04_window_acd" ->
        s"""SELECT $win, 'unique_users' AS counter_id,
           | 'approx_count_distinct' AS counter_type,
           | count(DISTINCT user_id) AS exact_value, TRUE AS within_eps
           | FROM events GROUP BY 1, 2""".stripMargin,
      "c08_twophase_acd" ->
        s"""SELECT $win, 'unique_users_2p' AS counter_id,
           | 'approx_count_distinct' AS counter_type,
           | count(DISTINCT user_id) AS exact_value, TRUE AS within_eps
           | FROM events GROUP BY 1, 2""".stripMargin,
      "a01_siphash_acd" ->
        s"""SELECT $win, 'unique_users_siphash' AS counter_id,
           | 'approx_count_distinct' AS counter_type,
           | count(DISTINCT user_id) AS exact_value, TRUE AS within_eps
           | FROM events GROUP BY 1, 2""".stripMargin,
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
      // c57: with_entries rebuild (dbl = 2v), setpath round-trip (sp = v),
      // deep containment incl. substring leaf (ok = true)
      "c57_jq_builtins3" ->
        """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) AS v FROM events GROUP BY 1)
          |SELECT t AS time, v * 2 AS dbl, v AS sp, TRUE AS ok FROM c""".stripMargin,
      // c56: array destructuring — lo = v, hi = 3v, sum = 4v per window
      "c56_jq_destructure" ->
        """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) AS v FROM events GROUP BY 1)
          |SELECT t AS time, v AS lo, v * 3 AS hi, v * 4 AS sum FROM c""".stripMargin,
      // c55: assignment chain over the counter record — v2 = 2·count,
      // rate = (v2 − 1) + v2
      // c65: nested destructuring — a=v, b=2v, c=3v through the two-level
      // array pattern; span = c - a = 2v
      "c65_jq_destructure_alt" ->
        """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) AS v FROM events GROUP BY 1)
          |SELECT t, v AS a, v * 2 AS b, v * 3 AS c, v * 2 AS span FROM c"""
          .stripMargin,
      // c64: recursive def — factorial of (count mod 6)+1; DuckDB's
      // factorial() is the oracle, double-typed like the unrolled
      // when-chain's unified branch type
      "c64_jq_recursive_def" ->
        """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) AS v FROM events GROUP BY 1)
          |SELECT t, factorial((v % 6 + 1)::INT)::DOUBLE AS f FROM c""".stripMargin,
      // c66: def filter params — twice(.value) re-evaluates the filter
      // arg per reference (2v); scale(3; .value+1) mixes a $-value and a
      // filter param (3(v+1))
      "c66_jq_def_filter_params" ->
        """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) AS v FROM events GROUP BY 1)
          |SELECT t, v + v AS d, (v + 1) * 3 AS s FROM c""".stripMargin,
      // c67: walk — strings lowercase ('W'→'w', 'AbC'→'abc'), numbers
      // double, containers keep shape; struct → canonical JSON (Verify
      // canonicalizes, DuckDB to_json matches byte for byte)
      "c67_jq_walk" ->
        """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) AS v FROM events GROUP BY 1)
          |SELECT t, to_json(struct_pack(
          |  id := 'w' || t::VARCHAR, n := 2 * v,
          |  inner := struct_pack(s := 'abc', arr := [2 * v, 6]))) AS o FROM c"""
          .stripMargin,
      // c69: gmtime/strftime (DuckDB's strftime takes the same C formats),
      // dayofweek is Sunday-0 in both, unique_by's first-per-sorted-key
      // rule recomputed as a CASE, indices' non-overlapping scan constant
      "c69_jq_datetime" ->
        """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) AS v FROM events GROUP BY 1)
          |SELECT t,
          |  strftime(to_timestamp(t // 1000), '%Y-%m-%dT%H:%M:%SZ') AS iso,
          |  dayofweek(to_timestamp(t // 1000))::BIGINT AS wd,
          |  to_json(CASE WHEN v % 2 = 0 THEN [v, v + 1] ELSE [v + 1, v] END)::VARCHAR AS u,
          |  to_json([0, 3, 6]::BIGINT[])::VARCHAR AS ix
          |FROM c""".stripMargin,
      // c68: until — smallest power of 2 ≥ (v mod 50 + 2); the unroll
      // cap's raise_error arm coerces the chain to DOUBLE, like c64
      "c68_jq_until" ->
        """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) AS v FROM events GROUP BY 1)
          |SELECT t, power(2, ceil(log2(v % 50 + 2)))::DOUBLE AS p2 FROM c"""
          .stripMargin,
      // c62: runtime try/catch — windows whose count ≡ 0 mod 3 divide by
      // zero and take the handler (-1); tonumber on the counter_id string
      // always takes its handler (0)
      "c62_jq_runtime_try" ->
        """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) AS v FROM events GROUP BY 1)
          |SELECT t, CASE WHEN v % 3 = 0 THEN -1.0 ELSE 100.0 / (v % 3) END AS r,
          |       0.0 AS n FROM c""".stripMargin,
      // c63: stream-field explode — (v mod 3) rows per window survive the
      // select (i in 1..v mod 3); key interpolates the index
      "c63_jq_stream_explode" ->
        """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) AS v FROM events GROUP BY 1),
          |     e AS (SELECT t, v, unnest(generate_series(0, v % 3)) AS i FROM c)
          |SELECT t, 'w' || i::VARCHAR AS key, v + i AS vi FROM e WHERE i >= 1"""
          .stripMargin,
      "c55_jq_assign" ->
        """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) AS v FROM events GROUP BY 1)
          |SELECT t AS time, v * 2 AS v2, (v * 2 - 1) + v * 2 AS rate FROM c""".stripMargin,
      // c54: Term-level binding precedence (-2 as $m == -(2 as $m | …))
      // and right-biased object merge; struct fields in the merge's key
      // order (left's keys, then right's new ones). Verify JSON-stringifies
      // the Spark-side struct, so the oracle wraps the same struct in
      // to_json — DuckDB's compact rendering is byte-identical to Spark's.
      "c54_jq_bindings" ->
        """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) AS v FROM events GROUP BY 1)
          |SELECT t AS time, v * 3 + 1 AS scaled, -(2 * v) AS neg,
          | to_json(struct_pack(src := 'ctr', k := v::BIGINT)) AS tagged FROM c""".stripMargin,
      "c29_tws_state_parity" ->
        s"""SELECT $win, 'request_count_tws' AS counter_id, 'count' AS counter_type,
           | count(*) AS value FROM events GROUP BY 1, 2
           | HAVING window_end < (SELECT epoch_ms(max(ts)) FROM events)""".stripMargin,
      "c28_interval_join_parity" ->
        """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
          | epoch_ms(p.ts) AS purchase_ms, epoch_ms(c.ts) AS click_ms
          |FROM events p JOIN events c
          |  ON p.user_id = c.user_id
          | AND p.event_type = 'purchase' AND c.event_type = 'click'
          | AND c.ts >= p.ts - INTERVAL '1 hour' AND c.ts <= p.ts""".stripMargin,
      "c27_jq_conditional" ->
        """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS time,
          | CASE WHEN count(*) > 15 THEN 'high' WHEN count(*) > 12 THEN 'mid'
          |      ELSE 'low' END AS level,
          | count(*) AS value
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
      "c12_variant_count" ->
        s"""SELECT $win, 'big_value_count_variant' AS counter_id, 'count' AS counter_type,
           | count(*) FILTER (WHERE CAST(json_extract_string(props, '$$.k') AS BIGINT) > 50) AS value
           | FROM events GROUP BY 1, 2""".stripMargin,
      "c13_intermediate_roundtrip" ->
        s"""SELECT $win, 'request_count_rt' AS counter_id, 'count' AS counter_type,
           | count(*) AS value FROM events GROUP BY 1, 2""".stripMargin,
      "c14_jq_select_pipe" ->
        """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS time,
          | 'click_count' AS name,
          | CAST(count(*) FILTER (WHERE event_type LIKE '%click%') AS VARCHAR) AS value
          | FROM events GROUP BY 1""".stripMargin,
      "c15_per_shard_count" ->
        s"""SELECT $win, 'request_count_shard' AS counter_id, 'count' AS counter_type,
           | CAST(user_id % 8 AS VARCHAR) AS shard_id, count(*) AS value
           | FROM events GROUP BY 1, 2, 5""".stripMargin,
      "c20_jq_alternative" ->
        """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS time,
          | 'metric.request_count' AS name, count(*) AS value
          | FROM events GROUP BY 1""".stripMargin,
      // c48/c49/c50: the value_sum type across its three topologies — all
      // against ONE relational truth (the hops must be invisible). floor
      // (value*100) is the same single IEEE multiply + floor on both
      // engines; summed longs are shuffle-order-exact.
      "c53_sum_per_shard" ->
        s"""SELECT $win, (user_id % 4)::VARCHAR AS shard_id,
           | 'revenue_cents' AS counter_id, 'value_sum' AS counter_type,
           | coalesce(sum(floor(value * 100)), 0)::BIGINT AS value
           | FROM events GROUP BY 1, 2, 3""".stripMargin,
      "c48_sum_counter" ->
        s"""SELECT $win, 'revenue_cents' AS counter_id, 'value_sum' AS counter_type,
           | coalesce(sum(floor(value * 100)), 0)::BIGINT AS value
           | FROM events GROUP BY 1, 2""".stripMargin,
      // c58/c59/c60: the extreme counter types across their topologies —
      // min/max of cents per window; no empty-group identity (NULL)
      "c58_extremes_fanout" ->
        s"""SELECT $win, 'value_min_cents' AS counter_id, 'value_min' AS counter_type,
           | min(floor(value * 100))::BIGINT AS value FROM events GROUP BY 1, 2
           |UNION ALL
           |SELECT $win, 'value_max_cents', 'value_max',
           | max(floor(value * 100))::BIGINT FROM events GROUP BY 1, 2""".stripMargin,
      "c61_min_per_shard" ->
        s"""SELECT $win, (user_id % 4)::VARCHAR AS shard_id,
           | 'value_min_cents' AS counter_id, 'value_min' AS counter_type,
           | min(floor(value * 100))::BIGINT AS value
           | FROM events GROUP BY 1, 2, 3""".stripMargin,
      "c59_max_twophase" ->
        s"""SELECT $win, 'value_max_2p' AS counter_id, 'value_max' AS counter_type,
           | max(floor(value * 100))::BIGINT AS value
           | FROM events GROUP BY 1, 2""".stripMargin,
      "c60_min_streaming_parity" ->
        s"""SELECT $win, 'value_min_stream' AS counter_id, 'value_min' AS counter_type,
           | min(floor(value * 100))::BIGINT AS value
           | FROM events GROUP BY 1, 2
           | HAVING window_end < (SELECT epoch_ms(max(ts)) FROM events)""".stripMargin,
      "c49_sum_twophase" ->
        s"""SELECT $win, 'revenue_cents_2p' AS counter_id, 'value_sum' AS counter_type,
           | coalesce(sum(floor(value * 100)), 0)::BIGINT AS value
           | FROM events GROUP BY 1, 2""".stripMargin,
      "c50_sum_streaming_parity" ->
        s"""SELECT $win, 'revenue_cents_stream' AS counter_id, 'value_sum' AS counter_type,
           | coalesce(sum(floor(value * 100)), 0)::BIGINT AS value
           | FROM events GROUP BY 1, 2
           | HAVING window_end < (SELECT epoch_ms(max(ts)) FROM events)""".stripMargin,
      // c51: weighted windowed counts; the dim is a VALUES list. Closed
      // windows only (same append-mode bound as c17/c50).
      "c51_stream_static_enrich" ->
        """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS window_start,
          | epoch_ms(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour') AS window_end,
          | sum(w.weight)::BIGINT AS value
          |FROM events e JOIN (VALUES ('click', 1), ('view', 2), ('purchase', 5),
          |  ('signup', 3), ('error', 0)) AS w(event_type, weight)
          |  ON e.event_type = w.event_type
          |GROUP BY 1, 2
          |HAVING window_end < (SELECT epoch_ms(max(ts)) FROM events)""".stripMargin,
      "c16_streaming_parity" ->
        s"""SELECT $win, 'request_count_stream' AS counter_id, 'count' AS counter_type,
           | count(*) AS value FROM events GROUP BY 1, 2""".stripMargin,
      "c17_custom_state_parity" ->
        s"""SELECT $win, 'request_count_state' AS counter_id, 'count' AS counter_type,
           | count(*) AS value FROM events GROUP BY 1, 2
           | HAVING window_end < (SELECT epoch_ms(max(ts)) FROM events)""".stripMargin,
      "h01_pricing_summary" ->
        """SELECT l_returnflag, l_linestatus,
          | sum(CAST(floor(l_quantity) AS BIGINT))::BIGINT AS sum_qty,
          | sum(CAST(floor(l_extendedprice*100) AS BIGINT))::BIGINT AS sum_base_cents,
          | sum(CAST(floor(l_extendedprice*100) AS BIGINT)
          |     * (100 - CAST(floor(l_discount*100) AS BIGINT)))::BIGINT AS sum_disc_cpct,
          | count(*)::BIGINT AS count_order
          |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-07-01'
          |GROUP BY 1, 2""".stripMargin,
      "h02_top_orders" ->
        """SELECT o_orderkey AS orderkey, epoch_ms(o_orderdate) AS order_date_ms,
          | sum(CAST(floor(l_extendedprice*100) AS BIGINT)
          |     * (100 - CAST(floor(l_discount*100) AS BIGINT)))::BIGINT AS revenue_cpct
          |FROM customer JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1998-01-01'
          |  AND l_shipdate > TIMESTAMP '1998-01-01'
          |GROUP BY 1, 2
          |ORDER BY revenue_cpct DESC, orderkey LIMIT 10""".stripMargin,
      "h05_large_orders" ->
        """SELECT c_name, c_custkey AS custkey, o_orderkey AS orderkey,
          | epoch_ms(o_orderdate) AS order_date_ms, total_qty
          |FROM (SELECT l_orderkey,
          |        sum(CAST(floor(l_quantity) AS BIGINT))::BIGINT AS total_qty
          |      FROM lineitem GROUP BY 1 HAVING total_qty > 250) big
          |JOIN orders ON o_orderkey = l_orderkey
          |JOIN customer ON o_custkey = c_custkey""".stripMargin,
      "h06_volume_shipping" ->
        """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
          | CAST(year(l_shipdate) AS BIGINT) AS ship_year,
          | sum(CAST(floor(l_extendedprice*100) AS BIGINT)
          |     * (100 - CAST(floor(l_discount*100) AS BIGINT)))::BIGINT AS revenue_cpct,
          | count(*)::BIGINT AS n_lines
          |FROM lineitem
          |JOIN supplier ON s_suppkey = l_suppkey
          |JOIN nation sn ON sn.n_nationkey = s_nationkey
          |JOIN orders ON o_orderkey = l_orderkey
          |JOIN customer ON c_custkey = o_custkey
          |JOIN nation cn ON cn.n_nationkey = c_nationkey
          |WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_8')
          |   OR (sn.n_name = 'NATION_8' AND cn.n_name = 'NATION_3')
          |GROUP BY 1, 2, 3""".stripMargin,
      "h07_promo_share" ->
        """SELECT
          | sum(CASE WHEN p_type = 'PROMO'
          |      THEN CAST(floor(l_extendedprice*100) AS BIGINT)
          |           * (100 - CAST(floor(l_discount*100) AS BIGINT))
          |      ELSE 0 END)::BIGINT AS promo_cpct,
          | sum(CAST(floor(l_extendedprice*100) AS BIGINT)
          |     * (100 - CAST(floor(l_discount*100) AS BIGINT)))::BIGINT AS total_cpct,
          | (sum(CASE WHEN p_type = 'PROMO'
          |      THEN CAST(floor(l_extendedprice*100) AS BIGINT)
          |           * (100 - CAST(floor(l_discount*100) AS BIGINT))
          |      ELSE 0 END) * 1000000
          |  // sum(CAST(floor(l_extendedprice*100) AS BIGINT)
          |     * (100 - CAST(floor(l_discount*100) AS BIGINT))))::BIGINT AS promo_share_ppm
          |FROM lineitem JOIN part ON p_partkey = l_partkey
          |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,
      "h08_late_priority" ->
        """SELECT o_orderpriority, count(*)::BIGINT AS n_orders
          |FROM orders o
          |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          |  AND o_orderdate < TIMESTAMP '1997-07-01'
          |  AND EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o.o_orderkey
          |                AND l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
          |GROUP BY 1""".stripMargin,
      "c18_sliding_count" ->
        """WITH w AS (SELECT ts,
          |  time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS wstart
          |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k))
          |SELECT epoch_ms(wstart) AS window_start,
          | epoch_ms(wstart + INTERVAL '1 hour') AS window_end,
          | 'sliding_count' AS counter_id, 'count' AS counter_type,
          | count(*) AS value
          |FROM w WHERE ts >= wstart AND ts < wstart + INTERVAL '1 hour'
          |GROUP BY 1, 2""".stripMargin,
      "c19_session_count" ->
        """WITH o AS (SELECT user_id, ts,
          |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
          |        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '2 hours'
          |       THEN 1 ELSE 0 END AS new_s
          |  FROM events),
          |s AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
          |      ROWS UNBOUNDED PRECEDING) AS sid FROM o)
          |SELECT user_id, epoch_ms(min(ts)) AS session_start,
          | epoch_ms(max(ts) + INTERVAL '2 hours') AS session_end,
          | 'session_events' AS counter_id, count(*) AS value
          |FROM s GROUP BY user_id, sid""".stripMargin,
      "c26_jq_map_iterate" ->
        """SELECT unnest([value * 10, value * 20]) AS pair
          |FROM (SELECT count(*) AS value FROM events
          |      GROUP BY time_bucket(INTERVAL '1 hour', ts))""".stripMargin,
      "c31_jq_keys_has" ->
        """SELECT unnest([
          |  CASE WHEN value + 2 > 15 THEN (value + 2) * 100 ELSE value + 2 END,
          |  CASE WHEN value * 2 > 15 THEN value * 2 * 100 ELSE value * 2 END]) AS pair
          |FROM (SELECT count(*) AS value FROM events
          |      GROUP BY time_bucket(INTERVAL '1 hour', ts))""".stripMargin,
      // sort_by(.k) over [{k:v}, {k:168-v}, {k:null}]: the null key sorts
      // FIRST, then the two data keys ascending with the ORIGINAL order on
      // ties (stability) — i.e. the CASE below; the jq select's cross-type
      // comparisons are constant-true so every row survives
      "c32_jq_sort_order" ->
        """SELECT unnest(CASE WHEN value <= 168 - value
          |                   THEN [0, value, value + 1]
          |                   ELSE [0, value + 1, value] END) AS vs
          |FROM (SELECT count(*) AS value FROM events
          |      GROUP BY time_bucket(INTERVAL '1 hour', ts))""".stripMargin,
      // c34: per window (count v): s = reduce with double() = 2(v+3v+7) =
      // 8v+14, and the foreach scan emits cumulative steps v, 4v, 4v+7 —
      // one row each
      "c34_jq_def_foreach" ->
        """WITH w AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) AS v FROM events GROUP BY 1)
          |SELECT t, 8*v + 14 AS s, unnest([v, 4*v, 4*v + 7]) AS c FROM w""".stripMargin,
      // c35: slurpBy ≡ plain grouped aggregation of the array the window
      // slurps — length = count, in-order integer fold = sum, max = max,
      // first under event_id order = arg_min. DuckDB sum(BIGINT) is
      // HUGEINT, cast back; n is LONG on both sides.
      "c35_jq_slurp" ->
        """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS window_start,
          | count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id,
          | max(value) AS vmax, arg_min(event_type, event_id) AS first_type
          |FROM events GROUP BY 1""".stripMargin,
      // c36: regex semantics re-expressed relationally — capture head/tail
      // = substr, match("i").offset = 0-based instr, the try/catch over a
      // missing field folds to its constant fallback. Casts to BIGINT
      // mirror the Spark side's long-typed length/offset.
      "c36_jq_regex" ->
        """SELECT event_id AS id, event_type AS et,
          | substr(event_type, 1, 1) AS head,
          | CAST(length(event_type) - 1 AS BIGINT) AS tail_len,
          | CAST(instr(event_type, 'i') - 1 AS BIGINT) AS i_off,
          | regexp_replace(event_type, '[aeiou]', '*', 'g') AS scrubbed,
          | 'none' AS fb
          |FROM events WHERE event_type IN ('click', 'view', 'signup')""".stripMargin,
      // c37: the builtin-surface twin. epoch_us // 1000000 floors to whole
      // seconds like Spark's unix_seconds (epoch(ts)::BIGINT would ROUND —
      // DuckDB's double→int cast rounds, off-by-one on .5+ fractions);
      // round() is half-away-from-zero in both engines; string_split_regex
      // keeps trailing empties exactly like Spark's split; rindex lowers
      // to the reversed first-occurrence formula.
      "c37_jq_builtins" ->
        """SELECT event_id AS id,
          | strftime(make_timestamp((epoch_us(ts) // 1000000) * 1000000),
          |          '%Y-%m-%dT%H:%M:%SZ') AS day,
          | round(sqrt(abs(value))) AS rt,
          | 'string' AS ty,
          | CASE WHEN instr(event_type, 'i') > 0
          |      THEN CAST(instr(event_type, 'i') - 1 AS BIGINT) END AS pos,
          | CASE WHEN instr(event_type, 'i') > 0
          |      THEN CAST(length(event_type)
          |                - instr(reverse(event_type), 'i') AS BIGINT) END AS rpos,
          | contains(event_type, 'ick') AS has_ick,
          | CAST(length(string_split_regex(event_type, '[aeiou]')) AS BIGINT) AS parts,
          | CAST(strlen(event_type) AS BIGINT) AS blen,
          | to_json(event_type)::VARCHAR AS js
          |FROM events""".stripMargin,
      // c39: five schema paths per row, none null-prunable on this input
      "c39_jq_paths" ->
        """SELECT t.p FROM events CROSS JOIN (VALUES ('event_id'), ('payload'),
          | ('payload/type'), ('payload/ids'), ('payload/ids/uid')) AS t(p)"""
          .stripMargin,
      // c72: only the number-typed candidates survive the filter
      "c72_jq_paths_filtered" ->
        """SELECT t.p FROM events CROSS JOIN
          | (VALUES ('event_id'), ('payload/ids/uid')) AS t(p)""".stripMargin,
      // c47: the second builtin tranche, relationally. explode|length =
      // char count; explode|first = unicode(); explode|implode round-trips
      // to the input; fromjson|.k ≡ json_extract_string; [scan]|length =
      // regexp match count; splits ≡ string_split_regex (both keep
      // trailing empties); limit = least(2, parts); [range(n)]|add =
      // n(n-1)/2 (integer division exact — n ≥ 1 here); pow is 2^10 in
      // doubles, exactly representable in both engines.
      "c47_jq_builtins2" ->
        """SELECT event_id AS id,
          | CAST(length(event_type) AS BIGINT) AS cps_n,
          | CAST(unicode(event_type) AS BIGINT) AS first_cp,
          | event_type AS rt,
          | CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k,
          | CAST(length(regexp_extract_all(props, '[a-z_]+')) AS BIGINT) AS letters,
          | CAST(length(string_split_regex(event_type, 'i')) AS BIGINT) AS parts,
          | CAST(least(2, length(string_split_regex(event_type, 'i'))) AS BIGINT) AS lim,
          | CAST(unicode(event_type) * (unicode(event_type) - 1) // 2 AS BIGINT) AS rng,
          | pow(2, 10) AS pw
          |FROM events""".stripMargin,
      // c38: the recursive-descent stream, one UNION ALL branch per
      // document-order position. Variant objects store keys SORTED, so
      // the Spark side's tojson renders sorted key order — the oracle's
      // struct_packs are written pre-sorted to match.
      "c38_jq_descend" ->
        """SELECT 'object' AS ty,
          |  to_json(struct_pack(event_id := event_id,
          |    payload := struct_pack(ids := struct_pack(uid := user_id),
          |                           type := event_type)))::VARCHAR AS js
          |FROM events
          |UNION ALL SELECT 'number', event_id::VARCHAR FROM events
          |UNION ALL SELECT 'object',
          |  to_json(struct_pack(ids := struct_pack(uid := user_id),
          |                      type := event_type))::VARCHAR FROM events
          |UNION ALL SELECT 'string', to_json(event_type)::VARCHAR FROM events
          |UNION ALL SELECT 'object',
          |  to_json(struct_pack(uid := user_id))::VARCHAR FROM events
          |UNION ALL SELECT 'number', user_id::VARCHAR FROM events""".stripMargin,
      // c71: while's doubling chain recomputed as a DuckDB list
      // comprehension over the (bounded) candidate terms
      "c71_jq_while" ->
        """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) % 9 + 1 AS v FROM events GROUP BY 1)
          |SELECT t, to_json([x FOR x IN [v, 3*v, 9*v, 27*v] IF x < 30])::VARCHAR AS w
          |FROM c""".stripMargin,
      // c70: `.. | ..` — each node once per ancestor-or-self: root ×1,
      // event_id ×2, m ×2, uid ×3 (VALUES tables supply the multiplicity)
      "c70_jq_double_descend" ->
        """SELECT 'object' AS ty,
          |  to_json(struct_pack(event_id := event_id,
          |    m := struct_pack(uid := user_id)))::VARCHAR AS js FROM events
          |UNION ALL SELECT 'number', event_id::VARCHAR
          |  FROM events, (VALUES (1), (2)) _(k)
          |UNION ALL SELECT 'object',
          |  to_json(struct_pack(uid := user_id))::VARCHAR
          |  FROM events, (VALUES (1), (2)) _(k)
          |UNION ALL SELECT 'number', user_id::VARCHAR
          |  FROM events, (VALUES (1), (2), (3)) _(k)""".stripMargin,
      // c33: the Spark side evaluates the dialect (as_bool/min/floor); the
      // oracle expresses the equivalent predicate directly. floor() is cast
      // to BIGINT because DuckDB floor returns DOUBLE (Spark's returns LONG);
      // % on BIGINT truncates identically in both engines.
      "c33_expr_dialect" ->
        s"""SELECT $win, 'bool_floor_count' AS counter_id, 'count' AS counter_type,
           | count(*) FILTER (WHERE value >= 50.0
           |   AND CAST(floor(least(value, 150.0)) AS BIGINT) % 2 = 0) AS value
           | FROM events GROUP BY 1, 2""".stripMargin,
      // c52: c25's relational truth restricted to watermark-closed windows
      "c52_stream_engine_e2e" ->
        """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS time,
          | 'metric.cfg_clicks_stream' AS name,
          | count(*) FILTER (WHERE event_type LIKE '%click%') AS value
          |FROM events GROUP BY 1
          |HAVING time + 3600000 < (SELECT epoch_ms(max(ts)) FROM events)""".stripMargin,
      "c25_engine_config_e2e" ->
        """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS time,
          | 'metric.cfg_clicks' AS name,
          | count(*) FILTER (WHERE event_type LIKE '%click%') AS value
          |FROM events GROUP BY 1""".stripMargin,
      "c24_fanout_streaming_parity" ->
        s"""SELECT * FROM (
           | SELECT $win, 'request_count_fo_stream' AS counter_id,
           |  'count' AS counter_type, count(*) AS value
           |  FROM events GROUP BY 1, 2
           |  HAVING window_end <= (SELECT epoch_ms(max(ts)) FROM events)
           | UNION ALL
           | SELECT $win, 'click_count_fo_stream' AS counter_id,
           |  'count' AS counter_type,
           |  count(*) FILTER (WHERE event_type LIKE '%click%') AS value
           |  FROM events GROUP BY 1, 2
           |  HAVING window_end <= (SELECT epoch_ms(max(ts)) FROM events))""".stripMargin,
      "c23_intermediate_streaming_parity" ->
        s"""SELECT $win, 'request_count_rt_stream' AS counter_id,
           | 'count' AS counter_type, count(*) AS value
           | FROM events GROUP BY 1, 2
           | HAVING window_end <= (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', max(ts)))
           |                       FROM events)""".stripMargin,
      "c22_sliding_streaming_parity" ->
        """WITH w AS (SELECT ts,
          |  time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS wstart
          |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k))
          |SELECT epoch_ms(wstart) AS window_start,
          | epoch_ms(wstart + INTERVAL '1 hour') AS window_end,
          | 'sliding_count_stream' AS counter_id, 'count' AS counter_type,
          | count(*) AS value
          |FROM w WHERE ts >= wstart AND ts < wstart + INTERVAL '1 hour'
          |GROUP BY 1, 2
          |HAVING window_end < (SELECT epoch_ms(max(ts)) FROM events)""".stripMargin,
      "c21_session_streaming_parity" ->
        """WITH o AS (SELECT user_id, ts,
          |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
          |        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '2 hours'
          |       THEN 1 ELSE 0 END AS new_s
          |  FROM events),
          |s AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
          |      ROWS UNBOUNDED PRECEDING) AS sid FROM o)
          |SELECT user_id, epoch_ms(min(ts)) AS session_start,
          | epoch_ms(max(ts) + INTERVAL '2 hours') AS session_end,
          | 'session_events_stream' AS counter_id, count(*) AS value
          |FROM s GROUP BY user_id, sid
          |HAVING session_end < (SELECT epoch_ms(max(ts)) FROM events)""".stripMargin,
      "h04_brand_profit" ->
        """SELECT n_name AS supp_nation, p_brand,
          | sum(CAST(floor(l_extendedprice*100) AS BIGINT)
          |     * (100 - CAST(floor(l_discount*100) AS BIGINT)))::BIGINT AS revenue_cpct,
          | count(*)::BIGINT AS n_lines
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |WHERE p_type = 'PROMO'
          |GROUP BY 1, 2""".stripMargin,
      "h09_supplier_diversity" ->
        """SELECT p_brand, p_size::BIGINT AS p_size,
          | count(DISTINCT l_suppkey)::BIGINT AS n_suppliers
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE p_type <> 'PROMO'
          |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          |GROUP BY 1, 2""".stripMargin,
      "h10_min_cost_supplier" ->
        """WITH priced AS (SELECT l_partkey AS partkey, l_suppkey AS suppkey,
          |       CAST(floor(l_extendedprice*100) AS BIGINT) AS price_cents
          |     FROM lineitem JOIN part ON l_partkey = p_partkey
          |     WHERE p_type = 'PROMO'),
          |mn AS (SELECT partkey, min(price_cents) AS min_cents FROM priced GROUP BY 1)
          |SELECT DISTINCT partkey, suppkey, s_name, min_cents
          |FROM priced JOIN mn USING (partkey)
          |JOIN supplier ON suppkey = s_suppkey
          |WHERE price_cents = min_cents""".stripMargin,
      "h11_idle_rich" ->
        """WITH c AS (SELECT c_custkey,
          |       CAST(floor(c_acctbal*100) AS BIGINT) AS bal FROM customer),
          |st AS (SELECT count(*)::BIGINT AS n_pos, sum(bal)::BIGINT AS sum_pos
          |       FROM c WHERE bal > 0)
          |SELECT count(*)::BIGINT AS n_customers, sum(bal)::BIGINT AS total_cents
          |FROM c, st
          |WHERE bal * n_pos > sum_pos
          |  AND c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin,
      "e01_asof_attribution" ->
        """SELECT p.user_id, p.event_id AS purchase_id, epoch_ms(p.ts) AS purchase_ms,
          | c.event_id AS click_id, epoch_ms(c.ts) AS click_ms,
          | epoch_ms(p.ts) - epoch_ms(c.ts) AS gap_ms
          |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
          |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
      "e02_retention" ->
        """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
          |coh AS (SELECT user_id, min(day) AS cohort FROM days GROUP BY 1)
          |SELECT epoch_ms(cohort::TIMESTAMP) AS cohort_ms,
          | date_diff('day', cohort, day)::BIGINT AS day_offset,
          | count(*)::BIGINT AS n_users
          |FROM days JOIN coh USING (user_id) GROUP BY 1, 2""".stripMargin,
      "e03_funnel" ->
        """WITH w1 AS (SELECT user_id, ts, event_type,
          |  min(CASE WHEN event_type = 'signup' THEN ts END)
          |    OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sign_so_far
          |  FROM events),
          |w2 AS (SELECT *,
          |  min(CASE WHEN event_type = 'click' AND sign_so_far < ts
          |            AND ts <= sign_so_far + INTERVAL '6 hours' THEN ts END)
          |    OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS click_so_far
          |  FROM w1),
          |u AS (SELECT user_id,
          |  max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS s,
          |  max(CASE WHEN event_type = 'click' AND sign_so_far < ts
          |           AND ts <= sign_so_far + INTERVAL '6 hours' THEN 1 ELSE 0 END) AS c,
          |  max(CASE WHEN event_type = 'purchase' AND click_so_far < ts
          |           AND ts <= click_so_far + INTERVAL '6 hours' THEN 1 ELSE 0 END) AS p
          |  FROM w2 GROUP BY 1)
          |SELECT (CASE WHEN p = 1 THEN 3 WHEN c = 1 THEN 2
          |             WHEN s = 1 THEN 1 ELSE 0 END)::BIGINT AS funnel_stage,
          | count(*)::BIGINT AS n_users
          |FROM u GROUP BY 1""".stripMargin,
      "h15_returned_items" ->
        """WITH pc AS (SELECT o_custkey,
          |  sum(CAST(floor(l_extendedprice*100) AS BIGINT)
          |      * (100 - CAST(floor(l_discount*100) AS BIGINT)))::BIGINT AS revenue_cpct
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |  WHERE l_returnflag = 'R'
          |    AND o_orderdate >= TIMESTAMP '1997-01-01'
          |    AND o_orderdate < TIMESTAMP '1997-07-01'
          |  GROUP BY 1)
          |SELECT c_custkey, c_name, n_name,
          | CAST(floor(c_acctbal*100) AS BIGINT) AS acctbal_cents, revenue_cpct
          |FROM pc JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |ORDER BY revenue_cpct DESC, c_custkey LIMIT 20""".stripMargin,
      "h18_top_supplier" ->
        """WITH ps AS (SELECT l_suppkey,
          |  sum(CAST(floor(l_extendedprice*100) AS BIGINT)
          |      * (100 - CAST(floor(l_discount*100) AS BIGINT)))::BIGINT AS total_cpct
          |  FROM lineitem
          |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          |    AND l_shipdate < TIMESTAMP '1997-04-01'
          |  GROUP BY 1)
          |SELECT s_suppkey, s_name, total_cpct
          |FROM ps JOIN supplier ON l_suppkey = s_suppkey
          |WHERE total_cpct = (SELECT max(total_cpct) FROM ps)""".stripMargin,
      "h16_revenue_change" ->
        """SELECT sum(CAST(floor(l_extendedprice*100) AS BIGINT)
          |     * CAST(floor(l_discount*100) AS BIGINT))::BIGINT AS revenue_cpct,
          | count(*)::BIGINT AS n_lines
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          |  AND l_shipdate < TIMESTAMP '1998-01-01'
          |  AND l_discount >= 0.05 AND l_discount <= 0.07
          |  AND l_quantity < 24""".stripMargin,
      "h19_disjunctive_revenue" ->
        """SELECT sum(CAST(floor(l_extendedprice*100) AS BIGINT)
          |     * (100 - CAST(floor(l_discount*100) AS BIGINT)))::BIGINT AS revenue_cpct,
          | count(*)::BIGINT AS n_lines
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
          |       AND l_quantity BETWEEN 1 AND 11)
          |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30
          |       AND l_quantity BETWEEN 10 AND 20)
          |   OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50
          |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
      "h21_dominant_suppliers" ->
        """WITH sp AS (SELECT l_suppkey, l_partkey,
          |    sum(floor(l_quantity))::BIGINT AS s_qty
          |  FROM lineitem JOIN part ON l_partkey = p_partkey
          |  WHERE p_type = 'PROMO' GROUP BY 1, 2),
          |t AS (SELECT l_partkey, sum(s_qty)::BIGINT AS t_qty FROM sp GROUP BY 1),
          |dom AS (SELECT l_suppkey, count(*)::BIGINT AS n_parts
          |  FROM sp JOIN t USING (l_partkey) WHERE 8*s_qty > t_qty GROUP BY 1)
          |SELECT s_suppkey, s_name, n_parts
          |FROM supplier JOIN dom ON s_suppkey = l_suppkey""".stripMargin,
      // h22: the per-part aggregate joins a 1-row (total, n) scalar;
      // HUGEINT is DuckDB's DECIMAL(38,0) stand-in for the cross-multiply
      "h24_revenue_cube" ->
        """SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n_lines,
          | sum(CAST(floor(l_extendedprice*100) AS BIGINT))::BIGINT AS rev_cents,
          | GROUPING_ID(l_returnflag, l_linestatus)::BIGINT AS grp
          |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
      "h23_salted_join" ->
        """SELECT o_orderpriority, count(*)::BIGINT AS n_lines,
          | sum(CAST(floor(l_extendedprice*100) AS BIGINT))::BIGINT AS rev_cents
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY 1""".stripMargin,
      "h22_important_parts" ->
        """WITH per AS (SELECT l_partkey,
          |    sum(CAST(floor(l_extendedprice*100) AS BIGINT))::BIGINT AS part_cents
          |  FROM lineitem GROUP BY 1),
          |tot AS (SELECT sum(part_cents)::HUGEINT AS total,
          |               count(*)::HUGEINT AS n FROM per)
          |SELECT l_partkey AS partkey, part_cents FROM per, tot
          |WHERE part_cents::HUGEINT * n * 10 > 12 * total""".stripMargin,
      "h20_lateness_matrix" ->
        """SELECT l_returnflag,
          | sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
          |      THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
          | sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
          |      THEN 0 ELSE 1 END)::BIGINT AS low_line_count
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          |  AND l_shipdate < TIMESTAMP '1998-01-01'
          |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          |GROUP BY 1""".stripMargin,
      "h17_market_share" ->
        """WITH mc AS (SELECT c_custkey FROM customer
          |  JOIN nation ON c_nationkey = n_nationkey
          |  JOIN region ON n_regionkey = r_regionkey
          |  WHERE r_name = 'ASIA'),
          |sn AS (SELECT s_suppkey, n_name AS supp_nation FROM supplier
          |  JOIN nation ON s_nationkey = n_nationkey),
          |vol AS (SELECT year(o_orderdate)::BIGINT AS o_year, supp_nation,
          |  CAST(floor(l_extendedprice*100) AS BIGINT)
          |    * (100 - CAST(floor(l_discount*100) AS BIGINT)) AS v
          |  FROM lineitem
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN mc ON o_custkey = c_custkey
          |  JOIN sn ON l_suppkey = s_suppkey)
          |SELECT o_year,
          | sum(CASE WHEN supp_nation = 'NATION_7' THEN v ELSE 0 END)::BIGINT AS nation_cpct,
          | sum(v)::BIGINT AS total_cpct,
          | (sum(CASE WHEN supp_nation = 'NATION_7' THEN v ELSE 0 END) * 1000000
          |   // sum(v))::BIGINT AS share_ppm
          |FROM vol GROUP BY 1""".stripMargin,
      "h13_order_histogram" ->
        """WITH pc AS (SELECT o_custkey, count(*)::BIGINT AS n FROM orders
          |  WHERE o_orderpriority <> '1-URGENT' GROUP BY 1)
          |SELECT coalesce(n, 0)::BIGINT AS c_count, count(*)::BIGINT AS custdist
          |FROM customer LEFT JOIN pc ON c_custkey = o_custkey
          |GROUP BY 1""".stripMargin,
      "e05_user_sessions" ->
        """WITH o AS (SELECT user_id, ts,
          |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
          |        OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
          |             + INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
          |  FROM events),
          |s AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
          |      ROWS UNBOUNDED PRECEDING) AS session_seq FROM o)
          |SELECT user_id, session_seq::BIGINT AS session_seq,
          | epoch_ms(min(ts)) AS start_ms, epoch_ms(max(ts)) AS end_ms,
          | count(*)::BIGINT AS n_events,
          | epoch_ms(max(ts)) - epoch_ms(min(ts)) AS duration_ms
          |FROM s GROUP BY user_id, session_seq""".stripMargin,
      // e15: lag over the per-(type, hour) aggregate — prev/delta NULL on
      // each type's first observed hour, gap_hours exposes calendar holes
      "e15_count_deltas" ->
        """WITH hourly AS (SELECT event_type,
          |  epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS hour_ms,
          |  count(*)::BIGINT AS n_events FROM events GROUP BY 1, 2)
          |SELECT event_type, hour_ms, n_events,
          |  lag(n_events) OVER tw AS prev_n,
          |  (n_events - lag(n_events) OVER tw)::BIGINT AS delta,
          |  ((hour_ms - lag(hour_ms) OVER tw) // 3600000)::BIGINT AS gap_hours
          |FROM hourly WINDOW tw AS (PARTITION BY event_type ORDER BY hour_ms)""".stripMargin,
      "e06_count_spikes" ->
        """WITH hourly AS (SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour,
          |  count(*)::BIGINT AS n FROM events GROUP BY 1, 2),
          |h2 AS (SELECT *, epoch_ms(hour) // 3600000 AS hn FROM hourly),
          |w AS (SELECT event_type, hour, n,
          |  count(*) OVER tw AS c,
          |  coalesce(sum(n) OVER tw, 0)::BIGINT AS s,
          |  coalesce(sum(n::HUGEINT * n) OVER tw, 0::HUGEINT) AS q
          |  FROM h2 WINDOW tw AS (PARTITION BY event_type ORDER BY hn
          |    RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
          |SELECT epoch_ms(hour) AS hour_ms, event_type, n AS n_events,
          | c::BIGINT AS trail_cnt, s AS trail_sum,
          | (CASE WHEN c >= 12 AND n*c - s > 0
          |   AND ((n*c - s)::HUGEINT * (n*c - s)) > 9 * (c::HUGEINT * q - s::HUGEINT * s)
          |  THEN 1 ELSE 0 END)::BIGINT AS is_spike
          |FROM w""".stripMargin,
      // e12: e06 restricted to hours the watermark closed (all but the
      // max-ts hour); trailing stats only look BACKWARD, so flags on
      // closed hours are identical over the closed subset
      "e12_stream_spikes_parity" ->
        """WITH hourly AS (SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour,
          |  count(*)::BIGINT AS n FROM events GROUP BY 1, 2),
          |h2 AS (SELECT *, epoch_ms(hour) // 3600000 AS hn FROM hourly),
          |w AS (SELECT event_type, hour, n,
          |  count(*) OVER tw AS c,
          |  coalesce(sum(n) OVER tw, 0)::BIGINT AS s,
          |  coalesce(sum(n::HUGEINT * n) OVER tw, 0::HUGEINT) AS q
          |  FROM h2 WINDOW tw AS (PARTITION BY event_type ORDER BY hn
          |    RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
          |SELECT epoch_ms(hour) AS hour_ms, event_type, n AS n_events,
          | c::BIGINT AS trail_cnt, s AS trail_sum,
          | (CASE WHEN c >= 12 AND n*c - s > 0
          |   AND ((n*c - s)::HUGEINT * (n*c - s)) > 9 * (c::HUGEINT * q - s::HUGEINT * s)
          |  THEN 1 ELSE 0 END)::BIGINT AS is_spike
          |FROM w
          |WHERE epoch_ms(hour + INTERVAL '1 hour') <=
          |      (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', max(ts))) FROM events)"""
          .stripMargin,
      "e08_gap_quantiles" ->
        """WITH g AS (SELECT event_type,
          |  epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY event_type, user_id
          |    ORDER BY ts)) AS gap_ms
          |  FROM events),
          |h AS (SELECT event_type, gap_ms, count(*)::BIGINT AS cnt FROM g
          |      WHERE gap_ms IS NOT NULL GROUP BY 1, 2),
          |c AS (SELECT event_type, gap_ms, cnt,
          |  sum(cnt) OVER (PARTITION BY event_type ORDER BY gap_ms) AS cum,
          |  sum(cnt) OVER (PARTITION BY event_type) AS n FROM h)
          |SELECT event_type, p_ppm, gap_ms
          |FROM c CROSS JOIN (SELECT unnest([500000, 900000, 990000]::BIGINT[]) AS p_ppm)
          |WHERE (((n-1) * p_ppm) // 1000000 + 1)::BIGINT > cum - cnt
          |  AND (((n-1) * p_ppm) // 1000000 + 1)::BIGINT <= cum""".stripMargin,
      "e09_value_quantiles" ->
        """WITH h AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS window_start,
          |  CAST(floor(value * 100) AS BIGINT) AS value_cents, count(*)::BIGINT AS cnt
          |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
          |c AS (SELECT window_start, value_cents, cnt,
          |  sum(cnt) OVER (PARTITION BY window_start ORDER BY value_cents) AS cum,
          |  sum(cnt) OVER (PARTITION BY window_start) AS n FROM h)
          |SELECT window_start, p_ppm, value_cents
          |FROM c CROSS JOIN (SELECT unnest([500000, 900000, 990000]::BIGINT[]) AS p_ppm)
          |WHERE (((n-1) * p_ppm) // 1000000 + 1)::BIGINT > cum - cnt
          |  AND (((n-1) * p_ppm) // 1000000 + 1)::BIGINT <= cum""".stripMargin,
      // e13: exact quantiles + n (e09's SQL) + literal-true verdicts —
      // the sketch gate is measured Spark-side (a01 pattern)
      "e13_quantile_sketch_gate" ->
        """WITH h AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS window_start,
          |  CAST(floor(value * 100) AS BIGINT) AS value_cents, count(*)::BIGINT AS cnt
          |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
          |c AS (SELECT window_start, value_cents, cnt,
          |  sum(cnt) OVER (PARTITION BY window_start ORDER BY value_cents) AS cum,
          |  sum(cnt) OVER (PARTITION BY window_start) AS n FROM h)
          |SELECT window_start, p_ppm, value_cents, n::BIGINT AS n,
          |  1::BIGINT AS within_eps
          |FROM c CROSS JOIN (SELECT unnest([500000, 900000, 990000]::BIGINT[]) AS p_ppm)
          |WHERE (((n-1) * p_ppm) // 1000000 + 1)::BIGINT > cum - cnt
          |  AND (((n-1) * p_ppm) // 1000000 + 1)::BIGINT <= cum""".stripMargin,
      // e14: e07's exact top-3 SQL + the window total + literal-true
      // verdicts — the Misra–Gries bound is measured Spark-side (a01/e13
      // pattern)
      "e14_hitter_sketch_gate" ->
        """WITH c AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS h, user_id,
          |  count(*)::BIGINT AS n_events FROM events GROUP BY 1, 2),
          |t AS (SELECT h, sum(n_events)::BIGINT AS n FROM c GROUP BY 1),
          |r AS (SELECT *, row_number() OVER (PARTITION BY h
          |  ORDER BY n_events DESC, user_id) AS rank FROM c)
          |SELECT epoch_ms(r.h) AS window_start, user_id, n_events,
          |  rank::BIGINT AS rank, t.n, 1::BIGINT AS within_bound
          |FROM r JOIN t ON r.h = t.h WHERE rank <= 3""".stripMargin,
      // e10: the two-phase hop must be invisible — same SQL as e09
      "e10_twophase_quantiles" ->
        """WITH h AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS window_start,
          |  CAST(floor(value * 100) AS BIGINT) AS value_cents, count(*)::BIGINT AS cnt
          |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
          |c AS (SELECT window_start, value_cents, cnt,
          |  sum(cnt) OVER (PARTITION BY window_start ORDER BY value_cents) AS cum,
          |  sum(cnt) OVER (PARTITION BY window_start) AS n FROM h)
          |SELECT window_start, p_ppm, value_cents
          |FROM c CROSS JOIN (SELECT unnest([500000, 900000, 990000]::BIGINT[]) AS p_ppm)
          |WHERE (((n-1) * p_ppm) // 1000000 + 1)::BIGINT > cum - cnt
          |  AND (((n-1) * p_ppm) // 1000000 + 1)::BIGINT <= cum""".stripMargin,
      "e07_heavy_hitters" ->
        """WITH c AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS h, user_id,
          |  count(*)::BIGINT AS n_events FROM events GROUP BY 1, 2),
          |r AS (SELECT *, row_number() OVER (PARTITION BY h
          |  ORDER BY n_events DESC, user_id) AS rank FROM c)
          |SELECT epoch_ms(h) AS window_start, user_id, n_events, rank::BIGINT AS rank
          |FROM r WHERE rank <= 3""".stripMargin,
      // e11 = e07 through the serialized shard hop; same oracle, the
      // decomposition must be invisible
      "e11_twophase_hitters" ->
        """WITH c AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS h, user_id,
          |  count(*)::BIGINT AS n_events FROM events GROUP BY 1, 2),
          |r AS (SELECT *, row_number() OVER (PARTITION BY h
          |  ORDER BY n_events DESC, user_id) AS rank FROM c)
          |SELECT epoch_ms(h) AS window_start, user_id, n_events, rank::BIGINT AS rank
          |FROM r WHERE rank <= 3""".stripMargin,
      "h14_small_qty_revenue" ->
        """WITH li AS (SELECT l_partkey AS pk, floor(l_quantity)::BIGINT AS qty,
          |   CAST(floor(l_extendedprice*100) AS BIGINT) AS price_cents
          | FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_type = 'PROMO'),
          |st AS (SELECT pk, sum(qty)::BIGINT AS s, count(*)::BIGINT AS c FROM li GROUP BY 1)
          |SELECT sum(price_cents)::BIGINT AS sum_cents, count(*)::BIGINT AS n_lines
          |FROM li JOIN st USING (pk) WHERE qty * c * 5 < s""".stripMargin,
      "e04_rolling_activity" ->
        """WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS n_events,
          |  count(DISTINCT user_id)::BIGINT AS n_users FROM events GROUP BY 1),
          |d2 AS (SELECT *, date_diff('day', DATE '1970-01-01', day) AS dn FROM daily)
          |SELECT epoch_ms(day::TIMESTAMP) AS day_ms, n_events, n_users,
          | sum(n_events) OVER (ORDER BY dn
          |   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)::BIGINT AS roll7_events,
          | sum(n_users) OVER (ORDER BY dn
          |   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)::BIGINT AS roll7_user_days
          |FROM d2""".stripMargin,
      "h12_lonely_late" ->
        """WITH pairs AS (SELECT l_orderkey AS ok, l_suppkey AS sk,
          |  max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
          |      THEN 1 ELSE 0 END) AS late
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
          |st AS (SELECT ok, count(*) AS n_supp, sum(late) AS n_late
          |       FROM pairs GROUP BY 1)
          |SELECT s_name, count(*)::BIGINT AS n_orders
          |FROM pairs JOIN st USING (ok) JOIN supplier ON sk = s_suppkey
          |WHERE late = 1 AND n_supp > 1 AND n_late = 1
          |GROUP BY 1""".stripMargin,
      "h03_region_revenue" ->
        """SELECT n_name,
          | sum(CAST(floor(l_extendedprice*100) AS BIGINT)
          |     * (100 - CAST(floor(l_discount*100) AS BIGINT)))::BIGINT AS revenue_cpct
          |FROM region JOIN nation ON n_regionkey = r_regionkey
          |JOIN customer ON c_nationkey = n_nationkey
          |JOIN orders ON o_custkey = c_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1997-01-01'
          |  AND o_orderdate < TIMESTAMP '1998-01-01'
          |GROUP BY 1""".stripMargin,
    ) ++ pipelineOracles
  }

  /** DuckDB oracles for the training-data pipeline operators. All hashes are
    * md5-derived and all ratios integer ppm, so these reproduce the Spark
    * results bit-for-bit (see PortableHash).
    */
  private def pipelineOracles: Map[String, String] = {
    val toks = "string_split(text, ' ')"
    val enStop = "['the','a','of','and','to','in','is','for','on','with']"
    // distinct word 3-gram shingles of a token list column t
    val kgrams =
      "list_transform(generate_series(1, len(t)-2), i -> t[i]||' '||t[i+1]||' '||t[i+2])"
    val h60 = (e: String) => s"(('0x' || substr(md5($e), 1, 15))::BIGINT)"
    // ANN top-k oracles, hoisted: s07's recall eval embeds both as CTEs
    val s01Sql =
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 50 = 0),
        |scored AS (SELECT query_id, e.vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY list_cosine_similarity(qe, e.embedding) DESC, e.vec_id) AS rank
        |  FROM q JOIN embeddings e ON e.vec_id != q.query_id)
        |SELECT query_id, rank::BIGINT AS rank, neighbor_id FROM scored WHERE rank <= 5""".stripMargin
    def s02SqlN(np: Int): String =
      s"""WITH cent AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id % 25 = 0),
        |assigned AS (SELECT vec_id, embedding, cell FROM (
        |  SELECT e.vec_id, e.embedding, c.cell,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cell) AS rn
        |  FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 50 = 0),
        |probes AS (SELECT query_id, qe, cell FROM (
        |  SELECT q.query_id, q.qe, c.cell,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qe, c.ce) DESC, c.cell) AS rn
        |  FROM q CROSS JOIN cent c) WHERE rn <= $np),
        |scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY p.query_id
        |    ORDER BY list_cosine_similarity(p.qe, a.embedding) DESC, a.vec_id) AS rank
        |  FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id != p.query_id)
        |SELECT query_id, rank::BIGINT AS rank, neighbor_id FROM scored WHERE rank <= 5""".stripMargin
    val s02Sql = s02SqlN(3)
    // s23: the s01 truth (rank 1 only) left-joined to the s02 IVF list —
    // integer reciprocal-rank points, 0 on a miss
    val s23Sql =
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 50 = 0),
        |bs AS (SELECT query_id, e.vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY list_cosine_similarity(qe, e.embedding) DESC, e.vec_id) AS rank
        |  FROM q JOIN embeddings e ON e.vec_id != q.query_id),
        |t AS (SELECT query_id, neighbor_id AS relevant_id FROM bs WHERE rank = 1),
        |cent AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id % 25 = 0),
        |assigned AS (SELECT vec_id, embedding, cell FROM (
        |  SELECT e.vec_id, e.embedding, c.cell,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cell) AS rn
        |  FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
        |probes AS (SELECT query_id, qe, cell FROM (
        |  SELECT q.query_id, q.qe, c.cell,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qe, c.ce) DESC, c.cell) AS rn
        |  FROM q CROSS JOIN cent c) WHERE rn <= 3),
        |ivf AS (SELECT query_id, neighbor_id, rank FROM (
        |  SELECT p.query_id, a.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY p.query_id
        |      ORDER BY list_cosine_similarity(p.qe, a.embedding) DESC, a.vec_id) AS rank
        |  FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id != p.query_id) z
        |  WHERE rank <= 5)
        |SELECT t.query_id, t.relevant_id,
        |  coalesce(ivf.rank, 0)::BIGINT AS found_rank,
        |  coalesce(1000000000 // ivf.rank, 0)::BIGINT AS points
        |FROM t LEFT JOIN ivf ON ivf.query_id = t.query_id
        |  AND ivf.neighbor_id = t.relevant_id""".stripMargin
    // IVF-PQ ADC pipeline, parameterized by the final shortlist depth —
    // s08 uses it at k=5, s13 re-ranks its 20-deep shortlist exactly
    def s08Sql(lim: Int): String =
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
         |           FROM embeddings),
         |ms AS (SELECT unnest(generate_series(0, 7)) AS m),
         |cb AS (SELECT m, vec_id AS code, v[m*8+1 : m*8+8] AS cv
         |       FROM v CROSS JOIN ms WHERE vec_id < 16),
         |sv AS (SELECT vec_id, m, v[m*8+1 : m*8+8] AS s FROM v CROSS JOIN ms),
         |d AS (SELECT vec_id, sv.m, code,
         |      list_sum(list_transform(generate_series(1, 8),
         |        i -> (s[i] - cv[i]) * (s[i] - cv[i]))) AS dist
         |      FROM sv JOIN cb ON sv.m = cb.m),
         |pq AS (SELECT vec_id, m, code FROM (
         |       SELECT vec_id, m, code,
         |         row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS rn
         |       FROM d) WHERE rn = 1),
         |codes AS (SELECT vec_id, list(code ORDER BY m) AS codes FROM pq GROUP BY vec_id),
         |cent AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id % 25 = 0),
         |assigned AS (SELECT vec_id, cell FROM (
         |  SELECT e.vec_id, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cell) AS rn
         |  FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 50 = 0),
         |qd AS (SELECT query_id, s.m, code,
         |       list_sum(list_transform(generate_series(1, 8),
         |         i -> (qs[i] - cv[i]) * (qs[i] - cv[i]))) AS dist
         |       FROM (SELECT query_id, m,
         |             list_transform(qe, x -> x::DOUBLE)[m*8+1 : m*8+8] AS qs
         |             FROM q CROSS JOIN ms) s
         |       JOIN cb ON s.m = cb.m),
         |dtab AS (SELECT query_id, list(dist ORDER BY m, code) AS dtab FROM qd GROUP BY query_id),
         |probes AS (SELECT query_id, cell FROM (
         |  SELECT q.query_id, c.cell,
         |    row_number() OVER (PARTITION BY q.query_id
         |      ORDER BY list_cosine_similarity(q.qe, c.ce) DESC, c.cell) AS rn
         |  FROM q CROSS JOIN cent c) WHERE rn <= 3),
         |scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
         |  row_number() OVER (PARTITION BY p.query_id ORDER BY
         |    list_sum(list_transform(generate_series(0, 7),
         |      m -> t.dtab[m*16 + cd.codes[m+1] + 1])) ASC,
         |    a.vec_id ASC) AS rank
         |  FROM probes p JOIN dtab t USING (query_id)
         |  JOIN assigned a ON p.cell = a.cell AND a.vec_id != p.query_id
         |  JOIN codes cd ON cd.vec_id = a.vec_id)
         |SELECT query_id, rank::BIGINT AS rank, neighbor_id FROM scored WHERE rank <= $lim""".stripMargin
    val s13Sql =
      s"""WITH short AS (${s08Sql(20)}),
         |q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 50 = 0)
         |SELECT query_id, rank, neighbor_id FROM (
         |  SELECT s.query_id,
         |    row_number() OVER (PARTITION BY s.query_id
         |      ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC,
         |               s.neighbor_id ASC)::BIGINT AS rank,
         |    s.neighbor_id
         |  FROM short s
         |  JOIN q ON q.query_id = s.query_id
         |  JOIN embeddings e ON e.vec_id = s.neighbor_id)
         |WHERE rank <= 5""".stripMargin
    // media shared-frame clusters (m05) — hoisted: m06's dedup-apply
    // embeds it as a CTE
    val m05Sql =
      """WITH RECURSIVE fr AS (SELECT doc_id, md5(substr(text, (i*100+1)::INT, 100)) AS frame_md5
        |  FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
        |  WHERE i % 2 = 0 AND i*100 < length(text)),
        |ctr AS (SELECT frame_md5, min(doc_id) AS a FROM fr GROUP BY 1),
        |p AS (SELECT DISTINCT ctr.a, fr.doc_id AS b
        |      FROM fr JOIN ctr USING (frame_md5) WHERE fr.doc_id != ctr.a),
        |nodes AS (SELECT a AS n FROM p UNION SELECT b FROM p),
        |e AS (SELECT a AS u, b AS v FROM p UNION SELECT b AS u, a AS v FROM p),
        |reach(n, m) AS (
        |  SELECT n, n FROM nodes
        |  UNION
        |  SELECT r.n, e.v FROM reach r JOIN e ON r.m = e.u)
        |SELECT n AS node, min(m) AS component FROM reach GROUP BY n""".stripMargin
    // shared MinHash CTE chain (shingle → KM double-hash family → signature
    // → LSH bands → candidate pairs → signature-estimated similarity)
    // t32's NB scoring SQL, hoisted: t33 (the streaming face) must
    // hash-match the same oracle rows
    val t32Sql =
      s"""WITH tk AS (SELECT doc_id, lang AS label,
           |    ${h60("'nb:' || token")} % 1024 AS b
           |  FROM (SELECT doc_id, lang, unnest($toks) AS token FROM documents)),
           |cls AS (SELECT lang AS label, count(*)::BIGINT AS dn FROM documents GROUP BY 1),
           |tot AS (SELECT count(*)::BIGINT AS d FROM documents),
           |cnt AS (SELECT label, b, count(*)::BIGINT AS c FROM tk GROUP BY 1, 2),
           |ttl AS (SELECT label, count(*)::BIGINT AS t FROM tk GROUP BY 1),
           |dense AS (SELECT ttl.label, g.b,
           |    (length(bin((coalesce(c.c, 0) + 1)::BIGINT)) - 1)
           |  - (length(bin((ttl.t + 1024)::BIGINT)) - 1) AS w
           |  FROM ttl CROSS JOIN (SELECT unnest(generate_series(0, 1023)) AS b) g
           |  LEFT JOIN cnt c ON c.label = ttl.label AND c.b = g.b),
           |prior AS (SELECT label,
           |    (length(bin(dn)) - 1) - (length(bin((SELECT d FROM tot))) - 1) AS p
           |  FROM cls),
           |sc AS (SELECT tk.doc_id, dense.label,
           |    (max(prior.p) + sum(dense.w))::BIGINT AS score
           |  FROM tk JOIN dense ON dense.b = tk.b
           |  JOIN prior ON prior.label = dense.label
           |  GROUP BY 1, 2),
           |best AS (SELECT doc_id, label AS pred, score AS score_bits,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY score DESC, label DESC) AS rn
           |  FROM sc)
           |SELECT b.doc_id, b.pred, b.score_bits,
           |  (b.pred = d.lang)::BIGINT AS self_match
           |FROM best b JOIN documents d USING (doc_id) WHERE b.rn = 1""".stripMargin
    // t25's perplexity SQL, hoisted: t36's tercile split nests it
    val t25Sql =
      s"""WITH tr AS (SELECT doc_id,
           |    ${h60("'lm2:' || g")} AS g2,
           |    ${h60("'lm1:' || string_split(g, ' ')[1]")} AS g1
           |  FROM (SELECT doc_id,
           |    unnest(list_transform(generate_series(1, len(t)-1),
           |      i -> t[i]||' '||t[i+1])) AS g
           |    FROM (SELECT doc_id, $toks AS t FROM documents))),
           |big AS (SELECT g2, count(*) AS c2 FROM tr GROUP BY 1),
           |pre AS (SELECT g1, count(*) AS c1 FROM tr GROUP BY 1),
           |voc AS (SELECT count(DISTINCT w) AS v FROM (
           |  SELECT unnest($toks) AS w FROM documents)),
           |bits AS (SELECT doc_id,
           |    (length(bin((c1+v)::BIGINT))-1) - (length(bin((c2+1)::BIGINT))-1) AS bits
           |  FROM tr JOIN big USING (g2) JOIN pre USING (g1), voc)
           |SELECT doc_id, count(*)::BIGINT AS n_transitions,
           |       sum(bits)::BIGINT AS total_bits,
           |       (sum(bits) * 1000000 // count(*))::BIGINT AS mean_bits_ppm
           |FROM bits GROUP BY 1""".stripMargin
    val minhashCtes =
      s"""kg AS (SELECT doc_id, list_distinct($kgrams) AS gs FROM (SELECT doc_id, $toks AS t FROM documents)),
         |sh AS (SELECT doc_id, unnest(gs) AS g FROM kg),
         |h2 AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS h1,
         |       (('0x' || substr(md5(g), 16, 14))::BIGINT % (1::BIGINT << 55)) AS h2 FROM sh),
         |hs AS (SELECT doc_id, i, min((h1 + i * h2) % 2305843009213693951) AS h
         |       FROM h2 CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) GROUP BY doc_id, i),
         |sig AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM hs GROUP BY doc_id),
         |bands AS (SELECT doc_id, b, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS key
         |          FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b)),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x
         |         JOIN bands y ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id),
         |est AS (SELECT a, b,
         |  (len(list_filter(generate_series(1, 64), i -> sa.sig[i] = sb.sig[i])) * 1000000 // 64)::BIGINT AS est_ppm
         |  FROM cand JOIN sig sa ON cand.a = sa.doc_id JOIN sig sb ON cand.b = sb.doc_id)""".stripMargin
    // the CCNet verdict CTEs (t03 langid + t26 rules + t25 perplexity
    // verdicts), shared by t28 and the t29 pipeline composition
    val ccnetCtes =
      s"""s AS (SELECT doc_id,
       |  len(list_filter($toks, t -> list_contains(['der','die','das','und','ist','von','mit','den','ein','nicht'], t)))::BIGINT AS s_de,
       |  len(list_filter($toks, t -> list_contains($enStop, t)))::BIGINT AS s_en,
       |  len(list_filter($toks, t -> list_contains(['el','la','de','que','y','en','un','es','por','con'], t)))::BIGINT AS s_es,
       |  len(list_filter($toks, t -> list_contains(['le','la','de','et','les','des','un','une','du','dans'], t)))::BIGINT AS s_fr,
       |  len(list_filter($toks, t -> list_contains(['de','shi','le','zai','you','wo','ta','men','zhe','na'], t)))::BIGINT AS s_zh
       |  FROM documents),
       |langid AS (SELECT doc_id,
       |  CASE WHEN g = 0 THEN 'und' WHEN s_de = g THEN 'de' WHEN s_en = g THEN 'en'
       |       WHEN s_es = g THEN 'es' WHEN s_fr = g THEN 'fr' ELSE 'zh' END AS pred_lang,
       |  g FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS g FROM s)),
       |lok AS (SELECT d.doc_id,
       |  (l.pred_lang = d.lang AND l.g > 0)::BIGINT AS lang_ok
       |  FROM documents d JOIN langid l USING (doc_id)),
       |gm AS (SELECT doc_id, len(t)::BIGINT AS n,
       |    greatest(length(text) - (len(t) - 1), 0)::BIGINT AS wc,
       |    len(list_filter(t, w -> regexp_matches(w, '[a-z]')))::BIGINT AS na,
       |    len(list_filter(list_distinct(t),
       |        w -> list_contains($enStop, w)))::BIGINT AS ns
       |  FROM (SELECT doc_id, text, $toks AS t FROM documents)),
       |rules AS (SELECT doc_id,
       |  ((n >= 50 AND n <= 100000)
       |    AND ((wc * 1000000 // greatest(n, 1)) BETWEEN 3000000 AND 10000000)
       |    AND (na * 1000000 // greatest(n, 1)) >= 800000
       |    AND ns >= 2)::BIGINT AS rules_ok FROM gm),
       |tr AS (SELECT doc_id,
       |    ${h60("'lm2:' || g")} AS g2,
       |    ${h60("'lm1:' || string_split(g, ' ')[1]")} AS g1
       |  FROM (SELECT doc_id,
       |    unnest(list_transform(generate_series(1, len(t)-1),
       |      i -> t[i]||' '||t[i+1])) AS g
       |    FROM (SELECT doc_id, $toks AS t FROM documents))),
       |big AS (SELECT g2, count(*) AS c2 FROM tr GROUP BY 1),
       |pre AS (SELECT g1, count(*) AS c1 FROM tr GROUP BY 1),
       |voc AS (SELECT count(DISTINCT w) AS v FROM (
       |  SELECT unnest($toks) AS w FROM documents)),
       |ppl AS (SELECT doc_id,
       |    (sum((length(bin((c1+v)::BIGINT))-1) - (length(bin((c2+1)::BIGINT))-1))
       |      * 1000000 // count(*))::BIGINT AS mb
       |  FROM tr JOIN big USING (g2) JOIN pre USING (g1), voc GROUP BY 1),
       |pok AS (SELECT doc_id,
       |  (mb BETWEEN 1000000 AND 4500000)::BIGINT AS ppl_ok FROM ppl)""".stripMargin
    Map(
      "t01_token_count" ->
        s"""SELECT doc_id, len($toks)::BIGINT AS n_tokens,
           | len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS n_bpe_tokens
           | FROM documents""".stripMargin,
      "t02_quality_score" ->
        s"""SELECT doc_id, length(text)::BIGINT AS n_chars_m,
           | (len(regexp_extract_all(text, '[^a-z0-9 ]')) * 1000000 // length(text))::BIGINT AS punct_ppm,
           | (len(list_filter($toks, t -> list_contains($enStop, t))) * 1000000 // len($toks))::BIGINT AS stopword_ppm,
           | (least(length(text), 500) * 1000000 // 500)::BIGINT AS len_ppm,
           | ((1000000 - punct_ppm + stopword_ppm + len_ppm) // 3)::BIGINT AS quality_ppm
           | FROM documents""".stripMargin,
      "t03_lang_id" ->
        s"""WITH s AS (SELECT doc_id,
           |  len(list_filter($toks, t -> list_contains(['der','die','das','und','ist','von','mit','den','ein','nicht'], t)))::BIGINT AS s_de,
           |  len(list_filter($toks, t -> list_contains($enStop, t)))::BIGINT AS s_en,
           |  len(list_filter($toks, t -> list_contains(['el','la','de','que','y','en','un','es','por','con'], t)))::BIGINT AS s_es,
           |  len(list_filter($toks, t -> list_contains(['le','la','de','et','les','des','un','une','du','dans'], t)))::BIGINT AS s_fr,
           |  len(list_filter($toks, t -> list_contains(['de','shi','le','zai','you','wo','ta','men','zhe','na'], t)))::BIGINT AS s_zh
           |  FROM documents)
           |SELECT doc_id,
           | CASE WHEN g = 0 THEN 'und' WHEN s_de = g THEN 'de' WHEN s_en = g THEN 'en'
           |      WHEN s_es = g THEN 'es' WHEN s_fr = g THEN 'fr' ELSE 'zh' END AS pred_lang,
           | g AS lang_score
           |FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS g FROM s)""".stripMargin,
      "t04_fingerprint" ->
        s"""WITH kg AS (SELECT doc_id, $kgrams AS gs FROM (SELECT doc_id, $toks AS t FROM documents))
           |SELECT doc_id, list_min(list_transform(gs, g -> ${h60("g")})) AS fingerprint,
           | len(list_distinct(gs))::BIGINT AS n_kgrams FROM kg""".stripMargin,
      "t06_vocab" ->
        s"""WITH g AS (SELECT token, count(*)::BIGINT AS n
           |  FROM (SELECT unnest($toks) AS token FROM documents) GROUP BY token)
           |SELECT token, n, row_number() OVER (ORDER BY n DESC, token)::BIGINT AS rank
           |FROM g ORDER BY n DESC, token LIMIT 1000""".stripMargin,
      "t07_tfidf" ->
        s"""WITH tok AS (SELECT doc_id, unnest($toks) AS token FROM documents),
           |tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
           |dfreq AS (SELECT token, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY 1),
           |n AS (SELECT count(*)::BIGINT AS n FROM documents),
           |scored AS (SELECT doc_id, token, (tf * ((n.n * 1000000) // df))::BIGINT AS tfidf
           |           FROM tf JOIN dfreq USING (token) CROSS JOIN n),
           |ranked AS (SELECT doc_id, token, tfidf,
           |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token)::BIGINT AS rank
           |  FROM scored)
           |SELECT doc_id, token, tfidf, rank FROM ranked WHERE rank <= 5""".stripMargin,
      "t08_repetition" ->
        s"""WITH t AS (SELECT doc_id, $toks AS t FROM documents),
           |words AS (SELECT doc_id, len(t)::BIGINT AS n_tokens,
           |          len(list_distinct(t))::BIGINT AS n_distinct FROM t),
           |bg AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
           |         THEN list_transform(generate_series(1, len(t)-1), i -> t[i]||' '||t[i+1])
           |         ELSE [NULL] END) AS bigram FROM t),
           |bgc AS (SELECT doc_id, bigram, count(*)::BIGINT AS c FROM bg GROUP BY 1, 2),
           |top AS (SELECT doc_id, max(CASE WHEN bigram IS NOT NULL THEN c END)::BIGINT AS top_c,
           |        sum(CASE WHEN bigram IS NOT NULL THEN c ELSE 0 END)::BIGINT AS n_bigrams
           |        FROM bgc GROUP BY 1)
           |SELECT w.doc_id,
           | ((w.n_tokens - w.n_distinct) * 1000000 // w.n_tokens)::BIGINT AS dup_word_ppm,
           | (CASE WHEN tp.n_bigrams > 0 THEN (tp.top_c * 1000000 // tp.n_bigrams)
           |       ELSE 0 END)::BIGINT AS top_bigram_ppm
           |FROM words w JOIN top tp USING (doc_id)""".stripMargin,
      // t22: temperature mixture — integer ppm throughout; the isqrt is
      // floor-of-IEEE-sqrt (exact both engines below 2^52); draws reuse
      // the 60-bit md5 coordinate of t09.
      "t22_temperature_sample" ->
        """WITH per AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
          |tot AS (SELECT count(*)::BIGINT AS total FROM documents),
          |w AS (SELECT lang, n_docs, (n_docs * 1000000 // tot.total)::BIGINT AS share_ppm,
          |        CAST(floor(sqrt(((n_docs * 1000000 // tot.total) * 1000000)::DOUBLE))
          |             AS BIGINT) AS wgt
          |      FROM per, tot),
          |z AS (SELECT sum(wgt)::BIGINT AS z FROM w),
          |rates AS (SELECT w.lang, w.n_docs, w.share_ppm,
          |    least(1000000,
          |      ((tot.total // 2) * w.wgt // z.z) * 1000000 // w.n_docs)::BIGINT AS rate_ppm
          |  FROM w, z, tot),
          |kept AS (SELECT d.lang, count(*)::BIGINT AS kept
          |  FROM documents d JOIN rates r ON d.lang = r.lang
          |  WHERE (('0x' || substr(md5('tsample:' || d.doc_id), 1, 15))::BIGINT
          |         % 1000000) < r.rate_ppm
          |  GROUP BY 1)
          |SELECT r.lang, r.n_docs, r.share_ppm, r.rate_ppm,
          |  coalesce(k.kept, 0)::BIGINT AS kept
          |FROM rates r LEFT JOIN kept k ON r.lang = k.lang""".stripMargin,
      // t23: first BPE merge round — pair counts over the distinct
      // vocabulary weighted by word frequency; (cnt DESC, pair) is a
      // total order so the LIMIT is deterministic.
      "t23_bpe_pairs" ->
        """WITH words AS (SELECT w, count(*)::BIGINT AS n FROM (
          |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          |  WHERE length(w) >= 2 GROUP BY 1),
          |pos AS (SELECT w, n, unnest(generate_series(1, length(w)-1)) AS i FROM words),
          |pairs AS (SELECT substr(w, i::INT, 2) AS pair, sum(n)::BIGINT AS cnt
          |  FROM pos GROUP BY 1)
          |SELECT pair, cnt FROM pairs ORDER BY cnt DESC, pair ASC LIMIT 50""".stripMargin,
      // t24: DSIR — add-one-smoothed floor-log2 likelihood ratios per
      // hashed bigram bucket; bin() floor-log2 is identical cross-engine
      "t24_dsir_score" ->
        s"""WITH bg AS (SELECT doc_id, ist,
           |    ${h60("'dsir:' || g")} % 1024 AS b
           |  FROM (SELECT doc_id, lang = 'en' AS ist,
           |    unnest(list_transform(generate_series(1, len(t)-1),
           |      i -> t[i]||' '||t[i+1])) AS g
           |    FROM (SELECT doc_id, lang, $toks AS t FROM documents))),
           |db AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2),
           |tb AS (SELECT b, count(*) AS cr,
           |       sum(CASE WHEN ist THEN 1 ELSE 0 END) AS ct FROM bg GROUP BY 1),
           |tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM tb),
           |lam AS (SELECT b,
           |    (length(bin((ct+1)::BIGINT))-1) - (length(bin((cr+1)::BIGINT))-1)
           |  + (length(bin((tr+1024)::BIGINT))-1) - (length(bin((tt+1024)::BIGINT))-1)
           |    AS lam
           |  FROM tb, tot)
           |SELECT doc_id, sum(n)::BIGINT AS n_bigrams,
           |       sum(n * lam)::BIGINT AS score_bits
           |FROM db JOIN lam USING (b) GROUP BY 1""".stripMargin,
      // t32: the NB classifier, relationally. Dense label×bucket table via
      // labels CROSS JOIN generate_series LEFT JOIN counts (unseen pairs
      // carry the smoothing-only weight); the argmax tie-break (greater
      // label on equal score) mirrors Spark's max(struct(score, label)).
      "t32_nb_classifier" -> t32Sql,
      "t33_stream_nb_parity" -> t32Sql,
      // t40: distinct-token intersection against the same literal list
      "t40_blocklist_gate" ->
        s"""SELECT doc_id,
           | len(list_intersect(list_distinct($toks), ['dup', 'spam', 'scan']))::BIGINT
           |   AS n_blocked_terms,
           | len(list_intersect(list_distinct($toks), ['dup', 'spam', 'scan'])) = 0 AS keep
           |FROM documents""".stripMargin,
      // t42: the same 4 BPE learn rounds as chained CTEs — identical
      // double-space token-string representation, identical replace-based
      // merge apply (SQL replace's non-overlapping left-to-right scan is
      // BPE's greedy rule), identical (count DESC, "l r" ASC) tie-break
      "t42_bpe_train" -> {
        def pairsOf(v: String, p: String): String =
          s"""$p AS (SELECT t[i] AS l, t[i+1] AS r, sum(n)::BIGINT AS cnt FROM (
             |  SELECT string_split(trim(s), '  ') AS t, n,
             |    unnest(generate_series(1, len(string_split(trim(s), '  ')) - 1)) AS i
             |  FROM $v) GROUP BY 1, 2)""".stripMargin
        def bestOf(p: String, b: String): String =
          s"$b AS (SELECT l, r, cnt FROM $p ORDER BY cnt DESC, l || ' ' || r ASC LIMIT 1)"
        def applyOf(v0: String, b: String, v1: String): String =
          s"""$v1 AS (SELECT replace(s, ' ' || $b.l || '  ' || $b.r || ' ',
             |  ' ' || $b.l || $b.r || ' ') AS s, n FROM $v0, $b)""".stripMargin
        val rounds = (1 to 4).map { k =>
          val prev = if (k == 1) "v0" else s"v${k - 1}"
          Seq(pairsOf(prev, s"p$k"), bestOf(s"p$k", s"b$k")) ++
            (if (k < 4) Seq(applyOf(prev, s"b$k", s"v$k")) else Nil)
        }.flatten.mkString(",\n")
        s"""WITH words AS (SELECT w, count(*)::BIGINT AS n FROM (
           |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           |  WHERE length(w) >= 2 GROUP BY 1),
           |v0 AS (SELECT ' ' || array_to_string(list_transform(
           |    generate_series(1, length(w)), i -> substr(w, i::INT, 1)), '  ')
           |    || ' ' AS s, n FROM words),
           |$rounds
           |SELECT 1::BIGINT AS rank, l AS "left", r AS "right", cnt FROM b1
           |UNION ALL SELECT 2, l, r, cnt FROM b2
           |UNION ALL SELECT 3, l, r, cnt FROM b3
           |UNION ALL SELECT 4, l, r, cnt FROM b4""".stripMargin
      },
      // t43: the t42 learn rounds re-derived, then the 4 merges applied
      // to every document word — per-doc word/char/BPE token counts;
      // LEFT JOIN keeps wordless docs at zero, like the Spark aggregates
      "t43_bpe_encode" -> {
        def pairsOf(v: String, p: String): String =
          s"""$p AS (SELECT t[i] AS l, t[i+1] AS r, sum(n)::BIGINT AS cnt FROM (
             |  SELECT string_split(trim(s), '  ') AS t, n,
             |    unnest(generate_series(1, len(string_split(trim(s), '  ')) - 1)) AS i
             |  FROM $v) GROUP BY 1, 2)""".stripMargin
        def bestOf(p: String, b: String): String =
          s"$b AS (SELECT l, r, cnt FROM $p ORDER BY cnt DESC, l || ' ' || r ASC LIMIT 1)"
        def applyOf(v0: String, b: String, v1: String): String =
          s"""$v1 AS (SELECT replace(s, ' ' || $b.l || '  ' || $b.r || ' ',
             |  ' ' || $b.l || $b.r || ' ') AS s, n FROM $v0, $b)""".stripMargin
        val rounds = (1 to 4).map { k =>
          val prev = if (k == 1) "v0" else s"v${k - 1}"
          Seq(pairsOf(prev, s"p$k"), bestOf(s"p$k", s"b$k")) ++
            (if (k < 4) Seq(applyOf(prev, s"b$k", s"v$k")) else Nil)
        }.flatten.mkString(",\n")
        s"""WITH words AS (SELECT w, count(*)::BIGINT AS n FROM (
           |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           |  WHERE length(w) >= 2 GROUP BY 1),
           |v0 AS (SELECT ' ' || array_to_string(list_transform(
           |    generate_series(1, length(w)), i -> substr(w, i::INT, 1)), '  ')
           |    || ' ' AS s, n FROM words),
           |$rounds,
           |dw AS (SELECT doc_id, w FROM (
           |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
           |  WHERE w != ''),
           |enc AS (SELECT doc_id, length(w) AS chars,
           |  len(string_split(trim(
           |    replace(replace(replace(replace(
           |      ' ' || array_to_string(list_transform(
           |        generate_series(1, length(w)), i -> substr(w, i::INT, 1)), '  ')
           |        || ' ',
           |      ' ' || b1.l || '  ' || b1.r || ' ', ' ' || b1.l || b1.r || ' '),
           |      ' ' || b2.l || '  ' || b2.r || ' ', ' ' || b2.l || b2.r || ' '),
           |      ' ' || b3.l || '  ' || b3.r || ' ', ' ' || b3.l || b3.r || ' '),
           |      ' ' || b4.l || '  ' || b4.r || ' ', ' ' || b4.l || b4.r || ' ')),
           |    '  ')) AS toks
           |  FROM dw, b1, b2, b3, b4),
           |agg AS (SELECT doc_id, count(*)::BIGINT AS n_words,
           |    sum(chars)::BIGINT AS n_char_tokens,
           |    sum(toks)::BIGINT AS n_bpe_tokens
           |  FROM enc GROUP BY 1)
           |SELECT d.doc_id, coalesce(a.n_words, 0) AS n_words,
           |  coalesce(a.n_char_tokens, 0) AS n_char_tokens,
           |  coalesce(a.n_bpe_tokens, 0) AS n_bpe_tokens
           |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin
      },
      // t44: the identical integer BM25 — HUGEINT products, `//` floor
      // division (all terms positive → = Spark's truncating `div`),
      // the same literal VALUES query table
      "t44_bm25" ->
        """WITH q(query_id, term) AS (VALUES
          |    (1, 'spark'), (1, 'query'), (1, 'fast'),
          |    (2, 'table'), (2, 'scan'), (2, 'filter'),
          |    (3, 'vector'), (3, 'merge'), (3, 'batch'), (3, 'window')),
          |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
          |corpus AS (SELECT count(*)::HUGEINT AS n_docs,
          |             sum(len(t))::HUGEINT AS n_toks FROM toks),
          |hits AS (SELECT doc_id, len(t)::HUGEINT AS dl, unnest(t) AS term
          |         FROM toks),
          |tf AS (SELECT doc_id, dl, term, count(*)::HUGEINT AS tf FROM hits
          |       WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2, 3),
          |dfq AS (SELECT term, count(*)::HUGEINT AS df_t FROM tf GROUP BY 1),
          |sc AS (SELECT q.query_id, tf.doc_id,
          |    (((n_docs - df_t) * 1000000 // n_docs) *
          |     ((2200::HUGEINT * tf * n_toks * 1000000) //
          |      (1000::HUGEINT * tf * n_toks + 300::HUGEINT * n_toks +
          |       900::HUGEINT * dl * n_docs)) // 1000000) AS contrib
          |  FROM tf JOIN dfq USING (term) CROSS JOIN corpus JOIN q USING (term)),
          |agg AS (SELECT query_id, doc_id, sum(contrib)::BIGINT AS score_ppm
          |        FROM sc GROUP BY 1, 2)
          |SELECT * FROM (
          |  SELECT query_id::BIGINT AS query_id, doc_id, score_ppm,
          |    row_number() OVER (PARTITION BY query_id
          |      ORDER BY score_ppm DESC, doc_id ASC)::BIGINT AS rank
          |  FROM agg) WHERE rank <= 10""".stripMargin,
      // t45: the same md5 sampling coordinate (t18/t22's SQL twin),
      // rank within (lang, source) by (coord, doc_id)
      "t45_budget_sample" ->
        """SELECT lang, source, doc_id, pick_rank, n_stratum FROM (
          |  SELECT lang, source, doc_id,
          |    row_number() OVER (PARTITION BY lang, source
          |      ORDER BY c, doc_id)::BIGINT AS pick_rank,
          |    count(*) OVER (PARTITION BY lang, source)::BIGINT AS n_stratum
          |  FROM (SELECT lang, source, doc_id,
          |          ('0x' || substr(md5('sample:' || doc_id), 1, 15))::BIGINT
          |            % 1000000 AS c
          |        FROM documents))
          |WHERE pick_rank <= 8""".stripMargin,
      // t41: the canonical URL derived analytically from the same
      // construction — host lowercased/www-stripped, :443 dropped and
      // :8443 kept, slashes collapsed, trailing slash gone, utm dropped,
      // query sorted (a < m < z), fragment discarded
      "t41_url_profile" ->
        """WITH d AS (
          |  SELECT lower(source) || '.example.' ||
          |    CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
          |         ELSE 'co.uk' END AS host,
          |    'example.' ||
          |    CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
          |         ELSE 'co.uk' END AS domain,
          |    'https://' || lower(source) || '.example.' ||
          |    CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
          |         ELSE 'co.uk' END ||
          |    CASE WHEN doc_id % 5 = 1 THEN ':8443' ELSE '' END ||
          |    '/docs/' || doc_id ||
          |    '?a=' || (doc_id % 7) || '&m=2&z=9' AS url
          |  FROM documents)
          |SELECT domain, host, count(*)::BIGINT AS n_docs, min(url) AS url_min
          |FROM d GROUP BY 1, 2""".stripMargin,
      // t39: DuckDB's own NFC normalizer over the same decomposed fixture
      // (chr(769) = combining acute, chr(64257) = fi ligature)
      "t39_nfc_normalize" ->
        """WITH d AS (SELECT doc_id,
          | text || ' caf' || 'e' || chr(769) || ' ' || chr(64257) || 'n' AS text
          | FROM documents)
          |SELECT doc_id, nfc_normalize(text) AS text,
          | (CASE WHEN nfc_normalize(text) = text THEN 0 ELSE 1 END)::BIGINT AS changed
          |FROM d""".stripMargin,
      // t37: the same regex chain in RE2 syntax ('g' flag — DuckDB
      // replaces first-only by default, Spark globally)
      "t37_unicode_scrub" ->
        """SELECT doc_id,
          | trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
          |   '[\x{200B}\x{200C}\x{200D}\x{2060}\x{FEFF}\x{00AD}\x{200E}\x{200F}\x{202A}-\x{202E}]', '', 'g'),
          |   '[\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]', ' ', 'g'),
          |   '[\x{0000}-\x{001F}\x{007F}-\x{009F}]', ' ', 'g'),
          |   ' {2,}', ' ', 'g')) AS text,
          | (trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
          |   '[\x{200B}\x{200C}\x{200D}\x{2060}\x{FEFF}\x{00AD}\x{200E}\x{200F}\x{202A}-\x{202E}]', '', 'g'),
          |   '[\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]', ' ', 'g'),
          |   '[\x{0000}-\x{001F}\x{007F}-\x{009F}]', ' ', 'g'),
          |   ' {2,}', ' ', 'g')) != text)::BIGINT AS changed
          |FROM documents""".stripMargin,
      // t36: t25 nested + per-lang lower-discrete tercile cutoffs (the
      // t13 convention) + the head/middle/tail CASE
      "t36_ccnet_buckets" ->
        s"""WITH px AS (SELECT p.doc_id, d.lang, p.mean_bits_ppm
           |  FROM ($t25Sql) p JOIN documents d USING (doc_id)),
           |h AS (SELECT lang, mean_bits_ppm AS v, count(*) AS cnt
           |  FROM px GROUP BY 1, 2),
           |cd AS (SELECT lang, v,
           |    sum(cnt) OVER (PARTITION BY lang ORDER BY v) AS cum,
           |    sum(cnt) OVER (PARTITION BY lang) AS tot FROM h),
           |c1 AS (SELECT lang, min(v) AS c1 FROM cd WHERE cum * 3 >= tot GROUP BY 1),
           |c2 AS (SELECT lang, min(v) AS c2 FROM cd WHERE cum * 3 >= 2 * tot GROUP BY 1)
           |SELECT px.doc_id, px.lang, px.mean_bits_ppm,
           |  CASE WHEN px.mean_bits_ppm <= c1.c1 THEN 'head'
           |       WHEN px.mean_bits_ppm <= c2.c2 THEN 'middle'
           |       ELSE 'tail' END AS bucket
           |FROM px JOIN c1 USING (lang) JOIN c2 USING (lang)""".stripMargin,
      // t35: digest-level token counts per slice and corpus-wide; the
      // FL2 quantization is the shared length(bin(n))-1 device
      "t35_source_divergence" ->
        s"""WITH tok AS (SELECT source AS slice, ${h60("'kl:' || w")} AS d
           |  FROM (SELECT source, unnest($toks) AS w FROM documents)),
           |st AS (SELECT slice, d, count(*)::BIGINT AS nst FROM tok GROUP BY 1, 2),
           |ct AS (SELECT d, count(*)::BIGINT AS nt FROM tok GROUP BY 1),
           |stot AS (SELECT slice, sum(nst)::BIGINT AS ns FROM st GROUP BY 1),
           |tot AS (SELECT sum(nt)::BIGINT AS n FROM ct)
           |SELECT st.slice, sum(st.nst)::BIGINT AS n_tokens,
           |  sum(st.nst * (((length(bin(st.nst)) - 1) - (length(bin(stot.ns)) - 1))
           |    - ((length(bin(ct.nt)) - 1) - (length(bin(tot.n)) - 1))))::BIGINT
           |    AS divergence_bits
           |FROM st JOIN ct USING (d) JOIN stot USING (slice) CROSS JOIN tot
           |GROUP BY 1""".stripMargin,
      // t34: the matrix over t32's rows (nested WITH in a subquery);
      // row_ppm is truncating integer division in both engines
      "t34_nb_confusion" ->
        s"""WITH cells AS (SELECT d.lang AS truth, t.pred, count(*)::BIGINT AS n
           |  FROM ($t32Sql) t JOIN documents d USING (doc_id) GROUP BY 1, 2),
           |rt AS (SELECT truth, sum(n) AS rtot FROM cells GROUP BY 1)
           |SELECT c.truth, c.pred, c.n,
           |  (c.n * 1000000 // r.rtot)::BIGINT AS row_ppm
           |FROM cells c JOIN rt r USING (truth)""".stripMargin,
      // t38: the v2 composition — d22's quality-keeper clustering, d19's
      // k=3 contamination (reusing minhashCtes' kg), the ccnet verdicts,
      // all intersected and aggregated per (lang, source)
      "t38_training_pipeline_v2" ->
        s"""WITH RECURSIVE $minhashCtes,
           |p AS (SELECT a, b FROM est WHERE est_ppm >= 500000),
           |nodes AS (SELECT a AS n FROM p UNION SELECT b FROM p),
           |e AS (SELECT a AS u, b AS v FROM p UNION SELECT b AS u, a AS v FROM p),
           |reach(n, m) AS (
           |  SELECT n, n FROM nodes
           |  UNION
           |  SELECT r.n, e.v FROM reach r JOIN e ON r.m = e.u),
           |comp AS (SELECT n AS node, min(m) AS component FROM reach GROUP BY n),
           |qy AS (SELECT doc_id,
           |  ((1000000 - (len(regexp_extract_all(text, '[^a-z0-9 ]')) * 1000000 // length(text))
           |    + (len(list_filter($toks, t -> list_contains($enStop, t))) * 1000000 // len($toks))
           |    + (least(length(text), 500) * 1000000 // 500)) // 3)::BIGINT AS q
           |  FROM documents),
           |keepers AS (SELECT node AS keeper FROM (
           |  SELECT comp.node, row_number() OVER (PARTITION BY comp.component
           |    ORDER BY qy.q DESC, comp.node ASC) AS rn
           |  FROM comp JOIN qy ON qy.doc_id = comp.node) WHERE rn = 1),
           |drops AS (SELECT node FROM comp
           |  WHERE node NOT IN (SELECT keeper FROM keepers)),
           |gg AS (SELECT doc_id, unnest(gs) AS gram FROM kg),
           |bench AS (SELECT doc_id AS bench_id, gram FROM gg WHERE doc_id % 25 = 0),
           |cont AS (SELECT DISTINCT gg.doc_id
           |         FROM gg JOIN bench b ON gg.gram = b.gram AND gg.doc_id != b.bench_id),
           |$ccnetCtes,
           |keep AS (SELECT doc_id FROM lok JOIN rules USING (doc_id) JOIN pok USING (doc_id)
           |         WHERE lang_ok + rules_ok + ppl_ok = 3)
           |SELECT d.lang, d.source, count(*)::BIGINT AS n_docs,
           |       sum(len(string_split(d.text, ' ')))::BIGINT AS n_tokens
           |FROM documents d
           |WHERE d.doc_id NOT IN (SELECT node FROM drops)
           |  AND d.doc_id % 25 != 0
           |  AND d.doc_id NOT IN (SELECT doc_id FROM cont)
           |  AND d.doc_id IN (SELECT doc_id FROM keep)
           |GROUP BY 1, 2""".stripMargin,
      // t31: rank/cumsum over the distinct-token table; per-size max cum
      "t31_vocab_coverage" ->
        s"""WITH freq AS (SELECT token, count(*)::BIGINT AS n FROM (
           |    SELECT unnest($toks) AS token FROM documents) GROUP BY 1),
           |r AS (SELECT n,
           |    row_number() OVER (ORDER BY n DESC, token ASC) AS rk,
           |    sum(n) OVER (ORDER BY n DESC, token ASC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM freq),
           |tot AS (SELECT sum(n) AS t FROM freq)
           |SELECT k::BIGINT AS vocab_size,
           |  ((SELECT max(cum) FROM r WHERE rk <= k) * 1000000 // t)::BIGINT
           |    AS covered_ppm
           |FROM (SELECT unnest([10, 100, 1000]) AS k), tot""".stripMargin,
      // t30: stateless stream face — FULL parity with t24's SQL
      "t30_stream_dsir_parity" ->
        s"""WITH bg AS (SELECT doc_id, ist,
           |    ${h60("'dsir:' || g")} % 1024 AS b
           |  FROM (SELECT doc_id, lang = 'en' AS ist,
           |    unnest(list_transform(generate_series(1, len(t)-1),
           |      i -> t[i]||' '||t[i+1])) AS g
           |    FROM (SELECT doc_id, lang, $toks AS t FROM documents))),
           |db AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2),
           |tb AS (SELECT b, count(*) AS cr,
           |       sum(CASE WHEN ist THEN 1 ELSE 0 END) AS ct FROM bg GROUP BY 1),
           |tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM tb),
           |lam AS (SELECT b,
           |    (length(bin((ct+1)::BIGINT))-1) - (length(bin((cr+1)::BIGINT))-1)
           |  + (length(bin((tr+1024)::BIGINT))-1) - (length(bin((tt+1024)::BIGINT))-1)
           |    AS lam
           |  FROM tb, tot)
           |SELECT doc_id, sum(n)::BIGINT AS n_bigrams,
           |       sum(n * lam)::BIGINT AS score_bits
           |FROM db JOIN lam USING (b) GROUP BY 1""".stripMargin,
      // t25: bigram-LM transition costs — FL2(c1+V) − FL2(c2+1) per
      // transition; md5-60 digests keyed "lm1:"/"lm2:" as in Spark
      "t25_lm_perplexity" -> t25Sql,
      // t28: the t03 + t26 + t25 verdicts composed — one keep per doc;
      // docs too short for bigrams drop with the LM verdict
      "t28_ccnet_pipeline" ->
        s"""WITH $ccnetCtes
           |SELECT doc_id, lang_ok, rules_ok, ppl_ok,
           |  (lang_ok + rules_ok + ppl_ok = 3)::BIGINT AS keep
           |FROM lok JOIN rules USING (doc_id) JOIN pok USING (doc_id)""".stripMargin,
      // t29: the composed pipeline — keepers ∩ keep ∩ sample draw, then
      // the t19 packing cumsum over the survivor set at budget 2000
      "t29_training_pipeline" ->
        s"""WITH $ccnetCtes,
           |keep AS (SELECT l.doc_id FROM lok l
           |         JOIN rules USING (doc_id) JOIN pok USING (doc_id)
           |         WHERE lang_ok + rules_ok + ppl_ok = 3),
           |keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
           |sel AS (SELECT d.doc_id, len($toks)::BIGINT AS n
           |        FROM documents d
           |        JOIN keepers USING (doc_id)
           |        JOIN keep USING (doc_id)
           |        WHERE (('0x' || substr(md5('sample:' || d.doc_id), 1, 15))::BIGINT
           |               % 1000000) <
           |          CASE d.lang WHEN 'en' THEN 900000 WHEN 'de' THEN 600000
           |               WHEN 'es' THEN 600000 WHEN 'fr' THEN 600000
           |               WHEN 'zh' THEN 300000 ELSE 500000 END),
           |c AS (SELECT doc_id, n,
           |      coalesce(sum(n) OVER (ORDER BY doc_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
           |      FROM sel)
           |SELECT (pre // 2000)::BIGINT AS shard_id, count(*)::BIGINT AS n_docs,
           | sum(n)::BIGINT AS n_tokens, min(doc_id) AS first_doc, max(doc_id) AS last_doc
           |FROM c GROUP BY 1""".stripMargin,
      // t26: Gopher Appendix-A rules; word chars = chars − separators on
      // the single-space corpus, ppm floors throughout
      "t26_gopher_rules" ->
        s"""WITH m AS (SELECT doc_id, len(t)::BIGINT AS n,
           |    greatest(length(text) - (len(t) - 1), 0)::BIGINT AS wc,
           |    len(list_filter(t, w -> regexp_matches(w, '[a-z]')))::BIGINT AS na,
           |    len(list_filter(list_distinct(t),
           |        w -> list_contains($enStop, w)))::BIGINT AS ns
           |  FROM (SELECT doc_id, text, $toks AS t FROM documents)),
           |p AS (SELECT doc_id, n,
           |    (wc * 1000000 // greatest(n, 1)) AS mlen,
           |    (na * 1000000 // greatest(n, 1)) AS alpha, ns FROM m)
           |SELECT doc_id, n AS n_tokens, mlen AS mean_word_len_ppm,
           |  alpha AS alpha_word_ppm, ns AS n_stop_distinct,
           |  (n < 50 OR n > 100000)::BIGINT AS fail_word_count,
           |  (mlen < 3000000 OR mlen > 10000000)::BIGINT AS fail_mean_word_len,
           |  (alpha < 800000)::BIGINT AS fail_alpha,
           |  (ns < 2)::BIGINT AS fail_stop_distinct,
           |  ((n >= 50 AND n <= 100000) AND (mlen >= 3000000 AND mlen <= 10000000)
           |    AND alpha >= 800000 AND ns >= 2)::BIGINT AS pass
           |FROM p""".stripMargin,
      // t46: the v3 web-corpus composition — url-group keepers (d25's
      // canonical groups ARE the res groups), md5-text keepers, the t26
      // pass predicate, per-host rollup, and the 5-host PageRank CTEs
      "t46_training_pipeline_v3" ->
        s"""WITH d AS (SELECT doc_id, text, (doc_id // 4) AS res FROM documents),
           |hd AS (SELECT doc_id, 'site' || (res % 5) || '.example.com' AS host, res FROM d),
           |uk AS (SELECT min(doc_id) AS doc_id FROM d GROUP BY res),
           |ek AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
           |gp AS (SELECT doc_id FROM (
           |  SELECT doc_id, n, (wc * 1000000 // greatest(n, 1)) AS mlen,
           |         (na * 1000000 // greatest(n, 1)) AS alpha, ns
           |  FROM (SELECT doc_id, len(t)::BIGINT AS n,
           |          greatest(length(text) - (len(t) - 1), 0)::BIGINT AS wc,
           |          len(list_filter(t, w -> regexp_matches(w, '[a-z]')))::BIGINT AS na,
           |          len(list_filter(list_distinct(t),
           |              w -> list_contains($enStop, w)))::BIGINT AS ns
           |        FROM (SELECT doc_id, text, $toks AS t FROM documents)))
           |  WHERE n >= 50 AND n <= 100000 AND mlen >= 3000000 AND mlen <= 10000000
           |    AND alpha >= 800000 AND ns >= 2),
           |cnt AS (SELECT host, count(*)::BIGINT AS n_docs FROM hd GROUP BY 1),
           |ukc AS (SELECT host, count(*)::BIGINT AS n_url_keep
           |        FROM hd JOIN uk USING (doc_id) GROUP BY 1),
           |fc AS (SELECT host, count(*)::BIGINT AS n_final
           |       FROM hd JOIN uk USING (doc_id) JOIN ek USING (doc_id)
           |            JOIN gp USING (doc_id) GROUP BY 1),
           |ks AS (SELECT DISTINCT (res % 5) AS k FROM d),
           |edges AS (SELECT DISTINCT src, dst FROM (
           |  SELECT 'site' || k || '.example.com' AS src,
           |         'site' || ((k * 2 + 1) % 5) || '.example.com' AS dst FROM ks
           |  UNION ALL
           |  SELECT 'site' || k || '.example.com',
           |         'site' || ((k * k + 1) % 5) || '.example.com' FROM ks)),
           |nodes AS (SELECT DISTINCT host FROM
           |  (SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
           |cst AS (SELECT (1000000000000 // count(*))::BIGINT AS r0,
           |          ((1000000000000 // count(*)) * 150000 // 1000000)::BIGINT AS b
           |        FROM nodes),
           |od AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY 1),
           |pr0 AS (SELECT host, (SELECT r0 FROM cst) AS pr FROM nodes),
           |pc1 AS (SELECT e.dst AS host, sum((r.pr * 850000) // (1000000 * od.outdeg)) AS s
           |        FROM edges e JOIN pr0 r ON e.src = r.host JOIN od ON e.src = od.src
           |        GROUP BY 1),
           |pr1 AS (SELECT nodes.host, ((SELECT b FROM cst) + coalesce(pc1.s, 0))::BIGINT AS pr
           |        FROM nodes LEFT JOIN pc1 ON nodes.host = pc1.host),
           |pc2 AS (SELECT e.dst AS host, sum((r.pr * 850000) // (1000000 * od.outdeg)) AS s
           |        FROM edges e JOIN pr1 r ON e.src = r.host JOIN od ON e.src = od.src
           |        GROUP BY 1),
           |pr2 AS (SELECT nodes.host, ((SELECT b FROM cst) + coalesce(pc2.s, 0))::BIGINT AS pr
           |        FROM nodes LEFT JOIN pc2 ON nodes.host = pc2.host)
           |SELECT cnt.host, cnt.n_docs,
           |  coalesce(ukc.n_url_keep, 0)::BIGINT AS n_url_keep,
           |  coalesce(fc.n_final, 0)::BIGINT AS n_final,
           |  coalesce(pr2.pr, 0)::BIGINT AS pagerank
           |FROM cnt LEFT JOIN ukc USING (host) LEFT JOIN fc USING (host)
           |LEFT JOIN pr2 ON cnt.host = pr2.host""".stripMargin,
      // t27: vocab = top-1000 (count DESC, token ASC) — a total order, so
      // the LIMIT is deterministic; OOV = absent from it
      "t27_oov_rate" ->
        s"""WITH tok AS (SELECT doc_id, unnest($toks) AS token FROM documents),
           |vc AS (SELECT token FROM (SELECT token, count(*) AS n FROM tok
           |       GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 1000))
           |SELECT doc_id, count(*)::BIGINT AS n_tokens,
           |  sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
           |  (sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) * 1000000
           |     // count(*))::BIGINT AS oov_ppm
           |FROM tok LEFT JOIN vc v ON tok.token = v.token GROUP BY 1""".stripMargin,
      "t09_sample" ->
        """SELECT doc_id, lang FROM documents
          |WHERE (('0x' || substr(md5('sample:' || doc_id), 1, 15))::BIGINT % 1000000) <
          |  CASE lang WHEN 'en' THEN 900000 WHEN 'de' THEN 600000 WHEN 'es' THEN 600000
          |            WHEN 'fr' THEN 600000 WHEN 'zh' THEN 300000 ELSE 500000 END""".stripMargin,
      "t10_mixture" ->
        s"""WITH per AS (SELECT lang, source, count(*)::BIGINT AS n_docs,
           |  sum(len($toks))::BIGINT AS n_tokens, sum(length(text))::BIGINT AS n_chars
           |  FROM documents GROUP BY 1, 2),
           |tot AS (SELECT count(*)::BIGINT AS total FROM documents)
           |SELECT lang, source, n_docs, n_tokens, n_chars,
           | (n_docs * 1000000 // tot.total)::BIGINT AS doc_share_ppm
           |FROM per, tot""".stripMargin,
      "t12_mixture_rollup" ->
        s"""SELECT lang, source, count(*)::BIGINT AS n_docs,
           | sum(len($toks))::BIGINT AS n_tokens,
           | sum(length(text))::BIGINT AS n_chars,
           | GROUPING(lang, source)::BIGINT AS grouping_level
           |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin,
      "t13_length_quantiles" ->
        """WITH h AS (SELECT lang, length(text)::BIGINT AS len, count(*)::BIGINT AS cnt
          |           FROM documents GROUP BY 1, 2),
          |c AS (SELECT lang, len, cnt,
          |        sum(cnt) OVER (PARTITION BY lang ORDER BY len) AS cum,
          |        sum(cnt) OVER (PARTITION BY lang) AS n FROM h)
          |SELECT lang, p_ppm, len
          |FROM c CROSS JOIN (SELECT unnest([500000, 900000, 990000]::BIGINT[]) AS p_ppm)
          |WHERE (((n-1) * p_ppm) // 1000000 + 1)::BIGINT > cum - cnt
          |  AND (((n-1) * p_ppm) // 1000000 + 1)::BIGINT <= cum""".stripMargin,
      "t14_token_spectrum" ->
        s"""SELECT n AS n_occurrences, count(*)::BIGINT AS n_tokens
           |FROM (SELECT count(*)::BIGINT AS n
           |      FROM (SELECT unnest($toks) AS tok FROM documents)
           |      GROUP BY tok)
           |GROUP BY 1""".stripMargin,
      "t15_pii_scrub" ->
        """WITH t AS (SELECT c_custkey AS custkey,
          |  c_name || ' <customer' || c_custkey::VARCHAR ||
          |  '@shop.example.com> ip 10.' || (c_custkey % 250)::VARCHAR ||
          |  '.0.' || c_nationkey::VARCHAR || ' acct ' ||
          |  (c_custkey * 1009 + 1000000)::VARCHAR AS text FROM customer),
          |s1 AS (SELECT custkey, text,
          |  regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}',
          |    '<EMAIL>', 'g') AS no_email FROM t),
          |s2 AS (SELECT *, regexp_replace(no_email,
          |  '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS no_ip
          |  FROM s1)
          |SELECT custkey,
          | len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))::BIGINT AS n_emails,
          | len(regexp_extract_all(no_email, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))::BIGINT AS n_ips,
          | len(regexp_extract_all(no_ip, '[0-9]{6,}'))::BIGINT AS n_longnums,
          | regexp_replace(no_ip, '[0-9]{6,}', '<NUM>', 'g') AS redacted
          |FROM s2""".stripMargin,
      "s06_pq_codes" ->
        """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
          |           FROM embeddings),
          |ms AS (SELECT unnest(generate_series(0, 7)) AS m),
          |cb AS (SELECT m, vec_id AS code, v[m*8+1 : m*8+8] AS cv
          |       FROM v CROSS JOIN ms WHERE vec_id < 16),
          |sv AS (SELECT vec_id, m, v[m*8+1 : m*8+8] AS s FROM v CROSS JOIN ms),
          |d AS (SELECT vec_id, sv.m, code,
          |      list_sum(list_transform(generate_series(1, 8),
          |        i -> (s[i] - cv[i]) * (s[i] - cv[i]))) AS dist
          |      FROM sv JOIN cb ON sv.m = cb.m),
          |r AS (SELECT vec_id, m, code,
          |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS rn
          |      FROM d)
          |SELECT vec_id, m::BIGINT AS m, code FROM r WHERE rn = 1""".stripMargin,
      // s20: the same 2 Lloyd rounds replayed — deterministic first-16
      // init, L2 argmin with (dist, cell) ties, floor-ppm long sums,
      // truncating // division for the means feeding round 2
      "s20_pq_train" ->
        """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
          |           FROM embeddings),
          |ms AS (SELECT unnest(generate_series(0, 7)) AS m),
          |ds AS (SELECT unnest(generate_series(1, 8)) AS dim),
          |sv AS (SELECT vec_id, m, v[m*8+1 : m*8+8] AS s FROM v CROSS JOIN ms),
          |cb0 AS (SELECT m, vec_id AS cell, s AS cv FROM sv WHERE vec_id < 16),
          |a1 AS (SELECT sv.vec_id, sv.m, cb0.cell, sv.s,
          |       row_number() OVER (PARTITION BY sv.vec_id, sv.m ORDER BY
          |         list_sum(list_transform(generate_series(1, 8),
          |           i -> (s[i] - cv[i]) * (s[i] - cv[i]))), cell) AS rn
          |       FROM sv JOIN cb0 ON sv.m = cb0.m),
          |s1 AS (SELECT m, cell, dim,
          |         sum(floor(s[dim] * 1000000)::BIGINT) AS sum_ppm,
          |         count(*)::BIGINT AS n
          |       FROM a1 CROSS JOIN ds WHERE rn = 1 GROUP BY 1, 2, 3),
          |cb1 AS (SELECT m, cell,
          |         list_transform(list_sort(list(struct_pack(d := dim,
          |           mm := (sum_ppm // n)::DOUBLE / 1000000))), e -> e.mm) AS cv
          |       FROM s1 GROUP BY 1, 2),
          |a2 AS (SELECT sv.vec_id, sv.m, cb1.cell, sv.s,
          |       row_number() OVER (PARTITION BY sv.vec_id, sv.m ORDER BY
          |         list_sum(list_transform(generate_series(1, 8),
          |           i -> (s[i] - cv[i]) * (s[i] - cv[i]))), cell) AS rn
          |       FROM sv JOIN cb1 ON sv.m = cb1.m),
          |s2 AS (SELECT m, cell, dim,
          |         sum(floor(s[dim] * 1000000)::BIGINT) AS sum_ppm,
          |         count(*)::BIGINT AS n
          |       FROM a2 CROSS JOIN ds WHERE rn = 1 GROUP BY 1, 2, 3)
          |SELECT m::BIGINT AS m, cell, dim::BIGINT AS dim,
          |  (sum_ppm // n)::BIGINT AS mean_ppm, n AS n_vectors FROM s2""".stripMargin,
      // s21: the s20 chain extended one step — rebuild the trained
      // codebook from s2, assign once more, floor-ppm integer error sum
      "s21_pq_train_encode" ->
        """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
          |           FROM embeddings),
          |ms AS (SELECT unnest(generate_series(0, 7)) AS m),
          |ds AS (SELECT unnest(generate_series(1, 8)) AS dim),
          |sv AS (SELECT vec_id, m, v[m*8+1 : m*8+8] AS s FROM v CROSS JOIN ms),
          |cb0 AS (SELECT m, vec_id AS cell, s AS cv FROM sv WHERE vec_id < 16),
          |a1 AS (SELECT sv.vec_id, sv.m, cb0.cell, sv.s,
          |       row_number() OVER (PARTITION BY sv.vec_id, sv.m ORDER BY
          |         list_sum(list_transform(generate_series(1, 8),
          |           i -> (s[i] - cv[i]) * (s[i] - cv[i]))), cell) AS rn
          |       FROM sv JOIN cb0 ON sv.m = cb0.m),
          |s1 AS (SELECT m, cell, dim,
          |         sum(floor(s[dim] * 1000000)::BIGINT) AS sum_ppm,
          |         count(*)::BIGINT AS n
          |       FROM a1 CROSS JOIN ds WHERE rn = 1 GROUP BY 1, 2, 3),
          |cb1 AS (SELECT m, cell,
          |         list_transform(list_sort(list(struct_pack(d := dim,
          |           mm := (sum_ppm // n)::DOUBLE / 1000000))), e -> e.mm) AS cv
          |       FROM s1 GROUP BY 1, 2),
          |a2 AS (SELECT sv.vec_id, sv.m, cb1.cell, sv.s,
          |       row_number() OVER (PARTITION BY sv.vec_id, sv.m ORDER BY
          |         list_sum(list_transform(generate_series(1, 8),
          |           i -> (s[i] - cv[i]) * (s[i] - cv[i]))), cell) AS rn
          |       FROM sv JOIN cb1 ON sv.m = cb1.m),
          |s2 AS (SELECT m, cell, dim,
          |         sum(floor(s[dim] * 1000000)::BIGINT) AS sum_ppm,
          |         count(*)::BIGINT AS n
          |       FROM a2 CROSS JOIN ds WHERE rn = 1 GROUP BY 1, 2, 3),
          |cb2 AS (SELECT m, cell,
          |         list_transform(list_sort(list(struct_pack(d := dim,
          |           mm := (sum_ppm // n)::DOUBLE / 1000000))), e -> e.mm) AS cv
          |       FROM s2 GROUP BY 1, 2),
          |a3 AS (SELECT sv.vec_id, sv.m, cb2.cell,
          |         list_sum(list_transform(generate_series(1, 8),
          |           i -> (s[i] - cv[i]) * (s[i] - cv[i]))) AS d,
          |       row_number() OVER (PARTITION BY sv.vec_id, sv.m ORDER BY
          |         list_sum(list_transform(generate_series(1, 8),
          |           i -> (s[i] - cv[i]) * (s[i] - cv[i]))), cell) AS rn
          |       FROM sv JOIN cb2 ON sv.m = cb2.m)
          |SELECT m::BIGINT AS m, cell, count(*)::BIGINT AS n_vectors,
          |  sum(floor(d * 1000000)::BIGINT)::BIGINT AS err_ppm
          |FROM a3 WHERE rn = 1 GROUP BY 1, 2""".stripMargin,
      "t11_chunks" ->
        s"""SELECT doc_id, i::BIGINT AS chunk_idx,
           | least(32, len(t) - i*32)::BIGINT AS n_chunk_tokens,
           | md5(array_to_string(t[i*32+1 : i*32+32], ' ')) AS chunk_md5
           |FROM (SELECT doc_id, $toks AS t FROM documents)
           |CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
           |WHERE i <= ceil(len(t)/32.0) - 1""".stripMargin,
      "s04_centroid_sums" ->
        """SELECT label, j::BIGINT AS dim,
          | sum(CAST(floor(embedding[j]::DOUBLE * 1000000) AS BIGINT))::BIGINT AS sum_ppm,
          | count(*)::BIGINT AS n_vectors
          |FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j)
          |GROUP BY 1, 2""".stripMargin,
      "s05_kmeans" ->
        """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
          |c0 AS (SELECT vec_id AS cell, v AS cv FROM v WHERE vec_id % 25 = 0),
          |a1 AS (SELECT vec_id, v, cell FROM (
          |  SELECT v.vec_id, v.v, c.cell,
          |    row_number() OVER (PARTITION BY v.vec_id
          |      ORDER BY list_cosine_similarity(v.v, c.cv) DESC, c.cell) AS rn
          |  FROM v CROSS JOIN c0 c) WHERE rn = 1),
          |s1 AS (SELECT cell, j::BIGINT AS dim,
          |  sum(CAST(floor(v[j] * 1000000) AS BIGINT))::BIGINT AS sum_ppm,
          |  count(*)::BIGINT AS n
          |  FROM a1 CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) GROUP BY 1, 2),
          |c1 AS (SELECT cell, list((sum_ppm // n)::DOUBLE ORDER BY dim) AS cv FROM s1 GROUP BY cell),
          |a2 AS (SELECT vec_id, v, cell FROM (
          |  SELECT v.vec_id, v.v, c.cell,
          |    row_number() OVER (PARTITION BY v.vec_id
          |      ORDER BY list_cosine_similarity(v.v, c.cv) DESC, c.cell) AS rn
          |  FROM v CROSS JOIN c1 c) WHERE rn = 1),
          |s2 AS (SELECT cell, j::BIGINT AS dim,
          |  sum(CAST(floor(v[j] * 1000000) AS BIGINT))::BIGINT AS sum_ppm,
          |  count(*)::BIGINT AS n
          |  FROM a2 CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) GROUP BY 1, 2)
          |SELECT cell, dim, (sum_ppm // n)::BIGINT AS mean_ppm, n AS n_vectors FROM s2""".stripMargin,
      // s09: k-means|| init (seed = min vec_id; 2 md5-Bernoulli oversampling
      // rounds at l=40 with INTEGER cost/threshold math; weight-by-assignment
      // reduce to k=20) + 2 Lloyd iterations — mirrors Ann.kmeansParallel
      // defaults step for step. Cosines are spelled as explicit left-to-right
      // dot products (list_sum ∘ list_transform), the same summation order as
      // the Spark side's vec_dot, so even the floor()ed distance integers are
      // bit-identical across engines.
      "s09_kmeans_pp" ->
        """WITH v0 AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
          |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nm FROM v0),
          |c0 AS (SELECT vec_id AS cell, v AS cv, nm AS cn FROM n
          |       WHERE vec_id = (SELECT min(vec_id) FROM n)),
          |d1 AS (SELECT n.vec_id,
          |         max(list_sum(list_transform(n.v, (x,j) -> x * c.cv[j])) / (n.nm * c.cn)) AS cm
          |       FROM n CROSS JOIN c0 c GROUP BY n.vec_id),
          |e1 AS (SELECT n.vec_id, n.v, n.nm,
          |         CAST(floor((1-d1.cm)*(1-d1.cm)*1000000) AS BIGINT) AS d2ppm
          |       FROM n JOIN d1 ON n.vec_id = d1.vec_id),
          |s1 AS (SELECT vec_id, v, nm FROM e1
          |       WHERE ((('0x'||substr(md5('kmpp:1:'||vec_id),1,13))::BIGINT % 1048576)
          |              * (SELECT sum(d2ppm) FROM e1)) < 40 * d2ppm * 1048576),
          |c1 AS (SELECT cell, cv, cn FROM c0 UNION ALL SELECT vec_id, v, nm FROM s1),
          |d2 AS (SELECT n.vec_id,
          |         max(list_sum(list_transform(n.v, (x,j) -> x * c.cv[j])) / (n.nm * c.cn)) AS cm
          |       FROM n CROSS JOIN c1 c GROUP BY n.vec_id),
          |e2 AS (SELECT n.vec_id, n.v, n.nm,
          |         CAST(floor((1-d2.cm)*(1-d2.cm)*1000000) AS BIGINT) AS d2ppm
          |       FROM n JOIN d2 ON n.vec_id = d2.vec_id),
          |s2 AS (SELECT vec_id, v, nm FROM e2
          |       WHERE ((('0x'||substr(md5('kmpp:2:'||vec_id),1,13))::BIGINT % 1048576)
          |              * (SELECT sum(d2ppm) FROM e2)) < 40 * d2ppm * 1048576),
          |c2 AS (SELECT cell, cv, cn FROM c1 UNION ALL SELECT vec_id, v, nm FROM s2),
          |aw AS (SELECT vec_id, cell FROM (
          |        SELECT n.vec_id, c.cell,
          |          row_number() OVER (PARTITION BY n.vec_id
          |            ORDER BY list_sum(list_transform(n.v, (x,j) -> x * c.cv[j])) / (n.nm * c.cn) DESC,
          |                     c.cell ASC) AS rn
          |        FROM n CROSS JOIN c2 c) WHERE rn = 1),
          |w AS (SELECT cell, count(*) AS wt FROM aw GROUP BY cell),
          |ck AS (SELECT c2.cell, c2.cv, c2.cn FROM c2 JOIN w ON c2.cell = w.cell
          |       ORDER BY w.wt DESC, c2.cell ASC LIMIT 20),
          |a1 AS (SELECT vec_id, v, cell FROM (
          |        SELECT n.vec_id, n.v, c.cell,
          |          row_number() OVER (PARTITION BY n.vec_id
          |            ORDER BY list_sum(list_transform(n.v, (x,j) -> x * c.cv[j])) / (n.nm * c.cn) DESC,
          |                     c.cell ASC) AS rn
          |        FROM n CROSS JOIN ck c) WHERE rn = 1),
          |t1 AS (SELECT cell, j::BIGINT AS dim,
          |         sum(CAST(floor(v[j] * 1000000) AS BIGINT))::BIGINT AS sum_ppm,
          |         count(*)::BIGINT AS nv
          |       FROM a1 CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) GROUP BY 1, 2),
          |r1 AS (SELECT cell, list((sum_ppm // nv)::DOUBLE ORDER BY dim) AS cv FROM t1 GROUP BY cell),
          |k1 AS (SELECT cell, cv, sqrt(list_sum(list_transform(cv, x -> x*x))) AS cn FROM r1),
          |a2 AS (SELECT vec_id, v, cell FROM (
          |        SELECT n.vec_id, n.v, c.cell,
          |          row_number() OVER (PARTITION BY n.vec_id
          |            ORDER BY list_sum(list_transform(n.v, (x,j) -> x * c.cv[j])) / (n.nm * c.cn) DESC,
          |                     c.cell ASC) AS rn
          |        FROM n CROSS JOIN k1 c) WHERE rn = 1),
          |t2 AS (SELECT cell, j::BIGINT AS dim,
          |         sum(CAST(floor(v[j] * 1000000) AS BIGINT))::BIGINT AS sum_ppm,
          |         count(*)::BIGINT AS nv
          |       FROM a2 CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) GROUP BY 1, 2)
          |SELECT cell, dim, (sum_ppm // nv)::BIGINT AS mean_ppm, nv AS n_vectors FROM t2""".stripMargin,
      "t05_winnow" ->
        s"""WITH kg AS (SELECT doc_id, $kgrams AS gs FROM (SELECT doc_id, $toks AS t FROM documents)),
           |hs AS (SELECT doc_id, list_transform(gs, g -> ${h60("g")}) AS h FROM kg),
           |wins AS (SELECT doc_id,
           |  CASE WHEN len(h) >= 4 THEN list_transform(generate_series(1, len(h)-3), i -> list_min(h[i:i+3]))
           |       WHEN len(h) > 0 THEN [list_min(h)] ELSE [] END AS ws FROM hs)
           |SELECT doc_id, unnest(list_distinct(ws)) AS fingerprint FROM wins""".stripMargin,
      "s03_lsh_buckets" ->
        """WITH pl AS (SELECT p, list_transform(generate_series(0, 63), j ->
          |    CASE WHEN ((('0x'||substr(md5('plane:'||p||':'||(j//60)),1,15))::BIGINT >> (j%60)) & 1) = 1
          |         THEN 1.0 ELSE -1.0 END) AS sv
          |  FROM (SELECT unnest(generate_series(0, 7)) AS p)),
          |v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
          |d AS (SELECT vec_id, p, list_sum(list_transform(v, (x, j) -> x * sv[j])) AS dot
          |      FROM v CROSS JOIN pl)
          |SELECT vec_id, sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bucket
          |FROM d GROUP BY vec_id""".stripMargin,
      "d01_dedup_exact" ->
        """SELECT md5(text) AS text_md5, min(doc_id) AS keeper_id, count(*) AS n_docs
          | FROM documents GROUP BY 1""".stripMargin,
      "d11_snapshot_diff" ->
        """SELECT md5(text) AS text_md5 FROM documents WHERE doc_id % 2 = 0
          |EXCEPT
          |SELECT md5(text) AS text_md5 FROM documents WHERE doc_id % 2 = 1""".stripMargin,
      "d02_minhash_lsh" ->
        s"WITH $minhashCtes\nSELECT a, b, est_ppm FROM est WHERE est_ppm >= 500000",
      // d21: slice-level union signatures — NON-distinct k-grams feed the
      // same h1/h2 min family (duplicates cannot move a min), pairwise
      // slot agreement over the slices-bounded signature table
      "d21_corpus_overlap" ->
        s"""WITH sh AS (SELECT source AS slice, unnest($kgrams) AS g
           |  FROM (SELECT source, $toks AS t FROM documents)),
           |h2 AS (SELECT slice, ('0x' || substr(md5(g), 1, 15))::BIGINT AS h1,
           |       (('0x' || substr(md5(g), 16, 14))::BIGINT % (1::BIGINT << 55)) AS h2 FROM sh),
           |hs AS (SELECT slice, i, min((h1 + i * h2) % 2305843009213693951) AS h
           |       FROM h2 CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
           |       GROUP BY slice, i),
           |sig AS (SELECT slice, list(h ORDER BY i) AS sig FROM hs GROUP BY slice)
           |SELECT x.slice AS src_a, y.slice AS src_b,
           |  (len(list_filter(generate_series(1, 64), i -> x.sig[i] = y.sig[i]))
           |     * 1000000 // 64)::BIGINT AS est_ppm
           |FROM sig x JOIN sig y ON x.slice < y.slice""".stripMargin,
      // d18: est (tau 300000) vs exact Jaccard on the candidate pairs;
      // zero-overlap band collisions surface as jaccard 0
      "d18_minhash_calibration" ->
        s"""WITH $minhashCtes,
           |pairs AS (SELECT a, b, est_ppm FROM est WHERE est_ppm >= 300000),
           |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
           |common AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
           |           FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
           |           GROUP BY 1, 2)
           |SELECT p.a, p.b, p.est_ppm,
           |  coalesce(c * 1000000 // (na.n + nb.n - c), 0)::BIGINT AS jaccard_ppm,
           |  abs(p.est_ppm - coalesce(c * 1000000 // (na.n + nb.n - c), 0))::BIGINT
           |    AS err_ppm
           |FROM pairs p
           |LEFT JOIN common ON p.a = common.a AND p.b = common.b
           |JOIN sizes na ON p.a = na.doc_id
           |JOIN sizes nb ON p.b = nb.doc_id""".stripMargin,
      "d06_dup_clusters" ->
        s"""WITH RECURSIVE $minhashCtes,
           |p AS (SELECT a, b FROM est WHERE est_ppm >= 500000),
           |nodes AS (SELECT a AS n FROM p UNION SELECT b FROM p),
           |e AS (SELECT a AS u, b AS v FROM p UNION SELECT b AS u, a AS v FROM p),
           |reach(n, m) AS (
           |  SELECT n, n FROM nodes
           |  UNION
           |  SELECT r.n, e.v FROM reach r JOIN e ON r.m = e.u)
           |SELECT n AS node, min(m) AS component FROM reach GROUP BY n""".stripMargin,
      "d03_simhash_pairs" ->
        s"""WITH tc AS (SELECT doc_id, t AS tok, count(*)::BIGINT AS c
           |            FROM (SELECT doc_id, unnest($toks) AS t FROM documents) GROUP BY doc_id, tok),
           |th AS (SELECT doc_id, ${h60("tok")} AS h, c FROM tc),
           |bits AS (SELECT doc_id, b, sum(CASE WHEN ((h >> b) & 1) = 1 THEN c ELSE -c END)::BIGINT AS s
           |         FROM th CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) GROUP BY doc_id, b),
           |sh AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
           |       FROM bits GROUP BY doc_id)
           |SELECT x.doc_id AS a, y.doc_id AS b, bit_count(xor(x.simhash, y.simhash))::BIGINT AS hamming
           |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
           |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3""".stripMargin,
      "d04_ngram_jaccard" ->
        s"""WITH kg AS (SELECT doc_id, list_distinct($kgrams) AS gs FROM (SELECT doc_id, $toks AS t FROM documents)),
           |sh AS (SELECT doc_id, unnest(gs) AS g FROM kg),
           |sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id),
           |common AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS c
           |           FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id GROUP BY 1, 2)
           |SELECT a, b, (c * 1000000 // (na.n + nb.n - c))::BIGINT AS jaccard_ppm
           |FROM common JOIN sizes na ON a = na.doc_id JOIN sizes nb ON b = nb.doc_id
           |WHERE (c * 1000000 // (na.n + nb.n - c)) >= 500000""".stripMargin,
      // d24: the same 5-gram freq pass + per-token covered-by-hot-start
      // mask, rebuilt with list_filter's (x, i) indexed lambda; docs
      // without hot grams keep everything (LEFT JOIN, empty starts)
      // d25: the canonical URL derived analytically from the same
      // doc_id formula the Spark side feeds through canonicalizeUrl
      "d25_url_dedup" ->
        """SELECT 'https://site' || ((doc_id // 4) % 5)::VARCHAR ||
          |    '.example.com/page/' || (doc_id // 4)::VARCHAR AS url,
          |  count(*)::BIGINT AS n_dups, min(doc_id) AS keep_doc_id
          |FROM documents GROUP BY 1""".stripMargin,
      // d26: exact filter/probe/member counts + the Bloom theorems as
      // literals — zero false negatives (OR-merge theorem, hash-compared)
      // and the measured FP budget verdict (a01/e13/e14 gate pattern)
      // d27: the surviving canonical URL set ≡ batch DISTINCT (d25's
      // canonical formula) — which doc won each URL is arrival-dependent,
      // the URL set is not
      "d27_stream_url_dedup" ->
        """SELECT DISTINCT 'https://site' || ((doc_id // 4) % 5)::VARCHAR ||
          |  '.example.com/page/' || (doc_id // 4)::VARCHAR AS url
          |FROM documents""".stripMargin,
      "d26_bloom_seen" ->
        """WITH f AS (SELECT DISTINCT 'https://ex.com/p' || (doc_id % 301) AS url
          |           FROM documents WHERE doc_id % 2 = 0),
          |p AS (SELECT DISTINCT 'https://ex.com/p' || (doc_id % 301) AS url
          |      FROM documents WHERE doc_id % 2 = 1)
          |SELECT (SELECT count(*) FROM f)::BIGINT AS n_filter,
          |  (SELECT count(*) FROM p)::BIGINT AS n_probes,
          |  (SELECT count(*) FROM p JOIN f USING (url))::BIGINT AS n_members,
          |  0::BIGINT AS false_negatives,
          |  1::BIGINT AS fp_within_bound""".stripMargin,
      "d24_span_scrub" ->
        """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
          |grams AS (SELECT doc_id, i AS pos, array_to_string(t[i : i+4], ' ') AS g
          |  FROM (SELECT doc_id, t,
          |          unnest(generate_series(1, len(t) - 4)) AS i FROM toks)),
          |hot AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 3),
          |hs AS (SELECT doc_id, list_sort(list(pos)) AS starts
          |       FROM grams JOIN hot USING (g) GROUP BY doc_id),
          |j AS (SELECT toks.doc_id, t, coalesce(starts, []) AS starts
          |      FROM toks LEFT JOIN hs ON toks.doc_id = hs.doc_id),
          |k AS (SELECT doc_id, len(t)::BIGINT AS n_tokens,
          |        list_filter(t, (x, i) -> len(list_filter(starts,
          |          p -> p <= i AND i < p + 5)) = 0) AS kept
          |      FROM j)
          |SELECT doc_id, n_tokens,
          |  (n_tokens - len(kept))::BIGINT AS n_masked,
          |  -- DuckDB's empty-list join is NULL; Spark's array_join is ''
          |  coalesce(array_to_string(kept, ' '), '') AS scrubbed FROM k""".stripMargin,
      // d23: t18's split hash + d04's k-gram machinery → leakage matrix
      "d23_split_leakage" ->
        s"""WITH m AS (SELECT doc_id,
           |    CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
           |         ELSE 'test' END AS split
           |  FROM (SELECT doc_id,
           |        ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS b
           |        FROM documents)),
           |kg AS (SELECT doc_id, list_distinct($kgrams) AS gs
           |       FROM (SELECT doc_id, $toks AS t FROM documents)),
           |sg AS (SELECT DISTINCT split, g FROM
           |       (SELECT m.split, unnest(gs) AS g FROM kg JOIN m USING (doc_id))),
           |sizes AS (SELECT split, count(*)::BIGINT AS n FROM sg GROUP BY 1),
           |sh AS (SELECT x.split AS split_a, y.split AS split_b,
           |         count(*)::BIGINT AS shared_grams
           |       FROM sg x JOIN sg y ON x.g = y.g AND x.split != y.split
           |       GROUP BY 1, 2)
           |SELECT split_a, split_b, shared_grams,
           |  (shared_grams * 1000000 // n)::BIGINT AS leak_ppm
           |FROM sh JOIN sizes ON split_a = sizes.split""".stripMargin,
      "d12_containment" ->
        s"""WITH kg AS (SELECT doc_id, list_distinct($kgrams) AS gs FROM (SELECT doc_id, $toks AS t FROM documents)),
           |sh AS (SELECT doc_id, unnest(gs) AS g FROM kg),
           |sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id),
           |common AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS c
           |           FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id GROUP BY 1, 2)
           |SELECT a, b, (c * 1000000 // na.n)::BIGINT AS cont_a_ppm,
           |       (c * 1000000 // nb.n)::BIGINT AS cont_b_ppm
           |FROM common JOIN sizes na ON a = na.doc_id JOIN sizes nb ON b = nb.doc_id
           |WHERE (c * 1000000 // na.n) >= 800000 OR (c * 1000000 // nb.n) >= 800000""".stripMargin,
      "d13_chunk_dedup" ->
        s"""WITH ch AS (
           |  SELECT doc_id, i::BIGINT AS chunk_idx,
           |    md5(array_to_string(t[i*8+1 : i*8+8], ' ')) AS chunk_md5
           |  FROM (SELECT doc_id, $toks AS t FROM documents)
           |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
           |  WHERE i <= ceil(len(t)/8.0) - 1),
           |f1 AS (SELECT chunk_md5, min(doc_id) AS kd FROM ch GROUP BY 1),
           |f2 AS (SELECT ch.chunk_md5, f1.kd, min(ch.chunk_idx) AS ki
           |       FROM ch JOIN f1 ON ch.chunk_md5 = f1.chunk_md5 AND ch.doc_id = f1.kd
           |       GROUP BY 1, 2)
           |SELECT ch.doc_id, count(*)::BIGINT AS n_chunks,
           | sum(CASE WHEN f2.kd = ch.doc_id AND f2.ki = ch.chunk_idx
           |     THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           | sum(CASE WHEN f2.kd = ch.doc_id AND f2.ki = ch.chunk_idx
           |     THEN 0 ELSE 1 END)::BIGINT AS n_dropped
           |FROM ch JOIN f2 ON ch.chunk_md5 = f2.chunk_md5
           |GROUP BY 1""".stripMargin,
      // d17: identical k=8 positional grams, occ-cap, and diagonal
      // gaps-and-islands; md5-60 digests make the join bit-identical
      "d17_substring_runs" ->
        s"""WITH g AS (
           |  SELECT doc_id, i::BIGINT AS pos,
           |    ${h60("array_to_string(t[i : i+7], ' ')")} AS gh
           |  FROM (SELECT doc_id, $toks AS t FROM documents),
           |  LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i)
           |  WHERE len(t) >= 8),
           |cold AS (SELECT * FROM g QUALIFY count(*) OVER (PARTITION BY gh) <= 50),
           |cand AS (SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa,
           |                x.pos - y.pos AS diag
           |         FROM cold x JOIN cold y
           |           ON x.gh = y.gh AND x.doc_id < y.doc_id),
           |runs AS (SELECT a, b, count(*) + 7 AS run_tokens FROM (
           |    SELECT a, b, diag, pa,
           |      pa - row_number() OVER (PARTITION BY a, b, diag ORDER BY pa) AS grp
           |    FROM cand)
           |  GROUP BY a, b, diag, grp
           |  HAVING count(*) + 7 >= 12)
           |SELECT a AS doc_a, b AS doc_b, count(*)::BIGINT AS n_runs,
           |       max(run_tokens)::BIGINT AS max_run_tokens
           |FROM runs GROUP BY 1, 2""".stripMargin,
      "d14_stream_dedup_parity" ->
        "SELECT DISTINCT md5(props) AS content_md5 FROM events WHERE props IS NOT NULL",
      "d15_stream_neardup_parity" ->
        """WITH pl AS (SELECT p, list_transform(generate_series(0, 63), j ->
          |    CASE WHEN ((('0x'||substr(md5('plane:'||p||':'||(j//60)),1,15))::BIGINT >> (j%60)) & 1) = 1
          |         THEN 1.0 ELSE -1.0 END) AS sv
          |  FROM (SELECT unnest(generate_series(0, 7)) AS p)),
          |v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
          |d AS (SELECT vec_id, p, list_sum(list_transform(v, (x, j) -> x * sv[j])) AS dot
          |      FROM v CROSS JOIN pl),
          |b AS (SELECT vec_id, sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bucket
          |      FROM d GROUP BY vec_id)
          |SELECT DISTINCT bucket FROM b""".stripMargin,
      "d05_embed_neardup" ->
        """SELECT x.vec_id AS a, y.vec_id AS b
          |FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
          |WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.42""".stripMargin,
      "d07_lsh_neardup" ->
        """WITH pl AS (SELECT p, list_transform(generate_series(0, 63), j ->
          |    CASE WHEN ((('0x'||substr(md5('plane:'||p||':'||(j//60)),1,15))::BIGINT >> (j%60)) & 1) = 1
          |         THEN 1.0 ELSE -1.0 END) AS sv
          |  FROM (SELECT unnest(generate_series(0, 3)) AS p)),
          |v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
          |d AS (SELECT vec_id, p, list_sum(list_transform(v, (x, j) -> x * sv[j])) AS dot
          |      FROM v CROSS JOIN pl),
          |bk AS (SELECT vec_id, sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bucket
          |       FROM d GROUP BY vec_id)
          |SELECT x.vec_id AS a, y.vec_id AS b
          |FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
          |JOIN embeddings ex ON ex.vec_id = x.vec_id
          |JOIN embeddings ey ON ey.vec_id = y.vec_id
          |WHERE list_cosine_similarity(ex.embedding, ey.embedding) >= 0.35""".stripMargin,
      // s22: d10's two-table LSH bucket SQL feeding a per-source cosine
      // rank window — ties to the smaller neighbor id (s01 convention)
      "s22_knn_graph" ->
        """WITH pl AS (SELECT t, p, list_transform(generate_series(0, 63), j ->
          |    CASE WHEN ((('0x'||substr(md5('plane:'||t||':'||p||':'||(j//60)),1,15))::BIGINT >> (j%60)) & 1) = 1
          |         THEN 1.0 ELSE -1.0 END) AS sv
          |  FROM (SELECT unnest(generate_series(0, 1)) AS t)
          |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS p)),
          |v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
          |d AS (SELECT vec_id, t, p, list_sum(list_transform(v, (x, j) -> x * sv[j])) AS dot
          |      FROM v CROSS JOIN pl),
          |bk AS (SELECT vec_id, t, sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bucket
          |       FROM d GROUP BY vec_id, t),
          |cand AS (SELECT DISTINCT x.vec_id, y.vec_id AS neighbor_id
          |         FROM bk x JOIN bk y ON x.t = y.t AND x.bucket = y.bucket
          |                            AND x.vec_id != y.vec_id),
          |r AS (SELECT c.vec_id, c.neighbor_id,
          |        row_number() OVER (PARTITION BY c.vec_id
          |          ORDER BY list_cosine_similarity(ex.embedding, ey.embedding) DESC,
          |                   c.neighbor_id) AS rank
          |      FROM cand c JOIN embeddings ex ON ex.vec_id = c.vec_id
          |                  JOIN embeddings ey ON ey.vec_id = c.neighbor_id)
          |SELECT vec_id, rank::BIGINT AS rank, neighbor_id FROM r WHERE rank <= 3""".stripMargin,
      "d10_lsh_multitable" ->
        """WITH pl AS (SELECT t, p, list_transform(generate_series(0, 63), j ->
          |    CASE WHEN ((('0x'||substr(md5('plane:'||t||':'||p||':'||(j//60)),1,15))::BIGINT >> (j%60)) & 1) = 1
          |         THEN 1.0 ELSE -1.0 END) AS sv
          |  FROM (SELECT unnest(generate_series(0, 2)) AS t)
          |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS p)),
          |v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
          |d AS (SELECT vec_id, t, p, list_sum(list_transform(v, (x, j) -> x * sv[j])) AS dot
          |      FROM v CROSS JOIN pl),
          |bk AS (SELECT vec_id, t, sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bucket
          |       FROM d GROUP BY vec_id, t),
          |cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
          |         FROM bk x JOIN bk y ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
          |SELECT a, b FROM cand
          |JOIN embeddings ex ON ex.vec_id = a
          |JOIN embeddings ey ON ey.vec_id = b
          |WHERE list_cosine_similarity(ex.embedding, ey.embedding) >= 0.35""".stripMargin,
      // d16 = the batch d10 pair set's survivors: a doc drops iff it is
      // the LATER side (b) of any multi-table verified pair — streaming
      // arrival order is vec_id order (ts = timestamp_micros(vec_id))
      "d16_stream_neardup_verified" ->
        """WITH pl AS (SELECT t, p, list_transform(generate_series(0, 63), j ->
          |    CASE WHEN ((('0x'||substr(md5('plane:'||t||':'||p||':'||(j//60)),1,15))::BIGINT >> (j%60)) & 1) = 1
          |         THEN 1.0 ELSE -1.0 END) AS sv
          |  FROM (SELECT unnest(generate_series(0, 2)) AS t)
          |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS p)),
          |v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
          |d AS (SELECT vec_id, t, p, list_sum(list_transform(v, (x, j) -> x * sv[j])) AS dot
          |      FROM v CROSS JOIN pl),
          |bk AS (SELECT vec_id, t, sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bucket
          |       FROM d GROUP BY vec_id, t),
          |cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
          |         FROM bk x JOIN bk y ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
          |p2 AS (SELECT a, b FROM cand
          |       JOIN embeddings ex ON ex.vec_id = a
          |       JOIN embeddings ey ON ey.vec_id = b
          |       WHERE list_cosine_similarity(ex.embedding, ey.embedding) >= 0.35)
          |SELECT vec_id FROM embeddings
          |WHERE vec_id NOT IN (SELECT b FROM p2)""".stripMargin,
      "d08_contamination" ->
        s"""WITH kg AS (SELECT doc_id, list_distinct($kgrams) AS gs
           |            FROM (SELECT doc_id, $toks AS t FROM documents)),
           |g AS (SELECT doc_id, unnest(gs) AS gram FROM kg),
           |bench AS (SELECT doc_id AS bench_id, gram FROM g WHERE doc_id % 25 = 0),
           |shared AS (SELECT DISTINCT g.doc_id, g.gram
           |           FROM g JOIN bench b ON g.gram = b.gram AND g.doc_id != b.bench_id)
           |SELECT doc_id, count(*)::BIGINT AS n_shared_grams FROM shared GROUP BY 1""".stripMargin,
      "d19_decontaminate_apply" ->
        s"""WITH kg AS (SELECT doc_id, list_distinct($kgrams) AS gs
           |            FROM (SELECT doc_id, $toks AS t FROM documents)),
           |g AS (SELECT doc_id, unnest(gs) AS gram FROM kg),
           |bench AS (SELECT doc_id AS bench_id, gram FROM g WHERE doc_id % 25 = 0),
           |cont AS (SELECT DISTINCT g.doc_id
           |         FROM g JOIN bench b ON g.gram = b.gram AND g.doc_id != b.bench_id)
           |SELECT d.doc_id FROM documents d
           |WHERE d.doc_id % 25 != 0
           |  AND d.doc_id NOT IN (SELECT doc_id FROM cont)""".stripMargin,
      // d20: d17's islands on the self-diagonal (same doc, pos1 < pos2)
      "d20_self_repeats" ->
        s"""WITH g AS (
           |  SELECT doc_id, i::BIGINT AS pos,
           |    ${h60("array_to_string(t[i : i+1], ' ')")} AS gh
           |  FROM (SELECT doc_id, $toks AS t FROM documents),
           |  LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
           |  WHERE len(t) >= 2),
           |cold AS (SELECT * FROM g QUALIFY count(*) OVER (PARTITION BY gh) <= 50),
           |cand AS (SELECT x.doc_id AS d, x.pos AS pa, y.pos - x.pos AS diag
           |         FROM cold x JOIN cold y
           |           ON x.gh = y.gh AND x.doc_id = y.doc_id AND x.pos < y.pos),
           |runs AS (SELECT d, count(*) + 1 AS run_tokens FROM (
           |    SELECT d, diag, pa,
           |      pa - row_number() OVER (PARTITION BY d, diag ORDER BY pa) AS grp
           |    FROM cand)
           |  GROUP BY d, diag, grp
           |  HAVING count(*) + 1 >= 3)
           |SELECT d AS doc_id, count(*)::BIGINT AS n_repeats,
           |       max(run_tokens)::BIGINT AS max_repeat_tokens
           |FROM runs GROUP BY 1""".stripMargin,
      "d09_dedup_apply" ->
        s"""WITH RECURSIVE $minhashCtes,
           |p AS (SELECT a, b FROM est WHERE est_ppm >= 500000),
           |nodes AS (SELECT a AS n FROM p UNION SELECT b FROM p),
           |e AS (SELECT a AS u, b AS v FROM p UNION SELECT b AS u, a AS v FROM p),
           |reach(n, m) AS (
           |  SELECT n, n FROM nodes
           |  UNION
           |  SELECT r.n, e.v FROM reach r JOIN e ON r.m = e.u),
           |comp AS (SELECT n AS node, min(m) AS component FROM reach GROUP BY n),
           |drops AS (SELECT node FROM comp WHERE node != component)
           |SELECT doc_id FROM documents
           |WHERE doc_id NOT IN (SELECT node FROM drops)""".stripMargin,
      // d22: same recursive-CTE clustering as d09, but the keeper is the
      // quality argmax (row_number ties ASC on node = Spark's -node pick);
      // the quality CTE is t02's composite formula inline
      "d22_quality_dedup_apply" ->
        s"""WITH RECURSIVE $minhashCtes,
           |p AS (SELECT a, b FROM est WHERE est_ppm >= 500000),
           |nodes AS (SELECT a AS n FROM p UNION SELECT b FROM p),
           |e AS (SELECT a AS u, b AS v FROM p UNION SELECT b AS u, a AS v FROM p),
           |reach(n, m) AS (
           |  SELECT n, n FROM nodes
           |  UNION
           |  SELECT r.n, e.v FROM reach r JOIN e ON r.m = e.u),
           |comp AS (SELECT n AS node, min(m) AS component FROM reach GROUP BY n),
           |q AS (SELECT doc_id,
           |  ((1000000 - (len(regexp_extract_all(text, '[^a-z0-9 ]')) * 1000000 // length(text))
           |    + (len(list_filter($toks, t -> list_contains($enStop, t))) * 1000000 // len($toks))
           |    + (least(length(text), 500) * 1000000 // 500)) // 3)::BIGINT AS qy
           |  FROM documents),
           |keepers AS (SELECT node AS keeper FROM (
           |  SELECT comp.node, row_number() OVER (PARTITION BY comp.component
           |    ORDER BY q.qy DESC, comp.node ASC) AS rn
           |  FROM comp JOIN q ON q.doc_id = comp.node) WHERE rn = 1),
           |drops AS (SELECT node FROM comp
           |  WHERE node NOT IN (SELECT keeper FROM keepers))
           |SELECT doc_id,
           |  CASE WHEN doc_id IN (SELECT node FROM comp) THEN 'keeper'
           |       ELSE 'solo' END AS kept_as
           |FROM documents WHERE doc_id NOT IN (SELECT node FROM drops)""".stripMargin,
      "s01_ann_topk" -> s01Sql,
      "s23_mrr_eval" -> s23Sql,
      "s02_ann_ivf" -> s02Sql,
      // s19: identical single-IEEE-op scaling (float→double ×1e6 floor)
      // so integer sums/extremes hash-match; NaN-guarded like the Spark side
      "s19_embedding_health" ->
        """WITH x AS (SELECT i::BIGINT AS d, embedding[i+1]::DOUBLE AS v
          |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i))
          |SELECT d, count(CASE WHEN NOT isnan(v) THEN 1 END)::BIGINT AS n,
          | count(CASE WHEN isnan(v) THEN 1 END)::BIGINT AS n_nan,
          | sum(CASE WHEN NOT isnan(v) THEN floor(v * 1000000) END)::BIGINT AS sum_m,
          | min(CASE WHEN NOT isnan(v) THEN floor(v * 1000000) END)::BIGINT AS min_m,
          | max(CASE WHEN NOT isnan(v) THEN floor(v * 1000000) END)::BIGINT AS max_m
          |FROM x GROUP BY 1""".stripMargin,
      // s11: SQ8 — identical single-IEEE-op order on both engines; floor
      // lands on BIGINT via the cast (Spark's floor is already LONG)
      "s11_sq8_codes" ->
        """WITH x AS (SELECT vec_id, i, embedding[i+1]::DOUBLE AS v
          |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)),
          |mm AS (SELECT i, min(v) AS mn, max(v) AS mx FROM x GROUP BY 1)
          |SELECT vec_id, x.i::BIGINT AS d,
          |  CASE WHEN mx > mn
          |       THEN least(255, greatest(0, floor((v - mn) * 255 / (mx - mn))))::BIGINT
          |       ELSE 0 END AS code
          |FROM x JOIN mm ON x.i = mm.i""".stripMargin,
      // s12: symmetric SQ8 — integer distances, total (dist, id) order
      "s12_sq8_search" ->
        """WITH x AS (SELECT vec_id, i, embedding[i+1]::DOUBLE AS v
          |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)),
          |mm AS (SELECT i, min(v) AS mn, max(v) AS mx FROM x GROUP BY 1),
          |codes AS (SELECT vec_id, x.i,
          |  CASE WHEN mx > mn
          |       THEN least(255, greatest(0, floor((v - mn) * 255 / (mx - mn))))::BIGINT
          |       ELSE 0 END AS code
          |  FROM x JOIN mm ON x.i = mm.i),
          |dists AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |    sum((q.code - c.code) * (q.code - c.code))::BIGINT AS dist
          |  FROM codes q JOIN codes c ON q.i = c.i AND q.vec_id != c.vec_id
          |  WHERE q.vec_id % 50 = 0 GROUP BY 1, 2),
          |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
          |    ORDER BY dist, neighbor_id) AS rank FROM dists)
          |SELECT query_id, rank::BIGINT AS rank, neighbor_id, dist
          |FROM r WHERE rank <= 5""".stripMargin,
      // s10: SemDeDup — assignment mirrors assignCells (max cosine, tie →
      // smaller cell), the greedy keep-first prune is a cluster equi-join,
      // survivors an anti join. Only the integer (vec_id, cell) decisions
      // cross the compare, as in s02.
      "s10_semdedup" ->
        """WITH seeds AS (SELECT vec_id AS cell, embedding AS ce
          |  FROM embeddings ORDER BY vec_id LIMIT 8),
          |asg AS (SELECT vec_id, embedding, cell FROM (
          |  SELECT e.vec_id, e.embedding, s.cell,
          |    row_number() OVER (PARTITION BY e.vec_id
          |      ORDER BY list_cosine_similarity(e.embedding, s.ce) DESC, s.cell) AS rn
          |  FROM embeddings e CROSS JOIN seeds s) WHERE rn = 1),
          |drops AS (SELECT DISTINCT x.vec_id FROM asg x JOIN asg y
          |  ON x.cell = y.cell AND y.vec_id < x.vec_id
          |  WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.42)
          |SELECT a.vec_id, a.cell FROM asg a ANTI JOIN drops d ON a.vec_id = d.vec_id"""
          .stripMargin,
      "s08_ivfpq_search" -> s08Sql(5),
      // s15: list_inner_product sums left-to-right like vec_dot
      "s15_mips_topk" ->
        """WITH q AS (SELECT vec_id AS query_id,
          |           list_transform(embedding, x -> x::DOUBLE) AS qe
          |           FROM embeddings WHERE vec_id % 50 = 0),
          |scored AS (SELECT query_id, e.vec_id AS neighbor_id,
          |  row_number() OVER (PARTITION BY query_id
          |    ORDER BY list_inner_product(qe,
          |      list_transform(e.embedding, x -> x::DOUBLE)) DESC, e.vec_id) AS rank
          |  FROM q JOIN embeddings e ON e.vec_id != q.query_id)
          |SELECT query_id, rank::BIGINT AS rank, neighbor_id FROM scored
          |WHERE rank <= 5""".stripMargin,
      // s14: s01 with the corpus side pre-filtered to lang='en' doc ids
      "s14_filtered_ann" ->
        """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
          |           FROM embeddings WHERE vec_id % 50 = 0),
          |allowed AS (SELECT doc_id FROM documents WHERE lang = 'en'),
          |scored AS (SELECT query_id, e.vec_id AS neighbor_id,
          |  row_number() OVER (PARTITION BY query_id
          |    ORDER BY list_cosine_similarity(qe, e.embedding) DESC, e.vec_id) AS rank
          |  FROM q JOIN embeddings e ON e.vec_id != q.query_id
          |  JOIN allowed a ON a.doc_id = e.vec_id)
          |SELECT query_id, rank::BIGINT AS rank, neighbor_id FROM scored
          |WHERE rank <= 5""".stripMargin,
      // s13: s08's pipeline with a 20-deep shortlist, then exact-cosine
      // re-rank of just those candidates — the refine must reproduce the
      // Spark (cosine desc, neighbor_id) order exactly
      "s13_ivfpq_rerank" -> s13Sql,
      "s16_refine_recall" ->
        s"""WITH exact AS ($s01Sql),
           |approx AS ($s13Sql)
           |SELECT e.query_id, count(a.neighbor_id)::BIGINT AS n_hits,
           | (count(a.neighbor_id) * 1000000 // count(*))::BIGINT AS recall_ppm
           |FROM exact e LEFT JOIN approx a
           |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
           |GROUP BY 1""".stripMargin,
      // s17: one UNION ALL branch per nprobe, each the s07 recall calc
      // over the nprobe-parameterized IVF pipeline
      "s17_ivf_tuning" ->
        Seq(1, 2, 4).map { np =>
          s"""SELECT $np::BIGINT AS nprobe,
             | count(DISTINCT e.query_id)::BIGINT AS n_queries,
             | count(a.neighbor_id)::BIGINT AS n_hits,
             | (count(a.neighbor_id) * 1000000 // count(*))::BIGINT AS recall_ppm
             |FROM ($s01Sql) e LEFT JOIN (${s02SqlN(np)}) a
             |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id"""
            .stripMargin
        }.mkString("\n UNION ALL \n"),
      "s07_recall_eval" ->
        s"""WITH exact AS ($s01Sql),
           |approx AS ($s02Sql)
           |SELECT e.query_id, count(a.neighbor_id)::BIGINT AS n_hits,
           | (count(a.neighbor_id) * 1000000 // count(*))::BIGINT AS recall_ppm
           |FROM exact e LEFT JOIN approx a
           |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
           |GROUP BY 1""".stripMargin,
      "t17_bigram_novelty" ->
        s"""WITH bg AS (SELECT DISTINCT doc_id, md5(g) AS gh FROM (
           |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1),
           |    i -> t[i]||' '||t[i+1])) AS g
           |  FROM (SELECT doc_id, $toks AS t FROM documents))),
           |dfq AS (SELECT gh, count(*) AS df FROM bg GROUP BY 1)
           |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
           | sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel,
           | (sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1000000 // count(*))::BIGINT
           |   AS novelty_ppm
           |FROM bg JOIN dfq USING (gh) GROUP BY 1""".stripMargin,
      "t18_train_split" ->
        s"""SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
           |      ELSE 'test' END AS split,
           | lang, source, count(*)::BIGINT AS n_docs,
           | sum(len($toks))::BIGINT AS n_tokens
           |FROM (SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS b,
           |      lang, source, text FROM documents)
           |GROUP BY 1, 2, 3""".stripMargin,
      "t19_shard_packing" ->
        s"""WITH n AS (SELECT doc_id, len($toks)::BIGINT AS n FROM documents),
           |c AS (SELECT doc_id, n,
           |      coalesce(sum(n) OVER (ORDER BY doc_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
           |      FROM n)
           |SELECT (pre // 50000)::BIGINT AS shard_id, count(*)::BIGINT AS n_docs,
           | sum(n)::BIGINT AS n_tokens, min(doc_id) AS first_doc, max(doc_id) AS last_doc
           |FROM c GROUP BY 1""".stripMargin,
      // t20: same integer fixed point as the Spark side — idf_m=(N·1000)//df,
      // norm_ppm = 250000 + (750000·dl·N)//total_tokens (1e6−b folded),
      // contrib = idf_m·tf·(k1+1e6) // (tf·1e6 + (k1·norm)//1e6); `//` and
      // Spark's intDiv agree exactly below 2^53
      // s18: RRF hybrid — the t20 BM25 CTEs at k=20 beside the s01 cosine
      // shape for query vec 0; integer points 1e9//(60+rank) summed
      "s18_hybrid_rrf" ->
        s"""WITH dq AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           |dense AS (SELECT id, rank FROM (
           |  SELECT e.vec_id AS id,
           |    row_number() OVER (ORDER BY list_cosine_similarity(qe, e.embedding) DESC, e.vec_id) AS rank
           |  FROM dq CROSS JOIN embeddings e WHERE e.vec_id != 0)
           | WHERE rank <= 20),
           |d AS (SELECT doc_id, len($toks)::BIGINT AS dl,
           |    len(list_filter($toks, x -> x = 'dup'))::BIGINT AS tf0,
           |    len(list_filter($toks, x -> x = 'scan'))::BIGINT AS tf1,
           |    len(list_filter($toks, x -> x = 'key'))::BIGINT AS tf2
           |  FROM documents),
           |st AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS tt,
           |    sum(CASE WHEN tf0>0 THEN 1 ELSE 0 END)::BIGINT AS df0,
           |    sum(CASE WHEN tf1>0 THEN 1 ELSE 0 END)::BIGINT AS df1,
           |    sum(CASE WHEN tf2>0 THEN 1 ELSE 0 END)::BIGINT AS df2 FROM d),
           |bm AS (SELECT doc_id,
           |  (CASE WHEN tf0>0 THEN ((n*1000)//df0)*tf0*2200000
           |     // (tf0*1000000 + (1200000*(250000 + (750000*dl*n)//tt))//1000000) ELSE 0 END
           | + CASE WHEN tf1>0 THEN ((n*1000)//df1)*tf1*2200000
           |     // (tf1*1000000 + (1200000*(250000 + (750000*dl*n)//tt))//1000000) ELSE 0 END
           | + CASE WHEN tf2>0 THEN ((n*1000)//df2)*tf2*2200000
           |     // (tf2*1000000 + (1200000*(250000 + (750000*dl*n)//tt))//1000000) ELSE 0 END)::BIGINT AS score_m
           |FROM d CROSS JOIN st
           |WHERE tf0>0 OR tf1>0 OR tf2>0
           |ORDER BY score_m DESC, doc_id LIMIT 20),
           |sparse AS (SELECT doc_id AS id,
           |    row_number() OVER (ORDER BY score_m DESC, doc_id) AS rank FROM bm),
           |un AS (SELECT id, 1000000000 // (60 + rank) AS pts FROM dense
           |  UNION ALL SELECT id, 1000000000 // (60 + rank) AS pts FROM sparse),
           |f AS (SELECT id, sum(pts)::BIGINT AS rrf FROM un GROUP BY 1)
           |SELECT id, rank::BIGINT AS rank, rrf FROM (
           |  SELECT id, rrf, row_number() OVER (ORDER BY rrf DESC, id) AS rank FROM f)
           |WHERE rank <= 10""".stripMargin,
      "t20_bm25" ->
        s"""WITH d AS (SELECT doc_id, len($toks)::BIGINT AS dl,
           |    len(list_filter($toks, x -> x = 'dup'))::BIGINT AS tf0,
           |    len(list_filter($toks, x -> x = 'scan'))::BIGINT AS tf1,
           |    len(list_filter($toks, x -> x = 'key'))::BIGINT AS tf2
           |  FROM documents),
           |s AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS tt,
           |    sum(CASE WHEN tf0>0 THEN 1 ELSE 0 END)::BIGINT AS df0,
           |    sum(CASE WHEN tf1>0 THEN 1 ELSE 0 END)::BIGINT AS df1,
           |    sum(CASE WHEN tf2>0 THEN 1 ELSE 0 END)::BIGINT AS df2 FROM d)
           |SELECT doc_id,
           |  (CASE WHEN tf0>0 THEN ((n*1000)//df0)*tf0*2200000
           |     // (tf0*1000000 + (1200000*(250000 + (750000*dl*n)//tt))//1000000) ELSE 0 END
           | + CASE WHEN tf1>0 THEN ((n*1000)//df1)*tf1*2200000
           |     // (tf1*1000000 + (1200000*(250000 + (750000*dl*n)//tt))//1000000) ELSE 0 END
           | + CASE WHEN tf2>0 THEN ((n*1000)//df2)*tf2*2200000
           |     // (tf2*1000000 + (1200000*(250000 + (750000*dl*n)//tt))//1000000) ELSE 0 END)::BIGINT AS score_m
           |FROM d CROSS JOIN s
           |WHERE tf0>0 OR tf1>0 OR tf2>0
           |ORDER BY score_m DESC, doc_id LIMIT 10""".stripMargin,
      // t21: d13's chunk CTE keyed by chunk text (md5 is injective on this
      // corpus — d13 already rests on that); string_agg ORDER BY chunk_idx
      // mirrors the array_sort reassembly
      "t21_boilerplate" ->
        s"""WITH ch AS (
           |  SELECT doc_id, i::BIGINT AS chunk_idx,
           |    array_to_string(t[i*8+1 : i*8+8], ' ') AS chunk
           |  FROM (SELECT doc_id, $toks AS t FROM documents)
           |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
           |  WHERE i <= ceil(len(t)/8.0) - 1),
           |boil AS (SELECT chunk FROM ch GROUP BY 1 HAVING count(*) > 2),
           |surv AS (SELECT * FROM ch WHERE chunk NOT IN (SELECT chunk FROM boil)),
           |re AS (SELECT doc_id, string_agg(chunk, ' ' ORDER BY chunk_idx) AS text_scrubbed,
           |       count(*)::BIGINT AS n_kept FROM surv GROUP BY 1),
           |nc AS (SELECT doc_id, ceil(len($toks)/8.0)::BIGINT AS n_chunks FROM documents)
           |SELECT nc.doc_id, coalesce(re.text_scrubbed, '') AS text_scrubbed,
           |  coalesce(re.n_kept, 0)::BIGINT AS n_kept,
           |  (nc.n_chunks - coalesce(re.n_kept, 0))::BIGINT AS n_dropped
           |FROM nc LEFT JOIN re ON nc.doc_id = re.doc_id""".stripMargin,
      "t16_quality_gate" ->
        s"""WITH s AS (SELECT doc_id, len($toks) AS nt,
           |  len(list_distinct($toks)) AS nd,
           |  len(list_filter($toks, t -> list_contains($enStop, t))) AS ns,
           |  greatest(length(text), 1) AS nc,
           |  len(regexp_extract_all(text, '[^a-z0-9 ]')) AS np
           |  FROM documents)
           |SELECT doc_id, nt::BIGINT AS n_tokens,
           | (CASE WHEN nt < 30 THEN 1 ELSE 0 END)::BIGINT AS fail_short,
           | (CASE WHEN ns*1000000//nt < 30000 THEN 1 ELSE 0 END)::BIGINT AS fail_stopword,
           | (CASE WHEN (nt-nd)*1000000//nt > 600000 THEN 1 ELSE 0 END)::BIGINT AS fail_repetition,
           | (CASE WHEN np*1000000//nc > 100000 THEN 1 ELSE 0 END)::BIGINT AS fail_punct,
           | (CASE WHEN nt >= 30 AND ns*1000000//nt >= 30000
           |        AND (nt-nd)*1000000//nt <= 600000
           |        AND np*1000000//nc <= 100000 THEN 1 ELSE 0 END)::BIGINT AS pass
           |FROM s""".stripMargin,
      "m01_media_meta" ->
        """SELECT doc_id, length(text)::BIGINT AS n_bytes, sha256(text) AS sha256,
          | ((ascii(substr(text, 1, 1)) % 64) + 1)::BIGINT AS width,
          | ((ascii(substr(text, 2, 1)) % 64) + 1)::BIGINT AS height,
          | (length(text) // 100 + 1)::BIGINT AS n_frames
          |FROM documents""".stripMargin,
      "m03_resize" ->
        """SELECT doc_id, least(length(text), 256)::BIGINT AS n_bytes,
          | md5(substr(text, 1, 256)) AS media_md5 FROM documents""".stripMargin,
      "m02_frame_sample" ->
        """SELECT doc_id, i::BIGINT AS frame_idx, md5(substr(text, (i*100+1)::INT, 100)) AS frame_md5
          |FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
          |WHERE i % 2 = 0 AND i*100 < length(text)""".stripMargin,
      "m04_shared_frames" ->
        """WITH fr AS (SELECT doc_id, md5(substr(text, (i*100+1)::INT, 100)) AS frame_md5
          |  FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
          |  WHERE i % 2 = 0 AND i*100 < length(text))
          |SELECT frame_md5, count(DISTINCT doc_id)::BIGINT AS n_docs,
          | min(doc_id) AS keeper_doc
          |FROM fr GROUP BY 1 HAVING count(DISTINCT doc_id) > 1""".stripMargin,
      "m05_media_clusters" -> m05Sql,
      "m06_media_dedup_apply" ->
        s"""WITH comp AS ($m05Sql)
           |SELECT doc_id FROM documents
           |WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)""".stripMargin,
      "m07_perceptual_pairs" ->
        """WITH fr AS (SELECT doc_id, i AS frame_idx, substr(text, (i*100+1)::INT, 100) AS f
          |  FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
          |  WHERE i % 2 = 0 AND i*100 < length(text)),
          |ok AS (SELECT doc_id, frame_idx, f FROM fr WHERE length(f) >= 60),
          |cs AS (SELECT doc_id, frame_idx,
          |  list_transform(generate_series(1, 60), j -> ascii(substr(f, j::INT, 1))::BIGINT) AS c
          |  FROM ok),
          |ah AS (SELECT doc_id, frame_idx,
          |  list_reduce(list_transform(c, x ->
          |    CASE WHEN x > list_sum(c) // 60 THEN 1::BIGINT ELSE 0::BIGINT END),
          |    (a, b) -> a * 2 + b) AS ahash
          |  FROM cs),
          |ck AS (SELECT doc_id, frame_idx, ahash, j, (ahash >> (j*15)::INT) & 32767 AS v
          |       FROM ah CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j)),
          |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
          |  x.frame_idx AS fa, y.frame_idx AS fb, x.ahash AS ha, y.ahash AS hb
          |  FROM ck x JOIN ck y ON x.j = y.j AND x.v = y.v AND x.doc_id < y.doc_id)
          |SELECT a, b, count(*)::BIGINT AS n_frame_matches
          |FROM cand WHERE bit_count(xor(ha, hb)) <= 3 GROUP BY 1, 2""".stripMargin,
      // m08: the PNG fixture's dims and pixels are pure formulas of doc_id
      // (w = id%13+8, h = id%7+8, luma(i) = ((id*31 + i)*17) % 256
      // row-major), so the REAL encode→decode roundtrip must reproduce
      // this SQL exactly: mean = truncating sum/60, bit i set iff
      // luma > mean, MSB-first (bit i weighs 2^(59-i))
      // m09: the WAV fixture's header fields and channel-0 samples are pure
      // formulas of doc_id (rate = 8000 + id%5*1000, ch = 1 + id%2,
      // ns = 80 + id%40, s(i) = ((id*37 + i)*251) % 4096 - 2048 — the
      // pre-% product is non-negative, so Spark/DuckDB truncating % agree);
      // fingerprint bit i (MSB-first) set iff |s(i+1)| > |s(i)|
      "m09_wav_decode" ->
        """WITH d AS (SELECT doc_id, 8000 + (doc_id % 5) * 1000 AS sample_rate,
          |  1 + (doc_id % 2) AS channels, 80 + (doc_id % 40) AS n_samples
          |  FROM documents),
          |s AS (SELECT doc_id, i, ((doc_id * 37 + i) * 251) % 4096 - 2048 AS v
          |      FROM d CROSS JOIN (SELECT unnest(generate_series(0, 60)) AS i)),
          |f AS (SELECT s1.doc_id,
          |        sum(CASE WHEN abs(s2.v) > abs(s1.v)
          |                 THEN (1::BIGINT << (59 - s1.i)::INT) ELSE 0 END)::BIGINT AS fp
          |      FROM s s1 JOIN s s2 ON s1.doc_id = s2.doc_id AND s2.i = s1.i + 1
          |      GROUP BY 1)
          |SELECT d.doc_id, sample_rate::BIGINT AS sample_rate,
          |  channels::BIGINT AS channels, n_samples::BIGINT AS n_samples, f.fp
          |FROM d JOIN f ON d.doc_id = f.doc_id""".stripMargin,
      // m15: the m09 sample formula through the identical integer
      // resample mapping — out(i) = s((i*rate)//4000), nOut = ns*4000//rate
      "m15_audio_resample" ->
        """WITH d AS (SELECT doc_id, 8000 + (doc_id % 5) * 1000 AS rate,
          |                  80 + (doc_id % 40) AS ns FROM documents),
          |o AS (SELECT doc_id, rate, (ns * 4000) // rate AS n_out FROM d),
          |s AS (SELECT doc_id, n_out, i,
          |        ((doc_id * 37 + ((i * rate) // 4000)) * 251) % 4096 - 2048 AS v
          |      FROM o CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS i)
          |      WHERE i < n_out)
          |SELECT doc_id, 4000::BIGINT AS dst_rate, n_out::BIGINT AS n_samples,
          |  sum((i + 1) * v)::BIGINT AS checksum
          |FROM s GROUP BY 1, 2, 3""".stripMargin,
      // m16: adjacent-sign changes (sign class = v < 0) per 32-sample
      // window over the constant/formula-mixed fixture + strict ppm gate
      "m16_audio_zcr" ->
        """WITH d AS (SELECT doc_id, 80 + (doc_id % 40) AS ns FROM documents),
          |s AS (SELECT doc_id, i,
          |        CASE WHEN (i // 16) % 3 = 0 THEN 500
          |             ELSE (((doc_id * 37 + i) * 251) % 4096 - 2048)
          |                  * (1 - 2 * (i % 2)) END AS v
          |      FROM d CROSS JOIN (SELECT unnest(generate_series(0, 119)) AS i)
          |      WHERE i < ns),
          |x AS (SELECT a.doc_id, (a.i // 32) AS w,
          |        CASE WHEN a.i % 32 > 0 AND ((b.v < 0) != (a.v < 0))
          |             THEN 1 ELSE 0 END AS c
          |      FROM s a LEFT JOIN s b ON a.doc_id = b.doc_id AND b.i = a.i - 1)
          |SELECT doc_id, w::BIGINT AS win_idx, count(*)::BIGINT AS n_samples,
          |  sum(c)::BIGINT AS crossings,
          |  (sum(c) * 1000000 < 600000 * count(*)) AS voiced
          |FROM x GROUP BY 1, 2""".stripMargin,
      // m14: the m09 sample formula with every third 16-sample stretch
      // zeroed; exact integer Σs² per 32-sample window (last window
      // partial) and the strict mean-square silence gate — the REAL
      // decode must reproduce this SQL bit-for-bit
      "m14_audio_energy" ->
        """WITH d AS (SELECT doc_id, 80 + (doc_id % 40) AS ns FROM documents),
          |s AS (SELECT doc_id, i,
          |        CASE WHEN (i // 16) % 3 = 0 THEN 0
          |             ELSE ((doc_id * 37 + i) * 251) % 4096 - 2048 END AS v
          |      FROM d CROSS JOIN (SELECT unnest(generate_series(0, 119)) AS i)
          |      WHERE i < ns)
          |SELECT doc_id, (i // 32)::BIGINT AS win_idx, count(*)::BIGINT AS n_samples,
          |  sum(v * v)::BIGINT AS energy,
          |  (sum(v * v) < 1000000 * count(*)) AS silent
          |FROM s GROUP BY 1, 2""".stripMargin,
      // g01: the identical truncating-division PageRank formula replayed
      // as chained CTEs — r0 = 10^12 // N, base = (r0*150000)//10^6, each
      // edge contributes (rank*850000)//(10^6*outdeg), three rounds
      "g01_host_pagerank" ->
        """WITH edges AS (
          |  SELECT DISTINCT src, dst FROM (
          |    SELECT 'h' || (doc_id % 97) AS src,
          |           'h' || ((doc_id * 7 + 3) % 97) AS dst FROM documents
          |    UNION ALL
          |    SELECT 'h' || (doc_id % 97),
          |           'h' || ((doc_id * 13 + 11) % 97) FROM documents) u),
          |nodes AS (SELECT DISTINCT host FROM (
          |    SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges) v),
          |cst AS (SELECT (1000000000000 // count(*))::BIGINT AS r0,
          |               ((1000000000000 // count(*)) * 150000 // 1000000)::BIGINT AS b
          |        FROM nodes),
          |od AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY 1),
          |r0 AS (SELECT host, (SELECT r0 FROM cst) AS pr FROM nodes),
          |c1 AS (SELECT e.dst AS host,
          |         sum((r.pr * 850000) // (1000000 * od.outdeg)) AS s
          |       FROM edges e JOIN r0 r ON e.src = r.host JOIN od ON e.src = od.src
          |       GROUP BY 1),
          |r1 AS (SELECT nodes.host, ((SELECT b FROM cst) + coalesce(c1.s, 0))::BIGINT AS pr
          |       FROM nodes LEFT JOIN c1 ON nodes.host = c1.host),
          |c2 AS (SELECT e.dst AS host,
          |         sum((r.pr * 850000) // (1000000 * od.outdeg)) AS s
          |       FROM edges e JOIN r1 r ON e.src = r.host JOIN od ON e.src = od.src
          |       GROUP BY 1),
          |r2 AS (SELECT nodes.host, ((SELECT b FROM cst) + coalesce(c2.s, 0))::BIGINT AS pr
          |       FROM nodes LEFT JOIN c2 ON nodes.host = c2.host),
          |c3 AS (SELECT e.dst AS host,
          |         sum((r.pr * 850000) // (1000000 * od.outdeg)) AS s
          |       FROM edges e JOIN r2 r ON e.src = r.host JOIN od ON e.src = od.src
          |       GROUP BY 1),
          |r3 AS (SELECT nodes.host, ((SELECT b FROM cst) + coalesce(c3.s, 0))::BIGINT AS pr
          |       FROM nodes LEFT JOIN c3 ON nodes.host = c3.host)
          |SELECT host, pr AS pagerank FROM r3""".stripMargin,
      // g02: two HITS rounds replayed as chained HUGEINT CTEs — raw sums
      // along each edge direction, each half-round normalized to Σ=10^12
      // by one truncating // per node
      "g02_host_hits" ->
        """WITH edges AS (
          |  SELECT DISTINCT src, dst FROM (
          |    SELECT 'h' || (doc_id % 97) AS src,
          |           'h' || ((doc_id * 7 + 3) % 97) AS dst FROM documents
          |    UNION ALL
          |    SELECT 'h' || (doc_id % 97),
          |           'h' || ((doc_id * 13 + 11) % 97) FROM documents) u),
          |nodes AS (SELECT DISTINCT host FROM (
          |    SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges) v),
          |h0 AS (SELECT host, 1000000000000::HUGEINT AS s FROM nodes),
          |a1r AS (SELECT nodes.host, coalesce(t.s, 0)::HUGEINT AS raw FROM nodes
          |  LEFT JOIN (SELECT e.dst AS host, sum(h0.s) AS s
          |             FROM edges e JOIN h0 ON e.src = h0.host GROUP BY 1) t
          |  ON nodes.host = t.host),
          |a1 AS (SELECT host, (raw * 1000000000000) // (SELECT sum(raw) FROM a1r) AS s
          |       FROM a1r),
          |h1r AS (SELECT nodes.host, coalesce(t.s, 0)::HUGEINT AS raw FROM nodes
          |  LEFT JOIN (SELECT e.src AS host, sum(a1.s) AS s
          |             FROM edges e JOIN a1 ON e.dst = a1.host GROUP BY 1) t
          |  ON nodes.host = t.host),
          |h1 AS (SELECT host, (raw * 1000000000000) // (SELECT sum(raw) FROM h1r) AS s
          |       FROM h1r),
          |a2r AS (SELECT nodes.host, coalesce(t.s, 0)::HUGEINT AS raw FROM nodes
          |  LEFT JOIN (SELECT e.dst AS host, sum(h1.s) AS s
          |             FROM edges e JOIN h1 ON e.src = h1.host GROUP BY 1) t
          |  ON nodes.host = t.host),
          |a2 AS (SELECT host, (raw * 1000000000000) // (SELECT sum(raw) FROM a2r) AS s
          |       FROM a2r),
          |h2r AS (SELECT nodes.host, coalesce(t.s, 0)::HUGEINT AS raw FROM nodes
          |  LEFT JOIN (SELECT e.src AS host, sum(a2.s) AS s
          |             FROM edges e JOIN a2 ON e.dst = a2.host GROUP BY 1) t
          |  ON nodes.host = t.host),
          |h2 AS (SELECT host, (raw * 1000000000000) // (SELECT sum(raw) FROM h2r) AS s
          |       FROM h2r)
          |SELECT a2.host, a2.s::BIGINT AS authority, h2.s::BIGINT AS hub
          |FROM a2 JOIN h2 ON a2.host = h2.host""".stripMargin,
      // g04: exact radius-2 out-balls as chained frontier CTEs + the
      // literal-true sketch verdicts (a01 gate pattern)
      "g04_neighborhood_gate" ->
        """WITH edges AS (
          |  SELECT DISTINCT src, dst FROM (
          |    SELECT 'h' || (doc_id % 97) AS src,
          |           'h' || ((doc_id * 7 + 3) % 97) AS dst FROM documents
          |    UNION ALL
          |    SELECT 'h' || (doc_id % 97),
          |           'h' || ((doc_id * 13 + 11) % 97) FROM documents) u),
          |nodes AS (SELECT DISTINCT host FROM (
          |    SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges) v),
          |r0 AS (SELECT host, host AS r FROM nodes),
          |r1 AS (SELECT DISTINCT host, r FROM (
          |  SELECT host, r FROM r0
          |  UNION ALL
          |  SELECT r0.host, e.dst FROM r0 JOIN edges e ON r0.r = e.src) a),
          |r2 AS (SELECT DISTINCT host, r FROM (
          |  SELECT host, r FROM r1
          |  UNION ALL
          |  SELECT r1.host, e.dst FROM r1 JOIN edges e ON r1.r = e.src) b)
          |SELECT host, count(*)::BIGINT AS ball_size, 1::BIGINT AS within_eps
          |FROM r2 GROUP BY 1""".stripMargin,
      // g03: the same host/link formulas (www/scheme decorations resolve
      // to the bare lowercase host), md5-hashed ids, recursive-CTE CC
      "g03_host_components" ->
        """WITH RECURSIVE rr AS (SELECT DISTINCT doc_id % 97 AS r FROM documents),
          |ed AS (SELECT 'h' || r || '.example.com' AS sh,
          |         'h' || ((r // 7) * 7 + ((r % 7) + 1) % 7) || '.example.com' AS dh
          |       FROM rr),
          |names AS (SELECT DISTINCT h FROM
          |  (SELECT sh AS h FROM ed UNION SELECT dh FROM ed)),
          |ids AS (SELECT h, ('0x' || substr(md5(h), 1, 15))::BIGINT AS id FROM names),
          |p AS (SELECT DISTINCT x.id AS a, y.id AS b
          |      FROM ed JOIN ids x ON ed.sh = x.h JOIN ids y ON ed.dh = y.h),
          |nodes AS (SELECT a AS n FROM p UNION SELECT b FROM p),
          |e AS (SELECT a AS u, b AS v FROM p UNION SELECT b AS u, a AS v FROM p),
          |reach(n, m) AS (
          |  SELECT n, n FROM nodes
          |  UNION
          |  SELECT r.n, e.v FROM reach r JOIN e ON r.m = e.u),
          |comp AS (SELECT n, min(m) AS component FROM reach GROUP BY n)
          |SELECT ids.h AS host, comp.component
          |FROM ids JOIN comp ON ids.id = comp.n""".stripMargin,
      // m13: the same pixel formula through the identical integer
      // nearest-neighbor mapping — dst(x,y) = f((x*w)//8, (y*h)//6)
      "m13_resize_real" ->
        """WITH d AS (SELECT doc_id, (doc_id % 13) + 8 AS w, (doc_id % 7) + 8 AS h
          |           FROM documents),
          |px AS (SELECT doc_id, w, h, xx.i AS x, yy.j AS y
          |       FROM d
          |       CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) xx
          |       CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS j) yy)
          |SELECT doc_id, 8::BIGINT AS width, 6::BIGINT AS height,
          |  sum(((doc_id * 31 + ((y * h) // 6) * w + ((x * w) // 8)) * 17) % 256)::BIGINT
          |    AS luma_sum
          |FROM px GROUP BY 1""".stripMargin,
      "m08_imageio_decode" ->
        """WITH d AS (SELECT doc_id, (doc_id % 13) + 8 AS w, (doc_id % 7) + 8 AS h
          |           FROM documents),
          |px AS (SELECT doc_id, w, h, i, ((doc_id * 31 + i) * 17) % 256 AS g
          |       FROM d CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS i)),
          |mn AS (SELECT doc_id, sum(g) // 60 AS mean FROM px GROUP BY 1)
          |SELECT px.doc_id, px.w::BIGINT AS width, px.h::BIGINT AS height,
          |  sum(CASE WHEN g > mean THEN (1::BIGINT << (59 - i)::INT) ELSE 0 END)::BIGINT AS ahash
          |FROM px JOIN mn ON px.doc_id = mn.doc_id
          |GROUP BY 1, 2, 3""".stripMargin,
      // m10: the multi-frame twin of m08 — same first-60-pixels aHash
      // formula per (doc, frame), frame count from the container
      "m10_gif_frames" ->
        """WITH d AS (SELECT doc_id, (doc_id % 9) + 8 AS w,
          |                  (doc_id % 3) + 2 AS n FROM documents),
          |fr AS (SELECT doc_id, n, unnest(generate_series(0, n::INT - 1)) AS k FROM d),
          |px AS (SELECT doc_id, n, k, i,
          |         ((doc_id*31 + k*101 + i) * 17) % 256 AS g
          |       FROM fr CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS i)),
          |mn AS (SELECT doc_id, k, sum(g) // 60 AS mean FROM px GROUP BY 1, 2)
          |SELECT px.doc_id, px.n::BIGINT AS n_frames, px.k::BIGINT AS frame_idx,
          |  sum(CASE WHEN g > mean
          |      THEN (1::BIGINT << (59 - i)::INT) ELSE 0 END)::BIGINT AS ahash
          |FROM px JOIN mn ON px.doc_id = mn.doc_id AND px.k = mn.k
          |GROUP BY 1, 2, 3""".stripMargin,
      // m11: the fixture's frame lumas are pure formulas (shared frames
      // keyed by group = doc_id // 10, the third by doc_id), so the SQL
      // recomputes every aHash and the same set-Jaccard over them
      // m12: frame hashes from the pixel formula (m11's aHash SQL), then
      // positional 2-grams, pair diagonals, and gaps-and-islands runs
      "m12_gif_run_align" ->
        """WITH fr AS (SELECT doc_id, doc_id // 10 AS g, doc_id % 2 AS off,
          |            unnest([0, 1, 2, 3, 4]) AS k FROM documents),
          |sd AS (SELECT doc_id, k,
          |         CASE WHEN k - (1 - off) BETWEEN 0 AND 2
          |           THEN g*997 + (k - (1 - off))*101
          |           ELSE doc_id*1000003 + k*13 + 7 END AS seed
          |       FROM fr),
          |px AS (SELECT doc_id, k,
          |         ((((seed % 65521 + i*31) * (seed % 65521 + i*31)) % 65521) % 256) AS l, i
          |       FROM sd CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS i)),
          |mn AS (SELECT doc_id, k, sum(l) // 60 AS mean FROM px GROUP BY 1, 2),
          |ah AS (SELECT px.doc_id, px.k,
          |         sum(CASE WHEN l > mean THEN (1::BIGINT << (59 - i)::INT)
          |             ELSE 0 END)::BIGINT AS h
          |       FROM px JOIN mn ON px.doc_id = mn.doc_id AND px.k = mn.k
          |       GROUP BY 1, 2),
          |gr AS (SELECT a1.doc_id, a1.k AS pos, a1.h AS g1, a2.h AS g2
          |       FROM ah a1 JOIN ah a2 ON a1.doc_id = a2.doc_id AND a2.k = a1.k + 1),
          |cand AS (SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa, y.pos AS pb,
          |                x.pos - y.pos AS diag
          |         FROM gr x JOIN gr y ON x.g1 = y.g1 AND x.g2 = y.g2
          |           AND x.doc_id < y.doc_id),
          |isl AS (SELECT a, b, diag, pa, pb,
          |          pa - row_number() OVER (PARTITION BY a, b, diag ORDER BY pa) AS isle
          |        FROM cand)
          |SELECT a, b, min(pa)::BIGINT AS a_start, min(pb)::BIGINT AS b_start,
          |       (count(*) + 1)::BIGINT AS run_frames
          |FROM isl GROUP BY a, b, diag, isle HAVING count(*) + 1 >= 3""".stripMargin,
      "m11_gif_neardup" ->
        """WITH fr AS (SELECT doc_id, doc_id // 10 AS g, unnest([0, 1, 2]) AS k
          |            FROM documents),
          |px AS (SELECT doc_id, k,
          |         CASE WHEN k < 2
          |           THEN ((((g*997 + k*101) % 65521 + i*31) * ((g*997 + k*101) % 65521 + i*31)) % 65521) % 256
          |           ELSE ((((doc_id*1000003 + 7) % 65521 + i*31) * ((doc_id*1000003 + 7) % 65521 + i*31)) % 65521) % 256
          |         END AS l, i
          |       FROM fr CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS i)),
          |mn AS (SELECT doc_id, k, sum(l) // 60 AS mean FROM px GROUP BY 1, 2),
          |ah AS (SELECT px.doc_id, px.k,
          |         sum(CASE WHEN l > mean THEN (1::BIGINT << (59 - i)::INT)
          |             ELSE 0 END)::BIGINT AS h
          |       FROM px JOIN mn ON px.doc_id = mn.doc_id AND px.k = mn.k
          |       GROUP BY 1, 2),
          |fh AS (SELECT DISTINCT doc_id, h FROM ah),
          |sizes AS (SELECT doc_id, count(*) AS n FROM fh GROUP BY 1),
          |common AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
          |           FROM fh x JOIN fh y ON x.h = y.h AND x.doc_id < y.doc_id
          |           GROUP BY 1, 2)
          |SELECT a, b, (c * 1000000 // (na.n + nb.n - c))::BIGINT AS jaccard_ppm
          |FROM common JOIN sizes na ON a = na.doc_id JOIN sizes nb ON b = nb.doc_id
          |WHERE c * 1000000 // (na.n + nb.n - c) >= 400000""".stripMargin,
    )
  }
}
