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

import graft.EntryHelpers._

/** Counter/jq/streaming queries (a01, c01-c72) + their DuckDB oracles.
  *
  * Split mechanically from SparkEntry (round 10); entries are verbatim.
  * Shared fixtures/counter defs/oracle CTE fragments live in
  * [[EntryHelpers]]; [[SparkEntry]] concatenates the per-set maps.
  */
private[graft] object CounterSet {

  // Loader split (r12 optimization, the RelationalSet convention): counters
  // whose per-row work is LIGHT (plain-column window/groupBy aggregations,
  // target_expr arithmetic, exact distinct) read [[EntryHelpers.eventsLean]]
  // — for those the conditional local spread() repartition costs more than
  // the single-task scan it parallelizes (measured e09 0.94→0.69 s class).
  // Heavy-per-row consumers (jq compile paths, JSON/variant parse, SipHash
  // ACD hashing, serialized intermediate-record hops) keep the spread
  // [[EntryHelpers.events]] loader — c70 measured 2.1→3.0 s without it.
  // At production scale the two loaders plan identically (spread is a
  // no-op once the source is maxPartitionBytes-split).

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O8+O12+O13: tumbling-window count of every record (target_column "*")
    "c01_window_count" -> ((s, dir) =>
      Counters.run(eventsLean(s, dir), "ts", cRequestCount)),
    // O5/O6: null-rejecting column count (target_column projection)
    "c02_column_count" -> ((s, dir) =>
      Counters.run(eventsLean(s, dir), "ts", cColumnCount)),
    // O9 exact twin: COUNT(DISTINCT) ground truth for the HLL counter
    "c03_distinct_exact" -> ((s, dir) =>
      Counters.runExactDistinct(eventsLean(s, dir), "ts", cUserAcd)),
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
      Counters.run(eventsLean(s, dir), "ts", cClickCount)),
    // O7+O9 exact twin: expr-valued distinct (ACD variant ε-tested)
    "c06_expr_distinct_exact" -> ((s, dir) =>
      Counters.runExactDistinct(eventsLean(s, dir), "ts", cClickUsersAcd)),
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
        eventsLean(s, dir).withColumn("shard", pmod(col("user_id"), lit(8))),
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
      Counters.runSliding(eventsLean(s, dir), "ts",
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
    "c51_stream_static_enrich" -> ((s, dir) => withStatePartitions(s, 8) {
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
    "c52_stream_engine_e2e" -> ((s, dir) => withStatePartitions(s, 8) {
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
      // spreadStream BEFORE the JSON encode: the engine's whole per-row
      // chain (encode → KPL parse → JSON parse → counter eval) otherwise
      // runs on the single-split local file source's ONE task (measured
      // 1.4 s single-task stage; production multi-shard sources skip the
      // exchange by the underfill probe)
      val raw = Tables.spreadStream(Tables.eventsStream(s, dir),
          s"$dir/events.parquet", col("event_id"))
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
    // O14 round-12 notch: match() with COMPUTED (per-row) patterns — the
    // schema-expressible offset/length/string subset (captures stay
    // literal-only, rejected loudly): unanchored char-class run, a
    // case-insensitive end-anchored probe via literal flags, and a
    // never-matching anchored pattern exercising the null path
    "c76_jq_dynamic_match" -> ((s, dir) =>
      JqTransform(
        events(s, dir).select(col("event_id"), col("event_type"),
          concat(substring(col("event_type"), 2, 1), lit("+")).as("p1"),
          concat(upper(substring(col("event_type"), -1, 1)), lit("$")).as("p2"),
          concat(lit("^"), substring(col("event_type"), -1, 1)).as("p3")),
        """.p1 as $a | .p2 as $b | .p3 as $c
          || {id: .event_id,
          |   m1: (.event_type | match($a)),
          |   m2: (.event_type | match($b; "i")),
          |   m3: (.event_type | match($c))}
          || {id: .id, o1: .m1.offset, l1: .m1.length, s1: .m1.string,
          |   o2: .m2.offset, s2: .m2.string, o3: .m3.offset}""".stripMargin)),
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
    // O14 round-10 tranche: @base64/@csv format strings, the label/break
    // early-termination subset (truncation at the first violating stream
    // element), and a COLUMN-VALUED test() pattern (the dynamic-regex
    // lowering) — all in one program over the counter output
    "c73_jq_formats_label" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount)
          .withColumn("re", concat(lit("^[0-9]{"),
            (col("value") % 3 + 1).cast("string"), lit("}$"))),
        """(.value % 9 + 1) as $v
          || {t: .window_start,
          |   b64: (.counter_id | @base64),
          |   csv: ([.value, $v] | @csv),
          |   cut: [label $out | range(10) | if . * $v > 12 then break $out else . end],
          |   dyn: ((.value | tostring) | test(.re))}""".stripMargin)),
    // O14 round-10: the multi-target assignment ASYMMETRY in one oracle
    // row — `(.a,.b) = E` binds E ONCE against the original input (jq's
    // gen_update $tmp), while `(.c,.d) |= f` re-evaluates f per path from
    // each target's own old value
    "c74_jq_multiassign" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount)
          .select(col("window_start").as("t"), col("value").as("a"),
            (col("value") % 7).as("b"), (col("value") % 5).as("c"),
            (col("value") % 3).as("d")),
        """(.a, .b) = .a + .b
          || (.c, .d) |= . * 2 + 1
          || {t: .t, a: .a, b: .b, c: .c, d: .d}""".stripMargin)),
    // O14 round-11: COMPUTED paths and steps in one oracle row — setpath
    // with a variable segment over a struct (field-picked at runtime), a
    // nested computed segment, setpath/del with computed keys over a MAP
    // (insert-or-update / filter, jq-exact), and range with a computed
    // step (direction branches at runtime on its sign). Keys/leaves ride
    // variables — the c73 scoping discipline both engines agree on.
    "c75_jq_computed_paths" -> ((s, dir) =>
      JqTransform(
        Counters.run(events(s, dir), "ts", cRequestCount)
          .select(col("window_start").as("t"), col("value"),
            map(lit("a"), col("value"), lit("b"), lit(1L)).as("m")),
        """(if .value % 2 == 0 then "a" else "b" end) as $k
          || (if .value % 3 == 0 then "p" else "q" end) as $k2
          || (.value % 7) as $lv
          || {t: .t,
          |   upd: ({"a": .value, "b": 1} | setpath([$k]; $lv) | .a * 1000 + .b),
          |   nest: ({"x": {"p": .value, "q": 2}} | setpath(["x", $k2]; $lv)
          |          | .x.p * 100 + .x.q),
          |   rng: ([range(0; .value % 5 + 2; (.value % 3) + 1)] | add),
          |   mset: (.m | setpath([$k]; $lv) | getpath(["a"])),
          |   mdel: (.m | del(.[$k]) | getpath(["a"]))}""".stripMargin)),
    "c40_quantile_counter" -> ((s, dir) =>
      Counters.run(eventsLean(s, dir), "ts", cValueP90)),
    // top-3 users per window as a heavy_hitters counter, run through the
    // TWO-PHASE shard topology — the hop must be invisible vs the oracle
    "c41_hitter_counter" -> ((s, dir) =>
      Counters.runTwoPhase(
        eventsLean(s, dir).withColumn("shard", pmod(col("user_id"), lit(8))),
        "ts", "shard", cTopUsers)),
    // the per-shard topology for the quantile type: shard_id in the O13
    // record, one quantile per (window, shard) — completing the
    // type × topology matrix with an oracle row
    "c45_quantile_per_shard" -> ((s, dir) =>
      Counters.runPerShard(
        eventsLean(s, dir).withColumn("shard", pmod(col("user_id"), lit(4))),
        "ts", "shard", cValueP90)),
    // ...and the same matrix row for heavy_hitters: top-3 per (window,
    // shard), member/rank beside the conditional shard_id
    "c46_hitter_per_shard" -> ((s, dir) =>
      Counters.runPerShard(
        eventsLean(s, dir).withColumn("shard", pmod(col("user_id"), lit(4))),
        "ts", "shard", cTopUsers)),
    // ...and the per-shard topology row for value_sum, completing the
    // type x topology matrix (one sum per (window, shard), shard_id in
    // the O13 record)
    "c53_sum_per_shard" -> ((s, dir) =>
      Counters.runPerShard(
        eventsLean(s, dir).withColumn("shard", pmod(col("user_id"), lit(4))),
        "ts", "shard", cValueSum)),
    // THIRD engine-extension counter type as a config citizen: per-window
    // SUM of the record value in integer cents (the basic aggregate the
    // reference lacks) — same O13 record, single-phase topology
    "c48_sum_counter" -> ((s, dir) =>
      Counters.run(eventsLean(s, dir), "ts", cValueSum)),
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
        eventsLean(s, dir).withColumn("shard", pmod(col("user_id"), lit(4))),
        "ts", "shard", cValueMin)),
    // ...and value_min's STREAMING face via the generic windowed-agg path
    "c60_min_streaming_parity" -> ((s, dir) => withStatePartitions(s, 8) {
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
    "c50_sum_streaming_parity" -> ((s, dir) => withStatePartitions(s, 8) {
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

  def oracle: Map[String, String] = Map(
      "c01_window_count" ->
        s"""SELECT $win, 'request_count' AS counter_id, 'count' AS counter_type,
           | count(*) AS value FROM events GROUP BY 1, 2""".stripMargin,
      // c73: @base64 via encode+base64, @csv as string concat, the
      // label/break truncation recomputed as a filter (the stop predicate
      // e*v > 12 is monotone in e, so truncate-at-first ≡ keep-while),
      // dynamic test() as regexp_matches with the same computed pattern
      "c73_jq_formats_label" ->
        """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) AS value FROM events GROUP BY 1),
          |d AS (SELECT t, value, value % 9 + 1 AS v FROM c)
          |SELECT t,
          |  base64(encode('request_count')) AS b64,
          |  value::VARCHAR || ',' || v::VARCHAR AS csv,
          |  to_json([x FOR x IN [0,1,2,3,4,5,6,7,8,9] IF x * v <= 12])::VARCHAR AS cut,
          |  regexp_matches(value::VARCHAR,
          |    '^[0-9]{' || (value % 3 + 1)::VARCHAR || '}$') AS dyn
          |FROM d""".stripMargin,
      // c74: bind-once (= both targets get a+b of the ORIGINAL) vs
      // per-path |= (each target from its own old value)
      "c74_jq_multiassign" ->
        """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) AS value FROM events GROUP BY 1)
          |SELECT t, value + (value % 7) AS a, value + (value % 7) AS b,
          |  (value % 5) * 2 + 1 AS c, (value % 3) * 2 + 1 AS d
          |FROM c""".stripMargin,
      // c75: the computed-path/step row replayed analytically — CASE arms
      // for the runtime-picked fields/keys, DuckDB's exclusive-stop
      // range() list for the computed-step stream
      "c75_jq_computed_paths" ->
        """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS t,
          |           count(*) AS value FROM events GROUP BY 1),
          |d AS (SELECT t, value, value % 7 AS lv,
          |        (value % 2 = 0) AS ka, (value % 3 = 0) AS kp FROM c)
          |SELECT t,
          |  ((CASE WHEN ka THEN lv ELSE value END) * 1000
          |    + (CASE WHEN ka THEN 1 ELSE lv END))::BIGINT AS upd,
          |  ((CASE WHEN kp THEN lv ELSE value END) * 100
          |    + (CASE WHEN kp THEN 2 ELSE lv END))::BIGINT AS nest,
          |  list_sum(range(0, value % 5 + 2, value % 3 + 1))::BIGINT AS rng,
          |  (CASE WHEN ka THEN lv ELSE value END)::BIGINT AS mset,
          |  (CASE WHEN ka THEN NULL ELSE value END)::BIGINT AS mdel
          |FROM d""".stripMargin,
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
      // c76: the three computed patterns re-expressed relationally — the
      // 2nd-char run's first match starts at the char's first occurrence
      // (an earlier occurrence of the matched text would itself match),
      // the (?i) end-anchored probe is analytically (len−1, last char),
      // and the ^-anchored last-char pattern never matches this fixture
      // (no event type starts with its last character) → nulls
      "c76_jq_dynamic_match" ->
        """SELECT event_id AS id,
          | CAST(instr(event_type, substr(event_type, 2, 1)) - 1 AS BIGINT) AS o1,
          | CAST(length(regexp_extract(event_type,
          |   substr(event_type, 2, 1) || '+')) AS BIGINT) AS l1,
          | regexp_extract(event_type, substr(event_type, 2, 1) || '+') AS s1,
          | CAST(length(event_type) - 1 AS BIGINT) AS o2,
          | substr(event_type, -1, 1) AS s2,
          | CAST(NULL AS BIGINT) AS o3
          |FROM events""".stripMargin,
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
  )
}
