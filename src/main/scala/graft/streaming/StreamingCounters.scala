package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.config.{CounterDef, CounterType}
import graft.operators.{Counters, Intermediate}
import graft.sources.Deaggregate

/** Structured Streaming execution of the counter pipeline — the engine's
  * equivalent of the reference's Lambda tumbling-window invocation loop
  * (O1/O2/O12: `counter.go:150-204`, `run.go:17-53`).
  *
  * What the reference hand-implements, the streaming engine provides:
  *  - carried per-window state (`CounterState` JSON round-trip,
  *    `counter.go:210-231`) ↔ the state store + checkpoint;
  *  - window close / final invoke (`run.go:107-129`) ↔ watermark expiry in
  *    append mode;
  *  - per-shard readers (`run.go:38-48`) ↔ source partitions;
  *  - the cross-shard aggregate stream ↔ the shuffle between partial and
  *    final aggregation inside the streaming micro-batch.
  *
  * Sources are an I/O detail (`readStream.format("kafka"/"rate"/file)` — a
  * Kinesis connector slots in unchanged); these transforms only require a
  * streaming DataFrame with a timestamp column.
  */
object StreamingCounters {

  /** O4: parse raw JSON payloads (PERMISSIVE), keeping unparseable records
    * in a `_corrupt` column — the `batchItemFailures` side channel
    * (`counter.go:245-248`): bad rows are reported, never fatal.
    */
  def parseRecords(raw: DataFrame, schema: StructType, payloadCol: String = "value"): DataFrame = {
    val withCorrupt = schema.add("_corrupt", "string")
    raw.withColumn("__rec",
        from_json(col(payloadCol).cast("string"), withCorrupt,
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")))
      .select(col("*"), col("__rec.*"))
      .drop("__rec")
  }

  /** O3+O4 composed, the reference's exact ingest order: KPL-deaggregate
    * every payload BEFORE parsing (`counter.go:163-169` — the handler
    * deaggregates the batch, then `process` JSON-parses each sub-record).
    * Packed envelopes explode 1→N (partition-local generator, no shuffle);
    * non-aggregated payloads pass through unchanged; the corrupt side
    * channel then applies per SUB-record, so one bad user record inside a
    * KPL envelope fails alone, not the whole envelope.
    */
  def parsePackedRecords(raw: DataFrame, schema: StructType,
                         payloadCol: String = "value"): DataFrame =
    parseRecords(Deaggregate.explodeRecords(raw, payloadCol), schema, payloadCol)

  /** The failed-record side output (analog of `BatchItemFailures`). */
  def failures(parsed: DataFrame): DataFrame =
    parsed.where(col("_corrupt").isNotNull).select(col("_corrupt"))

  /** Qualifying rows only (parse succeeded). */
  def parsedOk(parsed: DataFrame): DataFrame =
    parsed.where(col("_corrupt").isNull).drop("_corrupt")

  /** Streaming counter: tumbling event-time window + watermark; in append
    * output mode a window's row is emitted exactly once, when the watermark
    * passes its end — the `isFinalInvokeForWindow` contract
    * (`counter.go:339-344`). The aggregation state (count or HLL buffer) is
    * engine-managed and mergeable, like `CounterState`.
    *
    * The returned frame has the reference's output shape (O13) and can be
    * wired to any sink via `writeStream` (`foreachBatch` for SDK puts —
    * O15).
    */
  def run(stream: DataFrame, tsCol: String, c: CounterDef,
          watermarkDelay: String = "10 seconds",
          eventSourceArn: Option[String] = None): DataFrame = {
    val watermarked = stream.withWatermark(tsCol, watermarkDelay)
    Counters.finalizeOutput(
      watermarked
        .groupBy(window(col(tsCol), c.windowDuration))
        .agg(Counters.aggExpr(stream, c).as("value")),
      c, eventSourceArn)
  }

  /** Multi-counter fan-out over one stream (O16): counters sharing the
    * window width share ONE streaming aggregation (single state store,
    * single shuffle), mirroring [[Counters.fanOut]].
    */
  def fanOut(stream: DataFrame, tsCol: String, counters: Seq[CounterDef],
             watermarkDelay: String = "10 seconds",
             eventSourceArn: Option[String] = None): DataFrame = {
    require(counters.nonEmpty, "fanOut requires at least one counter")
    require(counters.map(_.windowDuration).distinct.size == 1,
      "streaming fanOut requires a shared window duration")
    val watermarked = stream.withWatermark(tsCol, watermarkDelay)
    val aggs = counters.map(c => Counters.aggExpr(stream, c).as(s"__agg_${c.id}"))
    val agged = watermarked
      .groupBy(window(col(tsCol), counters.head.windowDuration))
      .agg(aggs.head, aggs.tail: _*)
    // Single aggregation + one generator (NOT an N-way union of the agg,
    // which would plan N streaming aggregations and be rejected).
    Counters.unpivotCounters(agged, counters, eventSourceArn)
  }

  /** Streaming consumer of the aggregate stream (EP3,
    * `counter.go:348-412`, ticker-driven close `run.go:201-270`): a stream
    * of intermediate-record JSON (from per-shard jobs shipping
    * [[Intermediate.toRecords]] payloads) is parsed, filtered to this
    * counter + compatible versions, and merged per window — `sum` of
    * partial counts or HLL-sketch union — with the watermark as the
    * window-close signal. Re-windowing on the records' own `window.start`
    * reproduces the original bucket (starts are aligned) while giving the
    * streaming engine a real event-time window to finalize.
    */
  def mergeIntermediate(records: DataFrame, c: CounterDef,
                        watermarkDelay: String = "10 seconds",
                        requiredVersion: Option[String] = None,
                        eventSourceArn: Option[String] = None): DataFrame = {
    val parsed = Intermediate.parse(records, c, requiredVersion)
      .withColumn("__ws", col("window.start"))
      .drop("window")
      .withWatermark("__ws", watermarkDelay)
    val grouped = parsed.groupBy(window(col("__ws"), c.windowDuration))
    val merged = c.counterType match {
      case CounterType.Count =>
        grouped.agg(sum(col("partial_count")).cast("long").as("value"))
      case CounterType.ApproxCountDistinct =>
        grouped.agg(hll_sketch_estimate(hll_union_agg(col("partial_sketch"))).as("value"))
    }
    Counters.finalizeOutput(merged, c, eventSourceArn)
  }
}
