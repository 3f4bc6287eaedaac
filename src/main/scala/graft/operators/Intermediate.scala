package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.config.{ConfigLoader, CounterDef, CounterType, VersionConstraint}

/** The reference's `IntermediateRecord` — the per-shard partial aggregate
  * shipped over the aggregate stream for the cross-shard merge phase
  * (`/root/reference/counter.go:483-512`): `{event_source_arn, shard_id,
  * counter_id, counter_type, counter_version, window{start,end},
  * counter_state}` with `counter_state` a tagged union `{row_count}` |
  * `{base64_hllpp}` (`counter.go:78-82`).
  *
  * Inside one Spark query this hop IS the shuffle between partial and final
  * `HashAggregateExec` — nothing to build. This codec exists for the
  * reference's *explicit two-job topology*: per-shard jobs serialize
  * partials as JSON records onto a stream; a separate merge job reads,
  * filters, version-checks and merges them (`counter.go:354-403`). The
  * state bytes are a DataSketches HLL sketch (mergeable, bounded), not the
  * reference's gob-encoded clarkduvall HLL++ — merging sketches produced by
  * the Go tool is a non-goal (SURVEY.md §4); estimates are the observable.
  */
object Intermediate {

  /** Serialize per-(window, shard) partials ([[Counters.partialState]])
    * into one JSON string column `value` per record, plus the Kinesis
    * `partition_key` (= counter id, `counter.go:530`).
    */
  def toRecords(partial: DataFrame, c: CounterDef,
                eventSourceArn: String,
                counterVersion: String = ConfigLoader.EngineVersion): DataFrame = {
    val state = c.counterType match {
      case CounterType.Count =>
        struct(col("partial_count").as("row_count"))
      case CounterType.ApproxCountDistinct =>
        struct(base64(col("partial_sketch")).as("base64_hll"))
    }
    partial.select(
      lit(c.id).as("partition_key"),
      to_json(struct(
        lit(eventSourceArn).as("event_source_arn"),
        col("shard_id").cast("string").as("shard_id"),
        lit(c.id).as("counter_id"),
        lit(c.counterType.name).as("counter_type"),
        lit(counterVersion).as("counter_version"),
        struct(
          date_format(col("window.start"), "yyyy-MM-dd'T'HH:mm:ssXXX").as("start"),
          date_format(col("window.end"), "yyyy-MM-dd'T'HH:mm:ssXXX").as("end")
        ).as("window"),
        state.as("counter_state"))).as("value"))
  }

  private val recordSchema: StructType = StructType(Seq(
    StructField("event_source_arn", StringType),
    StructField("shard_id", StringType),
    StructField("counter_id", StringType),
    StructField("counter_type", StringType),
    StructField("counter_version", StringType),
    StructField("window", StructType(Seq(
      StructField("start", TimestampType),
      StructField("end", TimestampType)))),
    StructField("counter_state", StructType(Seq(
      StructField("row_count", LongType),
      StructField("base64_hll", StringType))))))

  /** Parse a stream of intermediate-record JSON strings back into the
    * partial-state shape, keeping only records addressed to counter `c`
    * (`counter.go:365-371`) whose `counter_version` satisfies
    * `requiredVersion` (`counter.go:366-368` → `config.go:122-138`).
    * Unparseable or foreign records are dropped, mirroring the reference's
    * warn-and-skip (`counter.go:356-363,387-394`).
    */
  def parse(records: DataFrame, c: CounterDef,
            requiredVersion: Option[String] = None): DataFrame = {
    val versionOk = requiredVersion.map(VersionConstraint(_)) match {
      case None => (_: String) => true
      case Some(vc) => (v: String) =>
        try vc.check(v) catch { case _: IllegalArgumentException => false }
    }
    val versionOkUdf = udf(versionOk)
    val parsed = records
      .select(from_json(col("value"), recordSchema).as("r"))
      .where(col("r").isNotNull &&
        col("r.counter_id") === c.id &&
        col("r.counter_type") === c.counterType.name &&
        versionOkUdf(col("r.counter_version")))
    c.counterType match {
      case CounterType.Count =>
        parsed.select(
          struct(col("r.window.start").as("start"), col("r.window.end").as("end")).as("window"),
          col("r.shard_id"),
          col("r.counter_state.row_count").as("partial_count"))
      case CounterType.ApproxCountDistinct =>
        parsed.select(
          struct(col("r.window.start").as("start"), col("r.window.end").as("end")).as("window"),
          col("r.shard_id"),
          unbase64(col("r.counter_state.base64_hll")).as("partial_sketch"))
    }
  }

  /** The full aggregate-stream consumer (`counter.go:348-412`): parse +
    * filter + merge + final projection.
    */
  def mergeRecords(records: DataFrame, c: CounterDef,
                   requiredVersion: Option[String] = None,
                   eventSourceArn: Option[String] = None): DataFrame =
    Counters.finalizeOutput(
      Counters.mergePartials(parse(records, c, requiredVersion), c),
      c, eventSourceArn)
}
