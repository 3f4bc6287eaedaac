package graft

import org.apache.spark.sql.DataFrame

import graft.config.{AppConfig, Arn, CounterDef}
import graft.operators.{Counters, JqTransform}
import graft.sinks.Sinks

/** The engine facade — what the reference's `App.handler` does per event
  * batch (`/root/reference/counter.go:161-204`), re-expressed over
  * DataFrames: route every configured counter whose `input_stream_arn`
  * wildcard-matches the event source (O16, `arn.go:61-86`), run its
  * pipeline (single-phase, or explicit two-phase when an
  * `aggregate_stream_arn` is configured — O10), apply the optional
  * `jq_expr` output transform (O14), and hand each counter's output to its
  * sink (O15).
  *
  * The reference runs counters as goroutines over the same batch; here each
  * counter is a declarative query over the same (cacheable) DataFrame —
  * counters sharing a window width can instead share ONE scan+shuffle via
  * [[Counters.fanOut]], which is the 100 TB-preferred path when output
  * schemas align.
  */
object Engine {

  /** One counter's full pipeline: count/ACD, O13 projection, optional jq
    * transform. Topology selection mirrors the reference
    * (`counter.go:331-345`): with an `aggregate_stream_arn` the per-shard
    * partials merge cross-shard (two-phase, one record per window);
    * WITHOUT one, a sharded source emits one record per (window, shard)
    * with `shard_id` in the output — the reference's non-aggregate Lambda
    * topology, where each shard's invocation emits its own record
    * (`counter.go:423-425`).
    */
  def pipeline(df: DataFrame, tsCol: String, c: CounterDef,
               shardCol: Option[String] = None,
               eventSourceArn: Option[String] = None): DataFrame = {
    val base = (c.aggregateStreamArn, shardCol) match {
      case (Some(_), Some(shard)) => Counters.runTwoPhase(df, tsCol, shard, c, eventSourceArn)
      case (None, Some(shard)) => Counters.runPerShard(df, tsCol, shard, c, eventSourceArn)
      case _ => Counters.run(df, tsCol, c, eventSourceArn)
    }
    c.jqExpr match {
      case Some(jq) => JqTransform(base, jq)
      case None => base
    }
  }

  /** Route + run all counters of `config` against one batch.
    * Returns (counter, output) for every counter matching `eventSource`.
    * Routing honors `config.arnMatchCompat` (reference-exact unanchored
    * segment matching, `arn.go:93-107`).
    */
  def process(df: DataFrame, tsCol: String, config: AppConfig,
              eventSource: Arn,
              shardCol: Option[String] = None): Seq[(CounterDef, DataFrame)] =
    config.counters
      .filter(_.matchesSource(eventSource, config.arnMatchCompat))
      .map(c => c -> pipeline(df, tsCol, c, shardCol, Some(eventSource.toString)))

  /** [[process]] + sink each output (O15): the batch-mode equivalent of the
    * reference's handler → putStateRecord chain.
    */
  def run(df: DataFrame, tsCol: String, config: AppConfig, eventSource: Arn,
          putter: Sinks.RecordPutter,
          shardCol: Option[String] = None): Unit =
    process(df, tsCol, config, eventSource, shardCol)
      .foreach { case (c, out) => Sinks.write(out, c, putter) }
}
