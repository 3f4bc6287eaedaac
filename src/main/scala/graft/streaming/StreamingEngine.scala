package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.config.{AppConfig, Arn}
import graft.sinks.Sinks

/** The composed STREAMING application — the reference's whole Lambda
  * topology (`counter.go:150-204`) as one call, the streaming twin of the
  * batch `graft.Engine.run`:
  *
  * {{{
  * raw payload stream
  *   → KPL deaggregate (O3)          StreamingCounters.parsePackedRecords
  *   → JSON parse + corrupt channel (O4)
  *   → ARN-route each configured counter (O16)
  *   → tumbling window + count/ACD (O8/O9/O12), jq transform (O14)
  *   → one writeStream per counter → RecordPutter sink (O15)
  *   [+ the corrupt-record stream → its own sink: batchItemFailures]
  * }}}
  *
  * One streaming query per matching counter (separate queries because each
  * counter has its own output schema after jq and its own sink ARN;
  * counters sharing a window width can instead share state via
  * [[StreamingCounters.fanOut]] when their output shapes align). The
  * returned queries are RUNNING; the caller owns their lifecycle
  * (`awaitTermination`/`stop`).
  */
object StreamingEngine {

  /** Route + launch every matching counter over a raw payload stream.
    * Returns (counterId → running query), plus the failures query under
    * key `"__failures__"` when `failurePutter` is set.
    */
  def run(raw: DataFrame, schema: StructType, tsCol: String, config: AppConfig,
          eventSource: Arn, putter: Sinks.RecordPutter,
          watermarkDelay: String = "10 seconds",
          payloadCol: String = "value",
          failurePutter: Option[Sinks.RecordPutter] = None,
          queryNamePrefix: String = "graft"): Map[String, StreamingQuery] = {
    val parsed = StreamingCounters.parsePackedRecords(raw, schema, payloadCol)
    val ok = StreamingCounters.parsedOk(parsed)
    val counterQueries = config.counters
      .filter(_.matchesSource(eventSource, config.arnMatchCompat))
      .map { c =>
        val out = StreamingCounters.pipeline(
          ok, tsCol, c, watermarkDelay, Some(eventSource.toString))
        c.id -> out.writeStream
          .queryName(s"$queryNamePrefix-${c.id}")
          .outputMode("append")
          .foreachBatch(Sinks.foreachBatchSink(c, putter))
          .start()
      }
    // the batchItemFailures analog (counter.go:245-248): corrupt payloads
    // flow to their own sink instead of failing the stream
    val failureQuery = failurePutter.map { fp =>
      "__failures__" -> StreamingCounters.failures(parsed).writeStream
        .queryName(s"$queryNamePrefix-failures")
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // executor-side drain, like Sinks.write — never collect
          batch.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
            it.foreach(r => fp.put(null, "failures", r.getString(0)))
          }
        }
        .start()
    }
    (counterQueries ++ failureQuery).toMap
  }
}
