package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the Structured Streaming capability the counter
  * pipeline itself never needs (the reference has no joins at all) but a
  * real event pipeline does: correlate two live streams within a time
  * bound, e.g. every click within the hour before each purchase.
  *
  * The engine mechanics (and why this scales): both sides carry a
  * watermark, and the time-range join condition lets Spark derive per-side
  * STATE RETENTION bounds — a left row can only match right rows within
  * `lookback`, so buffered state ages out as the watermark advances instead
  * of growing with the stream. Without the range condition, stream-stream
  * join state is unbounded; that formulation is rejected here by
  * construction. The join itself shuffles both sides on the key — the
  * same single-exchange shape as the batch join — and emits matches as
  * they arrive (inner join, append mode).
  */
object StreamingJoins {

  /** Interval join: each left row paired with EVERY right row of the same
    * `key` whose `rightTs` falls in `[leftTs - lookback, leftTs]`
    * (inclusive both ends — matching an as-of join's inclusive upper
    * bound, but keeping all matches, not just the latest).
    *
    * `watermarkDelay` is how much event-time disorder each side absorbs;
    * matches are emitted as soon as both rows have arrived (inner-join
    * semantics — late rows beyond the watermark may be dropped from
    * state and never match, the documented streaming trade).
    *
    * Column names must be disjoint between the two inputs (pre-project).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, leftKey: String,
                   rightKey: String, leftTs: String, rightTs: String,
                   lookback: String,
                   watermarkDelay: String = "0 seconds"): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs))
  }

  /** STREAM-STATIC join — the enrichment pattern (the third Structured
    * Streaming join class beside stream-stream and the broadcast-model
    * literal): a live stream joined to a bounded dimension frame. No
    * watermark and NO join state — Spark re-plans the static side per
    * micro-batch and the equi-join broadcasts it, so enrichment is a
    * stateless per-batch hash probe; the dimension may be refreshed
    * between batches (each micro-batch re-reads it). The natural shape
    * for user/session/config lookups feeding a windowed aggregate.
    */
  def staticEnrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key))

  /** The c28 query shape: purchases correlated with every click of the
    * same user in the preceding `lookback` — both sides carved from one
    * event stream. Output: (purchase_id, click_id, purchase_ms, click_ms).
    */
  def purchaseClickPairs(events: DataFrame, lookback: String = "1 hour",
                         watermarkDelay: String = "0 seconds"): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    intervalJoin(purchases, clicks, "p_user", "c_user", "p_ts", "c_ts",
      lookback, watermarkDelay)
      .select(col("purchase_id"), col("click_id"),
        unix_millis(col("p_ts")).as("purchase_ms"),
        unix_millis(col("c_ts")).as("click_ms"))
  }
}
