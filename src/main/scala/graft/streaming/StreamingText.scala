package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.textops.TextAnalysis

/** Text scoring over document STREAMS — the broadcast-model pattern: a
  * model is trained batch-side ([[TextAnalysis.dsirLambda]] — a
  * buckets-long integer array), then ships into the stream as a literal
  * and scoring becomes a STATELESS projection. No watermark, no state
  * store, no shuffle: the per-doc score folds over the doc's own bigram
  * array inside one codegen'd `aggregate` HOF, so ingest-time quality
  * scoring runs at scan speed and the output is row-for-row identical to
  * the batch operator (oracle-checked parity).
  */
object StreamingText {

  /** DSIR importance scores for a document stream under a batch-trained
    * λ table. Output: (doc_id, n_bigrams, score_bits) — exactly
    * [[TextAnalysis.dsirScore]]'s rows when `lambda` was trained on the
    * same corpus (bigram-less docs drop, the empty-stream rule).
    */
  def dsirScoreStream(stream: DataFrame, lambda: Array[Long],
                      buckets: Int = 1024): DataFrame = {
    require(lambda.length == buckets, s"lambda must have $buckets entries")
    val lamLit = lit(lambda)
    stream
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), TextAnalysis.kgrams(col("__toks"), 2).as("__bg"))
      .select(col("doc_id"),
        size(col("__bg")).cast("long").as("n_bigrams"),
        aggregate(col("__bg"), lit(0L), (acc, g) =>
          acc + element_at(lamLit,
            (PortableHash.md5Long60(concat(lit("dsir:"), g))
              % lit(buckets.toLong) + 1).cast("int"))).as("score_bits"))
      .where(col("n_bigrams") > 0)
  }
}
