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

  /** NB-classifier scoring for a document stream under a batch-trained
    * [[TextAnalysis.NbModel]] — the classifier's streaming face. The
    * dense flattened weight table and the priors ship as literal arrays;
    * per doc, tokens hash to buckets in ONE `transform`, the per-label
    * score vector folds in ONE `aggregate` (L element_at lookups per
    * token, L = labels — all codegen'd), and the argmax picks the highest
    * score with ties to the GREATER label (via reversed array_position —
    * exactly the batch `max(struct(score, label))` pick over ascending
    * labels). Stateless projection: no watermark, no state store, no
    * shuffle. Output: (doc_id, pred, score_bits, self_match) —
    * row-for-row [[TextAnalysis.nbClassifier]] when the model trained on
    * the same corpus (oracle-checked parity).
    */
  def nbScoreStream(stream: DataFrame, model: TextAnalysis.NbModel,
                    labelCol: String = "lang"): DataFrame = {
    val bkts = model.buckets
    val nL = model.labels.length
    val wFlat = lit(model.weights)
    val priorsLit = lit(model.priors)
    val labelIdx = lit(model.labels.indices.map(_.toLong).toArray)
    val labelsLit = lit(model.labels)
    stream
      .select(col("doc_id"), col(labelCol).as("__true"),
        TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), col("__true"),
        transform(col("__toks"), t =>
          (PortableHash.md5Long60(concat(lit("nb:"), t)) % lit(bkts.toLong))
            .cast("int")).as("__tb"))
      .select(col("doc_id"), col("__true"),
        aggregate(col("__tb"), priorsLit, (acc, b) =>
          zip_with(acc, labelIdx, (a, li) =>
            a + element_at(wFlat,
              (li * lit(bkts.toLong) + b + lit(1L)).cast("int")))).as("__sc"))
      .select(col("doc_id"), col("__true"), col("__sc"),
        array_max(col("__sc")).as("score_bits"))
      // argmax with ties to the greater label: position of the max in the
      // REVERSED score array gives the LAST maximal index
      .select(col("doc_id"), col("__true"), col("score_bits"),
        element_at(labelsLit,
          (lit(nL.toLong) - array_position(reverse(col("__sc")), col("score_bits"))
            + lit(1L)).cast("int")).as("pred"))
      .select(col("doc_id"), col("pred"), col("score_bits"),
        (col("pred") === col("__true")).cast("long").as("self_match"))
  }
}
