package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-native deduplication — the streaming analog of
  * [[graft.dedup.Dedup.exactGroups]], for ingest-time dedup of a document
  * firehose (the common shape: crawled/ingested text arrives continuously
  * and exact repeats should never reach storage).
  *
  * `dropDuplicatesWithinWatermark` keys the state store by content hash
  * and — unlike plain `dropDuplicates` on a stream — EVICTS each key once
  * the watermark passes its event time, so state is bounded by the
  * watermark horizon × ingest rate, not by all-time distinct content.
  * That bound is what makes this runnable forever at pipeline scale; an
  * all-time exact pass stays a batch job ([[graft.dedup.Dedup]]).
  *
  * Only the md5 (16 bytes) enters the state store — never the document
  * bytes.
  */
object StreamingDedup {

  /** Keep the first occurrence of each `contentCol` value within the
    * watermark horizon; later exact repeats are dropped. Emits the input
    * columns unchanged. Null-content records (e.g. extraction failures)
    * pass through untouched — md5(null) is null, and letting them into
    * the dedup key would collapse EVERY null-content record onto one
    * state entry, silently dropping all but the first.
    */
  def dropExactDuplicates(stream: DataFrame, tsCol: String, contentCol: String,
                          watermarkDelay: String = "10 minutes"): DataFrame = {
    val watermarked = stream.withWatermark(tsCol, watermarkDelay)
    val deduped = watermarked
      .where(col(contentCol).isNotNull)
      .withColumn("__content_md5", md5(col(contentCol).cast("binary")))
      .dropDuplicatesWithinWatermark("__content_md5")
      .drop("__content_md5")
    deduped.unionByName(watermarked.where(col(contentCol).isNull))
  }

  /** Ingest-time NEAR-dup suppression over an embedding column: keep the
    * first document per sign-LSH bucket within the watermark horizon.
    *
    * This is the streaming face of the batch LSH candidate generator
    * ([[graft.similarity.Ann.signLshBuckets]]): the bucket id (sign
    * pattern against `nPlanes` deterministic hyperplanes) is ONE state-
    * store key per document — 8 bytes, same eviction bound as
    * [[dropExactDuplicates]] — so it composes with
    * `dropDuplicatesWithinWatermark` directly instead of needing a
    * banded multi-key join that chained stateful operators make painful.
    *
    * Semantics are candidate-level, deliberately: two documents in the
    * same bucket are cosine-close with probability (1 − θ/π)^nPlanes, so
    * this drops aggressively (no exact-cosine verify pass — that needs
    * the batch path). Tune `nPlanes` per the corpus's similarity floor:
    * more planes → finer buckets → fewer false drops, less recall.
    */
  def dropNearDuplicatesWithinWatermark(stream: DataFrame, tsCol: String,
                                        embedCol: String, nPlanes: Int = 8,
                                        watermarkDelay: String = "10 minutes"): DataFrame = {
    val watermarked = stream.withWatermark(tsCol, watermarkDelay)
    val withVec = watermarked
      .where(col(embedCol).isNotNull)
      .withColumn("__v", transform(col(embedCol), x => x.cast("double")))
    withVec
      .withColumn("__bucket",
        graft.similarity.Ann.bucketExprOn(col("__v"), nPlanes))
      .dropDuplicatesWithinWatermark("__bucket")
      .drop("__v", "__bucket")
      .unionByName(watermarked.where(col(embedCol).isNull))
  }
}
