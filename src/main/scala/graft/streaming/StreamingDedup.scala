package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** Ingest-time URL-level dedup — the streaming face of
    * [[graft.dedup.Dedup.urlDedup]], the FIRST dedup stage of a live
    * crawl frontier: fetch variants collapse through
    * [[graft.textops.UrlOps.canonicalizeUrl]] (a pure codegen'd
    * projection, no model state) and the first arrival per canonical URL
    * within the watermark horizon survives. State is one row per
    * canonical URL, watermark-evicted like [[dropExactDuplicates]];
    * unparseable URLs drop permissively (the d25 batch convention).
    * Which DOCUMENT wins a URL is arrival-order-dependent; the surviving
    * canonical URL SET is not — the d15 parity shape.
    */
  def dropSeenUrls(stream: DataFrame, tsCol: String, url: Column,
                   watermarkDelay: String = "10 minutes"): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .withColumn("__url", graft.textops.UrlOps.canonicalizeUrl(url))
      .where(col("__url").isNotNull)
      .dropDuplicatesWithinWatermark("__url")

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

  // ----------------------------------------- near-dup v2: multi-band + verify --

  /** One (document, hash-table) row entering the banded state: the id, its
    * event time (the watermarked attribute, riding the typed Dataset like
    * `StateEvent.ts`), the band key, and the raw float embedding (needed
    * for the exact-cosine verify; 64 floats = 256 bytes of state per
    * table entry — the only vector bytes that ever enter a state store,
    * bounded by the watermark horizon).
    */
  private[streaming] case class BandRow(
      vec_id: Long, ts: java.sql.Timestamp, t: Int, bucket: Long, emb: Array[Float])

  /** Per-(table, bucket) verify outcome for one arriving document:
    * `matched_id` is the EARLIER document this one cosine-verified against
    * (null = presence marker — the document passed through this band with
    * no verified match). One marker per (doc, table) plus one row per
    * verified match. `ts` is re-exported as the OUTPUT event-time column
    * (the `transformWithState(processor, eventTimeColumnName, mode)`
    * chaining form) so a downstream stateful aggregation can window on it.
    */
  private[streaming] case class BandFlag(
      vec_id: Long, ts: java.sql.Timestamp, t: Int, bucket: Long, matched_id: java.lang.Long)

  private[streaming] case class BandEntry(vec_id: Long, ts_ms: Long, emb: Array[Float])

  private def tsMs(t: java.sql.Timestamp): Long = t.getTime

  /** The streaming analog of the batch candidates→verify LSH near-dup
    * ([[graft.dedup.Dedup.lshNearDupPairsMulti]]): state is partitioned by
    * (table, bucket) — exactly the batch equi-join key — and an arriving
    * document exact-cosine-verifies against every EARLIER document stored
    * in its bucket. Every document registers in its buckets whether or not
    * it matched (batch candidate generation considers all documents), so
    * the verified-match set over any prefix of the stream equals the batch
    * pair set of that prefix — the d16 oracle parity.
    *
    * The per-comparison cosine mirrors the batch verify bit-for-bit:
    * [[graft.functions.VectorOpsFunctions.dotFF]]'s summation (dot over
    * the common prefix, norms over each full vector, all left-to-right in
    * double precision).
    *
    * Eviction: an entry suppresses until the watermark passes its event
    * time (the `dropDuplicatesWithinWatermark` bound) — pruned on the next
    * input to its bucket and by an event-time timer kept at the oldest
    * entry, so idle buckets drain to zero state.
    */
  private[streaming] class NearDupBandProcessor(tau: Double)
      extends StatefulProcessor[(Int, Long), BandRow, BandFlag] {
    @transient private var entries: ListState[BandEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      entries = getHandle.getListState[BandEntry](
        "bandEntries", Encoders.product[BandEntry], TTLConfig.NONE)

    // the batch verify's arithmetic exactly: VecDot.dot over the common
    // prefix, per-side norms over the full vectors (Ann.normalize)
    private def cosine(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
      var na = 0.0
      i = 0
      while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
      var nb = 0.0
      i = 0
      while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    private def prune(wm: Long): scala.collection.mutable.ArrayBuffer[BandEntry] = {
      val kept = scala.collection.mutable.ArrayBuffer.empty[BandEntry]
      val it = entries.get()
      while (it.hasNext) { val e = it.next(); if (e.ts_ms >= wm) kept += e }
      kept
    }

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandRow],
                                 timerValues: TimerValues): Iterator[BandFlag] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val kept = prune(wm)
      // arrival order within the batch: event time, then id — the same
      // a-before-b orientation as the batch pair join's vec_id <
      val batch = rows.toArray.sortBy(r => (tsMs(r.ts), r.vec_id))
      val out = Seq.newBuilder[BandFlag]
      batch.foreach { r =>
        val rms = tsMs(r.ts)
        var matched = false
        kept.foreach { e =>
          val earlier = e.ts_ms < rms || (e.ts_ms == rms && e.vec_id < r.vec_id)
          if (earlier && cosine(e.emb, r.emb) >= tau) {
            matched = true
            out += BandFlag(r.vec_id, r.ts, key._1, key._2, e.vec_id)
          }
        }
        if (!matched) out += BandFlag(r.vec_id, r.ts, key._1, key._2, null)
        kept += BandEntry(r.vec_id, rms, r.emb)
      }
      entries.put(kept.toArray)
      // wake when the OLDEST entry expires, so idle buckets still drain
      if (kept.nonEmpty) getHandle.registerTimer(kept.map(_.ts_ms).min + 1)
      out.result().iterator
    }

    override def handleExpiredTimer(key: (Int, Long), timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[BandFlag] = {
      val kept = prune(timerValues.getCurrentWatermarkInMs())
      if (kept.isEmpty) entries.clear()
      else {
        entries.put(kept.toArray)
        getHandle.registerTimer(kept.map(_.ts_ms).min + 1)
      }
      Iterator.empty
    }
  }

  /** Band-level verify flags for ingest-time near-dup suppression v2 — the
    * streaming face of [[graft.dedup.Dedup.lshNearDupPairsMulti]]'s
    * candidates→verify topology (the batch d10 operator, not just its
    * candidate generator): `tables` independent sign-LSH hyperplane
    * families give each document `tables` band keys; state lives per
    * (table, bucket) (8-byte key — the batch equi-join key); an arriving
    * document is checked by EXACT cosine (≥ tau) against the earlier
    * documents in each of its buckets.
    *
    * Emits one row per (document, table) — `matched_id` null as a
    * presence marker — plus one row per verified match. Consumers:
    *  - drop events: `where(matched_id is not null)` (duplicate matches
    *    across tables possible — distinct on (vec_id) or (vec_id,
    *    matched_id) downstream);
    *  - suppression: [[dropNearDuplicatesVerified]] composes the windowed
    *    kept-set aggregation.
    *
    * The bucket computation (`Ann.bucketExprOn`, table-keyed families)
    * stays in codegen before the shuffle; only the banded verify runs in
    * the processor. Requires the RocksDB state store provider (the
    * `transformWithState` requirement, as with `runCustomStateTws`).
    *
    * Recall/precision sit strictly between d15's candidate-level
    * suppression and batch d10: same OR-construction recall lever
    * (`tables`), exact-cosine precision — no false drops from mere bucket
    * collisions, the gap d15 documents.
    */
  def nearDupBandFlags(stream: DataFrame, tsCol: String, embedCol: String,
                       idCol: String = "vec_id", tau: Double = 0.35,
                       nPlanes: Int = 4, tables: Int = 3,
                       watermarkDelay: String = "10 minutes"): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val vDouble = transform(col(embedCol), x => x.cast("double"))
    val tb = explode(array((0 until tables).map(t =>
      struct(lit(t).as("t"),
        graft.similarity.Ann.bucketExprOn(vDouble, nPlanes, table = t).as("bucket"))): _*))
    stream.withWatermark(tsCol, watermarkDelay)
      .where(col(embedCol).isNotNull)
      .select(
        col(idCol).cast("long").as("vec_id"),
        col(tsCol).cast("timestamp").as("ts"),
        tb.as("tb"),
        col(embedCol).cast("array<float>").as("emb"))
      .select(col("vec_id"), col("ts"), col("tb.t").as("t"),
        col("tb.bucket").as("bucket"), col("emb"))
      .as[BandRow]
      .groupByKey(r => (r.t, r.bucket))
      // the eventTimeColumnName form: output `ts` carries event-time
      // metadata so downstream stateful ops (the suppression agg) chain
      .transformWithState(new NearDupBandProcessor(tau),
        "ts", OutputMode.Append())
      .toDF()
  }

  // -------------------------------------------- streaming repeated grams --

  private[streaming] case class GramRow(g: Long, ts: java.sql.Timestamp)

  /** Emits each gram digest exactly ONCE — at the moment its SECOND
    * occurrence arrives. State per gram is one capped counter (caps at 2,
    * so re-occurrences after emission touch state but never re-emit).
    */
  private[streaming] class RepeatedGramProcessor
      extends StatefulProcessor[Long, GramRow, Long] {
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long](
        "gramOccurrences", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[GramRow],
                                 timerValues: TimerValues): Iterator[Long] = {
      val prior = if (seen.exists()) seen.get() else 0L
      val n = rows.size
      val total = math.min(2L, prior + n)
      seen.update(total)
      if (prior < 2L && total >= 2L) Iterator.single(key) else Iterator.empty
    }
  }

  /** Streaming face of [[graft.dedup.Dedup.repeatedSpans]]' repeated-gram
    * detection — the live-ingest read of Lee et al.'s exact substring
    * dedup: as documents arrive, every token L-gram digest that has now
    * been seen MORE THAN ONCE (across documents or within one) is emitted,
    * exactly once, on its second sighting. The emitted digest SET is
    * arrival-order-INDEPENDENT (a gram repeats or it doesn't) and equals
    * the batch d28 repeated-gram table over the same corpus — the d15/d27
    * parity shape; per-document span accounting stays batch (d28), since
    * which document "owns" a repeat IS arrival-dependent.
    *
    * Scale shape: tokenize/slice/digest are pure codegen projections
    * before the one shuffle (keyed by the 8-byte digest); state is one
    * capped counter per DISTINCT gram — production bounds it with a state
    * TTL at the dedup horizon (the corpus-lifetime fixture run uses
    * TTL-free state, same convention as d16's 3650-day watermark).
    * Requires the RocksDB state store provider (`transformWithState`).
    */
  def repeatedGramDigests(stream: DataFrame, tsCol: String, L: Int = 8,
                          watermarkDelay: String = "10 minutes"): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val d = stream.withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol).cast("timestamp").as("ts"),
        split(col("text"), " ").as("t"))
      .select(col("ts"), col("t"), size(col("t")).cast("long").as("n"))
      .where(col("n") >= L)
    d.select(col("ts"),
        explode(sequence(lit(1L), col("n") - lit(L - 1))).as("pos"), col("t"))
      .select(
        graft.functions.PortableHash.md5Long60(
          array_join(slice(col("t"), col("pos"), lit(L)), " ")).as("g"),
        col("ts"))
      .as[GramRow]
      .groupByKey(_.g)
      .transformWithState(new RepeatedGramProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF("gram_h60")
  }

  /** Verified ingest-time near-dup SUPPRESSION: the kept (vec_id, ts) set
    * — documents with no verified earlier near-dup in any hash table
    * within the watermark horizon. Composes [[nearDupBandFlags]] with a
    * per-document window aggregation, so a document's verdict emits once
    * its event-time window passes the watermark (streaming-legal append
    * output; latency = the watermark delay — the price of a cross-table
    * verdict, which no single band owns).
    */
  /** Streaming face of the Bloom SEEN-SET (d26's filter built from a
    * STREAM): keys shard by `pmod(md5_60(key), nShards)` — the way
    * production scales grow-only filter state — and each shard's
    * [[graft.functions.BloomSketch.Agg]] runs as a streaming typed
    * aggregation (update mode), so the filter bits accumulate across
    * micro-batches as state. Bit-OR is commutative AND idempotent, so
    * the final per-shard filter is a pure function of the key multiset —
    * arrival-order- and batch-boundary-independent (the d15/d27 parity
    * discipline); `n` counts inserts, also order-free. Probe the final
    * emission per shard (max_by n — n is non-decreasing across a
    * shard's updates) with
    * [[graft.dedup.Dedup.bloomMembershipFromShards]]: the zero-FN
    * theorem then certifies the STREAMED state path lost no bits.
    *
    * Output stream (update mode): (shard, s struct(words, n)).
    */
  def bloomSeenStream(keys: DataFrame, nShards: Int = 8,
                      mBits: Int = 16384, kHashes: Int = 4): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.select(col("key").cast("string").as("key"),
        pmod(graft.functions.PortableHash.md5Long60(col("key")),
          lit(nShards.toLong)).as("shard"))
      .as[(String, Long)]
      .groupByKey(_._2)
      .mapValues(_._1)
      .agg(new graft.functions.BloomSketch.Agg(mBits, kHashes).toColumn.name("s"))
      .toDF("shard", "s")
  }

  def dropNearDuplicatesVerified(stream: DataFrame, tsCol: String, embedCol: String,
                                 idCol: String = "vec_id", tau: Double = 0.35,
                                 nPlanes: Int = 4, tables: Int = 3,
                                 watermarkDelay: String = "10 minutes"): DataFrame =
    nearDupBandFlags(stream, tsCol, embedCol, idCol, tau, nPlanes,
        tables, watermarkDelay)
      .groupBy(window(col("ts"), "1 second"), col("vec_id"))
      .agg(max(col("matched_id")).as("__m"), min(col("ts")).as("doc_ts"))
      .where(col("__m").isNull)
      .select(col("vec_id"), col("doc_ts").as("ts"))
}
