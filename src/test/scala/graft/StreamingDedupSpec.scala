package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.streaming.StreamingDedup

/** Streaming near-dup suppression v2 (`nearDupBandFlags` /
  * `dropNearDuplicatesVerified`): the multi-band candidates→verify
  * topology on `transformWithState`, spec-checked against its batch twin
  * [[Dedup.lshNearDupPairsMulti]] — same hyperplane families, same
  * equi-join key as the state partitioning, same exact-cosine verify.
  */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = 1638357540000L // 2021-12-01T11:19:00Z
  private def ts(offsetSec: Int) = new Timestamp(base + offsetSec * 1000L)

  // deterministic pseudo-random corpus: 40 background vectors (pairwise
  // cosine ≈ 0 — bucket collisions happen, verifies fail) + 8 planted
  // near-dups (i ↔ i+32: tiny perturbation, cosine ≈ 1)
  private def corpus: Seq[(Long, Array[Float])] = {
    def vec(seed: Int): Array[Float] = {
      val rnd = new scala.util.Random(seed * 7919 + 17)
      Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
    }
    val background = (0 until 32).map(i => (i.toLong, vec(i)))
    val planted = (32 until 40).map { i =>
      val src = vec(i - 32)
      (i.toLong, src.zipWithIndex.map { case (x, j) =>
        (x + (if (j % 16 == 0) 0.01f else 0.0f)) })
    }
    background ++ planted
  }

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally spark.conf.unset(key)
  }

  test("banded verify reproduces the batch multi-table pair set across batches") {
    implicit val sc = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(Timestamp, Long, Array[Float])]
      val flags = StreamingDedup.nearDupBandFlags(
        input.toDF().toDF("ts", "vec_id", "embedding"), "ts", "embedding",
        watermarkDelay = "3650 days")
      val query = flags.writeStream.format("memory").queryName("band_flags")
        .outputMode("append").start()
      try {
        // split mid-corpus so cross-batch state carry is exercised: the
        // planted dups (32..39) arrive in a LATER batch than their sources
        val rows = corpus.map { case (id, v) => (ts(id.toInt), id, v) }
        input.addData(rows.take(20): _*)
        query.processAllAvailable()
        input.addData(rows.slice(20, 36): _*)
        query.processAllAvailable()
        input.addData(rows.drop(36): _*)
        query.processAllAvailable()

        val got = spark.table("band_flags")
          .where(col("matched_id").isNotNull)
          .select(col("matched_id").as("a"), col("vec_id").as("b"))
          .distinct().as[(Long, Long)].collect().toSet
        val batch = Dedup.lshNearDupPairsMulti(
          corpus.toDF("vec_id", "embedding"))
          .as[(Long, Long)].collect().toSet
        assert(got == batch, s"stream pairs $got != batch pairs $batch")
        assert(batch.nonEmpty, "spec must exercise verified matches")

        // the spec must also exercise the no-false-drop path: candidate
        // (band-colliding) pairs that FAIL the cosine verify exist and
        // emit no match — the over-drop d15's candidate-level semantics
        // would have committed
        val markers = spark.table("band_flags")
          .groupBy(col("t"), col("bucket"))
          .agg(countDistinct(col("vec_id")).as("n"))
          .where(col("n") > 1).count()
        assert(markers > batch.size,
          "colliding buckets must outnumber verified pairs (some candidates fail verify)")
      } finally query.stop()
    }
  }

  test("dropSeenUrls: variants collapse cross-batch; garbage drops; first arrival wins") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingDedup.dropSeenUrls(
      input.toDF().toDF("ts", "doc_id", "raw"), "ts", col("raw"),
      watermarkDelay = "3650 days")
    val query = out.writeStream.format("memory").queryName("url_dedup_sink")
      .outputMode("append").start()
    try {
      // batch 1: two variants of one resource + garbage
      input.addData(
        (ts(0), 1L, "HTTPS://WWW.site0.example.com//page//7?utm_source=x"),
        (ts(1), 2L, "https://site0.example.com/page/7/"),
        (ts(2), 3L, "not a url at all"))
      query.processAllAvailable()
      // batch 2: a third variant of the same resource + one new resource
      input.addData(
        (ts(3), 4L, "https://site0.example.com:443/page/7"),
        (ts(4), 5L, "https://site1.example.com/page/8"))
      query.processAllAvailable()
      val rows = spark.table("url_dedup_sink")
        .select(col("doc_id"), col("__url")).collect()
        .map(r => r.getLong(0) -> r.getString(1))
      // one survivor per canonical URL, FIRST arrival kept even across
      // the batch boundary; garbage emitted nowhere
      assert(rows.map(_._2).sorted.toSeq == Seq(
        "https://site0.example.com/page/7", "https://site1.example.com/page/8"),
        s"got ${rows.toSeq}")
      assert(rows.toMap.values.toSet.size == 2 &&
        rows.map(_._1).toSet == Set(1L, 5L), s"first arrivals win: ${rows.toSeq}")
    } finally query.stop()
  }

  test("bloomSeenStream: cross-batch OR-accumulation equals the batch filter bit-for-bit") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[String]
    val out = StreamingDedup.bloomSeenStream(
      input.toDF().toDF("key"), nShards = 4)
    val query = out.writeStream.format("memory").queryName("bloom_sink")
      .outputMode("update").start()
    val keys1 = (0 until 30).map(i => s"https://a.example/$i")
    val keys2 = (30 until 50).map(i => s"https://a.example/$i") ++
      keys1.take(5) // cross-batch duplicates: bits idempotent
    try {
      input.addData(keys1: _*)
      query.processAllAvailable()
      input.addData(keys2: _*)
      query.processAllAvailable()
    } finally query.stop()
    val finals = spark.table("bloom_sink").groupBy(col("shard"))
      .agg(max_by(col("s"), col("s.n")).as("s"))
      .select(col("shard"), col("s.words").as("w"), col("s.n").as("n"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1).toVector, r.getLong(2))).toMap
    // batch twin: the same sharded aggregation over all keys at once
    val batch = (keys1 ++ keys2).toDF("key")
      .select(col("key"), org.apache.spark.sql.functions.pmod(
        graft.functions.PortableHash.md5Long60(col("key")), lit(4L)).as("shard"))
      .as[(String, Long)].groupByKey(_._2).mapValues(_._1)
      .agg(new graft.functions.BloomSketch.Agg(16384, 4).toColumn.name("s"))
      .toDF("shard", "s")
      .select(col("shard"), col("s.words").as("w"), col("s.n").as("n"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1).toVector, r.getLong(2))).toMap
    assert(finals.keySet == batch.keySet)
    for ((shard, (w, n)) <- batch) {
      assert(finals(shard)._1 == w, s"shard $shard filter bits diverge")
      assert(finals(shard)._2 == n, s"shard $shard insert count diverges")
    }
    // and the zero-FN theorem holds through the streamed path: every
    // inserted key tests true against its shard's final filter
    val sf = spark.table("bloom_sink").groupBy(col("shard"))
      .agg(max_by(col("s"), col("s.n")).as("s"))
    val acct = Dedup.bloomMembershipFromShards(sf,
      (keys1 ++ keys2).toDF("key"), (keys1 ++ keys2).toDF("key"), nShards = 4)
      .collect().head
    assert(acct.getAs[Long]("false_negatives") == 0L)
    assert(acct.getAs[Long]("n_members") == 50L)
  }

  test("an entry stops suppressing once the watermark passes its event time") {
    implicit val sc = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(Timestamp, Long, Array[Float])]
      val ones = Array.fill(64)(1.0f)
      val far = Array.tabulate(64)(j => if (j % 2 == 0) 1.0f else -1.0f)
      val flags = StreamingDedup.nearDupBandFlags(
        input.toDF().toDF("ts", "vec_id", "embedding"), "ts", "embedding",
        watermarkDelay = "1 minute")
      val query = flags.writeStream.format("memory").queryName("band_evict")
        .outputMode("append").start()
      try {
        input.addData((ts(0), 1L, ones))
        query.processAllAvailable()
        // advance the watermark far past ts(0)+1min (the heartbeat carries
        // a real vector: filtered rows cannot advance event time)
        input.addData((ts(600), 2L, far))
        query.processAllAvailable()
        // identical vector, ts inside the NEW horizon: its twin's state
        // was evicted, so it must NOT match
        input.addData((ts(601), 3L, ones))
        query.processAllAvailable()
        val matched = spark.table("band_evict")
          .where(col("matched_id").isNotNull).count()
        assert(matched == 0, "evicted entry must not suppress")
      } finally query.stop()
    }
  }

  test("within-horizon repeat IS suppressed, first arrival wins (cross-batch)") {
    implicit val sc = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(Timestamp, Long, Array[Float])]
      val ones = Array.fill(64)(1.0f)
      val flags = StreamingDedup.nearDupBandFlags(
        input.toDF().toDF("ts", "vec_id", "embedding"), "ts", "embedding",
        watermarkDelay = "10 minutes")
      val query = flags.writeStream.format("memory").queryName("band_hit")
        .outputMode("append").start()
      try {
        input.addData((ts(0), 1L, ones))
        query.processAllAvailable()
        input.addData((ts(30), 2L, ones))
        query.processAllAvailable()
        val hits = spark.table("band_hit").where(col("matched_id").isNotNull)
          .select(col("vec_id"), col("matched_id").cast("long"))
          .as[(Long, Long)].collect().toSet
        assert(hits == Set((2L, 1L)), s"later doc matches the earlier keeper: $hits")
      } finally query.stop()
    }
  }

  test("dropNearDuplicatesVerified emits the kept set after windows close") {
    implicit val sc = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(Timestamp, Long, Array[Float])]
      val ones = Array.fill(64)(1.0f)
      val nearOnes = Array.tabulate(64)(j => if (j == 0) 1.01f else 1.0f)
      val far = Array.tabulate(64)(j => if (j % 2 == 0) 1.0f else -1.0f)
      val kept = StreamingDedup.dropNearDuplicatesVerified(
        input.toDF().toDF("ts", "vec_id", "embedding"), "ts", "embedding",
        watermarkDelay = "5 seconds")
      val query = kept.writeStream.format("memory").queryName("band_kept")
        .outputMode("append").start()
      try {
        input.addData((ts(0), 1L, ones), (ts(1), 2L, far), (ts(2), 3L, nearOnes))
        query.processAllAvailable()
        // close the windows: heartbeat far past the delay
        input.addData((ts(120), 9L, Array.fill(64)(-1.0f)))
        query.processAllAvailable()
        val ids = spark.table("band_kept").select("vec_id")
          .as[Long].collect().sorted.toSeq
        // doc 3 is a verified near-dup of doc 1 → suppressed; 1 and 2 kept
        assert(ids == Seq(1L, 2L), s"kept $ids")
      } finally query.stop()
    }
  }

  test("repeatedGramDigests: emits each repeated gram ONCE, on its second sighting") {
    implicit val sc = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(Timestamp, String)]
      val shared = (1 to 8).map(i => s"w$i").mkString(" ")
      val out = StreamingDedup.repeatedGramDigests(
        input.toDF().toDF("ts", "text"), "ts", L = 8,
        watermarkDelay = "5 seconds")
      val query = out.writeStream.format("memory").queryName("grams_sink")
        .outputMode("append").start()
      try {
        // batch 1: two docs sharing ONE 8-gram (each doc is exactly 8
        // tokens, one gram per doc) — the repeat is WITHIN one micro-batch
        input.addData((ts(0), shared), (ts(1), shared))
        query.processAllAvailable()
        assert(spark.table("grams_sink").count() == 1L,
          "one digest on the second sighting, within-batch")
        // batch 2: a THIRD occurrence must not re-emit; a fresh unique
        // doc emits nothing
        input.addData((ts(2), shared),
          (ts(3), (101 to 108).map(i => s"u$i").mkString(" ")))
        query.processAllAvailable()
        assert(spark.table("grams_sink").count() == 1L,
          "third sighting must not re-emit")
        // batch 3: the unique doc's gram repeats ACROSS batches → emits
        input.addData((ts(4), (101 to 108).map(i => s"u$i").mkString(" ")))
        query.processAllAvailable()
        val got = spark.table("grams_sink").count()
        assert(got == 2L, s"cross-batch repeat must emit exactly once: $got")
      } finally query.stop()
    }
  }
}
