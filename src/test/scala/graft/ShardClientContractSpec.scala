package graft

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow

import graft.sources.Deaggregate
import graft.sources.v2._

/** In-memory [[ShardReaderClient]] — the "real SDK" stand-in. Records live
  * in a JVM-global store keyed by stream name, so the driver can mutate
  * the stream between micro-batches while serialized client copies on
  * executor threads see the updates (local-mode test semantics).
  *
  * `lastNeedData` records the pruning hint so the contract can assert the
  * connector forwards it.
  */
object MockShardStore {
  val streams =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.ConcurrentHashMap[String, Vector[WireRecord]]]
  val lastHints = new java.util.concurrent.ConcurrentHashMap[String, ReadHints]
}

final class MockShardClient(name: String) extends ShardReaderClient {
  MockShardStore.streams.putIfAbsent(
    name, new java.util.concurrent.ConcurrentHashMap[String, Vector[WireRecord]])
  private def store = MockShardStore.streams.get(name)

  def append(shardId: String, recs: WireRecord*): Unit =
    store.merge(shardId, recs.toVector, (a, b) => a ++ b)
  def drop(shardId: String): Unit = store.remove(shardId)

  override def listShards(): Seq[String] = store.keySet.asScala.toSeq.sorted
  override def latestPosition(shardId: String): Long =
    Option(store.get(shardId)).map(_.size.toLong).getOrElse(0L)
  override def records(shardId: String, from: Long,
                       hints: ReadHints): RecordIterator = {
    MockShardStore.lastHints.put(name, hints)
    new RecordIterator {
      private val snap = Option(store.get(shardId)).getOrElse(Vector.empty)
      private var i = from.toInt
      override def nextRecord(): WireRecord =
        if (i >= snap.size) null else { val r = snap(i); i += 1; r }
      override def close(): Unit = ()
    }
  }
}

/** The transport-independence contract: every piece of connector logic —
  * offset bookkeeping, incremental planning, late shards, missing-shard
  * failure, KPL deaggregation, column pruning, the permissive corrupt
  * side channel — exercised against [[MockShardClient]], no files
  * anywhere. What passes here with the mock and in `ShardSourceSpec`
  * with [[FileShardClient]] is exactly the logic an AWS SDK client would
  * inherit unchanged.
  */
class ShardClientContractSpec extends SparkTestBase {

  private def rec(pk: String, seq: String, ts: Long, data: String) =
    WireRecord(pk, seq, ts, data.getBytes(StandardCharsets.UTF_8))

  private val allFields =
    Array("shard_id", "partition_key", "sequence_number", "arrival_ts", "data")

  private def readAll(client: ShardReaderClient, opts: ShardOptions,
                      fields: Array[String],
                      parts: Array[org.apache.spark.sql.connector.read.InputPartition])
      : Seq[Seq[Any]] = {
    val factory = new ShardReaderFactory(client, opts, fields)
    parts.toSeq.flatMap { p =>
      val r = factory.createReader(p)
      val out = Iterator.continually(r)
        .takeWhile(_.next())
        .map(_.get() match { case row: InternalRow =>
          fields.indices.map { i =>
            fields(i) match {
              case "shard_id" | "partition_key" | "sequence_number" =>
                Option(row.getUTF8String(i)).map(_.toString).orNull
              case "arrival_ts" => if (row.isNullAt(i)) null else row.getLong(i)
              case "data" =>
                if (row.isNullAt(i)) null
                else new String(row.getBinary(i), StandardCharsets.UTF_8)
            }
          }
        }).toVector
      r.close()
      out
    }
  }

  private def stream(client: ShardReaderClient,
                     opts: ShardOptions = ShardOptions(deaggregate = false, permissive = false),
                     fields: Array[String] = allFields) =
    new ShardMicroBatchStream(client, opts, fields, "mock://contract")

  test("contract: offsets advance per shard, batches read exactly [begin, until)") {
    val c = new MockShardClient("contract-offsets")
    val s = stream(c)
    assert(s.initialOffset().json() == "{}")
    c.append("s0", rec("a", "1", 1000L, "r1"), rec("b", "2", 2000L, "r2"))
    val o1 = s.latestOffset()
    assert(o1.json() == """{"s0":2}""", o1.json())
    val batch1 = s.planInputPartitions(s.initialOffset(), o1)
    val rows1 = readAll(c, ShardOptions(false, false), allFields, batch1)
    assert(rows1.map(_(1)) == Seq("a", "b"))
    assert(rows1.map(_(4)) == Seq("r1", "r2"))
    // arrival millis → catalyst micros happens in the reader, not transport
    assert(rows1.map(_(3)) == Seq(1000000L, 2000000L))

    // append to an existing shard AND a brand-new one (resharding):
    // the next batch reads ONLY the delta; the late shard enters at 0
    c.append("s0", rec("c", "3", 3000L, "r3"))
    c.append("s1", rec("d", "4", 4000L, "r4"))
    val o2 = s.latestOffset()
    assert(o2.json() == """{"s0":3,"s1":1}""", o2.json())
    val batch2 = s.planInputPartitions(o1, o2)
    assert(batch2.length == 2)
    val rows2 = readAll(c, ShardOptions(false, false), allFields, batch2)
    assert(rows2.map(r => (r(0), r(1))).toSet == Set(("s0", "c"), ("s1", "d")),
      s"incremental batch must carry only the delta: $rows2")
  }

  test("contract: a committed range on a vanished shard fails the batch") {
    val c = new MockShardClient("contract-vanish")
    val s = stream(c)
    c.append("s0", rec("a", "1", 1L, "x"))
    val o = s.latestOffset()
    c.drop("s0") // transport listing loses the shard AFTER the offset exists
    val e = intercept[IllegalStateException] {
      s.planInputPartitions(s.initialOffset(), o)
    }
    assert(e.getMessage.contains("s0"), e.getMessage)
  }

  test("contract: KPL deaggregation happens in the reader, on any transport") {
    val c = new MockShardClient("contract-deagg")
    val envelope = Deaggregate.aggregate(Seq(
      Deaggregate.SubRecord("k1", "sub1".getBytes(StandardCharsets.UTF_8)),
      Deaggregate.SubRecord("k2", "sub2".getBytes(StandardCharsets.UTF_8))))
    c.append("s0",
      WireRecord("agg", "9", 5000L, envelope),
      rec("plain", "10", 6000L, "passthrough"))
    val parts = Array[org.apache.spark.sql.connector.read.InputPartition](
      ShardInputPartition("s0", 0L, Long.MaxValue))
    val rows = readAll(c, ShardOptions(deaggregate = true, permissive = false),
      allFields, parts)
    // envelope explodes 1→2 keeping its sequence number; plain passes
    // through with its OWN record key
    assert(rows.map(r => (r(1), r(2), r(4))) == Seq(
      ("k1", "9", "sub1"), ("k2", "9", "sub2"), ("plain", "10", "passthrough")),
      s"got $rows")
  }

  test("contract: pruning forwards the needData hint; corrupt records surface raw") {
    val c = new MockShardClient("contract-prune")
    c.append("s0", rec("a", "1", 1L, "payload"))
    val counted = readAll(c, ShardOptions(false, false),
      Array("shard_id"),
      Array(ShardInputPartition("s0", 0L, Long.MaxValue)))
    assert(counted == Seq(Seq("s0")))
    assert(MockShardStore.lastHints.get("contract-prune") ==
      ReadHints(needPk = false, needSeq = false, needTs = false, needData = false),
      "a shard_id-only read must tell the transport to skip ALL per-record decode")

    // a transport-corrupt record rides the permissive side channel: raw
    // bytes as data, everything else null — connector logic, not file logic
    val raw = "<<?bad-wire?>>".getBytes(StandardCharsets.UTF_8)
    c.append("s0", WireRecord(null, null, null, raw, corrupt = true))
    val rows = readAll(c, ShardOptions(deaggregate = false, permissive = true),
      allFields, Array(ShardInputPartition("s0", 0L, Long.MaxValue)))
    assert(rows.last == Seq("s0", null, null, null, "<<?bad-wire?>>"), s"got $rows")
  }

  // ---- KinesisShardClient over the KinesisApi seam: the dense-index ⇔
  //      sequence-number mapping an SDK transport must carry ----

  /** In-memory Kinesis data plane with opaque (but decodable) iterator
    * tokens, small pages to force pagination, and call accounting so the
    * contract can assert HOW the client anchors, not just what it reads.
    */
  final class FakeKinesisApi(pageSize: Int = 2) extends KinesisApi {
    val shards = scala.collection.mutable.LinkedHashMap[String, Vector[WireRecord]]()
    var iterCalls = Vector.empty[(String, String, Option[String])]
    var pageCalls = 0
    def append(shard: String, recs: WireRecord*): Unit =
      shards(shard) = shards.getOrElse(shard, Vector.empty) ++ recs
    override def listShards(name: String): Seq[String] = shards.keys.toSeq
    override def getShardIterator(name: String, shard: String, typ: String,
                                  seq: Option[String]): String = {
      iterCalls :+= ((shard, typ, seq))
      typ match {
        case "TRIM_HORIZON" => s"$shard#0"
        case "LATEST" => s"$shard#${shards(shard).size}"
        case "AT_SEQUENCE_NUMBER" | "AFTER_SEQUENCE_NUMBER" =>
          val idx = shards(shard).indexWhere(_.sequenceNumber == seq.get)
          require(idx >= 0, s"unknown sequence number $seq on $shard")
          s"$shard#${if (typ == "AFTER_SEQUENCE_NUMBER") idx + 1 else idx}"
      }
    }
    override def getRecords(iterator: String, limit: Int): RecordsPage = {
      pageCalls += 1
      val Array(shard, posStr) = iterator.split("#")
      val pos = posStr.toInt
      val all = shards(shard)
      val recs = all.slice(pos, math.min(pos + math.min(limit, pageSize), all.size))
      val next = pos + recs.size
      RecordsPage(recs, s"$shard#$next",
        millisBehindLatest = if (next >= all.size) 0L else 1000L)
    }
  }

  test("kinesis: end-to-end micro-batches over the sequence-number transport") {
    val api = new FakeKinesisApi(pageSize = 2)
    val c = new KinesisShardClient(api, "events-in", pageLimit = 100)
    val s = stream(c)
    api.append("shardId-000", rec("a", "sq1", 1000L, "r1"),
      rec("b", "sq2", 2000L, "r2"), rec("c", "sq3", 3000L, "r3"))
    val o1 = s.latestOffset()
    assert(o1.json() == """{"shardId-000":3}""", o1.json())
    val rows1 = readAll(c, ShardOptions(false, false), allFields,
      s.planInputPartitions(s.initialOffset(), o1))
    assert(rows1.map(_(1)) == Seq("a", "b", "c"))
    // delta batch: only the new record, resumed AFTER the anchored seq
    api.append("shardId-000", rec("d", "sq4", 4000L, "r4"))
    val before = api.iterCalls.length
    val o2 = s.latestOffset()
    val rows2 = readAll(c, ShardOptions(false, false), allFields,
      s.planInputPartitions(o1, o2))
    assert(rows2.map(_(1)) == Seq("d"), s"delta only: $rows2")
    val since = api.iterCalls.drop(before)
    assert(since.nonEmpty && since.forall(_._2 == "AFTER_SEQUENCE_NUMBER"),
      s"warm client must anchor, never rescan from TRIM_HORIZON: $since")
    assert(since.exists(_._3 == Some("sq3")), s"resume after sq3: $since")
  }

  test("kinesis: a cold client copy re-anchors from TRIM_HORIZON by skip-scan") {
    val api = new FakeKinesisApi(pageSize = 2)
    api.append("s0", rec("a", "sq1", 1L, "r1"), rec("b", "sq2", 2L, "r2"),
      rec("c", "sq3", 3L, "r3"), rec("d", "sq4", 4L, "r4"))
    // fresh client (an executor's deserialized copy): no anchors at all
    val cold = new KinesisShardClient(api, "events-in", pageLimit = 100)
    val rows = readAll(cold, ShardOptions(false, false), allFields,
      Array(ShardInputPartition("s0", 2L, 4L)))
    assert(rows.map(_(1)) == Seq("c", "d"), s"got $rows")
    assert(api.iterCalls.head._2 == "TRIM_HORIZON",
      s"cold start must begin at the horizon: ${api.iterCalls}")
    // position past the tip is an error, not silence
    val e = intercept[IllegalStateException] {
      cold.records("s0", 9L, ReadHints(true, true, true, true)).nextRecord()
    }
    assert(e.getMessage.contains("out of range"), e.getMessage)
  }

  test("kinesis: latestPosition pages only the suffix once warm") {
    val api = new FakeKinesisApi(pageSize = 2)
    val c = new KinesisShardClient(api, "events-in", pageLimit = 100)
    api.append("s0", rec("a", "sq1", 1L, "r1"), rec("b", "sq2", 2L, "r2"))
    assert(c.latestPosition("s0") == 2L)
    api.append("s0", rec("c", "sq3", 3L, "r3"))
    val before = api.iterCalls.length
    assert(c.latestPosition("s0") == 3L)
    val since = api.iterCalls.drop(before)
    assert(since.forall(_._2 == "AFTER_SEQUENCE_NUMBER"),
      s"warm tip-check must anchor on the last seen sequence number: $since")
    // empty shard: position 0, no crash
    api.shards("s1") = Vector.empty
    assert(c.latestPosition("s1") == 0L)
  }

  test("kinesis: SdkKinesisApi fails actionably when the SDK is absent") {
    // the sandbox has no AWS artifact — first USE (not construction) must
    // name the missing dependency; the class itself loads fine
    val api = new SdkKinesisApi(region = Some("ap-northeast-1"))
    val e = intercept[IllegalStateException](api.listShards("any"))
    assert(e.getMessage.contains("software.amazon.awssdk"), e.getMessage)
    assert(e.getCause.isInstanceOf[ClassNotFoundException])
  }
}
