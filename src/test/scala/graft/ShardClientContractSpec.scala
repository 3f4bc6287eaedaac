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
}
