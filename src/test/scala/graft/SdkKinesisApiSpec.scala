package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{KinesisShardClient, ReadHints, SdkKinesisApi}
import graft.fakesdk.services.kinesis.{FakeKinesisPlane, KinesisClient}

/** Drives the REFLECTION shim `SdkKinesisApi` end-to-end without the AWS
  * SDK: `sdkPackage` points at [[graft.fakesdk.services.kinesis]], whose
  * classes mirror the SDK's method shapes exactly (static `builder()`,
  * fluent setters, the Integer-typed `limit` overload, flat accessors,
  * `SdkBytes.asByteArray`), and whose data plane is parsed from JSON
  * fixtures in the three APIs' DOCUMENTED wire shapes (`Data` base64,
  * `ApproximateArrivalTimestamp` epoch seconds, `NextToken` pagination,
  * optional `MillisBehindLatest`). What the contract suite proves for
  * `KinesisShardClient` over a hand-built fake, this proves for the
  * shim's own flattening logic — request construction and response
  * walking included.
  */
class SdkKinesisApiSpec extends AnyFunSuite {

  private val FakePkg = "graft.fakesdk.services.kinesis"

  // ---- wire fixtures: the documented response shapes -----------------

  /** ListShards, page 1 of 2 (NextToken present ⇒ the shim must page). */
  private val listShardsPage1 =
    """{
      |  "Shards": [
      |    {
      |      "ShardId": "shardId-000000000000",
      |      "HashKeyRange": {"StartingHashKey": "0", "EndingHashKey": "170141183460469231731687303715884105727"},
      |      "SequenceNumberRange": {"StartingSequenceNumber": "49590338271490256608559692538361571095921575989136588898"}
      |    }
      |  ],
      |  "NextToken": "tok:1"
      |}""".stripMargin

  private val listShardsPage2 =
    """{
      |  "Shards": [
      |    {
      |      "ShardId": "shardId-000000000001",
      |      "HashKeyRange": {"StartingHashKey": "170141183460469231731687303715884105728", "EndingHashKey": "340282366920938463463374607431768211455"},
      |      "SequenceNumberRange": {"StartingSequenceNumber": "49590338271512557353758223161503106814194224420642570330"}
      |    }
      |  ]
      |}""".stripMargin

  /** GetRecords-shaped fixture holding shard 0's whole log: 5 records,
    * base64 `Data`, epoch-second arrival timestamps (one record without
    * the optional timestamp).
    */
  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private val shard0Records =
    s"""{
       |  "Records": [
       |    {"Data": "${b64("""{"user_id": 1}""")}", "PartitionKey": "pk-a",
       |     "SequenceNumber": "49590338271490256608559692538361571095921575989136588900",
       |     "ApproximateArrivalTimestamp": 1570887011.792},
       |    {"Data": "${b64("""{"user_id": 2}""")}", "PartitionKey": "pk-b",
       |     "SequenceNumber": "49590338271490256608559692538361571095921575989136588901",
       |     "ApproximateArrivalTimestamp": 1570887012.001},
       |    {"Data": "${b64("""{"user_id": 3}""")}", "PartitionKey": "pk-c",
       |     "SequenceNumber": "49590338271490256608559692538361571095921575989136588902"},
       |    {"Data": "${b64("""{"user_id": 4}""")}", "PartitionKey": "pk-d",
       |     "SequenceNumber": "49590338271490256608559692538361571095921575989136588903",
       |     "ApproximateArrivalTimestamp": 1570887013.5},
       |    {"Data": "${b64("""{"user_id": 5}""")}", "PartitionKey": "pk-e",
       |     "SequenceNumber": "49590338271490256608559692538361571095921575989136588904",
       |     "ApproximateArrivalTimestamp": 1570887014.25}
       |  ],
       |  "NextShardIterator": "unused-by-the-plane",
       |  "MillisBehindLatest": 0
       |}""".stripMargin

  private val shard1Records =
    s"""{
       |  "Records": [
       |    {"Data": "${b64("one")}", "PartitionKey": "k1",
       |     "SequenceNumber": "49590338271512557353758223161503106814194224420642570331",
       |     "ApproximateArrivalTimestamp": 1570887020.0},
       |    {"Data": "${b64("two")}", "PartitionKey": "k2",
       |     "SequenceNumber": "49590338271512557353758223161503106814194224420642570332",
       |     "ApproximateArrivalTimestamp": 1570887021.0}
       |  ],
       |  "MillisBehindLatest": 0
       |}""".stripMargin

  private def freshPlane(nullBehind: Boolean = false): FakeKinesisPlane =
    new FakeKinesisPlane(
      streamName = "wire-stream",
      listShardsPages = Seq(listShardsPage1, listShardsPage2),
      getRecordsFixtures = Map(
        "shardId-000000000000" -> shard0Records,
        "shardId-000000000001" -> shard1Records),
      closedShards = Set("shardId-000000000001"),
      pageCap = 2,
      nullBehindAtTip = nullBehind)

  private def withPlane[T](plane: FakeKinesisPlane)(body: SdkKinesisApi => T): T = {
    KinesisClient.plane = plane
    try body(new SdkKinesisApi(region = None, sdkPackage = FakePkg))
    finally KinesisClient.plane = null
  }

  test("listShards pages through NextToken and flattens shard ids") {
    val plane = freshPlane()
    withPlane(plane) { api =>
      assert(api.listShards("wire-stream") ==
        Seq("shardId-000000000000", "shardId-000000000001"))
    }
    // exactly two wire calls: first with StreamName, second with the token
    val ls = plane.calls.filter(_.startsWith("ListShards"))
    assert(ls == Seq(
      "ListShards(stream=wire-stream, token=null)",
      "ListShards(stream=null, token=tok:1)"))
  }

  test("getRecords flattens records: key, sequence, millis timestamp, bytes") {
    withPlane(freshPlane()) { api =>
      val it = api.getShardIterator("wire-stream", "shardId-000000000000",
        "TRIM_HORIZON", None)
      val page = api.getRecords(it, 10) // plane caps at 2 — SDK page shape
      assert(page.records.map(_.partitionKey) == Seq("pk-a", "pk-b"))
      assert(page.records.head.sequenceNumber ==
        "49590338271490256608559692538361571095921575989136588900")
      // epoch-seconds 1570887011.792 → epoch-millis
      assert(page.records.head.arrivalMillis == 1570887011792L)
      assert(new String(page.records.head.data, "UTF-8") == """{"user_id": 1}""")
      assert(page.millisBehindLatest == 1234L)
      // the record WITHOUT the optional timestamp flattens to null
      val p2 = api.getRecords(page.nextIterator, 10)
      assert(p2.records.map(_.partitionKey) == Seq("pk-c", "pk-d"))
      assert(p2.records.head.arrivalMillis == null)
    }
  }

  test("AT/AFTER_SEQUENCE_NUMBER anchor; absent MillisBehindLatest folds to 0") {
    withPlane(freshPlane(nullBehind = true)) { api =>
      val after = api.getShardIterator("wire-stream", "shardId-000000000000",
        "AFTER_SEQUENCE_NUMBER",
        Some("49590338271490256608559692538361571095921575989136588902"))
      val page = api.getRecords(after, 10)
      assert(page.records.map(_.partitionKey) == Seq("pk-d", "pk-e"))
      // tip page: fixture omits MillisBehindLatest → shim folds null to 0
      val tip = api.getRecords(page.nextIterator, 10)
      assert(tip.records.isEmpty && tip.millisBehindLatest == 0L)
    }
  }

  test("KinesisShardClient over the shim: e2e read, warm anchors, closed shard") {
    val plane = freshPlane()
    withPlane(plane) { api =>
      val client = new KinesisShardClient(api, "wire-stream", pageLimit = 1000)
      assert(client.listShards() ==
        Seq("shardId-000000000000", "shardId-000000000001"))
      assert(client.latestPosition("shardId-000000000000") == 5L)
      // closed shard: null next iterator at the end must terminate the count
      assert(client.latestPosition("shardId-000000000001") == 2L)
      // full read off the dense index
      val it = client.records("shardId-000000000000", 0L, ReadHints(true, true, true, true))
      val got = Iterator.continually(it.nextRecord()).takeWhile(_ != null).toSeq
      assert(got.map(_.partitionKey) ==
        Seq("pk-a", "pk-b", "pk-c", "pk-d", "pk-e"))
      // WARM resume from position 3: the anchor cache must issue
      // AFTER_SEQUENCE_NUMBER(seq of record 2), never TRIM_HORIZON again
      plane.calls.clear()
      val it2 = client.records("shardId-000000000000", 3L, ReadHints(true, true, true, true))
      val tail = Iterator.continually(it2.nextRecord()).takeWhile(_ != null).toSeq
      assert(tail.map(_.partitionKey) == Seq("pk-d", "pk-e"))
      val anchored = plane.calls.filter(_.startsWith("GetShardIterator"))
      assert(anchored.nonEmpty && anchored.forall(_.contains(
        "type=AFTER_SEQUENCE_NUMBER, " +
          "seq=49590338271490256608559692538361571095921575989136588902")),
        s"warm resume must anchor, got: $anchored")
      // closed shard reads to the end and terminates on the null iterator
      val it3 = client.records("shardId-000000000001", 0L, ReadHints(true, true, true, true))
      val closed = Iterator.continually(it3.nextRecord()).takeWhile(_ != null).toSeq
      assert(closed.map(r => new String(r.data, "UTF-8")) == Seq("one", "two"))
    }
  }

  test("cold client re-anchors by skip-scan from TRIM_HORIZON") {
    val plane = freshPlane()
    withPlane(plane) { api =>
      // fresh client = a cold executor copy: no anchors, read from 3
      val cold = new KinesisShardClient(api, "wire-stream", pageLimit = 1000)
      val it = cold.records("shardId-000000000000", 3L, ReadHints(true, true, true, true))
      val got = Iterator.continually(it.nextRecord()).takeWhile(_ != null).toSeq
      assert(got.map(_.partitionKey) == Seq("pk-d", "pk-e"))
      val types = plane.calls.filter(_.startsWith("GetShardIterator"))
      assert(types.head.contains("type=TRIM_HORIZON"),
        s"cold read must start its skip-scan at TRIM_HORIZON: $types")
      assert(types.last.contains("type=AFTER_SEQUENCE_NUMBER"),
        s"skip-scan must re-position via the recovered anchor: $types")
    }
  }

  test("out-of-range position on a closed shard fails loudly") {
    withPlane(freshPlane()) { api =>
      val client = new KinesisShardClient(api, "wire-stream")
      val e = intercept[IllegalStateException](
        client.records("shardId-000000000001", 7L, ReadHints(true, true, true, true)).nextRecord())
      assert(e.getMessage.contains("out of range"))
    }
  }
}
