package graft.fakesdk.services

/** A duck-typed stand-in for the AWS SDK v2 Kinesis surface that
  * `SdkKinesisApi` touches reflectively — same class names under a
  * different package root, same METHOD SHAPES (static `builder()`
  * forwarders, fluent setters returning the builder, `build()`, flat
  * response accessors, `SdkBytes.asByteArray`), so pointing the shim's
  * `sdkPackage` here exercises every reflective code path (request
  * construction, the Integer-typed `limit` setter overload, pagination
  * via `nextToken`, record flattening, null `millisBehindLatest`)
  * without the SDK on the classpath.
  *
  * The data plane behind the fake client is LOADED FROM JSON FIXTURES in
  * the documented wire shapes of the three APIs (`ListShards`,
  * `GetShardIterator`, `GetRecords` — field names and types exactly as
  * the public API reference renders them, `Data` base64,
  * `ApproximateArrivalTimestamp` as epoch seconds), in
  * [[kinesis.FakeKinesisPlane]].
  */
package object kinesis

package kinesis {

  object KinesisClient {
    /** Injected by the spec BEFORE the shim builds its client (the real
      * SDK reads the default config chain here; the fake reads this).
      */
    @volatile var plane: FakeKinesisPlane = null
    def builder(): KinesisClientBuilder = new KinesisClientBuilder
  }

  final class KinesisClient(val plane: FakeKinesisPlane) {
    def listShards(req: model.ListShardsRequest): model.ListShardsResponse =
      plane.listShards(req)
    def getShardIterator(
        req: model.GetShardIteratorRequest): model.GetShardIteratorResponse =
      plane.getShardIterator(req)
    def getRecords(req: model.GetRecordsRequest): model.GetRecordsResponse =
      plane.getRecords(req)
  }

  final class KinesisClientBuilder {
    def build(): KinesisClient = {
      require(KinesisClient.plane != null, "fake plane not injected")
      new KinesisClient(KinesisClient.plane)
    }
  }

  /** In-memory Kinesis data plane parsed from documented-shape JSON
    * fixtures. Iterators are `"it:<shard>:<index>"`. `pageCap` bounds a
    * single GetRecords page below the requested limit to force
    * pagination. Every API call is logged for anchoring assertions.
    */
  final class FakeKinesisPlane(val streamName: String,
                               listShardsPages: Seq[String],
                               getRecordsFixtures: Map[String, String],
                               closedShards: Set[String] = Set.empty,
                               pageCap: Int = 2,
                               nullBehindAtTip: Boolean = false) {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    private val mapper = new ObjectMapper()

    val calls = new scala.collection.mutable.ArrayBuffer[String]

    // parse the ListShards pages once: Seq of (shard ids, nextToken)
    private val listPages: Seq[(Seq[String], String)] =
      listShardsPages.map { doc =>
        val n = mapper.readTree(doc)
        val ids = Seq.newBuilder[String]
        n.get("Shards").forEach(s => ids += s.get("ShardId").asText())
        (ids.result(),
          if (n.hasNonNull("NextToken")) n.get("NextToken").asText() else null)
      }

    // parse each shard's GetRecords-shaped fixture into decoded records
    final case class PlaneRecord(partitionKey: String, sequenceNumber: String,
                                 arrival: java.time.Instant, data: Array[Byte])
    private val recordsOf: Map[String, IndexedSeq[PlaneRecord]] =
      getRecordsFixtures.map { case (shard, doc) =>
        val n = mapper.readTree(doc)
        val out = IndexedSeq.newBuilder[PlaneRecord]
        n.get("Records").forEach { r =>
          val ts: java.time.Instant =
            if (r.hasNonNull("ApproximateArrivalTimestamp")) {
              val sec = r.get("ApproximateArrivalTimestamp").asDouble()
              java.time.Instant.ofEpochMilli(math.round(sec * 1000d))
            } else null
          out += PlaneRecord(
            r.get("PartitionKey").asText(),
            r.get("SequenceNumber").asText(),
            ts,
            java.util.Base64.getDecoder.decode(r.get("Data").asText()))
        }
        shard -> out.result()
      }

    def listShards(req: model.ListShardsRequest): model.ListShardsResponse = {
      calls += s"ListShards(stream=${req.streamName}, token=${req.nextToken})"
      // the real API forbids StreamName together with NextToken
      require((req.streamName == null) != (req.nextToken == null),
        "exactly one of StreamName/NextToken")
      val idx =
        if (req.nextToken == null) 0
        else { require(req.nextToken.startsWith("tok:")); req.nextToken.drop(4).toInt }
      val (ids, _) = listPages(idx)
      val next = if (idx + 1 < listPages.size) s"tok:${idx + 1}" else null
      val jl = new java.util.ArrayList[AnyRef]()
      ids.foreach(id => jl.add(new model.Shard(id)))
      new model.ListShardsResponse(jl, next)
    }

    def getShardIterator(
        req: model.GetShardIteratorRequest): model.GetShardIteratorResponse = {
      calls += s"GetShardIterator(shard=${req.shardId}, " +
        s"type=${req.shardIteratorType}, seq=${req.startingSequenceNumber})"
      require(req.streamName == streamName, s"unknown stream ${req.streamName}")
      val recs = recordsOf.getOrElse(req.shardId,
        throw new IllegalArgumentException(s"unknown shard ${req.shardId}"))
      val idx = req.shardIteratorType match {
        case "TRIM_HORIZON" => 0
        case "LATEST" => recs.size
        case "AT_SEQUENCE_NUMBER" =>
          val i = recs.indexWhere(_.sequenceNumber == req.startingSequenceNumber)
          require(i >= 0, s"unknown sequence ${req.startingSequenceNumber}")
          i
        case "AFTER_SEQUENCE_NUMBER" =>
          val i = recs.indexWhere(_.sequenceNumber == req.startingSequenceNumber)
          require(i >= 0, s"unknown sequence ${req.startingSequenceNumber}")
          i + 1
        case t => throw new IllegalArgumentException(s"iterator type $t")
      }
      new model.GetShardIteratorResponse(s"it:${req.shardId}:$idx")
    }

    def getRecords(req: model.GetRecordsRequest): model.GetRecordsResponse = {
      require(req.limit == null || req.limit.intValue() > 0)
      calls += s"GetRecords(${req.shardIterator}, limit=${req.limit})"
      val Array(_, shard, idxS) = req.shardIterator.split(":")
      val idx = idxS.toInt
      val recs = recordsOf(shard)
      val lim = math.min(pageCap,
        if (req.limit == null) pageCap else req.limit.intValue())
      val page = recs.slice(idx, math.min(recs.size, idx + lim))
      val end = idx + page.size
      val closedOut = closedShards.contains(shard) && end >= recs.size
      val jl = new java.util.ArrayList[AnyRef]()
      page.foreach(r => jl.add(new model.Record(r.partitionKey,
        r.sequenceNumber, r.arrival, new model.SdkBytes(r.data))))
      new model.GetRecordsResponse(jl,
        if (closedOut) null else s"it:$shard:$end",
        // at the tip the API reports 0 — or, under nullBehindAtTip, an
        // ABSENT field (it is optional on the wire), exercising the
        // shim's null→0 fold; mid-stream some positive lag
        if (end >= recs.size) {
          if (nullBehindAtTip) null else java.lang.Long.valueOf(0L)
        } else java.lang.Long.valueOf(1234L))
    }
  }

  package model {

    final class Shard(val shardId: String)

    final class ListShardsRequest(val streamName: String, val nextToken: String)
    object ListShardsRequest {
      def builder(): ListShardsRequestBuilder = new ListShardsRequestBuilder
    }
    final class ListShardsRequestBuilder {
      private var sn: String = null
      private var nt: String = null
      def streamName(v: String): ListShardsRequestBuilder = { sn = v; this }
      def nextToken(v: String): ListShardsRequestBuilder = { nt = v; this }
      def build(): ListShardsRequest = new ListShardsRequest(sn, nt)
    }
    final class ListShardsResponse(val shards: java.util.List[AnyRef],
                                   val nextToken: String)

    final class GetShardIteratorRequest(val streamName: String,
                                        val shardId: String,
                                        val shardIteratorType: String,
                                        val startingSequenceNumber: String)
    object GetShardIteratorRequest {
      def builder(): GetShardIteratorRequestBuilder = new GetShardIteratorRequestBuilder
    }
    final class GetShardIteratorRequestBuilder {
      private var sn: String = null
      private var sh: String = null
      private var ty: String = null
      private var seq: String = null
      def streamName(v: String): GetShardIteratorRequestBuilder = { sn = v; this }
      def shardId(v: String): GetShardIteratorRequestBuilder = { sh = v; this }
      def shardIteratorType(v: String): GetShardIteratorRequestBuilder = { ty = v; this }
      def startingSequenceNumber(v: String): GetShardIteratorRequestBuilder = { seq = v; this }
      def build(): GetShardIteratorRequest =
        new GetShardIteratorRequest(sn, sh, ty, seq)
    }
    final class GetShardIteratorResponse(val shardIterator: String)

    final class GetRecordsRequest(val shardIterator: String,
                                  val limit: java.lang.Integer)
    object GetRecordsRequest {
      def builder(): GetRecordsRequestBuilder = new GetRecordsRequestBuilder
    }
    final class GetRecordsRequestBuilder {
      private var it: String = null
      private var lim: java.lang.Integer = null
      def shardIterator(v: String): GetRecordsRequestBuilder = { it = v; this }
      def limit(v: java.lang.Integer): GetRecordsRequestBuilder = { lim = v; this }
      def build(): GetRecordsRequest = new GetRecordsRequest(it, lim)
    }

    final class SdkBytes(val bytes: Array[Byte]) {
      def asByteArray(): Array[Byte] = bytes
    }
    final class Record(val partitionKey: String, val sequenceNumber: String,
                       val approximateArrivalTimestamp: java.time.Instant,
                       val data: SdkBytes)
    final class GetRecordsResponse(val records: java.util.List[AnyRef],
                                   val nextShardIterator: String,
                                   val millisBehindLatest: java.lang.Long)
  }
}
