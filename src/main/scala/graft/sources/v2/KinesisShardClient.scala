package graft.sources.v2

import scala.collection.mutable.ArrayBuffer

/** The minimal Kinesis data-plane surface the connector's poll shape
  * needs — exactly the three calls of the reference's loop
  * (`/root/reference/run.go:70-131`: `ListShards`, `GetShardIterator`,
  * `GetRecords`), with the SDK's types flattened to wire values so the
  * real SDK shim ([[SdkKinesisApi]]) and test fakes are interchangeable.
  *
  * Implementations must be Serializable and hold only config — they ride
  * to executors inside [[KinesisShardClient]]; live connections open
  * lazily per call site (`@transient lazy`).
  */
trait KinesisApi extends Serializable {
  /** `ListShards`, paginated to completion: all currently open shard ids. */
  def listShards(streamName: String): Seq[String]

  /** `GetShardIterator`. `iteratorType` ∈ TRIM_HORIZON | LATEST |
    * AT_SEQUENCE_NUMBER | AFTER_SEQUENCE_NUMBER (the reference uses
    * LATEST, `run.go:74`; the connector's replayable batches anchor on
    * sequence numbers instead).
    */
  def getShardIterator(streamName: String, shardId: String,
                       iteratorType: String,
                       startingSequenceNumber: Option[String]): String

  /** One `GetRecords` page. */
  def getRecords(iterator: String, limit: Int): RecordsPage
}

/** One `GetRecords` response: decoded records, the continuation iterator
  * (null when the shard is CLOSED and fully consumed), and
  * `MillisBehindLatest` (0 ⇒ caught up to the tip).
  */
final case class RecordsPage(records: Seq[WireRecord], nextIterator: String,
                             millisBehindLatest: Long)

/** [[ShardReaderClient]] over the real Kinesis data plane — the SDK-backed
  * twin of [[FileShardClient]], carrying the dense-index ⇔ sequence-number
  * mapping the connector contract requires (`ShardReaderClient`'s
  * positions are monotone per-shard record indices; Kinesis speaks opaque
  * iterators and sequence numbers).
  *
  * Index anchoring: per shard, this instance caches the sequence number of
  * every record index it has observed (`seqs(i)` = sequence number of
  * record `i`). `records(from)` then resumes with
  * `AFTER_SEQUENCE_NUMBER(seqs(from-1))` — never re-reading the prefix —
  * and a COLD copy (a fresh executor deserialization) transparently
  * re-anchors by paging from TRIM_HORIZON, counting records it skips. The
  * cache is `@transient`: it is a performance anchor, not state the
  * connector depends on — offsets live in Spark's commit log.
  *
  * `latestPosition` pages from the last anchor to the tip
  * (`MillisBehindLatest == 0`), counting — the dense-index analog of
  * `GetShardIterator(LATEST)`'s distance from TRIM_HORIZON. At production
  * scale the driver calls this once per micro-batch per shard and pages
  * only the SINCE-LAST-BATCH suffix (anchored), so planning cost tracks
  * arrival rate, not retention depth; only a cold driver pays one full
  * scan, the same cost the first batch's read pays anyway.
  *
  * [[ReadHints]] are accepted and ignored: the SDK hands back structured
  * records — there is no per-field decode cost to skip (the hints exist
  * for the file transport's JSON+base64 parsing), and a real transport
  * never produces `corrupt` records.
  */
final class KinesisShardClient(api: KinesisApi, streamName: String,
                               pageLimit: Int = 1000)
    extends ShardReaderClient {
  require(pageLimit > 0 && pageLimit <= 10000,
    s"pageLimit must be in (0, 10000], got $pageLimit") // GetRecords cap

  // per-shard sequence-number-by-index anchors; @transient so executor
  // copies start cold and re-anchor on demand
  @transient private lazy val anchors =
    new scala.collection.concurrent.TrieMap[String, ArrayBuffer[String]]

  private def seqsOf(shardId: String): ArrayBuffer[String] =
    anchors.getOrElseUpdate(shardId, new ArrayBuffer[String])

  override def listShards(): Seq[String] =
    api.listShards(streamName).sorted

  override def latestPosition(shardId: String): Long = {
    val seqs = seqsOf(shardId)
    seqs.synchronized {
      var iter = iteratorAt(shardId, seqs.size, seqs)
      var caughtUp = iter == null
      while (!caughtUp) {
        val page = api.getRecords(iter, pageLimit)
        page.records.foreach(r => seqs += r.sequenceNumber)
        iter = page.nextIterator
        caughtUp = iter == null ||
          (page.records.isEmpty && page.millisBehindLatest == 0L)
      }
      seqs.size.toLong
    }
  }

  override def records(shardId: String, from: Long,
                       hints: ReadHints): RecordIterator = {
    val seqs = seqsOf(shardId)
    val startIter = seqs.synchronized { iteratorAt(shardId, from, seqs) }
    new RecordIterator {
      private var iter = startIter
      private var page: Iterator[WireRecord] = Iterator.empty
      private var index = from
      override def nextRecord(): WireRecord = {
        while (!page.hasNext) {
          if (iter == null) return null // closed shard, fully consumed
          val p = api.getRecords(iter, pageLimit)
          iter = p.nextIterator
          if (p.records.isEmpty && p.millisBehindLatest == 0L)
            return null // caught up to the CURRENT tip (shard still open)
          page = p.records.iterator
        }
        val r = page.next()
        seqs.synchronized {
          if (seqs.size == index) seqs += r.sequenceNumber
        }
        index += 1
        r
      }
      override def close(): Unit = ()
    }
  }

  /** An iterator positioned AT dense index `target`: AFTER the anchored
    * sequence number of `target - 1` when warm, TRIM_HORIZON (+ skip-scan
    * that refills the anchors) when cold. Returns null only when a closed
    * shard ends before `target`. Caller holds `seqs`' lock.
    */
  private def iteratorAt(shardId: String, target: Long,
                         seqs: ArrayBuffer[String]): String = {
    if (target == 0)
      return api.getShardIterator(streamName, shardId, "TRIM_HORIZON", None)
    if (seqs.size >= target)
      return api.getShardIterator(streamName, shardId,
        "AFTER_SEQUENCE_NUMBER", Some(seqs((target - 1).toInt)))
    // cold cache: anchor-scan forward from the best position we do have
    var iter =
      if (seqs.isEmpty)
        api.getShardIterator(streamName, shardId, "TRIM_HORIZON", None)
      else api.getShardIterator(streamName, shardId,
        "AFTER_SEQUENCE_NUMBER", Some(seqs.last))
    while (seqs.size < target) {
      if (iter == null)
        throw new IllegalStateException(
          s"graft-shards: shard $shardId of $streamName closed at " +
            s"${seqs.size} records; position $target is out of range")
      val page = api.getRecords(iter, pageLimit)
      if (page.records.isEmpty && page.millisBehindLatest == 0L)
        throw new IllegalStateException(
          s"graft-shards: shard $shardId of $streamName has only " +
            s"${seqs.size} records at the tip; position $target is out of range")
      page.records.foreach { r =>
        if (seqs.size < target) seqs += r.sequenceNumber
      }
      // overshoot within a page is fine: we re-position via the anchor
      iter = page.nextIterator
    }
    api.getShardIterator(streamName, shardId,
      "AFTER_SEQUENCE_NUMBER", Some(seqs((target - 1).toInt)))
  }
}

/** Reflection-backed [[KinesisApi]] over the AWS SDK v2
  * (`software.amazon.awssdk.services.kinesis.KinesisClient`) — the
  * concrete client of the reference's loop (`run.go:36-44` builds it from
  * the default config chain). Reflection, not imports: the SDK is not a
  * build dependency (and is absent in this sandbox), so this class
  * compiles and loads everywhere and fails with an actionable message at
  * FIRST USE when the SDK jars are missing. Behavior inherited from the
  * contract suite is all in [[KinesisShardClient]]; this shim only maps
  * the three calls onto SDK request/response objects.
  *
  * Serializable by the same rule as every transport: holds only the
  * region string; the client object is `@transient lazy`, built
  * per-JVM from the default credentials/region provider chain exactly
  * like the reference.
  */
final class SdkKinesisApi(region: Option[String] = None,
                          sdkPackage: String = SdkHandles.DefaultPkg)
    extends KinesisApi {

  @transient private lazy val sdk: SdkHandles =
    try SdkHandles(region, sdkPackage)
    catch {
      case e: ClassNotFoundException =>
        throw new IllegalStateException(
          "graft-shards: KinesisShardClient(SdkKinesisApi) needs the AWS " +
            "SDK v2 kinesis artifact on the classpath " +
            "(software.amazon.awssdk:kinesis); it is not a build " +
            "dependency of this library", e)
    }

  override def listShards(streamName: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var token: String = null
    var first = true
    while (first || token != null) {
      first = false
      // the API forbids streamName together with nextToken
      val req =
        if (token == null) sdk.build(sdk.listShardsReq, "streamName" -> streamName)
        else sdk.build(sdk.listShardsReq, "nextToken" -> token)
      val resp = sdk.invoke(sdk.client, "listShards", req)
      val shards = sdk.invoke(resp, "shards")
        .asInstanceOf[java.util.List[AnyRef]]
      shards.forEach(s => out += sdk.invoke(s, "shardId").asInstanceOf[String])
      token = sdk.invoke(resp, "nextToken").asInstanceOf[String]
    }
    out.result()
  }

  override def getShardIterator(streamName: String, shardId: String,
                                iteratorType: String,
                                startingSequenceNumber: Option[String]): String = {
    val args = Seq("streamName" -> streamName, "shardId" -> shardId,
      "shardIteratorType" -> iteratorType) ++
      startingSequenceNumber.map("startingSequenceNumber" -> _)
    val resp = sdk.invoke(sdk.client, "getShardIterator",
      sdk.build(sdk.getShardIteratorReq, args: _*))
    sdk.invoke(resp, "shardIterator").asInstanceOf[String]
  }

  override def getRecords(iterator: String, limit: Int): RecordsPage = {
    val b = sdk.newBuilder(sdk.getRecordsReq)
    sdk.set(b, "shardIterator", iterator)
    sdk.setInt(b, "limit", limit)
    val resp = sdk.invoke(sdk.client, "getRecords", sdk.invoke(b, "build"))
    val recs = sdk.invoke(resp, "records").asInstanceOf[java.util.List[AnyRef]]
    val out = Seq.newBuilder[WireRecord]
    recs.forEach { r =>
      val ts = sdk.invoke(r, "approximateArrivalTimestamp")
        .asInstanceOf[java.time.Instant]
      val data = sdk.invoke(sdk.invoke(r, "data"), "asByteArray")
        .asInstanceOf[Array[Byte]]
      out += WireRecord(
        sdk.invoke(r, "partitionKey").asInstanceOf[String],
        sdk.invoke(r, "sequenceNumber").asInstanceOf[String],
        if (ts == null) null else java.lang.Long.valueOf(ts.toEpochMilli),
        data)
    }
    val behind = sdk.invoke(resp, "millisBehindLatest").asInstanceOf[java.lang.Long]
    RecordsPage(out.result(),
      sdk.invoke(resp, "nextShardIterator").asInstanceOf[String],
      if (behind == null) 0L else behind.longValue())
  }
}

/** Resolved reflective handles to the SDK classes — built once per JVM by
  * [[SdkKinesisApi]]. Separate object so a missing SDK surfaces as ONE
  * `ClassNotFoundException` at a known point.
  */
private[graft] final case class SdkHandles(client: AnyRef, listShardsReq: Class[_],
                                    getShardIteratorReq: Class[_],
                                    getRecordsReq: Class[_]) {
  def invoke(target: AnyRef, method: String, args: AnyRef*): AnyRef = {
    val m = target.getClass.getMethods.find(m =>
      m.getName == method && m.getParameterCount == args.length).getOrElse(
      throw new NoSuchMethodException(s"${target.getClass.getName}.$method/${args.length}"))
    m.setAccessible(true) // impl classes are package-private behind interfaces
    m.invoke(target, args: _*)
  }
  def newBuilder(reqClass: Class[_]): AnyRef =
    reqClass.getMethod("builder").invoke(null)
  def set(builder: AnyRef, prop: String, v: String): AnyRef =
    invoke(builder, prop, v)
  def setInt(builder: AnyRef, prop: String, v: Int): AnyRef = {
    val m = builder.getClass.getMethods.find(m =>
      m.getName == prop && m.getParameterCount == 1 &&
        m.getParameterTypes()(0) == classOf[java.lang.Integer]).get
    m.setAccessible(true)
    m.invoke(builder, java.lang.Integer.valueOf(v))
  }
  /** builder() → fluent String setters (shardIteratorType accepts the
    * enum's String via its overload) → build().
    */
  def build(reqClass: Class[_], props: (String, String)*): AnyRef = {
    var b = newBuilder(reqClass)
    props.foreach { case (k, v) => b = set(b, k, v) }
    invoke(b, "build")
  }
}

private[graft] object SdkHandles {
  /** The real SDK v2 package. Tests inject a fake package whose classes
    * mirror the SDK's METHOD SHAPES (static `builder()`, fluent setters,
    * flat accessors), so every reflective path below runs without the SDK
    * on the classpath — the wire-fixture seam `SdkKinesisApiSpec` drives.
    */
  val DefaultPkg = "software.amazon.awssdk.services.kinesis"

  def apply(region: Option[String],
            pkg: String = DefaultPkg): SdkHandles = {
    val Pkg = pkg
    val clientClass = Class.forName(s"$Pkg.KinesisClient")
    var builder = clientClass.getMethod("builder").invoke(null)
    region.foreach { r =>
      val regionClass = Class.forName("software.amazon.awssdk.regions.Region")
      val rObj = regionClass.getMethod("of", classOf[String]).invoke(null, r)
      val m = builder.getClass.getMethods.find(m =>
        m.getName == "region" && m.getParameterCount == 1).get
      m.setAccessible(true)
      builder = m.invoke(builder, rObj)
    }
    val mb = builder.getClass.getMethod("build")
    mb.setAccessible(true)
    SdkHandles(
      mb.invoke(builder),
      Class.forName(s"$Pkg.model.ListShardsRequest"),
      Class.forName(s"$Pkg.model.GetShardIteratorRequest"),
      Class.forName(s"$Pkg.model.GetRecordsRequest"))
  }
}
