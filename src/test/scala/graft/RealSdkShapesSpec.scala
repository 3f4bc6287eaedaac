package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.SdkHandles

/** Runs the SDK shim's reflective request-construction and
  * response-walking sequences against the GENUINE
  * `software.amazon.awssdk.services.kinesis` classes — the one gap the
  * fake-package seam (`SdkKinesisApiSpec`) cannot close: a method-shape
  * drift in the real SDK (builder renames, return-type changes) would
  * otherwise surface only at first production use (`run.go:17-131` is the
  * behavior being claimed).
  *
  * NO NETWORK and no client construction: requests are built and read
  * back via the shim's own `SdkHandles` helpers; responses are CANNED
  * model objects built with the real builders and walked with the exact
  * accessor sequence `SdkKinesisApi.getRecords` uses. The suite
  * SELF-SKIPS (assume) when the SDK artifact is absent — which it is in
  * this zero-egress container (no `software.amazon.awssdk:*` in the
  * offline coursier cache or /opt/spark/jars, checked round 10). Drop the
  * jars into `lib/aws-sdk/` (or point `GRAFT_AWS_SDK_JARS` at a dir) and
  * the build.sbt hook puts them on the test classpath, turning every
  * assertion here live.
  */
class RealSdkShapesSpec extends AnyFunSuite {

  private val Pkg = "software.amazon.awssdk.services.kinesis"

  private def cls(name: String): Option[Class[_]] =
    try Some(Class.forName(name)) catch { case _: Throwable => None }

  private val sdkPresent = cls(s"$Pkg.model.ListShardsRequest").isDefined

  // A handles instance WITHOUT a client (client construction needs a
  // region/credentials chain — not shape validation): the request classes
  // are all these tests need, and invoke() dispatches on the target's own
  // class, never on `client`.
  private lazy val h: SdkHandles = SdkHandles(
    client = null,
    listShardsReq = Class.forName(s"$Pkg.model.ListShardsRequest"),
    getShardIteratorReq = Class.forName(s"$Pkg.model.GetShardIteratorRequest"),
    getRecordsReq = Class.forName(s"$Pkg.model.GetRecordsRequest"))

  test("ListShardsRequest: builder/streamName/nextToken shapes hold") {
    assume(sdkPresent, "AWS SDK kinesis artifact not on the test classpath")
    val byName = h.build(h.listShardsReq, "streamName" -> "wire-stream")
    assert(h.invoke(byName, "streamName") == "wire-stream")
    assert(h.invoke(byName, "nextToken") == null)
    val byToken = h.build(h.listShardsReq, "nextToken" -> "tok:1")
    assert(h.invoke(byToken, "nextToken") == "tok:1")
    assert(h.invoke(byToken, "streamName") == null)
  }

  test("GetShardIteratorRequest: the String shardIteratorType overload holds") {
    assume(sdkPresent, "AWS SDK kinesis artifact not on the test classpath")
    val req = h.build(h.getShardIteratorReq,
      "streamName" -> "wire-stream", "shardId" -> "shardId-000000000000",
      "shardIteratorType" -> "AFTER_SEQUENCE_NUMBER",
      "startingSequenceNumber" -> "495903")
    // the enum accessor must round-trip the string form
    assert(String.valueOf(h.invoke(req, "shardIteratorType")) ==
      "AFTER_SEQUENCE_NUMBER")
    assert(h.invoke(req, "startingSequenceNumber") == "495903")
  }

  test("GetRecordsRequest: Integer limit overload holds") {
    assume(sdkPresent, "AWS SDK kinesis artifact not on the test classpath")
    val b = h.newBuilder(h.getRecordsReq)
    h.set(b, "shardIterator", "iter-0")
    h.setInt(b, "limit", 17)
    val req = h.invoke(b, "build")
    assert(h.invoke(req, "shardIterator") == "iter-0")
    assert(h.invoke(req, "limit") == java.lang.Integer.valueOf(17))
  }

  test("GetRecordsResponse walk: records/partitionKey/sequenceNumber/" +
      "approximateArrivalTimestamp(Instant)/data.asByteArray/millisBehindLatest") {
    assume(sdkPresent, "AWS SDK kinesis artifact not on the test classpath")
    // canned response via the REAL builders — the exact accessor sequence
    // SdkKinesisApi.getRecords walks
    val sdkBytes = Class.forName("software.amazon.awssdk.core.SdkBytes")
    val data = sdkBytes.getMethod("fromUtf8String", classOf[String])
      .invoke(null, """{"user_id": 1}""")
    val recCls = Class.forName(s"$Pkg.model.Record")
    var rb = h.newBuilder(recCls)
    rb = h.invoke(rb, "partitionKey", "pk-a")
    rb = h.invoke(rb, "sequenceNumber", "49590338")
    rb = h.invoke(rb, "approximateArrivalTimestamp",
      java.time.Instant.ofEpochMilli(1570887011792L))
    rb = h.invoke(rb, "data", data)
    val rec = h.invoke(rb, "build")
    val respCls = Class.forName(s"$Pkg.model.GetRecordsResponse")
    var gb = h.newBuilder(respCls)
    val list = new java.util.ArrayList[AnyRef](); list.add(rec)
    gb = h.invoke(gb, "records", list)
    gb = h.invoke(gb, "nextShardIterator", "iter-1")
    gb = h.invoke(gb, "millisBehindLatest", java.lang.Long.valueOf(1234L))
    val resp = h.invoke(gb, "build")

    val recs = h.invoke(resp, "records").asInstanceOf[java.util.List[AnyRef]]
    assert(recs.size == 1)
    val r = recs.get(0)
    assert(h.invoke(r, "partitionKey") == "pk-a")
    assert(h.invoke(r, "sequenceNumber") == "49590338")
    val ts = h.invoke(r, "approximateArrivalTimestamp")
      .asInstanceOf[java.time.Instant]
    assert(ts.toEpochMilli == 1570887011792L)
    val bytes = h.invoke(h.invoke(r, "data"), "asByteArray")
      .asInstanceOf[Array[Byte]]
    assert(new String(bytes, "UTF-8") == """{"user_id": 1}""")
    assert(h.invoke(resp, "millisBehindLatest") == java.lang.Long.valueOf(1234L))
    assert(h.invoke(resp, "nextShardIterator") == "iter-1")
  }
}
