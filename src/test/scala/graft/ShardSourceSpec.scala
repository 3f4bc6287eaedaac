package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.Base64

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Deaggregate

/** The `graft-shards` DataSource V2 connector (`sources/v2/ShardSource
  * .scala`) against on-disk shard logs: shard-per-partition parallelism,
  * Kinesis wire fields, in-reader KPL deaggregation, column pruning.
  */
class ShardSourceSpec extends SparkTestBase {

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)

  private def rec(pk: String, seq: String, ts: Long, dataB64: String): String =
    s"""{"partitionKey":"$pk","sequenceNumber":"$seq",""" +
      s""""approximateArrivalTimestamp":$ts,"data":"$dataB64"}"""

  private def writeShards(dir: Path): Unit = {
    Files.write(dir.resolve("shard-000.jsonl"), java.util.List.of(
      rec("u1", "49590", 1700000000000L, b64("""{"user_id":1}""")),
      rec("u2", "49591", 1700000001000L, b64("""{"user_id":2}"""))))
    val envelope = Deaggregate.aggregate(Seq(
      Deaggregate.SubRecord("k1", """{"user_id":3}""".getBytes(StandardCharsets.UTF_8)),
      Deaggregate.SubRecord("k2", """{"user_id":4}""".getBytes(StandardCharsets.UTF_8))))
    Files.write(dir.resolve("shard-001.jsonl"), java.util.List.of(
      rec("agg", "49600", 1700000002000L, b64(envelope))))
  }

  private def read(dir: Path, deagg: Boolean = false): DataFrame = {
    val r = spark.read.format("graft-shards")
    (if (deagg) r.option("deaggregate", "true") else r).load(dir.toString)
  }

  test("one input partition per shard log; Kinesis wire fields round-trip") {
    val dir = Files.createTempDirectory("shards")
    try {
      writeShards(dir)
      val df = read(dir)
      assert(df.rdd.getNumPartitions == 2, "partition per shard")
      assert(df.count() == 3)
      val r = df.where(col("partition_key") === "u2")
        .select(col("shard_id"), col("sequence_number"),
          unix_millis(col("arrival_ts")), col("data").cast("string"))
        .head()
      assert(r.getString(0) == "shard-000" && r.getString(1) == "49591")
      assert(r.getLong(2) == 1700000001000L)
      assert(r.getString(3) == """{"user_id":2}""")
    } finally dir.toFile.listFiles().foreach(_.delete())
  }

  test("deaggregate=true explodes KPL envelopes in the reader; plain records pass through") {
    val dir = Files.createTempDirectory("shards")
    try {
      writeShards(dir)
      val rows = read(dir, deagg = true)
        .select(col("shard_id"), col("partition_key"), col("data").cast("string"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(rows == Set(
        ("shard-000", "u1", """{"user_id":1}"""),
        ("shard-000", "u2", """{"user_id":2}"""),
        ("shard-001", "k1", """{"user_id":3}"""),
        ("shard-001", "k2", """{"user_id":4}""")), s"got $rows")
      // sub-records inherit the envelope's sequence number
      val seqs = read(dir, deagg = true).where(col("shard_id") === "shard-001")
        .select(col("sequence_number")).collect().map(_.getString(0)).toSet
      assert(seqs == Set("49600"))
    } finally dir.toFile.listFiles().foreach(_.delete())
  }

  test("column pruning pushes into the scan: counting never reads data bytes") {
    val dir = Files.createTempDirectory("shards")
    try {
      writeShards(dir)
      val agg = read(dir).groupBy(col("shard_id")).agg(count(lit(1)).as("n"))
      val scan = agg.queryExecution.executedPlan.toString
      assert(scan.contains("ReadSchema: struct<shard_id:string>"),
        s"scan must prune to shard_id only:\n$scan")
      val counts = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts == Map("shard-000" -> 2L, "shard-001" -> 1L))
    } finally dir.toFile.listFiles().foreach(_.delete())
  }

  test("micro-batch stream: per-shard line offsets, incremental batches, late shards") {
    val dir = Files.createTempDirectory("shards")
    val ckpt = Files.createTempDirectory("shards_ckpt")
    try {
      writeShards(dir)
      val q = spark.readStream.format("graft-shards").load(dir.toString)
        .select(col("shard_id"), col("partition_key"))
        .writeStream.format("memory").queryName("shard_stream")
        .option("checkpointLocation", ckpt.toString)
        .start()
      try {
        q.processAllAvailable()
        assert(spark.table("shard_stream").count() == 3, "first batch reads everything")
        // append to an existing shard AND add a brand-new one (resharding)
        Files.write(dir.resolve("shard-000.jsonl"),
          java.util.List.of(rec("u9", "49599", 1700000009000L, b64("late"))),
          java.nio.file.StandardOpenOption.APPEND)
        Files.write(dir.resolve("shard-002.jsonl"), java.util.List.of(
          rec("n1", "50000", 1700000010000L, b64("new shard"))))
        q.processAllAvailable()
        val rows = spark.table("shard_stream").collect()
          .map(r => (r.getString(0), r.getString(1)))
        assert(rows.length == 5, s"incremental batch must add ONLY the 2 new records: ${rows.toSeq}")
        assert(rows.count(_ == ("shard-000", "u9")) == 1, "appended line read once")
        assert(rows.count(_ == ("shard-002", "n1")) == 1, "late shard enters at offset 0")
      } finally q.stop()
    } finally {
      dir.toFile.listFiles().foreach(_.delete())
      org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
    }
  }

  test("permissive=true: a corrupt line becomes a raw-bytes row, strict mode fails the task") {
    val dir = Files.createTempDirectory("shards")
    try {
      Files.write(dir.resolve("shard-000.jsonl"), java.util.List.of(
        rec("u1", "1", 1700000000000L, b64("ok")),
        """{"partitionKey": BROKEN""",                       // JSON parse failure
        """{"partitionKey":"u2","data":"@@not-base64@@"}""", // bad base64 payload
        """[1,2,3]"""))                                      // valid JSON, not an object
      val rows = spark.read.format("graft-shards").option("permissive", "true")
        .load(dir.toString)
        .select(col("partition_key"), col("data").cast("string"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows == Set(
        ("u1", "ok"),
        (null, """{"partitionKey": BROKEN"""),
        (null, """{"partitionKey":"u2","data":"@@not-base64@@"}"""),
        (null, """[1,2,3]""")),
        s"every corrupt shape must surface as raw data: $rows")
      intercept[org.apache.spark.SparkException] {
        read(dir).count() // strict default: the corrupt line fails the scan
      }
    } finally dir.toFile.listFiles().foreach(_.delete())
  }

  test("a torn (newline-less) trailing record is invisible until its newline lands") {
    val dir = Files.createTempDirectory("shards")
    try {
      val full = rec("u1", "1", 1700000000000L, b64("a"))
      val torn = rec("u2", "2", 1700000001000L, b64("b"))
      // one complete line, then a mid-append fragment with NO newline
      Files.write(dir.resolve("shard-000.jsonl"),
        (full + "\n" + torn).getBytes(StandardCharsets.UTF_8))
      assert(read(dir).count() == 1, "unterminated tail must not be read")
      // the appender finishes the record: just the newline arrives
      Files.write(dir.resolve("shard-000.jsonl"),
        "\n".getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.APPEND)
      assert(read(dir).count() == 2, "completed record becomes visible")
    } finally dir.toFile.listFiles().foreach(_.delete())
  }

  test("reference quick-start on this stack: shard stream → per-shard windowed counts") {
    import graft.config.{CounterDef, CounterType}
    import graft.operators.Counters
    // README.md:47-53 — `kinesis-data-counter -window 1m -stream test-stream`
    // emits {counter_id:"__instant__", counter_type, event_source_arn,
    // shard_id, value, window_start, window_end} per (shard, minute)
    val dir = Files.createTempDirectory("shards")
    try {
      val m0 = 1700000000000L - (1700000000000L % 60000L) // minute-aligned
      Files.write(dir.resolve("shard-000.jsonl"), java.util.List.of(
        rec("a", "1", m0 + 1000L, b64("r1")),
        rec("b", "2", m0 + 2000L, b64("r2")),
        rec("c", "3", m0 + 61000L, b64("r3")))) // next minute
      Files.write(dir.resolve("shard-001.jsonl"), java.util.List.of(
        rec("d", "4", m0 + 3000L, b64("r4"))))
      val arn = "arn:aws:kinesis:ap-northeast-1:111122223333:stream/test-stream"
      val c = CounterDef("__instant__", CounterType.Count, Some("*"),
        windowDuration = "1 minute")
      val counted = Counters.finalizeOutput(
        spark.readStream.format("graft-shards").load(dir.toString)
          .groupBy(window(col("arrival_ts"), "1 minute"), col("shard_id"))
          .agg(count(lit(1)).as("value")),
        c, Some(arn), includeShard = true)
      val q = counted.writeStream.outputMode("complete")
        .format("memory").queryName("quickstart").start()
      try {
        q.processAllAvailable()
        val out = spark.table("quickstart").collect()
        assert(out.head.schema.fieldNames.toSeq == Seq("event_source_arn",
          "window_start", "window_end", "counter_id", "counter_type",
          "shard_id", "value"), "the reference's emitted record shape")
        val byKey = out.map(r => (r.getAs[String]("shard_id"),
          r.getAs[Long]("window_start")) -> r.getAs[Long]("value")).toMap
        assert(byKey == Map(
          ("shard-000", m0) -> 2L,
          ("shard-000", m0 + 60000L) -> 1L,
          ("shard-001", m0) -> 1L), s"got $byKey")
        assert(out.forall(_.getAs[String]("event_source_arn") == arn))
      } finally q.stop()
    } finally dir.toFile.listFiles().foreach(_.delete())
  }

  test("full loop: counter output → ShardLogPutter → connector reads it back") {
    import graft.config.{Arn, CounterDef, CounterType}
    import graft.operators.Counters
    import graft.sinks.Sinks
    import spark.implicits._
    val dir = Files.createTempDirectory("shards_out")
    try {
      val events = Seq((1L, "2024-01-01 10:00:01"), (2L, "2024-01-01 10:00:02"),
        (3L, "2024-01-01 11:00:01"))
        .toDF("event_id", "d").withColumn("ts", col("d").cast("timestamp"))
      val c = CounterDef("req", CounterType.Count, Some("*"),
        windowDuration = "1 hour",
        outputArn = Some(Arn.unsafe("arn:aws:kinesis:us-east-1:1:stream/out")))
      val out = Counters.run(events, "ts", c)
      Sinks.write(out, c, new Sinks.ShardLogPutter(dir.toString, nShards = 2))
      // what the putter wrote, the connector reads back — and the payload
      // is the emitted record JSON, key = counter id (counter.go:530)
      val back = spark.read.format("graft-shards").load(dir.toString)
        .select(col("partition_key"), col("data").cast("string"))
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(back.length == 2, s"one record per closed window: ${back.toSeq}")
      assert(back.forall(_._1 == "req"))
      val values = back.map(_._2).map(s =>
        get_json_value(s, "value")).sorted
      assert(values.toSeq == Seq("1", "2"), s"got ${back.toSeq}")
    } finally dir.toFile.listFiles().foreach(_.delete())
  }

  private def get_json_value(json: String, field: String): String = {
    val m = s""""$field":(\\d+)""".r.findFirstMatchIn(json)
    m.map(_.group(1)).getOrElse(sys.error(s"no $field in $json"))
  }

  test("putter JSON-escapes hostile partition keys; the connector round-trips them") {
    import graft.config.Arn
    import graft.sinks.Sinks
    val dir = Files.createTempDirectory("shards_esc")
    try {
      val putter = new Sinks.ShardLogPutter(dir.toString, nShards = 1)
      val arn = Arn.unsafe("arn:aws:kinesis:us-east-1:1:stream/out")
      val hostile = "k\"quote\\back\nnewline\ttab"
      putter.put(arn, hostile, "payload-1")
      putter.put(arn, "plain", "payload-2")
      // one physical line per put — an embedded newline must NOT tear the log
      val lines = Files.readAllLines(dir.resolve("shard-000.jsonl"))
      assert(lines.size == 2, s"torn log: $lines")
      val back = read(dir).select(col("partition_key"), col("data").cast("string"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(back == Set((hostile, "payload-1"), ("plain", "payload-2")), s"got $back")
    } finally dir.toFile.listFiles().foreach(_.delete())
  }

  test("putter sequence numbers continue from an existing shard log") {
    import graft.config.Arn
    import graft.sinks.Sinks
    val dir = Files.createTempDirectory("shards_seq")
    try {
      // a previous JVM left 3 records in shard-000
      Files.write(dir.resolve("shard-000.jsonl"), java.util.List.of(
        rec("a", "1", 1L, b64("x")), rec("a", "2", 2L, b64("y")),
        rec("a", "3", 3L, b64("z"))))
      new Sinks.ShardLogPutter(dir.toString, nShards = 1)
        .put(Arn.unsafe("arn:aws:kinesis:us-east-1:1:stream/out"), "a", "w")
      val seqs = read(dir).select(col("sequence_number"))
        .collect().map(_.getString(0)).sorted
      assert(seqs.toSeq == Seq("1", "2", "3", "4"),
        s"new JVM must continue at 4, not restart at 1: ${seqs.toSeq}")
    } finally dir.toFile.listFiles().foreach(_.delete())
  }

  test("lineCountIncremental ≡ lineCount across appends and torn tails") {
    import graft.sources.v2.ShardScan
    val dir = Files.createTempDirectory("shards_cnt")
    val f = dir.resolve("shard-000.jsonl")
    try {
      def both(): (Long, Long) =
        (ShardScan.lineCount(f.toString), ShardScan.lineCountIncremental(f.toString))
      Files.write(f, "a\nb\n".getBytes(StandardCharsets.UTF_8))
      assert(both() == ((2L, 2L)))
      // torn tail: invisible to both
      Files.write(f, "torn-no-newline".getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.APPEND)
      assert(both() == ((2L, 2L)))
      // the newline lands; blank lines don't count
      Files.write(f, "\n\n   \nc\n".getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.APPEND)
      assert(both() == ((4L, 4L)))
      // steady state: repeated calls with no growth
      assert(ShardScan.lineCountIncremental(f.toString) == 4L)
    } finally dir.toFile.listFiles().foreach(_.delete())
  }

  test("a committed offset range whose shard file vanished fails the batch, not drops data") {
    import graft.sources.v2.{FileShardClient, ShardMicroBatchStream, ShardOffset, ShardOptions}
    val dir = Files.createTempDirectory("shards_gone")
    try {
      val stream = new ShardMicroBatchStream(
        new FileShardClient(dir.toString, permissive = false),
        ShardOptions(deaggregate = false, permissive = false),
        Array("shard_id", "partition_key"), dir.toString)
      val e = intercept[IllegalStateException] {
        stream.planInputPartitions(
          ShardOffset("""{}"""), ShardOffset("""{"shard-000":5}"""))
      }
      assert(e.getMessage.contains("shard-000"), e.getMessage)
      // an end offset that does NOT advance the missing shard is fine
      assert(stream.planInputPartitions(
        ShardOffset("""{"shard-000":5}"""), ShardOffset("""{"shard-000":5}""")).isEmpty)
    } finally dir.toFile.listFiles().foreach(_.delete())
  }

  test("a shard scan feeds the counter pipeline end-to-end") {
    import graft.config.{CounterDef, CounterType}
    val dir = Files.createTempDirectory("shards")
    try {
      writeShards(dir)
      val parsed = read(dir, deagg = true)
        .select(col("arrival_ts").as("ts"),
          get_json_object(col("data").cast("string"), "$.user_id").cast("long").as("user_id"))
      val c = CounterDef("users", CounterType.Count, Some("user_id"),
        windowDuration = "1 hour")
      val out = graft.operators.Counters.run(parsed, "ts", c).collect()
      assert(out.map(_.getAs[Long]("value")).sum == 4L, "all 4 user records counted")
    } finally dir.toFile.listFiles().foreach(_.delete())
  }
}
