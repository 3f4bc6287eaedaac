package graft.sources.v2

import java.io.{BufferedReader, File, FileInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Deaggregate

/** `graft-shards` — a DataSource V2 connector for the reference's shard
  * scan (`run.go:70-131`: per-shard `GetShardIterator` + `GetRecords`
  * loop), re-expressed the Spark way: the STREAM is a table, each shard is
  * one `InputPartition`, and the per-shard sequential read happens inside
  * a `PartitionReader` on an executor — so a 512-shard stream scans as 512
  * parallel partition readers with no driver-side loop.
  *
  * File-backed by design: a shard is an append-only JSON-lines log
  * `<path>/<shardId>.jsonl` of Kinesis-wire-shaped records
  * (`{"partitionKey","sequenceNumber","approximateArrivalTimestamp",
  * "data"(base64)}` — the same fields `events.KinesisRecord` carries in
  * `counter.go:167-176`). The AWS SDK client is an I/O slot-in at exactly
  * one seam: [[ShardPartitionReader]]'s line iterator is what a
  * `GetRecords` pager would replace (no SDK in this sandbox).
  *
  * Spark-first behaviors the reference's loop cannot express:
  *  - **column pruning pushdown** ([[SupportsPushDownRequiredColumns]]):
  *    `SELECT shard_id, count(*)` never materializes `data` bytes;
  *  - **KPL deaggregation inside the reader** (option
  *    `deaggregate=true`): the 1→N envelope explode (`deaggregate.go:19`)
  *    happens before rows exist, so downstream operators see exactly the
  *    record stream the reference's handler sees (`counter.go:163-169`);
  *  - shard-count parallelism is the partitioning — `groupBy(shard_id)`
  *    aggregates are map-side-local until the final merge.
  */
class ShardTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-shards"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShardTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new ShardTable(properties.asScala.toMap)
}

object ShardTable {
  /** The Kinesis record surface (`counter.go:167-176`), plus the shard id
    * the reference threads through its handler (`counter.go:102`).
    */
  val Schema: StructType = StructType(Seq(
    StructField("shard_id", StringType, nullable = false),
    StructField("partition_key", StringType, nullable = true),
    StructField("sequence_number", StringType, nullable = true),
    StructField("arrival_ts", TimestampType, nullable = true),
    StructField("data", BinaryType, nullable = true)))
}

final class ShardTable(properties: Map[String, String])
    extends Table with SupportsRead {
  private val path = properties.getOrElse("path",
    throw new IllegalArgumentException("graft-shards requires a path"))
  override def name(): String = s"graft-shards(`$path`)"
  override def schema(): StructType = ShardTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ShardScanBuilder(path, ShardOptions(
      deaggregate = options.getBoolean("deaggregate", false),
      permissive = options.getBoolean("permissive", false)))
}

/** Reader options. `permissive`: a line that fails JSON parsing becomes a
  * row carrying the raw line as `data` (other fields null) instead of a
  * task failure — feeding the engine's corrupt-record side channel (O4)
  * the way `PERMISSIVE` `from_json` does downstream.
  */
final case class ShardOptions(deaggregate: Boolean, permissive: Boolean)

final class ShardScanBuilder(path: String, opts: ShardOptions)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = ShardTable.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new ShardScan(path, opts, required)
}

final class ShardScan(path: String, opts: ShardOptions, required: StructType)
    extends Scan with Batch {
  private val client = new FileShardClient(path, opts.permissive)

  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-shards path=$path deaggregate=${opts.deaggregate} " +
      s"permissive=${opts.permissive} ReadSchema: ${required.simpleString}"
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ShardMicroBatchStream(client, opts, required.fieldNames, path)

  // one partition per shard — the scan's parallelism IS the shard count
  override def planInputPartitions(): Array[InputPartition] =
    client.listShards().map { shardId =>
      ShardInputPartition(shardId, 0L, Long.MaxValue): InputPartition
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ShardReaderFactory(client, opts, required.fieldNames)
}

object ShardScan {
  def listShards(path: String): Array[(String, String)] = {
    val files = Option(new File(path).listFiles())
      .getOrElse(throw new IllegalArgumentException(s"no shard directory at $path"))
    files.filter(f => f.isFile && f.getName.endsWith(".jsonl")).sortBy(_.getName)
      .map(f => (f.getName.stripSuffix(".jsonl"), f.getAbsolutePath))
  }

  /** Non-empty TERMINATED line count of one shard log — the file-backed
    * analog of a shard's latest sequence number. Counts only lines a
    * concurrent appender has finished (see [[TerminatedLineReader]]), so
    * an offset never covers a torn record.
    */
  def lineCount(file: String): Long = scan(file, 0L, 0L)._2

  // latestOffset() runs once per trigger over EVERY shard log; a full
  // re-read makes each trigger O(total log size) — quadratic cumulative
  // work on a long-running append-only stream. Cache (clean byte position
  // → line count) per file and resume counting from the last terminated
  // line. A torn tail never advances the clean position, so it is
  // re-scanned (cheaply) until its newline lands; truncation (contract
  // violation) falls back to a full recount.
  private val counts =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Object)]

  /** The file's identity beyond its path: (dev, inode) on POSIX via
    * `fileKey`, null where unsupported. A shard log deleted and recreated
    * at the same path with equal-or-greater length would otherwise reuse
    * the stale (position, lines) cache and yield wrong offsets — a
    * contract violation the length-shrink check alone cannot see.
    */
  private def identityOf(file: String): Object =
    try java.nio.file.Files.readAttributes(
      java.nio.file.Paths.get(file),
      classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
    catch { case _: java.io.IOException => null }

  /** [[lineCount]] with incremental resume — same result (both run
    * [[scan]]), O(bytes appended since the previous call) instead of
    * O(file size). Locks per FILE (interned path, like `ShardLogPutter`),
    * never globally — one slow shard log must not serialize offset
    * computation for every other stream in the JVM.
    */
  def lineCountIncremental(file: String): Long = {
    val lock = ("graft-shardscan:" + file).intern()
    lock.synchronized {
      val len = new File(file).length()
      val id = identityOf(file)
      val cached = counts.getOrDefault(file, (0L, 0L, null))
      // full recount on shrink (truncation) OR identity change (same-path
      // replacement) — both are append-only-contract violations to recover
      // from, never to silently extend
      val fresh = len >= cached._1 && cached._3 == id
      val (start, startLines) = if (fresh) (cached._1, cached._2) else (0L, 0L)
      if (fresh && len == start) startLines
      else {
        val result = scan(file, start, startLines)
        counts.put(file, (result._1, result._2, id))
        result._2
      }
    }
  }

  /** THE one definition of "non-empty terminated line count": byte-scan
    * from `start` (a clean line boundary; `startLines` lines precede it),
    * returning (position just past the last terminator, line count). A
    * line counts iff it has any byte > 0x20 (`String.trim` semantics —
    * UTF-8 continuation bytes are ≥ 0x80 so multi-byte text counts); an
    * unterminated tail never advances the clean position. Offsets, putter
    * sequence seeding and the partition reader all agree because the
    * reader's [[TerminatedLineReader]] applies the same rules line-wise.
    */
  private def scan(file: String, start: Long, startLines: Long): (Long, Long) = {
    val in = new FileInputStream(file)
    try {
      var toSkip = start
      while (toSkip > 0) {
        val s = in.skip(toSkip)
        if (s <= 0) throw new java.io.IOException(s"cannot seek $file to $start")
        toSkip -= s
      }
      var pos = start; var clean = start; var lines = startLines
      var lineNonEmpty = false
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n != -1) {
        var i = 0
        while (i < n) {
          val b = buf(i)
          pos += 1
          if (b == '\n') {
            if (lineNonEmpty) lines += 1
            lineNonEmpty = false
            clean = pos
          } else if ((b & 0xff) > 0x20) lineNonEmpty = true
          i += 1
        }
        n = in.read(buf)
      }
      (clean, lines)
    } finally in.close()
  }
}

/** Line reader that yields only newline-TERMINATED non-empty lines. A
  * trailing fragment with no `\n` is a record mid-append (shard logs are
  * append-only; writes are not atomic) — `BufferedReader.readLine` would
  * surface it as a complete line, making `lineCount` and the partition
  * reader disagree with the appender. Both sides share this reader so the
  * unfinished tail is invisible until its newline lands.
  */
private[v2] final class TerminatedLineReader(file: String) {
  private val in = new BufferedReader(new InputStreamReader(
    new FileInputStream(file), StandardCharsets.UTF_8))
  private val sb = new java.lang.StringBuilder

  /** Next non-empty terminated line, or null at (possibly torn) EOF. */
  def readLine(): String = {
    while (true) {
      sb.setLength(0)
      var c = in.read()
      while (c != -1 && c != '\n') { sb.append(c.toChar); c = in.read() }
      if (c == -1) return null // unterminated tail (or clean EOF): not a line
      val line = sb.toString.stripSuffix("\r")
      if (line.trim.nonEmpty) return line
    }
    null // unreachable
  }
  def close(): Unit = in.close()
}

/** [startLine, endLine) of one shard's record positions; the batch path
  * reads [0, ∞). Carries only the shard id — the transport rides in the
  * reader factory.
  */
final case class ShardInputPartition(shardId: String,
                                     startLine: Long, endLine: Long)
    extends InputPartition

final class ShardReaderFactory(client: ShardReaderClient, opts: ShardOptions,
                               fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardInputPartition]
    new ShardPartitionReader(p.shardId, client, opts, fields,
      p.startLine, p.endLine)
  }
}

/** Streaming face of the shard scan — the reference's endless poll loop
  * (`run.go:83-131`) under Spark's offset protocol. An OFFSET is the map
  * `shardId → non-empty-line count` (the file-backed analog of per-shard
  * sequence numbers; a `GetRecords` pager would store its shard iterators
  * here). Each micro-batch plans one partition per shard that advanced,
  * reading exactly `[start, end)` — so the stream is replayable from the
  * checkpoint, which is the exactly-once property the reference's
  * in-memory loop cannot offer. Shards appearing mid-stream (resharding)
  * enter at offset 0.
  */
final class ShardMicroBatchStream(client: ShardReaderClient,
                                  opts: ShardOptions,
                                  fields: Array[String],
                                  source: String)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private val mapper = new ObjectMapper

  private def offsetOf(m: Map[String, Long]): ShardOffset = {
    val sorted = new java.util.TreeMap[String, java.lang.Long]()
    m.foreach { case (k, v) => sorted.put(k, v) }
    ShardOffset(mapper.writeValueAsString(sorted))
  }
  private def parse(o: Offset): Map[String, Long] = {
    val node = mapper.readTree(o.json())
    node.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
  }

  // Monotone high-water marks: a shard that transiently vanishes from the
  // directory listing (object-store partial listing, compaction rename)
  // must NOT drop from the offset — losing the key would restart it at 0
  // next trigger and replay its records. Merged max per shard; append-only
  // logs never regress.
  private var high: Map[String, Long] = Map.empty

  override def initialOffset(): Offset = offsetOf(Map.empty)
  override def latestOffset(): Offset = synchronized {
    val seen = client.listShards().map { id =>
      id -> client.latestPosition(id)
    }.toMap
    high = (high.keySet ++ seen.keySet).map { id =>
      id -> math.max(high.getOrElse(id, 0L), seen.getOrElse(id, 0L))
    }.toMap
    offsetOf(high)
  }
  override def deserializeOffset(json: String): Offset = ShardOffset(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = parse(start)
    val present = client.listShards().toSet
    parse(end).toSeq.sortBy(_._1).flatMap { case (shardId, until) =>
      val begin = from.getOrElse(shardId, 0L)
      if (until <= begin) None
      else if (present(shardId))
        Some(ShardInputPartition(shardId, begin, until): InputPartition)
      else
        // the end offset covers [begin, until) of this shard: silently
        // skipping it would still commit to `until` and lose those
        // records forever — the same transient-listing scenario the
        // monotone high-water mark defends against. Fail the micro-batch
        // instead; the engine retries and the records survive.
        throw new IllegalStateException(
          s"shard $shardId: offset range [$begin, $until) is committed to " +
            s"this micro-batch but the shard is absent from $source — " +
            "failing the batch so it retries instead of dropping records")
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ShardReaderFactory(client, opts, fields)
}

final case class ShardOffset(jsonStr: String)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = jsonStr
}

/** Sequential reader over one shard — the executor-side stand-in for the
  * reference's per-shard `GetRecords` loop, now fully transport-agnostic:
  * wire records arrive decoded from [[ShardReaderClient.records]]; this
  * class owns only the connector logic — offset bounds, column pruning,
  * KPL deaggregation (envelopes expand to a queue of sub-records sharing
  * the envelope's sequence number and arrival time, exactly the expansion
  * `counter.go:163-169` applies before counting), and the corrupt-record
  * side channel.
  */
final class ShardPartitionReader(shardId: String, client: ShardReaderClient,
                                 opts: ShardOptions, fields: Array[String],
                                 startLine: Long = 0L,
                                 endLine: Long = Long.MaxValue)
    extends PartitionReader[InternalRow] {
  private val shardUtf8 = UTF8String.fromString(shardId)
  // fetch only what the pruned schema consumes — payload also when the
  // deagg explode needs it to know the row count, partition key also
  // because the deagg passthrough keeps the record's own key
  private val needPayload = opts.deaggregate || fields.contains("data")
  private val in = client.records(shardId, startLine, ReadHints(
    needPk = opts.deaggregate || fields.contains("partition_key"),
    needSeq = fields.contains("sequence_number"),
    needTs = fields.contains("arrival_ts"),
    needData = needPayload))
  private var pos = startLine // record positions consumed so far
  private var queue: List[InternalRow] = Nil
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (queue.isEmpty) {
      if (pos >= endLine) return false
      val r = in.nextRecord()
      if (r == null) return false
      queue = rows(r)
      pos += 1
    }
    current = queue.head
    queue = queue.tail
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = in.close()

  /** Corrupt wire record → one row with the raw bytes as `data`, so the
    * engine's corrupt-record side channel (O4) sees it downstream.
    */
  private def rawRow(bytes: Array[Byte]): List[InternalRow] =
    List(InternalRow.fromSeq(fields.toSeq.map {
      case "shard_id" => shardUtf8
      case "data" => bytes
      case _ => null
    }))

  private def rows(r: WireRecord): List[InternalRow] = {
    if (r.corrupt) return rawRow(r.data)
    val tsMicros: Any =
      if (r.arrivalMillis == null) null else r.arrivalMillis.longValue() * 1000L
    val subs =
      if (opts.deaggregate && r.data != null)
        Deaggregate.deaggregate(r.data).map { s =>
          // non-KPL payloads pass through as the SAME array — keep the
          // record's own partition key, as the reference's handler does
          val pk = if (s.data eq r.data) r.partitionKey else s.partitionKey
          (pk, s.data)
        }.toList
      else List((r.partitionKey, r.data))
    subs.map { case (pk, data) =>
      InternalRow.fromSeq(fields.toSeq.map {
        case "shard_id" => shardUtf8
        case "partition_key" => if (pk == null) null else UTF8String.fromString(pk)
        case "sequence_number" =>
          if (r.sequenceNumber == null) null else UTF8String.fromString(r.sequenceNumber)
        case "arrival_ts" => tsMicros
        case "data" => data
        case other => throw new IllegalArgumentException(s"unknown column $other")
      })
    }
  }
}
