package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** KPL record deaggregation (reference O3, `/root/reference/deaggregate.go`):
  * the Kinesis Producer Library packs many user records into one Kinesis
  * record using a public protobuf envelope (the aws/kinesis-aggregation
  * format): `0xF3 0x89 0x9A 0xC2` magic, an `AggregatedRecord` protobuf
  * message, and a trailing MD5 of the message bytes.
  *
  * The wire format is decoded here directly (a ~60-line protobuf wire-format
  * reader — no codegen, no extra dependency):
  *
  * {{{
  * message AggregatedRecord {
  *   repeated string partition_key_table    = 1;
  *   repeated string explicit_hash_key_table= 2;
  *   repeated Record records                = 3;
  * }
  * message Record {
  *   required uint64 partition_key_index    = 1;
  *   optional uint64 explicit_hash_key_index= 2;
  *   required bytes  data                   = 3;
  * }
  * }}}
  *
  * Non-aggregated payloads (no magic, bad checksum, malformed protobuf) pass
  * through as a single record — same contract as the awslabs deaggregator
  * the reference delegates to. (The reference also has a bug filling
  * PartitionKey from EncryptionType, `deaggregate.go:19`; not replicated.)
  *
  * As a Spark operator this is a 1→N explode of a binary column — a
  * partition-local generator with no shuffle; sub-record bytes never leave
  * the task that read the envelope.
  */
object Deaggregate {

  private val Magic: Array[Byte] =
    Array(0xf3.toByte, 0x89.toByte, 0x9a.toByte, 0xc2.toByte)

  final case class SubRecord(partitionKey: String, data: Array[Byte])

  /** Decode one Kinesis record payload into its user records. */
  def deaggregate(payload: Array[Byte]): Seq[SubRecord] = {
    if (payload == null) return Nil
    if (payload.length < Magic.length + 16 ||
        !payload.take(Magic.length).sameElements(Magic))
      return Seq(SubRecord("", payload))
    val body = java.util.Arrays.copyOfRange(payload, Magic.length, payload.length - 16)
    val digest = java.util.Arrays.copyOfRange(payload, payload.length - 16, payload.length)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(body)
    if (!md5.sameElements(digest)) return Seq(SubRecord("", payload))
    try {
      val (keys, records) = parseAggregated(body)
      records.map { case (pkIdx, data) =>
        SubRecord(keys.lift(pkIdx.toInt).getOrElse(""), data)
      }
    } catch { case _: Exception => Seq(SubRecord("", payload)) }
  }

  // --- minimal protobuf wire-format reader --------------------------------

  private final class Reader(b: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        if (pos >= end) throw new IllegalArgumentException("truncated varint")
        val x = b(pos); pos += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
        if (shift > 63) throw new IllegalArgumentException("varint overflow")
      }
      v
    }
    def bytes(): (Int, Int) = { // (offset, length) of a length-delimited field
      val len = varint().toInt
      if (len < 0 || pos + len > end) throw new IllegalArgumentException("truncated bytes")
      val off = pos; pos += len; (off, len)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => bytes()
      case 5 => pos += 4
      case t => throw new IllegalArgumentException(s"unsupported wire type $t")
    }
  }

  /** Parse AggregatedRecord → (partition key table, (pkIndex, data) list). */
  private def parseAggregated(body: Array[Byte]): (Vector[String], Seq[(Long, Array[Byte])]) = {
    val r = new Reader(body, 0, body.length)
    var keys = Vector.empty[String]
    val recs = Seq.newBuilder[(Long, Array[Byte])]
    while (r.hasNext) {
      val tag = r.varint()
      val field = (tag >> 3).toInt
      val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 2) =>
          val (off, len) = r.bytes()
          keys :+= new String(body, off, len, "UTF-8")
        case (3, 2) =>
          val (off, len) = r.bytes()
          recs += parseRecord(body, off, off + len)
        case _ => r.skip(wire)
      }
    }
    (keys, recs.result())
  }

  private def parseRecord(b: Array[Byte], from: Int, to: Int): (Long, Array[Byte]) = {
    val r = new Reader(b, from, to)
    var pkIdx = 0L
    var data = Array.emptyByteArray
    while (r.hasNext) {
      val tag = r.varint()
      val field = (tag >> 3).toInt
      val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 0) => pkIdx = r.varint()
        case (3, 2) =>
          val (off, len) = r.bytes()
          data = java.util.Arrays.copyOfRange(b, off, off + len)
        case _ => r.skip(wire)
      }
    }
    (pkIdx, data)
  }

  /** Test/producer-side encoder for the same envelope (used by specs and by
    * anyone emitting KPL-aggregated batches from this engine).
    */
  def aggregate(records: Seq[SubRecord]): Array[Byte] = {
    val keys = records.map(_.partitionKey).distinct
    val keyIdx = keys.zipWithIndex.toMap
    val out = new java.io.ByteArrayOutputStream()
    def writeVarint(o: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { o.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      o.write(v.toInt)
    }
    def writeBytes(o: java.io.ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
      writeVarint(o, (field.toLong << 3) | 2); writeVarint(o, b.length.toLong); o.write(b)
    }
    keys.foreach(k => writeBytes(out, 1, k.getBytes("UTF-8")))
    records.foreach { rec =>
      val r = new java.io.ByteArrayOutputStream()
      writeVarint(r, (1L << 3) | 0); writeVarint(r, keyIdx(rec.partitionKey).toLong)
      writeBytes(r, 3, rec.data)
      writeBytes(out, 3, r.toByteArray)
    }
    val body = out.toByteArray
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(body)
    val full = new java.io.ByteArrayOutputStream()
    full.write(Magic); full.write(body); full.write(md5)
    full.toByteArray
  }

  /** The Spark-side operator: explode a binary payload column into one row
    * per deaggregated user record (`partition_key`, `data`), preserving all
    * other columns. A typed flatMap, not a ScalaUDF — the wire parse is a
    * partition-local 1→N expansion like the Multimodal ops, so the hot
    * parse path stays out of UDF-land (and inside the repo's no-ScalaUDF
    * plan audit). Narrow (no shuffle); a null payload expands to zero
    * rows; non-KPL payloads pass through as one row with the envelope's
    * empty partition key, exactly as [[deaggregate]] reports them.
    */
  def explodeRecords(df: DataFrame, payloadCol: String = "data"): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val hadPk = inSchema.fieldNames.contains("partition_key")
    // mirror withColumn placement AND type: replace in place (always as
    // string — the deagg key overwrites whatever was there), or append
    val outSchema = StructType(
      (if (hadPk) inSchema.fields
       else inSchema.fields :+ StructField("partition_key", StringType))
        .map(f => if (f.name == "partition_key") f.copy(dataType = StringType) else f))
    val pkIdx = outSchema.fieldIndex("partition_key")
    df.flatMap { row =>
      val payload = row.getAs[Array[Byte]](payloadIdx)
      val base = row.toSeq.toArray
      val template = if (hadPk) base else base :+ (null: Any)
      deaggregate(payload).map { r =>
        val vals = template.clone()
        vals(payloadIdx) = r.data
        vals(pkIdx) = r.partitionKey
        Row.fromSeq(vals.toSeq)
      }
    }(Encoders.row(outSchema))
  }
}
