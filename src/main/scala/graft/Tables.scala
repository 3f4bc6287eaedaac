package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.Column

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed external tables; here the
  * contract is just "one parquet per table under a scale-factor dir".
  * Column pruning + predicate pushdown flow from the declarative reads —
  * every query should show PushedFilters/ReadSchema in `.explain`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Per-path pinned schema (r12 optimization): `spark.read.parquet` infers
    * the schema by reading footers on EVERY call, and every query build —
    * including each timed bench run — loads 1–4 tables, so the same footer
    * was re-read hundreds of times per bench sweep. Production jobs read
    * catalog tables whose schema is pinned metadata; this cache is that
    * contract for the fixture paths (schema only — never data or results).
    * Keyed by absolute path so a different SF dir re-infers; in-process
    * only, so a regenerated fixture (driver rounds restart the JVM) can
    * never be seen with a stale schema. The inference respects whatever
    * session confs (e.g. `nanosAsLong`) the caller set first — identical
    * to the uncached behavior, since callers set those before loading.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Normalize the fixture's `ts` to session-TZ `TimestampType`, driven by
    * the LOGICAL type the scan surfaced — the fixture generator has shipped
    * both TIMESTAMP(NANOS) (read as raw longs via `nanosAsLong`, converted
    * with exact integer `div` — a double roundtrip would lose precision at
    * ~1.7e18) and micros TIMESTAMP_NTZ (cast to TimestampType; exact under
    * the pinned UTC session TZ that every entrypoint sets, matching how the
    * DuckDB oracle reads the same file). An unrecognized type throws HERE,
    * at the one choke point, instead of emitting a frame that fails every
    * downstream `unix_millis`/`withWatermark` with a cryptic mismatch.
    */
  private def normalizeTs(dt: DataType, ts: Column): Column = dt match {
    case LongType         => timestamp_micros(expr("ts div 1000")) // integral div: exact
    case TimestampNTZType => ts.cast(TimestampType)
    case TimestampType    => ts
    case other => throw new IllegalStateException(
      s"events.ts loaded as unsupported type $other — fixture format changed; " +
        "teach Tables.normalizeTs the new logical type")
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    val ts = raw.withColumn("ts", normalizeTs(raw.schema("ts").dataType, col("ts")))
    // Same single-file/single-row-group constraint as documents: per-row
    // heavy consumers (JSON/variant parse, keyed hashing) would otherwise
    // run in ONE task locally.
    spread(ts, s"$sfDir/events.parquet", col("event_id"))
  }
  /** [[events]] without the conditional local [[spread]] — for consumers
    * whose per-row work is LIGHT (column projections + aggregations, no
    * per-row JSON/jq/digest work): for those, repartitioning a tiny local
    * fixture costs more than the single-task scan it parallelizes, and at
    * production scale the source is already maxPartitionBytes-split so the
    * two loaders plan identically (spread is a no-op there by its own
    * underfill probe). Heavy-per-row consumers (the jq/JSON counter
    * paths, keyed hashing) keep [[events]].
    */
  def eventsLean(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    raw.withColumn("ts", normalizeTs(raw.schema("ts").dataType, col("ts")))
  }

  /** Streaming twin of [[events]]: the same parquet read as a file-stream
    * source (schema pinned from one batch-footer read, same nanos→micros
    * conversion). Lets a query prove batch/stream semantic unification by
    * running the identical counter over both and hash-comparing outputs.
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = load(spark, sfDir, "events").schema
    // the table is a bare file, not a directory; the file-stream source
    // rejects a plain file path (basePath must be a directory) but accepts
    // it as a glob, which anchors basePath at the containing directory
    val raw = spark.readStream.schema(schema).parquet(s"$sfDir/{events}.parquet")
    raw.withColumn("ts", normalizeTs(raw.schema("ts").dataType, col("ts")))
  }

  /** The documents table feeds explode/higher-order-function-heavy text ops
    * (shingling, minhash, simhash) whose per-row cost dwarfs the scan. The
    * local single-file, single-row-group layout would pin all of that to ONE
    * task (a 600 KB parquet is unsplittable below row-group granularity), so
    * spread rows across the cluster first — one tiny shuffle of the raw
    * docs. At production scale the source arrives in thousands of splits
    * and this is a no-op cost-wise.
    */
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spread(load(spark, sfDir, "documents"), s"$sfDir/documents.parquet",
      col("doc_id"))

  /** Streaming twin of [[documents]] (same glob-anchored file-stream
    * trick as [[eventsStream]]) — feeds the ingest-time scoring parity
    * queries. No spread: stateless stream projections parallelize by
    * micro-batch file splits.
    */
  def documentsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = load(spark, sfDir, "documents").schema
    spark.readStream.schema(schema).parquet(s"$sfDir/{documents}.parquet")
  }

  /** Streaming twin of [[spread]] (r12 optimization): a single-file
    * fixture arrives in a micro-batch as ONE input split (row-group
    * granularity bounds file splitting), so a stream whose PER-ROW work is
    * heavy (JSON/KPL parse, tokenize+hash scoring, media digests) runs it
    * all on one task — measured 1.4–2.2 s single-task stages on c52/t30.
    * Same conditional, same deterministic synthetic key as [[spread]]
    * (stable under task retries — SPARK-38388); a production-shaped
    * source (many files/shards) skips the exchange entirely. Stateless,
    * so legal anywhere before the watermark/stateful op; row sets are
    * unchanged.
    */
  def spreadStream(df: DataFrame, path: String, idCol: Column): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    if (estSplits(spark, path) >= par) df
    else df.repartition(par, pmod(xxhash64(idCol), lit(par * 64)))
  }

  /** File-size estimate of a path's scan split count — the shared
    * underfill probe of [[spread]]/[[spreadStream]]. Unstattable paths
    * (object store, zero length) read as "already split". */
  private def estSplits(spark: SparkSession, path: String): Long = {
    val maxBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    def sizeOf(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(sizeOf).sum).getOrElse(0L)
      else f.length()
    val bytes = sizeOf(new java.io.File(path))
    if (bytes <= 0L) Long.MaxValue // unstattable → assume split
    else (bytes + maxBytes - 1) / maxBytes
  }

  /** Repartition ONLY when the scan underfills the cluster — the local
    * single-file fixtures plan one task; a production-scale source is
    * already maxPartitionBytes-split and must not be re-shuffled just to
    * load it (same conditional as `Ann.normalize`).
    *
    * The underfill probe is a FILE-SIZE estimate of the scan's split
    * count (`ceil(bytes / spark.sql.files.maxPartitionBytes)`), not
    * `df.rdd.getNumPartitions` — the RDD conversion materialized the
    * physical plan once per table load just to read a partition count,
    * doubling plan work on every query over events/documents. A path this
    * process can't stat (object store, zero length) is assumed
    * production-shaped — already split at the source, no repartition.
    */
  private def spread(df: DataFrame, path: String, idCol: Column): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    // Deterministic synthetic key, not round-robin: keyless repartition
    // pays a defensive local sort of its whole input (SPARK-23207 —
    // sortBeforeRepartition, so retried tasks reproduce their assignment;
    // measured ~25% of the exchange's cost here), and a rand()-derived key
    // can duplicate/lose rows under fetch-failure retries (SPARK-38388).
    // Hashing the table's unique id is stable under retries and, with
    // 64× more distinct key values than partitions, spreads evenly
    // (opt guide §2.5).
    if (estSplits(spark, path) >= par) df
    else df.repartition(par, pmod(xxhash64(idCol), lit(par * 64)))
  }
  /** The embeddings table feeds vector math whose per-row cost dwarfs the
    * scan (dot products per centroid/codeword, sub-vector slicing, PQ
    * Lloyd rounds) — same rationale as [[documents]], so same conditional
    * [[spread]] (r12: previously each `Ann.normalize` call probed
    * `rdd.getNumPartitions` — materializing the physical plan once per
    * call — and repartitioned round-robin, paying SPARK-23207's defensive
    * local sort; the loader-level keyed spread does it once, statically).
    */
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spread(load(spark, sfDir, "embeddings"), s"$sfDir/embeddings.parquet",
      col("vec_id"))

  /** Streaming twin of [[embeddings]] (same glob-anchored file-stream trick
    * as [[eventsStream]]) — feeds the ingest-time near-dup parity query.
    */
  def embeddingsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = load(spark, sfDir, "embeddings").schema
    spark.readStream.schema(schema).parquet(s"$sfDir/{embeddings}.parquet")
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
}
