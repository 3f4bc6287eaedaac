package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => SqlWindow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, BooleanType, IntegerType, LongType, StringType}

import graft.config.{CounterDef, CounterType}
import graft.functions.{Canonical, TargetExpr}

/** The counter pipeline (reference operators O4–O14, O16) as declarative
  * DataFrame transforms:
  *
  * {{{
  * qualify (project/filter, O5–O7)
  *   → groupBy(window(ts, w) [, shard]) (O12)
  *   → count | approx_count_distinct (O8/O9)
  *   → finalize projection (O13) [→ jq transform (O14)]
  * }}}
  *
  * Scale notes (the whole point of the Spark re-expression):
  *  - The qualifying predicate is a `Column`, so Catalyst pushes it below
  *    the aggregate and into the parquet scan (`PushedFilters`) — at 100 TB
  *    the filter runs in the reader, not per-row in an interpreter.
  *  - `groupBy(window, ...)` compiles to partial `HashAggregateExec` →
  *    shuffle on the group keys → final merge. That shuffle IS the
  *    reference's IntermediateRecord hop (`counter.go:331-337, 348-412`),
  *    done natively with map-side combine: each of 1000 executors ships one
  *    partial row (or one HLL sketch) per (window, counter), not raw rows.
  *  - The number of groups is bounded by windows×shards — tiny relative to
  *    input — so the aggregation output never becomes a shuffle hotspot.
  *  - `approx_count_distinct(col, rsd=0.0041)` is Spark's native HLL++ at
  *    the reference's precision 16 (`counter.go:206-208`): a fixed 64 KiB
  *    buffer per group regardless of cardinality, mergeable across
  *    partitions exactly like the reference's gob-serialized sketch.
  */
object Counters {

  /** rsd for Spark's HLL++ matching the reference's fixed precision p=16
    * (`counter.go:206-208`): 1.04 / sqrt(2^16) ≈ 0.0040625.
    */
  val ReferenceRsd: Double = 1.04 / math.sqrt(1 << 16)

  /** Resolve the counter's target value column (O5/O7).
    * None means "every record" (`target_column: "*"`).
    */
  def valueColumn(c: CounterDef): Option[Column] =
    c.targetExpr match {
      case Some(src) => Some(TargetExpr.compile(src))
      case None =>
        c.targetColumn match {
          case Some("*") => None
          case Some(name) => Some(col(name))
          case None => None
        }
    }

  /** Count-semantics qualifying predicate for the `target_expr` path (O7):
    * keep a row iff the evaluated value is non-null AND not boolean false
    * (`counter.go:260-270`). Type-directed: only boolean-typed values can
    * be "false", so the false-rejection only applies when the resolved
    * type is BooleanType — mirroring the reference, where any non-bool,
    * non-nil value qualifies.
    *
    * NOT applied to the plain `target_column` path: there the reference
    * counts every present non-nil value, boolean `false` included
    * (`counter.go:271-276`) — see [[countAgg]].
    */
  def countPredicate(df: DataFrame, value: Column): Column = {
    val dt = df.select(value.as("__v")).schema.head.dataType
    dt match {
      case BooleanType => coalesce(value, lit(false)) === lit(true)
      case _ => value.isNotNull
    }
  }

  /** The count aggregate honoring the reference's path asymmetry:
    * `target_expr` → non-null ∧ non-false (`counter.go:260-270`);
    * `target_column` → non-null only, `false` counts (`counter.go:271-276`);
    * `*` → every record (`counter.go:273`).
    */
  private def countAgg(df: DataFrame, c: CounterDef): Column =
    (c.targetExpr, valueColumn(c)) match {
      case (_, None) => count(lit(1)) // target_column "*": every record
      case (Some(_), Some(value)) => count(when(countPredicate(df, value), lit(1)))
      case (None, Some(value)) => count(value) // count() already skips NULLs
    }

  /** ACD qualifying predicate (O6): non-null only — boolean false IS a
    * countable distinct value (`counter.go:296-313`), unlike count.
    */
  def acdPredicate(value: Column): Column = value.isNotNull

  /** The `value_sum` aggregate (ENGINE EXTENSION): per-window sum of the
    * target value in integer CENTS — `floor(value·100)` is one IEEE
    * double multiply + floor on both engines, and the summed longs are
    * shuffle-order-exact (the repo-wide exact-money discipline). Non-
    * numeric / null values contribute nothing (`try_cast` → NULL, which
    * `sum` skips — the skip-on-error analog shared with tonumber); an
    * all-null group emits 0, like count.
    *
    * DELIBERATE parity-over-accuracy trade: `floor`, not `round`. IEEE
    * representation makes e.g. 29.99·100 = 2998.9999…, so floor yields
    * 2998 cents where a currency-true conversion would round to 2999.
    * Both engines (this aggregate and the DuckDB oracle SQL) compute the
    * identical floor, so results are bit-equal and deterministic; callers
    * that ingest true currency should materialize integer cents upstream
    * rather than rely on a double column.
    */
  private def sumAgg(df: DataFrame, c: CounterDef): Column = {
    val value = valueColumn(c).getOrElse(throw new IllegalArgumentException(
      s"counter ${c.id}: value_sum requires a target"))
    coalesce(sum(centsOf(value)), lit(0L))
  }

  /** The shared exact-money conversion (see [[sumAgg]]'s doc for the
    * deliberate floor-over-round trade): non-numeric/null → NULL, which
    * every aggregate here skips.
    */
  private def centsOf(value: Column): Column =
    floor(value.try_cast("double") * lit(100d)).cast("long")

  /** The `value_min` / `value_max` aggregates (ENGINE EXTENSIONS): the
    * per-window extreme of the target value in integer cents — the
    * latency-floor/spike companion of [[sumAgg]], same conversion, same
    * skip-on-non-numeric. NO empty-group identity: a window with no
    * numeric values emits NULL (0 would be a fabricated extreme).
    */
  private def extremeAgg(df: DataFrame, c: CounterDef): Column = {
    val value = valueColumn(c).getOrElse(throw new IllegalArgumentException(
      s"counter ${c.id}: ${c.counterType.name} requires a target"))
    if (c.counterType == CounterType.ValueMin) min(centsOf(value))
    else max(centsOf(value))
  }

  /** The per-counter aggregate expression, usable standalone or fanned out
    * (several counters in ONE groupBy pass — see [[fanOut]]).
    * Conditional form: rows not qualifying contribute NULL, which both
    * `count` and `approx_count_distinct` ignore — this is what lets N
    * differently-filtered counters share a single shuffle.
    */
  def aggExpr(df: DataFrame, c: CounterDef): Column = {
    val v = valueColumn(c)
    c.counterType match {
      case CounterType.Count => countAgg(df, c)
      case CounterType.ApproxCountDistinct =>
        val value = v.getOrElse(
          throw new IllegalArgumentException(
            s"counter ${c.id}: approx_count_distinct requires a target"))
        acdAgg(df, value, c.siphashKeyHex)
      case CounterType.ValueSum => sumAgg(df, c)
      case CounterType.ValueMin | CounterType.ValueMax => extremeAgg(df, c)
      case CounterType.ValueQuantile | CounterType.HeavyHitters =>
        // quantile pick / per-window rank can't be one aggregate Column;
        // their run/runPerShard/runTwoPhase paths dispatch before this
        throw new IllegalArgumentException(
          s"counter ${c.id}: ${c.counterType.name} has no single-Column " +
            "aggregate — use Counters.run/runPerShard/runTwoPhase " +
            "(sliding/session/fanOut topologies support count/ACD only)")
    }
  }

  /** The ACD aggregate: DataSketches HLL at lgConfigK=16 — the reference's
    * precision (`counter.go:206-208`) — via `hll_sketch_agg`, which runs in
    * `ObjectHashAggregateExec` with one heap sketch object per group.
    *
    * Deliberately NOT Spark's `approx_count_distinct(rsd≈0.004)`: that is an
    * `ImperativeAggregate` whose buffer is a flat 2^16-register row — ~52 KiB
    * of fixed-width aggregation-buffer per group materialized in the hash
    * map of EVERY partial task — measured 10× slower at p=16 (sf0.01:
    * 12.6 s vs 1.3 s for the identical query via DataSketches).
    *
    * The sketched domain is the reference's exactly: SipHash-2-4 with the
    * per-counter `siphash_key_hex` over the canonical JSON encoding
    * (`counter.go:314-319` marshals, `counter.go:593-601` hashes with the
    * configured key, then adds to HLL). Routing the keyed hash into the
    * sketch means changing `siphash_key_hex` genuinely changes the
    * sketched domain here too — not just config parity. The `siphash64`
    * expression is codegen'd and paper-vector-verified (`SipHashSpec`);
    * requires [[graft.GraftExtensions]] in the session.
    */
  def acdAgg(df: DataFrame, value: Column,
             keyHex: String = CounterDef.DefaultSipHashKeyHex): Column =
    hll_sketch_estimate(hll_sketch_agg(sketchInput(df, value, keyHex), lit(16)))

  /** Keyed 64-bit sketch input shared by the single-phase ([[acdAgg]]) and
    * two-phase ([[partialState]]) ACD paths.
    */
  private def sketchInput(df: DataFrame, value: Column, keyHex: String): Column = {
    // Every ACD counter routes through the registered `siphash64` (the
    // reference's keyed sketch domain) — fail here with an actionable
    // message instead of Catalyst's generic UNRESOLVED_ROUTINE later.
    if (!df.sparkSession.catalog.functionExists("siphash64"))
      throw new IllegalStateException(
        "approx_count_distinct requires the siphash64 function: build the " +
          "session with .config(\"spark.sql.extensions\", \"graft.GraftExtensions\")")
    val dt = df.select(value.as("__v")).schema.head.dataType
    Canonical.siphashCanonicalTyped(dt, value, keyHex)
  }

  /** Exact-distinct twin of an ACD counter — used by the oracle harness
    * (DuckDB can check it bit-exactly) and by ε-tests as ground truth.
    */
  def exactDistinctExpr(c: CounterDef): Column = {
    val value = valueColumn(c).getOrElse(
      throw new IllegalArgumentException(s"counter ${c.id} requires a target"))
    count_distinct(value)
  }

  private def windowed(df: DataFrame, tsCol: String, c: CounterDef, extraKeys: Seq[Column] = Nil) =
    df.groupBy(window(col(tsCol), c.windowDuration) +: extraKeys: _*)

  /** Single-phase counter (O8/O9/O12/O13): the standard path. The two
    * engine-extension counter types dispatch to their own aggregation
    * shapes (a single agg Column can't express a quantile pick or a
    * per-window rank) but share the O13 finalize projection.
    */
  def run(df: DataFrame, tsCol: String, c: CounterDef,
          eventSourceArn: Option[String] = None): DataFrame =
    c.counterType match {
      case CounterType.ValueQuantile =>
        finalizeOutput(quantileAgg(df, tsCol, c, Nil), c, eventSourceArn)
      case CounterType.HeavyHitters =>
        finalizeOutput(hitterAgg(df, tsCol, c, Nil), c, eventSourceArn,
          extraFields = Seq(col("member"), col("rank")))
      case _ =>
        finalizeOutput(
          windowed(df, tsCol, c).agg(aggExpr(df, c).as("value")),
          c, eventSourceArn)
    }

  /** `value_quantile` single-phase aggregation: exact lower discrete
    * quantile of the target value at `c.quantilePpm` per (window[,
    * extras]). Histogram method (the [[graft.textops.TextAnalysis.lengthQuantiles]]
    * convention): one map-side-combinable groupBy collapses rows to
    * (window, v, cnt) — distinct values ≪ rows — then cumulative/total
    * sums run over the histogram, partitioned by window, and the smallest
    * v with cum·10⁶ ≥ ppm·total wins. All comparisons integer; v itself
    * passes through untouched, so any orderable value type works.
    */
  private def quantileAgg(df: DataFrame, tsCol: String, c: CounterDef,
                          extraKeys: Seq[(Column, String)]): DataFrame = {
    val value = valueColumn(c).getOrElse(throw new IllegalArgumentException(
      s"counter ${c.id}: value_quantile requires a target"))
    val keyCols = extraKeys.map { case (e, n) => e.as(n) }
    val hist = df.where(value.isNotNull)
      .groupBy(window(col(tsCol), c.windowDuration) +: keyCols :+ value.as("__v"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val part = col("window") +: extraKeys.map { case (_, n) => col(n) }
    val wCum = SqlWindow.partitionBy(part: _*).orderBy(col("__v"))
    val wTot = SqlWindow.partitionBy(part: _*)
    hist
      .withColumn("__cum", sum(col("__cnt")).over(wCum))
      .withColumn("__tot", sum(col("__cnt")).over(wTot))
      .where(col("__cum") * lit(1000000L) >= lit(c.quantilePpm) * col("__tot"))
      .groupBy(part: _*)
      .agg(min(col("__v")).as("value"))
  }

  /** `heavy_hitters` single-phase aggregation: per-(window[, extras])
    * top-`c.topK` target members by occurrence count. The rank window runs
    * over the per-(window, member) aggregate — map-side-combined, bounded
    * by active members — never over raw rows. Output adds (member, rank)
    * beside the count in `value`.
    */
  private def hitterAgg(df: DataFrame, tsCol: String, c: CounterDef,
                        extraKeys: Seq[(Column, String)]): DataFrame = {
    val member = valueColumn(c).getOrElse(throw new IllegalArgumentException(
      s"counter ${c.id}: heavy_hitters requires a target"))
    val keyCols = extraKeys.map { case (e, n) => e.as(n) }
    val counts = df.where(member.isNotNull)
      .groupBy(window(col(tsCol), c.windowDuration) +: keyCols :+
        member.cast("string").as("member"): _*)
      .agg(count(lit(1)).as("value"))
    val part = col("window") +: extraKeys.map { case (_, n) => col(n) }
    val w = SqlWindow.partitionBy(part: _*)
      .orderBy(col("value").desc, col("member").asc)
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= c.topK)
  }


  /** Exact-distinct variant of [[run]] for oracle checking. */
  def runExactDistinct(df: DataFrame, tsCol: String, c: CounterDef,
                       eventSourceArn: Option[String] = None): DataFrame =
    finalizeOutput(
      windowed(df, tsCol, c).agg(exactDistinctExpr(c).as("value")),
      c, eventSourceArn)

  /** Per-shard (non-aggregate) topology: one output record per
    * (window, shard), with `shard_id` included in the emitted record —
    * the reference does exactly this when a counter has no aggregate
    * stream (`counter.go:338-345`, conditional shard_id at
    * `counter.go:423-425`). Same single shuffle as [[run]], just with the
    * shard in the grouping key.
    */
  def runPerShard(df: DataFrame, tsCol: String, shardCol: String, c: CounterDef,
                  eventSourceArn: Option[String] = None): DataFrame = {
    val shardKey = col(shardCol).cast("string").as("shard_id")
    c.counterType match {
      case CounterType.ValueQuantile =>
        finalizeOutput(quantileAgg(df, tsCol, c,
            Seq(col(shardCol).cast("string") -> "shard_id")),
          c, eventSourceArn, includeShard = true)
      case CounterType.HeavyHitters =>
        finalizeOutput(hitterAgg(df, tsCol, c,
            Seq(col(shardCol).cast("string") -> "shard_id")),
          c, eventSourceArn, includeShard = true,
          extraFields = Seq(col("member"), col("rank")))
      case _ =>
        finalizeOutput(
          windowed(df, tsCol, c, Seq(shardKey)).agg(aggExpr(df, c).as("value")),
          c, eventSourceArn, includeShard = true)
    }
  }

  /** Explicit two-phase topology (O10/O11): per-shard partial aggregate,
    * then cross-shard merge — the reference's aggregate-stream architecture
    * (`counter.go:331-412`) made visible as two aggregation steps.
    *
    * Spark already does partial→final inside one `groupBy`; this exists to
    * (a) prove merge associativity in tests and (b) model the topology
    * where partials are materialized (e.g. per-Kinesis-shard jobs shipping
    * sketches through an intermediate stream). For ACD the partial is a
    * DataSketches HLL sketch (`hll_sketch_agg`, lgConfigK=16 — the
    * reference's precision), merged with `hll_union_agg`: serializable,
    * mergeable bytes, exactly like the reference's `base64_hllpp` state.
    */
  def runTwoPhase(df: DataFrame, tsCol: String, shardCol: String, c: CounterDef,
                  eventSourceArn: Option[String] = None): DataFrame = {
    val partial = partialState(df, tsCol, shardCol, c)
    val extra = c.counterType match {
      case CounterType.HeavyHitters => Seq(col("member"), col("rank"))
      case _ => Nil
    }
    finalizeOutput(mergePartials(partial, c), c, eventSourceArn, extraFields = extra)
  }

  /** Phase 1: per-(window, shard) partial state — the IntermediateRecord
    * (`counter.go:483-491`). Count → partial row count; ACD → HLL sketch
    * bytes (mergeable, bounded size).
    */
  def partialState(df: DataFrame, tsCol: String, shardCol: String, c: CounterDef): DataFrame = {
    val grouped = windowed(df, tsCol, c, Seq(col(shardCol).as("shard_id")))
    c.counterType match {
      case CounterType.Count =>
        grouped.agg(countAgg(df, c).as("partial_count"))
      case CounterType.ApproxCountDistinct =>
        val value = valueColumn(c).get
        grouped.agg(hll_sketch_agg(sketchInput(df, value, c.siphashKeyHex), lit(16))
          .as("partial_sketch"))
      case CounterType.ValueSum =>
        grouped.agg(sumAgg(df, c).as("partial_sum"))
      case CounterType.ValueMin | CounterType.ValueMax =>
        grouped.agg(extremeAgg(df, c).as("partial_extreme"))
      // extension types: the partial is a per-(window, shard) table —
      // a (value, cnt) histogram / a (member, cnt) count table — both
      // mergeable by concat + re-sum, like the reference's counter states
      case CounterType.ValueQuantile =>
        val value = valueColumn(c).getOrElse(throw new IllegalArgumentException(
          s"counter ${c.id}: value_quantile requires a target"))
        df.where(value.isNotNull)
          .groupBy(window(col(tsCol), c.windowDuration), col(shardCol).as("shard_id"),
            value.as("__v"))
          .agg(count(lit(1)).as("__cnt"))
          .groupBy(col("window"), col("shard_id"))
          .agg(sort_array(collect_list(struct(col("__v").as("v"), col("__cnt").as("n"))))
            .as("partial_hist"))
      case CounterType.HeavyHitters =>
        val member = valueColumn(c).getOrElse(throw new IllegalArgumentException(
          s"counter ${c.id}: heavy_hitters requires a target"))
        df.where(member.isNotNull)
          .groupBy(window(col(tsCol), c.windowDuration), col(shardCol).as("shard_id"),
            member.cast("string").as("member"))
          .agg(count(lit(1)).as("__cnt"))
          .groupBy(col("window"), col("shard_id"))
          .agg(sort_array(collect_list(struct(col("member").as("m"), col("__cnt").as("n"))))
            .as("partial_counts"))
    }
  }

  /** Phase 2: merge partials across shards (`counter.go:372-403`):
    * count → sum of partial counts; ACD → HLL union + estimate;
    * extension types → concat + re-sum, then the same quantile pick /
    * rank as single-phase (the shard hop must be invisible).
    */
  def mergePartials(partial: DataFrame, c: CounterDef): DataFrame =
    c.counterType match {
      case CounterType.Count =>
        partial.groupBy(col("window"))
          .agg(sum(col("partial_count")).cast("long").as("value"))
      case CounterType.ApproxCountDistinct =>
        partial.groupBy(col("window"))
          .agg(hll_sketch_estimate(hll_union_agg(col("partial_sketch"))).as("value"))
      case CounterType.ValueSum =>
        partial.groupBy(col("window"))
          .agg(sum(col("partial_sum")).cast("long").as("value"))
      case CounterType.ValueMin =>
        partial.groupBy(col("window"))
          .agg(min(col("partial_extreme")).cast("long").as("value"))
      case CounterType.ValueMax =>
        partial.groupBy(col("window"))
          .agg(max(col("partial_extreme")).cast("long").as("value"))
      case CounterType.ValueQuantile =>
        val hist = partial
          .select(col("window"), explode(col("partial_hist")).as("h"))
          .groupBy(col("window"), col("h.v").as("__v"))
          .agg(sum(col("h.n")).as("__cnt"))
        val wCum = SqlWindow.partitionBy(col("window")).orderBy(col("__v"))
        val wTot = SqlWindow.partitionBy(col("window"))
        hist
          .withColumn("__cum", sum(col("__cnt")).over(wCum))
          .withColumn("__tot", sum(col("__cnt")).over(wTot))
          .where(col("__cum") * lit(1000000L) >= lit(c.quantilePpm) * col("__tot"))
          .groupBy(col("window"))
          .agg(min(col("__v")).as("value"))
      case CounterType.HeavyHitters =>
        val counts = partial
          .select(col("window"), explode(col("partial_counts")).as("h"))
          .groupBy(col("window"), col("h.m").as("member"))
          .agg(sum(col("h.n")).as("value"))
        val w = SqlWindow.partitionBy(col("window"))
          .orderBy(col("value").desc, col("member").asc)
        counts
          .withColumn("rank", row_number().over(w).cast("long"))
          .where(col("rank") <= c.topK)
    }

  /** ENGINE EXTENSION beyond the reference (tumbling-only, README.md:44):
    * sliding-window counter — each record contributes to
    * `window/slide` overlapping windows. Same partial/final aggregation
    * shape as [[run]]; group count scales by the overlap factor, still
    * bounded by windows×counters, never by rows.
    */
  def runSliding(df: DataFrame, tsCol: String, c: CounterDef,
                 slide: String,
                 eventSourceArn: Option[String] = None): DataFrame =
    finalizeOutput(
      df.groupBy(window(col(tsCol), c.windowDuration, slide))
        .agg(aggExpr(df, c).as("value")),
      c, eventSourceArn)

  /** ENGINE EXTENSION: session-window counter — consecutive records of one
    * `keyCol` merge into a session while gaps stay under `gap`; a gap ≥
    * `gap` starts a new session (Spark's `session_window` semantics:
    * a session's reach is last-event + gap, end-exclusive). The natural
    * fit for per-user activity metrics the reference can't express.
    * Output: (key, session_start/end epoch millis, value).
    */
  def runSessions(df: DataFrame, tsCol: String, keyCol: String, c: CounterDef,
                  gap: String): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(aggExpr(df, c).as("value"))
      .select(
        col(keyCol),
        unix_millis(col("session_window.start")).as("session_start"),
        unix_millis(col("session_window.end")).as("session_end"),
        lit(c.id).as("counter_id"),
        col("value"))

  /** O13 final projection: epoch-millisecond window bounds + counter
    * identity, matching the reference's output record
    * (`counter.go:414-434`, millis at `counter.go:418-419`); `includeShard`
    * adds the conditional `shard_id` field the reference emits for
    * per-shard topologies (`counter.go:423-425`).
    */
  def finalizeOutput(agg: DataFrame, c: CounterDef,
                     eventSourceArn: Option[String] = None,
                     includeShard: Boolean = false,
                     extraFields: Seq[Column] = Nil): DataFrame = {
    val base = Seq(
      unix_millis(col("window.start")).as("window_start"),
      unix_millis(col("window.end")).as("window_end"),
      lit(c.id).as("counter_id"),
      lit(c.counterType.name).as("counter_type")) ++
      (if (includeShard) Seq(col("shard_id")) else Nil) ++
      extraFields :+
      col("value")
    val withArn = eventSourceArn match {
      case Some(arn) => lit(arn).as("event_source_arn") +: base
      case None => base
    }
    agg.select(withArn: _*)
  }

  /** O16 multi-counter fan-out: ALL counters sharing a window width run in
    * ONE groupBy pass — one scan, one shuffle — as conditional aggregates;
    * the per-counter rows are then unpivoted from the (tiny) aggregated
    * result by a single `explode` (not an N-way self-union, so the
    * aggregation exists once in the plan — which also makes this legal
    * after a streaming aggregation). At 100 TB this is the difference
    * between N full scans and 1.
    */
  def fanOut(df: DataFrame, tsCol: String, counters: Seq[CounterDef],
             eventSourceArn: Option[String] = None): DataFrame = {
    require(counters.nonEmpty, "fanOut requires at least one counter")
    // the conditional-aggregate trick needs one agg Column per counter;
    // quantile/rank counters have their own shapes — run them via `run`
    require(counters.forall(c => c.counterType == CounterType.Count ||
      c.counterType == CounterType.ApproxCountDistinct ||
      c.counterType == CounterType.ValueSum ||
      c.counterType == CounterType.ValueMin ||
      c.counterType == CounterType.ValueMax),
      "fanOut supports count/approx_count_distinct/value_sum/value_min/" +
        "value_max counters only; run value_quantile/heavy_hitters " +
        "counters individually")
    val byWindow = counters.groupBy(_.windowDuration).toSeq.sortBy(_._1)
    byWindow.map { case (w, cs) =>
      unpivotCounters(
        df.groupBy(window(col(tsCol), w))
          .agg(aggExpr(df, cs.head).as(s"__agg_${cs.head.id}"),
            cs.tail.map(c => aggExpr(df, c).as(s"__agg_${c.id}")): _*),
        cs, eventSourceArn)
    }.reduce(_.union(_))
  }

  /** Unpivot one wide aggregated row (window, __agg_c1, …, __agg_cN) into N
    * output records via a single generator — shared by batch and streaming
    * fan-out.
    */
  private[graft] def unpivotCounters(agged: DataFrame, cs: Seq[CounterDef],
                                     eventSourceArn: Option[String]): DataFrame = {
    val recs = explode(array(cs.map(c => struct(
      lit(c.id).as("counter_id"),
      lit(c.counterType.name).as("counter_type"),
      col(s"__agg_${c.id}").cast("long").as("value"))): _*))
    val base = Seq(
      unix_millis(col("window.start")).as("window_start"),
      unix_millis(col("window.end")).as("window_end"),
      col("r.counter_id").as("counter_id"),
      col("r.counter_type").as("counter_type"),
      col("r.value").as("value"))
    val cols = eventSourceArn match {
      case Some(arn) => lit(arn).as("event_source_arn") +: base
      case None => base
    }
    agged.select(col("window"), recs.as("r")).select(cols: _*)
  }
}
