package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.CounterType

/** CLI flag surface parity with the reference's main.go: instant counter,
  * env-to-flag overrides, the <15m window cap.
  */
class CliSpec extends AnyFunSuite {

  test("instant counter defaults (config.go:141-150)") {
    val o = Cli.parseArgs(Seq("-input", "/x"), env = Map.empty).toOption.get
    val cfg = Cli.resolveConfig(o).toOption.get
    val c = cfg.counters.head
    assert(c.id == "__instant__")
    assert(c.counterType == CounterType.Count)
    assert(c.targetColumn.contains("*"))
  }

  test("flags build the instant counter") {
    val o = Cli.parseArgs(Seq("-input", "/x", "-id", "clicks",
      "-counter-type", "approx_count_distinct", "-target-column", "user_id",
      "-window", "5 minutes"), env = Map.empty).toOption.get
    val c = Cli.resolveConfig(o).toOption.get.counters.head
    assert(c.id == "clicks" && c.counterType == CounterType.ApproxCountDistinct)
    assert(c.windowDuration == "5 minutes")
  }

  test("env overrides flags like KINESIS_DATA_COUNTER_* (main.go:129-134)") {
    val o = Cli.parseArgs(Seq("-input", "/x"),
      env = Map("GRAFT_WINDOW" -> "2 minutes", "GRAFT_TS_COL" -> "event_time")).toOption.get
    assert(o.window == "2 minutes" && o.tsCol == "event_time")
  }

  test("-shard-col selects the per-shard topology (counter.go:423-425)") {
    val o = Cli.parseArgs(Seq("-input", "/x", "-shard-col", "shard"), Map.empty).toOption.get
    assert(o.shardCol.contains("shard"))
    val viaEnv = Cli.parseArgs(Seq("-input", "/x"),
      env = Map("GRAFT_SHARD_COL" -> "partition_key")).toOption.get
    assert(viaEnv.shardCol.contains("partition_key"))
  }

  test("window cap <15m (main.go:113-116) and parse errors") {
    assert(Cli.parseArgs(Seq("-input", "/x", "-window", "15 minutes"), Map.empty).isLeft)
    assert(Cli.parseArgs(Seq("-input", "/x", "-window", "1 hour"), Map.empty).isLeft)
    assert(Cli.parseArgs(Seq("-input", "/x", "-window", "bogus"), Map.empty).isLeft)
    assert(Cli.parseArgs(Seq("-input", "/x", "-window", "14 minutes"), Map.empty).isRight)
    assert(Cli.parseArgs(Seq.empty, Map.empty).isLeft) // input required
    assert(Cli.parseArgs(Seq("-nope", "x"), Map.empty).isLeft)
  }

  test("extension counter types via flags: quantile-ppm and top-k") {
    val o = Cli.parseArgs(Seq("-input", "/x", "-id", "p99",
      "-counter-type", "value_quantile", "-target-column", "value",
      "-quantile-ppm", "990000"), env = Map.empty).toOption.get
    val c = Cli.resolveConfig(o).toOption.get.counters.head
    assert(c.counterType == CounterType.ValueQuantile)
    assert(c.quantilePpm == 990000L)
    val h = Cli.parseArgs(Seq("-input", "/x", "-counter-type", "heavy_hitters",
      "-target-column", "user_id", "-top-k", "5"), env = Map.empty).toOption.get
    assert(Cli.resolveConfig(h).toOption.get.counters.head.topK == 5)
    // the instant default ('*') is illegal for extension types — the
    // validation error surfaces at resolve, like the reference's
    assert(Cli.resolveConfig(Cli.parseArgs(
      Seq("-input", "/x", "-counter-type", "value_quantile"),
      env = Map.empty).toOption.get).isLeft)
    assert(Cli.parseArgs(Seq("-input", "/x", "-quantile-ppm", "soon"),
      env = Map.empty).isLeft)
  }

  test("extreme counter types via -counter-type; '*' default rejected") {
    val mn = Cli.parseArgs(Seq("-input", "/x", "-id", "floor",
      "-counter-type", "value_min", "-target-column", "value"),
      env = Map.empty).toOption.get
    assert(Cli.resolveConfig(mn).toOption.get.counters.head.counterType ==
      CounterType.ValueMin)
    val mx = Cli.parseArgs(Seq("-input", "/x", "-id", "spike",
      "-counter-type", "value_max", "-target-column", "value"),
      env = Map.empty).toOption.get
    assert(Cli.resolveConfig(mx).toOption.get.counters.head.counterType ==
      CounterType.ValueMax)
    // the instant default ('*') is illegal for the extremes too
    assert(Cli.resolveConfig(Cli.parseArgs(
      Seq("-input", "/x", "-counter-type", "value_max"),
      env = Map.empty).toOption.get).isLeft)
  }

  test("target-expr flag switches off the default column") {
    val o = Cli.parseArgs(Seq("-input", "/x", "-target-expr", "user_id > 5"),
      env = Map.empty).toOption.get
    assert(o.targetColumn.isEmpty && o.targetExpr.contains("user_id > 5"))
    assert(Cli.resolveConfig(o).isRight)
  }
}
