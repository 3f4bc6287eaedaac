package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame

import graft.config.{Arn, ConfigLoader}
import graft.sinks.Sinks

/** The reference's OWN test fixtures, loaded verbatim from the read-only
  * `/root/reference/testdata` YAMLs and driven through this
  * engine — the parity statement `counter_test.go:36-67` makes for the Go
  * implementation, made here for the Spark one:
  *
  *  - synthetic data in the reference's shape (`counter_test.go:210-290`):
  *    n records over m users, fields {time, request_id, user_id, path},
  *    `path = "/my_page"` for half the users, sprayed across 3 shards,
  *    window 2021-12-01 11:19:00–11:20:00 UTC (`counter_test.go:203-208`);
  *  - exact equality for count cases, `InEpsilon 5%` for ACD
  *    (`counter_test.go:66`);
  *  - aggregate fixtures run the explicit two-phase (per-shard partial →
  *    merge) topology, asserting cross-shard merge associativity
  *    (`counter_test.go:69-108`).
  *
  * If a user of the reference pointed their config files at this library,
  * these are the cases proving they get the same answers.
  */
class ReferenceFixturesSpec extends SparkTestBase {
  import spark.implicits._

  private val fixtureDir = "/root/reference/testdata"
  private val base = 1638357540000L // 2021-12-01T11:19:00Z
  private val n = 2000
  private val m = 100

  private lazy val synth: DataFrame = {
    val rows = (0 until n).map { i =>
      val uid = i % m
      (new Timestamp(base + i * 60000L / n), s"req-$i", s"user-$uid",
        if (uid < m / 2) "/my_page" else "/", i % 3)
    }
    rows.toDF("ts", "request_id", "user_id", "path", "shard")
  }

  private val source = Arn.unsafe("arn:aws:kinesis:ap-northeast-1:111122223333:stream/input-stream")

  private def runFixture(name: String): (graft.config.CounterDef, DataFrame) = {
    val cfg = ConfigLoader.loadFile(s"$fixtureDir/$name").fold(e => fail(s"$name: $e"), identity)
    // the reference's window size is NOT in the YAML — it is the Lambda
    // tumbling-window / CLI `-window` setting (main.go:113-116); the test
    // harness uses 1 minute (counter_test.go:203-208)
    val windowed = cfg.copy(counters = cfg.counters.map(_.copy(windowDuration = "1 minute")))
    val outs = Engine.process(synth, "ts", windowed, source, shardCol = Some("shard"))
    assert(outs.size == 1, s"$name must route exactly one counter")
    outs.head
  }

  private def values(df: DataFrame, col: String = "value"): Seq[Long] =
    df.select(col).as[Long].collect().toSeq

  private def assertEpsilon(actual: Long, expected: Double): Unit =
    assert(math.abs(actual - expected) / expected <= 0.05,
      s"estimate $actual vs expected $expected (ε=5%)")

  test("config.yaml: request_id column count = n, exact") {
    val (_, out) = runFixture("config.yaml")
    // non-aggregate + sharded source → per-shard records; total = n
    assert(values(out).sum == n)
    assert(out.columns.contains("shard_id"))
  }

  test("approx_count_distinct.yaml: unique users ≈ m per shard") {
    val (_, out) = runFixture("approx_count_distinct.yaml")
    // every user hits every shard (gcd(m, 3) = 1 over 20 rows/user)
    values(out).foreach(est => assertEpsilon(est, m.toDouble))
  }

  test("jq_expr.yaml: output reshaped to {time, name, value} (README.md:98-99)") {
    val (c, out) = runFixture("jq_expr.yaml")
    assert(out.columns.toSeq == Seq("time", "name", "value"))
    val rows = out.as[(Long, String, Long)].collect()
    rows.foreach { case (t, name, v) =>
      assert(t == base)
      assert(name == "access_log.user_count")
      assertEpsilon(v, m.toDouble)
    }
    // the serialized record matches the reference's expected JSON format
    // (counter_test.go:62-65: JSONEq with the value spliced in)
    val json = Sinks.toJsonRecords(out).as[String].collect().head
    assert(json.matches("""\{"time":1638357540000,"name":"access_log\.user_count","value":\d+\}"""))
    assert(c.jqExpr.isDefined)
  }

  test("target_expr.yaml: expr-valued ACD counts my_page users ≈ m/2") {
    val (_, out) = runFixture("target_expr.yaml")
    values(out).foreach(est => assertEpsilon(est, m / 2.0))
  }

  test("target_expr_count.yaml: constant expr counts every record") {
    val (_, out) = runFixture("target_expr_count.yaml")
    assert(values(out).sum == n)
    assert(out.columns.toSeq == Seq("time", "name", "value")) // jq applied
  }

  test("aggregate_count.yaml: two-phase boolean-expr count = n across shards") {
    val (c, out) = runFixture("aggregate_count.yaml")
    assert(c.aggregateStreamArn.isDefined) // the two-phase topology
    // `as_string(coalesce(request_id, "")) != ""` is true for every row;
    // count semantics keep non-nil ∧ non-false (counter.go:260-270)
    assert(values(out) == Seq(n.toLong)) // ONE merged record, no shard_id
    assert(!out.columns.contains("shard_id"))
  }

  test("aggregate_approx_count_distinct.yaml: cross-shard sketch merge ≈ m") {
    val (_, out) = runFixture("aggregate_approx_count_distinct.yaml")
    val merged = values(out)
    assert(merged.size == 1) // per-shard sketches united into one estimate
    assertEpsilon(merged.head, m.toDouble)
  }
}
