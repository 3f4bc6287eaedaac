package graft

import graft.operators.JqTransform

class JqTransformSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq((1638357540000L, 1638357600000L, 100L))
    .toDF("window_start", "window_end", "value")

  test("object construction renames + literals (jq_expr.yaml fixture shape)") {
    val out = JqTransform(df,
      """{"time": .window_start, "name": "access_log.user_count", "value": .value}""")
    assert(out.columns.toSeq == Seq("time", "name", "value"))
    val r = out.head()
    assert(r.getLong(0) == 1638357540000L)
    assert(r.getString(1) == "access_log.user_count")
    assert(r.getLong(2) == 100L)
  }

  test("arithmetic over field refs") {
    val out = JqTransform(df, """{"mid": .window_start + 30000, "double": .value * 2}""")
    val r = out.head()
    assert(r.getLong(0) == 1638357570000L)
    assert(r.getLong(1) == 200L)
  }

  test("unquoted keys and literals") {
    val out = JqTransform(df, """{v: .value, flag: true, missing: null, pi: 3.5}""")
    assert(out.columns.toSeq == Seq("v", "flag", "missing", "pi"))
    val r = out.head()
    assert(r.getBoolean(1) && r.isNullAt(2) && r.getDouble(3) == 3.5)
  }

  test("malformed jq throws at compile (config.go:112-118)") {
    assertThrows[IllegalArgumentException](JqTransform.compile("""{"a": }"""))
    assertThrows[IllegalArgumentException](JqTransform.compile("""not-an-object"""))
  }
}
