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

  // ---- general jq surface (counter.go:441-465: 0..N outputs, pipes) ----

  private lazy val multi = Seq(
    (1L, 10L, "click"), (2L, 0L, "view"), (3L, -5L, "click"))
    .toDF("id", "value", "event_type")

  test("select(cond) | object pipeline filters then projects") {
    val out = JqTransform(multi,
      """select(.value > 0) | {"id": .id, "v": .value}""")
    assert(out.columns.toSeq == Seq("id", "v"))
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("jq truthiness: select keeps 0 and empty string, drops false/null") {
    val t = Seq((0L, "", true), (1L, "x", false))
      .toDF("n", "s", "b")
    assert(JqTransform(t, """select(.n) | {n: .n}""").count() == 2) // 0 is truthy
    assert(JqTransform(t, """select(.s) | {s: .s}""").count() == 2) // "" is truthy
    assert(JqTransform(t, """select(.b) | {n: .n}""").collect().map(_.getLong(0)).toSeq == Seq(0L))
    val withNull = Seq((Some(1L), 1L), (None, 2L)).toDF("v", "id")
    assert(JqTransform(withNull, """select(.v) | {id: .id}""")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("select over equality and boolean connectives") {
    val out = JqTransform(multi,
      """select(.event_type == "click" and .value > 0) | {id: .id}""")
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
    val out2 = JqTransform(multi,
      """select(.value == 0 or .value < 0) | {id: .id}""")
    assert(out2.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("value-level function pipes: tostring / tonumber / length / downcase") {
    val out = JqTransform(df,
      """{v: (.value | tostring), n: ("42" | tonumber), l: ("abc" | length), d: ("AbC" | ascii_downcase)}""")
    val r = out.head()
    assert(r.getString(0) == "100")
    assert(r.getDouble(1) == 42.0)
    assert(r.getLong(2) == 3L)
    assert(r.getString(3) == "abc")
  }

  test("comma stage emits N records per input row through one generator") {
    val out = JqTransform(df,
      """{metric: "start", t: .window_start}, {metric: "end", t: .window_end}""")
    assert(out.columns.toSeq == Seq("metric", "t"))
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("start", 1638357540000L), ("end", 1638357600000L)))
    // one Generate node, not a unioned double-plan
    assert("Generate".r.findAllIn(out.queryExecution.executedPlan.toString).size == 1)
  }

  test("comma stage rejects mismatched field sets") {
    assertThrows[IllegalArgumentException](
      JqTransform(df, """{a: .value}, {b: .value}"""))
  }

  test("nested object and array construction") {
    val out = JqTransform(df,
      """{w: {s: .window_start, e: .window_end}, pair: [.value, .value * 2]}""")
    val r = out.head()
    assert(r.getStruct(0).getLong(0) == 1638357540000L)
    assert(r.getSeq[Long](1) == Seq(100L, 200L))
  }

  test("path stage expands a struct, scalar path keeps one column") {
    val nested = JqTransform(df, """{w: {s: .window_start, e: .window_end}}""")
    val expanded = JqTransform(nested, """.w""")
    assert(expanded.columns.toSeq == Seq("s", "e"))
    assert(expanded.head().getLong(0) == 1638357540000L)
    val scalar = JqTransform(nested, """.w.s | {start: .s}""")
    // .w.s is scalar → single column named s; then rename via object stage
    assert(scalar.columns.toSeq == Seq("start"))
  }

  test(".path[] iterates arrays: one output per element, none for empty") {
    val arr = Seq(
      (1L, Seq(10L, 20L, 30L)),
      (2L, Seq.empty[Long])).toDF("id", "xs")
    // array of scalars: iterate then rename via an object stage
    val out = JqTransform(arr, """{keep: .id, pair: [.id, .id * 2]} | .pair[]""")
    assert(out.columns.toSeq == Seq("pair"))
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 2L, 4L))
    // array of structs: iteration expands the element's fields
    val structs = JqTransform(df,
      """{items: [{t: .window_start, v: .value}, {t: .window_end, v: .value * 2}]} | .items[]""")
    assert(structs.columns.toSeq == Seq("t", "v"))
    val rows = structs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1638357540000L, 100L), (1638357600000L, 200L)))
    // empty arrays emit nothing (jq semantics): only doc 1's elements
    val none = JqTransform(arr, """.xs[]""")
    assert(none.collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 20L, 30L))
  }

  test("jq total equality: null == null is true, null != x is true") {
    val t = Seq((Some(1L), 1L), (None, 2L), (None, 3L)).toDF("v", "id")
    assert(JqTransform(t, """select(.v == null) | {id: .id}""")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    assert(JqTransform(t, """select(.v != 1) | {id: .id}""")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    assert(JqTransform(t, """select(.v == 1) | {id: .id}""")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("jq not follows truthiness; length is type-directed") {
    val t = Seq((0L, "", Some(false), Seq(1L, 2L, 3L)), (1L, "x", None, Seq.empty[Long]))
      .toDF("n", "s", "b", "xs")
    val out = JqTransform(t,
      """{zn: (.n | not), zs: (.s | not), zb: (.b | not), la: (.xs | length), ls: (.s | length)}""")
    val rows = out.collect()
    // 0 and "" are truthy → not = false; false and null → not = true
    assert(!rows(0).getBoolean(0) && !rows(0).getBoolean(1) && rows(0).getBoolean(2))
    assert(rows(1).getBoolean(2)) // null | not → true
    assert(rows(0).getLong(3) == 3L && rows(1).getLong(3) == 0L) // array length
    assert(rows(0).getLong(4) == 0L && rows(1).getLong(4) == 1L) // string length
  }

  test("string interpolation builds names from field values") {
    val out = JqTransform(df,
      """{name: "metric.\(.value).window", v: .value}""")
    assert(out.head().getString(0) == "metric.100.window")
    // null interpolates as the string "null" (jq semantics)
    val withNull = Seq((Option.empty[Long], 7L)).toDF("x", "id")
    val out2 = JqTransform(withNull, """{s: "x=\(.x)!", id: .id}""")
    assert(out2.head().getString(0) == "x=null!")
    // arithmetic inside the interpolation
    val out3 = JqTransform(df, """{s: "\(.value * 2)"}""")
    assert(out3.head().getString(0) == "200")
  }

  test("three-stage pipeline: select | construct | select") {
    val out = JqTransform(multi,
      """select(.value >= 0) | {id: .id, big: .value >= 5} | select(.big)""")
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("// alternative: null falls through, values and 0/\"\" do not") {
    val t = Seq((Some(1L), "a", 10L), (None, "b", 20L)).toDF("v", "s", "id")
    val out = JqTransform(t, """{id: .id, v: (.v // -1)}""")
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((10L, 1L), (20L, -1L)))
    // 0 is truthy in jq: 0 // 9 is 0
    val z = JqTransform(df, """{a: (0 // 9), b: ("" // "fallback")}""").head()
    assert(z.getLong(0) == 0L && z.getString(1) == "")
  }

  test("// alternative: false falls through for booleans; right-assoc chains") {
    val t = Seq((Some(false), 1L), (Some(true), 2L), (None, 3L)).toDF("b", "id")
    val out = JqTransform(t, """{id: .id, b: (.b // true)}""")
    assert(out.collect().map(r => (r.getLong(0), r.getBoolean(1))).sorted.toSeq ==
      Seq((1L, true), (2L, true), (3L, true)))
    // chain: first truthy wins, null // null // x ≡ x
    val c = JqTransform(df, """{v: (null // null // .value)}""").head()
    assert(c.getLong(0) == 100L)
    // division still parses: value / 2 vs value // 2 are different operators
    val d = JqTransform(df, """{half: .value / 2, alt: (.value // 2)}""").head()
    assert(d.getDouble(0) == 50.0 && d.getLong(1) == 100L)
  }

  test("map(expr): element-bound '.' over arrays, nested fields, map-in-map") {
    val t = Seq((1L, Seq(1L, 2L, 3L))).toDF("id", "xs")
    val out = JqTransform(t, """{doubled: (.xs | map(. * 2)), id: .id}""").head()
    assert(out.getSeq[Long](0) == Seq(2L, 4L, 6L))
    // field access on struct elements
    val structs = JqTransform(df,
      """{items: [{t: .window_start, v: .value}, {t: .window_end, v: .value * 2}]} | {ts: (.items | map(.t)), doubled: (.items | map(.v * 10))}""")
    val r = structs.head()
    assert(r.getSeq[Long](0) == Seq(1638357540000L, 1638357600000L))
    assert(r.getSeq[Long](1) == Seq(1000L, 2000L))
    // nested map: inner '.' binds to the inner element
    val nested = Seq((Seq(Seq(1L, 2L), Seq(3L)), 1L)).toDF("xss", "id")
    val n = JqTransform(nested, """{out: (.xss | map(map(. + 1)))}""").head()
    assert(n.getSeq[scala.collection.Seq[Long]](0).map(_.toSeq).toSeq ==
      Seq(Seq(2L, 3L), Seq(4L)))
    // bare '.' outside map is a compile error
    assertThrows[IllegalArgumentException](
      JqTransform(df, """{x: .}""").collect())
  }

  test("reduce .path[] as $x (init; update): fold with acc-bound '.'") {
    val t = Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq.empty[Long])).toDF("id", "xs")
    val out = JqTransform(t, """{id: .id, total: (reduce .xs[] as $x (0; . + $x))}""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 6L, 2L -> 0L)) // empty array folds to init
    // update can mix acc and element arbitrarily: sum of squares
    val sq = JqTransform(t, """{s: (reduce .xs[] as $v (0; . + $v * $v)), id: .id}""")
      .collect().map(r => (r.getLong(1), r.getLong(0))).toMap
    assert(sq(1L) == 14L)
    // reduce composes with map in one expression
    val c = JqTransform(t,
      """{m: (reduce .xs[] as $x (0; . + $x)), d: (.xs | map(. * 2) | length), id: .id}""")
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1)))).toMap
    assert(c(1L) == ((6L, 3L)))
    // unbound variable is a compile-time error
    assertThrows[IllegalArgumentException](
      JqTransform(t, """{x: ($nope + 1)}""").collect())
  }

  test("type-directed constructs work inside map/reduce bodies (lambda typing)") {
    // regression: dtOf used to analyze the lambda variable against the
    // top-level frame and crash with UNRESOLVED_COLUMN
    val t = Seq((Seq(Some(1L), None, Some(3L)), Seq("ab", "c"), 1L))
      .toDF("xs", "ss", "id")
    val defaulted = JqTransform(t, """{v: (.xs | map(. // 0)), id: .id}""").head()
    assert(defaulted.getSeq[Long](0) == Seq(1L, 0L, 3L)) // null elements default
    val lens = JqTransform(t, """{l: (.ss | map(. | length))}""").head()
    assert(lens.getSeq[Long](0) == Seq(2L, 1L)) // string length per element
    val red = JqTransform(t, """{s: (reduce .xs[] as $x (0; . + ($x // 10)))}""").head()
    assert(red.getLong(0) == 14L) // 1 + 10 + 3
  }

  test("// with mixed boolean/non-boolean operands raises a clear error") {
    val t = Seq((Some(true), 1L)).toDF("b", "id")
    val e = intercept[IllegalArgumentException](
      JqTransform(t, """{x: (.b // 0)}""").collect())
    assert(e.getMessage.contains("no single output type"))
    // mirrored: non-boolean left, boolean right
    val e2 = intercept[IllegalArgumentException](
      JqTransform(t, """{x: (.id // false)}""").collect())
    assert(e2.getMessage.contains("no single output type"))
    // null left + boolean right is fine (coalesce)
    assert(JqTransform(t, """{x: (.ghost // true)}""").head().getBoolean(0))
  }

  test("case-variant duplicate columns fail loudly, never silently misresolve") {
    // Spark's case-insensitive resolution rejects [Value, value] as
    // ambiguous; jq paths inherit that loud failure (no wrong-column pick)
    val t = Seq((1L, 2L)).toDF("Value", "value")
    val e = intercept[org.apache.spark.sql.AnalysisException](
      JqTransform(t, """{a: .value}""").collect())
    assert(e.getMessage.contains("AMBIGUOUS_REFERENCE"))
  }

  test("paths resolve case-insensitively like the rest of Spark") {
    val out = JqTransform(df, """{v: .Value, t: .WINDOW_START}""").head()
    assert(out.getLong(0) == 100L && out.getLong(1) == 1638357540000L)
  }

  test("if/then/elif/else/end: when-chain with jq truthiness") {
    val out = JqTransform(df,
      """{lvl: (if .value > 150 then "high" elif .value > 50 then "mid" else "low" end)}""")
    assert(out.head().getString(0) == "mid")
    // non-boolean condition: null is falsy, any value (even 0) is truthy
    val t = JqTransform(df, """{x: (if .no_such then 1 else 2 end)}""").head()
    assert(t.getLong(0) == 2L)
    val t2 = JqTransform(df, """{x: (if .value then 1 else 2 end)}""").head()
    assert(t2.getLong(0) == 1L)
    // null boolean condition falls to else (jq: null is falsy)
    val t3 = JqTransform(df,
      """{x: (if .no_such == "y" then 1 else 2 end)}""").head()
    assert(t3.getLong(0) == 2L)
    // missing end is a compile error
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""{x: (if .value then 1 else 2)}"""))
  }

  test("else-less if emits '.' inside map; top-level still requires else") {
    val t = Seq((1L, Seq(5L, 20L, 7L))).toDF("id", "xs")
    // jq: map(if . > 10 then . * 100 end) — false branch passes the
    // element through
    val out = JqTransform(t, """{ys: (.xs | map(if . > 10 then . * 100 end))}""").head()
    assert(out.getSeq[Long](0) == Seq(5L, 2000L, 7L))
    // elif chain with else-less tail
    val out2 = JqTransform(t,
      """{ys: (.xs | map(if . > 10 then 1 elif . > 6 then 2 end))}""").head()
    assert(out2.getSeq[Long](0) == Seq(5L, 1L, 2L))
    // at top level '.' is undefined — clear compile error, not a mis-plan
    val e = intercept[IllegalArgumentException](
      JqTransform(df, """{x: (if .value then 1 end)}""").collect())
    assert(e.getMessage.contains("else-less"), e.getMessage)
  }

  test("keys: sorted key list for objects and maps; length/has compose") {
    // struct keys are schema-static → constant-folded sorted literal array
    val out = JqTransform(df,
      """{ks: ({"b": .value, "a": 1} | keys), n: ({"z": 1, "y": 2} | keys | length)}""").head()
    assert(out.getSeq[String](0) == Seq("a", "b"))
    assert(out.getLong(1) == 2L)
    // map-typed values sort at runtime
    val m = Seq((1L, Map("beta" -> 1L, "alpha" -> 2L))).toDF("id", "mp")
    assert(JqTransform(m, """{ks: (.mp | keys)}""").head().getSeq[String](0) ==
      Seq("alpha", "beta"))
    // keys on a scalar is a compile error
    assertThrows[IllegalArgumentException](
      JqTransform(df, """{k: (.value | keys)}""").collect())
  }

  test("to_entries/from_entries: field-order entries; keys composes via map(.key)") {
    // uniform value types keep the type
    val out = JqTransform(df,
      """{es: ({"b": .value, "a": .value * 2} | to_entries)}""").head()
    val es = out.getSeq[org.apache.spark.sql.Row](0)
    assert(es.map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("b", 100L), ("a", 200L))) // jq to_entries keeps field order
    // to_entries | map(.key) ≡ unsorted keys
    val ks = JqTransform(df,
      """{ks: ({"b": 1, "a": 2} | to_entries | map(.key))}""").head()
    assert(ks.getSeq[String](0) == Seq("b", "a"))
    // mixed value types fall back to string (documented divergence)
    val mixed = JqTransform(df,
      """{es: ({"n": .value, "s": "x"} | to_entries | map(.value))}""").head()
    assert(mixed.getSeq[String](0) == Seq("100", "x"))
    // from_entries inverts on map-typed data
    val m = Seq((1L, Map("k1" -> 7L, "k2" -> 8L))).toDF("id", "mp")
    val rt = JqTransform(m, """{back: (.mp | to_entries | from_entries)}""").head()
    assert(rt.getMap[String, Long](0) == Map("k1" -> 7L, "k2" -> 8L))
    // duplicate keys: jq from_entries is LAST-WINS (Spark's default map
    // dedup policy would throw — the compiler pre-drops earlier entries)
    val dup = JqTransform(df,
      """{m: ([{key: "a", value: .value}, {key: "b", value: 1},
        |      {key: "a", value: .value * 2}] | from_entries)}""".stripMargin).head()
    assert(dup.getMap[String, Long](0) == Map("a" -> 200L, "b" -> 1L))
    // from_entries on a non-entry array is a clear error
    assertThrows[IllegalArgumentException](
      JqTransform(df, """{x: ([1, 2] | from_entries)}""").collect())
  }

  test("group_by: groups sorted by key (nulls first), original order within groups") {
    val t = Seq((1L, Seq(3L, 1L, 2L, 1L, 3L))).toDF("id", "xs")
    val out = JqTransform(t, """{gs: (.xs | group_by(.))}""").head()
    assert(out.getSeq[scala.collection.Seq[Long]](0).map(_.toSeq).toSeq ==
      Seq(Seq(1L, 1L), Seq(2L), Seq(3L, 3L)))
    // key expression over struct elements; within-group order preserved
    val objs = JqTransform(df,
      """{items: [{k: .value, v: 1}, {k: .value * 2, v: 2}, {k: .value, v: 3}]}
        || {gs: (.items | group_by(.k) | map(map(.v)))}""".stripMargin).head()
    assert(objs.getSeq[scala.collection.Seq[Long]](0).map(_.toSeq).toSeq ==
      Seq(Seq(1L, 3L), Seq(2L)))
  }

  test("has: static for objects, runtime for maps, index-bound for arrays") {
    val out = JqTransform(df,
      """{a: ({"m": .value} | has("m")), b: ({"m": .value} | has("nope"))}""").head()
    assert(out.getBoolean(0) && !out.getBoolean(1))
    val m = Seq((1L, Map("k" -> 1L))).toDF("id", "mp")
    val r = JqTransform(m, """{a: (.mp | has("k")), b: (.mp | has("x"))}""").head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
    // arrays: has(n) ⇔ 0 ≤ n < length
    val arr = Seq((1L, Seq(10L, 20L))).toDF("id", "xs")
    val a = JqTransform(arr,
      """{a: (.xs | has(1)), b: (.xs | has(2))}""").head()
    assert(a.getBoolean(0) && !a.getBoolean(1))
  }

  test("cross-type total order: null < false < true < number < string < array < object") {
    // differential cases against jq's documented order (jq manual, "sort";
    // gojq agrees) — each rank pair, both directions
    val out = JqTransform(df,
      """{a: (null < false), b: (false < true), c: (true < .value),
        | d: (.value < "s"), e: ("s" < [1]), f: ([1] < {"x": 1}),
        | g: ("s" < .value), h: (.value <= null), i: (null >= "x"),
        | j: (null < .value)}""".stripMargin).head()
    assert(out.getBoolean(0) && out.getBoolean(1) && out.getBoolean(2) &&
      out.getBoolean(3) && out.getBoolean(4) && out.getBoolean(5))
    assert(!out.getBoolean(6) && !out.getBoolean(7) && !out.getBoolean(8))
    assert(out.getBoolean(9))
    // runtime null sorts below a non-null value of ANY static type
    val withNull = Seq((Some(1L), 2L), (None, 3L)).toDF("v", "id")
    val nn = JqTransform(withNull,
      """{lt: (.v < 0), ge: (.v >= 0), id: .id}""")
      .collect().map(r => (r.getLong(2), r.getBoolean(0), r.getBoolean(1))).sortBy(_._1)
    assert(nn.toSeq == Seq((2L, false, true), (3L, true, false)))
    // same-rank: numbers numerically, strings lexicographically,
    // arrays element-wise then length (jq: [1,2] < [1,3], [1] < [1,0])
    val sr = JqTransform(df,
      """{n: (2 < 10), s: ("10" < "2"), a1: ([1, 2] < [1, 3]),
        | a2: ([1] < [1, 0])}""".stripMargin).head()
    assert(sr.getBoolean(0) && sr.getBoolean(1) && sr.getBoolean(2) && sr.getBoolean(3))
    // objects: sorted key LISTS compare first, then values in sorted-key
    // order (jq: {"a":2} < {"b":1}; {"b":1,"a":1} == {"a":1,"b":1})
    val ob = JqTransform(df,
      """{kl: ({"a": 2} < {"b": 1}), vv: ({"a": 1, "b": 9} < {"a": 2, "b": 0}),
        | eq: ({"b": 1, "a": 2} == {"a": 2, "b": 1})}""".stripMargin).head()
    assert(ob.getBoolean(0) && ob.getBoolean(1) && ob.getBoolean(2))
    // cross-type equality: values of different types are simply unequal
    val xe = JqTransform(df,
      """{a: (1 == "1"), b: (1 != "1"), c: (null == .no_such),
        | d: ({"a": 1} == {"b": 1})}""".stripMargin).head()
    assert(!xe.getBoolean(0) && xe.getBoolean(1) && xe.getBoolean(2) && !xe.getBoolean(3))
  }

  test("sort_by: stable ascending under jq order; sort: plain ascending, nulls first") {
    val t = Seq((1L, Seq(3L, 1L, 2L, 1L))).toDF("id", "xs")
    assert(JqTransform(t, """{s: (.xs | sort)}""").head().getSeq[Long](0)
      == Seq(1L, 1L, 2L, 3L))
    // sort_by a struct key: ascending by key, ORIGINAL order within ties
    // (stability), nulls-first keys
    val objs = JqTransform(df,
      """{items: [{k: 2, v: 1}, {k: 1, v: 2}, {k: 2, v: 3}, {k: 1, v: 4}]}
        || {vs: (.items | sort_by(.k) | map(.v))}""".stripMargin).head()
    assert(objs.getSeq[Long](0) == Seq(2L, 4L, 1L, 3L))
    val nulls = JqTransform(df,
      """{items: [{k: 2, v: 1}, {k: null, v: 2}, {k: 1, v: 3}]}
        || {vs: (.items | sort_by(.k) | map(.v))}""".stripMargin).head()
    assert(nulls.getSeq[Long](0) == Seq(2L, 3L, 1L))
    // sort on a non-array is a jq-flavored error
    assertThrows[IllegalArgumentException](
      JqTransform(df, """{x: (.value | sort)}""").collect())
  }

  test("foreach: collect form [foreach …] is the scan of reduce") {
    // cumulative sums, 2-arg form (extract = the updated accumulator)
    val out = JqTransform(df,
      """{vals: [.value, .value * 3, 7]}
        || {cum: [foreach .vals[] as $v (0; . + $v)],
        |   total: (reduce .vals[] as $v (0; . + $v))}""".stripMargin).head()
    assert(out.getSeq[Long](0) == Seq(100L, 400L, 407L))
    assert(out.getLong(1) == 407L) // last scan step == the fold
    // 3-arg form: extract sees the UPDATED accumulator and $v
    val ex = JqTransform(df,
      """{vals: [2, 5, 1]}
        || {m: [foreach .vals[] as $v (0; . + $v; . * 10 + $v)]}""".stripMargin).head()
    assert(ex.getSeq[Long](0) == Seq(22L, 75L, 81L)) // (2*10+2, 7*10+5, 8*10+1)
    // empty source scans to an empty array (jq: no outputs)
    val empty = JqTransform(df,
      """{vals: [.value]} | {k: [foreach .vals[] as $v (0; . + $v)], n: 1}""")
    assert(empty.head().getSeq[Long](0) == Seq(100L))
  }

  test("foreach as a whole stage: one output row per element (jq's stream form)") {
    // scalar extract → one 'value' column
    val rows = JqTransform(df,
      """{vals: [.value, .value * 3, 7]}
        || foreach .vals[] as $v (0; . + $v)""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(100L, 400L, 407L))
    // object accumulator → columns expand; running state + carried fields
    val objs = JqTransform(df,
      """{vals: [1, 2, 3], t: .window_start}
        || foreach .vals[] as $v ({t: .t, c: 0}; {t: .t, c: (.c + $v)})""".stripMargin)
    assert(objs.columns.toSeq == Seq("t", "c"))
    assert(objs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq.fill(3)(1638357540000L).zip(Seq(1L, 3L, 6L)))
    // bare foreach in VALUE position is a parse error pointing at the forms
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""{x: foreach .v[] as $v (0; . + $v)}"""))
  }

  test("def bindings: zero-arg, $-params, composition; recursion/filter-params rejected") {
    // zero-arg def + call in an object value
    val z = JqTransform(df,
      """def base: .value + 1; {out: base}""").head()
    assert(z.getLong(0) == 101L)
    // $-params evaluate args in caller scope, bind like reduce's $x
    val p = JqTransform(df,
      """def scaled($x; $f): $x * $f + 1; {out: scaled(.value; 3)}""").head()
    assert(p.getLong(0) == 301L)
    // defs compose: later defs and the program see earlier defs
    val c = JqTransform(df,
      """def inc($x): $x + 1; def twice($x): inc($x) + inc($x);
        |{out: twice(.value)}""".stripMargin).head()
    assert(c.getLong(0) == 202L)
    // defs work inside reduce/foreach bodies
    val r = JqTransform(df,
      """def dbl($x): $x + $x;
        |{vals: [1, 2, 3]} | {s: (reduce .vals[] as $v (0; . + dbl($v)))}""".stripMargin).head()
    assert(r.getLong(0) == 12L)
    // a non-terminating self-call compiles (bounded unroll, round 8) but
    // every row hits the loud unroll-cap raise_error at runtime
    val loop = JqTransform(df, """def loop($x): loop($x); {o: loop(1)}""")
    val le = intercept[Exception](loop.head())
    assert(String.valueOf(le.getMessage).contains("unroll depth"))
    // bare filter params expand by macro substitution (round 8)
    val fp = JqTransform(df,
      """def sq(g): g * g; {o: sq(.value + 1)}""").head()
    assert(fp.getLong(0) == 101L * 101L)
    // arity mismatch is a parse-time error
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""def one($x): $x; {o: one(1; 2)}"""))
    // unknown names still error helpfully
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""{o: nosuch(1)}"""))
  }

  test("array builtins: add/any/all/unique/min/max/first/last/reverse") {
    val out = JqTransform(df,
      """{a: [3, 1, 2, 1], e: [.value], s: ["x", "y"], n: [1, null, 4]}
        || {sum: (.a | add), nsum: (.n | add), cat: (.s | add),
        |   u: (.a | unique), mn: (.a | min), mx: (.a | max),
        |   f: (.a | first), l: (.a | last), r: (.a | reverse),
        |   anyb: (.n | map(. > 2) | any), allb: (.a | map(. > 0) | all)}""".stripMargin)
      .head()
    assert(out.getLong(0) == 7L)
    assert(out.getLong(1) == 5L) // null element is identity, not poison
    assert(out.getString(2) == "xy")
    assert(out.getSeq[Long](3) == Seq(1L, 2L, 3L))
    assert(out.getLong(4) == 1L && out.getLong(5) == 3L)
    assert(out.getLong(6) == 3L && out.getLong(7) == 1L)
    assert(out.getSeq[Long](8) == Seq(1L, 2L, 1L, 3L))
    assert(out.getBoolean(9)) // 4 > 2 (null comparison element is falsy)
    assert(out.getBoolean(10))
    // add of [] is null; first/last of [] are null (documented divergence)
    val empty = JqTransform(df,
      """{e: (.ghost // [])} | {s: (.e | add), f: (.e | first)}""")
    assert(empty.head().isNullAt(0))
    // add over unsupported element types errors jq-style
    assertThrows[IllegalArgumentException](
      JqTransform(df, """{x: (.value | add)}""").collect())
  }

  test("string builtins: join/ltrimstr/rtrimstr/startswith/endswith/split") {
    val out = JqTransform(df,
      """{parts: ["a", "b", "c"], nums: [1, null, 2], s: "pre.mid.post"}
        || {j: (.parts | join("-")), jn: (.nums | join(",")),
        |   lt: (.s | ltrimstr("pre.")), lt2: (.s | ltrimstr("nope")),
        |   rt: (.s | rtrimstr(".post")), sw: (.s | startswith("pre")),
        |   ew: (.s | endswith("mid")), sp: (.s | split("."))}""".stripMargin)
      .head()
    assert(out.getString(0) == "a-b-c")
    assert(out.getString(1) == "1,,2") // nulls print empty, numbers stringify
    assert(out.getString(2) == "mid.post")
    assert(out.getString(3) == "pre.mid.post")
    assert(out.getString(4) == "pre.mid")
    assert(out.getBoolean(5) && !out.getBoolean(6))
    assert(out.getSeq[String](7) == Seq("pre", "mid", "post")) // literal '.', not regex
    // split requires a literal separator (regex quoting happens at parse)
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""{x: (.s | split(.s))}"""))
  }

  test("missing top-level field reads as jq null, not an analyzer error") {
    // the reference's records are dynamic JSON: absent key == nil
    // (counter.go:274); jq mirrors that, and so do we
    val out = JqTransform(df, """{v: .value, ghost: .no_such_field}""")
    assert(out.head().isNullAt(1))
    // the canonical use: default a maybe-missing field
    val alt = JqTransform(df, """{v: (.shard_id // .value)}""").head()
    assert(alt.getLong(0) == 100L)
    // select on a missing field drops every row (null is falsy)
    assert(JqTransform(df, """select(.no_such) | {v: .value}""").count() == 0)
    // missing nested subfield on a real struct is null too
    val nested = JqTransform(df, """{w: {s: .window_start}}""")
    assert(JqTransform(nested, """{x: .w.nope}""").head().isNullAt(0))
  }

  // ---- slurp: jq -s, the input stream as ONE array ----

  private lazy val stream = Seq(
    (2L, "b", 20L), (1L, "a", 10L), (3L, "a", 5L), (4L, "c", 40L))
    .toDF("id", "k", "v")

  test("slurp: whole input becomes one ordered array, program runs once") {
    val out = JqTransform.slurp(stream, Seq("id"),
      """{n: (. | length), total: (map(.v) | add),
        | firstk: (map(.k) | first), ks: (map(.k) | unique)}""".stripMargin)
    assert(out.columns.toSeq == Seq("n", "total", "firstk", "ks"))
    val r = out.head()
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == 75L)
    assert(r.getString(2) == "a") // id order, not insertion order
    assert(r.getSeq[String](3) == Seq("a", "b", "c"))
    assert(out.count() == 1)
  }

  test("slurp: scalar program lands in a value column; empty input = []") {
    val one = JqTransform.slurp(stream, Seq("id"), "map(.v) | max")
    assert(one.columns.toSeq == Seq("value"))
    assert(one.head().getLong(0) == 40L)
    val empty = JqTransform.slurp(stream.where("v > 1000"), Seq("id"), ". | length")
    assert(empty.head().getLong(0) == 0L) // jq -s on empty input: []
  }

  test("slurpBy: per-group arrays, one row per group, defs in scope") {
    val out = JqTransform.slurpBy(stream, Seq("k"), Seq("id"),
      """def tot: map(.v) | add;
        |{n: (. | length), t: tot, firstid: (map(.id) | first)}""".stripMargin)
      .orderBy("k")
    assert(out.columns.toSeq == Seq("k", "n", "t", "firstid"))
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(rows.map(_.getLong(1)).toSeq == Seq(2L, 1L, 1L))
    assert(rows.map(_.getLong(2)).toSeq == Seq(15L, 20L, 40L))
    assert(rows.map(_.getLong(3)).toSeq == Seq(1L, 2L, 4L)) // min id per group
  }

  test("slurpBy: sort_by/group_by over the slurped array") {
    // rank keys by per-key total: group_by(.k) → per-group sums
    val out = JqTransform.slurpBy(stream, Seq("k"), Seq("id"),
      """{vs: (. | sort_by(.v) | map(.v)), top: (. | sort_by(.v) | map(.v) | last)}""")
      .orderBy("k")
    val rows = out.collect()
    assert(rows.map(_.getSeq[Long](1)).toSeq ==
      Seq(Seq(5L, 10L), Seq(20L), Seq(40L)))
    assert(rows.map(_.getLong(2)).toSeq == Seq(10L, 20L, 40L))
  }

  // ---- regex builtins (counter.go:439-466 accepts any gojq program;
  //      test/match/capture are the most-used regex constructs) ----

  private lazy val strs = Seq(
    (1L, "user-42@example.com"), (2L, "nobody"), (3L, "agent-7@test.org"))
    .toDF("id", "s")

  test("test(re): literal pattern, anchors, and i flag") {
    val out = JqTransform(strs, """select(.s | test("^user-\\d+@")) | {id: .id}""")
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
    val ci = JqTransform(strs, """select(.s | test("NOBODY"; "i")) | {id: .id}""")
    assert(ci.collect().map(_.getLong(0)).toSeq == Seq(2L))
    // differential (jq): echo '"user-42@x"' | jq 'test("^user-\\d+@")' → true
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""{t: (.s | test("x"; "g"))}"""))
  }

  test("match(re): jq match object {offset, length, string, captures}") {
    val out = JqTransform(strs,
      """{id: .id, m: (.s | match("(?<name>[a-z]+)-(\\d+)"))}""").orderBy("id")
    val rows = out.collect()
    // differential (jq): '"user-42@example.com"' | match("(?<name>[a-z]+)-(\\d+)")
    //   → {offset: 0, length: 7, string: "user-42",
    //      captures: [{name: "name", string: "user"}, {name: null, string: "42"}]}
    val m1 = rows(0).getStruct(1)
    assert(m1.getLong(0) == 0L && m1.getLong(1) == 7L && m1.getString(2) == "user-42")
    val caps = m1.getSeq[org.apache.spark.sql.Row](3)
    assert(caps.map(c => (c.getString(0), c.getString(1))) ==
      Seq(("name", "user"), (null, "42")))
    assert(rows(1).isNullAt(1)) // "nobody": no match → null (jq: empty)
    assert(rows(2).getStruct(1).getString(2) == "agent-7")
  }

  test("match(E): computed pattern — offset/length/string subset, captures loud") {
    // per-row pattern from the data itself; flags ride as literals
    val df = Seq((1L, "user-42@example.com", "\\d+"), (2L, "nobody", "o+"),
        (3L, "agent-7@test.org", "Z"))
      .toDF("id", "s", "p")
    val out = JqTransform(df,
      """.p as $r
        || {id: .id, m: (.s | match($r))}
        || {id: .id, o: .m.offset, l: .m.length, st: .m.string}""".stripMargin)
      .orderBy("id").collect()
    // jq: "user-42@example.com" | match("\\d+") → {offset: 5, length: 2, "42"}
    assert((out(0).getLong(1), out(0).getLong(2), out(0).getString(3)) == ((5L, 2L, "42")))
    assert((out(1).getLong(1), out(1).getLong(2), out(1).getString(3)) == ((1L, 1L, "o")))
    assert(out(2).isNullAt(1) && out(2).isNullAt(3)) // no match → null
    // literal flags compose with the computed pattern
    val fl = JqTransform(df,
      """.p as $r | select(.id == 3) | {st: (.s | match("AGENT"; "i") | .string),
        | dyn: (.s | match($r; "i") | .offset)}""".stripMargin).collect()(0)
    assert(fl.getString(0) == "agent" && fl.isNullAt(1))
    // EMPTY match: jq gives {offset, 0, ""} — regexp_substr nulls the
    // empty match, so the kernel must coalesce, both literal and dynamic
    val em = JqTransform(
      Seq((1L, "abc", "x*")).toDF("id", "s", "p"),
      """.p as $r
        || {o: (.s | match($r) | .offset), l: (.s | match($r) | .length),
        |   st: (.s | match($r) | .string),
        |   ll: (.s | match("x*") | .length), ls: (.s | match("x*") | .string)}"""
        .stripMargin).collect()(0)
    assert((em.getLong(0), em.getLong(1), em.getString(2)) == ((0L, 0L, "")),
      s"dynamic empty match: $em")
    assert((em.getLong(3), em.getString(4)) == ((0L, "")), s"literal empty match: $em")
    // .captures of a dynamic match is NOT silent-null — loud rejection
    val e = intercept[IllegalArgumentException] {
      JqTransform(df, """.p as $r | {c: (.s | match($r) | .captures)}""")
        .collect()
    }
    assert(e.getMessage.contains("captures"))
    // capture() itself stays literal-only
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""{c: (.s | capture(.p))}"""))
  }

  test("capture(re): named groups become an object; no-match is null") {
    val out = JqTransform(strs,
      """{id: .id, c: (.s | capture("(?<who>[a-z]+)-(?<num>\\d+)"))}""").orderBy("id")
    val rows = out.collect()
    val c1 = rows(0).getStruct(1)
    assert(c1.schema.fieldNames.toSeq == Seq("who", "num"))
    assert(c1.getString(0) == "user" && c1.getString(1) == "42")
    assert(rows(1).isNullAt(1))
    // capture with zero named groups is a compile error (jq yields {})
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""{c: (.s | capture("(\\d+)"))}"""))
  }

  test("format strings: @text/@json/@base64/@base64d/@csv/@tsv") {
    val t = Seq((1L, "hi \"there\"", Seq("a,b", "c"), Seq(1L, 2L)))
      .toDF("id", "s", "strs", "nums")
    // differential (jq): '"hi \"there\""' | @json → "\"hi \\\"there\\\"\""
    val r = JqTransform(t,
      """{j: (.s | @json), b: (.s | @base64), rt: (.s | @base64 | @base64d),
        | t: (.id | @text), c: (.strs | @csv), v: (.nums | @csv),
        | tt: (.strs | @tsv)}""".stripMargin).head()
    assert(r.getString(0) == "\"hi \\\"there\\\"\"")
    assert(r.getString(1) ==
      java.util.Base64.getEncoder.encodeToString("hi \"there\"".getBytes("UTF-8")))
    assert(r.getString(2) == "hi \"there\"") // base64 round-trip
    assert(r.getString(3) == "1")
    assert(r.getString(4) == "\"a,b\",\"c\"") // csv quotes strings
    assert(r.getString(5) == "1,2")           // numbers unquoted
    assert(r.getString(6) == "a,b\tc")        // tsv: raw cells, tab sep
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""{x: (.s | @nope)}"""))
  }

  test("E as $x: stage-level binding spans later stages; HOF bindings shadow") {
    // differential (jq): the canonical pipe-spanning binding idiom
    val out = JqTransform(multi,
      """def inc($dv): $dv + 1;
        |(.value * 2) as $dv
        || select($dv > 0)
        || {id: .id, doubled: $dv, shadowed: inc(100)}""".stripMargin)
    val rows = out.collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 20L)))
    assert(rows.head.getLong(2) == 101L) // inc's $dv param shadowed the stage binding
    // unbound variables still fail with the full in-scope listing
    val e = intercept[IllegalArgumentException](
      JqTransform(multi, """{v: $nope}""").collect())
    assert(e.getMessage.contains("unbound variable $nope"))
  }

  test("gsub: all matches replaced, named-capture interpolation, flags") {
    val t = Seq((1L, "a-1 b-22 C-3")).toDF("id", "s")
    // differential (jq): '"a-1 b-22 C-3"' | gsub("(?<d>\\d+)"; "[\(.d)]")
    //   → "a-[1] b-[22] C-[3]"
    val g = JqTransform(t, """{r: (.s | gsub("(?<d>\\d+)"; "[\(.d)]"))}""")
    assert(g.head().getString(0) == "a-[1] b-[22] C-[3]")
    // case-insensitive flag; literal $ and \ in the replacement survive
    val ci = JqTransform(t, """{r: (.s | gsub("[a-z]-"; "$"; "i"))}""")
    assert(ci.head().getString(0) == "$1 $22 $3")
    // empty replacement deletes matches
    val del = JqTransform(t, """{r: (.s | gsub("\\d"; ""))}""")
    assert(del.head().getString(0) == "a- b- C-")
    // a ref the pattern doesn't define is a compile error
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""{r: (.s | gsub("x"; "\(.nope)"))}"""))
  }

  test("sub: first match only; no-match passes through") {
    val t = Seq((1L, "a-1 b-22"), (2L, "nodigits")).toDF("id", "s")
    // differential (jq): '"a-1 b-22"' | sub("(?<d>\\d+)"; "<\(.d)>")
    //   → "a-<1> b-22"
    val out = JqTransform(t, """{id: .id, r: (.s | sub("(?<d>\\d+)"; "<\(.d)>"))}""")
      .orderBy("id").collect()
    assert(out(0).getString(1) == "a-<1> b-22")
    assert(out(1).getString(1) == "nodigits") // jq: unchanged on no match
  }

  // ---- try/catch (static resolution: this compiler's errors are
  //      plan-construction-time) ----

  test("try: body that compiles cleanly passes through") {
    val out = JqTransform(multi, """{id: .id, v: try (.value * 2)}""")
    assert(out.orderBy("id").collect().map(_.getLong(1)).toSeq == Seq(20L, 0L, -10L))
  }

  test("try without catch: failing body folds to jq null") {
    // length of a number is a type error — jq: 'try (1 | length)' errors
    // in jq 1.6 but newer jq defines length on numbers; OUR compiler
    // rejects arrays-only builtins on scalars, so try folds it to null
    val out = JqTransform(multi, """{id: .id, u: try (.value | unique)}""")
    assert(out.collect().forall(_.isNullAt(1)))
  }

  test("try/catch: handler value replaces the failure; '.' is the error message") {
    val out = JqTransform(multi, """{id: .id, u: try (.value | unique) catch -1}""")
    assert(out.collect().map(_.getLong(1)).toSeq == Seq(-1L, -1L, -1L))
    val msg = JqTransform(multi, """{id: .id, e: try (.value | unique) catch .}""")
    assert(msg.head().getString(1).contains("unique"))
  }

  test("try/catch with // default composes (missing-field guard idiom)") {
    val out = JqTransform(multi,
      """{id: .id, n: (try (.not_there | unique) catch null) // "fallback"}""")
    assert(out.head().getString(1) == "fallback")
  }

  test("math builtins: ceil/round/sqrt/fabs/exp/log family, isnan/isinfinite") {
    val t = Seq((2.5, -2.5, 2.25, -1.0, 1000.0)).toDF("a", "b", "c", "neg", "big")
    val r = JqTransform(t,
      """{ce: (.c | ceil), ra: (.a | round), rb: (.b | round),
        | sq: (.c | sqrt), ab: (.b | fabs),
        | lg: (.c | sqrt | log2), l10: (100 | log10),
        | rt: (.c | log | exp),
        | nan: (.neg | sqrt | isnan), inf: (.big | exp | isinfinite),
        | fin: (.a | isinfinite)}""".stripMargin).head()
    assert(r.getLong(0) == 3L)          // ceil(2.25), Spark LONG like floor
    assert(r.getDouble(1) == 3.0)       // jq round: halves away from zero
    assert(r.getDouble(2) == -3.0)
    assert(r.getDouble(3) == 1.5)
    assert(r.getDouble(4) == 2.5)
    assert(r.getDouble(5) == math.log(1.5) / math.log(2.0) ||
      math.abs(r.getDouble(5) - 0.5849625007211562) < 1e-12)
    assert(r.getDouble(6) == 2.0)
    assert(math.abs(r.getDouble(7) - 2.25) < 1e-12)
    assert(r.getBoolean(8) && r.getBoolean(9) && !r.getBoolean(10))
  }

  test("type / utf8bytelength / tojson") {
    val t = Seq((1L, "héllo", Seq(1L, 2L), true)).toDF("n", "s", "arr", "b")
    val r = JqTransform(t,
      """{tn: (.n | type), ts: (.s | type), ta: (.arr | type),
        | tb: (.b | type), tm: (.missing | type),
        | bl: (.s | utf8bytelength),
        | js: (.s | tojson), jn: (.n | tojson), jm: (.missing | tojson)}"""
        .stripMargin).head()
    assert(r.getString(0) == "number" && r.getString(1) == "string")
    assert(r.getString(2) == "array" && r.getString(3) == "boolean")
    assert(r.getString(4) == "null")
    assert(r.getLong(5) == 6L) // é is 2 UTF-8 bytes
    assert(r.getString(6) == "\"héllo\"")
    assert(r.getString(7) == "1")
    assert(r.getString(8) == "null")
  }

  test("todate/fromdate: epoch seconds <-> ISO-8601 Zulu (UTC-pinned)") {
    // differential (jq): 1638357540 | todate == "2021-12-01T11:19:00Z"
    val t = Seq((1638357540L, "2021-12-01T11:19:00Z")).toDF("sec", "iso")
    val r = JqTransform(t,
      """{d: (.sec | todate), s: (.iso | fromdate),
        | rt: (.sec | todate | fromdate),
        | d2: (.sec | todateiso8601), s2: (.iso | fromdateiso8601)}"""
        .stripMargin).head()
    assert(r.getString(0) == "2021-12-01T11:19:00Z")
    assert(r.getLong(1) == 1638357540L)
    assert(r.getLong(2) == 1638357540L)
    assert(r.getString(3) == "2021-12-01T11:19:00Z" && r.getLong(4) == 1638357540L)
  }

  test("flatten: argless is full depth, flatten(d) is depth-limited") {
    val t = Seq((Seq(Seq(Seq(1L), Seq(2L)), Seq(Seq(3L))), 0L)).toDF("nest", "id")
    val full = JqTransform(t, """{f: (.nest | flatten)}""").head()
    assert(full.getSeq[Long](0) == Seq(1L, 2L, 3L))
    val one = JqTransform(t, """{f: (.nest | flatten(1))}""").head()
    assert(one.getSeq[scala.collection.Seq[Long]](0).toList.map(_.toList) ==
      List(List(1L), List(2L), List(3L)))
  }

  test("min_by/max_by: jq order and tie picks (first-min, last-max)") {
    val t = Seq((Seq((1L, "a"), (1L, "b"), (0L, "z"), (1L, "c")), 0L))
      .toDF("arr", "id")
    val r = JqTransform(t,
      """{mn: (.arr | min_by(._1)), mx: (.arr | max_by(._1))}""").head()
    val mn = r.getStruct(0)
    val mx = r.getStruct(1)
    assert(mn.getLong(0) == 0L && mn.getString(1) == "z")
    // ties on the max key: jq takes the LAST maximal element
    assert(mx.getLong(0) == 1L && mx.getString(1) == "c")
    // [] -> null
    val e = Seq((Seq.empty[Long], 0L)).toDF("arr", "id")
    assert(JqTransform(e, """{mn: (.arr | min_by(.))}""").head().isNullAt(0))
  }

  test("index/rindex: 0-based substring positions, null on no hit") {
    val t = Seq(("abcba", "b")).toDF("s", "n")
    val r = JqTransform(t,
      """{i: (.s | index("b")), ri: (.s | rindex("b")),
        | miss: (.s | index("q")), dyn: (.s | index(.n))}""".stripMargin).head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 3L)
    assert(r.isNullAt(2))
    assert(r.getLong(3) == 1L) // arg can be a value expression
  }

  test("contains/inside: strings and arrays") {
    val t = Seq(("foobar", Seq("foobar", "baz"), Seq(1L, 2L, 3L))).toDF("s", "ss", "ns")
    val r = JqTransform(t,
      """{a: (.s | contains("bar")), b: (.s | contains("qux")),
        | c: (.ss | contains(["bar"])), d: (.ns | contains([1, 3])),
        | e: (.ns | contains([4])), f: (.s | inside("xfoobarx"))}"""
        .stripMargin).head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getBoolean(2)) // array-of-strings: per-element substring match
    assert(r.getBoolean(3) && !r.getBoolean(4))
    assert(r.getBoolean(5))
  }

  test("split(re; flags): two-arg regex form") {
    val t = Seq(("a1b2c3x", "xAyAz")).toDF("s", "u")
    val r = JqTransform(t,
      """{p: (.s | split("[0-9]"; "")), q: (.u | split("a"; "i")),
        | lit: (.s | split("b2"))}""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("a", "b", "c", "x"))
    assert(r.getSeq[String](1) == Seq("x", "y", "z")) // i flag
    assert(r.getSeq[String](2) == Seq("a1", "c3x"))   // one-arg stays literal
  }

  test("..: recursive descent emits root + all sub-values in document order") {
    import org.apache.spark.sql.functions.{col, lit, struct}
    val t = Seq((1L, 0)).toDF("id", "z")
      .select(col("id"),
        struct(lit("click").as("type"),
          struct(col("id").as("uid")).as("meta")).as("payload"))
    val out = JqTransform(t, """.. | {ty: (. | type), js: (. | tojson)}""")
    val rows = out.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // variant objects store keys SORTED, so tojson over the `..` stream
    // renders sorted key order (jq preserves insertion order — documented
    // divergence of the variant encoding; values and structure identical)
    assert(rows == Seq(
      ("object", """{"id":1,"payload":{"meta":{"uid":1},"type":"click"}}"""),
      ("number", "1"),
      ("object", """{"meta":{"uid":1},"type":"click"}"""),
      ("string", "\"click\""),
      ("object", """{"uid":1}"""),
      ("number", "1")))
  }

  test(".. | ..: depth-bounded re-descent over the variant stream") {
    import org.apache.spark.sql.functions.{col, lit, struct}
    // {id: 1, payload: {meta: {uid: 1}}}: 5 nodes, root at depth 0, uid
    // at depth 3 — `.. | ..` emits each node (depth+1) times (once per
    // ancestor-or-self): root 1 + id 2 + payload 2 + meta 3 + uid 4 = 12
    // rows; scalars and nulls gain no children on the second pass
    val t = Seq(Tuple1(1L)).toDF("id")
      .select(col("id"), struct(struct(col("id").as("uid")).as("meta")).as("payload"))
    val out = JqTransform(t, """.. | .. | {ty: (. | type)}""")
    val tys = out.collect().map(_.getString(0)).toSeq.sorted
    assert(tys == Seq.fill(6)("number") ++ Seq.fill(6)("object"))
  }

  test("..: descends arrays; null branches emit their null, no descent") {
    import org.apache.spark.sql.functions.col
    val t = Seq((Seq(10L, 20L), Option.empty[Long])).toDF("arr", "gone")
      .select(col("arr"), col("gone"))
    val out = JqTransform(t, """.. | {ty: (. | type), js: (. | tojson)}""")
    val rows = out.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(
      ("object", """{"arr":[10,20]}"""), // to_json drops the null field
      ("array", "[10,20]"),
      ("number", "10"),
      ("number", "20"),
      ("null", "null")))
  }

  test("..: variant navigation — select + path + extraction builtins") {
    import org.apache.spark.sql.functions.{col, lit, struct}
    val t = Seq((1L, "x")).toDF("id", "s")
      .select(col("id"),
        struct(lit("click").as("type"), lit(5L).as("n")).as("payload"),
        struct(lit("view").as("type"), lit(7L).as("n")).as("other"))
    // every sub-object with .type == "click" (the root has no top-level
    // .type: missing reads as null and the == is false, not an error)
    val out = JqTransform(t,
      """.. | select(.type == "click") | {t: (.type | tostring), n: (.n | tonumber)}""")
    val rows = out.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(rows == Seq(("click", 5.0)))
    // select(. != null) over the stream; tonumber is null for non-numbers
    val nums = JqTransform(t,
      """.. | select((. | tonumber) != null) | {v: (. | tonumber)}""")
    assert(nums.collect().map(_.getDouble(0)).toSeq == Seq(1.0, 5.0, 7.0))
  }

  test("..: variant truthiness keeps 0/\"\" and drops false/null; .a? is a no-op") {
    import org.apache.spark.sql.functions.{col, lit, struct}
    val t = Seq((0L, "", false)).toDF("zero", "empty", "flag")
      .select(struct(col("zero"), col("empty"), col("flag")).as("o"))
    val kept = JqTransform(t, """.. | select(.) | {ty: (. | type)}""")
    // stream: root, o, zero(0 truthy), ""(truthy), false(DROPPED)
    assert(kept.collect().map(_.getString(0)).toSeq ==
      Seq("object", "object", "number", "string"))
    val opt = JqTransform(t, """{z: .o.zero?, missing: .o.nope?}""").head()
    assert(opt.getLong(0) == 0L && opt.isNullAt(1))
  }

  test("getpath: literal path on the current value; missing reads as null") {
    import org.apache.spark.sql.functions.{col, lit, struct}
    val t = Seq((1L, "x")).toDF("id", "s")
      .select(col("id"),
        struct(lit("click").as("type"),
          struct(col("id").as("uid")).as("meta")).as("payload"))
    val r = JqTransform(t,
      """{u: (.payload | getpath(["meta", "uid"])),
        | t: (.payload | getpath(["type"])),
        | miss: (.payload | getpath(["nope", "deep"]))}""".stripMargin).head()
    assert(r.getLong(0) == 1L && r.getString(1) == "click" && r.isNullAt(2))
    // over the `..` variant stream: getpath navigates via try_variant_get
    val v = JqTransform(t,
      """.. | select((. | getpath(["meta", "uid"]) | tonumber) != null)
        || {u: (.meta.uid | tonumber)}""".stripMargin)
    assert(v.collect().map(_.getDouble(0)).toSeq == Seq(1.0))
  }

  test("paths: document-order field paths; runtime nulls prune their branch") {
    import org.apache.spark.sql.functions.{col, lit, struct}
    val t = Seq((1L, "x")).toDF("id", "s")
      .select(col("id"),
        struct(lit("click").as("type"),
          lit(null).cast("bigint").as("gone"),
          struct(col("id").as("uid")).as("meta")).as("payload"))
    val out = JqTransform(t, "paths")
    val rows = out.collect().map(_.getSeq[String](0).toList).toList
    assert(rows == List(
      List("id"), List("payload"),
      List("payload", "type"),            // gone is null → pruned, like jq
      List("payload", "meta"), List("payload", "meta", "uid")))
  }

  test("paths(f): type-filter names and compiled value predicates") {
    import org.apache.spark.sql.functions.{col, lit, struct}
    val t = Seq((5L, "x")).toDF("id", "s")
      .select(col("id"), col("s"),
        struct(lit(2L).as("n"), lit("y").as("t")).as("m"))
    def run(f: String): List[List[String]] =
      JqTransform(t, s"paths($f)")
        .collect().map(_.getSeq[String](0).toList).toList
    assert(run("numbers") == List(List("id"), List("m", "n")))
    assert(run("strings") == List(List("s"), List("m", "t")))
    assert(run("objects") == List(List("m")))
    assert(run("scalars") ==
      List(List("id"), List("s"), List("m", "n"), List("m", "t")))
    // general predicate: '.' is the candidate's value; type-dispatch and
    // value tests compose (id=5 passes, m.n=2 fails)
    assert(run("""type == "number" and . > 3""") == List(List("id")))
    assert(run("""type == "string"""") == List(List("s"), List("m", "t")))
  }

  test("explode/implode: full-Unicode code-point round-trip") {
    // differential (jq 1.7): "héllo€🙂" | explode ==
    // [104,233,108,108,111,8364,128578]; implode inverts, including the
    // supplementary-plane 🙂 (surrogate-pair decode path)
    val t = Seq(("héllo€🙂", "abc")).toDF("s", "a")
    val r = JqTransform(t,
      """{cps: (.s | explode), rt: (.s | explode | implode),
        | first_cp: (.s | explode | first)}""".stripMargin).head()
    assert(r.getSeq[Long](0).toList ==
      List(104L, 233L, 108L, 108L, 111L, 8364L, 128578L))
    assert(r.getString(1) == "héllo€🙂")
    assert(r.getLong(2) == 104L)
  }

  test("explode|implode round-trips 200 random full-Unicode strings (property)") {
    val rnd = new scala.util.Random(42)
    def randCp(): Int = {
      // mix ASCII, BMP, and supplementary planes; skip the surrogate range
      rnd.nextInt(3) match {
        case 0 => 0x20 + rnd.nextInt(0x5F)
        case 1 =>
          val c = 0xA0 + rnd.nextInt(0xD800 - 0xA0)
          if (c >= 0xD800 && c <= 0xDFFF) 0x41 else c
        case 2 => 0x10000 + rnd.nextInt(0x10FFFF - 0x10000)
      }
    }
    val strs = (0 until 200).map { i =>
      val sb = new java.lang.StringBuilder
      (0 until (1 + rnd.nextInt(12))).foreach(_ => sb.appendCodePoint(randCp()))
      (i.toLong, sb.toString)
    }
    val t = strs.toDF("id", "s")
    val out = JqTransform(t,
      """{id: .id, rt: (.s | explode | implode),
        | n: (.s | explode | length)}""".stripMargin)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    strs.foreach { case (id, s) =>
      val (rt, n) = out(id)
      assert(rt == s, s"roundtrip broke for ${s.map(_.toInt)}")
      assert(n == s.codePointCount(0, s.length).toLong)
    }
  }

  test("fromjson: string → variant, navigated by | .path and getpath") {
    val t = Seq(("""{"k": 87, "tag": "x"}""", 1L)).toDF("props", "id")
    val r = JqTransform(t,
      """{k: (.props | fromjson | .k | tonumber),
        | tag: (.props | fromjson | getpath(["tag"]) | tostring),
        | ty: (.props | fromjson | type),
        | miss: (.props | fromjson | .nope | tonumber)}""".stripMargin).head()
    assert(r.getDouble(0) == 87.0)
    assert(r.getString(1) == "x")
    assert(r.getString(2) == "object")
    assert(r.isNullAt(3))
  }

  test("range: jq stream collected by [range(...)]; exhausted range is []") {
    val t = Seq((4L, 1L)).toDF("n", "one")
    val r = JqTransform(t,
      """{r1: [range(3)], r2: [range(.one; .n)], r3: [range(10; 0; -3)],
        | empty: [range(5; 5)], back: [range(3; 5; -1)],
        | s: ([range(.n)] | add)}""".stripMargin).head()
    assert(r.getSeq[Long](0).toList == List(0L, 1L, 2L))
    assert(r.getSeq[Long](1).toList == List(1L, 2L, 3L))
    assert(r.getSeq[Long](2).toList == List(10L, 7L, 4L, 1L))
    assert(r.getSeq[Long](3).isEmpty)
    assert(r.getSeq[Long](4).isEmpty)
    assert(r.getLong(5) == 6L) // 0+1+2+3
    // round 11: COMPUTED step — direction branches at runtime on its sign
    val c = JqTransform(t,
      """{up: [range(1; 10; .n)], down: [range(10; 0; 0 - .n)],
        | mis: [range(3; 5; 0 - .one)],
        | z: [range(1; 5; .n - 4)]}""".stripMargin).head()
    assert(c.getSeq[Long](0).toList == List(1L, 5L, 9L))
    assert(c.getSeq[Long](1).toList == List(10L, 6L, 2L))
    assert(c.getSeq[Long](2).isEmpty, "sign/direction mismatch is empty")
    // runtime step 0: EMPTY stream — the documented projection of jq's
    // unrepresentable infinite stream
    assert(c.getSeq[Long](3).isEmpty)
    // a LITERAL zero step still rejects at plan time
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""{x: [range(1; 10; 0)]}"""))
  }

  test("assignment stages: loud on ==, absent parents, trailing junk") {
    val t = Seq((1L, 10L)).toDF("id", "n")
    // chained assignments compose; new key appends
    val r = JqTransform(t,
      """.n = .id + 1 | .n |= . * 2 | .total = .n + 5
        || {id: .id, n: .n, total: .total}""".stripMargin).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 4L, 9L)))
    // `.a == E` is a comparison, never an assignment stage — since round
    // 8 it is a valid bare-VALUE stage (jq: one boolean output per row)
    val cmp = JqTransform(t, """.n == 3""")
    assert(cmp.columns.toSeq == Seq("value"))
    assert(cmp.head().getBoolean(0) == false)
    // nested parent must exist (static schema can't fabricate objects)
    assertThrows[IllegalArgumentException](
      JqTransform(t, """.nope.deep = 1 | {x: .id}""").head())
    assertThrows[IllegalArgumentException](
      JqTransform.compile(""".n = 1 extra"""))
  }

  test("nested [[stream]] nests; stray stream in multi-element array rejects") {
    val t = Seq((4L, 1L)).toDF("n", "one")
    // a collected [...] is a plain array VALUE — the stream flag must not
    // leak to the enclosing collector ([[range(3)]] is [[0,1,2]], not [0,1,2])
    val r = JqTransform(t,
      """{nested: [[range(3)]], two: [[range(2)], [range(.one)]]}""").head()
    assert(r.getSeq[Seq[Long]](0).toList == List(List(0L, 1L, 2L)))
    assert(r.getSeq[Seq[Long]](1).toList == List(List(0L, 1L), List(0L)))
    // jq FLATTENS a stream into a multi-element collection — out of scope,
    // rejected loudly instead of silently nesting
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""{x: [range(3), 5]}"""))
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""{x: [5, range(3)]}"""))
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""{x: [.s | splits(","), "t"]}"""))
  }

  test("scan/splits: collected streams; limit slices; scan rejects groups") {
    val t = Seq(("a1 bb22 c333", "x,y,,z")).toDF("s", "csv")
    val r = JqTransform(t,
      """{words: [.s | scan("[a-z]+")],
        | nums: ([.s | scan("[0-9]+")] | length),
        | parts: [.csv | splits(",")],
        | two: [limit(2; [.s | scan("[a-z]+")])],
        | none: [limit(0; [.s | scan("[a-z]+")])]}""".stripMargin).head()
    assert(r.getSeq[String](0).toList == List("a", "bb", "c"))
    assert(r.getLong(1) == 3L)
    assert(r.getSeq[String](2).toList == List("x", "y", "", "z"))
    assert(r.getSeq[String](3).toList == List("a", "bb"))
    assert(r.getSeq[String](4).isEmpty)
    // limit is a STREAM in field position now (jq's 0..N records):
    // one object per retained element
    val twoRows = JqTransform(t, """{w: limit(2; [.s | scan("[a-z]+")])}""")
      .collect().map(_.getString(0)).toList
    assert(twoRows == List("a", "bb"))
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""{x: [.s | scan("([a-z])+")]}"""))
    // a non-stream single element still wraps: [.s] is a 1-element array
    val w = JqTransform(t, """{a: [.s]}""").head()
    assert(w.getSeq[String](0).toList == List("a1 bb22 c333"))
  }

  test("pow/abs/infinite/nan as values") {
    val t = Seq((-3L, 2.0)).toDF("n", "x")
    val r = JqTransform(t,
      """{p: pow(.x; 10), a: (.n | abs), inf: (infinite | isinfinite),
        | nn: (nan | isnan), fa: (.n | fabs)}""".stripMargin).head()
    assert(r.getDouble(0) == 1024.0)
    assert(r.getLong(1) == 3L)       // abs preserves integer type
    assert(r.getBoolean(2) && r.getBoolean(3))
    assert(r.getDouble(4) == 3.0)    // fabs is the double form
  }

  test("del: literal-path field removal; missing path is a no-op") {
    import org.apache.spark.sql.functions.{col, lit, struct}
    val t = Seq((1L, "x")).toDF("id", "s")
      .select(col("id"),
        struct(lit("click").as("type"), lit(7L).as("k"),
          struct(col("id").as("uid"), lit(2L).as("v")).as("meta")).as("p"))
    val r = JqTransform(t,
      """{d1: (.p | del(.k) | keys), d2: (.p | del(.meta.v)),
        | noop: (.p | del(.nope) | keys)}""".stripMargin).head()
    assert(r.getSeq[String](0).toList == List("meta", "type"))
    val d2 = r.getStruct(1)
    assert(d2.schema.fieldNames.toSeq == Seq("type", "k", "meta"))
    assert(d2.getStruct(2).schema.fieldNames.toSeq == Seq("uid"))
    assert(r.getSeq[String](2).toList == List("k", "meta", "type"))
  }

  test("setpath/del with computed segments: maps jq-exact, structs field-picked") {
    import org.apache.spark.sql.functions.{col, lit, map, struct}
    val t = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
      .select(col("id"), col("k"),
        struct(lit(10L).as("a"), lit(20L).as("b")).as("p"),
        map(lit("a"), lit(10L), lit("b"), lit(20L)).as("m"))
    val r = JqTransform(t,
      """{sp: (.p | setpath([.k]; 99) | .a + .b),
        | mp: (.m | setpath([.k]; 99) | getpath(["a"])),
        | ins: (.m | setpath(["zz"]; 7) | getpath(["zz"])),
        | dl: (.m | del(.[.k]) | length)}""".stripMargin)
      .orderBy(col("sp")).collect()
    // row k="a": struct a←99 → 119; map a←99; del drops "a" → length 1
    assert(r(0).getLong(0) == 109L || r(1).getLong(0) == 109L)
    val byA = r.find(_.getLong(0) == 119L).get   // k="a": 99 + 20
    val byB = r.find(_.getLong(0) == 109L).get   // k="b": 10 + 99
    assert(byA.getLong(1) == 99L && byB.getLong(1) == 10L)
    assert(byA.getLong(2) == 7L, "computed-map setpath INSERTS new keys")
    assert(byA.getLong(3) == 1L && byB.getLong(3) == 1L)
    // computed del over a STRUCT is loud (schema-static field set) —
    // the data type only resolves at execution, so expect the analysis
    // failure wrapping the compile-time rationale
    val ex = intercept[Exception](
      JqTransform(t, """{x: (.p | del(.[.k]))}""").head())
    assert(ex.getMessage.contains("schema-static"), ex.getMessage)
    // computed setpath over a MIXED-type struct is loud (the getpath rule)
    val t2 = t.select(col("k"),
      struct(lit(1L).as("a"), lit("s").as("b")).as("p"))
    val ex2 = intercept[Exception](
      JqTransform(t2, """{x: (.p | setpath([.k]; 9))}""").head())
    assert(ex2.getMessage.contains("uniformly-typed"), ex2.getMessage)
  }

  test("leaf_paths: scalar leaves only, runtime nulls prune") {
    import org.apache.spark.sql.functions.{col, lit, struct}
    val t = Seq((1L, "x")).toDF("id", "s")
      .select(col("id"),
        struct(lit("click").as("type"),
          lit(null).cast("bigint").as("gone"),
          struct(col("id").as("uid")).as("meta")).as("payload"))
    val rows = JqTransform(t, "leaf_paths")
      .collect().map(_.getSeq[String](0).toList).toList
    assert(rows == List(
      List("id"), List("payload", "type"), List("payload", "meta", "uid")))
  }

  test("format strings: @uri/@html/@sh") {
    // differential (jq): "a b&c/~*" | @uri == "a%20b%26c%2F~%2A"
    val t = Seq(("a b&c/~*", "<a href='x'> & \"q\"", "it's", Seq("a b", "c")))
      .toDF("u", "h", "s", "arr")
    val r = JqTransform(t,
      """{u: (.u | @uri), h: (.h | @html), s: (.s | @sh), a: (.arr | @sh)}""")
      .head()
    assert(r.getString(0) == "a%20b%26c%2F~%2A")
    assert(r.getString(1) == "&lt;a href=&#39;x&#39;&gt; &amp; &quot;q&quot;")
    assert(r.getString(2) == "'it'\\''s'")
    assert(r.getString(3) == "'a b' 'c'")
  }

  // ---- round 8: divisor guards, hidden-binding cleanup, case folding ----

  test("literal zero divisor rejected at compile ('%', '/', '%=', '/=')") {
    // jq raises 'cannot be divided because the divisor is zero'; the
    // statically-visible case must fail loudly, not ship NULL
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""{x: (.value % 0)}"""))
    assertThrows[IllegalArgumentException](
      JqTransform.compile("""{x: (.value / (0))}"""))
    assertThrows[IllegalArgumentException](
      JqTransform.compile(""".value %= 0"""))
    assertThrows[IllegalArgumentException](
      JqTransform.compile(""".value /= 0.0"""))
    // nonzero divisors still compile and run
    val r = JqTransform(df, """{x: (.value % 7), y: (.value / 4)}""").head()
    assert(r.getLong(0) == 100L % 7L)
  }

  test("terminal assignment stage does not leak hidden __var_ columns") {
    val out = JqTransform(df, """.value as $x | .value = $x + 1""")
    assert(out.columns.forall(!_.startsWith("__var_")),
      s"hidden binding leaked: ${out.columns.mkString(",")}")
    assert(out.columns.toSeq == Seq("window_start", "window_end", "value"))
    assert(out.head().getAs[Long]("value") == 101L)
    // binding still visible to a LATER assignment before cleanup
    val out2 = JqTransform(df, """.value as $x | .value = $x | .value += $x""")
    assert(out2.columns.toSeq == Seq("window_start", "window_end", "value"))
    assert(out2.head().getAs[Long]("value") == 200L)
  }

  test("stream flag does not leak out of an object literal to a collector") {
    // [{b: range(3)}] must be an ARRAY OF ONE OBJECT (whose b collected),
    // not a stream-unwrap of the struct — the last field's stream flag
    // ends at the closing '}'
    val out = JqTransform(df, """{a: [{b: [range(3)]}]}""")
    val arr = out.head().getSeq[org.apache.spark.sql.Row](0)
    assert(arr.length == 1 && arr.head.getSeq[Long](0) == Seq(0L, 1L, 2L))
  }

  test("two stream fields in one construction emit their cartesian product") {
    // jq: {a: range(2), b: range(3)} yields 2×3 objects per input —
    // chained explodes, one generator per stream field (round 9; this
    // was a loud one-stream-field restriction before)
    val out = JqTransform(df, """{a: range(2), b: range(3)}""")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.count() == 6L * df.count())
    assert(rows == (for (a <- 0L to 1L; b <- 0L to 2L) yield (a, b)).toSet)
  }

  test("broken catch handler: non-error rows pass, error rows raise loudly") {
    import org.apache.spark.sql.functions.col
    // `catch .id` indexes the string error message — jq evaluates the
    // handler only on error rows, so a frame with NO error rows must run
    val clean = Seq((10L, 5L, 1L), (9L, 2L, 2L)).toDF("a", "b", "id")
    val ok = JqTransform(clean, """{r: (try (.a % .b) catch .id)}""")
      .orderBy(col("r")).collect()
    assert(ok.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    // an actual error row raises the loud handler-failed error
    val bad = Seq((20L, 0L, 2L)).toDF("a", "b", "id")
    val e = intercept[Exception](
      JqTransform(bad, """{r: (try (.a % .b) catch .id)}""").collect())
    assert(String.valueOf(e.getMessage).contains("catch handler failed"))
  }

  test("recursive def: loud runtime error past the unroll cap") {
    import org.apache.spark.sql.functions.col
    val t = Seq(Tuple1(30L)).toDF("v") // depth 30 > single-call cap 12
    val q = JqTransform(t,
      """def fact($n): if $n <= 1 then 1 else $n * fact($n - 1) end;
        |{f: fact(.v)}""".stripMargin)
    val e = intercept[Exception](q.select(col("f")).head())
    assert(e.getMessage != null &&
      e.getMessage.contains("exceeded the static unroll depth"),
      s"expected loud unroll-cap error, got: ${e.getMessage}")
    // under the cap the same program runs: 10! = 3628800
    val ok = JqTransform(Seq(Tuple1(10L)).toDF("v"),
      """def fact($n): if $n <= 1 then 1 else $n * fact($n - 1) end;
        |{f: fact(.v)}""".stripMargin).head()
    assert(ok.getDouble(0) == 3628800.0)
  }

  test("static branch pruning: type-dispatch compiles heterogeneous branches") {
    import org.apache.spark.sql.functions.col
    // inside walk every node type picks its own branch — the then-branch
    // (string op) and else-branch (number) could never type-unify in one
    // when-chain; pruning drops the inapplicable one per node
    val t = Seq((1L, "Ab"), (2L, "Cd")).toDF("n", "s")
    val out = JqTransform(t,
      """{o: ({a: .n, s: .s} | walk(if type == "string" then ascii_downcase
        |                           elif type == "number" then . + 100
        |                           else . end))}""".stripMargin)
      .orderBy(col("o.a")).collect()
    assert(out.map(r => (r.getStruct(0).getLong(0), r.getStruct(0).getString(1)))
      .toSeq == Seq((101L, "ab"), (102L, "cd")))
  }

  test("static branch pruning: value-dependent conditions stay dynamic") {
    import org.apache.spark.sql.functions.col
    // `.n > 3` must NOT be decided at plan time (both rows present in
    // the output proves per-row dispatch survived)
    val t = Seq(Tuple1(5L), Tuple1(1L)).toDF("n")
    val out = JqTransform(t, """{r: (if .n > 3 then "big" else "small" end)}""")
      .orderBy(col("r")).collect().map(_.getString(0)).toSeq
    assert(out == Seq("big", "small"))
    // ... and inside map bodies too, where the element is a lambda var
    // (the dummy analysis must not fold the value predicate either)
    val t2 = Seq(Tuple1(Seq(1L, 5L, 9L))).toDF("a")
    val m = JqTransform(t2, """{r: (.a | map(if . > 4 then 1 else 0 end))}""")
      .head().getSeq[Long](0)
    assert(m == Seq(0L, 1L, 1L))
  }

  test("walk: runtime-null containers stay null; null leaves pass through f") {
    val t = spark.sql(
      """SELECT named_struct('a', 1L, 's', 'Qq') AS m
        |UNION ALL SELECT CAST(null AS struct<a:bigint,s:string>)""".stripMargin)
    val rows = JqTransform(t,
      """{o: (.m | walk(if type == "string" then ascii_downcase else . end))}""")
      .collect()
    val vals = rows.map(r => Option(r.getStruct(0)).map(_.getString(1)))
    assert(vals.toSet == Set(Some("qq"), None))
  }

  test("map_values rejects scalars loudly; until caps like any recursion") {
    val t = Seq(Tuple1(1L)).toDF("n")
    val e = intercept[Exception](
      JqTransform(t, """{o: (.n | map_values(. + 1))}""").collect())
    assert(e.getMessage.contains("map_values expects an object or array"))
    // until is the prelude's recursive def: past the unroll cap the row
    // errs loudly instead of silently truncating the iteration
    val big = Seq(Tuple1(100000L)).toDF("v") // needs 17 doublings > cap 12
    val e2 = intercept[Exception](
      JqTransform(big, """.v as $v | {p: (1 | until(. >= $v; . * 2))}""").collect())
    assert(String.valueOf(e2.getMessage).contains("exceeded the static unroll depth"))
  }

  test("while: loud raise past the unroll cap; empty stream when cond starts false") {
    val big = Seq(Tuple1(1L)).toDF("v")
    val e = intercept[Exception](
      JqTransform(big, """{w: [.v | while(. < 100000; . * 2)]}""").collect())
    assert(String.valueOf(e.getMessage).contains("exceeded the static unroll depth"))
    val empty = JqTransform(big, """{w: [.v | while(. < 0; . * 2)]}""")
      .head().getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("trim/ltrim/rtrim: jq 1.7 string trims, loud on non-strings") {
    val t = Seq(Tuple1("  padded  ")).toDF("s")
    val r = JqTransform(t,
      """{a: (.s | trim), b: (.s | ltrim), c: (.s | rtrim)}""").head()
    assert((r.getString(0), r.getString(1), r.getString(2)) ==
      ("padded", "padded  ", "  padded"))
    val e = intercept[Exception](
      JqTransform(Seq(Tuple1(1L)).toDF("n"), """{a: (.n | trim)}"""))
    assert(e.getMessage.contains("trim expects a string"))
  }

  test("rejected builtins fail loudly with the row-model rationale") {
    val t = Seq(Tuple1(1L)).toDF("n")
    for (p <- Seq("{a: input}", "{a: (. | inputs)}", "{a: (.n | tostream)}",
                  "{a: fromstream}", "{a: halt}", "{a: (.n | halt_error)}")) {
      val e = intercept[IllegalArgumentException](JqTransform(t, p))
      assert(e.getMessage.contains("out of the row-model scope") ||
        e.getMessage.contains("no process to halt"), s"for $p: ${e.getMessage}")
    }
  }

  test("break outside a supported label tail is a loud error") {
    val t = Seq(Tuple1(1L)).toDF("n")
    val e = intercept[IllegalArgumentException](
      JqTransform(t, """{a: (break $out)}"""))
    assert(e.getMessage.contains("label body's tail stage"))
    val e2 = intercept[IllegalArgumentException](
      JqTransform(t, """{a: [label $x | .n, break $y]}"""))
    assert(e2.getMessage.contains("nested or mismatched"))
    val e3 = intercept[IllegalArgumentException](
      JqTransform(t, """{a: [label $x | if .n > 0 then break $x else empty end]}"""))
    assert(String.valueOf(e3.getMessage).nonEmpty) // unsupported tail/body is loud
  }

  test("env is a plan-time snapshot; absent vars read null") {
    val t = Seq(Tuple1(1L)).toDF("n")
    val r = JqTransform(t,
      """{p: env.PATH, q: env.GRAFT_TEST_NO_SUCH_VAR, h: (env | has("PATH"))}""")
      .head()
    assert(r.getString(0) == sys.env("PATH"))
    assert(r.isNullAt(1))
    assert(r.getBoolean(2))
  }

  test("variant objects render sorted-key JSON — the encoding's invariant, pinned") {
    // Round-10 verdict on the last cosmetic jq divergence: the variant
    // BINARY FORMAT requires object fields sorted by key name (the
    // dictionary's binary-search invariant), so insertion order is
    // unrecoverable after parse_json / `..` — a field-order-preserving
    // render would mean abandoning the variant encoding, not fixing a
    // renderer. Pinned so a format change that starts preserving order
    // surfaces here as a conscious decision.
    val t = Seq(Tuple1("""{"z": 1, "a": 2}""")).toDF("j")
    val out = JqTransform(t, """{v: (.j | fromjson | tojson)}""")
      .head().getString(0)
    assert(out == """{"a":2,"z":1}""")
  }

  test("nested assignment root resolves case-insensitively like reads") {
    import org.apache.spark.sql.functions.{col, lit, struct}
    val t = Seq((1L, 2L)).toDF("id", "k")
      .select(col("id"), struct(col("k")).as("meta"))
    // read position tolerates .Meta.k; write position must too
    val out = JqTransform(t, """.Meta.k |= . * 10 | {id: .id, k: .meta.k}""")
    assert(out.head().getLong(1) == 20L)
  }
}
