package graft

import graft.operators.JqTransform

/** DIFFERENTIAL tests of the jq compiler against the REAL `jq` binary
  * (jq-1.6 in this container — the same C implementation gojq tracks, so
  * this is as close to the reference's `counter.go:439-466` executor as
  * the sandbox offers).
  *
  * Protocol: each case is (program, JSON input lines). The input loads as
  * a DataFrame via Spark's JSON reader (schema-inferred — the dynamic-
  * JSON shape the reference feeds gojq), runs through [[JqTransform]],
  * and the output rows serialize back to JSON. The same lines pipe
  * through `/usr/bin/jq -c <program>`. Both outputs are canonicalized by
  * a second `jq -S -c .` pass (sorted keys, compact print) and compared
  * as SORTED line multisets (a distributed engine does not define row
  * order).
  *
  * Scope notes: programs end in object construction (the compiler's row
  * convention); jq-1.6 lacks 1.7 builtins (`abs`, `ltrimstr` edge
  * changes), so differential cases stick to the 1.6-stable surface.
  * Number rendering: jq prints integer-valued doubles as integers, so
  * cases keep integer arithmetic in longs on the Spark side.
  */
class JqDifferentialSpec extends SparkTestBase {

  private val jqBin = new java.io.File("/usr/bin/jq")

  /** Run a command with stdin/stdout as EXPLICIT UTF-8 bytes —
    * sys.process's lineStream decodes with the platform charset, which
    * mangles jq's UTF-8 output under a C locale.
    */
  private def runUtf8(cmd: Seq[String], input: String): Seq[String] = {
    val pb = new java.lang.ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    val out = new java.io.ByteArrayOutputStream
    val writer = new Thread(() => {
      proc.getOutputStream.write(input.getBytes("UTF-8"))
      proc.getOutputStream.close()
    })
    writer.start()
    val buf = new Array[Byte](8192)
    val is = proc.getInputStream
    var n = is.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = is.read(buf) }
    writer.join()
    proc.waitFor()
    new String(out.toByteArray, "UTF-8").split("\n").toSeq
      .filter(_.nonEmpty)
  }

  private def realJq(program: String, inputLines: Seq[String]): Seq[String] =
    runUtf8(Seq("/usr/bin/jq", "-c", program), inputLines.mkString("\n"))

  private def canon(lines: Seq[String]): Seq[String] = {
    if (lines.isEmpty) return Nil
    runUtf8(Seq("/usr/bin/jq", "-S", "-c", "."), lines.mkString("\n"))
  }

  private def sparkJq(program: String, inputLines: Seq[String]): Seq[String] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val df = spark.read.json(inputLines.toDS)
    val out = JqTransform(df, program)
    // toJSON drops null fields; jq keeps them — serialize with nulls
    out.select(to_json(struct(out.columns.map(col).toSeq: _*),
        Map("ignoreNullFields" -> "false")).as("j"))
      .collect().map(_.getString(0)).toSeq
  }

  private def check(program: String, inputLines: Seq[String]): Unit = {
    val ours = canon(sparkJq(program, inputLines)).sorted
    val jqs = canon(realJq(program, inputLines)).sorted
    assert(ours == jqs,
      s"""divergence for: $program
         |input : ${inputLines.mkString(" | ")}
         |spark : ${ours.mkString(" ; ")}
         |jq    : ${jqs.mkString(" ; ")}""".stripMargin)
  }

  private val rows = Seq(
    """{"id": 1, "et": "click", "value": 10, "tags": ["a", "b"], "meta": {"k": 5, "s": "xy"}}""",
    """{"id": 2, "et": "view", "value": 0, "tags": [], "meta": {"k": 0, "s": ""}}""",
    """{"id": 3, "et": "signup", "value": 7, "tags": ["c"], "meta": {"k": 9, "s": "z"}}""")

  override def withFixture(test: NoArgTest) = {
    assume(jqBin.canExecute, "/usr/bin/jq not present")
    super.withFixture(test)
  }

  test("object construction, renames, literals") {
    check("""{i: .id, t: .et, c: 7, f: false, n: null}""", rows)
  }

  test("arithmetic and parentheses") {
    check("""{s: (.id + .value * 2), d: (.meta.k - .id)}""", rows)
  }

  test("select truthiness: 0 and \"\" are truthy, null/false falsy") {
    check("""select(.value > 0) | {i: .id}""", rows)
    check("""select(.meta.s) | {i: .id}""", rows) // "" is truthy
    check("""select(.missing) | {i: .id}""", rows) // null → drop all
  }

  test("nested paths and missing fields read as null") {
    check("""{k: .meta.k, gone: .meta.nope, deep: .nope1}""", rows)
  }

  test("string interpolation and tostring") {
    check("""{m: "ev.\(.et)", v: (.id | tostring)}""", rows)
  }

  test("array builtins: length, add, first/last, reverse, sort, unique") {
    check("""{n: (.tags | length), j: (.tags | join(","))}""", rows)
    check("""{r: (.tags | reverse), s: (.tags | sort), u: (.tags | unique)}""", rows)
  }

  test("map over arrays with element-bound '.'") {
    check("""{up: (.tags | map(. + "!"))}""", rows)
  }

  test("comma stage: N outputs per row") {
    check("""{a: .id}, {a: .value}""", rows)
  }

  test("array iteration stage: .tags[]") {
    check(""".tags[] | {t: .}""", Seq("""{"tags": ["x", "y", "z"]}"""))
  }

  test("if/elif/else with jq truthiness") {
    check("""{c: (if .value > 5 then "hi" elif .value > 0 then "mid" else "lo" end)}""", rows)
  }

  test("alternative operator //") {
    check("""{v: (.missing // .id), w: (.meta.nope // "dflt")}""", rows)
  }

  test("keys, has, to_entries on objects") {
    check("""{k: (.meta | keys), h: (.meta | has("k"))}""", rows)
    // to_entries: uniform value types differential; MIXED types fall back
    // to string values (documented static-schema divergence, not checked)
    check("""{e: (.o | to_entries)}""", Seq("""{"o": {"a": 1, "b": 2}}"""))
  }

  test("regex: test, capture, gsub") {
    check("""select(.et | test("^(?:click|view)$")) | {i: .id}""", rows)
    check("""{c: (.et | capture("^(?<h>[a-z])(?<t>[a-z]+)$")), g: (.et | gsub("[aeiou]"; "*"))}""", rows)
  }

  test("split, ltrimstr, startswith, contains") {
    check("""{p: (.et | split("i")), l: (.et | ltrimstr("cl")), sw: (.et | startswith("c")), c: (.et | contains("ick"))}""", rows)
  }

  test("reduce as a fold") {
    check("""{s: (reduce .tags[] as $x (""; . + $x))}""", rows)
  }

  test("string explode/implode round-trip (codepoints)") {
    check("""{cps: (.et | explode), rt: (.et | explode | implode)}""", rows)
  }

  test("range collect forms") {
    check("""{r1: [range(3)], r2: [range(1; 4)], r3: [range(10; 0; -3)], e: [range(5; 5)]}""",
      Seq("""{"x": 1}"""))
  }

  test("nested stream collection [[range(n)]] nests like jq") {
    check("""{n: [[range(3)]], two: [[range(2)], [range(1)]]}""",
      Seq("""{"x": 1}"""))
  }

  test("scan and splits collect forms") {
    check("""{w: [.s | scan("[a-z]+")], p: [.s | splits(",")]}""",
      Seq("""{"s": "ab1cd,ef,,gh"}"""))
  }

  test("limit over a collected stream") {
    check("""{two: [limit(2; .tags[])]}""",
      Seq("""{"tags": ["x", "y", "z"]}"""))
  }

  test("del removes a field; missing del is a no-op") {
    check("""{d: (.meta | del(.k))}""", rows)
  }

  test("paths and leaf_paths enumerate document order") {
    check("""paths | {p: .}""",
      Seq("""{"a": 1, "b": {"c": 2}}"""))
    check("""leaf_paths | {p: .}""",
      Seq("""{"a": 1, "b": {"c": 2}}"""))
  }

  test("math: floor, sqrt, pow, fabs on integer-valued results") {
    check("""{f: (.value | floor), p: pow(2; 10)}""", rows)
  }

  test("type names") {
    check("""{t1: (.id | type), t2: (.et | type), t3: (.tags | type), t4: (.meta | type), t5: (.missing | type)}""", rows)
  }

  test("tojson and utf8bytelength") {
    check("""{j: (.et | tojson), b: (.et | utf8bytelength)}""", rows)
  }

  test("group_by / sort_by on object arrays") {
    check("""{g: (.xs | group_by(.k)), s: (.xs | sort_by(.v))}""",
      Seq("""{"xs": [{"k": "b", "v": 3}, {"k": "a", "v": 1}, {"k": "b", "v": 2}]}"""))
  }

  test("min_by/max_by tie picks") {
    check("""{mn: (.xs | min_by(.v)), mx: (.xs | max_by(.v))}""",
      Seq("""{"xs": [{"k": "b", "v": 1}, {"k": "a", "v": 1}, {"k": "c", "v": 2}]}"""))
  }

  test("flatten") {
    check("""{f: (.xs | flatten)}""", Seq("""{"xs": [[1, 2], [3]]}"""))
  }

  test("index/rindex") {
    check("""{i: (.et | index("i")), r: (.et | rindex("i"))}""", rows)
  }

  test("format strings @base64 round-trip, @csv, @uri") {
    check("""{b: (.et | @base64), rt: (.et | @base64 | @base64d), u: (.et | @uri)}""", rows)
    check("""{c: (.xs | @csv), t: (.xs | @tsv)}""",
      Seq("""{"xs": ["a,b", "c\"d"]}"""))
  }

  test("def bindings with $-params") {
    check("""def twice($x): $x + $x; {d: twice(.id)}""", rows)
  }

  test("foreach scan collect form") {
    check("""{sums: [foreach .xs[] as $x (0; . + $x)]}""",
      Seq("""{"xs": [1, 2, 3, 4]}"""))
  }

  test("stage-level binding E as $x") {
    check(""".id as $i | select(.value > $i) | {i: $i, v: .value}""", rows)
  }

  test("value-position binding (E as $x | body), nested and shadow-free") {
    check("""{y: (.id as $x | $x + $x), m: (.meta.k as $k | $k * 2 + .id)}""", rows)
    // nested bindings: both in scope in the inner body
    check("""{z: (.value as $v | (.id as $i | $v + $i))}""", rows)
    // binding feeding a reduce whose own $x shadows nothing
    check("""{s: (.id as $base | (reduce .tags[] as $t ("n"; . + $t)) )}""", rows)
  }

  test("assignment operators: =, |=, +=, -=, *=, //= with jq scoping") {
    // '=' RHS sees the row; new top-level key appends
    check(""".value = .id + 1 | {i: .id, v: .value}""", rows)
    check(""".extra = "tag" | {e: .extra, i: .id}""", rows)
    // '|=' RHS sees the OLD path value
    check(""".value |= . * 3 | {v: .value}""", rows)
    check(""".et |= ascii_upcase | {e: .et}""", rows)
    // op=: old op (row-scoped rhs); '+' polymorphic (string concat too)
    check(""".value += .meta.k | {v: .value}""", rows)
    check(""".value -= 2 | .value *= 5 | {v: .value}""", rows)
    check(""".et += "!" | {e: .et}""", rows)
    // nested path in place
    check(""".meta.k |= . + 1 | {k: .meta.k}""", rows)
    check(""".meta.s = "zz" | {s: .meta.s, k: .meta.k}""", rows)
    // //=: keep truthy old (0 IS truthy in jq), fill absent
    check(""".value //= 77 | {v: .value}""", rows)
    check(""".missing //= .id | {m: .missing}""", rows)
  }

  test("one-level destructuring: as [$a,$b] and as {k:$x, $y}") {
    // array pattern: element i, null past the end ([] → all null)
    check(""".tags as [$a, $b] | {a: $a, b: $b, i: .id}""", rows)
    check("""{p: (.tags as [$x] | ($x // "none"))}""", rows)
    // object pattern: named keys, {$k} shorthand, absent key → null
    check(""".meta as {k: $kk, s: $ss} | {kk: $kk, ss: $ss}""", rows)
    check(""".meta as {$k} | {v: $k, i: .id}""", rows)
    check("""{q: (.meta as {nope: $n} | $n), i: .id}""", rows)
  }

  test("binding precedence: jq binds a TERM, negation stays outside") {
    // jq has no negative literals: -6 as $v | body == -(6 as $v | body)
    check("""{a: (-6 as $v | $v + .id)}""", rows)
    // Exp '-' Exp: the right operand is the whole binding expression
    check("""{d: (0 - 6 as $v | $v)}""", rows)
    // binding binds the term `1`, not `.id + 1`
    check("""{m: (.id + 1 as $x | $x)}""", rows)
    // parenthesized source IS a term: the whole sum binds
    check("""{p: ((.id + 1) as $x | $x * 2)}""", rows)
  }

  test("polymorphic *: deep object merge and string repetition") {
    // deep merge: both-object keys recurse, right wins elsewhere
    check("""{a: ({"x": {"p": 1, "q": 2}, "y": 1} * {"x": {"q": 9, "r": 3}, "z": 5})}""",
      Seq("""{"u": 1}"""))
    // explicit right-null value wins (NullType field, not runtime null)
    check("""{f: ({"x": {"p": 1}} * {"x": null})}""", Seq("""{"u": 1}"""))
    check("""{g: ({"x": null} * {"x": {"p": 1}})}""", Seq("""{"u": 1}"""))
    // shallow merge on the data row's meta
    check("""{m: (.meta * {"k": 99, "w": 1})}""", rows)
    // string repetition, both operand orders; <= 0 → null; fractional truncates
    check("""{b: (.et * 2), d: (3 * .et), z: (.et * 0), e: (.et * 1)}""", rows)
  }

  test("general parenthesized pipe body: '.' = the piped value") {
    check("""{x: (.meta | (.k + 10)), y: ((.meta | (.k * 2)) + 1)}""", rows)
    check("""{o: (.meta | {kk: .k, tag: "m"}), s: (.id | "\(.)-id")}""", rows)
    check("""{n: (.tags | ((. | length) + 100))}""", rows)
  }

  test("unparenthesized pipe body: jq's pipe-lowest precedence") {
    check("""{a: (.meta | .k + 10), b: (.meta | .k * 2 - 1)}""", rows)
    check("""{c: (.meta | .k == 5), d: (.meta | .k >= 1 and .k <= 9)}""", rows)
    check("""{e: (.meta | .k as $q | $q * 3 + .k)}""", rows)
  }

  test("deep containment: objects, nested arrays, substring leaves") {
    check("""{a: ({"x": 1, "s": "foobar", "o": {"p": 2, "q": "zz"}}
            |     | contains({"s": "oba", "o": {"p": 2}})),
            | b: ({"x": 1} | contains({"x": 2})),
            | d: ({"xs": ["abc", "def"]} | contains({"xs": ["bc"]})),
            | e: ({"x": null} | contains({"x": null}))}""".stripMargin,
      Seq("""{"u": 1}"""))
    // the select-filter shape deep containment exists for
    check("""select(.meta | contains({s: "x"})) | {i: .id}""", rows)
    check("""{ins: ({"p": 2} | inside({"p": 2, "q": 1}))}""", Seq("""{"u": 1}"""))
  }

  test("setpath: update, nested update, new leaf key") {
    check("""{m: (.meta | setpath(["k"]; 42)), i: .id}""", rows)
    check("""{m: ({"a": {"b": 1, "c": 2}} | setpath(["a", "b"]; 9))}""",
      Seq("""{"u": 1}"""))
    check("""{m: ({"a": 1} | setpath(["z"]; "new"))}""", Seq("""{"u": 1}"""))
  }

  test("with_entries: rename keys and rescale values") {
    check("""{m: ({"a": 1, "b": 2} | with_entries({key: (.key + "x"), value: (.value * 10)}))}""",
      Seq("""{"u": 1}"""))
    // last-wins on key collisions introduced by the mapping
    check("""{m: ({"a": 1, "b": 2} | with_entries({key: "same", value: .value}))}""",
      Seq("""{"u": 1}"""))
  }

  test("string division splits literally; % truncates like C") {
    // literal separator (regex metachars must not fire), empties kept
    check("""{a: ("a,b,c" / ","), b: ("a,,b," / ","), s: ("x.y.z" / ".")}""",
      Seq("""{"u": 1}"""))
    check("""{c: ("abc" / ""), h: ("abc" / "abc")}""", Seq("""{"u": 1}"""))
    check("""{m: (.id % 3), n: ((0 - .id) % 3), v: (.value % 4)}""", rows)
    check(""".value %= 7 | {v: .value}""", rows)
  }

  test("object merge +: right bias, key order, null-value wins") {
    check("""{m: (.meta + {"k": 99, "w": 1})}""", rows)
    check("""{m: ({"a": 1, "b": 2} + {"b": null, "c": 3})}""", rows)
    check("""{m: (.meta + {"s": "zz"}), i: .id}""", rows)
  }

  test("fromjson navigation") {
    check("""{k: (.js | fromjson | .k | tonumber)}""",
      Seq("""{"js": "{\"k\": 42}"}"""))
  }

  // -------------------------------------------------- second tranche --

  test("tostring renders containers as JSON; null length is 0") {
    check("""{s: (.tags | tostring), o: (.meta | tostring), nl: (.missing | length), ol: (.meta | length)}""", rows)
  }

  test("polymorphic + : string concat, array concat, null identity") {
    check("""{sc: (.et + "!"), ac: (.tags + ["z"]), ni: (.missing + .id), in: (.id + .missing)}""", rows)
  }

  test("and/or with comparisons") {
    check("""{b: (.value > 0 and .id < 3), o: (.value > 5 or .id > 2)}""", rows)
  }

  test("object equality ignores field order") {
    check("""{e: (.meta == {"s": "xy", "k": 5})}""", rows)
  }

  test("string interpolation with expressions and null rendering") {
    check("""{m: "v\(.id + 1)x", n: "got \(.missing)"}""", rows)
  }

  test("sub with named-capture replacement") {
    check("""{s: (.et | sub("(?<v>[aeiou])"; "<\(.v)>"))}""", rows)
  }

  test("regex flags: case-insensitive test") {
    check("""{t: (.et | test("CLICK"; "i"))}""", rows)
  }

  test("has on arrays is a bounds check") {
    check("""{h0: (.tags | has(0)), h9: (.tags | has(9))}""", rows)
  }

  test("division yields doubles like jq") {
    check("""{d: (.value / 4)}""", Seq("""{"value": 10}"""))
  }

  test("explode/implode on full Unicode vs jq") {
    check("""{cps: (.s | explode), rt: (.s | explode | implode)}""",
      Seq("""{"s": "héllo€🙂"}"""))
  }

  test("foreach stage form pipes into a follow-on object stage") {
    check("""foreach .xs[] as $x (0; . + $x) | {v: .}""",
      Seq("""{"xs": [1, 2, 3]}"""))
  }

  test("recursive descent types") {
    check(""".. | {t: (. | type)}""",
      Seq("""{"a": 1, "b": {"c": "x"}}"""))
  }

  test("double recursive descent: subtree-of-subtree multiset") {
    // a node at depth d appears d+1 times in `.. | ..` (once per
    // ancestor-or-self) — the multiplicities must match jq exactly.
    // Input keys pre-sorted so the variant's sorted-key tojson rendering
    // cannot diverge from jq's insertion order.
    check(""".. | .. | {t: (. | type)}""",
      Seq("""{"a": 1, "b": {"c": "x", "d": [2, 3]}}"""))
    // (array kept homogeneous: Spark's JSON inference strings-out a
    // mixed [1,[2,3]] before the descent ever runs)
    check(""".. | .. | {j: (. | tojson)}""",
      Seq("""{"a": [[1], [2, 3]], "b": "y"}"""))
    // and a third descent still composes (depth bound carries through)
    check(""".. | .. | .. | {t: (. | type)}""",
      Seq("""{"a": {"b": 5}}"""))
  }

  test("slurp: whole input as one array (jq -s)") {
    val program = """{n: length, s: (map(.id) | add), f: (first | .id)}"""
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val df = spark.read.json(rows.toDS)
    val out = JqTransform.slurp(df, Seq("id"), program)
    val ours = canon(out.select(to_json(struct(out.columns.map(col).toSeq: _*),
        Map("ignoreNullFields" -> "false")).as("j"))
      .collect().map(_.getString(0)).toSeq).sorted
    val jqs = canon(runUtf8(Seq("/usr/bin/jq", "-c", "-s", program),
      rows.mkString("\n"))).sorted
    assert(ours == jqs, s"slurp divergence:\n$ours\nvs\n$jqs")
  }

  test("group_by key ordering with nulls first") {
    check("""{g: (.xs | group_by(.k) | map(map(.v)))}""",
      Seq("""{"xs": [{"k": "b", "v": 1}, {"k": "a", "v": 2}, {"k": "b", "v": 3}]}"""))
  }

  test("the reference's own fixture jq programs run verbatim vs real jq") {
    // every jq_expr in /root/reference/testdata/*.yaml, extracted from
    // the read-only checkout and run over synthetic O13 output records —
    // a reference user's configs pass the real-jq differential unmodified
    val dir = new java.io.File("/root/reference/testdata")
    assume(dir.isDirectory, "reference checkout not present")
    val programs = dir.listFiles().filter(_.getName.endsWith(".yaml")).toSeq
      .flatMap { f =>
        val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toList
        lines.zipWithIndex.collect {
          case (l, i) if l.trim == "jq_expr: |" => lines(i + 1).trim
        }
      }
    assert(programs.nonEmpty, "expected jq_expr blocks in the reference fixtures")
    val o13Rows = Seq(
      """{"event_source_arn": "arn:aws:kinesis:ap-northeast-1:1:stream/s",
         "window_start": 1638357540000, "window_end": 1638357600000,
         "counter_id": "user_count", "counter_type": "count", "value": 93}"""
        .replaceAll("\n\\s*", " "),
      """{"event_source_arn": "arn:aws:kinesis:ap-northeast-1:1:stream/s",
         "window_start": 1638357600000, "window_end": 1638357660000,
         "counter_id": "user_count", "counter_type": "count", "value": 0}"""
        .replaceAll("\n\\s*", " "))
    programs.foreach(p => check(p, o13Rows))
  }

  test("getpath piped, keys sorted, from_entries last-wins") {
    check("""{g: (.meta | getpath(["k"])), ks: (.meta | keys)}""", rows)
    check("""{m: (.es | from_entries)}""",
      Seq("""{"es": [{"key": "a", "value": 1}, {"key": "b", "value": 2}, {"key": "a", "value": 3}]}"""))
  }

  // ---- round 8: true multi-output stream semantics at record level ----

  test("stream field in a stage construction: one object per element") {
    // jq: {id: 1, t: "a"}, {id: 1, t: "b"}, ...; empty tags emit nothing
    check("""{id: .id, t: .tags[]}""", rows)
    check("""{id: .id, n: range(3)}""", Seq("""{"id": 7}"""))
    check("""{id: .id, w: (.meta.s | splits("y"))}""", rows)
  }

  test("bare stream stage explodes: range / scan / splits across stages") {
    check("""range(3) | {n: .}""", Seq("""{"x": 1}"""))
    check(""".et | scan("[aeiou]+") | {v: .}""", rows)
    check(""".meta.s | splits("y") | {part: .}""", rows)
    check(""".tags[] | {t: .}""", rows) // empty array row drops, like jq
  }

  test("bare value stage: .a + 1 and value filters as stages") {
    check(""".value + 1 | {v: .}""", rows)
    check(""".et | length | {n: .}""", rows)
  }

  test("limit as a stage streams first n") {
    check("""limit(2; .tags[]) | {t: .}""",
      Seq("""{"tags": ["x", "y", "z"]}"""))
  }

  // ---- round 8: DATA-DEPENDENT try/catch (jq errors at runtime) ----

  test("runtime try/catch: zero-divisor message matches jq verbatim") {
    check("""{m: (try (.a % .b) catch .)}""", Seq("""{"a": 5, "b": 0}"""))
    check("""{m: (try (.a / .b) catch .)}""", Seq("""{"a": 9, "b": 0}"""))
  }

  test("runtime try/catch: mixed rows, numeric handler") {
    check("""{m: (try (.a / .b) catch -1)}""",
      Seq("""{"a": 9, "b": 0}""", """{"a": 8, "b": 2}"""))
    check("""{m: (try (.a % .b) catch -1)}""",
      Seq("""{"a": 5, "b": 0}""", """{"a": 7, "b": 3}"""))
  }

  test("runtime try/catch: tonumber on garbage routes to the handler") {
    check("""{n: (try (.s | tonumber) catch -1)}""",
      Seq("""{"s": "abc"}""", """{"s": "42"}""", """{"s": ""}""",
        """{"s": " 7"}"""))
  }

  test("runtime try/catch: fromjson garbage routes to the handler") {
    check("""{v: (try (.j | fromjson | .k | tostring) catch "bad")}""",
      Seq("""{"j": "{\"k\": 1}"}""", """{"j": "{nope"}"""))
  }

  test("runtime try/catch: nested try owns only its body's errors") {
    // inner try handles tonumber; outer sees no error for these rows
    check("""{n: (try (try (.s | tonumber) catch -1) catch -2)}""",
      Seq("""{"s": "abc"}""", """{"s": "5"}"""))
  }

  // ---- round 8: recursive defs (bounded static unroll) ----

  test("recursive def: factorial matches jq") {
    check("""def fact($n): if $n <= 1 then 1 else $n * fact($n - 1) end;
             {f: fact(.v), f0: fact(0)}""",
      Seq("""{"v": 1}""", """{"v": 5}""", """{"v": 10}"""))
  }

  test("recursive def: double recursion (fib) matches jq") {
    check("""def fib($n): if $n < 2 then $n else fib($n - 1) + fib($n - 2) end;
             {f: fib(.v)}""",
      Seq("""{"v": 0}""", """{"v": 1}""", """{"v": 5}"""))
  }

  // ---- round 8: def FILTER params (caller-context macro semantics) ----

  test("def filter params: re-evaluated per reference, caller context") {
    check("""def twice(f): f + f; {x: twice(.id), y: twice(.value + 1)}""", rows)
    check("""def over(f): .tags | map(f); {m: over(. + "!")}""", rows)
    check("""def mix($a; f): $a + f; {z: mix(10; .value)}""", rows)
    // object KEY stays literal; the value position substitutes (jq rule)
    check("""def f(g): {g: g}; {o: f(.id + 1)}""", rows)
    // filter param inside string interpolation holes substitutes
    check("""def tag(f): "v=\(f)!"; {s: tag(.id * 2)}""", rows)
  }

  // ---- round 8: nested destructuring + ?// pattern alternatives ----

  test("nested array/object destructuring patterns") {
    // (elements uniformly array-typed: Spark's JSON inference would read
    // jq's heterogeneous [1, [2, 3]] as array<string>)
    check(""".v as [[$a], [$b, $c]] | {a: $a, b: $b, c: $c}""",
      Seq("""{"v": [[1], [2, 3]]}""", """{"v": [[7], []]}"""))
    check(""".v as {k: [$x, $y], $m} | {x: $x, y: $y, m: $m}""",
      Seq("""{"v": {"k": [9, 8], "m": "q"}}""", """{"v": {"m": "w"}}"""))
  }

  test("?// alternatives: first type-compatible pattern wins, rest null") {
    // array-typed column → first pattern; object keys from the unchosen
    // alternative ride along as null (jq's rule)
    check(""".v as [$a, $b] ?// {a: $a, b: $b} | {a: $a, b: $b}""",
      Seq("""{"v": [1, 2]}""", """{"v": [5]}"""))
    // object-typed column → second pattern
    check(""".v as [$a, $b] ?// {a: $a, b: $b} | {a: $a, b: $b}""",
      Seq("""{"v": {"a": 5, "b": 7}}"""))
    // names bound ONLY by the unchosen alternative are null in the body
    check(""".v as [$a] ?// {z: $z} | {a: $a, z: $z}""",
      Seq("""{"v": [1]}"""))
  }

  // ---- round 8, second tranche: walk / map_values / until / pipe-to-def ----

  test("walk: type-dispatch over nested objects and arrays") {
    // the classic builtin.jq idiom — strings lowercased at every depth
    check("""{o: ({a: .id, s: .et, inner: {t: .tags, m: .meta}}
            |     | walk(if type == "string" then ascii_downcase else . end))}"""
      .stripMargin,
      Seq("""{"id": 1, "et": "CLICK", "tags": ["A", "Bb"], "meta": {"k": 5, "s": "Xy"}}""",
        """{"id": 2, "et": "View", "tags": [], "meta": {"k": 0, "s": ""}}"""))
    // numbers scaled bottom-up, containers untouched
    check("""{o: ({v: .value, w: [.value, 3]} | walk(if type == "number" then . * 2 else . end))}""",
      rows)
    // f over the CONTAINER too (bottom-up: leaves first, then the object)
    check("""{o: ({a: 1, b: 2} | walk(if type == "object" then {n: (. | length)} else . end))}""",
      Seq("""{"id": 1}"""))
  }

  test("map_values: objects, arrays, and type-dispatched bodies") {
    check("""{o: (.meta | map_values(. == 5))}""",
      Seq("""{"meta": {"k": 5, "j": 7}}""", """{"meta": {"k": 2, "j": 5}}"""))
    check("""{o: (.tags | map_values(. + "!"))}""", rows)
    // heterogeneous field types dispatch per field
    check("""{o: (.meta | map_values(if type == "string" then ascii_downcase else . end))}""",
      rows)
  }

  test("while: emit-and-iterate stream, collected and exploded") {
    // the canonical doubling chain, collected
    check(""".value as $v | {w: [$v | while(. < 100; . * 2)]}""",
      Seq("""{"value": 3}""", """{"value": 64}""", """{"value": 200}"""))
    // record-level: a stream field explodes to 0..N records (an
    // initially-false cond is jq's empty stream — the record drops)
    check("""{id: .id, g: (.n | while(. < 4; . + 1))}""",
      Seq("""{"id": 1, "n": 1}""", """{"id": 2, "n": 9}"""))
    // a user def named while shadows the builtin (jq's rule)
    check("""def while(a; b): 7; {x: (1 | while(. < 0; .))}""",
      Seq("""{"id": 1}"""))
  }

  test("first(f)/last(f): stream args pick an end, single-output args pass") {
    check("""{a: (.n | first(while(. < 40; . * 3))),
            | b: (.n | last(while(. < 40; . * 3)))}""".stripMargin,
      Seq("""{"n": 5}""", """{"n": 2}"""))
    // a single-output f is the one-element stream — the value itself
    check("""{a: (.xs | first(map(. * 2)))}""",
      Seq("""{"xs": [1, 2]}"""))
    check("""{z: (.n | last(range(1; .)))}""", Seq("""{"n": 4}"""))
  }

  test("first/last over an EMPTY stream emit nothing — the record drops") {
    // n=9 starts past the bound: while yields no outputs, first(empty)
    // is empty, and jq emits NO object for that input
    check("""{a: (.n | first(while(. < 5; . + 2))), b: .n}""",
      Seq("""{"n": 1}""", """{"n": 9}"""))
    // …but last(empty) is jq's `reduce f as $x (null; $x)` — the init
    // NULL comes out and the record is KEPT
    check("""{a: (.n | last(while(. < 5; . + 2)))}""",
      Seq("""{"n": 0}""", """{"n": 7}"""))
    // collected, the empty stream is [] — not [null]
    check("""{a: [(.n | first(while(. < 5; . + 2)))]}""",
      Seq("""{"n": 2}""", """{"n": 8}"""))
  }

  test("several stream-valued fields emit their cartesian product") {
    check("""{a: range(2), b: range(3)}""", Seq("""{"id": 1}"""))
    // an empty stream in the product drops the record entirely
    check("""{a: range(2), b: (.n | first(while(. < 3; . + 1)))}""",
      Seq("""{"n": 0}""", """{"n": 5}"""))
  }

  test("until: iterate update while cond is false (prelude def)") {
    // smallest power of 2 >= v (integer-valued doubles print as ints in
    // both engines after the unroll cap's double coercion)
    check(""".value as $v | {id: .id, p2: (1 | until(. >= $v; . * 2))}""",
      Seq("""{"id": 1, "value": 10}""", """{"id": 2, "value": 1}""",
        """{"id": 3, "value": 63}"""))
    // a user def named until SHADOWS the prelude (jq's rule)
    check("""def until(a; b): 42; {x: (1 | until(. > 0; .))}""",
      Seq("""{"id": 1}"""))
  }

  test("pipe into a def call binds '.' to the piped value") {
    check("""def halve: . / 2; {h: (.value + 4 | halve)}""",
      Seq("""{"value": 10}""", """{"value": 4}"""))
    check("""def add1(f): f + 1; {z: (.value | add1(. * 3))}""",
      Seq("""{"value": 5}"""))
  }

  test("bracket assignment paths: [] maps, [i] updates in place, [n] pads") {
    // `.tags[] |= f` — every element through one codegen'd transform
    check(""".tags[] |= ascii_downcase | {t: .tags}""",
      Seq("""{"tags": ["A", "Bb", "cC"]}""", """{"tags": []}"""))
    // object values via the struct rebuild (jq's `.obj[] |= f`)
    check(""".meta[] |= (. * 10) | {m: .meta}""",
      Seq("""{"meta": {"k": 5, "j": 7}}"""))
    // literal index: in-place update, arithmetic ops see the old value
    check(""".v[0] = 99 | .v[1] += 10 | {v: .v}""",
      Seq("""{"v": [1, 2, 3]}"""))
    // out-of-range non-negative leaf index null-pads, jq-style
    check(""".v[3] = 9 | {v: .v}""", Seq("""{"v": [1]}""", """{"v": [7, 8, 6, 5]}"""))
    // negative index counts from the end
    check(""".v[-1] |= . * 2 | {v: .v}""", Seq("""{"v": [1, 5]}"""))
    // bracket mid-path: field under every element
    check(""".es[].k |= . + 1 | {es: .es}""",
      Seq("""{"es": [{"k": 1}, {"k": 5}]}"""))
  }

  test("multi-target assignment: sequential path updates") {
    check("""(.a, .b) = 0 | {a: .a, b: .b, c: .c}""",
      Seq("""{"a": 1, "b": 2, "c": 3}"""))
    check("""(.a, .b) |= . * 10 | {a: .a, b: .b}""",
      Seq("""{"a": 1, "b": 2}"""))
    // targets at mixed depths, including a bracket path
    check("""(.m.k, .v[0]) += 100 | {m: .m, v: .v}""",
      Seq("""{"m": {"k": 1}, "v": [5, 6]}"""))
  }

  test("multi-target assignment binds the RHS once against the ORIGINAL input") {
    // jq's gen_update stores the RHS in $tmp before _modify: on
    // {a:1,b:2}, `(.a,.b) = .a + 10` is a=11 AND b=11 — a per-target
    // re-evaluation against the partial update would give b=21
    check("""(.a, .b) = .a + 10 | {a: .a, b: .b}""",
      Seq("""{"a": 1, "b": 2}"""))
    // same for the arithmetic op= sugar: $tmp = .a = 1, so b = 2 + 1
    check("""(.a, .b) += .a | {a: .a, b: .b}""",
      Seq("""{"a": 1, "b": 2}"""))
    check("""(.a, .b) *= .b | {a: .a, b: .b}""",
      Seq("""{"a": 3, "b": 4}"""))
    check("""(.x, .y) -= .x + .y | {x: .x, y: .y}""",
      Seq("""{"x": 10, "y": 7}"""))
    // ONLY `|=` re-evaluates per path (against the path's old value)
    check("""(.a, .b) |= . + 1 | {a: .a, b: .b}""",
      Seq("""{"a": 1, "b": 2}"""))
    // single-target self-reference: old value feeds the bound RHS
    check(""".a = .a * 2 | .a += .a | {a: .a}""",
      Seq("""{"a": 5}"""))
  }

  test("unique_by / any(f) / all(f): keyed dedup and quantified conditions") {
    check("""{u: (.es | unique_by(.k))}""",
      Seq("""{"es": [{"k": 2, "n": "b"}, {"k": 1, "n": "a"}, {"k": 2, "n": "c"}]}"""))
    check("""{u: (.v | unique_by(. % 3))}""",
      Seq("""{"v": [7, 1, 4, 2, 9]}""", """{"v": []}"""))
    check("""{a: (.v | any(. > 3)), b: (.v | all(. > 0))}""",
      Seq("""{"v": [1, 2, 5]}""", """{"v": [1, 2]}""", """{"v": []}"""))
    check("""{a: (.es | any(.k == 2)), b: (.es | all(.n == "a"))}""",
      Seq("""{"es": [{"k": 2, "n": "a"}, {"k": 1, "n": "a"}]}"""))
  }

  test("indices: non-overlapping substring, element, and subsequence starts") {
    // strings stride past each match ("aaaa"|indices("aa") → [0,2]) …
    check("""{i: (.s | indices("aba"))}""",
      Seq("""{"s": "ababa"}""", """{"s": "xyz"}"""))
    check("""{i: (.s | indices("aa"))}""", Seq("""{"s": "aaaa"}"""))
    check("""{i: (.v | indices(1))}""", Seq("""{"v": [1, 2, 3, 1]}"""))
    // … while array subsequence hits overlap ([1,1,1,1]|indices([1,1]))
    check("""{i: (.v | indices([1, 2]))}""", Seq("""{"v": [1, 2, 1, 2]}"""))
    check("""{i: (.v | indices([1, 1]))}""", Seq("""{"v": [1, 1, 1, 1]}"""))
  }

  test("transpose pads with null; nth indexes 0-based with null OOB") {
    check("""{t: (.m | transpose)}""",
      Seq("""{"m": [[1, 2], [3], [4, 5, 6]]}""", """{"m": []}"""))
    check("""{a: (.v | nth(1)), b: (.v | nth(5))}""",
      Seq("""{"v": [10, 20, 30]}"""))
    // nth($n) is .[$n]: negative counts from the end, past-the-front → null
    check("""{a: (.v | nth(-1)), b: (.v | nth(-3)), c: (.v | nth(-5))}""",
      Seq("""{"v": [10, 20, 30]}"""))
  }

  test("gmtime / mktime / strftime round the broken-down-time triangle") {
    check("""{g: (.t | gmtime)}""",
      Seq("""{"t": 1425599898}""", """{"t": 0}"""))
    // jq's mktime needs the FULL gmtime layout (6 elements error there;
    // the compiler's 6-element acceptance is a documented convenience)
    check("""{m: ([2015, 2, 5, 23, 58, 18, 4, 63] | mktime)}""",
      Seq("""{"id": 1}"""))
    check("""{s: (.t | gmtime | strftime("%Y-%m-%dT%H:%M:%SZ")),
            | d: (.t | gmtime | strftime("%a %b %d, %j of %Y"))}"""
      .stripMargin,
      Seq("""{"t": 1425599898}""", """{"t": 86399}"""))
    // debug is a pass-through on stdout (stderr side channel dropped)
    check("""{d: ((.t | debug) + 1)}""", Seq("""{"t": 41}"""))
  }

  test("round-8 composition edges: year boundary, string keys, chained brackets, walk-on-field") {
    // gmtime/strftime across the year boundary (yday wraps, weekday runs on)
    check("""{d: (.t | gmtime | strftime("%Y %j %a"))}""",
      Seq("""{"t": 31535999}""", """{"t": 31536000}"""))
    // unique_by over string keys (jq's string sort = bytewise here)
    check("""{u: (.es | unique_by(.k))}""",
      Seq("""{"es": [{"k": "b"}, {"k": "a"}, {"k": "b"}]}"""))
    // bracket assignment stages CHAIN: later stages see earlier writes
    check(""".v[] |= . * 10 | .v[0] += 1 | {v: .v}""",
      Seq("""{"v": [3, 1, 2]}"""))
    // walk applied to a FIELD value (not a construction) with a mixed
    // string/number/array body
    check("""{w: (.o | walk(if type == "number" then . + 1
            |              elif type == "string" then ascii_downcase
            |              else . end))}""".stripMargin,
      Seq("""{"o": {"a": "X", "b": [1, 2]}}"""))
  }

  test("round-10 tranche: env/$ENV, label/break subset, $x.path postfix") {
    // env / $ENV: plan-time snapshot ≡ the subprocess's inherited env
    // (same JVM); both engines read the same PATH
    check("""{p: (env | has("PATH")), e: ($ENV.PATH == env.PATH)}""",
      Seq("""{"id": 1}"""))
    check("""{h: env.PATH}""", Seq("""{"id": 1}"""))
    // label/break — first-output idiom (jq's own first(f) definition)
    check("""{f: [label $out | .xs[] | ., break $out]}""",
      Seq("""{"xs": [7, 8, 9]}""", """{"xs": []}"""))
    check("""{f: [label $out | range(10) | ., break $out]}""",
      Seq("""{"id": 1}"""))
    // truncate BEFORE the first breaking element (it emits nothing)
    check("""{t: [label $out | .xs[] | if . > 2 then break $out else . end]}""",
      Seq("""{"xs": [1, 2, 5, 1]}""", """{"xs": [4]}""", """{"xs": [1, 2]}"""))
    // takeWhile dual: stop at the first falsy condition
    check("""{w: [label $out | .xs[] | if . < 3 then . else break $out end]}""",
      Seq("""{"xs": [1, 2, 5, 1]}""", """{"xs": [9]}"""))
    // label with no break is a no-op scope
    check("""{n: [label $out | .xs[]]}""", Seq("""{"xs": [3, 1]}"""))
    // $x.path postfix directly on a bound variable
    check(""".o as $o | {a: $o.a, b: $o.b.c}""",
      Seq("""{"o": {"a": 1, "b": {"c": 2}}}"""))
  }

  test("round-10 tranche: dynamic regex patterns and computed getpath") {
    val rows = Seq(
      """{"s": "abcabc", "re": "^a", "k": "x", "o": {"x": 1, "y": 2}}""",
      """{"s": "zzz",    "re": "b.", "k": "y", "o": {"x": 3, "y": 4}}""")
    // pattern from a FIELD, bound the jq way (inside test's arg `.` is
    // test's string input, so the field rides a variable)
    check(""".re as $r | {h: (.s | test($r))}""", rows)
    check(""".re as $r | {g: (.s | gsub($r; "X"))}""", rows)
    check(""".re as $r | {u: (.s | sub($r; "-"))}""", rows)
    check(""".re as $r | {c: [.s | scan($r)]}""", rows)
    check(""".re as $r | {p: [.s | splits($r)]}""", rows)
    // computed getpath segment over a uniformly-typed struct level
    // (the segment rides a variable so both engines resolve it against
    // the ROW, not getpath's piped input)
    check(""".k as $k | {v: (.o | getpath([$k]))}""", rows)
  }

  test("recursive def: accumulator param at shallow depth") {
    // argument-compounding recursion: each level embeds the prior level's
    // arg TREES (the polymorphic-+ null guards triple operand fan-out),
    // so deep accumulator loops explode the static plan — keep shallow;
    // linear folds belong in `reduce`, which is a real HOF here
    check("""def go($n; $acc): if $n <= 0 then $acc else go($n - 1; $acc + $n) end;
             {s: go(.v; 0)}""",
      Seq("""{"v": 4}""", """{"v": 6}"""))
  }
}
