package graft

import org.apache.spark.sql.functions._
import graft.functions.TargetExpr

/** target_expr dialect compiler: function surface from the reference's
  * testdata YAML fixtures + operator semantics.
  */
class TargetExprSpec extends SparkTestBase {
  import spark.implicits._

  private def evalOn[T](expr: String, rows: Seq[(Long, String)]): Seq[Any] = {
    val df = rows.toDF("user_id", "path")
    df.select(TargetExpr.compile(expr).as("v")).collect().map(_.get(0)).toSeq
  }

  test("literals and identifiers") {
    val df = Seq((7L, "/my_page")).toDF("user_id", "path")
    val out = df.select(
      TargetExpr.compile("1").as("a"),
      TargetExpr.compile("1.5").as("b"),
      TargetExpr.compile("\"x\"").as("c"),
      TargetExpr.compile("user_id").as("d"),
      TargetExpr.compile("nil").as("e"),
      TargetExpr.compile("true").as("f")).head()
    assert(out.getLong(0) == 1L)
    assert(out.getDouble(1) == 1.5)
    assert(out.getString(2) == "x")
    assert(out.getLong(3) == 7L)
    assert(out.isNullAt(4))
    assert(out.getBoolean(5))
  }

  test("if(string_contains(path, my_page), user_id, nil) — reference fixture") {
    val vals = evalOn("""if(string_contains(path, "my_page"), user_id, nil)""",
      Seq((1L, "/my_page"), (2L, "/"), (3L, "/my_page?q=1")))
    assert(vals == Seq(1L, null, 3L))
  }

  test("as_string(coalesce(user_id, \"\")) != \"\" — reference aggregate fixture") {
    val c = TargetExpr.compile("""as_string(coalesce(user_id, "")) != """"")
    val df = Seq(Some(1L), None, Some(3L)).toDF("user_id")
    val vals = df.select(c.as("v")).collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    // coalesce(null,"") → "" → "" != "" → false
    assert(vals.toSeq == Seq(true, false, true))
  }

  test("comparisons, arithmetic, boolean connectives") {
    val df = Seq((10L, "a"), (60L, "b")).toDF("user_id", "path")
    val v1 = df.select(TargetExpr.compile("user_id > 50").as("v")).collect().map(_.getBoolean(0))
    assert(v1.toSeq == Seq(false, true))
    val v2 = df.select(TargetExpr.compile("user_id * 2 + 1").as("v")).collect().map(_.getLong(0))
    assert(v2.toSeq == Seq(21L, 121L))
    val v3 = df.select(TargetExpr.compile("""user_id > 5 && path == "a" || false""").as("v"))
      .collect().map(_.getBoolean(0))
    assert(v3.toSeq == Seq(true, false))
    val v4 = df.select(TargetExpr.compile("-user_id % 3").as("v")).collect().map(_.getLong(0))
    assert(v4.toSeq == Seq(-1L, 0L))
  }

  test("parse errors throw (config-load failure, config.go:93-99)") {
    assertThrows[IllegalArgumentException](TargetExpr.compile("if(1,2"))
    assertThrows[IllegalArgumentException](TargetExpr.compile("no_such_fn(1)"))
    assertThrows[IllegalArgumentException](TargetExpr.compile("\"unterminated"))
  }

  test("malformed number literals are lex errors, not NumberFormatException") {
    assertThrows[IllegalArgumentException](TargetExpr.compile("1.2.3"))
    assertThrows[IllegalArgumentException](TargetExpr.compile("user_id > 1."))
    // single-dot numbers still fine
    assert(TargetExpr.compile("0.25") != null)
  }

  test("as_bool completes the as_* coercion family; malformed → nil (warn+skip)") {
    val df = Seq("true", "FALSE", "t", "0", "yes", "garbage").toDF("path")
    val vals = df.select(TargetExpr.compile("as_bool(path)").as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(vals.toSeq == Seq(true, false, true, false, true, null))
    // numeric input: 0 → false, nonzero → true — same as as_number's cast shape
    val n = Seq(0L, 3L).toDF("user_id")
      .select(TargetExpr.compile("as_bool(user_id)").as("v")).collect().map(_.getBoolean(0))
    assert(n.toSeq == Seq(false, true))
  }

  test("min/max are variadic least/greatest with SQL null-skipping") {
    val df = Seq((Some(10L), 4L), (None, 7L)).toDF("user_id", "other")
    val out = df.select(
      TargetExpr.compile("min(user_id, other, 6)").as("a"),
      TargetExpr.compile("max(user_id, other)").as("b")).collect()
    assert(out(0).getLong(0) == 4L && out(0).getLong(1) == 10L)
    // null arg skipped, not poisoning: min(null, 7, 6) = 6
    assert(out(1).getLong(0) == 6L && out(1).getLong(1) == 7L)
    // min/max need >= 2 args — 1-arg is an arity error at compile
    assertThrows[IllegalArgumentException](TargetExpr.compile("min(user_id)"))
  }

  test("floor/ceil/round over doubles") {
    val df = Seq(2.5, -2.5, 2.4).toDF("value")
    val out = df.select(
      TargetExpr.compile("floor(value)").as("f"),
      TargetExpr.compile("ceil(value)").as("c"),
      TargetExpr.compile("round(value)").as("r")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, -3L, 2L))
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, -2L, 3L))
    // Spark round is HALF_UP on positive, HALF_UP toward -inf? no: HALF_UP
    // away from zero for .5 — 2.5 → 3, -2.5 → -3
    assert(out.map(_.getDouble(2)).toSeq == Seq(3.0, -3.0, 2.0))
  }

  test("composed: if(as_bool(...) && floor(min(...)) % 2 == 0, 1, nil) — c33 shape") {
    val df = Seq(50.0, 51.0, 49.0, 151.0).toDF("value")
    val c = TargetExpr.compile(
      """if(as_bool(if(value >= 50.0, "t", "f")) && floor(min(value, 150.0)) % 2 == 0, 1, nil)""")
    val vals = df.select(c.as("v")).collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    // 50 → even ✓; 51 → odd ✗; 49 → as_bool false ✗; 151 → min caps at 150, even ✓
    assert(vals.toSeq == Seq(1L, null, null, 1L))
  }
}
