package graft

import scala.util.Random

import graft.functions.TargetExpr

/** Randomized differential testing of the target_expr dialect: 300 random
  * expression trees are compiled to Columns and evaluated by Spark, then
  * checked against a direct Scala evaluator implementing the same SQL
  * semantics (null propagation through arithmetic/comparisons, Kleene
  * three-valued && / ||, when-null-is-false `if`, first-non-null
  * `coalesce`). Deterministic seed — failures reproduce.
  */
class TargetExprPropSpec extends SparkTestBase {

  // one evaluation row: a=5, b=12, m=NULL (first row) / 7 (second row)
  private case class Env(a: Long, b: Long, m: Option[Long], s: String)
  private val envs = Seq(Env(5, 12, None, "hello click world"),
    Env(5, 12, Some(7), "plain"))

  private sealed trait N // numeric AST
  private case class Lit(v: Long) extends N
  private case class Col(name: String) extends N
  private case class Bin(op: String, l: N, r: N) extends N
  private case class If(c: B, t: N, e: N) extends N
  private case class Coal(l: N, r: N) extends N
  private case class Mn(l: N, r: N) extends N
  private case class Mx(l: N, r: N) extends N
  private case class Ab(x: N) extends N
  private sealed trait B // boolean AST
  private case class Cmp(op: String, l: N, r: N) extends B
  private case class Logic(op: String, l: B, r: B) extends B
  private case class Not(b: B) extends B
  private case class Contains(lit: String) extends B

  private def genN(rnd: Random, depth: Int): N =
    if (depth <= 0) if (rnd.nextBoolean()) Lit(rnd.nextInt(100).toLong)
      else Col(Seq("a", "b", "m")(rnd.nextInt(3)))
    else rnd.nextInt(9) match {
      case 0 => Lit(rnd.nextInt(100).toLong)
      case 1 => Col(Seq("a", "b", "m")(rnd.nextInt(3)))
      case 2 | 3 => Bin(Seq("+", "-", "*")(rnd.nextInt(3)),
        genN(rnd, depth - 1), genN(rnd, depth - 1))
      case 4 => If(genB(rnd, depth - 1), genN(rnd, depth - 1), genN(rnd, depth - 1))
      case 5 => Coal(genN(rnd, depth - 1), genN(rnd, depth - 1))
      case 6 => Mn(genN(rnd, depth - 1), genN(rnd, depth - 1))
      case 7 => Mx(genN(rnd, depth - 1), genN(rnd, depth - 1))
      case 8 => Ab(genN(rnd, depth - 1))
    }

  private def genB(rnd: Random, depth: Int): B =
    if (depth <= 0) Cmp(Seq("==", "!=", "<", "<=", ">", ">=")(rnd.nextInt(6)),
      genN(rnd, 0), genN(rnd, 0))
    else rnd.nextInt(4) match {
      case 0 => Cmp(Seq("==", "!=", "<", "<=", ">", ">=")(rnd.nextInt(6)),
        genN(rnd, depth - 1), genN(rnd, depth - 1))
      case 1 => Logic(if (rnd.nextBoolean()) "&&" else "||",
        genB(rnd, depth - 1), genB(rnd, depth - 1))
      case 2 => Not(genB(rnd, depth - 1))
      case 3 => Contains(if (rnd.nextBoolean()) "click" else "zzz")
    }

  private def renderN(n: N): String = n match {
    case Lit(v) => v.toString
    case Col(c) => c
    case Bin(op, l, r) => s"(${renderN(l)} $op ${renderN(r)})"
    case If(c, t, e) => s"if(${renderB(c)}, ${renderN(t)}, ${renderN(e)})"
    case Coal(l, r) => s"coalesce(${renderN(l)}, ${renderN(r)})"
    case Mn(l, r) => s"min(${renderN(l)}, ${renderN(r)})"
    case Mx(l, r) => s"max(${renderN(l)}, ${renderN(r)})"
    case Ab(x) => s"abs(${renderN(x)})"
  }
  private def renderB(b: B): String = b match {
    case Cmp(op, l, r) => s"(${renderN(l)} $op ${renderN(r)})"
    case Logic(op, l, r) => s"(${renderB(l)} $op ${renderB(r)})"
    case Not(x) => s"!${renderB(x)}"
    case Contains(lit) => s"""string_contains(s, "$lit")"""
  }

  private def evalN(n: N, e: Env): Option[Long] = n match {
    case Lit(v) => Some(v)
    case Col("a") => Some(e.a)
    case Col("b") => Some(e.b)
    case Col("m") => e.m
    case Col(_) => None
    case Bin(op, l, r) =>
      for { x <- evalN(l, e); y <- evalN(r, e) } yield op match {
        case "+" => x + y
        case "-" => x - y
        case "*" => x * y
      }
    case If(c, t, el) => if (evalB(c, e).contains(true)) evalN(t, e) else evalN(el, e)
    case Coal(l, r) => evalN(l, e).orElse(evalN(r, e))
    // SQL least/greatest SKIP nulls (null only when all args are null)
    case Mn(l, r) => (evalN(l, e), evalN(r, e)) match {
      case (Some(x), Some(y)) => Some(x min y)
      case (x, y) => x.orElse(y)
    }
    case Mx(l, r) => (evalN(l, e), evalN(r, e)) match {
      case (Some(x), Some(y)) => Some(x max y)
      case (x, y) => x.orElse(y)
    }
    case Ab(x) => evalN(x, e).map(math.abs)
  }
  private def evalB(b: B, e: Env): Option[Boolean] = b match {
    case Cmp(op, l, r) =>
      for { x <- evalN(l, e); y <- evalN(r, e) } yield op match {
        case "==" => x == y
        case "!=" => x != y
        case "<" => x < y
        case "<=" => x <= y
        case ">" => x > y
        case ">=" => x >= y
      }
    case Logic("&&", l, r) => (evalB(l, e), evalB(r, e)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Logic(_, l, r) => (evalB(l, e), evalB(r, e)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(x) => evalB(x, e).map(!_)
    case Contains(lit) => Some(e.s.contains(lit))
  }

  test("300 random expressions: Spark evaluation ≡ reference semantics") {
    import org.apache.spark.sql.functions.{col => sparkCol}
    import spark.implicits._
    val rnd = new Random(20260812L)
    val exprs = Seq.fill(300)(genN(rnd, 3))
    val df = envs.map(e => (e.a, e.b, e.m, e.s)).toDF("a", "b", "m", "s")
    val cols = exprs.zipWithIndex.map { case (n, i) =>
      TargetExpr.compile(renderN(n)).cast("long").as(s"e$i")
    }
    val rows = df.select(sparkCol("m") +: cols: _*).collect()
      .sortBy(r => Option(r.get(0)).isDefined) // null-m row first, like envs
    for ((row, env) <- rows.zip(envs); (n, i) <- exprs.zipWithIndex) {
      val got = if (row.isNullAt(i + 1)) None else Some(row.getLong(i + 1))
      val want = evalN(n, env)
      assert(got == want,
        s"expr `${renderN(n)}` on $env: spark=$got reference=$want")
    }
  }
}
