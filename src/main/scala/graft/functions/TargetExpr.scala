package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler for the reference's `target_expr` scalar-expression dialect
  * (`/root/reference/config.go:93-99`, `/root/reference/counter.go:260-306`,
  * function surface observed in the reference's testdata YAML fixtures) down to
  * Catalyst `Column` trees.
  *
  * The reference interprets these row-by-row with an external evaluator
  * library; compiling to `Column`s instead means the predicate participates
  * in whole-stage codegen and is pushed below the aggregate (and, where the
  * source allows, into the scan) by Catalyst — at 100 TB the filter runs
  * inside the parquet reader, not in a per-row interpreter.
  *
  * Dialect: literals (numbers, "strings", true/false/nil), identifiers
  * (top-level record fields), `== != < <= > >= + - * / %`, `&& || !`, and
  * functions. Publicly attested surface (reference README §target_expr,
  * `testdata/target_expr*.yaml` + `aggregate_count.yaml` fixtures, and the
  * `counter.go:260-306` eval semantics): `if(c,t,e)`, `coalesce(...)`,
  * `as_string(x)`, `as_number(x)`, `string_contains(s, sub)`. The
  * evaluator's coercion family is completed with `as_bool(x)` (same
  * warn+skip try_cast shape as `as_number`). Everything further is a
  * documented EXTENSION beyond the attested surface, kept to generic
  * scalar helpers any such dialect grows: `length`, `lower`, `upper`,
  * `trim`, `abs`, `min(...)`, `max(...)`, `floor`, `ceil`, `round`.
  * `nil` compiles to SQL NULL.
  */
object TargetExpr {

  // ---------------------------------------------------------------- lexer
  sealed trait Tok
  private final case class TNum(v: String) extends Tok
  private final case class TStr(v: String) extends Tok
  private final case class TIdent(v: String) extends Tok
  private final case class TOp(v: String) extends Tok
  private case object TEOF extends Tok

  private def lex(src: String): Either[String, Vector[Tok]] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) { i += 1 }
      else if (c.isDigit || (c == '.' && i + 1 < n && src.charAt(i + 1).isDigit)) {
        val start = i
        while (i < n && (src.charAt(i).isDigit || src.charAt(i) == '.')) i += 1
        val tok = src.substring(start, i)
        // A malformed numeric token ('1.2.3', '1.') is a LEX error — surface
        // it as the IllegalArgumentException the config-load contract
        // promises, not a NumberFormatException from lit(…toDouble) later.
        if (tok.count(_ == '.') > 1 || tok.endsWith("."))
          return Left(s"malformed number literal '$tok' in: $src")
        out += TNum(tok)
      } else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = src.charAt(i)
          if (ch == '\\' && i + 1 < n) { sb.append(src.charAt(i + 1)); i += 2 }
          else if (ch == quote) { closed = true; i += 1 }
          else { sb.append(ch); i += 1 }
        }
        if (!closed) return Left(s"unterminated string literal in: $src")
        out += TStr(sb.toString)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_')) i += 1
        out += TIdent(src.substring(start, i))
      } else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        if (Set("==", "!=", "<=", ">=", "&&", "||").contains(two)) { out += TOp(two); i += 2 }
        else if ("()<>,+-*/%!".indexOf(c) >= 0) { out += TOp(c.toString); i += 1 }
        else return Left(s"unexpected character '$c' at $i in: $src")
      }
    }
    out += TEOF
    Right(out.result())
  }

  // --------------------------------------------------------------- parser
  /** Recursive-descent parser producing a Column directly (no intermediate
    * AST needed — Column IS the IR; Catalyst owns optimization from here).
    */
  private final class Parser(toks: Vector[Tok], src: String) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def expectOp(op: String): Unit = next() match {
      case TOp(`op`) => ()
      case t => fail(s"expected '$op' but found $t")
    }
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"target_expr parse error: $msg in: $src")

    def parse(): Column = {
      val c = orExpr()
      if (peek != TEOF) fail(s"trailing tokens from $peek")
      c
    }

    private def orExpr(): Column = {
      var l = andExpr()
      while (peek == TOp("||")) { next(); l = l.or(andExpr()) }
      l
    }
    private def andExpr(): Column = {
      var l = cmpExpr()
      while (peek == TOp("&&")) { next(); l = l.and(cmpExpr()) }
      l
    }
    private def cmpExpr(): Column = {
      val l = addExpr()
      peek match {
        case TOp(op @ ("==" | "!=" | "<" | "<=" | ">" | ">=")) =>
          next()
          val r = addExpr()
          op match {
            case "==" => l === r
            case "!=" => l =!= r
            case "<"  => l < r
            case "<=" => l <= r
            case ">"  => l > r
            case ">=" => l >= r
          }
        case _ => l
      }
    }
    private def addExpr(): Column = {
      var l = mulExpr()
      var go = true
      while (go) peek match {
        case TOp("+") => next(); l = l + mulExpr()
        case TOp("-") => next(); l = l - mulExpr()
        case _ => go = false
      }
      l
    }
    private def mulExpr(): Column = {
      var l = unary()
      var go = true
      while (go) peek match {
        case TOp("*") => next(); l = l * unary()
        case TOp("/") => next(); l = l / unary()
        case TOp("%") => next(); l = l % unary()
        case _ => go = false
      }
      l
    }
    private def unary(): Column = peek match {
      case TOp("!") => next(); !unary()
      case TOp("-") => next(); negate(unary())
      case _ => primary()
    }
    private def primary(): Column = next() match {
      case TNum(v) =>
        if (v.contains('.')) lit(v.toDouble) else lit(v.toLong)
      case TStr(v) => lit(v)
      case TIdent(name) =>
        name match {
          case "nil" | "null" => lit(null)
          case "true" => lit(true)
          case "false" => lit(false)
          case _ if peek == TOp("(") => next(); call(name, args())
          case _ => col(name)
        }
      case TOp("(") =>
        val c = orExpr()
        expectOp(")")
        c
      case t => fail(s"unexpected token $t")
    }
    /** Each arg Column plus whether it was a BARE string literal (one-token
      * lookahead). The reference's evaluator is dynamically typed —
      * `coalesce(request_id, "")` mixes number and string
      * (testdata/aggregate_count.yaml) — while Spark/ANSI coerces arg types
      * eagerly (and would try to cast "" to BIGINT). When a string literal
      * appears among `coalesce` args we coerce all args to string,
      * reproducing the dynamic behavior for observed fixture shapes.
      */
    private def args(): List[(Column, Boolean)] = {
      if (peek == TOp(")")) { next(); return Nil }
      val buf = List.newBuilder[(Column, Boolean)]
      def one(): Unit = {
        val bareString = peek.isInstanceOf[TStr] &&
          (toks(pos + 1) == TOp(",") || toks(pos + 1) == TOp(")"))
        buf += (orExpr() -> bareString)
      }
      one()
      while (peek == TOp(",")) { next(); one() }
      expectOp(")")
      buf.result()
    }
    private def call(name: String, argsWithLit: List[(Column, Boolean)]): Column = {
      val as = argsWithLit.map(_._1)
      (name, as) match {
      case ("if", List(c, t, e)) => when(c, t).otherwise(e)
      case ("coalesce", _) if as.nonEmpty =>
        if (argsWithLit.exists(_._2) && argsWithLit.length > 1)
          coalesce(as.map(_.cast("string")): _*)
        else coalesce(as: _*)
      case ("as_string", List(x)) => x.cast("string")
      // try_cast semantics: a malformed value → NULL → row skipped, the
      // reference's eval-error behavior (warn+skip, counter.go:262-266)
      case ("as_number", List(x)) => x.try_cast("double")
      // boolean face of the as_* coercion family; accepts the SQL boolean
      // string forms (true/false/t/f/y/n/yes/no/0/1), malformed → NULL →
      // row skipped, same warn+skip contract as as_number
      case ("as_bool", List(x)) => x.try_cast("boolean")
      case ("string_contains", List(s, sub)) => s.contains(sub)
      case ("length", List(x)) => length(x)
      case ("lower", List(x)) => lower(x)
      case ("upper", List(x)) => upper(x)
      case ("trim", List(x)) => trim(x)
      case ("abs", List(x)) => abs(x)
      // variadic least/greatest — SQL NULL-skipping semantics (null only
      // when ALL args are null), the dynamic-dialect analog of Go's
      // nil-tolerant numeric folds
      case ("min", _) if as.length >= 2 => least(as: _*)
      case ("max", _) if as.length >= 2 => greatest(as: _*)
      case ("floor", List(x)) => floor(x)
      case ("ceil", List(x)) => ceil(x)
      case ("round", List(x)) => round(x)
      case _ => fail(s"unknown function or arity: $name/${as.length}")
      }
    }
  }

  /** Compile the expression source into a Column. Throws
    * IllegalArgumentException on a malformed expression (the reference
    * fails config load the same way, `config.go:93-99`).
    */
  def compile(src: String): Column =
    lex(src).fold(
      e => throw new IllegalArgumentException(s"target_expr lex error: $e"),
      toks => new Parser(toks, src).parse())
}
