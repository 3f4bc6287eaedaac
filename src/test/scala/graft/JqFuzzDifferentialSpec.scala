package graft

import graft.operators.JqTransform

/** RANDOMIZED differential fuzzing of the jq compiler against the real
  * `jq` binary: generated programs from a grammar over the supported
  * surface (paths, integer arithmetic, comparisons, select, value pipes,
  * array builtins, if/else, //) run over generated JSON rows, outputs
  * canonicalized via `jq -S -c` and compared as sorted multisets — the
  * [[TargetExprPropSpec]] pattern pointed at the jq surface. Seeded, so
  * failures reproduce.
  */
class JqFuzzDifferentialSpec extends SparkTestBase {

  private val jqBin = new java.io.File("/usr/bin/jq")

  private def runUtf8(cmd: Seq[String], input: String): Seq[String] = {
    val pb = new java.lang.ProcessBuilder(cmd: _*)
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
    new String(out.toByteArray, "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
  }

  /** Canonicalize: sorted keys, compact — and fold jq's `-0` (double
    * arithmetic can produce negative zero, which jq PRINTS as -0 while
    * this engine's long arithmetic gives 0; they compare equal in jq).
    */
  private def canon(lines: Seq[String]): Seq[String] =
    if (lines.isEmpty) Nil
    else runUtf8(Seq("/usr/bin/jq", "-S", "-c",
      "walk(if type == \"number\" and . == 0 then 0 else . end)"),
      lines.mkString("\n"))

  // ---- program generator ------------------------------------------------

  /** Integer-valued scalar expression (jq renders integer doubles as
    * integers, so staying integral sidesteps number-format skew).
    */
  /** `safe = true` excludes `*` — jq's double arithmetic renders
    * (negative × 0) as -0, which survives into tostring/interpolation
    * where no structural canonicalization can reach it; +/- cannot
    * produce -0 (x − x is +0 in IEEE), so the rest of the grammar is
    * render-stable.
    */
  private def genNum(r: scala.util.Random, depth: Int,
                     safe: Boolean = false): String = {
    val leaves = Seq(".id", ".n", ".m", (r.nextInt(19) - 9).toString)
    if (depth <= 0) leaves(r.nextInt(leaves.length))
    else r.nextInt(6) match {
      case 0 => s"(${genNum(r, depth - 1, safe)} + ${genNum(r, depth - 1, safe)})"
      case 1 => s"(${genNum(r, depth - 1, safe)} - ${genNum(r, depth - 1, safe)})"
      case 2 if !safe => s"(${genNum(r, depth - 1)} * ${genNum(r, depth - 1)})"
      case 3 => s"(${genNum(r, depth - 1, safe)} | floor)"
      case 4 => s"(.xs | length)"
      case _ => leaves(r.nextInt(leaves.length))
    }
  }

  private def genStr(r: scala.util.Random, depth: Int): String = {
    val leaves = Seq(".s", ".t", "\"lit\"", "\"x y\"")
    if (depth <= 0) leaves(r.nextInt(leaves.length))
    else r.nextInt(6) match {
      case 0 => s"(${genStr(r, depth - 1)} + ${genStr(r, depth - 1)})"
      case 1 => s"(${genStr(r, depth - 1)} | ascii_upcase)"
      case 2 => s"(${genNum(r, depth - 1, safe = true)} | tostring)"
      case 3 => s"(${genStr(r, depth - 1)} | ltrimstr(\"a\"))"
      case 4 => s"\"p\\(${genNum(r, depth - 1, safe = true)})q\""
      case _ => leaves(r.nextInt(leaves.length))
    }
  }

  private def genBool(r: scala.util.Random, depth: Int): String =
    r.nextInt(8) match {
      case 0 => s"(${genNum(r, depth)} < ${genNum(r, depth)})"
      case 1 => s"(${genNum(r, depth)} == ${genNum(r, depth)})"
      case 2 => s"(${genStr(r, depth)} == ${genStr(r, depth)})"
      case 3 => s"(${genStr(r, depth)} | startswith(\"a\"))"
      case 4 => s"(${genNum(r, depth)} < ${genStr(r, depth)})" // cross-type: number < string
      case 5 => s"(${genStr(r, depth)} | contains(\"a\"))"
      case 6 => s"(${genNum(r, depth)} != ${genNum(r, depth)})"
      case _ => s"(${genNum(r, depth)} >= ${genNum(r, depth)})"
    }

  /** `ext` selects the round-7 grammar extension (value-position
    * bindings + object merge). The base grammar draws from exactly the
    * original 12 cases so the two FROZEN seed corpora below keep
    * generating byte-identical programs.
    */
  private def genValue(r: scala.util.Random, depth: Int,
                       ext: Boolean = false, ext2: Boolean = false,
                       ext3: Boolean = false, ext4: Boolean = false,
                       ext5: Boolean = false, ext6: Boolean = false,
                       ext7: Boolean = false,
                       ext8: Boolean = false): String =
    r.nextInt(if (ext8) 49 else if (ext7) 45 else if (ext6) 41 else if (ext5) 37 else if (ext4) 35 else if (ext3) 32 else if (ext2) 23 else if (ext) 19 else 12) match {
      case 0 | 1 => genNum(r, depth)
      case 2 | 3 => genStr(r, depth)
      case 4 => genBool(r, depth)
      case 5 => s"(.xs | sort)"
      case 6 => s"(if ${genBool(r, depth - 1)} then ${genNum(r, depth - 1)} " +
        s"else ${genNum(r, depth - 1)} end)"
      case 7 => s"(.missing // ${genNum(r, depth - 1)})"
      case 8 => s"(.xs | sort_by(. * -1))"
      case 9 => s"(.xs | map(. | tostring) | join(\"-\"))"
      case 10 => s"(.xs | reverse | first)"
      case 11 => s"(.xs | map(. + ${1 + r.nextInt(5)}))"
      // value-position `E as $x | body` binding
      case 12 => s"(${genNum(r, depth - 1, safe = true)} as $$v | " +
        s"($$v + ${genNum(r, depth - 1, safe = true)}))"
      case 13 => s"(.n as $$k | (if $$k < 0 then (0 - $$k) else $$k end))"
      case 14 => s"""({"a": ${genNum(r, depth - 1, safe = true)}, "b": 1} + """ +
        s"""{"b": ${genNum(r, depth - 1, safe = true)}, "c": ${genStr(r, depth - 1)}})"""
      // one-level array destructuring ([] / short arrays bind null)
      case 15 => s"(.xs as [$$p, $$q] | ($$p // 0) + ($$q // 0))"
      // string repetition (either operand order)
      case 16 => s"(${genStr(r, depth - 1)} * ${1 + r.nextInt(3)})"
      // object deep merge: both-object key recurses, right wins elsewhere
      case 17 => s"""({"x": {"p": ${genNum(r, depth - 1, safe = true)}, "q": 2}, "y": 1} * """ +
        s"""{"x": {"q": ${genNum(r, depth - 1, safe = true)}}, "z": ${genStr(r, depth - 1)}})"""
      // C-truncated modulo (dividend sign)
      case 18 => s"(${genNum(r, depth - 1, safe = true)} % ${2 + r.nextInt(5)})"
      // ---- round-8 extension (ext2): runtime try/catch, ?// ----
      // handlers are LITERALS: a path handler reads the error MESSAGE
      // (jq binds `.` to it), which jq evaluates only on error rows —
      // a per-row behavior a static column cannot split, so the
      // compiler raises loudly there (covered by unit tests, not fuzz)
      // tonumber on arbitrary strings: garbage routes to the handler
      case 19 => s"(try (${genStr(r, depth - 1)} | tonumber) " +
        s"catch ${r.nextInt(19) - 9})"
      // runtime zero divisor (.m - k hits 0 for m == k) through try
      case 20 => s"(try ((${genNum(r, depth - 1, safe = true)} + 1) / " +
        s"(.m - ${1 + r.nextInt(5)})) catch -1)"
      case 21 => s"(try (${genNum(r, depth - 1, safe = true)} % " +
        s"(.m - ${1 + r.nextInt(5)})) catch ${r.nextInt(19) - 9})"
      // ?// alternatives: array value picks the first; $z rides as null
      case 22 => s"(.xs as [$$p, $$q] ?// {z: $$z} | " +
        s"($$p // 0) + ($$q // 0) + ($$z // 0))"
      // ---- round-8 extension (ext3): walk/map_values, unique_by,
      // any/all(f), indices, transpose, nth, datetime triangle ----
      case 23 => s"""({"a": .n, "b": [.m, .n], "s": .s} | """ +
        s"walk(if type == \"string\" then ascii_upcase " +
        s"elif type == \"number\" then . + ${1 + r.nextInt(5)} else . end))"
      case 24 => r.nextInt(2) match {
        case 0 => s"(.xs | map_values(. * ${1 + r.nextInt(4)}))"
        case _ => s"""({"a": .n, "b": .m} | map_values(. - ${r.nextInt(5)}))"""
      }
      case 25 => s"(.xs | unique_by(. % ${2 + r.nextInt(3)}))"
      case 26 => r.nextInt(2) match {
        case 0 => s"(.xs | any(. > ${r.nextInt(10) - 3}))"
        case _ => s"(.xs | all(. != ${r.nextInt(10) - 3}))"
      }
      case 27 => r.nextInt(2) match {
        case 0 =>
          val needle = Seq("a", "b", "ab", "aa")(r.nextInt(4))
          s"""(.s | indices("$needle"))"""
        case _ => s"(.xs | indices(${r.nextInt(10) - 3}))"
      }
      case 28 => s"([[.n, .m], [.m], [1, 2, 3]] | transpose)"
      case 29 => s"(.xs | nth(${r.nextInt(5)}))"
      case 30 =>
        val fmt = Seq("%Y-%m-%dT%H:%M:%SZ", "%a %b %d %j", "%H:%M (%p)", "%F %T")(
          r.nextInt(4))
        s"""(((.n + 10) * 86399 + ${r.nextInt(100000)}) | gmtime | strftime("$fmt"))"""
      case 31 => s"((.m * 123456 + ${r.nextInt(100000)}) | gmtime | mktime)"
      // ---- round-8 extension (ext4): while / first / last ----
      // while's input stays small and positive so the doubling/tripling
      // chains terminate well inside the unroll cap
      case 32 =>
        val mul = 2 + r.nextInt(2); val bound = 20 + r.nextInt(60)
        s"[(.m + 2) | while(. < $bound; . * $mul)]"
      case 33 =>
        val mul = 2 + r.nextInt(2); val bound = 20 + r.nextInt(60)
        if (r.nextBoolean())
          s"((.m + 2) | first(while(. < $bound; . * $mul)))"
        else s"((.m + 2) | last(while(. < $bound; . * $mul)))"
      case 34 => s"(.xs | first(map(. * ${1 + r.nextInt(4)})))"
      // ---- round-9 extension (ext5): nth over the FULL index range —
      // negative counts from the end (.[$n]), out-of-range → null ----
      case 35 => s"(.xs | nth(${r.nextInt(12) - 6}))"
      // first/last over a SOMETIMES-EMPTY while stream (seed ≥ bound →
      // empty → first drops the record, last folds to null, jq-exact).
      // The update is ADDITIVE so jq terminates for negative seeds (a
      // `* k` update on a negative seed never reaches the bound and real
      // jq loops forever), and the seed is clamped with C-style `%` so
      // an ext5 assignment driving .n to ±90 stays within the while
      // kernel's static unroll cap (12) — the cap raise is loud by
      // design, not a divergence to fuzz for.
      case 36 =>
        val bound = 3 + r.nextInt(10); val step = 2 + r.nextInt(4)
        val pick = if (r.nextBoolean()) "first" else "last"
        s"(.n % 7 | $pick(while(. < $bound; . + $step)))"
      // ---- round-10 extension (ext6): label/break subset, env, $x.path --
      // first-output idiom over a stream (jq's builtin.jq first(f) shape)
      case 37 => s"[label $$out | .xs[] | ., break $$out]"
      // truncation: break BEFORE the first (non-)matching element
      case 38 =>
        val t = r.nextInt(10) - 2
        if (r.nextBoolean())
          s"[label $$out | .xs[] | if . > $t then break $$out else . end]"
        else
          s"[label $$out | .xs[] | if . < $t then . else break $$out end]"
      // env: a plan-time snapshot both engines read identically (the jq
      // subprocess inherits this JVM's environment); absent vars → null
      case 39 => r.nextInt(3) match {
        case 0 => "(env | has(\"PATH\"))"
        case 1 => "env.GRAFT_FUZZ_NO_SUCH_VAR"
        case _ => "($ENV.PATH | length > 0)"
      }
      // $x.path postfix directly on a bound variable (bind a constructed
      // object: top-level bare-dot binding is outside the row model)
      case 40 =>
        s"({a: .n, b: .m} as $$r | $$r.a + $$r.b * ${1 + r.nextInt(3)})"
      // ---- round-11 extension (ext7): computed setpath segments and
      // computed range steps. Computed setpath keys always name an
      // EXISTING field of the constructed object: a non-matching key is
      // the one documented divergence (jq appends, a static schema
      // cannot), so the grammar never draws it ----
      // the key rides a VARIABLE (the c73 getpath discipline): a bare
      // `.`-path inside a segment resolves against the ROW here but
      // against the piped value in jq, so the variable form is the one
      // scoping both engines agree on
      case 41 =>
        // the LEAF rides a variable too: jq scopes `.` inside setpath's
        // value argument to the piped object, this compiler to the row —
        // variables are the scoping both engines agree on
        val t = r.nextInt(7) - 3
        "((if .n > " + t + " then \"a\" else \"b\" end) as $k | " +
          "(" + genNum(r, depth - 1, safe = true) + ") as $lv | " +
          "({\"a\": .n, \"b\": .m} | setpath([$k]; $lv) | .a + .b * 2))"
      case 42 =>
        val t = r.nextInt(7) - 3
        "((if .n < " + t + " then \"p\" else \"q\" end) as $k | " +
          "({\"x\": {\"p\": .n, \"q\": .m}, \"y\": 1} | " +
          "setpath([\"x\", $k]; " +
          (1 + r.nextInt(9)) + ") | .x.p - .x.q + .y))"
      // computed UP step (1..3, never 0): both engines draw the same
      // arithmetic, so the stream contents must agree exactly
      case 43 =>
        val hi = 4 + r.nextInt(8)
        s"([range(0; $hi; (.m % 3) + 1)] | add)"
      // computed DOWN step with runtime sign, sometimes direction-
      // mismatched (empty stream on both engines)
      case 44 =>
        val from = r.nextInt(7) - 2
        s"([range($from; 0; 0 - ((.m % 2) + 1))] | length)"
      // ---- round-12 extension (ext8): match() with COMPUTED patterns,
      // offset/length/string subset. Patterns derive from the row's own
      // characters (a-d — regex-inert) and are built to ALWAYS match
      // nonempty: a no-match is jq's empty stream vs this engine's null
      // (the documented tonumber-style divergence), so the grammar never
      // draws one. captures stays literal-only (loud; unit-tested) ----
      // last-char run: offset varies with where the run sits
      case 45 =>
        "(([(.s | explode | reverse | first)] | implode) as $p | " +
          "(.s | match($p + \"+\") | .offset))"
      case 46 =>
        "(([(.s | explode | reverse | first)] | implode) as $p | " +
          "(.s | match($p + \"+\") | .length))"
      // case-insensitive flag over an upcased computed pattern
      case 47 =>
        "((([(.s | explode | first)] | implode) | ascii_upcase) as $p | " +
          "(.s | match($p; \"i\") | .string))"
      // self-match: pattern = the subject (always offset 0, length =
      // len). The pattern rides a VARIABLE (the ext7 setpath
      // discipline): jq scopes a bare path inside match()'s argument to
      // the PIPED string, this compiler to the row
      case _ =>
        s"(.s as $$q | (($$q | match($$q) | .length) + ${r.nextInt(3)}))"
    }

  private def genProgram(r: scala.util.Random, ext: Boolean = false,
                         ext2: Boolean = false, ext3: Boolean = false,
                         ext4: Boolean = false, ext5: Boolean = false,
                         ext6: Boolean = false, ext7: Boolean = false,
                         ext8: Boolean = false): String = {
    val nFields = 1 + r.nextInt(3)
    var fields = (0 until nFields)
      .map(i => s"f$i: ${genValue(r, 2, ext, ext2, ext3, ext4, ext5, ext6, ext7, ext8)}").mkString(", ")
    // ext2: a recursive def called with data-bounded depth (≤ 3), and
    // sometimes a stream-valued field — jq's 0..N outputs per record
    // (range(.m % 3) is sometimes EMPTY: the whole record drops, both
    // engines)
    val defPrefix =
      if (ext2 && r.nextInt(4) == 0) {
        fields += s", fr: fact((.m % 3) + 1)"
        "def fact($n): if $n <= 1 then 1 else $n * fact($n - 1) end; "
      } else ""
    if (ext2 && r.nextInt(4) == 0)
      fields += s", g: range(.m % 3)"
    val select = if (r.nextInt(3) == 0) s"select(${genBool(r, 1)}) | " else ""
    // ext grammar: sometimes prefix an assignment stage mutating .n
    // (safe += / *= / = forms; |= rhs is old-value-scoped so only
    // literal arithmetic rides it)
    val assign =
      if (!(ext || ext2 || ext3 || ext4 || ext5 || ext6 || ext7 || ext8) || r.nextInt(3) != 0) ""
      // ext5: SELF-REFERENTIAL multi-target RHS — jq's gen_update binds
      // the RHS once against the ORIGINAL input ($tmp), so later targets
      // must NOT see earlier writes for = and the arithmetic op= forms.
      // Targets are .n/.id, never .m: the while cases seed from .m, and
      // driving it negative would make jq's `* k` update loop forever.
      // ext6: ADDITIVE-only assignment draws — a `*`-form can set a field
      // to IEEE -0 (negative × zero; jq is all-doubles), and a later
      // string interpolation renders "-0" INSIDE a string where the canon
      // walk's -0 fold cannot reach (the f1 "p-0q" divergence this seed's
      // first run caught). ext5's frozen corpus keeps its draws untouched.
      else if (ext6 || ext7 || ext8) r.nextInt(4) match {
        case 0 => s"(.n, .id) = .n + ${r.nextInt(9)} | "
        case 1 => s"(.n, .id) += .id | "
        case 2 => s"(.id, .n) |= . + ${1 + r.nextInt(5)} | "
        case _ => s"(.n, .id) -= .n | "
      }
      else if (ext5) r.nextInt(6) match {
        case 0 => s"(.n, .id) = .n + ${r.nextInt(9)} | "
        case 1 => s"(.n, .id) += .id | "
        case 2 => s"(.n, .id) -= .n | "
        case 3 => s"(.n, .id) *= .id | "
        case 4 => s"(.id, .n) = .n * .id | "
        case _ => s"(.n, .id) |= . + ${1 + r.nextInt(5)} | "
      }
      else if (ext3 || ext4) r.nextInt(5) match {
        // ext3: bracket and multi-target assignment stages. Index
        // assignments stay at [0] (rows always have ≥1 xs element) so
        // jq's null-padding cannot plant nulls that later arithmetic
        // fields would error on in jq but null-propagate here.
        case 0 => s".xs[] |= . + ${1 + r.nextInt(9)} | "
        case 1 => s".xs[0] = ${genNum(r, 1, safe = true)} | "
        case 2 => s".xs[0] *= ${1 + r.nextInt(5)} | "
        case 3 => s"(.n, .m) = ${1 + r.nextInt(9)} | "
        case _ => s"(.n, .m) |= . + ${1 + r.nextInt(5)} | "
      }
      else r.nextInt(4) match {
        case 0 => s".n = ${genNum(r, 1, safe = true)} | "
        case 1 => s".n |= . + ${1 + r.nextInt(9)} | "
        case 2 => s".n += ${genNum(r, 1, safe = true)} | "
        case _ => s".n *= ${1 + r.nextInt(5)} | "
      }
    s"$defPrefix$assign$select{$fields}"
  }

  private def genRow(r: scala.util.Random): String = {
    val xs = Seq.fill(1 + r.nextInt(4))(r.nextInt(20) - 5).mkString(", ")
    s"""{"id": ${r.nextInt(10)}, "n": ${r.nextInt(30) - 10}, "m": ${r.nextInt(7)},""" +
      s""" "s": "${Seq.fill(1 + r.nextInt(5))(('a' + r.nextInt(4)).toChar).mkString}",""" +
      s""" "t": "w${r.nextInt(4)}", "xs": [$xs]}"""
  }

  // ---- divergence evaluation + shrinking --------------------------------

  /** The Spark side's behavior: canonical sorted output lines, or the
    * exception class when the compiler/plan rejects the program.
    */
  private def sparkSide(program: String,
                        inputs: Seq[String]): Either[String, Seq[String]] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, struct, to_json}
    try {
      val df = spark.read.json(inputs.toDS)
      val out = JqTransform(df, program)
      Right(canon(out.select(to_json(struct(out.columns.map(col).toSeq: _*),
          Map("ignoreNullFields" -> "false")).as("j"))
        .collect().map(_.getString(0)).toSeq).sorted)
    } catch { case e: Throwable => Left(e.getClass.getSimpleName) }
  }

  /** Divergence signature: None = agreement; Some(kind) otherwise. The
    * kind distinguishes a compile/plan error from a value mismatch so the
    * shrinker cannot "simplify" one failure mode into a different one.
    */
  private def verdict(program: String, inputs: Seq[String]): Option[String] =
    sparkSide(program, inputs) match {
      case Left(err) => Some(s"spark-error:$err")
      case Right(ours) =>
        val jqs = canon(runUtf8(Seq("/usr/bin/jq", "-c", program),
          inputs.mkString("\n"))).sorted
        if (ours == jqs) None else Some("mismatch")
    }

  /** Split at top-level occurrences of `sep` (string/paren/bracket aware). */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val parts = Seq.newBuilder[String]; val cur = new StringBuilder
    var depth = 0; var inStr = false; var esc = false
    s.foreach { c =>
      if (inStr) {
        cur += c
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true; cur += c
        case '(' | '[' | '{' => depth += 1; cur += c
        case ')' | ']' | '}' => depth -= 1; cur += c
        case x if x == sep && depth == 0 => parts += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    parts += cur.toString
    parts.result()
  }

  /** One round of shrink candidates, largest-first: drop a pipeline
    * stage, drop an object-construction field, replace a parenthesized
    * sub-expression with a trivial leaf.
    */
  private def shrinkCandidates(p: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val stages = splitTop(p, '|')
    if (stages.length > 1)
      stages.indices.foreach { i =>
        out += stages.patch(i, Nil, 1).mkString("|")
      }
    // drop one field of any top-level-trailing {…} construction stage
    val t = p.trim
    if (t.endsWith("}")) {
      val ob = t.lastIndexOf('{')
      if (ob >= 0 && splitTop(t.substring(ob), ' ').nonEmpty) {
        val inner = t.substring(ob + 1, t.length - 1)
        val fields = splitTop(inner, ',')
        if (fields.length > 1)
          fields.indices.foreach { i =>
            out += t.substring(0, ob) + "{" +
              fields.patch(i, Nil, 1).mkString(",") + "}"
          }
      }
    }
    // replace each balanced (...) with a trivial leaf
    var idx = p.indexOf('(')
    while (idx >= 0) {
      var d = 0; var j = idx; var close = -1; var inStr = false; var esc = false
      while (j < p.length && close < 0) {
        val c = p.charAt(j)
        if (inStr) {
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == '"') inStr = false
        } else c match {
          case '"' => inStr = true
          case '(' => d += 1
          case ')' => d -= 1; if (d == 0) close = j
          case _ =>
        }
        j += 1
      }
      if (close > idx) {
        out += p.substring(0, idx) + ".n" + p.substring(close + 1)
        out += p.substring(0, idx) + "0" + p.substring(close + 1)
      }
      idx = p.indexOf('(', idx + 1)
    }
    out.result().filter(_.trim.nonEmpty).distinct
  }

  /** Greedy minimizer: keep applying the first candidate that preserves
    * the SAME divergence signature until none does (bounded evaluations —
    * each costs a Spark job + a jq process; this only runs on failure).
    */
  private def minimize(program: String, inputs: Seq[String],
                       sig: String): String = {
    var cur = program
    var budget = 150
    var progress = true
    while (progress && budget > 0) {
      progress = false
      val it = shrinkCandidates(cur).filter(_.length < cur.length).iterator
      while (!progress && it.hasNext && budget > 0) {
        val cand = it.next()
        budget -= 1
        if (verdict(cand, inputs).contains(sig)) { cur = cand; progress = true }
      }
    }
    cur
  }

  private def fuzzRun(seed: Long, cases: Int, ext: Boolean = false,
                      ext2: Boolean = false, ext3: Boolean = false,
                      ext4: Boolean = false, ext5: Boolean = false,
                      ext6: Boolean = false, ext7: Boolean = false,
                      ext8: Boolean = false): Unit = {
    assume(jqBin.canExecute, "/usr/bin/jq not present")
    val r = new scala.util.Random(seed)
    var checked = 0
    (0 until cases).foreach { i =>
      val program = genProgram(r, ext, ext2, ext3, ext4, ext5, ext6, ext7, ext8)
      val inputs = Seq.fill(3)(genRow(r))
      verdict(program, inputs).foreach { sig =>
        val minimal = minimize(program, inputs, sig)
        val detail = (sparkSide(minimal, inputs),
          canon(runUtf8(Seq("/usr/bin/jq", "-c", minimal),
            inputs.mkString("\n"))).sorted)
        fail(
          s"""fuzz divergence (case $i, $sig)
             |minimal repro: $minimal
             |original     : $program
             |input : ${inputs.mkString(" | ")}
             |spark : ${detail._1}
             |jq    : ${detail._2.mkString(" ; ")}""".stripMargin)
      }
      checked += 1
    }
    assert(checked == cases)
  }

  // Seed rotation: keep BOTH pinned seeds (committed repro corpus), and
  // when extending the grammar add a NEW seed rather than changing these —
  // a changed seed silently retires every program the old one generated.
  test("500 random programs match jq (seed 20260814)") {
    fuzzRun(20260814L, 500)
  }

  test("500 random programs match jq (seed 987654321)") {
    fuzzRun(987654321L, 500)
  }

  // round-7 grammar extension (bindings + object merge) runs under its
  // own seed, preserving the two frozen corpora above
  test("500 random programs match jq (seed 7070707, bindings/merge grammar)") {
    fuzzRun(7070707L, 500, ext = true)
  }

  // round-8 grammar extension (runtime try/catch, recursive defs, stream
  // fields, ?// alternatives) under its own seed — the three corpora
  // above stay frozen
  test("500 random programs match jq (seed 80808080, try/recursion/stream grammar)") {
    fuzzRun(80808080L, 500, ext2 = true)
  }

  // round-8 second-tranche grammar (walk/map_values, unique_by, any/all
  // filters, indices, transpose, nth, gmtime/mktime/strftime, bracket and
  // multi-target assignment stages) under its own seed — the four corpora
  // above stay frozen
  test("500 random programs match jq (seed 9090909, walk/datetime/bracket grammar)") {
    fuzzRun(9090909L, 500, ext3 = true)
  }

  // round-8 third-tranche grammar (while streams, first/last over streams)
  // under its own seed — the five corpora above stay frozen
  test("500 random programs match jq (seed 10101010, while/first/last grammar)") {
    fuzzRun(10101010L, 500, ext4 = true)
  }

  // round-9 grammar extension (negative/OOB nth, self-referential
  // bind-once assignment RHS) under its own seed — the six corpora above
  // stay frozen
  test("500 random programs match jq (seed 11111111, bind-once/negative-nth grammar)") {
    fuzzRun(11111111L, 500, ext5 = true)
  }

  // round-10 grammar extension (label/break early-termination subset,
  // env/$ENV plan-time snapshot, $x.path postfix) under its own seed —
  // the seven corpora above stay frozen
  test("500 random programs match jq (seed 12121212, label/env/var-path grammar)") {
    fuzzRun(12121212L, 500, ext6 = true)
  }

  // round-11 grammar extension (computed setpath segments, computed range
  // steps incl. runtime-signed) under its own seed — the eight corpora
  // above stay frozen
  test("500 random programs match jq (seed 13131313, computed-path/range-step grammar)") {
    fuzzRun(13131313L, 500, ext7 = true)
  }

  // round-12 grammar extension (computed match() patterns —
  // offset/length/string subset) under its own seed — the nine corpora
  // above stay frozen
  test("500 random programs match jq (seed 14141414, dynamic-match grammar)") {
    fuzzRun(14141414L, 500, ext8 = true)
  }
}
