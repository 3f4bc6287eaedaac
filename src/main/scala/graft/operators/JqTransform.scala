package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, DateType, LongType, MapType, NullType, NumericType, StringType, StructField, StructType, TimestampType}

import graft.functions.Canonical

/** Output-record transform (reference O14, `jq_expr`):
  * `/root/reference/counter.go:439-466`, compiled at config load
  * (`config.go:112-118`).
  *
  * The reference embeds a full jq interpreter (gojq) and iterates its
  * outputs — a jq program emits 0..N values per input record
  * (`counter.go:441-465`). This compiler covers the practically-used jq
  * surface as declarative DataFrame transforms, so the whole program stays
  * inside Catalyst (codegen'd projections / filters / one generator for
  * multi-output stages — never a per-row interpreter):
  *
  *  - stage pipes: `select(.value > 0) | {out: .value}` — each top-level
  *    `|` segment is one DataFrame transform;
  *  - `select(cond)`: 0-or-1 outputs per input → a `filter` with jq
  *    truthiness (only `false` and `null` are falsy);
  *  - object construction `{"k": expr, shorthand_field}` (nested objects
  *    and `[array, construction]` included) → a `select` projection;
  *  - comma stages `{a: 1}, {a: 2}` : N outputs per input → ONE
  *    `explode` generator over an array of structs;
  *  - path stages `.field.sub` → struct expansion / scalar projection;
  *    `.field[]` → array iteration, one output per element (`explode`);
  *  - value-level function pipes: `.value | tostring`, plus `tonumber`,
  *    `length`, `floor`, `ascii_downcase`, `ascii_upcase`, `not` —
  *    type-directed where jq semantics demand it (`not` uses jq
  *    truthiness; `length` counts array/map elements and string chars);
  *  - `==` / `!=` are jq's TOTAL equality (null == null is true, null !=
  *    "x" is true, 1 == "1" is FALSE — cross-type values are unequal,
  *    objects compare by key set + values regardless of field order);
  *    `< <= > >=` are jq's total ORDER — null < false < true < number <
  *    string < array < object (cross-rank folds to a constant from the
  *    static types; within a rank, Spark's ordering matches jq's for
  *    same-type operands, and objects compare sorted-key-list first,
  *    then values in sorted-key order);
  *  - boolean `and`/`or`, arithmetic (`+` is jq's POLYMORPHIC form:
  *    numbers add, strings and arrays concat, objects merge shallowly
  *    right-biased, null is identity either side), `- * /`, parentheses,
  *    string/number/bool/null literals, and string INTERPOLATION
  *    (`"metric.\(.counter_id)"` → `concat`, null printing as "null");
  *  - `map(expr)` over array values — ONE codegen'd `transform`, with
  *    `.`/`.field` bound to the element inside the body (jq shadowing);
  *  - `reduce .path[] as $x (init; update)` — ONE codegen'd `aggregate`
  *    HOF; `.` is the accumulator and `$x` the element in the update;
  *  - `foreach .path[] as $x (init; update[; extract])` — reduce's SCAN
  *    twin (jq emits the extract — default: the accumulator — after
  *    every element): one `aggregate` HOF whose finish lambda yields the
  *    per-element outputs as an array; as a whole STAGE it explodes to
  *    jq's true one-output-per-element stream, and `[foreach …]` in
  *    value position is the collect form;
  *  - `def name: body;` / `def name($a; $b): body;` bindings at the
  *    program head — value-expression bodies compiled once, `$`-params
  *    bound per call on the same dynamic channel as `reduce`'s `as $x`;
  *    since round 8, bare FILTER params (`def f(g): g + g;`) expand by
  *    source-level macro substitution (jq's caller-context re-evaluation
  *    semantics), and RECURSION unrolls statically with a loud
  *    runtime-error cap;
  *  - `//` ALTERNATIVE operator (right-assoc, binds looser than `or`,
  *    jq truthiness: `a // b` is `a` unless `a` is null/false) — a
  *    `coalesce` for non-boolean operands, a truthiness `when` for
  *    booleans;
  *  - `if C then A [elif C2 then B]* [else E] end` → one `when`-chain
  *    with jq-truthy conditions; the else-less form emits `.` (the
  *    current value) on the false path, defined wherever bare `.` is —
  *    inside `map(...)` bodies; branches must share a Spark type;
  *  - `keys` (sorted; schema-static literal array for objects, runtime
  *    sort for map-typed values), `has(key|index)` (static membership
  *    for objects, `map_contains_key` for maps, bounds test for arrays),
  *    `to_entries` (field-order `[{key, value}]`; mixed value types fall
  *    back to string), `with_entries(f)` (the to_entries→map→from_entries
  *    composition, from the same three kernels), `setpath(["a","b"]; E)`
  *    (getpath's writer twin — leaf update/append via `withField`,
  *    intermediate structs must pre-exist), `from_entries` (over `{key, value}` entries,
  *    last-wins on duplicate keys like jq), `group_by(f)` (groups
  *    sorted by key, nulls first, stable within groups), `sort_by(f)`
  *    (stable ascending by f(x) — ≡ flatten ∘ group_by) and `sort`;
  *  - array/string builtins: `add` (type-directed sum/concat/flatten,
  *    null elements are identity), `any`/`all` (element truthiness),
  *    `unique`, `min`/`max` (null elements skipped — SQL semantics,
  *    documented divergence), `first`/`last` ([] → null, not an error),
  *    `reverse`, `join(sep)`, `ltrimstr`/`rtrimstr`, `startswith`/
  *    `endswith`, `split("lit")`;
  *  - a path whose top-level field does not exist in the input emits
  *    jq's `null` (NOT an analyzer error), so `.maybe_missing // 0`
  *    works against any record shape, like the reference's dynamic
  *    JSON objects;
  *  - regex builtins `test`/`match`/`capture`/`sub`/`gsub` with literal
  *    patterns and `i/x/s/m` flags, over Java regex (the \d/\w/anchors/
  *    groups subset is oniguruma-identical); `match` builds jq's match
  *    object, with null for jq's empty stream on no-match; sub/gsub
  *    replacements interpolate named captures (`"\(.name)"`) — gsub is
  *    one `regexp_replace`, sub splices around the first match;
  *  - `try E [catch H]`: errors in this compiler are plan-construction-
  *    time, so try/catch resolves statically — E's compile/type-probe
  *    failure folds the expression to H (error message bound to `.`),
  *    default jq-null;
  *  - `E as $x` stage-level bindings: the per-row value rides a hidden
  *    `__var_x` column into every later stage (`$x` resolves to it;
  *    HOF/def-bound `$x` shadows, jq's inner-scope rule); value-position
  *    `T as $x | body` binds at jq's true TERM precedence (`-6 as $v`
  *    negates OUTSIDE the binding — jq has no negative literals);
  *    destructuring patterns bind too (`as [$a, $b]` — element i, null
  *    past the end; `as {k: $x, $y}` — absent keys null, `{$y}`
  *    shorthand), NESTED to any depth since round 8 (`as [$a, [$b]]`,
  *    `as {k: [$x]}`), with `?//` alternative chains choosing the first
  *    TYPE-compatible pattern at plan time (all alternatives' names in
  *    scope, unchosen ones null — jq's rule; jq retries per row, a
  *    documented static-schema divergence for mixed-type streams);
  *  - assignment stages `.path = E` / `.path |= F` / `.path += E` (and
  *    `-=`, `*=`, `/=`, `//=`): jq's update operators — `=` row-scoped,
  *    `|=` with `.` = the old path value, `op=` old-op-(row-scoped rhs)
  *    with `+` polymorphic; lowered to one `withColumn`/`withField`
  *    projection (nested parents must exist; multi-target and bracket
  *    paths out of scope);
  *  - format strings `@text`/`@json`/`@base64`/`@base64d`/`@csv`/`@tsv`/
  *    `@uri`/`@html`/`@sh` as value filters — @csv/@tsv/@sh fold an array
  *    to one line with jq's quoting/escaping rules in a single codegen'd
  *    aggregate; @uri is RFC 3986 percent-encoding;
  *  - math/type/date builtins: `ceil`/`round`/`sqrt`/`fabs`/`exp`/`log`/
  *    `log2`/`log10`/`isnan`/`isinfinite`, `type`, `utf8bytelength`,
  *    `tojson` (canonical JSON), `todate`/`fromdate` (+`…iso8601` aliases,
  *    exact under the engine-pinned UTC session timezone);
  *  - `flatten`/`flatten(d)` (schema-static depth unrolling), `min_by`/
  *    `max_by` (stable-sort first/last — jq's tie pick), `index`/`rindex`
  *    (0-based substring positions, jq-null on no hit), `contains`/
  *    `inside` (the FULL recursive form: substring for strings,
  *    every-needle-in-some-haystack for arrays, key-subset with
  *    recursive values for objects, equality for scalars, cross-type
  *    false — statically unrolled, no UDF), `split(re; flags)` (two-arg regex form), `getpath`
  *    (literal path, never-error navigation — variant-aware);
  *  - `..` RECURSIVE DESCENT as a stage: the row object and every
  *    sub-value depth-first in document order, lowered to one
  *    array&lt;variant&gt; construction + one explode; later stages
  *    navigate the variant stream (`try_variant_get` paths, `.a?`
  *    no-op optional access, variant-aware select/==/type/tostring/
  *    tonumber/tojson); ordering comparisons and a second `..` over the
  *    runtime-typed stream stay out of scope, documented;
  *  - `paths` as a stage: document-order field paths of the sub-values
  *    that exist in the row (runtime nulls prune, like jq's data-driven
  *    paths) — a filter over a literal candidate array + one explode;
  *    array/map elements contribute no numeric-index descent
  *    (documented divergence); `leaf_paths` is the scalar-leaf
  *    restriction (jq's `paths(scalars)`), same scope;
  *  - round-6 second tranche: `fromjson` (string → VARIANT, navigable
  *    by `getpath` / `| .path` and the variant-aware builtins),
  *    `explode`/`implode` (full-Unicode code-point round-trip — ascii()
  *    is code-point-exact and implode builds UTF-16BE surrogate pairs
  *    for supplementary planes), `abs` (jq 1.7, type-preserving),
  *    `pow(x; y)`, `infinite`/`nan`, `del(.path)` (literal-path field
  *    removal, missing path = no-op), and the STREAM builtins
  *    `range(…)` (integer ranges, literal step) / `scan(re)`
  *    (group-less patterns) / `splits(re[; flags])` with jq's collect
  *    form — `[range(3)]`, `[.s | scan("a+")]` — unwrapping via a
  *    stream-tail rule, plus `limit(n; A)` over collected streams;
  *    `.path[]` in VALUE position is the same stream-as-array
  *    (`[.tags[]]` and `[limit(2; .tags[])]` collect like jq; follow-on
  *    pipes see the ARRAY — use `map(f)` for per-element piping); bare
  *    `.` also resolves on any single-column frame (the current value
  *    after a `.path[]`/`paths` stage). ROUND 8: jq's true 0..N
  *    multi-output semantics for streams at RECORD level — a bare
  *    stream STAGE (`range(3)`, `scan(re)` after a path stage, `.s |
  *    splits(re)` split across stages) explodes to one output row per
  *    stream element (empty stream → no rows), and a stage-level object
  *    construction with ONE stream-valued field (`{id: .id, t:
  *    .tags[]}`) emits one object per element through the same single
  *    generator — matching jq exactly for those shapes (iterating a
  *    runtime null emits nothing where jq errors; two stream fields in
  *    one construction — jq's cartesian product — stay rejected
  *    loudly). Any other bare VALUE expression is also a valid stage
  *    now (scalar output lands in a `value` column, structs expand);
  *    streams nested INSIDE a value expression still collect to arrays
  *    (documented divergence). The whole practically-used surface is
  *    DIFFERENTIALLY tested against the real jq binary
  *    (`JqDifferentialSpec`, 33 program/corpus cases vs /usr/bin/jq).
  *
  * Out of scope (documented divergence, unused by the reference's own
  * fixtures): slurp (a per-stream input-collection flag, not a program
  * construct — the engine's windowed aggregates are where cross-record
  * state belongs). Recursive defs are supported since round 8 via
  * bounded static unroll (re-parse per call site with a depth counter;
  * past the cap the call is a loud runtime `raise_error` — see
  * [[JqDef]]), and def FILTER params via source-level macro
  * substitution (jq evaluates a filter arg in the caller's context at
  * every reference — exactly what substitution yields; see
  * [[substituteFilterParams]]).
  * Programs needing the rest belong in a real jq; every config observed
  * in the reference repo compiles here.
  *
  * ROUND 8, second tranche: STATIC BRANCH PRUNING — an `if`/`elif`
  * condition that Catalyst folds to a constant (the `type == "…"`
  * dispatch idiom over schema-static values; decided on an empty
  * same-schema shell frame so no data is touched) picks its branch at
  * plan time, dropping branches that could never type-unify; inside HOF
  * lambdas the decision falls back to a non-null non-foldable stand-in
  * binding ([[analysisDummy]] — null checks fold via nullability, value
  * predicates never fold, so only type-level facts can prune). That
  * unlocks `walk(f)` (bottom-up schema recursion, f compiled per node
  * type — [[walkApply]]) and `map_values(f)` ([[mapValuesApply]]), plus
  * a jq-source PRELUDE ([[PreludeDefs]]: `until` as jq defines it, over
  * the filter-param + recursive-unroll machinery) and def calls in pipe
  * position (`A | f` with `.` bound to the piped value). Convention:
  * within walk/map_values a runtime-null node dispatches by its SCHEMA
  * type (jq reports "null") — observably identical for the usual
  * type-dispatch bodies whose null branch is `.`.
  *
  * Internally a parsed value is a `DataFrame => Column` — type-dependent
  * constructs (truthiness, `not`, `length`, struct expansion) resolve
  * against the actual input schema at stage-apply time.
  */
object JqTransform {

  /** A value expression, resolved against the stage's input frame. */
  private type V = DataFrame => Column

  def apply(df: DataFrame, jqExpr: String): DataFrame = compile(jqExpr)(df)

  /** Compile a jq program into a DataFrame transform (one per `|` stage,
    * composed left to right). `def` declarations at the program head are
    * stripped and compiled first; their names are in scope for every
    * later def body and for the whole stage pipeline.
    */
  def compile(src: String): DataFrame => DataFrame = {
    val (defs, rest) = stripDefs(src)
    val stages = splitTopLevel(rest, '|').map(_.trim).filter(_.nonEmpty)
    require(stages.nonEmpty, s"jq_expr is empty: $src")
    val compiled = stages.map(compileStage(_, defs))
    df => {
      val out = compiled.foldLeft(df)((d, stage) => stage(d))
      // A stage-level `E as $x` binding rides hidden __var_x columns into
      // later stages; projection stages (object construction / path) drop
      // them naturally, but assignment/binding stages use withColumn and
      // keep the full frame — a terminal one would leak the hidden columns
      // into the output schema. Final cleanup here, so `.v as $x |
      // .value = $x` ends at the user-visible schema.
      val hidden = out.columns.filter(_.startsWith("__var_"))
      if (hidden.isEmpty) out else out.drop(hidden.toIndexedSeq: _*)
    }
  }

  /** jq's `--slurp` (`-s`) mode, per group: each group's rows become ONE
    * array (elements = full row objects, ordered by `orderCols` — jq's
    * array order is the input stream order, which a distributed engine
    * must pin explicitly), and `program` runs ONCE over that array as a
    * VALUE expression with `.` bound to it (`length`, `map(f) | add`,
    * `sort_by`, `group_by`, `unique`, object construction, `def`s …).
    * Not part of the reference's config surface (gojq is invoked
    * per-record there, `counter.go:439-466`) — this is the extension
    * analog of `jq -s`, group-wise because that is the shape that
    * scales: ONE shuffle on the group keys, each group's array built in
    * its reducer (the array must fit in a task — the same bound any jq
    * program's per-value memory has).
    *
    * Output: the group columns plus the program result — struct results
    * expand to columns, scalars land in a `value` column.
    */
  def slurpBy(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
              program: String): DataFrame = {
    require(groupCols.nonEmpty, "jq slurpBy: group columns required (use slurp for global)")
    slurpImpl(df, groupCols, orderCols, program)
  }

  /** jq's `--slurp` over the WHOLE input: the entire stream becomes one
    * array and the program runs once — jq -s semantics exactly. The
    * global form funnels through a single reducer by construction
    * (that is what "the whole input as one array" means); use
    * [[slurpBy]] for anything large.
    */
  def slurp(df: DataFrame, orderCols: Seq[String], program: String): DataFrame =
    slurpImpl(df, Nil, orderCols, program)

  private def slurpImpl(df: DataFrame, groupCols: Seq[String],
                        orderCols: Seq[String], program: String): DataFrame = {
    val (defs, rest) = stripDefs(program)
    val bodyV: V = {
      val p = new P(rest, defs)
      val v = p.parseValue()
      require(!p.hasMore, s"jq slurp: trailing input after program: $rest")
      v
    }
    // Element = the full row as an object (field order = schema order,
    // like the per-record path). Order keys ride OUTSIDE the payload so
    // sorting is by them alone; sort_array is a partition-local sort of
    // an already-grouped array — no extra shuffle beyond the groupBy.
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    val keyed = struct(
      orderCols.zipWithIndex.map { case (c, i) => col(c).as(s"__k$i") } :+
        payload.as("__p"): _*)
    val slurpCol = transform(array_sort(collect_list(keyed)), x => x.getField("__p"))
    val agged =
      if (groupCols.isEmpty) df.agg(slurpCol.as("__slurp"))
      else df.groupBy(groupCols.map(col): _*).agg(slurpCol.as("__slurp"))
    val bound = Bound(col("__slurp"), col("__slurp"))
    val (resV, resT) = elemBinding.withValue(Some(bound)) {
      (bodyV(agged), dtOfV(agged, bodyV))
    }
    resT match {
      case st: StructType =>
        val expanded = st.fieldNames.map(f => resV.getField(f).as(f))
        agged.select(groupCols.map(col) ++ expanded: _*)
      case _ =>
        agged.select(groupCols.map(col) :+ resV.as("value"): _*)
    }
  }

  /** A user-defined function: `$`-declared value params (bound on the
    * [[varBindings]] channel, exactly like `reduce`'s `as $x`) and a
    * value-expression body compiled once at program load.
    *
    * RECURSIVE defs (round 8): a body referencing its own name keeps its
    * SOURCE and re-parses at every call site with a per-name depth
    * counter — a bounded static unroll (static schemas cannot host an
    * unbounded fixpoint; Columns are trees). `unrollCap` levels deep the
    * recursive call lowers to `raise_error(...)` cast to double, so a
    * row whose data actually recurses past the cap fails LOUDLY at
    * runtime instead of silently truncating (numeric-typed cap — the
    * practical recursion shapes are arithmetic; a string-typed recursion
    * that reaches the cap fails at compile with a type error). The cap
    * adapts to the call fan-out: 12 levels for single self-call bodies
    * (factorial/countdown shapes), 5 for multi-call bodies (fib shapes)
    * — evaluation costs ~2^depth column constructions (probe + real
    * passes), so the caps are where plan-build time stays sub-second.
    */
  private final case class JqDef(params: List[String], body: V,
                                 src: String = "", recursive: Boolean = false,
                                 unrollCap: Int = 0,
                                 filterIdx: Set[Int] = Set.empty)

  /** Substitute FILTER params by source (jq's filter args are evaluated
    * in the caller's context at every reference — exactly macro
    * substitution). Token-aware: skips string literals (but substitutes
    * inside `\(...)` interpolation holes), object-KEY positions
    * (`{g: g}` keeps the key literal, substitutes the value — jq's
    * rule), field access `.g`, and variables `$g`.
    */
  private def substituteFilterParams(src: String,
                                     subs: Map[String, String]): String = {
    if (subs.isEmpty) return src
    val sb = new StringBuilder
    var i = 0
    // literal depth: strings nest through `\(...)` holes — even entries
    // are code contexts, odd are string-literal contexts
    var strNest = List.empty[Int] // paren depth inside each open hole
    var inStr = false
    def prevNonWs: Char = {
      var j = sb.length - 1
      while (j >= 0 && sb.charAt(j).isWhitespace) j -= 1
      if (j >= 0) sb.charAt(j) else ' '
    }
    def nextNonWs(from: Int): Char = {
      var j = from
      while (j < src.length && src.charAt(j).isWhitespace) j += 1
      if (j < src.length) src.charAt(j) else ' '
    }
    while (i < src.length) {
      val c = src.charAt(i)
      if (inStr) { // string-literal context
        sb += c
        if (c == '\\' && i + 1 < src.length) {
          if (src.charAt(i + 1) == '(') { // interpolation hole → code
            strNest ::= 1; inStr = false
          }
          sb += src.charAt(i + 1); i += 1
        } else if (c == '"') {
          inStr = false // string closed; back to enclosing code context
        }
        i += 1
      } else if (c == '"') { inStr = true; sb += c; i += 1 }
      else if (strNest.nonEmpty && (c == '(' || c == ')')) {
        val d = strNest.head + (if (c == '(') 1 else -1)
        if (d == 0) { strNest = strNest.tail; inStr = true } // hole closed
        else strNest = d :: strNest.tail
        sb += c; i += 1
      } else if ((c.isLetter || c == '_') && {
        val p = if (sb.nonEmpty) sb.charAt(sb.length - 1) else ' '
        !(p.isLetterOrDigit || p == '_' || p == '.' || p == '$')
      }) {
        val st = i
        while (i < src.length && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_')) i += 1
        val tok = src.substring(st, i)
        val keyPos = (prevNonWs == '{' || prevNonWs == ',') &&
          nextNonWs(i) == ':'
        subs.get(tok) match {
          case Some(rep) if !keyPos => sb ++= rep
          case _ => sb ++= tok
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Strip leading `def name($a; $b): body;` declarations (jq's function
    * bindings, scoped from declaration to end of program — supported at
    * the program HEAD, covering the whole pipeline). Each body is a value
    * expression compiled with all PRIOR defs in scope, so defs compose
    * (jq's declare-before-use rule — mutual recursion is impossible in
    * jq's grammar too). A SELF-referencing body is supported since round
    * 8 via bounded static unroll (see [[JqDef]]); params must be
    * `$`-variables (jq's value-param form, `def f($x): …`); bare filter
    * params are out of scope, documented.
    */
  /** jq-source PRELUDE: builtins that are themselves jq definitions over
    * the compiler's own def machinery (filter params by macro
    * substitution + bounded recursive unroll) — exactly how jq ships
    * them in builtin.jq. Injected by [[stripDefs]] only when referenced
    * and not shadowed by a user `def` of the same name (jq's builtin
    * shadowing rule). `until`'s iteration count is bounded by the
    * recursive unroll cap (a loud runtime error past it, see [[JqDef]]).
    */
  private val PreludeDefs: Seq[(String, String)] = Seq(
    "until" ->
      "def until(cond; update): if cond then . else (update | until(cond; update)) end; ")

  /** Plan-time environment snapshot backing jq's `env` / `$ENV`
    * (`counter.go:439-466` accepts any gojq program; gojq's env reads the
    * process environment at evaluation time). Captured once per JVM on
    * first use, on the DRIVER — the deterministic choice on a cluster,
    * where executor environments may differ, and jq's own model (the env
    * is fixed for the life of the process). Rendered as a string→string
    * map; key order is irrelevant to jq object semantics.
    */
  private lazy val envSnapshot: Map[String, String] = sys.env.toMap

  /** Builtins REJECTED loudly with the row-model rationale (the
    * documented-rejection tranche): each record is exactly ONE jq input
    * document — the reference drives gojq one Kinesis record at a time
    * (`counter.go:439-466`) — so multi-document cursors and process
    * control have no analog here, and a silent approximation would be
    * worse than a loud wall.
    */
  private val RejectedBuiltins: Map[String, String] = {
    val input = "jq_expr: input/inputs is out of the row-model scope: " +
      "each record is exactly ONE jq input document (the reference runs " +
      "gojq once per Kinesis record), so there is no next-document cursor " +
      "to read; restructure as a column over all records instead"
    val stream = "jq_expr: tostream/fromstream is out of the row-model " +
      "scope: the stream form decomposes one document into [path, leaf] " +
      "event pairs whose shapes differ per row — a static-schema column " +
      "cannot hold them; use paths/leaf_paths/getpath for path-level reads"
    val halt = "jq_expr: halt/halt_error terminates a CLI process; a " +
      "distributed query has no process to halt — filter rows with " +
      "select() or fail loudly with a guarded expression instead"
    Map("input" -> input, "inputs" -> input,
      "tostream" -> stream, "fromstream" -> stream,
      "halt" -> halt, "halt_error" -> halt)
  }

  private def stripDefs(src: String): (Map[String, JqDef], String) = {
    var defs = Map.empty[String, JqDef]
    var s = PreludeDefs.foldRight(src) { case ((n, d), acc) =>
      val referenced =
        ("(?<![A-Za-z0-9_.$])" + n + "\\s*\\(").r.findFirstIn(acc).isDefined
      val userDefined =
        ("def\\s+" + n + "\\s*\\(").r.findFirstIn(acc).isDefined
      if (referenced && !userDefined) d + acc else acc
    }
    var go = true
    while (go) {
      val t = s.dropWhile(_.isWhitespace)
      if (t.startsWith("def") && t.length > 3 &&
          !(t.charAt(3).isLetterOrDigit || t.charAt(3) == '_')) {
        // find the terminating ';' at bracket/paren/brace/quote depth 0
        var depth = 0; var inStr = false; var end = -1
        var i = 3
        while (end < 0 && i < t.length) {
          val c = t.charAt(i)
          if (inStr) {
            if (c == '\\') i += 1
            else if (c == '"') inStr = false
          } else c match {
            case '"' => inStr = true
            case '{' | '[' | '(' => depth += 1
            case '}' | ']' | ')' => depth -= 1
            case ';' if depth == 0 => end = i
            case _ =>
          }
          i += 1
        }
        require(end > 0, s"jq_expr: unterminated def (missing ';'): $t")
        val decl = t.substring(3, end)
        val colon = {
          // the header's ':' — the first depth-0 colon (param lists carry
          // no colons; string defaults are out of scope)
          var d = 0; var k = -1; var j = 0
          while (k < 0 && j < decl.length) {
            decl.charAt(j) match {
              case '(' => d += 1
              case ')' => d -= 1
              case ':' if d == 0 => k = j
              case _ =>
            }
            j += 1
          }
          require(k > 0, s"jq_expr: def needs 'name[(params)]: body': def$decl;")
          k
        }
        val header = decl.substring(0, colon).trim
        val bodySrc = decl.substring(colon + 1).trim
        val (name, params, filterIdx) = header.indexOf('(') match {
          case -1 => (header, List.empty[String], Set.empty[Int])
          case p =>
            require(header.endsWith(")"), s"jq_expr: malformed def params: $header")
            val ps = header.substring(p + 1, header.length - 1).split(';').toList
              .map(_.trim).filter(_.nonEmpty)
            ps.foreach(x => require(
              (x.startsWith("$") && x.length > 1 &&
                x.drop(1).forall(ch => ch.isLetterOrDigit || ch == '_')) ||
                x.matches("[A-Za-z_][A-Za-z0-9_]*"),
              s"jq_expr: def params must be $$-variables or filter names, " +
                s"got '$x' in: $header"))
            val fIdx = ps.zipWithIndex.collect {
              case (x, idx) if !x.startsWith("$") => idx
            }.toSet
            (header.substring(0, p).trim,
              ps.map(x => if (x.startsWith("$")) x.drop(1) else x), fIdx)
        }
        require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
          s"jq_expr: bad def name '$name'")
        // does the body call itself? (word-boundary scan; a hit inside a
        // string literal is a harmless false positive — the call-site
        // re-parse is semantics-preserving for non-recursive bodies)
        val selfCalls = ("(?<![A-Za-z0-9_])" + java.util.regex.Pattern.quote(name) +
          "(?![A-Za-z0-9_])").r.findAllMatchIn(bodySrc).size
        if (selfCalls == 0 && filterIdx.isEmpty) {
          val bodyP = new P(bodySrc, defs)
          val body = bodyP.parseValue()
          bodyP.skipWs()
          require(!bodyP.hasMore, s"jq_expr: trailing input after def body: $bodySrc")
          defs += (name -> JqDef(params, body, bodySrc))
        } else if (filterIdx.nonEmpty) {
          // FILTER params: the body is a macro template — call sites
          // substitute each filter arg's SOURCE and parse there (errors
          // still surface at JqTransform.compile, which parses every
          // call site); recursion detection composes (unrollCap below)
          val cap = if (selfCalls <= 1) 12 else 5
          defs += (name -> JqDef(params, null, bodySrc,
            recursive = selfCalls > 0, unrollCap = cap, filterIdx = filterIdx))
        } else {
          // recursive: validate by parsing ONE expansion level with self
          // in scope; call sites re-parse with their own depth counters.
          // Caps are small because the probe/real evaluation passes cost
          // ~2^depth column constructions (each level's type probe and
          // real build both evaluate the child): 2^12 ≈ 4k tree nodes is
          // cheap, 2^24 is minutes — measured, not theoretical
          val cap = if (selfCalls == 1) 12 else 5
          val selfDef = JqDef(params, null, bodySrc, recursive = true, unrollCap = cap)
          val bodyP = new P(bodySrc, defs + (name -> selfDef), Map(name -> cap))
          val body = bodyP.parseValue()
          bodyP.skipWs()
          require(!bodyP.hasMore, s"jq_expr: trailing input after def body: $bodySrc")
          defs += (name -> selfDef.copy(body = body))
        }
        s = t.substring(end + 1)
      } else go = false
    }
    (defs, s)
  }

  /** TYPE PROBING for expressions inside map/reduce bodies: a lambda
    * variable cannot be analyzed against the top-level frame (only its
    * enclosing higher-order function binds it), so every bound variable
    * carries a typed-null PROBE twin. Under [[probeMode]] the `.`/`$x`
    * atoms evaluate to the probe instead of the real lambda variable,
    * making any subexpression independently analyzable for the
    * type-directed constructs (`//`, `length`, `not`, select truthiness).
    * Spark invokes HOF builder lambdas exactly once at plan-construction
    * time, so dynamically-scoped bindings are sound and nest.
    */
  private case class Bound(real: Column, probe: Column, dt: DataType = null)

  private val probeMode = new scala.util.DynamicVariable[Boolean](false)

  private def dtOf(df: DataFrame, c: Column): DataType =
    df.select(c.as("__v")).schema.head.dataType

  /** Per-probe memo of V → type, keyed by object identity (a parse node's
    * binding context is fixed by its syntactic position, so its probed
    * type is stable within one stage application). Without it, nested
    * type-directed constructs re-probe their operand subtrees — a
    * right-assoc `//` chain of depth d would cost 2^d evaluations.
    */
  private val dtMemo = new scala.util.DynamicVariable[
    java.util.IdentityHashMap[AnyRef, DataType]](null)

  /** The type a value expression produces against this frame — evaluated
    * in probe mode so it works inside map/reduce bodies too.
    */
  /** jq's POLYMORPHIC `+` over already-typed operands: numbers add,
    * strings/arrays concat, null is identity either side, and objects
    * merge SHALLOWLY right-biased. Merge key order = left's keys (right's
    * value winning on conflict — even an explicit null value wins, jq
    * semantics), then right's new keys in right order. Static-schema
    * convention: a runtime-NULL object operand merges as the empty object
    * over the UNION schema (its fields read as null — the engine's
    * absent-as-null rule), and null + null yields null. A key typed
    * differently on the two sides fails loudly at plan time (Catalyst
    * branch type mismatch), never merges silently. By-name operands so
    * the NullType arms never evaluate the other side.
    */
  private def polyAdd(lt: DataType, rt: DataType,
                      l: => Column, r: => Column): Column = {
    // null-identity with TWO embeddings per operand, not three: concat/+
    // are null iff an operand is null, so `coalesce(f(l,r), l, r)` is
    // exactly `when(l null, r).when(r null, l).otherwise(f)` — and the
    // operand fan-out decides whether a recursive-def unroll's tree is
    // 4^depth or 6^depth (measured: the 3-embedding form OOM'd codegen
    // on a depth-5 double recursion)
    def guarded(f: (Column, Column) => Column): Column = {
      val (lc, rc) = (l, r)
      coalesce(f(lc, rc), lc, rc)
    }
    (lt, rt) match {
      case (NullType, _) => r
      case (_, NullType) => l
      case (StringType, StringType) => guarded(concat(_, _))
      case (_: ArrayType, _: ArrayType) => guarded(concat(_, _))
      case (_: NumericType, _: NumericType) => guarded(_ + _)
      case (ls: StructType, rs: StructType) =>
        val (lc, rc) = (l, r)
        val fields = ls.fields.map { f =>
          if (rs.fieldNames.contains(f.name))
            when(rc.isNull, lc.getField(f.name))
              .otherwise(rc.getField(f.name)).as(f.name)
          else lc.getField(f.name).as(f.name)
        } ++ rs.fields.filterNot(f => ls.fieldNames.contains(f.name))
          .map(f => rc.getField(f.name).as(f.name))
        when(lc.isNull && rc.isNull, lit(null))
          .otherwise(struct(fields.toIndexedSeq: _*))
      case _ => throw new IllegalArgumentException(
        s"jq_expr: '+' over ${lt.simpleString} and ${rt.simpleString} " +
          "is unsupported (numbers, strings, arrays, object merge)")
    }
  }

  /** jq's POLYMORPHIC `*`: numbers multiply; a string times a number (in
    * EITHER order, like jq) repeats it — the count truncates toward zero
    * (`"ab" * 2.7` is "abab") and a count ≤ 0 yields null, jq-exactly;
    * two objects DEEP-merge (jq's recursive merge: keys present in both
    * with object values on BOTH sides recurse, anything else takes the
    * right side — an explicit right-null value wins). Static-schema
    * convention shared with [[polyAdd]]: a runtime-NULL object operand
    * merges as the empty object over the union schema (jq errors on a
    * LITERAL null operand, which is NullType here and stays a loud
    * plan-time error), and null * null yields null.
    */
  private def polyMul(lt: DataType, rt: DataType,
                      l: => Column, r: => Column): Column = (lt, rt) match {
    case (_: NumericType, _: NumericType) => l * r
    case (StringType, _: NumericType) => strRepeat(l, r)
    case (_: NumericType, StringType) => strRepeat(r, l)
    case (ls: StructType, rs: StructType) => deepMergeStruct(ls, rs, l, r)
    case _ => throw new IllegalArgumentException(
      s"jq_expr: '*' over ${lt.simpleString} and ${rt.simpleString} " +
        "is unsupported (numbers, string × number, object deep merge)")
  }

  /** jq's `/`: numbers divide (always to a float, like jq — Spark's
    * `Divide` is double); a string divided by a string SPLITS on the
    * literal separator, keeping empty fields INCLUDING trailing ones
    * (`"a,,b," / ","` is ["a","","b",""], and `"abc"/"abc"` is ["",""]) —
    * the separator is `\Q…\E`-quoted so regex metacharacters split
    * literally, and the empty separator splits into code points, all
    * jq-exact. Anything else (including a literal-null operand, which jq
    * errors on) fails loudly at plan time.
    */
  private def polyDiv(lt: DataType, rt: DataType,
                      l: => Column, r: => Column): Column = (lt, rt) match {
    case (_: NumericType, _: NumericType) =>
      // zero guard as in jqMod: jq-null (or the enclosing try's handler)
      // instead of ANSI DIVIDE_BY_ZERO
      val (lc, rc) = (l, r)
      when(rc === lit(0), lit(null)).otherwise(lc / rc)
    case (StringType, StringType) =>
      val (lc, sep) = (l, r)
      when(lc.isNull || sep.isNull, lit(null).cast(ArrayType(StringType)))
        .when(length(sep) === 0, regexp_extract_all(lc, lit("(?s)."), lit(0)))
        .otherwise(call_function("split", lc,
          concat(lit("\\Q"), sep, lit("\\E"))))
    case _ => throw new IllegalArgumentException(
      s"jq_expr: '/' over ${lt.simpleString} and ${rt.simpleString} " +
        "is unsupported (numbers, string split by string)")
  }

  private def strRepeat(str: Column, n: Column): Column = {
    val k = n.cast("int")
    when(str.isNull || k.isNull || k <= 0, lit(null).cast(StringType))
      .otherwise(call_function("repeat", str, k))
  }

  private def deepMergeStruct(ls: StructType, rs: StructType,
                              l: => Column, r: => Column): Column = {
    val (lc, rc) = (l, r)
    val fields = ls.fields.map { lf =>
      rs.fields.find(_.name == lf.name) match {
        case Some(rf) => ((lf.dataType, rf.dataType) match {
          case (a: StructType, b: StructType) =>
            deepMergeStruct(a, b, lc.getField(lf.name), rc.getField(lf.name))
          case _ =>
            when(rc.isNull, lc.getField(lf.name))
              .otherwise(rc.getField(lf.name))
        }).as(lf.name)
        case None => lc.getField(lf.name).as(lf.name)
      }
    } ++ rs.fields.filterNot(f => ls.fieldNames.contains(f.name))
      .map(f => rc.getField(f.name).as(f.name))
    when(lc.isNull && rc.isNull, lit(null))
      .otherwise(struct(fields.toIndexedSeq: _*))
  }

  private def dtOfV(df: DataFrame, v: V): DataType = {
    val memo = dtMemo.value
    if (memo == null)
      dtMemo.withValue(new java.util.IdentityHashMap[AnyRef, DataType])(dtOfV(df, v))
    else {
      val cached = memo.get(v)
      if (cached != null) cached
      else {
        val t = probeMode.withValue(true)(dtOf(df, v(df)))
        memo.put(v, t)
        t
      }
    }
  }

  // ---------------------------------------------- jq total ordering -----

  /** jq's cross-type rank: null < false < true < numbers < strings <
    * arrays < objects (jq manual, "sort"). Booleans share one rank here —
    * false < true is the within-rank SQL comparison. Non-JSON Spark types
    * (timestamp, binary…) never arise from JSON records; they rank with
    * numbers so same-type comparisons still work.
    */
  private def jqTypeRank(dt: DataType): Int = dt match {
    case NullType => 0
    case BooleanType => 1
    case _: NumericType => 2
    case StringType => 3
    case _: ArrayType => 4
    case _: StructType | _: MapType => 5
    case _ => 2
  }

  /** Lexicographic `<` over two string lists (object key-list comparison —
    * jq compares sorted key arrays before values).
    */
  private def seqLess(a: Seq[String], b: Seq[String]): Boolean =
    a.zip(b).find { case (x, y) => x != y } match {
      case Some((x, y)) => x < y
      case None => a.length < b.length
    }

  /** jq's total-order `<` over two columns with known static types: a
    * runtime null sorts below everything, cross-RANK comparisons fold to
    * the constant rank order, and same-rank operands use Spark's ordering
    * (numbers numeric, strings lexicographic, false < true, arrays
    * element-wise-then-length — all matching jq for same-type operands).
    * Objects compare sorted key lists first (schema-static → constant),
    * then values in sorted-key order, exactly like jq. Never NULL, so the
    * derived `<= > >=` (total order: `a <= b ⟺ !(b < a)`) are sound.
    */
  private def jqLessCols(lc: Column, rc: Column, lt: DataType, rt: DataType): Column = {
    if (lt.typeName == "variant" || rt.typeName == "variant")
      throw new IllegalArgumentException(
        "jq_expr: ordering comparison over '..' variant values is " +
          "unsupported (==/!= only; extract with tonumber/tostring first)")
    val (lr, rr) = (jqTypeRank(lt), jqTypeRank(rt))
    val base: Column =
      if (lt == NullType || rt == NullType) lit(false) // guards below decide
      else if (lr != rr) lit(lr < rr)
      else (lt, rt) match {
        case (a: StructType, b: StructType) =>
          val (ka, kb) = (a.fieldNames.sorted.toSeq, b.fieldNames.sorted.toSeq)
          if (ka != kb) lit(seqLess(ka, kb))
          else struct(ka.map(n => lc.getField(n).as(n)): _*) <
            struct(kb.map(n => rc.getField(n).as(n)): _*)
        case (_: MapType, _) | (_, _: MapType) =>
          throw new IllegalArgumentException(
            "jq_expr: ordering comparison over map-typed objects is unsupported " +
              "(schema-static objects compare jq-style; maps have runtime keys)")
        case _ => lc < rc
      }
    when(lc.isNull, rc.isNotNull).when(rc.isNull, lit(false)).otherwise(base)
  }

  private def jqLess(df: DataFrame, l: V, r: V): Column =
    jqLessCols(l(df), r(df), dtOfV(df, l), dtOfV(df, r))

  /** The element type of an array-typed value, with a jq-flavored error
    * when it is not an array.
    */
  private def elementTypeV(df: DataFrame, arr: V, what: String): DataType =
    dtOfV(df, arr) match {
      case ArrayType(t, _) => t
      case other => throw new IllegalArgumentException(
        s"jq_expr: $what expects an array input, got $other")
    }

  /** Resolve a `.a.b.c` path against the frame's ACTUAL schema. A field
    * missing at any step yields jq's `null` instead of an analyzer error —
    * the reference's records are dynamic JSON objects where an absent key
    * reads as nil (`counter.go:274`), and jq follows suit. Struct fields
    * navigate by schema; map-typed columns fall back to key lookup (whose
    * absent-key semantics are already null).
    */
  private def pathColumn(df: DataFrame, parts: Seq[String]): Column = {
    // after a `..` stage the current value is ONE variant column: paths
    // navigate inside it (try_variant_get — missing keys/non-objects read
    // as jq null, exactly like the static-schema route below)
    if (variantFrame(df))
      return try_variant_get(col("__variant"),
        "$." + parts.mkString("."), "variant")
    // honor the session's resolution mode (Spark default: case-insensitive)
    // so `.Value` finds a `value` column exactly like col("Value") would
    val caseSensitive =
      df.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    // exact match wins outright (a struct can legally hold both "Value"
    // and "value"); only then fall back to the case-insensitive scan
    def find(st: StructType, p: String): Option[String] =
      st.fieldNames.find(_ == p).orElse(
        if (caseSensitive) None else st.fieldNames.find(_.equalsIgnoreCase(p)))
    @annotation.tailrec
    def loop(dt: DataType, acc: Option[Column], rest: List[String]): Column = rest match {
      case Nil => acc.getOrElse(lit(null))
      case p :: tail => dt match {
        case st: StructType => find(st, p) match {
          case Some(actual) =>
            loop(st(actual).dataType, Some(acc.fold(col(actual))(_.getField(actual))), tail)
          case None => missingField(st, p)
        }
        case mt: MapType if acc.nonEmpty =>
          loop(mt.valueType, Some(acc.get.getItem(p)), tail)
        case _ => lit(null)
      }
    }
    loop(df.schema, None, parts.toList)
  }

  // ------------------------------------------------------------- stages --

  private def compileStage(stage: String,
                           defs: Map[String, JqDef]): DataFrame => DataFrame = {
    if (stage == ".") identity
    else if (stage == "..") compileDescend
    else if (stage == "paths") compilePaths
    else if (stage.startsWith("paths(") && stage.endsWith(")"))
      compileFilteredPaths(stage.substring("paths(".length, stage.length - 1), defs)
    else if (stage == "leaf_paths") compileLeafPaths
    else if (stage.startsWith("select")) compileSelect(stage, defs)
    else if (stage.startsWith("foreach")) compileForeach(stage, defs)
    else if (BindingStage.matches(stage)) compileBinding(stage, defs)
    else if (AssignStage.matches(stage)) compileAssign(stage, defs)
    else {
      // comma-list at stage level → 0..N outputs per row (here exactly N)
      val constructs = splitTopLevel(stage, ',').map(_.trim)
      if (constructs.length > 1) compileMultiOutput(constructs, defs)
      else compileSingle(stage, defs)
    }
  }

  /** `E as $x` as a whole STAGE: jq's variable binding, in the pipe-spanning
    * form real programs use (`.value as $v | select($v > 0) | {kept: $v}`).
    * The binding is a per-row value whose scope is every LATER stage — a
    * DataFrame-transform pipeline carries that as a hidden `__var_x`
    * column (`withColumn`: one projection, fused into the next stage's
    * codegen), and `$x` references resolve to it via the schema fallback
    * in the `$` atom. One-level destructuring patterns (`as [$a, $b]`,
    * `as {a: $x, $y}`) bind one hidden column per name; the body-scoped
    * form (`E as $x | body` as ONE expression) lives in the value parser
    * (`parseAtomBound`) — at stage level the two scopings agree for
    * every non-shadowing program. The hidden column vanishes at the next projection stage
    * (object construction / path), which every terminal stage is.
    */
  private object BindingStage {
    // top-level "… as <pattern>[ ?// <pattern>]*" — the splitTopLevel
    // caller already guarantees no top-level '|' inside `stage`; a
    // pattern is `$name` or `[...]`/`{...}` destructuring nested up to
    // two bracket levels in the REGEX (the parser itself recurses to any
    // depth — deeper nesting just needs the expression spelled with a
    // body-scoped `as`, which has no regexed stage boundary)
    private val Re = {
      val atom = "\\$[A-Za-z_][A-Za-z0-9_]*"
      val flat = "[^\\[\\]{}]"
      val d1 = s"(?:\\[(?:$flat)*\\]|\\{(?:$flat)*\\})"
      val d2elem = s"(?:$flat|$d1)"
      val d2 = s"(?:\\[(?:$d2elem)*\\]|\\{(?:$d2elem)*\\})"
      val pat = s"(?:$atom|$d2)"
      java.util.regex.Pattern.compile(
        s"(?s)^(.*\\S)\\s+as\\s+($pat(?:\\s*\\?//\\s*$pat)*)$$")
    }
    def parts(stage: String): Option[(String, String)] = {
      val m = Re.matcher(stage)
      if (m.matches) Some((m.group(1), m.group(2))) else None
    }
    def matches(stage: String): Boolean = parts(stage).isDefined
  }

  /** Assignment stages — jq's update operators over a literal-ident path:
    * `.path = E`, `.path |= F`, `.path += E` (and `-=`, `*=`, `/=`,
    * `%=`, `//=`). Semantics follow jq exactly:
    *
    *  - `=`: the RHS sees `.` = the WHOLE input row; the path is set to
    *    its value (a new top-level key appends, like jq's key order).
    *  - `|=`: the RHS sees `.` = the OLD value AT THE PATH (so `.n \|= . * 2`
    *    doubles and `.meta.k \|= tostring` stringifies in place).
    *  - `op=`: `.p += E` ≡ `.p \|= . + (E on the ORIGINAL input)` — the
    *    arithmetic applies old-op-rhs with the rhs row-scoped, `+` being
    *    the polymorphic form (numbers/strings/arrays/objects).
    *  - `//=`: keep the old value when truthy (jq truthiness: only
    *    null/false are falsy), else the row-scoped RHS.
    *
    * Lowering: a top-level path is one `withColumn`; a nested path is
    * `withField` on the root column (Catalyst's UpdateFields — one
    * projection, codegen-fused). ROUND 8: bracket segments — `.a[] |= f`
    * maps every element through one codegen'd `transform` (object values
    * via `transform_values`), `.a[i] op= E` updates in place with jq's
    * null-padding on an out-of-range non-negative leaf index and jq's
    * loud error on an out-of-bounds negative one — and the multi-target
    * form `(.a, .b) op= E` folds the targets sequentially (later targets
    * see earlier writes, jq's path-list semantics). Static-schema
    * caveats, loud not silent: a nested path's PARENT struct must
    * already exist (jq fabricates `{}` parents), and a runtime-null
    * parent stays null rather than being fabricated.
    */
  /** One segment of an assignment target path: a field, a literal array
    * index (negative = from the end, jq-style), or `[]` (every element /
    * every object value). */
  private sealed trait PathSeg
  private final case class FieldSeg(name: String) extends PathSeg
  private final case class IdxSeg(i: Int) extends PathSeg
  private case object AllSeg extends PathSeg

  private object AssignStage {
    private val PathRe =
      "\\.[A-Za-z_][A-Za-z0-9_]*(?:\\.[A-Za-z_][A-Za-z0-9_]*|\\[(?:-?[0-9]+)?\\])*"
    private val Ops = "(\\|=|\\+=|-=|\\*=|%=|/=|//=|=)"
    private val Single = java.util.regex.Pattern.compile(
      s"(?s)^($PathRe)\\s*$Ops\\s*(.*)$$")
    // jq's multi-target form: `(.a, .b) = E` — each target updated in
    // sequence over the SAME record (later targets see earlier updates,
    // jq's sequential path-update semantics)
    private val Multi = java.util.regex.Pattern.compile(
      s"(?s)^\\(\\s*($PathRe(?:\\s*,\\s*$PathRe)*)\\s*\\)\\s*$Ops\\s*(.*)$$")

    /** Tokenize `.a.b[0].c[]` into segments. */
    def segs(path: String): Seq[PathSeg] = {
      val out = Seq.newBuilder[PathSeg]
      var i = 0
      while (i < path.length) {
        path.charAt(i) match {
          case '.' =>
            var j = i + 1
            while (j < path.length &&
                (path.charAt(j).isLetterOrDigit || path.charAt(j) == '_')) j += 1
            out += FieldSeg(path.substring(i + 1, j)); i = j
          case '[' =>
            val j = path.indexOf(']', i)
            val inner = path.substring(i + 1, j).trim
            out += (if (inner.isEmpty) AllSeg else IdxSeg(inner.toInt))
            i = j + 1
          case _ => i += 1 // unreachable under the regexes
        }
      }
      out.result()
    }

    def parts(stage: String): Option[(Seq[Seq[PathSeg]], String, String)] = {
      val m1 = Single.matcher(stage)
      if (m1.matches) {
        val op = m1.group(2); val rhs = m1.group(3)
        // `.a == E` is a comparison, not an assignment
        if (op == "=" && rhs.startsWith("=")) None
        else Some((Seq(segs(m1.group(1))), op, rhs.trim))
      } else {
        val m2 = Multi.matcher(stage)
        if (!m2.matches) None
        else {
          val op = m2.group(2); val rhs = m2.group(3)
          if (op == "=" && rhs.startsWith("=")) None
          else Some((m2.group(1).split(',').toSeq.map(p => segs(p.trim)),
            op, rhs.trim))
        }
      }
    }
    def matches(stage: String): Boolean = parts(stage).isDefined
  }

  /** A parsed `as` binding pattern: the statically-known names it binds
    * plus the binder from the bound (column, type) to per-name triples.
    * The name list exists for `?//`: EVERY alternative's names are in
    * scope in the body, with the unchosen alternatives' names bound null
    * (jq's rule).
    */
  private final case class AsPattern(
      names: Seq[String],
      bind: (Column, DataType) => Seq[(String, Column, DataType)])

  /** Apply a `?//` alternative chain: the first pattern that is
    * TYPE-compatible with the bound value wins (jq retries per row on
    * runtime errors; static column types make the choice a plan-time
    * constant — the honest declarative analog), and names bound only by
    * other alternatives ride along as jq-null.
    */
  private def bindAlternatives(pats: Seq[AsPattern], c: Column,
                               dt: DataType): Seq[(String, Column, DataType)] = {
    val chosen = pats.view
      .map(p => try Some(p.bind(c, dt))
                catch { case _: IllegalArgumentException => None })
      .collectFirst { case Some(b) => b }
      .getOrElse(throw new IllegalArgumentException(
        s"jq_expr: no `?//` alternative pattern matches ${dt.simpleString}"))
    val byName = chosen.map(t => t._1 -> t).toMap
    pats.flatMap(_.names).distinct.map(n =>
      byName.getOrElse(n, (n, lit(null), NullType)))
  }

  /** Is this raw operand source a literal zero (possibly parenthesized /
    * signed)? The `%`/`/` (and `%=`/`/=`) compile-time divisor guard —
    * jq raises on a zero divisor, and the statically-visible case should
    * fail loudly instead of shipping the documented null convention.
    */
  private def isZeroLiteral(src: String): Boolean = {
    var t = src.trim
    while (t.length > 1 && t.head == '(' && t.last == ')')
      t = t.substring(1, t.length - 1).trim
    if (t.startsWith("-") || t.startsWith("+")) t = t.substring(1).trim
    t.matches("0+(\\.0*)?")
  }

  private def compileAssign(stage: String,
                            defs: Map[String, JqDef]): DataFrame => DataFrame = {
    val (targets, op, rhsSrc) = AssignStage.parts(stage).get
    require(rhsSrc.nonEmpty, s"jq_expr: assignment needs a right-hand side: $stage")
    require(!((op == "%=" || op == "/=") && isZeroLiteral(rhsSrc)),
      s"jq_expr: '$op $rhsSrc' divides by literal zero — jq raises " +
        "'cannot be divided because the divisor is zero'")
    val p = new P(rhsSrc, defs)
    val rhs = p.parseValue()
    p.skipWs()
    require(!p.hasMore, s"jq_expr: trailing input in assignment: $stage")
    // multi-target `(.a, .b) op= E`: sequential path updates over the
    // same record. jq's gen_update (compile.c) DUPs the input and binds
    // the RHS ONCE into $tmp against the ORIGINAL '.' for `=` and every
    // arithmetic op= — only `|=` (_modify's update filter) re-evaluates
    // at each path. So `(.a,.b) = .a + 10` on {a:1,b:2} is a=11,b=11:
    // materialize the RHS as a temp column on the pre-update frame and
    // fold the path writes over that.
    df0 => {
      val bindOnce = op != "|="
      val tmp = Iterator.from(0).map(i => s"__graft_rhs_$i")
        .find(n => !df0.columns.exists(_.equalsIgnoreCase(n))).get
      val (start, boundRhs, boundDt) =
        if (bindOnce) {
          val withTmp = df0.withColumn(tmp, rhs(df0))
          (withTmp, col(tmp), withTmp.schema(tmp).dataType)
        } else (df0, lit(null), NullType)
      val folded = targets.foldLeft(start) { (df, path) =>
      def rowRhs: Column = if (bindOnce) boundRhs else rhs(df) // '.' = the ORIGINAL row
      def rhsDt: DataType = if (bindOnce) boundDt else dtOfV(df, rhs)
      // the update applied AT the target site — `old` is the value there
      // (per-element inside `[]`/index traversals)
      def updFn(old: Column, oldDt: DataType): Column = op match {
        case "=" => rowRhs
        case "|=" => // '.' = the old path value
          elemBinding.withValue(Some(Bound(old, lit(null).cast(oldDt), oldDt)))(rhs(df))
        case "+=" => polyAdd(oldDt, rhsDt, old, rowRhs)
        case "-=" => old - rowRhs
        case "*=" => polyMul(oldDt, rhsDt, old, rowRhs)
        case "/=" => polyDiv(oldDt, rhsDt, old, rowRhs)
        case "%=" => // zero guard: jq-null, never ANSI DIVIDE_BY_ZERO
          val rr = rowRhs.cast("long")
          when(rr === lit(0L), lit(null)).otherwise(old.cast("long") % rr)
        case "//=" => oldDt match {
          case BooleanType => when(old.isNull || !old, rowRhs).otherwise(old)
          case NullType => rowRhs
          case _ => coalesce(old, rowRhs)
        }
      }
      // Rebuild the value at `cur` with the path's remainder applied.
      // Bracket traversals (round 8): `[]` maps every array element (or
      // object value) through ONE codegen'd transform/transform_values;
      // a literal index updates in place, with jq's null-padding on an
      // out-of-range non-negative LEAF index (`[] | .[2] = 1` →
      // [null,null,1]) and jq's loud out-of-bounds error for negative
      // indexes; reaching THROUGH an out-of-range index would need jq's
      // fabricated containers — a loud per-row error instead (static
      // schemas cannot fabricate). A runtime-null container stays null
      // (documented convention, as with nested parents).
      def rebuild(cur: Column, dt: DataType, rest: List[PathSeg]): Column =
        rest match {
          case Nil => updFn(cur, dt)
          case FieldSeg(n) :: t => dt match {
            case st: StructType =>
              // case-insensitive, matching pathColumn's read resolution
              st.fields.find(_.name.equalsIgnoreCase(n)) match {
                case Some(fd) =>
                  cur.withField(fd.name,
                    rebuild(cur.getField(fd.name), fd.dataType, t))
                case None if t.isEmpty => // leaf key appends, like jq
                  cur.withField(n, updFn(lit(null), NullType))
                case None => throw new IllegalArgumentException(
                  s"jq_expr: assignment parent .$n does not exist — static " +
                    s"schemas cannot fabricate intermediate objects: $stage")
              }
            case other => throw new IllegalArgumentException(
              s"jq_expr: assignment path .$n reaches into " +
                s"${other.simpleString}, not an object: $stage")
          }
          case AllSeg :: t => dt match {
            case at: ArrayType =>
              transform(cur, x => rebuild(x, at.elementType, t))
            case mt: MapType =>
              transform_values(cur, (_, x) => rebuild(x, mt.valueType, t))
            case st: StructType =>
              // jq's `.obj[] |= f`: every field value updated from its
              // ORIGINAL value (not left-to-right); withField on a
              // runtime-null struct stays null, the documented convention
              st.fields.foldLeft(cur)((c, fd) =>
                c.withField(fd.name, rebuild(cur.getField(fd.name), fd.dataType, t)))
            case other => throw new IllegalArgumentException(
              s"jq_expr: '[]' in an assignment path over " +
                s"${other.simpleString} (array or object required): $stage")
          }
          case IdxSeg(n) :: t => dt match {
            case at: ArrayType =>
              val et = at.elementType
              if (n >= 0) {
                val inPlace = transform(cur, (x, idx) =>
                  when(idx === lit(n), rebuild(x, et, t)).otherwise(x))
                if (t.isEmpty) {
                  val padded = concat(cur,
                    array_repeat(lit(null).cast(et), lit(n) - size(cur)),
                    array(rebuild(lit(null).cast(et), et, Nil)))
                  when(size(cur) > lit(n), inPlace).otherwise(padded)
                } else
                  when(size(cur) > lit(n), inPlace).otherwise(raise_error(lit(
                    s"jq_expr: index $n out of range for a nested " +
                      s"assignment — static schemas cannot fabricate " +
                      s"containers: $stage")))
              } else {
                val norm = size(cur).cast("long") + lit(n.toLong)
                val inPlace = transform(cur, (x, idx) =>
                  when(idx.cast("long") === norm, rebuild(x, et, t)).otherwise(x))
                when(norm >= lit(0L), inPlace).otherwise(raise_error(lit(
                  // jq 1.6's message for `.[−k] = v` past the front
                  "Out of bounds negative array index")))
              }
            case other => throw new IllegalArgumentException(
              s"jq_expr: '[$n]' in an assignment path over " +
                s"${other.simpleString} (array required): $stage")
          }
        }
      path.toList match {
        case FieldSeg(top) :: rest =>
          df.columns.find(_.equalsIgnoreCase(top)) match {
            case Some(resolved) =>
              val dt = df.schema(df.schema.fieldIndex(resolved)).dataType
              df.withColumn(resolved, rebuild(col(resolved), dt, rest))
            case None if rest.isEmpty => // new top-level key appends
              df.withColumn(top, updFn(lit(null), NullType))
            case None => throw new IllegalArgumentException(
              s"jq_expr: assignment parent .$top does not exist — static " +
                s"schemas cannot fabricate intermediate objects: $stage")
          }
        case _ => throw new IllegalArgumentException(
          s"jq_expr: assignment target must start with a field: $stage")
      }
      }
      if (bindOnce) folded.drop(tmp) else folded
    }
  }

  private def compileBinding(stage: String,
                             defs: Map[String, JqDef]): DataFrame => DataFrame = {
    val (exprSrc, patSrc) = BindingStage.parts(stage).get
    val p = new P(exprSrc, defs)
    val value = p.parseValue()
    p.skipWs()
    require(!p.hasMore, s"jq_expr: trailing input in binding stage: $stage")
    val pp = new P(patSrc, defs)
    val binders = pp.parseAsPatternAlts()
    pp.skipWs()
    require(!pp.hasMore, s"jq_expr: trailing input in binding pattern: $stage")
    df => bindAlternatives(binders, value(df), dtOfV(df, value))
      .foldLeft(df) { case (d, (n, c, _)) => d.withColumn(s"__var_$n", c) }
  }

  /** `foreach .path[] as $x (init; update[; extract])` as a whole STAGE —
    * jq's true streaming form: one output per source element, each the
    * extract (default: the updated accumulator) after that element's
    * update — a SCAN, where `reduce` is the fold. One codegen'd
    * `aggregate` HOF with a finish lambda builds the per-row output array
    * ([[P.parseForeach]]), and ONE `explode` streams it — never a per-row
    * interpreter, same execution shape as the comma-stage generator.
    * Object-valued extracts expand to columns like every other stage.
    */
  private def compileForeach(stage: String,
                             defs: Map[String, JqDef]): DataFrame => DataFrame = {
    val scan: V = {
      val p = new P(stage, defs)
      p.expectKeyword("foreach")
      val v = p.parseForeach()
      p.skipWs()
      require(!p.hasMore, s"jq_expr: trailing input after foreach stage: $stage")
      v
    }
    df => {
      val exploded = df.select(explode(scan(df)).as("__v"))
      exploded.schema.head.dataType match {
        case _: StructType => exploded.select(col("__v.*"))
        case _ => exploded.select(col("__v").as("value"))
      }
    }
  }

  /** `select(cond)`: keep the row iff cond is truthy — jq truthiness is
    * "not false and not null"; `0` and `""` are truthy (gojq semantics,
    * exercised by the reference's iterator loop `counter.go:449-457`).
    */
  private def compileSelect(stage: String,
                            defs: Map[String, JqDef]): DataFrame => DataFrame = {
    val inner: V = {
      val p = new P(stage, defs)
      p.expectWord("select"); p.expect('(')
      val v = p.parseValue()
      p.expect(')'); p.skipWs()
      require(!p.hasMore, s"jq_expr: trailing input after select(...): $stage")
      v
    }
    df => {
      val v = inner(df)
      val keep = dtOfV(df, inner) match {
        case BooleanType => coalesce(v, lit(false)) === lit(true)
        // variant: falsy iff null, variant-null, or boolean false — the
        // type is checked first so number 0 / "" stay truthy (jq), never
        // coerced through a boolean cast
        case dt if dt.typeName == "variant" =>
          when(v.isNull || is_variant_null(v), lit(false))
            .otherwise(when(schema_of_variant(v) === "BOOLEAN",
              coalesce(try_variant_get(v, "$", "boolean"), lit(false)))
              .otherwise(lit(true)))
        case _ => v.isNotNull
      }
      df.where(keep)
    }
  }

  /** `..` as a whole STAGE: jq's recursive descent — the current object
    * and every sub-value, depth-first in document order (root, then each
    * field's subtree in field order; array elements in order), one output
    * row per value. Mixed-type emission over a static schema lowers to
    * ONE array<variant> construction (self + per-field subtrees; array/
    * map elements via transform+flatten) and ONE explode — never a
    * per-row interpreter. Follow-on stages see the single `__variant`
    * column: paths navigate via `try_variant_get`, and `select` /
    * `==`/`!=` / `type` / `tostring` / `tonumber` / `tojson` are
    * variant-aware, and a SECOND `..` descends again (depth-bounded
    * variant_explode unroll — [[compileDescendOverVariants]]). Deeper
    * static typing over the stream (sort_by, arithmetic) stays out of
    * scope, documented — a variant value's type is runtime data, and
    * those constructs are schema-static by design.
    */
  private def compileDescend: DataFrame => DataFrame = { df =>
    if (variantFrame(df)) compileDescendOverVariants(df)
    else {
      val fields = df.schema.fields.filterNot(_.name.startsWith("__var_")).toSeq
      val rowCol = struct(fields.map(f => col(f.name).as(f.name)): _*)
      val depth = staticDepth(StructType(fields))
      df.select(explode(subtreeVariants(StructType(fields), rowCol))
        .as("__variant", variantDepthMeta(depth)))
    }
  }

  /** Container-nesting depth of a static type: how many explode levels a
    * value of this type can have below itself. Scalars are 0.
    */
  private def staticDepth(dt: DataType): Int = dt match {
    case st: StructType =>
      1 + (if (st.fields.isEmpty) 0 else st.fields.map(f => staticDepth(f.dataType)).max)
    case at: ArrayType => 1 + staticDepth(at.elementType)
    case mt: MapType => 1 + staticDepth(mt.valueType)
    case _ => 0
  }

  private def variantDepthMeta(depth: Int): org.apache.spark.sql.types.Metadata =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.variantDepth", depth.toLong).build()

  /** A SECOND `..` — recursive descent over the variant stream a prior
    * `..` emitted. A variant's structure is runtime data, but its DEPTH
    * is not: every value in the stream is a subtree of a static-schema
    * row, so the original schema's nesting depth (threaded through the
    * `__variant` column's metadata) bounds the recursion, and the stage
    * unrolls exactly that many `variant_explode` lateral generators —
    * level k holding the depth-k children (objects by field, arrays by
    * element; scalars and nulls contribute none, jq's no-descent-into-
    * null rule), unioned with the values themselves. jq's `.. | ..`
    * multiset multiplicities fall out of per-input-row descent. Without
    * the metadata (a variant frame not built by `..`) a documented cap
    * of 12 levels applies — extra levels beyond the real depth generate
    * zero rows, never wrong ones.
    */
  private def compileDescendOverVariants(df: DataFrame): DataFrame = {
    val meta = df.schema.head.metadata
    val depth =
      if (meta.contains("graft.variantDepth")) meta.getLong("graft.variantDepth").toInt
      else 12
    var level = df.select(col("__variant"))
    var out = level
    for (_ <- 1 to depth) {
      level = level
        .lateralJoin(df.sparkSession.tvf.variant_explode(col("__variant").outer()))
        .select(col("value").as("__variant"))
      out = out.unionAll(level)
    }
    // children of a depth-D tree have depth ≤ D: the same bound carries
    out.select(col("__variant").as("__variant", variantDepthMeta(depth)))
  }

  /** `paths` as a whole STAGE: jq's path enumeration — one output row per
    * sub-value that EXISTS in the row (runtime nulls prune their branch,
    * matching jq's data-driven paths on dynamic JSON), each an
    * array&lt;string&gt; of field names in document order. The candidate
    * set is schema-static, so the stage lowers to a FILTER over a literal
    * array of (path, present?) structs + ONE explode — no interpreter.
    * Scope: struct fields only — array/map elements have runtime-only
    * indices and contribute their own path but no descent (jq emits
    * numeric index paths there; documented divergence).
    */
  private def compilePaths: DataFrame => DataFrame =
    pathsStage((_, _, _) => lit(true))

  /** `leaf_paths` as a whole STAGE: `paths` restricted to SCALAR leaves
    * (jq: `paths(scalars)`) — same literal-candidate filter + explode;
    * container-valued fields (arrays/maps, runtime-indexed) contribute
    * no leaf, the same no-numeric-index-descent scope as `paths`.
    */
  private def compileLeafPaths: DataFrame => DataFrame =
    pathsStage((_, dt, _) => lit(typeFilterHolds("scalars", dt)))

  /** jq's type-filter builtin names (`paths(numbers)` etc) decided from
    * the candidate's STATIC type. `nulls` never matches here: the paths
    * stages prune runtime-null branches (documented), and a
    * statically-NullType field is such a branch.
    */
  private def typeFilterHolds(name: String, dt: DataType): Boolean = name match {
    case "scalars" => !(dt.isInstanceOf[StructType] ||
      dt.isInstanceOf[ArrayType] || dt.isInstanceOf[MapType])
    case "numbers" => dt.isInstanceOf[NumericType]
    case "strings" => dt == StringType
    case "booleans" => dt == BooleanType
    case "objects" => dt.isInstanceOf[StructType] || dt.isInstanceOf[MapType]
    case "arrays" => dt.isInstanceOf[ArrayType]
    case "iterables" => dt.isInstanceOf[StructType] ||
      dt.isInstanceOf[ArrayType] || dt.isInstanceOf[MapType]
    case "nulls" => dt == NullType
    case other => throw new IllegalArgumentException(
      s"jq_expr: unknown type filter '$other'")
  }

  private val TypeFilterNames = Set("scalars", "numbers", "strings",
    "booleans", "objects", "arrays", "iterables", "nulls")

  /** `paths(f)` as a whole STAGE: jq's FILTERED path enumeration — the
    * [[compilePaths]] candidate walk with f applied per candidate, `.`
    * bound to the candidate's value. Type-filter names decide statically
    * from each candidate's schema type ([[typeFilterHolds]]); a general
    * predicate compiles per candidate (each candidate's type is static,
    * so `type`-dispatch folds per node like walk) with jq truthiness by
    * the predicate's static result type.
    */
  private def compileFilteredPaths(inner: String,
                                   defs: Map[String, JqDef]): DataFrame => DataFrame = {
    val name = inner.trim
    if (TypeFilterNames.contains(name))
      pathsStage((_, dt, _) => lit(typeFilterHolds(name, dt)))
    else {
      // parse ONCE; evaluate per candidate under its own binding (the
      // applyBound shape: fresh type-probe memo, dummy-first so
      // type-dispatch folds per candidate's static type)
      val p = new P(inner, defs)
      val pred = p.parseValue()
      p.skipWs()
      require(!p.hasMore, s"jq_expr: trailing input in paths($inner)")
      pathsStage { (df, dt, c) =>
        val (v, vdt) = applyBound(df, c, dt, pred)
        vdt match {
          case BooleanType => coalesce(v, lit(false)) === lit(true)
          case _ => v.isNotNull
        }
      }
    }
  }

  private def pathsStage(
      pred: (DataFrame, DataType, Column) => Column): DataFrame => DataFrame = { df =>
    val fields = df.schema.fields.filterNot(_.name.startsWith("__var_")).toSeq
    def walk(dt: DataType, c: Column, prefix: Seq[String]): Seq[Column] = {
      val self = struct(
        array(prefix.map(lit(_)): _*).as("p"),
        (c.isNotNull && pred(df, dt, c)).as("ok"))
      dt match {
        case st: StructType =>
          self +: st.fields.toSeq.flatMap(f =>
            walk(f.dataType, c.getField(f.name), prefix :+ f.name))
        case _ => Seq(self)
      }
    }
    val candidates = fields.flatMap(f => walk(f.dataType, col(f.name), Seq(f.name)))
    val kept = filter(array(candidates: _*), e => e.getField("ok"))
    df.select(explode(kept).as("__e"))
      .select(col("__e.p").as("path"))
  }

  /** One value as a VARIANT, via its canonical JSON bytes (null → variant
    * null, like jq's `..` which emits nulls as values).
    */
  private def toVariantJson(dt: DataType, c: Column): Column =
    parse_json(coalesce(Canonical.canonicalJsonTyped(dt, c), lit("null")))

  /** The depth-first subtree of one value as array<variant> (self first —
    * jq's `..` document order). A runtime-null branch contributes just its
    * own null, no descent into children (jq does not descend into null).
    */
  private def subtreeVariants(dt: DataType, c: Column): Column = dt match {
    case st: StructType =>
      val self = toVariantJson(dt, c)
      val kids = st.fields.toSeq.map(f => subtreeVariants(f.dataType, c.getField(f.name)))
      when(c.isNull, array(self))
        .otherwise(concat(array(self) +: kids: _*))
    case ArrayType(et, _) =>
      val self = toVariantJson(dt, c)
      when(c.isNull, array(self))
        .otherwise(concat(array(self), flatten(transform(c, x => subtreeVariants(et, x)))))
    case MapType(_, vt, _) =>
      val self = toVariantJson(dt, c)
      when(c.isNull, array(self))
        .otherwise(concat(array(self),
          flatten(transform(map_values(c), x => subtreeVariants(vt, x)))))
    case _ => array(toVariantJson(dt, c))
  }

  /** Is this frame the single-column variant stream a `..` stage emits? */
  private def variantFrame(df: DataFrame): Boolean =
    df.schema.length == 1 && df.schema.head.name == "__variant" &&
      df.schema.head.dataType.typeName == "variant"

  /** jq type name of a variant value, from `schema_of_variant`'s DDL
    * string (scalar names are exact; ARRAY&lt;…&gt;/OBJECT&lt;…&gt;
    * prefixes cover containers; everything else is numeric).
    */
  private def variantTypeName(v: Column): Column = {
    val sv = schema_of_variant(v)
    when(v.isNull || is_variant_null(v), lit("null"))
      .when(sv === "VOID", lit("null"))
      .when(sv === "BOOLEAN", lit("boolean"))
      .when(sv === "STRING", lit("string"))
      .when(sv.startsWith("ARRAY"), lit("array"))
      .when(sv.startsWith("OBJECT") || sv.startsWith("STRUCT") || sv.startsWith("MAP"),
        lit("object"))
      .otherwise(lit("number"))
  }

  /** jq `==` between a variant value and a statically-typed one: equal iff
    * the RUNTIME type rank matches (so `"5" == 5` is false, like jq) and
    * the typed comparison agrees. A null/missing variant equals exactly
    * jq null.
    */
  private def variantEq(v: Column, typed: Column, dt: DataType): Column = {
    val vNull = v.isNull || is_variant_null(v)
    dt match {
      case NullType => vNull
      case BooleanType =>
        variantTypeName(v) === "boolean" &&
          try_variant_get(v, "$", "boolean") <=> typed
      case _: NumericType =>
        variantTypeName(v) === "number" &&
          try_variant_get(v, "$", "double") <=> typed.cast("double")
      case StringType =>
        variantTypeName(v) === "string" &&
          try_variant_get(v, "$", "string") <=> typed
      case other => throw new IllegalArgumentException(
        "jq_expr: == between a '..' variant value and a " +
          s"${other.simpleString} is unsupported (scalars only)")
    }
  }

  /** One construction per input row: object → projection; path → struct
    * expansion (object result) or single-column projection (scalar result,
    * column named after the last path segment); `.path[]` → array
    * ITERATION (jq's true 0..N form): one output per element, an
    * `explode` generator (empty/null arrays emit nothing, like jq).
    */
  /** Is this stage exactly a `.path[.sub…][[]]` navigation (with optional
    * trailing `?`s) — the never-error postfix walk with its own naming
    * rule — as opposed to a path-headed VALUE expression (`.a + 1`),
    * which the bare-value branch owns?
    */
  private def pathOnlyStage(stage: String): Boolean = {
    val pp = new P(stage)
    try {
      pp.parsePathParts()
      pp.tryConsume("[]")
      !pp.hasMore
    } catch { case _: IllegalArgumentException => false }
  }

  private def compileSingle(stage: String,
                            defs: Map[String, JqDef]): DataFrame => DataFrame = {
    val p = new P(stage, defs)
    p.skipWs()
    if (p.peek == '{') {
      val fields = p.parseObjectFields(recordStreams = true)
      p.skipWs()
      require(!p.hasMore, s"jq_expr: trailing input after object: $stage")
      val streams = p.streamFields.toSet
      // jq semantics: a stream-valued field makes the construction emit
      // one object per stream element (0 outputs for an empty stream),
      // and SEVERAL stream fields emit their cartesian product. One
      // explode generator per stream field, chained — every compare
      // downstream (driver oracle, differential) is order-insensitive,
      // so jq's iteration order needn't be reproduced
      // Temp columns are named by FIELD INDEX, not by key: jq keys are
      // case-sensitive, so {a: ..., A: ...} must produce both fields, and
      // key-derived temp names collide under Spark's default
      // case-insensitive column resolution (ambiguous-reference error).
      df => {
        var cur = df.select(fields.zipWithIndex.map { case ((_, v), i) =>
          v(df).as(s"__f_$i") }: _*)
        fields.zipWithIndex.collect { case ((k, _), i) if streams(k) => i }
          .foreach { i =>
            cur = cur.select(cur.columns.map(c =>
              if (c == s"__f_$i") explode(col(c)).as(c) else col(c)): _*)
          }
        cur.select(fields.zipWithIndex.map { case ((k, _), i) =>
          col(s"__f_$i").as(k) }: _*)
      }
    } else if (p.peek == '.' && pathOnlyStage(stage)) {
      val path = p.parsePathParts()
      val iterate = p.tryConsume("[]")
      p.skipWs()
      require(!p.hasMore, s"jq_expr: trailing input after path: $stage")
      require(path.nonEmpty, s"jq_expr: bare '.' handled above: $stage")
      df => {
        val c = pathColumn(df, path)
        val projected =
          if (iterate) df.select(explode(c).as("__v"))
          else df.select(c.as("__v"))
        projected.schema.head.dataType match {
          case _: StructType => projected.select(col("__v.*"))
          case _ => projected.select(col("__v").as(path.last))
        }
      }
    } else {
      // BARE VALUE stage: any other full value expression is a stage whose
      // output is the value itself (jq's `A | B` with B a value filter).
      // A stream-valued stage (range/scan/splits/limit/…) explodes to
      // jq's true 0..N records — the same generator as `.path[]`; a
      // scalar-valued one projects a single `value` column (struct
      // results expand, like every other stage). Pipe-only builtins
      // (scan, splits, del, …) parse via the `. | stage` rewrite — the
      // stage's implicit input is the current value.
      def parsed(src: String): (V, Boolean) = {
        val pp = new P(src, defs)
        val v = pp.parseValue()
        pp.skipWs()
        require(!pp.hasMore, s"jq_expr: trailing input after stage: $stage")
        (v, pp.endedInStream)
      }
      val (v, isStream) =
        try parsed(stage)
        catch { case e1: IllegalArgumentException =>
          try parsed(". | " + stage)
          catch { case _: IllegalArgumentException => throw e1 }
        }
      df => {
        val projected =
          if (isStream) df.select(explode(v(df)).as("__v"))
          else df.select(v(df).as("__v"))
        projected.schema.head.dataType match {
          case _: StructType => projected.select(col("__v.*"))
          case _ => projected.select(col("__v").as("value"))
        }
      }
    }
  }

  /** `{..}, {..}, ...` — N output records per input row, as ONE generator:
    * explode over an array of structs (not an N-way union, which would
    * re-plan the upstream N times). All constructs must produce the same
    * field set; Spark unifies compatible field types.
    */
  private def compileMultiOutput(constructs: Seq[String],
                                 defs: Map[String, JqDef]): DataFrame => DataFrame = {
    val parsed: Seq[Seq[(String, V)]] = constructs.map { c =>
      val p = new P(c, defs)
      p.skipWs()
      require(p.peek == '{',
        s"jq_expr: comma stages must be object constructions, got: $c")
      val fields = p.parseObjectFields()
      p.skipWs()
      require(!p.hasMore, s"jq_expr: trailing input after object: $c")
      fields
    }
    val keys = parsed.head.map(_._1)
    require(parsed.forall(_.map(_._1) == keys),
      s"jq_expr: comma-constructed objects must share one field set " +
        s"(got ${parsed.map(_.map(_._1).mkString("{", ",", "}")).mkString(" vs ")})")
    df => {
      val structs = parsed.map(fs => struct(fs.map { case (k, v) => v(df).as(k) }: _*))
      df.select(explode(array(structs: _*)).as("__r")).select(col("__r.*"))
    }
  }

  // ------------------------------------------------- top-level splitting --

  /** Split on `sep` at bracket/paren/brace/quote depth 0. A `|`
    * immediately followed by `=` is the update-assign operator `|=`, not
    * a stage separator.
    */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        cur.append(c)
        if (c == '\\' && i + 1 < s.length) { cur.append(s.charAt(i + 1)); i += 1 }
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true; cur.append(c)
        case '{' | '[' | '(' => depth += 1; cur.append(c)
        case '}' | ']' | ')' => depth -= 1; cur.append(c)
        case `sep` if depth == 0 &&
            !(sep == '|' && i + 1 < s.length && s.charAt(i + 1) == '=') =>
          out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.result()
  }

  // ------------------------------------------------------- value parser --

  /** Named functions for value-level pipes; type-directed against the
    * stage's input frame where jq semantics depend on the operand type
    * (taking the V, not a built Column, so the type probe can run even
    * inside map/reduce bodies).
    */
  private val Funcs: Map[String, (DataFrame, V) => Column] = Map(
    // jq add: null for [], numeric sum / string concat / one-level array
    // concat by element type; null ELEMENTS are identity (jq: null + x
    // is x), folded with one codegen'd aggregate HOF
    "add" -> ((df, v) => {
      val et = elementTypeV(df, v, "add")
      val arr = v(df)
      val summed = et match {
        case _: NumericType =>
          aggregate(arr, lit(0).cast(et), (acc, x) => acc + coalesce(x, lit(0).cast(et)))
        case StringType =>
          aggregate(arr, lit(""), (acc, x) => concat(acc, coalesce(x, lit(""))))
        case _: ArrayType => flatten(arr)
        case NullType => lit(null) // all-null elements: identity sum = null
        case dt => throw new IllegalArgumentException(
          s"jq_expr: add over array<${dt.simpleString}> is unsupported")
      }
      when(size(arr) > 0, summed)
    }),
    // jq any/all with element truthiness; any([]) = false, all([]) = true
    // fall out of exists/forall
    "any" -> ((df, v) => exists(v(df), elemTruthy(df, v, "any"))),
    "all" -> ((df, v) => forall(v(df), elemTruthy(df, v, "all"))),
    // jq unique: sorted distinct under jq's order (static element type ⇒
    // sort_array's null-first ascending IS jq's, as in sort)
    "unique" -> ((df, v) => {
      elementTypeV(df, v, "unique")
      sort_array(array_distinct(v(df)))
    }),
    // jq min/max; [] → null. DIVERGENCE: null elements are skipped (SQL
    // array_min/array_max) where jq ranks null smallest — min of a
    // null-bearing array is its smallest non-null here, null in jq
    "min" -> ((df, v) => { elementTypeV(df, v, "min"); array_min(v(df)) }),
    "max" -> ((df, v) => { elementTypeV(df, v, "max"); array_max(v(df)) }),
    // jq first/last; DIVERGENCE: [] yields null (try_element_at) where jq
    // errors — the same skip-on-error analog as tonumber
    "first" -> ((df, v) => { elementTypeV(df, v, "first"); try_element_at(v(df), lit(1)) }),
    "last" -> ((df, v) => { elementTypeV(df, v, "last"); try_element_at(v(df), lit(-1)) }),
    // jq reverse: arrays and strings share Spark's reverse
    "reverse" -> ((df, v) => reverse(v(df))),
    // jq 1.7 trim family (whitespace trim on strings; jq errors on
    // non-strings — here the usual loud plan-time type check)
    "trim" -> ((df, v) => dtOfV(df, v) match {
      case StringType | NullType => trim(v(df))
      case dt => throw new IllegalArgumentException(
        s"jq_expr: trim expects a string, got ${dt.simpleString}")
    }),
    "ltrim" -> ((df, v) => dtOfV(df, v) match {
      case StringType | NullType => ltrim(v(df))
      case dt => throw new IllegalArgumentException(
        s"jq_expr: ltrim expects a string, got ${dt.simpleString}")
    }),
    "rtrim" -> ((df, v) => dtOfV(df, v) match {
      case StringType | NullType => rtrim(v(df))
      case dt => throw new IllegalArgumentException(
        s"jq_expr: rtrim expects a string, got ${dt.simpleString}")
    }),
    // jq transpose: array-of-arrays, rows padded with null to the longest
    // (jq's rule); [] and all-empty-rows give [] — one nested codegen'd
    // transform over a generated index sequence, no explode
    "transpose" -> ((df, v) => {
      val et = elementTypeV(df, v, "transpose")
      if (!et.isInstanceOf[ArrayType]) throw new IllegalArgumentException(
        s"jq_expr: transpose expects an array of arrays, got " +
          s"array<${et.simpleString}>")
      val m = v(df)
      val maxLen = coalesce(array_max(transform(m, r => size(r))), lit(0))
      when(m.isNull, lit(null).cast(ArrayType(et))).otherwise(
        when(maxLen <= lit(0), array().cast(ArrayType(et))).otherwise(
          transform(sequence(lit(1), maxLen), i =>
            transform(m, r => try_element_at(r, i)))))
    }),
    // jq debug: passes the value through (the stderr side channel has no
    // distributed analog — documented as identity)
    "debug" -> ((df, v) => v(df)),
    // jq gmtime: seconds → broken-down UTC time [year, month(0-based),
    // mday, hour, minute, second, weekday(0=Sunday), yearday(0-based)].
    // Long elements (jq prints them as integers); fractional input
    // seconds truncate — documented, the todate family owns sub-second
    "gmtime" -> ((df, v) => {
      val ts = timestamp_seconds(v(df).cast("long"))
      array(
        year(ts).cast("long"), (month(ts) - lit(1)).cast("long"),
        dayofmonth(ts).cast("long"), hour(ts).cast("long"),
        minute(ts).cast("long"), second(ts).cast("long"),
        (dayofweek(ts) - lit(1)).cast("long"),
        (dayofyear(ts) - lit(1)).cast("long"))
    }),
    // jq mktime: broken-down UTC time array (gmtime's layout; wday/yday
    // ignored) → epoch seconds. jq 1.6 errors on a 6-element array —
    // accepting it is a documented convenience, never a wrong answer
    "mktime" -> ((df, v) => {
      elementTypeV(df, v, "mktime")
      val a = v(df)
      def el(i: Int): Column = element_at(a, i).cast("int")
      make_timestamp(el(1), el(2) + lit(1), el(3), el(4), el(5),
        el(6).cast("decimal(16,6)"), lit("UTC")).cast("long")
    }),
    // jq tostring: strings unchanged, containers JSON-encoded (jq's
    // rule — a cast would render Spark's "[a, b]" debug form), scalars
    // cast; for a variant the runtime type decides
    "tostring" -> ((df, v) => dtOfV(df, v) match {
      case dt if dt.typeName == "variant" =>
        val c = v(df)
        when(variantTypeName(c) === "string", try_variant_get(c, "$", "string"))
          .otherwise(to_json(c))
      case StringType => v(df)
      case dt @ (_: ArrayType | _: StructType | _: MapType) =>
        coalesce(Canonical.canonicalJsonTyped(dt, v(df)), lit("null"))
      case NullType => lit("null")
      case _ => v(df).cast("string")
    }),
    // jq errors on non-numeric tonumber; here the row's value becomes NULL
    // (try_cast), the declarative analog of skip-on-error. Doubles: jq
    // numbers are doubles, so "3" -> 3.0.
    "tonumber" -> ((df, v) => dtOfV(df, v) match {
      case dt if dt.typeName == "variant" => try_variant_get(v(df), "$", "double")
      case _ => v(df).try_cast("double")
    }),
    // jq length: element count for arrays/objects, char count for
    // strings, 0 for null (jq's rule — `null | length` is 0, and a
    // runtime-null container/string lengths 0, not null)
    "length" -> ((df, v) => dtOfV(df, v) match {
      case NullType => lit(0L)
      case _: ArrayType | _: MapType =>
        coalesce(size(v(df)).cast("long"), lit(0L))
      case st: StructType => // object length = field count (schema-static)
        when(v(df).isNotNull, lit(st.size.toLong)).otherwise(lit(0L))
      case _ => coalesce(length(v(df)).cast("long"), lit(0L))
    }),
    "floor" -> ((df, v) => floor(v(df))),
    "ascii_downcase" -> ((df, v) => lower(v(df))),
    "ascii_upcase" -> ((df, v) => upper(v(df))),
    // jq not: true for the falsy values (null, false), false otherwise —
    // 0 and "" are truthy, and non-boolean types never cast (ANSI-safe)
    "not" -> ((df, v) => dtOfV(df, v) match {
      case BooleanType =>
        val c = v(df)
        when(c.isNull, lit(true)).otherwise(!c)
      case _ => v(df).isNull
    }),
    // jq to_entries: object → [{key, value}] in field order (jq does not
    // sort here, unlike keys). Struct fields are schema-static; uniform
    // field types keep their type, mixed types fall back to string (the
    // declarative analog of jq's dynamic values — documented divergence).
    "to_entries" -> ((df, v) => dtOfV(df, v) match {
      case st: StructType =>
        val c = v(df)
        val uniform = st.fields.map(_.dataType).distinct.length == 1
        val entries = st.fieldNames.map { n =>
          val value = if (uniform) c.getField(n) else c.getField(n).cast("string")
          struct(lit(n).as("key"), value.as("value"))
        }
        when(c.isNotNull, array(entries.toSeq: _*))
      case _: MapType => map_entries(v(df))
      case dt => throw new IllegalArgumentException(
        s"jq_expr: to_entries requires an object, got ${dt.simpleString}")
    }),
    // jq from_entries over this compiler's entry shape ({key, value} —
    // the k/name/v aliases are out of scope); inverts to_entries. jq is
    // LAST-WINS on duplicate keys, while Spark's map_from_entries throws
    // under the default EXCEPTION dedup policy — so keep only each key's
    // last occurrence first (entry lists are small; the scan is per-row)
    "from_entries" -> ((df, v) => dtOfV(df, v) match {
      case ArrayType(st: StructType, _)
          if st.fieldNames.toSeq == Seq("key", "value") =>
        val arr = v(df)
        val lastWins = filter(arr, (e, i) =>
          !exists(slice(arr, i + lit(2), size(arr)),
            later => later.getField("key") <=> e.getField("key")))
        map_from_entries(lastWins)
      case dt => throw new IllegalArgumentException(
        "jq_expr: from_entries requires an array of {key, value} objects, " +
          s"got ${dt.simpleString}")
    }),
    // jq keys: SORTED key list. Object keys are schema-static (struct
    // fields → a constant-folded literal array); map-typed values sort at
    // runtime. Null input propagates (jq errors; NULL is the declarative
    // skip-on-error analog, as with tonumber).
    "keys" -> ((df, v) => dtOfV(df, v) match {
      case st: StructType =>
        when(v(df).isNotNull, array(st.fieldNames.sorted.map(lit(_)).toSeq: _*))
      case _: MapType => sort_array(map_keys(v(df)))
      case dt => throw new IllegalArgumentException(
        s"jq_expr: keys requires an object, got ${dt.simpleString}")
    }),
    // jq math builtins — numbers are doubles; floor/ceil land on Spark's
    // LONG (integer-valued, as jq renders them), matching `floor` above
    "ceil" -> ((df, v) => ceil(v(df))),
    // jq round is C round(): halves away from zero — Spark's HALF_UP ditto
    "round" -> ((df, v) => round(v(df))),
    "sqrt" -> ((df, v) => sqrt(v(df))),
    "fabs" -> ((df, v) => abs(v(df).cast("double"))),
    "exp" -> ((df, v) => exp(v(df))),
    "log" -> ((df, v) => log(v(df))),
    "log2" -> ((df, v) => log2(v(df))),
    "log10" -> ((df, v) => log10(v(df))),
    "isnan" -> ((df, v) => isnan(v(df))),
    "isinfinite" -> ((df, v) => abs(v(df)) === lit(Double.PositiveInfinity)),
    // jq type: the JSON type name — schema-static except the runtime-null
    // case (a missing field types as NullType and reads "null", like jq)
    "type" -> ((df, v) => dtOfV(df, v) match {
      case dt if dt.typeName == "variant" => variantTypeName(v(df))
      case dt =>
        val name = dt match {
          case NullType => "null"
          case BooleanType => "boolean"
          case _: NumericType => "number"
          case StringType => "string"
          case _: ArrayType => "array"
          case _: StructType | _: MapType => "object"
          case other => throw new IllegalArgumentException(
            s"jq_expr: type over ${other.simpleString} is not a JSON type")
        }
        when(v(df).isNull, lit("null")).otherwise(lit(name))
    }),
    "utf8bytelength" -> ((df, v) => octet_length(v(df)).cast("long")),
    // jq tojson: canonical JSON encoding of the value — unlike tostring,
    // strings gain quotes/escapes, and null renders "null" (type-directed:
    // a NullType operand never enters to_json, which rejects null schemas)
    "tojson" -> ((df, v) => dtOfV(df, v) match {
      case NullType => lit("null")
      case dt if dt.typeName == "variant" => coalesce(to_json(v(df)), lit("null"))
      case dt => coalesce(Canonical.canonicalJsonTyped(dt, v(df)), lit("null"))
    }),
    // jq todate/fromdate (epoch seconds ↔ ISO-8601 Zulu). Exact because
    // the engine pins the UTC session timezone (Verify/Bench/tests alike).
    "todate" -> ((df, v) =>
      date_format(timestamp_seconds(v(df).cast("long")),
        "yyyy-MM-dd'T'HH:mm:ss'Z'")),
    "todateiso8601" -> ((df, v) =>
      date_format(timestamp_seconds(v(df).cast("long")),
        "yyyy-MM-dd'T'HH:mm:ss'Z'")),
    "fromdate" -> ((df, v) =>
      to_unix_timestamp(v(df), lit("yyyy-MM-dd'T'HH:mm:ss'Z'"))),
    "fromdateiso8601" -> ((df, v) =>
      to_unix_timestamp(v(df), lit("yyyy-MM-dd'T'HH:mm:ss'Z'"))),
    // jq flatten (argless = flatten fully): nesting depth is schema-static,
    // so the unbounded form unrolls to depth-many one-level flattens
    "flatten" -> ((df, v) => {
      var c = v(df)
      var et = elementTypeV(df, v, "flatten")
      while (et.isInstanceOf[ArrayType]) {
        c = flatten(c)
        et = et.asInstanceOf[ArrayType].elementType
      }
      c
    }),
    // jq fromjson: parse the string as JSON → a VARIANT value (the same
    // runtime-typed channel as the `..` stream): navigate with getpath /
    // `| .path`, and the variant-aware type/tostring/tonumber/tojson/
    // select builtins apply
    // try_parse_json, not parse_json: unparseable input is jq-null under
    // the documented convention (ANSI parse_json would kill the task) and
    // routes to the handler under `try` via the runtime error channel
    "fromjson" -> ((df, v) => try_parse_json(v(df))),
    // jq explode: string → array of Unicode CODE POINTS. Exact for the
    // full range: Java-regex `.` matches per code point (surrogate pairs
    // stay whole) and Spark's ascii() reads the full code point.
    "explode" -> ((df, v) =>
      transform(regexp_extract_all(v(df), lit("(?s)."), lit(0)),
        c => ascii(c).cast("long"))),
    // jq implode: code points → string, the exact inverse of explode.
    // BMP code points decode as one UTF-16BE unit; supplementary planes
    // split into a surrogate pair first (decode() ships no UTF-32
    // charset) — all codegen'd string kernels, full-Unicode round-trip.
    "implode" -> ((df, v) => {
      elementTypeV(df, v, "implode")
      array_join(transform(v(df), n => jqChar(n.cast("long"))), "")
    }),
    // jq 1.7 abs: type-preserving magnitude (fabs is the double form)
    "abs" -> ((df, v) => abs(v(df))))

  /** One Unicode code point as a 1-char string (see `implode`). */
  private def jqChar(n: Column): Column = {
    def unit(u: Column): Column = lpad(hex(u), 4, "0")
    val hi = shiftright(n - lit(65536L), 10) + lit(0xD800L)
    val lo = (n - lit(65536L)).bitwiseAND(lit(1023L)) + lit(0xDC00L)
    when(n > lit(0xFFFFL),
      decode(unhex(concat(unit(hi), unit(lo))), "UTF-16BE"))
      .otherwise(decode(unhex(unit(n)), "UTF-16BE"))
  }

  /** jq truthiness of one array ELEMENT (for any/all): only null and
    * false are falsy, typed from the array's element type.
    */
  private def elemTruthy(df: DataFrame, arr: V, what: String): Column => Column = {
    val et = elementTypeV(df, arr, what)
    (x: Column) => et match {
      case BooleanType => coalesce(x, lit(false)) === lit(true)
      case _ => x.isNotNull
    }
  }

  /** One-argument value functions for value-level pipes (`.s | join(",")`).
    * The argument is a full value expression evaluated in the caller's
    * context.
    */
  private val FuncsArg: Map[String, (DataFrame, V, V) => Column] = Map(
    // jq walk(f)/map_values(f): schema-recursive / one-level application
    // of f with `.` bound per node — see [[walkApply]]/[[mapValuesApply]]
    "walk" -> ((df, v, a) => walkApply(df, v(df), dtOfV(df, v), a)._1),
    "map_values" -> ((df, v, a) => mapValuesApply(df, v(df), dtOfV(df, v), a)),
    // jq indices(i): all 0-based occurrence starts — substring starts
    // over a string (NON-overlapping, probed against jq 1.6: "aaaa" |
    // indices("aa") is [0,2], the scan strides past each match), equal-
    // element positions over an array, subsequence starts for an array
    // needle (those ARE overlapping in jq: [1,1,1,1] | indices([1,1]) is
    // [0,1,2]); one codegen'd filter/fold over a generated index
    // sequence. Empty needles give [] (jq 1.6 spins forever on "" —
    // strictly-better divergence, documented).
    "indices" -> ((df, v, a) => {
      val longArr = ArrayType(org.apache.spark.sql.types.LongType)
      dtOfV(df, v) match {
        case StringType =>
          val s = v(df); val n = a(df).cast("string")
          val fits = (length(s) - length(n)).cast("long")
          // non-overlapping needs scan state: one aggregate fold carrying
          // (next admissible start, hits so far)
          val folded = aggregate(
            sequence(lit(0L), fits),
            struct(lit(0L).as("nxt"), array().cast(longArr).as("idxs")),
            (acc, i) => {
              val hit = i >= acc.getField("nxt") &&
                substr(s, i.cast("int") + lit(1), length(n)) === n
              when(hit, struct((i + length(n).cast("long")).as("nxt"),
                concat(acc.getField("idxs"), array(i)).as("idxs")))
                .otherwise(acc)
            },
            acc => acc.getField("idxs"))
          when(s.isNull || n.isNull, lit(null).cast(longArr)).otherwise(
            when(length(n) === lit(0) || fits < lit(0L), array().cast(longArr))
              .otherwise(folded))
        case _: ArrayType =>
          val arr = v(df)
          dtOfV(df, a) match {
            case _: ArrayType =>
              val nd = a(df)
              val fits = (size(arr) - size(nd)).cast("long")
              when(arr.isNull || nd.isNull, lit(null).cast(longArr)).otherwise(
                when(size(nd) === lit(0) || fits < lit(0L), array().cast(longArr))
                  .otherwise(filter(sequence(lit(0L), fits),
                    i => slice(arr, i.cast("int") + lit(1), size(nd)) <=> nd)))
            case _ =>
              val x = a(df)
              when(arr.isNull, lit(null).cast(longArr)).otherwise(
                when(size(arr) === lit(0), array().cast(longArr)).otherwise(
                  filter(sequence(lit(0L), size(arr).cast("long") - lit(1L)),
                    i => get(arr, i.cast("int")) <=> x)))
          }
        case dt => throw new IllegalArgumentException(
          s"jq_expr: indices over ${dt.simpleString} is unsupported " +
            "(string or array required)")
      }
    }),
    // jq nth($n) is `.[$n]` (builtin.jq): 0-based, negative counts from
    // the end, out-of-range EITHER direction → null. (The loud
    // "doesn't support negative indices" error belongs to the 2-arity
    // stream form nth(n; expr), which is not this kernel.)
    "nth" -> ((df, v, a) => {
      val et = elementTypeV(df, v, "nth")
      val arr = v(df)
      val n = a(df).cast("long")
      val idx = when(n < lit(0L), n + size(arr).cast("long")).otherwise(n)
      when(idx < lit(0L), lit(null).cast(et))
        .otherwise(get(arr, idx.cast("int")))
    }),
    // jq join(sep): stringified elements, null elements print empty,
    // [] → "" — one aggregate fold so the separator can be any value
    // expression (array_join takes only a literal delimiter)
    "join" -> ((df, v, a) => {
      elementTypeV(df, v, "join")
      val sep = a(df)
      coalesce(aggregate(v(df), lit(null).cast("string"), (acc, x) => {
        val xs = coalesce(x.cast("string"), lit(""))
        when(acc.isNull, xs).otherwise(concat(acc, sep, xs))
      }), lit(""))
    }),
    // jq ltrimstr/rtrimstr: strip ONE leading/trailing occurrence iff
    // present; non-matching (or non-string) input passes through
    "ltrimstr" -> ((df, v, a) => {
      val c = v(df); val p = a(df)
      when(c.startsWith(p), c.substr(length(p) + 1, length(c))).otherwise(c)
    }),
    "rtrimstr" -> ((df, v, a) => {
      val c = v(df); val p = a(df)
      when(c.endsWith(p), c.substr(lit(1), length(c) - length(p))).otherwise(c)
    }),
    "startswith" -> ((df, v, a) => v(df).startsWith(a(df))),
    "endswith" -> ((df, v, a) => v(df).endsWith(a(df))),
    // jq index/rindex: 0-based position of the first/last occurrence of a
    // substring, jq-null when absent. rindex reuses the first-occurrence
    // kernel over the reversed haystack/needle: a 1-based reversed hit at
    // p puts the last occurrence's 0-based start at len(c) - p + 1 - len(n)
    "index" -> ((df, v, a) => {
      val p = call_function("locate", a(df), v(df))
      when(p > lit(0), (p - lit(1)).cast("long"))
    }),
    "rindex" -> ((df, v, a) => {
      val c = v(df)
      val n = a(df)
      val p = call_function("locate", reverse(n), reverse(c))
      when(p > lit(0), (length(c) - p + lit(1) - length(n)).cast("long"))
    }),
    // jq contains/inside over the practical subset: strings (substring)
    // and arrays (every element of the needle matches some element of the
    // haystack — substring match for string elements, equality otherwise).
    // Deep object containment stays out of scope, documented.
    "contains" -> ((df, v, a) => jqContains(df, v, a)),
    "inside" -> ((df, v, a) => jqContains(df, a, v)))

  /** jq's never-error read of a MISSING struct field is null — except
    * `.captures` on a computed-pattern match() object (exactly the
    * fields offset/length/string): a dynamic pattern's capture groups
    * cannot be static schema, and a silent null there would diverge from
    * jq instead of failing loudly (the match()-dynamic contract).
    */
  private def missingField(st: StructType, p: String): Column = {
    // fingerprint = the dynamic match object's exact field names AND
    // types, narrowing the (already pathological) false-positive of a
    // user struct that happens to share the shape; the message names
    // the workaround for that case
    val isDynMatch = p == "captures" &&
      st.fieldNames.sameElements(Array("offset", "length", "string")) &&
      st("offset").dataType == LongType && st("length").dataType == LongType &&
      st("string").dataType == StringType
    if (isDynMatch)
      throw new IllegalArgumentException(
        "jq_expr: .captures of a computed-pattern match() is not " +
          "supported — a dynamic pattern's capture groups are not static " +
          "schema; use a string-literal pattern when captures are needed. " +
          "(If this struct is your own data that merely shares the match-" +
          "object shape {offset: long, length: long, string: string}, " +
          "rename one of its fields or read the fields it actually has.)")
    lit(null)
  }

  /** Literal-path navigation with jq's never-error convention (missing
    * fields and non-objects read as null); variant values navigate via
    * `try_variant_get`. Shared by `getpath` and the `| .path` postfix.
    */
  private def walkPath(dt: DataType, c: Column, rest: List[String]): Column =
    rest match {
      case Nil => c
      case h :: t => dt match {
        case st: StructType => st.fields.find(_.name == h) match {
          case Some(f) => walkPath(f.dataType, c.getField(f.name), t)
          case None => missingField(st, h)
        }
        case mt: MapType => walkPath(mt.valueType, c.getItem(h), t)
        case vdt if vdt.typeName == "variant" =>
          try_variant_get(c, "$." + (h :: t).mkString("."), "variant")
        case _ => lit(null)
      }
    }

  /** Apply `f` with `.` bound to (c: dt), under a FRESH type-probe memo:
    * [[walkApply]]/[[mapValuesApply]] evaluate the same parse node under
    * many binding contexts, and the identity-keyed [[dtMemo]] (sound for
    * the usual one-context-per-node programs) must not leak a type
    * probed at one node into another. Returns the value and its result
    * type (the probe twin makes the type computable even inside HOF
    * lambdas, where the real column cannot be analyzed).
    */
  private def applyBound(df: DataFrame, c: Column, dt: DataType,
                         f: V): (Column, DataType) =
    dtMemo.withValue(new java.util.IdentityHashMap[AnyRef, DataType]) {
      dummyFirstMode.withValue(true) {
        val probe = lit(null).cast(dt)
        val out = elemBinding.withValue(Some(Bound(c, probe, dt)))(f(df))
        val outDt = probeMode.withValue(true)(
          dtOf(df, elemBinding.withValue(Some(Bound(probe, probe, dt)))(f(df))))
        (out, outDt)
      }
    }

  /** jq `walk(f)`: bottom-up — children rebuilt first, then f applied
    * with `.` bound to the rebuilt node (jq's builtin.jq definition; the
    * reference accepts any gojq program, `counter.go:439-466`). The
    * STATIC TYPE TREE is the recursion structure: structs rebuild per
    * field, arrays map via one codegen'd `transform` per nesting level,
    * maps via `transform_values` — and f compiles PER NODE TYPE, so with
    * static branch pruning the classic `walk(if type == "string" then
    * ascii_downcase else . end)` picks exactly the applicable branch at
    * every node. A runtime-null container stays null (jq hands f the
    * null, whose type-dispatch branch is "null" → typically `.` —
    * identical observable result for type-dispatched f; a documented
    * hair otherwise).
    */
  private def walkApply(df: DataFrame, node: Column, dt: DataType,
                        f: V): (Column, DataType) = {
    val (rebuilt, rdt): (Column, DataType) = dt match {
      case st: StructType =>
        val walked = st.fields.toSeq.map(fd =>
          (fd.name, walkApply(df, node.getField(fd.name), fd.dataType, f)))
        val rs = StructType(walked.map { case (n, (_, t)) => StructField(n, t) })
        (when(node.isNull, lit(null).cast(rs)).otherwise(
          struct(walked.map { case (n, (c, _)) => c.as(n) }: _*)), rs)
      case at: ArrayType =>
        val (_, crt) =
          walkApply(df, lit(null).cast(at.elementType), at.elementType, f)
        (transform(node, x => walkApply(df, x, at.elementType, f)._1),
          ArrayType(crt))
      case mt: MapType =>
        val (_, crt) =
          walkApply(df, lit(null).cast(mt.valueType), mt.valueType, f)
        (transform_values(node, (_, x) => walkApply(df, x, mt.valueType, f)._1),
          MapType(mt.keyType, crt))
      case other => (node, other)
    }
    applyBound(df, rebuilt, rdt, f)
  }

  /** jq `map_values(f)` (≡ `.[] |= f`): f over each field/element value,
    * container shape kept. Structs apply per field (f compiles per field
    * TYPE, with the same static branch pruning as walk), arrays are one
    * codegen'd `transform`, maps one `transform_values`. jq's
    * empty-output-deletes-key refinement needs streams-in-value-position
    * — out of scope with the other stream-nesting shapes, documented.
    */
  private def mapValuesApply(df: DataFrame, node: Column, dt: DataType,
                             f: V): Column =
    dt match {
      case st: StructType =>
        val applied = st.fields.toSeq.map { fd =>
          val (c, t) = applyBound(df, node.getField(fd.name), fd.dataType, f)
          (fd.name, c, t)
        }
        val rs = StructType(applied.map { case (n, _, t) => StructField(n, t) })
        when(node.isNull, lit(null).cast(rs))
          .otherwise(struct(applied.map { case (n, c, _) => c.as(n) }: _*))
      case at: ArrayType =>
        transform(node, x => applyBound(df, x, at.elementType, f)._1)
      case mt: MapType =>
        transform_values(node, (_, x) => applyBound(df, x, mt.valueType, f)._1)
      case other => throw new IllegalArgumentException(
        s"jq_expr: map_values expects an object or array, got ${other.simpleString}")
    }

  /** jq `contains` semantics for `haystack contains needle` — the FULL
    * recursive form (probed against jq 1.6): strings contain by
    * substring, arrays when every needle element is contained in SOME
    * haystack element (recursively), objects when every needle key
    * exists with a recursively-contained value (a key absent from the
    * haystack's schema is statically false), scalars by equality with
    * null == null true, and CROSS-TYPE values never contain (1 vs "1" is
    * false in jq 1.6, not an error). Runtime nulls at any level compare
    * null-to-null true, null-to-value false. Static schemas unroll the
    * recursion at plan time — no UDF, plain codegen'd boolean trees.
    */
  private def jqContains(df: DataFrame, hay: V, needle: V): Column =
    containsRec(dtOfV(df, hay), dtOfV(df, needle), hay(df), needle(df))

  private def containsRec(ht: DataType, nt: DataType,
                          h: Column, n: Column): Column = {
    def nullGuarded(body: => Column): Column =
      when(h.isNull || n.isNull, h.isNull && n.isNull).otherwise(body)
    (ht, nt) match {
      case (StringType, StringType) => nullGuarded(h.contains(n))
      case (a: ArrayType, b: ArrayType) => nullGuarded(
        forall(n, nb => exists(h, x =>
          containsRec(a.elementType, b.elementType, x, nb))))
      case (hs: StructType, ns: StructType) => nullGuarded(
        ns.fields.map { nf =>
          hs.fields.find(_.name == nf.name) match {
            case Some(hf) => containsRec(hf.dataType, nf.dataType,
              h.getField(nf.name), n.getField(nf.name))
            case None => lit(false) // key absent from the haystack schema
          }
        }.reduceOption[Column](_ && _).getOrElse(lit(true)))
      case (NullType, _) | (_, NullType) => h <=> n // true iff both null
      case (_: NumericType, _: NumericType) => h <=> n
      case (BooleanType, BooleanType) => h <=> n
      case _ => lit(false) // cross-type values never contain (jq 1.6)
    }
  }

  // ------------------------------------------------- jq regex builtins --

  /** Lower jq regex flags onto a Java-regex inline-flags prefix. jq's
    * oniguruma flags `i`/`x`/`s`/`m` have exact Java equivalents; `g`
    * (all matches) and `n` (skip empty) change the OUTPUT SHAPE of
    * `match` and stay out of scope.
    */
  private def regexWithFlags(pat: String, flags: String): String = {
    if (flags.isEmpty) pat
    else {
      flags.foreach(f => require("ixsm".contains(f),
        s"jq_expr: unsupported regex flag '$f' (supported: i, x, s, m)"))
      s"(?$flags)$pat"
    }
  }

  /** Capture groups of a regex literal, in group-number order:
    * (name if `(?<name>…)`, 1-based Java group index). Skips
    * non-capturing `(?:`/lookaround/inline-flag groups, `(` inside
    * character classes, and escaped parens — the same counting Java's
    * engine applies, so the indices line up with `regexp_extract`.
    */
  private def captureGroups(pat: String): Seq[(Option[String], Int)] = {
    val out = Seq.newBuilder[(Option[String], Int)]
    var idx = 0; var k = 0; var inClass = false
    while (k < pat.length) {
      pat.charAt(k) match {
        case '\\' => k += 1
        case '[' if !inClass => inClass = true
        case ']' if inClass => inClass = false
        case '(' if !inClass =>
          if (k + 1 < pat.length && pat.charAt(k + 1) == '?') {
            if (k + 2 < pat.length && pat.charAt(k + 2) == '<' &&
                k + 3 < pat.length &&
                pat.charAt(k + 3) != '=' && pat.charAt(k + 3) != '!') {
              idx += 1
              val end = pat.indexOf('>', k + 3)
              require(end > 0, s"jq_expr: unterminated named group in regex: $pat")
              out += ((Some(pat.substring(k + 3, end)), idx))
            }
          } else { idx += 1; out += ((None, idx)) }
        case _ =>
      }
      k += 1
    }
    out.result()
  }

  /** The element binding for `map(expr)`: inside the map body, `.` and
    * `.field` resolve against the array ELEMENT (jq's semantics — map
    * shadows the input); in [[probeMode]] the typed-null probe stands in.
    */
  private val elemBinding = new scala.util.DynamicVariable[Option[Bound]](None)

  /** `$name` variables bound by `reduce ... as $name` (scoped like
    * [[elemBinding]]: resolved at plan-construction time).
    */
  private val varBindings =
    new scala.util.DynamicVariable[Map[String, Bound]](Map.empty)

  /** C strftime format → Spark datetime pattern, at parse time. The
    * supported directives cover jq's documented examples; anything else
    * is a loud error (never a silently-wrong render). Literal runs are
    * single-quoted so pattern letters in the input text cannot activate.
    */
  private def cFormatToSpark(fmt: String): String = {
    val sb = new StringBuilder
    val litBuf = new StringBuilder
    def flushLit(): Unit = if (litBuf.nonEmpty) {
      sb.append('\'').append(litBuf.toString.replace("'", "''")).append('\'')
      litBuf.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%') {
        if (i + 1 >= fmt.length) throw new IllegalArgumentException(
          "jq_expr: strftime format ends with a bare '%'")
        val d = fmt.charAt(i + 1)
        if (d == '%') litBuf.append('%')
        else {
          val rep = d match {
            case 'Y' => "yyyy"; case 'y' => "yy"
            case 'm' => "MM"; case 'd' => "dd"
            case 'H' => "HH"; case 'M' => "mm"; case 'S' => "ss"
            case 'I' => "hh"; case 'p' => "a"
            case 'a' => "EEE"; case 'A' => "EEEE"
            case 'b' | 'h' => "MMM"; case 'B' => "MMMM"
            case 'j' => "DDD"
            case 'T' => "HH:mm:ss"; case 'F' => "yyyy-MM-dd"
            case 'D' => "MM/dd/yy"; case 'R' => "HH:mm"
            case other => throw new IllegalArgumentException(
              s"jq_expr: strftime directive %$other is unsupported " +
                "(supported: %Y %y %m %d %H %M %S %I %p %a %A %b %B %j " +
                "%T %F %D %R %%)")
          }
          flushLit(); sb.append(rep)
        }
        i += 2
      } else { litBuf.append(c); i += 1 }
    }
    flushLit()
    sb.toString
  }

  private def pick(b: Bound): Column = if (probeMode.value) b.probe else b.real

  /** STATIC BRANCH ANALYSIS mode (round 8): under [[elemDummyMode]] the
    * `.` binding resolves to a non-null, NON-FOLDABLE stand-in of the
    * element's type ([[analysisDummy]]) instead of the real column. The
    * if-chain compiler uses it to decide type-dispatch conditions inside
    * HOF lambda bodies, where the real column (a lambda variable) cannot
    * be analyzed against any frame: null checks fold through the dummy's
    * non-NULLABILITY (so `type` collapses to the static name and
    * `type == "string"` folds to a constant), while every value-level
    * predicate keeps the dummy's opaque `monotonically_increasing_id()`
    * core and stays unfoldable — so only type-level facts can prune.
    * `$`-variable bindings ([[varBindings]]) are NEVER dummied: a value
    * parameter's data-dependence must keep its branches dynamic.
    */
  private val elemDummyMode = new scala.util.DynamicVariable[Boolean](false)

  /** Set by [[applyBound]] (walk/map_values): the if-compiler tries the
    * dummy-binding analysis FIRST there, so type-dispatch prunes even
    * when the node is an analyzable-but-nullable real column (outside
    * walk, the as-is path keeps jq's runtime-null "type == null"
    * semantics; inside walk the per-node dispatch-by-SCHEMA-type rule is
    * the documented convention — one rule for all nodes beats one that
    * flips on nullability).
    */
  private val dummyFirstMode = new scala.util.DynamicVariable[Boolean](false)

  /** [[pick]] for the `.` element binding: honors [[elemDummyMode]].
    * Probe mode wins (type analysis needs the typed null regardless);
    * dummy mode requires the binding to carry its type — bindings
    * without one throw, which the if-compiler's analysis catches as
    * "cannot decide statically".
    */
  private def pickElem(b: Bound): Column =
    if (elemDummyMode.value) {
      // dummy wins over probe: static branch analysis must reach the
      // same decision in the type-probe pass as in the real pass (a
      // typed-null probe would fold `type` to "null" there and pick a
      // different branch — a probe/real type mismatch)
      if (b.dt == null) throw new IllegalArgumentException(
        "jq_expr internal: element binding carries no type for static " +
          "branch analysis")
      analysisDummy(b.dt)
    } else if (probeMode.value) b.probe
    else b.real

  /** A non-null, non-foldable, analyzable stand-in of type `dt`, built
    * on `monotonically_increasing_id()` (non-foldable AND non-nullable —
    * verified against Catalyst: IsNull folds to false, value predicates
    * including size()/length()/getField() chains stay unfoldable).
    */
  private def analysisDummy(dt: DataType): Column = {
    val mid = monotonically_increasing_id()
    dt match {
      case NullType => lit(null)
      case BooleanType => mid > lit(-1L)
      case StringType => mid.cast("string")
      case n: NumericType => mid.cast(n)
      case TimestampType => timestamp_micros(mid)
      case DateType => timestamp_micros(mid).cast(DateType)
      case BinaryType => mid.cast("string").cast("binary")
      case at: ArrayType => array(analysisDummy(at.elementType))
      case mt: MapType =>
        map(analysisDummy(mt.keyType), analysisDummy(mt.valueType))
      case st: StructType =>
        struct(st.fields.toSeq.map(f => analysisDummy(f.dataType).as(f.name)): _*)
      case other => throw new IllegalArgumentException(
        s"jq_expr internal: no analysis dummy for ${other.simpleString}")
    }
  }

  private final class P(s: String, defs: Map[String, JqDef] = Map.empty,
                        depth: Map[String, Int] = Map.empty) {
    private var i = 0
    /** Did the value just parsed end in a STREAM builtin (range/scan/
      * splits)? Streams are arrays here; the `[E]` collect form reads
      * this to unwrap — `[range(3)]` is [0,1,2], not [[0,1,2]] — jq's
      * stream-collection semantics for the practically-used shapes.
      * Cleared by every combining operator and non-stream pipe.
      */
    private var streamTail = false
    /** Did the whole parse end stream-valued? (The stage compiler's
      * explode trigger.) */
    def endedInStream: Boolean = streamTail

    /** RUNTIME error channel (round 8): (condition, jq-style message)
      * pairs registered by data-dependently failable kernels during parse
      * — `tonumber`/`fromjson` on garbage strings, `/` and `%` with a
      * runtime zero divisor — and consumed by the nearest enclosing `try`
      * (delta capture, so nested `try`s own exactly their bodies'
      * conditions). A condition with no enclosing `try` keeps the
      * documented silent-null convention; with one, the row takes jq's
      * error path: `try E` emits the null analog of jq's empty output,
      * `try E catch H` evaluates H with `.` bound to the message.
      * Division messages reproduce jq 1.6 verbatim; the parse messages
      * use a stable paraphrase (jq's carry jv-parser positions).
      */
    private var runtimeErrs: List[(V, V)] = Nil
    private def registerErr(cond: V, msg: V): Unit = runtimeErrs ::= ((cond, msg))
    private def registerKernelErr(fn: String, in: V): Unit = fn match {
      case "tonumber" => registerErr(
        df => dtOfV(df, in) match {
          case StringType => in(df).isNotNull && in(df).try_cast("double").isNull
          case _ => lit(false)
        },
        df => concat(lit("cannot parse '"), in(df), lit("' as a number")))
      case "fromjson" => registerErr(
        df => dtOfV(df, in) match {
          case StringType => in(df).isNotNull && try_parse_json(in(df)).isNull
          case _ => lit(false)
        },
        df => concat(lit("cannot parse '"), in(df), lit("' as JSON")))
      case _ => ()
    }
    private def registerDivErr(l: V, r: V, remainder: Boolean): Unit = registerErr(
      df => (dtOfV(df, l), dtOfV(df, r)) match {
        case (_: NumericType, _: NumericType) => r(df) === lit(0)
        case _ => lit(false)
      },
      df => concat(lit("number ("), l(df).cast("string"), lit(") and number ("),
        r(df).cast("string"),
        lit(if (remainder) ") cannot be divided (remainder) because the divisor is zero"
            else ") cannot be divided because the divisor is zero")))

    def hasMore: Boolean = { skipWs(); i < s.length }
    def peek: Char = if (i < s.length) s.charAt(i) else ' '
    def next(): Char = { val c = peek; i += 1; c }
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      skipWs()
      if (next() != c)
        throw new IllegalArgumentException(s"jq_expr parse error: expected '$c' at $i in: $s")
    }
    def expectWord(w: String): Unit = {
      skipWs()
      if (!s.startsWith(w, i))
        throw new IllegalArgumentException(s"jq_expr parse error: expected '$w' at $i in: $s")
      i += w.length
    }
    /** [[expectWord]] + word boundary: `then1` must not satisfy `then`. */
    def expectKeyword(w: String): Unit = {
      expectWord(w)
      if (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_'))
        throw new IllegalArgumentException(
          s"jq_expr parse error: expected keyword '$w' at ${i - w.length} in: $s")
    }
    def tryConsume(w: String): Boolean = {
      skipWs()
      if (s.startsWith(w, i)) { i += w.length; true } else false
    }
    private def parseIdent(): String = {
      skipWs()
      val start = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
      if (i == start)
        throw new IllegalArgumentException(s"jq_expr parse error: identifier expected at $i in: $s")
      s.substring(start, i)
    }
    def parseKey(): String = {
      skipWs()
      if (peek == '"') parseStringLit() else parseIdent()
    }
    def parseStringLit(): String = {
      expect('"')
      val sb = new StringBuilder
      while (peek != '"' && i < s.length) {
        if (peek == '\\') { next(); sb.append(next()) } else sb.append(next())
      }
      expect('"')
      sb.toString
    }

    /** String literal in VALUE position, with jq string interpolation:
      * `"metric.\(.counter_id)"` → `concat` of literal segments and
      * stringified expression values (null stringifies to "null", as jq
      * does). Keys stay plain strings ([[parseStringLit]]).
      */
    def parseInterpString(): V = {
      expect('"')
      val segs = Seq.newBuilder[Either[String, V]]
      val sb = new StringBuilder
      while (peek != '"' && i < s.length) {
        if (peek == '\\') {
          next()
          if (peek == '(') {
            next()
            if (sb.nonEmpty) { segs += Left(sb.toString); sb.clear() }
            segs += Right(parseValue())
            expect(')')
          } else sb.append(next())
        } else sb.append(next())
      }
      expect('"')
      if (sb.nonEmpty) segs += Left(sb.toString)
      val parts = segs.result()
      if (!parts.exists(_.isRight)) {
        val lits = parts.collect { case Left(x) => x }.mkString
        _ => lit(lits)
      } else df => concat(parts.map {
        case Left(x) => lit(x)
        case Right(v) => coalesce(v(df).cast("string"), lit("null"))
      }: _*)
    }
    def parsePathParts(): Seq[String] = {
      expect('.')
      val path = Seq.newBuilder[String]
      var go = true
      while (go) {
        path += parseIdent()
        // jq optional-access `.a?`: error suppression — this compiler's
        // paths never error (missing fields read as jq null), so `?` is
        // a consumed no-op, kept for program compatibility
        if (peek == '?') next()
        if (peek == '.') next() else go = false
      }
      path.result()
    }

    /** Field names (of a `recordStreams` object parse) whose value ended
      * in a stream builtin — the stage compiler explodes that field into
      * jq's 0..N outputs. Only the OUTERMOST (stage-level) construction
      * records; nested object literals keep the collected-array model.
      */
    val streamFields = scala.collection.mutable.LinkedHashSet[String]()

    /** `{k: v, shorthand, ...}` — cursor must be at `{`. */
    def parseObjectFields(recordStreams: Boolean = false): Seq[(String, V)] = {
      expect('{')
      val out = Seq.newBuilder[(String, V)]
      skipWs()
      if (peek != '}') {
        var more = true
        while (more) {
          val key = parseKey()
          skipWs()
          if (peek == ':') {
            next()
            streamTail = false
            val v = parseValue()
            if (recordStreams && streamTail) streamFields += key
            out += (key -> v)
          }
          else out += (key -> ((_: DataFrame) => col(key))) // {user_id} shorthand
          skipWs()
          if (peek == ',') { next(); skipWs(); more = true }
          else more = false
        }
      }
      expect('}')
      // an object literal is a VALUE, not a stream — a stream-tailed last
      // field must not leak the flag to an enclosing collector
      streamTail = false
      out.result()
    }

    // value := //-chain of or-chains of and-chains of comparisons of
    // additive chains, each term optionally piped into named functions:
    // `.v | tostring`
    def parseValue(): V = parseAlt()

    /** jq `//` alternative operator: `a // b` is `a` unless `a` is falsy
      * (null or false), right-associative, binds looser than `or`. For
      * non-boolean operands this is exactly `coalesce`; booleans need the
      * truthiness test (false must fall through to `b`).
      */
    private def parseAlt(): V = {
      val l = parseOr()
      skipWs()
      if (s.startsWith("//", i)) {
        i += 2
        val r = parseAlt()
        streamTail = false
        df => {
          def mismatch(lt: DataType, rt: DataType) = throw new IllegalArgumentException(
            s"jq_expr: '//' over $lt and $rt has no single output type in a " +
              "statically-typed plan; cast one side (e.g. '| tostring')")
          dtOfV(df, l) match {
            case BooleanType => dtOfV(df, r) match {
              case BooleanType | NullType =>
                val lv = l(df)
                when(coalesce(lv, lit(false)) === lit(true), lv).otherwise(r(df))
              case other => mismatch(BooleanType, other)
            }
            case lt => dtOfV(df, r) match {
              // boolean right under a non-boolean, non-null left is the
              // mirrored mismatch — fail with the same clear message
              case BooleanType if lt != NullType => mismatch(lt, BooleanType)
              case _ => coalesce(l(df), r(df))
            }
          }
        }
      } else l
    }

    private def parseOr(): V = {
      var l = parseAnd()
      skipWs()
      while (s.startsWith("or", i) && boundary(i + 2)) {
        i += 2
        val r = parseAnd()
        streamTail = false
        val ll = l
        l = df => ll(df) || r(df)
        skipWs()
      }
      l
    }
    private def parseAnd(): V = {
      var l = parseCmp()
      skipWs()
      while (s.startsWith("and", i) && boundary(i + 3)) {
        i += 3
        val r = parseCmp()
        streamTail = false
        val ll = l
        l = df => ll(df) && r(df)
        skipWs()
      }
      l
    }
    private def boundary(at: Int): Boolean =
      at >= s.length || !(s.charAt(at).isLetterOrDigit || s.charAt(at) == '_')

    private def parseCmp(): V = {
      val l = parsePiped()
      skipWs()
      val ops = Seq("==", "!=", "<=", ">=", "<", ">")
      ops.find(op => s.startsWith(op, i)) match {
        case Some(op) =>
          i += op.length
          val r = parsePiped()
          streamTail = false
          // jq equality is TOTAL: null == null → true, null != x → true —
          // and cross-TYPE values are simply unequal (1 == "1" is false;
          // SQL's <=> would try to coerce), except that runtime nulls
          // compare equal whatever the static types say.
          def eq(df: DataFrame): Column = {
            val (lc, rc) = (l(df), r(df))
            (dtOfV(df, l), dtOfV(df, r)) match {
              // variant operands (the `..` stream) FIRST — the rank guard
              // below has no meaningful rank for a runtime-typed value
              case (ldt, rdt) if ldt.typeName == "variant" && rdt.typeName == "variant" =>
                variantTypeName(lc) <=> variantTypeName(rc) &&
                  to_json(lc) <=> to_json(rc)
              case (ldt, rdt) if ldt.typeName == "variant" => variantEq(lc, rc, rdt)
              case (ldt, rdt) if rdt.typeName == "variant" => variantEq(rc, lc, ldt)
              case (ldt, rdt) if jqTypeRank(ldt) != jqTypeRank(rdt) =>
                lc.isNull && rc.isNull
              // objects: different key sets are unequal; same keys compare
              // by value whatever the field ORDER (jq objects are unordered)
              case (a: StructType, b: StructType) =>
                val (ka, kb) = (a.fieldNames.sorted.toSeq, b.fieldNames.sorted.toSeq)
                if (ka != kb) lc.isNull && rc.isNull
                else if (a.fieldNames.toSeq == b.fieldNames.toSeq) lc <=> rc
                else when(lc.isNull || rc.isNull, lc.isNull && rc.isNull)
                  .otherwise(struct(ka.map(n => lc.getField(n).as(n)): _*) <=>
                    struct(kb.map(n => rc.getField(n).as(n)): _*))
              case _ => lc <=> rc
            }
          }
          op match {
            case "==" => df => eq(df)
            case "!=" => df => !eq(df)
            // ordering is jq's TOTAL order (null < false < true < number
            // < string < array < object) — derived from one `<` kernel,
            // which total orders make sound: a <= b ⟺ !(b < a)
            case "<" => df => jqLess(df, l, r)
            case ">" => df => jqLess(df, r, l)
            case "<=" => df => !jqLess(df, r, l)
            case ">=" => df => !jqLess(df, l, r)
          }
        case None => l
      }
    }

    /** additive chain, then any `| func` postfix pipes; `map(expr)` runs
      * its body per element (a codegen'd `transform`, `.` = the element).
      */
    private def parsePiped(): V = {
      var v = parseAdd()
      skipWs()
      while (peek == '|' && !s.startsWith("||", i)) {
        next()
        skipWs()
        streamTail = false
        // Would an unparenthesized bare path be FOLLOWED by an operator?
        // jq's pipe has the lowest precedence, so `A | .lo + .hi` means
        // `A | (.lo + .hi)` — lookahead past the path (and a possible
        // `?`/`[]`) and, if an expression continues, take the
        // general-body route below instead of the never-error postfix
        // walk (which owns the plain `| .path` form and its
        // variant-aware semantics).
        def pathThenOperator: Boolean = {
          if (!(peek == '.' && i + 1 < s.length &&
              (s.charAt(i + 1).isLetterOrDigit || s.charAt(i + 1) == '_')))
            return false
          val save = i
          try {
            parsePathParts()
            tryConsume("[]")
            skipWs()
            val c = peek
            c == '+' || c == '-' || c == '*' || c == '%' ||
              (c == '/' && !s.startsWith("//", i)) ||
              c == '<' || c == '>' || c == '=' || c == '!' ||
              (s.startsWith("and", i) && boundary(i + 3)) ||
              (s.startsWith("or", i) && boundary(i + 2)) ||
              (s.startsWith("as", i) && boundary(i + 2))
          } catch { case _: Throwable => false } finally i = save
        }
        // a def name after `|` is a CALL with `.` = the piped value (jq:
        // `A | f` evaluates f against A's output) — route it through the
        // general body, whose elemBinding is exactly that; the atom
        // parser resolves the call (defs shadow builtins there, jq's
        // rule). This is what lets a recursive prelude def like `until`
        // pipe into itself.
        def identIsDef: Boolean = {
          if (!(peek.isLetter || peek == '_')) false
          else {
            val save = i
            val name = parseIdent()
            i = save
            defs.contains(name)
          }
        }
        // `A | while(cond; upd)` — while's input is the piped value, so
        // it rides the same general-body elemBinding (its bareDotV reads
        // that binding); the stream flag it sets survives this branch
        def identIsWhile: Boolean =
          s.startsWith("while", i) && !defs.contains("while") && {
            val save = i; i += 5; skipWs()
            val ok = peek == '('
            i = save; ok
          }
        if (peek == '(' || peek == '{' || peek == '[' || peek == '"' ||
            pathThenOperator || identIsDef || identIsWhile) {
          // GENERAL pipe body: `A | (.lo + .hi)`, `A | .lo + .hi`,
          // `A | {x: .f}`, `A | "v\(.k)"` — the body is a full value
          // expression with `.`/`.path` bound to the PIPED value (the
          // elemBinding channel, same as map bodies). A plain `| .path`
          // with nothing after still takes the postfix branch below
          // (never-error, variant-aware walk).
          val vv = v
          val body = parseValue()
          v = df => {
            val et = dtOfV(df, vv)
            elemBinding.withValue(
              Some(Bound(vv(df), lit(null).cast(et), et)))(body(df))
          }
          skipWs()
        } else if (peek == '.' && i + 1 < s.length &&
            (s.charAt(i + 1).isLetterOrDigit || s.charAt(i + 1) == '_')) {
          // `| .path` postfix: navigate the CURRENT value (jq's pipe into
          // a path) — never-error walk, variant-aware (the natural
          // follow-on to fromjson)
          val parts = parsePathParts()
          val vv = v
          v = df => walkPath(dtOfV(df, vv), vv(df), parts.toList)
          skipWs()
        } else if (peek == '@') {
          // jq format strings as value filters (`.s | @base64`). @text is
          // tostring; @json encodes the VALUE as JSON text (structs/arrays/
          // maps via to_json, scalars hand-encoded — jq's full control-char
          // escaping is out of scope for strings, documented); @base64/
          // @base64d round-trip UTF-8 bytes; @csv/@tsv render an ARRAY as
          // one line (CSV quotes strings and doubles embedded quotes, TSV
          // backslash-escapes \t/\n/\r/\\ — jq's rules), via one codegen'd
          // aggregate fold.
          next()
          val fmt = parseIdent()
          val vv = v
          fmt match {
            case "text" => v = df => vv(df).cast("string")
            case "base64" => v = df => base64(vv(df).cast("binary"))
            case "base64d" => v = df => unbase64(vv(df)).cast("string")
            case "json" => v = df => dtOfV(df, vv) match {
              case _: StructType | _: ArrayType | _: MapType => to_json(vv(df))
              case StringType =>
                val c = vv(df)
                val escaped = regexp_replace(
                  regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
                when(c.isNull, lit("null"))
                  .otherwise(concat(lit("\""), escaped, lit("\"")))
              case BooleanType | _: NumericType | NullType =>
                coalesce(vv(df).cast("string"), lit("null"))
              case dt => throw new IllegalArgumentException(
                s"jq_expr: @json over ${dt.simpleString} is unsupported")
            }
            case "csv" | "tsv" =>
              val sep = if (fmt == "csv") "," else "\t"
              v = df => {
                val et = elementTypeV(df, vv, s"@$fmt")
                def cell(x: Column): Column = (fmt, et) match {
                  case ("csv", StringType) =>
                    concat(lit("\""), regexp_replace(x, "\"", "\"\""), lit("\""))
                  case ("tsv", StringType) =>
                    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                      x, "\\\\", "\\\\\\\\"), "\t", "\\\\t"), "\n", "\\\\n"),
                      "\r", "\\\\r")
                  case _ => x.cast("string")
                }
                coalesce(aggregate(vv(df), lit(null).cast("string"), (acc, x) => {
                  val xs = coalesce(cell(x), lit("")) // jq: null cell renders empty
                  when(acc.isNull, xs).otherwise(concat(acc, lit(sep), xs))
                }), lit(""))
              }
            case "uri" =>
              // jq @uri: RFC 3986 percent-encoding (unreserved A-Za-z0-9-._~
              // kept). url_encode is the form-encoding variant; the three
              // divergences are fixed up exactly — its '+' only ever means
              // an input space, its literal '*' / '%7E' only ever mean
              // input '*' / '~'
              v = df => {
                val enc = url_encode(vv(df).cast("string"))
                replace(replace(replace(enc,
                  lit("+"), lit("%20")),
                  lit("*"), lit("%2A")),
                  lit("%7E"), lit("~"))
              }
            case "html" =>
              // jq @html: & < > ' " → entities, ampersand first
              v = df =>
                replace(replace(replace(replace(replace(vv(df).cast("string"),
                  lit("&"), lit("&amp;")),
                  lit("<"), lit("&lt;")),
                  lit(">"), lit("&gt;")),
                  lit("'"), lit("&#39;")),
                  lit("\""), lit("&quot;"))
            case "sh" =>
              // jq @sh: single-quoted with '\'' splicing; an ARRAY renders
              // space-joined with each element quoted
              v = df => {
                def q(x: Column): Column =
                  concat(lit("'"),
                    replace(x.cast("string"), lit("'"), lit("'\\''")),
                    lit("'"))
                dtOfV(df, vv) match {
                  case _: ArrayType =>
                    coalesce(aggregate(vv(df), lit(null).cast("string"),
                      (acc, x) => when(acc.isNull, q(x))
                        .otherwise(concat(acc, lit(" "), q(x)))), lit(""))
                  case _ => q(vv(df))
                }
              }
            case other => throw new IllegalArgumentException(
              s"jq_expr: unsupported format string @$other " +
                "(supported: @text, @json, @base64, @base64d, @csv, @tsv, " +
                "@uri, @html, @sh)")
          }
          skipWs()
        } else {
        val fn = parseIdent()
        skipWs()
        if (fn == "map") {
          expect('(')
          val inner = parseValue()
          expect(')')
          val vv = v
          v = df => {
            val et = elementTypeV(df, vv, "map")
            transform(vv(df), x =>
              elemBinding.withValue(Some(Bound(x, lit(null).cast(et), et)))(inner(df)))
          }
        } else if (fn == "with_entries") {
          // jq sugar: with_entries(f) ≡ to_entries | map(f) | from_entries
          // — composed from the SAME three kernels so the entry shape
          // ({key, value}), mixed-type string fallback and last-wins
          // duplicate policy cannot diverge from the spelled-out form
          expect('(')
          val inner = parseValue()
          expect(')')
          val vv = v
          v = df => {
            val entriesV: V = d => Funcs("to_entries")(d, vv)
            val et = elementTypeV(df, entriesV, "with_entries")
            val mapped = transform(entriesV(df), x =>
              elemBinding.withValue(Some(Bound(x, lit(null).cast(et), et)))(inner(df)))
            Funcs("from_entries")(df, _ => mapped)
          }
        } else if (fn == "group_by") {
          // group_by(f): array → array of arrays, groups ordered by key
          // ascending with nulls FIRST (jq's sort order; sort_array, not
          // array_sort, matches that), original order kept within a
          // group. Key/filter re-walk the array per distinct key — fine
          // for the small arrays jq programs build per record; the array
          // operand itself is a cheap path/column, per the HOF-body rule.
          expect('(')
          val inner = parseValue()
          expect(')')
          val vv = v
          v = df => {
            val et = elementTypeV(df, vv, "group_by")
            val arr = vv(df)
            def keyOf(x: Column): Column =
              elemBinding.withValue(Some(Bound(x, lit(null).cast(et), et)))(inner(df))
            val keys = sort_array(array_distinct(transform(arr, x => keyOf(x))))
            transform(keys, k => filter(arr, x => keyOf(x) <=> k))
          }
        } else if (fn == "sort_by") {
          // sort_by(f): stable ascending sort by f(x) under jq's order.
          // Same shape as group_by — sorted distinct keys, then each key's
          // elements in original order — i.e. sort_by ≡ flatten(group_by):
          // stability and null-first key order fall out of sort_array;
          // within one Spark array the key type is static, so the
          // cross-type half of jq's order cannot arise and the within-rank
          // SQL ordering IS jq's.
          expect('(')
          val inner = parseValue()
          expect(')')
          val vv = v
          v = df => {
            val et = elementTypeV(df, vv, "sort_by")
            val arr = vv(df)
            def keyOf(x: Column): Column =
              elemBinding.withValue(Some(Bound(x, lit(null).cast(et), et)))(inner(df))
            val keys = sort_array(array_distinct(transform(arr, x => keyOf(x))))
            flatten(transform(keys, k => filter(arr, x => keyOf(x) <=> k)))
          }
        } else if (fn == "min_by" || fn == "max_by") {
          // min_by(f)/max_by(f): the element whose f(x) is smallest/largest
          // under jq's order; [] → null (try_element_at). Ties: the stable
          // sort_by kernel means first-minimal / last-maximal — jq's pick.
          expect('(')
          val inner = parseValue()
          expect(')')
          val vv = v
          val wantMax = fn == "max_by"
          v = df => {
            val et = elementTypeV(df, vv, fn)
            val arr = vv(df)
            def keyOf(x: Column): Column =
              elemBinding.withValue(Some(Bound(x, lit(null).cast(et), et)))(inner(df))
            val keys = sort_array(array_distinct(transform(arr, x => keyOf(x))))
            val sorted = flatten(transform(keys, k => filter(arr, x => keyOf(x) <=> k)))
            try_element_at(sorted, lit(if (wantMax) -1 else 1))
          }
        } else if (fn == "unique_by") {
          // unique_by(f): jq defines it as [group_by(f)[] | .[0]] — one
          // element per distinct key, the FIRST in original order, output
          // sorted by key. Same sorted-distinct-keys kernel as group_by.
          expect('(')
          val inner = parseValue()
          expect(')')
          val vv = v
          v = df => {
            val et = elementTypeV(df, vv, "unique_by")
            val arr = vv(df)
            def keyOf(x: Column): Column =
              elemBinding.withValue(Some(Bound(x, lit(null).cast(et), et)))(inner(df))
            val keys = sort_array(array_distinct(transform(arr, x => keyOf(x))))
            transform(keys, k => element_at(filter(arr, x => keyOf(x) <=> k), 1))
          }
        } else if ((fn == "first" || fn == "last") && peek == '(') {
          // first(f)/last(f): f's first/last OUTPUT. A STREAM-valued f
          // yields a ≤1-element STREAM (the sliced array, stream flag
          // kept): one output picks that end, an EMPTY stream stays
          // empty — so a record-level use drops the record and a
          // [collect] yields [], both jq-exact (an empty-stream null
          // stand-in was round 8's convention; a round-9 fuzz seed
          // caught the divergence). A single-output f is jq's
          // one-element stream — the value itself, no flag.
          expect('(')
          val inner = parseValue()
          val innerStream = streamTail
          streamTail = false
          skipWs(); expect(')')
          val wantLast = fn == "last"
          val vv = v
          v = df => {
            // '.' inside f = the piped value (jq: `A | first(f)` runs f
            // against A's output), the general-pipe-body binding
            val et = dtOfV(df, vv)
            val out = elemBinding.withValue(
              Some(Bound(vv(df), lit(null).cast(et), et)))(inner(df))
            if (!innerStream) out
            else if (wantLast)
              // jq: `def last(f): reduce f as $x (null; $x)` — an EMPTY
              // stream folds to the init, null, so last(empty) emits ONE
              // null (record kept), unlike first(empty) which is empty.
              // get() on the empty array makes the correctly-typed null.
              when(size(out) > lit(0), slice(out, size(out), lit(1)))
                .otherwise(array(get(out, lit(0))))
            else slice(out, lit(1), lit(1))
          }
          streamTail = innerStream
        } else if ((fn == "any" || fn == "all") && peek == '(') {
          // any(f)/all(f): condition over each element with '.' bound —
          // one codegen'd exists/forall; truthiness by the condition's
          // static type (boolean → true-only; else non-null), as the
          // 0-arity forms. (The 2-arity generator forms are out of scope
          // with the other stream generators, documented.)
          expect('(')
          val inner = parseValue()
          expect(')')
          val vv = v
          val wantAll = fn == "all"
          v = df => {
            val et = elementTypeV(df, vv, fn)
            val probe = lit(null).cast(et)
            val cdt = probeMode.withValue(true)(dtOf(df,
              elemBinding.withValue(Some(Bound(probe, probe, et)))(inner(df))))
            def condOf(x: Column): Column = {
              val c = elemBinding.withValue(Some(Bound(x, probe, et)))(inner(df))
              cdt match {
                case BooleanType => coalesce(c, lit(false)) === lit(true)
                case _ => c.isNotNull
              }
            }
            if (wantAll) forall(vv(df), x => condOf(x))
            else exists(vv(df), x => condOf(x))
          }
        } else if (fn == "sort") {
          // sort = ascending element sort, nulls first (jq's order; with a
          // static element type sort_array matches it exactly)
          val vv = v
          v = df => {
            elementTypeV(df, vv, "sort") // array-input check, jq-style error
            sort_array(vv(df))
          }
        } else if (fn == "has") {
          // has("k") on an object — key membership is schema-static for
          // structs, runtime for maps; has(n) on an array — 0 ≤ n < length
          expect('('); skipWs()
          val keyLit: Option[String] =
            if (peek == '"') Some(parseStringLit()) else None
          val argV: Option[V] = if (keyLit.isEmpty) Some(parseValue()) else None
          expect(')')
          val vv = v
          v = df => dtOfV(df, vv) match {
            case st: StructType =>
              val k = keyLit.getOrElse(throw new IllegalArgumentException(
                "jq_expr: has() on an object requires a string-literal key"))
              when(vv(df).isNotNull, lit(st.fieldNames.contains(k)))
            case _: MapType =>
              map_contains_key(vv(df), keyLit.map(lit(_)).getOrElse(argV.get(df)))
            case _: ArrayType =>
              val n = argV.getOrElse(throw new IllegalArgumentException(
                "jq_expr: has() on an array takes a number index"))(df)
              n >= lit(0) && n < size(vv(df)).cast("long")
            case dt => throw new IllegalArgumentException(
              s"jq_expr: has() requires an object or array, got ${dt.simpleString}")
          }
        } else if (fn == "strftime") {
          // strftime(fmt): format a broken-down-time array (gmtime's
          // layout — jq's only accepted input) with a C format string,
          // translated to a Spark datetime pattern at parse time (loud
          // on unsupported % directives). A NUMERIC input is accepted as
          // epoch seconds (jq errors there — documented convenience).
          expect('('); skipWs()
          val fmtLit = parseStringLit()
          skipWs(); expect(')')
          val pattern = cFormatToSpark(fmtLit)
          val vv = v
          v = df => {
            val ts = dtOfV(df, vv) match {
              case _: NumericType => timestamp_seconds(vv(df).cast("long"))
              case _: ArrayType => timestamp_seconds(Funcs("mktime")(df, vv))
              case dt => throw new IllegalArgumentException(
                s"jq_expr: strftime requires a gmtime array (or epoch " +
                  s"seconds), got ${dt.simpleString}")
            }
            date_format(ts, pattern)
          }
        } else if (FuncsArg.contains(fn)) {
          expect('(')
          val arg = parseValue()
          expect(')')
          val vv = v
          val f = FuncsArg(fn)
          v = df => f(df, vv, arg)
        } else if (fn == "sub" || fn == "gsub") {
          // jq sub/gsub(re; repl[; flags]): replace the first/all matches.
          // The replacement is a string literal that may interpolate NAMED
          // captures (`"\(.name)"` — jq binds the capture object to `.`
          // there; the single-path form is the practically-used shape).
          // gsub lowers to ONE codegen'd regexp_replace with Java's
          // ${name} group references; sub (no first-only kernel in Spark)
          // splices around the first match: prefix + rebuilt replacement
          // (regexp_extract per named ref — first-match groups, exactly
          // sub's) + suffix.
          // Round 10: the pattern may also be COLUMN-VALUED (computed
          // regex); the replacement must then be capture-free (named
          // ${…} refs cannot be validated against an unknown pattern).
          expect('('); skipWs()
          val patLit: Option[String] =
            if (peek == '"') Some(parseStringLit()) else None
          val patDyn: Option[V] =
            if (patLit.isEmpty) Some(parseValue()) else None
          skipWs(); expect(';'); skipWs()
          if (peek != '"')
            throw new IllegalArgumentException(
              s"jq_expr: $fn() replacement must be a string literal " +
                "(named-capture interpolation \\(.name) allowed)")
          // raw scan: keep \(.name) refs, honor \-escapes for literals
          val segs = Seq.newBuilder[Either[String, String]] // Left=lit, Right=group name
          val sb = new StringBuilder
          expect('"')
          while (peek != '"' && i < s.length) {
            if (peek == '\\') {
              next()
              if (peek == '(') {
                next(); skipWs()
                expect('.')
                val name = parseIdent()
                skipWs(); expect(')')
                if (sb.nonEmpty) { segs += Left(sb.toString); sb.clear() }
                segs += Right(name)
              } else sb.append(next())
            } else sb.append(next())
          }
          expect('"')
          if (sb.nonEmpty) segs += Left(sb.toString)
          skipWs()
          val flags =
            if (peek == ';') {
              next(); skipWs()
              if (peek != '"')
                throw new IllegalArgumentException(
                  s"jq_expr: $fn() flags must be a string literal")
              parseStringLit()
            } else ""
          expect(')')
          val repl = segs.result()
          val vv = v
          (patLit, patDyn) match {
            case (Some(rawPat), _) =>
              val pat = regexWithFlags(rawPat, flags)
              val groups = captureGroups(rawPat)
              val named = groups.collect { case (Some(n), gi) => (n, gi) }.toMap
              repl.foreach {
                case Right(n) if !named.contains(n) =>
                  throw new IllegalArgumentException(
                    s"jq_expr: $fn() replacement references (?<$n>…) which the " +
                      s"pattern does not define (named groups: ${named.keys.mkString(", ")})")
                case _ => ()
              }
              if (fn == "gsub") {
                // Java replacement syntax: literal \ and $ must be escaped,
                // named refs become ${name}
                val javaRepl = repl.map {
                  case Left(lit0) => lit0.replace("\\", "\\\\").replace("$", "\\$")
                  case Right(n) => "${" + n + "}"
                }.mkString
                v = df => regexp_replace(vv(df), lit(pat), lit(javaRepl))
              } else {
                v = df => {
                  val c = vv(df)
                  val pos = regexp_instr(c, lit(pat)) // 1-based, 0 = no match
                  val m = regexp_substr(c, lit(pat))
                  val rebuilt =
                    if (repl.isEmpty) lit("")
                    else concat(repl.map {
                      case Left(lit0) => lit(lit0)
                      case Right(n) => regexp_extract(c, pat, named(n))
                    }: _*)
                  when(pos > lit(0),
                    concat(c.substr(lit(1), pos - lit(1)), rebuilt,
                      c.substr(pos + length(m), length(c))))
                    .otherwise(c)
                }
              }
            case (None, Some(patV)) =>
              repl.foreach {
                case Right(n) => throw new IllegalArgumentException(
                  s"jq_expr: $fn() with a computed pattern cannot validate " +
                    s"the named-capture reference \\(.$n) — use a literal " +
                    "pattern or a capture-free replacement")
                case _ => ()
              }
              flags.foreach(f => require("ixsm".contains(f),
                s"jq_expr: unsupported regex flag '$f' (supported: i, x, s, m)"))
              val litRepl = repl.collect { case Left(l) => l }.mkString
              def patCol(df: DataFrame): Column = {
                val p0 = patV(df).cast("string")
                if (flags.isEmpty) p0 else concat(lit(s"(?$flags)"), p0)
              }
              if (fn == "gsub") {
                val javaRepl = litRepl.replace("\\", "\\\\").replace("$", "\\$")
                v = df => regexp_replace(vv(df), patCol(df), lit(javaRepl))
              } else {
                v = df => {
                  val c = vv(df)
                  val p = patCol(df)
                  val pos = regexp_instr(c, p)
                  val m = regexp_substr(c, p)
                  when(pos > lit(0),
                    concat(c.substr(lit(1), pos - lit(1)), lit(litRepl),
                      c.substr(pos + length(m), length(c))))
                    .otherwise(c)
                }
              }
            case _ => throw new IllegalStateException("unreachable")
          }
        } else if (fn == "test" || fn == "match" || fn == "capture") {
          // jq regex builtins over Java regex (PCRE-adjacent — the common
          // \d/\w/anchors/groups/named-groups subset is identical; jq's
          // engine is oniguruma, divergence documented). `match` yields
          // jq's match object {offset, length, string, captures}; no-match
          // yields null (the skip-on-error analog of jq's empty stream, as
          // with tonumber); `capture` yields the named-groups object, null
          // on no match.
          //
          // Round 10: `test` also accepts a COLUMN-VALUED pattern (jq
          // allows computed regexes) — Spark's RLike/RegExp kernels
          // recompile per distinct pattern with a last-pattern cache, so a
          // low-cardinality pattern column stays cheap. match/capture stay
          // literal-only: their output COLUMNS (capture group names/count)
          // are part of the static schema, which a dynamic pattern cannot
          // determine — that rejection is loud below.
          expect('('); skipWs()
          if (peek != '"') {
            if (fn == "capture")
              throw new IllegalArgumentException(
                "jq_expr: capture() requires a string-literal regex — its " +
                  "named-group output columns are static schema; for a " +
                  "computed pattern use test(), match() (offset/length/" +
                  "string) or scan()")
            val patV = parseValue()
            skipWs()
            val flags =
              if (peek == ';') {
                next(); skipWs()
                if (peek != '"')
                  throw new IllegalArgumentException(
                    s"jq_expr: $fn() flags must be a string literal")
                parseStringLit()
              } else ""
            expect(')')
            flags.foreach(f => require("ixsm".contains(f),
              s"jq_expr: unsupported regex flag '$f' (supported: i, x, s, m)"))
            val vv = v
            def patWithFlags(df: DataFrame): Column = {
              val p0 = patV(df).cast("string")
              if (flags.isEmpty) p0 else concat(lit(s"(?$flags)"), p0)
            }
            if (fn == "test")
              v = df => regexp_like(vv(df), patWithFlags(df))
            else {
              // Round 12: match() with a COMPUTED pattern — the
              // schema-expressible subset. offset/length/string are
              // pattern-independent scalars, so the static-schema
              // objection only ever applied to the captures column: the
              // dynamic match object carries the three scalars and NO
              // captures field, and a downstream `.captures` access is
              // rejected loudly (see missingField) instead of reading as
              // jq null. Same regexp_instr/regexp_substr kernels as the
              // literal form — RegExp kernels recompile per distinct
              // pattern with a last-pattern cache, so a low-cardinality
              // pattern column stays cheap.
              v = df => {
                val c = vv(df)
                val p = patWithFlags(df)
                val pos = regexp_instr(c, p)
                // pos > 0 disambiguates regexp_substr's null (it nulls
                // both no-match and the empty match) → jq's {off, 0, ""}
                val str = coalesce(regexp_substr(c, p), lit(""))
                when(pos > lit(0), struct(
                  (pos - lit(1)).cast("long").as("offset"),
                  length(str).cast("long").as("length"),
                  str.as("string")))
              }
            }
          } else {
          val rawPat = parseStringLit()
          skipWs()
          val flags =
            if (peek == ';') {
              next(); skipWs()
              if (peek != '"')
                throw new IllegalArgumentException(
                  s"jq_expr: $fn() flags must be a string literal")
              parseStringLit()
            } else ""
          expect(')')
          val pat = regexWithFlags(rawPat, flags)
          val groups = captureGroups(rawPat)
          val vv = v
          fn match {
            case "test" => v = df => vv(df).rlike(pat)
            case "match" => v = df => {
              val c = vv(df)
              val pos = regexp_instr(c, lit(pat))
              // regexp_substr nulls BOTH no-match and the EMPTY match
              // (it is nullif(extract, "")); pos > 0 disambiguates, so
              // an empty match reads back as jq's {0-based offset, 0, ""}
              val str = coalesce(regexp_substr(c, lit(pat)), lit(""))
              // captures: every group in number order, name null for
              // unnamed groups (jq's shape; per-group offsets are not
              // recoverable from Spark's regex kernel — documented)
              val caps =
                if (groups.isEmpty)
                  array().cast("array<struct<name:string,string:string>>")
                else array(groups.map { case (n, gi) =>
                  struct(n.map(lit(_)).getOrElse(lit(null).cast("string")).as("name"),
                    regexp_extract(c, pat, gi).as("string"))
                }: _*)
              when(pos > lit(0), struct(
                (pos - lit(1)).cast("long").as("offset"),
                length(str).cast("long").as("length"),
                str.as("string"),
                caps.as("captures")))
            }
            case "capture" =>
              val named = groups.collect { case (Some(n), gi) => (n, gi) }
              require(named.nonEmpty,
                "jq_expr: capture() requires at least one named group (?<name>…)")
              v = df => {
                val c = vv(df)
                when(c.rlike(pat), struct(named.map { case (n, gi) =>
                  regexp_extract(c, pat, gi).as(n) }: _*))
              }
          }
          } // literal-pattern branch
        } else if (fn == "split") {
          // jq split(s) is a LITERAL separator; split(re; flags) is the
          // regex form (the two-arg shape makes the first arg a regex in
          // jq). Spark's split takes a regex, so the one-arg form quotes it
          // — literal-arg only (parse-time), documented.
          expect('('); skipWs()
          if (peek != '"')
            throw new IllegalArgumentException(
              "jq_expr: split() requires a string-literal separator")
          val sep = parseStringLit()
          skipWs()
          val reFlags: Option[String] =
            if (peek == ';') {
              next(); skipWs()
              if (peek != '"')
                throw new IllegalArgumentException(
                  "jq_expr: split() flags must be a string literal")
              Some(parseStringLit())
            } else None
          expect(')')
          val vv = v
          v = reFlags match {
            case None => df => split(vv(df), java.util.regex.Pattern.quote(sep))
            case Some(fl) => df => split(vv(df), regexWithFlags(sep, fl))
          }
        } else if (fn == "getpath") {
          // getpath(["a","b"]): literal path navigation on the current
          // value — ≡ .a.b, with jq's never-error convention (missing
          // fields and non-objects read as null); variant values (the
          // `..` stream) navigate via try_variant_get
          // Round 10: segments may also be COMPUTED (`getpath(["a", .k])`)
          // — the path ARRAY itself stays a bracket literal (static
          // length/shape), but each element may be any string expression.
          // A computed segment walks maps by key lookup and structs by a
          // CASE over the statically-known field names (which therefore
          // must share one type at that level — loud otherwise).
          expect('('); skipWs(); expect('['); skipWs()
          val segs = Seq.newBuilder[Either[String, V]]
          if (peek != ']') {
            var more = true
            while (more) {
              skipWs()
              if (peek == '"') segs += Left(parseStringLit())
              else segs += Right(parseValue())
              skipWs()
              if (peek == ',') next() else more = false
            }
          }
          skipWs(); expect(']'); skipWs(); expect(')')
          val p = segs.result()
          val vv = v
          if (p.forall(_.isLeft))
            v = df => walkPath(dtOfV(df, vv), vv(df),
              p.collect { case Left(s0) => s0 }.toList)
          else v = df => {
            def walkDyn(dt: DataType, c: Column,
                        rest: List[Either[String, V]]): Column = rest match {
              case Nil => c
              case Left(name) :: t => dt match {
                case st: StructType => st.fields.find(_.name == name) match {
                  case Some(f) => walkDyn(f.dataType, c.getField(f.name), t)
                  case None => missingField(st, name)
                }
                case mt: MapType =>
                  walkDyn(mt.valueType, try_element_at(c, lit(name)), t)
                case _ => lit(null)
              }
              case Right(kv) :: t =>
                val k = kv(df).cast("string")
                dt match {
                  case mt: MapType =>
                    walkDyn(mt.valueType, try_element_at(c, k), t)
                  case st: StructType =>
                    val fts = st.fields.map(_.dataType).distinct
                    if (fts.length != 1) throw new IllegalArgumentException(
                      "jq_expr: getpath() with a computed segment over a " +
                        s"struct needs uniformly-typed fields (got " +
                        s"${fts.map(_.simpleString).mkString(", ")}); " +
                        "make the segment a string literal")
                    val picked = st.fields.foldLeft(lit(null).cast(fts.head)) {
                      (acc, f) => when(k === lit(f.name), c.getField(f.name))
                        .otherwise(acc)
                    }
                    walkDyn(fts.head, picked, t)
                  case _ => lit(null)
                }
            }
            walkDyn(dtOfV(df, vv), vv(df), p.toList)
          }
        } else if (fn == "setpath") {
          // setpath(["a","b"]; E): getpath's writer twin — the path's
          // leaf is set to E ('.' in E = the current value, as everywhere
          // in a pipe), existing keys update, a new LEAF key appends
          // (withField), and like the assignment stages an intermediate
          // struct must already exist (static schemas cannot fabricate {}
          // parents; loud error).
          // Round 11: segments may also be COMPUTED (`setpath([.k]; E)`)
          // — the c73 getpath device applied to the writer: the path
          // array stays a bracket literal, each element may be any string
          // expression. A computed segment over a MAP is jq-exact
          // (map_concat updates or inserts); over a STRUCT it rewrites
          // whichever of the statically-known fields the key names at
          // runtime (fields must be uniformly typed, the getpath rule) —
          // a key naming NO field leaves the object unchanged where jq
          // would append it, impossible under a static schema, so that
          // divergence is documented here and excluded from the fuzz
          // grammar (seed 13 draws only existing keys).
          expect('('); skipWs(); expect('['); skipWs()
          val segs = Seq.newBuilder[Either[String, V]]
          if (peek != ']') {
            var more = true
            while (more) {
              skipWs()
              if (peek == '"') segs += Left(parseStringLit())
              else segs += Right(parseValue())
              skipWs()
              if (peek == ',') next() else more = false
            }
          }
          skipWs(); expect(']'); skipWs(); expect(';')
          val leafV = parseValue()
          skipWs(); expect(')')
          val p = segs.result()
          require(p.nonEmpty, "jq_expr: setpath() requires a non-empty path")
          val vv = v
          // ONE walker for literal and computed segments alike: literal
          // struct paths chain withField (existing keys update, a new
          // LEAF key appends, absent parents are loud), maps update or
          // insert via map_concat (jq-exact), computed struct segments
          // pick among the statically-known fields at runtime.
          v = df => {
            val leaf = leafV(df)
            def set(dt: DataType, c: Column,
                    rest: List[Either[String, V]]): Column = rest match {
              case Nil => leaf
              case Left(name) :: t => dt match {
                case st: StructType => st.fields.find(_.name == name) match {
                  case Some(f) =>
                    c.withField(name, set(f.dataType, c.getField(name), t))
                  case None if t.isEmpty => c.withField(name, leaf)
                  case None => throw new IllegalArgumentException(
                    s"jq_expr: setpath parent '$name' does not exist — " +
                      "static schemas cannot fabricate intermediate objects")
                }
                case mt: MapType =>
                  // filter-then-concat: map_concat REJECTS duplicate keys
                  // under the default dedup policy, so updates drop the
                  // old entry first (insert-or-update, jq-exact)
                  map_concat(
                    map_filter(c, (mk, _) => !(mk <=> lit(name))),
                    map(lit(name),
                      set(mt.valueType, try_element_at(c, lit(name)), t)))
                case other => throw new IllegalArgumentException(
                  s"jq_expr: setpath segment '$name' reaches into " +
                    s"${other.simpleString}, not an object")
              }
              case Right(kv) :: t =>
                val k = kv(df).cast("string")
                dt match {
                  case mt: MapType =>
                    map_concat(
                      map_filter(c, (mk, _) => !(mk <=> k)),
                      map(k, set(mt.valueType, try_element_at(c, k), t)))
                  case st: StructType =>
                    val fts = st.fields.map(_.dataType).distinct
                    if (fts.length != 1) throw new IllegalArgumentException(
                      "jq_expr: setpath() with a computed segment over a " +
                        s"struct needs uniformly-typed fields (got " +
                        s"${fts.map(_.simpleString).mkString(", ")}); " +
                        "make the segment a string literal")
                    when(c.isNotNull, struct(st.fields.toSeq.map { f =>
                      when(k === lit(f.name),
                        set(f.dataType, c.getField(f.name), t))
                        .otherwise(c.getField(f.name)).as(f.name)
                    }: _*))
                  case other => throw new IllegalArgumentException(
                    "jq_expr: setpath() computed segment reaches into " +
                      s"${other.simpleString}, not an object")
                }
            }
            set(dtOfV(df, vv), vv(df), p.toList)
          }
        } else if (fn == "del") {
          // del(.a) / del(.a.b): remove one literal-path field — structs
          // rebuild without the field (schema-static), maps filter the
          // key; a missing path is a no-op, like jq. Multi-path and
          // array-index forms stay out of scope, documented.
          // Round 11: del(.[E]) with a COMPUTED key — jq-exact over a MAP
          // (filter the key out; absent key is a no-op); loud over a
          // STRUCT, whose field set is schema-static and cannot shrink on
          // a per-row answer.
          expect('('); skipWs()
          if (peek == '.' && i + 1 < s.length && s.charAt(i + 1) == '[') {
            next(); next(); skipWs()
            val kv = parseValue()
            skipWs(); expect(']'); skipWs(); expect(')')
            val vv = v
            v = df => {
              val k = kv(df).cast("string")
              dtOfV(df, vv) match {
                case _: MapType => map_filter(vv(df), (mk, _) => !(mk <=> k))
                case other => throw new IllegalArgumentException(
                  "jq_expr: del() with a computed key needs a map-typed " +
                    s"object (got ${other.simpleString}) — a struct's field " +
                    "set is schema-static and cannot shrink per row")
              }
            }
          } else {
          val parts = parsePathParts()
          skipWs(); expect(')')
          require(parts.nonEmpty, "jq_expr: del() requires a field path")
          val vv = v
          v = df => {
            def drop(dt: DataType, c: Column, rest: List[String]): Column =
              (dt, rest) match {
                case (st: StructType, h :: Nil) =>
                  if (!st.fieldNames.contains(h)) c
                  else {
                    val kept = st.fields.filterNot(_.name == h)
                    require(kept.nonEmpty,
                      s"jq_expr: del(.$h) would empty the object")
                    when(c.isNotNull,
                      struct(kept.toSeq.map(f => c.getField(f.name).as(f.name)): _*))
                  }
                case (mt: MapType, h :: Nil) =>
                  map_filter(c, (k, _) => !(k <=> lit(h)))
                case (st: StructType, h :: t) =>
                  st.fields.find(_.name == h) match {
                    case None => c
                    case Some(inner) =>
                      when(c.isNotNull, struct(st.fields.toSeq.map { f =>
                        (if (f.name == h) drop(inner.dataType, c.getField(h), t)
                         else c.getField(f.name)).as(f.name)
                      }: _*))
                  }
                case (dt, _) => throw new IllegalArgumentException(
                  s"jq_expr: del() path does not reach into ${dt.simpleString}")
              }
            drop(dtOfV(df, vv), vv(df), parts.toList)
          }
          }
        } else if (fn == "scan" || fn == "splits") {
          // jq scan(re)/splits(re[; flags]): the all-matches / regex-split
          // STREAMS. Streams are arrays in this compiler — the collect
          // form `[.s | scan(re)]` unwraps to jq's exact shape (the
          // stream-tail rule in the '[' atom); in bare value position the
          // collected array is the value, documented divergence. scan is
          // group-less-pattern only (jq emits capture arrays for grouped
          // patterns — a different element shape).
          // Round 10: the pattern may also be COLUMN-VALUED; a computed
          // scan pattern carries the same group-less contract as the
          // literal form (grouped scan emits capture arrays — a different
          // element shape), just unverifiable at plan time — documented.
          expect('('); skipWs()
          val patLit: Option[String] =
            if (peek == '"') Some(parseStringLit()) else None
          val patDyn: Option[V] =
            if (patLit.isEmpty) Some(parseValue()) else None
          skipWs()
          val flags =
            if (peek == ';') {
              next(); skipWs()
              if (peek != '"')
                throw new IllegalArgumentException(
                  s"jq_expr: $fn() flags must be a string literal")
              parseStringLit()
            } else ""
          expect(')')
          val vv = v
          (patLit, patDyn) match {
            case (Some(rawPat), _) =>
              val pat = regexWithFlags(rawPat, flags)
              if (fn == "scan") {
                require(captureGroups(rawPat).isEmpty,
                  "jq_expr: scan() supports group-less patterns only " +
                    "(grouped scan emits capture arrays — unsupported shape)")
                v = df => regexp_extract_all(vv(df), lit(pat), lit(0))
              } else
                v = df => split(vv(df), pat)
            case (None, Some(patV)) =>
              flags.foreach(f => require("ixsm".contains(f),
                s"jq_expr: unsupported regex flag '$f' (supported: i, x, s, m)"))
              def patCol(df: DataFrame): Column = {
                val p0 = patV(df).cast("string")
                if (flags.isEmpty) p0 else concat(lit(s"(?$flags)"), p0)
              }
              if (fn == "scan")
                v = df => regexp_extract_all(vv(df), patCol(df), lit(0))
              else
                v = df => call_function("split", vv(df), patCol(df))
            case _ => throw new IllegalStateException("unreachable")
          }
          streamTail = true
        } else if (fn == "flatten" && peek == '(') {
          // flatten(d): depth-limited flatten — the depth must be an int
          // literal (static unrolling); the argless form lives in Funcs
          next(); skipWs()
          val numSb = new StringBuilder
          while (peek.isDigit) numSb.append(next())
          skipWs(); expect(')')
          if (numSb.isEmpty)
            throw new IllegalArgumentException(
              "jq_expr: flatten() depth must be an integer literal")
          val depth = numSb.toString.toInt
          val vv = v
          v = df => {
            var c = vv(df)
            var et = elementTypeV(df, vv, "flatten")
            var d = depth
            while (d > 0 && et.isInstanceOf[ArrayType]) {
              c = flatten(c)
              et = et.asInstanceOf[ArrayType].elementType
              d -= 1
            }
            c
          }
        } else if (fn == "env") {
          // `A | env`: input-ignoring — the plan-time environment object
          v = _ => typedLit(envSnapshot)
        } else if (RejectedBuiltins.contains(fn)) {
          throw new IllegalArgumentException(RejectedBuiltins(fn))
        } else {
          val f = Funcs.getOrElse(fn, throw new IllegalArgumentException(
            s"jq_expr: unsupported function '$fn' (supported: map, has, split, " +
              s"${(Funcs.keys ++ FuncsArg.keys).toSeq.sorted.mkString(", ")})"))
          val vv = v
          registerKernelErr(fn, vv)
          v = df => f(df, vv)
        }
        skipWs()
        } // non-@ branch
      }
      v
    }

    private def parseAdd(): V = {
      var l = parseTerm()
      skipWs()
      while (peek == '+' || peek == '-') {
        val op = next(); skipWs()
        val r = parseTerm()
        streamTail = false
        val ll = l
        l = if (op == '+') df => jqAdd(df, ll, r) else df => ll(df) - r(df)
        skipWs()
      }
      l
    }

    /** jq's polymorphic `+`: numbers add, strings and arrays CONCAT, and
      * null is the identity on either side (`null + x == x` — jq's rule,
      * which plain SQL `+`/`concat` would turn into null). Object merge
      * (`{..} + {..}`, rhs wins) stays out of scope, documented.
      */
    private def jqAdd(df: DataFrame, l: V, r: V): Column =
      polyAdd(dtOfV(df, l), dtOfV(df, r), l(df), r(df))
    private def jqMul(df: DataFrame, l: V, r: V): Column =
      polyMul(dtOfV(df, l), dtOfV(df, r), l(df), r(df))
    private def jqDiv(df: DataFrame, l: V, r: V): Column =
      polyDiv(dtOfV(df, l), dtOfV(df, r), l(df), r(df))
    // jq `%`: operands truncate to integers, result has the DIVIDEND's
    // sign (C semantics — Spark's `%` agrees). DIVERGENCE (documented, as
    // with the other static-schema caveats): a runtime zero divisor (or a
    // null operand) yields jq-null here, where jq 1.6 raises "... cannot
    // be divided because the divisor is zero" — a data-dependent error has
    // no output row to carry it in a declarative plan. A LITERAL zero
    // divisor is rejected loudly at compile (parseTerm), so the statically
    // visible case never ships the silent convention.
    private def jqMod(df: DataFrame, l: V, r: V): Column = {
      val rr = r(df).cast("long")
      // explicit zero guard: ANSI mode would otherwise raise Spark's
      // DIVIDE_BY_ZERO mid-task — the documented convention is jq-null,
      // and an enclosing `try` routes the row to its handler instead
      when(rr === lit(0L), lit(null)).otherwise(l(df).cast("long") % rr)
    }
    private def parseTerm(): V = {
      var l = parseAtomBound()
      skipWs()
      // a single '/' is division; '//' is the alternative operator
      while (peek == '*' || peek == '%' ||
          (peek == '/' && !s.startsWith("//", i))) {
        val op = next(); skipWs()
        val rStart = i
        val r = parseAtomBound()
        val rSrc = s.substring(rStart, i)
        streamTail = false
        val ll = l
        l = op match {
          case '*' => df => jqMul(df, ll, r)
          case '%' =>
            require(!isZeroLiteral(rSrc),
              s"jq_expr: '% $rSrc' divides by literal zero — jq raises " +
                "'cannot be divided because the divisor is zero'")
            registerDivErr(ll, r, remainder = true)
            df => jqMod(df, ll, r)
          case _   =>
            require(!isZeroLiteral(rSrc),
              s"jq_expr: '/ $rSrc' divides by literal zero — jq raises " +
                "'cannot be divided because the divisor is zero'")
            registerDivErr(ll, r, remainder = false)
            df => jqDiv(df, ll, r)
        }
        skipWs()
      }
      l
    }

    /** Value-position binding `T as $x | body` — jq binds a TERM, not an
      * additive expression (`jq.y`: `Term as Patterns '|' Exp`), so the
      * check sits directly above the atom: `0 - 6 as $v | $v` is
      * `0 - (6 as $v | $v)`, and `.a + 1 as $x | $x` binds the `1`. The
      * body is the REST of the pipe expression (to the enclosing
      * paren/bracket) with `$x` on the same dynamic channel as `reduce`'s
      * `as $x`, so HOF/def-inner bindings shadow correctly. One faithful
      * subtlety: jq has no negative literals (`-6` is `'-' Exp`), so
      * `-6 as $v | body` binds POSITIVE 6 and negates the body's result —
      * this parser's `-6` atom is re-split to match. Destructuring
      * patterns (`as [$a]`, `as {a: $x}`) stay out of scope, rejected by
      * name; the stage-level form (`.v as $x | select($x > 0) | …`) is
      * BindingStage's hidden-column variant — this one serves nested
      * expressions like `{y: (.a as $x | $x + $x)}`.
      */
    private def parseAtomBound(): V = {
      skipWs()
      val negLiteral = peek == '-' && i + 1 < s.length && s.charAt(i + 1).isDigit
      val a = parseAtom()
      skipWs()
      if (!(s.startsWith("as", i) && boundary(i + 2))) a
      else {
        i += 2; skipWs()
        val binders = parseAsPatternAlts()
        skipWs()
        if (peek != '|') throw new IllegalArgumentException(
          s"jq_expr: `as <pattern>` needs a `| body` to scope over in: $s")
        next()
        val body = parseValue() // rest of the pipeline, binding in scope
        streamTail = false
        val bound: V = if (negLiteral) df => -a(df) else a
        val bindV: V = df => {
          val dt = dtOfV(df, bound)
          val binds = bindAlternatives(binders, bound(df), dt)
            .map { case (n, c, bdt) => n -> Bound(c, lit(null).cast(bdt), bdt) }
          varBindings.withValue(varBindings.value ++ binds)(body(df))
        }
        if (negLiteral) df => -bindV(df) else bindV
      }
    }

    /** An `as` binding pattern: a plain `$name`, ARRAY destructuring
      * `[$a, $b]` (element i, jq-null past the end), or OBJECT
      * destructuring `{a: $x, "b": $y, $c}` (`$c` is jq's shorthand for
      * `c: $c`; absent keys bind null) — NESTED to any depth since round
      * 8 (`[$a, [$b]]`, `{k: [$x, {j: $y}]}`: each sub-position recurses
      * with the element/field column and its static type; a null/absent
      * outer level binds every inner name null, jq's rule). Returns the
      * statically-bound name list plus a binder from the bound
      * (column, type) to the per-name (name, column, type) triples.
      */
    def parseAsPattern(): AsPattern = {
      skipWs()
      peek match {
        case '$' =>
          next(); val name = parseIdent()
          AsPattern(Seq(name), (c, dt) => Seq((name, c, dt)))
        case '[' =>
          next()
          val subs = Seq.newBuilder[AsPattern]
          var more = true
          while (more) {
            subs += parseAsPattern()
            skipWs()
            if (peek == ',') { next(); more = true } else more = false
          }
          expect(']')
          val ps = subs.result()
          AsPattern(ps.flatMap(_.names), (c, dt) => dt match {
            case ArrayType(et, _) =>
              ps.zipWithIndex.flatMap { case (p, idx) =>
                p.bind(try_element_at(c, lit(idx + 1)), et)
              }
            case NullType => ps.flatMap(_.bind(lit(null), NullType))
            case other => throw new IllegalArgumentException(
              "jq_expr: `as [...]` needs an array value, got " +
                s"${other.simpleString} in: $s")
          })
        case '{' =>
          next()
          val pairs = Seq.newBuilder[(String, AsPattern)]
          var more = true
          while (more) {
            skipWs()
            if (peek == '$') { // {$a} shorthand for a: $a
              next(); val n = parseIdent()
              pairs += ((n, AsPattern(Seq(n), (c, dt) => Seq((n, c, dt)))))
            } else {
              val k = parseKey()
              skipWs(); expect(':')
              pairs += ((k, parseAsPattern()))
            }
            skipWs()
            if (peek == ',') { next(); more = true } else more = false
          }
          expect('}')
          val ps = pairs.result()
          AsPattern(ps.flatMap(_._2.names), (c, dt) => dt match {
            case st: StructType =>
              ps.flatMap { case (k, p) =>
                st.fields.find(_.name == k) match {
                  case Some(f) => p.bind(c.getField(k), f.dataType)
                  case None => p.bind(lit(null), NullType) // absent key → null
                }
              }
            case NullType => ps.flatMap(_._2.bind(lit(null), NullType))
            case other => throw new IllegalArgumentException(
              "jq_expr: `as {...}` needs an object value, got " +
                s"${other.simpleString} in: $s")
          })
        case _ => throw new IllegalArgumentException(
          s"jq_expr: expected a binding pattern ($$name, [$$a, ...] or " +
            s"{k: $$x, ...}) after `as` in: $s")
      }
    }

    /** A `?//`-chained pattern alternative list: `[$a] ?// {a: $a}`.
      * jq tries each pattern against the value per row; with static
      * column types the first TYPE-compatible alternative is chosen at
      * plan time for every row (documented static-schema semantics) —
      * see [[bindAlternatives]].
      */
    def parseAsPatternAlts(): Seq[AsPattern] = {
      val alts = Seq.newBuilder[AsPattern]
      alts += parseAsPattern()
      skipWs()
      while (s.startsWith("?//", i)) {
        i += 3
        alts += parseAsPattern()
        skipWs()
      }
      alts.result()
    }
    /** After the `foreach` keyword: `.path[] as $x (init; update[;
      * extract])` → a V producing the ARRAY of per-element extracts (the
      * scan — `reduce` keeps only the last accumulator; `foreach` keeps
      * every step). ONE codegen'd `aggregate` HOF: the merge carries
      * `{acc, out}` and appends the step's extract; the finish lambda
      * drops the accumulator. Inside update/extract, `.` is the
      * (updated, for extract) accumulator and `$x` the element — jq's
      * scoping exactly. Shared by the stage form (exploded to the true
      * one-output-per-element stream) and the `[foreach …]` collect form.
      */
    def parseForeach(): V = {
      skipWs()
      val parts = parsePathParts()
      if (!tryConsume("[]"))
        throw new IllegalArgumentException(
          s"jq_expr: foreach source must be a '.path[]' iterator in: $s")
      skipWs(); expectKeyword("as"); skipWs()
      expect('$')
      val name = parseIdent()
      skipWs(); expect('(')
      val init = parseValue()
      expect(';')
      val update = parseValue()
      skipWs()
      val extractOpt: Option[V] =
        if (peek == ';') { next(); Some(parseValue()) } else None
      expect(')')
      df => {
        val arrV: V = d => elemBinding.value match {
          case Some(el) => parts.foldLeft(pickElem(el))((c, f) => c.getField(f))
          case None => pathColumn(d, parts)
        }
        val et = elementTypeV(df, arrV, "foreach")
        val accType = dtOfV(df, init)
        val accProbe = lit(null).cast(accType)
        val elProbe = lit(null).cast(et)
        // default extract = '.' — the updated accumulator (jq's 2-arg form)
        val extractV: V = extractOpt.getOrElse(_ => elemBinding.value.map(pickElem).get)
        def inCtx(acc: Column, x: Column)(v: V): Column =
          elemBinding.withValue(Some(Bound(acc, accProbe, accType))) {
            varBindings.withValue(varBindings.value + (name -> Bound(x, elProbe)))(v(df))
          }
        // the extract's static type sizes the empty output array
        val outType = elemBinding.withValue(Some(Bound(accProbe, accProbe))) {
          varBindings.withValue(varBindings.value + (name -> Bound(elProbe, elProbe))) {
            dtOfV(df, extractV)
          }
        }
        aggregate(
          arrV(df),
          struct(init(df).as("acc"), array().cast(ArrayType(outType)).as("out")),
          (st, x) => {
            val acc2 = inCtx(st.getField("acc"), x)(update)
            struct(acc2.as("acc"),
              array_append(st.getField("out"), inCtx(acc2, x)(extractV)).as("out"))
          },
          st => st.getField("out"))
      }
    }

    /** jq's current value `.` as a V: the HOF-bound element, the `..`
      * variant stream's value, or the single column of a one-column
      * frame (a `.path[]`/`paths` stage's output). Also the implicit
      * input of bare value-position builtins (`length` ≡ `. \| length`).
      */
    private def bareDotV: V = df => elemBinding.value.map(pickElem).getOrElse {
      if (variantFrame(df)) col("__variant")
      else {
        val cols = df.columns.filterNot(_.startsWith("__var_"))
        if (cols.length == 1) col(cols.head)
        else throw new IllegalArgumentException(
          "jq_expr: bare '.' as a value needs a single current " +
            "value — inside map(...), after '..', or after a " +
            "single-column stage")
      }
    }

    /** End of the enclosing group from `from`: index of the first
      * top-level `)`/`]`/`}` or `;`, honoring string literals and bracket
      * nesting; end-of-source if none. (Interpolation parens inside
      * string literals ride the in-string scan — a quote INSIDE an
      * interpolation misleads it, which surfaces as a loud parse error of
      * the extracted body, never a silent mis-split.)
      */
    private def scanGroupEnd(from: Int): Int = {
      var j = from; var d0 = 0; var inStr = false
      while (j < s.length) {
        val ch = s.charAt(j)
        if (inStr) {
          if (ch == '\\') j += 1
          else if (ch == '"') inStr = false
        } else ch match {
          case '"' => inStr = true
          case '(' | '[' | '{' => d0 += 1
          case ')' | ']' | '}' => if (d0 == 0) return j else d0 -= 1
          case ';' if d0 == 0 => return j
          case _ =>
        }
        j += 1
      }
      s.length
    }

    /** Index of the last top-level `|` of `src` (not `||`, not `|=`),
      * honoring strings and nesting; -1 if none. */
    private def lastTopLevelPipe(src: String): Int = {
      var j = 0; var d0 = 0; var inStr = false; var last = -1
      while (j < src.length) {
        val ch = src.charAt(j)
        if (inStr) {
          if (ch == '\\') j += 1 else if (ch == '"') inStr = false
        } else ch match {
          case '"' => inStr = true
          case '(' | '[' | '{' => d0 += 1
          case ')' | ']' | '}' => d0 -= 1
          case '|' if d0 == 0 =>
            val prev = if (j > 0) src.charAt(j - 1) else ' '
            val nxt = if (j + 1 < src.length) src.charAt(j + 1) else ' '
            if (prev != '|' && nxt != '|' && nxt != '=') last = j
          case _ =>
        }
        j += 1
      }
      last
    }

    /** `label $out | BODY` — jq's early-termination scope, supported for
      * the practically-used STREAM shapes (anything else is a loud error
      * naming the subset):
      *  - no `break` in BODY: the label is a no-op scope; BODY as-is;
      *  - `label $out | S | ., break $out`: S's first output then stop —
      *    jq's own builtin.jq definition of `first(f)` — compiled as the
      *    ≤1-element stream slice (empty stream stays empty);
      *  - `label $out | S | if C then break $out else . end`: truncate S
      *    BEFORE the first element whose C is jq-truthy (the breaking
      *    element emits nothing);
      *  - `label $out | S | if C then . else break $out end`: the
      *    takeWhile dual — truncate at the first element whose C is falsy.
      * The body extends to the end of the enclosing group (label binds
      * right as far as a pipe does). Nested or mismatched label names are
      * loud errors.
      */
    private def parseLabel(): V = {
      i += 5; skipWs(); expect('$')
      val lbl = parseIdent(); skipWs(); expect('|')
      skipWs()
      val start = i
      val end = scanGroupEnd(start)
      val body = s.substring(start, end).trim
      i = end
      val breakRx = """break\s*\$([A-Za-z_][A-Za-z0-9_]*)""".r
      val breaks = breakRx.findAllMatchIn(body).map(_.group(1)).toList
      breaks.find(_ != lbl).foreach { other =>
        throw new IllegalArgumentException(
          s"jq_expr: break $$$other inside label $$$lbl — nested or " +
            "mismatched labels are out of scope (one label, its own break)")
      }
      def sub(src: String): (V, Boolean) = {
        val pp = new P(src, defs, depth)
        val v0 = pp.parseValue()
        pp.skipWs()
        require(!pp.hasMore, s"jq_expr: trailing input in label body: $src")
        (v0, pp.endedInStream)
      }
      if (breaks.isEmpty) {
        val (v0, isStream) = sub(body)
        streamTail = isStream
        return v0
      }
      val cut = lastTopLevelPipe(body)
      if (cut < 0) throw new IllegalArgumentException(
        s"jq_expr: label $$$lbl body must be `S | <break tail>` " +
          s"(got: $body); supported tails: `., break $$$lbl`, " +
          s"`if C then break $$$lbl else . end`, " +
          s"`if C then . else break $$$lbl end`")
      val prefix = body.substring(0, cut).trim
      val tail = body.substring(cut + 1).trim
      val q = java.util.regex.Pattern.quote(lbl)
      val firstRx = ("""^\.\s*,\s*break\s*\$""" + q + "$").r
      val untilRx = ("""^if\s+(.+?)\s+then\s+break\s*\$""" + q +
        """\s+else\s+\.\s+end$""").r
      val whileRx = ("""^if\s+(.+?)\s+then\s+\.\s+else\s+break\s*\$""" + q +
        """\s+end$""").r
      val (arrV, isStream) = sub(prefix)
      def truncated(condText: String, stopOnTruthy: Boolean): V = {
        val (condV, _) = sub(condText)
        df => {
          val arr0 = if (isStream) arrV(df) else array(arrV(df))
          val et = elementTypeV(df, _ => arr0, s"label $$$lbl")
          val probe = lit(null).cast(et)
          def condOf(x: Column): Column =
            elemBinding.withValue(Some(Bound(x, probe, et)))(condV(df))
          val cdt = probeMode.withValue(true)(dtOf(df,
            elemBinding.withValue(Some(Bound(probe, probe, et)))(condV(df))))
          def truthy(c: Column): Column = cdt match {
            case BooleanType => coalesce(c, lit(false)) === lit(true)
            case NullType => lit(false)
            case _ => c.isNotNull
          }
          val stopFlags = transform(arr0, x =>
            if (stopOnTruthy) truthy(condOf(x)) else !truthy(condOf(x)))
          // 1-based index of the breaking element; 0 = no break fired.
          // The per-element HOF re-evaluation of `len` is fine here:
          // these are per-record jq streams (range/while-capped), never
          // corpus-sized arrays — same trade as group_by's key re-walk.
          val idx = array_position(stopFlags, lit(true))
          val len = when(idx === 0L, size(arr0).cast("long"))
            .otherwise(idx - 1L)
          filter(arr0, (_, i0) => i0.cast("long") < len)
        }
      }
      streamTail = true
      tail match {
        case firstRx() =>
          df => {
            val arr0 = if (isStream) arrV(df) else array(arrV(df))
            slice(arr0, 1, 1)
          }
        case untilRx(cond) => truncated(cond, stopOnTruthy = true)
        case whileRx(cond) => truncated(cond, stopOnTruthy = false)
        case _ => throw new IllegalArgumentException(
          s"jq_expr: unsupported break tail `$tail` under label $$$lbl; " +
            s"supported: `., break $$$lbl`, " +
            s"`if C then break $$$lbl else . end`, " +
            s"`if C then . else break $$$lbl end`")
      }
    }

    private def parseAtom(): V = {
      skipWs()
      peek match {
        case '(' =>
          next()
          val v = parseValue()
          expect(')')
          v
        case '{' =>
          val fields = parseObjectFields()
          df => struct(fields.map { case (k, v) => v(df).as(k) }: _*)
        case '[' =>
          next(); skipWs()
          // jq's collect form [foreach …] — the scan already IS the array
          if (s.startsWith("foreach", i) && boundary(i + 7)) {
            i += 7
            val v = parseForeach()
            expect(']')
            streamTail = false // the collected scan is a plain array value
            v
          } else {
            val elems = Seq.newBuilder[V]
            var streamCollect = false
            var strayStream = false
            if (peek != ']') {
              var more = true
              var first = true
              while (more) {
                streamTail = false
                elems += parseValue()
                skipWs()
                // `[E]` where E ends in a STREAM builtin (range/scan/
                // splits) COLLECTS the stream — the value already is the
                // collected array, so unwrap instead of wrapping
                if (first && streamTail && peek == ']') streamCollect = true
                else if (streamTail) strayStream = true
                first = false
                if (peek == ',') { next(); more = true } else more = false
              }
            }
            expect(']')
            // a collected [...] is a plain array VALUE, not a stream — do
            // not leak the stream flag to an enclosing collector
            // ([[range(3)]] must nest, not double-unwrap)
            streamTail = false
            if (strayStream) throw new IllegalArgumentException(
              "jq_expr: a stream builtin (range/scan/splits/limit or .path[]) " +
                "inside a MULTI-element array literal is out of scope — jq " +
                "flattens the stream into the collection; collect it alone " +
                "([stream]) and combine with '+' instead")
            val es = elems.result()
            if (streamCollect) es.head
            else df => array(es.map(_(df)): _*)
          }
        case '.' =>
          // '.path' — or bare '.' (the current value: only defined inside
          // a map(...) body, where it is the array element)
          if (i + 1 < s.length &&
              (s.charAt(i + 1).isLetterOrDigit || s.charAt(i + 1) == '_')) {
            val parts = parsePathParts()
            // `.path[]` in VALUE position: the stream of elements — an
            // array here (the stream-as-array model), so `[.tags[]]`
            // collects exactly like jq via the stream-tail unwrap.
            // Follow-on pipes see the ARRAY (documented divergence from
            // jq's per-element piping — use map(f) for that).
            val iterated = tryConsume("[]")
            if (iterated) streamTail = true
            df => {
              val c = elemBinding.value match {
                // element paths navigate the element struct (the element's
                // fields resolve when the enclosing HOF analyzes — a missing
                // field is an analyzer error here, unlike top-level paths)
                case Some(el) => parts.foldLeft(pickElem(el))((c0, f) => c0.getField(f))
                case None => pathColumn(df, parts)
              }
              if (iterated) {
                val arrV: V = _ => c
                elementTypeV(df, arrV, "[] iteration") // array-input check
              }
              c
            }
          } else {
            next()
            bareDotV
          }
        case '"' => parseInterpString()
        case c if c.isDigit || c == '-' =>
          val start = i
          if (peek == '-') next()
          while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
          val t = s.substring(start, i)
          if (t.contains('.')) { val d = t.toDouble; _ => lit(d) }
          else { val n = t.toLong; _ => lit(n) }
        case 'm' if s.startsWith("map", i) && {
          // value-position map(f): applies to the current value '.' —
          // meaningful only where '.' is bound (inside an enclosing map)
          val save = i; i += 3; skipWs()
          val ok = peek == '('
          if (!ok) i = save
          ok
        } =>
          next() // '('
          val inner = parseValue()
          expect(')')
          df => {
            val cur = elemBinding.value.getOrElse(throw new IllegalArgumentException(
              "jq_expr: value-position map(...) needs '.' bound by an enclosing map"))
            val et = elementTypeV(df, _ => pickElem(cur), "map")
            transform(pickElem(cur), x =>
              elemBinding.withValue(Some(Bound(x, lit(null).cast(et), et)))(inner(df)))
          }
        case '$' =>
          next()
          val name = parseIdent()
          // HOF/def/reduce bindings (dynamic channel) shadow stage-level
          // `E as $x` bindings (hidden `__var_x` column); `$ENV` falls back
          // to the plan-time environment snapshot (jq's predefined binding,
          // shadowable like any other) — jq's inner-scope precedence
          val base: V = df => varBindings.value.get(name).map(pick).getOrElse {
            if (df.columns.contains(s"__var_$name")) col(s"__var_$name")
            else if (name == "ENV") typedLit(envSnapshot)
            else throw new IllegalArgumentException(
              s"jq_expr: unbound variable $$$name (bound: " +
                s"${(varBindings.value.keys ++
                  df.columns.collect { case c if c.startsWith("__var_") =>
                    c.stripPrefix("__var_") }).mkString(", ")})")
          }
          // `$x.path` postfix field access (jq allows it directly on a
          // variable; previously required `$x | .path`)
          if (peek == '.' && i + 1 < s.length &&
              (s.charAt(i + 1).isLetterOrDigit || s.charAt(i + 1) == '_')) {
            val parts = parsePathParts()
            df => walkPath(dtOfV(df, base), base(df), parts.toList)
          } else base
        case 'r' if s.startsWith("range", i) && !s.startsWith("range_", i) && {
          val save = i; i += 5; skipWs()
          val ok = peek == '('
          if (!ok) i = save
          ok
        } =>
          // range(n) / range(from; to[; step]) — jq's integer-stream
          // generator (INTEGER ranges; jq's fractional steps are out of
          // scope, documented). A stream is an array here: collect with
          // [range(…)] (the stream-tail unwrap) — `sequence` is
          // inclusive-both-ends, so the exclusive upper bound shifts by
          // one step-sign; an exhausted range is [] like jq's empty
          // stream. The step must be an integer literal (its SIGN picks
          // the direction statically).
          next() // '('
          val a1 = parseValue()
          skipWs()
          val a2: Option[V] =
            if (peek == ';') { next(); val v = parseValue(); skipWs(); Some(v) }
            else None
          // the step, when present: an integer literal keeps the round-9
          // plan-time nonzero check; round 11 also accepts any COMPUTED
          // integer expression — direction then branches at RUNTIME on
          // the step's sign (both `when` arms guard their `sequence`, so
          // the mismatched-direction arm never evaluates). A runtime step
          // of 0 yields the EMPTY stream — documented divergence: jq's
          // answer is an infinite stream, which no finite engine can
          // represent, and empty is the one defensible projection.
          val stepLit: Option[Long] =
            if (peek != ';') Some(1L)
            else {
              val save = i
              next(); skipWs()
              val sb = new StringBuilder
              if (peek == '-') sb.append(next())
              while (i < s.length && s.charAt(i).isDigit) sb.append(next())
              skipWs()
              if (sb.nonEmpty && sb.toString != "-" && peek == ')') {
                require(sb.toString.toLong != 0,
                  "jq_expr: range step must be a nonzero integer literal")
                Some(sb.toString.toLong)
              } else { i = save; None }
            }
          val stepDyn: Option[V] =
            if (stepLit.isDefined) None
            else { next(); val v2 = parseValue(); skipWs(); Some(v2) }
          expect(')')
          val (fromV, toV): (V, V) = a2 match {
            case None => ((_ => lit(0L)), a1)
            case Some(t) => (a1, t)
          }
          streamTail = true
          df => {
            val f = fromV(df).cast("long")
            val t = toV(df).cast("long")
            val empty = array().cast("array<bigint>")
            stepLit match {
              case Some(step) if step > 0 =>
                when(f < t, sequence(f, t - lit(1L), lit(step))).otherwise(empty)
              case Some(step) =>
                when(f > t, sequence(f, t + lit(1L), lit(step))).otherwise(empty)
              case None =>
                val st = stepDyn.get(df).cast("long")
                when(st > lit(0L) && f < t, sequence(f, t - lit(1L), st))
                  .when(st < lit(0L) && f > t, sequence(f, t + lit(1L), st))
                  .otherwise(empty)
            }
          }
        case 'p' if s.startsWith("pow", i) && {
          val save = i; i += 3; skipWs()
          val ok = peek == '('
          if (!ok) i = save
          ok
        } =>
          // jq pow(x; y) — input-ignoring two-arg math builtin
          next()
          val a = parseValue(); expect(';')
          val b = parseValue(); expect(')')
          df => pow(a(df), b(df))
        case 'w' if s.startsWith("while", i) && !defs.contains("while") && {
          val save = i; i += 5; skipWs()
          val ok = peek == '('
          if (!ok) i = save
          ok
        } =>
          // while(cond; update): jq's stream — emit '.' and iterate
          // update while cond holds, stopping at the first false. A
          // stream is an array here (collect with [while(…)], explode as
          // a record-level field). Static unroll to the recursion cap:
          // term i+1 = update(term i) with '.' bound per term, keep-flags
          // are the cumulative conjunction of conds, and a row whose
          // cond still holds past the cap raises loudly — never a silent
          // truncation. update must be type-stable, as with recursive
          // defs. A user `def while` shadows this (jq's rule, the guard
          // above).
          next() // '('
          val cond = parseValue()
          skipWs(); expect(';')
          val upd = parseValue()
          skipWs(); expect(')')
          streamTail = true
          df => {
            val inV: V = bareDotV
            val dt = dtOfV(df, inV)
            val probe = lit(null).cast(dt)
            def bind(x: Column, f: V): Column =
              elemBinding.withValue(Some(Bound(x, probe, dt)))(f(df))
            val cdt = probeMode.withValue(true)(dtOf(df,
              elemBinding.withValue(Some(Bound(probe, probe, dt)))(cond(df))))
            def truthy(c: Column): Column = cdt match {
              case BooleanType => coalesce(c, lit(false)) === lit(true)
              case _ => c.isNotNull
            }
            val capN = 12
            var t: Column = inV(df)
            var alive: Column = truthy(bind(t, cond))
            val parts = Seq.newBuilder[Column]
            var k = 0
            while (k < capN) {
              parts += struct(alive.as("k"), t.as("v"))
              t = bind(t, upd)
              alive = alive && truthy(bind(t, cond))
              k += 1
            }
            val collected = transform(
              filter(array(parts.result(): _*), e => e.getField("k")),
              e => e.getField("v"))
            when(alive, raise_error(lit(
              s"jq_expr: while(cond; update) exceeded the static unroll " +
                s"depth $capN on this row's data")).cast(ArrayType(dt)))
              .otherwise(collected)
          }
        case 'l' if s.startsWith("label", i) && boundary(i + 5) =>
          parseLabel()
        case 'b' if s.startsWith("break", i) && boundary(i + 5) =>
          throw new IllegalArgumentException(
            "jq_expr: `break $out` is supported only as the label body's " +
              "tail stage — `label $x | S | ., break $x` (first output) or " +
              "`label $x | S | if C then break $x else . end` (and the " +
              "then/else swap; stream truncation); a break anywhere else " +
              "has no columnar analog")
        case 'l' if s.startsWith("limit", i) && {
          val save = i; i += 5; skipWs()
          val ok = peek == '('
          if (!ok) i = save
          ok
        } =>
          // limit(n; A): the first n outputs of A's stream — A is
          // array-valued here (a collected stream / array expression),
          // so limit is a slice. Negative/zero n yields [] like jq 1.7.
          next()
          val n = parseValue(); expect(';')
          val arr = parseValue(); expect(')')
          streamTail = true
          df => {
            elementTypeV(df, arr, "limit")
            val nn = n(df).cast("int")
            when(nn > lit(0), slice(arr(df), lit(1), nn))
              .otherwise(array().cast(dtOfV(df, arr)))
          }
        case 'i' if s.startsWith("infinite", i) && boundary(i + 8) =>
          i += 8; _ => lit(Double.PositiveInfinity)
        case 'n' if s.startsWith("nan", i) && boundary(i + 3) =>
          i += 3; _ => lit(Double.NaN)
        case 'r' if s.startsWith("reduce", i) && boundary(i + 6) =>
          // reduce .path[] as $x (init; update) — a single codegen'd
          // `aggregate` HOF; inside update, '.' is the ACCUMULATOR and $x
          // the element (jq semantics). The init literal's type drives the
          // accumulator type (integer literals parse as long here, so the
          // common `0` init folds long arrays without a cast).
          i += 6; skipWs()
          val parts = parsePathParts()
          if (!tryConsume("[]"))
            throw new IllegalArgumentException(
              s"jq_expr: reduce source must be a '.path[]' iterator in: $s")
          skipWs(); expectKeyword("as"); skipWs()
          expect('$')
          val name = parseIdent()
          skipWs(); expect('(')
          val init = parseValue()
          expect(';')
          val update = parseValue()
          expect(')')
          df => {
            val arrV: V = d => elemBinding.value match {
              case Some(el) => parts.foldLeft(pickElem(el))((c, f) => c.getField(f))
              case None => pathColumn(d, parts)
            }
            val et = elementTypeV(df, arrV, "reduce")
            val accType = dtOfV(df, init)
            aggregate(arrV(df), init(df), (acc, x) =>
              elemBinding.withValue(Some(Bound(acc, lit(null).cast(accType), accType))) {
                varBindings.withValue(
                  varBindings.value + (name -> Bound(x, lit(null).cast(et))))(update(df))
              })
          }
        case 'i' if s.startsWith("if", i) && boundary(i + 2) =>
          // if C then A [elif C2 then B]* [else E] end — one codegen'd
          // when-chain; conditions use jq truthiness (only null/false are
          // falsy). jq's else-less form emits '.' (the current value) on
          // the false path — defined here wherever bare '.' is (inside
          // map(...), where it is the element); branches must share a
          // Spark type.
          i += 2
          // per-branch static-analysis gate, decided at PARSE time from
          // the condition's source: the type-dispatch idiom always names
          // `type` (or is a bare literal condition) — everything else
          // (e.g. a recursive def's `$n <= 1`, applied 2^depth times
          // across an unroll) skips the Catalyst-analysis-costing static
          // decision entirely
          def analyzable(src: String): Boolean = {
            val t = src.trim
            t == "true" || t == "false" || t == "null" ||
              "(?<![A-Za-z0-9_.$])type(?![A-Za-z0-9_])".r.findFirstIn(t).isDefined
          }
          val branches = Seq.newBuilder[(V, V, Boolean)]
          val s0 = i
          val c0 = parseValue()
          val c0Gate = analyzable(s.substring(s0, i))
          skipWs(); expectKeyword("then")
          branches += ((c0, parseValue(), c0Gate))
          skipWs()
          while (s.startsWith("elif", i) && boundary(i + 4)) {
            i += 4
            val sN = i
            val c = parseValue()
            val cGate = analyzable(s.substring(sN, i))
            skipWs(); expectKeyword("then")
            branches += ((c, parseValue(), cGate))
            skipWs()
          }
          val elseV: V =
            if (s.startsWith("else", i) && boundary(i + 4)) {
              i += 4
              parseValue()
            } else
              _ => elemBinding.value.map(pickElem).getOrElse(
                throw new IllegalArgumentException(
                  "jq_expr: else-less 'if' emits '.', which is only defined " +
                    "inside map(...) — add an explicit else at top level"))
          skipWs(); expectKeyword("end")
          val bs = branches.result()
          // STATIC BRANCH PRUNING (round 8): a condition that Catalyst
          // folds to a constant (e.g. `type == "object"` over a
          // schema-static value) decides its branch at plan time — a
          // statically-false branch is dropped WITHOUT compiling its
          // value, and a statically-true one terminates the chain. That
          // is what makes jq's type-dispatch idiom (`walk(if type ==
          // "string" then … else . end)`) compile under static schemas:
          // the non-matching branches never have to type-unify with the
          // matching one. Inside HOF lambdas (where the real column
          // cannot be analyzed) the decision retries under
          // [[elemDummyMode]] — sound for type-level facts only, and a
          // documented hair: a runtime-null element dispatches by its
          // SCHEMA type there, where jq would report "null".
          df => {
            def truthy(cond: V): Column = dtOfV(df, cond) match {
              case BooleanType => coalesce(cond(df), lit(false)) === lit(true)
              case _ => cond(df).isNotNull
            }
            lazy val shell = df.sparkSession.createDataFrame(
              df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              df.schema)
            def optFold(c: Column): Option[Boolean] = {
              import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
              import org.apache.spark.sql.catalyst.plans.logical.Project
              shell.select(c.as("__c")).queryExecution.optimizedPlan match {
                case p: Project => p.projectList.head match {
                  case a: Alias => a.child match {
                    case Literal(v, _) =>
                      Some(v != null && v != false)
                    case _ => None
                  }
                  case _ => None
                }
                case _ => None
              }
            }
            def dummyFold(cond: V): Option[Boolean] =
              try elemDummyMode.withValue(true)(optFold(cond(df)))
              catch { case scala.util.control.NonFatal(_) => None }
            def staticTruth(cond: V): Option[Boolean] = {
              // inside walk/map_values the dummy analysis goes FIRST
              // (per-node dispatch-by-schema-type, see [[dummyFirstMode]])
              if (dummyFirstMode.value) {
                val d = dummyFold(cond)
                if (d.isDefined) return d
              }
              // as-is (sound, keeps jq's null semantics when the
              // scrutinee is a real column); on an ANALYSIS failure only
              // (lambda-variable context), retry under the dummy binding
              val asIs = try Right(optFold(cond(df)))
                         catch { case scala.util.control.NonFatal(_) => Left(()) }
              asIs match {
                case Right(r) => r
                case Left(_) => dummyFold(cond)
              }
            }
            val kept = Seq.newBuilder[(V, V)]
            var terminal: Option[V] = None
            val it = bs.iterator
            while (terminal.isEmpty && it.hasNext) {
              val b = it.next()
              (if (b._3) staticTruth(b._1) else None) match {
                case Some(false) => // statically dead branch — drop
                case Some(true) => terminal = Some(b._2)
                case None => kept += ((b._1, b._2))
              }
            }
            val rem = kept.result()
            val tailV = terminal.getOrElse(elseV)
            if (rem.isEmpty) tailV(df)
            else rem.tail
              .foldLeft(when(truthy(rem.head._1), rem.head._2(df)))(
                (w, b) => w.when(truthy(b._1), b._2(df)))
              .otherwise(tailV(df))
          }
        case 't' if s.startsWith("try", i) && boundary(i + 3) =>
          // try E [catch H] — jq suppresses ERRORS from E and emits
          // nothing (or H's value, with the error message bound to `.`).
          // Two error classes here: (a) PLAN-construction-time (type
          // mismatches, unsupported shapes, analyzer failures probing the
          // actual schema) resolve statically — on failure the whole
          // expression folds to H (default: jq-null, the skip-on-error
          // analog of the empty stream); (b) DATA-DEPENDENT runtime
          // failures of the failable kernels (tonumber/fromjson on
          // garbage strings, runtime zero divisors) ride the
          // runtimeErrs channel — the body lowers to a per-row
          // conditional routing error rows to H/null (handler and body
          // must share a Spark type; cast one side if they differ).
          // E extends through value pipes/arithmetic (broader
          // than gojq's postterm binding — parenthesize to disambiguate).
          i += 3
          // DELTA CAPTURE of the runtime error channel: conditions
          // registered while parsing the body belong to THIS try (nested
          // tries already consumed theirs); conditions the catch handler
          // registers propagate outward, like jq's error-in-catch
          val beforeLen = runtimeErrs.length
          val body = parsePiped()
          val bodyErrs = runtimeErrs.take(runtimeErrs.length - beforeLen).reverse
          runtimeErrs = runtimeErrs.drop(runtimeErrs.length - beforeLen)
          skipWs()
          val handler: Option[V] =
            if (s.startsWith("catch", i) && boundary(i + 5)) {
              i += 5
              Some(parsePiped())
            } else None
          df => {
            try {
              dtOfV(df, body) // force schema resolution, not just parse
              if (bodyErrs.isEmpty) body(df)
              else {
                // RUNTIME branch (round 8): the body compiles, but one of
                // its kernels can fail data-dependently — lower to a
                // conditional: error rows take the handler (with `.` bound
                // to the message, first-failing-kernel order) or jq-null
                val anyErr = coalesce(
                  bodyErrs.map(_._1(df)).reduce(_ || _), lit(false))
                handler match {
                  case Some(h) =>
                    val msg = bodyErrs.tail
                      .foldLeft(when(bodyErrs.head._1(df), bodyErrs.head._2(df))) {
                        case (w, (c, m)) => w.when(c(df), m(df))
                      }.otherwise(lit(null))
                    val hV: V = d => elemBinding.withValue(
                      Some(Bound(msg, lit(null).cast(StringType), StringType)))(h(d))
                    try {
                      // jq's outputs are heterogeneous per row; a static
                      // column is not. A string handler beside a numeric
                      // body (`catch .` around arithmetic) unifies to
                      // STRING explicitly — ANSI's implicit coercion would
                      // pick the numeric type and die casting the message.
                      val (bt, ht) = (dtOfV(df, body), dtOfV(df, hV))
                      val stringify = bt != ht &&
                        (bt == StringType || ht == StringType) &&
                        bt != NullType && ht != NullType
                      if (stringify)
                        when(anyErr, hV(df).cast("string"))
                          .otherwise(body(df).cast("string"))
                      else when(anyErr, hV(df)).otherwise(body(df))
                    } catch { case scala.util.control.NonFatal(e) =>
                      // the HANDLER itself fails to compile against the
                      // message (e.g. `catch .id` indexes a string) — jq
                      // only evaluates the handler on error rows, so
                      // non-error rows must pass through untouched and
                      // only error rows raise, loudly
                      when(anyErr, raise_error(lit(
                        "jq_expr: catch handler failed: " +
                          String.valueOf(e.getMessage).take(200)))
                        .cast(dtOfV(df, body)))
                        .otherwise(body(df))
                    }
                  case None => when(anyErr, lit(null)).otherwise(body(df))
                }
              }
            } catch {
              case scala.util.control.NonFatal(e) =>
                handler match {
                  case Some(h) =>
                    val msg = lit(String.valueOf(e.getMessage))
                    elemBinding.withValue(Some(Bound(msg, msg, StringType)))(h(df))
                  case None => lit(null)
                }
            }
          }
        case 't' if s.startsWith("true", i) && boundary(i + 4) => i += 4; _ => lit(true)
        case 'f' if s.startsWith("foreach", i) && boundary(i + 7) =>
          throw new IllegalArgumentException(
            "jq_expr: foreach in value position emits a stream — use the " +
              "collect form [foreach …] or a whole foreach stage")
        case 'f' if s.startsWith("false", i) && boundary(i + 5) => i += 5; _ => lit(false)
        case 'n' if s.startsWith("null", i) && boundary(i + 4) => i += 4; _ => lit(null)
        case c if c.isLetter || c == '_' =>
          // a user `def` call: zero-arg `name` or `name(a1; a2)` — args are
          // value expressions evaluated in the CALLER's context (jq's
          // $-param semantics), bound on the same dynamic channel as
          // `reduce`'s `as $x` for the body's evaluation
          val name = parseIdent()
          if (!defs.contains(name) && name == "env") {
            // jq `env`: the plan-time environment snapshot as an object;
            // `env.VAR` postfix navigates it (map access, null if absent)
            if (peek == '.' && i + 1 < s.length &&
                (s.charAt(i + 1).isLetterOrDigit || s.charAt(i + 1) == '_')) {
              val parts = parsePathParts()
              return _ => walkPath(MapType(StringType, StringType),
                typedLit(envSnapshot), parts.toList)
            }
            return _ => typedLit(envSnapshot)
          }
          if (!defs.contains(name) && RejectedBuiltins.contains(name))
            throw new IllegalArgumentException(RejectedBuiltins(name))
          // bare value-position BUILTINS apply to `.` (jq: `length` ≡
          // `. | length`) — user defs shadow; one-arg builtins take their
          // parenthesized argument
          if (!defs.contains(name) && Funcs.contains(name)) {
            val f = Funcs(name)
            val in = bareDotV
            registerKernelErr(name, in)
            return df => f(df, in)
          }
          if (!defs.contains(name) && FuncsArg.contains(name) && {
            skipWs(); peek == '('
          }) {
            next()
            val arg = parseValue()
            expect(')')
            val f = FuncsArg(name)
            return df => f(df, bareDotV, arg)
          }
          val d = defs.getOrElse(name, throw new IllegalArgumentException(
            s"jq_expr: unknown function '$name' in value position" +
              (if (defs.isEmpty) " (no defs declared)"
               else s" (defined: ${defs.keys.toSeq.sorted.mkString(", ")})") +
              "; builtin value functions like tostring/length apply after '|'"))
          skipWs()
          // args carry their SOURCE spans too: filter params substitute
          // by source (macro), value params bind the parsed V
          val args: List[(V, String)] =
            if (peek == '(') {
              next()
              val as = List.newBuilder[(V, String)]
              def one(): Unit = {
                skipWs(); val st = i
                val v = parseValue()
                as += ((v, s.substring(st, i)))
              }
              one()
              skipWs()
              while (peek == ';') { next(); one(); skipWs() }
              expect(')')
              as.result()
            } else Nil
          require(args.length == d.params.length,
            s"jq_expr: $name expects ${d.params.length} arg(s), got ${args.length}")
          val subs = d.filterIdx.map(ix =>
            d.params(ix) -> ("(" + args(ix)._2.trim + ")")).toMap
          val valueParams = d.params.zipWithIndex.collect {
            case (p, ix) if !d.filterIdx(ix) => p -> args(ix)._1
          }
          // recursive defs re-parse their source per CALL SITE with a
          // bumped depth counter (bounded static unroll); past the cap
          // the call is a loud runtime raise_error — rows that never
          // recurse that deep never evaluate it (lazy when-branches).
          // Filter-param defs also re-parse per call site, over the
          // substituted template.
          val bodyV: V =
            if (!d.recursive && d.filterIdx.isEmpty) d.body
            else {
              val dep = depth.getOrElse(name, 0)
              if (d.recursive && dep >= d.unrollCap)
                _ => raise_error(lit(
                  s"jq_expr: recursive def '$name' exceeded the static " +
                    s"unroll depth ${d.unrollCap} on this row's data")).cast("double")
              else {
                val effSrc = substituteFilterParams(d.src, subs)
                val bp = new P(effSrc, defs,
                  if (d.recursive) depth + (name -> (dep + 1)) else depth)
                val b = bp.parseValue()
                bp.skipWs()
                require(!bp.hasMore,
                  s"jq_expr: trailing input after def body: $effSrc")
                b
              }
            }
          df => {
            val bound = valueParams.map { case (p, a) =>
              p -> Bound(a(df), lit(null).cast(dtOfV(df, a)))
            }
            varBindings.withValue(varBindings.value ++ bound)(bodyV(df))
          }
        case c =>
          throw new IllegalArgumentException(s"jq_expr parse error: unexpected '$c' at $i in: $s")
      }
    }
  }
}
