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

  private def genValue(r: scala.util.Random, depth: Int): String =
    r.nextInt(12) match {
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
      case _ => s"(.xs | map(. + ${1 + r.nextInt(5)}))"
    }

  private def genProgram(r: scala.util.Random): String = {
    val nFields = 1 + r.nextInt(3)
    val fields = (0 until nFields)
      .map(i => s"f$i: ${genValue(r, 2)}").mkString(", ")
    val select = if (r.nextInt(3) == 0) s"select(${genBool(r, 1)}) | " else ""
    s"$select{$fields}"
  }

  private def genRow(r: scala.util.Random): String = {
    val xs = Seq.fill(1 + r.nextInt(4))(r.nextInt(20) - 5).mkString(", ")
    s"""{"id": ${r.nextInt(10)}, "n": ${r.nextInt(30) - 10}, "m": ${r.nextInt(7)},""" +
      s""" "s": "${Seq.fill(1 + r.nextInt(5))(('a' + r.nextInt(4)).toChar).mkString}",""" +
      s""" "t": "w${r.nextInt(4)}", "xs": [$xs]}"""
  }

  private def fuzzRun(seed: Long, cases: Int): Unit = {
    assume(jqBin.canExecute, "/usr/bin/jq not present")
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val r = new scala.util.Random(seed)
    var checked = 0
    (0 until cases).foreach { i =>
      val program = genProgram(r)
      val inputs = Seq.fill(3)(genRow(r))
      val df = spark.read.json(inputs.toDS)
      val out = JqTransform(df, program)
      val ours = canon(out.select(to_json(struct(out.columns.map(col).toSeq: _*),
          Map("ignoreNullFields" -> "false")).as("j"))
        .collect().map(_.getString(0)).toSeq).sorted
      val jqs = canon(runUtf8(Seq("/usr/bin/jq", "-c", program),
        inputs.mkString("\n"))).sorted
      assert(ours == jqs,
        s"""fuzz divergence (case $i) for: $program
           |input : ${inputs.mkString(" | ")}
           |spark : ${ours.mkString(" ; ")}
           |jq    : ${jqs.mkString(" ; ")}""".stripMargin)
      checked += 1
    }
    assert(checked == cases)
  }

  test("500 random programs match jq (seed 20260814)") {
    fuzzRun(20260814L, 500)
  }

  test("500 random programs match jq (seed 987654321)") {
    fuzzRun(987654321L, 500)
  }
}
