package graft

import org.apache.spark.sql.functions._

import graft.config.VersionConstraint
import graft.operators.Intermediate

/** Differential test: the Catalyst `Column` compilation of the
  * `required_version` gate ([[Intermediate.versionCheck]]) must agree with
  * the driver-side [[VersionConstraint.check]] (throw ⇒ false, mirroring the
  * reference's warn-and-skip at `/root/reference/counter.go:366-368`) on
  * every (constraint, version) pair.
  */
class VersionCheckSpec extends SparkTestBase {

  private val constraints = Seq(
    ">=0.1.0", ">0.1.0", "<=0.1.0", "<0.1.0", "=0.1.0", "!=0.1.0",
    "~>0.1.0", "~>0.1", "~>1.2", ">=0.1, <2.0", ">= 0.3.1", "1.2.3")

  private val versions = Seq(
    "0.1.0", "0.1.1", "0.0.9", "0.2.0", "1.0.0", "1.2.3", "1.2.4", "1.3.0",
    "2.0.0", "0.1", "1", "10.0.0", "0.1.0-beta", "0.1.0+build.7",
    "1.2.3.4", "1.2.3.x", "abc", "1.x", "x.2", "1..2", "", "0.10.0",
    // trailing dots (Java split drops trailing empties — version parses),
    // whitespace (toIntOption rejects what Spark's cast would trim),
    // overflow (toIntOption rejects), dots-only (Java split yields an
    // EMPTY array — parses as 0.0.0)
    "1.2.", "1.2..", " 1.0.0", "1. 2.3", "0.1.0 ", "99999999999.0.0",
    ".", "..", ".1")

  private def oracle(c: String, v: String): Boolean = {
    val vc = VersionConstraint(c)
    try vc.check(v) catch { case _: IllegalArgumentException => false }
  }

  test("Column version gate ≡ VersionConstraint.check over the cross product") {
    import spark.implicits._
    val df = versions.toDF("v")
    for (c <- constraints) {
      val vc = VersionConstraint(c)
      val got = df
        .select(col("v"), coalesce(Intermediate.versionCheck(vc, col("v")), lit(false)).as("ok"))
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      for (v <- versions) {
        assert(got(v) == oracle(c, v),
          s"constraint '$c' version '$v': column=${got(v)} oracle=${oracle(c, v)}")
      }
    }
  }

  test("null version never qualifies") {
    import spark.implicits._
    val vc = VersionConstraint(">=0.0.0")
    val df = Seq(Option.empty[String]).toDF("v")
    val out = df.select(coalesce(Intermediate.versionCheck(vc, col("v")), lit(false))).head.getBoolean(0)
    assert(!out)
  }
}
