package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** The JVM-side hash twin must be bit-identical to the plan-side expression
  * (typed operators like winnow/shingles rely on it for oracle parity).
  */
class PortableHashSpec extends SparkTestBase {
  import spark.implicits._

  test("jvmMd5Long60 ≡ md5Long60 expression") {
    val samples = Seq("", "a", "the quick brown fox", "unicode ✓ ü 中", "a b c",
      "0", "lorem ipsum dolor sit amet") ++ (0 until 50).map(i => s"tok$i x y")
    val fromPlan = samples.toDF("s")
      .select(PortableHash.md5Long60(col("s")).as("h"))
      .as[Long].collect().toSeq
    val fromJvm = samples.map(PortableHash.jvmMd5Long60)
    assert(fromPlan == fromJvm)
  }
}
