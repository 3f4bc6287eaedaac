package graft

import org.apache.spark.sql.functions._

/** Verify.canonicalize — the oracle-compare canonicalization layer that
  * un-blocks struct/array/map-valued queries (round 7's c54 red row).
  * The contract: non-scalar columns become compact JSON strings that are
  * byte-identical to DuckDB's to_json() rendering of the same value.
  */
class VerifyCanonicalizeSpec extends SparkTestBase {

  test("struct column becomes compact JSON, scalar columns pass through") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("v", "s")
      .select($"v", struct(lit("ctr").as("src"), $"v".as("k")).as("tagged"), $"s")
    val out = Verify.canonicalize(df)
    assert(out.schema.fieldNames.toSeq == Seq("v", "tagged", "s"))
    assert(out.schema("tagged").dataType.typeName == "string")
    assert(out.schema("v").dataType.typeName == "long")
    val rows = out.orderBy("v").collect()
    assert(rows(0).getString(1) == """{"src":"ctr","k":1}""")
    assert(rows(1).getString(1) == """{"src":"ctr","k":2}""")
  }

  test("null struct fields are kept (DuckDB parity), arrays stringify") {
    import spark.implicits._
    val df = Seq((1L, Some(2L)), (2L, None)).toDF("v", "opt")
      .select(
        struct($"v".as("a"), $"opt".as("b")).as("st"),
        array($"v", $"v" * 2).as("ar"))
    val rows = Verify.canonicalize(df).orderBy(col("ar")).collect()
    // ignoreNullFields=false: Spark must emit "b":null exactly as DuckDB's
    // to_json(struct_pack(...)) does
    assert(rows(0).getString(0) == """{"a":1,"b":2}""")
    assert(rows(1).getString(0) == """{"a":2,"b":null}""")
    assert(rows(0).getString(1) == "[1,2]")
    assert(rows(1).getString(1) == "[2,4]")
  }

  test("all-scalar frame is unchanged") {
    import spark.implicits._
    val df = Seq((1L, "x", 1.5)).toDF("a", "b", "c")
    val out = Verify.canonicalize(df)
    assert(out.schema == df.schema)
    assert(out.collect().toSeq == df.collect().toSeq)
  }
}
