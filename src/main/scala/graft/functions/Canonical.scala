package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, IntegerType, LongType, ShortType}

import graft.config.CounterDef

/** Canonical JSON encoding of a single value, for distinct-counting parity
  * with the reference, which hashes `json.Marshal(value)` of the target
  * value before feeding HLL (`/root/reference/counter.go:314-319`) — so
  * `1` (number) and `"1"` (string) are distinct, exactly as there.
  *
  * Implementation trick: `to_json(struct(v))` produces `{"v":<json>}` with
  * full JSON string escaping; stripping the fixed wrapper leaves the
  * canonical value bytes. Divergence note: typed DOUBLE values render
  * Java-style (`1.0`) where Go's float64 marshal renders shortest (`1`);
  * within one engine the encoding is stable, which is all distinctness
  * needs.
  */
object Canonical {

  /** Canonical JSON byte form of a value column. NULL stays NULL (to_json
    * drops null struct fields, which would otherwise collapse NULL to the
    * empty string and make it a countable distinct value — the reference
    * skips nil before hashing, `counter.go:310-312`).
    */
  def canonicalJson(c: Column): Column = {
    val j = to_json(struct(c.as("v")))
    // drop leading `{"v":` (5 chars) and trailing `}` (1 char)
    when(c.isNotNull, j.substr(lit(6), length(j) - 6))
  }

  /** Type-directed [[canonicalJson]]: integral and boolean values render in
    * JSON exactly as their string cast, so those skip `to_json` — which is a
    * `CodegenFallback` expression that would otherwise knock the whole
    * projection out of whole-stage codegen (measured several× slower on the
    * hash-canonicalize-aggregate path). Strings/doubles/nested keep the
    * general (escaping-correct) route.
    */
  def canonicalJsonTyped(dt: DataType, c: Column): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType =>
      c.cast("string")
    case _ => canonicalJson(c)
  }

  /** Keyed 64-bit canonical-value hash — the reference's SipHash-2-4 over
    * canonical JSON (`counter.go:593-601`), honoring the per-counter
    * `siphash_key_hex` (`config.go:33`). Requires [[graft.GraftExtensions]]
    * to be installed in the session (uses the registered `siphash64`).
    */
  def siphashCanonical(c: Column,
                       keyHex: String = CounterDef.DefaultSipHashKeyHex): Column =
    call_function("siphash64", canonicalJson(c).cast("binary"), lit(keyHex))

  /** [[siphashCanonical]] with the value type known — stays in whole-stage
    * codegen for integral/boolean values (see [[canonicalJsonTyped]]).
    */
  def siphashCanonicalTyped(dt: DataType, c: Column,
                            keyHex: String = CounterDef.DefaultSipHashKeyHex): Column =
    call_function("siphash64", canonicalJsonTyped(dt, c).cast("binary"), lit(keyHex))
}
