package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantiles by the HISTOGRAM method, shared by every
  * quantile operator (`TextAnalysis.lengthQuantiles`,
  * `Temporal.gapQuantiles`): the caller aggregates to
  * (group, value, count) — distinct values ≪ rows — and this picks, per
  * group and requested ppm, the value whose cumulative range covers rank
  * `floor((n-1)·p) + 1` (the lower discrete quantile). The sort the
  * cumulative window needs runs over the tiny histogram, never the
  * corpus; at 100 TB the corpus-side work is the caller's one
  * map-side-combined groupBy.
  *
  * Rank arithmetic is exact-integer: `(n-1)·p_ppm` stays in a Long where
  * a double round-trip would lose exactness past 2^53 (n ≈ 9e9 rows per
  * group at p=0.99 — in range for the 100 TB framing); `div` matches
  * DuckDB's truncating `//`.
  */
object Quantiles {

  /** `hist` columns: `groupCol`, `valueCol`, `cntCol` (one row per
    * distinct (group, value)). Output: (groupCol, p_ppm, valueCol).
    */
  def fromHistogram(hist: DataFrame, groupCol: String, valueCol: String,
                    cntCol: String, psPpm: Seq[Long]): DataFrame = {
    val cum = hist
      .withColumn("__cum", sum(col(cntCol)).over(
        Window.partitionBy(col(groupCol)).orderBy(col(valueCol))))
      .withColumn("__n", sum(col(cntCol)).over(Window.partitionBy(col(groupCol))))
    val target = expr("((__n - 1) * p_ppm) div 1000000") + lit(1L)
    cum
      .select(col(groupCol), col(valueCol), col(cntCol), col("__cum"), col("__n"),
        explode(array(psPpm.map(lit): _*)).as("p_ppm"))
      .where(target > col("__cum") - col(cntCol) && target <= col("__cum"))
      .select(col(groupCol), col("p_ppm"), col(valueCol))
  }
}
