package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Training-shard emission — the last step of the data pipeline: write the
  * (deduped, filtered, sampled) corpus as partitioned parquet shards that
  * a training loader can consume deterministically.
  *
  *  - `partitionBy` columns become directory partitions (`lang=en/…`) —
  *    partition pruning for downstream mixture-specific readers;
  *  - `sortCol` orders rows WITHIN each output task
  *    (`sortWithinPartitions` after clustering by the partition columns),
  *    so shard contents are reproducible run-to-run — the same property
  *    deterministic sampling gives the row SET, this gives the layout;
  *  - `maxRecordsPerFile` bounds shard size (training loaders want many
  *    same-sized files, not one giant one) without an extra shuffle.
  */
object Shards {

  def write(df: DataFrame, path: String, partitionBy: Seq[String],
            sortCol: String, maxRecordsPerFile: Int = 100000): Unit =
    df.repartition(partitionBy.map(col): _*)
      .sortWithinPartitions(col(sortCol))
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy(partitionBy: _*)
      .parquet(path)

  /** Post-write manifest: rows and file counts per partition value — the
    * accounting record a data card references. One scan of the written
    * shards (parquet footers give the file names for free).
    */
  def manifest(spark: org.apache.spark.sql.SparkSession, path: String,
               partitionBy: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .withColumn("__file", input_file_name())
      .groupBy(partitionBy.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col("__file")).as("n_files"))
}
