package graft

import java.nio.file.Files

import graft.sinks.Shards

/** Training-shard emission: directory partitioning, bounded shard size,
  * reproducible layout, lossless round-trip.
  */
class ShardsSpec extends SparkTestBase {
  import spark.implicits._

  test("shards partition by lang, respect maxRecordsPerFile, round-trip losslessly") {
    val out = Files.createTempDirectory("graft-shards").toString
    val docs = Tables.documents(spark, sf0001)
    Shards.write(docs, out, partitionBy = Seq("lang"), sortCol = "doc_id",
      maxRecordsPerFile = 50)

    // directory partitions exist per language
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("lang=de", "lang=en", "lang=es", "lang=fr", "lang=zh"))

    // round-trip: same rows (partition column restored from the path)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").as[Long].collect().sorted.toSeq ==
      docs.select("doc_id").as[Long].collect().sorted.toSeq)

    // manifest: per-lang rows match the source; file sizes bounded
    val m = Shards.manifest(spark, out, Seq("lang"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val srcCounts = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(m.view.mapValues(_._1).toMap == srcCounts)
    m.foreach { case (lang, (rows, files)) =>
      assert(files >= (rows + 49) / 50, s"$lang: $rows rows in $files files exceeds 50/file")
    }
  }
}
