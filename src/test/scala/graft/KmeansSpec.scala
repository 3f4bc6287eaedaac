package graft

import org.apache.spark.sql.functions._

import graft.similarity.Ann

/** k-means|| seeding + convergence-stop Lloyd ([[Ann.kmeansParallel]] /
  * [[Ann.kmeansConverged]]) — the trained-quantizer path on top of the
  * fixed-iteration engine-exact core that s05/s09 oracle-check.
  */
class KmeansSpec extends SparkTestBase {
  import spark.implicits._

  /** 90 vectors in 3 well-separated clusters (dominant axis 20·c at 10.0,
    * small per-id noise on axes 40..47), ids interleaved so no id-range
    * shortcut can fake cluster recovery.
    */
  private lazy val clustered = {
    val rows = (0L until 90L).map { i =>
      val c = (i % 3).toInt
      val emb = Array.tabulate(64) { j =>
        val base = if (j == c * 20) 10.0f else 0.0f
        val noise = if (j == 40 + (i % 8).toInt) 0.5f + (i % 5) * 0.1f else 0.0f
        base + noise
      }
      (i, emb)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("kmeansConverged stops before maxIterations on a clustered corpus") {
    val (stats, iters) = Ann.kmeansConverged(clustered, k = 3, rounds = 3,
      oversample = 8, maxIterations = 12, tolPpm = 0L)
    val out = stats.cache()
    assert(iters < 12, s"did not converge (ran $iters iterations)")
    assert(iters >= 2, "convergence needs at least two rounds to measure movement")
    val cells = out.select("cell").distinct().as[Long].collect().sorted
    assert(cells.length == 3, s"expected 3 final cells, got ${cells.toSeq}")
    assert(out.agg(sum($"n_vectors")).head.getLong(0) == 3L * 64 * 30,
      "every vector assigned exactly once (90 rows × 64 dims)")
    out.unpersist()
  }

  test("converged centroids recover the true clusters (purity 1, all covered)") {
    val (stats, _) = Ann.kmeansConverged(clustered, k = 3, rounds = 3,
      oversample = 8, maxIterations = 12, tolPpm = 0L)
    val cents = Ann.centroidsFromStats(stats)
    val assigned = Ann.assignCells(Ann.normalize(clustered, "vec_id"), cents)
      .select($"vec_id", $"cell", ($"vec_id" % 3).as("truth"))
    // purity: each cell's members come from ONE true cluster...
    val perCell = assigned.groupBy("cell")
      .agg(countDistinct($"truth").as("k")).as[(Long, Long)].collect()
    assert(perCell.forall(_._2 == 1L),
      s"mixed cell(s): ${perCell.filter(_._2 > 1).toSeq}")
    // ...and all three clusters are covered by some cell
    val covered = assigned.select("truth").distinct().count()
    assert(covered == 3L, s"only $covered of 3 clusters covered")
  }

  test("convergence at tolPpm=0 is a fixed point of the Lloyd update") {
    val (stats, iters) = Ann.kmeansConverged(clustered, k = 3, rounds = 3,
      oversample = 8, maxIterations = 12, tolPpm = 0L)
    // one more fixed-iteration run of the same length reproduces the stats
    // bit for bit (tolPpm=0 ⇒ the last two updates were identical)
    val again = Ann.kmeansParallel(clustered, k = 3, rounds = 3,
      oversample = 8, iterations = iters)
    assert(stats.exceptAll(again).isEmpty && again.exceptAll(stats).isEmpty,
      "converged stats are not a Lloyd fixed point")
  }

  test("kmeansParallel seeds <= k cells and partitions the corpus") {
    val stats = Ann.kmeansParallel(spark.read.parquet(s"$sf0001/embeddings.parquet"))
    val n = stats.groupBy("cell").agg(max("n_vectors").as("nv"))
    val total = n.agg(sum("nv")).head.getLong(0)
    val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(stats.select("cell").distinct().count() <= 20L)
    assert(total == corpus, s"assigned $total of $corpus vectors")
  }

  test("pqTrain: trained codebook cuts quantization error vs the first-rows init") {
    import org.apache.spark.sql.functions._
    // total L2² quantization error of a codebook over the corpus: assign
    // each (vector, subspace) to its nearest entry, sum the distances
    def errorOf(cb: org.apache.spark.sql.DataFrame): Double = {
      val v = clustered.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val sub = v.select(col("vec_id"),
          explode(sequence(lit(0), lit(7))).as("m"), col("v"))
        .select(col("vec_id"), col("m"),
          slice(col("v"), col("m") * 8 + 1, lit(8)).as("sv"))
      sub.join(broadcast(cb), Seq("m"))
        .select(col("vec_id"), col("m"), aggregate(
          zip_with(col("sv"), col("cv"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, x) => a + x).as("d"))
        .groupBy(col("vec_id"), col("m")).agg(min(col("d")).as("d"))
        .agg(sum(col("d"))).head().getDouble(0)
    }
    val init = clustered.where(col("vec_id") < 16)
      .select(col("vec_id").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .select(col("cell"), explode(sequence(lit(0), lit(7))).as("m"), col("v"))
      .select(col("m"), slice(col("v"), col("m") * 8 + 1, lit(8)).as("cv"))
    val trained = Ann.pqTrain(clustered, iterations = 2)
      .select(col("m").cast("int").as("m"), col("cell"), col("dim"),
        (col("mean_ppm").cast("double") / 1e6).as("mm"))
      .groupBy(col("m"), col("cell"))
      .agg(collect_list(struct(col("dim"), col("mm"))).as("dm"))
      .select(col("m"), transform(array_sort(col("dm")),
        s => s.getField("mm")).as("cv"))
    val (e0, e1) = (errorOf(init), errorOf(trained))
    assert(e1 < e0, s"training must not increase quantization error: $e1 vs $e0")
    assert(e1 < e0 * 0.8, s"expected a substantial drop on clustered data: $e1 vs $e0")
  }

  test("ivfTopK and ivfPqTopK accept trained kmeans|| centroids") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = Ann.centroidsFromStats(Ann.kmeansParallel(emb))
    val pred = col("vec_id") % 50 === 0
    val approx = Ann.ivfTopK(emb, pred, centroids = Some(cents))
    val exact = Ann.bruteForceTopK(emb, pred)
    val recall = Ann.recallAtK(exact, approx)
      .agg(avg($"recall_ppm")).head.getDouble(0)
    // trained 20-cell coarse quantizer, nprobe=3: meaningful recall floor
    // (empirical ~0.4+; assert well below to stay robust to fixture drift)
    assert(recall > 200000.0, s"trained-centroid IVF recall too low: $recall ppm")
    val pq = Ann.ivfPqTopK(emb, pred, centroids = Some(cents))
    assert(pq.count() > 0 && pq.columns.toSeq == Seq("query_id", "rank", "neighbor_id"))
  }
}
