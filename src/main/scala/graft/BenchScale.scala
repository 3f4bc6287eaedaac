package graft
import org.apache.spark.sql.SparkSession

/** Standing 10× scale artifact: runs the most expensive bench queries at
  * sf0.001 / sf0.01 / sf0.1 (10× data per step) and emits per-scale
  * seconds + input rows/sec into `SCALING.json`, so the "would survive a
  * 100× scale-up" claims in SURVEY §2.2 are a checked artifact instead of
  * prose.
  *
  * For every query the growth exponent is measured over the LARGEST scale
  * step (sf0.01 → sf0.1): `e = log(t_hi / t_lo) / log(rows_hi / rows_lo)`.
  * The smallest scale is reported but not asserted on — at sf0.001 fixed
  * overhead (plan/codegen/task dispatch) dominates and would deflate any
  * exponent. For the dedup/ANN assert set, `e < 2` (sub-quadratic) is a
  * hard gate: an accidental all-pairs join or un-capped hot key shows up
  * as e → 2 long before it ooms a cluster. Queries whose sf0.1 time is
  * under 1 s are exempt from the gate (a 0.3 s → 0.6 s move is overhead
  * noise, not a scaling law) but still recorded.
  *
  * Streaming PARITY queries (cXX twins of batch results) stay excluded:
  * their wall time is micro-batch harness startup, not data work, and a
  * flat curve there says nothing. The streaming SKETCH/state faces
  * (e19/e20/d32) are IN as of round 12 (VERDICT r11 item 5): for them
  * the flat curve IS the claim — state per window is O(1/ε)/O(capacity)/
  * O(mBits) regardless of key volume, so wall time must stay harness-
  * bound as data grows 100×; un-evicted or per-key state would bend the
  * curve toward the data and trip the same e < 2 gate long before it
  * ooms a real cluster.
  */
object BenchScale {
  /** The scale sweep, ascending. */
  val Scales: Seq[String] = Seq("sf0.001", "sf0.01", "sf0.1")

  /** The ~20 most expensive batch queries from the round-6 bench tail. */
  val Queries: Seq[String] = Seq(
    "t38_training_pipeline_v2", "d22_quality_dedup_apply", "s17_ivf_tuning",
    "s16_refine_recall", "t29_training_pipeline", "s09_kmeans_pp",
    "e11_twophase_hitters", "s07_recall_eval", "t36_ccnet_buckets",
    "h23_salted_join", "m06_media_dedup_apply", "d02_minhash_lsh",
    "d03_simhash_pairs", "d04_ngram_jaccard", "d12_containment",
    "t34_nb_confusion", "t25_lm_perplexity", "t32_nb_classifier",
    "e08_gap_quantiles", "m11_gif_neardup", "m12_gif_run_align",
    // round-8 iterative trainers: corpus touched once, then vocab/
    // model-bounded control loops — gated so a lineage or shuffle
    // regression in the loop can't hide behind small fixtures
    "t42_bpe_train", "s20_pq_train",
    // round-9 iterative graph control loops: the corpus-sized work is
    // the edge derivation + distinct; iterations run over hosts-bounded
    // frames, so growth must stay ~linear in documents
    "g01_host_pagerank", "g02_host_hits", "g04_neighborhood_gate",
    // round-9 LSH k-NN graph (bucket-bounded pair work) and the v3
    // pipeline composition (semi-join stages over one corpus)
    "s22_knn_graph", "t46_training_pipeline_v3",
    // round-10 widening: the remaining join/eval queries that recorded
    // exponents without being in the sweep — retrieval eval (truth join),
    // hour-over-hour lag (hours×types window), batch BM25 (terms×docs
    // join with DECIMAL idf)
    "s23_mrr_eval", "e15_count_deltas", "t44_bm25",
    // round-10 operators: repeated-span dedup (digest shuffle + islands
    // window) and degree-oriented triangles (wedge joins). s24 stays OUT:
    // it is the documented O(n²) brute-force oracle twin (s01/d05's
    // exemption class) — its scale path is LSH/IVF over truncated
    // vectors, which the gated s02/s22 queries already cover.
    "d28_repeated_spans", "g05_triangle_counts",
    // round-10 session-2 operators with a join or a loop: LPA's per-round
    // label join, the MAD trailing window over the hourly aggregate, the
    // JL pair-sample join + per-m branches, and the vocab-growth digest
    // shuffle. t47 stays out: a pure per-row segment fold with neither
    // join nor loop; e17 is streaming (excluded by design,
    // harness-startup-bound).
    "g06_label_communities", "e16_mad_anomalies", "s26_random_projection",
    "t48_vocab_growth",
    // round-11 widening (VERDICT r10 item 8): the m-set decode queries —
    // decode-heavy partition-local work is where a batch-size or codec
    // regression hides (none has a join, but a decoder that re-reads or
    // buffers whole partitions shows up as a super-linear curve here
    // before it ooms a real cluster): imageio PNG decode, real NN
    // resize round-trip, WAV decode, WAV resample, autocorrelation
    // pitch, luma histogram
    "m08_imageio_decode", "m13_resize_real", "m09_wav_decode",
    "m15_audio_resample", "m17_audio_pitch", "m18_image_histogram",
    // round-11: the two bounded-broadcast-join queries the round-10 gate
    // comment left undocumented (ADVICE r10) — gated now rather than
    // exempted: assortativity's two degree joins over the edge frame and
    // the langid-confusion doc_id equi-join must stay linear in documents
    "g08_degree_assortativity", "t51_langid_confusion",
    // exact bounded-radius BFS (frontier joins + pair frame) — the one
    // new query whose exact side is deliberately Θ(Σ|ball|)
    "g07_harmonic_centrality",
    // two-level-cumsum range shuffle (the shardPacking machinery)
    "t49_pps_sample",
    // CDC chunking: digest winner shuffle + the paired-body fixture join
    "d30_cdc_chunks",
    // weighted-PageRank control loop over the token co-occurrence graph
    "t50_textrank",
    // k-core synchronous peel (per-round broadcast joins + fixpoint probe)
    "g09_kcore",
    // round-11 iterative/join additions: HyperBall-delta harmonic (per
    // round one hll_union_agg over the host-keyed sketch frame + the
    // exact-side BFS) and the char-gram NB confusion (gram explode +
    // broadcast weight table + doc_id equi-join). e19 — excluded here in
    // round 11 as harness-startup-bound — joined the sweep in round 12
    // with the other streaming STATE faces (below), where the flat curve
    // IS the checked claim; c75 is a shuffle-free jq projection like the
    // rest of the c-set
    "g10_harmonic_gate", "t52_charngram_confusion",
    // graph-ANN beam search: the s22 graph build + per-round beam joins
    "s28_beam_search",
    // round-11 session-2 additions with a join or a loop: edit-verified
    // near-dup (LSH pipeline + candidate text join + per-pair O(len²)
    // levenshtein — candidate-bounded, must stay ~linear in docs), link
    // prediction (wedge join, Σdeg² hosts-bounded), TrustRank (the g01
    // loop with seeded teleport), aHash near-dup (pigeonhole bucket
    // join; group size fixed at 8 so pairs are docs-linear), scene cuts
    // (decode-heavy like the m08 family), range search (broadcast
    // queries × corpus scan — queries grow with corpus/50, so the pair
    // frame is n²/50: the sweep RECORDS its exponent, but note s29 —
    // like g11/e21/m21 — currently finishes under the 1 s sub-threshold
    // floor at sf0.1, so `gated:false` in SCALING.json and the
    // sub-quadratic assertion stays inert until its time crosses 1 s;
    // the exponent row is still the early-warning signal), and CUSUM
    // (windows over the hours×types aggregate). e21's corpus-sized work
    // is one map-side groupBy.
    "d31_edit_verified_pairs", "g11_link_prediction", "g12_trustrank",
    "m20_image_neardup", "m21_scene_changes", "s29_range_search",
    "e21_cusum_drift",
    // s30: the s29 truth + the IVF assignment + the recall join in one
    // query — the heaviest of the range family. e22 stays out
    // (streaming PARITY, harness-startup-bound by design); h25 stays out
    // (a shuffle-free projection + one map-side groupBy, the t47
    // exemption class — no join, no loop).
    "s30_range_recall",
    // round-12 (VERDICT r11 item 5): the streaming STATE faces — bounded-
    // summary state (GK quantile, Misra–Gries, sharded Bloom) must keep
    // wall time harness-bound as data grows; per-key or un-evicted state
    // would bend these curves toward the data volume
    "e19_stream_quantile_sketch", "e20_stream_hitter_sketch",
    "d32_stream_bloom_seen",
    // e23: the analytic session face — session-window state is bounded by
    // LIVE (unclosed) sessions, and closed rows leave the store on emit;
    // per-user history retained in state would bend this curve
    "e23_stream_sessions",
    // round-12 operators: the beam recall sweep (graph build + 3 searches
    // + truth joins), the unigram-LM EM round (word histogram + DP
    // over the distinct vocabulary — must stay ~linear in documents),
    // hard-negative mining (broadcast-anchor corpus scan + two
    // aggregates), and the effective-diameter curve (per-round frontier
    // joins + hll_union_agg — the exact pair frame is the deliberate
    // Θ(Σ|ball|) side, the g07 exemption class, still recorded)
    "s31_beam_recall", "t53_unigram_lm", "s32_hard_negatives",
    "g13_effective_diameter",
    // g14: Brandes-shape stress centrality — sources×m frontier/DAG
    // frames over the saturated 97-host graph; growth must track the
    // docs-linear edge-derivation scan, not balloon with corpus size
    "g14_stress_centrality",
    // e24/e25: count–min sketch counters — output and state are
    // (windows × depth × width)-bounded regardless of key cardinality
    // (the sketch's point); growth must track the events scan only, in
    // BOTH topologies (e25 is the fifth streaming state face)
    "e24_cms_hitter_gate", "e25_stream_cms_counters", "e26_twophase_cms",
    // g15: the g06 LPA loop + two label joins + the modularity
    // aggregation; t54: the t25 transition-frame family with the KN
    // type-count joins — both must stay ~linear in documents
    "g15_modularity", "t54_kneser_ney",
    // m22: decode + two per-doc island windows (the m08 decode class);
    // d33: the digest distinct + exact-intersection equi-join + the
    // slices-bounded sketch cross — the exact side must stay ~linear in
    // documents. t55 stays out: one projection + a strata-partitioned
    // row_number, the t47 shuffle-free exemption class.
    "m22_audio_vad", "d33_sketch_overlap",
    // t56: the v4 pipeline capstone (dedup digests + the full KN chain +
    // the stratum window) — like t29/t38/t46, the composition must stay
    // ~linear in documents
    "t56_training_pipeline_v4",
    // g16: the g05 wedge pass + a degree join — same gate rationale
    "g16_local_clustering")

  /** The scale-claim gate: every dedup and ANN query in the sweep, plus
    * the multimodal animation pair queries (m11/m12) — candidate-bounded
    * by construction (fixed group size 10), so frame-corpus growth must
    * stay linear; gating them means a fixture or grouping change can't
    * silently reintroduce a quadratic pair blow-up (round-7's m12
    * "regression" adjudicated to fixture-encode cost, not plan shape —
    * this keeps that claim checked).
    */
  def assertSet: Seq[String] =
    // Round-10 widening (VERDICT r9 item 5): every swept query with a
    // join or an iterative loop is gated — which is the whole sweep; the
    // exemption that keeps noise out of the gate is the sub-1s rule in
    // the per-query `gated` computation, not membership here.
    Queries

  /** The table whose row count is the query's input size (rows/sec
    * denominator): d/t/m-queries scan documents, s-queries embeddings,
    * e/c-queries events, h-queries lineitem.
    */
  def drivingTable(q: String): String = q.head match {
    case 'd' | 't' | 'm' | 'g' => "documents"
    case 's'             => "embeddings"
    case 'h'             => "lineitem"
    case _               => "events"
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_BASE", "/root/testdata")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val tmp = new java.io.File(
      sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark")
        .split(',').head.trim + "/tmp")
    if (tmp.isDirectory || tmp.mkdirs())
      System.setProperty("java.io.tmpdir", tmp.getAbsolutePath)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows: Map[String, Map[String, Long]] = Scales.map { sf =>
      sf -> Seq("documents", "embeddings", "events", "lineitem").map { t =>
        t -> spark.read.parquet(s"$base/$sf/$t.parquet").count()
      }.toMap
    }.toMap

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // A failed run returns NaN, not its time-to-exception: a near-zero
    // "elapsed" would otherwise feed min-of-two and the growth exponent,
    // polluting the per-query stats even though the n_failed gate already
    // fails the run. NaN propagates to `null` cells in SCALING.json.
    def timed(name: String, sf: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, s"$base/$sf").write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[scale] $name@$sf: $e")
        errors.getOrElseUpdate(s"$name@$sf", e.toString.take(200))
        Double.NaN
      }
    }

    // same steady-state discipline as Bench: untimed warm run, then the
    // min of two timed runs (host noise is one-sided additive)
    val times: Map[String, Map[String, Double]] = Queries.map { q =>
      q -> Scales.map { sf =>
        timed(q, sf) // warm
        val dt = math.min(timed(q, sf), timed(q, sf))
        System.err.println(f"[scale] $q%-26s $sf%-8s $dt%7.2fs")
        sf -> dt
      }.toMap
    }.toMap

    val lo = Scales(Scales.size - 2); val hi = Scales.last
    // NaN (failed run) renders as JSON null — `f"%.4f"` would print the
    // literal NaN, which json.load rejects
    def fmt(d: Double): String = if (d.isNaN) "null" else f"$d%.4f"
    val perQuery = Queries.map { q =>
      val t = times(q)
      val tbl = drivingTable(q)
      val rLo = rows(lo)(tbl).toDouble; val rHi = rows(hi)(tbl).toDouble
      val exponent = math.log(t(hi) / t(lo)) / math.log(rHi / rLo)
      val gated = assertSet.contains(q) && t(hi) >= 1.0
      val sub = exponent < 2.0
      val secJson = Scales.map(sf => s""""$sf":${fmt(t(sf))}""").mkString("{", ",", "}")
      val rpsJson = Scales.map(sf =>
        s""""$sf":${if (t(sf).isNaN) "null"
          else math.round(rows(sf)(tbl) / math.max(t(sf), 1e-9)).toString}""")
        .mkString("{", ",", "}")
      (q, s""""$q":{"table":"$tbl","sec":$secJson,"rows_per_sec":$rpsJson,""" +
        s""""growth_exponent":${fmt(exponent)},"gated":$gated,"subquadratic":$sub}""",
        gated && !sub)
    }
    val failedGate = perQuery.collect { case (q, _, true) => q }
    val json =
      s"""{"scales":[${Scales.map("\"" + _ + "\"").mkString(",")}],
         |"rows":${Scales.map(sf => s""""$sf":{${rows(sf).toSeq.sorted.map { case (t, n) => s""""$t":$n""" }.mkString(",")}}""").mkString("{", ",", "}")},
         |"queries":{${perQuery.map(_._2).mkString(",\n")}},
         |"assert_set":[${assertSet.map("\"" + _ + "\"").mkString(",")}],
         |"assert_pass":${failedGate.isEmpty},
         |"failed_gate":[${failedGate.map("\"" + _ + "\"").mkString(",")}],
         |"n_failed":${errors.size},
         |"errors":{${errors.map { case (k, v) => s""""$k":"${v.replace("\"", "'")}"""" }.mkString(",")}},
         |"cpus":$cpus}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALING.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
    if (failedGate.nonEmpty || errors.nonEmpty) sys.exit(1)
  }
}
