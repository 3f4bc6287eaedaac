package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, VecDot}

/** Approximate-nearest-neighbor search over an embedding column
  * (`embeddings(vec_id, embedding: array<float>, label)`).
  *
  * Two paths:
  *
  *  - [[bruteForceTopK]]: the exact baseline. Queries are a small set →
  *    broadcast; each corpus partition scans once computing one dot product
  *    per (query, vector); ranking is a per-query window over k·|queries|
  *    rows. Linear in corpus size, embarrassingly parallel, no shuffle of
  *    the corpus — this is the "exact re-rank" building block.
  *
  *  - [[ivfTopK]]: the 100 TB scale path (IVF — inverted-file index).
  *    Deterministic coarse quantizer: centroid set = rows with
  *    `vec_id % centroidStep == 0` (a k-means fit would drop in here; the
  *    assignment/probe/search topology is identical and what matters for
  *    scale). Every vector is assigned to its nearest centroid (one
  *    broadcast join — the "index build"); a query probes only `nprobe`
  *    cells, so the search join is an equi-join on cell id touching
  *    nprobe/|cells| of the corpus instead of all of it.
  *
  * Cosines are computed in double precision; outputs expose only ids and
  * ranks (floats never cross the oracle-compare boundary).
  */
object Ann {

  /** Double-cast vectors + norms, repartitioned across all cores: the
    * corpus is the stream side of every broadcast join downstream, so its
    * partitioning IS the parallelism of the scan-and-score loop.
    * `private[graft]`: dedup's LSH near-dup reuses the same normed frame
    * instead of re-scanning the corpus.
    */
  private[graft] def normalize(embeddings: DataFrame, idCol: String,
                               extra: Seq[String] = Nil): DataFrame = {
    val base = embeddings.select(
      col(idCol) +: extra.map(col) :+
        transform(col("embedding"), x => x.cast("double")).as("v"): _*)
      // vec_dot(v, v) sums squares in the same left-to-right order as the
      // aggregate-HOF spelling (bit-identical) but stays in codegen
      .withColumn("norm", sqrt(VecDot.dot(col("v"), col("v"))))
    // Underfill handling moved to the LOADER (r12): [[graft.Tables.embeddings]]
    // conditionally spreads the single-file fixture with the shared keyed
    // spread() — the per-call `rdd.getNumPartitions` probe here
    // materialized the physical plan once per normalize call, and the
    // keyless repartition paid SPARK-23207's defensive local sort. Every
    // consumer is order-exact (integer sums, max_by argmax, equi-join
    // candidates), so partitioning never changes results.
    base
  }

  private def dotCol(a: String, b: String): Column = VecDot.dot(col(a), col(b))

  /** Exact top-k by cosine for each query vector. `queryPred` selects the
    * query rows out of the corpus (they are excluded as their own
    * neighbors). Output: (query_id, rank, neighbor_id), rank 1..k ordered
    * by (cosine desc, neighbor_id asc).
    */
  def bruteForceTopK(embeddings: DataFrame, queryPred: Column, k: Int = 5): DataFrame = {
    val corpus = normalize(embeddings, "vec_id")
    val queries = corpus.where(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val cos = (dotCol("qv", "v") / (col("qnorm") * col("norm"))).as("cos")
    val scored = broadcast(queries)
      .join(corpus, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Exact MIPS top-k — maximum INNER-PRODUCT search, the ranking
    * retrieval models actually train for (dual-encoder/DPR scores are
    * dot products; cosine's norm division changes the ranking whenever
    * norms vary). Same broadcast-queries shape as [[bruteForceTopK]],
    * ranking by `vec_dot` alone — left-to-right summation, so the score
    * and its order reproduce bit-for-bit cross-engine. The sub-quadratic
    * path composes like cosine's: MIPS reduces to cosine on the
    * norm-augmented corpus (the Shrivastava–Li ALSH transform), so the
    * IVF/LSH machinery above applies untouched after augmentation.
    * Output: (query_id, rank, neighbor_id), rank by (dot desc, id asc).
    */
  def mipsTopK(embeddings: DataFrame, queryPred: Column, k: Int = 5): DataFrame = {
    val corpus = normalize(embeddings, "vec_id")
    val queries = corpus.where(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__dot").desc, col("neighbor_id").asc)
    broadcast(queries)
      .join(corpus, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        dotCol("qv", "v").as("__dot"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Exact RANGE search — the threshold companion of [[bruteForceTopK]]
    * (FAISS pairs `range_search` with `search` for the same reason):
    * every corpus neighbor whose cosine reaches `tau`, per query. Top-k
    * answers "the k best"; range answers "ALL within a similarity
    * budget" — the retrieval read for contamination sweeps and
    * duplicate-cluster seeding where the neighbor COUNT is the signal,
    * not a fixed k.
    *
    * Same scale shape as [[bruteForceTopK]]: the query side broadcasts
    * into one corpus scan (no shuffle touches the vectors, no window —
    * range search doesn't even need the per-query rank sort). The
    * sub-quadratic path composes exactly like d07's near-dup: sign-LSH
    * buckets or IVF probe cells prefilter candidates, then this same
    * exact-cosine verify runs candidate-bounded.
    *
    * Output: (query_id, neighbor_id), all pairs with cosine ≥ tau.
    */
  def rangeSearch(embeddings: DataFrame, queryPred: Column,
                  tau: Double = 0.35): DataFrame = {
    val corpus = normalize(embeddings, "vec_id")
    val queries = corpus.where(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    broadcast(queries)
      .join(corpus, col("query_id") =!= col("vec_id"))
      .where(dotCol("qv", "v") / (col("qnorm") * col("norm")) >= tau)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
  }

  /** IVF range search — [[rangeSearch]]'s probe-bounded SCALE path: the
    * same exact-cosine ≥ tau verify, but only over vectors in the
    * query's `nprobe` nearest coarse cells (s02's quantizer), so the
    * per-query work is cell-bounded instead of corpus-bounded. Recall
    * < 1 by design (a true neighbor living outside the probed cells is
    * missed — the IVF trade); the emitted set is PROVABLY a subset of
    * [[rangeSearch]]'s (identical verify on fewer candidates), which is
    * what lets [[recallAtK]] gate it. Output: (query_id, neighbor_id).
    */
  def ivfRangeSearch(embeddings: DataFrame, queryPred: Column,
                     tau: Double = 0.35, centroidStep: Long = 25L,
                     nprobe: Int = 3): DataFrame = {
    val corpus = normalize(embeddings, "vec_id")
    val cents = corpus.where(col("vec_id") % centroidStep === 0)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("norm").as("cnorm"))
    val assigned = assignCells(corpus, cents)
    val queries = corpus.where(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val qcos = dotCol("qv", "cv") / (col("qnorm") * col("cnorm"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("cell").asc)
    val probes = broadcast(queries).crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("qnorm"), col("cell"), qcos.as("__cos"))
      .withColumn("__rn", row_number().over(wProbe))
      .where(col("__rn") <= nprobe)
      .drop("__cos", "__rn")
    broadcast(probes)
      .join(assigned, Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .where(dotCol("qv", "v") / (col("qnorm") * col("norm")) >= tau)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
  }

  /** MRR@k evaluation of an approximate index against the exact top-1 —
    * the GRADED companion of [[recallAtK]]'s hit counting (recall says
    * whether the true neighbor made the list; MRR says WHERE — an index
    * that buries it at rank k scores 1/k, not 1): per query, the exact
    * brute-force top-1 is the relevant document, and the approximate
    * (IVF) list contributes `10⁹ div rank` reciprocal-rank points if it
    * surfaces that document, 0 if not. Integer-exact — reciprocal ranks
    * as truncated fixed-point, no float means — so per-query rows
    * hash-compare; the corpus MRR is Σ points / (10⁹ · queries), read
    * off the output by the caller.
    *
    * Scale shape: truth is the [[bruteForceTopK]] k=1 pass (broadcast
    * queries, one corpus scan); the approximate side is [[ivfTopK]]'s
    * probe-restricted search; both are top-k-sized tables, so the
    * scoring join is AQE-sized. Output: (query_id, relevant_id,
    * found_rank — 0 if the index missed, points).
    */
  def mrrEval(embeddings: DataFrame, queryPred: Column, k: Int = 5): DataFrame = {
    val truth = bruteForceTopK(embeddings, queryPred, k = 1)
      .select(col("query_id"), col("neighbor_id").as("relevant_id"))
    val approx = ivfTopK(embeddings, queryPred, k)
      .select(col("query_id").as("__qid"), col("rank"),
        col("neighbor_id").as("__nid"))
    truth
      .join(approx, truth("query_id") === col("__qid") &&
        col("relevant_id") === col("__nid"), "left")
      .select(col("query_id"), col("relevant_id"),
        coalesce(col("rank"), lit(0L)).as("found_rank"),
        coalesce(expr("1000000000L div rank"), lit(0L)).as("points"))
  }

  /** Matryoshka (MRL, Kusupati et al. '22) prefix-dimension retrieval
    * eval — the dimension-vs-recall trade a production vector store tunes
    * when it truncates MRL-trained embeddings for cheap first-stage
    * retrieval: for each prefix length m, rank by cosine over the FIRST m
    * dimensions only and count how much of the full-dimension exact top-k
    * survives. Output one row per prefix: (prefix_dim, n_truth, n_hits,
    * recall_ppm) — integer counts and truncated-ppm recall, hash-exact.
    *
    * Scale shape: each prefix pass is a [[bruteForceTopK]] over a
    * narrower projection (broadcast queries × one corpus scan — the
    * documented exact-oracle twin; the production path would LSH/IVF the
    * truncated vectors with the existing machinery); the truth table is
    * k×queries-bounded and `localCheckpoint`ed once so the per-prefix
    * scoring joins reuse it instead of recomputing the full-dim pass.
    */
  def matryoshkaRecall(embeddings: DataFrame, queryPred: Column,
                       k: Int = 5,
                       prefixes: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    val truth = bruteForceTopK(embeddings, queryPred, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    prefixes.map { m =>
      val trunc = embeddings.select(col("vec_id"),
        slice(col("embedding"), 1, m).as("embedding"))
      val approx = bruteForceTopK(trunc, queryPred, k)
        .select(col("query_id").as("__q"), col("neighbor_id").as("__n"))
      truth
        .join(approx, col("query_id") === col("__q") &&
          col("neighbor_id") === col("__n"), "left")
        .agg(count(lit(1)).as("n_truth"),
          sum(when(col("__q").isNotNull, 1L).otherwise(0L)).as("n_hits"))
        .select(lit(m.toLong).as("prefix_dim"), col("n_truth"),
          col("n_hits"),
          expr("n_hits * 1000000 div n_truth").as("recall_ppm"))
    }.reduce(_ unionAll _)
  }

  /** BINARY (1-bit) quantization retrieval eval — the most aggressive
    * standard compression tier beside SQ8 (s13) and PQ (s20/s21): each
    * dimension keeps only its SIGN, so a 64-dim float vector becomes ONE
    * long (256 bytes → 8, a 32× memory cut), and candidate search ranks
    * by Hamming distance — `bit_count(a XOR b)`, pure codegen'd integer
    * arithmetic, the reason binary quantization is the hot first stage in
    * production vector stores. Two rows per run, the standard trade:
    *  - `bq`: top-k directly by (hamming asc, id) — cheapest, lossiest;
    *  - `bq_rerank`: a 4k Hamming SHORTLIST re-ranked by exact cosine on
    *    the full vectors — the shortlist-then-rerank topology, recall
    *    recovered at 4k full-precision reads per query.
    * Both measured as recall of the full-precision exact top-k
    * ((method, n_truth, n_hits, recall_ppm) — integer counts, hash-exact).
    *
    * Scale shape: sign packing is a 64-term codegen'd projection at the
    * scan; queries broadcast (the exact-oracle brute twin, like s24 —
    * the production path buckets the 8-byte codes); the rerank reads full
    * vectors only for the 4k-bounded shortlist via an AQE-sized join.
    */
  def binaryQuantRecall(embeddings: DataFrame, queryPred: Column,
                        k: Int = 5): DataFrame = {
    val corpus = normalize(embeddings, "vec_id")
    val signBits: Column = (0 until 64).map(j =>
      when(try_element_at(col("v"), lit(j + 1)) > 0.0, lit(1L << j))
        .otherwise(lit(0L))).reduce(_ bitwiseOR _)
    // NOT checkpointed: coded is CORPUS-sized (vectors included), and the
    // module's rule is that only model/top-k-bounded frames materialize —
    // the two consumers (queries, the scoring scan) just read the source
    // scan twice, which AQE/parquet make cheap; truth and the 4k-bounded
    // shortlist below are the bounded frames that DO checkpoint
    val coded = corpus.select(col("vec_id"), col("v"), col("norm"),
      signBits.as("bits"))
    val queries = coded.where(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"), col("bits").as("qbits"))
    val truth = bruteForceTopK(embeddings, queryPred, k)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    val hammed = broadcast(queries)
      .join(coded, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        bit_count(col("qbits").bitwiseXOR(col("bits"))).as("ham"),
        col("qv"), col("qnorm"), col("v"), col("norm"))
    val wHam = Window.partitionBy(col("query_id"))
      .orderBy(col("ham").asc, col("neighbor_id").asc)
    val shortlist = hammed
      .withColumn("hrank", row_number().over(wHam).cast("long"))
      .where(col("hrank") <= 4 * k)
      .localCheckpoint()
    val bqTop = shortlist.where(col("hrank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val wCos = Window.partitionBy(col("query_id"))
      .orderBy((VecDot.dot(col("qv"), col("v")) /
        (col("qnorm") * col("norm"))).desc, col("neighbor_id").asc)
    val rerankTop = shortlist
      .withColumn("crank", row_number().over(wCos).cast("long"))
      .where(col("crank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    def scored(approx: DataFrame, method: String): DataFrame =
      truth.join(
          approx.select(col("query_id").as("__q"), col("neighbor_id").as("__n")),
          col("query_id") === col("__q") && col("neighbor_id") === col("__n"),
          "left")
        .agg(count(lit(1)).as("n_truth"),
          sum(when(col("__q").isNotNull, 1L).otherwise(0L)).as("n_hits"))
        .select(lit(method).as("method"), col("n_truth"), col("n_hits"),
          expr("n_hits * 1000000 div n_truth").as("recall_ppm"))
    scored(bqTop, "bq").unionAll(scored(rerankTop, "bq_rerank"))
  }

  /** Random-projection (Johnson–Lindenstrauss) dimensionality-reduction
    * DISTORTION gate — the measurement a pipeline runs before swapping
    * full embeddings for cheap projected ones in clustering/dedup
    * pre-passes: project with a deterministic ±1 Rademacher matrix
    * (Achlioptas '03 — database-friendly JL: signs, no Gaussians; rows
    * are the md5-bit plane discipline of [[bucketExprOn]] under an `rp:`
    * namespace, inlined as array literals through the codegen'd
    * `vec_dot` kernel) and measure, over a deterministic pair sample,
    * how well scaled projected squared distances track the originals:
    * `ratio = ‖R(a−b)‖² / (m·‖a−b‖²)`, whose expectation is 1 with
    * variance ≈ 2/m. One row per projected dimension m — the
    * dimension-vs-distortion curve, [[matryoshkaRecall]]'s untrained
    * twin: (proj_dim, n_pairs, n_within, within_ppm, mean_dev_ppm),
    * all integer ppm so the row is hash-exact (the double ratio floors
    * to ppm; sums/sums-of-squares fold left-to-right on both engines).
    *
    * The pair DIFFERENCE projects once (linearity of R — one `vec_dot`
    * per plane per pair, not two), and zero-distance pairs drop — they
    * carry no distortion information, the no-bigram-doc convention.
    *
    * Scale shape: the sample frame (pairs of consecutive ids at a fixed
    * rate here; a production run samples a fixed COUNT) checkpoints
    * once, sample-bounded, and each m-branch is a pure projection over
    * it — the s17/s24 sweep pattern; the corpus is scanned exactly
    * twice (each pair side), never joined to itself.
    */
  def randomProjectionGate(embeddings: DataFrame,
                           prefixes: Seq[Int] = Seq(8, 16, 32),
                           epsPpm: Long = 400000L): DataFrame = {
    val maxDim = prefixes.max
    require(prefixes.nonEmpty && prefixes.forall(m => m > 0 && m <= 64),
      "projected dims must be in 1..64")
    def rpSign(j: Int, i: Int): Double = {
      val key = s"rp:$j:${i / 60}"
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bits = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      if (((bits >> (i % 60)) & 1L) == 1L) 1.0 else -1.0
    }
    val dim = 64 // corpus embedding width (documents' contract)
    val v = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val a = v.where(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("id_a"), col("v").as("va"))
    val b = v.select((col("vec_id") - 1).as("id_a"), col("v").as("vb"))
    val diff = zip_with(col("va"), col("vb"), (x, y) => x - y)
    val pds = array((0 until maxDim).map { j =>
      val plane = lit((0 until dim).map(i => rpSign(j, i)).toArray)
      VecDot.dot(col("df"), plane)
    }: _*)
    val pairs = a.join(b, "id_a")
      .select(col("id_a"), diff.as("df"))
      .select(col("id_a"),
        VecDot.dot(col("df"), col("df")).as("d2o"),
        pds.as("pds"))
      .where(col("d2o") > 0)
      .localCheckpoint() // sample-bounded, reused by every m-branch
    prefixes.map { m =>
      val d2p = aggregate(slice(col("pds"), 1, m), lit(0.0), (acc, x) => acc + x * x)
      pairs
        .select(floor(d2p * lit(1000000.0) / (lit(m.toDouble) * col("d2o")))
          .cast("long").as("rppm"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(abs(col("rppm") - 1000000L) <= epsPpm, 1L).otherwise(0L))
            .as("n_within"),
          sum(abs(col("rppm") - 1000000L)).as("__sumdev"))
        .select(lit(m.toLong).as("proj_dim"), col("n_pairs"), col("n_within"),
          expr("n_within * 1000000 div n_pairs").as("within_ppm"),
          expr("__sumdev div n_pairs").as("mean_dev_ppm"))
    }.reduce(_ unionAll _)
  }

  /** Corpus-wide k-NN GRAPH — every document's top-k neighbors in one
    * pass, the input structure of graph-based semantic dedup, diversity
    * sampling, and cluster-balance QA ([[bruteForceTopK]] answers a
    * QUERY SET against the corpus; this answers corpus × corpus, which
    * brute force cannot at scale). Candidates come from multi-table
    * sign-LSH (the [[graft.dedup.Dedup.lshNearDupPairsMulti]]
    * OR-construction — `tables` independent hyperplane families over one
    * scan), so each document ranks only its bucket-mates: Σ|bucket|²
    * work, never n². Ranking is exact cosine over the candidates
    * (codegen'd `vec_dot`, left-to-right fold — cross-engine
    * deterministic, the s01 convention), rank ties to the smaller
    * neighbor id. Documents whose buckets are singletons in every table
    * get no rows — the honest LSH recall trade, measured by the same
    * d18/s07 calibration gates.
    *
    * Scale shape: one corpus scan emits all tables' buckets through one
    * generator; the candidate join is an equi-join on (table, bucket);
    * duplicates from multi-table collisions collapse by `distinct` on
    * bit-identical scores; the top-k window partitions by source doc
    * (bucket-bounded rows per partition key, no global sort).
    * Output: (vec_id, rank, neighbor_id), the [[bruteForceTopK]] shape
    * keyed by corpus doc.
    */
  def knnGraph(embeddings: DataFrame, k: Int = 3,
               nPlanes: Int = 4, tables: Int = 2): DataFrame = {
    val normed = normalize(embeddings, "vec_id")
    val tb = explode(array((0 until tables).map(t =>
      struct(lit(t).as("t"), bucketExpr(nPlanes, table = t).as("bucket"))): _*))
    val bucketed = normed
      .select(col("vec_id"), col("v"), col("norm"), tb.as("tb"))
      .select(col("vec_id"), col("v"), col("norm"),
        col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    val cos = (VecDot.dot(col("x.v"), col("y.v")) /
      (col("x.norm") * col("y.norm"))).as("cos")
    val cand = bucketed.as("x").join(bucketed.as("y"),
        col("x.t") === col("y.t") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"),
        col("y.vec_id").as("neighbor_id"), cos)
      .distinct()
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("rank"), col("neighbor_id"))
  }

  /** GRAPH-based ANN search — greedy BEAM SEARCH over the [[knnGraph]]
    * proximity graph, the HNSW/NSW search primitive at its base layer
    * (Malkov–Yashunin TPAMI'18: navigate a small-world graph from an
    * entry point, keeping the `beam` best candidates — their `ef`
    * parameter — each hop; completes the index-family matrix:
    * flat / IVF / PQ / sign-LSH / graph). Engine-exact semantics, the
    * g01 fixed-snapshot discipline: the graph is [[knnGraph]]'s
    * deterministic LSH-candidate top-k made SYMMETRIC (NSW's undirected
    * navigation), the entry point is the corpus minimum vec_id (real
    * HNSW descends upper layers to pick one; a fixed entry makes the
    * whole search a pure function both engines replay), and `rounds`
    * synchronous expansions each re-rank visited ∪ neighbors(visited) by
    * exact cosine (the s01 convention — ties to the smaller id), keeping
    * the top-`beam`. Output: the final beam's top-k, self excluded —
    * (query_id, rank, neighbor_id), the [[bruteForceTopK]] contract. The
    * honest recall trade (an unreachable cluster stays unreached) is
    * measured the s07 way: compare against [[bruteForceTopK]] with
    * [[recallAtK]].
    *
    * Scale shape: the graph is corpus-bounded (k·n directed edges); per
    * round the queries-bounded beam frame (queries × beam) joins the
    * edge table by node — an AQE-sized equi-join, broadcastable — and
    * candidates join the corpus by vec_id to score; the re-rank window
    * partitions by query over ≤ beam·(graphK·tables+1) rows. No corpus
    * scan ever depends on query count; per-round `localCheckpoint` (the
    * CC discipline).
    */
  def beamSearchTopK(embeddings: DataFrame, queryPred: Column, k: Int = 5,
                     beam: Int = 8, rounds: Int = 3, graphK: Int = 3,
                     nPlanes: Int = 4, tables: Int = 2): DataFrame = {
    require(beam >= k, "beam must be at least k")
    require(rounds >= 1, "rounds must be at least 1")
    val corpus = normalize(embeddings, "vec_id").localCheckpoint(eager = false)
    val g = knnGraph(embeddings, graphK, nPlanes, tables)
      .select(col("vec_id").as("u"), col("neighbor_id").as("w"))
    val sym = g.unionAll(g.select(col("w").as("u"), col("u").as("w")))
      .distinct()
      .localCheckpoint(eager = false)
    val queries = corpus.where(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))
      .localCheckpoint(eager = false)
    // 1-row entry frame, not a collect: the plan stays lazy
    val entry = embeddings.agg(min(col("vec_id")).as("node"))
    beamSearchFrom(corpus, sym, queries, entry, k, beam, rounds)
  }

  /** The beam-search loop over a PREBUILT (corpus, symmetric-graph,
    * queries, entry) quadruple — shared by [[beamSearchTopK]] (which
    * builds the graph) and [[beamTuningCurve]] (which builds it ONCE and
    * sweeps `beam`; rebuilding the LSH knn graph per sweep point would
    * multiply the expensive stage by the sweep size for zero information).
    */
  private def beamSearchFrom(corpus: DataFrame, sym: DataFrame,
                             queries: DataFrame, entry: DataFrame,
                             k: Int, beam: Int, rounds: Int): DataFrame = {
    val cos = (dotCol("qv", "v") / (col("qnorm") * col("norm"))).as("cos")
    def score(cand: DataFrame): DataFrame = cand
      .join(corpus, cand("node") === corpus("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("node"), cos)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("node").asc)
    var beamF = score(queries.select(col("query_id"))
        .crossJoin(broadcast(entry)))
      .localCheckpoint(eager = false)
    var r = 0
    while (r < rounds) {
      val cand = beamF.join(sym, beamF("node") === sym("u"))
        .select(col("query_id"), sym("w").as("node"))
        .unionAll(beamF.select(col("query_id"), col("node")))
        .distinct()
      beamF = score(cand)
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= beam)
        .select(col("query_id"), col("node"), col("cos"))
        .localCheckpoint(eager = false)
      r += 1
    }
    beamF.where(col("node") =!= col("query_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("node").as("neighbor_id"))
  }

  /** Beam-width recall curve for the graph-ANN search — [[beamSearchTopK]]
    * graded against the exact truth at several `beam` (HNSW's `ef`)
    * settings, the s17 tuning-curve discipline applied to the LAST index
    * family that lacked its own measured-recall row: an index family
    * isn't done until its approximation is measured against its own
    * truth. One row per beam width: (beam, n_queries, n_hits,
    * recall_ppm) with the s17 integer fixed point
    * `recall_ppm = (Σ hits · 10⁶) div (n_queries · k)`.
    *
    * The expensive inputs build ONCE and are checkpoint-reused by every
    * sweep point: the brute-force truth (one corpus scan), the LSH knn
    * graph + symmetric edge table, the normalized corpus and query
    * frames. Each sweep point then costs only the `rounds` beam
    * expansions — queries×beam joins against the corpus-bounded edge
    * table, never a corpus rescan.
    *
    * Monotonicity caveat (spec-pinned on a fixture, NOT asserted here):
    * recall is non-decreasing in `rounds` by construction — the round-r
    * beam is always a candidate of round r+1, and anything displacing a
    * true-top-k member from the approximate top-k precedes it in the
    * SAME (cos desc, id asc) total order the truth uses, so the displacer
    * is itself a hit. In `beam` the same holds on typical fixtures
    * (a wider beam keeps a superset each round) but is not a theorem:
    * a wider beam can in principle route the search into a different
    * region between rounds. That is exactly why the curve is MEASURED.
    */
  def beamTuningCurve(embeddings: DataFrame, queryPred: Column, k: Int = 5,
                      beams: Seq[Int] = Seq(5, 8, 16), rounds: Int = 3,
                      graphK: Int = 3, nPlanes: Int = 4,
                      tables: Int = 2): DataFrame = {
    require(beams.nonEmpty, "beamTuningCurve needs at least one beam width")
    require(beams.forall(_ >= k), "every beam must be at least k")
    require(rounds >= 1, "rounds must be at least 1")
    val corpus = normalize(embeddings, "vec_id").localCheckpoint(eager = false)
    val g = knnGraph(embeddings, graphK, nPlanes, tables)
      .select(col("vec_id").as("u"), col("neighbor_id").as("w"))
    val sym = g.unionAll(g.select(col("w").as("u"), col("u").as("w")))
      .distinct()
      .localCheckpoint(eager = false)
    val queries = corpus.where(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))
      .localCheckpoint(eager = false)
    val entry = embeddings.agg(min(col("vec_id")).as("node"))
    val exact = bruteForceTopK(embeddings, queryPred, k)
      .localCheckpoint(eager = false)
    beams.map { b =>
      recallCurveRow(exact,
        beamSearchFrom(corpus, sym, queries, entry, k, b, rounds),
        "beam", b.toLong, k)
    }.reduce(_.union(_))
  }

  /** Metadata-FILTERED exact top-k (the vector-DB "filtered search"
    * staple, PRE-filter strategy): neighbors must satisfy `metaPred` over
    * the metadata table (joined on vec_id = doc_id), evaluated BEFORE any
    * scoring — the predicate prunes the corpus via a left-semi join on
    * ids, so disallowed vectors never reach the distance kernel and k is
    * guaranteed full from allowed candidates (a POST-filter over an
    * unfiltered top-k under-fills k at low selectivity — the classic
    * trade-off; pre-filter is exact by construction). Queries come from
    * the UNFILTERED corpus: a query document need not pass the filter.
    *
    * Scale shape: the metadata predicate runs on the narrow meta table;
    * only ids cross the semi-join; the same semi-joined-corpus composition
    * slots in front of the IVF/PQ index paths when the filter is known at
    * index-build time. Output: (query_id, rank, neighbor_id), the
    * [[bruteForceTopK]] contract.
    */
  def filteredTopK(embeddings: DataFrame, meta: DataFrame, queryPred: Column,
                   metaPred: Column, k: Int = 5): DataFrame = {
    val corpusAll = normalize(embeddings, "vec_id")
    val allowed = meta.where(metaPred).select(col("doc_id").as("vec_id"))
    val corpus = corpusAll.join(allowed, Seq("vec_id"), "left_semi")
    val queries = corpusAll.where(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val cos = (dotCol("qv", "v") / (col("qnorm") * col("norm"))).as("cos")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(queries)
      .join(corpus, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** HARD-NEGATIVE mining for contrastive / embedding-model training —
    * Schroff et al. CVPR'15 (FaceNet triplet selection), the data op
    * behind every dual-encoder / DPR / sentence-embedding training run:
    * per anchor (query), the top-k most-similar WRONG-label vectors are
    * its hard negatives, and each is flagged `semi_hard` when it ranks
    * BELOW the anchor's nearest same-label positive (cos(neg) <
    * cos(pos₁)) — FaceNet's band: violating-but-not-hardest, because the
    * very hardest negatives amplify label noise. The anchor's label
    * comes from the corpus row itself; an anchor whose label has no
    * other member has no positive and its flag is null (no fabricated
    * verdict).
    *
    * Scale shape: ONE corpus scan with broadcast anchors (the s01
    * documented brute/oracle-twin shape — the production path LSH/IVFs
    * the candidates and runs the SAME label-mismatch verify, the s14
    * composition); the scored frame checkpoints once and feeds both the
    * positives max and the negatives rank (the lmPerplexity
    * multi-consumer discipline). Output: (query_id, rank, neighbor_id,
    * semi_hard) — rank 1..k over negatives by (cos desc, id asc).
    */
  def hardNegatives(embeddings: DataFrame, queryPred: Column,
                    k: Int = 5): DataFrame = {
    val corpus = normalize(embeddings, "vec_id", Seq("label"))
    val queries = corpus.where(queryPred)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("v").as("qv"), col("norm").as("qnorm"))
    val cos = (dotCol("qv", "v") / (col("qnorm") * col("norm"))).as("cos")
    val scored = broadcast(queries)
      .join(corpus, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("qlabel"), col("label"),
        col("vec_id").as("neighbor_id"), cos)
      .localCheckpoint(eager = false)
    val pos = scored.where(col("label") === col("qlabel"))
      .groupBy(col("query_id")).agg(max(col("cos")).as("__pos_cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.where(col("label") =!= col("qlabel"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .join(pos, Seq("query_id"), "left")
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (col("cos") < col("__pos_cos")).cast("long").as("semi_hard"))
  }

  /** A driver-local centroid: (cell, vector, norm). The centroid set of a
    * coarse quantizer is tiny (k × dim doubles) — holding it on the
    * driver and unrolling it into expressions is the iterative-ML
    * control-loop shape (MLlib's k-means broadcasts exactly this array).
    */
  private type LocalCent = (Long, Array[Double], Double)

  private def collectCents(centroids: DataFrame): Seq[LocalCent] =
    centroids.select(col("cell").cast("long"), col("cv"), col("cnorm"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))

  /** Per-row max cosine against a local centroid set — a pure projection
    * (one codegen'd vec_dot per centroid over an array LITERAL — the
    * planning-cheap spelling the d10 history mandates).
    */
  private def maxCosExpr(cents: Seq[LocalCent]): Column = {
    val cos = cents.map { case (_, cv, cn) =>
      VecDot.dot(col("v"), lit(cv)) / (col("norm") * lit(cn))
    }
    if (cos.length == 1) cos.head else greatest(cos: _*)
  }

  /** Assign every vector to its nearest centroid (cosine, deterministic
    * id-asc tiebreak). Returns (vec_id, v, norm, cell).
    *
    * The centroid frame is collected to the driver and the argmax
    * unrolled into ONE array-of-structs `array_max` PROJECTION — the
    * corpus never shuffles and never joins: no crossJoin row blow-up, no
    * groupBy(vec_id) re-shuffle of the vectors (the previous spelling
    * moved the whole corpus — vectors included — through an exchange on
    * every k-means round, the kind of per-iteration full-corpus shuffle
    * that dominates at 100 TB). Struct ordering is lexicographic on
    * (cos, -cell), reproducing `max_by(cell, struct(cos, -cell))`
    * bit-exactly — same vec_dot summation order, same NaN-largest
    * ordering, ties to the smaller cell — which the s05/s09 oracles
    * prove. For centroid sets beyond a few thousand cells the broadcast
    * equi-join spelling would win back; quantizers here are ≤ hundreds.
    */
  def assignCells(corpus: DataFrame, centroids: DataFrame): DataFrame =
    assignCellsLocal(corpus, collectCents(centroids))

  private def assignCellsLocal(corpus: DataFrame, cents: Seq[LocalCent]): DataFrame = {
    require(cents.nonEmpty, "assignCells needs at least one centroid")
    val entries = cents.map { case (cell, cv, cn) =>
      struct(
        (VecDot.dot(col("v"), lit(cv)) / (col("norm") * lit(cn))).as("c"),
        lit(-cell).as("t"),
        lit(cell).as("cell"))
    }
    corpus.select(col("vec_id"), col("v"), col("norm"),
      array_max(array(entries: _*)).getField("cell").as("cell"))
  }

  /** IVF approximate top-k: probe the `nprobe` nearest cells per query and
    * rank only vectors in those cells. Same output shape as
    * [[bruteForceTopK]]; recall < 1 by design (that's the trade).
    */
  def ivfTopK(embeddings: DataFrame, queryPred: Column, k: Int = 5,
              centroidStep: Long = 25L, nprobe: Int = 3,
              centroids: Option[DataFrame] = None): DataFrame = {
    val corpus = normalize(embeddings, "vec_id")
    val cents = centroids.getOrElse(corpus.where(col("vec_id") % centroidStep === 0)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("norm").as("cnorm")))
    val assigned = assignCells(corpus, cents)
    val queries = corpus.where(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    ivfSearchFrom(assigned, queries, cents, k, nprobe)
  }

  /** The probe-cut + search half of [[ivfTopK]] over a PREBUILT
    * (assigned, queries, cents) triple — shared by [[ivfTopK]] (which
    * builds the index) and [[ivfTuningCurve]] (which builds it ONCE and
    * sweeps `nprobe`; re-running the centroid collect and the full-corpus
    * cell assignment per sweep point tripled the expensive stages for
    * zero information — the beamSearchFrom discipline, r12).
    */
  private def ivfSearchFrom(assigned: DataFrame, queries: DataFrame,
                            cents: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val qcos = dotCol("qv", "cv") / (col("qnorm") * col("cnorm"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("__cos").desc, col("cell").asc)
    val probes = broadcast(queries).crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("qnorm"), col("cell"), qcos.as("__cos"))
      .withColumn("__rn", row_number().over(wProbe))
      .where(col("__rn") <= nprobe)
      .drop("__cos", "__rn")

    // search join: equi-join on cell — touches only probed cells' vectors
    val cos = (dotCol("qv", "v") / (col("qnorm") * col("norm"))).as("cos")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(probes)
      .join(assigned, Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** IVF CELL-BALANCE health read — the index-shape QA between
    * [[embeddingHealth]]'s per-dimension stats and [[ivfTuningCurve]]'s
    * recall sweep: an inverted-file index with skewed cells has
    * unpredictable probe latency (a query probing the mega-cell reads a
    * large corpus fraction — the reason faiss docs tell you to retrain
    * a quantizer whose imbalance factor drifts). One summary row over
    * the non-empty cell-size distribution: (n_cells, n_vectors,
    * min_cell, med_cell, max_cell, imbalance_ppm) with `med` the lower
    * median and `imbalance = max·n_cells·10⁶ div n_vectors` — max over
    * mean as one integer cross-multiplication, exact.
    *
    * Scale shape: the same [[assignCells]] shuffle-free literal-centroid
    * assignment as the IVF search path, ONE map-side-combinable cell
    * count, and the final fold runs over the cells-bounded size list
    * (`collect_list` bounded by the quantizer size, the k-means model
    * rule). No centroid here is empty by construction (each is a corpus
    * vector and assigns itself at cosine 1); a retrained quantizer with
    * genuinely empty cells shows up as n_cells below the quantizer size.
    */
  def ivfCellBalance(embeddings: DataFrame, centroidStep: Long = 25L): DataFrame = {
    val corpus = normalize(embeddings, "vec_id")
    val cents = corpus.where(col("vec_id") % centroidStep === 0)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("norm").as("cnorm"))
    val sizes = assignCells(corpus, cents)
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
    sizes
      .agg(
        count(lit(1)).as("n_cells"),
        sum(col("n")).as("n_vectors"),
        min(col("n")).as("min_cell"),
        max(col("n")).as("max_cell"),
        collect_list(col("n")).as("__ns"))
      .select(col("n_cells"), col("n_vectors"), col("min_cell"),
        element_at(array_sort(col("__ns")),
          (floor((size(col("__ns")) - lit(1)) / lit(2)) + lit(1)).cast("int"))
          .as("med_cell"),
        col("max_cell"),
        expr("max_cell * n_cells * 1000000 div n_vectors").as("imbalance_ppm"))
  }

  /** Recall@k of an approximate top-k result against the exact one — the
    * EVAL step every ANN deployment runs before trusting an index: per
    * query, how many of the exact top-k the approximate search recovered
    * (`n_hits`) and the ppm recall. Both inputs are (query_id, rank,
    * neighbor_id) tables as produced by [[bruteForceTopK]] (ground truth)
    * and [[ivfTopK]] / an LSH variant (candidate).
    *
    * Scale shape: both sides are already top-k projections — #queries × k
    * rows, microscopic next to the corpus that produced them — so the
    * equi-join on (query_id, neighbor_id) and the per-query count are
    * AQE-sized (broadcast in practice). The expensive part of a recall
    * eval is producing the inputs, not this comparison.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.as("e")
      .join(approx.as("a"),
        col("e.query_id") === col("a.query_id") &&
          col("e.neighbor_id") === col("a.neighbor_id"), "left")
      .groupBy(col("e.query_id").as("query_id"))
      // denominator = this query's exact-row count, not a caller-supplied
      // k that could silently disagree with the input shape (recall > 1)
      .agg(count(col("a.neighbor_id")).as("n_hits"),
        count(lit(1)).as("__n"))
      .withColumn("recall_ppm",
        floor(col("n_hits") * lit(1000000L) / col("__n")).cast("long"))
      .drop("__n")

  /** Embedding-table health stats — the QA read BEFORE building any index
    * over a vector column: per-dimension count, NaN count, and
    * scaled-integer sum/min/max (`floor(x·10⁶)` as longs — the
    * [[centroidSums]] trick, so sums are shuffle-order-exact and the
    * DuckDB oracle hash-matches; float sums would be order-dependent).
    * A dimension whose min == max is dead (carries no information), a
    * NaN count > 0 poisons every distance computation downstream, and a
    * wildly off-center mean flags an unnormalized slice — the three
    * things that silently wreck an ANN index.
    *
    * Scale shape: one `posexplode` projection + one map-side-combinable
    * groupBy on the dimension index (groups = dims, never rows); raw
    * vectors never shuffle — only (dim, scaled) pairs.
    */
  def embeddingHealth(embeddings: DataFrame): DataFrame = {
    val x = col("x").cast("double")
    val scaled = floor(x * lit(1000000d)).cast("long")
    embeddings
      .select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("d").cast("long").as("d"))
      .agg(
        count(when(!isnan(x), lit(1))).as("n"),
        count(when(isnan(x), lit(1))).as("n_nan"),
        sum(when(!isnan(x), scaled)).cast("long").as("sum_m"),
        min(when(!isnan(x), scaled)).cast("long").as("min_m"),
        max(when(!isnan(x), scaled)).cast("long").as("max_m"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
    * the standard hybrid-retrieval combiner: each input system is a
    * ranked (id, rank) list (rank 1-based) and an id earns
    * `floor(10⁹ / (rrfK + rank))` integer points per system that ranked
    * it; points sum across systems and the fused order is
    * (points desc, id asc). This is how sparse (BM25) and dense (ANN)
    * retrieval combine in production RAG / training-data retrieval
    * stacks — rank-based, so the two systems' incomparable score scales
    * never touch. Integer points keep the fusion bit-exact cross-engine
    * (the repo-wide ppm discipline).
    *
    * Scale shape: inputs are already top-k lists, so the union holds at
    * most Σ systems' k rows — the groupBy and the unpartitioned ranking
    * window run over a few dozen rows, never a corpus. The expensive
    * work (each system's own top-k) happened upstream with its own scale
    * story. Output: (id, rank, rrf).
    */
  def rrfFuse(systems: Seq[DataFrame], k: Int = 10, rrfK: Long = 60L): DataFrame = {
    require(systems.nonEmpty, "rrfFuse: no systems to fuse")
    val pts = systems.map(df => df.select(col("id"),
      graft.textops.TextAnalysis.intDiv(
        lit(1000000000L), lit(rrfK) + col("rank")).as("pts")))
    val fused = pts.reduce(_ unionByName _)
      .groupBy(col("id")).agg(sum(col("pts")).as("rrf"))
    val w = Window.orderBy(col("rrf").desc, col("id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("id"), col("rank"), col("rrf"))
  }

  /** IVF tuning curve — the index-design read BEFORE an index ships (the
    * parameter-sweep companion of [[recallAtK]], as [[graft.dedup.Dedup.minhashCalibration]]
    * is to LSH): corpus-level recall@k against the brute-force truth for
    * a sweep of `nprobe` values, one row per setting. Recall is
    * NON-DECREASING in nprobe by construction (more probes can only add
    * candidate cells), so the curve shows where extra probes stop paying.
    *
    * Scale shape: the expensive brute-force truth computes ONCE and
    * local-checkpoints (the d18 lesson — N recall joins must not re-run
    * it); each sweep point is an IVF search (probe-bounded candidates)
    * plus an AQE-sized top-k join. Output: (nprobe, n_queries, n_hits,
    * recall_ppm).
    */
  def ivfTuningCurve(embeddings: DataFrame, queryPred: Column, k: Int = 5,
                     probes: Seq[Int] = Seq(1, 2, 4),
                     centroidStep: Long = 25L): DataFrame = {
    require(probes.nonEmpty, "ivfTuningCurve needs at least one nprobe")
    val exact = bruteForceTopK(embeddings, queryPred, k)
      .localCheckpoint(eager = false)
    // Build the probe-INDEPENDENT index parts ONCE (r12 — the
    // beamTuningCurve discipline): one centroid frame (one driver
    // collect inside assignCells instead of one per sweep point), one
    // full-corpus cell-assignment pass checkpointed, one query frame.
    // Each sweep point then pays only its own probe cut + the
    // candidate-bounded search join. Identical expressions → identical
    // rows; only the duplicated work goes away.
    val corpus = normalize(embeddings, "vec_id")
    val cents = corpus.where(col("vec_id") % centroidStep === 0)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("norm").as("cnorm"))
    val assigned = assignCells(corpus, cents).localCheckpoint(eager = false)
    val queries = corpus.where(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    probes.map { np =>
      recallCurveRow(exact, ivfSearchFrom(assigned, queries, cents, k, np),
        "nprobe", np.toLong, k)
    }.reduce(_.union(_))
  }

  /** One tuning-curve row: aggregate recall of `approx` against `exact`
    * under the s17 integer fixed point — the ONE place the
    * `(Σ hits · 10⁶) div (n_queries · k)` convention lives, shared by
    * every published curve ([[ivfTuningCurve]], [[beamTuningCurve]]).
    */
  private def recallCurveRow(exact: DataFrame, approx: DataFrame,
                             paramName: String, paramValue: Long,
                             k: Int): DataFrame =
    recallAtK(exact, approx)
      .agg(count(lit(1)).as("n_queries"), sum(col("n_hits")).as("n_hits"))
      .select(lit(paramValue).as(paramName), col("n_queries"),
        col("n_hits").cast("long").as("n_hits"),
        graft.textops.TextAnalysis.intDiv(col("n_hits") * lit(1000000L),
          col("n_queries") * lit(k.toLong)).as("recall_ppm"))


  /** Per-label centroid accumulation — the shuffle-exact building block of
    * distributed k-means / class prototypes: element-wise sums per label
    * in scaled-integer space (`floor(x·10⁶)` per component), which makes
    * the aggregation ORDER-INDEPENDENT (integer addition is associative-
    * commutative; floating-point sums differ by partitioning) and thus
    * bit-reproducible across engines and cluster sizes. Mean = sum/n on
    * the consumer side. One posexplode + one map-side-combined aggregate;
    * group count = labels × dim, tiny.
    */
  def centroidSums(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
        floor(col("x").cast("double") * 1000000d).cast("long").as("x_ppm"))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("x_ppm")).as("sum_ppm"), count(lit(1)).as("n_vectors"))

  /** Distributed k-means (Lloyd) over the embedding corpus — the training
    * loop for the IVF coarse quantizer ([[ivfTopK]] uses the round-0
    * centroids; this runs the actual refinement), and the standard
    * clustering primitive for data curation (topic balance, cluster-based
    * dedup/filtering).
    *
    * Deterministic and engine-exact by construction, so even the ITERATIVE
    * path is oracle-checkable:
    *  - assignment = argmax cosine with id-asc tiebreak (the proven
    *    [[assignCells]] map-side `max_by` — one row per vector crosses the
    *    shuffle);
    *  - centroid update in scaled-integer space: component sums of
    *    `floor(x·10⁶)` (order-independent — integer addition commutes,
    *    same trick as [[centroidSums]]), then TRUNCATING integer division
    *    `sum div n` (= DuckDB's BIGINT `//`);
    *  - new centroids rebuilt as exact-integer-valued doubles — cosine is
    *    scale-invariant, so ppm-scaled centroids rank identically.
    *
    * Per iteration: one broadcast of |cells| centroids + one map-side
    * aggregate over the corpus + one tiny (cells × dim) aggregate. The
    * corpus is scanned once per iteration and never shuffled.
    *
    * Output: the post-final-assignment per-(cell, dim) statistics
    * `(cell, dim, mean_ppm, n_vectors)` — empty cells drop (no assigned
    * vectors), exactly like a Lloyd step.
    */
  def kmeansCentroids(embeddings: DataFrame, centroidStep: Long = 25L,
                      iterations: Int = 2): DataFrame = {
    val corpus = normalize(embeddings, "vec_id")
    val init = corpus.where(col("vec_id") % centroidStep === 0)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("norm").as("cnorm"))
    lloyd(corpus, init, iterations, tolPpm = -1L)._1
  }

  // truncating long division (Spark `div`), = DuckDB `//` — VERIFIED
  // empirically on negative operands: DuckDB `SELECT -7 // 2` is -3
  // (truncation toward zero, BIGINT and HUGEINT alike), the same as
  // Spark's `div`; s20's fixture has negative (m, cell, dim) sums and
  // hash-matches on exactly this pairing. (A floor-division rewrite here
  // was tried in round 9 on the premise that `//` floors — it broke the
  // s20 oracle match on the first negative sum. `//` does NOT floor.)
  private val meanPpm = expr("sum_ppm div n_vectors")

  /** Centroid frame (cell, cv, cnorm) from a Lloyd stats frame
    * `(cell, dim, sum_ppm|mean_ppm, n_vectors)` — the integer-exact
    * rebuild used between Lloyd rounds, public so a TRAINED centroid set
    * ([[kmeansParallel]] / [[kmeansConverged]] output) can be fed straight
    * into [[ivfTopK]] / [[ivfPqTopK]] in place of the deterministic
    * step quantizer. Cosine is scale-invariant, so the ppm-scaled
    * centroid vectors rank identically to the true means.
    */
  def centroidsFromStats(stats: DataFrame): DataFrame = {
    val m = if (stats.columns.contains("mean_ppm")) col("mean_ppm").cast("double")
            else meanPpm.cast("double")
    stats
      .select(col("cell"), col("dim"), m.as("m"))
      .groupBy(col("cell"))
      .agg(collect_list(struct(col("dim"), col("m"))).as("__dm"))
      .select(col("cell"),
        transform(array_sort(col("__dm")), s => s.getField("m")).as("cv"))
      .withColumn("cnorm", sqrt(aggregate(
        transform(col("cv"), x => x * x), lit(0.0), (acc, x) => acc + x)))
  }

  /** The shared Lloyd loop: assign → integer-exact stat update → rebuild,
    * starting from an explicit centroid frame.
    *
    * `tolPpm < 0` reproduces the original fixed-iteration behavior with no
    * extra jobs. `tolPpm >= 0` adds a CONVERGENCE STOP: after each update,
    * the max absolute per-(cell, dim) movement of the integer centroid
    * means is reduced to the driver (one tiny aggregate over cells × dim
    * rows — the standard iterative-ML control-loop shape, same as MLlib's
    * per-step cost collect); the loop exits once movement ≤ tolPpm.
    * Movement is computed in scaled-INTEGER space, so "converged" is
    * engine-exact, not a float epsilon. A cell appearing/disappearing
    * between rounds counts as movement of its full magnitude (full outer
    * join, absent side = 0).
    *
    * Returns (post-final-assignment stats, iterations actually run).
    */
  private def lloyd(corpus: DataFrame, init: DataFrame, maxIterations: Int,
                    tolPpm: Long): (DataFrame, Int) = {
    require(maxIterations >= 1, "kmeans needs at least one iteration")
    var cents = init
    var stats: DataFrame = null
    var prev: DataFrame = null
    var i = 0
    var converged = false
    while (i < maxIterations && !converged) {
      i += 1
      val assigned = assignCells(corpus, cents)
      // localCheckpoint: truncate the iterative lineage (cells × dim rows,
      // tiny) — without it each round's plan NESTS all prior rounds'
      // broadcasts and corpus scans, the driver-stall class the
      // connectedComponents loop already guards against. Lazy: there is no
      // per-round probe action on the fixed-iteration path, so the next
      // round's centroid broadcast (or the final action) materializes it;
      // on the convergence path the movement aggregate is that action.
      stats = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .select(col("cell"), (col("pos") + 1).cast("long").as("dim"),
          floor(col("x") * 1000000d).cast("long").as("x_ppm"))
        .groupBy(col("cell"), col("dim"))
        .agg(sum(col("x_ppm")).as("sum_ppm"), count(lit(1)).as("n_vectors"))
        .localCheckpoint(eager = false)
      if (tolPpm >= 0L && prev != null) {
        val movement = stats.select(col("cell"), col("dim"), meanPpm.as("m2"))
          .join(prev.select(col("cell"), col("dim"), meanPpm.as("m1")),
            Seq("cell", "dim"), "full_outer")
          .agg(coalesce(
            max(abs(coalesce(col("m2"), lit(0L)) - coalesce(col("m1"), lit(0L)))),
            lit(0L)))
          .head().getLong(0)
        if (movement <= tolPpm) converged = true
      }
      prev = stats
      if (!converged && i < maxIterations) cents = centroidsFromStats(stats)
    }
    (stats.select(col("cell"), col("dim"), meanPpm.as("mean_ppm"),
      col("n_vectors")), i)
  }

  /** Deterministic k-means‖ seeding (Bahmani et al., VLDB'12 — "Scalable
    * k-means++") — the SCALABLE init for [[kmeansParallel]] /
    * [[kmeansConverged]]: instead of k sequential k-means++ draws (k
    * corpus scans, inherently serial), each of `rounds` passes OVERSAMPLES
    * ~`oversample` new centers in parallel, then the ~`1 + rounds ×
    * oversample` candidates are weighted by their assignment counts and
    * reduced to the k heaviest. Every step is one broadcast of the (tiny)
    * candidate set + one map-side-combined aggregate over the corpus —
    * the corpus itself never shuffles.
    *
    * Engine-exact (and thus oracle-checkable) by construction, which is
    * unusual for a sampling init:
    *  - the seed center is the min vec_id (no RNG);
    *  - per round, a point x is drawn iff
    *    `u20(x, round) · φ < oversample · d²ppm(x) · 2²⁰`, where
    *    `d²ppm(x) = floor((1 - maxcos(x, C))² · 10⁶)` (INTEGER squared
    *    cosine distance), `φ = Σ d²ppm` (exact integer cost), and
    *    `u20(x, r) = md5("kmpp:r:" + vec_id) mod 2²⁰` is a deterministic
    *    20-bit uniform — the md5-Bernoulli analog of the paper's
    *    `p(x) = ℓ·d²(x)/φ(C)` draw. All-integer comparison: no float
    *    summation order anywhere near a branch. (Magnitudes: u20 < 2²⁰,
    *    φ ≤ |corpus|·4·10⁶ — the product stays under 2⁶³ up to ~10¹²
    *    rows.)
    *  - reduction = top-k candidates by (assignment count DESC, cell ASC)
    *    — a TakeOrdered over the candidate set, not a window.
    *
    * φ is reduced to the driver once per round (a scalar — the same
    * control-loop shape as the paper's cost term and MLlib's impl); the
    * per-round distance frame is lazily checkpointed so the φ action
    * materializes it and the sampling filter reuses it.
    *
    * Input is a normed corpus frame (vec_id, v, norm); output is a
    * centroid frame (cell, cv, cnorm), cell = source vec_id.
    */
  private[graft] def kmeansParallelInit(corpus: DataFrame, k: Int,
                                        rounds: Int, oversample: Int): DataFrame = {
    import corpus.sparkSession.implicits._
    require(k >= 1 && rounds >= 1 && oversample >= 1, "k, rounds, oversample must be >= 1")
    val seedId = corpus.agg(min(col("vec_id"))).head().getLong(0)
    // the candidate set lives on the DRIVER (≤ 1 + rounds × oversample
    // entries of dim doubles): distances become projections against
    // literal vectors and the corpus never shuffles — the previous
    // crossJoin + groupBy(vec_id) spelling re-shuffled every vector once
    // per round
    var cents: Seq[LocalCent] = collectCents(
      corpus.where(col("vec_id") === seedId)
        .select(col("vec_id").as("cell"), col("v").as("cv"), col("norm").as("cnorm")))
    for (r <- 1 to rounds) {
      val cm = maxCosExpr(cents)
      // (1-cm)² in ppm — floor AFTER the float product, so an already-
      // chosen center (cm ≈ 1 up to sqrt rounding, possibly a hair past
      // it) lands at exactly 0 and can never be re-drawn
      val d2 = corpus.select(col("vec_id"), col("v"), col("norm"),
          floor((lit(1.0) - cm) * (lit(1.0) - cm) * lit(1000000.0))
            .cast("long").as("d2_ppm"))
        .localCheckpoint(eager = false)
      val phi = d2.agg(coalesce(sum(col("d2_ppm")), lit(0L))).head().getLong(0)
      if (phi > 0L) {
        val u20 = pmod(conv(substring(
          PortableHash.md5Hex(concat(lit(s"kmpp:$r:"), col("vec_id"))),
          1, 13), 16, 10).cast("long"), lit(1048576L))
        cents = cents ++ collectCents(d2
          .where(u20 * lit(phi) < lit(oversample.toLong) * col("d2_ppm") * lit(1048576L))
          .select(col("vec_id").as("cell"), col("v").as("cv"), col("norm").as("cnorm")))
      }
    }
    // weight by assignment count (map-side combined: only (cell, count)
    // rows cross the wire) and keep the k heaviest — the candidate set is
    // driver-local, so the (weight DESC, cell ASC) reduction is a local sort
    val weights = assignCellsLocal(corpus, cents)
      .groupBy(col("cell")).agg(count(lit(1)).as("__w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a candidate normally assigns at least itself; an exact-duplicate
    // vector can lose its own assignment to the smaller-cell twin and
    // carry no weight — dropped, as the previous inner join did
    cents.filter { case (cell, _, _) => weights.contains(cell) }
      .sortBy { case (cell, _, _) => (-weights(cell), cell) }
      .take(k)
      .toDF("cell", "cv", "cnorm")
  }

  /** k-means with the k-means‖ seeding and a FIXED iteration count — the
    * engine-exact face (same integer centroid math as
    * [[kmeansCentroids]], deterministic init), so the whole
    * init→weight→reduce→Lloyd pipeline hash-matches a SQL oracle.
    * Output: (cell, dim, mean_ppm, n_vectors).
    */
  def kmeansParallel(embeddings: DataFrame, k: Int = 20, rounds: Int = 2,
                     oversample: Int = 40, iterations: Int = 2): DataFrame = {
    val corpus = normalize(embeddings, "vec_id")
    lloyd(corpus, kmeansParallelInit(corpus, k, rounds, oversample),
      iterations, tolPpm = -1L)._1
  }

  /** k-means run to CONVERGENCE — k-means‖ seeding, then Lloyd rounds
    * until the max per-(cell, dim) integer-mean movement is ≤ `tolPpm`
    * (or `maxIterations`). Returns (stats, iterations actually run).
    * The production training shape; [[kmeansParallel]] is its
    * fixed-iteration twin for oracle exactness.
    */
  def kmeansConverged(embeddings: DataFrame, k: Int = 20, rounds: Int = 2,
                      oversample: Int = 40, maxIterations: Int = 25,
                      tolPpm: Long = 0L): (DataFrame, Int) = {
    require(tolPpm >= 0L, "tolPpm must be >= 0 (use kmeansParallel for fixed iterations)")
    val corpus = normalize(embeddings, "vec_id")
    lloyd(corpus, kmeansParallelInit(corpus, k, rounds, oversample),
      maxIterations, tolPpm)
  }

  /** Sign-LSH bucketing (random-hyperplane surrogate): bucket id = sign
    * pattern of the vector against `nPlanes` deterministic pseudo-random
    * hyperplanes (component j of plane p = ±1 chosen by bit j of a 60-bit
    * md5 stream keyed by p). Vectors in the same bucket are cosine-close
    * with probability (1 - θ/π)^nPlanes — the candidate generator for
    * embedding near-dup at corpus scale. Output: (vec_id, bucket).
    */
  def signLshBuckets(embeddings: DataFrame, nPlanes: Int = 8): DataFrame =
    normalize(embeddings, "vec_id")
      .select(col("vec_id"), bucketExpr(nPlanes).as("bucket"))

  /** The sign-LSH bucket id as a column expression over a normed frame's
    * `v` column — shared by [[signLshBuckets]] and
    * [[graft.dedup.Dedup.lshNearDupPairs]] (which already carries a
    * normed frame and must not re-scan the corpus for buckets).
    *
    * `table >= 0` keys the hyperplane family by table index — each hash
    * table of a multi-table (OR-construction) LSH index gets independent
    * planes ([[graft.dedup.Dedup.lshNearDupPairsMulti]]). The default -1
    * keeps the original single-table plane stream.
    */
  private[graft] def bucketExpr(nPlanes: Int, table: Int = -1): Column =
    bucketExprOn(col("v"), nPlanes, table)

  /** [[bucketExpr]] against an explicit (double-cast) vector column —
    * used by the streaming near-dup path, which builds its own frame.
    */
  private[graft] def bucketExprOn(v: Column, nPlanes: Int, table: Int = -1): Column = {
    val dim = 64 // corpus embedding width (documents' contract)
    val planeSign: (Int, Int) => Double = (p, j) => {
      // deterministic ±1 from md5 — computed once on the driver, inlined as
      // ONE array literal per plane (tiny: nPlanes × dim doubles)
      val key = if (table < 0) s"plane:$p:${j / 60}" else s"plane:$table:$p:${j / 60}"
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val bits = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      if (((bits >> (j % 60)) & 1L) == 1L) 1.0 else -1.0
    }
    // Each plane's ±1 weights ride as a single ArrayType literal through the
    // codegen'd vec_dot kernel. An unrolled element_at(v,1)*s1 + … spelling
    // computes the same left-to-right sum (bit-identical doubles) but costs
    // dim expression nodes PER PLANE — at nPlanes×tables×both-join-sides that
    // is thousands of tree nodes, and Catalyst planning (not the data) came
    // to dominate the multi-table LSH wall-clock.
    val bucket = (0 until nPlanes).map { p =>
      val plane = lit((0 until dim).map(j => planeSign(p, j)).toArray)
      when(VecDot.dot(v, plane) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    // Undersized (corrupt) vectors quarantine in bucket 0 — the behavior
    // the unrolled spelling had via element_at's NULL past the end —
    // instead of prefix-hashing into a genuine bucket, where a streaming
    // dedup could mistake them for a real document's near-dup.
    when(size(v) >= dim, bucket).otherwise(lit(0L))
  }

  /** Product-quantization codes (Jégou et al., PAMI'11) — the embedding
    * COMPRESSION half of large-scale ANN: each vector is cut into
    * `subspaces` contiguous sub-vectors, and each sub-vector is replaced by
    * the id of its nearest codebook entry (L2). 64-dim float32 → 8 bytes
    * at the defaults; an IVF-PQ index stores only these codes.
    *
    * Deterministic codebook = the sub-vectors of the first `codebookSize`
    * corpus rows (a per-subspace k-means fit would drop in — the
    * encode topology is what matters for scale; [[kmeansCentroids]] IS that
    * fit). The encode is one corpus scan: explode into (vector, subspace)
    * rows, equi-join the broadcast codebook on the subspace id, and reduce
    * with a map-side-combined `min_by` — only one row per (vector,
    * subspace) crosses the shuffle, never the K candidates.
    *
    * Output: (vec_id, m, code) — ties on distance break to the smallest
    * code, so the encoding is engine-exact and oracle-checkable.
    */
  def pqCodes(embeddings: DataFrame, subspaces: Int = 8,
              codebookSize: Int = 16): DataFrame = {
    val v = doubleVecs(embeddings)
    // same conditional as normalize: spread the single-file fixture scan,
    // never re-shuffle an already-wide production scan
    val par = v.sparkSession.sparkContext.defaultParallelism
    val spread = if (embeddings.rdd.getNumPartitions >= par) v else v.repartition(par)
    pqCodesFrom(spread, pqCodebookFrom(v, subspaces, codebookSize), subspaces)
  }

  /** (vec_id, double-cast v) — the shared projection every PQ path slices. */
  private def doubleVecs(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))

  /** The encode over an already-partitioned (vec_id, v) frame and a
    * prebuilt codebook — shared by [[pqCodes]] and [[ivfPqTopK]] so the
    * codebook is defined ONCE per job.
    */
  private def pqCodesFrom(v: DataFrame, codebook: DataFrame,
                          subspaces: Int): DataFrame =
    slices(v, subspaces, pqSubDim(subspaces), "sv")
      .join(broadcast(codebook), Seq("m"))
      .select(col("vec_id"), col("m").cast("long").as("m"), col("code"),
        pqDist("sv", "cv").as("__d"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(col("code"), struct(col("__d"), col("code"))).as("code"))

  private val Dim = 64 // corpus embedding width (documents' contract)

  private def pqSubDim(subspaces: Int): Int = {
    require(Dim % subspaces == 0, s"dim $Dim not divisible into $subspaces subspaces")
    Dim / subspaces
  }

  /** (vec_id, m-explode, sub-vector slice) — one row per (vector, subspace). */
  private def slices(df: DataFrame, subspaces: Int, subDim: Int, out: String): DataFrame = df
    .select(col("vec_id"), explode(sequence(lit(0), lit(subspaces - 1))).as("m"),
      col("v"))
    .select(col("vec_id"), col("m"),
      slice(col("v"), col("m") * subDim + 1, lit(subDim)).as(out))

  /** Sub-vector L2²: sequential left-to-right fold, the same summation
    * order as the oracle's `list_sum` — double addition does not commute.
    */
  private def pqDist(a: String, b: String): Column = aggregate(
    zip_with(col(a), col(b), (x, y) => (x - y) * (x - y)),
    lit(0.0), (acc, x) => acc + x)

  /** The deterministic per-subspace codebook shared by [[pqCodes]] (encode)
    * and [[ivfPqTopK]] (ADC search): the sub-vectors of the first
    * `codebookSize` corpus rows, as (m, code, cv).
    */
  private def pqCodebookFrom(v: DataFrame, subspaces: Int,
                             codebookSize: Int): DataFrame =
    slices(v.where(col("vec_id") < codebookSize), subspaces,
        pqSubDim(subspaces), "cv")
      .select(col("m"), col("vec_id").as("code"), col("cv"))

  /** PQ codebook TRAINING (Jégou et al., PAMI'11 §III's per-subspace
    * k-means fit — the step [[pqCodes]]'s deterministic codebook stands
    * in for): Lloyd iterations where ALL subspaces ride ONE
    * (m, cell)-keyed shuffle per round — never a driver loop over
    * subspaces — and the centroid update uses the integer-ppm stats
    * channel (the [[kmeansCentroids]] determinism pattern: floor-scaled
    * long sums, truncating division), so the trained codebook is
    * engine-exact and oracle-checkable. Assignment is sub-vector L2²
    * against the broadcast codebook (codebookSize × subspaces rows —
    * model-sized), folded left-to-right like the oracle's list_sum; ties
    * break to the smallest cell. Init = [[pqCodes]]'s deterministic
    * first-rows codebook, so the fit is reproducible.
    *
    * Returns the final per-subspace codebook as integer stats
    * (m, cell, dim, mean_ppm, n_vectors) — [[centroidsFromStats]]-style
    * rows a PQ encode can consume directly.
    */
  def pqTrain(embeddings: DataFrame, subspaces: Int = 8,
              codebookSize: Int = 16, iterations: Int = 2): DataFrame = {
    require(iterations >= 1, "pqTrain needs at least one iteration")
    val v = doubleVecs(embeddings)
    val subDim = pqSubDim(subspaces)
    val subs = slices(v, subspaces, subDim, "sv")
    var cents: DataFrame = pqCodebookFrom(v, subspaces, codebookSize)
      .select(col("m"), col("code").as("cell"), col("cv"))
    var stats: DataFrame = null
    var it = 0
    while (it < iterations) {
      it += 1
      val assigned = subs
        .join(broadcast(cents), Seq("m"))
        .select(col("vec_id"), col("m"), col("cell"), col("sv"),
          pqDist("sv", "cv").as("__d"))
        .groupBy(col("vec_id"), col("m"))
        .agg(min_by(struct(col("cell"), col("sv")),
          struct(col("__d"), col("cell"))).as("w"))
      stats = assigned
        .select(col("m"), col("w.cell").as("cell"),
          posexplode(col("w.sv")).as(Seq("pos", "x")))
        .select(col("m"), col("cell"), (col("pos") + 1).cast("long").as("dim"),
          floor(col("x") * 1000000d).cast("long").as("x_ppm"))
        .groupBy(col("m"), col("cell"), col("dim"))
        .agg(sum(col("x_ppm")).as("sum_ppm"), count(lit(1)).as("n_vectors"))
        .localCheckpoint(eager = false)
      cents = stats
        .select(col("m"), col("cell"), col("dim"),
          (meanPpm.cast("double") / lit(1000000d)).as("mm"))
        .groupBy(col("m"), col("cell"))
        .agg(collect_list(struct(col("dim"), col("mm"))).as("__dm"))
        .select(col("m"), col("cell"),
          transform(array_sort(col("__dm")), s => s.getField("mm")).as("cv"))
    }
    stats.select(col("m").cast("long").as("m"), col("cell"), col("dim"),
      meanPpm.as("mean_ppm"), col("n_vectors"))
  }

  /** Encode with a TRAINED codebook ([[pqTrain]]'s output) and report the
    * compression quality: per-(subspace, cell) assignment counts plus the
    * total quantization error in floor-ppm INTEGERS (error per
    * (vector, subspace) floored to a long before the sum, so the rollup
    * is shuffle-order-exact and oracle-checkable — the same determinism
    * trick as the centroid stats). This is the train → encode loop
    * closed: the distortion report an index build reads before deciding
    * codebook size.
    */
  def pqTrainEncode(embeddings: DataFrame, subspaces: Int = 8,
                    codebookSize: Int = 16, iterations: Int = 2): DataFrame = {
    val trained = pqTrain(embeddings, subspaces, codebookSize, iterations)
      .select(col("m").cast("int").as("m"), col("cell"), col("dim"),
        (col("mean_ppm").cast("double") / lit(1000000d)).as("mm"))
      .groupBy(col("m"), col("cell"))
      .agg(collect_list(struct(col("dim"), col("mm"))).as("__dm"))
      .select(col("m"), col("cell"),
        transform(array_sort(col("__dm")), s => s.getField("mm")).as("cv"))
    val v = doubleVecs(embeddings)
    slices(v, subspaces, pqSubDim(subspaces), "sv")
      .join(broadcast(trained), Seq("m"))
      .select(col("vec_id"), col("m"), col("cell"), pqDist("sv", "cv").as("__d"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(struct(col("cell"), col("__d")),
        struct(col("__d"), col("cell"))).as("w"))
      .select(col("m").cast("long").as("m"), col("w.cell").as("cell"),
        floor(col("w.__d") * lit(1000000d)).cast("long").as("err_ppm"))
      .groupBy(col("m"), col("cell"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("err_ppm")).as("err_ppm"))
  }

  /** IVF-PQ search (Jégou et al., PAMI'11) — the two halves composed the
    * way a production 100 TB ANN index serves queries: the IVF coarse
    * quantizer restricts each query to `nprobe` cells, and candidates in
    * those cells are scored from their 8-byte PQ CODES via asymmetric
    * distance computation (ADC) — never from the raw vectors.
    *
    * Per query, the ADC lookup table `d(m, c) = L2²(query_m, codebook[m][c])`
    * (subspaces × codebookSize doubles, m-major) is built against the
    * broadcast codebook and flattened to ONE array, so scoring a candidate
    * is `subspaces` array lookups — no float vector is touched at search
    * time. At index scale the corpus side carries only (cell, codes):
    * 8 bytes/vector of payload instead of 256, which is the entire point
    * of PQ; the probe side (queries × tables, ~1 KiB each) broadcasts.
    *
    * The cell assignment ⋈ codes join is the INDEX BUILD (one keyed
    * shuffle, precomputed and stored in a real deployment); the search
    * itself is a broadcast equi-join on cell touching nprobe/|cells| of
    * the corpus, scored in-place, ranked per query over the candidate set
    * only. Approximate distances fold m=0..M-1 left-to-right — the exact
    * order the DuckDB oracle sums — so ranks are engine-exact.
    */
  def ivfPqTopK(embeddings: DataFrame, queryPred: Column, k: Int = 5,
                centroidStep: Long = 25L, nprobe: Int = 3,
                subspaces: Int = 8, codebookSize: Int = 16,
                centroids: Option[DataFrame] = None): DataFrame = {
    val subDim = pqSubDim(subspaces)
    val corpus = normalize(embeddings, "vec_id")
    val v = corpus.select(col("vec_id"), col("v")) // double-cast ONCE, reused below
    val cents = centroids.getOrElse(corpus.where(col("vec_id") % centroidStep === 0)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("norm").as("cnorm")))
    val codebook = pqCodebookFrom(v, subspaces, codebookSize) // defined ONCE

    // ---- index build (precomputed in a real deployment) ----
    // (vec_id, cell, codes[subspaces]) — codes m-ordered via the unique
    // (m, code) struct sort, so element_at(codes, m+1) is THE m-th code
    val codes = pqCodesFrom(v, codebook, subspaces)
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
        s => s.getField("code")).as("codes"))
    val index = assignCells(corpus, cents)
      .select(col("vec_id"), col("cell"))
      .join(codes, Seq("vec_id"))

    // ---- per-query ADC lookup tables, m-major flat ----
    val dtab = slices(v.where(queryPred), subspaces, subDim, "qs")
      .join(broadcast(codebook), Seq("m"))
      .select(col("vec_id").as("query_id"), col("m"), col("code"),
        pqDist("qs", "cv").as("__d"))
      .groupBy(col("query_id"))
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code"), col("__d")))),
        s => s.getField("__d")).as("dtab"))

    // ---- coarse probe: nprobe nearest cells per query (by cosine) ----
    val queries = corpus.where(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val qcos = dotCol("qv", "cv") / (col("qnorm") * col("cnorm"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("__cos").desc, col("cell").asc)
    val probes = broadcast(queries).crossJoin(broadcast(cents))
      .select(col("query_id"), col("cell"), qcos.as("__cos"))
      .withColumn("__rn", row_number().over(wProbe))
      .where(col("__rn") <= nprobe)
      .select(col("query_id"), col("cell"))

    // ---- ADC search: equi-join on cell, subspaces array lookups/candidate
    val adist = aggregate(sequence(lit(0), lit(subspaces - 1)), lit(0.0),
      (acc, m) => acc + element_at(col("dtab"),
        (m * codebookSize + element_at(col("codes"), (m + 1).cast("int")) + 1).cast("int")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    broadcast(probes.join(dtab, Seq("query_id")))
      .join(index, Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), adist.as("adist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Two-stage refined search (the faiss `IndexRefineFlat` shape): the
    * IVF-PQ index produces a SHORTLIST of `shortlist` candidates per
    * query from 8-byte codes, then ONLY those candidates are re-scored
    * against their raw vectors by exact cosine and the top `k` re-ranked.
    * This is the production recall-repair lever: ADC distance error is
    * bounded by quantization, so a shortlist a few× larger than k plus an
    * exact refine recovers most of brute-force recall while still never
    * scanning raw vectors for non-candidates.
    *
    * Scale shape: stage 1 is [[ivfPqTopK]] unchanged (probe-restricted
    * equi-join over codes). The refine joins the (queries × shortlist)
    * candidate table — small by construction — BROADCAST into the corpus
    * scan, so raw vectors stream through a narrow filter instead of
    * shuffling; the final per-query window ranks ≤ `shortlist` rows.
    * Output: (query_id, rank, neighbor_id), rank 1..k by (cosine desc,
    * neighbor_id asc) — same contract as [[bruteForceTopK]].
    */
  def ivfPqRerankTopK(embeddings: DataFrame, queryPred: Column, k: Int = 5,
                      shortlist: Int = 20, centroidStep: Long = 25L,
                      nprobe: Int = 3, subspaces: Int = 8,
                      codebookSize: Int = 16): DataFrame = {
    val cand = ivfPqTopK(embeddings, queryPred, k = shortlist,
      centroidStep = centroidStep, nprobe = nprobe,
      subspaces = subspaces, codebookSize = codebookSize)
      .select(col("query_id"), col("neighbor_id"))
    val corpus = normalize(embeddings, "vec_id")
    val queries = corpus.where(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    // corpus streams; the candidate and query tables ride broadcasts
    val fetched = corpus
      .join(broadcast(cand), corpus("vec_id") === cand("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
    val cos = dotCol("qv", "v") / (col("qnorm") * col("norm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("neighbor_id").asc)
    fetched
      .select(col("query_id"), col("neighbor_id"), cos.as("__cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Scalar quantization codes (SQ8, the faiss `ScalarQuantizer` shape):
    * per-DIMENSION linear 8-bit codes
    * `clamp(floor((x_d − min_d)·255 / (max_d − min_d)), 0, 255)` — 4×
    * smaller than PQ's codebook machinery wants for the same dims, and
    * the reconstruction `min_d + (code+0.5)·(max_d−min_d)/255` is a pure
    * per-code formula (no codebook join at all, unlike [[pqCodes]]).
    *
    * Scale shape: TRAIN is one map-side-combinable per-dim (min, max)
    * aggregate — dims-many rows — collected driver-local (the k-means
    * control-loop convention); ENCODE is a shuffle-free projection over
    * literal min/max arrays (one codegen'd transform, the assignCells
    * spelling), and only (vec_id, d, code) rows leave the scan. The
    * float steps are single IEEE ops in a fixed order, so codes are
    * engine-exact.
    */
  def sq8Codes(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), posexplode(sq8Encode(embeddings)).as(Seq("d", "code")))
      .select(col("vec_id"), col("d").cast("long").as("d"), col("code"))

  /** The SQ8 trainer: per-dim (min, max) over the corpus, driver-local. */
  private def sq8Stats(embeddings: DataFrame): (Array[Double], Array[Double]) = {
    val stats = embeddings
      .select(posexplode(transform(col("embedding"), v => v.cast("double")))
        .as(Seq("d", "v")))
      .groupBy(col("d")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .orderBy(col("d")).collect()
    (stats.map(_.getDouble(1)), stats.map(_.getDouble(2)))
  }

  /** The SQ8 encoder as a literal-array projection Column (see
    * [[sq8Codes]] for the formula and scale shape).
    */
  private def sq8Encode(embeddings: DataFrame): Column = {
    val (mins, maxs) = sq8Stats(embeddings)
    transform(col("embedding"), (v, i) => {
      val mn = element_at(lit(mins), i + 1)
      val mx = element_at(lit(maxs), i + 1)
      when(mx > mn,
        least(lit(255L), greatest(lit(0L),
          floor((v.cast("double") - mn) * 255 / (mx - mn)))))
        .otherwise(lit(0L))
    })
  }

  /** SQ8 SYMMETRIC search (faiss's SQ symmetric-distance mode): both the
    * queries and the corpus quantize to 8-bit codes, and candidates rank
    * by code-space L2² `Σ_d (qc_d − cc_d)²` — an INTEGER, so scores are
    * exact and the (dist asc, id asc) rank is engine-deterministic with
    * no float-order caveats (the asymmetric raw-query variant trades
    * that determinism for a little recall). Same output shape as
    * [[bruteForceTopK]]. The per-pair work is a zip-diff + the codegen'd
    * vec_dot kernel over 8-bit-range doubles (≤ 64·255² ≪ 2⁵³ — exact);
    * queries broadcast, the corpus streams, one windowed top-k per
    * query.
    */
  def sq8TopK(embeddings: DataFrame, queryPred: Column, k: Int = 5): DataFrame = {
    val enc = embeddings.select(col("vec_id"),
      transform(sq8Encode(embeddings), c => c.cast("double")).as("cc"))
    val queries = enc.where(queryPred)
      .select(col("vec_id").as("query_id"), col("cc").as("qc"))
    val scored = broadcast(queries)
      .join(enc, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        zip_with(col("qc"), col("cc"), (a, b) => a - b).as("diff"))
      .select(col("query_id"), col("neighbor_id"),
        VecDot.dot(col("diff"), col("diff")).cast("long").as("dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dist"))
  }

  /** SemDeDup (Abbas et al., arXiv:2303.09540): SEMANTIC dedup — cluster
    * the embedding space, then within each cluster drop every vector whose
    * cosine to a LOWER-ID clustermate reaches `tau`. The greedy keep-first
    * rule (drop x iff ∃ y: cell(y)=cell(x), y.id < x.id, cos ≥ τ) makes
    * the survivor set order-deterministic with no connected-components
    * machinery — the paper's "keep one per duplicate group" at candidate
    * level.
    *
    * Scale shape: candidates are CLUSTER-BOUNDED — the pair join is an
    * equi-join on cell (cost Σ|cell|², never n²); k scales with the
    * corpus so |cell| stays bounded (the paper runs k ≈ 10⁴–10⁵ at web
    * scale; AQE's skew split covers hot cells). Assignment reuses
    * [[assignCells]]'s shuffle-free literal-centroid projection; seeds
    * are the k smallest vec_ids — deterministic, k-bounded driver
    * collect, the same control-loop shape as the k-means loop (swap in
    * [[kmeansParallel]] centroids for production quality).
    * Output: surviving (vec_id, cell).
    */
  def semDedupSurvivors(embeddings: DataFrame, k: Int = 8,
                        tau: Double = 0.42): DataFrame = {
    val corpus = normalize(embeddings, "vec_id")
    val seeds = corpus.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("norm").as("cnorm"))
    val assigned = assignCells(corpus, seeds)
    val x = assigned.as("x")
    val y = assigned.select(col("vec_id").as("yid"), col("v").as("yv"),
      col("norm").as("ynorm"), col("cell").as("ycell")).as("y")
    val cos = VecDot.dot(col("x.v"), col("y.yv")) / (col("x.norm") * col("y.ynorm"))
    val drops = x
      .join(y, col("x.cell") === col("y.ycell") && col("y.yid") < col("x.vec_id"))
      .where(cos >= tau)
      .select(col("x.vec_id").as("vec_id")).distinct()
    assigned.join(drops, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
  }
}
