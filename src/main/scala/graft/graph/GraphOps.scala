package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Host-graph analytics over web-corpus link structure — the centrality
  * signals (CommonCrawl-style harmonic/PageRank host ranks) that feed
  * crawl prioritization and per-domain quality priors in training-data
  * pipelines. The reference engine has no graph operators; this module is
  * a documented extension in the [[graft.dedup.Dedup.connectedComponents]]
  * family (iterative, driver-bounded control loop, `localCheckpoint`
  * lineage truncation).
  */
object GraphOps {

  /** Integer-exact PageRank over a directed host graph.
    *
    * Input `edges` is a (src, dst) frame — one row per directed link
    * (pre-`distinct` it for the classic unweighted formulation; duplicate
    * rows act as parallel links). In a web-corpus build the edge list
    * comes from `UrlOps.hostOf` over (page URL, out-link URL) pairs, so
    * hosts ≪ pages — the node frame is corpus-bounded the way centroids
    * are model-bounded.
    *
    * Engine-exact arithmetic (the repo-wide oracle discipline — every
    * step is an integer formula DuckDB replays bit-for-bit, no float
    * convergence lore):
    *   - N = |distinct hosts in src ∪ dst|; initial rank r₀ = scale // N
    *   - per-node teleport base = (r₀ · (10⁶ − dampingPpm)) // 10⁶
    *   - each iteration, an edge (u, v) contributes
    *     (rank(u) · dampingPpm) // (10⁶ · outdeg(u)) to v, and
    *     rank'(v) = base + Σ contributions — truncating `div` on both
    *     engines, one division per edge so rounding order is fixed.
    *   - dangling hosts (no out-links) leak their damped mass, and each
    *     truncating division leaks < 1 unit — the usual simplifications;
    *     total mass is provably non-increasing, never renormalized.
    *
    * Scale shape: outdeg is ONE map-side-combinable groupBy; the
    * edges⋈outdeg frame computes once and persists. Per iteration the
    * hosts-bounded rank frame joins INTO the edge scan — broadcast by
    * default (right while ranks fit an executor; for ~10⁸-host web graphs
    * pass `broadcastRanks = false` and cache the edge frame partitioned
    * by src so the per-round shuffle join moves only the rank side) — and
    * the contribution sum is map-side combinable, so the per-iteration
    * dst shuffle carries at most partitions × hosts combined rows, never
    * raw edges. Ranks `localCheckpoint` each round (nodes-bounded), the
    * k-means/CC lineage-truncation pattern; N is the only driver scalar.
    *
    * Returns (host, pagerank) after `iterations` rounds.
    */
  def pageRank(edges: DataFrame, iterations: Int,
               dampingPpm: Long = 850000L,
               scale: Long = 1000000000000L,
               broadcastRanks: Boolean = true): DataFrame = {
    require(iterations >= 0, "iterations must be non-negative")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      "dampingPpm must be a ppm fraction in [0, 1000000]")
    val nodes = edges.select(col("src").as("host"))
      .unionAll(edges.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count() // hosts-bounded driver scalar, like k-means' k
    require(n > 0, "pageRank needs a non-empty edge frame")
    val r0 = scale / n
    val base = r0 * (1000000L - dampingPpm) / 1000000L
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eplus = edges.join(outdeg, "src").persist()
    var ranks = nodes.withColumn("pagerank", lit(r0))
    var round = 0
    while (round < iterations) {
      val r = if (broadcastRanks) broadcast(ranks) else ranks
      val contribs = eplus
        .join(r, eplus("src") === r("host"))
        .select(eplus("dst").as("host"),
          expr(s"(pagerank * ${dampingPpm}L) div (1000000L * outdeg)").as("c"))
        .groupBy("host").agg(sum("c").as("c"))
      ranks = nodes.join(contribs, Seq("host"), "left")
        .select(col("host"),
          (lit(base) + coalesce(col("c"), lit(0L))).as("pagerank"))
        .localCheckpoint()
      round += 1
    }
    eplus.unpersist()
    ranks
  }

  /** TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB'04) — PageRank
    * with the teleport mass restricted to a TRUSTED SEED set: trust
    * flows out of hand-vetted hosts along links and decays with
    * distance, so low-trust hosts that ordinary PageRank still rewards
    * (link farms interlinking their own mass) read near zero. The crawl
    * QA read for training pipelines: a per-domain quality prior seeded
    * by known-good domains, the complement of g01's popularity rank.
    *
    * Same engine-exact arithmetic as [[pageRank]] with the seed-indicator
    * folded in: d = |seeds ∩ hosts|, seed rows start at `scale div d`
    * and receive the per-node teleport base each round; non-seeds start
    * at 0 and receive none. One truncating division per edge, identical
    * rounding order — an all-hosts seed set reproduces [[pageRank]]
    * bit-for-bit. Personalized PageRank is this same operator with any
    * other interest set as seeds.
    *
    * Scale shape: [[pageRank]]'s exactly — the seed flag rides the
    * hosts-bounded node frame; the per-round rank frame broadcasts into
    * the edge scan (flip `broadcastRanks` for ~10⁸-host graphs).
    * Returns (host, trustrank) after `iterations` rounds.
    */
  def trustRank(edges: DataFrame, seeds: DataFrame, iterations: Int,
                dampingPpm: Long = 850000L,
                scale: Long = 1000000000000L,
                broadcastRanks: Boolean = true): DataFrame = {
    require(iterations >= 0, "iterations must be non-negative")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      "dampingPpm must be a ppm fraction in [0, 1000000]")
    val nodes = edges.select(col("src").as("host"))
      .unionAll(edges.select(col("dst").as("host")))
      .distinct()
    val flags = nodes
      .join(seeds.select(col("host")).distinct().withColumn("__s", lit(1L)),
        Seq("host"), "left")
      .select(col("host"), coalesce(col("__s"), lit(0L)).as("__seed"))
      .localCheckpoint()
    val d = flags.where(col("__seed") === 1L).count() // hosts-bounded scalar
    require(d > 0, "trustRank needs at least one seed present in the graph")
    val r0 = scale / d
    val base = r0 * (1000000L - dampingPpm) / 1000000L
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eplus = edges.join(outdeg, "src").persist()
    var ranks = flags.select(col("host"), (col("__seed") * lit(r0)).as("trustrank"))
    var round = 0
    while (round < iterations) {
      val r = if (broadcastRanks) broadcast(ranks) else ranks
      val contribs = eplus
        .join(r, eplus("src") === r("host"))
        .select(eplus("dst").as("host"),
          expr(s"(trustrank * ${dampingPpm}L) div (1000000L * outdeg)").as("c"))
        .groupBy("host").agg(sum("c").as("c"))
      ranks = flags.join(contribs, Seq("host"), "left")
        .select(col("host"),
          (col("__seed") * lit(base) + coalesce(col("c"), lit(0L))).as("trustrank"))
        .localCheckpoint()
      round += 1
    }
    eplus.unpersist()
    ranks
  }

  /** WEIGHTED integer-exact PageRank — [[pageRank]] over a
    * (src, dst, weight) edge frame, the form a real host rank uses
    * (parallel links COUNT: a site linking another 10,000 times passes
    * more mass than one passing a single link — and pre-aggregating
    * multiplicities into a weight column keeps the per-round scan
    * hosts²-bounded instead of corpus-sized). Same damped
    * truncating-division discipline as g01 with the weight folded into
    * the one division per edge:
    * `contribution(u→v) = (rank(u)·dampingPpm·w_uv) div (10⁶·outW(u))`,
    * the products in DECIMAL(38,0) (rank·damping·weight passes 2⁶³ at
    * realistic weights). Unweighted parity: all-1 weights reproduce
    * [[pageRank]] bit-for-bit (same per-edge rounding).
    */
  def pageRankWeighted(edges: DataFrame, iterations: Int,
                       dampingPpm: Long = 850000L,
                       scale: Long = 1000000000000L,
                       broadcastRanks: Boolean = true): DataFrame = {
    require(iterations >= 0, "iterations must be non-negative")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      "dampingPpm must be a ppm fraction in [0, 1000000]")
    val nodes = edges.select(col("src").as("host"))
      .unionAll(edges.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRankWeighted needs a non-empty edge frame")
    val r0 = scale / n
    val base = r0 * (1000000L - dampingPpm) / 1000000L
    val outw = edges.groupBy("src").agg(sum(col("weight")).as("outw"))
    val eplus = edges.join(outw, "src").persist()
    var ranks = nodes.withColumn("pagerank", lit(r0))
    var round = 0
    while (round < iterations) {
      val r = if (broadcastRanks) broadcast(ranks) else ranks
      val contribs = eplus
        .join(r, eplus("src") === r("host"))
        .select(eplus("dst").as("host"),
          expr(s"""CAST((CAST(pagerank AS DECIMAL(38,0)) * ${dampingPpm}L * weight)
                  |div (CAST(1000000 AS DECIMAL(38,0)) * outw) AS BIGINT)"""
            .stripMargin).as("c"))
        .groupBy("host").agg(sum("c").as("c"))
      ranks = nodes.join(contribs, Seq("host"), "left")
        .select(col("host"),
          (lit(base) + coalesce(col("c"), lit(0L))).as("pagerank"))
        .localCheckpoint()
      round += 1
    }
    eplus.unpersist()
    ranks
  }

  /** Integer-exact HITS (Kleinberg '99) over a directed host graph — the
    * hub/authority split PageRank's single score cannot express: a good
    * HUB links to good authorities (link directories, index pages), a
    * good AUTHORITY is linked from good hubs (canonical sources). The
    * directory-page signal matters for crawl frontier design where
    * PageRank alone over-rewards link farms that only cite each other.
    *
    * Engine-exact arithmetic (the g01 discipline): scores start at
    * `scale`; each round
    *   a'(v) = Σ_{(u,v)} h(u), then normalize a(v) = (a'(v)·scale) div Σa'
    *   h'(v) = Σ_{(v,w)} a(w), then normalize h(v) = (h'(v)·scale) div Σh'
    * with the products in DECIMAL(38,0) (Σ over edges can pass 2⁶³) and
    * ONE truncating integral division per node — the repo's exact
    * cross-multiplication pattern (h22/e06), replayed by the oracle as
    * chained CTEs, bit-for-bit.
    *
    * Scale shape: per half-round, the hosts-bounded score frame
    * broadcasts into the persisted edge scan and the per-node sum is
    * map-side combinable (exactly the [[pageRank]] iteration shape, run
    * once against each edge direction); the normalizer Σ is a 1-ROW
    * broadcast join (the group-vs-global scalar pattern), never a
    * driver collect; scores `localCheckpoint` per round.
    *
    * Returns (host, authority, hub) after `iterations` rounds.
    */
  def hits(edges: DataFrame, iterations: Int,
           scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 0, "iterations must be non-negative")
    val nodes = edges.select(col("src").as("host"))
      .unionAll(edges.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint()
    val e = edges.select(col("src"), col("dst")).persist()

    // one half-round: raw(v) = Σ over edges of the opposite side's score,
    // normalized to Σ = scale by one DECIMAL(38,0) integral division
    def halfRound(scores: DataFrame, scoreCol: String,
                  edgeKey: String, sumKey: String, outCol: String): DataFrame = {
      val joined = e.join(broadcast(scores), e(edgeKey) === scores("host"))
        .select(e(sumKey).as("host"),
          col(scoreCol).cast("decimal(38,0)").as("__s"))
        .groupBy("host").agg(sum("__s").as("__raw"))
      val raw = nodes.join(joined, Seq("host"), "left")
        .select(col("host"),
          coalesce(col("__raw"), lit(0L).cast("decimal(38,0)")).as("__raw"))
      val total = raw.agg(sum(col("__raw")).as("__total"))
      raw.crossJoin(broadcast(total))
        .select(col("host"),
          expr(s"(CAST(__raw AS DECIMAL(38,0)) * ${scale}L) " +
            "div CAST(__total AS DECIMAL(38,0))").cast("long").as(outCol))
    }

    var auth = nodes.withColumn("authority", lit(scale))
    var hub = nodes.withColumn("hub", lit(scale))
    var round = 0
    while (round < iterations) {
      // authorities collect hub mass along edges (u → v sums h(u) at v),
      // then hubs collect the FRESH authority mass (v → w sums a(w) at v)
      auth = halfRound(hub, "hub", "src", "dst", "authority").localCheckpoint()
      hub = halfRound(auth, "authority", "dst", "src", "hub").localCheckpoint()
      round += 1
    }
    e.unpersist()
    auth.join(hub, Seq("host"))
      .select(col("host"), col("authority"), col("hub"))
  }

  /** Neighborhood function by ITERATED HLL SKETCHES — the HyperBall /
    * HyperANF idea (Boldi–Vigna WWW'11, itself ANF with mergeable
    * sketches): ball(v, r+1) = {v} ∪ ⋃_{(v,w)∈E} ball(w, r), with each
    * ball represented as a mergeable HLL sketch, so one round is ONE
    * edge join + ONE `hll_union_agg` groupBy — per-node state O(2^lgK)
    * regardless of ball size. The out-neighborhood-size distribution is
    * the reachability/centrality read (spam farms have tiny balls,
    * genuine hubs huge ones) that exact ball materialization cannot
    * compute at web scale: the exact side is Θ(Σ|ball|) rows, the
    * sketch side Θ(nodes · sketch).
    *
    * The GATE (the a01/e13/e14 pattern for graphs): output carries the
    * EXACT ball size — computed here by r rounds of frontier joins, the
    * oracle twin DuckDB replays as chained CTEs; fixture-affordable,
    * production-impossible, which is the point — plus `within_eps`, the
    * measured verdict that the sketch estimate is within `epsPpm` of
    * exact. DataSketches HLL is exact in its low-cardinality coupon
    * range, so fixture-scale verdicts are provably true; a drifting
    * union breaks the column. Estimates are never hash-compared
    * (merge-order-dependent, like every sketch here).
    *
    * Scale shape: per round, sketches ride one (host)-keyed
    * `hll_union_agg` with map-side partial merge; edges join the
    * hosts-bounded sketch frame; per-round `localCheckpoint`. The exact
    * side exists only for the gate.
    */
  def neighborhoodGate(edges: DataFrame, radius: Int = 2,
                       epsPpm: Long = 50000L): DataFrame = {
    require(radius >= 0, "radius must be non-negative")
    val nodes = edges.select(col("src").as("host"))
      .unionAll(edges.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint()
    val e = edges.select(col("src"), col("dst")).persist()
    // sketch side: ball(·, 0) = own id
    var sk = nodes.groupBy("host").agg(hll_sketch_agg(col("host")).as("sk"))
      .localCheckpoint()
    // exact side: (host, reachable) pair frame, expanded in lockstep
    var reach = nodes.select(col("host"), col("host").as("r"))
      .localCheckpoint()
    var i = 0
    while (i < radius) {
      val nbrSk = e.join(sk, e("dst") === sk("host"))
        .select(e("src").as("host"), col("sk"))
      sk = sk.unionAll(nbrSk)
        .groupBy("host").agg(hll_union_agg(col("sk")).as("sk"))
        .localCheckpoint()
      reach = reach.unionAll(
          reach.join(e, reach("r") === e("src"))
            .select(reach("host"), e("dst").as("r")))
        .distinct()
        .localCheckpoint()
      i += 1
    }
    e.unpersist()
    val exact = reach.groupBy("host").agg(count(lit(1)).as("ball_size"))
    exact.join(sk, Seq("host"))
      .select(col("host"), col("ball_size"),
        (abs(hll_sketch_estimate(col("sk")) - col("ball_size")) * lit(1000000L) <=
          col("ball_size") * lit(epsPpm)).cast("long").as("within_eps"))
  }

  /** Effective-diameter curve — ANF (Palmer/Gibbons/Faloutsos KDD'02) /
    * HyperBall (Boldi–Vigna WWW'11), the one-number "how many hops reach
    * q of all reachable pairs" topology metric published for web crawls:
    * the neighborhood function `NF(r) = Σ_v |ball(v, r)|` per radius
    * 0..R, each radius's cumulative share of NF(R) in ppm, and the
    * `at_q` flag whose FIRST set radius IS the q-effective diameter.
    * Shares are against NF(R) — the measured horizon, the ANF convention
    * when iteration stops at R rather than closure.
    *
    * Both sides of the [[neighborhoodGate]] lockstep ride along: the
    * EXACT NF from the pair frame (fixture-affordable truth — Θ(Σ|ball|)
    * rows, production-impossible, which is the point) and the HyperBall
    * estimate (per round ONE `hll_union_agg` over nodes-bounded sketch
    * state — the web-scale path) measured per radius by the a01/g04/g10
    * `within_eps` verdict. Output:
    * (radius, nf_exact, share_ppm, at_q, within_eps).
    */
  def effectiveDiameter(edges: DataFrame, radius: Int = 3,
                        qPpm: Long = 900000L,
                        epsPpm: Long = 50000L): DataFrame = {
    require(radius >= 0, "radius must be non-negative")
    require(qPpm >= 1 && qPpm <= 1000000L, "qPpm must be a ppm fraction")
    val nodes = edges.select(col("src").as("host"))
      .unionAll(edges.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint()
    val e = edges.select(col("src"), col("dst")).persist()
    var sk = nodes.groupBy("host").agg(hll_sketch_agg(col("host")).as("sk"))
      .localCheckpoint()
    var reach = nodes.select(col("host"), col("host").as("r"))
      .localCheckpoint()
    def curveRow(r: Int, skDf: DataFrame, reachDf: DataFrame): DataFrame =
      reachDf.agg(count(lit(1)).as("nf_exact"))
        .crossJoin(skDf.agg(
          sum(hll_sketch_estimate(col("sk"))).as("__nf_est")))
        .select(lit(r.toLong).as("radius"), col("nf_exact"), col("__nf_est"))
    var rows = Seq(curveRow(0, sk, reach))
    var i = 0
    while (i < radius) {
      val nbrSk = e.join(sk, e("dst") === sk("host"))
        .select(e("src").as("host"), col("sk"))
      sk = sk.unionAll(nbrSk)
        .groupBy("host").agg(hll_union_agg(col("sk")).as("sk"))
        .localCheckpoint()
      reach = reach.unionAll(
          reach.join(e, reach("r") === e("src"))
            .select(reach("host"), e("dst").as("r")))
        .distinct()
        .localCheckpoint()
      i += 1
      rows = rows :+ curveRow(i, sk, reach)
    }
    e.unpersist()
    val curve = rows.reduce(_.unionAll(_))
    val total = curve.where(col("radius") === radius)
      .select(col("nf_exact").as("__total"))
    curve.crossJoin(broadcast(total))
      .select(col("radius"), col("nf_exact"),
        expr("nf_exact * 1000000 div __total").as("share_ppm"),
        (expr("nf_exact * 1000000 div __total") >= qPpm).cast("long").as("at_q"),
        (abs(col("__nf_est") - col("nf_exact")) * lit(1000000L) <=
          col("nf_exact") * lit(epsPpm)).cast("long").as("within_eps"))
  }

  /** Weakly-connected components of a (src, dst) host graph — site
    * clusters / link-farm islands, the graph face of the dedup module's
    * duplicate clustering. String hosts hash to the portable 60-bit md5
    * id ([[graft.functions.PortableHash]], DuckDB-reproducible) and the
    * component search IS [[graft.dedup.Dedup.connectedComponents]] —
    * min-label propagation with the large/small-star fallback and
    * per-round `localCheckpoint`s — so the graph module adds no second
    * CC implementation. Output (host, component) with `component` the
    * component-minimum hashed id.
    */
  /** Per-host triangle counts over an undirected host graph — the local
    * clustering / link-farm-density read beside PageRank's centrality
    * (a host whose neighbors all interlink is a directory ring or a spam
    * farm; one whose neighbors don't is a genuine hub).
    *
    * Algorithm: compact-forward (node-iterator++). Canonical undirected
    * edges orient LOW→HIGH under the (degree, host) total order; wedges
    * enumerate ordered out-neighbor pairs of each low vertex and close by
    * an equi-join back onto the oriented edges. Orienting by degree is
    * the web-scale skew fix: every vertex's oriented out-degree is
    * O(√m), so total wedge work is O(m^1.5) regardless of hub degree —
    * an unoriented hub with degree d would enumerate d² wedges.
    *
    * Scale shape: the degree table is hosts-bounded (broadcast); both
    * joins are vertex-keyed equi-joins AQE sizes; output is one
    * (host, n_triangles) row per triangle-corner host — hosts-bounded.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // materialize the canonical edge set once: deg/orientation/wedges/
    // closing all reuse it, and without the checkpoint each join side
    // would re-derive it from the corpus-sized source scan
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(explode(array(col("a"), col("b"))).as("host"))
      .groupBy(col("host")).agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(broadcast(deg.select(col("host").as("a"), col("d").as("da"))), Seq("a"))
      .join(broadcast(deg.select(col("host").as("b"), col("d").as("db"))), Seq("b"))
    val aLow = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // oriented is read three times (both wedge sides + the closing join)
    val oriented = withDeg.select(
      when(aLow, col("a")).otherwise(col("b")).as("u"),
      when(aLow, col("b")).otherwise(col("a")).as("v"),
      when(aLow, col("db")).otherwise(col("da")).as("dv"))
      .localCheckpoint()
    val e1 = oriented.select(col("u"), col("v").as("v1"), col("dv").as("d1"))
    val e2 = oriented.select(col("u").as("u2"), col("v").as("v2"), col("dv").as("d2"))
    val wedges = e1.join(e2, col("u") === col("u2") &&
        (col("d1") < col("d2") ||
          (col("d1") === col("d2") && col("v1") < col("v2"))))
      .select(col("u"), col("v1"), col("v2"))
    val closing = oriented.select(col("u").as("x"), col("v").as("y"))
    val tri = wedges.join(closing,
      col("v1") === col("x") && col("v2") === col("y"))
    tri.select(explode(array(col("u"), col("v1"), col("v2"))).as("host"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Bounded-radius HARMONIC centrality — the host-ranking read the
    * CommonCrawl project actually publishes for its host graph
    * (Boldi–Vigna "Axioms for Centrality", 2014: harmonic handles
    * disconnected graphs where closeness degenerates):
    * `H(v) = Σ_{u reaches v within R} 1/d(u, v)`, here as exact integer
    * ppm — each node first reached at distance d contributes
    * `10⁶ div d`, so the score is a sum of at most R distinct integers
    * both engines replay bit-for-bit, no float harmonic lore.
    * `incoming = true` (default) measures distances ALONG in-links
    * (who can reach me — authority), by walking the reversed edges.
    *
    * This is the EXACT side, Θ(Σ|ball(R)|) pair rows — the
    * fixture-affordable truth; at web scale the sketch path is
    * [[neighborhoodGate]]'s HyperBall iteration, whose per-round
    * `hll_union_agg` replaces the pair frame with O(nodes·sketch) state
    * (Boldi–Vigna WWW'11 run harmonic exactly this way, with per-round
    * ball-size deltas standing in for the first-reach counts).
    *
    * Shape: per round only the LAST frontier (d = round−1) joins the
    * edge scan, and first-reach wins by a (host, node)-keyed `min(d)`
    * merge — map-side combinable; per-round `localCheckpoint` (the CC
    * discipline). Output (host, n_reached, harmonic_ppm).
    */
  def harmonicCentrality(edges: DataFrame, radius: Int = 3,
                         incoming: Boolean = true): DataFrame = {
    require(radius >= 1, "radius must be at least 1")
    val e = (if (incoming) edges.select(col("dst").as("src"), col("src").as("dst"))
             else edges.select(col("src"), col("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
      .persist()
    val nodes = edges.select(col("src").as("host"))
      .unionAll(edges.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint()
    var reach = nodes.select(col("host"), col("host").as("r"), lit(0).as("d"))
      .localCheckpoint()
    var round = 1
    while (round <= radius) {
      val next = reach.where(col("d") === round - 1)
        .join(e, reach("r") === e("src"))
        .select(reach("host"), e("dst").as("r"), lit(round).as("d"))
      reach = reach.unionAll(next)
        .groupBy(col("host"), col("r")).agg(min(col("d")).as("d"))
        .localCheckpoint()
      round += 1
    }
    e.unpersist()
    reach.where(col("d") > 0)
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000L div d")).as("harmonic_ppm"))
  }

  /** HyperBall HARMONIC centrality with a measured gate — the WEB-SCALE
    * path for [[harmonicCentrality]], run exactly the way Boldi–Vigna
    * ran it on billion-node graphs (HyperBall, WWW'11 + "Axioms for
    * Centrality" 2014): per-round HLL ball sketches replace the
    * Θ(Σ|ball|) first-reach pair frame, and the harmonic sum comes from
    * per-round BALL-SIZE DELTAS —
    * `H_est(v) = Σ_d (|ball(v,d)| − |ball(v,d−1)|) · 10⁶ div d` —
    * since everything first reached in round d is exactly the ball
    * growth that round. Output per host: g07's EXACT (n_reached,
    * harmonic_ppm) — DuckDB-reproducible, hash-compared — plus
    * `within_eps`, the measured verdict that the sketch-side estimate
    * stays within `epsPpm` of the exact score (the a01/g04 gate: a
    * drifting sketch flips the verdict and breaks the hash; the estimate
    * itself is deliberately not hash-compared, register state being
    * partition-order-dependent).
    *
    * Scale shape: per round ONE host-keyed `hll_union_agg` shuffle of
    * (host, sketch) rows — nodes-bounded state, no pair frame; the
    * per-round estimates accumulate into a (hosts × radius+1) frame and
    * the delta window partitions by host. The exact side rides
    * [[harmonicCentrality]] — fixture-affordable truth, same division of
    * labor as [[neighborhoodGate]].
    */
  def harmonicGate(edges: DataFrame, radius: Int = 3,
                   incoming: Boolean = true,
                   epsPpm: Long = 50000L): DataFrame = {
    require(radius >= 1, "radius must be at least 1")
    val exact = harmonicCentrality(edges, radius, incoming)
    val e = (if (incoming) edges.select(col("dst").as("src"), col("src").as("dst"))
             else edges.select(col("src"), col("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
      .persist()
    val nodes = edges.select(col("src").as("host"))
      .unionAll(edges.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint()
    var sk = nodes.groupBy("host").agg(hll_sketch_agg(col("host")).as("sk"))
      .localCheckpoint()
    var ests = sk.select(col("host"), lit(0).as("d"),
      hll_sketch_estimate(col("sk")).as("est"))
    var d = 1
    while (d <= radius) {
      val nbrSk = e.join(sk, e("dst") === sk("host"))
        .select(e("src").as("host"), col("sk"))
      sk = sk.unionAll(nbrSk)
        .groupBy("host").agg(hll_union_agg(col("sk")).as("sk"))
        .localCheckpoint()
      ests = ests.unionAll(sk.select(col("host"), lit(d).as("d"),
        hll_sketch_estimate(col("sk")).as("est")))
      d += 1
    }
    e.unpersist()
    val w = Window.partitionBy(col("host")).orderBy(col("d"))
    val hEst = ests
      .withColumn("__delta", col("est") - lag(col("est"), 1).over(w))
      .where(col("d") > 0)
      .groupBy(col("host"))
      .agg(sum(expr("(__delta * 1000000L) div d")).as("h_est_ppm"))
    exact.join(hEst, Seq("host"))
      .select(col("host"), col("n_reached"), col("harmonic_ppm"),
        (abs(col("h_est_ppm") - col("harmonic_ppm")) * lit(1000000L) <=
          col("harmonic_ppm") * lit(epsPpm)).cast("long").as("within_eps"))
  }

  /** Synchronous label-propagation communities (Raghavan et al. 2007,
    * "Near linear time algorithm to detect community structures in
    * large-scale networks") over an undirected host graph — the
    * community read between [[weakComponents]]' too-coarse islands and
    * [[triangleCounts]]' too-local density: mirror farms, shared-template
    * site families and topical clusters separate INSIDE one weak
    * component, which is the granularity a crawl-dedup policy actually
    * acts on.
    *
    * Engine-exact semantics (the g01 discipline — a defined snapshot,
    * not convergence lore): labels start as the host's own name; each
    * SYNCHRONOUS round every node adopts the most frequent label among
    * its neighbors' previous-round labels, ties to the smallest label,
    * isolated nodes keeping their label. Classic async LPA is
    * order-dependent and can oscillate on bipartite shapes; fixing the
    * round count and the (count desc, label asc) total order makes the
    * result a pure function of the graph that DuckDB replays as chained
    * CTEs, bit-for-bit.
    *
    * Scale shape: the symmetric edge frame materializes ONCE
    * (`localCheckpoint` — every round rescans it); per round the
    * hosts-bounded label frame joins INTO that edge scan — broadcast by
    * default, `broadcastLabels = false` for ~10⁸-host graphs (the
    * [[pageRank]] flag) — the vote count is map-side combinable, and the
    * per-node argmax is `min(struct(-count, label))`, ALSO map-side
    * combinable, so each round is two host-keyed combined shuffles and
    * no window; labels `localCheckpoint` per round. Returns
    * (host, community).
    */
  def labelPropagation(edges: DataFrame, rounds: Int,
                       broadcastLabels: Boolean = true): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionAll(edges.select(col("dst").as("u"), col("src").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    val nodes = edges.select(col("src").as("host"))
      .unionAll(edges.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint()
    var labels = nodes.withColumn("community", col("host"))
    var round = 0
    while (round < rounds) {
      val l = if (broadcastLabels) broadcast(labels) else labels
      val votes = sym.join(l, sym("v") === l("host"))
        .select(sym("u").as("host"), col("community").as("lab"))
        .groupBy(col("host"), col("lab")).agg(count(lit(1)).as("c"))
        .groupBy(col("host"))
        .agg(min(struct((-col("c")).as("negc"), col("lab").as("lab"))).as("w"))
        .select(col("host"), col("w.lab").as("newlab"))
      labels = labels.join(votes, Seq("host"), "left")
        .select(col("host"),
          coalesce(col("newlab"), col("community")).as("community"))
        .localCheckpoint()
      round += 1
    }
    labels
  }

  /** k-CORE membership of the undirected host graph (Seidman '83) — the
    * densest-substructure read between g05's per-host triangle counts
    * and g06's communities: the k-core is the maximal subgraph where
    * every member keeps ≥ k neighbors INSIDE the subgraph, the classic
    * link-farm/spam-ring locator (a farm's members sustain each other's
    * degree; genuine long-tail hosts peel away). Computed by synchronous
    * peeling: each round drops every node whose degree among survivors
    * is < k; the fixpoint is reached in ≤ maxRounds rounds or the
    * round-maxRounds state is reported (deterministic either way — the
    * driver's early exit fires only on a PROVEN fixpoint: peeling is
    * monotone ⊆, so equal survivor counts mean equal sets, the CC
    * convergence-probe discipline). Output for every node:
    * (host, in_core, core_degree) with core_degree the node's degree in
    * the surviving subgraph (0 when peeled).
    *
    * Scale shape: the canonical edge set checkpoints once
    * ([[triangleCounts]]' construction); per round the hosts-bounded
    * survivor set joins into the edge scan twice — broadcast by default,
    * but unlike [[labelPropagation]]'s label frame the round-1 survivor
    * set is the FULL host set, so for ~10⁸-host graphs set
    * `broadcastSurvivors = false` to flip both joins to plain host-keyed
    * equi-joins (the [[pageRank]]/[[labelPropagation]] hatch); the
    * degree count is map-side combinable; survivors `localCheckpoint`
    * per round; the only driver values are the nodes-bounded counts.
    */
  def kCore(edges: DataFrame, k: Int = 5, maxRounds: Int = 6,
            broadcastSurvivors: Boolean = true): DataFrame = {
    require(k >= 1, "k must be at least 1")
    require(maxRounds >= 1, "maxRounds must be at least 1")
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val nodes = edges.select(col("src").as("host"))
      .unionAll(edges.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint()
    def survivorDegrees(alive: DataFrame): DataFrame = {
      def side(c: String): DataFrame = {
        val s = alive.select(col("host").as(c))
        if (broadcastSurvivors) broadcast(s) else s
      }
      und
        .join(side("a"), Seq("a"))
        .join(side("b"), Seq("b"))
        .select(explode(array(col("a"), col("b"))).as("host"))
        .groupBy(col("host")).agg(count(lit(1)).as("d"))
    }
    var alive = nodes
    var aliveCount = alive.count()
    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      val next = survivorDegrees(alive)
        .where(col("d") >= k).select(col("host"))
        .localCheckpoint()
      val nextCount = next.count()
      done = nextCount == aliveCount // monotone ⊆: equal count = fixpoint
      alive = next
      aliveCount = nextCount
      round += 1
    }
    nodes.join(survivorDegrees(alive), Seq("host"), "left")
      .select(col("host"),
        when(col("d").isNotNull, 1L).otherwise(0L).as("in_core"),
        coalesce(col("d"), lit(0L)).as("core_degree"))
  }

  /** Degree ASSORTATIVITY (Newman, PRL 2002) of the undirected host
    * graph — the one-number topology read that separates social-like
    * graphs (assortative, hubs link hubs) from web-like ones
    * (disassortative, hubs link leaves; a crawl whose host graph turns
    * assortative has usually swallowed a link farm that interlinks its
    * own hubs). Pearson correlation of endpoint degrees over edges,
    * computed EXACTLY from four integer moments: with M edges and
    * endpoint degrees (j, k),
    * `r = (4M·Σjk − (Σ(j+k))²) / (2M·Σ(j²+k²) − (Σ(j+k))²)` — Newman's
    * formula cleared of fractions, so the output row is integer-exact:
    * the four moments as longs plus `assortativity_ppm` by ONE
    * truncating DECIMAL(38,0) division (toward zero on both engines —
    * the s20-verified pairing; r is negative on real web graphs, and a
    * star is exactly −10⁶). A regular graph has zero variance →
    * denominator 0 → NULL ppm, the no-fabricated-identity discipline.
    *
    * Scale shape: the [[triangleCounts]] canonical-edge construction —
    * one distinct + checkpoint; the hosts-bounded degree table
    * broadcasts onto the edge scan twice; the moment sums are ONE
    * map-side-combinable global aggregate. Output is a single row.
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint() // read by the degree count AND the moment scan
    val deg = und.select(explode(array(col("a"), col("b"))).as("host"))
      .groupBy(col("host")).agg(count(lit(1)).as("d"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    und
      .join(broadcast(deg.select(col("host").as("a"), col("d").as("j"))), Seq("a"))
      .join(broadcast(deg.select(col("host").as("b"), col("d").as("k"))), Seq("b"))
      .agg(
        count(lit(1)).as("m_edges"),
        sum(col("j") * col("k")).as("sum_jk"),
        sum(col("j") + col("k")).as("sum_j_plus_k"),
        sum(dec(col("j")) * col("j") + dec(col("k")) * col("k"))
          .as("sum_j2_plus_k2"))
      .select(col("m_edges"), col("sum_jk"), col("sum_j_plus_k"),
        col("sum_j2_plus_k2").cast("long").as("sum_j2_plus_k2"),
        when(
          dec(lit(2L)) * col("m_edges") * col("sum_j2_plus_k2") -
            dec(col("sum_j_plus_k")) * col("sum_j_plus_k") =!= dec(lit(0L)),
          expr("""((CAST(4 AS DECIMAL(38,0)) * m_edges * sum_jk
                 |  - CAST(sum_j_plus_k AS DECIMAL(38,0)) * sum_j_plus_k) * 1000000)
                 |div
                 |(CAST(2 AS DECIMAL(38,0)) * m_edges * sum_j2_plus_k2
                 |  - CAST(sum_j_plus_k AS DECIMAL(38,0)) * sum_j_plus_k)"""
            .stripMargin).cast("long"))
          .as("assortativity_ppm"))
  }

  /** Neighborhood-overlap LINK PREDICTION (Liben-Nowell & Kleinberg,
    * CIKM'03) over the undirected host graph: for every NON-adjacent
    * host pair sharing at least `minCommon` neighbors, the three classic
    * integer-exact signals — common-neighbor count, neighborhood Jaccard
    * (ppm, one truncating div), and preferential attachment deg·deg. In
    * a crawl pipeline this is the "hosts that should link but don't"
    * read: frontier prioritization and mirror-site discovery (two
    * mirrors share most of their link neighborhoods long before they
    * link each other).
    *
    * Exactness: adjacency is the canonical distinct undirected edge set,
    * so `common_cnt` is true set intersection, `union_cnt = deg_a +
    * deg_b − common_cnt` is true set union (a ∉ N(b) for emitted pairs
    * — they are non-edges — and self-loops are dropped), and
    * `jaccard_ppm = (common · 10⁶) div union` truncates identically on
    * both engines.
    *
    * Scale shape: pairs materialize through the wedge join (adjacency ⋈
    * adjacency on the shared neighbor) — O(Σ_z deg(z)²) like
    * [[triangleCounts]]' wedge stage, hosts-bounded, never corpus-
    * bounded. On graphs with mega-hubs pass `maxWedgeDegree` to exclude
    * hub intermediates from wedge formation (the d20 hot-key cap: a
    * documented recall trade — pairs whose ONLY shared neighbors are
    * hubs disappear, and common counts ignore hub neighbors); the
    * default None is exact. The degree table is hosts-bounded and
    * broadcasts onto the pair frame; the existing-edge anti-join is
    * edge-keyed, map-side prunable.
    *
    * Output: (a, b, common_cnt, deg_a, deg_b, union_cnt, jaccard_ppm,
    * pref_attach), a < b lexicographically, common_cnt ≥ minCommon.
    */
  def linkPrediction(edges: DataFrame, minCommon: Long = 2L,
                     maxWedgeDegree: Option[Long] = None): DataFrame = {
    require(minCommon >= 1, "minCommon must be at least 1")
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint() // feeds adjacency (twice via union) + the anti-join
    val adj = und.select(col("a").as("host"), col("b").as("nbr"))
      .unionAll(und.select(col("b").as("host"), col("a").as("nbr")))
    val deg = adj.groupBy(col("host")).agg(count(lit(1)).as("d"))
    val wedgeAdj = maxWedgeDegree match {
      case Some(cap) => adj.join(
        broadcast(deg.where(col("d") <= cap).select(col("host").as("nbr"))),
        Seq("nbr"), "left_semi")
      case None => adj
    }
    val commons = wedgeAdj.as("x").join(wedgeAdj.as("y"),
        col("x.nbr") === col("y.nbr") && col("x.host") < col("y.host"))
      .groupBy(col("x.host").as("a"), col("y.host").as("b"))
      .agg(count(lit(1)).as("common_cnt"))
      .where(col("common_cnt") >= minCommon)
      .join(und, Seq("a", "b"), "left_anti") // predict only NON-edges
    commons
      .join(broadcast(deg.select(col("host").as("a"), col("d").as("deg_a"))), Seq("a"))
      .join(broadcast(deg.select(col("host").as("b"), col("d").as("deg_b"))), Seq("b"))
      .select(col("a"), col("b"), col("common_cnt"), col("deg_a"), col("deg_b"),
        (col("deg_a") + col("deg_b") - col("common_cnt")).as("union_cnt"))
      .withColumn("jaccard_ppm", graft.textops.TextAnalysis.intDiv(
        col("common_cnt") * lit(1000000L), col("union_cnt")))
      .withColumn("pref_attach", col("deg_a") * col("deg_b"))
  }

  /** LOCAL clustering coefficient (Watts & Strogatz 1998, "Collective
    * dynamics of 'small-world' networks") per host — the normalized read
    * [[triangleCounts]]' raw corner counts feed: of the d·(d−1)/2
    * possible edges among v's neighbors, what fraction exists,
    * `lcc_ppm = (2 · tri(v) · 10⁶) div (d·(d−1))` on the undirected
    * host graph (the g05 edge convention exactly — one definition of
    * `und` would be nicer but the two ops share it via
    * [[triangleCounts]] itself: this op CALLS it). The density-vs-
    * centrality read per node: a link farm's hosts sit near 10⁶, a hub
    * bridging unrelated communities near 0 — the per-node complement of
    * [[degreeAssortativity]]'s one global number.
    *
    * Hosts with degree < 2 have no possible wedge: `lcc_ppm` is NULL
    * for them (absence, not zero — the value_min/value_max discipline),
    * while degree and triangle count still report.
    *
    * Scale shape: [[triangleCounts]]' O(m^1.5) compact-forward pass
    * plus one degree groupBy and one left join — both hosts-bounded.
    */
  def localClustering(edges: DataFrame): DataFrame = {
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("host"))
      .groupBy(col("host")).agg(count(lit(1)).as("degree"))
    val tri = triangleCounts(edges)
      .select(col("host").as("__th"), col("n_triangles"))
    deg.join(tri, col("host") === col("__th"), "left")
      .select(col("host"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("lcc_ppm",
        when(col("degree") >= 2,
          expr("(2L * n_triangles * 1000000L) div (degree * (degree - 1L))")))
  }

  /** Radius-bounded STRESS centrality (Shimbel 1953; the integer sibling
    * of betweenness) over the directed host graph, computed in the
    * Brandes shape (Brandes 2001, "A faster algorithm for betweenness
    * centrality", §6 variants) — the "how much shortest-path traffic
    * would a crawler route through this host" read that complements
    * [[harmonicCentrality]]'s "how close is it" and [[pageRank]]'s "how
    * endorsed is it".
    *
    * Engine-exact semantics (a defined snapshot, not convergence lore):
    * over ordered host pairs (s, t) with BFS distance 1 ≤ d(s,t) ≤
    * `radius` on the deduplicated self-loop-free directed edge frame,
    * stress(v) = Σ σ_st(v) — the number of shortest s→t paths with v as
    * an INTERIOR node. Everything is path COUNTING, so unlike
    * betweenness there is no σ_sv/σ_st division and every value is an
    * exact BIGINT both engines replay bit-for-bit. The Brandes
    * decomposition used on both sides: a forward frontier chain
    * computing (s, v, d, σ) with σ merged as sum-over-predecessors at
    * first reach, then a backward pass over the shortest-path DAG
    * computing the integer continuation count
    * φ_s(v) = Σ_{w ∈ succ_s(v)} (1 + φ_s(w)) — the number of shortest
    * suffix paths from v to ANY t within the radius — and finally
    * stress(v) = Σ_{s ≠ v} σ(s,v) · φ_s(v). No (ball × ball) pair join
    * ever materializes: the DAG successor frame is edges ⋈ reach
    * (Θ(sources·m) rows, the Brandes bound), and each round is one
    * (s,v)-keyed map-side-combinable shuffle.
    *
    * Alongside the exact column rides `stress_est`, the SAMPLED-SOURCES
    * estimate (Brandes–Pich 2007, "Centrality estimation in large
    * networks": pivot sources, here the deterministic portable slice
    * `md5Long60(s) % sampleMod == 0` so DuckDB draws the identical
    * pivots) scaled by n_hosts div n_pivots on the integer channel.
    * At fixture scale the estimate is hash-compared like any column; at
    * web scale the pivot set is what you can afford — exact all-sources
    * stress is Θ(n·m) and the estimate's Θ(|S|·m) with a fixed pivot
    * budget is the published answer, the same truth/estimate division
    * of labor as [[harmonicGate]].
    *
    * Scale shape: the forward chain is `radius` rounds of ONE
    * (s,v)-keyed combined shuffle each (frontier ⋈ edge scan, min-d/σ
    * merged map-side), `localCheckpoint` per round — the k-means/CC
    * lineage-truncation pattern; the DAG successor frame materializes
    * once; the backward pass then stays LAZY (each single-depth slice
    * reads only checkpoint leaves, so the plan is small and the whole
    * φ chain + σ·φ contraction runs as one job). Deliberately NO
    * broadcast hints: the iterated frames are (sources × ball)-bounded
    * — too big to broadcast on a 10⁸-host graph — and the measured
    * local cost of per-round broadcast collects was 2–3× the shuffle
    * join (8.5–10.2 s vs 3.2 s at sf0.1), so the local plan and the
    * 1000-executor plan keep the SAME shape. A fully lazy variant
    * (persist-only, no checkpoints) was also rejected by measurement:
    * the self-referential lineage makes Catalyst analysis exponential
    * (60 s at sf0.1). State is always (sources × reached-nodes)-bounded
    * rows of scalars — raw edges are scanned, never carried.
    *
    * Returns one row per host: (host, stress, stress_est), zeros for
    * hosts no shortest path crosses.
    */
  def stressCentrality(edges: DataFrame, radius: Int = 3,
                       sampleMod: Long = 4L): DataFrame = {
    require(radius >= 1, "radius must be at least 1")
    require(sampleMod >= 1L, "sampleMod must be at least 1")
    import graft.functions.PortableHash
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .persist()
    val nodes = edges.select(col("src").as("host"))
      .unionAll(edges.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint()
    // ---- forward: (s, v, d, sig) — distance + shortest-path count ----
    var reach = nodes.select(col("host").as("s"), col("host").as("v"),
      lit(0).as("d"), lit(1L).as("sig"))
    var round = 1
    while (round <= radius) {
      val cand = reach.where(col("d") === round - 1).as("f")
        .join(e.as("e"), col("f.v") === col("e.src"))
        .select(col("f.s").as("s"), col("e.dst").as("v"),
          lit(round).as("d"), col("f.sig").as("sig"))
      // one combined shuffle: min-d keeps the first reach; σ is the old
      // row's count if already reached, else the sum of this round's
      // predecessor contributions (new rows all carry d == round)
      reach = reach.unionAll(cand)
        .groupBy(col("s"), col("v"))
        .agg(min(col("d")).as("d"),
          max(when(col("d") < round, col("sig"))).as("__old"),
          sum(when(col("d") === round, col("sig"))).as("__new"))
        .select(col("s"), col("v"), col("d"),
          coalesce(col("__old"), col("__new")).as("sig"))
        .localCheckpoint() // reused: next round, DAG sides, contraction
      round += 1
    }
    // ---- shortest-path DAG: v → w successor iff d(s,w) = d(s,v) + 1 ----
    val succ = e.as("e").join(reach.as("a"), col("a.v") === col("e.src"))
      .join(reach.as("b"),
        col("b.s") === col("a.s") && col("b.v") === col("e.dst") &&
          col("b.d") === col("a.d") + 1)
      .select(col("a.s").as("s"), col("a.v").as("v"),
        col("a.d").as("dv"), col("b.v").as("w"))
      .localCheckpoint() // sliced once per backward round
    e.unpersist()
    // ---- backward: φ(v) = Σ_{w∈succ(v)} (1 + φ(w)), deepest layer up ----
    var phiLevel = reach.where(col("d") === radius)
      .select(col("s"), col("v"), lit(0L).as("phi"))
    var phiAll = phiLevel
    var k = radius - 1
    while (k >= 0) {
      phiLevel = succ.where(col("dv") === k)
        .join(phiLevel.select(col("s"), col("v").as("w"), col("phi")),
          Seq("s", "w"), "left")
        .groupBy(col("s"), col("v"))
        .agg(sum(lit(1L) + coalesce(col("phi"), lit(0L))).as("phi"))
      phiAll = phiAll.unionAll(phiLevel)
      k -= 1
    }
    // ---- stress(v) = Σ_s σ(s,v)·φ_s(v) over interior v (d ≥ 1) ----
    val contrib = reach.where(col("d") >= 1)
      .join(phiAll, Seq("s", "v"))
      .select(col("s"), col("v"), (col("sig") * col("phi")).as("c"))
      .localCheckpoint() // feeds the exact AND the sampled contraction
    val sampledSrc = pmod(PortableHash.md5Long60(col("s")), lit(sampleMod)) === 0
    val exact = contrib.groupBy(col("v").as("__ve"))
      .agg(sum(col("c")).as("stress"))
    val sampled = contrib.where(sampledSrc)
      .groupBy(col("v").as("__vs")).agg(sum(col("c")).as("__ssum"))
    val cnts = nodes.agg(count(lit(1)).as("__n_all"),
      sum((pmod(PortableHash.md5Long60(col("host")), lit(sampleMod)) === 0)
        .cast("long")).as("__n_samp"))
    nodes.crossJoin(broadcast(cnts))
      .join(exact, col("host") === col("__ve"), "left")
      .join(sampled, col("host") === col("__vs"), "left")
      .select(col("host"),
        coalesce(col("stress"), lit(0L)).as("stress"),
        coalesce(graft.textops.TextAnalysis.intDiv(
          col("__ssum") * col("__n_all"), col("__n_samp")), lit(0L))
          .as("stress_est"))
  }

  /** Newman MODULARITY (Newman & Girvan 2004, "Finding and evaluating
    * community structure in networks") of a labeled partition over the
    * undirected host graph — the measured-quality gate for
    * [[labelPropagation]]'s communities, closing the repo's own loop
    * ("an algorithm isn't done until its output quality is measured"):
    * g06 produces a partition, this op SCORES it, per community.
    *
    * Engine-exact semantics on [[labelPropagation]]'s exact edge
    * convention (symmetrized, self-loop-free, distinct; m = undirected
    * edge count, degree = symmetric-neighbor count): per community c,
    *   q_ppm(c) = (10⁶ · m_c) div m − (10⁶ · D_c²) div (4m²)
    * with m_c = internal undirected edges, D_c = Σ degrees — Newman's
    * per-community contribution, two truncating integral divisions in a
    * fixed order (both operands non-negative, so Spark's `div` and
    * DuckDB's `//` agree), D_c² on the DECIMAL(38,0) channel (the
    * [[degreeAssortativity]] device) so a 10⁸-degree-sum community
    * cannot overflow. Σ_c q_ppm ≈ the partition's total Q — positive
    * communities are denser than chance, negative ones worse than
    * random, the read a crawl-dedup policy acts on before trusting
    * g06's labels.
    *
    * Scale shape: degrees are ONE map-side-combinable groupBy; internal
    * edges are the undirected frame joined twice against the
    * hosts-bounded label frame (broadcast by default — `broadcastLabels
    * = false` is the [[pageRank]] hatch for 10⁸-host graphs, turning
    * them into shuffle equi-joins); everything downstream is
    * communities-bounded. m is the only driver scalar (the [[pageRank]]
    * N convention).
    *
    * Returns (community, n_hosts, m_internal, degree_sum, q_ppm).
    */
  def modularity(edges: DataFrame, labels: DataFrame,
                 broadcastLabels: Boolean = true): DataFrame = {
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionAll(edges.select(col("dst").as("u"), col("src").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    val und = sym.where(col("u") < col("v"))
    val m = und.count()
    require(m > 0, "modularity needs at least one undirected edge")
    val lab = labels.select(col("host"), col("community")).localCheckpoint()
    def maybeB(df: DataFrame) = if (broadcastLabels) broadcast(df) else df
    val internal = und
      .join(maybeB(lab.select(col("host").as("u"), col("community").as("cu"))),
        Seq("u"))
      .join(maybeB(lab.select(col("host").as("v"), col("community").as("cv"))),
        Seq("v"))
      .where(col("cu") === col("cv"))
      .groupBy(col("cu").as("community")).agg(count(lit(1)).as("m_internal"))
    val deg = sym.groupBy(col("u").as("host")).agg(count(lit(1)).as("d"))
    lab.join(deg, Seq("host"), "left")
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_hosts"),
        sum(coalesce(col("d"), lit(0L))).as("degree_sum"))
      .join(internal, Seq("community"), "left")
      .select(col("community"), col("n_hosts"),
        coalesce(col("m_internal"), lit(0L)).as("m_internal"),
        col("degree_sum"))
      .withColumn("q_ppm",
        expr(s"(1000000L * m_internal) div ${m}L") -
          expr(s"""(CAST(1000000 AS DECIMAL(38,0)) * degree_sum * degree_sum)
                  |div (CAST(4 AS DECIMAL(38,0)) * ${m}L * ${m}L)"""
            .stripMargin).cast("long"))
  }

  def weakComponents(edges: DataFrame, propagationRounds: Int = 8): DataFrame = {
    import graft.functions.PortableHash
    val names = edges.select(col("src").as("host"))
      .unionAll(edges.select(col("dst").as("host")))
      .distinct()
    val ids = names.select(col("host"), PortableHash.md5Long60(col("host")).as("id"))
    val pairs = edges.select(
      PortableHash.md5Long60(col("src")).as("a"),
      PortableHash.md5Long60(col("dst")).as("b")).distinct()
    val comp = graft.dedup.Dedup.connectedComponents(pairs, propagationRounds)
    ids.join(comp, ids("id") === comp("node"))
      .select(col("host"), col("component"))
  }
}
