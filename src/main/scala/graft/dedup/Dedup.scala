package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, VecDot}
import graft.textops.TextAnalysis

/** Deduplication operators for training-data pipelines, over
  * `documents(doc_id, text, ...)` and `embeddings(vec_id, embedding, ...)`.
  *
  * Scale design (the reason each variant exists):
  *
  *  - [[exactGroups]]: hash-groupBy — one shuffle on a 128-bit digest, never
  *    on raw text; group count ≈ distinct docs, no skew (md5 is uniform).
  *  - [[minhashLshPairs]]: the 100 TB near-dup workhorse. Cost is linear in
  *    corpus size: shingle → 64-way min (map-side combinable groupBy) →
  *    band keys → equi-join on (band, key). No O(n²) anywhere; candidate
  *    pairs ≪ n² by LSH design, then verified on the tiny signature table.
  *  - [[simhashPairs]]: 60-bit fingerprint per doc (one aggregate), then
  *    Hamming-≤h pairing WITHOUT a cross join: pigeonhole blocking — split
  *    60 bits into h+1 chunks; any pair within distance h agrees on ≥1
  *    whole chunk, so an equi-join on (chunk_idx, chunk_value) finds every
  *    such pair. Cross join only inside blocks.
  *  - [[ngramJaccardPairs]]: exact Jaccard via an inverted shingle index
  *    (explode → equi-join on shingle → count), with an optional document-
  *    frequency cap to bound hot-shingle blowup at scale.
  *  - [[cosineNearDupPairs]]: exact all-pairs baseline (broadcast
  *    nested-loop, fine to ~10^4 vectors); the sub-quadratic scale path is
  *    the IVF/LSH bucketing in [[graft.similarity.Ann]].
  *
  * All hashes are md5-derived ([[PortableHash]]) so the DuckDB oracle
  * reproduces every value bit-for-bit; all ratios are integer ppm.
  */
object Dedup {

  // ---------------------------------------------------------------- exact --

  /** Exact dedup groups: key = md5(text); keeper = min doc_id per group.
    * `n_docs > 1` rows are the duplicate clusters to drop.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(PortableHash.md5Hex(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_docs"))

  // ------------------------------------------------------------- shingles --

  /** Distinct word-k-gram shingles, exploded to (doc_id, shingle).
    *
    * Deliberately a TYPED flatMap, not `explode(transform(...))`: the
    * higher-order-function route is an optimizer trap — on some plan shapes
    * (V2 writes) the token-split projection gets inlined into the k-gram
    * lambda, which interpreted HOFs then re-evaluate PER ELEMENT, turning
    * the shingle scan into O(len²) per document (observed as 10-100×
    * run-to-run swings). The flatMap splits each document exactly once, is
    * partition-local (no shuffle), and everything downstream (hashing,
    * aggregation, joins) stays declarative and codegen'd. Semantics are
    * bit-identical: `split(text,' ',-1)` / `concat_ws` / first-occurrence
    * distinct.
    */
  def shingles(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        if (toks.length < k) Iterator.empty
        else toks.sliding(k).map(w => (id, w.mkString(" "))).distinct
      }
      .toDF("doc_id", "shingle")
  }

  /** Every word-k-gram occurrence WITH its 1-based token start position —
    * the positional index behind [[substringRuns]]. Unlike [[shingles]]
    * there is deliberately no within-doc distinct: run detection needs
    * every occurrence. Same typed-flatMap rationale as [[shingles]]
    * (split once, partition-local, no HOF re-evaluation trap).
    */
  def positionedShingles(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        if (toks.length < k) Iterator.empty
        else toks.sliding(k).zipWithIndex.map { case (w, i) =>
          (id, (i + 1).toLong, w.mkString(" "))
        }
      }
      .toDF("doc_id", "pos", "shingle")
  }

  /** Corpus-wide duplicated-SPAN scrub — the APPLY step of exact
    * substring dedup (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better": remove any span that appears
    * verbatim elsewhere in the corpus, not just whole-document dups):
    * every token covered by a word-k-gram occurring ≥ `minCount` times
    * across the corpus is masked out, and each doc re-emits with its
    * kept tokens plus the mask accounting.
    *
    * Scale shape: the gram frequency pass is the [[positionedShingles]]
    * explode + ONE map-side-combined groupBy over 60-bit md5 gram
    * digests (digest-sized grams cross the shuffle, never text — same
    * hashing convention, and the same negligible-collision trade, as
    * [[substringRuns]]); hot START positions come back to each doc
    * as one sorted integer array via a left-semi join + per-doc collect
    * (bounded by doc length); the scrub itself is a per-doc codegen'd
    * filter — token i is kept iff no hot gram starts in (i-k, i] — so
    * text never shuffles. Per-token cost is O(hot starts in the doc),
    * the span-sparse common case.
    */
  def spanScrub(docs: DataFrame, k: Int = 5, minCount: Long = 3L): DataFrame = {
    val grams = positionedShingles(docs, k)
      .select(col("doc_id"), col("pos"),
        PortableHash.md5Long60(col("shingle")).as("gh"))
    val hot = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") >= minCount)
      .select(col("gh"))
    val hotStarts = grams.join(hot, Seq("gh"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("__starts"))
    docs.join(hotStarts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        coalesce(col("__starts"),
          array().cast("array<bigint>")).as("__s"))
      .select(col("doc_id"), split(col("text"), " ", -1).as("__t"), col("__s"))
      .select(col("doc_id"),
        size(col("__t")).cast("long").as("n_tokens"),
        filter(col("__t"), (t, i) => !exists(col("__s"),
          p => p <= i.cast("long") + lit(1L) &&
            i.cast("long") + lit(1L) < p + lit(k.toLong)))
          .as("__kept"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("__kept")).cast("long")).as("n_masked"),
        array_join(col("__kept"), " ").as("scrubbed"))
  }

  /** Verbatim-substring duplication between document pairs, the signal of
    * suffix-array substring dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better") re-expressed as a
    * distributed k-gram-run join instead of a monolithic suffix array:
    * a shared token span of length L ≥ k appears as L−k+1 CONSECUTIVE
    * matching k-gram occurrences on one (doc_a, doc_b, pa−pb) diagonal,
    * so maximal shared substrings fall out of gaps-and-islands over the
    * positional gram index. Output per pair: every maximal shared run of
    * ≥ `minTokens` tokens → (doc_a, doc_b, n_runs, max_run_tokens).
    *
    * Scale shape: the shuffle carries (60-bit digest, doc, pos) rows —
    * never text; grams occurring more than `maxOcc` times corpus-wide are
    * dropped before the join (each contributes O(occ²) candidate rows;
    * boilerplate grams are exactly the non-discriminative ones — same
    * approximation lever, and the same documented trade-off, as
    * [[ngramJaccardPairs]]'s `maxDocFreq`). The islands window partitions
    * by (pair, diagonal) — cardinality ≈ candidate rows, no global sort.
    */
  def substringRuns(docs: DataFrame, k: Int = 8, minTokens: Int = 12,
                    maxOcc: Long = 50L): DataFrame = {
    val g = positionedShingles(docs, k)
      .select(col("doc_id"), col("pos"), PortableHash.md5Long60(col("shingle")).as("gh"))
    val wOcc = Window.partitionBy(col("gh"))
    val cold = g.withColumn("__occ", count(lit(1)).over(wOcc))
      .where(col("__occ") <= maxOcc).drop("__occ")
    val cand = cold.as("x").join(cold.as("y"),
        col("x.gh") === col("y.gh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.pos").as("pa"), (col("x.pos") - col("y.pos")).as("diag"))
    // consecutive pa on one diagonal share (pa − row_number) — the island id
    val wDiag = Window.partitionBy(col("a"), col("b"), col("diag")).orderBy(col("pa"))
    val runs = cand
      .withColumn("__grp", col("pa") - row_number().over(wDiag))
      .groupBy(col("a"), col("b"), col("diag"), col("__grp"))
      .agg((count(lit(1)) + lit(k - 1)).as("run_tokens"))
      .where(col("run_tokens") >= minTokens)
    runs.groupBy(col("a").as("doc_a"), col("b").as("doc_b"))
      .agg(count(lit(1)).as("n_runs"), max(col("run_tokens")).as("max_run_tokens"))
  }

  /** WITHIN-document repeated spans — [[substringRuns]]'s self-diagonal:
    * a token span repeated inside one document shows up as consecutive
    * matching k-gram occurrences on a (doc, pos₂−pos₁ ≠ 0) diagonal of
    * the SAME document. The copy-paste/spam signal Gopher's dup-word
    * ratios summarize is located exactly here (longest internal repeat +
    * repeat count per doc). Same occurrence cap and islands machinery;
    * `pos₁ < pos₂` orients each repeat pair once.
    * Output: (doc_id, n_repeats, max_repeat_tokens).
    */
  def selfRepeats(docs: DataFrame, k: Int = 4, minTokens: Int = 6,
                  maxOcc: Long = 50L): DataFrame = {
    val g = positionedShingles(docs, k)
      .select(col("doc_id"), col("pos"), PortableHash.md5Long60(col("shingle")).as("gh"))
    val wOcc = Window.partitionBy(col("gh"))
    val cold = g.withColumn("__occ", count(lit(1)).over(wOcc))
      .where(col("__occ") <= maxOcc).drop("__occ")
    val cand = cold.as("x").join(cold.as("y"),
        col("x.gh") === col("y.gh") && col("x.doc_id") === col("y.doc_id") &&
          col("x.pos") < col("y.pos"))
      .select(col("x.doc_id").as("d"), col("x.pos").as("pa"),
        (col("y.pos") - col("x.pos")).as("diag"))
    val wDiag = Window.partitionBy(col("d"), col("diag")).orderBy(col("pa"))
    val runs = cand
      .withColumn("__grp", col("pa") - row_number().over(wDiag))
      .groupBy(col("d"), col("diag"), col("__grp"))
      .agg((count(lit(1)) + lit(k - 1)).as("run_tokens"))
      .where(col("run_tokens") >= minTokens)
    runs.groupBy(col("d").as("doc_id"))
      .agg(count(lit(1)).as("n_repeats"), max(col("run_tokens")).as("max_repeat_tokens"))
  }

  // -------------------------------------------------------- MinHash + LSH --

  /** MinHash hash family via Kirsch–Mitzenmacher double hashing: ONE md5
    * per shingle yields two 55/60-bit integers (h1, h2); family member i is
    * `(h1 + i·h2) mod P` with P = 2^61−1. Asymptotically as good as k
    * independent hashes (Kirsch & Mitzenmacher, ESA'06) at 1/64th the
    * hashing cost — the md5, not the arithmetic, dominates the map side.
    * All operands stay < 2^62, so the same expression runs overflow-free as
    * DuckDB BIGINT arithmetic (bit-for-bit oracle parity).
    */
  private val P: Long = (1L << 61) - 1

  /** sig[i] = MIN over the doc's shingles of ((h1 + i·h2) mod P).
    * One groupBy with `numHashes` min-aggregates: fully map-side combinable,
    * signature size is O(numHashes) per doc regardless of doc length.
    */
  def minhashSignatures(docs: DataFrame, k: Int = 3, numHashes: Int = 64): DataFrame = {
    val sh = shingles(docs, k)
    // h1: md5 hex chars 1–15 (60 bits); h2: chars 16–29 mod 2^55 (so that
    // i·h2 ≤ 63·2^55 < 2^61 never overflows a signed 64-bit value)
    val hx = md5(col("shingle").cast("binary"))
    val h1 = conv(substring(hx, 1, 15), 16, 10).cast("long")
    val h2 = pmod(conv(substring(hx, 16, 14), 16, 10).cast("long"), lit(1L << 55))
    val hashed = sh.select(col("doc_id"), h1.as("h1"), h2.as("h2"))
    val mins = (0 until numHashes).map(i =>
      min(pmod(col("h1") + lit(i.toLong) * col("h2"), lit(P))).as(s"h$i"))
    hashed.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** (band_idx, band_key) rows for LSH bucketing: key = md5 of the band's
    * `rowsPerBand` signature slots joined with ','.
    */
  private def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(
        b.as("band"),
        md5(concat_ws(",",
          transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), x => x.cast("string"))
        ).cast("binary")).as("key")))

  /** MinHash + LSH near-duplicate pairs.
    *
    * bands=16 × rows=4 over 64 hashes ⇒ candidate threshold ≈ (1/16)^(1/4)
    * ≈ 0.5 Jaccard (the S-curve knee). Candidates from the band equi-join
    * are then verified on signatures: est = matching slots / numHashes,
    * kept when est_ppm ≥ tauPpm.
    *
    * Output: (a, b, est_ppm), a < b.
    */
  def minhashLshPairs(docs: DataFrame, k: Int = 3, numHashes: Int = 64,
                      bands: Int = 16, tauPpm: Long = 500000L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rpb = numHashes / bands
    // The signature table feeds THREE consumers (the band explode and both
    // sides of the candidate verify join, which shuffle by different keys
    // so no exchange reuse fires) — without a checkpoint the shingle
    // flatMap + 64-way min aggregation re-runs per consumer, tripling the
    // dominant cost. Lazy localCheckpoint: docs-bounded (numHashes longs
    // per doc), materializes once (the connectedComponents discipline).
    val sig = minhashSignatures(docs, k, numHashes).localCheckpoint(eager = false)
    val banded = sig.select(
      col("doc_id"),
      explode(bandKeys(col("sig"), bands, rpb)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val matches = size(filter(
      zip_with(col("sa.sig"), col("sb.sig"), (x, y) => x === y),
      m => m)).cast("long")
    cand
      .join(sig.as("sa"), col("a") === col("sa.doc_id"))
      .join(sig.as("sb"), col("b") === col("sb.doc_id"))
      .select(col("a"), col("b"),
        TextAnalysis.intDiv(matches * lit(1000000L), lit(numHashes.toLong)).as("est_ppm"))
      .where(col("est_ppm") >= tauPpm)
  }

  /** MinHash calibration: signature-agreement ESTIMATE vs exact Jaccard
    * for every LSH candidate pair — the accept/reject gate for (k,
    * numHashes, bands) parameter choices, exactly as [[graft.similarity.Ann.recallAtK]]
    * gates an ANN index. est_ppm comes from [[minhashLshPairs]] unchanged;
    * the exact Jaccard is computed ONLY for candidate docs: the shingle
    * index is first semi-joined down to docs appearing in some candidate
    * pair, so the exact pass — the expensive one — is candidate-bounded
    * instead of corpus-bounded (tighter than d04's full inverted-index
    * join; sizes join is candidate-bounded too, hence broadcastable).
    * A band collision with zero shared shingles surfaces as jaccard 0.
    * Output: (a, b, est_ppm, jaccard_ppm, err_ppm).
    */
  /** Pairwise content overlap between corpus SLICES (default: the
    * `source` column): MinHash-estimated Jaccard of each slice's
    * DISTINCT-shingle set — the "how much does snapshot/source A
    * duplicate source B" read that sets mixing weights and dedup order
    * when combining crawl snapshots or data sources.
    *
    * The key algebraic fact: min over a slice's shingle hashes IS the
    * MinHash signature of the slice's union-of-shingle-sets (min commutes
    * with set union, and duplicate occurrences cannot change a min — so
    * no DISTINCT is ever materialized). The whole model is therefore ONE
    * map-side-combinable `groupBy(slice)` aggregate producing `numHashes`
    * longs per slice; nothing wider than (slice, h1, h2) digests ever
    * shuffles, and the pairwise estimate runs over the slices-bounded
    * signature table (an explicit broadcast self-join — slices², tiny).
    * The hash family is [[minhashSignatures]]'s exactly, so estimates are
    * calibrated by the same d18 gate.
    *
    * Output: (src_a, src_b, est_ppm), src_a < src_b lexicographically.
    */
  def corpusOverlap(docs: DataFrame, k: Int = 3, numHashes: Int = 64,
                    sliceCol: String = "source"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = docs.select(col(sliceCol).cast("string"), col("text"))
      .as[(String, String)]
      .flatMap { case (s, text) =>
        val toks = text.split(" ", -1)
        if (toks.length < k) Iterator.empty
        else toks.sliding(k).map(w => (s, w.mkString(" ")))
      }
      .toDF("slice", "shingle")
    val hx = md5(col("shingle").cast("binary"))
    val h1 = conv(substring(hx, 1, 15), 16, 10).cast("long")
    val h2 = pmod(conv(substring(hx, 16, 14), 16, 10).cast("long"), lit(1L << 55))
    val hashed = sh.select(col("slice"), h1.as("h1"), h2.as("h2"))
    val mins = (0 until numHashes).map(i =>
      min(pmod(col("h1") + lit(i.toLong) * col("h2"), lit(P))).as(s"h$i"))
    val sig = hashed.groupBy(col("slice"))
      .agg(mins.head, mins.tail: _*)
      .select(col("slice"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
    val matches = size(filter(
      zip_with(col("x.sig"), col("y.sig"), (a, b) => a === b),
      m => m)).cast("long")
    sig.as("x").crossJoin(broadcast(sig.as("y")))
      .where(col("x.slice") < col("y.slice"))
      .select(col("x.slice").as("src_a"), col("y.slice").as("src_b"),
        graft.textops.TextAnalysis.intDiv(matches * lit(1000000L),
          lit(numHashes.toLong)).as("est_ppm"))
  }

  /** Cross-source overlap by HLL SET ALGEBRA with a measured gate — the
    * sketch-only scale path beside [[corpusOverlap]]'s minhash Jaccard:
    * per source pair, the exact distinct-shingle counts (|A|, |B|,
    * |A∩B| — the fixture-affordable truth, hash-compared) ride next to
    * the inclusion–exclusion estimate
    * `est∩ = est(A) + est(B) − est(A∪B)` computed ONLY from the two
    * per-source HLL sketches (`hll_union` is DataSketches' lossless
    * sketch union, so est(A∪B) needs no data pass), under the a01/g04
    * verdict: `within_eps` = |est∩ − |A∩B|| · 10⁶ ≤ epsPpm · (|A|+|B|).
    * Inclusion–exclusion compounds the three sketches' relative errors
    * against the (smaller) intersection, which is why the gate
    * normalizes by |A|+|B| — the published caveat (Dasgupta et al.,
    * "HLL set operations") stated as a measured bound, not lore.
    *
    * Scale shape: ONE distinct over (slice, shingle-digest) feeds both
    * sides (lazy checkpoint); the exact intersection is a digest-only
    * self-equi-join (Σ_g pairs, slices-bounded output); the sketch side
    * is slices-bounded rows crossed against a broadcast of themselves —
    * at web scale you keep ONLY the sketch columns and the estimate
    * costs slices² sketch unions, zero data passes: the whole point.
    *
    * Returns (src_a, src_b, n_a, n_b, n_common, within_eps).
    */
  def sketchOverlap(docs: DataFrame, k: Int = 3, sliceCol: String = "source",
                    epsPpm: Long = 50000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dist = docs.select(col(sliceCol).cast("string"), col("text"))
      .as[(String, String)]
      .flatMap { case (s, text) =>
        val toks = text.split(" ", -1)
        if (toks.length < k) Iterator.empty
        else toks.sliding(k).map(w => (s, w.mkString(" ")))
      }
      .toDF("slice", "shingle")
      .select(col("slice"),
        graft.functions.PortableHash.md5Long60(col("shingle")).as("g"))
      .distinct()
      .localCheckpoint(eager = false)
    val perSlice = dist.groupBy(col("slice"))
      .agg(count(lit(1)).as("n"), hll_sketch_agg(col("g")).as("sk"))
      .localCheckpoint(eager = false)
    val common = dist.as("x")
      .join(dist.as("y"),
        col("x.g") === col("y.g") && col("x.slice") < col("y.slice"))
      .groupBy(col("x.slice").as("__ca"), col("y.slice").as("__cb"))
      .agg(count(lit(1)).as("n_common"))
    val est = hll_sketch_estimate(col("a.sk")) +
      hll_sketch_estimate(col("b.sk")) -
      hll_sketch_estimate(hll_union(col("a.sk"), col("b.sk")))
    perSlice.as("a").crossJoin(broadcast(perSlice.as("b")))
      .where(col("a.slice") < col("b.slice"))
      .select(col("a.slice").as("src_a"), col("b.slice").as("src_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"), est.as("__est"))
      .join(common, col("src_a") === col("__ca") &&
        col("src_b") === col("__cb"), "left")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (abs(col("__est") - coalesce(col("n_common"), lit(0L))) *
          lit(1000000L) <= lit(epsPpm) * (col("n_a") + col("n_b")))
          .cast("long").as("within_eps"))
  }

  def minhashCalibration(docs: DataFrame, k: Int = 3, numHashes: Int = 64,
                         bands: Int = 16, tauPpm: Long = 300000L): DataFrame = {
    // the candidate table feeds BOTH the semi-join and the final join —
    // without a checkpoint the whole LSH pipeline (shingle → minhash →
    // band join) re-executes per consumer (measured 2× wall-clock); lazy
    // localCheckpoint materializes it once, and it is small by LSH design
    val est = minhashLshPairs(docs, k, numHashes, bands, tauPpm)
      .localCheckpoint(eager = false)
    val candDocs = est.select(col("a").as("doc_id"))
      .union(est.select(col("b").as("doc_id"))).distinct()
    val sh = shingles(docs, k).join(candDocs, Seq("doc_id"), "left_semi")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("c"))
    est
      .join(common, Seq("a", "b"), "left")
      .join(broadcast(sizes.as("na")), col("a") === col("na.doc_id"))
      .join(broadcast(sizes.as("nb")), col("b") === col("nb.doc_id"))
      .select(col("a"), col("b"), col("est_ppm"),
        coalesce(TextAnalysis.intDiv(col("c") * lit(1000000L),
          col("na.n") + col("nb.n") - col("c")), lit(0L)).as("jaccard_ppm"))
      .withColumn("err_ppm", abs(col("est_ppm") - col("jaccard_ppm")))
  }

  /** LSH candidates → EXACT character-level Levenshtein verify — the
    * templated-page near-dup read that shingle Jaccard blurs: two docs
    * differing by a handful of character edits (a date, a counter, a
    * typo fix) are CHARACTER-near even when the edits break enough word
    * 3-grams to drag estimated Jaccard toward the band threshold. Mirrors
    * the two-stage fuzzy-dedup shape of production pipelines (candidate
    * generation by MinHash bands, verification by edit distance).
    *
    * Candidates come from [[minhashLshPairs]] at a WIDE net (est_ppm ≥
    * candTauPpm, the d18 calibration threshold); each candidate pair then
    * pays one `levenshtein` — candidate-bounded by LSH design, never
    * corpus-quadratic. Kept when the length-relative similarity
    * `((max_len − lev) · 10⁶) div max_len` reaches simTauPpm —
    * integer-exact on both engines (truncating div, both operands
    * non-negative), equivalently `lev ≤ C(pair)` with
    * `C = (max_len · (10⁶ − simTau)) div 10⁶`.
    *
    * The verify is bounded three ways, all EXACT-semantics-preserving
    * (measured 1.1 G DP cells → 0.5 G pruned + banded at sf0.1):
    *  - `lev ≥ |len_a − len_b|`, so pairs with `|Δlen| > C` prune before
    *    any DP;
    *  - equal texts short-circuit to 0 (an O(len) compare, and exact-dup
    *    candidates are common in a dedup corpus);
    *  - the remaining pairs run Spark's BANDED `levenshtein(l, r, K)`
    *    with the constant `K = (global max text length · (10⁶ −
    *    simTau)) div 10⁶` — one driver-scalar aggregate (the k-means
    *    discipline). K ≥ C for every pair, so a −1 ("beyond the band")
    *    implies `lev > C`: rejected anyway; a banded hit is the exact
    *    distance.
    *
    * Scale shape: the texts join INTO the LSH-small candidate frame
    * (AQE sizes it broadcast); only candidate pairs' texts co-locate,
    * the corpus never self-joins on text.
    *
    * Output: (a, b, est_ppm, lev_edits, max_len, sim_ppm), a < b,
    * sim_ppm ≥ simTauPpm.
    */
  def editVerifiedPairs(docs: DataFrame, k: Int = 3, numHashes: Int = 64,
                        bands: Int = 16, candTauPpm: Long = 300000L,
                        simTauPpm: Long = 800000L): DataFrame = {
    require(simTauPpm >= 0 && simTauPpm <= 1000000L,
      "simTauPpm must be a ppm fraction in [0, 1000000]")
    // Explicit verify-parallelism repartition (r12, opt guide §2.5/§1.2):
    // AQE coalesces the candidate frame's exchange by BYTES (the id-pair
    // rows are ~24 B each), blind to the O(len·K) DP each row costs in the
    // banded-levenshtein verify below — measured: the whole verify ran as
    // ONE 2 s task at sf0.1 behind a 193 KB coalesced partition. The key
    // must NOT be (a, b) itself: that exactly matches the upstream
    // distinct's hashpartitioning, so Catalyst elides the repartition and
    // AQE coalesces the surviving exchange regardless (observed). The
    // spread()-style synthetic key (deterministic, 64× partition count —
    // retry-stable per SPARK-38388, even per guide §2.5) survives both:
    // an explicit REPARTITION_BY_NUM exchange AQE may not coalesce. It
    // moves three longs per candidate — the cheapest shuffle in the
    // query — and pins verify parallelism to the cluster size regardless
    // of how the planner attaches the texts.
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val cand = minhashLshPairs(docs, k, numHashes, bands, candTauPpm)
      .repartition(par, pmod(xxhash64(col("a"), col("b")), lit(par * 64)))
    val tx = docs.select(col("doc_id"), col("text"))
    val tauComp = 1000000L - simTauPpm
    // driver scalar: the longest text bounds every pair's edit cutoff
    val maxLenRow = docs.agg(max(length(col("text"))).cast("long")).head()
    val bandK = if (maxLenRow.isNullAt(0)) 1
      else math.max(1L, maxLenRow.getLong(0) * tauComp / 1000000L)
        .min(Int.MaxValue.toLong).toInt
    val cutoff = TextAnalysis.intDiv(col("max_len") * lit(tauComp), lit(1000000L))
    cand
      .join(tx.as("xa"), col("a") === col("xa.doc_id"))
      .join(tx.as("xb"), col("b") === col("xb.doc_id"))
      .withColumn("max_len",
        greatest(greatest(length(col("xa.text")), length(col("xb.text"))), lit(1))
          .cast("long"))
      .where(abs(length(col("xa.text")) - length(col("xb.text"))).cast("long")
        <= cutoff)
      .withColumn("lev_edits",
        when(col("xa.text") === col("xb.text"), lit(0L))
          .otherwise(levenshtein(col("xa.text"), col("xb.text"), bandK)
            .cast("long")))
      .where(col("lev_edits") >= 0L && col("lev_edits") <= cutoff)
      .withColumn("sim_ppm", TextAnalysis.intDiv(
        (col("max_len") - col("lev_edits")) * lit(1000000L), col("max_len")))
      .select(col("a"), col("b"), col("est_ppm"), col("lev_edits"),
        col("max_len"), col("sim_ppm"))
  }

  // -------------------------------------------------------------- SimHash --

  /** 60-bit SimHash per doc: token-count weighted bit votes over the 60-bit
    * md5 hash of each token; bit b of the fingerprint is set iff the signed
    * vote sum is > 0. One exploded groupBy(doc, token) + one groupBy(doc)
    * with 60 conditional sums — no per-bit row blowup.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val tokCounts = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .select(col("doc_id"), PortableHash.md5Long60(col("tok")).as("h"), col("c"))
    val bitSums = (0 until 60).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, col("c"))
        .otherwise(-col("c"))).as(s"s$b")
    }
    val voted = tokCounts.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 60).map(b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    voted.select(col("doc_id"), fp.as("simhash"))
  }

  /** Near-dup pairs with Hamming(simhash) ≤ maxHamming, found by pigeonhole
    * blocking: 60 bits split into maxHamming+1 chunks; a pair within the
    * distance budget must agree exactly on at least one chunk, so an
    * equi-join on (chunk_idx, chunk_value) has full recall with no n²
    * candidate generation. Output: (a, b, hamming), a < b.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    hammingCandidatePairs(simhash(docs), "simhash", bits = 60, maxHamming)

  /** The shared pigeonhole-blocking core for every Hamming-ball pair
    * finder (text SimHash here; perceptual media aHash in
    * `Multimodal.perceptualDupPairs`): `bits` split into maxHamming+1
    * chunks, a qualifying pair must agree exactly on ≥1 chunk, so an
    * equi-join on (chunk_idx, chunk_value) has full recall with no n²
    * candidate generation. ONE implementation so the blocking math can
    * never diverge between finders.
    *
    * `extraCols` are per-row identity columns (e.g. a frame index)
    * carried to the output as `a_<col>`/`b_<col>`. `maxBucketFreq` drops
    * (chunk, value) buckets seen in more than that many rows —
    * non-discriminative hot keys (low-entropy hashes) that would
    * otherwise go quadratic; recall only drops for pairs agreeing SOLELY
    * on such a bucket. The Hamming filter runs BEFORE the distinct, so
    * far-apart candidates never enter that shuffle. Output: (a, b,
    * per-side extras, hamming ≤ maxHamming), a < b, distinct.
    */
  private[graft] def hammingCandidatePairs(rows: DataFrame, hashCol: String,
                                           bits: Int, maxHamming: Int,
                                           extraCols: Seq[String] = Nil,
                                           maxBucketFreq: Option[Long] = None): DataFrame = {
    val nChunks = maxHamming + 1
    require(bits % nChunks == 0, s"$bits bits must split evenly into $nChunks chunks")
    val chunkBits = bits / nChunks
    val carried = col("doc_id") +: col(hashCol) +: extraCols.map(col)
    val chunks = rows.select(
      (carried :+ explode(array((0 until nChunks).map(j =>
        struct(lit(j).as("j"),
          shiftright(col(hashCol), j * chunkBits)
            .bitwiseAND(lit((1L << chunkBits) - 1)).as("v"))): _*)).as("ck")): _*)
      .select((carried :+ col("ck.j").as("j") :+ col("ck.v").as("v")): _*)
    val indexed = maxBucketFreq match {
      case Some(cap) =>
        val perBucket = Window.partitionBy(col("j"), col("v"))
        chunks.withColumn("__bf", count(lit(1)).over(perBucket))
          .where(col("__bf") <= cap).drop("__bf")
      case None => chunks
    }
    val sides = (p: String) => extraCols.map(e => col(s"$p.$e").as(s"${p}_$e"))
    indexed.as("a").join(indexed.as("b"),
        col("a.j") === col("b.j") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select((Seq(col("a.doc_id").as("a"), col("b.doc_id").as("b")) ++
        sides("a") ++ sides("b") :+
        bit_count(col(s"a.$hashCol").bitwiseXOR(col(s"b.$hashCol")))
          .cast("long").as("hamming")): _*)
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  // ------------------------------------------------------- n-gram Jaccard --

  /** Exact n-gram Jaccard near-dup pairs via an inverted shingle index:
    * explode distinct shingles → equi-join on shingle → per-pair common
    * count → Jaccard from per-doc shingle-set sizes. `maxDocFreq` drops
    * shingles present in more than that many docs (non-discriminative hot
    * keys that would otherwise quadratically blow up the index join at
    * scale); None = no cap.
    *
    * Output: (a, b, jaccard_ppm), a < b, jaccard_ppm ≥ tauPpm.
    */
  def ngramJaccardPairs(docs: DataFrame, k: Int = 3, tauPpm: Long = 500000L,
                        maxDocFreq: Option[Long] = None): DataFrame = {
    val sh = shingles(docs, k)
    val indexed = maxDocFreq match {
      case Some(cap) =>
        val freq = Window.partitionBy(col("shingle"))
        sh.withColumn("__df", count(lit(1)).over(freq)).where(col("__df") <= cap).drop("__df")
      case None => sh
    }
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = indexed.as("x").join(indexed.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(broadcast(sizes.as("na")), col("a") === col("na.doc_id"))
      .join(broadcast(sizes.as("nb")), col("b") === col("nb.doc_id"))
      .select(col("a"), col("b"),
        TextAnalysis.intDiv(col("common") * lit(1000000L),
          col("na.n") + col("nb.n") - col("common")).as("jaccard_ppm"))
      .where(col("jaccard_ppm") >= tauPpm)
  }

  /** Asymmetric n-gram CONTAINMENT pairs — |A∩B|/|A| and |A∩B|/|B|: the
    * subset-duplication signal Jaccard misses (a long doc quoting a short
    * one entirely scores low Jaccard but containment ≈ 1 on the short
    * side — the "document embedded in another" case). Same inverted-index
    * shape as [[ngramJaccardPairs]]; a pair is kept when EITHER direction
    * reaches `tauPpm`.
    *
    * `maxDocFreq` caps hot shingles exactly like [[ngramJaccardPairs]]:
    * a shingle present in more than that many docs is dropped from the
    * index join (its posting list alone contributes O(df²) candidate
    * rows). This is an APPROXIMATION with the standard cap trade-off:
    * `common` counts only cold shared shingles while denominators stay
    * uncapped, so pairs whose overlap is mostly hot shingles score lower
    * than exact (and can fall below tau) — hot shingles are precisely the
    * non-discriminative ones, which is why dropping them is the accepted
    * recall/cost lever. None = exact (the default, oracle-checked).
    */
  def containmentPairs(docs: DataFrame, k: Int = 3,
                       tauPpm: Long = 800000L,
                       maxDocFreq: Option[Long] = None): DataFrame = {
    val sh = shingles(docs, k)
    val indexed = maxDocFreq match {
      case Some(cap) =>
        val freq = Window.partitionBy(col("shingle"))
        sh.withColumn("__df", count(lit(1)).over(freq)).where(col("__df") <= cap).drop("__df")
      case None => sh
    }
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = indexed.as("x").join(indexed.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(broadcast(sizes.as("na")), col("a") === col("na.doc_id"))
      .join(broadcast(sizes.as("nb")), col("b") === col("nb.doc_id"))
      .select(col("a"), col("b"),
        TextAnalysis.intDiv(col("common") * lit(1000000L), col("na.n")).as("cont_a_ppm"),
        TextAnalysis.intDiv(col("common") * lit(1000000L), col("nb.n")).as("cont_b_ppm"))
      .where(col("cont_a_ppm") >= tauPpm || col("cont_b_ppm") >= tauPpm)
  }

  // --------------------------------------------- duplicate-cluster labels --

  /** Connected components over an undirected near-dup pair list (a, b):
    * the step that turns pairwise matches into actual dedup decisions
    * (component id = min doc_id of the cluster = the keeper; everything
    * else in the component drops).
    *
    * Iterative min-label propagation: label(v) ← min(label(v),
    * min(label(neighbors))) until fixpoint — converges in O(graph
    * diameter) rounds, and near-dup graphs are overwhelmingly small
    * cliques (diameter 1–2), so 2–3 shuffle rounds in practice. Each round
    * is one equi-join + one map-side-combined min aggregate;
    * `localCheckpoint` truncates the growing lineage.
    *
    * If the graph hasn't converged after `propagationRounds` rounds the
    * diameter is adversarial (long chains), and the loop switches to
    * [[largeSmallStar]] — alternating large-star/small-star (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14), which
    * contracts any graph in O(log²·n) rounds instead of O(diameter). The
    * hand-off seeds the star graph with the current (node → label) edges,
    * so propagation progress is preserved (a node's label is always a
    * member of its component).
    *
    * Output: (node, component), one row per node that appears in a pair.
    */
  def connectedComponents(pairs: DataFrame, propagationRounds: Int = 8): DataFrame = {
    // localCheckpoint (not persist): persisting caches the DATA but keeps
    // the upstream LOGICAL PLAN, so every round's actions re-run Catalyst
    // over the whole pair-generation tree (observed: driver pinned in
    // ConstantFolding for tens of seconds when pairs come from MinHash).
    // Checkpointing truncates the plan to the materialized RDD.
    // lazy checkpoints: the convergence-probe aggregate below materializes
    // the marked RDD in the SAME job, so each round costs ONE driver
    // round-trip instead of two (eager checkpoint job + probe job) — on a
    // real cluster the per-job scheduling latency is pure overhead
    // pairs feeds BOTH arms of the symmetric union — without its own
    // checkpoint the caller's pair generation (band self-join for LSH
    // callers) runs twice into the edges materialization. Same size class
    // as the edges checkpoint one line down, so nothing new is stored
    // beyond one extra pairs-bounded copy.
    val p = pairs.localCheckpoint(eager = false)
    val edges = p.select(col("a").as("u"), col("b").as("v"))
      .union(p.select(col("b").as("u"), col("a").as("v")))
      .distinct()
      .localCheckpoint(eager = false)
    // seed label(v) = min(Γ(v) ∪ v): the first propagation round for FREE
    // as one map-side-combined groupBy over the bidirected edges (no join)
    // — cliques (the dominant near-dup shape, diameter 1) arrive at their
    // fixpoint immediately and the loop's first probe just confirms it.
    // Correct for any init ≥ the component min, since labels only decrease.
    var labels = edges.groupBy(col("u").as("node"))
      .agg(least(min(col("v")), first(col("u"))).as("component"))
      .localCheckpoint(eager = false)
    // labels only ever decrease, so an unchanged label SUM means fixpoint —
    // a one-row aggregate per round instead of a change-detection join.
    // DECIMAL(38,0): 60-bit hash labels (g03's md5 host ids) overflow a
    // Long sum past ~2^3 nodes; doc-id labels never did, which hid this
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < propagationRounds) {
      val nbrMin = edges
        .join(labels, edges("v") === labels("node"))
        .groupBy(col("u"))
        .agg(min(col("component")).as("nbr_component"))
      val next = labels
        .join(nbrMin, labels("node") === nbrMin("u"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_component"), col("component")))
            .as("component"))
        .localCheckpoint(eager = false)
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      i += 1
    }
    if (converged) labels
    else largeSmallStar(
      edges.union(labels.where(col("node") =!= col("component"))
        .select(col("node").as("u"), col("component").as("v"))))
  }

  /** Alternating large-star/small-star contraction (Kiveris et al.,
    * SoCC'14): converges in O(log² n) rounds on ANY graph shape, so it is
    * the fallback when min-label propagation meets an adversarial
    * diameter (long chains), where O(diameter) rounds would stall the
    * driver loop.
    *
    *  - large-star: each node u attaches its LARGER neighbors to
    *    m(u) = min(Γ(u) ∪ u) — breaks up high-degree stars without ever
    *    creating new minima;
    *  - small-star: each node u attaches its smaller-or-equal neighbors
    *    and itself to m(u) — hops chains toward the minimum.
    *
    * Each half-round is one groupBy-min + one equi-join (map-side
    * combinable, no collect); the edge set is checkpointed per round. At
    * the fixpoint every edge is (v, c) with c the component minimum, and
    * the labels fall out of one final aggregate.
    */
  private[graft] def largeSmallStar(edges0: DataFrame, maxRounds: Int = 50): DataFrame = {
    def bidirect(e: DataFrame): DataFrame =
      e.union(e.select(col("v").as("u"), col("u").as("v"))).distinct()
    // one tiny action per round: (edge count, order-independent checksum)
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(sum(hash(col("u"), col("v")).cast("long")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    // lazy: the checksum probe materializes the checkpoint in the same job
    var edges = bidirect(edges0.where(col("u") =!= col("v")))
      .localCheckpoint(eager = false)
    var prev = checksum(edges)
    var round = 0
    var stable = false
    while (!stable && round < maxRounds) {
      // large-star over the bidirected edge list: m = min(Γ(u) ∪ u)
      val mins = edges.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = edges.where(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
      val largeBi = bidirect(large).localCheckpoint()
      // small-star: orient edges (big, small); attach small neighbors + self
      val oriented = largeBi.where(col("v") < col("u"))
      val mins2 = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = oriented.join(mins2, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins2.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
      edges = bidirect(small).localCheckpoint(eager = false)
      val cur = checksum(edges)
      stable = cur == prev
      prev = cur
      round += 1
    }
    // star fixpoint: every node's component = min(neighbors ∪ self)
    edges.groupBy(col("u").as("node"))
      .agg(least(min(col("v")), first(col("u"))).as("component"))
      .select(col("node"), col("component"))
  }

  // -------------------------------------------------- embedding near-dup --

  /** Cosine similarity between two float-array columns, computed in double
    * precision with sequential fold order (portable across engines), via the
    * codegen'd [[graft.functions.VecDot]] kernel.
    */
  def cosine(a: Column, b: Column): Column = {
    def d(u: Column, v: Column): Column =
      VecDot.dot(transform(u, x => x.cast("double")), transform(v, x => x.cast("double")))
    d(a, b) / (sqrt(d(a, a)) * sqrt(d(b, b)))
  }

  /** Exact embedding near-duplicate pairs: cosine ≥ tau, a < b.
    * Norms are precomputed per row (one scan) so the pair loop does exactly
    * one allocation-free [[graft.functions.VecDot]] dot product. The stream
    * side is repartitioned so the O(n²/2) pair scan spreads across all
    * cores (a single parquet file would otherwise pin it to one task). The
    * small side broadcasts; at ≫10^5 vectors use the ANN bucketing in
    * [[graft.similarity.Ann]] to prefilter candidates.
    */
  def cosineNearDupPairs(embeddings: DataFrame, tau: Double = 0.42): DataFrame = {
    val par = embeddings.sparkSession.sparkContext.defaultParallelism
    val normed = embeddings.select(
      col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("norm", sqrt(aggregate(
        transform(col("v"), x => x * x), lit(0.0), (acc, x) => acc + x)))
    val dot = VecDot.dot(col("x.v"), col("y.v"))
    normed.repartition(par).as("x")
      .join(broadcast(normed).as("y"), col("x.vec_id") < col("y.vec_id"))
      .where(dot / (col("x.norm") * col("y.norm")) >= tau)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
  }

  /** The SCALE path for embedding near-dup — [[cosineNearDupPairs]] is the
    * exact O(n²) baseline; this one generates candidates by sign-LSH bucket
    * ([[graft.similarity.Ann.signLshBuckets]]: vectors agreeing on all
    * `nPlanes` hyperplane signs land in one bucket) and verifies each
    * candidate with the exact cosine. The pair join is an EQUI-join on
    * bucket id — cost Σ|bucket|², not n², and buckets stay small because
    * the bucket count grows 2^nPlanes. Recall is the standard LSH trade
    * ((1-θ/π)^nPlanes per pair); stack multiple hash tables (vary the
    * plane seed) when higher recall is needed.
    */
  def lshNearDupPairs(embeddings: DataFrame, tau: Double = 0.42,
                      nPlanes: Int = 8): DataFrame = {
    // ONE corpus scan: norms and bucket bits are projections of the same
    // normed frame (Ann.normalize) — no separate bucket scan, no re-join
    val normed = graft.similarity.Ann.normalize(embeddings, "vec_id")
      .withColumn("bucket", graft.similarity.Ann.bucketExpr(nPlanes))
    val dot = VecDot.dot(col("x.v"), col("y.v"))
    normed.as("x")
      .join(normed.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .where(dot / (col("x.norm") * col("y.norm")) >= tau)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
  }

  /** Multi-table sign-LSH near-dup — the RECALL lever over
    * [[lshNearDupPairs]]: `tables` independent hyperplane families
    * (OR-construction), a pair is a candidate if it collides in ANY table.
    * Per-pair recall rises from (1-θ/π)^nPlanes to
    * 1-(1-(1-θ/π)^nPlanes)^tables while per-table bucket sizes (and thus
    * the Σ|bucket|² join cost) stay unchanged — cost is linear in
    * `tables`, the standard LSH recall/cost trade.
    *
    * Shape for 100 TB: ONE corpus scan emits all tables' bucket ids
    * through a single generator; the candidate join is an equi-join on
    * (table, bucket); candidates are DISTINCT'd on (a, b) — collisions in
    * several tables verify once, not `tables` times — and only then
    * cosine-verified against the normed vectors.
    */
  def lshNearDupPairsMulti(embeddings: DataFrame, tau: Double = 0.35,
                           nPlanes: Int = 4, tables: Int = 3): DataFrame = {
    val normed = graft.similarity.Ann.normalize(embeddings, "vec_id")
    val tb = explode(array((0 until tables).map(t =>
      struct(lit(t).as("t"),
        graft.similarity.Ann.bucketExpr(nPlanes, table = t).as("bucket"))): _*))
    val bucketed = normed
      .select(col("vec_id"), col("v"), col("norm"), tb.as("tb"))
      .select(col("vec_id"), col("v"), col("norm"),
        col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    // verify IN the join (like [[lshNearDupPairs]]) rather than dedup-then-
    // re-join: a pair colliding in several tables pays the (codegen'd,
    // allocation-free) cosine up to `tables` times, but the distinct then
    // runs over the tiny SURVIVING set instead of all candidates, and the
    // two verification joins disappear. The vectors ride the (t, bucket)
    // shuffle `tables` times — O(tables·n·dim), linear in corpus size.
    val dot = VecDot.dot(col("x.v"), col("y.v"))
    bucketed.as("x").join(bucketed.as("y"),
        col("x.t") === col("y.t") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .where(dot / (col("x.norm") * col("y.norm")) >= tau)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()
  }

  /** End-to-end dedup APPLICATION — the step the pair/cluster operators
    * exist for: given the corpus and a near-dup pair list, return the
    * surviving doc ids. A doc survives iff it is in no duplicate cluster,
    * or is its cluster's keeper (the component minimum). The final filter
    * is a LEFT ANTI join on the drop set; no forced broadcast hint — at
    * web-crawl dup rates (30%+ of the corpus) the drop set is NOT tiny,
    * and AQE picks broadcast vs shuffled anti-join from the actual
    * post-clustering size.
    */
  def applyDedup(docs: DataFrame, pairs: DataFrame): DataFrame =
    survivorsFromComponents(docs, connectedComponents(pairs))

  /** The shared apply step over any (node, component) clustering: docs in
    * no cluster survive, keepers (component minima) survive, everything
    * else drops. Also the media-dedup apply
    * ([[graft.multimodal.Multimodal.applyMediaDedup]]) — one
    * implementation so keeper/tie-break semantics can never diverge.
    */
  def survivorsFromComponents(docs: DataFrame, components: DataFrame): DataFrame = {
    val drops = components
      .where(col("node") =!= col("component"))
      .select(col("node"))
    docs.join(drops, docs("doc_id") === drops("node"), "left_anti")
      .select(col("doc_id"))
  }

  /** Dedup apply with a QUALITY keeper policy — what production
    * pipelines actually do inside a duplicate cluster: keep the BEST
    * member (highest quality score; ties → the smaller doc_id, so the
    * pick is total and engine-deterministic), not the smallest id.
    * `quality` is any (doc_id, score) frame — [[graft.textops.TextAnalysis.qualityScore]]'s
    * composite, a length, an LM score. Docs in no cluster survive
    * untouched.
    *
    * Scale shape: the clustering is [[connectedComponents]] over the
    * pairs (duplicate-bounded, not corpus-bounded); quality joins the
    * clustered NODES only (AQE-sized), the per-component argmax is one
    * map-side-combinable `max(struct(score, -node))`, and survivors fall
    * out of a left-anti join on the drop set. Raw text never moves.
    *
    * Output: surviving doc_ids with a `kept_as` tag — 'solo' (never
    * clustered) or 'keeper' (won its cluster).
    *
    * Quality coverage need not be total: a clustered doc absent from
    * `quality` cannot win against a scored member (it ranks below every
    * scored one), and a cluster with NO scored member falls back to the
    * [[applyDedup]] min-node keeper — so an incomplete quality frame can
    * demote docs but can never silently delete a whole cluster.
    */
  def applyDedupByQuality(docs: DataFrame, pairs: DataFrame,
                          quality: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs)
    val q = quality.toDF("doc_id", "q")
    val scored = comp.join(q, comp("node") === q("doc_id"))
      .select(col("component"), col("node"), col("q"))
    // keeper = max (q, -node): highest quality, ties to the SMALLER id
    val keepersQ = scored.groupBy(col("component"))
      .agg(max(struct(col("q"), (-col("node")).as("nn"))).as("w"))
      .select(col("component"), (-col("w.nn")).as("keeper"))
    // clusters with no scored member: min-node fallback (components-bounded
    // anti-join + one map-side-combinable min)
    val keepersNoQ = comp
      .join(keepersQ.select(col("component").as("cq")),
        col("component") === col("cq"), "left_anti")
      .groupBy(col("component")).agg(min(col("node")).as("keeper"))
    val keepers = keepersQ.select(col("keeper"))
      .unionByName(keepersNoQ.select(col("keeper")))
    val drops = comp.select(col("node"))
      .join(keepers, col("node") === col("keeper"), "left_anti")
    val clustered = comp.select(col("node"))
    docs.select(col("doc_id"))
      .join(drops, docs("doc_id") === drops("node"), "left_anti")
      .join(clustered, docs("doc_id") === clustered("node"), "left")
      .select(col("doc_id"),
        when(col("node").isNull, lit("solo")).otherwise(lit("keeper")).as("kept_as"))
  }

  /** Cross-split leakage matrix — the QA read AFTER
    * [[graft.textops.TextAnalysis.trainValTestSplit]]: for every ORDERED
    * pair of distinct splits, how many of split a's distinct k-grams
    * also occur in split b (`shared_grams`), and what share of a's
    * grams that is (`leak_ppm` = shared·10⁶ ÷ |a|, floor). High
    * val/test-in-train leakage means the held-out split does not
    * measure generalization — the content-independent hash split
    * guarantees doc-level disjointness but NOT n-gram disjointness,
    * which is exactly what this measures. Membership comes from the
    * same [[graft.textops.TextAnalysis.splitAssignment]] column the
    * accounting uses, so the two cannot disagree.
    *
    * Scale shape: one shingle pass (typed flatMap, within-doc distinct),
    * digests only past the scan; the (split, digest) frame is distinct
    * per split so each digest joins at most 3 rows — the pairwise join
    * is digest-keyed with a ≤3-row build side per key, no hot grams, no
    * n². Totals are a 3-row broadcast. Output ≤ 6 rows.
    */
  def splitLeakage(docs: DataFrame, k: Int = 3, trainPct: Int = 90,
                   valPct: Int = 5): DataFrame = {
    val member = docs.select(col("doc_id"),
      graft.textops.TextAnalysis.splitAssignment(trainPct, valPct).as("split"))
    val grams = shingles(docs, k)
      .select(col("doc_id"), PortableHash.md5Hex(col("shingle")).as("g"))
      .join(member, "doc_id")
      .select(col("split"), col("g"))
      .distinct()
    val sizes = grams.groupBy(col("split")).agg(count(lit(1)).as("n"))
    val shared = grams.as("x")
      .join(grams.as("y"),
        col("x.g") === col("y.g") && col("x.split") =!= col("y.split"))
      .groupBy(col("x.split").as("split_a"), col("y.split").as("split_b"))
      .agg(count(lit(1)).as("shared_grams"))
    shared.join(broadcast(sizes).withColumnRenamed("split", "split_a"), "split_a")
      .select(col("split_a"), col("split_b"), col("shared_grams"),
        floor(col("shared_grams") * lit(1000000L) / col("n")).cast("long")
          .as("leak_ppm"))
  }

  /** Snapshot delta by content (the incremental-crawl bookkeeping step):
    * digests present in snapshot `a` but not `b` — docs to (re)process.
    * EXCEPT DISTINCT on the md5 digest: one shuffle on a uniform 128-bit
    * key, never on raw text; both sides prune to (text) at the scan.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame): DataFrame =
    a.select(PortableHash.md5Hex(col("text")).as("text_md5"))
      .except(b.select(PortableHash.md5Hex(col("text")).as("text_md5")))

  /** Bloom-filter membership against a seen-set — the incremental-crawl
    * read [[snapshotDiff]] answers exactly, at the memory cost of the
    * whole seen-set; the [[graft.functions.BloomSketch]] filter answers
    * it in a FIXED `mBits` bit array (the same trade, and the same GATED
    * oracle pattern, as HLL/e13/e14). `filterKeys` builds the filter,
    * `probes` tests against it; output is ONE accounting row:
    *
    *   - `n_filter` / `n_probes`: distinct key counts of either side
    *   - `n_members`: exact |probes ∩ filter| (DuckDB-reproducible)
    *   - `false_negatives`: probes in the filter set that the Bloom
    *     missed — a THEOREM says zero (OR-merge never clears a bit), so
    *     this is hash-compared against literal 0, not gated
    *   - `fp_within_bound`: the measured false-positive count vs the
    *     `fpBudgetPpm` budget of n_probes (+3 absolute slack for tiny
    *     probe sets) — a saturated filter or drifting hash breaks it
    *
    * Scale shape: the filter side is ONE typed aggregation whose partial
    * buffers OR together map-side (only mBits/64-word arrays cross the
    * exchange); the 1-row filter broadcasts into the probe scan, where
    * the membership test is pure codegen'd md5 arithmetic
    * ([[BloomSketch.testColumn]]); the exact-membership check is the only
    * key join (AQE-sized). Nothing corpus-sized is ever collected.
    */
  def bloomMembership(filterKeys: DataFrame, probes: DataFrame,
                      mBits: Int = 16384, kHashes: Int = 4,
                      fpBudgetPpm: Long = 50000L): DataFrame = {
    val spark = filterKeys.sparkSession
    import spark.implicits._
    val fk = filterKeys.select(col("key").cast("string").as("key")).distinct()
    val pk = probes.select(col("key").cast("string").as("key")).distinct()
    // the typed whole-frame select unpacks Buf into (words, n) columns
    val bloom = fk.as[String]
      .select(new graft.functions.BloomSketch.Agg(mBits, kHashes).toColumn.name("s"))
      .select(col("words").as("__words"), col("n").as("n_filter"))
    val flagged = pk
      .join(fk.withColumn("__in", lit(1L)), Seq("key"), "left")
      .crossJoin(broadcast(bloom))
      .select(col("key"), coalesce(col("__in"), lit(0L)).as("__m"),
        graft.functions.BloomSketch.testColumn(
          col("__words"), col("key"), mBits, kHashes).cast("long").as("__hit"),
        col("n_filter"))
    // GLOBAL aggregate (no groupBy): the accounting row must exist even for
    // an empty probe set (n_probes=0, zero members/FN/FP), so n_filter is
    // re-attached from the always-1-row broadcast filter frame instead of
    // being a grouping key that vanishes with its input rows.
    flagged
      .agg(count(lit(1)).as("n_probes"),
        coalesce(sum(col("__m")), lit(0L)).as("n_members"),
        coalesce(sum(when(col("__m") === 1L && col("__hit") === 0L, 1L)
          .otherwise(0L)), lit(0L)).as("false_negatives"),
        coalesce(sum(when(col("__m") === 0L && col("__hit") === 1L, 1L)
          .otherwise(0L)), lit(0L)).as("__fp"))
      .crossJoin(broadcast(bloom.select(col("n_filter"))))
      .select(col("n_filter"), col("n_probes"), col("n_members"),
        col("false_negatives"),
        (col("__fp") <= expr(s"(n_probes * ${fpBudgetPpm}L) div 1000000") + 3L)
          .cast("long").as("fp_within_bound"))
  }

  /** [[bloomMembership]]'s accounting over SHARDED filters — the probe
    * side of [[graft.streaming.StreamingDedup.bloomSeenStream]]: each
    * probe key tests against ITS shard's filter only (the same
    * `pmod(md5_60, nShards)` routing that built the state), the exact
    * member flags come from the same distinct left join, and the output
    * row is d26's exactly — (n_filter, n_probes, n_members,
    * false_negatives, fp_within_bound) — so the zero-FN theorem now
    * certifies the streamed state path. The shard-filter frame is
    * shards-bounded and broadcasts onto the probe scan.
    */
  def bloomMembershipFromShards(shardFilters: DataFrame, filterKeys: DataFrame,
                                probes: DataFrame, nShards: Int = 8,
                                mBits: Int = 16384, kHashes: Int = 4,
                                fpBudgetPpm: Long = 50000L): DataFrame = {
    val fk = filterKeys.select(col("key").cast("string").as("key")).distinct()
    val pk = probes.select(col("key").cast("string").as("key")).distinct()
    val filters = shardFilters.select(col("shard"),
      col("s.words").as("__words"))
    val flagged = pk
      .withColumn("shard", pmod(graft.functions.PortableHash.md5Long60(col("key")),
        lit(nShards.toLong)))
      .join(fk.withColumn("__in", lit(1L)), Seq("key"), "left")
      .join(broadcast(filters), Seq("shard"), "left")
      .select(col("key"), coalesce(col("__in"), lit(0L)).as("__m"),
        coalesce(graft.functions.BloomSketch.testColumn(
          col("__words"), col("key"), mBits, kHashes).cast("long"), lit(0L))
          .as("__hit"))
    flagged
      .agg(count(lit(1)).as("n_probes"),
        coalesce(sum(col("__m")), lit(0L)).as("n_members"),
        coalesce(sum(when(col("__m") === 1L && col("__hit") === 0L, 1L)
          .otherwise(0L)), lit(0L)).as("false_negatives"),
        coalesce(sum(when(col("__m") === 0L && col("__hit") === 1L, 1L)
          .otherwise(0L)), lit(0L)).as("__fp"))
      .crossJoin(broadcast(fk.agg(count(lit(1)).as("n_filter"))))
      .select(col("n_filter"), col("n_probes"), col("n_members"),
        col("false_negatives"),
        (col("__fp") <= expr(s"(n_probes * ${fpBudgetPpm}L) div 1000000") + 3L)
          .cast("long").as("fp_within_bound"))
  }

  // ------------------------------------------------------ chunk-level dedup --

  /** Sub-document exact dedup at chunk granularity — the "line-level"
    * dedup of C4/RefinedWeb (this corpus has no newlines, so the unit is
    * the fixed `chunkTokens`-token chunk from
    * [[graft.textops.TextAnalysis.chunk]]): across the whole corpus each
    * distinct chunk survives exactly once, at its first occurrence
    * (smallest (doc_id, chunk_idx)); every other occurrence — in later
    * docs OR repeated within one doc — is dropped. Output per doc:
    * total/kept/dropped chunk counts, the boilerplate-removal accounting.
    *
    * Scale shape: chunks shuffle on the md5 digest only (never text); the
    * first-occurrence winner is a map-side-combinable `min(struct)` — no
    * window over the corpus — and the winner table joins back by digest
    * (AQE sizes it). Hot boilerplate chunks make big digest groups but the
    * aggregate collapses them map-side, same story as [[exactGroups]].
    */
  def chunkDedupStats(docs: DataFrame, chunkTokens: Int = 8): DataFrame = {
    val chunks = TextAnalysis.chunk(docs, chunkTokens)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_md5"))
    val firsts = chunks
      .groupBy(col("chunk_md5"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("__first"))
    chunks.join(firsts, "chunk_md5")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__first.doc_id") === col("doc_id") &&
          col("__first.chunk_idx") === col("chunk_idx"), 1L).otherwise(0L))
          .as("n_kept"))
      .withColumn("n_dropped", col("n_chunks") - col("n_kept"))
  }

  /** CONTENT-DEFINED chunking dedup stats — the shift-invariant chunking
    * primitive of the LBFS/rsync lineage (Muthitacharoen et al. SOSP'01)
    * that [[chunkDedupStats]]' fixed-size grid cannot give: one token
    * inserted at the head of a document shifts EVERY fixed chunk, but
    * content-defined boundaries re-synchronize immediately, so edited
    * near-copies still share most chunks — the incremental-crawl dedup
    * read for pages that change a header between snapshots.
    *
    * Boundaries are a pure function of content: at token position p
    * (p ≥ window−1), the rolling value
    * `h = fold(th, h·31 + th(q))` over the last `window` token hashes
    * (`jvmMd5Long60 % 2²⁰` — headroom-bounded so the base-31 fold stays
    * exact in a long) closes a chunk iff `h % divisor == 0`; expected
    * chunk length ≈ divisor tokens. First occurrence in (doc_id,
    * chunk_idx) order keeps a chunk digest (the d13 winner rule, within-
    * doc repeats included). Output: (doc_id, n_chunks, n_kept,
    * n_dropped).
    *
    * Typed flatMap (the [[shingles]]/winnow rationale — each doc
    * tokenizes and hashes exactly once, no optimizer-inlined HOF trap);
    * only (id, idx, digest) rows leave the scan, text never shuffles;
    * the winner aggregate is the d13 map-side `min(struct)`.
    */
  def cdcChunkStats(docs: DataFrame, divisor: Long = 8L,
                    window: Int = 3): DataFrame = {
    require(divisor > 0, "divisor must be positive")
    require(window >= 1, "window must be at least 1")
    // exactness invariant, enforced: token hashes are < 2^20 and the fold
    // multiplies by 31 (< 2^5) per step, so the rolling value is
    // < 2^(20 + 5·(window−1)) — window ≤ 8 keeps it < 2^55, inside signed
    // long; window ≥ 9 would silently overflow and move boundaries
    require(window <= 8, "window must be at most 8: the base-31 fold over " +
      "2^20-bounded token hashes overflows signed long beyond that")
    val spark = docs.sparkSession
    import spark.implicits._
    val chunks = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        val th = toks.map(t => PortableHash.jvmMd5Long60(t) % 1048576L)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
        var start = 0
        var idx = 0L
        var p = 0
        while (p < toks.length) {
          var boundary = false
          if (p >= window - 1) {
            var h = 0L
            var q = p - window + 1
            while (q <= p) { h = h * 31L + th(q); q += 1 }
            boundary = h % divisor == 0L
          }
          if (boundary || p == toks.length - 1) {
            out += ((id, idx,
              PortableHash.jvmMd5Hex(toks.slice(start, p + 1).mkString(" "))))
            idx += 1
            start = p + 1
          }
          p += 1
        }
        out
      }.toDF("doc_id", "chunk_idx", "chunk_md5")
    val firsts = chunks
      .groupBy(col("chunk_md5"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("__first"))
    chunks.join(firsts, "chunk_md5")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__first.doc_id") === col("doc_id") &&
          col("__first.chunk_idx") === col("chunk_idx"), 1L).otherwise(0L))
          .as("n_kept"))
      .withColumn("n_dropped", col("n_chunks") - col("n_kept"))
  }

  // ------------------------------------------------ benchmark contamination --

  /** Benchmark contamination detection (the train/test-overlap audit every
    * training-data pipeline needs): a document is contaminated iff it
    * shares at least one word `k`-gram with a benchmark document other
    * than itself. Output: (doc_id, n_shared_grams) — the count of DISTINCT
    * k-grams the doc shares with the benchmark set, only rows with ≥ 1.
    *
    * Shape for 100 TB: the benchmark side (eval sets) is tiny relative to
    * the corpus, so its distinct grams BROADCAST; the corpus side streams
    * through one scan + one generator, and the join never shuffles the
    * corpus. The count aggregate groups by doc_id — bounded by matched
    * docs, not grams.
    */
  def contamination(docs: DataFrame, benchmarkPred: Column, k: Int = 8): DataFrame = {
    val grams = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("doc_id"),
        explode(array_distinct(TextAnalysis.kgrams(col("__toks"), k))).as("gram"))
    val bench = grams.where(benchmarkPred)
      .select(col("doc_id").as("bench_id"), col("gram"))
    grams.as("g")
      .join(broadcast(bench).as("b"),
        col("g.gram") === col("b.gram") && col("g.doc_id") =!= col("b.bench_id"))
      .select(col("g.doc_id"), col("g.gram")).distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Decontamination APPLIED — [[contamination]]'s find step composed
    * with the removal (the d09 mirror for benchmark leakage): corpus docs
    * sharing ≥ `minShared` distinct k-grams with the benchmark slice
    * drop; benchmark rows themselves are not part of the training corpus
    * and drop too. One AQE-sized left-anti join against the (small by
    * construction) contaminated set. Output: surviving (doc_id) rows.
    */
  def applyDecontamination(docs: DataFrame, benchmarkPred: Column,
                           k: Int = 8, minShared: Long = 1L): DataFrame = {
    val contaminated = contamination(docs, benchmarkPred, k)
      .where(col("n_shared_grams") >= minShared)
      .select(col("doc_id"))
    docs.where(!benchmarkPred)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
  }

  /** URL-level dedup — the FIRST dedup stage of a web-corpus build
    * (CommonCrawl-style: the same page is fetched under www/no-www,
    * default-port, trailing-slash, tracking-param, and fragment variants;
    * canonicalize then keep one). [[graft.textops.UrlOps.canonicalizeUrl]]
    * is the codegen'd canonicalizer; the keep rule is min doc_id per
    * canonical URL (deterministic first-crawled winner).
    *
    * Scale shape: canonicalization is a pure projection on the scan; the
    * single shuffle groups by the canonical URL string with map-side
    * `count`/`min` combines (canonical URLs are short and uniform — no
    * digest needed since the URL itself is the output). Unparseable URLs
    * (null canonical) are dropped, the permissive web-data convention.
    * Output: (url, n_dups, keep_doc_id).
    */
  def urlDedup(docs: DataFrame, url: Column): DataFrame =
    docs.select(col("doc_id"), graft.textops.UrlOps.canonicalizeUrl(url).as("url"))
      .where(col("url").isNotNull)
      .groupBy(col("url"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_doc_id"))

  /** EXACT repeated-substring dedup accounting at token granularity — the
    * suffix-array-style "exact substring deduplication" of Lee et al.
    * '22 (Deduplicating Training Data Makes Language Models Better),
    * re-expressed relationally: any token L-gram occurring MORE THAN ONCE
    * in the corpus (across documents OR repeated within one) marks its
    * L-token cover for removal; per document, overlapping-or-adjacent
    * covers merge into maximal spans (the suffix array finds the same
    * repeated substrings — the relational form trades its generality for
    * a fixed minimum match length L, the parameter Lee et al. set to 50
    * tokens anyway). Output per document WITH at least one repeated span:
    * (doc_id, n_tokens, n_spans, tokens_removed, removed_ppm) — the
    * removal accounting a corpus build reports; span-free docs emit no
    * row by construction.
    *
    * Scale shape: the corpus-wide shuffle groups by the md5-60 gram
    * DIGEST, never gram text (d24's rule; 60-bit collisions are
    * ~n²/2⁶¹ — negligible at 100 TB gram counts and only ever UNDER-
    * merge... over-merge, conservatively flagging a unique gram as
    * repeated); the repeated-gram table comes back via one AQE-sized
    * semi-join on the digest; span merging is a window PARTITIONED BY
    * doc_id (per-document bounded, never corpus-ordered) using the
    * classic gaps-and-islands running-max-of-end form. Token slicing
    * happens in the same stage as the position explode — no raw text
    * crosses any exchange.
    */
  def repeatedSpans(docs: DataFrame, L: Int = 8): DataFrame = {
    val d = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("t"),
        size(col("t")).cast("long").as("n_tokens"))
      .where(col("n_tokens") >= L)
    val pos = d
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(1L), col("n_tokens") - lit(L - 1))).as("pos"),
        col("t"))
      .select(col("doc_id"), col("n_tokens"), col("pos"),
        PortableHash.md5Long60(
          array_join(slice(col("t"), col("pos"), lit(L)), " ")).as("g"))
    val repeated = pos.groupBy(col("g"))
      .agg(count(lit(1)).as("c")).where(col("c") > 1)
      .select(col("g"))
    val flagged = pos.join(repeated, Seq("g"), "left_semi")
      .select(col("doc_id"), col("n_tokens"), col("pos"))
    // gaps-and-islands: a flagged pos covers [pos, pos+L-1]; a new island
    // starts when pos exceeds (running max of prior ends) + 1 — merging
    // overlapping AND adjacent covers, Lee et al.'s span semantics
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevEnd = max(col("pos") + lit(L - 1))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val isl = flagged
      .withColumn("__new",
        when(prevEnd.isNull || col("pos") > prevEnd + 1, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy(col("doc_id"), col("__island"))
      .agg(first(col("n_tokens")).as("n_tokens"),
        (max(col("pos")) + lit(L - 1) - min(col("pos")) + 1)
          .cast("long").as("__len"))
      .groupBy(col("doc_id"))
      .agg(first(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("n_spans"),
        sum(col("__len")).as("tokens_removed"))
      .select(col("doc_id"), col("n_tokens"), col("n_spans"),
        col("tokens_removed"),
        expr("tokens_removed * 1000000 div n_tokens").as("removed_ppm"))
  }
}
