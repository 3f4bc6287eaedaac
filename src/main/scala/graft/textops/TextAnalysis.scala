package graft.textops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.functions.PortableHash

/** Text-analysis operators for large-scale training-data pipelines, over a
  * `documents(doc_id, text, lang, source, n_chars)` table.
  *
  * Everything here is a narrow per-row projection — no shuffle, no UDF:
  * tokenization, counting, scoring and hashing all compile to built-in
  * codegen'd expressions (`split`, `regexp_extract_all`, higher-order
  * `filter`/`transform`, `md5`/`conv`), so at 100 TB each operator is a
  * single scan that whole-stage-codegens and prunes to exactly the columns
  * it reads (`doc_id`, `text`).
  *
  * Ratio-style outputs are integer parts-per-million (`*_ppm`), not
  * doubles: integer arithmetic is bit-identical across engines, so the
  * DuckDB oracle can hash-match them exactly.
  */
object TextAnalysis {

  /** Whitespace tokens. The corpus contract is single-space separated
    * (TESTDATA.md); `split` on one space is the portable tokenizer
    * (DuckDB: `string_split(text, ' ')`).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish pre-tokenizer regex: letter runs | digit runs | single
    * non-alphanumeric, the usual shape of byte-pair-encoding
    * pre-tokenization (GPT-2-style contractions dropped — corpus is bare
    * lowercase words).
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Token counting: whitespace tokens and BPE-ish regex tokens per doc. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).cast("long").as("n_bpe_tokens"))

  /** English stopwords used by quality scoring and language ID.
    * Shared vocabulary with [[StopwordLists]] ("en").
    */
  val EnStopwords: Seq[String] = StopwordLists.byLang("en")

  /** Materialize the token array ONCE as a projection attribute.
    *
    * CRITICAL evaluation-model rule for every operator in this package:
    * higher-order functions are interpreted, and an expression inside a
    * lambda BODY is re-evaluated per element — so `slice(split(text), …)`
    * inside a `transform` re-runs the full split for EVERY output element
    * (O(len²) per doc; observed as minutes-long tasks on long docs).
    * Expensive expressions may appear as a lambda's *input*, never inside
    * its body: bodies reference only lambda variables and attributes.
    * (Each materialized array is referenced ≥2 times downstream, so
    * CollapseProject keeps the projection boundary.)
    */
  private[graft] def withTokens(docs: DataFrame): DataFrame =
    docs.select(col("*"), tokens(col("text")).as("__toks"))

  /** Quality scoring: the standard cheap heuristics (length, punctuation
    * density, stopword density) as ppm integers plus a composite score.
    *
    *  - `punct_ppm`   = non-alphanumeric-non-space chars / chars
    *  - `stopword_ppm`= stopword tokens / tokens
    *  - `len_ppm`     = min(n_chars, 500) / 500 (length saturation)
    *  - `quality_ppm` = mean of (1e6 - punct_ppm, stopword_ppm, len_ppm)
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = col("__toks")
    val nChars = nCharsCol
    val nPunct = nPunctCol
    val nToks = size(toks).cast("long")
    val nStop = enStopCount(toks)
    withTokens(docs).select(
      col("doc_id"),
      nChars.as("n_chars_m"),
      intDiv(nPunct * lit(1000000L), nChars).as("punct_ppm"),
      intDiv(nStop * lit(1000000L), nToks).as("stopword_ppm"),
      intDiv(least(nChars, lit(500L)) * lit(1000000L), lit(500L)).as("len_ppm"))
      .withColumn("quality_ppm",
        intDiv(lit(1000000L) - col("punct_ppm") + col("stopword_ppm") + col("len_ppm"), lit(3L)))
  }

  /** Exact integer division for non-negative operands whose product stays
    * below 2^53 (ppm scaling of counts — always true here), matching
    * DuckDB's `//`. Kept in double space only transiently; result exact.
    */
  private[graft] def intDiv(a: Column, b: Column): Column =
    floor(a / b).cast("long")

  // The cheap per-doc metric expressions, shared by [[qualityScore]] and
  // [[qualityGate]] so a regex/stopword change can never de-sync the score
  // from the gate that filters on it.
  private def nCharsCol: Column = length(col("text")).cast("long")
  private def nPunctCol: Column =
    size(regexp_extract_all(col("text"), lit("[^a-z0-9 ]"), lit(0))).cast("long")
  private def enStopCount(toks: Column): Column = {
    val stopArr = typedLit(EnStopwords)
    size(filter(toks, t => array_contains(stopArr, t))).cast("long")
  }

  /** Language-ID by stopword-list voting (the classic cheap n-gram/stopword
    * heuristic): score(lang) = # tokens in that language's stopword list;
    * prediction = argmax with alphabetical tiebreak, `und` when no list
    * matches at all.
    */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = col("__toks") // one split per row, not one per language list
    val scored = withTokens(docs).select(
      (col("doc_id") +:
        StopwordLists.langs.map { l =>
          val arr = typedLit(StopwordLists.byLang(l))
          size(filter(toks, t => array_contains(arr, t))).cast("long").as(s"s_$l")
        }): _*)
    val g = greatest(StopwordLists.langs.map(l => col(s"s_$l")): _*)
    // first lang (alphabetical) reaching the max — deterministic tiebreak
    val pred = StopwordLists.langs.foldRight(lit("und")) { (l, els) =>
      when(col(s"s_$l") === g, lit(l)).otherwise(els)
    }
    scored.select(
      col("doc_id"),
      when(g === 0, lit("und")).otherwise(pred).as("pred_lang"),
      g.as("lang_score"))
  }

  /** Language-ID CONFUSION matrix — [[languageId]] graded against the
    * corpus's `lang` labels, the t34 measured-gate pattern applied to
    * the rule-based identifier: per (truth, predicted) cell the doc
    * count and its integer-ppm share of the truth row. The read that
    * decides whether the cheap stopword identifier is good enough to
    * gate a corpus slice or a trained classifier (t32) must take over —
    * and WHERE it fails (which languages bleed into which).
    *
    * Scale shape: the prediction is a shuffle-free projection over one
    * scan; the doc_id equi-join carries only (id, label) pairs (text
    * never crosses it), the cell aggregate is map-side combinable, and
    * the row-share window runs over the langs²-bounded matrix.
    */
  def langIdConfusion(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pred = languageId(docs).select(col("doc_id"), col("pred_lang"))
    val cells = docs.select(col("doc_id"), col("lang").as("truth_lang"))
      .join(pred, "doc_id")
      .groupBy(col("truth_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("truth_lang"))
    cells
      .withColumn("__tot", sum(col("n_docs")).over(w))
      .select(col("truth_lang"), col("pred_lang"), col("n_docs"),
        expr("n_docs * 1000000 div __tot").as("row_ppm"))
  }

  /** Word k-grams of a token array (empty when fewer than k tokens). */
  def kgrams(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array())

  /** Document fingerprinting via rolling k-gram hashes: fingerprint = MIN of
    * the 60-bit hashes of all word k-grams (the deterministic 1-value
    * winnowing degenerate); also emits the distinct k-gram count.
    * See [[winnow]] for the full winnowing fingerprint set (the scale path
    * for plagiarism-style containment search).
    */
  def fingerprint(docs: DataFrame, k: Int = 3): DataFrame =
    withTokens(docs)
      .select(col("doc_id"), kgrams(col("__toks"), k).as("__kg"))
      .select(
        col("doc_id"),
        array_min(transform(col("__kg"), g => PortableHash.md5Long60(g))).as("fingerprint"),
        size(array_distinct(col("__kg"))).cast("long").as("n_kgrams"))

  /** Vocabulary building (the BPE/tokenizer-training precursor): global
    * token frequencies, top `k` by (count desc, token asc). One explode +
    * one map-side-combined count aggregate; the top-k is
    * `TakeOrderedAndProject` (per-partition heaps, never a global sort of
    * the full vocabulary). Output: (token, n, rank).
    */
  def vocabulary(docs: DataFrame, k: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)
    // rank over the already-top-k rows (tiny, single partition by design)
    counts.withColumn("rank",
      row_number().over(Window.orderBy(col("n").desc, col("token").asc)).cast("long"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP '04) — corpus
    * keywords as PageRank over the token CO-OCCURRENCE graph, literally
    * reusing [[graft.graph.GraphOps.pageRankWeighted]]'s integer-exact
    * iteration: adjacent-token pairs form symmetric WEIGHTED edges
    * (TextRank's undirected window-2 graph with co-occurrence counts as
    * weights — Mihalcea's §4.1 weighted formulation; unweighted scores
    * plateau on dense small-vocab graphs), the vocab-bounded graph runs
    * the g01 damped truncating-division rounds, and the top-`k` tokens
    * by (rank desc, token asc) come back with their scores. The
    * frequency-independent centrality read beside [[vocabulary]]'s raw
    * counts and [[tfidfTopK]]'s per-doc weights: a token scores high for
    * KEEPING GOOD COMPANY, not for being frequent.
    *
    * Scale shape: one generator emits adjacent pairs and ONE map-side-
    * combinable groupBy folds multiplicities into weights, so the edge
    * frame entering the iteration is vocab²-bounded (in practice
    * vocab-linear), never corpus-sized; everything after is the g01
    * iteration (vocab-bounded rank frames broadcast into the persisted
    * edge scan). The final rank window runs over the already-top-k rows
    * ([[vocabulary]]'s limit-then-rank pattern).
    */
  def textRank(docs: DataFrame, iterations: Int = 2, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = withTokens(docs).select(col("__toks").as("w"))
    val adj = w
      .select(explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("u"), b.as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val edges = adj
      .unionAll(adj.select(col("v").as("u"), col("u").as("v")))
      .where(col("u") =!= col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("weight"))
      .select(col("u").as("src"), col("v").as("dst"), col("weight"))
    val top = graft.graph.GraphOps.pageRankWeighted(edges, iterations)
      .orderBy(col("pagerank").desc, col("host").asc)
      .limit(k)
    top.select(col("host").as("token"), col("pagerank"),
      row_number().over(Window.orderBy(col("pagerank").desc, col("host").asc))
        .cast("long").as("rank"))
  }

  /** Per-document out-of-vocabulary rate against the corpus top-`k`
    * vocabulary — the tokenizer-health metric (OOV/fertility read) run
    * before committing to a vocab size: how much of each document a
    * k-entry vocabulary fails to cover. Vocabulary = [[vocabulary]]'s
    * top-k (count desc, token asc — deterministic); a token is OOV iff
    * absent from it.
    *
    * Scale shape: the vocab is k rows → broadcast; per-doc coverage is
    * one explode + a broadcast left join + one map-side-combinable
    * groupBy(doc_id). Raw text never shuffles — only (doc_id, in/out)
    * counts do. Output: (doc_id, n_tokens, n_oov, oov_ppm).
    */
  def oovRate(docs: DataFrame, vocabSize: Int = 1000): DataFrame = {
    val vocab = vocabulary(docs, vocabSize).select(col("token"), lit(1L).as("__in"))
    withTokens(docs)
      .select(col("doc_id"), explode(col("__toks")).as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", intDiv(col("n_oov") * lit(1000000L), col("n_tokens")))
  }

  /** Vocabulary coverage curve — the "how big must the vocab be" design
    * artifact: for each candidate size k, the ppm of corpus TOKEN
    * OCCURRENCES covered by the top-k vocabulary ([[vocabulary]]'s
    * (count desc, token asc) order). One token-frequency aggregate, one
    * unpartitioned rank over the (vocab-bounded) frequency table, and the
    * curve read off its running sum — the corpus never rescans per k.
    * Output: (vocab_size, covered_ppm), one row per requested size.
    */
  def vocabCoverage(docs: DataFrame,
                    sizes: Seq[Int] = Seq(10, 100, 1000)): DataFrame = {
    val freq = docs
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("n").desc, col("token").asc)
    // the rank/cumsum window is unpartitioned BY DESIGN: it runs over the
    // distinct-token table (vocab-bounded, ≪ corpus), the same accepted
    // shape as rollingActivity's calendar-bounded window
    // materialized once: every curve point reads this table, and without
    // the checkpoint each union branch would rescan the corpus
    val ranked = freq
      .withColumn("__rank", row_number().over(w))
      .withColumn("__cum", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(eager = false)
    val total = ranked.agg(sum(col("n")).as("__total"))
    val curve = sizes.sorted.map { k =>
      // max over rank ≤ k (not rank = k): a vocab smaller than k still
      // yields its full-coverage row
      ranked.where(col("__rank") <= k)
        .agg(max(col("__cum")).as("__cum"))
        .select(lit(k.toLong).as("vocab_size"), col("__cum"))
    }.reduce(_.union(_))
    curve.crossJoin(broadcast(total))
      .select(col("vocab_size"),
        intDiv(col("__cum") * lit(1000000L), col("__total")).as("covered_ppm"))
  }

  /** TF-IDF top-`k` terms per document — the classic relevance/keyword
    * signal, integer-exact so the oracle hash-matches:
    * `idf_ppm = (N·10⁶) // df(token)`, `tfidf = tf(doc,token) · idf_ppm`,
    * rank by (tfidf desc, token asc), keep rank ≤ k.
    *
    * Scale shape: one explode + two map-side-combined aggregates (term
    * frequencies by (doc, token); document frequencies by token), one
    * equi-join on token (the df side is vocabulary-sized — AQE broadcasts
    * it when small), and a window PARTITIONED BY doc_id (per-doc top-k,
    * never a global sort). N comes from a 1-row aggregate cross-joined in,
    * not a driver-side count.
    */
  def tfidfTopK(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tok.groupBy(col("token")).agg(count_distinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, "token").crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"),
        (col("tf") * intDiv(col("n") * lit(1000000L), col("df"))).as("tfidf"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("token").asc)).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("token"), col("tfidf"), col("rank"))
  }

  /** Heaps-law vocabulary GROWTH curve — distinct-vocabulary size after
    * the first docs under the doc_id total order, at a sweep of
    * checkpoints: the read that sizes a tokenizer vocabulary and
    * predicts how much new-token mass the NEXT crawl snapshot will add
    * (Heaps '78: V ≈ K·N^β, β ≈ 0.5 for natural text — a corpus whose
    * curve has flattened is saturated; one still growing linearly is
    * polluted or multilingual). [[vocabCoverage]] reads the FINAL
    * frequency distribution; this reads the arrival ORDER.
    *
    * Exact, with no corpus-wide window and no per-prefix rescans: a
    * token's contribution to every checkpoint is decided by its FIRST
    * document — one digest-keyed `min(doc_id)` aggregate (tokens hash to
    * `md5Long60` so only digests cross the shuffle, the repo discipline)
    * — and occurrence mass by each doc's own id, a second
    * map-side-combinable aggregate over per-doc token counts. Both
    * explode the (tiny) checkpoint array BEFORE their groupBy, so each
    * is ONE combined shuffle to `checkpoints` rows. Output per
    * checkpoint: (checkpoint, n_occurrences, vocab_size, ttr_ppm — the
    * type/token ratio, vocab·10⁶ // occurrences).
    */
  def vocabGrowth(docs: DataFrame,
                  checkpoints: Seq[Long] = Seq(49L, 99L, 199L, 499L)): DataFrame = {
    require(checkpoints.nonEmpty, "need at least one checkpoint")
    val ckArr = array(checkpoints.sorted.map(lit): _*)
    val firstDoc = withTokens(docs)
      .select(col("doc_id"), explode(col("__toks")).as("tok"))
      .select(col("doc_id"), PortableHash.md5Long60(col("tok")).as("th"))
      .groupBy(col("th")).agg(min(col("doc_id")).as("fd"))
    val vocab = firstDoc
      .select(explode(ckArr).as("checkpoint"), col("fd"))
      .groupBy(col("checkpoint"))
      .agg(sum(when(col("fd") <= col("checkpoint"), 1L).otherwise(0L))
        .as("vocab_size"))
    val occ = withTokens(docs)
      .select(col("doc_id"), size(col("__toks")).cast("long").as("n"))
      .select(explode(ckArr).as("checkpoint"), col("doc_id"), col("n"))
      .groupBy(col("checkpoint"))
      .agg(sum(when(col("doc_id") <= col("checkpoint"), col("n")).otherwise(0L))
        .as("n_occurrences"))
    vocab.join(occ, "checkpoint")
      .select(col("checkpoint"), col("n_occurrences"), col("vocab_size"),
        intDiv(col("vocab_size") * lit(1000000L), col("n_occurrences"))
          .as("ttr_ppm"))
  }

  /** Repetition signals (the Gopher/MassiveText-style quality rules for
    * detecting degenerate repetitive text), integer ppm:
    *
    *  - `dup_word_ppm`   = (n_tokens − n_distinct_tokens)·10⁶ // n_tokens
    *  - `top_bigram_ppm` = occurrences of the most frequent word bigram
    *                       ·10⁶ // n_bigrams (0 when the doc has < 2 tokens)
    *
    * One scan computes the token stats; the bigram side is explode →
    * count → per-doc max — all map-side combinable, group count bounded by
    * distinct (doc, bigram).
    */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val words = withTokens(docs).select(
      col("doc_id"),
      size(col("__toks")).cast("long").as("n_tokens"),
      size(array_distinct(col("__toks"))).cast("long").as("n_distinct"))
    val bg = withTokens(docs)
      .select(col("doc_id"), explode_outer(kgrams(col("__toks"), 2)).as("bigram"))
    val topBg = bg
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("bigram").isNotNull, col("c"))).as("top_c"),
        sum(when(col("bigram").isNotNull, col("c")).otherwise(lit(0L))).as("n_bigrams"))
    words.join(topBg, "doc_id").select(
      col("doc_id"),
      intDiv((col("n_tokens") - col("n_distinct")) * lit(1000000L), col("n_tokens"))
        .as("dup_word_ppm"),
      when(col("n_bigrams") > 0,
        intDiv(col("top_c") * lit(1000000L), col("n_bigrams")))
        .otherwise(lit(0L)).as("top_bigram_ppm"))
  }

  /** Line/paragraph repetition battery — the SEGMENT-level half of
    * Gopher's repetition class (Rae et al. 2021, Table A1: "duplicate
    * line fraction", "duplicate paragraph fraction" and their
    * character-mass duals), which [[repetitionSignals]]' token-level
    * dup-word/top-bigram ppm cannot see: scraped boilerplate repeats
    * whole NAV LINES and whole paragraphs with distinct tokens inside
    * them. Lines split on `\n`, paragraphs on `\n\n`, empty segments
    * dropped; a segment occurrence beyond the first is a duplicate.
    * Integer ppm (the repo discipline):
    *
    *  - `dup_line_ppm`      = (n_lines − n_distinct_lines)·10⁶ // n_lines
    *  - `dup_line_char_ppm` = duplicate-occurrence chars·10⁶ // line chars
    *    (chars beyond each line's first occurrence = Σlen(lines) −
    *    Σlen(distinct lines) — the fraction of the document's mass that
    *    is literal segment repetition, Gopher's actual filter signal)
    *  - the paragraph duals.
    *
    * Scale shape: ONE narrow scan, zero shuffles — every metric is a
    * per-row array fold (split / array_distinct / aggregate over the
    * doc's own segments), the quality-gate class. The HOF bodies touch
    * only lambda vars (`length(x)`), the documented cheap-body rule.
    */
  def segmentRepetition(docs: DataFrame, text: Column = col("text")): DataFrame = {
    def segs(sep: String): Column =
      filter(split(text, sep), x => length(x) > 0)
    def mets(sc: Column, pfx: String): Seq[Column] = {
      val n = size(sc).cast("long")
      val nd = size(array_distinct(sc)).cast("long")
      val tc = aggregate(sc, lit(0L), (a, x) => a + length(x))
      val dc = tc - aggregate(array_distinct(sc), lit(0L), (a, x) => a + length(x))
      Seq(
        n.as(s"n_${pfx}s"),
        when(n > 0, intDiv((n - nd) * lit(1000000L), n))
          .otherwise(lit(0L)).as(s"dup_${pfx}_ppm"),
        when(tc > 0, intDiv(dc * lit(1000000L), tc))
          .otherwise(lit(0L)).as(s"dup_${pfx}_char_ppm"))
    }
    docs.select(
      col("doc_id") +: (mets(segs("\n"), "line") ++ mets(segs("\n\n"), "para")): _*)
  }

  /** Bigram novelty — a per-doc memorization/boilerplate signal the dedup
    * family doesn't give directly: of a document's DISTINCT bigrams, the
    * ppm that appear in no other document. Low novelty = the doc is
    * assembled from corpus-common phrases (template/boilerplate); high =
    * unique content. (Pairwise overlap is [[graft.dedup.Dedup]]'s job;
    * this is the corpus-wide aggregate per doc.)
    *
    * Shape: one generator over per-doc distinct bigrams → document
    * frequency by md5 digest (map-side combinable; raw text never crosses
    * the shuffle) → join back by digest → per-doc counts. Docs with fewer
    * than 2 tokens have no bigrams and drop out, like jq's empty stream.
    */
  def bigramNovelty(docs: DataFrame): DataFrame = {
    val bg = withTokens(docs)
      .select(col("doc_id"),
        explode(array_distinct(kgrams(col("__toks"), 2))).as("g"))
      .select(col("doc_id"), graft.functions.PortableHash.md5Hex(col("g")).as("gh"))
    val docFreq = bg.groupBy(col("gh")).agg(count(lit(1)).as("df"))
    bg.join(docFreq, "gh")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_ppm",
        intDiv(col("n_novel") * lit(1000000L), col("n_bigrams")))
  }

  /** Data-selection importance scores via hashed n-gram likelihood ratios
    * (DSIR — Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): each document scores
    * Σ_occurrences λ[bucket], where λ is the add-one-smoothed
    * log-likelihood ratio between a TARGET distribution (here: the
    * `targetPred` slice, standing in for a high-quality reference corpus)
    * and the RAW corpus distribution over `buckets` hashed bigram
    * features. Documents resembling the target score high; resampling on
    * these scores is DSIR's selection step.
    *
    * Engine-exact divergence from the paper: log2 is QUANTIZED to
    * floor-log2 of the smoothed integer counts (`length(bin(n)) − 1` —
    * identical in Spark and DuckDB), so λ is an integer number of bits
    * and every score reproduces bit-for-bit cross-engine. Ranking
    * granularity is coarser than float logs by < 1 bit per feature.
    *
    * Scale shape: one generator pass over bigram occurrences feeding two
    * map-side-combinable aggregates — per-(doc, bucket) counts and the
    * `buckets`-row corpus table; λ rides a broadcast join back onto the
    * per-doc counts, totals a 1-row broadcast. Raw text never crosses a
    * shuffle; per-doc state is ≤ `buckets` rows.
    * Output: (doc_id, n_bigrams, score_bits).
    */
  def dsirScore(docs: DataFrame, targetPred: Column = col("lang") === "en",
                buckets: Int = 1024): DataFrame = {
    val bg = withTokens(docs)
      .select(col("doc_id"), targetPred.as("__is_t"),
        explode(kgrams(col("__toks"), 2)).as("g"))
      .select(col("doc_id"), col("__is_t"),
        (graft.functions.PortableHash.md5Long60(concat(lit("dsir:"), col("g")))
          % lit(buckets.toLong)).as("b"))
    val docBuckets = bg.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("n"))
    val table = bg.groupBy(col("b")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("__is_t"), 1L).otherwise(0L)).as("ct"))
    val totals = table.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    def fl2(c: Column): Column = (length(bin(c.cast("long"))) - 1).cast("long")
    val lam = table.crossJoin(broadcast(totals)).select(
      col("b"),
      (fl2(col("ct") + 1) - fl2(col("cr") + 1)
        + fl2(col("tr") + lit(buckets.toLong))
        - fl2(col("tt") + lit(buckets.toLong))).as("lam"))
    docBuckets.join(broadcast(lam), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"),
        sum(col("n") * col("lam")).as("score_bits"))
  }

  /** The trained DSIR model as a driver-local array: λ[bucket] for every
    * hashed-bigram bucket (the same add-one floor-log2 likelihood ratios
    * [[dsirScore]] joins per doc). `buckets` longs — the broadcast-model
    * shape: train once in batch, ship the array into a stream's scoring
    * projection ([[graft.streaming.StreamingText.dsirScoreStream]]) or
    * any other engine. Collect is `buckets`-bounded (the k-means
    * control-loop convention).
    */
  def dsirLambda(docs: DataFrame, targetPred: Column = col("lang") === "en",
                 buckets: Int = 1024): Array[Long] = {
    val bg = withTokens(docs)
      .select(col("doc_id"), targetPred.as("__is_t"),
        explode(kgrams(col("__toks"), 2)).as("g"))
      .select(col("__is_t"),
        (graft.functions.PortableHash.md5Long60(concat(lit("dsir:"), col("g")))
          % lit(buckets.toLong)).as("b"))
    val table = bg.groupBy(col("b")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("__is_t"), 1L).otherwise(0L)).as("ct"))
    val totals = table.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    def fl2(c: Column): Column = (length(bin(c.cast("long"))) - 1).cast("long")
    val rows = table.crossJoin(broadcast(totals)).select(
      col("b"),
      (fl2(col("ct") + 1) - fl2(col("cr") + 1)
        + fl2(col("tr") + lit(buckets.toLong))
        - fl2(col("tt") + lit(buckets.toLong))).as("lam"))
      .collect()
    // absent buckets carry the all-smoothing ratio: FL2(1)−FL2(1)+Δtot
    val totRow = totals.collect().head
    val base = (63 - java.lang.Long.numberOfLeadingZeros(totRow.getLong(0) + buckets)) -
      (63 - java.lang.Long.numberOfLeadingZeros(totRow.getLong(1) + buckets))
    val lam = Array.fill(buckets)(base.toLong)
    rows.foreach(r => lam(r.getLong(0).toInt) = r.getLong(1))
    lam
  }

  /** Per-document n-gram language-model perplexity proxy (the CCNet
    * quality filter — Wenzek et al. 2020 score documents by a KenLM
    * perplexity and keep the low tail; here the LM is a bigram model with
    * add-one smoothing trained on the corpus itself, standing in for the
    * reference-corpus LM a production pipeline would broadcast-load):
    * each token transition (w1, w2) costs
    * `bits = FL2(c1(w1) + V) − FL2(c2(w1,w2) + 1)` — the floor-log2
    * quantization of −log2 p(w2 | w1) under
    * p = (c2 + 1)/(c1 + V) — and a document's score is its total and
    * mean transition cost. High mean bits = surprising text (gibberish,
    * boilerplate soup); the keep-low-tail filter is CCNet's head/tail
    * split. Quantization (same `length(bin(n)) − 1` device as
    * [[dsirScore]]) keeps every score an engine-exact integer.
    *
    * Scale shape: transitions explode once; the bigram and prefix count
    * tables are corpus-bounded (NOT broadcastable at scale) so scoring
    * joins them by 60-bit digest — two digest-only equi-join shuffles,
    * map-side-combinable counts, V a 1-row broadcast. Raw text never
    * crosses an exchange. Output:
    * (doc_id, n_transitions, total_bits, mean_bits_ppm).
    */
  def lmPerplexity(docs: DataFrame): DataFrame = {
    // The transition frame feeds THREE consumers (bigram counts, prefix
    // counts, the per-doc scoring join) — without a checkpoint each one
    // re-runs the tokenize + explode + double-md5 corpus scan, tripling
    // the query's dominant cost (Spark reuses exchanges, not projections).
    // Lazy localCheckpoint: ~24 bytes/transition materializes once on the
    // first job and the two other subtrees read the cached blocks (the
    // connectedComponents discipline).
    val tr = withTokens(docs)
      .select(col("doc_id"), explode(kgrams(col("__toks"), 2)).as("g"))
      .select(col("doc_id"),
        graft.functions.PortableHash.md5Long60(concat(lit("lm2:"), col("g"))).as("g2"),
        graft.functions.PortableHash.md5Long60(
          concat(lit("lm1:"), substring_index(col("g"), " ", 1))).as("g1"))
      .localCheckpoint(eager = false)
    val big = tr.groupBy(col("g2")).agg(count(lit(1)).as("c2"))
    val pre = tr.groupBy(col("g1")).agg(count(lit(1)).as("c1"))
    val vocab = withTokens(docs)
      .select(explode(col("__toks")).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    def fl2(c: Column): Column = (length(bin(c.cast("long"))) - 1).cast("long")
    tr.join(big, Seq("g2")).join(pre, Seq("g1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        (fl2(col("c1") + col("v")) - fl2(col("c2") + 1)).as("bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_transitions"), sum(col("bits")).as("total_bits"))
      .withColumn("mean_bits_ppm",
        intDiv(col("total_bits") * lit(1000000L), col("n_transitions")))
  }

  /** Interpolated KNESER–NEY bigram perplexity (Kneser & Ney 1995; the
    * interpolated form of Chen & Goodman 1998 §4.2) — the smoothing the
    * production filter actually ships: CCNet's quality signal is a KenLM
    * model, and KenLM IS interpolated modified Kneser–Ney. Beside
    * [[lmPerplexity]]'s add-smoothed bigram this is the other LM family,
    * with the two ideas plain add-k lacks: ABSOLUTE DISCOUNTING (each
    * seen bigram gives up a fixed D of its count) and the CONTINUATION
    * distribution (the backoff weight of a word is how many distinct
    * contexts it follows, not how often — the "San Francisco" fix: a
    * frequent-but-predictable word stops inflating unseen-context mass).
    *
    * Engine-exact integer formulation on the centi-count channel
    * (D = `discountCc`/100, default 0.75 — Chen–Goodman's fixed-discount
    * baseline), each step one truncating division in a fixed order:
    *   - term1_ppm = ((100·c(vw) − D_cc) · 10⁶) div (100·c(v·))
    *   - λ_ppm     = (D_cc · N1+(v·) · 10⁶) div (100·c(v·))
    *   - pcont_ppm = (N1+(·w) · 10⁶) div N1+(··)
    *   - p_ppm     = term1_ppm + (λ_ppm · pcont_ppm) div 10⁶
    * where N1+ are distinct-bigram-TYPE counts. Scoring is the corpus's
    * own model (the t25/t32 self-consistency shape), so every scored
    * transition has c(vw) ≥ 1 and the max(·,0) clamp never binds.
    * Surprisal is floor-log2 quantized on the ppm channel —
    * `bits = 20 − FL2(p_ppm + 1)` (2²⁰ > 10⁶ ≥ 2¹⁹, so p = 1 scores 1
    * bit, p → 0 scores 20) — the [[lmPerplexity]] device one level up.
    *
    * Scale shape: the transition frame materializes ONCE (lazy
    * `localCheckpoint` — FIVE consumers) carrying three 60-bit digests
    * per transition (bigram, prefix word, suffix word; raw text never
    * shuffles); counts and type-counts are map-side-combinable groupBys
    * over digests; the type frame (one `distinct`) feeds both N1+ sides
    * and the scalar total (broadcast). Long-overflow bound: safe while
    * c(vw) < 9·10¹⁰ and N1+(·w) · 10⁶ fits a long — beyond that the
    * DECIMAL(38,0) channel is the documented hatch.
    *
    * Returns per doc: (doc_id, n_transitions, total_bits,
    * mean_bits_ppm) — [[lmPerplexity]]'s exact output shape, so the two
    * models drop into the same downstream band filters.
    */
  def knPerplexity(docs: DataFrame, discountCc: Long = 75L): DataFrame = {
    require(discountCc > 0 && discountCc < 100,
      "discountCc is a centi-count discount in (0, 100)")
    val tr = withTokens(docs)
      .select(col("doc_id"), explode(kgrams(col("__toks"), 2)).as("g"))
      .select(col("doc_id"),
        graft.functions.PortableHash.md5Long60(
          concat(lit("lm2:"), col("g"))).as("g2"),
        graft.functions.PortableHash.md5Long60(
          concat(lit("lm1:"), substring_index(col("g"), " ", 1))).as("g1"),
        graft.functions.PortableHash.md5Long60(
          concat(lit("lm1:"), substring_index(col("g"), " ", -1))).as("gw"))
      .localCheckpoint(eager = false)
    val big = tr.groupBy(col("g2")).agg(count(lit(1)).as("c2"))
    val pre = tr.groupBy(col("g1")).agg(count(lit(1)).as("c1"))
    val types = tr.select(col("g2"), col("g1"), col("gw")).distinct()
      .localCheckpoint(eager = false)
    val n1v = types.groupBy(col("g1")).agg(count(lit(1)).as("n1v"))
    val n1w = types.groupBy(col("gw")).agg(count(lit(1)).as("n1w"))
    val ntot = types.agg(count(lit(1)).as("ntot"))
    def fl2(c: Column): Column = (length(bin(c.cast("long"))) - 1).cast("long")
    tr.join(big, Seq("g2")).join(pre, Seq("g1"))
      .join(n1v, Seq("g1")).join(n1w, Seq("gw"))
      .crossJoin(broadcast(ntot))
      .select(col("doc_id"),
        (expr(s"((100L * c2 - ${discountCc}L) * 1000000L) div (100L * c1)") +
          expr(s"""(((${discountCc}L * n1v * 1000000L) div (100L * c1))
                  | * ((n1w * 1000000L) div ntot)) div 1000000L"""
            .stripMargin)).as("p_ppm"))
      .select(col("doc_id"), (lit(20L) - fl2(col("p_ppm") + 1)).as("bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_transitions"), sum(col("bits")).as("total_bits"))
      .withColumn("mean_bits_ppm",
        intDiv(col("total_bits") * lit(1000000L), col("n_transitions")))
  }

  /** Multinomial Naive-Bayes document classifier over hashed token
    * buckets — the fastText-style quality/domain classifier of LLM data
    * pipelines (CCNet/LLaMA-class corpora score every crawl doc with a
    * lightweight linear text classifier; NB over hashed bag-of-words is
    * the same model family with a closed-form, engine-exact training
    * step, so both halves run IN the engine with no external trainer):
    *
    *   - train: per-(label, bucket) token counts with add-one smoothing,
    *     floor-log2 QUANTIZED (the `length(bin(n))-1` device shared with
    *     [[dsirScore]]/[[lmPerplexity]]) — `w(l,b) = FL2(c_lb + 1) −
    *     FL2(T_l + B)` integer bits of log2 p(bucket | label), plus prior
    *     bits `FL2(docs_l) − FL2(docs)`;
    *   - score: `score(d,l) = prior(l) + Σ_tokens w(l, bucket(tok))`;
    *     the prediction is the argmax, ties broken by the greater label
    *     (a total, engine-deterministic pick).
    *
    * Here the corpus's own `labelCol` plays the training label (the
    * self-consistency shape an oracle can check end-to-end); a production
    * pipeline trains on a curated seed slice and scores the crawl — same
    * plan, different `docs` for the two halves.
    *
    * Scale shape: the (label × bucket) weight table is DENSE and tiny
    * (labels·buckets rows — unseen pairs carry the smoothing-only weight)
    * and BROADCASTS into the exploded token stream, so raw text never
    * shuffles: tokens hash map-side, the per-(doc, label) partial sums
    * are map-side-combinable, and the argmax is a `max(struct)` over the
    * labels-bounded per-doc group. ONE data-sized shuffle total, carrying
    * (doc_id, label, bits) triples.
    */
  def nbClassifier(docs: DataFrame, labelCol: String = "lang",
                   buckets: Int = 1024): DataFrame =
    nbScored(docs, nbWordBuckets(docs, labelCol, buckets), labelCol, buckets)
      .select(col("doc_id"), col("pred"), col("score_bits"),
        (col("pred") === col("truth")).cast("long").as("self_match"))

  /** [[nbClassifier]]'s word-token bucketing: one split per row, tokens
    * hashed to `buckets` map-side. (doc_id, label, b) — text never
    * survives this projection.
    */
  private def nbWordBuckets(docs: DataFrame, labelCol: String,
                            buckets: Int): DataFrame =
    withTokens(docs)
      .select(col("doc_id"), col(labelCol).as("label"), explode(col("__toks")).as("tok"))
      .select(col("doc_id"), col("label"),
        (graft.functions.PortableHash.md5Long60(concat(lit("nb:"), col("tok")))
          % lit(buckets.toLong)).as("b"))

  /** Character n-grams of `text` as a Column (empty below n chars) —
    * the sub-word feature CCNet-class language identifiers use (fastText
    * langid trains on char n-grams precisely because function words are
    * NOT required: morphology shows up in every token). Each element is
    * `substr(text, i, n)`; the lambda body touches only the attribute
    * and the lambda var (the HOF discipline from [[graft.dedup.Dedup.shingles]]).
    */
  def charGrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Char-n-gram bucketing for [[charNgramLangId]]: grams hash under the
    * `cg:` domain prefix so the char model and the word model can never
    * collide in a shared bucket space.
    */
  private def nbCharBuckets(docs: DataFrame, labelCol: String,
                            buckets: Int, n: Int): DataFrame =
    docs
      .select(col("doc_id"), col(labelCol).as("label"),
        explode(charGrams(col("text"), n)).as("g"))
      .select(col("doc_id"), col("label"),
        (graft.functions.PortableHash.md5Long60(concat(lit("cg:"), col("g")))
          % lit(buckets.toLong)).as("b"))

  /** The NB train-and-score core over a pre-bucketed feature stream
    * `tk = (doc_id, label, b)` — shared by the word-token classifier
    * ([[nbClassifier]]) and the char-n-gram language identifier
    * ([[charNgramLangId]]); the math and scale shape documented on
    * [[nbClassifier]]. Returns (doc_id, pred, score_bits, truth) — truth
    * rides OUT of the one docs join the scorer already pays, so the
    * confusion matrices never need a second one.
    */
  private def nbScored(docs: DataFrame, tk: DataFrame, labelCol: String,
                       buckets: Int): DataFrame = {
    val spark = docs.sparkSession
    val b = lit(buckets.toLong)
    def fl2(c: Column): Column = (length(bin(c.cast("long"))) - 1).cast("long")
    // training tables: all label×bucket-bounded, never data-sized
    val counts = tk.groupBy(col("label"), col("b")).agg(count(lit(1)).as("c"))
    val labelTotals = tk.groupBy(col("label")).agg(count(lit(1)).as("t"))
    val priors = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("dn"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("d"))))
      .select(col("label"), (fl2(col("dn")) - fl2(col("d"))).as("p"))
    val dense = labelTotals
      .crossJoin(spark.range(buckets).select(col("id").as("b")))
      .join(counts, Seq("label", "b"), "left")
      .select(col("label"), col("b"),
        (fl2(coalesce(col("c"), lit(0L)) + 1) - fl2(col("t") + b)).as("w"))
    val scores = tk.select(col("doc_id"), col("b"))
      .join(broadcast(dense), Seq("b"))
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("w")).as("tok_bits"))
      .join(broadcast(priors), Seq("label"))
      .select(col("doc_id"), col("label"), (col("p") + col("tok_bits")).as("score"))
    scores.groupBy(col("doc_id"))
      .agg(max(struct(col("score"), col("label"))).as("__best"))
      .select(col("doc_id"),
        col("__best.label").as("pred"),
        col("__best.score").as("score_bits"))
      .join(docs.select(col("doc_id"), col(labelCol).as("truth")), Seq("doc_id"))
  }

  /** Char-n-gram Naive-Bayes LANGUAGE IDENTIFIER — the trained model
    * [[languageId]]'s stopword voter graduates to when [[langIdConfusion]]
    * shows it bleeding (the t51 gate exists precisely to trigger this
    * upgrade): CCNet identifies language with fastText over char n-grams
    * (Wenzek et al. 2020; Joulin et al. 2017), because sub-word
    * morphology identifies a language even in text with no function
    * words at all — the slice where a stopword list can only answer
    * `und`. Same closed-form NB family as [[nbClassifier]], trained on
    * the corpus's own `labelCol`, over hashed char-`n`-gram buckets.
    * Output: (doc_id, pred, score_bits, self_match), the t32 shape.
    *
    * Scale shape: identical to [[nbClassifier]] — the gram explode is
    * the only corpus-sized pass, grams hash map-side, the dense weight
    * table broadcasts, ONE data-sized shuffle of (doc_id, label, bits).
    */
  def charNgramLangId(docs: DataFrame, labelCol: String = "lang",
                      buckets: Int = 1024, n: Int = 3): DataFrame =
    nbScored(docs, nbCharBuckets(docs, labelCol, buckets, n), labelCol, buckets)
      .select(col("doc_id"), col("pred"), col("score_bits"),
        (col("pred") === col("truth")).cast("long").as("self_match"))

  /** Confusion cells over an `(doc_id, pred, truth)`-shaped frame: per
    * (truth, pred) doc counts + each cell's ppm share of its truth row
    * (labels²-bounded output; the t34/t51 matrix shape).
    */
  private def confusionCells(preds: DataFrame): DataFrame = {
    val cells = preds.groupBy(col("truth"), col("pred"))
      .agg(count(lit(1)).as("n"))
    val rowTotals = cells.groupBy(col("truth")).agg(sum(col("n")).as("rt"))
    cells.join(broadcast(rowTotals), Seq("truth"))
      .select(col("truth"), col("pred"), col("n"),
        intDiv(col("n") * lit(1000000L), col("rt")).as("row_ppm"))
  }

  /** The char-n-gram identifier's measured gate (the t34 pattern for
    * [[charNgramLangId]]): its confusion matrix against the corpus's own
    * labels — the row the t51 → t52 comparison reads to decide whether
    * the trained model has earned the langid slot from the stopword
    * voter. No second docs join: truth rides out of the scorer.
    */
  def charNgramConfusion(docs: DataFrame, labelCol: String = "lang",
                         buckets: Int = 1024, n: Int = 3): DataFrame =
    confusionCells(
      nbScored(docs, nbCharBuckets(docs, labelCol, buckets, n), labelCol, buckets))

  /** CCNet's head/middle/tail corpus split (Wenzek et al. 2020 §4.3 —
    * the step AFTER [[lmPerplexity]] scores): per LANGUAGE, documents
    * partition into perplexity terciles — `head` (lowest mean bits =
    * most fluent), `middle`, `tail` — and pretraining recipes keep
    * head+middle. Cutoffs are the exact LOWER-discrete per-lang terciles
    * of `mean_bits_ppm` (the [[lengthQuantiles]]/t13 convention: the
    * smallest score whose cumulative count reaches k/3), so the split is
    * engine-exact integer arithmetic end to end.
    *
    * Scale shape: scores collapse to a per-(lang, score) histogram
    * (distinct scores ≪ docs) before any window; the cumsum windows
    * partition by lang; the 2-row-per-lang cutoff table broadcasts back
    * onto the scored docs. Documents with no bigram transitions (< 2
    * tokens) have no perplexity and drop, as in [[lmPerplexity]].
    * Output: (doc_id, lang, mean_bits_ppm, bucket).
    */
  def ccnetBuckets(docs: DataFrame): DataFrame = {
    val px = lmPerplexity(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("mean_bits_ppm"))
    val hist = px.groupBy(col("lang"), col("mean_bits_ppm").as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("__v"))
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    val cd = hist
      .withColumn("__cum", sum(col("__cnt")).over(wCum))
      .withColumn("__tot", sum(col("__cnt")).over(wTot))
    def cutoff(k: Int) = cd.where(col("__cum") * lit(3L) >= lit(k.toLong) * col("__tot"))
      .groupBy(col("lang")).agg(min(col("__v")).as(s"__c$k"))
    val cuts = cutoff(1).join(cutoff(2), Seq("lang"))
    px.join(broadcast(cuts), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("mean_bits_ppm"),
        when(col("mean_bits_ppm") <= col("__c1"), lit("head"))
          .when(col("mean_bits_ppm") <= col("__c2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Per-source distribution DRIFT: the token-distribution divergence of
    * each corpus slice against the whole corpus — the distribution-level
    * companion to [[graft.dedup.Dedup.corpusOverlap]]'s set-level read
    * (two sources can share every token yet weight them very
    * differently; this catches that). The score is the DSIR-family
    * quantized KL estimate: per token, `n_st · ((FL2(n_st) − FL2(N_s)) −
    * (FL2(n_t) − FL2(N)))` — occurrences times the floor-log2 bits of
    * the within-slice vs corpus-wide likelihood ratio — summed per
    * slice. Integer bits, engine-exact (`length(bin(n))−1`, the device
    * shared with [[dsirScore]]/[[lmPerplexity]]/[[nbClassifier]]);
    * quantization can make individual terms negative, the aggregate is
    * the drift signal.
    *
    * Scale shape: tokens hash to 60-bit digests map-side, the
    * per-(slice, digest) and per-digest counts are map-side-combinable
    * aggregates over digest-only rows, the corpus table joins back by
    * digest (vocab-bounded, AQE-sized), and the slice totals / corpus
    * total are slices-bounded / 1-row broadcasts. Raw text never
    * shuffles. Output: (slice, n_tokens, divergence_bits).
    */
  def sourceDivergence(docs: DataFrame, sliceCol: String = "source"): DataFrame = {
    val tok = withTokens(docs)
      .select(col(sliceCol).cast("string").as("slice"), explode(col("__toks")).as("w"))
      .select(col("slice"),
        graft.functions.PortableHash.md5Long60(concat(lit("kl:"), col("w"))).as("d"))
    val st = tok.groupBy(col("slice"), col("d")).agg(count(lit(1)).as("nst"))
    val ct = tok.groupBy(col("d")).agg(count(lit(1)).as("nt"))
    val sTot = st.groupBy(col("slice")).agg(sum(col("nst")).as("ns"))
    val tot = ct.agg(sum(col("nt")).as("n"))
    def fl2(c: Column): Column = (length(bin(c.cast("long"))) - 1).cast("long")
    st.join(ct, Seq("d"))
      .join(broadcast(sTot), Seq("slice"))
      .crossJoin(broadcast(tot))
      .select(col("slice"), col("nst"),
        (col("nst") * ((fl2(col("nst")) - fl2(col("ns")))
          - (fl2(col("nt")) - fl2(col("n"))))).as("bits"))
      .groupBy(col("slice"))
      .agg(sum(col("nst")).as("n_tokens"), sum(col("bits")).as("divergence_bits"))
  }

  /** The classifier's measured gate (the [[graft.similarity.Ann.recallAtK]] /
    * [[graft.dedup.Dedup.minhashCalibration]] pattern for t32): the
    * confusion matrix of [[nbClassifier]] against the corpus's own
    * labels — per (truth, pred) document counts plus each cell's ppm
    * share of its truth row, the accept/reject read for (buckets,
    * labelCol) choices before a model ships. Truth rides out of the one
    * docs join the scorer already pays ([[nbScored]]) — no second join —
    * and the matrix itself is labels²-bounded.
    * Output: (truth, pred, n, row_ppm).
    */
  def nbConfusion(docs: DataFrame, labelCol: String = "lang",
                  buckets: Int = 1024): DataFrame =
    confusionCells(
      nbScored(docs, nbWordBuckets(docs, labelCol, buckets), labelCol, buckets))

  /** The trained NB classifier as a driver-local model (the broadcast-
    * model shape shared with [[dsirLambda]]): labels in ASCENDING order,
    * prior bits per label, and the dense label×bucket weight table
    * flattened label-major (`weights(l * buckets + b)`). Exactly
    * [[nbClassifier]]'s training tables, collected — the collect is
    * labels·buckets-bounded (the k-means control-loop convention). Ship
    * into a stream via [[graft.streaming.StreamingText.nbScoreStream]]
    * for row-for-row parity with the batch scorer.
    */
  final case class NbModel(labels: Array[String], priors: Array[Long],
                           weights: Array[Long], buckets: Int)

  def nbModel(docs: DataFrame, labelCol: String = "lang",
              buckets: Int = 1024): NbModel = {
    val b = lit(buckets.toLong)
    val tk = withTokens(docs)
      .select(col(labelCol).as("label"), explode(col("__toks")).as("tok"))
      .select(col("label"),
        (graft.functions.PortableHash.md5Long60(concat(lit("nb:"), col("tok"))) % b)
          .as("b"))
    def fl2(c: Column): Column = (length(bin(c.cast("long"))) - 1).cast("long")
    val labelTotals = tk.groupBy(col("label")).agg(count(lit(1)).as("t"))
    val labels = labelTotals.select(col("label")).collect()
      .map(_.getString(0)).sorted
    val idx = labels.zipWithIndex.toMap
    val totalsByLabel = labelTotals.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def fl2l(n: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val priorRows = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("dn")).collect()
    val dTotal = priorRows.map(_.getLong(1)).sum
    val priors = Array.ofDim[Long](labels.length)
    priorRows.foreach(r =>
      priors(idx(r.getString(0))) = fl2l(r.getLong(1)) - fl2l(dTotal))
    // dense weights: unseen (label, bucket) pairs carry the smoothing-only
    // weight FL2(1) − FL2(T_l + B) = −FL2(T_l + B)
    val weights = Array.tabulate(labels.length * buckets) { i =>
      -fl2l(totalsByLabel(labels(i / buckets)) + buckets)
    }
    tk.groupBy(col("label"), col("b")).agg(count(lit(1)).as("c")).collect()
      .foreach { r =>
        val l = idx(r.getString(0))
        weights(l * buckets + r.getLong(1).toInt) =
          fl2l(r.getLong(2) + 1) - fl2l(totalsByLabel(labels(l)) + buckets)
      }
    NbModel(labels, priors, weights, buckets)
  }

  /** Composite quality gate — the FILTER step the scoring operators exist
    * for (Gopher/C4-style rule chain): per doc, one flag per rule plus the
    * pass verdict, so downstream can both filter (`pass = 1`) and account
    * for WHY documents dropped (sum the flags). Rules, all integer ppm:
    *
    *  - `fail_short`      — fewer than `minTokens` tokens
    *  - `fail_stopword`   — stopword density below `minStopPpm` (gibberish
    *    / non-prose signal; Gopher's "no stop words" rule)
    *  - `fail_repetition` — duplicate-word mass above `maxDupPpm`
    *    (Gopher's repetition class)
    *  - `fail_punct`      — symbol density above `maxPunctPpm` (C4's
    *    punctuation/boilerplate signal; inert on this all-[a-z0-9 ]
    *    corpus, kept because real crawls need it)
    *
    * ONE narrow scan (doc_id, text), no joins, no shuffle — the verdict
    * is a per-row projection, the cheapest possible 100 TB shape. Flags
    * are emitted rather than a filtered corpus so the oracle checks every
    * rule's boundary on every doc (the apply step is a trivial
    * `where(pass = 1)`).
    */
  def qualityGate(docs: DataFrame, minTokens: Int = 30, minStopPpm: Long = 30000,
                  maxDupPpm: Long = 600000, maxPunctPpm: Long = 100000): DataFrame = {
    val toks = col("__toks")
    val nToks = size(toks).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    // empty text (0 chars) must yield punct 0 ppm, not NULL/NaN — the
    // token denominators can't hit zero (split("") is one empty token)
    val nChars = greatest(nCharsCol, lit(1L))
    val nPunct = nPunctCol
    val nStop = enStopCount(toks)
    withTokens(docs)
      .select(
        col("doc_id"),
        nToks.as("n_tokens"),
        (nToks < minTokens).cast("long").as("fail_short"),
        (intDiv(nStop * lit(1000000L), nToks) < minStopPpm).cast("long")
          .as("fail_stopword"),
        (intDiv((nToks - nDistinct) * lit(1000000L), nToks) > maxDupPpm).cast("long")
          .as("fail_repetition"),
        (intDiv(nPunct * lit(1000000L), nChars) > maxPunctPpm).cast("long")
          .as("fail_punct"))
      .withColumn("pass",
        (col("fail_short") + col("fail_stopword") +
          col("fail_repetition") + col("fail_punct") === 0).cast("long"))
  }

  /** The full Gopher rule battery (Rae et al. 2021, Appendix A) as per-doc
    * metrics + flags — the companion to [[qualityGate]]'s C4-leaning rules,
    * covering the Gopher-specific signals that gate omits:
    *
    *  - `fail_word_count`    — n_tokens outside [minTokens, maxTokens]
    *  - `fail_mean_word_len` — mean word length outside [3, 10] chars
    *    (computed exactly as (chars − spaces)·10⁶ // tokens: the corpus is
    *    single-space tokenized, so chars − (n−1) is total word chars)
    *  - `fail_alpha`         — fraction of tokens containing an alphabetic
    *    char below 80% (Gopher's "80% of words contain ≥1 alphabetic")
    *  - `fail_stop_distinct` — fewer than 2 DISTINCT stopwords present
    *    (Gopher requires ≥2 of its stop set, not just density)
    *
    * All metrics are integer ppm; the whole verdict is ONE narrow
    * projection — no join, no shuffle, the same 100 TB shape as
    * [[qualityGate]] (plan-audited there). Lambda bodies touch only the
    * lambda var (the interpreted-HOF rule).
    * Output: (doc_id, n_tokens, mean_word_len_ppm, alpha_word_ppm,
    * n_stop_distinct, the four flags, pass).
    */
  def gopherRules(docs: DataFrame, minTokens: Long = 50L,
                  maxTokens: Long = 100000L): DataFrame = {
    val toks = col("__toks")
    val nToks = size(toks).cast("long")
    // single-space-joined: word chars = chars − separators
    val wordChars = greatest(nCharsCol - (nToks - 1), lit(0L))
    val meanLenPpm = intDiv(wordChars * lit(1000000L), greatest(nToks, lit(1L)))
    val nAlpha = size(filter(toks, w => w.rlike("[a-z]"))).cast("long")
    val alphaPpm = intDiv(nAlpha * lit(1000000L), greatest(nToks, lit(1L)))
    val nStopDistinct =
      size(array_intersect(array_distinct(toks), typedLit(EnStopwords))).cast("long")
    withTokens(docs)
      .select(
        col("doc_id"),
        nToks.as("n_tokens"),
        meanLenPpm.as("mean_word_len_ppm"),
        alphaPpm.as("alpha_word_ppm"),
        nStopDistinct.as("n_stop_distinct"),
        (nToks < minTokens || nToks > maxTokens).cast("long").as("fail_word_count"),
        (meanLenPpm < 3000000L || meanLenPpm > 10000000L).cast("long")
          .as("fail_mean_word_len"),
        (alphaPpm < 800000L).cast("long").as("fail_alpha"),
        (nStopDistinct < 2).cast("long").as("fail_stop_distinct"))
      .withColumn("pass",
        (col("fail_word_count") + col("fail_mean_word_len") +
          col("fail_alpha") + col("fail_stop_distinct") === 0).cast("long"))
  }

  /** The CCNet/C4 filter chain END-TO-END (Wenzek et al. 2020 §4: langid →
    * quality rules → LM-perplexity band) composed as ONE verdict per doc —
    * the pipeline a corpus actually ships through, not three separate
    * reads:
    *
    *  - `lang_ok`  — predicted language matches the doc's claimed `lang`
    *    with a non-zero stopword score ([[languageId]]);
    *  - `rules_ok` — the Gopher battery passes ([[gopherRules]]);
    *  - `ppl_ok`   — mean transition cost within [minBits, maxBits] ppm
    *    ([[lmPerplexity]]; CCNet keeps the LOW-perplexity head but drops
    *    the degenerate ultra-repetitive floor, hence a band);
    *  - `keep`     — all three.
    *
    * Scale shape: the three verdicts join on doc_id — lmPerplexity's
    * digest joins dominate; langid/rules are shuffle-free projections
    * whose doc_id join rides the same AQE exchange. Docs too short for
    * bigrams (no LM verdict) drop, like the empty-stream rule.
    */
  def ccnetPipeline(docs: DataFrame,
                    minBitsPpm: Long = 1000000L,
                    maxBitsPpm: Long = 4500000L): DataFrame = {
    val lang = languageId(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"),
        (col("pred_lang") === col("lang") && col("lang_score") > 0)
          .cast("long").as("lang_ok"))
    val rules = gopherRules(docs).select(col("doc_id"), col("pass").as("rules_ok"))
    val ppl = lmPerplexity(docs).select(col("doc_id"),
      (col("mean_bits_ppm") >= minBitsPpm && col("mean_bits_ppm") <= maxBitsPpm)
        .cast("long").as("ppl_ok"))
    lang.join(rules, Seq("doc_id")).join(ppl, Seq("doc_id"))
      .withColumn("keep",
        (col("lang_ok") + col("rules_ok") + col("ppl_ok") === 3).cast("long"))
  }

  /** Deterministic stratified sampling — the reproducible-data-mix
    * primitive: a document is kept iff its 60-bit md5 sampling coordinate
    * (`md5("sample:" ++ doc_id) % 10⁶`) falls below its language's rate
    * (ppm). Hash-based (not `rand()`): the SAME subset comes out on every
    * engine, every cluster size, every rerun — which is what makes a
    * training mix auditable. Pure narrow projection + filter; the rate
    * table is a literal `when`-chain in codegen.
    */
  def stratifiedSample(docs: DataFrame, ratesPpm: Map[String, Long],
                       defaultPpm: Long = 500000L): DataFrame = {
    val coord = PortableHash.md5Long60(
      concat(lit("sample:"), col("doc_id").cast("string"))) % lit(1000000L)
    val rate = ratesPpm.toSeq.sortBy(_._1).foldRight(lit(defaultPpm): Column) {
      case ((l, r), els) => when(col("lang") === l, lit(r)).otherwise(els)
    }
    docs.where(coord < rate).select(col("doc_id"), col("lang"))
  }

  /** Temperature-reweighted mixture sampling (the α=0.5 / T=2 upsampling
    * of multilingual-pretraining recipes, e.g. mC4/XLM-R): target
    * per-language shares ∝ share^α flatten the head, and each language
    * gets a deterministic per-doc Bernoulli rate sized to hit a
    * half-corpus budget at that mix. ALL math is integer fixed-point
    * (ppm) except the isqrt, which is floor-of-IEEE-sqrt — exact and
    * engine-portable below 2^52. The draw reuses the md5 sampling
    * coordinate of [[stratifiedSample]], so the SAME docs come out on
    * every engine and rerun.
    *
    * Scale shape: two corpus scans, both map-side-combinable tiny
    * aggregates (per-lang counts, then per-lang kept counts below the
    * broadcast rate table); the rate computation itself runs over
    * |langs| rows. Output: (lang, n_docs, share_ppm, rate_ppm, kept).
    */
  def temperatureSample(docs: DataFrame): DataFrame = {
    val per = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = docs.agg(count(lit(1)).as("__total"))
    val weighted = per.crossJoin(broadcast(tot))
      .withColumn("share_ppm", intDiv(col("n_docs") * lit(1000000L), col("__total")))
      // ppm-scale sqrt(share): sqrt(share_ppm/1e6)·1e6 = isqrt(share_ppm·1e6)
      .withColumn("__w",
        floor(sqrt((col("share_ppm") * lit(1000000L)).cast("double"))).cast("long"))
    val z = weighted.agg(sum(col("__w")).as("__z"))
    val rates = weighted.crossJoin(broadcast(z))
      // per-lang doc quota out of a half-corpus budget, at weights w/Z
      .withColumn("__quota",
        intDiv(intDiv(col("__total"), lit(2L)) * col("__w"), col("__z")))
      .withColumn("rate_ppm",
        least(lit(1000000L), intDiv(col("__quota") * lit(1000000L), col("n_docs"))))
      .select(col("lang"), col("n_docs"), col("share_ppm"), col("rate_ppm"))
    val draw = PortableHash.md5Long60(
      concat(lit("tsample:"), col("doc_id").cast("string"))) % lit(1000000L)
    val kept = docs.join(broadcast(rates.select(col("lang"), col("rate_ppm"))), Seq("lang"))
      .where(draw < col("rate_ppm"))
      .groupBy(col("lang")).agg(count(lit(1)).as("kept"))
    rates.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("share_ppm"), col("rate_ppm"),
        coalesce(col("kept"), lit(0L)).as("kept"))
  }

  /** First-round BPE pair statistics (Sennrich et al., ACL 2016 §3.2):
    * adjacent character-pair frequencies over the corpus VOCABULARY,
    * weighted by word frequency — the argmax is the first BPE merge and
    * the top-k table is the merge-priority view tokenizer training
    * starts from. Two stacked map-side-combinable aggregates: words
    * (digest-sized strings cross the shuffle), then pairs generated over
    * the DISTINCT vocabulary only — pair explosion is bounded by
    * |vocab| × word length, never corpus size — and a
    * TakeOrderedAndProject heap for the top-k (ties broken by pair text,
    * total order).
    */
  def bpePairStats(docs: DataFrame, topK: Int = 50): DataFrame = {
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    words
      .select(col("n"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("n")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(topK)
  }

  /** Full BPE merge TRAINING (Sennrich et al., ACL 2016 §3.2's learn
    * loop, not just [[bpePairStats]]'s first round): k iterations of
    * (count adjacent pairs over the vocabulary, weighted by word
    * frequency) → (argmax pair, ties by pair text) → (merge that pair in
    * every word). Returns the learned merge table (rank, left, right,
    * pair count) — the tokenizer artifact.
    *
    * Scale shape: the corpus is touched ONCE (the word-count aggregate;
    * only digest-sized words cross that shuffle); every iteration after
    * that runs over the DISTINCT vocabulary, ends in a model-bounded
    * 1-row driver collect (the k-means centroid pattern), and
    * `localCheckpoint` truncates the growing replace lineage.
    *
    * The merge-apply trick: words are kept as DOUBLE-space-joined token
    * strings with single-space outer pads (" l  o  w "), so applying a
    * merge is ONE codegen'd literal `replace(" a  b " → " ab ")` — a
    * match consumes one of the two separator spaces on each side,
    * leaving the neighbors' boundaries intact, and SQL replace's
    * non-overlapping left-to-right scan IS BPE's greedy rule ("aaa" +
    * merge(a,a) → [aa, a]).
    */
  def bpeTrain(docs: DataFrame, merges: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(concat(lit(" "), array_join(transform(
          sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))), "  "), lit(" ")).as("s"),
        col("n"))
      .localCheckpoint()
    val learned = Seq.newBuilder[(Long, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      val toks = split(trim(col("s")), "  ")
      val best = words
        .select(col("n"), explode(zip_with(
          slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, concat(col("l"), lit(" "), col("r")).asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((rank.toLong, l, r, cnt))
        words = words.select(
          replace(col("s"), lit(" " + l + "  " + r + " "), lit(" " + l + r + " "))
            .as("s"), col("n"))
          .localCheckpoint()
        rank += 1
      }
    }
    learned.result().toDF("rank", "left", "right", "cnt")
  }

  /** BPE ENCODE over the corpus with a learned merge table — the
    * [[bpeTrain]] → tokenize loop closed: each document's words pass
    * through the k merges and the per-doc report carries word count,
    * base (character) token count, and post-merge BPE token count — the
    * compression read a tokenizer build checks before committing to a
    * merge budget.
    *
    * The merge table collects to the driver (k rows — model-bounded,
    * like centroids) and folds into the plan as k chained literal
    * replaces over the same double-space token-string representation as
    * training, so the encode is ONE corpus scan, shuffle-free per doc,
    * no UDF.
    */
  def bpeEncode(docs: DataFrame, merges: Int = 4): DataFrame = {
    val table = bpeTrain(docs, merges).orderBy(col("rank"))
      .select(col("left"), col("right")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val words = filter(split(col("text"), " "), w => w =!= lit(""))
    def encoded(w: Column): Column = {
      // (?s): Java '.' skips line terminators by default — a word
      // containing \n must space identically to bpeTrain's substr loop
      val spaced = concat(lit(" "),
        regexp_replace(w, "(?s)(.)(?=.)", "$1  "), lit(" "))
      table.foldLeft(spaced) { case (s, (l, r)) =>
        replace(s, lit(" " + l + "  " + r + " "), lit(" " + l + r + " "))
      }
    }
    docs.select(col("doc_id"),
      size(words).cast("long").as("n_words"),
      aggregate(words, lit(0L), (acc, w) => acc + length(w).cast("long"))
        .as("n_char_tokens"),
      aggregate(words, lit(0L), (acc, w) =>
        acc + size(split(trim(encoded(w)), "  ")).cast("long"))
        .as("n_bpe_tokens"))
  }

  /** Unigram-LM (SentencePiece) tokenizer statistics — Kudo ACL'18, the
    * OTHER tokenizer family production models actually ship beside BPE
    * ([[bpeTrain]]): seed a substring vocabulary, then EM — E-step
    * Viterbi-segment every word under the current token likelihoods,
    * M-step re-estimate token counts from the segmentations. Engine-exact
    * by construction so the iterative loop is oracle-checkable:
    *
    *  - seed = ALL single characters (coverage guarantee: every word
    *    stays segmentable) + the `topK` most frequent substrings of
    *    length 2..`maxTokLen`, frequency = occurrence positions weighted
    *    by word count, ties by substring text;
    *  - token cost in integer BITS via the repo's floor-log2 quantizer
    *    (`FL2(total) − FL2(count)`, the [[lmPerplexity]]/[[nbClassifier]]
    *    device) — no float logs, both engines agree bit-for-bit;
    *  - E-step Viterbi per DISTINCT word minimizes (total bits, token
    *    count, then longer-last-token) — a total, engine-deterministic
    *    order the DuckDB oracle replays as chained per-position DP CTEs;
    *  - M-step: `em_cnt(s) = Σ_words n(word) · occurrences(s in
    *    viterbi(word))`, re-normalized on the integer-ppm channel; rounds
    *    beyond the first rebuild costs from `em_cnt + 1` (add-one keeps
    *    every seed reachable, the [[nbClassifier]] smoothing).
    *
    * Pruning (the Kudo vocabulary-shrink step, surfaced as a verdict
    * column): a multi-character token NO Viterbi path uses carries
    * `pruned = 1` — dropping it cannot change any segmentation. Single
    * characters are never pruned (coverage).
    *
    * Scale shape: the corpus is touched ONCE (the word histogram; only
    * digest-sized words cross that shuffle — the [[bpeTrain]] discipline);
    * candidate generation, the E-step and the M-step all run over the
    * DISTINCT vocabulary, and the model (≤ chars + topK rows) collects to
    * the driver like [[bpeEncode]]'s merge table / the k-means centroids.
    * The per-word Viterbi DP is genuinely imperative (O(len·maxTokLen)
    * with backpointers) and runs as a typed flatMap over the words
    * Dataset — the documented [[graft.dedup.Dedup.shingles]]/winnow
    * exemption class: per-row bounded work, model broadcast via closure,
    * no corpus-sized state.
    *
    * Output: one row per vocabulary entry —
    * (tok, is_char, seed_cnt, em_cnt, p_ppm, pruned).
    */
  def unigramLmTrain(docs: DataFrame, topK: Int = 32, maxWordLen: Int = 16,
                     maxTokLen: Int = 4, rounds: Int = 1): DataFrame = {
    require(topK >= 1, "topK must be at least 1")
    require(maxWordLen >= 1 && maxWordLen <= 32, "maxWordLen in [1, 32]")
    require(maxTokLen >= 2 && maxTokLen <= 8, "maxTokLen in [2, 8]")
    require(rounds >= 1 && rounds <= 8, "rounds in [1, 8]")
    val spark = docs.sparkSession
    import spark.implicits._
    // corpus touched once: the word histogram (words longer than
    // maxWordLen carry no DP position and are excluded, spec'd)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "" && length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false)
    // candidate substrings: every (start, len ≤ maxTokLen) occurrence,
    // weighted by word count — one generator over the distinct vocabulary
    val cand = words.select(col("n"),
        explode(flatten(transform(sequence(lit(1), length(col("w"))), i =>
          filter(transform(sequence(lit(1), lit(maxTokLen)), k =>
            when(i + k - lit(1) <= length(col("w")), col("w").substr(i, k))),
            x => x.isNotNull)))).as("s"))
      .groupBy(col("s")).agg(sum(col("n")).as("cnt"))
      .localCheckpoint(eager = false)
    val charsDf = cand.where(length(col("s")) === 1)
    val multiDf = cand.where(length(col("s")) >= 2)
      .orderBy(col("cnt").desc, col("s").asc).limit(topK)
    val vocabDf = charsDf.unionAll(multiDf).localCheckpoint(eager = false)
    // model-bounded driver collect (≤ |alphabet| + topK rows)
    val seed: Map[String, Long] = vocabDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def fl2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    def costsOf(counts: Map[String, Long]): Map[String, Long] = {
      val t = counts.values.sum
      counts.map { case (s, c) => s -> (fl2(t) - fl2(c)) }
    }
    var cost = costsOf(seed)
    var emDf: DataFrame = null
    var r = 0
    while (r < rounds) {
      val costB = cost
      val mt = maxTokLen
      emDf = words.as[(String, Long)]
        .flatMap { case (w, n) =>
          TextAnalysis.viterbiSegment(w, costB, mt).map(tok => (tok, n))
        }
        .toDF("s", "n")
        .groupBy(col("s")).agg(sum(col("n")).as("c"))
        .localCheckpoint(eager = false)
      r += 1
      if (r < rounds) {
        // vocab-bounded collect; +1 smoothing keeps every seed reachable
        val em = emDf.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
        cost = costsOf(seed.map { case (s, _) => s -> (em.getOrElse(s, 0L) + 1L) })
      }
    }
    val t1 = emDf.agg(sum(col("c")).as("__t"))
    vocabDf.join(emDf, Seq("s"), "left")
      .crossJoin(broadcast(t1))
      .select(col("s").as("tok"),
        (length(col("s")) === 1).cast("long").as("is_char"),
        col("cnt").as("seed_cnt"),
        coalesce(col("c"), lit(0L)).as("em_cnt"),
        intDiv(coalesce(col("c"), lit(0L)) * lit(1000000L), col("__t"))
          .as("p_ppm"),
        (coalesce(col("c"), lit(0L)) === 0 && length(col("s")) > 1)
          .cast("long").as("pruned"))
  }

  /** [[unigramLmTrain]]'s E-step: Viterbi-segment one word under integer
    * token costs, minimizing (total bits, token count, longer-last-token)
    * — the total order the DuckDB oracle replays position by position.
    * Every single character is assumed present in `cost` (the seed's
    * coverage guarantee); an uncovered character would leave the word
    * unsegmentable and throws rather than silently dropping it.
    */
  private[graft] def viterbiSegment(w: String, cost: Map[String, Long],
                                    maxTokLen: Int): Seq[String] = {
    val L = w.length
    val INF = Long.MaxValue / 4
    val bits = Array.fill(L + 1)(INF)
    val ntk = Array.fill(L + 1)(INF)
    val bk = Array.fill(L + 1)(0)
    bits(0) = 0L; ntk(0) = 0L
    var i = 1
    while (i <= L) {
      var k = 1
      val kMax = math.min(maxTokLen, i)
      while (k <= kMax) {
        if (bits(i - k) < INF) {
          cost.get(w.substring(i - k, i)) match {
            case Some(c) =>
              val cb = bits(i - k) + c
              val cn = ntk(i - k) + 1
              // strictly better, or tie on (bits, ntoks) won by larger k
              if (cb < bits(i) || (cb == bits(i) &&
                  (cn < ntk(i) || (cn == ntk(i) && k > bk(i))))) {
                bits(i) = cb; ntk(i) = cn; bk(i) = k
              }
            case None => ()
          }
        }
        k += 1
      }
      i += 1
    }
    require(bits(L) < INF, s"word '$w' unsegmentable — seed lost coverage")
    var pos = L
    var out = List.empty[String]
    while (pos > 0) {
      val k = bk(pos)
      out = w.substring(pos - k, pos) :: out
      pos -= k
    }
    out
  }

  /** Data-mixture accounting: per-(lang, source) document/token/char
    * volumes plus each stratum's document share of the corpus (ppm) — the
    * report every training run wants next to its data card. Two map-side
    * combinable aggregates (strata, 1-row total) + a broadcast of the
    * total; group count = |langs|·|sources|, tiny at any corpus size.
    */
  def mixtureReport(docs: DataFrame): DataFrame = {
    val per = withTokens(docs)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("__toks")).cast("long")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"))
    val tot = docs.agg(count(lit(1)).as("__total"))
    per.crossJoin(broadcast(tot))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        intDiv(col("n_docs") * lit(1000000L), col("__total")).as("doc_share_ppm"))
  }

  /** Mixture accounting with ROLLUP subtotals: (lang, source) details,
    * per-lang subtotals, and the grand total in ONE aggregation pass —
    * Spark plans rollup as a single Expand + aggregate over one scan, not
    * three scans (the grouping-sets surface the reference lacks).
    * `grouping_level` is the standard bit vector (1 bit per rolled-up
    * column) disambiguating subtotal rows from real NULL groups.
    */
  def mixtureRollup(docs: DataFrame): DataFrame =
    withTokens(docs)
      .rollup(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("__toks")).cast("long")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        grouping_id().cast("long").as("grouping_level"))

  /** Exact per-lang quantiles of document length (the curation
    * length-filter calibration step): aggregate to a (lang, len, count)
    * histogram — distinct lengths ≪ documents — and let
    * [[graft.functions.Quantiles.fromHistogram]] pick the exact lower
    * discrete quantiles over it. (The one-pass approximate alternative is
    * `percentile_approx`'s KLL sketch — not oracle-comparable, so the
    * exact formulation is the checked one.)
    */
  def lengthQuantiles(docs: DataFrame,
                      psPpm: Seq[Long] = Seq(500000L, 900000L, 990000L)): DataFrame =
    graft.functions.Quantiles.fromHistogram(
      docs
        .select(col("lang"), length(col("text")).cast("long").as("len"))
        .groupBy(col("lang"), col("len"))
        .agg(count(lit(1)).as("cnt")),
      groupCol = "lang", valueCol = "len", cntCol = "cnt", psPpm = psPpm)

  /** Token-frequency SPECTRUM (frequency of frequencies): how many
    * distinct tokens occur exactly n times — the Zipf-shape / corpus-health
    * check (a healthy crawl has a long singleton tail; boilerplate
    * contamination shows up as mass at high n). Two stacked
    * map-side-combinable aggregates; the second one's group count is
    * bounded by distinct frequencies (tiny).
    */
  def tokenSpectrum(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("n_tokens"))
      .select(col("n").as("n_occurrences"), col("n_tokens"))

  /** Fixed-size token chunking (sequence packing / context-window prep):
    * split each doc into consecutive `chunkTokens`-token chunks, emitting
    * (doc_id, chunk_idx, n_chunk_tokens, chunk_md5). One tokenize + one
    * generator per doc — partition-local, no shuffle; the chunk text
    * leaves the operator only as its md5 (the downstream packer joins by
    * (doc_id, chunk_idx)).
    */
  def chunk(docs: DataFrame, chunkTokens: Int = 32): DataFrame = {
    val nChunks = ceil(size(col("__toks")) / lit(chunkTokens.toDouble)).cast("int")
    withTokens(docs)
      .select(col("doc_id"), size(col("__toks")).cast("long").as("__n"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => concat_ws(" ", slice(col("__toks"), i * chunkTokens + 1, lit(chunkTokens)))))
          .as(Seq("chunk_idx", "chunk")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        least(lit(chunkTokens.toLong),
          col("__n") - col("chunk_idx") * chunkTokens).as("n_chunk_tokens"),
        md5(col("chunk").cast("binary")).as("chunk_md5"))
  }

  /** Winnowing (Schleimer et al., SIGMOD'03): slide a window of `w`
    * consecutive k-gram hashes, keep each window's minimum (rightmost on
    * ties) — the selected hash set is the document's fingerprint sketch.
    * Emitted exploded as (doc_id, pos, hash): at scale this feeds an
    * inverted-index join exactly like [[graft.dedup.Dedup.ngramJaccardPairs]].
    */
  def winnow(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    // Typed flatMap, same rationale as [[graft.dedup.Dedup.shingles]]: the
    // nested-HOF spelling (window-min lambda over a transformed hash array)
    // is an optimizer trap — inlined into a Generate on some plan shapes,
    // interpreted lambdas re-evaluate the whole kgram+hash chain per
    // window, O(n²·len) per doc. Here each doc is tokenized and hashed
    // exactly once; [[PortableHash.jvmMd5Long60]] is bit-identical to the
    // plan-side md5Long60, so the DuckDB oracle is unchanged.
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        val hs =
          if (toks.length < k) Array.emptyLongArray
          else toks.sliding(k).map(g => PortableHash.jvmMd5Long60(g.mkString(" "))).toArray
        val wins =
          if (hs.length >= w) (0 to hs.length - w).iterator.map(i => {
            var m = hs(i); var j = i + 1
            while (j < i + w) { if (hs(j) < m) m = hs(j); j += 1 }
            m
          })
          else if (hs.nonEmpty) Iterator(hs.min)
          else Iterator.empty
        wins.toSeq.distinct.map(fp => (id, fp))
      }
      .toDF("doc_id", "fingerprint")
  }

  /** Email / IPv4 / long-digit-run patterns for [[piiScrub]]. Kept to the
    * regex subset whose semantics are identical between Java regex (Spark
    * codegen) and RE2 (DuckDB, Go scrubbers): character classes,
    * bounded/unbounded repetition, no backrefs or lookaround.
    */
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private val LongNumRe = "[0-9]{6,}"

  /** PII scrubbing: count and redact emails, IPv4 addresses, and long
    * digit runs (account/card-number stand-ins) in a text column. One
    * narrow scan, fully codegen'd `regexp_extract_all`/`regexp_replace` —
    * no UDF, so at 100 TB this is a pure map stage that pushes the
    * projection into the parquet scan. Redaction order matters (an email's
    * host would otherwise re-match as a digit run): emails, then IPs, then
    * bare digit runs.
    *
    * Returns one row per input row: the counts and the redacted text.
    */
  /** Unicode text normalization — the cleanup pass a crawl ships through
    * BEFORE tokenization (C4 §2.2 / CCNet preprocessing): strip control
    * characters and the invisible formatting code points that poison
    * tokenizers (zero-width space/joiner/non-joiner, BOM, soft hyphen,
    * bidi marks), convert NBSP-family spaces to plain spaces, collapse
    * whitespace runs, and trim. Everything is a codegen'd regexp chain —
    * one narrow no-shuffle scan; full NFC/NFKC canonicalization needs
    * `java.text.Normalizer` (a per-row JVM call) and lives in
    * [[nfcNormalize]] as a partition-local batched typed transform.
    * Output: (doc_id, text, changed) — `changed` flags rows
    * the scrub touched, so the accounting aggregate is one sum.
    */
  def unicodeScrub(docs: DataFrame): DataFrame = {
    val t = col("text")
    // invisible/formatting code points: zero-width space/joiner/non-joiner,
    // word joiner, BOM, soft hyphen, bidi embedding/override/marks
    val noInvisible = regexp_replace(t,
      "[\\u200B\\u200C\\u200D\\u2060\\uFEFF\\u00AD\\u200E\\u200F\\u202A-\\u202E]", "")
    // NBSP family → plain space (NBSP, narrow NBSP, ogham, en/em-family,
    // ideographic space)
    val plainSpaces = regexp_replace(noInvisible,
      "[\\u00A0\\u1680\\u2000-\\u200A\\u202F\\u205F\\u3000]", " ")
    // control chars (C0/C1 minus nothing — tabs/newlines normalize too)
    val noControl = regexp_replace(plainSpaces, "[\\u0000-\\u001F\\u007F-\\u009F]", " ")
    val collapsed = regexp_replace(noControl, " {2,}", " ")
    val cleaned = trim(collapsed)
    docs.select(
      col("doc_id"),
      cleaned.as("text"),
      (cleaned =!= t).cast("long").as("changed"))
  }

  /** C4's blocklist gate (Raffel et al. 2020 §2.2: "removed any page
    * that contained any word on the … blocklist") — the coarse
    * safety/content filter every big crawl corpus ships through before
    * the quality battery. Output: (doc_id, n_blocked_terms — DISTINCT
    * blocklisted tokens present, keep). Scale shape: the blocklist folds
    * into codegen as ONE literal array (`array_intersect` against it is
    * a per-row scan of the doc's own tokens), so this is a shuffle-free
    * narrow projection like [[qualityGate]] — at 100 TB, one pass.
    * For blocklists beyond literal-array size (≫10⁴ terms) the same
    * verdict comes from a broadcast semi-join on exploded tokens; this
    * form is the common small-list case.
    */
  def blocklistGate(docs: DataFrame, blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "blocklistGate: empty blocklist")
    require(blocklist.distinct == blocklist, "blocklistGate: duplicate terms")
    val hits = size(array_intersect(array_distinct(tokens(col("text"))),
      lit(blocklist.toArray))).cast("long")
    docs.select(col("doc_id"), hits.as("n_blocked_terms"),
      (hits === 0L).as("keep"))
  }

  final case class DocText(doc_id: Long, text: String)
  final case class DocNormalized(doc_id: Long, text: String, changed: Long)

  /** NFC/NFKC Unicode normalization — the canonicalization step
    * [[unicodeScrub]] documents as beyond Column scope (it needs
    * `java.text.Normalizer`, a per-row JVM call). Runs as the codec-style
    * partition-local batched transform
    * (the [[graft.multimodal.Multimodal.decodeImages]] shape): ONE typed
    * `mapPartitions`, so there is no ScalaUDF node at the Column level and
    * text never shuffles — a pure narrow scan like the scrub itself
    * (`PlanAuditSpec` asserts the exemption explicitly). `form` picks NFC
    * (canonical composition — the storage/dedup canonical form: e +
    * combining acute → é) or NFKC (adds compatibility folding: ligatures,
    * full-width forms — the pre-tokenization choice). Null text passes
    * through with `changed` = 0.
    */
  def nfcNormalize(docs: DataFrame, form: String = "NFC",
                   batchSize: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nf = java.text.Normalizer.Form.valueOf(form)
    docs.select(col("doc_id"), col("text")).as[DocText]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { d =>
        if (d.text == null) DocNormalized(d.doc_id, null, 0L)
        else {
          val n = java.text.Normalizer.normalize(d.text, nf)
          DocNormalized(d.doc_id, n, if (n == d.text) 0L else 1L)
        }
      })).toDF()
  }

  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    // Each count runs against the PREVIOUS redaction stage, so an email's
    // local-part digits are never double-counted as a bare digit run.
    val noEmail = regexp_replace(t, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    val redacted = regexp_replace(noIp, LongNumRe, "<NUM>")
    df.select(
      col(idCol),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(noEmail, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(noIp, lit(LongNumRe), lit(0))).cast("long").as("n_longnums"),
      redacted.as("redacted"))
  }

  /** Deterministic stratified train/val/test split accounting. Each doc's
    * assignment is a pure function of its id — `md5(doc_id)`'s leading
    * 32 bits mod 100 against the (train, train+val) percent cut points —
    * so the split is reproducible run-to-run, engine-exact, and
    * embarrassingly parallel (a projection; NO shuffle decides membership,
    * only the tiny per-(split, lang, source) accounting aggregate at the
    * end). Content-independent by design: near-duplicate texts must not
    * correlate across splits, and re-crawled docs keep their assignment.
    */
  /** The deterministic split membership column — ONE definition shared by
    * [[trainValTestSplit]] and [[graft.dedup.Dedup.splitLeakage]] so the
    * accounting and the leakage matrix can never disagree on who is in
    * which split.
    */
  private[graft] def splitAssignment(trainPct: Int, valPct: Int): Column = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      s"bad split cut points: train=$trainPct val=$valPct")
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val").otherwise("test")
  }

  def trainValTestSplit(docs: DataFrame, trainPct: Int = 90,
                        valPct: Int = 5): DataFrame = {
    val split = splitAssignment(trainPct, valPct)
    withTokens(docs)
      .groupBy(split.as("split"), col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("__toks")).cast("long")).as("n_tokens"))
  }

  /** Token-budget shard packing: cut the doc_id-ordered corpus into
    * contiguous shards of ≈`budget` tokens (the training-file layout
    * step — fixed-size shards feed a data loader evenly). A doc lands in
    * shard `floor(exclusive_cumsum_tokens / budget)`: shard boundaries
    * never split a document, and every shard except the last holds ≥ the
    * budget's worth minus one document.
    *
    * The exclusive running sum over the GLOBAL doc_id order is computed
    * as a TWO-LEVEL cumsum, never as an unpartitioned `Window` (Spark
    * executes those as ONE task holding the whole input — a non-starter
    * on a large corpus). Instead: range-partition by doc_id and sort
    * within partitions (a normal parallel sort), collect one LONG
    * subtotal per partition (32–few-thousand values — driver-trivial),
    * scan them into exclusive prefix offsets, and let each partition
    * stream its local running sum seeded at its offset. Output is
    * identical to the global window; every stage is parallel; the only
    * sequential state is the tiny per-partition offset array. The shuffle
    * carries one (doc_id, LONG) pair per doc, not the text.
    *
    * Both passes share ONE range shuffle: `.rdd` is materialized once, so
    * the sampled range bounds and the map output are fixed and reused —
    * the second pass is a reduce-stage-only job.
    */
  /** The two-level exclusive-cumsum scaffolding shared by
    * [[shardPacking]] and [[ppsSample]]: range-partition the
    * (doc_id, long) frame by doc_id, sort within partitions, collect ONE
    * long subtotal per partition (driver-trivial), and scan those into
    * exclusive prefix offsets. Returns (pinned RDD, per-partition
    * offsets, grand total). Both of the RDD jobs reuse one shuffle —
    * `.rdd` materializes the ShuffleDependency once.
    */
  private def docIdCumsum(sized: DataFrame)
      : (org.apache.spark.rdd.RDD[Row], Map[Int, Long], Long) = {
    val spark = sized.sparkSession
    val p = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val ranged = sized
      .repartitionByRange(p, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .rdd
    val subtotals = ranged
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L; it.foreach(s += _.getLong(1)); Iterator((i, s))
      }
      .collect()
      .sortBy(_._1)
    // exclusive prefix offset per partition index
    var acc = 0L
    val offsets: Map[Int, Long] = subtotals.map { case (i, s) =>
      val o = acc; acc += s; (i, o)
    }.toMap
    (ranged, offsets, acc)
  }

  def shardPacking(docs: DataFrame, budget: Long = 50000L): DataFrame = {
    require(budget > 0, s"bad shard budget: $budget")
    val spark = docs.sparkSession
    val sized = withTokens(docs)
      .select(col("doc_id"), size(col("__toks")).cast("long").as("__n"))
    val idType = sized.schema("doc_id").dataType
    val (ranged, offsets, _) = docIdCumsum(sized)
    val packed = ranged.mapPartitionsWithIndex { (i, it) =>
      var run = offsets.getOrElse(i, 0L)
      it.map { r =>
        val n = r.getLong(1); val before = run; run += n
        Row(r.get(0), n, before / budget)
      }
    }
    val schema = StructType(Seq(
      StructField("doc_id", idType),
      StructField("__n", LongType),
      StructField("shard_id", LongType)))
    spark.createDataFrame(packed, schema)
      .groupBy("shard_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** Systematic PPS (probability-proportional-to-size) sampling — Madow
    * '49, the weighted companion to [[budgetSample]]'s uniform carve: a
    * training-data draw where a document's chance of selection is
    * proportional to its TOKEN mass, so the sampled set's token
    * distribution matches the corpus (uniform doc sampling over-weights
    * short docs in token space). Deterministic and exact: with weights
    * w_i in doc_id order, grand total W and `step = max(1, W div k)`, a
    * doc is picked once for every multiple of `step` its cumulative
    * interval [cum_excl, cum_excl + w) crosses —
    * `n_picks = (cum_excl+w) div step − cum_excl div step`; docs heavier
    * than the step are guaranteed in (with multiplicity — the PPS
    * certainty stratum), zero-weight docs never. Offset 0 is the
    * documented determinism choice; a production draw adds a fixed
    * offset in [0, step).
    *
    * Scale shape: the cumulative sums ride [[docIdCumsum]]'s two-level
    * cumsum — never an unpartitioned window; the shuffle carries one
    * (doc_id, long) pair per doc. Output: (doc_id, n_tokens, n_picks)
    * for picked docs only.
    */
  /** SEQUENTIAL POISSON weighted sample-without-replacement (Ohlsson
    * 1998, "Sequential Poisson sampling"; Rosén 1997's order sampling —
    * the scheme official statistics actually runs): per stratum, each
    * doc gets priority `u_i / w_i` with a uniform u and weight w (token
    * count), and the k SMALLEST priorities are the sample — inclusion
    * probability ≈ proportional to weight, without replacement, in one
    * pass. The WOR complement of [[ppsSample]]'s systematic
    * with-replacement picks and [[temperatureSample]]'s mixture
    * reweighting: this is the scheme for "give me k docs per source,
    * long docs proportionally more likely, never the same doc twice".
    *
    * Engine-exact determinism: u_i is the portable 60-bit md5 of
    * `"sps:" + doc_id`, and the priority is the QUANTIZED integer
    * `u_i div w_i` (one truncating division — the ordering is a defined
    * snapshot both engines replay; ties break by doc_id asc, a total
    * order). Doubling a doc's weight can only lower its priority, so
    * the weight-monotonicity of the real scheme survives quantization
    * exactly.
    *
    * Scale shape: one projection computes (stratum, weight, priority);
    * the top-k is a row_number window PARTITIONED BY STRATUM over that
    * skinny frame — strata-bounded frames, no global sort, text never
    * shuffles. Returns (stratum, doc_id, weight, priority, rank),
    * rank 1..k per stratum.
    */
  def seqPoissonSample(docs: DataFrame, k: Int = 5,
                       strataCol: String = "source"): DataFrame = {
    require(k > 0, s"bad sample size: $k")
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("priority").asc, col("doc_id").asc)
    withTokens(docs)
      .select(col(strataCol).cast("string").as("stratum"), col("doc_id"),
        size(col("__toks")).cast("long").as("weight"))
      .withColumn("__u", graft.functions.PortableHash.md5Long60(
        concat(lit("sps:"), col("doc_id").cast("string"))))
      .withColumn("priority", expr("__u div weight"))
      .drop("__u")
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  def ppsSample(docs: DataFrame, k: Long = 100L): DataFrame = {
    require(k > 0, s"bad sample size: $k")
    val spark = docs.sparkSession
    val sized = withTokens(docs)
      .select(col("doc_id"), size(col("__toks")).cast("long").as("__n"))
    val idType = sized.schema("doc_id").dataType
    val (ranged, offsets, total) = docIdCumsum(sized)
    val step = math.max(1L, total / k)
    val picked = ranged.mapPartitionsWithIndex { (i, it) =>
      var run = offsets.getOrElse(i, 0L)
      it.flatMap { r =>
        val n = r.getLong(1); val before = run; run += n
        val picks = (before + n) / step - before / step
        if (picks > 0) Iterator(Row(r.get(0), n, picks)) else Iterator.empty
      }
    }
    spark.createDataFrame(picked, StructType(Seq(
      StructField("doc_id", idType),
      StructField("n_tokens", LongType),
      StructField("n_picks", LongType))))
  }

  /** BM25 ranked retrieval (Robertson–Spärck Jones, the classic probabilistic
    * ranking function) for a LITERAL query over the corpus: top-`k` docs by
    *
    *   score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    *
    * in exact integer fixed point so the DuckDB oracle hash-matches:
    * `idf_m = (N·1000) // df` (the same saturating integer idf family as
    * [[tfidfTopK]] — production would use the log form; the ranking is
    * monotone-equivalent on this corpus), `k1`/`b` as ppm parameters, and
    * each term's contribution `(idf_m · tf · (k1_ppm+10⁶)) // denom_ppm`.
    * Exact while `N·1000·tf·(k1_ppm+10⁶) < 2⁵³` (N ≤ ~4·10⁶ at tf ≤ 100);
    * beyond that, switch `score_m` to double and drop the oracle hash.
    *
    * Scale shape: the query terms are literals folded into codegen (a
    * per-row `filter` count per term — no explode, no join against a terms
    * table), the corpus-wide stats (N, total tokens, per-term df) are ONE
    * map-side-combinable aggregate producing ONE row that is broadcast
    * back via `crossJoin(broadcast(…))`, non-matching docs are filtered
    * before scoring, and the top-k is `orderBy().limit(k)` — Catalyst's
    * `TakeOrderedAndProject`, a per-partition heap + driver merge of k
    * rows, never a global sort.
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
               k1Ppm: Long = 1200000L, bPpm: Long = 750000L): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    require(queryTerms.distinct == queryTerms, "bm25TopK: duplicate query terms")
    val toks = col("__toks")
    val base = withTokens(docs).select(
      col("doc_id") +: size(toks).cast("long").as("__dl") +:
        queryTerms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).cast("long").as(s"__tf$i")
        }: _*)
    val aggCols =
      count(lit(1)).as("__n") +: sum(col("__dl")).as("__tt") +:
        queryTerms.indices.map(i =>
          sum((col(s"__tf$i") > 0).cast("long")).as(s"__df$i"))
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    val matched =
      base.where(queryTerms.indices.map(i => col(s"__tf$i") > 0).reduce(_ || _))
    // doc-length normalization, shared by every term's denominator:
    // 1 − b + b·dl/avgdl in ppm, with avgdl = total_tokens/N kept rational
    val normPpm = lit(1000000L) - lit(bPpm) +
      intDiv(lit(bPpm) * col("__dl") * col("__n"), col("__tt"))
    val contribs = queryTerms.indices.map { i =>
      val tf = col(s"__tf$i")
      val idfM = intDiv(col("__n") * lit(1000L), col(s"__df$i"))
      val denomPpm = tf * lit(1000000L) + intDiv(lit(k1Ppm) * normPpm, lit(1000000L))
      when(tf > 0, intDiv(idfM * tf * lit(k1Ppm + 1000000L), denomPpm))
        .otherwise(lit(0L))
    }
    matched.crossJoin(broadcast(stats))
      .select(col("doc_id"), contribs.reduce(_ + _).as("score_m"))
      .orderBy(col("score_m").desc, col("doc_id").asc)
      .limit(k)
  }

  /** C4-style boilerplate scrubbing (Raffel et al., 2020 §2.2's repeated-
    * span removal, adapted to this corpus's chunk unit — the texts have no
    * line structure, so the span is [[chunk]]'s fixed `chunkTokens`-token
    * window): any chunk occurring MORE than `maxFreq` times corpus-wide is
    * boilerplate and removed from every document; survivors are re-joined
    * in original order. Docs whose every chunk was boilerplate survive
    * with empty text (the caller's quality gate drops them — scrubbing and
    * filtering stay separate decisions).
    *
    * Scale shape: the frequency count groups on `chunk_md5` ONLY (column
    * pruning drops the chunk text before that shuffle — a digest-only,
    * map-side-combinable count); the boilerplate set (count > maxFreq) is
    * tiny by construction — boilerplate is by definition few distinct
    * spans — and is broadcast into a left-anti join, so the corpus text is
    * shuffled exactly ONCE (the doc_id reassembly groupBy; the subsequent
    * doc_id join reuses that partitioning). Output: one row per input doc,
    * (doc_id, text_scrubbed, n_kept, n_dropped).
    */
  def boilerplateScrub(docs: DataFrame, chunkTokens: Int = 8,
                       maxFreq: Long = 2L): DataFrame = {
    require(chunkTokens > 0 && maxFreq > 0,
      s"bad scrub params: chunkTokens=$chunkTokens maxFreq=$maxFreq")
    val nChunksE = ceil(size(col("__toks")) / lit(chunkTokens.toDouble)).cast("long")
    val chunked = withTokens(docs)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunksE.cast("int") - 1),
          i => concat_ws(" ", slice(col("__toks"), i * chunkTokens + 1, lit(chunkTokens)))))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk"), md5(col("chunk").cast("binary")).as("chunk_md5"))
    val boiler = chunked.groupBy("chunk_md5").count()
      .where(col("count") > maxFreq).select("chunk_md5")
    val survivors = chunked.join(broadcast(boiler), Seq("chunk_md5"), "left_anti")
    val rebuilt = survivors.groupBy("doc_id").agg(
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
        x => x.getField("chunk"))).as("text_scrubbed"),
      count(lit(1)).as("n_kept"))
    withTokens(docs).select(col("doc_id"), nChunksE.as("__nc"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_scrubbed"), lit("")).as("text_scrubbed"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__nc") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** BATCH BM25 — [[bm25TopK]]'s whole-WORKLOAD twin: top-k docs for
    * EVERY query of a literal query set in one corpus pass (the
    * contamination probe shape: "which training docs score high against
    * each of the eval queries?"). t20's per-term literal-column plan is
    * right for one query; a workload of hundreds would widen the
    * projection by |terms| columns, so here the terms ride ONE broadcast
    * (query_id, term) table and the hits flow through a (doc, term)
    * aggregate instead. Okapi BM25 with k1=1.2, b=0.75, made
    * integer-exact so two engines agree bit-for-bit:
    *
    *  - idf_ppm(t) = ⌊10⁶·(N − df_t) / N⌋: a log-free RATIONAL rarity
    *    surrogate for BM25's idf (the log form needs transcendental
    *    doubles two engines won't agree on bit-for-bit, and a floor-log2
    *    quantization collapses to 0 whenever df is within 2× of N —
    *    every common term). Monotone in df like the original, exact in
    *    integers;
    *  - tf_norm_ppm = ⌊10⁶ · 2200·tf·L / (1000·tf·L + 300·L + 900·dl·N)⌋:
    *    BM25's saturation term with k1/b folded to integer milli-weights
    *    and avgdl = L/N kept as the exact rational (numerator and
    *    denominator both scaled by 1000·L·N — DECIMAL(38,0) on the Spark
    *    side, HUGEINT in an oracle; one integral division at the end);
    *  - score_ppm(q,d) = Σ_t∈q ⌊idf_ppm(t) · tf_norm_ppm(t,d) / 10⁶⌋.
    *
    * Scale shape: the query-term set folds into the plan as ONE literal
    * `isin` filter inside the token explode — non-query tokens never
    * leave the scan, so the (doc, term) shuffle carries only hits
    * (|terms| ≤ a few dozen for any query workload). Doc length rides
    * the explode (no self-join); df_t and the corpus totals are
    * term-count/1-row aggregates that come back via broadcast; the final
    * top-k window partitions by query_id (|queries| partitions, k rows
    * each). Raw text never crosses a shuffle.
    */
  def bm25Batch(docs: DataFrame, queries: Seq[(Long, String)],
                k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val qTerms = queries.flatMap { case (qid, text) =>
      text.split(" ").filter(_.nonEmpty).distinct.map(t => (qid, t)) }
    require(qTerms.nonEmpty, "bm25Batch: empty query set")
    val termSet = qTerms.map(_._2).distinct
    val qt = broadcast(qTerms.toDF("query_id", "term"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val toks = withTokens(docs).select(col("doc_id"), col("__toks"))
    // corpus totals (N docs, L tokens): one map-side-combinable agg, 1 row
    val corpus = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("__toks")).cast("long")).as("n_toks"))
    // (doc, query-term) hits: dl rides the explode, terms pre-filtered
    // by the literal set — scan-side, codegen'd
    val hits = toks.select(col("doc_id"),
        size(col("__toks")).cast("long").as("dl"),
        explode(filter(col("__toks"),
          t => t.isin(termSet.map(x => x: Any): _*))).as("term"))
    val tf = hits.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df_t"))
    val scored = tf
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(corpus))
      .join(qt, Seq("term"))
      .select(col("query_id"), col("doc_id"),
        expr("(n_docs - df_t) * 1000000L div n_docs").as("__idf_ppm"),
        (dec(lit(2200L)) * dec(col("tf")) * dec(col("n_toks")) *
          dec(lit(1000000L))).as("__num"),
        (dec(lit(1000L)) * dec(col("tf")) * dec(col("n_toks")) +
          dec(lit(300L)) * dec(col("n_toks")) +
          dec(lit(900L)) * dec(col("dl")) * dec(col("n_docs"))).as("__den"))
      // `div` is the EXACT integral quotient (decimal-safe) — a decimal
      // `/` + cast would round half-up at scale 6 and diverge from an
      // oracle's floor `//` near integer boundaries
      .select(col("query_id"), col("doc_id"),
        expr("__idf_ppm * (__num div __den) div 1000000L").as("__contrib"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__contrib")).as("score_ppm"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_ppm").desc, col("doc_id").asc)).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score_ppm"), col("rank"))
  }

  /** Deterministic EXACT-k stratified carve — the eval-set/holdout
    * sampling shape [[stratifiedSample]]'s Bernoulli rates cannot give:
    * exactly min(k, |stratum|) docs per (lang, source) stratum, chosen
    * by the SAME md5 sampling coordinate (so the carve composes with the
    * rate-sampled splits: a doc's coordinate is one corpus-wide fact),
    * ties broken by doc_id. Output: one row per picked doc —
    * (lang, source, doc_id, pick_rank, n_stratum).
    *
    * Scale shape: membership is decided by ONE row_number window per
    * stratum — a per-stratum sort, the honest cost of exact-k (Bernoulli
    * rates avoid the sort but cannot hit k exactly). Strata counts ride
    * the same window (no second scan). At corpus scale the sort input
    * can be pre-shrunk with a coordinate threshold filter (keep
    * coordinate < c·k/n̂ before ranking) — the standard two-pass trick,
    * left to callers because it needs a stratum-size estimate.
    */
  def budgetSample(docs: DataFrame, k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coord = PortableHash.md5Long60(
      concat(lit("sample:"), col("doc_id").cast("string"))) % lit(1000000L)
    val w = Window.partitionBy(col("lang"), col("source"))
    docs.select(col("lang"), col("source"), col("doc_id"), coord.as("__c"))
      .select(col("lang"), col("source"), col("doc_id"),
        row_number().over(w.orderBy(col("__c"), col("doc_id")))
          .cast("long").as("pick_rank"),
        count(lit(1)).over(w).as("n_stratum"))
      .where(col("pick_rank") <= k)
  }
}

/** Per-language stopword vocabularies for the language-ID heuristic.
  * Deterministic, tiny, broadcast as literals into codegen.
  */
object StopwordLists {
  val langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  private val lists: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "dans"),
    // romanized (pinyin) function words — the corpus is latin-script
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta", "men", "zhe", "na"))

  def byLang(l: String): Seq[String] = lists(l)
}
