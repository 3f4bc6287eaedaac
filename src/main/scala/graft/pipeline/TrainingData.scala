package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.textops.TextAnalysis

/** The training-data pipeline a corpus actually ships through, as ONE
  * composable call — the capstone over the per-stage operators, in their
  * canonical order (the C4/CCNet/Gopher pipelines all run this sequence):
  *
  *  1. EXACT DEDUP — first occurrence per content digest survives
  *     ([[Dedup.exactGroups]] keepers; near-dup variants slot in by
  *     swapping this stage for [[Dedup.applyDedup]]);
  *  2. QUALITY FILTER — the end-to-end CCNet chain verdict
  *     ([[TextAnalysis.ccnetPipeline]]: langid agreement + Gopher rules +
  *     LM-perplexity band), computed over the FULL corpus — the LM and
  *     vocabulary are trained on raw data, then documents are judged;
  *  3. SAMPLING — deterministic stratified per-language rates
  *     ([[TextAnalysis.stratifiedSample]]), hash-based so the same mix
  *     reproduces on any engine or cluster size;
  *  4. PACKING — contiguous ≈`budget`-token shards over the survivor set
  *     ([[TextAnalysis.shardPacking]], two-level cumsum, no global sort).
  *
  * Scale shape: stages 1–3 communicate doc-id sets only (left-semi joins,
  * AQE-sized); raw text is re-read from the source per stage and never
  * shuffles except where the stage itself requires it (the LM digest
  * joins, the packing range partition). Output: per-shard accounting
  * (shard_id, n_docs, n_tokens, first_doc, last_doc) for the packed
  * training set.
  */
object TrainingData {

  val DefaultRatesPpm: Map[String, Long] = Map(
    "en" -> 900000L, "de" -> 600000L, "es" -> 600000L,
    "fr" -> 600000L, "zh" -> 300000L)

  /** The MODERN pipeline composition (v2 of [[run]]): NEAR-duplicate
    * dedup with the QUALITY-keeper policy (LSH pairs → clusters → best
    * member survives) → benchmark DECONTAMINATION (contaminated docs AND
    * the benchmark slice drop) → the CCNet filter verdict — reported as
    * per-(lang, source) survivor accounting (docs + tokens), the mixture
    * read a data team tracks per pipeline run. Stage membership is
    * computed corpus-wide and composed by doc-id left-semi joins (the
    * [[run]] idiom): for these stages sequential and intersect semantics
    * agree — contamination and the CCNet gates are per-doc facts
    * independent of which duplicates survive.
    *
    * Scale shape: each stage keeps its own operator's shape (banded LSH,
    * digest-only contamination join, shuffle-free rule battery); the
    * composition itself moves doc-id SETS only, every semi-join
    * AQE-sized. Raw text shuffles nowhere new.
    */
  def runV2(docs: DataFrame,
            benchmarkPred: Column = col("doc_id") % 25 === 0): DataFrame = {
    val survivors = Dedup.applyDedupByQuality(docs,
        Dedup.minhashLshPairs(docs).select(col("a"), col("b")),
        TextAnalysis.qualityScore(docs).select(col("doc_id"), col("quality_ppm")))
      .select(col("doc_id"))
    val decon = Dedup.applyDecontamination(docs, benchmarkPred, k = 3)
    val keep = TextAnalysis.ccnetPipeline(docs)
      .where(col("keep") === 1).select(col("doc_id"))
    docs
      .join(survivors, Seq("doc_id"), "left_semi")
      .join(decon, Seq("doc_id"), "left_semi")
      .join(keep, Seq("doc_id"), "left_semi")
      .select(col("lang"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("__n"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_tokens"))
  }

  /** The WEB-CORPUS pipeline composition (v3): the crawl-side stages that
    * precede [[runV2]]'s content work, reported per HOST with a
    * link-graph prior — the per-domain read a crawl team consults when
    * deciding what to fetch more of:
    *
    *  1. URL-LEVEL DEDUP — fetch variants collapse through
    *     [[graft.textops.UrlOps.canonicalizeUrl]], keeper = min doc_id
    *     per canonical URL ([[Dedup.urlDedup]] — the FIRST dedup stage of
    *     a web build, before any text is read);
    *  2. EXACT CONTENT DEDUP — first occurrence per text digest
    *     ([[Dedup.exactGroups]]);
    *  3. QUALITY GATE — the Gopher rule battery verdict
    *     ([[TextAnalysis.gopherRules]] `pass`);
    *  4. DOMAIN PRIOR — per-host survivor accounting joined with the
    *     host's [[graft.graph.GraphOps.pageRank]] score over the given
    *     link graph, so volume and centrality read off one row.
    *
    * Stage membership composes by doc-id left-semi joins (the [[run]]
    * idiom — these gates are per-doc facts, so sequential ≡ intersect);
    * the host rollup is one map-side-combinable groupBy over hosts ≪
    * docs, and the pagerank join is hosts-bounded. Output per host:
    * (host, n_docs, n_url_keep, n_final, pagerank).
    */
  def runV3(docs: DataFrame, url: Column, hostEdges: DataFrame,
            prIterations: Int = 2): DataFrame = {
    val host = graft.textops.UrlOps.hostOf(url)
    val urlKeep = Dedup.urlDedup(docs, url)
      .select(col("keep_doc_id").as("doc_id"))
    val exactKeep = Dedup.exactGroups(docs)
      .select(col("keeper_id").as("doc_id"))
    val qualityPass = TextAnalysis.gopherRules(docs)
      .where(col("pass") === 1).select(col("doc_id"))
    val perDoc = docs.select(col("doc_id"), host.as("host"))
    val urlKept = perDoc.join(urlKeep, Seq("doc_id"), "left_semi")
    val finalKept = urlKept
      .join(exactKeep, Seq("doc_id"), "left_semi")
      .join(qualityPass, Seq("doc_id"), "left_semi")
    val counts = perDoc.groupBy("host").agg(count(lit(1)).as("n_docs"))
      .join(urlKept.groupBy("host").agg(count(lit(1)).as("n_url_keep")),
        Seq("host"), "left")
      .join(finalKept.groupBy("host").agg(count(lit(1)).as("n_final")),
        Seq("host"), "left")
    val pr = graft.graph.GraphOps.pageRank(hostEdges, prIterations)
    counts
      .join(pr, counts("host") === pr("host"), "left")
      .select(counts("host"),
        col("n_docs"),
        coalesce(col("n_url_keep"), lit(0L)).as("n_url_keep"),
        coalesce(col("n_final"), lit(0L)).as("n_final"),
        coalesce(col("pagerank"), lit(0L)).as("pagerank"))
  }

  /** v4 — the ROUND-12 composition: exact-dedup keepers → the
    * Kneser–Ney perplexity BAND (CCNet's actual shape: a KenLM-family
    * model scores every doc and only the middle band survives — too-low
    * surprisal is boilerplate, too-high is garbage) → a SEQUENTIAL-
    * POISSON per-source budget (k docs per source, inclusion ∝ token
    * count, without replacement — the weighted WOR draw a mixture
    * builder actually wants) → per-source survivor accounting with the
    * sample's token mass.
    *
    * Composition is doc-id left-semi joins end-to-end (the v1/v2/v3
    * discipline): text flows through each stage's own digest/score
    * channel and never re-shuffles between stages. The KN model trains
    * on the FULL corpus (the t25/t32 self-consistency convention — a
    * production run trains on a curated slice; same plan either way).
    *
    * Returns per source: (stratum, n_docs, n_dedup, n_band, n_sampled,
    * sample_tokens).
    */
  def runV4(docs: DataFrame, loPpm: Long = 5300000L, hiPpm: Long = 5550000L,
            k: Int = 10): DataFrame = {
    val keepers = Dedup.exactGroups(docs)
      .select(col("keeper_id").as("doc_id"))
    val deduped = docs.join(keepers, Seq("doc_id"), "left_semi")
    val band = TextAnalysis.knPerplexity(docs)
      .where(col("mean_bits_ppm") >= loPpm && col("mean_bits_ppm") <= hiPpm)
      .select(col("doc_id"))
    val kept = deduped.join(band, Seq("doc_id"), "left_semi")
    val sampled = TextAnalysis.seqPoissonSample(kept, k)
    val bySource = docs.select(col("source").cast("string").as("stratum"),
      col("doc_id"))
    def cnt(df: DataFrame, name: String): DataFrame =
      bySource.join(df.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .groupBy("stratum").agg(count(lit(1)).as(name))
    bySource.groupBy("stratum").agg(count(lit(1)).as("n_docs"))
      .join(cnt(deduped, "n_dedup"), Seq("stratum"), "left")
      .join(cnt(kept, "n_band"), Seq("stratum"), "left")
      .join(sampled.groupBy("stratum")
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("weight")).as("sample_tokens")),
        Seq("stratum"), "left")
      .select(col("stratum"),
        col("n_docs"),
        coalesce(col("n_dedup"), lit(0L)).as("n_dedup"),
        coalesce(col("n_band"), lit(0L)).as("n_band"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        coalesce(col("sample_tokens"), lit(0L)).as("sample_tokens"))
  }

  def run(docs: DataFrame,
          ratesPpm: Map[String, Long] = DefaultRatesPpm,
          budget: Long = 50000L): DataFrame = {
    val keepers = Dedup.exactGroups(docs)
      .select(col("keeper_id").as("doc_id"))
    val deduped = docs.join(keepers, Seq("doc_id"), "left_semi")
    val kept = deduped.join(
      TextAnalysis.ccnetPipeline(docs).where(col("keep") === 1).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val sampled = kept.join(
      TextAnalysis.stratifiedSample(kept, ratesPpm).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    TextAnalysis.shardPacking(sampled, budget)
  }
}
