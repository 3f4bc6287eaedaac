package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.textops.TextAnalysis

/** Unit semantics for the round-3 extension operators (their cross-engine
  * values are locked by the DuckDB oracle gate; these specs pin the
  * SEMANTIC contracts on hand-built inputs).
  */
class ExtensionOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf0001)
  private lazy val embeddings = Tables.embeddings(spark, sf0001)

  test("multi-table LSH finds a superset of the single-table pairs' spirit: more recall") {
    // OR-construction can only add candidate buckets, and every pair is
    // cosine-verified at the same tau — so more tables ⇒ ≥ as many pairs
    val multi1 = Dedup.lshNearDupPairsMulti(embeddings, tau = 0.35, nPlanes = 4, tables = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi3 = Dedup.lshNearDupPairsMulti(embeddings, tau = 0.35, nPlanes = 4, tables = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(multi1.subsetOf(multi3), "tables=3 must contain every tables=1 pair")
    assert(multi3.size > multi1.size, "extra tables should add recall on this corpus")
    // every emitted pair is ordered and cosine-verified
    assert(multi3.forall { case (a, b) => a < b })
  }

  test("ivfCellBalance: exact skew summary over a two-cell hand fixture") {
    import graft.similarity.Ann
    def axis(at: Int) = Array.tabulate(64)(i => if (i == at) 1.0f else 0.0f)
    // step 8 → centroids 0 (e₀) and 8 (e₁); ids 0..7 are e₀, 8..9 e₁
    val emb = (0 until 10).map(i => (i.toLong, if (i < 8) axis(0) else axis(1)))
      .toDF("vec_id", "embedding")
    val r = Ann.ivfCellBalance(emb, centroidStep = 8L).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)) == (2L, 10L, 2L, 2L, 8L, 1600000L),
      s"got $r")
    // perfectly balanced: 5 per cell → imbalance exactly 10⁶
    val bal = (0 until 10).map(i => (i.toLong, if (i < 5) axis(0) else axis(1)))
      .toDF("vec_id", "embedding")
    val b = Ann.ivfCellBalance(bal, centroidStep = 5L).collect().head
    assert(b.getLong(5) == 1000000L, s"got $b")
  }

  test("ppsSample: step crossings, certainty stratum multiplicity, exact total") {
    // weights 4,1,6,1 → W=12, k=4 → step=3; intervals [0,4) [4,5) [5,11)
    // [11,12) cross multiples {3}, {}, {6,9}, {12}
    val docs = Seq(
      (0L, "w w w w"), (1L, "x"), (2L, "y y y y y y"), (3L, "z"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.ppsSample(docs, k = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows == Map(0L -> (4L, 1L), 2L -> (6L, 2L), 3L -> (1L, 1L)), s"got $rows")
    assert(rows.values.map(_._2).sum == 4L, "total picks = floor(W/step) = k here")
    // k ≥ W degenerates to step 1: every doc in with multiplicity = weight
    val all = TextAnalysis.ppsSample(docs, k = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(all == Map(0L -> 4L, 1L -> 1L, 2L -> 6L, 3L -> 1L), s"got $all")
  }

  test("pageRankWeighted: all-1 weights reproduce pageRank; weight skews mass") {
    import graft.graph.GraphOps
    val uw = Seq(("a", "b"), ("c", "b"), ("b", "a")).toDF("src", "dst")
    val w1 = uw.withColumn("weight", lit(1L))
    val plain = GraphOps.pageRank(uw, iterations = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val weighted = GraphOps.pageRankWeighted(w1, iterations = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(weighted == plain, "all-1 weights must be bit-identical to pageRank")
    // a splits 4:1 between b and c — b must end above c
    val skew = Seq(("a", "b", 4L), ("a", "c", 1L)).toDF("src", "dst", "weight")
    val s = GraphOps.pageRankWeighted(skew, iterations = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r0 = 1000000000000L / 3
    val base = r0 * 150000L / 1000000L
    assert(s("b") == base + r0 * 850000L * 4 / (1000000L * 5),
      s"hand-computed weighted contribution: $s")
    assert(s("b") > s("c"), s"weight must skew mass: $s")
  }

  test("textRank: hub token outranks its leaves; counts alone do not decide") {
    // star-shaped co-occurrence: "hub" neighbors every leaf once; leaves
    // only ever meet hub — hub must win on centrality. "noise noise" adds
    // a high-FREQUENCY token with poor company: it must not outrank hub.
    val docs = Seq(
      (1L, "hub l1 hub l2 hub l3 hub l4"),
      (2L, "noise noise noise noise noise zz"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.textRank(docs, iterations = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.head._1 == "hub", s"hub is rank 1: ${rows.toSeq}")
    val byTok = rows.map(r => r._1 -> r._3).toMap
    assert(byTok("hub") < byTok("noise"),
      s"frequency without company must not win: ${rows.toSeq}")
    // ranks are contiguous from 1 and ordered by score desc
    assert(rows.map(_._3).toSeq == (1L to rows.length).toSeq)
    assert(rows.sliding(2).forall(p => p.head._2 >= p.last._2))
  }

  test("vocabGrowth: first-doc attribution, exact counts per checkpoint") {
    val docs = Seq((0L, "a b"), (1L, "b c"), (2L, "c d d"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.vocabGrowth(docs, checkpoints = Seq(0L, 1L, 2L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(0L) == (2L, 2L, 1000000L), s"after doc 0: $rows")
    assert(rows(1L) == (4L, 3L, 750000L), s"after doc 1: b is not new: $rows")
    assert(rows(2L) == (7L, 4L, 571428L), s"after doc 2: dup d counts once: $rows")
  }

  test("segmentRepetition: dup line/para fractions and char mass, empties dropped") {
    val docs = Seq(
      // lines [aaa, bb, aaa, bb, bb]: 3 dup occurrences of 5 (600000 ppm),
      // dup chars 7 of 12 (583333); paras [aaa\nbb\naaa, bb\nbb] distinct
      (1L, "aaa\nbb\naaa\n\nbb\nbb"),
      // both granularities see [p, p, q]: 1 dup of 3, 1 dup char of 3
      (2L, "p\n\np\n\nq"),
      // empty text → zero segments → all-zero metrics, no div-by-zero
      (3L, ""))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.segmentRepetition(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
         r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(rows(1L) == (5L, 600000L, 583333L, 2L, 0L, 0L), s"doc 1: $rows")
    assert(rows(2L) == (3L, 333333L, 333333L, 3L, 333333L, 333333L), s"doc 2: $rows")
    assert(rows(3L) == (0L, 0L, 0L, 0L, 0L, 0L), s"doc 3: $rows")
  }

  test("bigramNovelty: novel = in no other doc; distinct within doc; <2 tokens drop") {
    val docs = Seq(
      (1L, "a b c a b"), // distinct bigrams: {a b, b c, c a} — "a b" shared with doc 2
      (2L, "a b x"),     // {a b, b x}
      (3L, "solo"))      // no bigrams → absent from output
      .toDF("doc_id", "text")
    val rows = TextAnalysis.bigramNovelty(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(1L) == (3L, 2L, 666666L), s"doc 1: $rows")
    assert(rows(2L) == (2L, 1L, 500000L), s"doc 2: $rows")
    assert(!rows.contains(3L))
  }

  test("cdcChunkStats: boundaries re-synchronize after an inserted header; fixed grid cannot") {
    val body = (0 until 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, body), (2L, "hdr " + body)).toDF("doc_id", "text")
    val cdc = Dedup.cdcChunkStats(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1 is first in (doc_id, idx) order: keeps everything
    assert(cdc(1L)._2 == cdc(1L)._1 && cdc(1L)._3 == 0L, s"doc 1 keeps all: $cdc")
    // doc 2: after the first content boundary the chunk stream re-syncs
    // with doc 1's, so most of its chunks are drops — THE CDC property
    assert(cdc(2L)._3 > 0L, s"shifted copy must share chunks: $cdc")
    assert(cdc(2L)._3 >= cdc(2L)._1 - 2L,
      s"everything after the first re-sync boundary is shared: $cdc")
    // the fixed grid shares nothing under a 1-token shift (d13's blind spot)
    val fixed = Dedup.chunkDedupStats(docs, chunkTokens = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(fixed(2L) == 0L, s"fixed chunks all shift — no drops: $fixed")
    // boundary determinism: same content → identical accounting on re-run
    val again = Dedup.cdcChunkStats(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(again == cdc)
  }

  test("chunkDedupStats keeps first occurrence only — across docs AND within one") {
    val docs = Seq(
      (1L, "a b c d a b"), // chunks (k=2): [a b][c d][a b] — last is a within-doc dup
      (2L, "a b x y"))     // [a b] lost to doc 1; [x y] kept
      .toDF("doc_id", "text")
    val rows = Dedup.chunkDedupStats(docs, chunkTokens = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(1L) == (3L, 2L, 1L), s"doc 1: $rows")
    assert(rows(2L) == (2L, 1L, 1L), s"doc 2: $rows")
  }

  test("qualityGate: each rule trips independently; clean docs pass") {
    val stopPad = Seq.fill(6)("the a of and to").mkString(" ") // 30 toks, all stop
    val docs = Seq(
      (1L, stopPad),                                        // clean: 30 toks, stop-dense, distinct-ish? dup high!
      (2L, "too short the a"),                              // < 30 tokens
      (3L, Seq.tabulate(30)(i => s"w$i").mkString(" ")),    // no stopwords
      (4L, ("the a of and to " * 6).trim + " !!!"))         // punct over 10%? no — tiny; stays clean
      .toDF("doc_id", "text")
    val rows = graft.textops.TextAnalysis.qualityGate(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // doc 1: 30 tokens of 5 distinct words → dup 833333 ppm > 600000 → repetition fail
    assert(rows(1L) == (0L, 0L, 1L, 0L, 0L))
    assert(rows(2L) == (1L, 0L, 0L, 0L, 0L), s"short: $rows")
    assert(rows(3L) == (0L, 1L, 0L, 0L, 0L), s"no stopwords: $rows")
    // doc 4: 31 tokens, 6 distinct → repetition fail; '!!!' is 3 of 99
    // chars ≈ 30303 ppm < 100000 → punct ok
    assert(rows(4L) == (0L, 0L, 1L, 0L, 0L), s"doc4: $rows")
    // a genuinely clean doc: 30 distinct tokens with a few stopwords
    val clean = Seq((9L, (Seq("the", "a", "of") ++
      Seq.tabulate(27)(i => s"w$i")).mkString(" "))).toDF("doc_id", "text")
    val r9 = graft.textops.TextAnalysis.qualityGate(clean).head()
    assert((2 to 5).map(r9.getLong).sum == 0L && r9.getLong(6) == 1L)
  }

  test("sign-LSH buckets quarantine undersized vectors in bucket 0") {
    // a corrupt 10-dim vector must NOT prefix-hash into a genuine bucket
    // (streaming near-dup would then drop a real doc as its duplicate)
    val df = Seq(
      (1L, Seq.tabulate(64)(i => if (i % 3 == 0) 0.9f else -0.4f)),
      (2L, Seq.fill(10)(0.9f)))
      .toDF("vec_id", "embedding")
    val rows = graft.similarity.Ann.signLshBuckets(df, nPlanes = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(2L) == 0L, s"short vector must quarantine: $rows")
  }

  test("recallAtK: hits counted per query, ppm floor-scaled") {
    val exact = Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L),
      (2L, 1L, 20L), (2L, 2L, 21L), (2L, 3L, 22L))
      .toDF("query_id", "rank", "neighbor_id")
    val approx = Seq((1L, 1L, 10L), (1L, 2L, 99L), (1L, 3L, 12L),
      (2L, 1L, 98L), (2L, 2L, 97L), (2L, 3L, 96L))
      .toDF("query_id", "rank", "neighbor_id")
    val rows = graft.similarity.Ann.recallAtK(exact, approx)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1L) == (2L, 666666L)) // 2/3 → floor ppm
    assert(rows(2L) == (0L, 0L))      // disjoint → zero, query still present
  }

  test("ivfPqTopK: well-formed per-query top-k that recovers real neighbors") {
    import graft.similarity.Ann
    val pred = col("vec_id") % 50 === 0
    val rows = Ann.ivfPqTopK(embeddings, pred)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1L to rs.length), s"ranks not contiguous for $q")
      assert(rs.forall(_._3 != q), s"query $q returned itself")
    }
    // the 8-byte codes must still carry signal: averaged recall@5 against
    // the exact top-k is well above chance (chance ≈ k/|corpus| ≈ 1%)
    val recall = Ann.recallAtK(Ann.bruteForceTopK(embeddings, pred),
        Ann.ivfPqTopK(embeddings, pred))
      .agg(avg(col("recall_ppm"))).head().getDouble(0)
    assert(recall > 100000.0, s"ADC recall collapsed: $recall ppm")
  }

  test("perceptualDupPairs: 1-bit frame perturbation pairs, far hashes survive the chunk filter") {
    val frameA = "a" * 30 + "b" * 30            // aHash 0…0 1…1 (mean 97)
    val frameB = "a" * 30 + "b" * 29 + "a"      // one byte off → Hamming 1
    val docs = Seq(
      (1L, frameA + "x" * 40),  // filler past byte 60 is aHash-invisible
      (2L, frameB + "y" * 40),
      (3L, "z" * 100))          // all-zero hash: shares zero CHUNKS with 1/2
      .toDF("doc_id", "text")   //   → candidate, then killed by the Hamming check
    val pairs = graft.multimodal.Multimodal
      .perceptualDupPairs(graft.multimodal.Multimodal.asMedia(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 1L)), s"got $pairs")
    // hot-bucket cap: the 3-member zero chunks drop at cap=2, but the
    // discriminative 2-member chunk still pairs 1↔2; cap=1 kills all
    val cap2 = graft.multimodal.Multimodal
      .perceptualDupPairs(graft.multimodal.Multimodal.asMedia(docs),
        maxBucketFreq = Some(2L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cap2 == Set((1L, 2L, 1L)), s"got $cap2")
    assert(graft.multimodal.Multimodal
      .perceptualDupPairs(graft.multimodal.Multimodal.asMedia(docs),
        maxBucketFreq = Some(1L)).collect().isEmpty)
  }

  test("ImageIoCodec decodes real PNG pixels: dims, luma aHash, corrupt fallback") {
    import graft.multimodal.Multimodal
    // 10×8 gradient: the JRE PNG writer → ImageIO reader roundtrip must
    // recover every pixel exactly (grayscale has no color-space surprises)
    val png = Multimodal.syntheticGrayPng(10, 8, (x, y) => (y * 10 + x) * 3)
    val img = Multimodal.ImageIoCodec.decode(png)
    assert(img.getWidth == 10 && img.getHeight == 8)
    // hand-computed aHash: lumas 0,3,…,177 over the first 60 px, mean
    // (Σ 3i for i<60)/60 = 3*59/2 = 88 (integer), bit set iff luma > 88
    val lumas = (0 until 60).map(_ * 3L)
    val mean = lumas.sum / 60
    val expect = lumas.foldLeft(0L)((a, l) => a * 2 + (if (l > mean) 1L else 0L))
    assert(Multimodal.ImageIoCodec.aHash(png).contains(expect))
    // decodeBatch: real dims, 1 frame; corrupt payload degrades to zeros
    val metas = Multimodal.ImageIoCodec.decodeBatch(Seq(
      Multimodal.MediaRecord(1L, png, "image"),
      Multimodal.MediaRecord(2L, "not a png".getBytes("UTF-8"), "image")))
    assert(metas.map(m => (m.doc_id, m.width, m.height, m.n_frames)) ==
      Seq((1L, 10L, 8L, 1L), (2L, 0L, 0L, 0L)))
    assert(Multimodal.ImageIoCodec.aHash("junk".getBytes("UTF-8")).isEmpty)
    // under 60 px → no hash (too little signal), dims still real
    val tiny = Multimodal.syntheticGrayPng(7, 8, (_, _) => 1)
    assert(Multimodal.ImageIoCodec.aHash(tiny).isEmpty)
    assert(Multimodal.ImageIoCodec.decodeBatch(Seq(
      Multimodal.MediaRecord(3L, tiny, "image"))).head.width == 7L)
  }

  test("decodeImages: partition-local real decode over a media frame") {
    import graft.multimodal.Multimodal
    val rows = Seq(5L, 6L).map { id =>
      val w = (id % 13 + 8).toInt
      val h = (id % 7 + 8).toInt
      (id, Multimodal.syntheticGrayPng(w, h,
        (x, y) => (((id * 31 + y.toLong * w + x) * 17) % 256).toInt), "image")
    }
    val out = Multimodal.decodeImages(rows.toDF("doc_id", "media", "media_type"))
      .collect().map(d => d.doc_id -> d).toMap
    assert(out(5L).width == 13 && out(5L).height == 13) // 5%13+8, 5%7+8
    assert(out(6L).width == 14 && out(6L).height == 14)
    // ahash from REAL decoded pixels matches the generator formula
    def expect(id: Long): Long = {
      val lumas = (0 until 60).map(i => ((id * 31 + i) * 17) % 256)
      val mean = lumas.sum / 60
      lumas.foldLeft(0L)((a, l) => a * 2 + (if (l > mean) 1L else 0L))
    }
    assert(out(5L).ahash.contains(expect(5L)))
    assert(out(6L).ahash.contains(expect(6L)))
  }

  test("WavCodec decodes real RIFF/PCM: header fields, channel-0 samples, fingerprint") {
    import graft.multimodal.Multimodal
    // stereo 16-bit WAV through the JRE's real writer → reader roundtrip
    val samples = Array.tabulate(100)(i => (i * 71) % 4096 - 2048)
    val wav = Multimodal.syntheticPcmWav(16000, 2, samples)
    val pcm = Multimodal.WavCodec.decode(wav).get
    assert(pcm.sampleRate == 16000L && pcm.channels == 2 && pcm.nFrames == 100L)
    assert(pcm.ch0.toSeq == samples.toSeq, "channel-0 PCM must roundtrip exactly")
    // fingerprint = signs of successive |amplitude| deltas, MSB-first
    val expect = (0 until 60).foldLeft(0L)((a, i) =>
      a * 2 + (if (math.abs(samples(i + 1)) > math.abs(samples(i))) 1L else 0L))
    assert(Multimodal.WavCodec.fingerprint(wav).contains(expect))
    // gain invariance: half-volume copy keeps the fingerprint (deltas of
    // scaled magnitudes keep their sign when the scale never creates ties
    // — this signal's |deltas| are all ≥ 2, so /2 preserves every strict >)
    val half = Multimodal.syntheticPcmWav(16000, 2, samples.map(_ / 2))
    assert(Multimodal.WavCodec.fingerprint(half).contains(expect))
    // permissive degrade: junk bytes and too-short clips
    assert(Multimodal.WavCodec.decode("not a wav".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.WavCodec.fingerprint(
      Multimodal.syntheticPcmWav(8000, 1, Array.fill(20)(5))).isEmpty)
  }

  test("decodeAudio + audioDupPairs: re-levelled copy pairs up, junk degrades to zeros") {
    import graft.multimodal.Multimodal
    val base = Array.tabulate(80)(i => ((i * 131) % 3000) - 1500)
    val rows = Seq(
      (1L, Multimodal.syntheticPcmWav(8000, 1, base), "audio"),
      (2L, Multimodal.syntheticPcmWav(22050, 2, base.map(v => v / 2)), "audio"), // re-levelled re-containered copy
      (3L, "definitely not audio".getBytes("UTF-8"), "audio"))
    val df = rows.toDF("doc_id", "media", "media_type")
    val dec = Multimodal.decodeAudio(df).collect().map(d => d.doc_id -> d).toMap
    assert(dec(1L).sample_rate == 8000L && dec(1L).channels == 1L && dec(1L).n_samples == 80L)
    assert(dec(2L).sample_rate == 22050L && dec(2L).channels == 2L)
    assert(dec(3L).sample_rate == 0L && dec(3L).fp.isEmpty)
    assert(dec(1L).fp == dec(2L).fp && dec(1L).fp.nonEmpty)
    val pairs = Multimodal.audioDupPairs(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("audioEnergy: window split, exact Σs², strict silence gate, partial tail, permissive degrade") {
    import graft.multimodal.Multimodal
    // 80 samples: 32 zeros (silent), 32 loud, 16-sample partial tail
    val samples = Array.tabulate(80)(i =>
      if (i < 32) 0 else if (i < 64) 1500 else 40)
    val rows = Seq(
      (1L, Multimodal.syntheticPcmWav(8000, 1, samples), "audio"),
      (2L, "junk".getBytes("UTF-8"), "audio"))
    val df = rows.toDF("doc_id", "media", "media_type")
    val out = Multimodal.audioEnergy(df, windowSamples = 32, silenceMeanSq = 1000000L)
      .collect().map(w => (w.doc_id, w.win_idx) -> w).toMap
    assert(out.keySet == Set((1L, 0L), (1L, 1L), (1L, 2L)), "junk doc emits no rows")
    assert(out((1L, 0L)).energy == 0L && out((1L, 0L)).silent, "zero window is silent")
    // 32 × 1500² = 72,000,000 ≥ 32 × 10⁶ → not silent
    assert(out((1L, 1L)).energy == 32L * 1500L * 1500L && !out((1L, 1L)).silent)
    // partial tail keeps its true length; 16 × 40² = 25,600 < 16 × 10⁶ → silent
    val tail = out((1L, 2L))
    assert(tail.n_samples == 16L && tail.energy == 16L * 40L * 40L && tail.silent)
    // boundary is NOT silent (strict <): a window at exactly thr·n
    val boundary = Array.fill(32)(1000) // 32 × 10⁶ energy = thr × 32 exactly
    val bdf = Seq((9L, Multimodal.syntheticPcmWav(8000, 1, boundary), "audio"))
      .toDF("doc_id", "media", "media_type")
    val b = Multimodal.audioEnergy(bdf, 32, 1000000L).collect().head
    assert(b.energy == 32000000L && !b.silent, "boundary mean-square is not silent")
  }

  test("vadSegments: voiced-run islands, hangover merges 1-gaps but not 2-gaps, energy excludes bridged silence") {
    import graft.multimodal.Multimodal
    // hand window frame for one doc:
    // win:    0  1  2  3  4  5  6  7  8  9
    // silent: F  F  T  F  T  T  F  F  T  F
    // runs {0,1} {3} {6,7} {9}; hangover 1 merges across the single
    // silent window 2 and 8, NOT across the double gap {4,5}:
    // segments: [0..3], [6..9]
    val silents = Seq(false, false, true, false, true, true,
      false, false, true, false)
    val wins = silents.zipWithIndex.map { case (sil, k) =>
      (1L, k.toLong, 16L, if (sil) 0L else 100L + k, sil)
    }.toDF("doc_id", "win_idx", "n_samples", "energy", "silent")
    val segs = Multimodal.vadSegments(wins, hangover = 1)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // energy sums the VOICED windows only (silent window 2 bridged, not counted)
    assert(segs(0L) == (0L, 3L, 3L, 100L + 101L + 103L), s"got $segs")
    assert(segs(1L) == (6L, 9L, 3L, 106L + 107L + 109L), s"got $segs")
    assert(segs.size == 2)
    // hangover 0: every silent window splits — 4 segments
    val strict = Multimodal.vadSegments(wins, hangover = 0)
      .collect().map(_.getLong(1)).sorted
    assert(strict.sameElements(Array(0L, 1L, 2L, 3L)), s"got ${strict.toSeq}")
  }

  test("audioZeroCrossings: exact window-internal sign changes, voiced gate splits") {
    import graft.multimodal.Multimodal
    // 32 alternating samples (31 crossings), then 32 constant (0), then
    // a 16-sample tail mixing one change at its 8th sample
    val samples = Array.tabulate(80)(i =>
      if (i < 32) { if (i % 2 == 0) 100 else -100 }
      else if (i < 64) 7
      else if (i < 72) 50 else -50)
    val df = Seq((1L, Multimodal.syntheticPcmWav(8000, 1, samples), "audio"))
      .toDF("doc_id", "media", "media_type")
    val out = Multimodal.audioZeroCrossings(df, 32, voicedMaxZcrPpm = 600000L)
      .collect().map(w => w.win_idx -> w).toMap
    assert(out(0L).crossings == 31L && !out(0L).voiced, s"got ${out(0L)}")
    // window boundary adjacency does NOT count (sample 31 → 32 ignored)
    assert(out(1L).crossings == 0L && out(1L).voiced)
    assert(out(2L).n_samples == 16L && out(2L).crossings == 1L && out(2L).voiced)
    // sign class: zero rides with positives — a 0→positive step is no crossing
    val z = Seq((2L, Multimodal.syntheticPcmWav(8000, 1,
        Array(0, 5, 0, -5, 0, 5, 0, -5) ++ Array.fill(24)(1)), "audio"))
      .toDF("doc_id", "media", "media_type")
    val zr = Multimodal.audioZeroCrossings(z, 32).collect().head
    // crossings only where the v<0 class flips: 5→-5? via 0: 0,5 (no),
    // 5,0 (no), 0,-5 (yes), -5,0 (yes), 0,5 (no), 5,0 (no), 0,-5 (yes),
    // -5,1 (yes) = 4
    assert(zr.crossings == 4L, s"got $zr")
  }

  test("resampleAudio: exact down/upsample index mapping, real container round-trip, degrade") {
    import graft.multimodal.Multimodal
    val samples = Array.tabulate(40)(i => (i * 50) - 1000)
    val rows = Seq(
      (1L, Multimodal.syntheticPcmWav(8000, 2, samples), "audio"),
      (2L, "noise".getBytes("UTF-8"), "audio"))
    val df = rows.toDF("doc_id", "media", "media_type")
    // 8000 → 4000: every 2nd sample, nOut = 20
    val down = Multimodal.resampleAudio(df, dstRate = 4000)
      .collect().map(r => r.doc_id -> r).toMap
    assert(down.keySet == Set(1L), "junk emits no rows")
    assert(down(1L).dst_rate == 4000L && down(1L).n_samples == 20L)
    val expectDown = (0 until 20).map(i => (i + 1L) * samples(i * 2)).sum
    assert(down(1L).checksum == expectDown)
    // 8000 → 16000: each sample duplicated, nOut = 80
    val up = Multimodal.resampleAudio(df, dstRate = 16000).collect().head
    assert(up.dst_rate == 16000L && up.n_samples == 80L)
    val expectUp = (0 until 80).map(i => (i + 1L) * samples(i / 2)).sum
    assert(up.checksum == expectUp)
  }

  test("randomProjectionGate: single-coordinate diff is exactly ratio 1, zero pairs drop") {
    import graft.similarity.Ann
    def vec(at: Int, v: Float) =
      Array.tabulate(64)(i => if (i == at) v else 0.0f)
    val emb = Seq(
      // pair (0,1): diff = 3·e₀ → every pd² = 9 → d2p(m) = 9m → ratio
      // EXACTLY 1 for every m (±1 signs square away) — the whole pipeline
      // (signs, slice, floor, ppm) must reproduce 1000000/dev 0
      (0L, vec(0, 5.0f)), (1L, vec(0, 2.0f)),
      // pair (10,11): identical vectors → d2o = 0 → dropped
      (10L, vec(3, 7.0f)), (11L, vec(3, 7.0f)),
      // id 5 is not in the %10 sample; id 21 has no pair anchor
      (5L, vec(1, 1.0f)), (21L, vec(2, 4.0f)))
      .toDF("vec_id", "embedding")
    val rows = Ann.randomProjectionGate(emb)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == Set(8L, 16L, 32L))
    for (m <- Seq(8L, 16L, 32L))
      assert(rows(m) == (1L, 1L, 1000000L, 0L), s"m=$m: $rows")
    // the real fixture: 50 sampled pairs, every branch sees all of them
    val fx = Ann.randomProjectionGate(embeddings)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(fx.map(_._2).distinct.sizeIs == 1, s"same pairs per branch: ${fx.toSeq}")
    assert(fx.forall { case (_, n, w, d) => n == 50L && w >= 0L && w <= 1000000L && d >= 0L },
      s"sane ppm bounds: ${fx.toSeq}")
  }

  test("rasterDigest: container-independent — PNG and BMP of one raster digest equal") {
    import graft.multimodal.Multimodal
    val f = (x: Int, y: Int) => (x * 16 + y * 3) % 256
    val png = Multimodal.syntheticGrayPng(8, 8, f)
    // re-encode the SAME raster as BMP: different container bytes
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val bmp = bos.toByteArray
    assert(!java.util.Arrays.equals(png, bmp), "containers must differ at byte level")
    val media = Seq((1L, png), (2L, bmp), (3L, Array[Byte](9, 9)))
      .toDF("doc_id", "media").withColumn("media_type", lit("image"))
    val rows = Multimodal.rasterDigest(media)
      .collect().map(r => r.doc_id -> (r.width, r.height, r.raster_md5)).toMap
    assert(rows(1L) == rows(2L), s"same pixels must digest equal: $rows")
    assert(rows(1L)._1 == 8L && rows(1L)._2 == 8L)
    assert(!rows.contains(3L), "undecodable payloads emit no rows")
    // a one-pixel change must move the digest
    val png2 = Multimodal.syntheticGrayPng(8, 8,
      (x, y) => if (x == 0 && y == 0) (f(0, 0) + 1) % 256 else f(x, y))
    val other = Multimodal.rasterDigest(
      Seq((4L, png2)).toDF("doc_id", "media").withColumn("media_type", lit("image")))
      .collect().head.raster_md5
    assert(other != rows(1L)._3)
  }

  test("imageHistogram: solid flags flat, gradient ties to smallest bin, corrupt drops") {
    import graft.multimodal.Multimodal
    def png(id: Long, w: Int, h: Int, f: (Int, Int) => Int) =
      (id, Multimodal.syntheticGrayPng(w, h, f))
    val media = Seq(
      png(1L, 3, 3, (_, _) => 200),      // solid: bin 12 holds all 9
      png(2L, 4, 4, (x, _) => x * 16),   // bins 0..3 each 4 — tie → bin 0
      (3L, Array[Byte](1, 2, 3)))        // corrupt → no row
      .toDF("doc_id", "media").withColumn("media_type", lit("image"))
    val rows = Multimodal.imageHistogram(media)
      .collect().map(r => r.doc_id ->
        (r.n_pixels, r.top_bin, r.top_count, r.n_bins_used, r.flat)).toMap
    assert(rows(1L) == (9L, 12L, 9L, 1L, true), s"solid: $rows")
    assert(rows(2L) == (16L, 0L, 4L, 4L, false), s"gradient: $rows")
    assert(!rows.contains(3L), "undecodable payloads emit no rows")
  }

  test("audioPitch: sawtooth finds its period, all-zero ties to minLag, short clips drop") {
    import graft.multimodal.Multimodal
    def wav(id: Long, samples: Array[Int]) =
      Seq((id, Multimodal.syntheticPcmWav(8000, 1, samples)))
        .toDF("doc_id", "media").withColumn("media_type", lit("audio"))
    // period-4 sawtooth [-15,-5,5,15] × 8: R(4) = 28·avg(s²)·… — exactly
    // 7 periods of Σs² = 7·500 = 3500; energy 8·500 = 4000; 2·3500 > 4000
    val saw = wav(1L, Array.tabulate(32)(i => (i % 4) * 10 - 15))
    val r1 = Multimodal.audioPitch(saw, minLag = 2, maxLag = 8).collect().head
    assert((r1.n_samples, r1.energy, r1.best_lag, r1.best_r, r1.periodic) ==
      (32L, 4000L, 4L, 3500L, true), s"sawtooth: $r1")
    // alternating ±1000 × 8: R(1) < 0, R(2) = 14·10⁶ wins, clarity 28M > 16M
    val alt = wav(2L, Array.tabulate(16)(i => if (i % 2 == 0) 1000 else -1000))
    val r2 = Multimodal.audioPitch(alt, minLag = 1, maxLag = 3).collect().head
    assert((r2.best_lag, r2.best_r, r2.periodic) == (2L, 14000000L, true), s"alt: $r2")
    // all-zero: every R ties at 0 → smallest candidate lag, NOT periodic
    val zero = wav(3L, Array.fill(20)(0))
    val r3 = Multimodal.audioPitch(zero, minLag = 2, maxLag = 5).collect().head
    assert((r3.best_lag, r3.best_r, r3.periodic) == (2L, 0L, false), s"zero: $r3")
    // n <= minLag emits nothing (no overlapping pair at any candidate lag)
    assert(Multimodal.audioPitch(wav(4L, Array(7, -7)), minLag = 2, maxLag = 5)
      .collect().isEmpty)
  }

  test("pageRank: hand-computed star ranks, truncating-integer exactness, mass never grows") {
    import graft.graph.GraphOps
    // a→b, c→b, b→a: N=3, r0 = 10^12//3, every node outdeg 1
    val edges = Seq(("a", "b"), ("c", "b"), ("b", "a")).toDF("src", "dst")
    val r0 = 1000000000000L / 3      // 333333333333
    val base = r0 * 150000L / 1000000L
    val d = (v: Long) => v * 850000L / 1000000L // outdeg-1 contribution
    val one = GraphOps.pageRank(edges, iterations = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one("b") == base + 2 * d(r0), s"b gets a+c contributions: $one")
    assert(one("a") == base + d(r0), s"a gets b's contribution: $one")
    assert(one("c") == base, s"c has no in-links: $one")
    assert(one("b") > one("a") && one("a") > one("c"))
    // second round from the first-round ranks, same formula
    val two = GraphOps.pageRank(edges, iterations = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(two("b") == base + d(one("a")) + d(one("c")))
    assert(two("a") == base + d(one("b")))
    // truncation + damping only leak mass, never create it
    assert(two.values.sum <= 3 * r0)
    // non-broadcast path is the same formula
    val nb = GraphOps.pageRank(edges, iterations = 2, broadcastRanks = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nb == two, "shuffle-join path must match the broadcast path")
  }

  test("hits: hand-computed hub/authority round, exact integer normalization") {
    import graft.graph.GraphOps
    // h1→a, h2→a, h1→b: a is the 2-hub authority, h1 the 2-link hub
    val edges = Seq(("h1", "a"), ("h2", "a"), ("h1", "b")).toDF("src", "dst")
    val m = GraphOps.hits(edges, iterations = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // a_raw = (2S, S, 0, 0), Σ = 3S → a = (⌊2S/3⌋, ⌊S/3⌋, 0, 0)
    assert(m("a") == (666666666666L, 0L), s"got $m")
    assert(m("b") == (333333333333L, 0L))
    // h_raw(h1) = a(a)+a(b) = 999999999999, h_raw(h2) = 666666666666,
    // Σ = 1666666666665 → exactly (600000000000, 400000000000)
    assert(m("h1") == (0L, 600000000000L))
    assert(m("h2") == (0L, 400000000000L))
    // each normalized side sums to ≤ scale (truncation only leaks)
    assert(m.values.map(_._1).sum <= 1000000000000L)
    assert(m.values.map(_._2).sum <= 1000000000000L)
  }

  test("kCore: K4 survives k=3 with pendant chain peeled; path cascades to empty") {
    import graft.graph.GraphOps
    val k4 = for { i <- Seq("a", "b", "c", "d"); j <- Seq("a", "b", "c", "d")
                   if i < j } yield (i, j)
    val g = (k4 ++ Seq(("d", "e"), ("e", "f"))).toDF("src", "dst")
    val rows = GraphOps.kCore(g, k = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (h <- Seq("a", "b", "c", "d"))
      assert(rows(h) == (1L, 3L), s"K4 members keep 3 core neighbors: $rows")
    assert(rows("e") == (0L, 0L) && rows("f") == (0L, 0L), s"pendants peel: $rows")
    // cascading peel: a path has no 2-core — survivors cascade to empty
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    val p = GraphOps.kCore(path, k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p.values.forall(_ == 0L), s"a path has no 2-core: $p")
    // a cycle IS its own 2-core — nothing peels
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val c = GraphOps.kCore(cyc, k = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(c.values.forall(_ == (1L, 2L)), s"cycle: $c")
    // shuffle-join hatch (~10⁸-host graphs) must match the broadcast path
    val nb = GraphOps.kCore(g, k = 3, broadcastSurvivors = false)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(nb == rows, s"broadcast≡shuffle parity: $nb vs $rows")
  }

  test("charNgramLangId: trained char-gram model beats the stopword voter on stopword-free text") {
    import graft.textops.TextAnalysis
    // two "languages" with disjoint character morphology and ZERO tokens
    // from any stopword list — the slice where t03's voter can only
    // answer `und`, and exactly why CCNet-class pipelines identify
    // language with char-n-gram models instead
    val docs = (0 until 40).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      def word(j: Int) =
        if (lang == "aa") s"zork${(i + j) % 7}ax" else s"quim${(i + j) % 7}ub"
      (i.toLong, (0 until 12).map(word).mkString(" "), lang)
    }.toDF("doc_id", "text", "lang")
    val voter = TextAnalysis.languageId(docs)
    assert(voter.where(col("pred_lang") =!= "und").count() == 0,
      "stopword-free text: the voter must answer und everywhere")
    val trained = TextAnalysis.charNgramLangId(docs)
    val acc = trained.agg(sum(col("self_match"))).first().getLong(0)
    assert(acc == 40L, s"char-gram model must classify every doc: $acc/40")
    // and the confusion matrix reads as the clean diagonal
    val cells = TextAnalysis.charNgramConfusion(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cells == Map(("aa", "aa") -> 20L, ("bb", "bb") -> 20L), s"$cells")
  }

  test("langIdConfusion: exact cells and row shares, und routing") {
    val docs = Seq(
      (1L, "the of and", "en"), // stopword hit → pred en
      (2L, "qqq zzz", "en"),    // no stopwords → pred und
      (3L, "der die das", "de"))
      .toDF("doc_id", "text", "lang")
    val rows = TextAnalysis.langIdConfusion(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows(("en", "en")) == (1L, 500000L), s"got $rows")
    assert(rows(("en", "und")) == (1L, 500000L), s"got $rows")
    assert(rows(("de", "de")) == (1L, 1000000L), s"got $rows")
    assert(rows.size == 3)
  }

  test("degreeAssortativity: star is exactly -1, path hand-moments, regular graph NULL") {
    import graft.graph.GraphOps
    def one(edges: Seq[(String, String)]) =
      GraphOps.degreeAssortativity(edges.toDF("src", "dst")).collect().head
    // star K1,3: every edge joins degree 3 to degree 1 → r = −1 exactly
    val star = one(Seq(("h", "a"), ("h", "b"), ("h", "c")))
    assert((star.getLong(0), star.getLong(1), star.getLong(2), star.getLong(3),
      star.getLong(4)) == (3L, 9L, 12L, 30L, -1000000L), s"star: $star")
    // path a-b-c-d: moments M=3, Σjk=8, Σ(j+k)=10, Σ(j²+k²)=18 →
    // r = −4/8 → −500000 ppm (truncation toward zero on a negative)
    val path = one(Seq(("a", "b"), ("b", "c"), ("c", "d")))
    assert((path.getLong(0), path.getLong(1), path.getLong(2), path.getLong(3),
      path.getLong(4)) == (3L, 8L, 10L, 18L, -500000L), s"path: $path")
    // 1-regular graph (two disjoint edges): zero degree variance → NULL
    val reg = one(Seq(("a", "b"), ("c", "d")))
    assert(reg.isNullAt(4), s"regular graph must yield NULL ppm: $reg")
  }

  test("harmonicCentrality: path-graph exact sums, first-reach min, direction flag") {
    import graft.graph.GraphOps
    // path a→b→c→d: along in-links, H(d) = 1/1 + 1/2 + 1/3 in ppm
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val in = GraphOps.harmonicCentrality(path, radius = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(in("b") == (1L, 1000000L), s"got $in")
    assert(in("c") == (2L, 1500000L), s"got $in")
    assert(in("d") == (3L, 1833333L), s"got $in")
    assert(!in.contains("a"), "nothing reaches a along in-links")
    // outgoing direction is the mirror read
    val out = GraphOps.harmonicCentrality(path, radius = 3, incoming = false)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("a") == 1833333L && !out.contains("d"), s"got $out")
    // diamond + shortcut: a reaches d at distance 1 directly — the
    // min(d) merge must not let the longer a→b→d path double or override
    val dia = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d"))
      .toDF("src", "dst")
    val hd = GraphOps.harmonicCentrality(dia, radius = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hd("d") == (3L, 3000000L), s"all three at first-reach 1: $hd")
  }

  test("beamSearchTopK: expands from the entry over the knn graph, ranks tie by id") {
    import graft.similarity.Ann
    // twenty IDENTICAL vectors: one LSH bucket, every cosine bit-equal,
    // so every ordering decision falls to the id tie-break and the whole
    // search is hand-replayable — knnGraph links every node to the 3
    // smallest other ids, the symmetric edges make node 0 adjacent to
    // everyone, round 1 reaches the whole corpus, beam keeps ids 0..7
    val emb = (0L until 20L).map(i => (i, Array.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val out = Ann.beamSearchTopK(emb, col("vec_id") < 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rows) =>
        q -> rows.sortBy(_._2).map(_._3).toList
      }
    assert(out(0L) == List(1L, 2L, 3L, 4L, 5L), s"q0: $out")
    assert(out(1L) == List(0L, 2L, 3L, 4L, 5L), s"q1: $out")
    assert(out(2L) == List(0L, 1L, 3L, 4L, 5L), s"q2: $out")
    // and on the real fixture: exactly k rows per query, ranks 1..k,
    // self never its own neighbor
    val fx = Ann.beamSearchTopK(embeddings, col("vec_id") % 50 === 0, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    fx.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toList == List(1L, 2L, 3L, 4L, 5L), s"q$q ranks")
      assert(rows.forall(_._3 != q), s"q$q self-neighbor")
    }
  }

  test("beamTuningCurve: hand-exact on identical vectors, monotone in beam and rounds") {
    import graft.similarity.Ann
    // the s28 identical-vector corpus: all cosines bit-equal, every
    // decision falls to the id tie-break. beam 5 keeps ids 0..4, so
    // self-exclusion costs each query exactly one of its 5 truth hits
    // (recall 12/15); beam 8 keeps 0..7 and recall saturates at 10⁶.
    val emb = (0L until 20L).map(i => (i, Array.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val out = Ann.beamTuningCurve(emb, col("vec_id") < 3, k = 5,
        beams = Seq(5, 8, 16), rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toList
    assert(out == List((5L, 3L, 12L, 800000L), (8L, 3L, 15L, 1000000L),
      (16L, 3L, 15L, 1000000L)), s"got $out")
    // real fixture: the measured curve is monotone non-decreasing in beam
    // (typical-fixture property the curve documents — not a theorem, see
    // the scaladoc; a failure here means the fixture found the detour)
    val fx = Ann.beamTuningCurve(embeddings, col("vec_id") % 50 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    assert(fx.map(_._2).toList == fx.map(_._2).sorted.toList, s"beam curve: $fx")
    // recall IS non-decreasing in rounds at fixed beam (provable: the
    // round-r beam is a candidate of round r+1, and any displacer of a
    // truth member precedes it in the same total order, so is a hit too)
    val byRounds = (1 to 3).map(r =>
      Ann.beamTuningCurve(embeddings, col("vec_id") % 50 === 0,
        beams = Seq(8), rounds = r).collect()(0).getLong(3))
    assert(byRounds == byRounds.sorted, s"rounds curve: $byRounds")
  }

  test("hardNegatives: wrong-label only, FaceNet semi-hard band, null without a positive") {
    import graft.similarity.Ann
    // anchor 0 (label 0, (1,0)): positive 1 at cos 1/√2 ≈ .707.
    // negatives ranked: 2 (cos 1.0 — harder than the positive, NOT
    // semi-hard), 10 (cos EXACTLY the positive's 1/√2 — the strict-
    // inequality boundary: equal is not semi-hard), 3 (cos 1/√5 ≈ .447,
    // semi), 4 (cos 0, semi). anchor 10 (label 9) has no same-label
    // member → semi_hard null everywhere.
    val emb = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(1f, 1f), 0),
      (2L, Array(2f, 0f), 1), (3L, Array(1f, 2f), 1),
      (4L, Array(0f, 3f), 2), (10L, Array(1f, 1f), 9))
      .toDF("vec_id", "embedding", "label")
    val out = Ann.hardNegatives(emb, col("vec_id").isin(0L, 10L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    val a0 = out.filter(_._1 == 0L).sortBy(_._2).map(t => (t._3, t._4)).toList
    assert(a0 == List((2L, 0L), (10L, 0L), (3L, 1L), (4L, 1L)), s"anchor 0: $a0")
    val a10 = out.filter(_._1 == 10L)
    assert(a10.length == 5 && a10.forall(_._4 == -1L),
      s"no positive → null flags: ${a10.toList}")
    assert(!a10.exists(_._3 == 10L))
    // real fixture: negatives never share the anchor's label, ranks 1..k
    val labels = embeddings.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fx = Ann.hardNegatives(embeddings, col("vec_id") % 50 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    fx.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toList == (1L to 5L).toList, s"q$q ranks")
      assert(rows.forall(r => labels(r._3) != labels(q)), s"q$q label leak")
    }
  }

  test("effectiveDiameter: hand NF curve on a path, first at_q radius is the diameter") {
    import graft.graph.GraphOps
    // path a→b→c→d: NF(0)=4, NF(1)=7, NF(2)=9, NF(3)=10 → shares
    // 400000/700000/900000/1000000 of NF(3). q=900000 first holds at
    // radius 2 — EXACTLY at the threshold (≥, not >): the effective
    // diameter is 2. HLL exact at this cardinality → verdicts all 1.
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val out = GraphOps.effectiveDiameter(path, radius = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(0L) == ((4L, 400000L, 0L, 1L)), s"got $out")
    assert(out(1L) == ((7L, 700000L, 0L, 1L)), s"got $out")
    assert(out(2L) == ((9L, 900000L, 1L, 1L)), s"got $out")
    assert(out(3L) == ((10L, 1000000L, 1L, 1L)), s"got $out")
    // radius 0 degenerate: every ball is its own node, share 10⁶, at_q
    val r0 = GraphOps.effectiveDiameter(path, radius = 0).collect()
    assert(r0.length == 1 && r0.head.getLong(2) == 1000000L
      && r0.head.getLong(3) == 1L)
  }

  test("harmonicGate: exact columns match g07, sketch verdict holds on small graphs") {
    import graft.graph.GraphOps
    val dia = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d"))
      .toDF("src", "dst")
    val exact = GraphOps.harmonicCentrality(dia, radius = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val gated = GraphOps.harmonicGate(dia, radius = 3)
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(gated.keySet == exact.keySet)
    gated.foreach { case (h, (n, ppm, ok)) =>
      assert((n, ppm) == exact(h), s"exact columns must ride unchanged: $h")
      // HLL is exact at these cardinalities, so only the div-order
      // rounding separates the delta formula from the per-node sum —
      // far inside the 5% gate
      assert(ok == 1L, s"sketch verdict must hold at fixture scale: $h")
    }
  }

  test("labelPropagation: two bridged K4s separate, ties to min label, isolated keeps own") {
    import graft.graph.GraphOps
    // two 4-cliques joined by one bridge a1-b1, plus a self-loop-only node
    def k4(p: String) = for {
      i <- 1 to 4; j <- (i + 1) to 4
    } yield (s"$p$i", s"$p$j")
    val edges = (k4("a") ++ k4("b") ++ Seq(("a1", "b1"), ("z", "z")))
      .toDF("src", "dst")
    val out = GraphOps.labelPropagation(edges, rounds = 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // hand-replay: round 1 floods "a1"/"b1" through each clique (and "a2"
    // onto a1, "a1" onto b1 via min ties); round 2 restores a1→"a1" (its
    // three clique neighbors all voted "a1") and b1→"b1" (3 votes beat the
    // bridge's 1) — stable from round 3 on
    for (i <- 1 to 4) assert(out(s"a$i") == "a1", s"a-side: $out")
    for (i <- 1 to 4) assert(out(s"b$i") == "b1", s"b-side: $out")
    assert(out("z") == "z", "self-loop-only node keeps its own label")
    // rounds = 0 is the identity labeling
    val id = GraphOps.labelPropagation(edges, rounds = 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(id.forall { case (h, c) => h == c })
    // shuffle-join path must match the broadcast path
    val nb = GraphOps.labelPropagation(edges, rounds = 4, broadcastLabels = false)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(nb == out)
  }

  test("mrrEval: one row per query, exact reciprocal points, miss scores zero") {
    import graft.similarity.Ann
    val rows = Ann.mrrEval(embeddings, col("vec_id") % 50 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val queries = embeddings.where(col("vec_id") % 50 === 0).count()
    assert(rows.length == queries, "exactly one truth row per query")
    rows.foreach { case (q, rel, fr, pts) =>
      assert(rel != q, "the relevant doc is never the query itself")
      if (fr == 0L) assert(pts == 0L, s"miss must score 0: $q")
      else {
        assert(fr >= 1L && fr <= 5L)
        assert(pts == 1000000000L / fr, s"points must be the exact reciprocal: $q")
      }
    }
    // a degenerate 1-probe index can only do worse or equal
    val coarse = Ann.ivfTopK(embeddings, col("vec_id") % 50 === 0, nprobe = 1)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    val truthTop = rows.map(r => (r._1, r._2)).toMap
    val coarseHits = coarse.collect()
      .filter(r => truthTop.get(r.getLong(0)).contains(r.getLong(2))).length
    val fullHits = rows.count(_._3 > 0L)
    assert(coarseHits <= fullHits, "more probes can only add hits")
  }

  test("knnGraph: contiguous ranks, cosine-ordered neighbors, symmetric candidates") {
    import graft.similarity.Ann
    val rows = Ann.knnGraph(embeddings, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // ranks are contiguous 1..m per source (no gaps from the window+filter)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq, s"ranks for $src")
      assert(rs.length <= 3)
    }
    // candidate generation is symmetric (same-bucket ⇒ both directions),
    // so a rank-1 edge's reverse must at least be a candidate: if b is
    // a's best neighbor, a appears among b's rows OR b has k closer ones
    val bySrc = rows.groupBy(_._1)
    val vecs = embeddings.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (vecs(a), vecs(b))
      var d = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < x.length) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      d / math.sqrt(nx * ny)
    }
    // neighbors are cosine-ordered within each source
    bySrc.foreach { case (src, rs) =>
      val byRank = rs.sortBy(_._2).map(_._3).toSeq
      byRank.sliding(2).foreach { w =>
        if (w.length == 2)
          assert(cos(src, w(0)) >= cos(src, w(1)), s"order at $src")
      }
    }
    rows.find(_._2 == 1L).foreach { case (a, _, b) =>
      val bRows = bySrc.getOrElse(b, Array.empty)
      assert(bRows.exists(_._3 == a) || bRows.length == 3,
        s"reverse edge ($b,$a) missing though candidates are symmetric")
    }
  }

  test("neighborhoodGate: exact radius-r out-balls; sketch verdict holds") {
    import graft.graph.GraphOps
    // chain a→b→c→d: radius-2 balls are {a,b,c}, {b,c,d}, {c,d}, {d}
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val m = GraphOps.neighborhoodGate(edges, radius = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m == Map("a" -> (3L, 1L), "b" -> (3L, 1L), "c" -> (2L, 1L), "d" -> (1L, 1L)),
      s"got $m")
    // radius 0 is the singleton ball
    val z = GraphOps.neighborhoodGate(edges, radius = 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(z.values.forall(_ == 1L))
  }

  test("weakComponents: islands resolve through hashed host ids; direction ignored") {
    import graft.graph.GraphOps
    import graft.functions.PortableHash
    val edges = Seq(
      ("a.com", "b.com"), ("b.com", "c.com"), // island 1 (chain)
      ("x.org", "y.org"),                     // island 2
      ("z.net", "z2.net"), ("z2.net", "z.net")) // island 3 (both directions)
      .toDF("src", "dst")
    val rows = GraphOps.weakComponents(edges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size == 7, s"every host gets a row: $rows")
    val c1 = Seq("a.com", "b.com", "c.com").map(rows).distinct
    val c2 = Seq("x.org", "y.org").map(rows).distinct
    val c3 = Seq("z.net", "z2.net").map(rows).distinct
    assert(c1.size == 1 && c2.size == 1 && c3.size == 1, "islands are single components")
    assert(Set(c1.head, c2.head, c3.head).size == 3, "islands stay separate")
    // the component label is the min hashed id of its members
    assert(c1.head == Seq("a.com", "b.com", "c.com")
      .map(PortableHash.jvmMd5Long60).min)
  }

  test("perceptual pairs feed the shared dedup-apply path: keeper survives") {
    val frameA = "a" * 30 + "b" * 30
    val frameB = "a" * 30 + "b" * 29 + "a"
    val docs = Seq(
      (1L, frameA + "x" * 40), (2L, frameB + "y" * 40), (3L, "q" * 9))
      .toDF("doc_id", "text")
    val media = graft.multimodal.Multimodal.asMedia(docs)
    val survivors = Dedup.survivorsFromComponents(media,
      Dedup.connectedComponents(
        graft.multimodal.Multimodal.perceptualDupPairs(media)
          .select(col("a"), col("b"))))
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 3L), s"got $survivors") // 2 collapses into 1
  }

  test("applyMediaDedup keeps the cluster keeper and untouched docs only") {
    val a100 = "a" * 100
    val docs = Seq(
      (1L, a100 + "b" * 100), // shares frame 0 with doc 2 → keeper (min id)
      (2L, a100 + "c" * 100), // duplicate of 1's frame → dropped
      (3L, "z" * 150))        // no shared frame → survives
      .toDF("doc_id", "text")
    val survivors = graft.multimodal.Multimodal
      .applyMediaDedup(graft.multimodal.Multimodal.asMedia(docs))
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 3L), s"got $survivors")
  }

  test("trainValTestSplit: hash-stable, exhaustive, stratum counts sum to corpus") {
    val rows = TextAnalysis.trainValTestSplit(docs).collect()
    assert(rows.map(_.getLong(3)).sum == docs.count(), "every doc lands in one stratum")
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    // reproducible: the assignment is a pure function of doc_id
    val again = TextAnalysis.trainValTestSplit(docs).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    intercept[IllegalArgumentException] {
      TextAnalysis.trainValTestSplit(docs, trainPct = 95, valPct = 5)
    }
  }

  test("shardPacking: contiguous shards, boundary never splits a doc") {
    val d = Seq((1L, "a b c"), (2L, "d e f"), (3L, "g h i"))
      .toDF("doc_id", "text")
    // exclusive cumsums 0,3,6 against budget 5 → doc 3 starts shard 1
    val shards = TextAnalysis.shardPacking(d, budget = 5L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(shards(0L) == (2L, 6L, 1L, 2L), s"shard 0: $shards")
    assert(shards(1L) == (1L, 3L, 3L, 3L), s"shard 1: $shards")
  }

  test("bm25TopK: rare-term idf dominates; tf and length normalization order as expected") {
    val d = Seq(
      (1L, "rare common common"),
      (2L, "rare common common filler filler filler filler filler"),
      (3L, "common common common common"),
      (4L, "common filler"),
      (5L, "filler filler")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(d, Seq("rare", "common"), k = 10).collect()
    val score = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!score.contains(5L), "non-matching docs never surface")
    // idf: the rare term (df=2) outweighs any pile-up of the common one (df=4)
    assert(score(1L) > score(3L) && score(2L) > score(3L))
    // length normalization: identical query-term counts, shorter doc wins
    assert(score(1L) > score(2L))
    // result order is (score desc, doc_id asc)
    assert(out.map(_.getLong(1)).toSeq ==
      out.map(_.getLong(1)).toSeq.sorted(Ordering[Long].reverse))
    assert(TextAnalysis.bm25TopK(d, Seq("common"), k = 2).count() == 2)
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopK(d, Seq("a", "a"))
    }
  }

  test("bm25Batch: per-query top-k, batch ≡ single-query scoring order") {
    val d = Seq(
      (1L, "rare common common"),
      (2L, "rare common common filler filler filler filler filler"),
      (3L, "common common common common"),
      (4L, "common filler"),
      (5L, "filler filler")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Batch(d,
      Seq(1L -> "rare common", 2L -> "filler"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // query 1: docs without rare/common never surface
    assert(!out.contains((1L, 5L)))
    // rare-term weight dominates (idf surrogate is monotone in df), and
    // length normalization breaks the doc-1 vs doc-2 tie
    val q1 = out.collect { case ((1L, doc), (score, _)) => doc -> score }.toMap
    assert(q1(1L) > q1(3L) && q1(2L) > q1(3L) && q1(1L) > q1(2L))
    // query 2 is scored independently: filler docs rank, doc 3 absent
    assert(out.contains((2L, 5L)) && !out.contains((2L, 3L)))
    // ranks are 1..n dense per query
    val ranks1 = out.collect { case ((1L, _), (_, r)) => r }.toSeq.sorted
    assert(ranks1 == (1L to ranks1.length))
    // duplicate terms within one query text collapse (score once)
    val dup = TextAnalysis.bm25Batch(d, Seq(9L -> "rare rare"), k = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val single = TextAnalysis.bm25Batch(d, Seq(9L -> "rare"), k = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(dup == single)
  }

  test("budgetSample: exact min(k, n) per stratum, deterministic, composable coordinate") {
    val out = TextAnalysis.budgetSample(docs, k = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val perStratum = out.groupBy(t => (t._1, t._2))
    perStratum.foreach { case (s, rows) =>
      val n = rows.head._5
      assert(rows.length == math.min(3L, n), s"stratum $s: ${rows.length} of $n")
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length), s"ranks dense in $s")
    }
    // deterministic rerun
    val again = TextAnalysis.budgetSample(docs, k = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.sortBy(_.toString).sameElements(again.sortBy(_.toString)))
    // k larger than every stratum → the whole corpus comes back
    assert(TextAnalysis.budgetSample(docs, k = 100000).count() == docs.count())
    // nested budgets: the k=3 picks are exactly the first 3 of the k=5
    // picks (one corpus-wide coordinate, not a fresh draw per k)
    val five = TextAnalysis.budgetSample(docs, k = 5).collect()
      .filter(_.getLong(3) <= 3)
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.sortBy(_.toString).sameElements(five.sortBy(_.toString)))
  }

  test("urlDedup: variants collapse to one canonical URL, min-doc keeper") {
    val d = Seq(
      (10L, "https://www.a.com/x/?utm_source=z"),
      (11L, "HTTPS://A.com:443/x"),
      (12L, "https://a.com//x"),
      (20L, "http://b.org/y#frag"),
      (30L, "not a url"))
      .toDF("doc_id", "url")
    val out = Dedup.urlDedup(d, col("url")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      "https://a.com/x" -> (3L, 10L),
      "http://b.org/y" -> (1L, 20L)), s"got $out")
  }

  test("boilerplateScrub: frequent chunks removed everywhere, order kept, empty survivor") {
    val d = Seq(
      (1L, "b1 b2 u1 u2"),
      (2L, "b1 b2 u3 u4"),
      (3L, "b1 b2"),
      (4L, "u5 u6 u7"),
      (5L, "u8 u9 b1 b2 u0 u1")
    ).toDF("doc_id", "text")
    // "b1 b2" occurs 4× > maxFreq=1 → scrubbed from every doc
    val out = TextAnalysis.boilerplateScrub(d, chunkTokens = 2, maxFreq = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("u1 u2", 1L, 1L)))
    assert(out(2L) == (("u3 u4", 1L, 1L)))
    assert(out(3L) == (("", 0L, 1L)), "fully-boilerplate doc survives with empty text")
    assert(out(4L) == (("u5 u6 u7", 2L, 0L)), "clean doc (incl. short tail chunk) untouched")
    assert(out(5L) == (("u8 u9 u0 u1", 2L, 1L)), "survivors rejoin in original order")
    assert(out.size == 5)
    // threshold is strict: 4 occurrences survive maxFreq=4
    val kept = TextAnalysis.boilerplateScrub(d, chunkTokens = 2, maxFreq = 4)
    assert(kept.where(col("doc_id") === 3L).head().getString(1) == "b1 b2")
  }

  test("containmentPairs maxDocFreq drops hot-shingle candidates, keeps true dups") {
    // ten docs share ONE hot phrase; 11/12 are a true duplicate pair;
    // 13 is exactly the hot phrase (fully contained in everything)
    val hot = "x y z"
    val base = (1L to 10L).map(i => (i, s"$hot u$i v$i w$i"))
    val docs = (base ++ Seq(
      (11L, "a b c d e f"), (12L, "a b c d e f"), (13L, hot)))
      .toDF("doc_id", "text")
    val exact = Dedup.containmentPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact finds the true dup AND doc 13 contained in docs 1-10
    assert(exact.contains((11L, 12L)))
    assert((1L to 10L).forall(i => exact.contains((i, 13L))))
    // cap at 5: the hot shingle (df=11) leaves the index — its O(df²)
    // candidates vanish; the true-dup pair (private shingles, df=2) stays
    val capped = Dedup.containmentPairs(docs, maxDocFreq = Some(5L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((11L, 12L)), s"capped: $capped")
    // the cap only prunes candidate discovery — never invents pairs
    assert(capped.subsetOf(exact))
  }

  test("snapshotDiff is EXCEPT by content, not by id") {
    val a = Seq((1L, "same text"), (2L, "only in a"), (3L, "shared dup"))
      .toDF("doc_id", "text")
    val b = Seq((10L, "same text"), (11L, "shared dup"), (12L, "only in b"))
      .toDF("doc_id", "text")
    val diff = Dedup.snapshotDiff(a, b).collect().map(_.getString(0)).toSet
    val md5OnlyInA = graft.functions.PortableHash
    // exactly one digest survives: "only in a"
    assert(diff.size == 1)
    val expected = a.where(col("doc_id") === 2)
      .select(md5OnlyInA.md5Hex(col("text"))).head().getString(0)
    assert(diff == Set(expected))
    // symmetric direction picks up b's unique content
    assert(Dedup.snapshotDiff(b, a).count() == 1)
    // identical snapshots diff to empty
    assert(Dedup.snapshotDiff(a, a).count() == 0)
  }

  test("mixtureRollup grouping levels: detail=0, lang subtotal=1, grand total=3") {
    val t = Seq(
      ("en", "s1", "w w w"), ("en", "s2", "w w"), ("de", "s1", "w"))
      .toDF("lang", "source", "text")
    val rows = TextAnalysis.mixtureRollup(t).collect()
    val byLevel = rows.groupBy(_.getLong(rows.head.length - 1).toInt)
    assert(byLevel(0).length == 3) // (en,s1), (en,s2), (de,s1)
    assert(byLevel(1).length == 2) // en, de subtotals
    assert(byLevel(3).length == 1) // grand total
    val grand = byLevel(3).head
    assert(grand.getLong(2) == 3L) // n_docs
    assert(grand.getLong(3) == 6L) // n_tokens: 3 + 2 + 1
    // subtotal row for en aggregates its two sources
    val en = byLevel(1).find(_.getString(0) == "en").get
    assert(en.getLong(2) == 2L && en.getLong(3) == 5L)
  }

  test("lengthQuantiles picks the lower discrete quantile per group") {
    // lang x: lengths 1..10 (texts of i chars) → p50 rank floor(9*.5)+1=5
    val t = (1 to 10).map(i => ("x", "a" * i)).toDF("lang", "text")
    val q = TextAnalysis.lengthQuantiles(t, psPpm = Seq(500000L, 900000L, 990000L))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(q(500000L) == 5L)  // rank 5 of 1..10
    assert(q(900000L) == 9L)  // floor(9*.9)+1 = 9
    assert(q(990000L) == 9L)  // floor(9*.99)+1 = 9
    // duplicates: histogram ranges cover ties correctly
    val dup = Seq.fill(4)(("y", "aa")).++(Seq(("y", "aaaa"))).toDF("lang", "text")
    val qd = TextAnalysis.lengthQuantiles(dup, psPpm = Seq(500000L))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(qd(500000L) == 2L) // rank floor(4*.5)+1=3 of [2,2,2,2,4]
  }

  test("promoRevenueShare: ratio is truncating integer ppm of one aggregate") {
    val part = Seq((1L, "PROMO"), (2L, "OTHER")).toDF("p_partkey", "p_type")
    val li = Seq(
      (1L, "1997-09-10", 2.00, 0.00), // promo: 200 cents, no discount
      (2L, "1997-09-20", 4.00, 0.00), // other: 400 cents
      (1L, "1998-01-01", 99.0, 0.00)) // outside window — excluded
      .toDF("l_partkey", "d", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", col("d").cast("timestamp"))
    val r = graft.relational.Relational.promoRevenueShare(part, li).head()
    assert(r.getLong(0) == 200L * 100)        // promo cpct
    assert(r.getLong(1) == 600L * 100)        // total cpct
    assert(r.getLong(2) == 333333L)           // 20000*1e6 div 60000
  }

  test("disjunctiveRevenue: per-branch bands bind jointly, not as separate hulls") {
    val part = Seq(
      (1L, "Brand#13", 5),   // branch-1 part
      (2L, "Brand#19", 20),  // branch-2 part
      (3L, "Brand#13", 40))  // size inside the HULL but outside branch 1's band
      .toDF("p_partkey", "p_brand", "p_size")
    val li = Seq(
      (1L, 5.0, 2.00, 0.00),   // branch 1 ✓ → 200c·100
      (1L, 15.0, 99.0, 0.00),  // qty in hull, but no single branch matches ✗
      (2L, 15.0, 3.00, 0.10),  // branch 2 ✓ → 300c·90
      (3L, 5.0, 99.0, 0.00),   // part 3: size escapes every branch ✗
      (1L, 40.0, 99.0, 0.00))  // qty outside the hull entirely ✗
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val r = graft.relational.Relational.disjunctiveRevenue(part, li).head()
    assert(r.getLong(0) == 200L * 100 + 300L * 90, s"revenue: $r")
    assert(r.getLong(1) == 2L, s"n_lines: $r")
  }

  test("latenessPriorityMatrix: per-line counts, both from one pass") {
    val orders = Seq(
      (1L, "1997-01-01", "1-URGENT"),
      (2L, "1997-01-01", "5-LOW"),
      (3L, "1997-06-01", "2-HIGH"))
      .toDF("o_orderkey", "d", "o_orderpriority")
      .withColumn("o_orderdate", col("d").cast("timestamp"))
    val li = Seq(
      (1L, "A", "1997-05-01"),  // 120 days late, urgent → high under A
      (2L, "A", "1997-05-01"),  // late, low priority → low under A
      (3L, "A", "1997-06-15"),  // only 14 days late → excluded
      (1L, "R", "1997-03-15"),  // 73 days late, urgent → high under R
      (1L, "A", "1998-06-01"))  // outside the shipdate window → excluded
      .toDF("l_orderkey", "l_returnflag", "d")
      .withColumn("l_shipdate", col("d").cast("timestamp"))
    val rows = graft.relational.Relational.latenessPriorityMatrix(orders, li)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows == Map("A" -> (1L, 1L), "R" -> (1L, 0L)), s"got $rows")
  }

  test("largeOrders keeps only orders above the quantity HAVING bound") {
    val li = Seq(
      (1L, 100.0), (1L, 200.0), // order 1: 300 > 250 ✓
      (2L, 50.0))               // order 2: 50 ✗
      .toDF("l_orderkey", "l_quantity")
    val orders = Seq((1L, 7L, "1997-01-01"), (2L, 8L, "1997-01-02"))
      .toDF("o_orderkey", "o_custkey", "d")
      .withColumn("o_orderdate", col("d").cast("timestamp"))
    val cust = Seq((7L, "alice"), (8L, "bob")).toDF("c_custkey", "c_name")
    val out = graft.relational.Relational.largeOrders(cust, orders, li, minQty = 250)
      .collect()
    assert(out.length == 1 && out.head.getAs[Long]("orderkey") == 1L)
    assert(out.head.getAs[Long]("total_qty") == 300L)
  }

  test("GIF multi-frame: sequence round-trip is lossless; corrupt degrades") {
    import graft.multimodal.Multimodal
    // 3 frames, 10×8 gray; frame k pixel (x,y) = (k*50 + y*10 + x) % 256
    val bytes = Multimodal.syntheticGrayGif(10, 8, 3, (k, x, y) => (k * 50 + y * 10 + x) % 256)
    val frames = Multimodal.gifFramesOf(7L, bytes, maxFrames = 8)
    assert(frames.map(f => (f.n_frames, f.frame_idx)) ==
      Seq((3L, 0L), (3L, 1L), (3L, 2L)))
    // per-frame aHash must equal the pure-formula hash (lossless palette)
    def formulaHash(k: Int): Long = {
      val lumas = (0 until 60).map(i => ((k * 50 + i) % 256).toLong)
      val mean = lumas.sum / 60
      lumas.foldLeft(0L)((acc, l) => acc * 2 + (if (l > mean) 1L else 0L))
    }
    frames.foreach(f => assert(f.ahash.contains(formulaHash(f.frame_idx.toInt)),
      s"frame ${f.frame_idx}: ${f.ahash} vs ${formulaHash(f.frame_idx.toInt)}"))
    // maxFrames caps emitted rows but reports the true container count
    val capped = Multimodal.gifFramesOf(7L, bytes, maxFrames = 2)
    assert(capped.length == 2 && capped.forall(_.n_frames == 3L))
    // corrupt payload → one permissive row
    val bad = Multimodal.gifFramesOf(9L, Array[Byte](1, 2, 3), maxFrames = 8)
    assert(bad == Seq(Multimodal.GifFrame(9L, 0L, -1L, None)))
  }

  test("dominantSuppliers: integer share threshold, counts per supplier") {
    val part = Seq((1L, "PROMO"), (2L, "PROMO"), (3L, "OTHER")).toDF("p_partkey", "p_type")
    val supplier = Seq((7L, "S7"), (8L, "S8"), (9L, "S9")).toDF("s_suppkey", "s_name")
    val li = Seq(
      (1L, 7L, 30.0), (1L, 8L, 10.0), // part 1: S7 has 3/4 (> 1/2), S8 1/4 (not > 1/4)
      (2L, 7L, 10.0), (2L, 8L, 10.0), // part 2: both exactly 1/2 (> 1/4 each)
      (3L, 9L, 99.0))                 // OTHER-type part: filtered out entirely
      .toDF("l_partkey", "l_suppkey", "l_quantity")
    val out = graft.relational.Relational
      .dominantSuppliers(supplier, part, li, shareDenom = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // S7 dominates parts 1 and 2 at the quarter bar; S8 only part 2
    // (10*4 = 40 == t_qty for part 1 — strict > excludes the boundary)
    assert(out == Set((7L, "S7", 2L), (8L, "S8", 1L)), s"got $out")
  }

  test("semDedup: greedy keep-first prune inside cells; survivors verified") {
    import graft.similarity.Ann
    // seeds (k=2) are ids 0 and 1 — one per direction, so each dup group
    // lands in one cell and the greedy keep-first rule prunes it to its
    // lowest id
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),    // x-direction seed/keeper
      (1L, Array(0.0f, 0.0f, 1.0f, 0.0f)),    // z-direction seed/keeper
      (2L, Array(0.999f, 0.01f, 0.0f, 0.0f)), // ~1.0 cos to id 0 → dropped
      (3L, Array(0.98f, 0.17f, 0.0f, 0.0f)),  // cos to id 0 ≈ 0.985 → dropped
      (4L, Array(0.0f, 0.0f, 0.97f, 0.2f)))   // cos to id 1 ≈ 0.979 → dropped
      .toDF("vec_id", "embedding")
    val out = Ann.semDedupSurvivors(vecs, k = 2, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L) == 0L && out(1L) == 1L) // each survives in its own cell
    // determinism: same survivors on a rerun
    val again = Ann.semDedupSurvivors(vecs, k = 2, tau = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(again == out.keySet)
  }

  test("temperatureSample: alpha=0.5 flattens the mix; rates and kept are sane") {
    val out = TextAnalysis.temperatureSample(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (enDocs, enShare, enRate, enKept) = out("en")
    val (zhDocs, zhShare, zhRate, zhKept) = out("zh")
    // en is the head language in this corpus; temperature sampling gives
    // the tail a HIGHER per-doc rate than the head
    assert(enShare > zhShare && enRate < zhRate,
      s"expected head-flattening: en=$enShare@$enRate zh=$zhShare@$zhRate")
    out.foreach { case (lang, (n, share, rate, kept)) =>
      assert(rate >= 0L && rate <= 1000000L, s"$lang rate $rate")
      assert(kept <= n, s"$lang kept $kept > n $n")
      assert(share >= 0L && share <= 1000000L)
      // the md5 draw tracks the rate within a loose tolerance on n≥50 docs
      if (n >= 50) assert(math.abs(kept.toDouble / n - rate / 1e6) < 0.2,
        s"$lang kept=$kept n=$n rate=$rate")
    }
  }

  test("bpePairStats: pair counts weighted by word frequency, tie-broken by pair") {
    val tiny = Seq((1L, "abab abab xy"), (2L, "abab")).toDF("doc_id", "text")
    // vocabulary: abab ×3 (pairs ab, ba, ab → ab:2/word), xy ×1
    val rows = TextAnalysis.bpePairStats(tiny, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.head == ("ab", 6L), s"got ${rows.toSeq}") // 2 per word × 3 words
    assert(rows.toMap == Map("ab" -> 6L, "ba" -> 3L, "xy" -> 1L))
    // ordering: cnt desc then pair asc
    assert(rows.map(_._1).toSeq == Seq("ab", "ba", "xy"))
  }

  test("dsirLambda + stream scoring: unseen docs score via the broadcast model") {
    import graft.streaming.StreamingText
    val a = "alpha beta gamma delta epsilon zeta"
    val b = "one two three four five six"
    val train = Seq((1L, a, "en"), (2L, a, "en"), (3L, b, "de"), (4L, b, "de"))
      .toDF("doc_id", "text", "lang")
    val lam = TextAnalysis.dsirLambda(train)
    assert(lam.length == 1024)
    // scoring is a pure projection usable on ANY frame — here a batch
    // stand-in for the stream, including a doc the model never saw
    val fresh = Seq((10L, a), (11L, b), (12L, "alpha beta unseen pair"))
      .toDF("doc_id", "text")
    val rows = StreamingText.dsirScoreStream(fresh, lam)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(10L)._2 > rows(11L)._2,
      s"target-vocabulary doc must outscore: $rows")
    // unseen bigrams hit absent buckets, which carry the all-smoothing
    // base ratio — defined, not an error
    assert(rows.contains(12L))
    // parity with the batch operator on the training corpus itself
    val batch = TextAnalysis.dsirScore(train)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = StreamingText.dsirScoreStream(
      train.select(col("doc_id"), col("text")), lam)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch, s"$streamed vs $batch")
  }

  test("dsirScore: target-like docs outrank off-target; scores are integer bits") {
    // target slice (en) speaks vocabulary A; the off-target slice speaks B.
    // A held-out en-vocabulary doc must outscore a B-vocabulary doc of the
    // same length, because its buckets carry positive target-vs-raw ratios.
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight"
    val corpus = Seq(
      (1L, a, "en"), (2L, a, "en"), (3L, a, "en"),
      (4L, b, "de"), (5L, b, "de"), (6L, b, "de"),
      (7L, a, "fr"), // en-vocabulary doc outside the target slice
      (8L, b, "fr")) // off-vocabulary doc of identical length
      .toDF("doc_id", "text", "lang")
    val rows = TextAnalysis.dsirScore(corpus)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(7L)._1 == rows(8L)._1, "same bigram count by construction")
    assert(rows(7L)._2 > rows(8L)._2,
      s"target-vocabulary doc must outscore: ${rows(7L)} vs ${rows(8L)}")
    // single-token docs have no bigrams and drop out (jq empty-stream rule)
    val tiny = Seq((1L, "solo", "en")).toDF("doc_id", "text", "lang")
    assert(TextAnalysis.dsirScore(tiny).count() == 0)
  }

  test("animationDupPairs: shared-frame animations pair at set Jaccard; strangers don't") {
    import graft.multimodal.Multimodal
    // three 2-frame animations: 1 and 2 share frame A (Jaccard 1/3 with
    // their distinct frames), 3 shares nothing
    def gif(seedShared: Option[Long], seedOwn: Long) =
      Multimodal.syntheticGrayGif(8, 8, 2, (k, x, y) => {
        val seed = if (k == 0) seedShared.getOrElse(seedOwn + 500) else seedOwn
        val t = seed % 65521L + (y * 8 + x) * 31L
        ((t * t % 65521L) % 256L).toInt
      })
    val media = Seq(
      (1L, gif(Some(42L), 100L)), (2L, gif(Some(42L), 200L)),
      (3L, gif(None, 300L)))
      .toDF("doc_id", "media").withColumn("media_type", lit("video"))
    val frames = Multimodal.decodeGifFrames(media).toDF()
    val pairs = Multimodal.animationDupPairs(frames, tauPpm = 300000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 2L)), s"only the sharing pair: $pairs")
    assert(pairs((1L, 2L)) == 333333L, s"1 shared of 3 distinct hashes: $pairs")
  }

  test("editVerifiedPairs: exact edit verify keeps char-near pairs, drops gram-near-only") {
    // (1, 2): one inserted character — gram-near AND char-near, must
    // survive with lev_edits exactly 1 and the exact relative sim_ppm.
    // (10, 11): doc 11 = doc 10 + one 150-char token — gram sets are
    // nearly nested (J ≈ 0.97, a certain LSH candidate; a merely-similar
    // pair would be fragile here, the h1+i·h2 slots are correlated in i)
    // but char similarity is exactly 151/301 insertions ≈ 50% < 80%, so
    // the verify stage must drop it.
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val edited = base.replace(" word7 ", " word7x ")
    val prefix = (1 to 40).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, edited),
      (10L, prefix), (11L, s"$prefix ${"z" * 150}"),
      (20L, (1 to 40).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val kept = Dedup.editVerifiedPairs(docs, numHashes = 64, bands = 64)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(kept.contains((1L, 2L)), "the one-edit pair must survive the verify")
    val (lev, maxLen, simPpm) = kept((1L, 2L))
    assert(lev == 1L, s"one inserted char is exactly 1 edit, got $lev")
    assert(maxLen == edited.length.toLong)
    assert(simPpm == (maxLen - 1L) * 1000000L / maxLen)
    assert(!kept.contains((10L, 11L)), "gram-near-only pair must be dropped at 80%")
    // at simTauPpm=0 the same pair IS a candidate and carries its exact
    // distance — proving it was the verify, not candidate recall, that
    // dropped it above
    val all = Dedup.editVerifiedPairs(docs, numHashes = 64, bands = 64,
        simTauPpm = 0L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(5))).toMap
    assert(all.contains((10L, 11L)), "prefix-sharing pair must be an LSH candidate")
    assert(all((10L, 11L)) == (301L - 151L) * 1000000L / 301L,
      "151 pure insertions over max_len 301: the exact relative similarity")
  }

  test("sceneChanges: exact L1 cuts at the shot boundary; degenerate payloads emit nothing") {
    import graft.multimodal.Multimodal
    // 4 frames, 2 shots of 2: shots are flat gray 10 vs 200; each frame
    // adds +1 at pixel k — consecutive same-shot distance is exactly 2
    // (pixels k−1 and k each differ by 1), the boundary jumps by
    // 190·64 ± the jitter pixels
    val gif = Multimodal.syntheticGrayGif(8, 8, 4, (k, x, y) => {
      val i = y * 8 + x
      (if (k < 2) 10 else 200) + (if (i == k) 1 else 0)
    })
    val single = Multimodal.syntheticGrayGif(8, 8, 1, (_, _, _) => 50)
    val media = Seq(
      (1L, gif), (2L, single), (3L, Array[Byte](9, 9, 9))
    ).toDF("doc_id", "media").withColumn("media_type", lit("video"))
    val cuts = Multimodal.sceneChanges(media, threshold = 1000L)
      .collect().map(c => (c.doc_id, c.frame_idx) -> (c.l1_dist, c.is_cut)).toMap
    assert(cuts.keySet == Set((1L, 1L), (1L, 2L), (1L, 3L)),
      "single-frame and corrupt payloads must emit no pair rows")
    assert(cuts((1L, 1L)) == (2L, 0L) && cuts((1L, 3L)) == (2L, 0L))
    // boundary: 62 pixels jump 190, pixel 1 jumps |11-200|=189, pixel 2
    // jumps |10-201|=191 → total 64·190 exactly
    assert(cuts((1L, 2L)) == (64L * 190L, 1L))
  }

  test("trustRank: trust flows forward from seeds only; all-seeds ≡ pageRank") {
    import graft.graph.GraphOps
    // chain s → a → b plus c → s: c links INTO the seed but gets no
    // trust back (teleport is seed-only, links are directed)
    val edges = Seq(("s", "a"), ("a", "b"), ("c", "s")).toDF("src", "dst")
    val seeds = Seq("s").toDF("host")
    val tr = GraphOps.trustRank(edges, seeds, iterations = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // d=1 ⇒ r0=10^12, base=1.5e11; round 2: a = (1.5e11·.85),
    // b = (8.5e11·.85), s keeps its teleport base, c never earns a unit
    assert(tr == Map("s" -> 150000000000L, "a" -> 127500000000L,
      "b" -> 722500000000L, "c" -> 0L), s"got $tr")
    // seeding EVERY host reproduces pageRank bit-for-bit (same per-edge
    // truncating division, same teleport mass)
    val allHosts = edges.select(col("src").as("host"))
      .unionAll(edges.select(col("dst").as("host"))).distinct()
    val full = GraphOps.trustRank(edges, allHosts, iterations = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val pr = GraphOps.pageRank(edges, iterations = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(full == pr)
  }

  test("rangeSearch: all-and-only neighbors within the cosine budget; query excluded") {
    import graft.similarity.Ann
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),   // query
      (1L, Array(2.0f, 0.0f)),   // cos 1 (norms divide out)
      (2L, Array(1.0f, 1.0f)),   // cos ~0.7071
      (3L, Array(0.0f, 1.0f)),   // cos 0
      (4L, Array(-1.0f, 0.0f))   // cos -1
    ).toDF("vec_id", "embedding")
    def ids(tau: Double) =
      Ann.rangeSearch(vecs, col("vec_id") === 0L, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids(0.5) == Set((0L, 1L), (0L, 2L)))
    assert(ids(0.9) == Set((0L, 1L)))
    assert(ids(-2.0) == Set((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)),
      "tau below -1 returns the whole corpus minus the query itself")
  }

  test("zOrderPruning: hand-computed Morton codes, envelopes, and skip verdicts") {
    import graft.relational.Relational
    // cents>>6 gives y: value 0.64 → cents 64 → y 1; value 0.01 → y 0.
    // Morton: (x=3,y=1)→0b0111=7, (x=2,y=1)→0b0110=6, (x=3,y=0)→0b0101=5.
    // Null dimension rows carry no layout position and must vanish.
    val events = Seq(
      (3L, Some(0.64)), (2L, Some(0.64)), (3L, Some(0.01)),
      (7L, None) // null value → excluded
    ).map { case (u, v) => (u, v.map(Double.box).orNull) }
      .toDF("user_id", "value")
    val raw = Relational.zOrderPruning(events, bucketShift = 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(raw.keySet == Set(7L, 6L, 5L), s"Morton codes off: ${raw.keySet}")
    assert(raw(7L) == (1L, 3L, 1L)) // n_rows, min_x, min_y
    // default probe box x∈[40,47]: every bucket here has max_x ≤ 3 → skip
    assert(Relational.zOrderPruning(events, bucketShift = 0)
      .collect().forall(_.getAs[Long]("skip_probe") == 1L))
    // z-locality: at bucketShift=2 all three rows share ONE bucket whose
    // envelope is tight on BOTH dims — the property x-sorting alone loses
    val coarse = Relational.zOrderPruning(events, bucketShift = 2).collect()
    assert(coarse.length == 1 && coarse.head.getLong(0) == 1L)
    assert((coarse.head.getLong(2), coarse.head.getLong(3),
      coarse.head.getLong(4), coarse.head.getLong(5)) == (2L, 3L, 0L, 1L))
  }

  test("zOrder layout: REAL parquet footer stats imply exactly the skip verdicts") {
    import graft.relational.Relational
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    // the h25 loop closed from analytic verdicts to ACTUAL files: write
    // the z-ordered frame one file per bucket (per-file column stats =
    // per-bucket envelopes), read the footers back with the real parquet
    // reader, and the stats-implied skip set must equal the verdict
    // column bucket for bucket. Box chosen so BOTH classes occur at
    // sf0.001 (the default box skips all 27 buckets here).
    val (bxMin, bxMax, byMin, byMax) = (0L, 15L, 0L, 15L)
    val ev = Tables.events(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toFile
    val out = dir.getAbsolutePath + "/layout"
    Relational.zOrderAssign(ev)
      .withColumnRenamed("__x", "x").withColumnRenamed("__y", "y")
      .repartition(col("bucket"))
      .write.partitionBy("bucket").parquet(out)
    val verdicts = Relational.zOrderPruning(ev,
        boxXMin = bxMin, boxXMax = bxMax, boxYMin = byMin, boxYMax = byMax)
      .collect().map(r => r.getLong(0) -> (r.getLong(6) == 1L)).toMap
    assert(verdicts.values.exists(identity) && verdicts.values.exists(!_),
      s"box must split the buckets: $verdicts")
    val conf = spark.sparkContext.hadoopConfiguration
    val statSkip = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("bucket=")).map { bd =>
        val b = bd.getName.stripPrefix("bucket=").toLong
        val files = bd.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"bucket $b: one file expected, got ${files.length}")
        val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(files.head.getAbsolutePath), conf))
        try {
          import scala.jdk.CollectionConverters._
          def env(name: String): (Long, Long) = {
            val ss = rdr.getFooter.getBlocks.asScala.map(_.getColumns.asScala
              .find(_.getPath.toDotString == name).get.getStatistics)
            (ss.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
              ss.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max)
          }
          val ((minX, maxX), (minY, maxY)) = (env("x"), env("y"))
          b -> (minX > bxMax || maxX < bxMin || minY > byMax || maxY < byMin)
        } finally rdr.close()
      }.toMap
    assert(statSkip == verdicts,
      s"file stats and analytic verdicts disagree: $statSkip vs $verdicts")
    // and a probe-box reader actually pushes the filters to the scan
    val read = spark.read.parquet(out).where(
      col("x") >= bxMin && col("x") <= bxMax &&
        col("y") >= byMin && col("y") <= byMax)
    val ex = read.queryExecution.executedPlan.toString
    assert(ex.contains("PushedFilters") && ex.contains("GreaterThanOrEqual(x,0)"), ex.take(600))
    // row parity: the filtered scan returns exactly the in-box rows
    val expected = Relational.zOrderAssign(ev)
      .where(col("__x").between(bxMin, bxMax) && col("__y").between(byMin, byMax))
      .count()
    assert(read.count() == expected)
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("ivfRangeSearch: probe-bounded subset of exact range; unprobed cell costs recall") {
    import graft.similarity.Ann
    // centroids at %25: c0=[1,0] (also the %50 query), c25=[0,1].
    // id 1 lives in cell 0 (found at any nprobe); id 2 leans toward c25
    // (cell 25) while still within τ=0.5 of the query — the true
    // neighbor nprobe=1 must miss and nprobe=2 must recover
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (25L, Array(0.0f, 1.0f)),
      (1L, Array(1.0f, 0.1f)), (2L, Array(0.7f, 0.9f))
    ).toDF("vec_id", "embedding")
    val q = col("vec_id") % 50 === 0
    def recall(np: Int): (Long, Long) = {
      val r = Ann.recallAtK(
        Ann.rangeSearch(vecs, q, tau = 0.5),
        Ann.ivfRangeSearch(vecs, q, tau = 0.5, nprobe = np)).collect()
      assert(r.length == 1 && r.head.getLong(0) == 0L)
      (r.head.getLong(1), r.head.getLong(2))
    }
    assert(recall(1) == (1L, 500000L), "cell-25 neighbor missed at nprobe=1")
    assert(recall(2) == (2L, 1000000L), "second probe recovers full recall")
    // subset property on the real corpus: identical verify over fewer
    // candidates can only remove pairs
    val exact = Ann.rangeSearch(embeddings, col("vec_id") % 50 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.ivfRangeSearch(embeddings, col("vec_id") % 50 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.subsetOf(exact))
  }

  test("imageDupPairs: real-decode aHash pairs within Hamming, corrupt emits nothing") {
    import graft.multimodal.Multimodal
    // 10×6 two-level rasters: pixels ARE the hash bits. Doc 1 = base,
    // doc 2 = base with one bit flipped (Hamming 1), doc 3 = base with
    // three bits flipped (Hamming 3 > maxHamming 2 — candidate via the
    // shared chunks but dropped by the exact verify), doc 4 = corrupt.
    def png(flips: Set[Int]): Array[Byte] =
      Multimodal.syntheticGrayPng(10, 6, (x, y) => {
        val i = y * 10 + x
        val bit = if (i % 3 == 0) 1 else 0
        (if (flips.contains(i)) 1 - bit else bit) * 255
      })
    val media = Seq(
      (1L, png(Set.empty)), (2L, png(Set(7))), (3L, png(Set(10, 20, 31))),
      (4L, Array[Byte](1, 2, 3))
    ).toDF("doc_id", "media").withColumn("media_type", lit("image"))
    val pairs = Multimodal.imageDupPairs(media, maxHamming = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs == Map((1L, 2L) -> 1L),
      s"only the 1-flip pair is within Hamming 2, got $pairs")
    // at budget 3 the triple-flip doc pairs with base at exactly 3, and
    // with doc 2 at 4 (disjoint flips add) — still excluded
    val wide = Multimodal.imageDupPairs(media, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(wide((1L, 3L)) == 3L && !wide.contains((2L, 3L)))
  }

  test("linkPrediction: non-edges only, exact integer signals, hub cap trades recall") {
    import graft.graph.GraphOps
    // square a-b-c-d-a + diagonal edge a-c + pendant e-a (with one
    // duplicate and one reversed row: canonicalization must collapse
    // them). Non-adjacent pairs: (b,d) shares {a,c}; (b,e)/(c,e)/(d,e)
    // share {a}. (a,c) also shares {b,d} but IS an edge — must not emit.
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("a", "c"), ("e", "a"), ("b", "a"), ("a", "b")).toDF("src", "dst")
    val top = GraphOps.linkPrediction(edges).collect()
    assert(top.length == 1, s"only (b,d) has >= 2 common neighbors, got ${top.length}")
    val r = top.head
    assert((r.getString(0), r.getString(1)) == ("b", "d"))
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L && r.getLong(4) == 2L) // common, degs
    assert(r.getLong(5) == 2L && r.getLong(6) == 1000000L && r.getLong(7) == 4L)
    val loose = GraphOps.linkPrediction(edges, minCommon = 1L)
      .collect().map(x => ((x.getString(0), x.getString(1)), (x.getLong(2), x.getLong(6)))).toMap
    assert(loose.keySet == Set(("b", "d"), ("b", "e"), ("c", "e"), ("d", "e")))
    assert(loose(("b", "e")) == (1L, 500000L)) // union {a,c,... } sized 2
    assert(loose(("c", "e")) == (1L, 333333L)) // deg c = 3, truncating div
    assert(!loose.contains(("a", "c")), "adjacent pairs never emit")
    // hub cap 2 removes a (deg 4) and c (deg 3) as wedge intermediates;
    // every surviving wedge lands on the (a,c) edge — output is empty,
    // the documented recall trade
    assert(GraphOps.linkPrediction(edges, minCommon = 1L,
      maxWedgeDegree = Some(2L)).isEmpty)
  }

  test("minhashCalibration: exact dups read 1.0/1.0/err 0; err is |est−true|") {
    val span = (1 to 40).map(i => s"w$i").mkString(" ")
    val other = (1 to 40).map(i => s"v$i").mkString(" ")
    val corpus = Seq(
      (1L, span), (2L, span),   // identical: est = jaccard = 1e6
      (3L, other))              // unrelated: never a candidate
      .toDF("doc_id", "text")
    val rows = Dedup.minhashCalibration(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == Set((1L, 2L)), s"only the dup pair: $rows")
    assert(rows((1L, 2L)) == (1000000L, 1000000L, 0L), s"got $rows")
    // err is definitionally |est − jaccard| on every emitted pair
    val sf = Dedup.minhashCalibration(docs).collect()
    assert(sf.forall(r => r.getLong(4) == math.abs(r.getLong(2) - r.getLong(3))))
  }

  test("oovRate: tokens outside the top-k vocabulary count as OOV") {
    // "a" ×4 and "b" ×3 are the top-2; c/d are OOV at vocabSize=2
    val corpus = Seq(
      (1L, "a b a b"),
      (2L, "a a b c d"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.oovRate(corpus, vocabSize = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(1L) == (4L, 0L, 0L), s"doc 1 fully covered: $rows")
    assert(rows(2L) == (5L, 2L, 400000L), s"doc 2 has 2 OOV of 5: $rows")
  }

  test("gopherRules: each rule trips independently; a good doc passes") {
    val good = (("the and " * 30) + "quality prose with many common words of fine length").trim
    val corpus = Seq(
      (1L, good),                        // passes everything
      (2L, "the and of to in"),          // too few tokens
      (3L, ("a b " * 40 + "the of").trim),  // mean word length < 3
      (4L, ("1 22 333 4444 " * 20 + "the of").trim), // alpha fraction < 80%
      (5L, ("quality prose without stopwords " * 15).trim)) // < 2 distinct stops
      .toDF("doc_id", "text")
    val rows = TextAnalysis.gopherRules(corpus)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))).toMap
    assert(rows(1L) == (0L, 0L, 0L, 0L, 1L), s"doc 1 must pass: ${rows(1L)}")
    assert(rows(2L)._1 == 1L, s"doc 2 word count: ${rows(2L)}")
    assert(rows(3L)._2 == 1L && rows(3L)._5 == 0L, s"doc 3 mean len: ${rows(3L)}")
    assert(rows(4L)._3 == 1L, s"doc 4 alpha: ${rows(4L)}")
    assert(rows(5L)._4 == 1L, s"doc 5 stop distinct: ${rows(5L)}")
  }

  test("lmPerplexity: frequent transitions cost fewer bits than rare ones") {
    // "a b" appears in every doc (frequent transition); doc 4 is made of
    // transitions seen nowhere else — its mean cost must be strictly higher
    val corpus = Seq(
      (1L, "a b a b a b a b"),
      (2L, "a b a b a b a b"),
      (3L, "a b a b a b a b"),
      (4L, "q r s t u v w x"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.lmPerplexity(corpus)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(1L)._1 == 7L && rows(4L)._1 == 7L, s"7 transitions each: $rows")
    assert(rows(4L)._3 > rows(1L)._3,
      s"unseen transitions must cost more bits: ${rows(4L)} vs ${rows(1L)}")
    // bits are non-negative by construction: c2 <= c1 and V >= 1
    assert(rows.values.forall(_._2 >= 0L))
  }

  test("spanScrub: tokens under a corpus-hot 5-gram mask out; the rest survive") {
    // "h1..h5" appears in 3 docs → hot at minCount=3; doc 4 has no hot
    // gram and passes through verbatim. In doc 1 the hot gram covers
    // tokens 3..7 (start position 3), so exactly 5 tokens mask.
    val hot = (1 to 5).map(i => s"h$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $hot b1 b2"),
      (2L, s"$hot c1"),
      (3L, s"d1 $hot"),
      (4L, "z1 z2 z3 z4 z5 z6"))
      .toDF("doc_id", "text")
    val out = Dedup.spanScrub(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 9L, 5L, "a1 a2 b1 b2"),
      (2L, 6L, 5L, "c1"),
      (3L, 6L, 5L, "d1"),
      (4L, 6L, 0L, "z1 z2 z3 z4 z5 z6")))
  }

  test("substringRuns: maximal shared spans on diagonals; short overlaps drop") {
    def words(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val shared = words("s", 15) // 15-token verbatim span
    val tiny = Seq(
      (1L, s"${words("a", 5)} $shared ${words("b", 4)}"),
      (2L, s"${words("c", 9)} $shared"),
      (3L, s"${words("d", 3)} ${words("s", 9)} ${words("e", 6)}"), // only 9 shared tokens < 12
      (4L, words("z", 30)))
      .toDF("doc_id", "text")
    val rows = Dedup.substringRuns(tiny)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // docs 1&2 share exactly the 15-token span: one run, 15 tokens
    assert(rows == Map((1L, 2L) -> (1L, 15L)), s"got $rows")
  }

  test("substringRuns: differential vs brute-force maximal-run reference") {
    // small random corpora with planted overlaps; the distributed
    // diagonal-join result must equal a per-pair brute-force scan
    val k = 3; val minTokens = 4
    val rng = new scala.util.Random(20260814)
    def randDoc(vocab: Int, n: Int): Array[String] =
      Array.fill(n)(s"w${rng.nextInt(vocab)}")
    for (trial <- 1 to 5) {
      val docs = (1L to 6L).map { id =>
        val base = randDoc(8, 12 + rng.nextInt(10))
        (id, base.mkString(" "))
      }
      val toksBy = docs.map { case (id, t) => id -> t.split(" ", -1) }.toMap
      // brute force: maximal matching-gram runs per (pair, diagonal)
      val expected = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
      for (a <- docs.map(_._1); b <- docs.map(_._1) if a < b) {
        val ta = toksBy(a); val tb = toksBy(b)
        val ga = ta.sliding(k).map(_.mkString(" ")).toArray
        val gb = tb.sliding(k).map(_.mkString(" ")).toArray
        var runs = List.empty[Int] // run token lengths
        for (diag <- -(gb.length - 1) to (ga.length - 1)) {
          var i = math.max(0, diag); var cur = 0
          while (i < ga.length && (i - diag) < gb.length) {
            if (ga(i) == gb(i - diag)) cur += 1
            else { if (cur > 0) runs ::= cur + k - 1; cur = 0 }
            i += 1
          }
          if (cur > 0) runs ::= cur + k - 1
        }
        val qualifying = runs.filter(_ >= minTokens)
        if (qualifying.nonEmpty)
          expected((a, b)) = (qualifying.length.toLong, qualifying.max.toLong)
      }
      val got = Dedup.substringRuns(docs.toDF("doc_id", "text"),
          k = k, minTokens = minTokens, maxOcc = 1000L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      assert(got == expected.toMap, s"trial $trial: $got vs $expected")
    }
  }

  test("substringRuns: two disjoint runs count separately; occ-cap kills boilerplate") {
    import graft.dedup.Dedup
    def words(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val r1 = words("p", 12); val r2 = words("q", 13)
    val two = Seq(
      (1L, s"$r1 ${words("x", 9)} $r2"),
      (2L, s"$r2 ${words("y", 9)} $r1"))
      .toDF("doc_id", "text")
    val got = Dedup.substringRuns(two)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map((1L, 2L) -> (2L, 13L)), s"got $got")
    // boilerplate: a gram occurring in every doc beyond the cap is dropped
    // from the index, so an all-boilerplate corpus yields no pairs
    val boiler = (1L to 60L).map(i => (i, words("same", 20))).toDF("doc_id", "text")
    assert(Dedup.substringRuns(boiler, maxOcc = 50L).count() == 0L,
      "grams above the occurrence cap must not generate candidates")
  }

  test("filteredTopK: neighbors all satisfy the filter; pre-filter fills k") {
    import graft.similarity.Ann
    val docs = Tables.documents(spark, sf0001)
    val allowed = docs.where(col("lang") === "en")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val out = Ann.filteredTopK(embeddings, docs,
      col("vec_id") % 50 === 0, col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every neighbor passes the metadata filter — the pre-filter guarantee
    assert(out.forall { case (_, _, n) => allowed.contains(n) })
    // ranks are full 1..5 per query (k fills from allowed candidates)
    val perQ = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(perQ.values.forall(_ == Set(1L, 2L, 3L, 4L, 5L)), s"$perQ")
    // queries need NOT pass the filter: non-en queries still search
    assert(perQ.keySet.exists(q => !allowed.contains(q)),
      "fixture should include non-en queries")
  }

  test("ivfTuningCurve: recall non-decreasing in nprobe, saturates at full probe") {
    import graft.similarity.Ann
    val curve = Ann.ivfTuningCurve(embeddings, col("vec_id") % 50 === 0,
        probes = Seq(1, 2, 4, 25))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq(1L, 2L, 4L, 25L))
    curve.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(a <= b, s"recall decreased along the sweep: $curve")
    }
    // probing EVERY cell (step 25 => <= 20 centroids at this sf) makes
    // IVF exhaustive: recall must be 100%
    assert(curve.last._2 == 1000000L, s"full probe not exhaustive: $curve")
  }

  test("ivfPqRerankTopK: refine over a wide shortlist recovers brute-force order") {
    import graft.similarity.Ann
    val pred = col("vec_id") % 50 === 0
    val exact = Ann.bruteForceTopK(embeddings, pred)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val refined = Ann.ivfPqRerankTopK(embeddings, pred)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val approx = Ann.ivfPqTopK(embeddings, pred)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // contract: k rows per query, ranks 1..5
    val perQ = refined.keys.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(perQ.values.forall(_ == Set(1L, 2L, 3L, 4L, 5L)), s"ranks broken: $perQ")
    // the exact re-rank can only improve on raw ADC order: hits vs the
    // brute-force truth must be >= the unrefined index's hits
    def hits(m: Map[(Long, Long), Long]) =
      m.count { case (k, v) => exact.exists { case (k2, v2) => k2._1 == k._1 && v2 == v } }
    assert(hits(refined) >= hits(approx),
      s"refine lost recall: ${hits(refined)} < ${hits(approx)}")
  }

  test("nbClassifier discriminates label-dependent vocab; prior wins on shared vocab") {
    import graft.textops.TextAnalysis
    // label-dependent vocabulary: classifier must recover every label
    val sep = (0L until 60L).map { i =>
      val l = if (i % 3 == 0) "aa" else if (i % 3 == 1) "bb" else "cc"
      (i, s"$l-word-${i % 5} $l-tok $l-only $l-tok", l)
    }.toDF("doc_id", "text", "lang")
    val out = TextAnalysis.nbClassifier(sep)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq
    assert(out.size == 60)
    assert(out.forall(_._3 == 1L), "fully separable vocab must self-match everywhere")
    assert(out.map(_._2).toSet == Set("aa", "bb", "cc"))
    // shared vocabulary + skewed priors: the majority label wins every doc
    // (the mathematically correct NB answer — and what the shared-vocab
    // driver fixture exhibits)
    val shared = (0L until 40L).map { i =>
      (i, "same words every time", if (i % 4 == 0) "min" else "maj")
    }.toDF("doc_id", "text", "lang")
    val sharedOut = TextAnalysis.nbClassifier(shared)
      .collect().map(r => r.getString(1)).toSeq
    assert(sharedOut.forall(_ == "maj"))
  }

  test("animationRunPairs: offset runs found, shuffled order shares none, cap kills hot grams") {
    import graft.multimodal.Multimodal
    def doc(id: Long, hashes: Seq[Long]) =
      hashes.zipWithIndex.map { case (h, i) => (id, hashes.length.toLong, i.toLong, Some(h)) }
    // doc 1: run [10,11,12,13] at 0; doc 2: same run at offset 2;
    // doc 3: SAME FRAME SET as doc 1 but shuffled — no consecutive pair
    val frames = (
      doc(1L, Seq(10L, 11L, 12L, 13L, 90L)) ++
      doc(2L, Seq(80L, 81L, 10L, 11L, 12L, 13L)) ++
      doc(3L, Seq(13L, 11L, 10L, 12L))
    ).toDF("doc_id", "n_frames", "frame_idx", "ahash")
    val runs = Multimodal.animationRunPairs(frames, minRun = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(runs.toSeq == Seq((1L, 2L, 0L, 2L, 4L)),
      s"expected one 4-frame aligned run, got ${runs.toSeq}")
    // the same pair disappears when its grams exceed the occurrence cap
    val hot = (1L to 60L).flatMap(id => doc(id, Seq(10L, 11L, 12L, 13L)))
      .toDF("doc_id", "n_frames", "frame_idx", "ahash")
    assert(Multimodal.animationRunPairs(hot, minRun = 3, maxGramFreq = 10L)
      .collect().isEmpty)
  }

  test("unicodeScrub: strips invisibles, normalizes spaces, collapses, trims") {
    import graft.textops.TextAnalysis
    val dirty = Seq(
      (1L, "plain text stays"),
      (2L, "zero\u200Bwidth\u200Cgone\uFEFF\u00AD"),
      (3L, "nb\u00A0sp\u2009and\u3000ideographic"),
      (4L, "ctrl\tchars\nhere\u0007bell"),
      (5L, "  trimmed   runs  collapse  "))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unicodeScrub(dirty)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("plain text stays", 0L)))
    assert(out(2L) == (("zerowidthgone", 1L)))
    assert(out(3L) == (("nb sp and ideographic", 1L)))
    assert(out(4L) == (("ctrl chars here bell", 1L)))
    assert(out(5L) == (("trimmed runs collapse", 1L)))
  }

  test("splitLeakage: shared grams symmetric; unique-phrase docs leak nothing") {
    import graft.dedup.Dedup
    // every doc shares one 3-gram phrase; each doc also has a unique tail
    val docs = (0L until 90L).map(i =>
      (i, s"common shared phrase unique$i tail$i word$i")).toDF("doc_id", "text")
    val out = Dedup.splitLeakage(docs)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // with 90 docs all three splits are populated w.h.p. and every pair
    // shares at least the common phrase's grams
    assert(out.nonEmpty)
    out.foreach { case ((a, b), (shared, ppm)) =>
      assert(a != b)
      // symmetric in shared count (ppm differs: denominators differ)
      assert(out(b -> a)._1 == shared, s"asymmetric shared for $a/$b")
      assert(shared >= 1L)
      assert(ppm >= 0L && ppm <= 1000000L)
    }
    // a corpus of fully unique texts leaks zero grams → empty matrix
    val unique = (0L until 90L).map(i =>
      (i, s"a$i b$i c$i d$i e$i")).toDF("doc_id", "text")
    assert(Dedup.splitLeakage(unique).collect().isEmpty)
  }

  test("resizeImages: exact nearest-neighbor mapping, upscale, corrupt degrade") {
    import graft.multimodal.Multimodal
    val src = Multimodal.syntheticGrayPng(4, 2, (x, y) => (y * 4 + x) * 10)
    val rows = Seq((1L, src), (2L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "media").withColumn("media_type", lit("image"))
    // downscale 4x2 → 2x1: dst(x,0) = src(x*4/2, 0) = src(2x, 0)
    val down = Multimodal.resizeImages(rows, dw = 2, dh = 1)
      .collect().map(r => r.doc_id -> r).toMap
    assert(down(1L).width == 2 && down(1L).height == 1)
    assert(down(1L).luma_sum == 0L + 20L) // src(0,0)=0, src(2,0)=20
    assert(down(2L).media == null && down(2L).luma_sum == -1L)
    // upscale 4x2 → 8x2: dst(x,y) = src(x*4/8, y) = src(x/2, y)
    val up = Multimodal.resizeImages(rows.where(col("doc_id") === 1L), 8, 2)
      .collect().head
    assert(up.width == 8 && up.height == 2)
    // each src pixel contributes twice per row
    assert(up.luma_sum == 2L * (0 + 10 + 20 + 30 + 40 + 50 + 60 + 70))
  }

  test("embeddingHealth: NaNs counted out of stats, dead dims read min==max") {
    import graft.similarity.Ann
    val rows = Seq(
      (1L, Array(1.0f, Float.NaN, 0.5f)),
      (2L, Array(1.0f, 2.0f, 0.25f))).toDF("vec_id", "embedding")
    val out = Ann.embeddingHealth(rows)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // dim 0 is DEAD: min == max, no NaNs
    assert(out(0L) == ((2L, 0L, 2000000L, 1000000L, 1000000L)))
    // dim 1: one NaN excluded from n/sum/extremes, counted in n_nan
    assert(out(1L) == ((1L, 1L, 2000000L, 2000000L, 2000000L)))
    // dim 2: live dim, exact scaled extremes
    assert(out(2L) == ((2L, 0L, 750000L, 250000L, 500000L)))
  }

  test("rrfFuse: both-systems doc outranks single-system; ties to smaller id") {
    import graft.similarity.Ann
    val dense = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val sparse = Seq((20L, 1L), (40L, 2L), (50L, 3L)).toDF("id", "rank")
    val out = Ann.rrfFuse(Seq(dense, sparse), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 20 appears in both (rank 2 + rank 1) → must fuse first
    assert(out.head._1 == 20L)
    assert(out.head._3 == 1000000000L / 62 + 1000000000L / 61)
    // 10 and 40: rank-1-dense vs rank-2-sparse → 10 (rank 1) next
    assert(out(1)._1 == 10L)
    // identical points (30 dense rank 3, 50 sparse rank 3) → smaller id first
    val tied = out.filter(r => r._1 == 30L || r._1 == 50L)
    assert(tied.map(_._1).toSeq == Seq(30L, 50L))
    assert(tied.map(_._3).distinct.length == 1)
    // ranks are dense 1..n
    assert(out.map(_._2).toSeq == (1L to out.length.toLong))
  }

  test("bpeTrain: greedy left-to-right merges, frequency-weighted, text tie-break") {
    import graft.textops.TextAnalysis
    import spark.implicits._
    // corpus: "aaab" x3, "ab" x2 → round 1 pairs: (a,a) 2*3=6,
    // (a,b) 3+2=5 → merge (a,a). GREEDY: "aaab" → [aa, a, b] (the second
    // 'a' is consumed by the first merge and cannot re-pair). Round 2:
    // (aa,a) 3, (a,b) 3+2=5 → merge (a,b). Round 3 over {[aa,ab], [ab]}:
    // (aa,ab) 3 → merge. Round 4: no pairs left → table stops at 3.
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "length(text) AS n_chars")
    val out = TextAnalysis.bpeTrain(docs, merges = 4)
      .orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "a", "a", 6L), (2L, "a", "b", 5L), (3L, "aa", "ab", 3L)))
    // tie-break: equal counts pick the lexicographically smaller "l r"
    val tie = Seq((1L, "ab cd")).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "length(text) AS n_chars")
    val first = TextAnalysis.bpeTrain(tie, merges = 1).collect()(0)
    assert((first.getString(1), first.getString(2)) == ("a", "b"))
  }

  test("bpeEncode: learned merges compress exactly the words they cover") {
    import graft.textops.TextAnalysis
    import spark.implicits._
    // "aaab"x3 + "ab"x2 + "zz" learn (a,a), (a,b), (aa,ab), then (z,z)
    // (the only pair left in round 4). Encoding doc 1: "aaab" → greedy
    // [aa,a,b] → (a,b) → [aa,ab] → (aa,ab) → [aaab]: 1 token; "ab" →
    // [ab]: 1. Doc 2's "zz" collapses under the round-4 merge. With
    // merges=3 that merge is never learned and "zz" keeps 2 char tokens.
    val docs = Seq((1L, "aaab aaab aaab ab ab"), (2L, "zz"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "length(text) AS n_chars")
    def run(k: Int) = TextAnalysis.bpeEncode(docs, merges = k)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(run(4) == Seq(
      (1L, 5L, 16L, 5L), // 5 words, 16 chars, every word collapses to 1 token
      (2L, 1L, 2L, 1L))) // (z,z) was the 4th learned merge
    assert(run(3) == Seq(
      (1L, 5L, 16L, 5L),
      (2L, 1L, 2L, 2L))) // 3 merges never learn (z,z) — chars survive
  }

  test("unigramLmTrain: hand-exact EM round, pruning is exactly Viterbi-unused") {
    import graft.textops.TextAnalysis
    import spark.implicits._
    // "abab"×2 + "cd"×1. Seed counts: a 4, b 4, c 1, d 1, ab 4, aba 2,
    // abab 2, ba 2, bab 2, cd 1 → T=23, FL2(T)=4, bits = 4−FL2(cnt).
    // Viterbi: "abab" → the whole-word token (3 bits, 1 tok) beats
    // ab+ab (4 bits); "cd" → cd (4 bits, 1 tok) beats c+d (8 bits).
    // So em = {abab: 2, cd: 1}, T1=3; every other multi-char seed is
    // Viterbi-unused → pruned; chars are NEVER pruned even at em 0.
    val docs2 = Seq((1L, "abab abab cd")).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "length(text) AS n_chars")
    val out = TextAnalysis.unigramLmTrain(docs2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out.keySet == Set("a", "b", "c", "d", "ab", "aba", "abab", "ba", "bab", "cd"))
    assert(out("abab") == ((0L, 2L, 2L, 666666L, 0L)), s"got $out")
    assert(out("cd") == ((0L, 1L, 1L, 333333L, 0L)), s"got $out")
    assert(out("ab") == ((0L, 4L, 0L, 0L, 1L)), s"got $out")
    assert(out("a") == ((1L, 4L, 0L, 0L, 0L)), s"chars never pruned: $out")
    // conservation: Viterbi covers every character of every word exactly
    // once, so Σ em_cnt·len(tok) = Σ n(word)·len(word) — on the real
    // fixture too, and at rounds=2 (EM re-estimation cannot lose mass)
    val words = docs.selectExpr("explode(split(text, ' ')) AS w")
      .where("w != '' AND length(w) <= 16")
      .selectExpr("sum(length(w))").collect()(0).getLong(0)
    Seq(1, 2).foreach { r =>
      val em = TextAnalysis.unigramLmTrain(docs, rounds = r)
        .selectExpr("sum(em_cnt * length(tok))", "sum(CASE WHEN pruned = 1 THEN 1 ELSE 0 END)",
          "sum(CASE WHEN pruned = 1 AND (em_cnt > 0 OR length(tok) = 1) THEN 1 ELSE 0 END)",
          "sum(CASE WHEN pruned = 0 AND em_cnt = 0 AND length(tok) > 1 THEN 1 ELSE 0 END)")
        .collect()(0)
      assert(em.getLong(0) == words, s"rounds=$r conservation")
      assert(em.getLong(2) == 0L && em.getLong(3) == 0L,
        s"rounds=$r pruned ⟺ unused multi-char")
    }
  }

  test("viterbiSegment: bits-then-ntoks-then-longer-k order, coverage required") {
    import graft.textops.TextAnalysis
    // tie on (bits, ntoks): ab+c and a+bc both (3 bits, 2 toks) — the
    // larger LAST token wins at the final position → a+bc
    val c1 = Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "ab" -> 2L, "bc" -> 2L)
    assert(TextAnalysis.viterbiSegment("abc", c1, 4) == List("a", "bc"))
    // fewer tokens wins the bits tie
    assert(TextAnalysis.viterbiSegment("aa", Map("a" -> 1L, "aa" -> 2L), 4)
      == List("aa"))
    // cheaper bits beats fewer tokens
    assert(TextAnalysis.viterbiSegment("aa", Map("a" -> 1L, "aa" -> 9L), 4)
      == List("a", "a"))
    // a character outside the model = lost coverage — loud, not silent
    intercept[IllegalArgumentException] {
      TextAnalysis.viterbiSegment("az", Map("a" -> 1L), 4)
    }
  }

  test("nfcNormalize: NFC composes, NFKC also folds compatibility forms") {
    import graft.textops.TextAnalysis
    val rows = Seq(
      (1L, "cafe\u0301"),      // e + combining acute → é under both forms
      (2L, "\uFB01ne print"),  // fi ligature: NFC keeps, NFKC folds to "fi"
      (3L, "already clean"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val nfc = TextAnalysis.nfcNormalize(rows)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(nfc(1L) == (("caf\u00e9", 1L)))
    assert(nfc(2L) == (("\uFB01ne print", 0L)))
    assert(nfc(3L) == (("already clean", 0L)))
    assert(nfc(4L)._1 == null && nfc(4L)._2 == 0L)
    val nfkc = TextAnalysis.nfcNormalize(rows, form = "NFKC")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(nfkc(1L) == (("caf\u00e9", 1L)))
    assert(nfkc(2L) == (("fine print", 1L)))
    assert(nfkc(3L) == (("already clean", 0L)))
  }

  test("ccnetBuckets: ordered terciles per lang, near-even, exhaustive") {
    import graft.textops.TextAnalysis
    val out = TextAnalysis.ccnetBuckets(docs)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getString(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val byBucket = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      assert(byBucket.keySet == Set("head", "middle", "tail"), s"$lang: ${byBucket.keySet}")
      // score ordering: every head score <= every middle score <= every tail
      assert(byBucket("head").max <= byBucket("middle").min, s"$lang head/middle overlap")
      assert(byBucket("middle").max <= byBucket("tail").min, s"$lang middle/tail overlap")
      // near-even split (ties can shift a few docs across a cutoff)
      val n = rows.size
      byBucket.values.foreach(b =>
        assert(math.abs(b.size - n / 3) <= math.max(3, n / 10), s"$lang skewed: ${byBucket.view.mapValues(_.size).toMap}"))
    }
  }

  test("sourceDivergence: a unique-vocab slice diverges far above corpus-matching slices") {
    import graft.textops.TextAnalysis
    // A and B share one distribution (the corpus majority); Z's vocabulary
    // appears nowhere else — its quantized KL must dominate
    val text = (0 until 32).map(i => s"w${i % 8}").mkString(" ")
    val ztext = (0 until 32).map(i => s"z${i % 8}").mkString(" ")
    val rows = (0L until 8L).map(i => (i, text, "A")) ++
      (8L until 16L).map(i => (i, text, "B")) ++
      (16L until 18L).map(i => (i, ztext, "Z"))
    val df = rows.toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceDivergence(df)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set("A", "B", "Z"))
    assert(out("A") == out("B"), s"identical slices must score identically: $out")
    assert(out("Z") > out("A") + 100,
      s"unique-vocab slice must diverge far above matches: $out")
  }

  test("applyDedupByQuality: best-quality member wins its cluster, ties to smaller id") {
    import graft.dedup.Dedup
    val corpus = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"),  // cluster {1,2,3}: best quality = 3
      (4L, "b"), (5L, "b"),             // cluster {4,5}: tie -> keeper 4
      (9L, "solo")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val quality = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 7L), (5L, 7L), (9L, 1L))
      .toDF("doc_id", "q")
    val out = Dedup.applyDedupByQuality(corpus, pairs, quality)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(3L -> "keeper", 4L -> "keeper", 9L -> "solo"),
      s"got $out")
  }

  test("applyDedupByQuality: incomplete quality frame cannot delete a cluster") {
    import graft.dedup.Dedup
    val corpus = Seq(
      (1L, "a"), (2L, "a"),             // cluster {1,2}: NO member scored
      (4L, "b"), (5L, "b"),             // cluster {4,5}: only 5 scored
      (9L, "solo")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (4L, 5L)).toDF("a", "b")
    val quality = Seq((5L, 7L)).toDF("doc_id", "q")
    val out = Dedup.applyDedupByQuality(corpus, pairs, quality)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // unscored cluster {1,2} falls back to the min-node keeper (1);
    // in {4,5} the unscored 4 ranks below the scored 5
    assert(out == Map(1L -> "keeper", 5L -> "keeper", 9L -> "solo"),
      s"got $out")
  }

  test("nbConfusion: separable vocab yields a pure diagonal with 1e6 row shares") {
    import graft.textops.TextAnalysis
    val sep = (0L until 60L).map { i =>
      val l = if (i % 3 == 0) "aa" else if (i % 3 == 1) "bb" else "cc"
      (i, s"$l-word-${i % 5} $l-tok $l-only $l-tok", l)
    }.toDF("doc_id", "text", "lang")
    val cells = TextAnalysis.nbConfusion(sep)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(cells.length == 3)
    assert(cells.forall { case (t, p, n, ppm) => t == p && n == 20L && ppm == 1000000L })
  }

  test("nbModel + nbScoreStream projection ≡ nbClassifier rows (differential)") {
    import graft.textops.TextAnalysis
    import graft.streaming.StreamingText
    val sep = (0L until 60L).map { i =>
      val l = if (i % 3 == 0) "aa" else if (i % 3 == 1) "bb" else "cc"
      (i, s"$l-word-${i % 5} $l-tok $l-only $l-tok", l)
    }.toDF("doc_id", "text", "lang")
    val model = TextAnalysis.nbModel(sep)
    assert(model.labels.toSeq == Seq("aa", "bb", "cc"))
    assert(model.weights.length == 3 * model.buckets)
    // the scoring projection is stateless, so it applies to a batch frame
    // unchanged — rows must match the in-engine classifier exactly
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows(StreamingText.nbScoreStream(sep, model)) ==
      rows(TextAnalysis.nbClassifier(sep)))
  }

  test("corpusOverlap: identical slices estimate 1e6; disjoint estimate 0; " +
       "half-overlap lands near 500k") {
    import graft.dedup.Dedup
    // slice A == slice B (same shingle set, different doc ids); slice C
    // disjoint; slice D shares half its distinct shingles with A
    def doc(i: Long, words: Seq[String], src: String) =
      (i, words.mkString(" "), src)
    val common = (0 until 40).map(i => s"w$i")
    val rows =
      Seq(doc(1, common, "A"), doc(2, common, "B")) ++
      Seq(doc(3, (0 until 40).map(i => s"z$i"), "C")) ++
      // D: first 21 tokens of A's text (shares 19 of A's 38 3-gram
      // shingles) + 19 fresh tokens (18 fresh shingles + 2 bridge ones)
      Seq(doc(4, common.take(21) ++ (0 until 19).map(i => s"d$i"), "D"))
    val df = rows.toDF("doc_id", "text", "source")
    val est = Dedup.corpusOverlap(df)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(est(("A", "B")) == 1000000L, s"identical slices: $est")
    assert(est(("A", "C")) == 0L && est(("B", "C")) == 0L)
    val ad = est(("A", "D"))
    // true Jaccard = 19/57 ≈ 0.33; this deterministic 64-hash family
    // draws 9/64 ≈ 0.14 here (≈3σ low — fixed, not flaky). The assert
    // separates partial overlap from the 0 and 1e6 poles.
    assert(ad > 100000L && ad < 600000L, s"half-overlap estimate off: $ad")
  }

  test("repeatedSpans: cross-doc repeats merge to maximal spans; clean docs emit no row") {
    // doc 1 and doc 2 share the 10-token prefix → L=4 grams at positions
    // 1..7 all repeat → ONE merged span [1, 10] in each; doc 3 is unique
    val shared = (1 to 10).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, shared + " tail1 a b c"),
      (2L, shared + " other x y z"),
      (3L, "entirely different words with no repeats at all ok")
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(d, L = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(!out.contains(3L), "repeat-free doc must emit no row")
    assert(out(1L) == ((14L, 1L, 10L, 714285L)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((14L, 1L, 10L, 714285L)), s"doc2: ${out(2L)}")
    // WITHIN-doc repetition also flags: the same 4-gram twice in one doc
    val intra = Seq((7L, "p q r s GAP1 GAP2 p q r s END1 END2")).toDF("doc_id", "text")
    val o2 = Dedup.repeatedSpans(intra, L = 4).collect()
    assert(o2.length == 1 && o2.head.getLong(2) == 2L &&
      o2.head.getLong(3) == 8L, s"intra-doc spans: ${o2.toSeq}")
  }

  test("matryoshkaRecall: full-dim prefix is recall 1.0; counts are sane") {
    val out = graft.similarity.Ann.matryoshkaRecall(
        embeddings, col("vec_id") % 50 === 0, k = 5, prefixes = Seq(8, 64))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // m = 64 is the whole vector — identical ranking, perfect recall
    assert(out(64L)._3 == 1000000L, s"full-dim recall must be 1.0: ${out(64L)}")
    // an 8-dim prefix loses information on this corpus but finds SOME
    val (t8, h8, r8) = out(8L)
    assert(h8 <= t8 && r8 < 1000000L && h8 > 0, s"prefix-8: ${out(8L)}")
  }

  test("binaryQuantRecall: rerank dominates raw Hamming; both bounded by 1.0") {
    val out = graft.similarity.Ann.binaryQuantRecall(
        embeddings, col("vec_id") % 50 === 0, k = 5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (bt, bh, bppm) = out("bq")
    val (rt, rh, rppm) = out("bq_rerank")
    assert(bt == rt, "same truth set for both tiers")
    // the 4k shortlist re-ranked by exact cosine can only contain the raw
    // Hamming top-k's hits or better picks — recall must not DROP
    assert(rppm >= bppm, s"rerank $rppm must be >= raw bq $bppm")
    assert(bh > 0 && rppm <= 1000000L, s"sane bounds: $out")
  }

  test("triangleCounts: K4 corners count 3 each; loops/duplicates/direction collapse") {
    // K4 on {a,b,c,d} (4 triangles, each vertex in 3) + pendant e-a
    // (no triangle), with a self-loop, duplicate and reversed edges mixed in
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
      ("b", "a"), ("c", "c"), ("a", "b"), ("e", "a")
    ).toDF("src", "dst")
    val out = graft.graph.GraphOps.triangleCounts(edges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L), s"got $out")
  }

  test("runV4: stage funnel is monotone per source; dedup and band genuinely cut; k caps the sample") {
    import graft.pipeline.TrainingData
    val out = TrainingData.runV4(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out.nonEmpty)
    for ((s, (n, nd, nb, ns, tok)) <- out) {
      assert(n >= nd && nd >= nb && nb >= ns, s"funnel must shrink: $s $n/$nd/$nb/$ns")
      assert(ns <= 10L, s"sample capped at k: $s")
      assert(ns == 0L || tok > 0L, s"sampled docs carry token mass: $s")
    }
    // the band stage genuinely filters somewhere on this corpus
    assert(out.values.exists { case (_, nd, nb, _, _) => nb < nd },
      "KN band must cut at least one doc somewhere")
    // duplicate docs collapse in the dedup stage: doubling a doc changes
    // n_docs but not n_dedup
    val dup = docs.unionAll(docs.where(col("doc_id") === 0)
      .withColumn("doc_id", lit(100000L)))
    val out2 = TrainingData.runV4(dup).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val src0 = docs.where(col("doc_id") === 0)
      .select(col("source").cast("string")).head.getString(0)
    assert(out2(src0)._1 == out(src0)._1 + 1, "n_docs sees the duplicate")
    assert(out2(src0)._2 == out(src0)._2, "n_dedup must collapse it")
  }

  test("seqPoissonSample: weight monotonicity, WOR, all-equal weights reduce to md5 bottom-k") {
    import graft.textops.TextAnalysis
    // one stratum, doc weights 1 except doc 7 which we inflate: its
    // quantized priority u div w can only FALL as w grows, so once
    // sampled at w it stays sampled at any larger w
    def corpus(w7: Int) = (0L until 20L).map { id =>
      val n = if (id == 7L) w7 else 1
      (id, "s", Seq.fill(n)("tok").mkString(" "))
    }.toDF("doc_id", "source", "text")
    def picked(w7: Int): Set[Long] =
      TextAnalysis.seqPoissonSample(corpus(w7), k = 5)
        .collect().map(_.getLong(1)).toSet
    val base = picked(1)
    assert(base.size == 5, "WOR: exactly k distinct docs")
    // weight 1 everywhere = plain md5 bottom-k — replicate explicitly
    def h60s(str: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(str.getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString.take(15), 16)
    val expected = (0L until 20L)
      .sortBy(id => (h60s(s"sps:$id"), id))
      .take(5).toSet
    assert(base == expected, s"got $base expected $expected")
    // inflate doc 7 until it enters; it must then stay at every larger w
    val in64 = picked(1 << 16)
    assert(in64.contains(7L), "a 65536x weight must pull doc 7 in")
    assert(picked(1 << 18).contains(7L), "monotone: heavier still in")
  }

  test("sketchOverlap: exact shingle-set algebra on hand sources; HLL inclusion–exclusion gate holds") {
    import graft.dedup.Dedup
    // A: 4 distinct 3-grams, B shares exactly 2 of them, C is disjoint
    val docsH = Seq(
      (1L, "A", "a b c d e f"),          // grams: abc bcd cde def
      (2L, "B", "c d e f g h"),          // grams: cde def efg fgh → ∩A = {cde, def}
      (3L, "C", "x y z w"))              // grams: xyz yzw
      .toDF("doc_id", "source", "text")
    val out = Dedup.sketchOverlap(docsH)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(("A", "B")) == (4L, 4L, 2L, 1L), s"got $out")
    assert(out(("A", "C")) == (4L, 2L, 0L, 1L), s"got $out")
    assert(out(("B", "C")) == (4L, 2L, 0L, 1L), s"got $out")
    // at these cardinalities the HLL estimates are exact, so the gate
    // must hold with the default eps on every pair (asserted above) —
    // and on the real corpus too: every pair's verdict is 1
    val real = Dedup.sketchOverlap(docs)
    assert(real.where(col("within_eps") === 0L).count() == 0L,
      "inclusion–exclusion must stay within eps·(|A|+|B|) on the corpus")
  }

  test("knPerplexity: hand-computed interpolated KN values; seen-mass per prefix stays ≤ 1") {
    // corpus "a b", "a b", "a c": c(a·)=3, c(ab)=2, c(ac)=1;
    // types (ab),(ac) → N1+(a·)=2, N1+(·b)=N1+(·c)=1, N1+(··)=2
    // P(b|a) = (200−75)·10⁶//300 + ((75·2·10⁶//300)·(10⁶//2))//10⁶
    //        = 416666 + (500000·500000)//10⁶ = 666666 → bits 20−19 = 1
    // P(c|a) = (100−75)·10⁶//300 + 250000 = 83333+250000 = 333333 → bits 2
    val tiny = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.knPerplexity(tiny)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == (1L, 1L, 1000000L), s"got $out")
    assert(out(2L) == (1L, 1L, 1000000L), s"got $out")
    assert(out(3L) == (1L, 2L, 2000000L), s"got $out")
    // truncation keeps the discounted+interpolated seen mass ≤ 1:
    // Σ_w p_ppm(·|a) over seen continuations = 666666+333333 ≤ 10⁶
    // (the property the fixed division order exists to preserve) — and
    // on the real corpus every doc's quantized surprisal is in [1, 20]
    val real = TextAnalysis.knPerplexity(docs)
      .agg(min(expr("total_bits div n_transitions")).as("lo"),
        max(expr("(total_bits + n_transitions - 1) div n_transitions")).as("hi"))
      .collect().head
    assert(real.getLong(0) >= 0L && real.getLong(1) <= 20L, s"bits band: $real")
  }

  test("localClustering: K4 corners score 10⁶, pendant bridges score partial, degree-1 is NULL") {
    import graft.graph.GraphOps
    // K4 {a,b,c,d} + pendant e–a: a has degree 4, 3 triangles among its
    // 6 neighbor pairs → 500000; b/c/d have degree 3, all 3 wedges
    // closed → 10⁶; e has degree 1 → NULL
    val g = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
      ("c", "d"), ("e", "a")).toDF("src", "dst")
    val rows = GraphOps.localClustering(g).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(rows("a") == (4L, 3L, Some(500000L)), s"got $rows")
    assert(rows("b") == (3L, 3L, Some(1000000L)), s"got $rows")
    assert(rows("c") == (3L, 3L, Some(1000000L)), s"got $rows")
    assert(rows("d") == (3L, 3L, Some(1000000L)), s"got $rows")
    assert(rows("e") == (1L, 0L, None), s"degree-1 must be NULL: $rows")
  }

  test("modularity: two-triangle hand value, singleton partition scores negative, shuffle hatch parity") {
    import graft.graph.GraphOps
    // two triangles bridged by one edge, m = 7; natural partition:
    // each community has m_c = 3, D_c = 7 →
    // q_ppm = (3·10⁶) div 7 − (10⁶·49) div (4·49) = 428571 − 250000
    val g = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("d", "e"), ("e", "f"), ("f", "d"), ("c", "d")).toDF("src", "dst")
    val labels = Seq(("a", "x"), ("b", "x"), ("c", "x"),
      ("d", "y"), ("e", "y"), ("f", "y")).toDF("host", "community")
    val out = GraphOps.modularity(g, labels)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("x") == (3L, 3L, 7L, 178571L), s"got $out")
    assert(out("y") == (3L, 3L, 7L, 178571L), s"got $out")
    // every host its own community: zero internal edges everywhere,
    // strictly negative contributions for every non-isolated host
    val singletons = g.select(col("src").as("host"))
      .unionAll(g.select(col("dst").as("host"))).distinct()
      .withColumn("community", col("host"))
    val sing = GraphOps.modularity(g, singletons)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(sing.values.forall(_ < 0L), s"singletons must score negative: $sing")
    // the 10⁸-host shuffle hatch is bit-identical
    val nb = GraphOps.modularity(g, labels, broadcastLabels = false)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(nb == out, "broadcastLabels=false must match the broadcast plan")
  }

  test("stressCentrality: hand-computed path/diamond counts, shortcut discards longer paths") {
    import graft.graph.GraphOps
    // path a→b→c→d: interior members of the 6 within-radius pairs
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val p = GraphOps.stressCentrality(path, radius = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p == Map("a" -> 0L, "b" -> 2L, "c" -> 2L, "d" -> 0L), s"got $p")
    // diamond: σ(a,d) = 2, one path through each of b and c
    val dia = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"))
      .toDF("src", "dst")
    val d = GraphOps.stressCentrality(dia, radius = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d("b") == 1L && d("c") == 1L && d("a") == 0L && d("d") == 0L,
      s"got $d")
    // a→d shortcut makes d(a,d) = 1 — the 2-hop paths through b/c are no
    // longer SHORTEST and must vanish from the first-reach σ-merge
    val short = dia.unionAll(Seq(("a", "d")).toDF("src", "dst"))
    val sOut = GraphOps.stressCentrality(short, radius = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sOut("b") == 0L && sOut("c") == 0L, s"got $sOut")
  }

  test("stressCentrality: brute-force cross-check on the 97-host fixture; sampleMod=1 est equals exact") {
    import graft.graph.GraphOps
    val edgeDf = EntryHelpers.hostEdgesFixture(docs)
    val edges = edgeDf.collect().map(r => (r.getString(0), r.getString(1)))
      .filter { case (a, b) => a != b }.distinct
    val hosts = edges.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
    val adj: Map[String, Seq[String]] =
      edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSeq }
    val radius = 3
    // independent BFS σ/d per source, then φ by depth descending
    val stressBrute = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    for (s <- hosts) {
      val dist = scala.collection.mutable.Map(s -> 0)
      val sig = scala.collection.mutable.Map(s -> 1L)
      var frontier = Seq(s)
      for (dd <- 1 to radius) {
        val cand = scala.collection.mutable.Map[String, Long]()
          .withDefaultValue(0L)
        for (v <- frontier; w <- adj.getOrElse(v, Seq.empty)
             if !dist.contains(w))
          cand(w) = cand(w) + sig(v)
        val fresh = cand.keys.filterNot(dist.contains).toSeq
        for (w <- fresh) { dist(w) = dd; sig(w) = cand(w) }
        frontier = fresh
      }
      val phi = scala.collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      for (dd <- (radius - 1) to 0 by -1;
           v <- dist.collect { case (n, d0) if d0 == dd => n };
           w <- adj.getOrElse(v, Seq.empty)
           if dist.get(w).contains(dd + 1))
        phi(v) = phi(v) + 1L + phi(w)
      for (v <- dist.keys if v != s) stressBrute(v) = stressBrute(v) + sig(v) * phi(v)
    }
    val got = GraphOps.stressCentrality(edgeDf, radius = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.keySet == hosts.toSet, "one row per host")
    for (h <- hosts)
      assert(got(h)._1 == stressBrute(h),
        s"stress($h): got ${got(h)._1}, brute ${stressBrute(h)}")
    // sampling every source with scale N div N = 1 reproduces the exact
    val all = GraphOps.stressCentrality(edgeDf, radius = 3, sampleMod = 1L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    assert(all.forall { case (_, (ex, est)) => ex == est },
      "sampleMod=1 estimate must equal the exact column")
  }
}
