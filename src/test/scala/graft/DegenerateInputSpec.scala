package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, Dedup, GraphOps, RangeJoin, SimilaritySearch}

/** Degenerate-input hardening: every operator must return EMPTY (never
  * throw) on empty inputs, and behave sanely on singletons. At 100 TB
  * these are not edge cases — empty partitions, first-run state tables,
  * and filters that match nothing hit every one of these paths daily;
  * an operator that crashes on them (a reduce over no frames, a min of
  * an empty aggregate, a window over zero rows) takes the whole batch
  * down.
  */
class DegenerateInputSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def emptyDocs: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }
  private def oneDoc: DataFrame = {
    import spark.implicits._
    Seq((1L, "just one lonely document with enough tokens to shingle"))
      .toDF("doc_id", "text")
  }

  test("dedup candidate generators: empty and singleton corpora yield no pairs") {
    for (df <- Seq(emptyDocs, oneDoc)) {
      assert(Dedup.lshCandidatePairs(df).count() == 0)
      assert(Dedup.simhashCandidatePairs(df, bucketBits = 4, maxHamming = 10).count() == 0)
      assert(Dedup.simhashSortedNeighborPairs(df, maxHamming = 10).count() == 0)
      assert(Dedup.ngramJaccardPairs(df, 0.8).count() == 0)
    }
  }

  test("width-parameterized generators: empty/singleton corpora at 64 bits and 128 perms") {
    for (df <- Seq(emptyDocs, oneDoc)) {
      assert(Dedup.lshCandidatePairs(df, numPerms = 128, numBands = 32).count() == 0)
      assert(Dedup.simhashCandidatePairs(df, bucketBits = 4, maxHamming = 10, bits = 64).count() == 0)
      assert(Dedup.simhashSortedNeighborPairs(df, maxHamming = 10, bits = 64).count() == 0)
    }
  }

  test("flowDetail: empty summary, empty key set, both") {
    import spark.implicits._
    def summaryDf(rows: Seq[(String, String, String, String, String, Long, Long, Long, Int, Long, Long, Double, Long)]) =
      rows.toDF("my_ip", "my_port", "alien_ip", "alien_port", "proto",
        "bytes_up", "bytes_down", "n_pkts", "direction", "t_min", "t_max",
        "sample_rate", "status")
    val full = summaryDf(Seq(
      ("h1", "80", "a1", "5000", "tcp", 10L, 20L, 3L, 1, 0L, 5L, 2.0, 0L)))
    val empty = summaryDf(Seq.empty)
    assert(graft.detectors.Detectors.flowDetail(empty, full).count() == 0)
    assert(graft.detectors.Detectors.flowDetail(full, empty).count() == 0)
    assert(graft.detectors.Detectors.flowDetail(empty, empty).count() == 0)
    // and the happy path renders exactly one line for its one key
    val out = graft.detectors.Detectors.flowDetail(full, full).collect()
    assert(out.length == 1 && out.head.getString(1).nonEmpty
      && !out.head.getString(1).contains("\n"))
  }

  test("flowDetail: null flow fields never crash the aggregate") {
    import spark.implicits._
    // nulls in a tie field (proto), a rendered field (my_port), the byte
    // sum (sort key), and the direction vote — each must survive the
    // raw-field buffer: null tie coalesces to "" (sorts first), a null
    // sort key sorts last, a null rendered field nullifies only ITS line
    // (concat_ws drops it), and a null direction renders the <?> arrow.
    val rows = Seq[(String, String, String, String, String, java.lang.Long, java.lang.Long, java.lang.Long, java.lang.Integer, java.lang.Long, java.lang.Long, java.lang.Double, java.lang.Long)](
      ("h1", "80", "a1", "5000", null, 10L, 20L, 3L, 1, 0L, 5L, 2.0, 0L),
      ("h1", null, "a2", "5001", "tcp", 99L, 0L, 1L, -1, 0L, 5L, 2.0, 0L),
      ("h1", "81", "a3", "5002", "tcp", null, 1L, 1L, 1, 0L, 5L, 2.0, 0L),
      ("h1", "82", "a4", "5003", "tcp", 5L, 5L, 1L, null, 0L, 5L, 2.0, 1L))
      .toDF("my_ip", "my_port", "alien_ip", "alien_port", "proto",
        "bytes_up", "bytes_down", "n_pkts", "direction", "t_min", "t_max",
        "sample_rate", "status")
    val out = graft.detectors.Detectors.flowDetail(rows, rows).collect()
    assert(out.length == 1)
    val lines = out.head.getString(1).split("\n").toSeq
    // 4 candidate rows; the null-proto and null-my_port lines render as
    // NULL and are dropped by concat_ws — the two intact lines survive,
    // byte-desc order (a4's 10 bytes beats a3's null sort key)
    assert(lines.length == 2)
    assert(lines.head.contains("a4:5003") && lines.head.contains(" <?> ")
      && lines.head.contains(" [!]"))
    assert(lines.last.contains("a3:5002"))
  }

  test("lang classifier: empty corpus and single-class corpus") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    assert(graft.ml.LangClassifier.trainPredict(empty).count() == 0)
    val mono = Seq((1L, "en", "the cat sat"), (2L, "en", "a dog ran"))
      .toDF("doc_id", "lang", "text")
    val out = graft.ml.LangClassifier.trainPredict(mono, classes = Seq("en"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getInt(3)))
    assert(out.forall { case (lang, pred, c) => lang == "en" && pred == "en" && c == 1 })
  }

  test("chunk dedup: empty corpus and empty/whitespace texts yield no chunks") {
    import spark.implicits._
    assert(Dedup.cdcChunkDedup(emptyDocs).count() == 0)
    assert(Dedup.cdcChunkStats(emptyDocs).count() == 0)
    val blank = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    assert(Dedup.cdcChunkDedup(blank).count() == 0)
    // one short doc (< window) → exactly one whole-doc chunk
    val short = Seq((3L, "two tokens")).toDF("doc_id", "text")
    assert(Dedup.cdcChunkDedup(short).count() == 1)
  }

  test("connected components and resolution: empty edge set") {
    import spark.implicits._
    val noPairs = Seq.empty[(Long, Long)].toDF("doc1", "doc2")
    assert(Dedup.connectedComponents(noPairs).count() == 0)
    // resolution over no pairs keeps every doc as its own canonical
    // (resolveDuplicates' seniority sort needs the fixture's n_chars)
    val res = Dedup.resolveDuplicates(
      oneDoc.withColumn("n_chars", length(col("text")).cast("long")),
      noPairs, pairsDistinct = true)
    assert(res.filter(col("keep")).count() == 1)
  }

  test("bfsHops: empty graph, empty seeds, isolated seeds") {
    import spark.implicits._
    val noEdges = Seq.empty[(Long, Long)].toDF("u", "v")
    val noSeeds = Seq.empty[Long].toDF("node")
    assert(GraphOps.bfsHops(noEdges, noSeeds, maxHops = 3).count() == 0)
    // a seed with no edges is still reachable at hop 0
    val seeds = Seq(42L).toDF("node")
    val got = GraphOps.bfsHops(noEdges, seeds, maxHops = 3).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((42L, 0L)))
  }

  test("range and interval joins: an empty side yields an empty result") {
    import spark.implicits._
    val intervals = Seq((1L, 10L, 20L)).toDF("iid", "s", "e")
    val noPoints = Seq.empty[(Long, Long)].toDF("pid", "v")
    assert(RangeJoin.rangeJoin(noPoints, "v", intervals, "s", "e", grid = 8L).count() == 0)
    val noIntervals = Seq.empty[(Long, Long, Long)].toDF("rid", "rs", "re")
    assert(RangeJoin.intervalOverlapJoin(
      intervals.toDF("lid", "ls", "le"), "ls", "le",
      noIntervals, "rs", "re", grid = 8L).count() == 0)
  }

  test("ANN: empty query set and singleton corpus") {
    import spark.implicits._
    val corpus = Seq((1L, Seq.fill(64)(0.5f), 0)).toDF("vec_id", "embedding", "label")
    val noQueries = corpus.filter(col("vec_id") < 0)
    assert(SimilaritySearch.bruteForceTopK(corpus, noQueries, 5).count() == 0)
    // singleton corpus, self excluded → its own query finds nothing
    assert(SimilaritySearch.bruteForceTopK(corpus, corpus, 5).count() == 0)
  }

  test("asOfJoin: empty sides") {
    import spark.implicits._
    val ts0 = new java.sql.Timestamp(0L)
    val left = Seq((1L, 10L, ts0)).toDF("event_id", "user_id", "ts")
    val emptyRight = Seq.empty[(Long, Long, java.sql.Timestamp)]
      .toDF("click_id", "user_id", "ts")
    // no right rows → left row survives with a null match (as-of is a
    // LEFT join by contract)
    val out = AsOfJoin.asOfJoin(left, emptyRight, "user_id", "ts", Seq("click_id"))
    assert(out.count() == 1)
    assert(out.filter(col("matched.click_id").isNull).count() == 1)
    val emptyLeft = left.filter(col("event_id") < 0)
    assert(AsOfJoin.asOfJoin(emptyLeft,
      left.toDF("click_id", "user_id", "ts"), "user_id", "ts", Seq("click_id")).count() == 0)
    // tolerance path on the same degenerate shapes
    val tol = Some(org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"))
    val outTol = AsOfJoin.asOfJoin(left, emptyRight, "user_id", "ts",
      Seq("click_id"), tolerance = tol)
    assert(outTol.count() == 1)
    assert(outTol.filter(col("matched.click_id").isNull).count() == 1)
    assert(AsOfJoin.asOfJoin(emptyLeft, left.toDF("click_id", "user_id", "ts"),
      "user_id", "ts", Seq("click_id"), tolerance = tol).count() == 0)
  }

  test("audio fingerprint: sub-frame clip, silent clip, empty frame") {
    import graft.operators.Multimodal
    // a clip shorter than one 256-sample frame fingerprints to nothing
    val tiny = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
      val pcm = new Array[Byte](100 * 2) // 100 samples < 256
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, 100L),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    assert(Multimodal.audioFingerprint(tiny).isEmpty)
    // a silent (all-zero) clip long enough to frame: total energy is 0,
    // every band must emit the 0xff no-peak sentinel, never divide-by-zero
    val silent = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
      val pcm = new Array[Byte](600 * 2)
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, 600L),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val fps = Multimodal.audioFingerprint(silent)
    assert(fps.nonEmpty)
    assert(fps.forall(_ == -1L)) // 8 × 0xff bytes == all bits set
    // distributed pass over an empty media frame yields an empty result
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Array[Byte])].toDF("media_id", "kind", "bytes")
    assert(Multimodal.audioFingerprints(empty).count() == 0)
  }

  test("audio dedup/match: empty and singleton fingerprint sets") {
    import graft.operators.Multimodal
    import spark.implicits._
    val emptyFps = Seq.empty[(Long, Long, Long)].toDF("media_id", "frame_idx", "fp")
    val oneFps = Seq((1L, 0L, 42L), (1L, 1L, 42L)).toDF("media_id", "frame_idx", "fp")
    // one clip can't pair with itself; empty corpora yield no pairs
    assert(Multimodal.audioNearDupPairs(emptyFps).count() == 0)
    assert(Multimodal.audioNearDupPairs(oneFps).count() == 0)
    // matching: empty query or empty index yields no matches; an
    // all-silence index (sentinel-only) never matches anything
    assert(Multimodal.audioMatches(emptyFps, oneFps).count() == 0)
    assert(Multimodal.audioMatches(oneFps, emptyFps).count() == 0)
    val silentIdx = Seq((9L, 0L, -1L)).toDF("media_id", "frame_idx", "fp")
    val silentQ = Seq((8L, 0L, -1L)).toDF("media_id", "frame_idx", "fp")
    assert(Multimodal.audioMatches(silentQ, silentIdx).count() == 0)
  }

  test("perplexity gate: empty corpus, empty reference slice, no-bigram docs") {
    import graft.operators.PerplexityGate
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(PerplexityGate.nllScores(empty, col("lang") === "en").count() == 0)
    // empty reference slice: the no-op LM scores every bigram at
    // logp = ln(1/1) = 0 → keepExpr keeps every doc WITH bigrams
    val docs = Seq((1L, "two words here", "de"), (2L, "one", "de"))
      .toDF("doc_id", "text", "lang")
    val scored = PerplexityGate.nllScores(docs, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(scored(1L)._2 == 0L) // zero NLL under the degenerate LM
    assert(!scored.contains(2L)) // a one-word doc has no bigrams → absent
  }

  test("fuzzy decontamination: empty train, empty bench, both") {
    import graft.operators.Decontaminate
    for ((t, b) <- Seq((emptyDocs, oneDoc), (oneDoc, emptyDocs), (emptyDocs, emptyDocs)))
      assert(Decontaminate.fuzzyScores(t, b).count() == 0)
    // a doc IS flagged against an identical bench doc (sanity: the
    // machinery is live, the empties above aren't vacuous plumbing)
    val flagged = Decontaminate.fuzzyScores(oneDoc,
        oneDoc.select((col("doc_id") + 100).as("doc_id"), col("text")))
      .collect()
    assert(flagged.length == 1 && flagged.head.getDouble(2) == 1.0)
  }

  test("span surgery: empty train, empty bench, short/empty/verbatim docs") {
    import spark.implicits._
    import graft.operators.Decontaminate
    // empty train → empty frame; empty bench → every doc untouched
    assert(Decontaminate.surgerySpans(emptyDocs, oneDoc).count() == 0)
    val untouched = Decontaminate.surgerySpans(oneDoc, emptyDocs).collect()
    assert(untouched.length == 1)
    assert(untouched.head.getAs[Long]("n_hits") == 0L)
    assert(untouched.head.getAs[Double]("kept_frac") == 1.0)

    val benchText = "alpha beta gamma delta epsilon zeta"
    val train = Seq(
        (1L, "xx"),                      // shorter than nGram → no positions
        (2L, "   "),                     // all-whitespace → zero tokens
        (3L, benchText),                 // verbatim bench → fully excised
        (4L, s"safe words here $benchText trailing tail words end"))
      .toDF("doc_id", "text")
    val bench = Seq((900L, benchText)).toDF("doc_id", "text")
    val out = Decontaminate.surgerySpans(train, bench, nGram = 3, pad = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 4)
    assert(out(1L).getAs[Long]("n_hits") == 0L &&
      out(1L).getAs[String]("cleaned_text") == "xx")
    assert(out(2L).getAs[Long]("n_tokens") == 0L &&
      out(2L).getAs[Double]("kept_frac") == 1.0 &&
      out(2L).getAs[String]("cleaned_text") == "")
    assert(out(3L).getAs[Double]("kept_frac") == 0.0 &&
      out(3L).getAs[String]("cleaned_text") == "")
    // doc 4: bench 3-grams at positions 3..6 → ±1-pad span [2, 10) —
    // "here", the quote, "trailing" excised; the flanks survive
    assert(out(4L).getAs[String]("cleaned_text") == "safe words tail words end")
    assert(out(4L).getAs[Long]("n_spans_removed") == 1L &&
      out(4L).getAs[Long]("removed_tokens") == 8L)
  }

  test("fuzzy decontamination: megabucket guard drops hot band signatures") {
    import spark.implicits._
    import graft.operators.Decontaminate
    // boilerplate corpus: 6 identical train docs and 2 identical bench
    // docs all land in the SAME (band, sig) buckets — the saturated
    // regime where an unguarded pair fanout is |train|×|bench|
    val text = "the same boilerplate sentence repeated across every single document here"
    val train = (1L to 6L).map(i => (i, text)).toDF("doc_id", "text")
    val bench = Seq((100L, text), (101L, text)).toDF("doc_id", "text")
    // default cap: all 12 pairs verify at jaccard 1.0
    val open = Decontaminate.fuzzyScores(train, bench).collect()
    assert(open.length == 6 && open.forall(r =>
      r.getLong(1) == 2L && r.getDouble(2) == 1.0))
    // cap below the bucket sizes: every bucket is hot on the train side
    // (6 > 5) → zero candidates, zero rows — the guard's recall trade is
    // observable and the pair fanout is bounded BY CONSTRUCTION
    assert(Decontaminate.fuzzyScores(train, bench, maxBucket = 5).count() == 0)
    // cap between the two sides (2 ≤ 3 < 6): the bench side survives,
    // the train side's hot buckets still drop → still zero candidates
    assert(Decontaminate.fuzzyScores(train, bench, maxBucket = 3).count() == 0)
  }
}
