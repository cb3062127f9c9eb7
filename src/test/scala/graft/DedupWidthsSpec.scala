package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The production dedup-width dials (VERDICT r9 "what's missing" #1):
  * `curation.minhash.*` / `curation.simhash.*` / `curation.nearDupMethod`
  * conf keys must parse, and an override must OBSERVABLY change the
  * curation entry points' behavior — candidate set, near-dup stage
  * attribution, and the stream app's persisted band index.
  */
class DedupWidthsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private val confText =
    """
      |curation {
      |        nearDupMethod = "minhash"
      |        minhash.numPerms = "128"
      |        minhash.numBands = "32"
      |        simhash.bits = "64"
      |        simhash.bucketBits = "10"
      |        simhash.maxHamming = "4"
      |    }
      |""".stripMargin

  test("fromConfig: the curation.* width keys parse; missing keys are fixture widths") {
    val w = DedupWidths.fromConfig(GraftConfig.parse(confText))
    assert(w == DedupWidths("minhash", 128, 32, 64, 10, 4))
    assert(DedupWidths.fromConfig(GraftConfig.empty) == DedupWidths.default)
    assert(DedupWidths.default ==
      DedupWidths("minhash", Dedup.NumPerms, Dedup.NumBands, Dedup.SimHashBits, 12, 3))
    intercept[IllegalArgumentException] {
      DedupWidths.fromConfig(GraftConfig.parse(
        "curation { nearDupMethod = \"sketchy\" }"))
    }
  }

  test("width override changes the candidate set (prefix-stable: narrower ⊂ wider)") {
    val docs = graft.sources.Catalog.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    def pairs(w: DedupWidths) = w.candidatePairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrow = pairs(DedupWidths.default.copy(numPerms = 4, numBands = 1))
    val fixture = pairs(DedupWidths.default)
    val wide = pairs(DedupWidths.default.copy(numPerms = 128, numBands = 32))
    // permsFor is prefix-stable, so fewer bands can only LOSE pairs and
    // more bands can only ADD them; the fixture makes the first loss real
    assert(narrow.subsetOf(fixture) && narrow.size < fixture.size,
      s"narrow=${narrow.size} fixture=${fixture.size}")
    assert(fixture.subsetOf(wide))
    // the simhash method is a genuinely different generator
    val sh = pairs(DedupWidths.default.copy(method = "simhash"))
    assert(sh != fixture && sh.nonEmpty)
  }

  test("CurateApp plumbs widths: the near_dup stage reacts to the override") {
    def nearDups(w: DedupWidths) =
      CurateApp.tagged(spark, sfDir, widths = w)
        .filter(col("stage") === "near_dup")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val fixture = nearDups(DedupWidths.default)
    val narrow = nearDups(DedupWidths.default.copy(numPerms = 4, numBands = 1))
    assert(narrow.subsetOf(fixture) && narrow.size < fixture.size,
      s"narrow=${narrow.size} fixture=${fixture.size}")
    // production MinHash widths and the simhash method both run the full
    // pipeline green (the attrition stages still partition the corpus)
    for (w <- Seq(DedupWidths.default.copy(numPerms = 128, numBands = 32),
        DedupWidths.default.copy(method = "simhash", simhashBits = 64))) {
      val frame = CurateApp.tagged(spark, sfDir, widths = w)
      assert(frame.count() ==
        graft.sources.Catalog.documents(spark, sfDir).count())
      assert(frame.filter(col("stage") === "kept").count() > 0)
    }
  }

  test("CurateStreamApp plumbs widths: the persisted band index has numBands bands") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("widths_state_").toString
    val outDir = java.nio.file.Files.createTempDirectory("widths_out_").toString
    val batch = (1L to 6L).map(i =>
      (i, s"document number $i with plenty of distinct tokens so the quality gate " +
        s"passes and shingles exist for banding purposes $i $i"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val conf = GraftConfig.parse(
      "curation { minhash.numPerms = \"128\"\nminhash.numBands = \"32\" }")
    CurateStreamApp.processBatch(spark, batch, stateDir, outDir, conf)
    val bands = spark.read.parquet(s"$stateDir/corpus_state/bands")
    assert(bands.select("band").distinct().count() == 32)
    assert(bands.agg(max(col("band"))).head().getInt(0) == 31)
  }
}
