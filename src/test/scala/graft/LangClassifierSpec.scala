package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.LangClassifier

/** The hashed-linear language classifier must actually LEARN: on a
  * fixture whose text is language-dependent (unlike the synthetic
  * corpus, whose `lang` column is uncorrelated noise over a shared
  * vocabulary — chance accuracy there is a property of the data, not
  * the model), training on the corpus recovers every label. Also pins
  * the decision-path contracts: determinism, the no-token fallback,
  * and the sorted-classes tiebreak requirement.
  */
class LangClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  // three docs per language, genuinely language-distinct function words;
  // held-out word mixtures ("vin de la", "das haus und") stress overlap
  private val corpus = Seq(
    (1L, "en", "the cat sat on the mat and the dog slept in the sun"),
    (2L, "en", "a house of cards is not a home for the brave and the free"),
    (3L, "en", "to be or not to be is the question of the day"),
    (4L, "de", "der hund und die katze schlafen in dem haus und dem garten"),
    (5L, "de", "das ist ein gutes buch und der mann liest es zu hause"),
    (6L, "de", "die sonne scheint und der regen ist weit weg von hier"),
    (7L, "fr", "le chat dort sur le tapis et le chien joue dans le jardin"),
    (8L, "fr", "un verre de vin et du pain avec le fromage de la region"),
    (9L, "fr", "la mer est belle et le ciel est bleu au dessus de la plage"))

  test("recovers every label on a language-dependent corpus") {
    val out = LangClassifier.trainPredict(docsDf(corpus),
        classes = Seq("de", "en", "fr"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
    assert(out.length == corpus.length)
    out.foreach { case (id, lang, pred, correct) =>
      assert(pred == lang, s"doc $id: predicted $pred, labeled $lang")
      assert(correct == 1)
    }
  }

  test("deterministic across runs; docs with no tokens fall back to 'und'") {
    val withEmpty = corpus :+ (10L, "en", "")
    val run1 = LangClassifier.trainPredict(docsDf(withEmpty),
      classes = Seq("de", "en", "fr")).collect().toSeq.sortBy(_.getLong(0))
    val run2 = LangClassifier.trainPredict(docsDf(withEmpty),
      classes = Seq("de", "en", "fr")).collect().toSeq.sortBy(_.getLong(0))
    assert(run1 == run2)
    val empty = run1.find(_.getLong(0) == 10L).get
    assert(empty.getString(2) == "und" && empty.getInt(3) == 0)
  }

  test("unsorted class list is rejected (the tiebreak contract)") {
    intercept[IllegalArgumentException] {
      LangClassifier.trainPredict(docsDf(corpus), classes = Seq("en", "de", "fr"))
    }
  }

  // a larger multilingual fixture for the holdout test: per language,
  // deterministic sliding windows over a language-specific vocabulary —
  // every doc's token SET differs, so a holdout doc is never a verbatim
  // copy of a training doc and correct holdout labels require the
  // learned per-language vocabulary weights, not memorization
  private val vocab = Map(
    "en" -> "the cat sat on mat and dog slept in sun house of cards is not home for brave free question day".split(" "),
    "de" -> "der hund und die katze schlafen in dem haus garten das ist ein gutes buch mann liest es zu hause".split(" "),
    "fr" -> "le chat dort sur tapis et chien joue dans jardin un verre de vin du pain avec fromage la region".split(" "))
  private val bigCorpus: Seq[(Long, String, String)] =
    vocab.toSeq.sortBy(_._1).zipWithIndex.flatMap { case ((lang, words), li) =>
      (0 until 40).map { i =>
        val text = (0 until 8).map(j => words((i + j * 3) % words.length)).mkString(" ")
        (li * 100L + i, lang, text)
      }
    }

  test("holdout: both splits populated, train slice learned, holdout generalizes") {
    val out = LangClassifier.trainPredictHoldout(docsDf(bigCorpus),
        classes = Seq("de", "en", "fr"), trainPct = 80)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getInt(4)))
    assert(out.length == bigCorpus.length)
    val bySplit = out.groupBy(_._3)
    assert(bySplit.keySet == Set("train", "holdout"))
    val holdout = bySplit("holdout")
    // majority-class accuracy on a 3-way balanced corpus is ~1/3; the
    // learned model must clear it decisively on docs it never trained on
    val hAcc = holdout.count(_._5 == 1).toDouble / holdout.length
    assert(hAcc > 0.9, s"holdout accuracy $hAcc over ${holdout.length} docs")
  }

  test("holdout split matches the t16 sampleBucket contract exactly") {
    import spark.implicits._
    val got = LangClassifier.trainPredictHoldout(docsDf(bigCorpus),
        classes = Seq("de", "en", "fr"), trainPct = 80)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("split"))
    val expect = docsDf(bigCorpus).select(
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.when(
        graft.functions.TextFunctions.sampleBucket(
          org.apache.spark.sql.functions.col("doc_id")) < 80, "train")
        .otherwise("holdout").as("split"))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }
}
