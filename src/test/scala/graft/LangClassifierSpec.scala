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
}
