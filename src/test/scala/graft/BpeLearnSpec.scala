package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.BpeLearn

/** Parity against a textbook BPE implementation (Sennrich et al. 2016):
  * the reference learner below is the literal algorithm — symbol lists,
  * a Counter over adjacent pairs, argmax with (count desc, pair asc)
  * tiebreak, left-to-right non-overlapping merge — and the distributed
  * learner plus the replace-chain applier must reproduce it exactly,
  * including on repeat-heavy strings where overlap handling diverges in
  * sloppy implementations ("aaaa" must merge to [aa, aa], "aaa" to
  * [aa, a], and pair COUNTING stays overlap-inclusive).
  */
class BpeLearnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // --- textbook reference (driver-side, plain Scala) ---

  private def refMergeOnce(syms: List[String], p: (String, String)): List[String] =
    syms match {
      case a :: b :: rest if (a, b) == p => (a + b) :: refMergeOnce(rest, p)
      case a :: rest => a :: refMergeOnce(rest, p)
      case Nil => Nil
    }

  private def refSymbols(word: String): List[String] =
    word.replace("/", "").map(_.toString).toList

  private def refLearn(words: Seq[(String, Long)], n: Int): List[(String, String, Long)] = {
    var vocab: List[(List[String], Long)] =
      words.map { case (w, f) => (refSymbols(w), f) }.filter(_._1.nonEmpty).toList
    var out = List.empty[(String, String, Long)]
    var exhausted = false
    for (_ <- 1 to n if !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; pair <- syms.zip(syms.tail))
        counts(pair) = counts.getOrElse(pair, 0L) + f
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), c) = counts.toList.minBy { case ((a, b), c) => (-c, a, b) }
        out :+= ((a, b, c))
        vocab = vocab.map { case (syms, f) => (refMergeOnce(syms, (a, b)), f) }
      }
    }
    out
  }

  private def refApply(word: String, merges: Seq[(String, String)]): String = {
    val syms = merges.foldLeft(refSymbols(word))((s, p) => refMergeOnce(s, p))
    if (syms.isEmpty) "" else syms.mkString("/", "//", "/")
  }

  // repeat-heavy plus realistic words plus the '/'-normalization case
  private val corpus = Seq(
    ("aaaa", 10L), ("aaa", 7L), ("abab", 6L), ("the", 20L), ("then", 5L),
    ("there", 4L), ("banana", 3L), ("and/or", 2L), ("low", 9L),
    ("lower", 5L), ("lowest", 3L), ("a", 1L), ("zz", 1L))

  test("learnMerges reproduces the textbook learner, ranks and counts included") {
    import spark.implicits._
    val words = corpus.toDF("w", "freq")
    for (n <- Seq(1, 5, 12)) {
      val got = BpeLearn.learnMerges(words, n)
        .orderBy(col("rank"))
        .select("rank", "lhs", "rhs", "merged", "cnt")
        .as[(Int, String, String, String, Long)].collect().toList
      val want = refLearn(corpus, n).zipWithIndex.map { case ((a, b, c), i) =>
        (i + 1, a, b, a + b, c)
      }
      assert(got == want, s"n=$n")
    }
  }

  test("bpeSymbols with the learned table reproduces the textbook apply per word") {
    import spark.implicits._
    val words = corpus.toDF("w", "freq")
    val learned = BpeLearn.learnMerges(words, 12)
      .orderBy(col("rank")).select("lhs", "rhs")
      .as[(String, String)].collect().toSeq
    val applied = corpus.map(_._1).toDF("w")
      .select(col("w"), TextFunctions.bpeSymbols(col("w"), learned).as("syms"))
      .as[(String, String)].collect().toMap
    for ((w, _) <- corpus)
      assert(applied(w) == refApply(w, learned), s"word=$w merges=$learned")
  }

  test("exhaustion: fewer merges than requested, no sentinel leakage") {
    import spark.implicits._
    // "ab" admits exactly 1 merge, then nothing remains mergeable
    val got = BpeLearn.learnMerges(Seq(("ab", 3L)).toDF("w", "freq"), 5)
      .select("rank", "lhs", "rhs", "merged", "cnt")
      .as[(Int, String, String, String, Long)].collect().toList
    assert(got == List((1, "a", "b", "ab", 3L)))
  }
}
