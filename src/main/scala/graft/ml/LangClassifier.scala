package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Model-based language identification: a hashed-feature linear
  * classifier with per-language weight vectors, trained ON THE CORPUS
  * it classifies (the fastText-style supervised head that follows the
  * cheap function-word pre-pass `TextFunctions.predictLang` in a real
  * curation pipeline; Joulin et al. 2016 is the public reference — the
  * reference engine has nothing comparable, this is beyond-reference
  * LLM-pipeline surface).
  *
  * Model: per class c, the per-doc score is the MEAN smoothed training
  * frequency of the doc's hashed unigrams,
  *   score_c(doc) = Σ_t (n(c, h_t) + 1) / (T_c + V)
  * (n = training count of feature h in class c, T_c = class token
  * total, V = hashed-vocabulary size) — the arithmetic-mean variant of
  * unigram Naive Bayes. The variant is chosen deliberately: each class
  * score is ONE integer numerator over ONE integer denominator, so the
  * argmax is decided by cross-multiplied integer comparisons in
  * decimal(38,0) — bit-exact in any engine, where a log-likelihood sum
  * would hang the label on last-ulp float behavior. Ties break to the
  * lexicographically-first class code; the numerators stay longs (they
  * are bounded by doc tokens × max class count), only the cross
  * products widen to decimal.
  *
  * Scale shape: training is one map-side-combined count over
  * (feature, class) with cardinality ≤ `dims` × classes — bounded by
  * construction, BROADCAST to the predict join regardless of corpus
  * size; prediction is explode → broadcast-join → one per-doc sum.
  * Nothing shuffles with corpus-sized keys except the per-doc
  * aggregate itself. At 100 TB the weight table is still `dims` rows.
  */
object LangClassifier {

  /** Hashed feature id in [0, dims): first 8 md5 hex chars as an
    * unsigned 32-bit int, reduced mod dims (engine-portable — the
    * oracle inlines the same expression).
    */
  def featureHash(tok: Column, dims: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % dims

  /** Train on (textCol, langCol) and predict every document's language.
    * Returns (doc_id, langCol, pred_lang, correct) — all strings/ints,
    * no float in any output or decision.
    *
    * `classes` must cover the label set (unknown labels train nothing
    * and can never be predicted).
    */
  def trainPredict(docs: DataFrame, textCol: String = "text",
      langCol: String = "lang", dims: Int = 262144,
      classes: Seq[String] = Seq("de", "en", "es", "fr", "zh")): DataFrame =
    predictions(docs, textCol, langCol, dims, classes, isTrain = lit(true))
      .select(col("doc_id"), col(langCol), col("pred_lang"), col("correct"))

  /** The realistic deployment shape: train on the labeled slice, score
    * EVERY doc — the holdout rows are predicted exactly as an unlabeled
    * 100 TB corpus would be (their labels touch nothing but the
    * `correct` column). The split is t16's content-addressed md5 bucket
    * (`TextFunctions.sampleBucket`): deterministic, engine-portable,
    * RNG-free — bucket < trainPct trains.
    *
    * Returns (doc_id, langCol, split, pred_lang, correct) with
    * split ∈ {train, holdout}; holdout accuracy (aggregate `correct`
    * over split='holdout') is the generalization measure, which the
    * same-corpus `trainPredict` cannot give.
    */
  def trainPredictHoldout(docs: DataFrame, textCol: String = "text",
      langCol: String = "lang", dims: Int = 262144,
      classes: Seq[String] = Seq("de", "en", "es", "fr", "zh"),
      trainPct: Int = 80): DataFrame = {
    require(trainPct >= 1 && trainPct <= 99, s"trainPct=$trainPct out of (0,100)")
    val isTrain = graft.functions.TextFunctions.sampleBucket(col("doc_id")) < trainPct
    predictions(docs, textCol, langCol, dims, classes, isTrain)
      .select(col("doc_id"), col(langCol),
        when(isTrain, "train").otherwise("holdout").as("split"),
        col("pred_lang"), col("correct"))
  }

  /** Shared scoring core: weights/vocab/class totals come from the
    * `isTrain` slice only; every doc is scored. Features unseen in
    * training contribute smoothing mass only (LEFT join + coalesce-0 —
    * with isTrain ≡ true that is exactly the old inner join, so
    * `trainPredict` output is bit-identical to the pre-holdout code).
    */
  private def predictions(docs: DataFrame, textCol: String, langCol: String,
      dims: Int, classes: Seq[String], isTrain: Column): DataFrame = {
    require(classes == classes.sorted && classes.nonEmpty,
      "classes must be sorted (the tiebreak contract) and non-empty")
    val feats = docs
      .select(col("doc_id"), col(langCol).as("__lang"), isTrain.as("__train"),
        explode(tokens(col(textCol))).as("t"))
      .select(col("doc_id"), col("__lang"), col("__train"),
        featureHash(col("t"), dims).as("h"))

    // weight table: one row per feature hash observed IN TRAINING, one
    // count column per class — cardinality ≤ dims, broadcast below
    val classCounts = classes.map(c =>
      sum(when(col("__lang") === c, 1L).otherwise(0L)).as(s"n_$c"))
    val weights = feats.filter(col("__train")).groupBy(col("h"))
      .agg(classCounts.head, classCounts.tail: _*)

    // class totals and vocabulary size: a ONE-ROW frame, broadcast into
    // the scoring projection (no driver collect in the plan)
    val totalCols = classes.map(c => sum(col(s"n_$c")).as(s"t_$c")) :+
      count(lit(1)).as("v")
    val totals = weights.agg(totalCols.head, totalCols.tail: _*)

    // per-doc numerators: s_c = Σ_t n(c, h_t) + n_tokens (the +1
    // smoothing summed over tokens; unseen features count 0)
    val docSums = classes.map(c =>
      sum(coalesce(col(s"n_$c"), lit(0L))).as(s"sum_$c")) :+
      count(lit(1)).as("n_toks")
    val perDoc = feats
      .join(broadcast(weights), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(docSums.head, docSums.tail: _*)

    val scored = perDoc.crossJoin(broadcast(totals))
    val dec = "decimal(38,0)"
    // fold to the best (code, numerator, denominator) — strictly-greater
    // cross-multiplied comparison, so equal rationals keep the earlier
    // (lexicographically first) class
    val cands = classes.map { c =>
      struct(lit(c).as("code"),
        (col(s"sum_$c") + col("n_toks")).cast(dec).as("num"),
        (col(s"t_$c") + col("v")).cast(dec).as("den"))
    }
    val best = cands.reduce { (a, b) =>
      when(b("num") * a("den") > a("num") * b("den"), b).otherwise(a)
    }
    docs.select(col("doc_id"), col(langCol))
      .join(scored.select(col("doc_id"), best("code").as("pred_lang")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col(langCol),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"))
      .withColumn("correct", (col(langCol) === col("pred_lang")).cast("int"))
  }
}
