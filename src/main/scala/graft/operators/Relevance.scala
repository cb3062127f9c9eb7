package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Corpus relevance / language-model scoring over the `documents` table —
  * the retrieval-side operators an LLM-data pipeline needs next to dedup:
  * BM25 term scoring (retrieval ranking, quality filtering by topicality)
  * and corpus-unigram log-probability (the cheap "perplexity" proxy used
  * to rank crawl documents against a trusted corpus distribution).
  *
  * Scale shape: one explode+groupBy pass over the corpus builds the
  * per-doc and per-term statistics (map-side partial aggregation, one
  * shuffle on the token key); the model tables that join back are
  * vocabulary-sized, so the re-join is a broadcast at any corpus scale
  * where the vocabulary fits an executor (else AQE picks a shuffle join).
  */
object Relevance {

  /** Okapi BM25 of each document against a bag of query terms.
    * Standard parameters k1=1.2, b=0.75; idf = ln(1 + (N−df+0.5)/(df+0.5)).
    * Only documents matching ≥1 term appear in the output.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val dl = docs.select(col(idCol),
      size(tokens(col(textCol))).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = toks.filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")
    val w = idf * (col("tf") * (k1 + 1.0)) / (col("tf") + lit(k1) * norm)
    tf.join(broadcast(dfreq), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), round(sum(w), 6).as("bm25"))
  }

  /** Corpus-unigram log-probability per document: the mean over the doc's
    * token occurrences of ln(count(term)/total_tokens), where the counts
    * come from the corpus itself (every token is in-vocabulary, so no
    * smoothing term changes the ranking). Low scores = rare-word-heavy
    * documents — the cheap quality/outlier signal.
    */
  def unigramLogProb(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val counts = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("total"))
    toks.join(counts, "term")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("c").cast("double") / col("total").cast("double"))), 6)
          .as("avg_logprob"))
  }

  /** Per-document top-`topK` terms by smoothed TF-IDF
    * (tf · (ln((N+1)/(df+1)) + 1) — the sklearn-style smooth idf, never
    * negative, so single-doc corpora still rank). The keyword-extraction /
    * doc-representation primitive next to [[bm25]]'s query-scoring form.
    *
    * Ranking happens on the ROUNDED score (6 dp) with the term string as
    * the tie-break: (tf, df) collisions are common (every tf=1 term of a
    * given df scores identically), and rounding-before-ranking keeps the
    * order reproducible across engines computing ln in different libms.
    *
    * Scale shape: tf is one shuffle on (doc, term) with map-side partial
    * aggregation; df rides a `count` WINDOW over the term partition of
    * that same tf frame — the corpus is tokenized ONCE, nothing
    * vocabulary-sized is aggregated on or broadcast from the driver (a
    * term dictionary is unbounded at corpus scale, so a broadcast build
    * is the wrong shape even when it fits at test SF). A term's window
    * group holds df rows — one per DOCUMENT containing it, not per
    * occurrence — and WindowExec's buffer spills, so stopword groups
    * degrade to disk, never OOM. The top-K is a per-doc window that
    * Spark 4 executes with WindowGroupLimit (per-partition heap, no
    * full sort of the corpus).
    */
  def tfidfTopTerms(docs: DataFrame, topK: Int = 5, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val idf = log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf") * idf, 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("rank"), col("term"), col("tfidf"))
  }
}
