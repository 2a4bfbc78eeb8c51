package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * BM25 full-text relevance scoring (reference README.md:61,117 — the
 * lexical half of the hybrid BM25+vector search; no Spark built-in exists).
 *
 * Okapi BM25 with the standard (+1-smoothed) idf:
 *   idf(t)  = ln( (N - df + 0.5) / (df + 0.5) + 1 )
 *   s(d,q)  = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
 *
 * Plan shape: one explode + one groupBy(doc,term) for term frequencies; df
 * and (N, avgdl) are tiny aggregates broadcast back — the corpus is never
 * shuffled twice and the query terms are a broadcast semi-join filter.
 */
object Bm25 {

  val K1 = 1.2
  val B  = 0.75

  /** Per-(doc, term) BM25 components for the whole corpus. */
  def termStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      explode(Text.tokens(col(textCol))).as("term"))
    toks.groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"))
  }

  /**
   * Precomputed corpus statistics for repeated interactive queries (the
   * reference's P95 < 1.5 s similar-cases SLO, README.md:87,139, depends
   * on not re-scanning the corpus per query). `tf` and `dl` are cached;
   * each [[scoreIndexed]] call then touches only the postings of its own
   * query terms. Build once per corpus version; at cluster scale persist
   * `tf` bucketed by term instead of caching.
   */
  final case class Index(tf: DataFrame, dl: DataFrame)

  def buildIndex(docs: DataFrame, idCol: String, textCol: String): Index = {
    val tf = termStats(docs, idCol, textCol).cache()
    val dl = docs.select(col(idCol).as("doc"),
      size(Text.tokens(col(textCol))).cast("double").as("dl")).cache()
    Index(tf, dl)
  }

  /** Score `queryTerms` against a prebuilt [[Index]]. */
  def scoreIndexed(index: Index, queryTerms: Seq[String],
                   k1: Double = K1, b: Double = B): DataFrame = {
    val corpus = index.dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val dfreq = index.tf.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(
      (col("n_docs").cast("double") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0))
    val tfNorm = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    index.tf.filter(col("term").isin(queryTerms: _*))
      .join(broadcast(dfreq), "term")
      .join(broadcast(index.dl), "doc")
      .crossJoin(broadcast(corpus))
      .select(col("doc"), col("term"), (idf * tfNorm).as("contrib"))
      .groupBy(col("doc"))
      .agg(round(sum(col("contrib")), 4).as("bm25"))
  }

  /** Scores every document against `queryTerms`; returns (doc, score) for
    * docs matching ≥1 term, higher = more relevant. One-shot form of
    * [[buildIndex]] + [[scoreIndexed]] without caching. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            queryTerms: Seq[String], k1: Double = K1, b: Double = B): DataFrame = {
    val tf = termStats(docs, idCol, textCol)
    val dl = docs.select(col(idCol).as("doc"),
      size(Text.tokens(col(textCol))).cast("double").as("dl"))
    scoreIndexed(Index(tf, dl), queryTerms, k1, b)
  }
}
