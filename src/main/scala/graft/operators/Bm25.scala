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
 * Index layout is built for the interactive P95 SLO (README.md:87,139):
 * `postings` carries (doc, term, tf, dl) — doc length baked into the
 * posting row — `docFreq` is the per-term document frequency (vocabulary-
 * sized), and the corpus constants (N, avgdl) are collected into plan
 * literals at assembly. A warm query therefore runs ONE scan of the
 * cached postings (pruned by the term filter) plus a vocabulary-row
 * broadcast: no per-call broadcast of a corpus-sized doc-length table,
 * no per-call corpus statistics job. At cluster scale persist `postings`
 * bucketed by term instead of caching.
 */
object Bm25 {

  val K1 = 1.2
  val B  = 0.75

  /** Per-(doc, term) term frequencies for the whole corpus. */
  def termStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      explode(Text.tokens(col(textCol))).as("term"))
    toks.groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"))
  }

  /** Per-doc token counts (as DOUBLE, the BM25 `dl`). */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
      size(Text.tokens(col(textCol))).cast("double").as("dl"))

  /**
   * Prebuilt index state. `close()` releases the cached frames — the
   * caller owns the lifecycle (repeated interactive queries reuse the
   * caches until then).
   */
  final case class Index(postings: DataFrame, docFreq: DataFrame,
                         nDocs: Long, avgdl: Double) {
    def close(): Unit = { postings.unpersist(); docFreq.unpersist(); () }
  }

  /** Assemble an [[Index]] from term-frequency and doc-length frames
    * (e.g. the incrementally-upserted state written by
    * [[graft.streaming.Streams.incrementalSearchIndex]]). Runs one tiny
    * stats job eagerly; caching is the interactive-path option. */
  def assemble(tf: DataFrame, dl: DataFrame, cache: Boolean = true): Index = {
    val postings0 = tf.join(dl, "doc")
    val postings = if (cache) postings0.cache() else postings0
    val docFreq0 = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val docFreq = if (cache) docFreq0.cache() else docFreq0
    val stats = dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")).head()
    Index(postings, docFreq,
      stats.getLong(0), if (stats.isNullAt(1)) 0.0 else stats.getDouble(1))
  }

  def buildIndex(docs: DataFrame, idCol: String, textCol: String): Index =
    assemble(termStats(docs, idCol, textCol), docLengths(docs, idCol, textCol))

  /** Score `queryTerms` against a prebuilt [[Index]]: one pruned scan of
    * the postings + a vocabulary-row broadcast.
    *
    * Query terms enter as broadcast DATA (a semi-join), not IN-list
    * literals: repeated interactive calls then share byte-identical
    * generated code, so whole-stage-codegen classes are compiled once and
    * served from the Janino cache instead of recompiled per query — the
    * difference between a ~1 s and a sub-second warm call. */
  def scoreIndexed(index: Index, queryTerms: Seq[String],
                   k1: Double = K1, b: Double = B): DataFrame = {
    val spark = index.postings.sparkSession
    import spark.implicits._
    val termsDf = broadcast(queryTerms.distinct.toDF("term"))
    val idf = log(
      (lit(index.nDocs).cast("double") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0))
    val tfNorm = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(index.avgdl)))
    index.postings.join(termsDf, Seq("term"), "left_semi")
      .join(broadcast(index.docFreq.join(termsDf, Seq("term"), "left_semi")), "term")
      .select(col("doc"), col("term"), (idf * tfNorm).as("contrib"))
      .groupBy(col("doc"))
      .agg(round(sum(col("contrib")), 4).as("bm25"))
  }

  /**
   * TF-IDF keyword extraction: the top `k` terms per document by
   * `tf · ln(N/df)` (term tiebreak). The rank filter compiles to
   * WindowGroupLimit (per-partition pre-pruning before the doc shuffle);
   * df and N are tiny broadcast aggregates — the corpus is shuffled once
   * for tf and once for the per-doc ranking.
   */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = termStats(docs, idCol, textCol)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val tfidf = col("tf").cast("double") *
      log(col("n_docs").cast("double") / col("df").cast("double"))
    val w = Window.partitionBy(col("doc")).orderBy(col("tfidf").desc, col("term").asc)
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(n))
      .select(col("doc"), col("term"), round(tfidf, 6).as("tfidf"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Scores every document against `queryTerms`; returns (doc, score) for
    * docs matching ≥1 term, higher = more relevant. One-shot uncached
    * form of [[buildIndex]] + [[scoreIndexed]]. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            queryTerms: Seq[String], k1: Double = K1, b: Double = B): DataFrame =
    scoreIndexed(
      assemble(termStats(docs, idCol, textCol), docLengths(docs, idCol, textCol),
        cache = false),
      queryTerms, k1, b)
}
