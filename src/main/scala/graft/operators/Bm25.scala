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
 * the SERVING layout `byTerm` is one row per TERM —
 * (term, df, plist: array<(doc, tf, dl)>) — range-partitioned and
 * sorted by term in the columnar cache, so a query's literal
 * `term IN (...)` filter prunes whole cached batches by their min/max
 * stats and the scan touches only the handful of batches covering the
 * query terms. A warm call is therefore: pruned vocabulary scan →
 * explode the ≤|terms| matched posting lists → per-doc sum. No join at
 * all — df rides on the vocabulary row, dl is baked into each posting,
 * and the corpus constants (N, avgdl) are plan literals collected at
 * assembly. (The flat (doc, term, tf, dl) `postings` form scanned the
 * WHOLE corpus's postings per call — the profiled warm path spent
 * 10-30 s of task time per query on that scan at the 200k-doc SLO
 * corpus; the grouped layout reads ~3 vocabulary batches instead.)
 * At cluster scale persist `byTerm` bucketed by term instead of
 * caching — the pruning story is then file-level instead of
 * cache-batch-level, same shape.
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
   * Prebuilt index state. `byTerm` is the cached serving layout (see the
   * object scaladoc); `postings` / `docFreq` remain available as LAZY
   * flat views for interop and audits (never cached — the serving path
   * doesn't touch them). `close()` releases the cache — the caller owns
   * the lifecycle (repeated interactive queries reuse it until then).
   */
  final case class Index(postings: DataFrame, docFreq: DataFrame,
                         byTerm: DataFrame,
                         nDocs: Long, avgdl: Double) {
    def close(): Unit = { byTerm.unpersist(); () }
  }

  /** Assemble an [[Index]] from term-frequency and doc-length frames
    * (e.g. the incrementally-upserted state written by
    * [[graft.streaming.Streams.incrementalSearchIndex]]). Runs one tiny
    * stats job eagerly; caching is the interactive-path option.
    *
    * `byTerm` is range-partitioned + sorted by term before caching so
    * each in-memory columnar batch covers a TIGHT term range — the
    * per-call `term IN (...)` literal filter then skips every
    * non-overlapping batch via the cache's batch min/max stats.
    *
    * `plistShards` bounds the posting-list row: a stop-word-class term
    * appears in nearly every document, and ONE array row per term would
    * put its whole corpus-wide posting list in a single row — fine at
    * serving-cache scale, a 2 GiB-row hazard at 100 TB. With S > 1 the
    * list splits into S `(term, shard)` rows (doc-hash sharded; `df` is
    * the per-TERM total, window-summed at build time), the query plan is
    * unchanged (the term filter matches all S rows, explode
    * concatenates), and scoring is shard-count-invariant — the
    * PropertySpec layout test pins S=1 ≡ S=4 ≡ flat one-shot. */
  def assemble(tf: DataFrame, dl: DataFrame, cache: Boolean = true,
               plistShards: Int = 1): Index = {
    require(plistShards >= 1, "plistShards >= 1")
    val postings = tf.join(dl, "doc")
    val plist = collect_list(struct(col("doc"), col("tf"), col("dl"))).as("plist")
    val byTerm0 =
      if (plistShards == 1)
        postings.groupBy(col("term"))
          .agg(count(lit(1)).as("df"), plist)
      else
        postings
          .groupBy(col("term"),
            pmod(hash(col("doc")), lit(plistShards)).as("shard"))
          .agg(count(lit(1)).as("df_part"), plist)
          .withColumn("df", sum(col("df_part")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("term"))))
          .select(col("term"), col("df"), col("plist"))
    // 8 range partitions: the vocabulary is tiny next to the corpus, so
    // per-call scheduling (one task per cached partition, most pruned to
    // a stats check) matters more than scan parallelism here
    val byTerm =
      if (cache)
        byTerm0.repartitionByRange(8, col("term"))
          .sortWithinPartitions(col("term")).cache()
      else byTerm0
    val docFreq = byTerm.groupBy(col("term")).agg(max(col("df")).as("df"))
    val stats = dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")).head()
    Index(postings, docFreq, byTerm,
      stats.getLong(0), if (stats.isNullAt(1)) 0.0 else stats.getDouble(1))
  }

  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
                 plistShards: Int = 1): Index =
    assemble(termStats(docs, idCol, textCol), docLengths(docs, idCol, textCol),
      cache = true, plistShards = plistShards)

  /** Score `queryTerms` against a prebuilt [[Index]]: one batch-pruned
    * scan of the term-grouped vocabulary, explode the matched posting
    * lists, sum per doc. No join anywhere in the call.
    *
    * Query terms enter as an IN-list of string literals: string literals
    * are codegen REFERENCE objects (not inlined constants), so repeated
    * calls with the same term COUNT share byte-identical generated code
    * — Janino serves them from its cache — while the literal predicate
    * (unlike the previous semi-join) is exactly what the in-memory
    * columnar scan can prune batches with. */
  def scoreIndexed(index: Index, queryTerms: Seq[String],
                   k1: Double = K1, b: Double = B): DataFrame = {
    val idf = log(
      (lit(index.nDocs).cast("double") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0))
    val tf = col("p.tf").cast("double")
    val tfNorm = (tf * lit(k1 + 1.0)) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("p.dl") / lit(index.avgdl)))
    index.byTerm
      .filter(col("term").isin(queryTerms.distinct: _*))
      .select(col("df"), explode(col("plist")).as("p"))
      .select(col("p.doc").as("doc"), (idf * tfNorm).as("contrib"))
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

  /**
   * Exact PHRASE search over positional postings — the adjacency
   * capability bag-of-words BM25 cannot state ("slow hash batch" as a
   * phrase, not three independent terms): the standard positional-
   * inverted-index query every production search engine serves next to
   * term scoring.
   *
   * Plan shape: one `posexplode` builds (doc, pos, tok) postings with
   * the scan-side filter `tok IN phrase` — only the phrase's terms ever
   * leave the scan, so the postings table is term-selective exactly the
   * way a real index probe is. The phrase then folds left: term i's
   * postings are shifted to `pos − i` and equi-joined on (doc, pos) —
   * every join is co-keyed on the same (doc, pos) pair, so after the
   * first shuffle the whole chain is partition-local; a k-word phrase
   * is k−1 such probes regardless of corpus size. Counts are exact
   * integers (occurrences may overlap; each start position counts once).
   *
   * Emits (doc, n_hits) for documents containing the full phrase at
   * least once.
   */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val postings = docs
      .select(col(idCol).as("doc"),
        posexplode(Text.tokens(col(textCol))).as(Seq("pos", "tok")))
      .filter(col("tok").isin(phrase.distinct: _*))
    val first = postings.filter(col("tok") === phrase.head)
      .select(col("doc"), col("pos"))
    val matched = phrase.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (term, i)) =>
        acc.join(postings.filter(col("tok") === term)
          .select(col("doc"), (col("pos") - i).as("pos")), Seq("doc", "pos"))
    }
    matched.groupBy(col("doc")).agg(count(lit(1)).as("n_hits"))
  }
}
