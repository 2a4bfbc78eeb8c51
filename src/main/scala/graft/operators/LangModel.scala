package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus-trained unigram language-model scoring — the perplexity-proxy
 * quality signal of LLM-corpus pipelines (the CCNet/Gopher "LM filter"
 * tier, next to [[graft.functions.Text]]'s rule-based scores; corpus
 * posture per reference README.md:45-47): documents whose tokens are
 * improbable under the corpus's own unigram distribution score high
 * surprisal and get filtered or down-weighted.
 *
 * Model: add-α smoothed unigram over the top-`vocabSize` tokens;
 * everything outside the kept vocabulary is one OOV bucket.
 *   p(t)   = (c(t) + α) / (N + α·(K + 1))   for kept t
 *   p(OOV) =       α    / (N + α·(K + 1))
 * where N = total corpus tokens, K = kept vocabulary size. (The tail's
 * lumping slightly under-normalizes — standard for a filter signal; the
 * ORDER of document scores is what the pipeline consumes.)
 *
 * Scale shape at 100 TB:
 *  - token counting is one shuffle of O(distinct tokens) rows with
 *    map-side partial aggregation — never O(corpus tokens);
 *  - the kept vocabulary is a distributed top-K (TakeOrderedAndProject,
 *    ties broken by token so it is deterministic) bounded at `vocabSize`
 *    rows — small enough to broadcast BY CONSTRUCTION, whatever the
 *    corpus size;
 *  - scoring joins each token against the broadcast vocab and aggregates
 *    per document. A document's exploded tokens never leave the partition
 *    that scanned it, so the per-doc partial collapses map-side and the
 *    final shuffle carries O(docs) rows, not O(tokens).
 */
object LangModel {

  /** Per-document unigram surprisal under the corpus's own distribution:
    * (id, n_tokens, avg_surprisal, oov_frac). `avg_surprisal` is the mean
    * negative natural log-probability per token (≈ ln perplexity),
    * rounded to 4dp; `oov_frac` the fraction of tokens outside the kept
    * vocabulary, rounded to 6dp. NULL-text documents are dropped. */
  def surprisal(docs: DataFrame, idCol: String, textCol: String,
                vocabSize: Int = 65536, alpha: Double = 0.5): DataFrame = {
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), explode(Text.tokens(col(textCol))).as("token"))
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val vocab = counts.orderBy(col("c").desc, col("token").asc).limit(vocabSize)
    // corpus scalars ride in as a broadcast single row (the q23 corpus-
    // stats shape): total tokens over ALL of counts, kept-vocab size K
    val stats = counts.agg(sum(col("c")).cast("double").as("n_total"))
      .crossJoin(vocab.agg(count(lit(1)).cast("double").as("k_vocab")))
    val denom = col("n_total") + lit(alpha) * (col("k_vocab") + lit(1.0))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .select(col("id"),
        (-log((coalesce(col("c"), lit(0L)).cast("double") + lit(alpha)) / denom))
          .as("s"),
        col("c").isNull.cast("double").as("oov"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("s")), 4).as("avg_surprisal"),
        round(avg(col("oov")), 6).as("oov_frac"))
      .withColumnRenamed("id", idCol)
  }
}
