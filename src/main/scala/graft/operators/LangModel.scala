package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
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
 *  - token counting is ONE shuffle of O(distinct tokens) rows with
 *    map-side partial aggregation — never O(corpus tokens); the kept
 *    vocabulary is its distributed top-K tail (TakeOrderedAndProject,
 *    ties broken by token so it is deterministic), bounded at
 *    `vocabSize` rows — small enough to COLLECT by construction
 *    (the [[Curate.dsirWeights]] / centroid-matrix argument);
 *  - the total-token scalar comes from a scan-side `sum(size(tokens))`
 *    over the documents — no explode, no second pass over token rows;
 *  - per-token log-probs then ride back into the scoring scan as a map
 *    literal, so scoring is a PURE scan-side projection: zero joins,
 *    zero shuffles, one corpus re-scan (the model IS the broadcast).
 */
object LangModel {

  /** A trained smoothed-unigram model: per-token surprisal map + the OOV
    * surprisal constant. Bounded at `vocabSize` entries, so it rides
    * into any scan as a map literal — [[columnsOf]] are pure scan-side
    * expressions usable in larger compositions (q75). */
  final case class UnigramModel(logp: Map[String, Double], oovSurprisal: Double)

  /** Train on the corpus: one token-count shuffle (map-side partials,
    * O(distinct tokens) rows), a deterministic top-K tail collected
    * driver-side, and a scan-side `sum(size(tokens))` scalar — the
    * corpus token rows are aggregated exactly once. */
  def train(docs: DataFrame, textCol: String, vocabSize: Int = 65536,
            alpha: Double = 0.5): UnigramModel = {
    val toksCol = Text.tokens(col(textCol))
    val base = docs.filter(col(textCol).isNotNull)
    val vocab = base.select(explode(toksCol).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token").asc).limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val nTotal = Option(base.agg(sum(size(toksCol)).cast("double").as("n"))
      .head().get(0)).fold(0.0)(_.asInstanceOf[Double])
    val denom = nTotal + alpha * (vocab.length + 1)
    UnigramModel(
      vocab.map { case (t, c) => t -> -math.log((c + alpha) / denom) }.toMap,
      -math.log(alpha / denom))
  }

  /** The three scoring expressions over a tokens array column:
    * (n_tokens, avg_surprisal (4dp), oov_frac (6dp)) — pure projections. */
  def columnsOf(model: UnigramModel, toksCol: Column): (Column, Column, Column) = {
    // try_element_at, not element_at: OOV lookups MISS by design and
    // ANSI-mode element_at throws on a missing map key
    val m = typedlit(model.logp)
    val perTok = transform(toksCol, t => try_element_at(m, t))
    (size(toksCol).cast("long"),
      round(aggregate(perTok, lit(0.0),
        (acc, s) => acc + coalesce(s, lit(model.oovSurprisal))) /
        size(toksCol), 4),
      round(aggregate(perTok, lit(0.0),
        (acc, s) => acc + when(s.isNull, 1.0).otherwise(0.0)) /
        size(toksCol), 6))
  }

  /** Per-document unigram surprisal under the corpus's own distribution:
    * (id, n_tokens, avg_surprisal, oov_frac). `avg_surprisal` is the mean
    * negative natural log-probability per token (≈ ln perplexity),
    * accumulated in token order and rounded to 4dp (the oracle differs
    * only by sum order, absorbed like q23); `oov_frac` the fraction of
    * tokens outside the kept vocabulary, rounded to 6dp. NULL-text
    * documents are dropped. */
  def surprisal(docs: DataFrame, idCol: String, textCol: String,
                vocabSize: Int = 65536, alpha: Double = 0.5): DataFrame = {
    val model = train(docs, textCol, vocabSize, alpha)
    val (n, s, oov) = columnsOf(model, Text.tokens(col(textCol)))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), n.as("n_tokens"), s.as("avg_surprisal"),
        oov.as("oov_frac"))
  }
}
