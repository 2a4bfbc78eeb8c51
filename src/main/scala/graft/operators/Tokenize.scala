package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Tokenizer-induction operators: the corpus-statistics side of training a
 * subword vocabulary (BPE, Sennrich et al. 2016 — "Neural Machine
 * Translation of Rare Words with Subword Units"). A BPE trainer is an
 * iterated reduction: count adjacent symbol pairs weighted by word
 * frequency, merge the argmax, repeat. The count step is the part that
 * touches the corpus, and the part that must scale; the merge loop itself
 * operates on the (tiny) distinct-word table.
 *
 * Scale shape: the corpus collapses to the DISTINCT-WORD frequency table
 * in one map-side-combined aggregate (the word count shuffle moves one
 * (word, count) row per distinct word, never per token — the classic
 * heavy-tail win: a 100 TB corpus has ~1e7 distinct words), and pair
 * extraction runs over that table, so the pair-count shuffle is bounded
 * by distinct words × avg word length with 2-char keys. No explode of
 * the corpus, no window, no join anywhere.
 */
object Tokenize {

  /**
   * One BPE count step at the character level: adjacent character-pair
   * frequencies over the corpus, weighted by word frequency — the
   * statistic whose argmax is the next BPE merge. Returns the top
   * `topK` pairs as (pair, cnt), deterministically tie-broken by pair
   * string ascending (TakeOrderedAndProject — no global sort
   * materializes, no partition-less window).
   *
   * Words are whitespace tokens ([[Text.tokens]]); single-character
   * words carry no pairs and are dropped before the word aggregate.
   */
  def bpePairCounts(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK >= 1, "topK must be positive")
    val words = docs.filter(col(textCol).isNotNull)
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    words
      // char_length(w) >= 2 here, so the sequence is always ascending
      .select(explode(expr(
        "transform(sequence(1, char_length(w) - 1), i -> substr(w, i, 2))"))
        .as("pair"), col("c"))
      .groupBy(col("pair")).agg(sum(col("c")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(topK)
  }
}
