package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for large-scale corpus processing (the
 * lexical layer under BM25/hybrid search, reference README.md:61,117,
 * plus the training-data text-quality surface from the build brief): tokenization,
 * shingling, quality metrics, a stopword-profile language heuristic, and
 * canonical document fingerprints. Pure `Column` expressions — no UDFs —
 * so they vectorize and stay in whole-stage codegen.
 */
object Text {

  /** Whitespace tokenization (single-space corpus convention). */
  def tokens(text: Column): Column = split(text, " ")

  /** Unicode NFC normalization (UAX #15 canonical composition) via the
    * native [[graft.functions.expressions.NfcNormalize]] kernel — Spark
    * has no built-in; a UDF would break codegen on the hottest scan. */
  def nfc(text: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    call_function("graft_nfc", text)
  }

  /** Jaro-Winkler similarity via the native
    * [[graft.functions.expressions.JaroWinkler]] kernel — DuckDB
    * `jaro_winkler_similarity` semantics (boost threshold 0.7, prefix ≤ 4,
    * p = 0.1; empty → 0.0). Spark has no built-in; a UDF would break
    * codegen on the candidate-verification scans this runs in. */
  def jaroWinkler(a: Column, b: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    call_function("graft_jaro_winkler", a, b)
  }

  /** CCNet-style cleaning: NFC → lowercase → collapse whitespace runs →
    * trim. Pure scan-side (kernel + codegen'd built-ins); the q76 oracle
    * is the same composition over DuckDB's `nfc_normalize`. */
  def cleaned(text: Column): Column =
    trim(regexp_replace(lower(nfc(text)), "\\s+", " "))

  /** BPE-ish sub-token count: runs of letters, runs of digits, or single
    * other non-space chars (same regex semantics in Java and RE2). */
  val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(call_function("regexp_extract_all", text, lit(BpePattern), lit(0))).cast("long")

  /** Distinct word n-gram shingles (each shingle = n tokens joined by a
    * space); empty array when the document has fewer than n tokens.
    *
    * Dispatches to the native codegen'd
    * [[graft.functions.expressions.WordShingles]] kernel; [[shinglesHof]]
    * remains as the executable spec it is cross-checked against. */
  def shingles(toks: Column, n: Int): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    call_function("graft_shingles", toks, lit(n))
  }

  /** Higher-order-function shingles (interpreted reference formulation). */
  def shinglesHof(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - lit(n)),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j + 1))): _*))
    when(size(toks) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  /** Small per-language stopword profiles for [[langScores]]. */
  val EnStop: Seq[String] = Seq("the", "a", "of", "to", "in", "and", "is", "it", "on", "for")
  val DeStop: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht", "ich", "zu", "mit", "ein")
  val FrStop: Seq[String] = Seq("le", "la", "de", "et", "un", "une", "est", "pas", "je", "que")

  private def stopHits(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, t => t.isin(stops: _*))).cast("long")

  /** (en, de, fr) stopword-hit counts. */
  def langScores(toks: Column): (Column, Column, Column) =
    (stopHits(toks, EnStop), stopHits(toks, DeStop), stopHits(toks, FrStop))

  /** Greedy language guess from stopword profiles; ties break en > de > fr. */
  def langGuess(toks: Column): Column = {
    val (en, de, fr) = langScores(toks)
    when(en >= de && en >= fr, lit("en"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Sum of token lengths (for mean-token-length quality metrics). */
  def totalTokenLen(toks: Column): Column =
    aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (a, x) => a + x)

  /** Share of tokens that are EN stopwords; NULL for empty docs. */
  def stopwordRatio(toks: Column): Column =
    F.safeDiv(stopHits(toks, EnStop), size(toks))

  /** Canonical content fingerprint: SHA2-256 over the sorted distinct token
    * set — invariant to token order and duplication (bag-of-words dedup key). */
  def fingerprint(toks: Column): Column =
    sha2(concat_ws(" ", array_sort(array_distinct(toks))), 256)

  /** Email pattern shared by the PII scrub and its oracle — plain
    * character classes only, so Java regex (Spark) and RE2 (DuckDB)
    * agree on every match. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Digit runs of 4+ (phone/account/id-shaped). */
  val LongNumberPattern = "[0-9]{4,}"

  /** PII scrub for corpus curation: mask emails then long digit runs
    * (order matters — both engines apply the same sequence). Pure
    * codegen'd `regexp_replace`, global replacement on both engines
    * (DuckDB needs the 'g' flag in the oracle SQL). */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      LongNumberPattern, "<NUM>")

  /**
   * Gopher-style document quality rules over the token metrics (the
   * rule-based corpus filter tier of a training-data pipeline): each rule
   * is a boolean column, `keep` is their conjunction. Thresholds are
   * caller-tunable; defaults follow the usual published ranges scaled to
   * short documents.
   *
   * Returns (rule_len, rule_token_len, rule_stopwords, rule_distinct, keep).
   */
  def qualityRules(toks: Column,
                   minTokens: Int = 10, maxTokens: Int = 100000,
                   minAvgTokenLen: Double = 2.0, maxAvgTokenLen: Double = 12.0,
                   minStopRatio: Double = 0.01,
                   minDistinctRatio: Double = 0.2): (Column, Column, Column, Column, Column) = {
    val n = size(toks)
    val avgLen = totalTokenLen(toks) / n
    val ruleLen = n.between(minTokens, maxTokens)
    val ruleTokenLen = avgLen.between(minAvgTokenLen, maxAvgTokenLen)
    val ruleStop = stopwordRatio(toks) >= minStopRatio
    val ruleDistinct = (size(array_distinct(toks)) / n.cast("double")) >= minDistinctRatio
    val keep = ruleLen && ruleTokenLen && ruleStop && ruleDistinct
    (ruleLen, ruleTokenLen, ruleStop, ruleDistinct, keep)
  }

  /** Fraction of duplicated word n-grams in a document: (total − distinct)
    * / total over the sliding n-grams, 0 when the doc is too short to form
    * any — the Gopher duplicate-n-gram signal (generated/boilerplate text
    * repeats phrases). Pure scan-side column math over the distinct-shingle
    * kernel; total n-grams = max(len − n + 1, 0) needs no materialization. */
  def dupNgramFrac(toks: Column, n: Int): Column = {
    val total = greatest(size(toks) - lit(n - 1), lit(0))
    when(total > 0,
      (total - size(shingles(toks, n))).cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Highest single-token share of a document: count of the most frequent
    * token / total tokens — the degenerate-repetition signal (a doc that
    * is mostly one token survives distinct-RATIO rules at moderate
    * lengths). Higher-order functions over the token array, scan-side;
    * O(distinct × len) per row, bounded by document length. */
  def topTokenRatio(toks: Column): Column =
    array_max(transform(array_distinct(toks),
      x => size(filter(toks, y => y === x)))).cast("double") /
      size(toks).cast("double")
}
