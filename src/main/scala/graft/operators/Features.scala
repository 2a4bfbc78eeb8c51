package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Supervised feature engineering for the training-data tier: the two
 * standard categorical-to-numeric encoders a label-bearing corpus
 * pipeline owns before model training — leave-one-out target encoding
 * (the high-cardinality workhorse) and weight-of-evidence binning with
 * information value (the interpretable/regulated-scoring one). Both are
 * pure aggregation shapes: category-sized statistics broadcast back
 * over the facts, never a fact-sized join or window.
 */
object Features {

  /**
   * Leave-one-out target encoding: each row's category is replaced by
   * the mean label of the OTHER rows in that category,
   * `(Σy(cat) − y) / (n(cat) − 1)` — excluding the row's own label is
   * what blocks the single-row leakage that makes naive target encoding
   * overfit (the Micci-Barreca 2001 family, LOO variant). Singleton
   * categories have no "others" and encode NULL (callers impute the
   * global prior downstream if wanted — explicit, not hidden).
   *
   * Exactness: labels are integers, so the category sums are exact
   * Longs and each row's encoding is ONE correctly-rounded division —
   * hash-raw deterministic (q163 discipline). Plan: one grouped pass
   * over (cat) broadcast back; the fact table is scanned once and
   * never shuffled.
   *
   * Emits the input columns given in `keep` plus (cat, y, te).
   */
  def targetEncodeLoo(df: DataFrame, keep: Seq[String], cat: Column,
                      y: Column,
                      maxBroadcastCategories: Long = 640000L): DataFrame = {
    val base = df.select(keep.map(col) :+ cat.as("cat") :+
      y.cast("long").as("y"): _*)
    // The stats frame is category-sized, not fact-sized, but "the
    // high-cardinality workhorse" must stay true when the category IS
    // high-cardinality (user ids, URLs): materialize the grouped stats
    // once (localCheckpoint — the q110/q166 shared-subtree idiom; the
    // count below must not re-run the fact scan) and pick the join
    // strategy from the MEASURED cardinality. Below the threshold the
    // stats broadcast (fact table never shuffles); above it the join
    // falls back to a shuffled hash/sort-merge join on `cat` — at
    // ~16 bytes of state per category (more with UnsafeRow + key string
    // overhead), the 640k default keeps the explicit broadcast — which
    // BYPASSES autoBroadcastJoinThreshold — in the ~10 MB budget class;
    // override per deployment.
    val stats = base.groupBy(col("cat"))
      .agg(sum(col("y")).as("__sy"), count(lit(1)).as("__n"))
      .localCheckpoint()
    val statsSide =
      if (stats.count() <= maxBroadcastCategories) broadcast(stats) else stats
    base.join(statsSide, Seq("cat"))
      .select(keep.map(col) :+ col("cat") :+ col("y") :+
        when(col("__n") > 1L,
          (col("__sy") - col("y")).cast("double") /
            (col("__n") - lit(1L)).cast("double")).as("te"): _*)
  }

  /**
   * Weight of evidence + information value per bin — the scorecard
   * binning diagnostic: `woe = ln(p_pos / p_neg)` with each bin's share
   * of its class, and `iv_term = (p_pos − p_neg) · woe`; Σ iv_term is
   * the variable's predictive-power screen (the classic <0.02 useless /
   * >0.5 suspicious ladder). Cells carry the ½ continuity correction so
   * an empty class in a bin yields a large-but-finite WOE instead of
   * ±∞ — the standard smoothing, applied identically in the oracle.
   *
   * Counts are exact integers; the shares/log ride the round-6 lane
   * (one ln each — same expression dag in both engines, rounded where
   * the class totals entered as smoothed sums). One grouped pass plus
   * one single-row total fold broadcast back (the q121 idiom).
   *
   * Emits one row per bin: (bin, n_pos, n_neg, woe, iv_term).
   */
  def woeIv(df: DataFrame, bin: Column, y: Column): DataFrame =
    woeIvFromCells(df.select(bin.as("bin"), y.cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(sum(col("__y")).as("n_pos"),
        sum(lit(1L) - col("__y")).as("n_neg")))

  /**
   * Calibration (reliability) report for a probabilistic score — the
   * supervised-eval companion to the retrieval tier's ranking metrics:
   * bin predictions by score, compare each bin's MEAN SCORE to its
   * OBSERVED RATE, and weight the gaps into the expected calibration
   * error `ECE = Σ (n_b/N)·|conf_b − acc_b|` (Naeini et al. 2015) —
   * the standard "can you trust this model's probabilities" screen.
   *
   * Binning is `floor(score·B)` clamped to B−1 (so score = 1.0 joins
   * the top bin instead of opening a phantom one) — one scan-side
   * expression; the report is ONE grouped pass plus a single-row total
   * broadcast back (the q121 idiom). Counts exact Longs; mean score,
   * rate, and the ECE term are fixed dags over exact sums → round-6
   * lane.
   *
   * Emits one row per non-empty bin: (bin, n, avg_score, rate,
   * ece_term) — Σ ece_term is the model's ECE.
   */
  def calibration(df: DataFrame, score: Column, label: Column,
                  buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 1000, "buckets in [2, 1000]")
    val base = df.select(score.cast("double").as("__s"),
      label.cast("long").as("__y"))
    // clamp BOTH ends: score = 1.0 joins the top bin instead of opening
    // a phantom one, and an out-of-contract score < 0 lands in bin 0
    // visibly (its avg_score goes negative there) rather than opening a
    // silent negative bin the report's Σ ece_term would quietly absorb
    val bin = greatest(
      least(floor(col("__s") * lit(buckets.toDouble)).cast("long"),
        lit(buckets - 1L)),
      lit(0L))
    val cells = base.select(bin.as("bin"), col("__s"), col("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__s")).as("__ss"),
        sum(col("__y")).as("__sy"))
    val total = cells.agg(sum(col("n")).as("__N"))
    val conf = col("__ss") / col("n").cast("double")
    val acc = col("__sy").cast("double") / col("n").cast("double")
    cells.crossJoin(broadcast(total))
      .select(col("bin"), col("n"),
        round(conf, 6).as("avg_score"),
        round(acc, 6).as("rate"),
        round(col("n").cast("double") / col("__N").cast("double") *
          abs(conf - acc), 6).as("ece_term"))
  }

  /** The derivation half of [[woeIv]], over an already-aggregated
    * (bin, n_pos, n_neg) cell table — the cells are LINEAR in the
    * facts (plain sums), which is what lets q194 maintain them
    * incrementally under replay and run this same derivation over the
    * maintained state (the q180 posture for the feature tier). The
    * broadcast here needs no cardinality guard: `totals` is ONE row by
    * construction (a global aggregate), unlike [[targetEncodeLoo]]'s
    * category-sized stats. */
  def woeIvFromCells(cells: DataFrame): DataFrame = {
    val totals = cells.agg(sum(col("n_pos")).as("__tp"),
      sum(col("n_neg")).as("__tn"))
    val pp = (col("n_pos").cast("double") + lit(0.5)) /
      (col("__tp").cast("double") + lit(0.5))
    val pn = (col("n_neg").cast("double") + lit(0.5)) /
      (col("__tn").cast("double") + lit(0.5))
    cells.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_pos"), col("n_neg"),
        round(log(pp / pn), 6).as("woe"),
        round((pp - pn) * log(pp / pn), 6).as("iv_term"))
  }
}
