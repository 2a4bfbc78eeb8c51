package graft.models

import graft.operators.EarlySignals
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/**
 * Rolling z-score anomaly view over [[AeCountsQ]] — v_ae_early_signals.sql.
 * Delegates the window mechanics to the generic [[EarlySignals]] operator
 * (same partition keys, `ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING`, NULL
 * guards); this model only fixes the keys and the output contract
 * (v_ae_early_signals.sql:35-47 — rn is internal, not exposed).
 */
object VAeEarlySignals {

  def apply(aeCountsQ: DataFrame): DataFrame =
    EarlySignals.signals(aeCountsQ, Seq("canonical_mfr", "failure_mode"))
      .select(
        col("canonical_mfr"),
        col("failure_mode"),
        col("year_quarter"),
        col("quarter_index"),
        col("n_events"),
        col("mean_4"),
        col("std_4"),
        col("z_score"))
}
