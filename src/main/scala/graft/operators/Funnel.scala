package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Ordered event-sequence (funnel) matching over an event stream — the
 * Spark-native answer to Snowflake's MATCH_RECOGNIZE tier (the reference
 * platform's sequence-analytics surface; events usage per reference
 * README.md:45-47): for each user, how far through an ordered step list
 * (e.g. view → click → purchase) their event history gets, where each
 * step must occur strictly after the previous step's match.
 *
 * Semantics: the greedy earliest-match automaton — scan the user's
 * events in (order, tie) order and advance one stage whenever the
 * current event's type equals the next step. Greedy earliest-match is
 * optimal for subsequence matching, so `stage_reached` is exactly the
 * longest step-prefix embeddable in the user's history — which is what
 * makes the same answer computable in set-based SQL (iterated
 * "first qualifying occurrence strictly after the previous one" mins,
 * the q73 oracle) and provable equal.
 *
 * Scale shape: events are pre-filtered to the step types (non-step
 * events can never advance the automaton), then ONE shuffle keyed by
 * user builds each user's ordered step-event list; the automaton runs
 * scan-side over that array. Per-user state is its step-typed events
 * only — the same per-entity bound any sequence analysis carries (cf.
 * [[Sessionize]]) , shrunk by the type filter. Users with zero
 * step-typed events are absent (they carry no funnel evidence).
 */
object Funnel {

  /** `stage_reached` (0..steps.size) + `converted` per user. `orderCol`
    * is the event-time sort key, `tieCol` a unique tiebreaker making the
    * per-user order total (and therefore engine-independent). */
  def stages(events: DataFrame, userCol: Column, orderCol: Column,
             tieCol: Column, typeCol: Column, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val n = steps.size
    val stepsArr = array(steps.map(lit): _*)
    events
      .filter(typeCol.isin(steps: _*))
      .groupBy(userCol.as("user_id"))
      .agg(sort_array(collect_list(
        struct(orderCol.as("o"), tieCol.as("tie"), typeCol.as("t")))).as("evs"))
      .select(col("user_id"),
        aggregate(col("evs"), lit(0),
          (st, e) => when(st < lit(n) &&
              e.getField("t") === element_at(stepsArr, st + 1), st + 1)
            .otherwise(st))
          .cast("long").as("stage_reached"))
      .withColumn("converted", col("stage_reached") === n)
  }
}

/**
 * Cohort retention over an event stream — the second half of the
 * events-analytics pair with [[Funnel]]: group users by first-activity
 * week (their cohort), then count distinct users active at each week
 * offset from their cohort.
 *
 * Scale shape: ONE user-keyed aggregation collects each user's distinct
 * week set (per-user state bounded by the calendar — weeks, not events;
 * the partial aggregate dedupes map-side so the shuffle carries
 * ~distinct user-weeks), the cohort is the set's min taken SCAN-SIDE
 * (`array_min` — no self-join back for the first week), and only the
 * final (cohort, offset) rollup re-shuffles. Two exchanges, zero joins.
 */
object Cohorts {

  /** (cohort_week, week_offset, n_users). Weeks are ISO Monday
    * `date_trunc` buckets — identical in Spark and the SQL oracle. */
  def retention(events: DataFrame, userCol: Column, tsCol: Column): DataFrame =
    events
      .select(userCol.as("user_id"),
        date_trunc("week", tsCol).cast("date").as("wk"))
      .groupBy(col("user_id"))
      .agg(collect_set(col("wk")).as("wks"))
      .select(col("user_id"), array_min(col("wks")).as("cohort_week"),
        explode(col("wks")).as("wk"))
      .groupBy(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
}
