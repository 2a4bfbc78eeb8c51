package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Row-pattern matching over ordered event streams — the Spark-native
 * answer to Snowflake `MATCH_RECOGNIZE` (the sequence-analytics surface
 * the reference platform ships; [[Funnel]] covers the SUBSEQUENCE class,
 * this covers the CONSECUTIVE-rows class): per key, find non-overlapping
 * row spans whose symbol sequence matches a pattern, and emit one row
 * per match with its measures.
 *
 * Pattern language (the run-aligned subset): `pattern` is a
 * concatenation of DEFINEd symbols, each with implicit `+` quantifier —
 * a pattern element matches a MAXIMAL run of consecutive rows
 * classified as that symbol (greedy, exactly Snowflake's greedy `S+`
 * over mutually-exclusive defines), and adjacent pattern elements must
 * name different symbols (two adjacent `+` groups of the same symbol
 * would be one run). This is the ubiquitous analytics class — V/W price
 * shapes, error-burst-then-recovery, streak-then-break — and staying
 * run-aligned is what keeps the whole operator DECLARATIVE: no NFA, no
 * backtracking, no per-row driver logic.
 *
 * Matching semantics follow `AFTER MATCH SKIP PAST LAST ROW`:
 * candidate matches that would share a run are resolved greedily
 * left-to-right (earliest match wins, next search resumes past its last
 * run). Rows classified by no symbol break run adjacency — a pattern
 * never spans them (MATCH_RECOGNIZE's unmatched-row behavior for
 * consecutive patterns).
 *
 * Plan shape (the 100 TB posture): symbol classification is a
 * scan-side CASE ladder; run numbering is ONE window over (key, order,
 * tie); run collapse is a grouped aggregate on the SAME key — so the
 * whole operator rides a single hash partitioning by key, with
 * candidate detection as lead() chains over the (small) runs table.
 * When every pattern symbol is distinct, overlapping candidates are
 * impossible (a second start inside a match would force two pattern
 * positions onto one run) and matches emit directly — zero extra
 * shuffles. Only a pattern with a REPEATED symbol (W shapes) needs the
 * greedy de-overlap pass, and that folds per-key candidate run-ids —
 * data the size of the candidate count, not the rows — through one
 * bounded array fold ([[Funnel]]'s per-entity state argument).
 */
object Patterns {

  /** Match `pattern` (each element a DEFINEd symbol, `+`-quantified,
    * adjacent elements distinct) per `key` over rows ordered by
    * `(order, tie)` — `tie` must make the order total, or run
    * boundaries (and therefore matches) are not engine-independent.
    *
    * `define` classifies each row to its FIRST matching symbol
    * (Snowflake evaluates DEFINE predicates on the row too; predicates
    * needing PREV/NEXT navigation are precomputed by the caller with
    * lag/lead, which is what MATCH_RECOGNIZE compiles them to anyway).
    *
    * Output, one row per match:
    *   key, match_num (1-based per key, in stream order),
    *   o_start / o_end (order bounds), rows_1..rows_k (rows consumed by
    *   each pattern element), v_start / v_end (value at match edges),
    *   v_min / v_max (value extrema over the whole match). */
  def matchRecognize(df: DataFrame, key: Column, order: Column, tie: Column,
                     define: Seq[(String, Column)], pattern: Seq[String],
                     value: Column): DataFrame = {
    require(define.nonEmpty, "matchRecognize needs DEFINE symbols")
    require(define.map(_._1).distinct.size == define.size,
      "duplicate DEFINE symbol")
    require(pattern.nonEmpty, "matchRecognize needs a pattern")
    val known = define.map(_._1).toSet
    val unknown = pattern.filterNot(known)
    require(unknown.isEmpty, s"pattern names undefined symbols: " +
      s"${unknown.mkString(", ")} (defined: ${known.mkString(", ")})")
    pattern.sliding(2).foreach { w =>
      require(w.size < 2 || w(0) != w(1),
        s"adjacent pattern elements must differ ('${w(0)}' twice is one " +
          "maximal run; merge them)")
    }
    val k = pattern.size

    // 1. scan-side symbol classification, first DEFINE wins
    val sym = define.foldRight(lit(null).cast("string")) {
      case ((s, p), acc) => when(p, lit(s)).otherwise(acc)
    }
    val base = df.select(key.as("k"), order.as("o"), tie.as("t"),
      value.as("v"), sym.as("sym"))

    // 2. maximal-run numbering: one window over the key
    val w = Window.partitionBy(col("k")).orderBy(col("o"), col("t"))
    val numbered = base.withColumn("run_id",
      sum(when(lag(col("sym"), 1).over(w) <=> col("sym"), 0L)
        .otherwise(1L)).over(w))

    // 3. collapse runs (same key partitioning — no second shuffle class);
    //    no-symbol runs are KEPT so they break adjacency in the leads
    val ord = struct(col("o"), col("t"))
    val runs = numbered.groupBy(col("k"), col("run_id"))
      .agg(min(col("sym")).as("sym"), count(lit(1)).as("n"),
        min(col("o")).as("o_first"), max(col("o")).as("o_last"),
        min_by(col("v"), ord).as("v_first"),
        max_by(col("v"), ord).as("v_last"),
        min(col("v")).as("v_min"), max(col("v")).as("v_max"))

    // 4. candidate starts: the next k-1 runs carry the rest of the
    //    pattern (run_ids are consecutive per key by construction, so
    //    lead() IS run adjacency; a no-symbol run fails its equality)
    val rw = Window.partitionBy(col("k")).orderBy(col("run_id"))
    def ld(c: String, i: Int): Column =
      if (i == 0) col(c) else lead(col(c), i).over(rw)
    val candCond = pattern.zipWithIndex.map { case (s, i) =>
      ld("sym", i) === lit(s)
    }.reduce(_ && _)
    val withLeads = runs.select(
      (Seq(col("k"), col("run_id"), col("o_first")) ++
        (0 until k).flatMap(i => Seq(
          ld("sym", i).as(s"sym_$i"), ld("n", i).as(s"n_$i"),
          ld("o_last", i).as(s"ol_$i"), ld("v_last", i).as(s"vl_$i"),
          ld("v_first", i).as(s"vf_$i"), ld("v_min", i).as(s"vmin_$i"),
          ld("v_max", i).as(s"vmax_$i")))): _*)
    val cands = withLeads.filter(pattern.zipWithIndex.map { case (s, i) =>
      col(s"sym_$i") === lit(s)
    }.reduce(_ && _))

    // 5. AFTER MATCH SKIP PAST LAST ROW: with all-distinct pattern
    //    symbols overlap is impossible — emit directly. A repeated
    //    symbol (W shapes) gets the greedy left-to-right selection:
    //    fold each key's sorted candidate run-ids, keeping a start only
    //    when it clears the previous kept match's last run.
    val selected =
      if (pattern.distinct.size == k) cands
      else {
        val starts = cands.groupBy(col("k"))
          .agg(sort_array(collect_list(col("run_id"))).as("rs"))
          .select(col("k"), explode(aggregate(col("rs"),
            array().cast("array<long>"),
            (acc, x) => when(size(acc) === 0 ||
                x >= element_at(acc, -1) + lit(k.toLong),
              concat(acc, array(x))).otherwise(acc))).as("run_id"))
        cands.join(starts, Seq("k", "run_id"))
      }

    val mw = Window.partitionBy(col("k")).orderBy(col("run_id"))
    selected.select(
      (Seq(col("k").as("key"),
        row_number().over(mw).cast("long").as("match_num"),
        col("o_first").as("o_start"), col(s"ol_${k - 1}").as("o_end")) ++
        (1 to k).map(i => col(s"n_${i - 1}").as(s"rows_$i")) ++
        Seq(col("vf_0").as("v_start"), col(s"vl_${k - 1}").as("v_end"),
          // least/greatest need >= 2 args; a 1-element pattern's extrema
          // are its single run's
          (if (k == 1) col("vmin_0")
           else least((0 until k).map(i => col(s"vmin_$i")): _*)).as("v_min"),
          (if (k == 1) col("vmax_0")
           else greatest((0 until k).map(i => col(s"vmax_$i")): _*)).as("v_max"))): _*)
  }
}
