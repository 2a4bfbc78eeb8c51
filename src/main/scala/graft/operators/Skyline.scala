package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Skyline (Pareto-frontier) computation — the multi-criteria shortlist
 * operator ("no other row is at least as good on every dimension and
 * strictly better on one"): cheapest-yet-largest parts, freshest-yet-
 * most-complete sources, and in a curation pipeline the quality-vs-cost
 * frontier over candidate documents.
 *
 * The 2-D case (one MINIMIZED and one MAXIMIZED numeric dimension) has
 * an exact formulation that needs no dominance self-join: group rows by
 * the minimized value, take each group's best (max) maximized value,
 * and ask for a strict running maximum over the distinct minimized
 * values in ascending order. A row is on the skyline iff
 *   (a) it achieves its group's max (no same-cost row beats it), and
 *   (b) every strictly cheaper group's best is strictly worse.
 * Rows that tie on BOTH dimensions do not dominate each other and are
 * all kept — the standard skyline convention. Rows with a NULL in
 * either dimension carry no dominance evidence and are excluded.
 *
 * The running maximum is computed as a TWO-PHASE distributed prefix
 * (the declared surface bans partition-less windows): the distinct-
 * value curve is range-bucketed monotonically from broadcast bounds
 * (equal values share a bucket; larger values never land in a smaller
 * bucket — float wobble at bucket edges can only move a value between
 * adjacent buckets, which is plan-placement, not semantics), per-bucket
 * maxima (≤ `buckets` rows — bounded driver metadata, the centroid/
 * offset-collect class) fold into strict-prefix maxima on the driver,
 * and each bucket's window handles only its own rows. So: one grouped
 * aggregate (shuffle on the minimized value), one BUCKET-partitioned
 * window, two broadcast joins — nothing touches row pairs, and no
 * single task ever sees the whole frontier curve.
 */
object Skyline {

  /**
   * Skyline of `df` minimizing `minCol` while maximizing `maxCol` (both
   * numeric). Returns the input rows (original columns, unchanged) that
   * lie on the frontier. To maximize both dimensions pass `-minCol`; to
   * minimize both pass `-maxCol`. Cross-bucket dominance compares
   * `maxCol` as DOUBLE — exact for integral values below 2^53 and for
   * any float dimension.
   */
  def skyline2(df: DataFrame, minCol: Column, maxCol: Column,
               buckets: Int = 64): DataFrame = {
    require(buckets >= 1 && buckets <= 4096, "buckets in [1, 4096]")
    val clean = df.filter(minCol.isNotNull && maxCol.isNotNull)
    val g = clean.groupBy(minCol.as("__sky_v"))
      .agg(max(maxCol).as("__sky_best"))
    val bounds = g.agg(min(col("__sky_v")).cast("double").as("__sky_lo"),
      max(col("__sky_v")).cast("double").as("__sky_hi"))
    val gb = g.crossJoin(broadcast(bounds)).withColumn("__sky_bk",
      when(col("__sky_hi") === col("__sky_lo"), lit(0)).otherwise(
        least(lit(buckets - 1),
          floor((col("__sky_v").cast("double") - col("__sky_lo")) *
            lit(buckets) / (col("__sky_hi") - col("__sky_lo"))).cast("int"))))
      .drop("__sky_lo", "__sky_hi")
    // per-bucket best, folded into strict-prefix maxima driver-side
    val bucketMax = gb.groupBy(col("__sky_bk"))
      .agg(max(col("__sky_best")).cast("double").as("__bm"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    var run = Option.empty[Double]
    val prefix = bucketMax.map { case (bk, bm) =>
      val row = (bk, run)
      run = Some(run.fold(bm)(math.max(_, bm)))
      row
    }
    import df.sparkSession.implicits._
    val prefixDf = prefix.toSeq.toDF("__sky_bk", "__sky_pre")
    // within-bucket strict-prev over the bucket's OWN distinct values
    val w = Window.partitionBy(col("__sky_bk")).orderBy(col("__sky_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = gb.join(broadcast(prefixDf), Seq("__sky_bk"))
      .withColumn("__sky_strict", max(col("__sky_best")).over(w))
    clean.join(frontier, minCol === col("__sky_v"))
      .filter(maxCol === col("__sky_best") &&
        (col("__sky_strict").isNull || col("__sky_strict") < maxCol) &&
        (col("__sky_pre").isNull ||
          col("__sky_pre") < maxCol.cast("double")))
      .drop("__sky_bk", "__sky_v", "__sky_best", "__sky_strict", "__sky_pre")
  }
}
