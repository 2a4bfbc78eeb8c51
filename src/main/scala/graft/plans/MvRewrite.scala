package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Transparent materialized-view rewrite — the lakehouse analog of
 * Snowflake's MV query rewrite (the reference materializes its marts
 * with dbt and queries them BY NAME, dbt_project.yml:13-15; Snowflake
 * itself rewrites matching queries onto MVs automatically). The engine
 * already MAINTAINS marts incrementally (agg-IVM q106, join-IVM q137,
 * the q146 signals DAG); this rule closes the loop by making an
 * equivalent ad-hoc query USE the maintained mart without the user
 * naming it: a registered definition whose optimized plan matches a
 * subtree of the incoming query is replaced by a scan of the mart's
 * parquet, with the subtree's output attribute ids preserved so every
 * enclosing operator still resolves.
 *
 * Scope — EXACT plan match (modulo Catalyst canonicalization: exprIds,
 * attribute order in commutative expressions), not view subsumption:
 * a rollup query is NOT derived from a finer-grained MV. That keeps
 * the rewrite provably result-preserving — the mart was written from
 * the very plan the subtree canonicalizes to — and sidesteps the
 * subsumption lattice (a research-scale feature) entirely.
 *
 * Mechanics:
 *  - [[MvCatalog.register]] stores `(name, optimized-canonicalized
 *    definition plan, mart path)`. The definition's optimized plan is
 *    computed BEFORE insertion, so a definition never self-matches
 *    while registering.
 *  - [[MvRewrite]] runs in the user-provided optimizer batch (attached
 *    by [[graft.Graft.configure]] / [[graft.GraftSparkExtensions]]
 *    alongside [[BoundLevenshtein]]). Both the stored definition and
 *    the incoming subtree have been through the same full default
 *    optimization, so equality of canonicalized trees is a sound and
 *    complete exact-match test.
 *  - The replacement scan is built FRESH at match time
 *    (`spark.read.parquet(path)`), so an overwritten (refreshed) mart
 *    is picked up on the next query compile — registration does not
 *    cache a file listing. Freshness is the refresher's contract,
 *    exactly as with a named mart read.
 *  - Attribute mapping is by NAME (the mart's parquet was written from
 *    the definition's output, so names are the definition's own); the
 *    subtree's original exprIds are re-issued via aliases. A mart
 *    whose schema no longer matches the definition (renamed/retyped
 *    column after a code change) fails the match and the query falls
 *    back to the base tables — the rewrite is an optimization, never
 *    a correctness dependency.
 *
 * 100 TB posture: the rewrite replaces the fact-scan+shuffle pyramid
 * with a scan of an aggregate-sized mart — the same reason Snowflake
 * ships the feature. The match itself is plan-time metadata work.
 */
object MvCatalog {

  final case class Entry(name: String, plan: LogicalPlan, path: String)

  private val entries0 = new ConcurrentHashMap[String, Entry]()

  /** Register `df`'s plan as the definition of the materialization at
    * `path`. Computes the optimized canonical form eagerly (so the
    * rule never runs on a half-registered definition). */
  def register(spark: SparkSession, name: String, df: DataFrame,
      path: String): Unit = {
    val canonical = df.queryExecution.optimizedPlan.canonicalized
    entries0.put(name, Entry(name, canonical, path))
  }

  /** Write `df` to `path` (overwrite) AND register it — the
    * CREATE MATERIALIZED VIEW one-liner. Refresh = build the
    * definition DataFrame again and call materialize again: the name
    * is REMOVED before the write compiles, so the refresh write
    * computes from the base tables rather than matching its own stale
    * mart (the classic self-referential refresh trap). A same-plan
    * entry registered under a DIFFERENT name would still match; don't
    * register one definition under two names. */
  def materialize(spark: SparkSession, name: String, df: DataFrame,
      path: String): Unit = {
    entries0.remove(name)
    df.write.mode("overwrite").parquet(path)
    register(spark, name, df, path)
  }

  def deregister(name: String): Unit = { entries0.remove(name); () }
  def clear(): Unit = entries0.clear()
  def entries: Seq[Entry] = entries0.values.asScala.toSeq
}

object MvRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val defs = MvCatalog.entries
    if (defs.isEmpty) plan
    else plan.transformUp {
      case sub =>
        defs.find(_.plan == sub.canonicalized)
          .flatMap(e => replacement(sub, e))
          .getOrElse(sub)
    }
  }

  /** Mart scan projected back onto the matched subtree's attribute ids.
    * None (no rewrite) if the mart can't be read or its schema drifted
    * from the definition — fall back to the base-table plan. */
  private def replacement(sub: LogicalPlan, e: MvCatalog.Entry)
      : Option[LogicalPlan] =
    try {
      val spark = SparkSession.active
      val scan = spark.read.parquet(e.path).queryExecution.analyzed
      val byName = scan.output.map(a => a.name -> a).toMap
      val remapped: Option[Seq[NamedExpression]] =
        sub.output.foldLeft(Option(Vector.empty[NamedExpression])) {
          (acc, orig) =>
            acc.flatMap { v =>
              byName.get(orig.name)
                .filter(_.dataType == orig.dataType)
                .map(src => v :+ alias(src, orig))
            }
        }
      remapped.map { exprs =>
        logInfo(s"MV rewrite: matched '${e.name}' -> scan ${e.path}")
        Project(exprs, scan)
      }
    } catch {
      case scala.util.control.NonFatal(ex) =>
        logWarning(s"MV rewrite: '${e.name}' unusable (${ex.getMessage}); " +
          "keeping base-table plan")
        None
    }

  private def alias(src: Attribute, orig: Attribute): NamedExpression =
    Alias(src, orig.name)(exprId = orig.exprId, qualifier = orig.qualifier)
}
