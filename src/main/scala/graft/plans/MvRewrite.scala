package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, ExprId, Literal, NamedExpression}
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
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

  final case class Entry(name: String, plan: LogicalPlan, path: String,
      rollup: Option[RollupInfo])

  /** Rollup-rewrite metadata extracted from an Aggregate-shaped
    * definition: enough to serve a COARSER grouping from the mart (the
    * data-cube property — one finest-grain mart answers every rollup
    * whose aggregates re-aggregate). `childIds` is the def child's
    * output exprIds POSITIONALLY: canonical child equality normalizes
    * exprIds by position, so position is the bridge between the query's
    * child attrs and the definition's. */
  final case class RollupInfo(
      canonicalChild: LogicalPlan,
      childIds: Seq[ExprId],
      groupCol: Map[ExprId, String],
      aggCol: Map[(String, Option[ExprId]), String])

  private val entries0 = new ConcurrentHashMap[String, Entry]()

  /** Register `df`'s plan as the definition of the materialization at
    * `path`. Computes the optimized canonical form eagerly (so the
    * rule never runs on a half-registered definition), and — when the
    * definition is a single Aggregate — the rollup metadata that lets
    * [[MvRewrite]] serve subset-key regroupings from the mart. */
  def register(spark: SparkSession, name: String, df: DataFrame,
      path: String): Unit = {
    val optimized = df.queryExecution.optimizedPlan
    entries0.put(name,
      Entry(name, optimized.canonicalized, path, rollupInfo(optimized)))
  }

  private def rollupInfo(plan: LogicalPlan): Option[RollupInfo] = plan match {
    case Aggregate(g, as, child, _) =>
      // group keys: bare child attributes surfaced (possibly aliased) in
      // the output; aggregates: plain re-aggregable functions over a
      // child attribute (or count of a literal). Anything else — e.g.
      // round(sum(x)) — is simply not exposed for rollup (sum of rounded
      // sums is not the rounded sum), without blocking exact match.
      val groupIds = g.collect { case a: AttributeReference => a.exprId }.toSet
      val groupCol = as.collect {
        case a: AttributeReference if groupIds(a.exprId) => a.exprId -> a.name
        case al @ Alias(a: AttributeReference, _) if groupIds(a.exprId) =>
          a.exprId -> al.name
      }.toMap
      val aggCol = as.collect {
        case al @ Alias(ae: AggregateExpression, _)
            if !ae.isDistinct && ae.filter.isEmpty =>
          (ae.aggregateFunction match {
            case s: Sum => s.child match {
              case a: AttributeReference => Some(("sum", Some(a.exprId)))
              // the moneySum discipline: an exact decimal sum over a
              // cast money column re-aggregates exactly (sum of group
              // sums == flat sum as a rational number), so expose it —
              // keyed WITH the cast's target type, which a matching
              // query must reproduce verbatim
              case Cast(a: AttributeReference, dt: DecimalType, _, _) =>
                Some((s"sum:${dt.sql}", Some(a.exprId)))
              case _ => None
            }
            case m: Min => m.child match {
              case a: AttributeReference => Some(("min", Some(a.exprId)))
              case _ => None
            }
            case m: Max => m.child match {
              case a: AttributeReference => Some(("max", Some(a.exprId)))
              case _ => None
            }
            case c: Count => c.children match {
              case Seq(_: Literal) => Some(("count", None))
              case Seq(a: AttributeReference) => Some(("count", Some(a.exprId)))
              case _ => None
            }
            case _ => None
          }).map(_ -> al.name)
      }.flatten.toMap
      if (groupCol.isEmpty && aggCol.isEmpty) None
      else {
        val base = stripPruning(child)
        Some(RollupInfo(base.canonicalized, base.output.map(_.exprId),
          groupCol, aggCol))
      }
    case _ => None
  }

  /** Column pruning puts a bare-attribute Project under an Aggregate,
    * and the definition and a coarser query prune DIFFERENT column
    * sets — so rollup matching compares the plans UNDER those
    * projects. Safe to skip: a pruning Project carries its child's
    * exprIds through unchanged, so attribute references above it
    * resolve against the base output directly. */
  private[plans] def stripPruning(p: LogicalPlan): LogicalPlan = p match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      stripPruning(child)
    case _ => p
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
          .orElse(rollupReplacement(sub, defs))
          .getOrElse(sub)
    }
  }

  /** Subset-key regrouping served FROM the mart — the data-cube rewrite:
    * `Aggregate(g2 ⊆ g1, re-aggregable aggs, child ≡ def child)` becomes
    * `Aggregate(g2→mart cols, sum/min/max over mart cols, mart scan)`.
    * Sound because sum/min/max distribute over the partition induced by
    * the finer grouping, and count re-aggregates as the SUM of the
    * mart's counts. Anything else — avg, distinct, filtered aggs,
    * expression-valued keys, a non-identical child — aborts the match
    * and the query keeps its base plan. The output types must come out
    * IDENTICAL (a decimal sum-of-sums widens precision and would change
    * the schema → abort), so the rewrite is invisible to every consumer. */
  private def rollupReplacement(sub: LogicalPlan,
      defs: Seq[MvCatalog.Entry]): Option[LogicalPlan] = sub match {
    case Aggregate(g2, a2, child2, _) =>
      val base2 = MvCatalog.stripPruning(child2)
      val canonicalChild = base2.canonicalized
      defs.iterator.flatMap { e =>
        e.rollup.filter(_.canonicalChild == canonicalChild)
          .flatMap(r => buildRollup(e, r, g2, a2, base2))
      }.nextOption()
    case _ => None
  }

  private def buildRollup(e: MvCatalog.Entry, r: MvCatalog.RollupInfo,
      g2: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      a2: Seq[NamedExpression], child2: LogicalPlan): Option[LogicalPlan] =
    try {
      // position is the bridge: query child attr -> def child attr
      val toDefId: Map[ExprId, ExprId] =
        child2.output.map(_.exprId).zip(r.childIds).toMap
      def groupMart(id: ExprId): Option[String] =
        toDefId.get(id).flatMap(r.groupCol.get)
      // every query group key must be a bare attribute covered by the mart
      val groupOk = g2.forall {
        case a: AttributeReference => groupMart(a.exprId).isDefined
        case _ => false
      }
      if (!groupOk) None
      else {
        val spark = SparkSession.active
        val scan = spark.read.parquet(e.path).queryExecution.analyzed
        val martAttr = scan.output.map(a => a.name -> a).toMap
        def martFor(col: String): Option[Attribute] = martAttr.get(col)
        // rewrite an output expression TREE over the mart: every
        // aggregate inside it re-aggregates (or the match aborts),
        // every group-key reference re-points at the mart's key column.
        // This covers post-aggregation arithmetic the optimizer
        // collapsed into the Aggregate (round(sum(x)), sx/n, …) — the
        // scalar shell is derivation-preserving because only the agg
        // LEAVES are substituted, by provably-equal values.
        object Abort extends Exception
        def mapExpr(ex: org.apache.spark.sql.catalyst.expressions.Expression)
            : org.apache.spark.sql.catalyst.expressions.Expression = ex match {
          case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
            reAgg(ae, toDefId, r, martFor) match {
              case Some(fn) =>
                AggregateExpression(fn, Complete, isDistinct = false)
              case None => throw Abort
            }
          case _: AggregateExpression => throw Abort
          case a: AttributeReference =>
            groupMart(a.exprId).flatMap(martFor).getOrElse(throw Abort)
          case other => other.mapChildren(mapExpr)
        }
        // map each output expression; None anywhere aborts the whole match
        val mapped: Option[Seq[NamedExpression]] =
          a2.foldLeft(Option(Vector.empty[NamedExpression])) { (acc, ne) =>
            acc.flatMap { v =>
              (try {
                ne match {
                  case a: AttributeReference =>
                    groupMart(a.exprId).flatMap(martFor).map(m => alias(m, a))
                  case al: Alias =>
                    Some(Alias(mapExpr(al.child), al.name)(
                      exprId = al.exprId, qualifier = al.qualifier))
                  case _ => None
                }
              } catch { case Abort => None })
                .filter(_.dataType == ne.dataType) // schema must be invisible
                .map(v :+ _)
            }
          }
        mapped.map { exprs =>
          val newGroup = g2.collect { case a: AttributeReference =>
            groupMart(a.exprId).flatMap(martFor).get
          }
          // prune the mart scan ourselves: the main optimizer's
          // ColumnPruning ran before this batch, so nobody else will
          val needed = (newGroup ++ exprs.flatMap(_.references)).distinct
          val pruned =
            if (needed.size == scan.output.size) scan
            else Project(scan.output.filter(a =>
              needed.exists(_.exprId == a.exprId)), scan)
          logInfo(s"MV rollup rewrite: regrouping over '${e.name}' " +
            s"(${e.path})")
          Aggregate(newGroup, exprs, pruned)
        }
      }
    } catch {
      case scala.util.control.NonFatal(ex) =>
        logWarning(s"MV rollup rewrite: '${e.name}' unusable " +
          s"(${ex.getMessage}); keeping base-table plan")
        None
    }

  /** The re-aggregation of one definition aggregate over the mart:
    * sum→sum, min→min, max→max (cloned via withNewChildren so eval
    * modes survive), count→SUM of the mart's count column. */
  private def reAgg(ae: AggregateExpression, toDefId: Map[ExprId, ExprId],
      r: MvCatalog.RollupInfo, martFor: String => Option[Attribute])
      : Option[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction] = {
    def martCol(fn: String, child: org.apache.spark.sql.catalyst.expressions.Expression)
        : Option[Attribute] = child match {
      case a: AttributeReference =>
        toDefId.get(a.exprId)
          .flatMap(id => r.aggCol.get((fn, Some(id))))
          .flatMap(martFor)
      case _ => None
    }
    ae.aggregateFunction match {
      case s: Sum => (s.child match {
        // decimal-cast money sum (the moneySum discipline): the mart
        // column already carries the exact decimal partial sums, so the
        // re-aggregation drops the cast and sums the partials directly.
        // The widened decimal flows through the scalar shell (round,
        // ratio, cast-to-double) unchanged in VALUE; buildRollup's
        // output-type filter still guarantees the visible schema.
        case Cast(a: AttributeReference, dt: DecimalType, _, _) =>
          martCol(s"sum:${dt.sql}", a)
        case c => martCol("sum", c)
      }).map(m =>
        s.withNewChildren(Seq(m))
          .asInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction])
      case m: Min => martCol("min", m.child).map(x =>
        m.withNewChildren(Seq(x))
          .asInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction])
      case m: Max => martCol("max", m.child).map(x =>
        m.withNewChildren(Seq(x))
          .asInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction])
      case c: Count => (c.children match {
        case Seq(_: Literal) => r.aggCol.get(("count", None)).flatMap(martFor)
        case Seq(a: AttributeReference) =>
          toDefId.get(a.exprId)
            .flatMap(id => r.aggCol.get(("count", Some(id))))
            .flatMap(martFor)
        case _ => None
      }).map(Sum(_))
      case _ => None
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
