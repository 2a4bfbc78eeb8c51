package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, ExprId, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Expand, Generate, LogicalPlan, Union}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/**
 * Table-level data lineage — the third leg of the reference's governance
 * pillar (README.md:127-133 states access control, policies, and
 * lineage as prose; q143–q145 cover the first two): which source
 * tables feed a given model. Snowflake surfaces this as
 * ACCESS_HISTORY/OBJECT_DEPENDENCIES; in Spark the authoritative
 * record is the ANALYZED LOGICAL PLAN itself — every declared
 * DataFrame already carries its full provenance, so lineage here is
 * plan INSPECTION, not instrumentation: no listener, no log scraping,
 * and it works on a plan that has never executed.
 *
 * [[sources]] walks the analyzed plan and collects every base
 * relation: file-source relations report their ROOT paths (the
 * table/directory the reader was pointed at — stable identities, not
 * the per-file listing, which churns with compaction), DataSourceV2
 * relations report their table name. Subqueries, views, and CTEs are
 * already inlined by analysis, so nothing hides behind a name.
 *
 * [[report]] folds a set of named models into the queryable edge table
 * `(model, source)` — governance-as-data like the q145 policy catalog:
 * the lineage report is itself a DataFrame to publish, join against
 * entitlements, or diff between releases (an unexpected new edge in a
 * release diff is a data-governance event). Driver cost is plan
 * traversal — metadata, independent of data size; the report is
 * #models × #sources rows.
 */
object Lineage {

  /** Distinct base-relation identities feeding `df`, in first-seen plan
    * order: root paths for file relations, table names for v2 tables.
    * Plan inspection only — nothing is executed. */
  def sources(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case other                => Seq(other.toString)
        }
      case v2: DataSourceV2Relation => Seq(v2.table.name())
    }.flatten.distinct

  /** [[sources]] with each path reduced to its last segment — the
    * table-name view (`/data/sf0.01/lineitem.parquet` →
    * `lineitem.parquet`), the environment-portable identity a lineage
    * mart stores. */
  def sourceNames(df: DataFrame): Seq[String] =
    sources(df).map(s => new Path(s).getName).distinct

  /** Lineage edge table for named models: one row per (model, source
    * table name), the ACCESS_HISTORY-style mart. Deterministic order is
    * the caller's sort; edges are distinct. */
  def report(spark: SparkSession, models: Seq[(String, DataFrame)]): DataFrame = {
    import spark.implicits._
    models.flatMap { case (m, df) => sourceNames(df).map(s => (m, s)) }
      .distinct.toDF("model", "source")
  }

  // ------------------------------------------------------- column level

  /** COLUMN-level provenance: for each output column of `df`, the set
    * of `(source table name, source column)` pairs its VALUES derive
    * from — Snowflake ACCESS_HISTORY's `objects_modified[].columns[]
    * .baseSources` shape. Resolution is the same no-execution plan
    * walk as [[sources]], but attribute-exact: each plan node maps its
    * output attributes (by `ExprId`) to leaf columns — leaf relations
    * seed their own attributes, `Alias` definitions resolve through
    * their child expression's references, `Union` merges positionally,
    * `Generate`/`Expand` resolve generator/projection inputs, and
    * everything else passes attributes through unchanged (exprIds are
    * stable across Filter/Join/Sort/SubqueryAlias).
    *
    * Semantics (documented contract):
    *   - VALUE derivation only: join keys and filter predicates do not
    *     contribute to an output column's lineage (they select rows,
    *     they don't build values) — same scoping as ACCESS_HISTORY.
    *   - Window expressions DO include their partition/order keys (the
    *     frame changes the value, not just the row set).
    *   - Literal-only columns (e.g. `count(lit(1))`) have no base
    *     source and report an empty set — the caller decides whether
    *     that is an edge-table gap or expected (q148 drops them).
    *   - Scalar/IN subqueries contribute their subplan's output
    *     lineage. */
  def columnSources(df: DataFrame): Map[String, Set[(String, String)]] = {
    val plan = df.queryExecution.analyzed
    val m = colMap(plan)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty[(String, String)])).toMap
  }

  /** [[columnSources]] over named models as the queryable 4-column edge
    * table `(model, column, source_table, source_column)` — the
    * column-level sibling of [[report]]. Columns with no base source
    * (pure literals) emit no row. */
  def columnReport(spark: SparkSession, models: Seq[(String, DataFrame)]): DataFrame = {
    import spark.implicits._
    models.flatMap { case (m, df) =>
      columnSources(df).toSeq.flatMap { case (c, srcs) =>
        srcs.map { case (t, sc) => (m, c, t, sc) }
      }
    }.distinct.toDF("model", "column", "source_table", "source_column")
  }

  /** Per-node attribute→leaf-column map. Leaf file relations identify
    * as their root-path LAST SEGMENT (the same environment-portable
    * table identity [[sourceNames]] uses), so column lineage and table
    * lineage name sources consistently. */
  private def colMap(plan: LogicalPlan): Map[ExprId, Set[(String, String)]] = plan match {
    case lr: LogicalRelation =>
      val tables = lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(p => p.getName)
        case other                => Seq(new Path(other.toString).getName)
      }
      lr.output.map(a => a.exprId -> tables.map(t => t -> a.name).toSet).toMap
    case v2: DataSourceV2Relation =>
      val t = new Path(v2.table.name()).getName
      v2.output.map(a => a.exprId -> Set(t -> a.name)).toMap
    case u: Union =>
      // positional: output column i derives from every child's column i
      val ms = u.children.map(colMap)
      val merged = ms.foldLeft(Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
      merged ++ u.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> u.children.zip(ms).flatMap { case (c, m) =>
          m.getOrElse(c.output(i).exprId, Set.empty[(String, String)])
        }.toSet
      }
    case e: Expand => // cube/rollup/grouping sets: projection rows per output slot
      val m = colMap(e.child)
      m ++ e.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> e.projections.flatMap(row => resolve(row(i), m)).toSet
      }
    case g: Generate => // FLATTEN: exploded columns derive from the generator input
      val m = colMap(g.child)
      m ++ g.generatorOutput.map(a => a.exprId -> resolve(g.generator, m))
    case other =>
      // Project/Aggregate/Window/…: every Alias defines a new ExprId from
      // its child expression; bare attributes pass through by ExprId
      val m = other.children.map(colMap)
        .foldLeft(Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
      m ++ other.expressions.flatMap(_.collect { case al: Alias => al })
        .map(al => al.exprId -> resolve(al.child, m))
  }

  private def resolve(e: Expression,
      m: Map[ExprId, Set[(String, String)]]): Set[(String, String)] = {
    val direct = e.references.iterator
      .flatMap(r => m.getOrElse(r.exprId, Set.empty[(String, String)])).toSet
    val viaSubquery = e.collect { case s: SubqueryExpression => s.plan }
      .flatMap { p =>
        val pm = colMap(p)
        p.output.flatMap(a => pm.getOrElse(a.exprId, Set.empty[(String, String)]))
      }.toSet
    direct ++ viaSubquery
  }
}
