package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
