package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * AI enrichment surface (reference README.md:59,70-71,115: AISQL
 * topic / severity / summary over narratives, run in 10-20k batches).
 *
 * The scorer is pluggable: [[Enricher]] is the model boundary, and
 * [[HeuristicEnricher]] is the deterministic, dependency-free default
 * (keyword taxonomy + guarded truncation) so the pipeline is testable and
 * reproducible without a model in the container. A real model plugs in as
 * another [[Enricher]] (e.g. batched mapPartitions over a local model)
 * without touching callers.
 */
trait Enricher {
  def topic(narrative: Column): Column
  def severity(narrative: Column): Column
  def summary(narrative: Column): Column

  final def apply(df: DataFrame, narrativeCol: String): DataFrame = {
    val n = col(narrativeCol)
    df.withColumn("topic", topic(n))
      .withColumn("severity", severity(n))
      .withColumn("summary", summary(n))
  }
}

/**
 * Batched model-boundary enrichment (reference README.md:83,115: AISQL
 * enrichment runs in 10-20k record batches). The model is a plain
 * batch function `Seq[narrative] => Seq[(topic, severity, summary)]` —
 * an ONNX/JNI/remote scorer drops in without touching the plan. Rows
 * stream through `mapPartitions` in `batchSize` groups, so model-call
 * amortization is controlled per task and memory stays bounded by one
 * batch, not one partition.
 */
object BatchedEnrich {

  type Model = Seq[String] => Seq[(String, Int, String)]

  final case class Enriched(id: Long, topic: String, severity: Int, summary: String)

  /** Deterministic stand-in model with the same batching contract a real
    * scorer has (mirrors [[HeuristicEnricher]]'s keyword taxonomy). */
  val stubModel: Model = batch => batch.map { n =>
    val u = if (n == null) "" else n.toUpperCase
    val topic =
      if (u.contains("BATTERY") || u.contains("POWER")) "power_system"
      else if (u.contains("SOFTWARE") || u.contains("ERROR CODE")) "software"
      else if (u.contains("LEAD") || u.contains("WIRE")) "leads_wiring"
      else if (u.contains("PUMP") || u.contains("OCCLU")) "infusion"
      else "general"
    val severity =
      if (u.contains("DEATH") || u.contains("DIED")) 3
      else if (u.contains("INJUR") || u.contains("HOSPITAL")) 2
      else if (u.nonEmpty) 1 else 0
    val summary = if (n == null || n.length <= 200) n else n.substring(0, 200) + "…"
    (topic, severity, summary)
  }

  /** Enrich `(id, narrative)` rows through `model` in `batchSize` groups. */
  def apply(df: DataFrame, idCol: String, narrativeCol: String,
            model: Model, batchSize: Int = 10000): org.apache.spark.sql.Dataset[Enriched] = {
    val spark = df.sparkSession
    import spark.implicits._
    val sel = df.select(org.apache.spark.sql.functions.col(idCol).cast("long"),
        org.apache.spark.sql.functions.col(narrativeCol))
      .as[(Long, String)]
    // The model call is the expensive stage — widen a NARROW input (one
    // small file would run every batch serially); an already-wide input
    // adds no shuffle (same rule as Multimodal.featurize).
    val target = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val in = if (sel.rdd.getNumPartitions < target) sel.repartition(target) else sel
    in.mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val out = model(batch.map(_._2))
          require(out.length == batch.length,
            s"model returned ${out.length} results for ${batch.length} inputs")
          batch.lazyZip(out).map { case ((id, _), (t, s, m)) => Enriched(id, t, s, m) }
        }
      }
  }
}

/** Deterministic keyword-based enrichment (the pre-AISQL heuristic tier —
  * same spirit as the reference's interim failure-mode CASE,
  * fact_adverse_events.sql:76-86). */
object HeuristicEnricher extends Enricher {

  override def topic(n: Column): Column =
    when(n.ilike("%BATTERY%") || n.ilike("%POWER%"), lit("power_system"))
      .when(n.ilike("%SOFTWARE%") || n.ilike("%ERROR CODE%"), lit("software"))
      .when(n.ilike("%LEAD%") || n.ilike("%WIRE%"), lit("leads_wiring"))
      .when(n.ilike("%PUMP%") || n.ilike("%OCCLU%"), lit("infusion"))
      .otherwise(lit("general"))

  override def severity(n: Column): Column =
    when(n.ilike("%DEATH%") || n.ilike("%DIED%"), lit(3))
      .when(n.ilike("%INJUR%") || n.ilike("%HOSPITAL%"), lit(2))
      .when(n.isNotNull && length(n) > 0, lit(1))
      .otherwise(lit(0))

  override def summary(n: Column): Column =
    when(n.isNull || length(n) <= 200, n)
      .otherwise(concat(substring(n, 1, 200), lit("…")))
}
