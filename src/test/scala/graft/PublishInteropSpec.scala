package graft

import org.apache.spark.sql.functions._

/** q212's Spark half, pinned in-JVM (the DuckDB half is the gate's
  * hash-compare — see the q212 oracle): the published mart is
  * deterministic across republishes, sf-independent by construction, and
  * its partitioned read-back decodes the full enricher taxonomy. */
class PublishInteropSpec extends SparkSpec {

  private def digest(d: String) =
    SparkEntry.queries("q212_publish_interop")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head

  test("republishing writes identical content: digest stable, sf-independent") {
    val a = digest("/root/testdata/sf0.001")
    val b = digest("/root/testdata/sf0.001")
    assert(a === b, "same fixture must republish byte-equal values")
    // the mart is synthesized, not derived from the sf tables — the
    // property that makes the fixed publish path race-free across
    // verify/bench runs at different scales
    val c = digest("/root/testdata/sf0.01")
    assert(a === c, "digest must not depend on the sfDir")
    assert(a._1 === 20000L, "row count is the fixture size")
  }

  test("read-back decodes the hive partition column over the full taxonomy") {
    digest("/root/testdata/sf0.001") // (re)publish
    val back = spark.read.parquet("/tmp/graft_publish_interop")
    val topics = back.select(col("topic")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(topics === Set("power_system", "software", "leads_wiring",
      "infusion", "general"), s"partition values: $topics")
    // severity rides the data files (not the partition dirs) and spans
    // the enricher's full range; summaries past 200 chars truncated with
    // the multi-byte ellipsis — the content the cross-engine digest hashes
    val sev = back.select(col("severity")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(sev === Set(1L, 2L, 3L), s"severities: $sev")
    assert(back.filter(col("summary").endsWith("…")).count() > 0,
      "no truncated summary reached the published mart")
  }

  test("q219: schema evolution — merged read null-fills old files, keeps new values and nulls") {
    val out = SparkEntry.queries("q219_schema_evolution")(spark,
        "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet === Set(1L, 2L), "one digest row per version")
    assert(out(1L)._1 === 6000L && out(2L)._1 === 6000L)
    // republish is deterministic and sf-independent (atomic-swap
    // publish: concurrent runs rewrite identical bytes)
    val again = SparkEntry.queries("q219_schema_evolution")(spark,
        "/root/testdata/sf0.01")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(again === out)
    // the reader-side drift the gate covers: v=1 files do NOT contain
    // review_flag, yet the merged scan surfaces it as NULL there; v=2
    // carries real values AND in-column nulls (null-vs-absent both ways)
    val back = spark.read.option("mergeSchema", "true")
      .parquet("/tmp/graft_publish_evolution")
    assert(back.columns.contains("review_flag"))
    val v1 = back.filter(col("v") === 1)
    assert(v1.filter(col("review_flag").isNotNull).count() === 0L,
      "pre-evolution files must read as all-NULL review_flag")
    val v2flags = back.filter(col("v") === 2)
    assert(v2flags.filter(col("review_flag").isNotNull).count() > 0L)
    assert(v2flags.filter(col("review_flag").isNull).count() > 0L,
      "the evolved column's own nulls are part of the content")
    // and the raw v=1 files genuinely lack the column (evolution was
    // metadata-only — no old-file rewrite)
    val v1raw = spark.read.parquet("/tmp/graft_publish_evolution/v=1")
    assert(!v1raw.columns.contains("review_flag"))
  }
}
