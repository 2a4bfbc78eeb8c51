package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Scalar / aggregate helper functions for the engine. All are pure
 * `Column`-combinators over Spark built-ins, so everything stays inside
 * Catalyst (codegen-friendly, no UDFs) and is safe under ANSI mode
 * (Spark 4 default): parses are `try_`-guarded and divisions are
 * zero-guarded.
 *
 * Reference semantics being reproduced (citations into /root/reference):
 *  - `PARSE_YYYYMMDD` UDF           → [[parseYyyymmdd]]   (stg_maude.sql:8-9)
 *  - `TO_CHAR(d,'YYYY-"Q"Q')`       → [[yearQuarterLabel]] (ae_counts_q.sql:19)
 *  - `year*4 + quarter`             → [[quarterIndex]]     (ae_counts_q.sql:18)
 *  - `SHA2(a||'|'||b…,256)` id      → [[surrogateKey]]     (fact_adverse_events.sql:43-50)
 *  - `NULLIF(TRIM(x),'')`           → [[trimToNull]]       (stg_maude.sql:35-42,53)
 *  - `MAX(IFF(NULLIF(TRIM(x),'') IS NOT NULL, x, NULL))` → [[firstNonBlank]] (stg_maude.sql:35-42)
 *  - `LISTAGG(x,sep) WITHIN GROUP (ORDER BY k)` → [[orderedListagg]] (stg_maude.sql:72)
 *  - z-score guard                  → [[zScore]]           (v_ae_early_signals.sql:43-46)
 */
object F {

  /** Null-safe `'YYYYMMDD'` → DATE; malformed or NULL input yields NULL
    * (never an ANSI error), matching the reference's tolerant UDF. */
  def parseYyyymmdd(c: Column): Column =
    call_function("try_to_date", c, lit("yyyyMMdd"))

  /** `1997-Q3`-style label. Spark's `date_format` has no quarter pattern,
    * so this is built from `year()`/`quarter()` (never the ISO-week `YYYY`
    * pattern trap). */
  def yearQuarterLabel(d: Column): Column =
    concat(year(d).cast("string"), lit("-Q"), quarter(d).cast("string"))

  /** Monotone quarter ordinal `year*4 + quarter` as LONG. */
  def quarterIndex(d: Column): Column =
    (year(d) * lit(4) + quarter(d)).cast("long")

  /** Deterministic surrogate key: SHA2-256 over `'|'`-joined, NULL→''
    * stringified parts. */
  def surrogateKey(parts: Column*): Column =
    sha2(concat_ws("|", parts.map(p => coalesce(p.cast("string"), lit(""))): _*), 256)

  /** Snowflake `NULLIF(TRIM(x),'')`: trimmed value, or NULL when blank. */
  def trimToNull(c: Column): Column = {
    val t = trim(c)
    when(t === "", lit(null)).otherwise(t)
  }

  /** Aggregate: the MAX of the non-blank values of `c` (NULL when all rows
    * are blank/NULL) — the reference's "first non-blank wins (max order)". */
  def firstNonBlank(c: Column): Column =
    max(when(trim(c) =!= "", c))

  /** Aggregate: values of `value` joined by `sep` in ascending `sortKey`
    * order. Deterministic regardless of shuffle order: sorting happens
    * inside the aggregation (`array_sort` over collected (k,v) structs),
    * never relying on input row order. */
  def orderedListagg(value: Column, sortKey: Column, sep: String): Column =
    array_join(
      transform(
        array_sort(collect_list(struct(sortKey.as("k"), value.as("v")))),
        x => x.getField("v")),
      sep)

  /** NULL-on-zero/NULL-denominator division (ANSI-safe). */
  def safeDiv(num: Column, den: Column): Column =
    when(den.isNull || den === 0, lit(null)).otherwise(num / den)

  /** `(x - mean) / std` with the reference's guard: NULL when std is NULL
    * (frame shorter than 2 rows) or zero. */
  def zScore(x: Column, mean: Column, std: Column): Column =
    when(std.isNull || std === 0.0, lit(null)).otherwise((x - mean) / std)
}
