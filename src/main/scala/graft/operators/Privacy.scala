package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Governance-tier re-identification audits (the reference's governance
 * pillar, README.md:127-133, states access control and lineage as
 * prose; group-size auditing is the engine-side primitive beneath
 * "is this slice safe to expose"): k-anonymity flags quasi-identifier
 * combinations matching fewer than k rows (an attacker joining on the
 * QI pins those rows down), l-diversity flags groups whose sensitive
 * attribute takes fewer than l distinct values (group membership alone
 * leaks the sensitive value even when k holds).
 *
 * One grouped pass: `count(*)` + `count(distinct sensitive)` per QI
 * combination — a single shuffle on the QI key, no joins, output
 * bounded by the QI-combination count. At 100 TB the QI cardinality,
 * not the row count, bounds the state (same argument as any grouped
 * aggregate); `approx_count_distinct` or the KMV/HLL sketches swap in
 * when the sensitive column's per-group distinct state matters.
 *
 * [[generalize]] is the standard remediation step: band a numeric
 * column to width-`w` buckets (floor division, integer-exact), coarse
 * enough bands turning failing QI groups into passing ones.
 */
object Privacy {

  /** Per-QI-group audit: `n` (group size), `l` (distinct sensitive
    * values), and the two risk flags. `k`/`l` thresholds follow the
    * usual convention: a group PASSES when n >= k and l >= minL. */
  def kAnonymityAudit(df: DataFrame, qi: Seq[String], sensitive: Column,
                      k: Int, minL: Int = 2): DataFrame =
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(sensitive).as("l"))
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse", col("l") >= minL)

  /** Band `v` to width-`w` buckets: `floor(v / w) * w` (integer-exact
    * generalization for ages, timestamps, amounts; `pmod` keeps the
    * floor semantics for negative values too). */
  def generalize(v: Column, w: Long): Column = {
    require(w >= 1, "band width >= 1")
    v.cast("long") - pmod(v.cast("long"), lit(w))
  }

  // ------------------------------------------------------------ policies

  /** One column's masking policy: `allowedRoles` see the raw value,
    * everyone else sees `mask(col)` — the Snowflake `MASKING POLICY`
    * shape (a function of (value, CURRENT_ROLE()) bound to a column,
    * reference README.md:63,132) with the role resolved at plan time,
    * which is exactly when Snowflake's policy conditions on
    * CURRENT_ROLE() constant-fold too. */
  final case class MaskPolicy(column: String, allowedRoles: Set[String],
                              mask: Column => Column)

  /** Apply column-masking policies for `role`: a PURE PROJECTION — the
    * unprivileged branches are folded at plan time (role is a literal),
    * so the governed view costs zero over the base scan and the masked
    * plan never materializes raw values for unprivileged readers.
    * Scale: scan-side, codegen'd, no shuffle — governance that is free
    * at 100 TB. */
  def applyMaskingPolicies(df: DataFrame, role: String,
                           policies: Seq[MaskPolicy]): DataFrame = {
    val byCol = policies.map(p => p.column -> p).toMap
    require(byCol.size == policies.size, "one policy per column")
    // fail fast on misconfiguration — for a governance operator a
    // silently unapplied policy is a security failure, not a no-op:
    // (1) every policy must name a real column (a case/typo mismatch
    // would return raw PII to every role);
    val missing = policies.map(_.column).filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"masking policies name absent columns: ${missing.mkString(", ")}")
    // (2) every mask must preserve its column's type — checked against
    // a probe that applies ALL masks regardless of the caller's role,
    // so a type-changing mask fails at policy-definition time, not on
    // the first unprivileged read (Snowflake masking policies carry
    // the same returns-same-type contract)
    val probe = df.select(df.columns.toSeq.map { c =>
      byCol.get(c).map(p => p.mask(col(c)).as(c)).getOrElse(col(c)) }: _*)
    probe.schema.fields.zip(df.schema.fields).foreach { case (m, o) =>
      require(m.dataType == o.dataType,
        s"mask for '${o.name}' changes its type " +
          s"${o.dataType.simpleString} -> ${m.dataType.simpleString}; " +
          "the governed view's schema must not depend on the reader's " +
          "role (use maskNull(dt) for non-string columns)")
    }
    df.select(df.columns.toSeq.map { c =>
      byCol.get(c) match {
        case Some(p) if !p.allowedRoles.contains(role) =>
          p.mask(col(c)).as(c)
        case _ => col(c)
      }
    }: _*)
  }

  /** Partial mask: keep the last `keep` chars, star the rest (the usual
    * last-4 rule); values at or under `keep` chars pass through whole
    * (nothing left to hide that the length doesn't already reveal).
    * One scan-side regexp — every char with ≥ `keep` chars after it
    * becomes '*'; NULL stays NULL. Equivalent to
    * `repeat('*', greatest(length-keep, 0)) || right(c, keep)`, which
    * is the RE2-safe formulation a DuckDB oracle uses (RE2 has no
    * lookahead). */
  def maskTail(c: Column, keep: Int): Column = {
    require(keep >= 0, "keep >= 0")
    regexp_replace(c, s"(?s).(?=(?s:.){$keep,})", "*")
  }

  /** Full redaction to a fixed token — STRING columns only (the
    * type-preservation check in [[applyMaskingPolicies]] rejects it
    * elsewhere; use [[maskNull]] for non-string columns). */
  def maskFull(c: Column): Column = when(c.isNotNull, lit("***MASKED***"))

  /** Type-preserving redaction for non-string columns: NULL of the
    * column's own type (`dt` is a Spark SQL type name, e.g. "double") —
    * the standard numeric/date masking policy shape. */
  def maskNull(dt: String): Column => Column = _ => lit(null).cast(dt)

  /** Deterministic tokenization: SHA-256 of the value — referential
    * integrity preserved (equal values mask to equal tokens, so joins
    * and GROUP BYs on the masked column still work), raw value
    * unrecoverable. The classic masking policy for join keys. */
  def maskHash(c: Column): Column = when(c.isNotNull, sha2(c, 256))

  /** Row-access policy: an entitlement table (role, key) decides row
    * visibility — the Snowflake `ROW ACCESS POLICY` shape (reference
    * README.md:63,132, "per manufacturer/region"). A LEFT SEMI join
    * against the role's entitlement rows; entitlement tables are
    * role-count × key-count small, so the semi-join broadcasts and the
    * policy costs one scan-side hash probe per row at any fact size. */
  def rowAccessFilter(df: DataFrame, keyCol: String,
                      entitlements: DataFrame, roleCol: String,
                      role: String): DataFrame =
    df.join(
      broadcast(entitlements.filter(col(roleCol) === role)
        .select(col(keyCol)).distinct()),
      Seq(keyCol), "left_semi")
}
