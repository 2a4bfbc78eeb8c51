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
    val probe =
      try df.select(df.columns.toSeq.map { c =>
        byCol.get(c).map(p => p.mask(col(c)).as(c)).getOrElse(col(c)) }: _*)
      catch {
        // a mask that doesn't even RESOLVE against its column's type
        // (e.g. maskHash on a numeric column) is the same
        // misconfiguration class as a type-changing one — surface it as
        // such, not as a raw analysis error from the probe internals
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            "masking policy misconfiguration: a mask does not apply to " +
              s"its column's type (use maskNull(dt) for non-string " +
              s"columns): ${e.getMessage}", e)
      }
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
    * Linear scan-side string ops — `repeat('*', length-keep) ||
    * substr(c, -keep)` — the same formulation a DuckDB oracle states as
    * `repeat('*', greatest(length-keep, 0)) || right(c, keep)`. (An
    * earlier per-position lookahead regexp was semantically identical
    * but O(len²) worst case per value; fine for short PII columns,
    * strictly worse on long text.) NULL stays NULL (the length
    * comparison is NULL → otherwise-branch → concat over NULL). The
    * explicit short-value guard covers Spark's substring semantics,
    * where `substr(c, -keep)` yields '' (not the whole value) when
    * |c| < keep. */
  def maskTail(c: Column, keep: Int): Column = {
    require(keep >= 0, "keep >= 0")
    when(length(c) <= keep, c)
      .otherwise(concat(repeat(lit("*"), length(c) - keep),
        substring(c, -keep, keep)))
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
    * role-count × key-count small BY CONSTRUCTION (grants are written
    * by administrators, not generated by pipelines), so the semi-join
    * broadcasts and the policy costs one scan-side hash probe per row
    * at any fact size. The assumption is guarded, not assumed: the
    * role's distinct key count is probed first (one tiny bounded job),
    * and past `maxBroadcastKeys` the semi-join degrades to a shuffle
    * instead of OOMing the driver with a pathological "entitlement"
    * table. */
  def rowAccessFilter(df: DataFrame, keyCol: String,
                      entitlements: DataFrame, roleCol: String,
                      role: String, maxBroadcastKeys: Int = 1 << 22): DataFrame = {
    val keys = entitlements.filter(col(roleCol) === role)
      .select(col(keyCol)).distinct()
    val oversized =
      keys.limit(maxBroadcastKeys + 1).count() > maxBroadcastKeys
    df.join(if (oversized) keys else broadcast(keys), Seq(keyCol), "left_semi")
  }

  // --------------------------------------------------- policy catalog

  /** Catalog column contract for [[governedView]] — one row per bound
    * policy, seed-CSV friendly (all STRING):
    *
    *   table_name   — the governed table this row binds to
    *   column_name  — masked column, or the entitlement KEY column for
    *                  `row_access`
    *   policy_kind  — mask_tail | mask_full | mask_null | mask_hash |
    *                  row_access
    *   policy_param — mask_tail: chars kept; mask_null: Spark SQL type
    *                  name; otherwise empty
    *   allowed_roles — comma-separated roles that see RAW values
    *                  (ignored for row_access: visibility comes from the
    *                  entitlement table)
    */
  val CatalogColumns: Seq[String] =
    Seq("table_name", "column_name", "policy_kind", "policy_param",
      "allowed_roles")

  /**
   * Declarative policy binding — the `ALTER TABLE … SET MASKING/ROW
   * ACCESS POLICY` analog (reference README.md:63,132): instead of
   * call-site [[MaskPolicy]] arguments, the policy set is DATA — a
   * persisted catalog table in the [[CatalogColumns]] shape — and the
   * governed view is composed from whatever the catalog says about
   * `tableName`. Governance-as-data is what makes policies auditable
   * (the catalog is itself queryable/publishable like any mart) and
   * centrally administered (one catalog row change re-governs every
   * reader).
   *
   * The catalog is governance METADATA — a handful of rows per table by
   * construction — so the driver-side collect here is bounded the same
   * way [[graft.operators.Knn]]'s k centroids are. Misconfiguration
   * fails fast, never fails open: an unparseable catalog (missing
   * columns, unknown kind, malformed param, a `row_access` row without
   * an entitlement table) and every [[applyMaskingPolicies]] guard
   * (absent column, type-changing mask) throw at view-construction
   * time; a table with NO catalog rows also throws — for a governance
   * operator, "ungoverned" must be an explicit caller decision
   * (`requirePolicies = false`), not the silent result of a typo'd
   * table name.
   *
   * Plan shape: identical to the call-site forms — masks fold to a
   * scan-side projection, row access is one broadcast semi probe — the
   * catalog only changes WHERE the policy comes from, not what it
   * costs.
   */
  def governedView(df: DataFrame, tableName: String, role: String,
                   catalog: DataFrame,
                   entitlements: Option[DataFrame] = None,
                   entitlementRoleCol: String = "role",
                   requirePolicies: Boolean = true): DataFrame = {
    val missingCat = CatalogColumns.filterNot(catalog.columns.contains)
    require(missingCat.isEmpty,
      s"policy catalog lacks columns: ${missingCat.mkString(", ")} " +
        s"(expected ${CatalogColumns.mkString(", ")})")
    val rows = catalog.filter(col("table_name") === tableName)
      .select(CatalogColumns.map(col): _*).collect()
    require(!requirePolicies || rows.nonEmpty,
      s"no policies bound to table '$tableName' — a typo'd table name " +
        "would silently return raw data; pass requirePolicies = false " +
        "to read a deliberately ungoverned table through this API")
    def cell(r: org.apache.spark.sql.Row, i: Int): Option[String] =
      Option(r.getString(i)).map(_.trim).filter(_.nonEmpty)
    val (accessRows, maskRows) =
      rows.toSeq.partition(r => cell(r, 2).contains("row_access"))
    val policies = maskRows.map { r =>
      val column = cell(r, 1).getOrElse(
        throw new IllegalArgumentException(
          s"catalog row for '$tableName' has an empty column_name"))
      val kind = cell(r, 2).getOrElse("")
      val param = cell(r, 3)
      val roles = cell(r, 4)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty[String])
      def intParam: Int = param.flatMap(_.toIntOption).getOrElse(
        throw new IllegalArgumentException(
          s"$kind('$column') needs an integer policy_param, " +
            s"got '${param.getOrElse("")}'"))
      val mask: Column => Column = kind match {
        case "mask_tail" => maskTail(_, intParam)
        case "mask_full" => maskFull
        case "mask_hash" => maskHash
        case "mask_null" => maskNull(param.getOrElse(
          throw new IllegalArgumentException(
            s"mask_null('$column') needs a type name in policy_param")))
        case other => throw new IllegalArgumentException(
          s"unknown policy_kind '$other' for column '$column' of " +
            s"'$tableName' (known: mask_tail, mask_full, mask_null, " +
            "mask_hash, row_access)")
      }
      MaskPolicy(column, roles, mask)
    }
    val masked = applyMaskingPolicies(df, role, policies)
    accessRows.foldLeft(masked) { (acc, r) =>
      val keyCol = cell(r, 1).getOrElse(
        throw new IllegalArgumentException(
          s"row_access row for '$tableName' has an empty column_name"))
      require(acc.columns.contains(keyCol),
        s"row_access policy on '$tableName' names absent key column " +
          s"'$keyCol'")
      val ent = entitlements.getOrElse(
        throw new IllegalArgumentException(
          s"catalog binds a row_access policy to '$tableName' but no " +
            "entitlement table was provided"))
      rowAccessFilter(acc, keyCol, ent, entitlementRoleCol, role)
    }
  }
}
