package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("k-anonymity audit flags small QI groups and low sensitive diversity") {
    // group (x,1): 3 rows, 3 users — fails k=5, passes l=2
    // group (y,1): 6 rows, 1 user  — passes k=5, fails l=2
    // group (z,1): 6 rows, 6 users — passes both
    val rows =
      (0 until 3).map(i => ("x", 1, s"u$i")) ++
      (0 until 6).map(_ => ("y", 1, "u0")) ++
      (0 until 6).map(i => ("z", 1, s"u$i"))
    val out = Privacy.kAnonymityAudit(rows.toDF("qi1", "qi2", "user"),
        Seq("qi1", "qi2"), col("user"), k = 5, minL = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(out("x") === ((3L, 3L, false, true)))
    assert(out("y") === ((6L, 1L, true, false)))
    assert(out("z") === ((6L, 6L, true, true)))
  }

  test("generalization banding coarsens failing groups into passing ones") {
    // ages 30..34 one row each: every exact age fails k=3; width-5 bands pass
    val rows = (30 to 34).map(a => (a.toLong, s"u$a"))
    val exact = Privacy.kAnonymityAudit(rows.toDF("age", "user"),
      Seq("age"), col("user"), k = 3)
    assert(exact.filter(col("k_anonymous")).count() === 0)
    val banded = rows.toDF("age", "user")
      .withColumn("age_band", Privacy.generalize(col("age"), 5))
    val audit = Privacy.kAnonymityAudit(banded, Seq("age_band"), col("user"), k = 3)
    assert(audit.count() === 1 && audit.filter(col("k_anonymous")).count() === 1)
    // floor semantics hold for negatives too
    val neg = Seq((-3L, "a"), (-7L, "b")).toDF("v", "u")
      .select(Privacy.generalize(col("v"), 5).as("b")).collect().map(_.getLong(0))
    assert(neg.toSeq === Seq(-5L, -10L))
  }

  test("audit plan: one QI-keyed aggregate, no joins") {
    val rows = (0 until 200).map(i => (s"t${i % 5}", i % 10, s"u${i % 17}"))
    val plan = Privacy.kAnonymityAudit(rows.toDF("a", "b", "u").repartition(4),
        Seq("a", "b"), col("u"), k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"no join expected:\n$plan")
  }

  test("masking policies: role-gated per column, NULL-safe masks") {
    import Privacy.MaskPolicy
    val df = Seq(("Alice Smith", "555-0147", 1L),
        ("Bo", null.asInstanceOf[String], 2L))
      .toDF("name", "phone", "id")
    val policies = Seq(
      MaskPolicy("name", Set("admin"), Privacy.maskTail(_, 3)),
      MaskPolicy("phone", Set("admin"), Privacy.maskFull),
      MaskPolicy("id", Set("admin", "analyst"), Privacy.maskNull("long")))
    val analyst = Privacy.applyMaskingPolicies(df, "analyst", policies)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // partial mask keeps last 3; short values pass whole; NULL stays NULL;
    // the allowed role sees id raw
    assert(analyst.toSet === Set(
      ("********ith", "***MASKED***", 1L), ("Bo", null, 2L)))
    val admin = Privacy.applyMaskingPolicies(df, "admin", policies)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(admin.toSet === Set(("Alice Smith", "555-0147"), ("Bo", null)))
    // deterministic tokenization preserves equality, hides the value
    val toks = Seq("k1", "k1", "k2").toDF("k")
      .select(Privacy.maskHash(col("k")).as("t")).collect().map(_.getString(0))
    assert(toks(0) === toks(1) && toks(0) != toks(2) && toks(0).length == 64)
  }

  test("masking misconfiguration fails fast: absent column, type change") {
    import Privacy.MaskPolicy
    val df = Seq(("a", 1L)).toDF("name", "bal")
    // a typo'd column would silently return raw PII — must throw
    val e1 = intercept[IllegalArgumentException] {
      Privacy.applyMaskingPolicies(df, "x",
        Seq(MaskPolicy("Name", Set("admin"), Privacy.maskFull)))
    }
    assert(e1.getMessage.contains("absent columns"))
    // a type-changing mask makes the schema role-dependent — must throw
    // even when the CALLER's role is allowed (probe applies all masks)
    val e2 = intercept[IllegalArgumentException] {
      Privacy.applyMaskingPolicies(df, "admin",
        Seq(MaskPolicy("bal", Set("admin"), Privacy.maskFull)))
    }
    assert(e2.getMessage.contains("changes its type"))
    // the type-preserving form passes and NULLs the value out
    val ok = Privacy.applyMaskingPolicies(df, "x",
      Seq(MaskPolicy("bal", Set("admin"), Privacy.maskNull("long"))))
    assert(ok.schema("bal").dataType === org.apache.spark.sql.types.LongType)
    assert(ok.select("bal").head().isNullAt(0))
  }

  test("maskTail edges: keep=0, short and equal-length values, NULL, empty") {
    val df = Seq("Alice", "Bo", "abc", null.asInstanceOf[String], "")
      .toDF("v")
    def masked(keep: Int): Seq[String] =
      df.select(Privacy.maskTail(col("v"), keep).as("m"))
        .collect().map(_.getString(0)).toSeq
    // len > keep → starred head; len <= keep → whole value; NULL → NULL
    assert(masked(3) === Seq("**ice", "Bo", "abc", null, ""))
    // keep=0 is full redaction preserving only length
    assert(masked(0) === Seq("*****", "**", "***", null, ""))
  }

  test("governed view composes masks + row access from a catalog table") {
    val df = Seq(("Alice", "AUTO", 10L, 1L), ("Brian", "BIKE", 20L, 2L),
        ("Clara", "AUTO", 30L, 3L))
      .toDF("name", "seg", "bal", "key")
    val catalog = Seq(
      ("t", "name", "mask_tail", "2", "admin"),
      ("t", "seg", "mask_full", "", "admin"),
      ("t", "bal", "mask_null", "long", "admin,analyst"),
      ("t", "key", "row_access", "", ""),
      ("other", "name", "mask_full", "", ""))
      .toDF("table_name", "column_name", "policy_kind", "policy_param",
        "allowed_roles")
    val ent = Seq(("analyst", 1L), ("analyst", 3L), ("admin", 2L))
      .toDF("role", "key")
    // the semi-join lifts the join key to the front: (key, name, seg, bal)
    val analyst = Privacy.governedView(df, "t", "analyst", catalog, Some(ent))
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(0))).toSet
    // masked name/seg, RAW bal (analyst allowed), rows 1 and 3 only
    assert(analyst === Set(("***ce", "***MASKED***", 10L, 1L),
      ("***ra", "***MASKED***", 30L, 3L)))
    val admin = Privacy.governedView(df, "t", "admin", catalog, Some(ent))
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    // admin sees raw values but STILL only its entitled rows
    assert(admin === Set(("Brian", 2L)))
  }

  test("governed view fails fast, never fails open, on catalog problems") {
    val df = Seq(("a", 1L)).toDF("name", "key")
    val ent = Seq(("r", 1L)).toDF("role", "key")
    def cat(rows: (String, String, String, String, String)*) =
      rows.toSeq.toDF("table_name", "column_name", "policy_kind",
        "policy_param", "allowed_roles")
    // unknown kind
    val e1 = intercept[IllegalArgumentException] {
      Privacy.governedView(df, "t", "r",
        cat(("t", "name", "mask_rot13", "", "")), Some(ent))
    }
    assert(e1.getMessage.contains("unknown policy_kind"))
    // catalog names an absent column (the applyMaskingPolicies guard)
    val e2 = intercept[IllegalArgumentException] {
      Privacy.governedView(df, "t", "r",
        cat(("t", "ghost", "mask_full", "", "")), Some(ent))
    }
    assert(e2.getMessage.contains("absent columns"))
    // a table with no bound policies must not silently read ungoverned
    val e3 = intercept[IllegalArgumentException] {
      Privacy.governedView(df, "typo", "r",
        cat(("t", "name", "mask_full", "", "")), Some(ent))
    }
    assert(e3.getMessage.contains("no policies bound"))
    assert(Privacy.governedView(df, "typo", "r",
      cat(("t", "name", "mask_full", "", "")), Some(ent),
      requirePolicies = false).count() === 1)
    // row_access bound but no entitlement table provided
    val e4 = intercept[IllegalArgumentException] {
      Privacy.governedView(df, "t", "r",
        cat(("t", "key", "row_access", "", "")), None)
    }
    assert(e4.getMessage.contains("entitlement"))
    // malformed mask_tail param
    val e5 = intercept[IllegalArgumentException] {
      Privacy.governedView(df, "t", "r",
        cat(("t", "name", "mask_tail", "three", "")), Some(ent))
    }
    assert(e5.getMessage.contains("integer policy_param"))
    // a mask that cannot resolve against the column's type surfaces as
    // the policy-misconfiguration message, not a raw AnalysisException
    val e6 = intercept[IllegalArgumentException] {
      Privacy.governedView(df, "t", "r",
        cat(("t", "key", "mask_hash", "", "")), Some(ent))
    }
    assert(e6.getMessage.contains("masking policy misconfiguration"))
  }

  test("conditional mask: per-row consent, fail-closed NULL, role bypass, misconfig") {
    val df = Seq(("Alice", Some(true)), ("Brian", Some(false)),
        ("Clara", None: Option[Boolean]))
      .toDF("name", "consent")
    val catalog = Seq(("t", "name", "mask_tail unless consent", "2", "admin"))
      .toDF("table_name", "column_name", "policy_kind", "policy_param",
        "allowed_roles")
    val analyst = Privacy.governedView(df, "t", "analyst", catalog)
      .collect().map(r => r.getString(0)).toSet
    // consent=true raw; false masked; NULL masked (fail-closed)
    assert(analyst === Set("Alice", "***an", "***ra"))
    val admin = Privacy.governedView(df, "t", "admin", catalog)
      .collect().map(r => r.getString(0)).toSet
    assert(admin === Set("Alice", "Brian", "Clara"), "allowed role bypasses")
    // a non-boolean condition column is a misconfiguration, not raw data
    val bad = Seq(("Alice", "yes")).toDF("name", "consent")
    val e = intercept[IllegalArgumentException] {
      Privacy.governedView(bad, "t", "analyst", catalog)
    }
    assert(e.getMessage.contains("masking policy misconfiguration"))
    // an absent condition column fails the same way
    val e2 = intercept[IllegalArgumentException] {
      Privacy.governedView(df.drop("consent").withColumn("x", lit(1)),
        "t", "analyst", catalog)
    }
    assert(e2.getMessage.contains("masking policy misconfiguration"))
  }

  test("aggregation policy: small groups fold into a NULL-key remainder") {
    // groups: a=5 rows, b=2, c=1, NULL key=2 -> floor 4: a survives,
    // b+c+NULL fold to one remainder row (5 rows total)
    val rows = (0 until 5).map(i => (Some("a"), i.toDouble)) ++
      Seq((Some("b"), 10.0), (Some("b"), 20.0), (Some("c"), 7.0),
        (None: Option[String], 1.0), (None: Option[String], 2.0))
    val df = rows.toDF("g", "x")
    val out = Privacy.aggregationPolicy(df, Seq("g"),
        Seq(("x", "count", "n"), ("x", "sum", "sx"),
          ("x", "min", "mn"), ("x", "max", "mx")), minGroupSize = 4)
      .collect().map(r => (Option(r.getString(0)),
        r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(out === Set(
      (Some("a"), 5L, 10.0, 0.0, 4.0),
      (None, 5L, 40.0, 1.0, 20.0)))
    // all groups at/above the floor: identical to the plain aggregate
    val big = Privacy.aggregationPolicy(df.filter($"g" === "a"), Seq("g"),
        Seq(("x", "sum", "sx")), minGroupSize = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(big === Set(("a", 10.0)))
    // non-re-aggregable fn is rejected up front
    val e = intercept[IllegalArgumentException] {
      Privacy.aggregationPolicy(df, Seq("g"), Seq(("x", "avg", "ax")), 4)
    }
    assert(e.getMessage.contains("not re-aggregable"))
  }

  test("projection policy: filter/join allowed, any projection shape denied") {
    val base = java.nio.file.Files.createTempDirectory("proj_pol").toString
    (0 until 10).map(i => (i.toLong, s"$i$i-555-000-000$i", s"S${i % 2}", i * 1.5))
      .toDF("k", "phone", "seg", "bal")
      .write.parquet(s"$base/cust.parquet")
    (0 until 10).map(i => (s"$i$i-555-000-000$i", s"carrier${i % 3}"))
      .toDF("phone", "carrier")
      .write.parquet(s"$base/dim.parquet")
    val cust = spark.read.parquet(s"$base/cust.parquet")
    val dim = spark.read.parquet(s"$base/dim.parquet")
    val catalog = Seq(("cust", "phone", "no_project", "", "admin"))
      .toDF("table_name", "column_name", "policy_kind", "policy_param",
        "allowed_roles")
    // ALLOWED: the protected column selects rows (filter + join key) but
    // builds no served value — returned unchanged
    val served = cust.filter(col("phone").startsWith("1"))
      .join(dim, Seq("phone"))
      .groupBy(col("seg")).agg(sum(col("bal")).as("b"),
        count(col("carrier")).as("n"))
    assert(Privacy.enforceProjectionPolicies(served, "analyst", catalog)
      .collect().length === 1)
    // DENIED: direct, aliased, wrapped, and aggregated projections all
    // derive from the protected column — renaming cannot launder it
    val denied = Seq[org.apache.spark.sql.DataFrame](
      cust.select(col("k"), col("phone")),
      cust.select(col("phone").as("contact")),
      cust.select(substring(col("phone"), -4, 4).as("tail4")),
      cust.groupBy(col("seg")).agg(max(col("phone")).as("top")))
    denied.foreach { q =>
      val e = intercept[IllegalArgumentException] {
        Privacy.enforceProjectionPolicies(q, "analyst", catalog)
      }
      assert(e.getMessage.contains("projection policy violation"),
        e.getMessage)
    }
    // an allowed role projects freely; a catalog without no_project rows
    // gates nothing; a same-named column from ANOTHER table is untouched
    assert(Privacy.enforceProjectionPolicies(
      cust.select(col("phone")), "admin", catalog).count() === 10)
    assert(Privacy.enforceProjectionPolicies(cust.select(col("phone")),
      "analyst", catalog.filter(col("policy_kind") =!= "no_project"))
      .count() === 10)
    assert(Privacy.enforceProjectionPolicies(dim.select(col("phone")),
      "analyst", catalog).count() === 10)
  }

  test("classify: decision threshold, precedence, all-null and absent columns") {
    // 10 rows: phone 100% phone-shaped; mixed 9/10 date-shaped (exactly
    // at the 0.9 floor -> classified); weak 5/10 (under -> text, best
    // count still reported); blank all-NULL (n_values=0 -> text)
    val rows = (0 until 10).map { i =>
      (f"$i%02d-123-456-7890",
        if (i < 9) "2024-01-05" else "n/a",
        if (i < 5) "2024-01-05" else "words",
        null.asInstanceOf[String], i.toLong)
    }
    val df = rows.toDF("phone", "mixed", "weak", "blank", "id")
    val out = Privacy.classify(df)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("phone") === (("phone", 10L, 10L)))
    assert(out("mixed") === (("date_iso", 10L, 9L)))
    assert(out("weak") === (("text", 10L, 5L)))
    assert(out("blank") === (("text", 0L, 0L)))
    assert(!out.contains("id"), "non-string columns are not classified")
    val e = intercept[IllegalArgumentException] {
      Privacy.classify(df, columns = Seq("ghost"))
    }
    assert(e.getMessage.contains("absent columns"))
    // zero-match nonempty column: ties across categories resolve by
    // registry precedence, label is text either way
    val none = Privacy.classify(Seq("plain words").toDF("c"))
      .collect().map(r => (r.getString(1), r.getLong(3))).head
    assert(none === (("text", 0L)))
  }

  test("auto-mask: classifier output binds catalog rows end-to-end") {
    val df = Seq(("11-123-456-7890", "free text", 1L),
        ("22-987-654-3210", "more text", 2L))
      .toDF("phone", "note", "k")
    val catalog = Privacy.autoMaskCatalog(Privacy.classify(df), "t",
      Map("phone" -> ("mask_tail", "4"), "email" -> ("mask_hash", "")))
    val rows = catalog.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3), r.getString(4)))
    // only the detected phone column binds; 'text' categories emit no row
    assert(rows.toSeq === Seq(("t", "phone", "mask_tail", "4", "admin")))
    val governed = Privacy.governedView(df, "t", "analyst", catalog)
      .select("phone").collect().map(_.getString(0)).toSet
    assert(governed === Set("***********7890", "***********3210"))
    // the classifier found nothing to rule -> empty catalog -> the
    // governedView typo guard refuses to serve it as "governed"
    val noPii = Privacy.autoMaskCatalog(
      Privacy.classify(Seq(("words", 1L)).toDF("note", "k")), "t",
      Map("phone" -> ("mask_tail", "4")))
    val e = intercept[IllegalArgumentException] {
      Privacy.governedView(df, "t", "analyst", noPii)
    }
    assert(e.getMessage.contains("no policies bound"))
    val e2 = intercept[IllegalArgumentException] {
      Privacy.autoMaskCatalog(Privacy.classify(df), "t", Map.empty)
    }
    assert(e2.getMessage.contains("empty rule set"))
  }

  test("masking is a pure projection; row access is a broadcast semi-join") {
    import Privacy.MaskPolicy
    val df = (0 until 50).map(i => (s"n$i", i.toLong)).toDF("name", "key")
      .repartition(4)
    val maskedPlan = Privacy.applyMaskingPolicies(df, "analyst",
        Seq(MaskPolicy("name", Set("admin"), Privacy.maskTail(_, 2))))
      .queryExecution.executedPlan.toString
    assert(!maskedPlan.toLowerCase.contains("join") &&
      !maskedPlan.contains("Exchange hashpartitioning"),
      s"masking must stay scan-side:\n$maskedPlan")
    val ent = Seq(("analyst_emea", 1L), ("analyst_emea", 3L),
      ("analyst_amer", 2L)).toDF("role", "key")
    val filtered = Privacy.rowAccessFilter(df, "key", ent, "role",
      "analyst_emea")
    assert(filtered.select("key").collect().map(_.getLong(0)).toSet ===
      Set(1L, 3L))
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"entitlements must broadcast:\n$p")
  }
}
