package graft

import graft.functions.{F, Text, Vec}
import graft.operators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Driver contract (see SURVEY.md §2/§7): one named query per implemented
 * operator, each with equivalent DuckDB SQL for the hash-compare oracle.
 *
 * Determinism conventions (required for cross-engine hash equality):
 *  - every aggregated DOUBLE is `round()`ed (sums→2dp, means→4dp, ratios→6dp);
 *  - every integer-valued output is LONG on the Spark side (DuckDB emits
 *    int64 for counts/yearparts); dates/timestamps are emitted as strings
 *    or epoch seconds;
 *  - vector math casts float→double *before* arithmetic and accumulates
 *    sequentially on both engines (bit-identical — see [[graft.functions.Vec]]);
 *  - ties in every window ordering are broken by a unique id column.
 */
object SparkEntry {
  import Tables._

  /** Order-independent money sum — closes the r16 q04-at-sf1 incident
    * class. `round(sum(double), 2)` over a 2-decimal-grained money
    * column is a half-ulp coin flip: the double sum's last-ulp error is
    * partition-order-dependent, so the SAME query at the SAME data can
    * round a cent differently between two engines — or two runs — when
    * the true sum sits within the accumulated error of a .xx5 boundary
    * (observed: q04 ASIA revenue, 71626750.05 vs .04, flipped by the
    * executor-thread count alone). Every factor here is verified
    * 2-decimal-grained and non-negative at all scales (testdata +
    * benchdata audit, r16), so each cast to DECIMAL(12,2) is exact,
    * products widen to at most DECIMAL(38,6) with no precision-loss
    * adjustment (12,2 ×3 → 38,6 exactly at Spark's cap), the decimal
    * sum is exact and order-independent, and the single round-then-cast
    * is identical arithmetic in Spark and DuckDB. The oracle mirrors
    * the same casts, so both engines compute the same rational number.
    * (Small-group raw sums — q106's per-customer state, q151's policy
    * aggregate — keep plain double sums: ≤ tens of addends, exposure
    * ~1e-8 per group, and their operators are money-agnostic.) */
  private val MoneyDec = org.apache.spark.sql.types.DecimalType(12, 2)
  private def moneySum(factors: Column*): Column =
    round(sum(factors.map(_.cast(MoneyDec)).reduce(_ * _)), 2).cast("double")
  /** The exact decimal sum itself (no rounding shell) — for derived
    * shells like `sum/count` that must divide BEFORE rounding; cast to
    * double at the use site so the division runs on identical IEEE
    * operands in both engines. */
  private def moneySumRaw(c: Column): Column = sum(c.cast(MoneyDec))

  /** Flagship: rolling z-score "early signals" over quarterly order counts
    * per priority class (the reference's v_ae_early_signals semantics). */
  def entry(spark: SparkSession): DataFrame =
    earlySignals(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  private def pricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("sum_disc_price"),
        moneySum(col("l_extendedprice"), lit(1.0) - col("l_discount"),
          lit(1.0) + col("l_tax")).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  private def revenueFilter(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg(moneySum(col("l_extendedprice"), col("l_discount")).as("revenue"))

  private def segmentRevenue(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("revenue"),
        round(avg(col("c_acctbal")), 4).as("avg_acctbal"))

  /** TPC-H Q5 shape: revenue by nation where customer and supplier share the
    * nation, one region, one year. Dim chain broadcast end-to-end. */
  private def regionNationRevenue(s: SparkSession, d: String): DataFrame = {
    val dims = nation(s, d)
      .join(region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
    lineitem(s, d)
      .join(orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("o_orderdate") <  lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(dims), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(moneySum(col("l_extendedprice"), lit(1.0) - col("l_discount"))
        .as("revenue"))
  }

  /** Multi-branch CASE normalization (reference P6 event_type semantics). */
  private def priorityClass(s: SparkSession, d: String): DataFrame = {
    val p = upper(trim(col("o_orderpriority")))
    orders(s, d)
      .withColumn("priority_class",
        when(p.isin("1-URGENT", "2-HIGH"), lit("Critical"))
          .when(col("o_orderpriority").isNull || p === "" || p === "4-NOT SPECIFIED",
            lit("No Answer Provided"))
          .otherwise(lit("Other")))
      .groupBy(col("priority_class"))
      .agg(count(lit(1)).as("n"))

  }

  /** ILIKE-ladder topic heuristic (reference P7 failure-mode semantics). */
  private def docTopics(s: SparkSession, d: String): DataFrame = {
    val t = col("text")
    val topic =
      when(t.ilike("%window%"), lit("WINDOW"))
        .when(t.ilike("%stream%"), lit("STREAM"))
        .when(t.ilike("%merge%"), lit("MERGE"))
        .when(t.ilike("%join%"), lit("JOIN"))
        .when(t.ilike("%sort%"), lit("SORT"))
        .when(t.ilike("%hash%"), lit("HASH"))
        .when(t.ilike("%scan%"), lit("SCAN"))
    documents(s, d)
      .select(coalesce(topic, lit("(unknown)")).as("topic"))
      .groupBy(col("topic"))
      .agg(count(lit(1)).as("n"))
  }

  private def topEventsPerUser(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    events(s, d)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("user_id"), col("event_id"), col("value"), col("rank"))
  }

  private def earlySignals(s: SparkSession, d: String): DataFrame =
    EarlySignals(orders(s, d), Seq(col("o_orderpriority")),
        Seq("o_orderpriority"), col("o_orderdate"))
      .select(
        col("o_orderpriority"), col("quarter_index"), col("year_quarter"),
        col("n_events"), col("rn"),
        round(col("mean_4"), 4).as("mean_4"),
        round(col("std_4"), 4).as("std_4"),
        round(col("z_score"), 4).as("z_score"))

  private def orderLinesListagg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(
        F.orderedListagg(col("l_linenumber").cast("string"), col("l_linenumber"), ",")
          .as("line_numbers"),
        count(lit(1)).as("n_lines"))

  private def tokenCounts(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))

  private def orderSurrogateKeys(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderkey"),
      F.surrogateKey(col("o_orderkey"), col("o_orderstatus"),
        date_format(col("o_orderdate"), "yyyy-MM-dd")).as("order_sk"))

  private def jsonExtract(s: SparkSession, d: String): DataFrame =
    // try_cast (not cast): under ANSI mode an unguarded cast of a
    // malformed $.k would throw at runtime; both engines yield NULL.
    events(s, d).select(
      col("event_id"),
      expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("k_value"))

  /** q115: the Spark-4 `VariantType` late-binding twin of the staging
    * extraction (reference stg_maude.sql:6-25; SURVEY §1.2 names
    * `parse_json`/VariantType as the closest VARIANT analog). A JSON
    * payload is built row-wise from orders (every 97th deliberately
    * malformed), landed as a VARIANT via `try_parse_json` — bad payloads
    * drop exactly like Snowflake COPY `ON_ERROR = CONTINUE` — and every
    * field is then re-derived by late-bound `try_variant_get` path+cast
    * ([[graft.sources.VariantIngest.path]]), including a nested array
    * element (the `raw:"device"[0]:"brand_name"` shape) and a missing
    * path, which must yield NULL and never an error. The oracle
    * recomputes each extracted value straight from the base columns, so
    * build→parse→extract round-trip equality IS the correctness
    * statement. Scale: a pure scan-side projection — no shuffle, no
    * join; VARIANT binary never leaves the scan stage. */
  private def variantExtract(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VariantIngest
    val payload = when(pmod(col("o_orderkey"), lit(97)) === 0, lit("{not json"))
      .otherwise(to_json(struct(
        col("o_orderkey"), col("o_orderstatus"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        array(struct(col("o_orderpriority").as("p"),
          col("o_custkey").as("c"))).as("items"))))
    orders(s, d).select(try_parse_json(payload).as("raw"))
      .filter(col("raw").isNotNull)
      .select(
        VariantIngest.path(col("raw"), "$.o_orderkey", "long").as("o_orderkey"),
        VariantIngest.path(col("raw"), "$.o_orderstatus", "string").as("status"),
        VariantIngest.path(col("raw"), "$.o_orderdate", "string").as("odate"),
        VariantIngest.path(col("raw"), "$.items[0].p", "string").as("first_priority"),
        VariantIngest.path(col("raw"), "$.items[0].c", "long").as("first_cust"),
        VariantIngest.path(col("raw"), "$.missing.path", "string").as("missing_path"))
  }

  /** try-parse of YYYYMMDD strings with injected malformed values (F17). */
  private def parseDates(s: SparkSession, d: String): DataFrame = {
    val raw = when(col("o_orderkey") % 97 === 0, lit("1999x101"))
      .otherwise(date_format(col("o_orderdate"), "yyyyMMdd"))
    orders(s, d).select(
      col("o_orderkey"),
      date_format(F.parseYyyymmdd(raw), "yyyy-MM-dd").as("parsed_date"),
      F.yearQuarterLabel(F.parseYyyymmdd(raw)).as("year_quarter"))
  }

  private def dedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(documents(s, d), "doc_id", "text")

  private def ngramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(
      documents(s, d).filter(col("doc_id") < 1000), "doc_id", "text",
      n = 2, threshold = 0.2)

  private def knnBrute(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    Knn.bruteTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
  }

  private def textQuality(s: SparkSession, d: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    documents(s, d).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      round(Text.totalTokenLen(toks) / size(toks), 4).as("avg_token_len"),
      round(Text.stopwordRatio(toks), 6).as("stop_ratio"),
      Text.bpeTokenCount(col("text")).as("n_bpe_tokens"))
  }

  private def langId(s: SparkSession, d: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    val (en, de, fr) = Text.langScores(toks)
    documents(s, d).select(
      col("doc_id"), Text.langGuess(toks).as("lang_guess"),
      en.as("en_score"), de.as("de_score"), fr.as("fr_score"))
  }

  private def fingerprints(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"), Text.fingerprint(Text.tokens(col("text"))).as("fingerprint"))

  /** Oracle-parity MinHash+LSH (SHA-256 lanes — see [[graft.functions.ShaLanes]]);
    * the xxhash64 scan-side kernel ([[Dedup.minhashLshPairs]]) is the scale
    * primary, cross-checked in DedupSpec. */
  private def minhashLsh(s: SparkSession, d: String): DataFrame =
    Dedup.minhashLshPairsSha(documents(s, d), "doc_id", "text",
      shingleN = 3, bands = 4, rowsPerBand = 4)

  /** Incremental dedup admission ([[Dedup.lshIndex]] +
    * [[Dedup.admitIncremental]]): the corpus with doc_id >= 250 plays the
    * already-admitted index (grows with sf), the fixed 250-doc batch
    * (doc_id < 250) is admitted against it — index scanned once, batch
    * buckets broadcast. SHA signature family for oracle parity; the
    * xxhash64 family is the scale primary (DedupSpec cross-checks). */
  private def lshAdmit(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val index = Dedup.lshIndex(docs.filter(col("doc_id") >= 250), "doc_id", "text",
      shingleN = 3, bands = 4, rowsPerBand = 4,
      sigFn = Dedup.minhashSignaturesSha)
    Dedup.admitIncremental(index, docs.filter(col("doc_id") < 250),
        "doc_id", "text", threshold = 0.5, shingleN = 3, bands = 4,
        rowsPerBand = 4, sigFn = Dedup.minhashSignaturesSha)
      .select(col("doc"), col("dup_of"), col("est_jaccard"))
  }

  /** Oracle-parity SimHash (60-bit SHA-256 lanes); the xxhash64 scan-side
    * kernel ([[Dedup.simhashPairs]]) is the scale primary. */
  private def simhashPairs(s: SparkSession, d: String): DataFrame =
    Dedup.simhashPairsSha(documents(s, d), "doc_id", "text",
      maxHamming = 8, prefixBits = 8)

  private def embeddingNearDup(s: SparkSession, d: String): DataFrame =
    Dedup.embeddingNearDups(embeddings(s, d), "vec_id", "embedding", threshold = 0.3)

  /** ANN embedding near-dup — the declared scale path whose brute
    * baseline is q22 ([[Dedup.embeddingNearDups]]). SHA-derived
    * hyperplanes ([[Knn.lshSignatureSha]]) so the DuckDB oracle can
    * rebuild the exact signatures; the xxhash64 kernel is the scale
    * primary, cross-checked in DedupSpec. */
  private def lshNearDup(s: SparkSession, d: String): DataFrame =
    Dedup.lshNearDupPairs(embeddings(s, d), "vec_id", "embedding",
      threshold = 0.3, bits = 8, tables = 2, sig = Knn.lshSignatureSha)

  /** Funnel (q73): view → click → purchase stage per user over the
    * events stream ([[Funnel.stages]] — greedy earliest-match automaton,
    * one user-keyed shuffle of step-typed events only). Order key =
    * microsecond event time (the engines' shared truncation) with
    * event_id as the unique tiebreak. */
  private def funnelQ(s: SparkSession, d: String): DataFrame =
    Funnel.stages(events(s, d), col("user_id"), unix_micros(col("ts")),
      col("event_id"), col("event_type"), Seq("view", "click", "purchase"))

  /** PQ reconstruction fidelity (q80): cosine between each vector and
    * its decode(encode(v)) under the SHA codebook — the quantization-
    * error audit of the q60 index ([[Pq.decodeCol]]; encode is the
    * native kernel, decode a codebook-literal lookup — pure scan). */
  private def pqDistortionQ(s: SparkSession, d: String): DataFrame = {
    val cb = Pq.shaCodebook(m = 8, k = 16, subDim = 8)
    embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .select(col("vec_id"),
        round(Vec.cosine(col("v"),
          Pq.decodeCol(Pq.encodeCol(col("v"), cb), cb)), 4).as("recon_cosine"))
  }

  /** Matryoshka retention (q79): per dim-budget, how much of each
    * embedding's norm the prefix keeps (||v[:k]|| / ||v||) — the
    * go/no-go check before serving truncated vectors (MRL-style
    * dimension cuts for 2-4× cheaper ANN). Scan-side ratio + one
    * 3-group aggregate; p10 is the tail that decides. */
  private def matryoshkaQ(s: SparkSession, d: String): DataFrame = {
    val budgets = Seq(16, 32, 48)
    val rows = budgets.map(b => struct(lit(b.toLong).as("dims"),
      (Vec.norm(slice(col("v"), 1, b)) / Vec.norm(col("v"))).as("r")))
    embeddings(s, d)
      .select(col("embedding").cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .select(explode(array(rows: _*)).as("e"))
      .select(col("e.dims").as("dims"), col("e.r").as("r"))
      .groupBy(col("dims"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("r")), 4).as("avg_retained"),
        round(percentile(col("r"), lit(0.1)), 4).as("p10_retained"))
  }

  /** DSIR resampling (q78): q67's weights pushed through the sigmoid
    * acceptance draw ([[Curate.dsirResample]], T = 20) — the importance-
    * resampled corpus cut, still a pure scan-side plan. */
  private def dsirResampleQ(s: SparkSession, d: String): DataFrame =
    Curate.dsirResample(dsirWeightsQ(s, d), "doc_id", temperature = 20.0)
      .select(col("doc_id"), col("is_target"), col("dsir_logweight"),
        col("p_accept"))

  /** Coverage shift (q77): train-vs-eval density per IVF list under
    * q47's centroids ([[Knn.coverageShift]] — scan-side assignment, one
    * k-row aggregate, zero joins). Slice = odd vec_id ("eval"). */
  private def coverageShiftQ(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val cents = Knn.kmeansCentroidsSha(emb, "vec_id", "embedding", k = 8, iters = 2)
    Knn.coverageShift(emb, cents, "vec_id", "embedding",
      slice = col("vec_id") % 2 === 1, tolerance = 0.02)
  }

  /** Text normalization (q76): the CCNet-style cleaning stage — NFC
    * (native [[graft.functions.expressions.NfcNormalize]] kernel) →
    * lowercase → whitespace collapse → trim, a pure scan-side projection
    * ([[Text.cleaned]]). Output carries the cleaned text so the oracle
    * hash-checks the transform byte-for-byte. */
  private def normalizeQ(s: SparkSession, d: String): DataFrame = {
    val c = Text.cleaned(col("text"))
    documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), c.as("clean_text"),
        length(c).cast("long").as("clean_len"),
        (length(col("text")) - length(c)).cast("long").as("n_removed"))
  }

  /** Model-signal curation policy (q75): the ensemble keep/drop decision
    * combining the rule-based quality gate (q36's
    * [[graft.functions.Text.qualityRules]]), the Gopher repetition flags
    * (q61), and corpus-LM fluency (q66's surprisal ≤ 6.0 — the
    * [[LangModel.surprisal]] median at sf0.01 is ~5.8). The two
    * trained unigram model rides in as a map literal
    * ([[LangModel.columnsOf]]), so ALL THREE signal families evaluate in
    * ONE scan of the corpus — the whole policy is a pure projection with
    * zero joins and zero shuffles. */
  private def modelFilterQ(s: SparkSession, d: String): DataFrame = {
    val doc = documents(s, d).filter(col("text").isNotNull)
    val toks = Text.tokens(col("text"))
    val (_, _, _, _, qKeep) = Text.qualityRules(toks, minTokens = 30,
      maxTokens = 100000, minAvgTokenLen = 3.0, maxAvgTokenLen = 10.0,
      minStopRatio = 0.05, minDistinctRatio = 0.3)
    val repetitive = Text.dupNgramFrac(toks, 2) > 0.2 ||
      Text.dupNgramFrac(toks, 3) > 0.15 || Text.topTokenRatio(toks) > 0.2
    val model = LangModel.train(doc, "text", vocabSize = 20, alpha = 0.5)
    val (_, surprisal, _) = LangModel.columnsOf(model, toks)
    doc.select(col("doc_id"), qKeep.as("quality_ok"),
        (!repetitive).as("not_repetitive"),
        (surprisal <= 6.0).as("fluent"))
      .withColumn("keep",
        col("quality_ok") && col("not_repetitive") && col("fluent"))
  }

  /** Retention cohorts (q74): distinct active users per (first-activity
    * week, week offset) — [[Cohorts.retention]]; the distinct and the
    * cohort min share one user-keyed partitioning. The cohort week is
    * emitted as a yyyy-MM-dd string per the determinism conventions
    * above (a raw DATE column hash-compares engine-dependently). */
  private def retentionQ(s: SparkSession, d: String): DataFrame =
    Cohorts.retention(events(s, d), col("user_id"), col("ts"))
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))

  /** Label cohesion (q71): per-label mean embedding + average member
    * cosine ([[Knn.labelCohesion]] — fixed-width vector-sum aggregate,
    * |labels|-row broadcast; the contrastive-class QA metric). */
  private def labelCohesionQ(s: SparkSession, d: String): DataFrame =
    Knn.labelCohesion(embeddings(s, d), "label", "embedding")
      .select(col("label").cast("long").as("label"), col("n_vecs"),
        col("cohesion"))

  /** Hard negatives (q72): top-5 most-similar CROSS-label vectors per
    * query under the q27 IVF serving shape ([[Knn.hardNegatives]] —
    * fixed vec_id<16 centroids, 4 probes, label filter inside the
    * candidate join). */
  private def hardNegativesQ(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    Knn.hardNegatives(emb, emb.filter(col("vec_id") < 10),
        emb.filter(col("vec_id") < 16), "vec_id", "embedding", "label",
        k = 5, nProbe = 4)
      .select(col("query_id"), col("neighbor_id"),
        col("neg_label").cast("long").as("neg_label"), col("rank"),
        col("cosine"))
  }

  /** Corpus health report (q70): the per-source ops dashboard every
    * corpus pipeline runs before a training cut — volume, null rate,
    * exact-dup rate (distinct text digests vs non-null docs), token
    * length (mean + exact p90, the [[Sketch.quantilesApprox]] scale twin
    * applies at 100 TB), and language spread. One grouped aggregate;
    * digests are 64-byte sha2, never text, in the distinct count. */
  private def corpusReport(s: SparkSession, d: String): DataFrame = {
    val toksz = size(Text.tokens(col("text"))).cast("double")
    val nonNull = (col("n_docs") - col("n_null_text")).cast("double")
    documents(s, d).groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("text").isNull.cast("long")).as("n_null_text"),
        countDistinct(sha2(col("text"), 256)).as("n_distinct_texts"),
        round(avg(toksz), 4).as("avg_tokens"),
        round(percentile(toksz, lit(0.9)), 4).as("p90_tokens"),
        countDistinct(col("lang")).as("n_langs"))
      .select(col("source"), col("n_docs"), col("n_null_text"),
        col("n_distinct_texts"),
        round(lit(1.0) - col("n_distinct_texts").cast("double") /
          when(nonNull === 0.0, lit(null)).otherwise(nonNull), 6).as("dup_frac"),
        col("avg_tokens"), col("p90_tokens"), col("n_langs"))
  }

  /** Rare-n-gram memorization risk (q68): fraction of each doc's
    * distinct 5-grams that occur nowhere else in the corpus
    * ([[Dedup.rareNgramStatsSha]] — the oracle-parity SHA twin; the
    * xxhash64 primary is DedupSpec-cross-checked). */
  private def rareNgramsQ(s: SparkSession, d: String): DataFrame =
    Dedup.rareNgramStatsSha(documents(s, d), "doc_id", "text",
      shingleN = 5, riskFrac = 0.5)

  /** Embedding outliers (q69): cosine of every vector to its own nearest
    * centroid under q47's trained k-means ([[Knn.centroidOutliers]] —
    * scan-side assignment, k-row broadcast join, corpus never shuffled). */
  private def centroidOutliersQ(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val cents = Knn.kmeansCentroidsSha(emb, "vec_id", "embedding", k = 8, iters = 2)
    Knn.centroidOutliers(emb, cents, "vec_id", "embedding", threshold = 0.2)
  }

  /** DSIR importance weights (q67): how much more likely each doc's
    * hashed bigram features are under the English slice than under the
    * raw corpus ([[Curate.dsirWeights]] — 256 SHA-lane buckets, both
    * distributions one aggregate pass, broadcast by construction). */
  private def dsirWeightsQ(s: SparkSession, d: String): DataFrame =
    Curate.dsirWeights(documents(s, d), "doc_id", "text",
      isTarget = col("lang") === "en", n = 2, buckets = 256, alpha = 0.5)

  /** LM surprisal (q66): add-α unigram model trained on the corpus
    * itself, vocab capped at the top 20 tokens so the OOV bucket is
    * genuinely exercised ([[LangModel.surprisal]] — O(vocab) broadcast,
    * per-doc partials collapse map-side). */
  private def lmSurprisal(s: SparkSession, d: String): DataFrame =
    LangModel.surprisal(documents(s, d), "doc_id", "text",
      vocabSize = 20, alpha = 0.5)

  /** Semantic dedup (q65): SemDeDup over the embedding corpus — q47's
    * oracle-parity k-means supplies the clusters, then every vector with
    * a smaller-id cluster-mate at cosine ≥ 0.3 is dropped
    * ([[Dedup.semanticDedup]] — assignment is the scan-side IVF kernel,
    * the only shuffle is the cid equi-join, candidates form within
    * clusters only: O(Σ|cluster|²), never O(n²)). */
  private def semanticDedupQ(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val cents = Knn.kmeansCentroidsSha(emb, "vec_id", "embedding", k = 8, iters = 2)
    Dedup.semanticDedup(emb, cents, "vec_id", "embedding", threshold = 0.3)
  }

  private def bm25(s: SparkSession, d: String): DataFrame =
    Bm25.score(documents(s, d), "doc_id", "text", Seq("spark", "join", "fast"))

  private def sessionize(s: SparkSession, d: String): DataFrame =
    Sessionize(events(s, d), col("user_id"), col("ts"), col("event_id"),
      gapSeconds = 1800)

  /** Oracle-parity sign-LSH kNN: SHA-256-derived hyperplanes the DuckDB
    * oracle rebuilds from a range()-CTE (see [[graft.functions.expressions.LshSigSha]]). */
  private def lshKnn(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    Knn.lshTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
      k = 5, bits = 8, tables = 2, sig = Knn.lshSignatureSha)
  }

  /** Deterministic 64-dim query vector shared with the q26 oracle SQL. */
  private val hybridQueryVec: Seq[Double] =
    (0 until 64).map(i => ((i * 37 % 19) - 9) / 7.0)

  /** ANN-backed hybrid search: BM25 top-N + IVF-probed vector top-N,
    * ranks assigned only within the fused candidate pool — no corpus-wide
    * windows, no brute vector scan (centroids = the q27 deterministic
    * subset, nProbe 4 of 16 lists). */
  private def hybridSearch(s: SparkSession, d: String): DataFrame = {
    val corpus = documents(s, d)
      .join(embeddings(s, d), col("doc_id") === col("vec_id"))
    val cent = embeddings(s, d).filter(col("vec_id") < 16)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    HybridSearch.similarCases(corpus, "doc_id", "text", "embedding",
        queryText = "spark join fast", queryVec = hybridQueryVec, k = 20,
        candidates = 100, centroids = Some(cent), nProbe = 4)
      .select(col("doc"), col("bm25"), col("r_lex"),
        round(col("cos"), 6).as("cos"), col("r_vec"),
        round(col("rrf"), 6).as("rrf"))
  }

  private def ivfKnn(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    Knn.ivfTopK(emb, emb.filter(col("vec_id") < 10),
      emb.filter(col("vec_id") < 16), "vec_id", "embedding", k = 5, nProbe = 4)
  }

  /** K-means centroid training as a declared query — the IVF index BUILD
    * step (q27 consumes centroids; this trains them): 8 centroids, 2
    * Lloyd iterations, SHA-lane init for oracle parity
    * ([[Knn.kmeansCentroidsSha]]). Output exploded to (cid, pos, c)
    * scalars; centroid values rounded to 4dp — assignment compares
    * bit-identical cosines on both engines, only the final per-position
    * mean differs by fp accumulation order. */
  private def kmeansTrain(s: SparkSession, d: String): DataFrame =
    Knn.kmeansCentroidsSha(embeddings(s, d), "vec_id", "embedding", k = 8, iters = 2)
      .select(col("vec_id").cast("long").as("cid"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "c")))
      .select(col("cid"), col("pos").cast("long").as("pos"),
        round(col("c"), 4).as("c"))

  /** Multimodal asset table derived from `documents`: text bytes stand in
    * for the opaque media payload (no media libs in this container); the
    * modality/meta plumbing is the real schema from [[Multimodal]]. */
  private def mmAssets(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("modality"),
      col("text").cast("binary").as("payload"),
      struct(
        // deterministic image geometry; a doc_id stripe keeps NULL dims
        // so the resize planner's eligibility filter is exercised
        when(col("doc_id") % 11 === 0, lit(null).cast("int"))
          .otherwise((lit(320) + col("doc_id") % 7 * 160).cast("int")).as("width"),
        when(col("doc_id") % 11 === 0, lit(null).cast("int"))
          .otherwise((lit(240) + col("doc_id") % 5 * 144).cast("int")).as("height"),
        (col("n_chars") * 100).cast("long").as("duration_ms")).as("meta"))

  /** Oracle-parity codec (SHA-256 lane features) through the real
    * mapPartitions featurize plumbing — the whole path hash-checks. */
  private def multimodalFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.featurize(mmAssets(s, d), new Multimodal.ShaCodec(16))
      .toDF()
      .select(col("asset_id"), col("modality"), col("n_bytes"),
        round(Vec.norm(col("feature")), 4).as("feat_norm"))

  private def enrichDocs(s: SparkSession, d: String): DataFrame =
    HeuristicEnricher(documents(s, d).select(col("doc_id"), col("text")), "text")
      .select(col("doc_id"), col("topic"),
        col("severity").cast("long").as("severity"), col("summary"))

  private def frameOffsets(s: SparkSession, d: String): DataFrame =
    Multimodal.frameSampleOffsets(mmAssets(s, d), n = 4)

  /** The dbt-test surface as a declared query (reference
    * models/stg/schema.yml + models/marts/schema.yml, README.md:110):
    * one row per contract check with its failing-row count —
    * [[graft.checks.Checks]]' compiled-SELECT-of-failures contract,
    * summarized. The lang accepted-values list deliberately omits one
    * real value so a NON-zero count is exercised, not just green zeros. */
  private def qualityChecks(s: SparkSession, d: String): DataFrame = {
    import graft.checks.Checks
    val li = lineitem(s, d); val ord = orders(s, d)
    val suite: Seq[(String, DataFrame)] = Seq(
      "orders_orderkey_unique" ->
        Checks.unique(ord, "o_orderkey"),
      "orders_custkey_not_null" ->
        Checks.notNull(ord, "o_custkey"),
      "orders_custkey_fk_customer" ->
        Checks.relationships(ord, "o_custkey", customer(s, d), "c_custkey"),
      "lineitem_returnflag_accepted" ->
        Checks.acceptedValues(li, "l_returnflag", Seq("A", "N", "R")),
      "lineitem_orderkey_fk_orders" ->
        Checks.relationships(li, "l_orderkey", ord, "o_orderkey"),
      "documents_lang_accepted" ->
        Checks.acceptedValues(documents(s, d), "lang", Seq("en", "es", "de", "fr")),
      "documents_text_not_null_when_en" ->
        Checks.notNull(documents(s, d), "text", col("lang") === "en"))
    suite.map { case (name, fails) =>
      fails.agg(count(lit(1)).cast("long").as("violations"))
        .select(lit(name).as("check_name"), col("violations"))
    }.reduce(_ unionByName _)
  }

  /** Resize planning as a declared query ([[Multimodal.resizePlan]]):
    * aspect-preserving target geometry for image assets, longest side
    * capped at 512, never upscaled — pure pre-decode column math, so
    * full-size pixels never materialize. Int outputs cast to LONG for
    * the dtype-strict oracle compare. */
  private def resizePlanQuery(s: SparkSession, d: String): DataFrame =
    Multimodal.resizePlan(mmAssets(s, d), maxSide = 512)
      .select(col("asset_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("target_width").cast("long").as("target_width"),
        col("target_height").cast("long").as("target_height"))

  /** TPC-H Q14 shape: promo revenue share over a month (conditional
    * aggregation over a broadcast part join). */
  private def promoRevenue(s: SparkSession, d: String): DataFrame = {
    // both sums exact decimal (moneySum discipline), cast to double
    // BEFORE the ratio so the one product/division runs on identical
    // IEEE operands in both engines
    val rev = col("l_extendedprice").cast(MoneyDec) *
      (lit(1.0) - col("l_discount")).cast(MoneyDec)
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-03-01").cast("timestamp"))
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(round(
        lit(100.0) *
          sum(when(col("p_type").like("PROMO%"), rev)).cast("double") /
          sum(rev).cast("double"), 4).as("promo_pct"))
  }

  /** Near-dup canonicalization: connected components over the n-gram
    * Jaccard pair graph (min-reachable-id labels). */
  private def dedupComponents(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(
      documents(s, d).filter(col("doc_id") < 1000), "doc_id", "text",
      n = 2, threshold = 0.2)
    Dedup.connectedComponents(pairs, "doc_a", "doc_b")
  }

  /** q118: the DISTRIBUTED min-label-propagation path of
    * [[Dedup.connectedComponents]], force-selected by a zero driver
    * budget. The 64 MiB edge budget means every sf-scale run takes the
    * driver union-find, so the 100 TB path (O(diameter) label-exchange
    * rounds over the edge table — the shape that still works when the
    * pair graph itself no longer fits one machine) was written but never
    * driver-gated. Same pairs, same oracle as q34: both paths must
    * produce the identical labeling. */
  private def dedupComponentsDist(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(
      documents(s, d).filter(col("doc_id") < 1000), "doc_id", "text",
      n = 2, threshold = 0.2)
    Dedup.connectedComponents(pairs, "doc_a", "doc_b", driverBudgetBytes = 0L)
  }

  /** Z-order (Morton) clustering values over (user_id, second-resolution
    * event time) — the key [[graft.functions.ZOrder.cluster]] lays files
    * out by so parquet min/max stats prune on EITHER dimension. Declared
    * so the interleaving bit math itself is oracled; the layout effect
    * (per-file range narrowing) is ZOrderSpec's file-statistics test. */
  private def zorderValues(s: SparkSession, d: String): DataFrame =
    events(s, d).select(col("event_id"),
      graft.functions.ZOrder.zvalue(col("user_id"),
        unix_timestamp(col("ts"))).as("zvalue"))

  /** Corpus profiling: exact token-count quantiles per language tag
    * (the DuckDB-oracled form; [[Sketch.quantilesApprox]] is the
    * bounded-buffer scale path, cross-checked in SketchSpec — approx
    * summaries are not bit-stable across engines, so the exact twin is
    * the one declared here). */
  private def corpusQuantiles(s: SparkSession, d: String): DataFrame =
    Sketch.quantilesExact(documents(s, d), Seq("lang"),
      expr("double(size(split(text, ' ')))"),
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99), countName = "n_docs")

  /** As-of join: latest checkpoint event at-or-before each event, per user
    * (merge-sorted window composition — no range-join blowup). */
  private def asofCheckpoints(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(
      col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("ts_sec"))
    val checkpoints = ev.filter(col("event_id") % 10 === 0)
      .groupBy(col("user_id"), col("ts_sec"))
      .agg(max(col("event_id")).as("checkpoint_id"))
    AsOf.join(ev, checkpoints, Seq("user_id"), "ts_sec")
  }

  /** Bucketized range join: events paired with the 1-hour windows opened
    * by checkpoint events of the same user. */
  private def rangeJoinWindows(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(
      col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("ts_sec"))
    val iv = ev.filter(col("event_id") % 20 === 0)
      .select(col("user_id"), col("event_id").as("iv_id"),
        col("ts_sec").as("s"), (col("ts_sec") + 3600L).as("e"))
    RangeJoin.pointInInterval(ev, iv, Seq("user_id"), "ts_sec", "s", "e",
        binWidth = 3600L)
      .select(col("user_id"), col("event_id"), col("iv_id"))
  }

  /** KMV distinct-token sketch per language, as a mergeable
    * TypedImperativeAggregate over oracle-parity SHA-256 lanes (the
    * window-rank form is the executable spec in SketchSpec and the shape
    * the DuckDB oracle mirrors). */
  private def kmvDistinctTokens(s: SparkSession, d: String): DataFrame =
    Sketch.kmvDistinctSketch(
      documents(s, d).select(col("lang"),
        explode(Text.tokens(col("text"))).as("token")),
      Seq("lang"), Sketch.shaLane(col("token")), k = 256)

  /** Count-Min Sketch token-frequency counters (d=4 rows × w=64 buckets)
    * over the documents corpus, via the native mergeable
    * [[graft.functions.expressions.CmsSketch]] aggregate — per-partition
    * state is ONE d×w matrix, merged by elementwise add. CMS is a linear
    * sketch, so the counters are order/partition-independent and the SHA
    * family hash-matches the DuckDB groupBy reconstruction exactly. */
  private def cmsTokenCounts(s: SparkSession, d: String): DataFrame =
    Sketch.cmsCounters(
      documents(s, d).select(explode(Text.tokens(col("text"))).as("tok")),
      col("tok"), d = 4, w = 64, sha = true)

  /** Symmetric int8 embedding quantization (q54): per-vector max-abs
    * scale + HALF_UP rounded codes ([[Vec.quantQ8]]) — 4× smaller vector
    * storage/shuffle, and cosine over the CODES equals cosine over the
    * dequantized vectors exactly (scales cancel; VecSpec pins it).
    * Exploded to scalars for the oracle hash. */
  private def quantizeEmbeddings(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      // NULL vectors: drop explicitly (posexplode would silently emit no
      // rows while the oracle's CROSS JOIN would keep 64 — pin matching
      // semantics, the q60 pattern)
      .filter(col("embedding").isNotNull)
      // scale projected FIRST so the quantize lambda references an
      // attribute — inlining q8Scale into the lambda re-runs its O(dim)
      // scan per element (lambdas don't hoist invariant subtrees)
      .select(col("vec_id"), col("embedding"),
        Vec.q8Scale(col("embedding")).as("sc"))
      .select(col("vec_id"), round(col("sc"), 6).as("q8_scale"),
        posexplode(Vec.quantQ8(col("embedding"), col("sc"))).as(Seq("pos", "q")))
      .select(col("vec_id"), col("q8_scale"), col("pos").cast("long").as("pos"),
        col("q").cast("long").as("q"))

  /** Gopher-style rule-based quality filter over the documents corpus. */
  private def qualityFilter(s: SparkSession, d: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    val (rLen, rTok, rStop, rDist, keep) =
      Text.qualityRules(toks, minTokens = 30, maxTokens = 100000,
        minAvgTokenLen = 3.0, maxAvgTokenLen = 10.0,
        minStopRatio = 0.05, minDistinctRatio = 0.3)
    documents(s, d).select(col("doc_id"),
      rLen.as("rule_len"), rTok.as("rule_token_len"),
      rStop.as("rule_stopwords"), rDist.as("rule_distinct"), keep.as("keep"))
  }

  /** Sequence packing: assign docs (doc_id order) to 4096-token chunks —
    * the sharded two-phase prefix sum (bit-equal to the global form, which
    * SURVEY-wise stays as the executable spec; no global window here). */
  private def sequencePacking(s: SparkSession, d: String): DataFrame =
    Pack.sharded(documents(s, d).select(col("doc_id"), col("text")),
        col("doc_id"), size(Text.tokens(col("text"))), budget = 4096, nShards = 32)
      .select(col("doc_id"), col("n_tokens"), col("chunk_id"))

  /** End-to-end training-corpus build — the LLM-pipeline tier's flagship
    * COMPOSITION, declared as one query so the operators are verified
    * working together, not just alone: Gopher quality rules
    * ([[graft.functions.Text.qualityRules]], q36) → exact-dedup keep set
    * ([[Dedup.exact]], q14 — dedup runs on the quality-surviving corpus)
    * → per-source quota ([[Curate.perGroupQuota]], q43, ≤25/source) →
    * sharded sequence packing ([[Pack.sharded]], q35, 2048-token budget).
    * One row per doc in the final corpus: (doc_id, source, rk, n_tokens,
    * chunk_id). */
  private def corpusBuild(s: SparkSession, d: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    val (_, _, _, _, keep) = Text.qualityRules(toks, minTokens = 30,
      maxTokens = 100000, minAvgTokenLen = 3.0, maxAvgTokenLen = 10.0,
      minStopRatio = 0.05, minDistinctRatio = 0.3)
    // Materialize the quality-surviving corpus ONCE before dedup: the
    // exact-dedup keep set and the semi-join back against it otherwise
    // both re-run the tokenizing quality filter over the full corpus —
    // the stage profile showed the quality scan evaluated 3x inside one
    // q53 plan (r6 judged 3.68 s; with this boundary ~1.1 s warm). On a
    // cluster this boundary is where a real pipeline writes its staging
    // table; locally, GC-managed checkpoint blocks play that role.
    val quality = documents(s, d).filter(keep)
      .select(col("doc_id"), col("source"), col("text")).localCheckpoint()
    val keepIds = Dedup.exact(quality, "doc_id", "text").select(col("doc_id"))
    val deduped = quality.join(keepIds, Seq("doc_id"), "left_semi")
    val quota = Curate.perGroupQuota(
      deduped.select(col("source"), col("doc_id"), col("text")),
      col("source"), col("doc_id"), n = 25)
    // Pack.sharded runs two tiny plan-construction jobs (key validation,
    // shard totals) before the real one — localCheckpoint materializes
    // the filter→dedup→quota upstream ONCE (GC-managed blocks, truncated
    // lineage) instead of recomputing it for each of the three passes
    val curated = quota
      .select(col("doc_id"), col("source"), col("rk"),
        size(Text.tokens(col("text"))).as("n_tok"))
      .localCheckpoint()
    Pack.sharded(curated, col("doc_id"), col("n_tok"), budget = 2048,
        nShards = 32)
      .select(col("doc_id"), col("source"), col("rk"), col("n_tokens"),
        col("chunk_id"))
  }

  /** Skew-salted two-phase aggregation — must equal the plain GROUP BY. */
  private def saltedAgg(s: SparkSession, d: String): DataFrame =
    Salt.aggregate(lineitem(s, d), Seq("l_returnflag"), col("l_orderkey"),
        buckets = 8,
        partials = Seq(count(lit(1)).as("pn"), sum(col("l_quantity")).as("pq"),
          max(col("l_extendedprice")).as("pm")),
        combines = Seq(sum(col("pn")).as("n"), round(sum(col("pq")), 2).as("sum_qty"),
          max(col("pm")).as("max_price")))

  /** Skew-salted equi-join — must equal the plain broadcast join result. */
  private def saltedJoin(s: SparkSession, d: String): DataFrame =
    Salt.join(
        orders(s, d).withColumnRenamed("o_custkey", "custkey"),
        customer(s, d).withColumnRenamed("c_custkey", "custkey"),
        Seq("custkey"), saltBy = col("o_orderkey"), buckets = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("revenue"))

  /** Deterministic stratified corpus sample: 50% of English docs, 20% of
    * the rest, by SHA-lane of the doc id — reproducible, shuffle-free. */
  private def stratifiedSample(s: SparkSession, d: String): DataFrame =
    Curate.hashSample(documents(s, d),
        concat(lit("sample|"), col("doc_id").cast("string")),
        when(col("lang") === "en", 0.5).otherwise(0.2))
      .select(col("doc_id"), col("lang"))

  /** Keep-latest version resolution: each user's most recent event. */
  private def keepLatestEvent(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("ts_sec"))
    Curate.keepLatest(ev, Seq("user_id"),
      Seq(col("ts_sec").desc, col("event_id").desc))
  }

  /** Per-source quota: no source contributes more than 10 docs. */
  private def sourceQuota(s: SparkSession, d: String): DataFrame =
    Curate.perGroupQuota(documents(s, d).select(col("source"), col("doc_id")),
      col("source"), col("doc_id"), n = 10)

  /** PII scrub with injected emails/numbers (the corpus has none —
    * same injection pattern as q13's malformed dates). */
  private def piiScrub(s: SparkSession, d: String): DataFrame = {
    val t = when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact 123456789 or bob.smith@example.com now")))
      .otherwise(col("text"))
    documents(s, d).select(col("doc_id"), Text.scrubPii(t).as("scrubbed"))
  }

  /** TF-IDF keyword extraction: top-3 terms per document. */
  private def tfidfTopTerms(s: SparkSession, d: String): DataFrame =
    Bm25.tfidfTopTerms(documents(s, d), "doc_id", "text", k = 3)

  /** Eval-set decontamination (q55): train docs (doc_id % 17 != 0)
    * flagged when ≥ 2 of their distinct 3-gram shingles occur anywhere in
    * the held-out eval slice (doc_id % 17 == 0) — broadcast eval shingle
    * universe, one shuffle ([[Dedup.decontaminate]]). */
  private def decontaminateTrain(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    Dedup.decontaminate(
      docs.filter(col("doc_id") % 17 =!= 0),
      docs.filter(col("doc_id") % 17 === 0),
      "doc_id", "text", shingleN = 3, minHits = 2)
  }

  /** Bloom-filter exact-dedup admission (q56): a synthetic ingest batch —
    * re-idded copies of corpus docs (must be rejected) plus suffixed
    * novel texts (must be admitted) — tested against the corpus
    * (doc_id % 7 != 0) via [[Bloom.admitExact]]: scan-side bloom probe
    * admits novel rows without a join, probe hits verify against SHA-256
    * digests, output exact. */
  private def bloomAdmit(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val batch = docs.filter(col("doc_id") % 7 === 3)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" batch-novel")).as("text")))
    Bloom.admitExact(corpus, batch, "doc_id", "text",
      expectedItems = 1L << 16)
  }

  /** Deterministic 80/10/10 train/val/test split (q57): pure scan-side
    * SHA-lane bucketing ([[Curate.hashSplit]]) — a doc's split never
    * changes as the corpus grows. */
  private def trainSplit(s: SparkSession, d: String): DataFrame =
    Curate.hashSplit(documents(s, d),
        concat(lit("split|"), col("doc_id").cast("string")),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("doc_id"), col("source"), col("split"))

  /** Token-window document chunking (q58): 64-token windows, stride 48
    * (16 tokens of left-context overlap), scan-side generate
    * ([[Pack.chunk]] — zero shuffle). */
  private def docChunks(s: SparkSession, d: String): DataFrame =
    Pack.chunk(documents(s, d), "doc_id", "text", chunkSize = 64, stride = 48)

  /** Cross-document passage dedup (q59): every '. '-separated passage
    * keeps only its first (doc, pos) occurrence corpus-wide; docs rebuilt
    * from survivors ([[Dedup.passageDedup]] — two shuffles, no joins). A
    * doc whose every passage occurred earlier vanishes (fully deduped). */
  private def passageDedupQ(s: SparkSession, d: String): DataFrame =
    Dedup.passageDedup(documents(s, d), "doc_id", "text")

  /** Product-quantization encoding (q60): 64-dim embeddings → 8 sub-codes
    * against the SHA-derived oracle-parity codebook (8 subspaces × 16
    * centroids × 8 dims) — scan-side argmins over codebook literals, zero
    * shuffle ([[Pq.encode]]; [[Pq.trainCodebook]] is the production
    * codebook, PqSpec-pinned to reconstruct strictly better). */
  private def pqCodes(s: SparkSession, d: String): DataFrame =
    Pq.encode(embeddings(s, d), "vec_id", "embedding",
      Pq.shaCodebook(m = 8, k = 16, subDim = 8))

  /** The round-5 flagship composition (q62): the FULL modern
    * training-corpus pipeline as one oracled query — Gopher quality rules
    * (q36) → repetition filter (q61) → eval-set decontamination against
    * the held-out doc_id % 17 == 0 slice (q55) → exact-dedup keep set
    * (q14) → per-source quota ≤ 20 (q43) → deterministic 80/10/10 split
    * (q57) → sharded 2048-token packing (q35). One row per surviving doc:
    * (doc_id, source, split, n_tokens, chunk_id). q53 remains the
    * narrower round-4 composition.
    *
    * Decontamination width SCALES with the corpus: w = 3 +
    * max(0, ⌊log10(nDocs/500)⌋) — 3-shingles at sf0.01, 4 at sf0.1, 5 at
    * sf1. The fixture vocabulary is CLOSED (~31 tokens), so a fixed
    * trigram screen saturates as the eval slice grows (at sf0.1 the eval
    * set covers ~40% of the 31³ trigram space and every train doc
    * crosses minHits — the r14 verdict's trivially-passing-gate finding:
    * 0 survivors means the gate can't catch a final-assembly regression
    * at the scales that matter). Widening the shingle keeps eval
    * coverage of the shingle space sub-percent at every scale — the same
    * design force that pushes production decontamination to 10-13-grams
    * (the shingle space must dwarf the corpus's shingle instances or the
    * screen degenerates to "drop everything"). Measured with this
    * schedule: contaminated/clean = 318/152 (sf0.01, unchanged),
    * 1192/3513 (sf0.1), 28k/19k (sf1) — both gate directions nonzero at
    * all three scale factors. The count() feeding the width is a
    * metadata-only scan (parquet row-group counts), the Pack.sharded
    * plan-construction-job pattern. */
  private def corpusBuild2(s: SparkSession, d: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    val (_, _, _, _, keep) = Text.qualityRules(toks, minTokens = 30,
      maxTokens = 100000, minAvgTokenLen = 3.0, maxAvgTokenLen = 10.0,
      minStopRatio = 0.05, minDistinctRatio = 0.3)
    val notRep = !(Text.dupNgramFrac(toks, 2) > 0.2 ||
      Text.dupNgramFrac(toks, 3) > 0.15 || Text.topTokenRatio(toks) > 0.2)
    val docs = documents(s, d)
    // the quality + repetition predicates are the pipeline's priciest
    // per-row math (topTokenRatio is O(distinct×len)) and `train` feeds
    // three consumers (decontamination shingles, the semi-join, dedup) —
    // materialize the filtered corpus ONCE (GC-managed blocks, truncated
    // lineage), the stage boundary a 100 TB run would persist to storage
    val train = docs.filter(col("doc_id") % 17 =!= 0)
      .filter(keep && notRep).localCheckpoint()
    val eval = docs.filter(col("doc_id") % 17 === 0)
    val nDocs = docs.count()
    val shingleW = 3 + math.max(0,
      math.floor(math.log10(math.max(nDocs, 1L) / 500.0)).toInt)
    val cleanIds = Dedup.decontaminate(train, eval, "doc_id", "text",
        shingleN = shingleW, minHits = 2)
      .filter(!col("contaminated")).select(col("doc").as("doc_id"))
    val clean = train.join(cleanIds, Seq("doc_id"), "left_semi")
    val keepIds = Dedup.exact(clean, "doc_id", "text").select(col("doc_id"))
    val deduped = clean.join(keepIds, Seq("doc_id"), "left_semi")
    val quota = Curate.perGroupQuota(
      deduped.select(col("source"), col("doc_id"), col("text")),
      col("source"), col("doc_id"), n = 20)
    val split = Curate.hashSplit(quota,
      concat(lit("split|"), col("doc_id").cast("string")),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // same localCheckpoint rationale as q53: Pack.sharded runs two tiny
    // plan-construction jobs before the real one
    val curated = split
      .select(col("doc_id"), col("source"), col("split"),
        size(Text.tokens(col("text"))).as("n_tok"))
      .localCheckpoint()
    Pack.sharded(curated, col("doc_id"), col("n_tok"), budget = 2048,
        nShards = 32)
      .select(col("doc_id"), col("source"), col("split"), col("n_tokens"),
        col("chunk_id"))
  }

  /** Deterministic negative sampling (q63): 4 contrastive negatives per
    * doc by SHA-lane draws modulo the id space ([[Curate.negativeSamples]]
    * — scan-side draws, id-only existence join; one tiny driver agg for
    * the id space, the Pack.sharded width-job pattern). */
  private def negSamples(s: SparkSession, d: String): DataFrame = {
    val ids = documents(s, d).select(col("doc_id"))
    // max of an empty table is NULL — any idSpace works then (the
    // existence join over zero ids is empty either way)
    val maxRow = ids.agg(max(col("doc_id"))).head()
    val idSpace = if (maxRow.isNullAt(0)) 2L else maxRow.getLong(0) + 1
    Curate.negativeSamples(ids, "doc_id", k = 4, idSpace)
  }

  /** Corpus mixing (q64): realize per-source proportions (7% even /
    * 3% odd sources of a 15k-token budget) via
    * [[Curate.mixByTokenBudget]] — one tiny totals aggregate, then a
    * scan-side lane filter; under-sized sources are taken whole. */
  private def corpusMix(s: SparkSession, d: String): DataFrame =
    // weight as a FUNCTION of the source key: the operator's own totals
    // aggregate supplies the source list, so no second distinct+collect
    // scan of the corpus runs at plan construction
    Curate.mixByTokenBudget(documents(s, d),
        concat(lit("mix|"), col("doc_id").cast("string")), col("source"),
        size(Text.tokens(col("text"))),
        (src: String) => if (src.stripPrefix("src").toInt % 2 == 0) 0.07 else 0.03,
        budgetTokens = 15000L)
      .select(col("doc_id"), col("source"))

  /** Within-document repetition metrics (q61): duplicate 2-/3-gram
    * fractions and the top single-token share — the Gopher repetition
    * rules ([[graft.functions.Text.dupNgramFrac]]/[[graft.functions.Text.topTokenRatio]]),
    * pure scan-side column math; repetitive = any signal over threshold. */
  private def repMetrics(s: SparkSession, d: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    val d2 = Text.dupNgramFrac(toks, 2)
    val d3 = Text.dupNgramFrac(toks, 3)
    val tt = Text.topTokenRatio(toks)
    documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"),
        round(d2, 6).as("dup2_frac"), round(d3, 6).as("dup3_frac"),
        round(tt, 6).as("top_token_ratio"),
        (d2 > 0.2 || d3 > 0.15 || tt > 0.2).as("repetitive"))
  }

  /** BPE merge-pair counting (q81): one tokenizer-induction count step —
    * adjacent character-pair frequencies weighted by word frequency, top
    * 30 merges ([[Tokenize.bpePairCounts]] — the corpus collapses to the
    * distinct-word table map-side; no corpus explode, no window). */
  private def bpePairsQ(s: SparkSession, d: String): DataFrame =
    Tokenize.bpePairCounts(documents(s, d), "text", topK = 30)

  /** Corpus snapshot diff (q82): CDC-style added/removed/changed
    * classification between two snapshot views of the corpus (old = ids
    * not ≡ 0 mod 7; new = ids not ≡ 0 mod 5 with ids ≡ 0 mod 11 edited)
    * — [[Diff.snapshotDiff]]: digests computed scan-side, one id-keyed
    * digest join, payloads never shuffle. */
  private def snapshotDiffQ(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
    val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
      .withColumn("text", when(col("doc_id") % 11 === 0,
        concat(col("text"), lit(" rev2"))).otherwise(col("text")))
    Diff.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
  }

  /** Edit-distance near-dup verification (q83): the two-stage pipeline —
    * banded-LSH candidates (the q20 SHA shape) verified character-exactly
    * by the threshold-bounded Levenshtein kernel
    * ([[Dedup.editDistanceVerify]]). Levenshtein work is O(candidates),
    * proportional to the near-dup rate at any corpus size — the
    * length-band self-join form ([[Dedup.editDistancePairs]]) grows
    * quadratically and stays spec-only. */
  private def editDistanceQ(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    Dedup.editDistanceVerify(docs, "doc_id", "text",
      Dedup.minhashLshPairsSha(docs, "doc_id", "text"), maxDist = 100)
  }

  /** Weighted sampling without replacement (q84): per-source top-5 by
    * exponential race keyed on token-count weight
    * ([[Curate.weightedSample]] — scan-side keys, WindowGroupLimit). */
  private def weightedSampleQ(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).filter(col("text").isNotNull)
      .select(col("source"), col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tok"))
    Curate.weightedSample(docs,
        concat(lit("ws|"), col("doc_id").cast("string")),
        col("source"), col("n_tok"), k = 5)
      .select(col("source"), col("doc_id"), col("n_tok"), col("rk"))
  }

  /** Boilerplate removal (q85): passages occurring more than 3 times
    * corpus-wide are dropped from every doc — the CCNet cleaning step
    * ([[Dedup.passageFrequencyFilter]]; q59 keeps first occurrences,
    * this keeps only rare passages). */
  private def boilerplateQ(s: SparkSession, d: String): DataFrame =
    Dedup.passageFrequencyFilter(documents(s, d), "doc_id", "text",
      maxFreq = 3)

  /** Hierarchical rollup (q86): revenue by (region, nation) with nation
    * subtotals and a grand total in ONE aggregation pass — Spark's
    * `rollup` plans a single Expand + hash aggregate instead of N
    * unioned GROUP BYs re-reading the fact table (the reference's
    * reporting-mart subtotal pattern). `grouping(..)` flags distinguish
    * a rolled-up level from a genuine NULL key. */
  private def rollupRevenueQ(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(grouping(col("r_name")).cast("long").as("g_region"),
        grouping(col("n_name")).cast("long").as("g_nation"),
        count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("revenue"))

  /** Pivot (q87): daily event counts pivoted to one column per event
    * type — Spark's `pivot` with an explicit value list compiles to a
    * single PivotFirst aggregate (one shuffle on the day key, no joins,
    * no per-type re-scan). Absent (day, type) cells coalesce to 0 so the
    * output is dense. */
  private def pivotEventsQ(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = events(s, d)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .groupBy(col("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    p.select(col("day") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
  }

  /** Set operations (q88): churn/retention via INTERSECT and EXCEPT —
    * purchasers active in 1996 vs 1997 classified as retained (both
    * years) or churned (1996 only). Both set ops plan as hash
    * aggregates over a single shuffle per side — no driver-side set
    * math. */
  private def setOpsQ(s: SparkSession, d: String): DataFrame = {
    def buyers(year: Int) = orders(s, d)
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit(s"${year + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val retained = buyers(1996).intersect(buyers(1997))
      .select(col("o_custkey"), lit("retained").as("status"))
    val churned = buyers(1996).except(buyers(1997))
      .select(col("o_custkey"), lit("churned").as("status"))
    retained.unionByName(churned)
  }

  /** Shared changelog for q89/q90: events as a per-user state log —
    * `error` is a tombstone, anything else an upsert of the user's
    * current activity state. Order key = microsecond event time with
    * event_id as the unique tiebreak (the q73 convention). */
  private def userChangelog(s: SparkSession, d: String): DataFrame =
    events(s, d).select(col("user_id"),
      col("event_type").as("state"),
      unix_micros(col("ts")).as("us"), col("event_id"),
      when(col("event_type") === "error", lit("D"))
        .otherwise(lit("U")).as("op"))

  /** CDC merge (q89): fold the user changelog into current state the
    * way a nightly lakehouse MERGE INTO does — as prior state (the
    * pre-cutoff fold) plus an incremental delta, which
    * [[Cdc.merge]]'s associativity makes equal to folding the whole
    * log in one shot (what the oracle computes). Latest change per
    * user wins; users whose last event is a tombstone drop out. */
  private def cdcMergeQ(s: SparkSession, d: String): DataFrame = {
    val log = userChangelog(s, d)
    val cut = unix_micros(lit("2024-01-16 00:00:00").cast("timestamp"))
    val keys = Seq("user_id")
    val order = Seq(col("us").desc, col("event_id").desc)
    val base = Cdc.merge(log.filter(col("us") < cut), keys, order, "op", "D")
    Cdc.merge(base.unionByName(log.filter(col("us") >= cut)),
        keys, order, "op", "D")
      .select(col("user_id"), col("state").as("last_type"),
        col("us").as("last_us"), col("event_id").as("last_event_id"))
  }

  /** Deterministic scratch dir for batch-replayed streaming state
    * (q116/q117), wiped before each invocation so a replay always starts
    * from genesis — Verify and every bench repeat rebuild identical
    * state. */
  private def replayStateDir(s: SparkSession, tag: String, d: String): String = {
    import org.apache.hadoop.fs.Path
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_replay_${tag}_${math.abs(d.hashCode.toLong)}").getAbsolutePath
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    dir
  }

  /** q116: driver-gated evidence for the streaming SCD-1 tier — the user
    * changelog, split into three time-sliced micro-batches, folds through
    * the persisted BUCKET-PARTIAL rewrite machinery
    * ([[graft.streaming.Streams.scd1MergeBatch]], the exact foreachBatch
    * body of `incrementalScd1`), and the declared result is the final
    * state table read back with tombstones filtered
    * ([[graft.streaming.Streams.readScd1State]]). The oracle is the
    * ONE-SHOT merge over the whole log (q89's SQL verbatim): replayed
    * incremental fold == one-shot fold is precisely the streaming
    * operator's correctness statement (Cdc.merge associativity +
    * version/tombstone bookkeeping). Scale: each batch shuffles only its
    * delta plus the touched state buckets — never the full state. */
  private def scd1ReplayQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Streams
    val dir = replayStateDir(s, "q116", d)
    val log = userChangelog(s, d)
    val cuts = Seq("2024-01-11 00:00:00", "2024-01-21 00:00:00")
      .map(c => unix_micros(lit(c).cast("timestamp")))
    Seq(
      log.filter(col("us") < cuts(0)),
      log.filter(col("us") >= cuts(0) && col("us") < cuts(1)),
      log.filter(col("us") >= cuts(1))
    ).zipWithIndex.foreach { case (b, i) =>
      Streams.scd1MergeBatch(b, i.toLong, Seq("user_id"),
        Seq("us", "event_id"), dir, nBuckets = 16)
    }
    Streams.readScd1State(s, dir, "op", "D")
      .select(col("user_id"), col("state").as("last_type"),
        col("us").as("last_us"), col("event_id").as("last_event_id"))
  }

  /** q117: driver-gated evidence for the streaming distinct-count tier —
    * events split into three hash micro-batches each persist their HLL
    * register delta ([[graft.streaming.Streams.distinctRegistersBatch]],
    * the exact foreachBatch body of `incrementalDistinct`; compaction
    * folds the committed dirs mid-replay), and the declared result is the
    * live merge-at-read estimate ([[graft.streaming.Streams.readDistinct]]).
    * The oracle rebuilds the registers relationally from ALL events in one
    * shot (q104's machinery, keyless): incremental per-batch register MAX
    * == one-pass registers — exact, not approximate, equality, because HLL
    * registers are a lattice (max-merge, idempotent). */
  private def distinctReplayQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Streams
    val dir = replayStateDir(s, "q117", d)
    val ev = events(s, d).select(col("event_id"), col("user_id"))
    (0 until 3).foreach { i =>
      Streams.distinctRegistersBatch(
        ev.filter(pmod(col("event_id"), lit(3)) === i),
        i.toLong, Sketch.shaLane(col("user_id")), dir,
        p = 6, compactEvery = 2)
    }
    Streams.readDistinct(s, dir, p = 6)
  }

  /** q120: one-pass column profiling ([[Profile.profile]]) — the ANALYZE
    * TABLE / data-quality tier over events: per column n / n_null /
    * n_distinct / native-typed min/max from ONE aggregate pass (exact
    * multi-distinct = Spark's Expand rewrite, the oracle-able form;
    * `profileApprox` is the no-Expand HLL scale path, ProfileSpec
    * cross-checks them). `k_value`'s nulls are genuine: the malformed
    * JSON lanes q12 exercises. */
  private def profileQ(s: SparkSession, d: String): DataFrame =
    Profile.profile(
      events(s, d).select(
        col("user_id"), col("event_type"),
        expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("k_value")),
      Seq("user_id", "event_type", "k_value"))

  /** q121: equi-width histogram ([[Profile.histogram]]) of order value in
    * exact cents — the distribution half of profiling. Binning is integer
    * arithmetic (`(v-min)*k DIV (range+1)`) so both engines bin
    * identically; empty bins are absent by construction. One tiny bounds
    * aggregate broadcast back + ONE grouped pass over the scan. */
  private def histogramQ(s: SparkSession, d: String): DataFrame =
    Profile.histogram(
      orders(s, d).select(
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents")),
      col("cents"), buckets = 20)

  /** q122: event-sequence transition matrix — the Markov-chain companion
    * to the funnel (q73) and retention (q74) analytics: for each user's
    * time-ordered event stream, count (state → next state) transitions
    * and their per-source-state probabilities. ONE user-keyed window
    * shuffle derives the successor, then a tiny (|states|²-bounded)
    * aggregate; probabilities are exact integer ratios rounded at the
    * end, so the doubles hash-match any engine. */
  private def transitionsQ(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val pairs = events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .select(col("event_type").as("from_state"),
        lead(col("event_type"), 1).over(w).as("to_state"))
      .filter(col("to_state").isNotNull)
    val counts = pairs.groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy(col("from_state"))
    counts.select(col("from_state"), col("to_state"), col("n"),
      round(col("n") / sum(col("n")).over(wf), 6).as("prob"))
  }

  /** q123: driver-gated evidence for the streaming heavy-hitters tier —
    * the fourth incremental-sketch member (q117 = cardinality, q119 =
    * frequency, this = frequent items). Three document micro-batches each
    * persist their Misra–Gries summary
    * ([[graft.streaming.Streams.heavyHittersBatch]], the exact
    * foreachBatch body of `incrementalHeavyHitters`; compaction pre-sums
    * committed dirs mid-replay), the live merged summary comes from
    * [[graft.streaming.Streams.readHeavyHitters]] (union-sum + one
    * (k+1)-th-weight subtraction — the m-way MG merge). MG summaries are
    * merge-order-dependent, so the SUMMARY is not oracle-able — but its
    * guarantee is: every item with true count > N/(k+1) over the whole
    * stream survives the merge. So the declared result re-counts the
    * merged candidates exactly (q97's broadcast-recount shape) and keeps
    * the integer-decided true heavy hitters — a deterministic output
    * that q97's exact oracle binds verbatim. */
  private def heavyHittersReplayQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Streams
    val dir = replayStateDir(s, "q123", d)
    val toks = documents(s, d).select(col("doc_id"),
      explode(Text.tokens(col("text"))).as("tok"))
    (0 until 3).foreach { i =>
      Streams.heavyHittersBatch(
        toks.filter(pmod(col("doc_id"), lit(3)) === i).select(col("tok")),
        i.toLong, col("tok"), dir, k = 60, compactEvery = 2)
    }
    val cands = Streams.readHeavyHitters(s, dir, k = 60)
      .select(col("item").as("tok"))
    val all = toks.select(col("tok"))
    // ONE corpus pass for recount AND n_total (r16): the old shape ran
    // `all` twice in the final action — an inner join for the candidate
    // recount plus a separate global count for the threshold's N — i.e.
    // two full tokenize passes. A LEFT join keeps every token row, the
    // aggregate groups non-candidates under one NULL lane, and N is the
    // sum over the (≤ candidates+1)-row result; localCheckpoint makes
    // the tiny table feed both the output filter and the N fold without
    // re-running the pass. Candidates are distinct by construction
    // (readHeavyHitters groups by item), so the join multiplies nothing.
    val counted = all
      .join(broadcast(cands.withColumn("__c", lit(1))), Seq("tok"), "left")
      .groupBy(when(col("__c") === 1, col("tok")).as("tok"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    counted.filter(col("tok").isNotNull)
      .crossJoin(broadcast(counted.agg(sum(col("cnt")).as("n_total"))))
      .filter(col("cnt") * lit(61L) > col("n_total"))
      .select(col("tok"), col("cnt"))
  }

  /** q119: driver-gated evidence for the streaming CMS counter-delta
    * tier — documents split into three hash micro-batches each persist
    * their token-frequency counter delta
    * ([[graft.streaming.Streams.cmsCountersBatch]], the exact
    * foreachBatch body of `incrementalCmsCounters`; compaction pre-sums
    * committed dirs mid-replay), and the declared result is the live
    * merge-at-read sum ([[graft.streaming.Streams.readCmsCounters]]).
    * CMS is a LINEAR sketch — counters of a union are the element-wise
    * SUM of the parts' counters under any batching or partitioning — so
    * the replayed deltas are bit-equal to the one-shot sketch the oracle
    * rebuilds relationally (q52's SQL verbatim). */
  private def cmsReplayQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Streams
    val dir = replayStateDir(s, "q119", d)
    val toks = documents(s, d).select(col("doc_id"),
      explode(Text.tokens(col("text"))).as("tok"))
    (0 until 3).foreach { i =>
      Streams.cmsCountersBatch(
        toks.filter(pmod(col("doc_id"), lit(3)) === i),
        i.toLong, col("tok"), dir, d = 4, w = 64, sha = true,
        compactEvery = 2)
    }
    Streams.readCmsCounters(s, dir)
  }

  /** q126: driver-gated evidence for the streaming vector-index tier —
    * the reference's `target_lag` search-freshness analog for the vector
    * leg (reference README.md:83,117). Embeddings split into three hash
    * micro-batches replay the EXACT foreachBatch body of
    * `incrementalVectorIndex`
    * ([[graft.streaming.Streams.vectorIndexBatch]]: scan-side IVF
    * assignment + PQ encode, written under `batch_id=/cid=`; compaction
    * folds the committed batches mid-replay), and the declared result is
    * a top-10 ADC probe through the maintained index
    * ([[graft.streaming.Streams.readVectorIndex]] +
    * [[Pq.ivfPqQuery]], nProbe 4, query = vec 0's embedding). The
    * oracle rebuilds the ONE-SHOT index relationally (q27's assignment
    * SQL + q60's codebook/code SQL) and probes it identically: the
    * maintained index is exactly the one-shot index because each batch
    * writes only its own partition and assignment/encode are per-row —
    * replay == rebuild is precisely the freshness contract. Scale: per
    * batch O(delta) scan-side work, zero shuffle; probes prune to the
    * `cid=` partitions of the probed lists. */
  private def vectorIndexReplayQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Streams
    val dir = replayStateDir(s, "q126", d)
    val emb = embeddings(s, d)
    val matrix = Knn.centroidMatrix(emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cv")))
    val codebook = Pq.shaCodebook(m = 8, k = 16, subDim = 8)
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    (0 until 3).foreach { i =>
      Streams.vectorIndexBatch(
        emb.filter(pmod(col("vec_id"), lit(3)) === i),
        i.toLong, "vec_id", "embedding", matrix, codebook, dir,
        compactEvery = 2)
    }
    val probed = Pq.ivfPqQuery(Streams.readVectorIndex(s, dir), matrix,
      "vec_id", codebook, qv, k = 10, nProbe = 4)
    // rank the ≤k probe results without a window: gather into one array,
    // sort (dist asc, id asc), posexplode — the same bounded-gather idiom
    // as HybridSearch.rankCandidates, so no partition-less WindowExec
    // ever enters a declared plan
    val byDistAscIdAsc = (l: Column, r: Column) =>
      when(l.getField("s") < r.getField("s"), -1)
        .when(l.getField("s") > r.getField("s"), 1)
        .when(l.getField("id") < r.getField("id"), -1)
        .when(l.getField("id") > r.getField("id"), 1)
        .otherwise(0)
    probed
      .agg(collect_list(struct(col("adc_dist").as("s"),
        col("vec_id").as("id"))).as("cs"))
      .select(posexplode(array_sort(col("cs"), byDistAscIdAsc))
        .as(Seq("pos", "c")))
      .select(col("c.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"),
        round(col("c.s"), 6).as("adc_dist"))
  }

  /** q127: driver-gated evidence for the stateful-streaming funnel — the
    * events stream, split into three time-sliced micro-batches, replays
    * the EXACT per-group automaton body of
    * [[graft.streaming.StatefulFunnel]]'s flatMapGroupsWithState
    * ([[graft.streaming.StatefulFunnel.transition]]: sort by (event-time
    * millis, event_id), greedy earliest-match, O(1) carried state); only
    * the state-store plumbing differs (a cogrouped state Dataset per
    * batch instead of GroupState). Declared result = every stage-reach
    * emission across the replay. The oracle computes the same greedy
    * sequential match relationally (first 'view', first 'click' strictly
    * after it, first 'purchase' after that, all under the stream's own
    * (ms, event_id) order) — valid as a one-shot rebuild because the
    * time-sliced batches preserve global event order, the in-order case
    * StreamsSpec pins against the batch operator. Scale: one user-keyed
    * cogroup shuffle per batch over (delta + state), state O(1) per
    * user. */
  private def funnelReplayQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.StatefulFunnel
    import StatefulFunnel.{Event, FunnelState, StageReached}
    import s.implicits._
    val steps = Seq("view", "click", "purchase")
    val ev = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Event]
    val cuts = Seq("2024-01-11 00:00:00", "2024-01-21 00:00:00")
      .map(c => lit(c).cast("timestamp"))
    val batches = Seq(
      ev.filter(col("ts") < cuts(0)),
      ev.filter(col("ts") >= cuts(0) && col("ts") < cuts(1)),
      ev.filter(col("ts") >= cuts(1)))
    var state = s.emptyDataset[(Long, FunnelState)]
    var emissions = s.emptyDataset[StageReached]
    batches.foreach { b =>
      // one pass computes both next-state and emissions; localCheckpoint
      // materializes it so the two reads don't re-run the cogroup (and
      // the per-batch lineage never stacks — same rationale as the
      // connected-components rounds)
      val stepped = b.groupByKey(_.user_id)
        .cogroup(state.groupByKey(_._1)) { (u, evIt, stIt) =>
          val (st, out, _) = StatefulFunnel.transition(u, evIt,
            stIt.toSeq.headOption.map(_._2), steps)
          Iterator((u, st, out))
        }.localCheckpoint()
      state = stepped.map { case (u, st, _) => (u, st) }
      emissions = emissions.union(stepped.flatMap(_._3))
    }
    emissions.toDF()
      .select(col("user_id"), col("stage"),
        unix_millis(col("ts")).as("ts_ms"), col("converted"))
  }

  /** q128: driver-gated evidence for the streaming search-index tier —
    * the BM25 half of the reference's `target_lag` freshness story
    * (README.md:83,117; q126 evidences the vector half). Documents
    * (joined to cycled embeddings for the assignment leg) split into
    * three hash micro-batches replay the EXACT foreachBatch body of
    * `incrementalSearchIndex`
    * ([[graft.streaming.Streams.searchIndexBatch]]: per-batch term
    * stats, doc lengths, and IVF assignments under `batch_id=`;
    * compaction folds the committed batches mid-replay), and the
    * declared result is a warm BM25 query through the assembled live
    * index ([[graft.streaming.Streams.readSearchIndex]] +
    * [[Bm25.scoreIndexed]], q23's terms). The oracle is q23's one-shot
    * SQL verbatim: the maintained tf/dl tables union to exactly the
    * corpus-wide statistics because term stats are per-doc-partitioned
    * and N/avgdl are derived at read time from the unioned dl table —
    * replay == rebuild is the freshness contract. */
  private def searchIndexReplayQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Streams
    val dir = replayStateDir(s, "q128", d)
    val emb = embeddings(s, d)
    val nEmb = emb.count()
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    // dense-index cycle, not a raw pmod==vec_id join (see
    // [[Tables.cycleEmbeddings]]: raw ids are holed on tiled corpora
    // and the equi-join silently dropped 60% of sf1's documents).
    // localCheckpoint: the three micro-batch writes below are SEPARATE
    // actions, so ReuseExchange cannot span them — uncheckpointed, each
    // batch re-scans documents and re-runs the embedding attach join
    // (the q112 pair-checkpoint class, cross-action reuse)
    val corpus = Tables.cycleEmbeddings(
        documents(s, d).select(col("doc_id"), col("text")), emb, nEmb)
      .select(col("doc_id"), col("text"), col("embedding"))
      .localCheckpoint()
    (0 until 3).foreach { i =>
      Streams.searchIndexBatch(
        corpus.filter(pmod(col("doc_id"), lit(3)) === i),
        i.toLong, "doc_id", "text", "embedding", cents, dir,
        compactEvery = 2)
    }
    val idx = Streams.readSearchIndex(s, dir, cents, "doc_id", "embedding")
    Bm25.scoreIndexed(idx.bm25, Seq("spark", "join", "fast"))
  }

  /** q129: driver-gated evidence for the stateful-streaming sessionizer
    * — the custom-state tier's last member, closing the set with q127
    * (every flatMapGroupsWithState operator now has a gate-evidenced
    * replay). Three time-sliced event batches replay
    * [[graft.streaming.StatefulSessionize.transition]] (the extracted
    * automaton body: (event-time millis, event_id) sort, gap-close, O(1)
    * open-session state) with state carried in a cogrouped Dataset;
    * end-of-log open sessions are flushed via
    * [[graft.streaming.StatefulSessionize.closeSession]] exactly as the
    * stream's watermark timeout would. The oracle is the gaps-and-islands
    * rebuild under the stream's own millisecond order key (q24's shape at
    * second granularity; millis here because `Timestamp.getTime` is the
    * operator's clock). */
  private def sessionizeReplayQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.StatefulSessionize
    import StatefulSessionize.{Event, OpenSession, Session}
    import s.implicits._
    val gapMs = 1800 * 1000L
    val ev = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id")).as[Event]
    val cuts = Seq("2024-01-11 00:00:00", "2024-01-21 00:00:00")
      .map(c => lit(c).cast("timestamp"))
    val batches = Seq(
      ev.filter(col("ts") < cuts(0)),
      ev.filter(col("ts") >= cuts(0) && col("ts") < cuts(1)),
      ev.filter(col("ts") >= cuts(1)))
    var state = s.emptyDataset[(Long, OpenSession)]
    var emissions = s.emptyDataset[Session]
    batches.foreach { b =>
      val stepped = b.groupByKey(_.user_id)
        .cogroup(state.groupByKey(_._1)) { (u, evIt, stIt) =>
          val (open, closed) = StatefulSessionize.transition(u, evIt,
            stIt.toSeq.headOption.map(_._2), gapMs)
          Iterator((u, open, closed))
        }.localCheckpoint()
      state = stepped.flatMap { case (u, open, _) => open.map(u -> _) }
      emissions = emissions.union(stepped.flatMap(_._3))
    }
    val flushed = state.map { case (u, open) =>
      StatefulSessionize.closeSession(u, open) }
    emissions.union(flushed).toDF()
      .select(col("user_id"),
        unix_millis(col("start_ts")).as("start_ms"),
        unix_millis(col("end_ts")).as("end_ms"),
        col("n_events").cast("long").as("n_events"),
        col("duration_sec"))
  }

  /** q130: the stream-stream interval join run as a declared query — the
    * last spec-only streaming member. Unlike the foreachBatch replays
    * (q116–q128), [[graft.streaming.Streams.streamIntervalJoin]] is a
    * declarative wrapper whose entire semantics live in its join
    * condition, and `withWatermark` is a no-op on batch inputs — so the
    * declared query calls the EXACT production function on batch frames
    * (views ⋈ clicks per user within 15 minutes, the impression→click
    * attribution shape) and the oracle recomputes the interval join
    * relationally. What this evidences is the condition/alias logic the
    * stream executes; the state-eviction behavior (watermark bounds) is
    * StreamsSpec-pinned where it belongs. */
  private def intervalJoinQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Streams
    val ev = events(s, d)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("view_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("r_ts"), col("event_id").as("click_id"))
    Streams.streamIntervalJoin(views, clicks, Seq("user_id"),
        "l_ts", "r_ts", within = "15 minutes")
      .select(col("l.user_id").as("user_id"),
        col("l.view_id").as("view_id"),
        col("r.click_id").as("click_id"),
        expr("(unix_micros(r_ts) - unix_micros(l_ts)) div 1000000")
          .as("lag_sec"))
  }

  /** q131: embedding-space eval-set decontamination
    * ([[Dedup.semanticDecontaminate]]) — the semantic sibling of q55's
    * n-gram screen: train vectors (vec_id % 17 ≠ 0) are flagged when an
    * eval vector (vec_id % 17 = 0) in the SAME IVF list sits at cosine
    * ≥ 0.35 — the paraphrase-leakage case lexical overlap misses.
    * Candidates form through the cid equi-join only (q65's discipline —
    * scan-side assignment, never train × eval); the oracle reproduces
    * the same assignment (q27's SQL) and the same same-list candidate
    * rule, so the approximation contract is part of the declared
    * semantics, not a hidden error. */
  private def semanticDecontaminateQ(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    Dedup.semanticDecontaminate(
      emb.filter(col("vec_id") % 17 =!= 0),
      emb.filter(col("vec_id") % 17 === 0),
      emb.filter(col("vec_id") < 16),
      "vec_id", "embedding", threshold = 0.35)
  }

  /** q132: exact duplicated-span removal — the separator-free,
    * suffix-array-style exact-substring dedup (Lee et al. 2022) as its
    * sliding-window Spark form ([[Dedup.dupSpanDedup]]): every 5-token
    * window digested scan-side, duplicate windows (corpus-wide, any
    * alignment) keep only their first (doc, pos) occurrence, covered
    * tokens drop, docs rebuilt. The q59/q85 passage operators need a
    * separator to agree with the repeat; this one does not. */
  private def dupSpanQ(s: SparkSession, d: String): DataFrame =
    Dedup.dupSpanDedup(documents(s, d), "doc_id", "text", win = 5,
      hashOf = sha2(_, 256))

  /** q133: ranked-retrieval quality evaluation ([[RetrievalEval]]) — the
    * reference's "recall@20 ≥ 0.7" SLO metric (README.md:87,139) as a
    * first-class oracled operator: the q27 IVF ranking (top-20, nProbe=4)
    * graded against q16's brute-force cosine truth (top-10) — per-query
    * recall/precision@10, reciprocal rank, success flag. The eval joins
    * are all (query, doc)-keyed; no stage is wider than the ranking. */
  private def retrievalEvalQ(s: SparkSession, d: String): DataFrame = {
    val (approx, truth) = rankedTruthPair(s, d)
    RetrievalEval.evaluate(approx, truth, "query_id", "neighbor_id",
      "rank", k = 10)
  }

  /** The one graded (ranking, truth) pair every eval query
    * (q133/q136/q139/q141) shares — the Scala twin of the SQL side's
    * `retrievalCommonCtes`: the q27 IVF top-20 (nProbe 4) as the system
    * under test, q16's brute-force top-10 as ground truth. A parameter
    * tweak here (k, nProbe) changes all four queries together, exactly
    * like the shared CTE string changes all four oracles. */
  private def rankedTruthPair(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val emb = embeddings(s, d)
    val qs = emb.filter(col("vec_id") < 10)
    val truth = Knn.bruteTopK(emb, qs, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val approx = Knn.ivfTopK(emb, qs, emb.filter(col("vec_id") < 16),
        "vec_id", "embedding", k = 20, nProbe = 4)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    (approx, truth)
  }

  /** q136: the corpus-level macro summary of q133
    * ([[RetrievalEval.summarize]]): one row — n_queries, macro
    * recall/precision@10, MRR, success rate — the exact shape of the
    * reference's "recall@20 ≥ 0.7" SLO statement, computed by the engine
    * instead of the bench harness. */
  private def retrievalEvalMacroQ(s: SparkSession, d: String): DataFrame =
    RetrievalEval.summarize(retrievalEvalQ(s, d))

  /** q137: incremental JOIN view maintenance ([[Incremental.joinDelta]] —
    * the delta-join identity ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, the join sibling of
    * q106's aggregate IVM): the orders⋈customer view split at a date
    * cutoff (order deltas) and a key lane (customer deltas); declared =
    * base-join ∪ joinDelta, oracle = the full join recomputed from ALL
    * rows — merge-vs-recompute equivalence IS the correctness statement. */
  private def joinDeltaQ(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_custkey").as("custkey"),
      col("o_orderkey"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderdate"))
    val c = customer(s, d).select(col("c_custkey").as("custkey"),
      col("c_mktsegment"))
    val cut = lit("1998-01-01").cast("timestamp")
    val baseA = o.filter(col("o_orderdate") < cut).drop("o_orderdate")
    val deltaA = o.filter(col("o_orderdate") >= cut).drop("o_orderdate")
    val baseB = c.filter(col("custkey") % 7 =!= 0)
    val deltaB = c.filter(col("custkey") % 7 === 0)
    baseA.join(baseB, Seq("custkey"))
      .unionByName(
        Incremental.joinDelta(baseA, deltaA, baseB, deltaB, Seq("custkey")))
  }

  /** q138: entity-resolution name matching ([[Dedup.nameMatchPairs]] +
    * the native `graft_jaro_winkler` codegen kernel, DuckDB-semantics
    * pinned): the DISTINCT part-name vocabulary plus a deterministic
    * "dirty twin" per name (suffix char — the q56-style injected batch),
    * blocked on the 2-char prefix, verified at jw ∈ [0.9, 1.0) — exact
    * dups excluded (they belong to q14); the oracle recomputes every
    * score with DuckDB's own jaro_winkler_similarity, so the hash match
    * certifies the kernel's matching/transposition/prefix arithmetic. */
  private def nameMatchQ(s: SparkSession, d: String): DataFrame = {
    val names = part(s, d).select(col("p_name").as("nm")).distinct()
    val entities = names.select(col("nm").as("id"), col("nm"))
      .unionByName(names.select(concat(col("nm"), lit("x")).as("id"),
        concat(col("nm"), lit("x")).as("nm")))
    Dedup.nameMatchPairs(entities, "id", "nm", threshold = 0.9)
      .select(col("id_a").as("name_a"), col("id_b").as("name_b"), col("jw"))
  }

  /** q139: rational-gain nDCG@10 ([[RetrievalEval.ndcg]]) — the graded
    * metric completing the q133/q136 eval set: the q27 IVF top-20 graded
    * against q16's brute-force top-10 truth under the HARMONIC discount
    * (1/rank — MRR's weight curve extended to all hits), with DCG and
    * IDCG computed as exact integers at scale lcm(1..10) = 2520. The
    * only floating-point step is the final correctly-rounded division of
    * two exact integers, so the hash compare certifies the metric with
    * zero accumulation-order risk — the house answer to nDCG's
    * transcendental log2 discount (see RetrievalEval scaladoc). */
  private def ndcgQ(s: SparkSession, d: String): DataFrame = {
    val (approx, truth) = rankedTruthPair(s, d)
    RetrievalEval.ndcg(approx, truth, "query_id", "neighbor_id", "rank",
      k = 10)
  }

  /** q140: streaming-ingest leg of the MAUDE pipeline itself — the
    * reference's S3-stage → COPY ingest path (README.md:99-103) under
    * its `target_lag` freshness concern (README.md:117), driver-gated
    * end-to-end the way the search/vector indexes are (q126/q128):
    * deterministic NDJSON built from orders lands as THREE time-sliced
    * micro-batch file drops; each batch runs the EXACT production
    * ingest+staging chain — [[graft.sources.MaudeIngest.batch]] (the
    * same schema-first parse `MaudeIngest.stream` applies to new files)
    * → [[graft.models.StgMaude.apply]] (the one-scan shuffle-free
    * staging projection) — and upserts into the persisted bucket-partial
    * SCD-1 state ([[graft.streaming.Streams.scd1MergeBatch]], the
    * foreachBatch body of `incrementalScd1`) keyed by mdr_report_key
    * with report-sequence recency. Report keys REPEAT across batches
    * (o_orderkey mod 1000), so later micro-batches genuinely rewrite
    * earlier state, and ~1% of date_received values are malformed to
    * exercise the null-safe parse in the replayed path. The oracle
    * computes the staging transform for the LATEST report per key
    * straight from the base columns: replayed incremental ingest ==
    * one-shot batch pipeline over the union — the ingest tier's
    * freshness contract, exactly q116's statement applied to the
    * reference's own feed. Scale: each batch shuffles its delta plus
    * touched state buckets only; the parse/staging stage is the q08
    * pipeline's scan-side projection, linear in the drop size. */
  /** q140: the MAUDE ingest replay over the session-shared fixture
    * ([[MaudeFixture]], the r12 verdict's #2 — landing + merged state
    * built once per JVM session by the SAME production
    * parse→stage→merge chain this query always ran; first touch in a
    * session pays the build, every later touch reads the state). The
    * declared result is the final merged state read back. */
  private def maudeIngestReplayQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Streams
    val stateDir = MaudeFixture.ingestState(s, d)
    // date_received stays a DATE through parse/staging/state; the
    // declared output formats it ISO for the cross-engine compare
    // (q13's precedent — DuckDB DATE round-trips as datetime64)
    Streams.readScd1Raw(s, stateDir)
      .select(col("mdr_report_key"), col("report_number"),
        date_format(col("date_received"), "yyyy-MM-dd").as("date_received"),
        col("event_type"), col("product_code"),
        col("manufacturer_name"), col("brand_name"), col("narrative_len"),
        col("seq"))
  }

  /** q141: exact-rational average precision @10
    * ([[RetrievalEval.averagePrecision]]) — the last member of the
    * standard retrieval-eval set (macro mean of this column IS MAP):
    * every P(r) term carries denominator ≤ k, so at scale
    * lcm(1..10) = 2520 the AP numerator is an order-insensitive integer
    * sum (running-hits window × exact integer weights) and the only
    * float op is the final correctly-rounded division — q139's
    * discipline applied to the precision-averaging metric. Same
    * ranked/truth pair as q133/q139. */
  private def apQ(s: SparkSession, d: String): DataFrame = {
    val (approx, truth) = rankedTruthPair(s, d)
    RetrievalEval.averagePrecision(approx, truth, "query_id",
      "neighbor_id", "rank", k = 10)
  }

  /** q142: corpus-level graded-metric summary
    * ([[RetrievalEval.summarizeGraded]]) — the q136 analog for the
    * graded tier: one row of n_queries, mean nDCG@10 and MAP@10 over
    * the shared ranked/truth pair. Undefined per-query values (no
    * truth) drop out of the means by avg's NULL semantics on both
    * engines, exactly q136's mean_recall rule. */
  private def gradedMacroQ(s: SparkSession, d: String): DataFrame = {
    val (approx, truth) = rankedTruthPair(s, d)
    RetrievalEval.summarizeGraded(
      RetrievalEval.ndcg(approx, truth, "query_id", "neighbor_id",
        "rank", k = 10),
      RetrievalEval.averagePrecision(approx, truth, "query_id",
        "neighbor_id", "rank", k = 10),
      "query_id")
  }

  /** q143: column-masking policy ([[Privacy.applyMaskingPolicies]] — the
    * reference's `MASKING POLICY` governance item, README.md:63,132, as
    * a plan-time projection): the customer table viewed as role
    * 'analyst' — name partial-masked to its last 3 chars, segment fully
    * redacted, the join key tokenized via SHA-256 (referential
    * integrity preserved: equal keys mask to equal tokens), and acctbal
    * untouched because its policy ALLOWS the analyst role. The
    * unprivileged branches fold at plan time, so the governed view is a
    * pure scan-side projection — zero cost at 100 TB. The oracle
    * recomputes every mask relationally (RE2-safe repeat/right form +
    * DuckDB's own sha256). */
  private def maskingPolicyQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Privacy
    import Privacy.MaskPolicy
    val base = customer(s, d).select(
      col("c_custkey"), col("c_name"),
      col("c_custkey").cast("string").as("cust_token"),
      col("c_mktsegment"), col("c_acctbal"))
    Privacy.applyMaskingPolicies(base, role = "analyst", Seq(
      MaskPolicy("c_name", Set("compliance"), Privacy.maskTail(_, 3)),
      MaskPolicy("cust_token", Set("compliance"), Privacy.maskHash),
      MaskPolicy("c_mktsegment", Set("compliance"), Privacy.maskFull),
      // type-preserving NULL-out for the numeric column (maskFull would
      // fail applyMaskingPolicies' schema-invariance check): the
      // analyst role is ALLOWED here, so the declared output carries
      // the RAW balances — the pass-through is part of the contract
      MaskPolicy("c_acctbal", Set("compliance", "analyst"),
        Privacy.maskNull("double"))))
  }

  /** q144: row-access policy ([[Privacy.rowAccessFilter]] — the
    * reference's `ROW ACCESS POLICY` item, README.md:63,132, "per
    * manufacturer/region"): an entitlement table derived from
    * region/nation grants 'analyst_emea' the EUROPE nations and
    * 'analyst_amer' the AMERICA ones; the customer table filtered for
    * 'analyst_emea' folds to per-nation counts + exact cent balances.
    * The entitlement side is roles × keys small → broadcast LEFT SEMI:
    * the policy costs one scan-side hash probe per row at any fact
    * size. Oracle = the same entitlement set as an IN-subquery. */
  private def rowAccessQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Privacy
    val ent = regionEntitlements(s, d)
    Privacy.rowAccessFilter(customer(s, d), "c_nationkey", ent, "role",
        role = "analyst_emea")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)")).as("cents"))
  }

  /** The role→nation entitlement table q144/q145 share: region
    * membership as grants — 'analyst_emea' holds the EUROPE nations,
    * 'analyst_amer' the AMERICA ones (the reference's "per
    * manufacturer/region" row-policy statement, README.md:63,132). */
  private def regionEntitlements(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
      .select(
        when(col("r_name") === "EUROPE", lit("analyst_emea"))
          .when(col("r_name") === "AMERICA", lit("analyst_amer"))
          .as("role"),
        col("n_nationkey").as("c_nationkey"))
      .filter(col("role").isNotNull)

  /** q145: declarative policy binding ([[Privacy.governedView]] — the
    * `ALTER TABLE … SET MASKING/ROW ACCESS POLICY` attachment analog,
    * reference README.md:63,132, completing q143/q144's call-time
    * enforcement with governance-as-data): the policy set is a
    * PERSISTED seed-style catalog table — written as CSV, read back
    * like any seed, five rows binding q143's masks plus a row-access
    * key to `customer` (and one decoy row bound to another table,
    * proving selection is by table name) — and the governed view is
    * composed entirely from what the catalog says. Role 'analyst_emea'
    * sees c_name tail-masked, the token lane SHA-256'd, the segment
    * redacted, acctbal RAW (its policy allows the role), and ONLY the
    * EUROPE-entitled rows. Misconfiguration fails fast at
    * view-construction (unknown kind, absent column, missing
    * entitlements — PrivacySpec); plan cost is identical to q143+q144:
    * a scan-side folded projection plus one broadcast semi probe. */
  private def policyCatalogQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Privacy
    val dir = replayStateDir(s, "q145", d)
    import s.implicits._
    Seq(
      ("customer", "c_name", "mask_tail", "3", "compliance"),
      ("customer", "cust_token", "mask_hash", "", "compliance"),
      ("customer", "c_mktsegment", "mask_full", "", "compliance"),
      ("customer", "c_acctbal", "mask_null", "double",
        "compliance,analyst_emea"),
      ("customer", "c_nationkey", "row_access", "", ""),
      ("orders", "o_totalprice", "mask_null", "double", "compliance"))
      .toDF(Privacy.CatalogColumns: _*)
      .coalesce(1).write.option("header", "true").mode("overwrite").csv(dir)
    val catalog = s.read.option("header", "true").csv(dir)
    val base = customer(s, d).select(
      col("c_custkey"), col("c_name"),
      col("c_custkey").cast("string").as("cust_token"),
      col("c_mktsegment"), col("c_acctbal"), col("c_nationkey"))
    Privacy.governedView(base, "customer", "analyst_emea", catalog,
      Some(regionEntitlements(s, d)))
  }

  /** q146: incremental maintenance of the reference's OWN mart DAG under
    * its streaming ingest — the capstone the freshness tier builds to:
    * the reference rebuilds `ae_counts_q` and `v_ae_early_signals` fully
    * per `dbt run` (dbt_project.yml:13-15, ae_counts_q.sql,
    * v_ae_early_signals.sql); here the SAME models stay fresh under
    * q140's 3-drop MAUDE micro-batch replay without ever rescanning
    * history. Per batch: (1) the production parse→stage→fact chain
    * ([[graft.sources.MaudeIngest.batch]] → [[graft.models.StgMaude]] →
    * [[graft.models.FactAdverseEvents]]) runs on the drop only; (2) the
    * fact state upserts SCD-1 by mdr_report_key
    * ([[graft.streaming.Streams.scd1MergeBatch]]), bracketed by
    * pre-/post-image reads of ONLY the touched buckets
    * ([[graft.streaming.Streams.readScd1RawBuckets]]) — an upsert that
    * MOVES a report between (mfr, mode, quarter) groups must retract
    * from the old group, which append-only IVM (q106) cannot express;
    * (3) the counts mart folds the signed images
    * ([[Incremental.maintainCounts]] — `ae_counts_q` maintained, zero
    * history rescans); (4) the window tier recomputes ONLY the touched
    * (canonical_mfr, failure_mode) partitions and carries every other
    * partition forward ([[Incremental.patchPartitions]] — sound because
    * [[graft.models.VAeEarlySignals]] is partition-local by
    * construction). The declared result is the maintained signals mart
    * after the last drop; the oracle recomputes the whole
    * stg→fact→counts→signals DAG flat from the latest report per key —
    * maintained == rebuilt is the IVM identity, stated on the
    * reference's flagship analytic itself. Scale: each batch shuffles
    * O(delta + touched buckets + touched partitions); the 100 TB fact
    * history is never read again. */
  private def signalsIvmQ(s: SparkSession, d: String): DataFrame = {
    import graft.models.VAeEarlySignals
    import graft.streaming.Streams
    val root = replayStateDir(s, "q146", d)
    val stateDir = s"$root/state"
    val nBuckets = 16
    // phase attribution (VERDICT r15 #2: at 8.77 s committed this is
    // 6.7% of the whole gate — before attacking any term, measure the
    // split): wall time per phase accumulated across the 3 batches,
    // emitted as ONE stderr line when SPARK_GRAFT_Q146_PHASES=true so
    // verify/bench output stays clean by default
    val phaseOn = sys.env.get("SPARK_GRAFT_Q146_PHASES").contains("true")
    val phases = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def ph[A](name: String)(body: => A): A =
      if (!phaseOn) body
      else {
        val t0 = System.nanoTime()
        val r = body
        phases(name) = phases.getOrElse(name, 0.0) +
          (System.nanoTime() - t0) / 1e9
        r
      }
    val groupCols = Seq("canonical_mfr", "failure_mode", "yyyy", "q",
      "quarter_index", "year_quarter")
    val pairCols = Seq("canonical_mfr", "failure_mode")
    // AeCountsQ's row-grain group derivation (its '(unknown)' defaults,
    // NULL-date filter, quarter keys) applied to fact-state row images
    def grouped(rows: DataFrame): DataFrame =
      rows.filter(col("date_received").isNotNull)
        .select(
          coalesce(col("canonical_mfr"), lit("(unknown)")).as("canonical_mfr"),
          coalesce(col("failure_mode"), lit("(unknown)")).as("failure_mode"),
          year(col("date_received")).as("yyyy"),
          quarter(col("date_received")).as("q"),
          F.quarterIndex(col("date_received")).as("quarter_index"),
          F.yearQuarterLabel(col("date_received")).as("year_quarter"))
    // Round-12 fold (the r11 verdict's #6): the maintained marts are
    // carried ACROSS batches as localCheckpoint-ed frames instead of
    // re-reading each just-written parquet version — every version is
    // still PUBLISHED (the mart contract), but the next batch's fold
    // and the signals derivation consume the in-memory image, removing
    // seven parquet read-backs (+ their listings) from the 3-batch
    // replay. The checkpoint job itself is aggregate-sized; content is
    // identical because the write runs from the same checkpointed frame.
    var prevCountsOpt: Option[DataFrame] = None
    var prevSignalsOpt: Option[DataFrame] = None
    (0 until 3).foreach { i =>
      // fact-grain staging from the session-shared fixture (parse +
      // canonicalization + ILIKE cascade deterministic per drop, built
      // once — [[MaudeFixture.factStage]]); everything the IVM identity
      // gates (merge, image reads, mart folds, window patches) runs
      // per invocation from here down
      val fact = MaudeFixture.factStage(s, d, i).cache()
      // the delta's distinct key set feeds the two image semi-joins —
      // cached so the key-dedup exchange runs once, broadcast because it
      // is delta-key-count-sized, far under the state side: committed
      // in-run class 8.77 → 6.53 s at sf0.1 (r16; the solo protocol
      // could not see the win through the evening's ±15-40% host drift —
      // merge read 1.92 → 2.67 s at IDENTICAL code across adjacent solo
      // runs — but the full-run in-chunk measurement shows it cleanly).
      // The bucket collect deliberately does NOT go through the cache:
      // distinct on the bucket column alone partial-aggregates to
      // ≤nBuckets values per task before the exchange (routing
      // deltaKeys' materialization through that phase measured +0.6 s —
      // two cache writes in one action's critical path).
      // r16 attribution (SPARK_GRAFT_Q146_PHASES, warm solo at sf0.1):
      // merge ~33%, signals_patch ~19%, counts_fold ~15%, image reads
      // ~14%, mart writes only ~8% — folding the two mart writes into
      // one job can recover at most ~0.3 s, under the host band; zstd
      // is already the engine default. Do not retry write-folding
      // without first re-measuring the band.
      val deltaKeys = fact.select(col("mdr_report_key")).distinct().cache()
      val touchedBuckets = ph("buckets") { fact
        .select(pmod(xxhash64(col("mdr_report_key")), lit(nBuckets.toLong))
          .as("b"))
        .distinct().collect().map(_.getLong(0)).toSet }
      def images(state: Option[DataFrame]): DataFrame = state match {
        case Some(st) =>
          grouped(st.join(broadcast(deltaKeys),
            Seq("mdr_report_key"), "left_semi"))
        case None => grouped(fact).limit(0)
      }
      // pre-image BEFORE the merge, post-image after — both reads touch
      // only the delta's buckets, and the merge retains its base version
      // until a later batch supersedes it, so the lazy pre-image paths
      // stay readable through this batch's downstream writes. Both
      // images are CACHED: the counts fold, the touched-pair derivation,
      // and the signals patch all reuse them, and without the cache each
      // downstream action would re-list and re-read the state buckets
      // (measured 15.6 s → the replayed-state class without it)
      // under SPARK_GRAFT_Q146_PHASES the cached images are FORCED here
      // (count on the cache) so their scan cost books to their own
      // phase instead of the first downstream action — attribution-run
      // only; the production path stays lazy-until-fold
      val removed = images(Streams.readScd1RawBuckets(s, stateDir, touchedBuckets))
        .cache()
      if (phaseOn) ph("preimage") { removed.count(); () }
      ph("merge") {
        Streams.scd1MergeBatch(fact, i.toLong, Seq("mdr_report_key"),
          Seq("seq"), stateDir, nBuckets)
      }
      val added = images(Streams.readScd1RawBuckets(s, stateDir, touchedBuckets))
        .cache()
      if (phaseOn) ph("postimage") { added.count(); () }
      val prevCounts = prevCountsOpt.getOrElse(
        grouped(fact).limit(0).withColumn("n_events", lit(0L)))
      // the marts are aggregate-sized (groups, not events): coalesce the
      // versioned writes so each version is a few right-sized files, not
      // 32 shuffle-partition shards — the same small-file discipline
      // q134's compactor enforces after the fact, applied at write time
      val countsNow = ph("counts_fold") { Incremental
        .maintainCounts(prevCounts, removed, added, groupCols)
        .coalesce(4).localCheckpoint() }
      // MEASURED NEGATIVE, DO NOT RETRY AT TEST SCALE (r13 verdict #4
      // executed and reverted): publishing these marts through
      // [[graft.sinks.Publish.filesPartitionOverwrite]] (counts keyed
      // by yyyy, signals by canonical_mfr, slices from the touched
      // images) measured 21.2 s vs 18.9 s for the whole gate at sf0.1
      // under the same solo-run protocol (9.5 s warm in-chunk) — the
      // dynamic-partition overwrite pays a fixed ~0.4 s of staging +
      // per-partition commit per refresh on the local FS, a dead loss
      // when the mart is aggregate-sized and the plain versioned write
      // costs ~0.3 s. The operator WINS when the avoided rewrite
      // exceeds the commit cost (big marts, time-sliced feeds touching
      // few partitions — q216 gates it; PublishSpec pins the
      // maintained-mart composition with byte-identical untouched
      // partitions); on THIS fixture the key-sliced drops touch every
      // partition each batch, so there is nothing for partition
      // scoping to save at any scale factor.
      ph("counts_write") {
        countsNow.write.mode("overwrite").parquet(s"$root/counts/v=$i")
      }
      val touchedPairs = removed.select(pairCols.map(col): _*)
        .unionByName(added.select(pairCols.map(col): _*)).distinct()
      val fresh = VAeEarlySignals(
        countsNow.join(touchedPairs, pairCols, "left_semi"))
      val prevSignals = prevSignalsOpt.getOrElse(fresh.limit(0))
      val signalsNow = ph("signals_patch") { Incremental
        .patchPartitions(prevSignals, fresh, touchedPairs, pairCols)
        .coalesce(4).localCheckpoint() }
      ph("signals_write") {
        signalsNow.write.mode("overwrite").parquet(s"$root/signals/v=$i")
      }
      prevCountsOpt = Some(countsNow)
      prevSignalsOpt = Some(signalsNow)
      removed.unpersist(); added.unpersist(); fact.unpersist()
      deltaKeys.unpersist()
      ()
    }
    if (phaseOn) System.err.println("[q146] phases " +
      phases.map { case (k, v) => f"$k=$v%.2f" }.mkString(" ") +
      f" sum=${phases.values.sum}%.2f")
    s.read.parquet(s"$root/signals/v=2")
      .select(col("canonical_mfr"), col("failure_mode"), col("year_quarter"),
        col("quarter_index"), col("n_events"),
        round(col("mean_4"), 4).as("mean_4"),
        round(col("std_4"), 4).as("std_4"),
        round(col("z_score"), 4).as("z_score"))
  }

  /** q147: table-level lineage report ([[graft.operators.Lineage]] — the
    * third leg of the governance pillar, reference README.md:127-133:
    * access audits q109, policies q143–q145, LINEAGE here; Snowflake's
    * ACCESS_HISTORY/OBJECT_DEPENDENCIES shape): the (model, source)
    * edge table of three declared models, extracted by ANALYZED-PLAN
    * inspection — the DataFrame's own provenance record, no listener,
    * no execution. The oracle pins the expected edge set as constants,
    * which makes the gate a lineage REGRESSION check: a model silently
    * gaining or losing a source table (the governance event lineage
    * exists to catch) hash-diverges this query. Driver cost is plan
    * traversal; the report is #models × #sources rows. */
  private def lineageQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Lineage.report(s, Seq(
      "q01_pricing_summary" -> pricingSummary(s, d),
      "q04_region_nation_revenue" -> regionNationRevenue(s, d),
      "q14_dedup_exact" -> dedupExact(s, d)))

  /** q148: COLUMN-level lineage ([[graft.operators.Lineage.columnReport]]
    * — ACCESS_HISTORY's `baseSources` granularity, q147's table edges
    * refined to (model, column, source_table, source_column)). Same
    * constants-oracle regression-gate design as q147, now sensitive to
    * a column silently changing its DERIVATION (e.g. revenue dropping
    * the discount term) even when the table set is unchanged. Join keys
    * and filters deliberately contribute nothing — value derivation
    * only — so the q04 edge set is exactly {n_name←nation.n_name,
    * revenue←lineitem.{l_extendedprice,l_discount}} despite the
    * five-table join; q01's count_order (literal-only) emits no row. */
  private def lineageColumnsQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Lineage.columnReport(s, Seq(
      "q01_pricing_summary" -> pricingSummary(s, d),
      "q04_region_nation_revenue" -> regionNationRevenue(s, d)))

  /** q149: transparent materialized-view rewrite
    * ([[graft.plans.MvRewrite]] — Snowflake's MV auto-rewrite; the
    * reference's marts are dbt materializations queried by name,
    * dbt_project.yml:13-15, and this closes the remaining gap: an
    * AD-HOC query equivalent to a maintained mart silently USES it).
    * The order-priority rollup is materialized and registered; the
    * SAME aggregate re-issued against the base table is then REQUIRED
    * to have been rewritten onto the mart scan — the require makes the
    * green gate row rewrite evidence, not just result evidence — and
    * an enclosing filter + derived column on top prove the preserved
    * attribute ids keep downstream operators binding. Oracle recomputes
    * flat from orders, so the mart's contents are themselves gated.
    * Scale: the rewrite replaces the fact scan + shuffle with an
    * aggregate-sized mart scan at plan time — the entire point of the
    * feature at 100 TB. Registry cleared in finally: rewrite scope must
    * not leak into other declared queries' plans. */
  private def mvRewriteQ(s: SparkSession, d: String): DataFrame = {
    import graft.plans.MvCatalog
    Graft.configure(s)
    val root = replayStateDir(s, "q149", d)
    def rollup() = orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("revenue"))
    try {
      MvCatalog.materialize(s, "mv_priority_rollup", rollup(),
        s"$root/mv_priority_rollup.parquet")
      val reissued = rollup()
        .filter(col("n_orders") > 0)
        .withColumn("avg_order_value",
          round(col("revenue") / col("n_orders"), 2))
      val physical = reissued.queryExecution.executedPlan.toString
      require(physical.contains("mv_priority_rollup.parquet"),
        s"MV rewrite did not fire; plan:\n$physical")
      // bounded collect (≤ #priorities = 5 rows): pins the gate rows to
      // the REWRITTEN execution — returning the lazy frame would let
      // Verify's coalesce().write recompile after the finally clears
      // the registry and silently fall back to the base tables
      val out = reissued.collect()
      s.createDataFrame(s.sparkContext.parallelize(out.toList, 1),
        reissued.schema)
    } finally MvCatalog.clear()
  }

  /** q150: MV ROLLUP subsumption ([[graft.plans.MvRewrite]]'s data-cube
    * leg — q149 is the exact-match rewrite; this is the classic "one
    * finest-grain mart serves every coarser rollup": the registered
    * mart groups by (priority, status), and a query grouping by STATUS
    * alone is re-aggregated OVER the mart — sum→sum of sums, count→sum
    * of counts, min/max→min/max of mins/maxes — with the scalar shells
    * (round, a hand-written mean ratio) riding over substituted
    * aggregate leaves. REQUIRED to scan the mart; oracle recomputes
    * flat from orders. The mart total is the exact decimal sum
    * ([[moneySum]] discipline), so sum-of-group-sums EQUALS the flat
    * sum as a rational number — the rewrite is exact, not
    * round-2-absorbed; counts are exact. Scale: the cube property is
    * THE mart-economics feature — one maintained fine-grain mart
    * answers the whole rollup lattice without touching the fact. */
  private def mvRollupQ(s: SparkSession, d: String): DataFrame = {
    import graft.plans.MvCatalog
    Graft.configure(s)
    val root = replayStateDir(s, "q150", d)
    // the mart's total is the EXACT decimal sum (moneySum discipline):
    // sum-of-group-sums then equals the flat sum as a rational number,
    // so the rollup rewrite is exact rather than round-2-absorbed
    def fine() = orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        moneySumRaw(col("o_totalprice")).as("total"),
        min(col("o_totalprice")).as("min_total"),
        max(col("o_totalprice")).as("max_total"))
    try {
      MvCatalog.materialize(s, "mv_priority_status", fine(),
        s"$root/mv_priority_status.parquet")
      val coarse = orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("revenue"),
          round(moneySumRaw(col("o_totalprice")).cast("double") /
            count(lit(1)), 2)
            .as("avg_order_value"),
          round(min(col("o_totalprice")), 2).as("min_total"),
          round(max(col("o_totalprice")), 2).as("max_total"))
      val physical = coarse.queryExecution.executedPlan.toString
      require(physical.contains("mv_priority_status.parquet"),
        s"MV rollup rewrite did not fire; plan:\n$physical")
      require(!physical.contains("orders.parquet"),
        "rollup must not touch the base fact")
      // bounded collect (≤ #statuses = 3 rows): pins the gate rows to
      // the rewritten execution, as in q149
      val out = coarse.collect()
      s.createDataFrame(s.sparkContext.parallelize(out.toList, 1),
        coarse.schema)
    } finally MvCatalog.clear()
  }

  /** q151: aggregation policy ([[graft.operators.Privacy
    * .aggregationPolicy]] — Snowflake's aggregation-policy semantics,
    * the ENFORCED sibling of the q109 k-anonymity AUDIT): orders may
    * only be served aggregated over ≥15 orders per customer; the 1376
    * under-floor customers (sf0.01) fold into one NULL-key remainder
    * row, the 124 at/above the floor surface as themselves, and totals
    * are preserved either way. count re-aggregates as the sum of
    * partial counts, sum/max directly — the same distributivity the MV
    * rollup leg (q150) relies on. Oracle states the two-level
    * CASE-then-regroup relationally; round(…,2) absorbs the
    * remainder's float accumulation-order drift per house rules. */
  private def aggPolicyQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Privacy.aggregationPolicy(orders(s, d),
        Seq("o_custkey"),
        Seq(("o_totalprice", "count", "n_orders"),
          ("o_totalprice", "sum", "revenue_raw"),
          ("o_totalprice", "max", "max_total_raw")),
        minGroupSize = 15)
      .select(col("o_custkey"), col("n_orders"),
        round(col("revenue_raw"), 2).as("revenue"),
        round(col("max_total_raw"), 2).as("max_total"))

  /** q152: conditional (two-argument) masking policy
    * ([[graft.operators.Privacy.conditionalMask]] — Snowflake's
    * `CREATE MASKING POLICY … AS (val, visible BOOLEAN)` shape,
    * catalog-bound via the `mask_tail unless consent_ok` kind): the
    * row's own consent flag (here derived: positive account balance)
    * grants per-row visibility to unprivileged roles; a NULL flag
    * masks (fail-closed); the plain mask_full on c_mktsegment rides
    * alongside to show composition. Still a pure scan-side projection
    * — per-row governance at zero plan cost. Oracle restates both
    * masks as CASE ladders. */
  private def conditionalMaskQ(s: SparkSession, d: String): DataFrame = {
    val base = customer(s, d)
      .withColumn("consent_ok", col("c_acctbal") > lit(0.0))
    val catalog = s.createDataFrame(Seq(
      ("customer", "c_name", "mask_tail unless consent_ok", "6", "admin"),
      ("customer", "c_mktsegment", "mask_full", "", "admin")))
      .toDF("table_name", "column_name", "policy_kind", "policy_param",
        "allowed_roles")
    graft.operators.Privacy.governedView(base, "customer", "analyst_emea",
        catalog)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal"))
  }

  /** q153: projection policy ([[graft.operators.Privacy
    * .enforceProjectionPolicies]] — Snowflake's PROJECTION POLICY: the
    * protected column may be filtered/joined on but never projected),
    * enforced through the q148 column-lineage walk, whose "join keys and
    * filter predicates contribute nothing to value derivation" contract
    * IS the projection-policy semantics. The query filters customers by
    * account balance (allowed use of the protected column) and serves a
    * segment rollup that derives only from unprotected columns; the
    * serve gate inspects the analyzed plan and returns the result
    * UNCHANGED — governance at zero plan cost. PrivacySpec pins the
    * deny side (projecting, aliasing, wrapping, or aggregating the
    * protected column all throw; privileged roles bypass). Oracle
    * restates the allowed query flat — all-integer outputs, nothing for
    * a hash to drift on. */
  private def projectionPolicyQ(s: SparkSession, d: String): DataFrame = {
    val catalog = s.createDataFrame(Seq(
      ("customer", "c_acctbal", "no_project", "", "admin")))
      .toDF("table_name", "column_name", "policy_kind", "policy_param",
        "allowed_roles")
    val base = graft.operators.Privacy.governedView(customer(s, d),
      "customer", "analyst_emea", catalog)
    val served = base.filter(col("c_acctbal") > lit(5000.0))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        count_distinct(col("c_nationkey")).as("n_nations"))
    graft.operators.Privacy.enforceProjectionPolicies(served,
      "analyst_emea", catalog)
  }

  /** The value-shape registry the testdata corpus actually exhibits
    * (the operator's default registry stays the PII set — phone, email,
    * ISO date — spec-evidenced; a registry is deployment config):
    * TPC-H entity ids (`Customer#000000001`), 2-letter language codes,
    * and JSON object payloads. */
  private val corpusCategories = Seq(
    "entity_id"   -> "^[A-Za-z]+#[0-9]+$",
    "lang_code"   -> "^[a-z]{2}$",
    "json_object" -> "^\\{.*\\}$")

  /** q154: data classification ([[graft.operators.Privacy.classify]] —
    * Snowflake's EXTRACT_SEMANTIC_CATEGORIES, run as the account-wide
    * sweep the feature exists for): each table costs ONE scan-side
    * aggregate computing every (column × category) anchored-regex match
    * count, a stack + window picks the best candidate per column, and
    * the decision compares integer counts (never a float). Swept here:
    * customer, documents, events under the corpus registry —
    * c_name → entity_id, lang → lang_code, props → json_object,
    * free-text columns fall back to `text` with the best candidate's
    * count shown. Oracle restates each table's sweep as an
    * UNPIVOT × registry CTE with the same integer-space decision. */
  private def classifyQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Privacy
    Seq("customer" -> customer(s, d), "documents" -> documents(s, d),
        "events" -> events(s, d))
      .map { case (t, df) =>
        Privacy.classify(df, categories = corpusCategories)
          .select(lit(t).as("table_name"), col("column_name"),
            col("semantic_category"), col("n_values"), col("n_match"))
      }.reduce(_ union _)
  }

  /** q155: tag-based auto-masking ([[graft.operators.Privacy
    * .autoMaskCatalog]] — Snowflake's tag-based masking policies:
    * classification assigns the tag, the policy binds to the tag, every
    * tagged column is governed without anyone naming it): q154's
    * classifier output maps through `entity_id → mask_tail(4)` into
    * catalog rows, and the governed view is composed from that
    * GENERATED catalog — the full classify → bind → serve loop, closing
    * the governance tier end-to-end. Unprivileged read: c_name masked
    * to its last 4 digits, unclassified columns untouched. Oracle
    * restates the resulting mask as the usual CASE ladder. */
  private def autoMaskQ(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d)
    val catalog = graft.operators.Privacy.autoMaskCatalog(
      graft.operators.Privacy.classify(cust, categories = corpusCategories),
      "customer", Map("entity_id" -> ("mask_tail", "4")))
    graft.operators.Privacy.governedView(cust, "customer", "analyst_emea",
        catalog)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** q156: MATCH_RECOGNIZE ([[graft.operators.Patterns.matchRecognize]]
    * — Snowflake's row-pattern matching, run-aligned subset): per user,
    * find every V-shape in the event value series — a maximal run of
    * strictly-falling values followed immediately by a maximal run of
    * strictly-rising ones (`PATTERN (DOWN+ UP+)`, greedy, AFTER MATCH
    * SKIP PAST LAST ROW) — and emit the match's bounds, per-leg row
    * counts, and edge/bottom values. The PREV navigation the DEFINEs
    * need (`value < PREV(value)`) is precomputed as a lag delta, which
    * is what MATCH_RECOGNIZE compiles it to anyway. All-distinct
    * pattern symbols → the overlap-free fast path: symbol ladder +
    * run window + run collapse + lead chain, ONE exchange end to end
    * (PatternsSpec pins it). Measures are picked values and integer
    * counts — nothing accumulates, nothing for a hash to drift on.
    * Oracle restates the same runs-and-leads pipeline relationally. */
  private def matchRecognizeQ(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pre = events(s, d)
      .withColumn("dv", col("value") - lag(col("value"), 1).over(w))
    graft.operators.Patterns.matchRecognize(pre, col("user_id"),
        col("ts"), col("event_id"),
        Seq("down" -> (col("dv") < 0), "up" -> (col("dv") > 0)),
        Seq("down", "up"), col("value"))
      .select(col("key").as("user_id"), col("match_num"),
        date_format(col("o_start"), "yyyy-MM-dd HH:mm:ss").as("t_start"),
        date_format(col("o_end"), "yyyy-MM-dd HH:mm:ss").as("t_end"),
        col("rows_1").as("down_rows"), col("rows_2").as("up_rows"),
        col("v_start"), col("v_min").as("v_bottom"), col("v_end"))
  }

  /** q157: reproducible epoch shuffle ([[graft.operators.Curate
    * .epochShuffle]] — the training loader's per-epoch permutation):
    * epoch-seeded SHA lanes place every doc in a shard (lane mod 16)
    * and order it within the shard (row_number over lane, id-tiebroken)
    * — a fresh exact permutation per epoch with zero RNG state, one
    * shuffle by shard, per-shard local sorts, NEVER a global sort.
    * Oracle computes the identical lanes ([[graft.functions.ShaLanes]]
    * cross-engine contract) and the same per-shard ranking. */
  private def epochShuffleQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Curate.epochShuffle(documents(s, d), col("doc_id"),
        epoch = 7, nShards = 16)
      .select(col("shard"), col("pos"), col("doc_id"))

  /** q158: hopping (sliding) event-time windows — Spark's `window(ts,
    * size, hop)` generator (size 2 days, hop 1 day: every event lands
    * in exactly two windows), grouped per (window, event_type) with
    * count + rounded sum. The streaming-native aggregation shape (the
    * same expression under `readStream` + watermark is the production
    * form); batch here so the oracle can restate it: each event
    * contributes to the day-aligned window starting at its UTC day and
    * the one before — a two-leg UNION, then the same group. Window
    * bounds serialized as UTC date strings per house dtype rules. */
  private def hoppingWindowQ(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "2 days", "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("v_sum"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("w_start"),
        date_format(col("window.end"), "yyyy-MM-dd").as("w_end"),
        col("event_type"), col("n"), col("v_sum"))

  /** q159: seasonal-trend decomposition ([[graft.operators.Trend
    * .seasonalDecompose]] — the classical guard against weekly
    * periodicity tripping the q08 early-signal z-score): daily event
    * counts per type decompose into centered-MA trend, mean-detrended
    * weekday seasonal, and residual. Bit-exact on raw doubles by the
    * lcm-scaling argument in the operator scaladoc (integer frame sums,
    * one division per output, the seasonal group sum made
    * order-independent by scaling to integer-valued doubles) — the
    * hash gate runs on UNROUNDED floats, like q108's EWMA. */
  private def seasonalDecomposeQ(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"),
        expr("CAST(ts AS LONG) DIV 86400").as("day"))
      .agg(count(lit(1)).as("n"))
    graft.operators.Trend.seasonalDecompose(daily, Seq("event_type"),
        col("day"), col("n"))
      .select(col("event_type"),
        date_format(to_timestamp(col("day") * 86400), "yyyy-MM-dd").as("d"),
        col("n"), col("trend"), col("seasonal"), col("residual"))
  }

  /** q160: CUSUM changepoint detection ([[graft.operators.Trend.cusum]]
    * — the slow-drift sequential detector beside q159's decomposition
    * and q08's point z-score): per event type, the in-control mean is
    * the floor of the first-14-observed-days average (floor of one
    * exact division — deterministic), deviations use dyadic slack 0.5,
    * and the recursion C_t = max(0, C_{t-1}+d_t) runs as its closed
    * form S_t − min(0, S_0..S_t) — two ordered windows, no recursion.
    * All-exact doubles (operator scaladoc), gate on raw values; alarm
    * emitted as 0/1 per house no-boolean rule. */
  private def cusumQ(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), expr("CAST(ts AS LONG) DIV 86400").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    val target = daily.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 14)
      .groupBy(col("event_type"))
      .agg(floor(avg(col("n"))).cast("double").as("mu0"))
    graft.operators.Trend.cusum(
        daily.join(broadcast(target), Seq("event_type")),
        Seq("event_type"), col("day"), col("n"), col("mu0"),
        slack = 0.5, threshold = 24.0)
      .select(col("event_type"),
        date_format(to_timestamp(col("day") * 86400), "yyyy-MM-dd").as("d"),
        col("n"), col("mu0"), col("s"), col("cusum"),
        col("alarm").cast("long").as("alarm"))
  }

  /** q161: regression trend test (the LINEAR companion to q160's CUSUM:
    * "is this series drifting, and how fast?") — per event type over
    * the daily counts, the bivariate aggregate family: regr_slope /
    * regr_intercept (events/day drift), corr (direction strength), and
    * n. Pure two-pass-free built-in aggregates (one grouped pass,
    * moment accumulation); outputs rounded 6dp per house float rules
    * (moment sums are accumulation-ordered). */
  private def regressionTrendQ(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"), expr("CAST(ts AS LONG) DIV 86400").as("day"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        round(regr_slope(col("n"), col("day")), 6).as("slope"),
        round(regr_intercept(col("n"), col("day")), 6).as("intercept"),
        round(corr(col("n"), col("day")), 6).as("r"))

  /** q162: alarm-tier freshness replay (q106's agg-IVM lifecycle feeding
    * q160's detector): three event micro-batches (event_id mod 3)
    * maintain the per-(type, day) counts mart through on-disk parquet
    * state round-trips — `Incremental.aggregate` per drop,
    * `mergeAggregates` against the persisted prior state, O(mart +
    * delta) per batch, facts never rescanned — then CUSUM runs over the
    * MAINTAINED state. Oracle is q160's batch pipeline verbatim:
    * maintained-under-replay == recomputed-from-scratch is exactly the
    * freshness claim (the reference's `target_lag` posture for the
    * alarm view). */
  private def alarmReplayQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Incremental
    val dir = replayStateDir(s, "q162", d)
    val keys = Seq("event_type", "day")
    val ev = events(s, d).select(col("event_type"),
      expr("CAST(ts AS LONG) DIV 86400").as("day"), col("event_id"))
    // q146's round-12 fold idiom (r16): the maintained state is carried
    // across batches as a localCheckpoint-ed frame instead of re-reading
    // each just-written parquet version; every version is still
    // PUBLISHED, and the declared readout still consumes the published
    // state_2 — only the intermediate read-backs (+ listings) go away
    var state: Option[DataFrame] = None
    (0 until 3).foreach { i =>
      val part = Incremental.aggregate(
        ev.filter(pmod(col("event_id"), lit(3)) === i), keys, Nil)
      val merged = (state match {
        case None => part
        case Some(prev) =>
          Incremental.mergeAggregates(Seq(prev, part), keys, Nil)
      }).localCheckpoint()
      merged.write.mode("overwrite").parquet(s"$dir/state_$i")
      state = Some(merged)
    }
    val daily = s.read.parquet(s"$dir/state_2")
      .select(col("event_type"), col("day"), col("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    val target = daily.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 14)
      .groupBy(col("event_type"))
      .agg(floor(avg(col("n"))).cast("double").as("mu0"))
    graft.operators.Trend.cusum(
        daily.join(broadcast(target), Seq("event_type")),
        Seq("event_type"), col("day"), col("n"), col("mu0"),
        slack = 0.5, threshold = 24.0)
      .select(col("event_type"),
        date_format(to_timestamp(col("day") * 86400), "yyyy-MM-dd").as("d"),
        col("n"), col("mu0"), col("s"), col("cusum"),
        col("alarm").cast("long").as("alarm"))
  }

  /** Benford first-digit probabilities log10(1+1/d), pinned as DECIMAL
    * LITERALS (not computed — libm log10 may differ by an ulp across
    * engines; identical literals parse to identical doubles). */
  private val benfordP: Seq[(String, Double)] = Seq(
    "1" -> 0.3010299956639812, "2" -> 0.17609125905568124,
    "3" -> 0.12493873660829992, "4" -> 0.09691001300805642,
    "5" -> 0.07918124604762482, "6" -> 0.06694678963061322,
    "7" -> 0.05799194697768673, "8" -> 0.05115252244738129,
    "9" -> 0.04575749056067514)

  /** q163: Benford first-digit audit — the classic data-forensics /
    * quality screen (a fabricated or truncated monetary column drifts
    * from the log distribution): order totals in exact cents, first
    * digit counted per bucket, expected = n·log10(1+1/d) with the nine
    * probabilities pinned as identical decimal literals in both engines
    * (never computed via libm), chi-square contribution per digit.
    * Integer counts; expected and chi2 are single correctly-rounded ops
    * on identical operands — bit-exact raw doubles at the gate, the
    * q159/q160 discipline. */
  private def benfordQ(s: SparkSession, d: String): DataFrame = {
    val digit = substring(
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").cast("string"), 1, 1)
    val obs = orders(s, d).groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val p = benfordP.tail.foldLeft(
      when(col("digit") === benfordP.head._1, lit(benfordP.head._2))) {
      case (acc, (dg, pv)) => acc.when(col("digit") === dg, lit(pv))
    }
    // total via a broadcast 1-row aggregate (q121's bounds idiom), NOT a
    // partition-less window — the digit table is 9 rows, but the
    // declared surface pins "no global window" as a plan invariant
    obs.crossJoin(broadcast(obs.agg(sum(col("n_obs")).as("n_total"))))
      .withColumn("expected", col("n_total") * p)
      .withColumn("chi2_term",
        (col("n_obs") - col("expected")) * (col("n_obs") - col("expected")) /
          col("expected"))
      .select(col("digit"), col("n_obs"), col("n_total"),
        col("expected"), col("chi2_term"))
  }

  /** q164: fixed-budget stratified sample — exactly 100 documents,
    * allocated across languages by Hamilton largest-remainder
    * apportionment ([[graft.operators.Curate.stratifiedExact]]), members
    * picked as each stratum's smallest SHA lanes. Everything the gate
    * hashes is integer: the allocation is driver-side BigInt arithmetic
    * over a #strata-row collect, membership is a lane-rank filter — the
    * oracle restates both relationally (floor-div + remainder rank) and
    * must land on the identical 100 rows. Contrast q41, whose Bernoulli
    * rate only EXPECTS its budget; this is the exact-N eval-set cut. */
  private def stratifiedExactQ(s: SparkSession, d: String): DataFrame =
    Curate.stratifiedExact(
        documents(s, d).select(col("doc_id"), col("lang")),
        "lang", col("doc_id"), total = 100L)
      .select(col("doc_id"), col("lang"), col("rk"))

  /** q165: 2-D skyline (Pareto frontier) over part — the cheapest part
    * at every size tier no cheaper-or-equal part beats
    * ([[graft.operators.Skyline.skyline2]]: minimize p_retailprice,
    * maximize p_size). No dominance self-join: one grouped max per
    * distinct price + a strict running max over the distinct-price
    * curve. Doubles pass through untouched from the shared parquet
    * (comparisons on identical bits), sizes cast to LONG for the
    * dtype-strict gate. */
  private def skylineQ(s: SparkSession, d: String): DataFrame =
    Skyline.skyline2(part(s, d), col("p_retailprice"), col("p_size"))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"),
        col("p_size").cast("long").as("p_size"))

  /** q166: association rules over order baskets — which part brands
    * co-occur in an order beyond chance
    * ([[graft.operators.Mining.associationRules]]): distinct
    * (order, brand) pairs via the broadcast part dim, Apriori
    * frequent-1 prune, basket-co-partitioned pair self-join, 2%-of-
    * baskets support. Metrics are single divisions of exact integer
    * counts/products — no rounding lane. */
  private def associationRulesQ(s: SparkSession, d: String): DataFrame = {
    val items = lineitem(s, d)
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("basket"), col("p_brand").as("brand"))
    Mining.associationRules(items, col("basket"), col("brand"),
      minSupportRate = 0.02)
  }

  /** q167: distribution drift between event epochs (first vs second half
    * of January) across two binnings — the raw category and a 50-unit
    * value band ([[graft.operators.Drift.stability]]): PSI terms
    * (rounded 6dp — the ln lane) and chi-square homogeneity terms (raw
    * doubles, q163 discipline) per bin, one contingency aggregate per
    * dimension. */
  private def driftQ(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val inA = col("ts") < to_timestamp(lit("2024-01-16"))
    val cols = Seq("dim", "bin", "n_a", "n_b", "p_a", "p_b",
      "psi_term", "chi2_term").map(col)
    Drift.stability(ev, col("event_type"), inA)
      .withColumn("dim", lit("event_type")).select(cols: _*)
      .unionAll(
        Drift.stability(ev,
            floor(col("value") / lit(50.0)).cast("long").cast("string"), inA)
          .withColumn("dim", lit("value_band")).select(cols: _*))
  }

  /** q168: term keyness between source cohorts (src0–9 vs src10–19) —
    * Dunning G² log-likelihood per term ([[graft.operators.Drift
    * .keyness]]), the vocabulary-drift screen over document shards.
    * Integer cross-products decide `leans`; G² rides the round-6 ln
    * lane. Tokenization is the q45 contract (single-space split). */
  private def keynessQ(s: SparkSession, d: String): DataFrame =
    Drift.keyness(documents(s, d), split(col("text"), " "),
      substring(col("source"), 4, 10).cast("int") < 10, minCount = 20L)

  /** q169: two-sided linear interpolation of the per-priority daily
    * order-count series over its gap-bearing day spine
    * ([[graft.operators.Trend.interpolateLinear]]) — the line-drawing
    * sibling of q125's forward-fill. Numerators are Long-exact; the one
    * division and final addition are correctly-rounded on identical
    * operands, so v_interp hashes RAW (q159/q160 discipline). */
  private def interpolateQ(s: SparkSession, d: String): DataFrame = {
    // o_orderdate reads as TIMESTAMP_NTZ; the session pins UTC, so the
    // NTZ→LTZ cast is micros-identical to DuckDB's epoch() of the file
    val daily = orders(s, d).groupBy(col("o_orderpriority").as("priority"),
        expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400")
          .as("day"))
      .agg(count(lit(1)).as("n"))
    Trend.interpolateLinear(daily, Seq("priority"), col("day"), col("n"))
  }

  /** q170: nucleus (top-p) vocabulary coverage — the minimal
    * frequency-ranked term prefix covering 95% of corpus tokens
    * ([[graft.operators.Tokenize.coverageCutoff]]); membership decided
    * entirely in Long arithmetic (cross-multiplied percentages), the
    * tokenizer-sizing question asked before fixing a vocab. */
  private def vocabCoverageQ(s: SparkSession, d: String): DataFrame =
    Tokenize.coverageCutoff(documents(s, d), split(col("text"), " "), 95L)

  /** q171: multi-touch conversion attribution
    * ([[graft.operators.Attribution.credits]]): purchases distribute
    * credit over the same user's click/view touchpoints in a 7-day
    * lookback under first/last/linear models at once; declared as the
    * per-(model, channel) roll-up — credit sums ride the round-4
    * aggregate lane, pair and credited-conversion counts stay exact. */
  private def attributionQ(s: SparkSession, d: String): DataFrame =
    Attribution.credits(events(s, d), col("user_id"), col("ts"),
        col("event_id"), col("event_type") === "purchase",
        col("event_type").isin("click", "view"), col("event_type"),
        expr("INTERVAL 7 DAYS"))
      .groupBy(col("model"), col("channel"))
      .agg(round(sum(col("credit")), 4).as("credit"),
        count(lit(1)).as("n_pairs"),
        countDistinct(when(col("credit") > 0, col("conversion_id")))
          .as("n_credited"))

  /** q172: autocorrelation function of the per-type daily event series
    * at lags 1–7 ([[graft.operators.Trend.acf]]) — the seasonality
    * diagnostic ahead of q159's decomposition. One window materializes
    * all lags, `stack` unpivots scan-side, one grouped `corr` per
    * (type, lag); moments accumulate → round-6 lane (q161's). */
  private def acfQ(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), expr("CAST(ts AS LONG) DIV 86400").as("day"))
      .agg(count(lit(1)).as("n"))
    Trend.acf(daily, Seq("event_type"), col("day"), col("n"), maxLag = 7)
  }

  /** q173: exact weighted median per return flag — the quantity below
    * which half the extended-price MONEY sits
    * ([[graft.operators.Profile.weightedMedian]], cents weights): the
    * crossing row is decided entirely in Long arithmetic, no float. */
  private def weightedMedianQ(s: SparkSession, d: String): DataFrame =
    Profile.weightedMedian(lineitem(s, d), Seq("l_returnflag"),
      col("l_quantity"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))

  /** q174: revenue-concentration audit per region — Gini (raw doubles:
    * Long-exact rank/mass sums, two divisions, q163 discipline) and HHI
    * (squared-share sum → round-6 lane) over supplier revenue cents
    * ([[graft.operators.Profile.concentration]]); dims broadcast. */
  private def concentrationQ(s: SparkSession, d: String): DataFrame = {
    val df = lineitem(s, d)
      .select(col("l_suppkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .join(broadcast(supplier(s, d).select(col("s_suppkey"),
        col("s_nationkey"))), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d).select(col("n_nationkey"),
        col("n_regionkey"))), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
    Profile.concentration(df, Seq("r_name"), col("l_suppkey"), col("cents"))
  }

  /** q175: triangle counting + local clustering coefficients over the
    * part co-purchase graph (parts sharing an order, the q166 basket
    * projection) — [[graft.operators.Graph.triangleStats]], the
    * degree-ordered-orientation bound: out-degree O(√m) even under
    * skew, each triangle closed exactly once, cc as a single division
    * of exact Longs (raw). */
  private def trianglesQ(s: SparkSession, d: String): DataFrame = {
    val bi = lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = bi.select(col("o"), col("p").as("p1"))
      .join(bi.select(col("o"), col("p").as("p2")), Seq("o"))
      .filter(col("p1") < col("p2"))
      .select(col("p1"), col("p2"))
    Graph.triangleStats(edges)
  }

  /** q176: RFM customer segmentation — recency/frequency/monetary
    * quintiles over per-customer order aggregates, bucket boundaries
    * from ONE exact-percentile aggregate broadcast back (the q121
    * bounds idiom — no global ranking window anywhere), segment
    * assignment as scan-side boundary comparisons on identical
    * interpolated doubles. Output is the segment cube: counts and exact
    * cent totals, avg as one division (raw). */
  private def rfmQ(s: SparkSession, d: String): DataFrame = {
    val day = expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400")
    val cents = expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    val cust = orders(s, d).groupBy(col("o_custkey"))
      .agg(max(day).as("last_day"), count(lit(1)).as("freq"),
        sum(cents).as("monetary"))
    val qs = array(lit(0.2), lit(0.4), lit(0.6), lit(0.8))
    val bounds = cust.agg(
      percentile(col("last_day"), qs).as("rb"),
      percentile(col("freq"), qs).as("fb"),
      percentile(col("monetary"), qs).as("mb"))
    def quintile(v: Column, b: Column): Column =
      (1 to 4).map(i => (v.cast("double") > element_at(b, i)).cast("long"))
        .foldLeft(lit(1L))(_ + _)
    cust.crossJoin(broadcast(bounds))
      .select(quintile(col("last_day"), col("rb")).as("r_q"),
        quintile(col("freq"), col("fb")).as("f_q"),
        quintile(col("monetary"), col("mb")).as("m_q"),
        col("monetary"))
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary")).as("total_cents"),
        (sum(col("monetary")).cast("double") /
          count(lit(1)).cast("double")).as("avg_cents"))
  }

  /** q177: gaps-and-islands — maximal runs of consecutive active days
    * per priority via the classic `day − row_number` constant-per-run
    * key: one key-partitioned window + one grouped collapse, all
    * integer. The calendar-run sibling of q156's value-pattern runs. */
  private def islandsQ(s: SparkSession, d: String): DataFrame = {
    val day = expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400")
    val daily = orders(s, d)
      .groupBy(col("o_orderpriority").as("priority"), day.as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("priority")).orderBy(col("day"))
    daily.withColumn("__grp", col("day") - row_number().over(w))
      .groupBy(col("priority"), col("__grp"))
      .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
        count(lit(1)).as("len_days"), sum(col("n")).as("n_orders"))
      .drop("__grp")
  }

  /** q178: time-weighted average event value per type
    * ([[graft.operators.Trend.timeWeightedAvg]]) — each observation
    * holds until the next, so irregular sampling can't bias the mean;
    * micros clock, (ts, event_id) tie-break, round-6 product sums. */
  private def twapQ(s: SparkSession, d: String): DataFrame =
    Trend.timeWeightedAvg(events(s, d), Seq("event_type"),
      unix_micros(col("ts")), col("value"), col("event_id"))

  /** q179: Cramér's V between event type and weekday
    * ([[graft.operators.Drift.cramersV]]) — the R×C independence screen
    * over the 35-cell contingency table; χ² rides the round-6 lane, V
    * derives from the ROUNDED χ² via correctly-rounded sqrt/division
    * (deterministic, no second lane). */
  private def cramersQ(s: SparkSession, d: String): DataFrame =
    Drift.cramersV(events(s, d), col("event_type"),
      expr("(CAST(ts AS LONG) DIV 86400) % 7"))

  /** q180: the drift monitor under freshness replay — three event
    * micro-batches (event_id mod 3) maintain the per-(dim, bin)
    * contingency mart through on-disk parquet state round-trips
    * (q106's [[graft.operators.Incremental]] aggregate/merge lifecycle,
    * O(mart + delta) per batch, facts never rescanned), then q167's
    * derived metrics run over the MAINTAINED counts
    * ([[graft.operators.Drift.stabilityFromCounts]]). The oracle is
    * q167's batch SQL verbatim — maintained-under-replay == recomputed
    * IS the freshness claim (the q162 posture, extended to the
    * data-quality tier). */
  private def driftReplayQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Incremental
    val dir = replayStateDir(s, "q180", d)
    val inA = col("ts") < to_timestamp(lit("2024-01-16"))
    val facts = events(s, d).select(col("event_id"),
        explode(array(
          struct(lit("event_type").as("dim"), col("event_type").as("bin")),
          struct(lit("value_band").as("dim"),
            floor(col("value") / lit(50.0)).cast("long").cast("string")
              .as("bin")))).as("db"),
        when(inA, 1L).otherwise(0L).as("a"))
      .select(col("event_id"), col("db.dim").as("dim"),
        col("db.bin").as("bin"), col("a"), (lit(1L) - col("a")).as("b"))
    val keys = Seq("dim", "bin")
    // carried-state fold (the q146/q162 idiom): versions still published,
    // intermediate parquet read-backs removed
    var carried: Option[DataFrame] = None
    (0 until 3).foreach { i =>
      val part = Incremental.aggregate(
        facts.filter(pmod(col("event_id"), lit(3)) === i), keys,
        Seq("a", "b"))
      val merged = (carried match {
        case None => part
        case Some(prev) =>
          Incremental.mergeAggregates(Seq(prev, part), keys, Seq("a", "b"))
      }).localCheckpoint()
      merged.write.mode("overwrite").parquet(s"$dir/state_$i")
      carried = Some(merged)
    }
    val state = s.read.parquet(s"$dir/state_2")
    val cols = Seq("dim", "bin", "n_a", "n_b", "p_a", "p_b",
      "psi_term", "chi2_term").map(col)
    def forDim(dim: String) = Drift.stabilityFromCounts(
        state.filter(col("dim") === dim)
          .select(col("bin"), col("sum_a").as("n_a"), col("sum_b").as("n_b")))
      .withColumn("dim", lit(dim)).select(cols: _*)
    forDim("event_type").unionAll(forDim("value_band"))
  }

  /** The q110 customer–supplier trade graph: distinct (customer, supplier)
    * order links on disjoint doubled ids (customer even, supplier odd) —
    * shared by the bounded-peel/SSSP/assortativity tier. */
  private def tradePairs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("sp"))
      .distinct()

  private def decodeNode(node: Column): Seq[Column] = Seq(
    when(node % 2 === 0, lit("customer")).otherwise(lit("supplier"))
      .as("node_type"),
    when(node % 2 === 0, node / lit(2L)).otherwise((node - lit(1L)) / lit(2L))
      .cast("long").as("entity_id"))

  /** q181: bounded 4-round 20-core peel over the trade graph
    * ([[graft.operators.Graph.kCore]]) — who remains when every thinly
    * connected entity is recursively stripped; the recursive-deletion
    * capability Spark SQL can't state, as explicit synchronous rounds
    * (the q110 bounded-iteration posture), oracle = the same 4 rounds
    * unrolled as SQL layers. All-integer degrees. */
  private def kcoreQ(s: SparkSession, d: String): DataFrame = {
    val pairs = tradePairs(s, d)
    val core = Graph.kCore(pairs, k = 20, rounds = 4)
    core.select(decodeNode(col("node")) :+ col("degree"): _*)
  }

  /** q182: bounded-hop weighted shortest paths over the trade graph
    * ([[graft.operators.Graph.ssspWeighted]]) — edge cost
    * `greatest(1, 10 − n_shared_orders)` (strong relationships are
    * cheap), Bellman-Ford rounds keeping exact BIGINT minima; 4 rounds
    * == the oracle's bounded recursive-CTE walk minimum by the
    * non-negative-weights argument in the scaladoc. `checkpointEvery=1`
    * (eager round-state materialization) is the r15 MEASURED choice on
    * this dense 4-hop graph — see ssspWeighted's scaladoc for the sf1
    * numbers; the frontier-delta messaging rides along exact and pays
    * for itself on high-diameter graphs. */
  private def ssspQ(s: SparkSession, d: String): DataFrame = {
    val weighted = orders(s, d)
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("sp"))
      .agg(countDistinct(col("o_orderkey")).as("n"))
      .withColumn("w", greatest(lit(1L), lit(10L) - col("n")))
    val edges = weighted.select(col("c").as("src"), col("sp").as("dst"), col("w"))
      .unionByName(weighted.select(col("sp").as("src"), col("c").as("dst"),
        col("w")))
      .localCheckpoint()
    val seeds = weighted.filter(col("c") <= 40).select(col("c").as("node"))
    Graph.ssspWeighted(edges, seeds, maxHops = 4, checkpointEvery = 1)
      .select(decodeNode(col("node")) :+ col("cost"): _*)
  }

  /** q183: sequential next-event rules over per-user timelines
    * ([[graft.operators.Mining.sequentialRules]]) — what immediately
    * follows what, the order-aware sibling of q166's basket rules: one
    * (ts, event_id)-ordered lead per user, vocabulary-sized antecedent
    * totals broadcast back, confidence one exact-Long division (raw). */
  private def seqRulesQ(s: SparkSession, d: String): DataFrame =
    Mining.sequentialRules(events(s, d), col("user_id"), col("ts"),
      col("event_id"), col("event_type"), minPairs = 5L)

  /** q184: A/B conversion readout with Wilson score intervals
    * ([[graft.operators.Experiment.abTest]]) — units are users (a user
    * converts once no matter how many purchases), variant from user-id
    * parity, z = 1.96; the oracle writes the identical expression dag
    * (z² spelled `1.96*1.96` so both engines square the same double),
    * bounds ride the round-6 lane. */
  private def abTestQ(s: SparkSession, d: String): DataFrame =
    Experiment.abTest(events(s, d), col("user_id"),
      when(pmod(col("user_id"), lit(2)) === 0, lit("control"))
        .otherwise(lit("treatment")),
      (col("event_type") === "purchase").cast("long"))

  /** q185: Theil–Sen robust trend of monthly order volume per priority
    * ([[graft.operators.Trend.theilSen]]) — the median pairwise slope
    * in integer micro-units via an explicit pmod floor division (so
    * Spark's truncating `div` and DuckDB's floor `//` agree on negative
    * slopes), lower-median VALUE selection: no float anywhere. Pairs
    * are month×month per priority — series-sized, partition-local. */
  private def theilSenQ(s: SparkSession, d: String): DataFrame = {
    val monthly = orders(s, d)
      .groupBy(col("o_orderpriority").as("priority"),
        expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)")
          .as("t"))
      .agg(count(lit(1)).as("v"))
    Trend.theilSen(monthly, Seq("priority"), col("t"), col("v"))
  }

  /** q186: degree assortativity of the trade graph
    * ([[graft.operators.Graph.degreeAssortativity]]) — do high-degree
    * entities link to each other or to the periphery (bipartite trade
    * graphs mix disassortatively); exact-Long moment sums, r as ONE
    * division of exact operands (raw, q163 discipline). */
  private def assortativityQ(s: SparkSession, d: String): DataFrame =
    Graph.degreeAssortativity(tradePairs(s, d))

  /** q187: exact phrase search over positional postings
    * ([[graft.operators.Bm25.phraseSearch]]) — "slow hash batch" as an
    * ADJACENT trigram, not a bag of terms: scan-side term-selective
    * postings, then k−1 co-keyed (doc, pos−i) probes; the oracle counts
    * the same trigram positions from DuckDB's list comprehension. */
  private def phraseSearchQ(s: SparkSession, d: String): DataFrame =
    Bm25.phraseSearch(documents(s, d), "doc_id", "text",
      Seq("slow", "hash", "batch"))

  /** q188: the rank-transform window surface — percent_rank, cume_dist,
    * ntile over a TOTAL order (value then key): ntile is row-number-
    * based and nondeterministic under ties, so the tie-break is part of
    * the declared semantics; percent_rank/cume_dist are then exact
    * integer-rank divisions (raw). One window, one shuffle. */
  private def rankSurfaceQ(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d).select(col("o_orderpriority").as("priority"),
      col("o_orderkey"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val w = Window.partitionBy(col("priority"))
      .orderBy(col("cents"), col("o_orderkey"))
    base.withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("tile", ntile(4).over(w).cast("long"))
  }

  /** q189: M4 downsampling of the per-type event-value series
    * ([[graft.operators.Trend.m4Downsample]]) — the error-free chart
    * reducer: 16 equal time bins × (first, last, min, max) in integer
    * cents; duplicate ticks pre-collapsed so first/last selection is
    * tie-free in both engines. */
  private def m4Q(s: SparkSession, d: String): DataFrame =
    Trend.m4Downsample(events(s, d), Seq("event_type"),
      expr("CAST(ts AS LONG)"),
      expr("CAST(round(value * 100) AS BIGINT)"), buckets = 16)

  /** q190: leave-one-out target encoding of event type against the
    * high-value label ([[graft.operators.Features.targetEncodeLoo]]) —
    * each row gets the OTHER rows' label mean (no self-leakage);
    * category stats broadcast back, facts never shuffled; one exact-
    * Long division per row (raw). */
  private def targetEncodeQ(s: SparkSession, d: String): DataFrame =
    Features.targetEncodeLoo(events(s, d), Seq("event_id"),
      col("event_type"), (col("value") > 100.0).cast("long"))

  /** q191: weight-of-evidence / information-value screen of the event
    * value band against conversion ([[graft.operators.Features.woeIv]])
    * — ½-smoothed cells, one grouped pass + one scalar fold; WOE and
    * IV terms ride the round-6 lane. */
  private def woeIvQ(s: SparkSession, d: String): DataFrame =
    Features.woeIv(events(s, d),
      floor(col("value") / lit(50.0)).cast("long").as("band"),
      (col("event_type") === "purchase").cast("long"))

  /** q192: Kaplan–Meier time-to-first-purchase per user-parity cohort
    * ([[graft.operators.Survival.kaplanMeier]]) — censoring-aware
    * survival: users without a purchase leave the risk set at their
    * last observed day instead of polluting a mean; the curve steps
    * ride an ordered log-sum window over the DAY GRID (round-6), risk
    * counts exact Longs. */
  private def kaplanMeierQ(s: SparkSession, d: String): DataFrame = {
    val day = expr("CAST(CAST(ts AS LONG) DIV 86400 AS BIGINT)")
    val perUser = events(s, d)
      .groupBy(col("user_id"),
        when(pmod(col("user_id"), lit(2)) === 0, lit("even"))
          .otherwise(lit("odd")).as("cohort"))
      .agg(min(day).as("d0"), max(day).as("d1"),
        min(when(col("event_type") === "purchase", day)).as("dp"))
    val subjects = perUser.select(col("cohort"),
      (coalesce(col("dp"), col("d1")) - col("d0")).as("dur"),
      col("dp").isNotNull.cast("long").as("ev"))
    Survival.kaplanMeier(subjects, Seq("cohort"), col("dur"), col("ev"))
  }

  /** q193: categorical distribution profile over the q180 dim/bin
    * explode ([[graft.operators.Profile.categoricalProfile]]) — mode
    * with the lexical tie-break PINNED (an unpinned mode is a flaky
    * gate), Shannon entropy + [0,1] normalization for the degenerate-
    * column screen; everything after the cell aggregate runs on the
    * vocabulary-sized frame. */
  private def catProfileQ(s: SparkSession, d: String): DataFrame = {
    val cells = events(s, d).select(explode(array(
        struct(lit("event_type").as("dim"), col("event_type").as("v")),
        struct(lit("value_band").as("dim"),
          floor(col("value") / lit(50.0)).cast("long").cast("string")
            .as("v")))).as("db"))
      .select(col("db.dim").as("dim"), col("db.v").as("v"))
    Profile.categoricalProfile(cells, col("dim"), col("v"))
  }

  /** q194: the WOE/IV feature screen under freshness replay — three
    * event micro-batches (event_id mod 3) maintain the (bin, n_pos,
    * n_neg) cell mart through on-disk parquet state round-trips (q106's
    * [[graft.operators.Incremental]] lifecycle: cells are LINEAR sums,
    * so maintained == recomputed bit-exactly), then q191's derivation
    * runs over the MAINTAINED cells
    * ([[graft.operators.Features.woeIvFromCells]]). The oracle is
    * q191's batch SQL verbatim — the q180 posture extended to the
    * feature tier. */
  private def woeIvReplayQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Incremental
    val dir = replayStateDir(s, "q194", d)
    val facts = events(s, d).select(col("event_id"),
      floor(col("value") / lit(50.0)).cast("long").as("bin"),
      (col("event_type") === "purchase").cast("long").as("pos"))
      .withColumn("neg", lit(1L) - col("pos"))
    val keys = Seq("bin")
    // carried-state fold (the q146/q162 idiom): versions still published,
    // intermediate parquet read-backs removed
    var state: Option[DataFrame] = None
    (0 until 3).foreach { i =>
      val part = Incremental.aggregate(
        facts.filter(pmod(col("event_id"), lit(3)) === i), keys,
        Seq("pos", "neg"))
      val merged = (state match {
        case None => part
        case Some(prev) => Incremental.mergeAggregates(
          Seq(prev, part), keys, Seq("pos", "neg"))
      }).localCheckpoint()
      merged.write.mode("overwrite").parquet(s"$dir/state_$i")
      state = Some(merged)
    }
    Features.woeIvFromCells(s.read.parquet(s"$dir/state_2")
      .select(col("bin"), col("sum_pos").as("n_pos"),
        col("sum_neg").as("n_neg")))
  }

  /** q195: mutual information between event type and weekday
    * ([[graft.operators.Drift.mutualInfo]]) — the information-theoretic
    * dependence measure over q179's exact contingency pair, plus the
    * min-entropy normalization; only OBSERVED cells contribute (the
    * x·ln x → 0 limit), logs ride the round-6 lane, nmi derives from
    * the rounded values (q179 discipline). */
  private def mutualInfoQ(s: SparkSession, d: String): DataFrame =
    Drift.mutualInfo(events(s, d), col("event_type"),
      expr("(CAST(ts AS LONG) DIV 86400) % 7"))

  /** q196: two-feature OLS per return flag
    * ([[graft.operators.Trend.ols2]]) — price ~ quantity + discount by
    * Cramer's rule over nine exact-Long sufficient statistics: the
    * one-pass distributed regression (facts reduce to one grouped
    * aggregate; the solve is scan-side on group rows). Betas round-6;
    * the oracle writes the identical determinant dag. */
  private def ols2Q(s: SparkSession, d: String): DataFrame =
    Trend.ols2(lineitem(s, d), Seq("l_returnflag"),
      col("l_quantity"),
      expr("CAST(round(l_discount * 100) AS BIGINT)"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))

  /** q197: consistent-hash rebalance audit
    * ([[graft.operators.Shard.rebalanceMatrix]]) — the (owner-before,
    * owner-after) movement matrix for growing the ring 8 → 9 nodes
    * (16 vnodes each): ring points and key hashes are SHA lanes, so
    * the oracle REBUILDS both rings from sha256 in SQL (the q25
    * hyperplane pattern); ownership is a scan-side sorted-array HOF,
    * zero joins, one grouped pass. Off-diagonal mass ≈ 1/9 — the
    * consistent-hashing claim, exact-counted. */
  private def consistentHashQ(s: SparkSession, d: String): DataFrame =
    Shard.rebalanceMatrix(documents(s, d),
      concat(lit("doc|"), col("doc_id").cast("string")),
      nodes = (0 until 8).map(i => s"n$i"), addedNodes = Seq("n8"),
      vnodesPerNode = 16)

  /** q198: equi-depth order-value histogram
    * ([[graft.operators.Profile.equiDepthHistogram]], 8 buckets) — the
    * optimizer-statistics form: quantile boundaries from ONE exact-
    * percentile aggregate broadcast back (dyadic fractions, exact
    * doubles), scan-side bucket comparisons, no global sort/NTILE. */
  private def equiDepthQ(s: SparkSession, d: String): DataFrame =
    Profile.equiDepthHistogram(orders(s, d),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)"), buckets = 8)

  /** q199: conversion-latency quantiles per user-parity cohort — the
    * time-to-convert distribution (first view → first purchase, users
    * with purchase-before-view or no purchase excluded): one per-user
    * grouped pass, then a cohort-sized exact-percentile aggregate
    * (q37's round-4 quantile lane). EXACT `percentile` here buffers
    * every per-user gap in one buffer per cohort — the oracle-matchable
    * choice; at 100 TB (billions of converting users) swap the final
    * aggregate for [[graft.operators.Sketch.quantilesApprox]] over the
    * same perUser frame (mergeable summary, rank error ≤ n/accuracy —
    * the documented scale lane, PropertySpec-bounded). */
  private def convLatencyQ(s: SparkSession, d: String): DataFrame = {
    val t = expr("CAST(ts AS LONG)")
    val perUser = events(s, d)
      .groupBy(col("user_id"),
        when(pmod(col("user_id"), lit(2)) === 0, lit("even"))
          .otherwise(lit("odd")).as("cohort"))
      .agg(min(when(col("event_type") === "view", t)).as("fv"),
        min(when(col("event_type") === "purchase", t)).as("fp"))
      .filter(col("fv").isNotNull && col("fp").isNotNull &&
        col("fp") >= col("fv"))
      .select(col("cohort"), (col("fp") - col("fv")).as("gap"))
    perUser.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_converted"),
        round(percentile(col("gap"), lit(0.5)), 4).as("p50_s"),
        round(percentile(col("gap"), lit(0.9)), 4).as("p90_s"))
  }

  /** q200: the M4 dashboard mart under freshness replay — a FIXED
    * January-2024 viewport (dashboard contract: bins can't move when
    * data arrives) maintained through three event micro-batches: the
    * per-tick cell grid is MERGEABLE state (counts sum, tick min/max
    * re-min/max — [[graft.operators.Incremental]]'s mins/maxs path),
    * so maintained == recomputed bit-exactly and q189's derivation
    * ([[graft.operators.Trend.m4FromTicks]]) runs over the maintained
    * mart. The q180/q194 posture extended to min/max-shaped state. */
  private def m4ReplayQ(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Incremental
    val dir = replayStateDir(s, "q200", d)
    val T0 = 1704067200L // epoch '2024-01-01'
    val T1 = 1706745599L // epoch '2024-02-01' - 1
    val facts = events(s, d)
      .select(col("event_id"), col("event_type"),
        expr("CAST(ts AS LONG)").as("__t"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .filter(col("__t").between(T0, T1))
      .withColumn("bin", expr(s"((__t - ${T0}L) * 16L) div ${T1 - T0 + 1}L"))
    val keys = Seq("event_type", "bin", "__t")
    // carried-state fold (the q146/q162 idiom): versions still published,
    // intermediate parquet read-backs removed
    var state: Option[DataFrame] = None
    (0 until 3).foreach { i =>
      val part = Incremental.aggregate(
        facts.filter(pmod(col("event_id"), lit(3)) === i), keys,
        sums = Nil, mins = Seq("v"), maxs = Seq("v"))
      val merged = (state match {
        case None => part
        case Some(prev) => Incremental.mergeAggregates(
          Seq(prev, part), keys, sums = Nil, mins = Seq("v"), maxs = Seq("v"))
      }).localCheckpoint()
      merged.write.mode("overwrite").parquet(s"$dir/state_$i")
      state = Some(merged)
    }
    Trend.m4FromTicks(
      s.read.parquet(s"$dir/state_2").select(col("event_type"), col("bin"),
        col("__t"), col("n").as("__c"), col("min_v").as("__lo"),
        col("max_v").as("__hi")),
      Seq("event_type"))
  }

  /** q201: calibration/reliability report with ECE terms
    * ([[graft.operators.Features.calibration]]) — is the (clamped)
    * value-derived score an honest probability of conversion: 10
    * scan-side bins, one grouped pass, one scalar fold; score sums
    * accumulate → round-6 lane. Σ ece_term is the model's ECE. */
  private def calibrationQ(s: SparkSession, d: String): DataFrame =
    Features.calibration(events(s, d),
      least(col("value"), lit(500.0)) / lit(500.0),
      (col("event_type") === "purchase").cast("long"), buckets = 10)

  /** The q202 value-band "auto-labeler": a deterministic rule rater
    * sharing the event-type vocabulary, so the kappa diagonal is
    * meaningful. Double comparisons on identical parquet bits. */
  private def valueBandRater: Column =
    when(col("value") < 25.0, lit("view"))
      .when(col("value") < 50.0, lit("click"))
      .when(col("value") < 75.0, lit("signup"))
      .when(col("value") < 100.0, lit("error"))
      .otherwise(lit("purchase"))

  /** q202: Cohen's kappa between the declared event label and the
    * value-band auto-labeler ([[graft.operators.Experiment.cohensKappa]])
    * — chance-corrected label agreement, the label-quality screen run
    * before trusting machine labels. The synthetic fixture's value is
    * independent of event_type, so κ reads ≈ 0 while raw agreement p_o
    * reads ≈ 0.2 — exactly the inflation the chance correction exists
    * to remove; FeaturesSpec-style hand fixtures in ExperimentSpec
    * cover the high-agreement path. */
  private def kappaQ(s: SparkSession, d: String): DataFrame =
    Experiment.cohensKappa(events(s, d), col("event_type"), valueBandRater)

  /** q203: leakage-safe group k-fold assignment
    * ([[graft.operators.Curate.groupKFold]]) — every event of a user
    * lands in the same CV fold because the fold is a pure SHA-lane
    * function of the user id (scan-side, zero shuffles for the
    * assignment itself); the declared result is the fold census
    * (n_groups, n_rows per fold), the split report a training pipeline
    * logs. The oracle rebuilds every lane from sha256. */
  private def groupKFoldQ(s: SparkSession, d: String): DataFrame =
    Curate.groupKFold(events(s, d), col("user_id"), k = 5)
      .groupBy(col("fold"))
      .agg(count_distinct(col("user_id")).as("n_groups"),
        count(lit(1)).as("n_rows"))

  /** q204: Jensen–Shannon divergence between the even- and odd-user
    * event-type distributions ([[graft.operators.Drift.jensenShannon]])
    * — the bounded symmetric drift score (≤ ln 2, defined on partial
    * support where PSI blows up); one 2×K cell aggregate, single-row
    * totals broadcast back, log accumulation → round-6 lane. */
  private def jsdQ(s: SparkSession, d: String): DataFrame =
    Drift.jensenShannon(events(s, d),
      pmod(col("user_id"), lit(2)) === 0, col("event_type"))

  /** q205: Chao1 vocabulary-richness estimate over the documents corpus
    * ([[graft.operators.Tokenize.chao1Richness]]) — observed types plus
    * the singleton/doubleton unseen-mass estimate (bias-corrected form);
    * one token-count aggregate, one single-row fold, one exact-integer
    * division (raw). */
  private def chao1Q(s: SparkSession, d: String): DataFrame =
    Tokenize.chao1Richness(documents(s, d), Text.tokens(col("text")))

  /** q206: two-sample Kolmogorov–Smirnov D between urgent
    * (1-URGENT/2-HIGH) and other orders' price distributions in exact
    * cents ([[graft.operators.Drift.ksStatistic]]) — the bin-free
    * distribution compare; the ECDF prefix is the q170 bucketed
    * two-phase distributed prefix (no partition-less window), the
    * argmax decided in cross-multiplied Longs, D one exact division. */
  private def ksQ(s: SparkSession, d: String): DataFrame =
    Drift.ksStatistic(orders(s, d),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH"))

  /** q207: per-document n-gram repetition profile
    * ([[graft.operators.Tokenize.repetitionStats]], trigrams) — the
    * Gopher/C4 repetitious-text quality filter as ONE scan-side
    * projection: n-gram HOF, array_sort, run-length fold; zero
    * shuffles/joins, O(L log L) per doc in its own length. */
  private def repetitionQ(s: SparkSession, d: String): DataFrame =
    Tokenize.repetitionStats(documents(s, d), "doc_id", "text", n = 3)

  /** q208: Zipf slope of the corpus frequency head
    * ([[graft.operators.Tokenize.zipfSlope]], top 100 types) — the
    * naturalness screen: OLS of ln cnt on ln rank via five sufficient
    * statistics over the bucketed two-phase ranking (q170's prefix, no
    * partition-less window); sums round-6, slope/intercept derived from
    * the rounded operands (q179 discipline). */
  private def zipfQ(s: SparkSession, d: String): DataFrame =
    Tokenize.zipfSlope(documents(s, d), Text.tokens(col("text")), topK = 100)

  /** q209: asymmetric shingle containment pairs
    * ([[graft.operators.Dedup.containmentPairs]], bigrams, ≥ 0.6 in
    * either direction) — the subset-duplication screen Jaccard misses
    * (a short doc quoted inside a long one): q15's inverted-index shape
    * with directional |A∩B|/|A| scoring, counts broadcast back. */
  private def containmentQ(s: SparkSession, d: String): DataFrame =
    Dedup.containmentPairs(
      documents(s, d).filter(col("doc_id") < 1000), "doc_id", "text",
      n = 2, threshold = 0.6)

  /** q210: replay-maintained KMV distinct-count state — the freshness
    * posture (q180 sums, q194 WOE cells, q200 min/max) extended to a
    * FOURTH state shape: bounded ORDER STATISTICS. Three document
    * micro-batches fold per-lang token-lane sets through
    * [[graft.operators.Sketch.kmvTruncate]] (≤ k rows per lang
    * persisted per version); k-minima are exact under merge-truncate,
    * so the maintained state's readout
    * ([[graft.operators.Sketch.kmvEstimateFromState]]) equals the
    * whole-corpus batch sketch BIT-EXACTLY — the oracle is q40's batch
    * KMV SQL verbatim. Per batch: the delta's lanes plus a ≤ k-row
    * state read; history never rescanned. */
  private def kmvReplayQ(s: SparkSession, d: String): DataFrame = {
    val dir = replayStateDir(s, "q210", d)
    // carried-state fold (the q146/q162 idiom): versions still published,
    // intermediate parquet read-backs removed
    var state: Option[DataFrame] = None
    (0 until 3).foreach { i =>
      val batch = documents(s, d)
        .filter(pmod(col("doc_id"), lit(3)) === i)
        .select(col("lang"), explode(Text.tokens(col("text"))).as("token"))
        .select(col("lang"), Sketch.shaLane(col("token")).as("lane"))
      val merged = state match {
        case None => batch
        case Some(prev) => prev.unionByName(batch)
      }
      val truncated = Sketch.kmvTruncate(merged, Seq("lang"), k = 256)
        .coalesce(1).localCheckpoint()
      truncated.write.mode("overwrite").parquet(s"$dir/state_$i")
      state = Some(truncated)
    }
    Sketch.kmvEstimateFromState(s.read.parquet(s"$dir/state_2"),
      Seq("lang"), k = 256)
  }

  /** q211: MAD-based robust outliers per event type
    * ([[graft.operators.Trend.robustOutliers]], modified z > 3.5) — the
    * Iglewicz–Hoaglin screen with a 50% breakdown point, vs the mean/
    * stddev signal's masking under heavy contamination; two grouped
    * exact-percentile passes, group-sized stats broadcast back, fact
    * table never shuffled. */
  private def robustOutliersQ(s: SparkSession, d: String): DataFrame =
    Trend.robustOutliers(events(s, d), Seq("event_type"), col("event_id"),
      expr("CAST(round(value * 100) AS BIGINT)"), threshold = 3.5)

  /** q213: one-step SCD-1 CHANGE FEED over the MAUDE ingest state
    * ([[graft.streaming.Streams.scd1ChangeFeed]] — the Snowflake STREAM /
    * Delta CDF analog, the change-tracking primitive of the reference's
    * own platform): q140's 3-drop replay runs the production
    * parse→stage→merge chain, then the feed reports exactly what the
    * LAST batch changed — op + before/after images per key — derived
    * from the bucket-versioned state's own retention (the base version
    * a merge read survives until superseded, so the one-step diff needs
    * no extra bookkeeping). Keys repeat across drops by construction,
    * so updates are the bulk; a key whose carried-forward row is
    * untouched emits nothing. The oracle derives the same feed straight
    * from the base columns: winner among drops {0,1} vs winner among
    * {0,1,2} per key — different (or newly appearing) winner IS the
    * change row. Scale: the feed reads only the buckets the batch
    * wrote, one key-partitioned full-outer diff — O(touched), never
    * the full state. The chain runs over the session-shared
    * [[MaudeFixture.cdcState]] (built once per JVM by the same
    * production merges); the feed itself is derived LIVE here. */
  private def changeFeedQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Streams
    val stateDir = MaudeFixture.cdcState(s, d)
    Streams.scd1ChangeFeed(s, stateDir, batchId = 2L, Seq("mdr_report_key"))
      .select(col("mdr_report_key"), col("op"),
        col("before.event_type").as("before_event_type"),
        col("before.seq").as("before_seq"),
        col("after.event_type").as("after_event_type"),
        col("after.seq").as("after_seq"))
  }

  /** q214: SCD-2 snapshot history over the MAUDE ingest — dbt's own
    * `snapshot` capability ([[graft.streaming.Streams.scd2Fold]];
    * the reference IS a dbt project, and snapshots are dbt's mechanism
    * for keeping history over a mutable source, `strategy='check'`):
    * each replayed drop's [[graft.streaming.Streams.scd1ChangeFeed]]
    * folds into a validity-interval table — changed keys close their
    * current row at the batch id (half-open [from, to)) and open the
    * after-image as the new current row; silent keys carry forward.
    * The history is carried across batches as a localCheckpoint (the
    * q146 idiom). The oracle derives the same intervals flat: per key,
    * the keep-latest winner as of each drop, consecutive equal winners
    * collapsed into segments, `lead(valid_from)` as each segment's
    * close. Scale: per batch one delta-sized key join against the
    * history + a feed-sized union; history grows by changed keys only.
    * The merge chain and per-batch feeds come from the session-shared
    * [[MaudeFixture.cdcState]] (each feed derived immediately after its
    * merge — when the retention contract guarantees it readable — and
    * persisted once); what this query runs per invocation is the SCD-2
    * fold itself. */
  private def scd2SnapshotQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Streams
    var hist: Option[DataFrame] = None
    (0 until 3).foreach { i =>
      val feed = MaudeFixture.cdcFeed(s, d, i)
      val prev = hist.getOrElse {
        val dataCols = feed.select(col("after.*")).columns.toSeq
        feed.limit(0).select(Seq(col("mdr_report_key")) ++
          dataCols.map(c => col(s"after.$c").as(c)) ++
          Seq(lit(0L).as("valid_from"),
            lit(null).cast("long").as("valid_to")): _*)
      }
      hist = Some(Streams.scd2Fold(prev, feed, i.toLong,
        Seq("mdr_report_key")).localCheckpoint())
    }
    hist.get.select(col("mdr_report_key"), col("seq"), col("event_type"),
      col("valid_from"), col("valid_to"),
      col("valid_to").isNull.as("is_current"))
  }

  /** q217: AS-OF read over the SCD-2 snapshot — time travel
    * ([[graft.streaming.Streams.scd2AsOf]]; Snowflake `AT(...)`, Delta
    * `VERSION AS OF` — the CONSUMER side of the snapshot tier, what
    * every dbt-snapshot downstream mart joins against): the q214
    * history folded through ALL THREE drops, read back as of the END
    * of drop 1 — one partition-prunable interval filter, no join, no
    * window. Folding the third drop matters to the GATE (ADVICE r13):
    * with history stopping at drop 1 the as-of read degenerates to the
    * current state, and a regression to a plain `valid_to IS NULL`
    * filter would pass; with drop 2 folded, every key drop 2 rewrote
    * carries a closed row the as-of read must select OVER the current
    * one — the oracle (keep-latest winner among drops {0,1}, a PAST
    * state no current-state read can produce) now distinguishes
    * genuine time travel. Scale: the filter prunes to intervals
    * covering t; partition the snapshot by `valid_to IS NULL` and
    * current-reads never touch closed history. */
  private def scd2AsOfQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Streams
    var hist: Option[DataFrame] = None
    (0 until 3).foreach { i =>
      val feed = MaudeFixture.cdcFeed(s, d, i)
      val prev = hist.getOrElse {
        val dataCols = feed.select(col("after.*")).columns.toSeq
        feed.limit(0).select(Seq(col("mdr_report_key")) ++
          dataCols.map(c => col(s"after.$c").as(c)) ++
          Seq(lit(0L).as("valid_from"),
            lit(null).cast("long").as("valid_to")): _*)
      }
      hist = Some(Streams.scd2Fold(prev, feed, i.toLong,
        Seq("mdr_report_key")).localCheckpoint())
    }
    Streams.scd2AsOf(hist.get, asOfBatch = 1L)
      .select(col("mdr_report_key"), col("seq"), col("event_type"))
  }

  /** q218: GENUINE Structured Streaming execution in the declared
    * surface (VERDICT r14 #5 — the replay tier simulates micro-batches
    * batch-side; this query runs the real thing): `readStream` over the
    * session-shared MAUDE landing NDJSON → `Trigger.AvailableNow`
    * catch-up → the PRODUCTION [[graft.streaming.Streams.incrementalScd1]]
    * writer, whose foreachBatch stages each raw micro-batch through
    * [[MaudeFixture.stageFull]] (the exact q140 parse/staging) and
    * merges it via the bucket-partial `scd1MergeBatch`. The file source
    * is capped at `maxFilesPerTrigger` = max(1, ⌊files/3⌋) so the
    * catch-up runs as ≥3 genuine micro-batches whenever ≥3 files landed
    * (r15 ADVICE: the previous ⌈files/3⌉ cap yields only 2 batches for
    * 4 files — ceil(n/ceil(n/3)) = 2 at n∈{2,4}; with the floor,
    * ceil(n/⌊n/3⌋) ≥ 3 for every n ≥ 3), checkpointed offsets and
    * separate foreachBatch invocations — the batch split differs from q140's
    * time-sliced drops, which is the POINT: the merged state is
    * split-invariant (per key the max-`seq` report wins regardless of
    * which micro-batch carried it), so the ORACLE IS q140's one-shot
    * SQL verbatim — stream fold == batch fold == one-shot merge, the
    * full `target_lag` freshness statement (reference README.md:83,117)
    * executed through the real streaming engine. Scale: each micro-batch
    * shuffles its file-capped delta plus touched state buckets; the cap
    * is what keeps a 100 TB backlog catch-up a sequence of bounded
    * merges instead of one full-backlog shuffle. */
  private def streamIngestQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Streams
    import graft.sources.MaudeIngest
    val dir = replayStateDir(s, "q218", d)
    val stateDir = s"$dir/state"
    val landing = MaudeFixture.landing(s, d)
    // count landing data files (driver-side metadata listing, bounded
    // by the fixture's drop layout) to size ~3 catch-up micro-batches
    val lp = new org.apache.hadoop.fs.Path(landing)
    val fs = lp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(lp, true)
    var nFiles = 0
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) nFiles += 1
    }
    val perTrigger = math.max(1, nFiles / 3)
    val q = Streams.incrementalScd1(
        MaudeIngest.stream(s, landing, Some(perTrigger)),
        Seq("mdr_report_key"), Seq("seq"), stateDir, nBuckets = 16,
        stage = MaudeFixture.stageFull)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/_ckpt")
      .start()
    q.awaitTermination()
    Streams.readScd1Raw(s, stateDir)
      .select(col("mdr_report_key"), col("report_number"),
        date_format(col("date_received"), "yyyy-MM-dd").as("date_received"),
        col("event_type"), col("product_code"),
        col("manufacturer_name"), col("brand_name"), col("narrative_len"),
        col("seq"))
  }

  /** q215: SCD HARD-DELETE — dbt snapshot's `invalidate_hard_deletes`,
    * completing the reference-toolchain semantic the q213/q214 pair
    * left unexercised (keep-latest merges retain tombstones, so their
    * feeds never emit `op = delete`). The user changelog merges in one
    * batch (tombstones retained, the late-data ordering contract); a
    * [[graft.streaming.Streams.scd1PurgeBatch]] retention batch then
    * PHYSICALLY removes the tombstoned keys, whose one-step
    * [[graft.streaming.Streams.scd1ChangeFeed]] reports them as genuine
    * deletes (key absent after, before = the tombstone image); folding
    * both feeds through [[graft.streaming.Streams.scd2Fold]] closes
    * those keys' intervals at the purge batch WITHOUT reopening — the
    * closed-forever history rows. Oracle: keep-latest winner per user
    * flat, interval [0, 1) where the winner is a tombstone, [0, ∞)
    * otherwise. Scale: the purge rewrites only tombstone-bearing
    * buckets (column-pruned discovery), the feed reads only what the
    * purge wrote, the fold joins history against the delta's keys.
    * The upstream merge state + batch-0 feed come from the
    * session-shared [[MaudeFixture.userScdState]] (built once per JVM);
    * the purge — idempotent by the strictly-below-base contract, so
    * replaying it against the shared state is sound — and everything
    * downstream of it runs per invocation: exactly the hard-delete
    * lifecycle under measurement. */
  private def scdHardDeleteQ(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.Streams
    val keys = Seq("user_id")
    val dir = MaudeFixture.userScdState(s, d)(userChangelog(s, d))
    val feed0 = MaudeFixture.userFeed0(s, d)
    Streams.scd1PurgeBatch(s, dir, 1L, keys, "op", "D",
      nBuckets = MaudeFixture.UserStateBuckets)
    val feed1 = Streams.scd1ChangeFeed(s, dir, 1L, keys)
    val dataCols = feed0.select(col("after.*")).columns.toSeq
    val genesis = feed0.limit(0).select(Seq(col("user_id")) ++
      dataCols.map(c => col(s"after.$c").as(c)) ++
      Seq(lit(0L).as("valid_from"),
        lit(null).cast("long").as("valid_to")): _*)
    val hist = Streams.scd2Fold(
      Streams.scd2Fold(genesis, feed0, 0L, keys), feed1, 1L, keys)
    hist.select(col("user_id"), col("state").as("last_type"),
      col("us").as("last_us"), col("event_id").as("last_event_id"),
      col("op"), col("valid_from"), col("valid_to"),
      col("valid_to").isNull.as("is_current"))
  }

  /** q216: partition-scoped incremental publish
    * ([[graft.sinks.Publish.filesPartitionOverwrite]] — the Delta
    * `replaceWhere` analog, SURVEY §4's identical-rebuild avoidance):
    * the quarterly revenue mart, partitioned by order year, publishes
    * in full as of a 1997-01-01 cutoff, then a late batch (the
    * remaining orders) refreshes ONLY the years it touches — touched
    * years come from the DELTA (a bounded distinct over its year
    * column, ≤ the calendar, collected like every metadata scalar
    * here), the source re-read is year-pruned at the scan, and the
    * dynamic-partition overwrite replaces just those partition dirs.
    * The declared result reads the published mart back through a fresh
    * scan; the oracle computes the same mart flat from all orders —
    * incremental partition refresh == full rebuild is the operator's
    * correctness identity, and PublishSpec pins the physical claim
    * (untouched years' files byte-identical, touched years rewritten). */
  private def partitionPublishQ(s: SparkSession, d: String): DataFrame = {
    import graft.sinks.Publish
    val dir = s"${replayStateDir(s, "q216", d)}/mart"
    val cut = lit("1997-01-01").cast("timestamp")
    def counts(src: DataFrame): DataFrame = src
      .select(year(col("o_orderdate")).as("o_year"),
        quarter(col("o_orderdate")).as("o_q"), col("o_totalprice"))
      .groupBy(col("o_year"), col("o_q"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("revenue"))
    Publish.files(counts(orders(s, d).filter(col("o_orderdate") < cut)),
      dir, partitionCols = Seq("o_year"))
    val delta = orders(s, d).filter(col("o_orderdate") >= cut)
    val touchedYears = delta.select(year(col("o_orderdate")).as("y"))
      .distinct().collect().map(_.getInt(0)).sorted
    // the year-scoped re-read rides [[Publish.touchedYearFilter]] — the
    // shared pushable-range + year-membership predicate PlanSpec pins —
    // and an EMPTY delta skips the refresh entirely (nothing touched ⇒
    // nothing republished; the pre-guard `.min` threw — ADVICE r14)
    if (touchedYears.nonEmpty) {
      val refreshed = counts(orders(s, d).filter(
        Publish.touchedYearFilter(col("o_orderdate"), touchedYears.toSeq)))
      Publish.filesPartitionOverwrite(refreshed, dir, Seq("o_year"))
    }
    // partition values read back as the inferred partition type — cast
    // to the mart's declared BIGINT grain for the cross-engine compare
    s.read.parquet(dir).select(col("o_year").cast("long").as("o_year"),
      col("o_q").cast("long").as("o_q"), col("n_orders"), col("revenue"))
  }

  /** q212's fixed publication location — a constant because the oracle's
    * `read_parquet()` path must be a literal in the static SQL. */
  private val InteropPublishDir = "/tmp/graft_publish_interop"

  /** q212: dual-engine publication interop — the EXECUTABLE stand-in for
    * the env-blocked Iceberg/REST-catalog leg (reference README.md:121-124
    * Iceberg publication, README.md:141 "same table readable in ≥2
    * engines"; SURVEY §2.1 S6 status in [[graft.sinks.Publish]]). A
    * deterministic AI-enriched mart ([[graft.operators.HeuristicEnricher]]
    * over a synthesized 20k-row incident corpus — sf-INDEPENDENT by
    * design, so bench/verify runs at different scales rewrite identical
    * bytes and the gate can never race itself) is PUBLISHED as a
    * topic-partitioned parquet table ([[graft.sinks.Publish.files]], the
    * same writer `Publish.table` wraps with a catalog registration), then
    * read BACK through a fresh scan, and the query emits a value-level
    * content digest: exact row count, exact severity total, and a
    * `bit_xor` fold of the 60-bit SHA lane over every row's full column
    * tuple (order-independent, so file/partition layout cannot matter).
    * The oracle computes THE SAME digest in DuckDB — not from the source
    * tables but from `read_parquet(..., hive_partitioning)` over the
    * published files themselves — so hash_match asserts both engines
    * decode identical content (including the hive-encoded partition
    * column) from one physical table: the interop SLO's substance,
    * minus only the catalog protocol. */
  private def publishInteropQ(s: SparkSession, d: String): DataFrame = {
    val id = col("id")
    def cyc(xs: Seq[String]) =
      element_at(typedlit(xs), (pmod(id, lit(xs.size)) + 1).cast("int"))
    val kw = Seq(
      "battery power drain observed during routine check",
      "software error code displayed on console",
      "lead wire fracture noted at connector",
      "pump occlusion alarm triggered repeatedly",
      "routine maintenance completed without incident")
    val outcome = Seq("patient death reported", "injury with hospital admission",
      "device replaced, no harm", "no adverse outcome noted")
    // lengths span ~90..330 chars so the >200 summary-truncation branch
    // (with its multi-byte ellipsis) is part of the published content
    val text = concat(format_string("Case %d: ", id), cyc(kw), lit("; "),
      cyc(outcome), lit(". "),
      repeat(lit("extra detail segment "), pmod(id, lit(12)).cast("int")))
    val enriched = graft.operators.HeuristicEnricher(
        s.range(20000).select(id.as("doc_id"), text.as("text")), "text")
      .select(col("doc_id"), col("topic"),
        col("severity").cast("long").as("severity"), col("summary"))
    // ATOMIC-SWAP publish (ADVICE r12): Spark's overwrite is
    // delete-then-write, so writing the fixed dir directly would leave a
    // seconds-wide window where a concurrent reader (another bench/
    // verify process, or the DuckDB oracle) sees a partial table. Stage
    // into a pid-unique sibling, then swap: the unreadable window
    // shrinks to one delete + one local-FS rename (and since the content
    // is deterministic and sf-independent, any loser of a concurrent
    // swap re-installs byte-identical files anyway).
    val tmp = s"$InteropPublishDir.tmp_${ProcessHandle.current().pid()}"
    graft.sinks.Publish.files(enriched, tmp, partitionCols = Seq("topic"))
    // java.nio ATOMIC_MOVE, not Hadoop rename: RawLocalFileSystem's
    // rename into an EXISTING directory falls back to copying the
    // source INSIDE it (and returns true), which would nest the tmp
    // dir under the published table on a lost race instead of failing.
    // ATOMIC_MOVE throws when the destination exists — the loser
    // deletes its staging dir (the winner's content is byte-identical
    // by construction, so losing is harmless). Local-FS paths only
    // (InteropPublishDir is a /tmp literal the oracle SQL reads).
    val hp = new org.apache.hadoop.fs.Path(InteropPublishDir)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) { fs.delete(hp, true); () }
    try
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(InteropPublishDir),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileSystemException =>
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
    val back = s.read.parquet(InteropPublishDir)
    back.select(graft.functions.ShaLanes.lane(concat_ws("|",
          col("doc_id").cast("string"), col("topic"),
          col("severity").cast("string"), col("summary"))).as("__lane"),
        col("severity"))
      .agg(count(lit(1)).as("n_rows"), sum(col("severity")).as("sum_severity"),
        expr("bit_xor(__lane)").as("content_xor"))
  }

  /** q219's fixed publication location — a constant because the oracle's
    * `read_parquet()` path must be a literal in the static SQL. */
  private val EvolutionPublishDir = "/tmp/graft_publish_evolution"

  /** q219: schema-evolution round-trip across both engines (VERDICT r15
    * #6 — the Iceberg-adjacent risk the env-block hides is READER-side
    * schema drift, and it is executable in-sandbox with q212's
    * dual-engine rig): the same table is published TWICE — version 1 by
    * the "old writer" (doc_id, topic, severity, summary), version 2 by
    * the evolved writer with an added NULLABLE `review_flag` column
    * (itself null on low-severity rows, so null-vs-absent is part of
    * the content) — and the whole table is then read back through each
    * engine's schema-merging reader: Spark `mergeSchema` null-fills the
    * pre-evolution files, DuckDB `union_by_name` does the same over the
    * identical physical files. The query emits ONE digest row PER
    * VERSION (count, severity total, order-independent bit_xor of the
    * 60-bit SHA lane over the full evolved tuple, absent column read as
    * '-'), so hash_match pins BOTH the pre- and post-evolution reads in
    * both engines — old files must gain the column as NULL, new files
    * must round-trip their values, in the same scan. Content is
    * sf-independent and deterministic (same atomic-swap publish as
    * q212) so concurrent runs rewrite identical bytes. Scale: schema
    * evolution is metadata-only — no rewrite of the 100 TB of
    * pre-evolution files is ever required, which is exactly the
    * property this gate asserts survives two engines' readers. */
  private def publishEvolutionQ(s: SparkSession, d: String): DataFrame = {
    val id = col("id")
    def cyc(xs: Seq[String]) =
      element_at(typedlit(xs), (pmod(id, lit(xs.size)) + 1).cast("int"))
    val kw = Seq(
      "battery power drain observed during routine check",
      "software error code displayed on console",
      "lead wire fracture noted at connector",
      "pump occlusion alarm triggered repeatedly",
      "routine maintenance completed without incident")
    val outcome = Seq("patient death reported", "injury with hospital admission",
      "device replaced, no harm", "no adverse outcome noted")
    val text = concat(format_string("Case %d: ", id), cyc(kw), lit("; "),
      cyc(outcome), lit(". "),
      repeat(lit("extra detail segment "), pmod(id, lit(12)).cast("int")))
    val enriched = graft.operators.HeuristicEnricher(
        s.range(12000).select(id.as("doc_id"), text.as("text")), "text")
      .select(col("doc_id"), col("topic"),
        col("severity").cast("long").as("severity"), col("summary"))
    // version 1: the old writer's schema, verbatim
    val v1 = enriched.filter(col("doc_id") < 6000)
    // version 2: the evolved writer — review_flag added, NULL where the
    // heuristic severity stays low (null values inside the new column,
    // distinct from the column being ABSENT in v1's files)
    val v2 = enriched.filter(col("doc_id") >= 6000)
      .withColumn("review_flag",
        when(col("severity") >= 3, concat(lit("sev"), col("severity")))
          .otherwise(lit(null).cast("string")))
    // atomic-swap publish (q212's pattern and rationale, verbatim):
    // stage pid-unique, one delete + one ATOMIC_MOVE installs both
    // versions' files — a concurrent reader never sees a half-evolved
    // table, and a lost race re-installs byte-identical content
    val tmp = s"$EvolutionPublishDir.tmp_${ProcessHandle.current().pid()}"
    v1.coalesce(2).write.mode("overwrite").parquet(s"$tmp/v=1")
    v2.coalesce(2).write.mode("overwrite").parquet(s"$tmp/v=2")
    val hp = new org.apache.hadoop.fs.Path(EvolutionPublishDir)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) { fs.delete(hp, true); () }
    try
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp),
        java.nio.file.Paths.get(EvolutionPublishDir),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileSystemException =>
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
    // the schema-merging read: v1 rows MUST surface review_flag as NULL
    val back = s.read.option("mergeSchema", "true")
      .parquet(EvolutionPublishDir)
    back.select(col("v").cast("long").as("v"),
        graft.functions.ShaLanes.lane(concat_ws("|",
          col("doc_id").cast("string"), col("topic"),
          col("severity").cast("string"),
          coalesce(col("review_flag"), lit("-")),
          col("summary"))).as("__lane"),
        col("severity"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("severity")).as("sum_severity"),
        expr("bit_xor(__lane)").as("content_xor"))
  }

  /** q134: batch small-file compaction ([[graft.sinks.Publish.compact]] —
    * the lakehouse OPTIMIZE maintenance operator, the batch sibling of
    * the streaming `batch_id=` compactor): a deliberately fragmented
    * partitioned copy of lineitem (16-way shuffled write per returnflag
    * partition) is bin-packed back to ceil(bytes/target) = 1 file per
    * partition. The declared result reads the COMPACTED table — per-flag
    * counts, exact cent sums, and orderkey extrema prove content
    * preservation through the rewrite — joined with `files_after` from
    * the compaction report, which the oracle pins to the bin-pack
    * arithmetic's answer (1): if compaction ever failed to rewrite, the
    * declared side would show the fragmented file count and hash-diverge. */
  private def compactQ(s: SparkSession, d: String): DataFrame = {
    val dir = replayStateDir(s, "q134", d)
    lineitem(s, d).select(col("l_returnflag"), col("l_orderkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      // hash repartition, not round-robin: keyless repartition(16) pays
      // a local SORT of its input (sortBeforeRepartition, guide §2.5) —
      // inside the single-row-group scan task that sort is serial; the
      // hash spread on the high-cardinality orderkey fragments every
      // l_returnflag dir 16 ways just the same (the fixture's only
      // contract — the compactor's input must be small-filed)
      .repartition(16, col("l_orderkey"))
      .write.partitionBy("l_returnflag").mode("overwrite").parquet(dir)
    val rep = graft.sinks.Publish.compact(s, dir, targetBytes = 1L << 30)
      .select(regexp_extract(col("partition"), "^l_returnflag=(.+)$", 1)
          .as("l_returnflag"),
        col("files_after"))
    s.read.parquet(dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"),
        min(col("l_orderkey")).as("min_orderkey"),
        max(col("l_orderkey")).as("max_orderkey"))
      .join(rep, Seq("l_returnflag"))
  }

  /** q135: shuffle-skew diagnostics ([[Salt.skewReport]] — the decide
    * half of the q31/q32 salting remedies): per-suppkey row counts of
    * lineitem (the l_suppkey ⨝ supplier shuffle's key distribution),
    * top-10 heaviest keys with share and the max/uniform skew ratio.
    * Costs exactly one pass of the shuffle it diagnoses. */
  private def skewReportQ(s: SparkSession, d: String): DataFrame =
    Salt.skewReport(lineitem(s, d), Seq("l_suppkey"), topK = 10)

  /** SCD-2 history (q90): the user changelog as validity intervals —
    * one row per run of equal states with valid_from/valid_to/version/
    * is_current ([[Cdc.scd2History]] — the dbt-snapshot surface; one
    * user-keyed shuffle, both windows share its sort). */
  private def scd2Q(s: SparkSession, d: String): DataFrame =
    Cdc.scd2History(userChangelog(s, d).drop("op"),
        Seq("user_id"), "state",
        Seq(col("us").asc, col("event_id").asc), col("us"))
      .select(col("user_id"), col("state"),
        col("valid_from").as("valid_from_us"),
        col("valid_to").as("valid_to_us"),
        col("version"), col("is_current"))

  /** q125: forward-fill over the date spine — the gap-fill/interpolation
    * time-series operator and the IGNORE NULLS window surface (the one
    * W-family member no other declared query exercises): per priority,
    * the complete day calendar (q99's spine shape) left-joined to actual
    * daily revenue, quiet days carrying the LAST OBSERVED value forward
    * (`last(col, ignoreNulls = true)` over an unbounded-preceding frame),
    * plus the observation's age in days. ONE key-partitioned window over
    * one exchange; the spine generate is driver-light (dates × priorities
    * rows). */
  private def forwardFillQ(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d).groupBy(
        col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val bounds = orders(s, d).agg(
      to_date(min(col("o_orderdate"))).as("d0"),
      to_date(max(col("o_orderdate"))).as("d1"))
    val spine = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .crossJoin(daily.select(col("priority")).distinct())
    val w = Window.partitionBy(col("priority")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("priority", "day"), "left")
      .select(col("priority"), col("day"), col("cents"),
        last(col("cents"), ignoreNulls = true).over(w).as("filled_cents"),
        last(when(col("cents").isNotNull, col("day")), ignoreNulls = true)
          .over(w).as("obs_day"))
      // day rendered as a string for engine-neutral hashing (q99's
      // convention); staleness computed on the DATE values first
      .select(col("priority"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cents"), col("filled_cents"),
        datediff(col("day"), col("obs_day")).cast("long").as("staleness_days"))
  }

  /** q124: SCD-2 point-in-time lookup — the textbook lakehouse temporal
    * join the history table (q90) exists to serve: for a probe stream of
    * (user, instant) pairs, find the dimension VERSION in effect at that
    * instant (`valid_from <= t < valid_to`, open current interval).
    * Probes are a deterministic event sample shifted +30 min so lookups
    * land strictly inside intervals, not on their own change boundaries.
    * Plan: equi-join on the user key with the interval predicate as a
    * post-join filter — versions per key are few (runs collapse), so the
    * interval filter multiplies nothing; at 100 TB both sides shuffle
    * once on the key, or the probe side alone when the dimension is
    * bucket-published ([[graft.sinks.Publish.bucketedTable]]). */
  private def pointInTimeQ(s: SparkSession, d: String): DataFrame = {
    val hist = Cdc.scd2History(userChangelog(s, d).drop("op"),
      Seq("user_id"), "state",
      Seq(col("us").asc, col("event_id").asc), col("us"))
    val probes = events(s, d)
      .filter(pmod(col("event_id"), lit(7)) === 0)
      .select(col("event_id").as("probe_id"), col("user_id").as("p_user"),
        (unix_micros(col("ts")) + lit(1800000000L)).as("p_us"))
    probes.join(hist, col("p_user") === col("user_id") &&
        col("valid_from") <= col("p_us") &&
        (col("valid_to").isNull || col("p_us") < col("valid_to")))
      .select(col("probe_id"), col("user_id"), col("p_us"),
        col("state"), col("version"))
  }

  /** GROUPING SETS (q91): the general form behind q86's rollup — an
    * explicit set list including a cross-cut ((rf,ls), (rf), (ls)) that
    * no single ROLLUP/CUBE chain expresses, still ONE Expand-based
    * aggregation pass over one scan of the fact table. */
  private def groupingSetsQ(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"),
        count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))

  /** Distribution windows (q92): per event type, each user's activity
    * quartile / percent_rank / cume_dist — the reporting-tier ranking
    * surface (W-family completeness beyond rank/row_number). Both ranks
    * are exact integer-derived doubles, so rounding matches any engine;
    * ties broken by user_id for full determinism. */
  private def userDistributionQ(s: SparkSession, d: String): DataFrame = {
    val counts = events(s, d).groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("user_id").asc)
    counts.select(col("event_type"), col("user_id"), col("n"),
      ntile(4).over(w).cast("long").as("quartile"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"))
  }

  /** Canonical dedup survivors (q93): the decision step AFTER pair
    * finding (q15) and component labeling (q34) — per near-dup component
    * keep the highest-quality doc (distinct-token count, ties to the
    * smallest id) and count what it replaces
    * ([[Dedup.canonicalize]] — one component-keyed shuffle feeds both
    * the argmax window and the aggregate). */
  private def canonicalDocsQ(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).filter(col("doc_id") < 1000)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 2, threshold = 0.2)
    val comps = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val qual = docs.select(col("doc_id"),
      size(array_distinct(Text.tokens(col("text")))).cast("long").as("quality"))
    Dedup.canonicalize(comps, qual, "doc_id", "quality")
  }

  /** Disproportionality signals (q94): PRR/ROR/χ² over the (source ×
    * lang) report contingency — the pharmacovigilance association screen
    * (Evans criteria) behind the reference's signal tier
    * ([[EarlySignals.disproportionality]] — one shuffle over the report
    * grain; margins and totals re-aggregate the tiny cell table through
    * ReuseExchange, every join above it a broadcast). */
  private def prrSignalsQ(s: SparkSession, d: String): DataFrame =
    EarlySignals.disproportionality(documents(s, d), "source", "lang")

  /** PageRank centrality (q95): which customers/suppliers anchor the trade
    * network — deterministic integer-scaled Pregel rounds over the
    * undirected customer↔supplier order graph ([[Graph.pageRank]]; exact
    * BIGINT mass units make the iteration bit-reproducible across engines
    * and partitionings). Node encoding: customers even (2k), suppliers
    * odd (2k+1), decoded in the projection. The edge list is SYMMETRIZED
    * here and must stay so: the recursive oracle inner-joins the message
    * flow, which only matches [[Graph.pageRank]]'s node-total update when
    * every node has an in-edge (see the q95 oracle comment). */
  private def pageRankQ(s: SparkSession, d: String): DataFrame = {
    val pairs = orders(s, d)
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
    Graph.pageRank(edges, iterations = 6)
      .select(
        when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("node_type"),
        when(col("node") % 2 === 0, expr("node div 2"))
          .otherwise(expr("(node - 1) div 2")).as("entity_id"),
        col("deg"), col("rank"))
  }

  /** Prefix-filtered exact Jaccard pairs (q96): the SSJoin/PPJoin
    * candidate generation — global rarest-first shingle order, only each
    * doc's prefix enters the self-join, exact-Jaccard verify
    * ([[Dedup.prefixFilteredJaccardPairs]]). Same answer as the q15
    * inverted-index form (prefix filtering is lossless), asymptotically
    * fewer candidates — the 100 TB exact-threshold path. */
  private def prefixJaccardQ(s: SparkSession, d: String): DataFrame =
    Dedup.prefixFilteredJaccardPairs(
      documents(s, d).filter(col("doc_id") < 1500), "doc_id", "text",
      n = 3, threshold = 0.3)

  /** Exact heavy hitters (q97): tokens above the 1/(k+1) frequency bar,
    * found by the mergeable Misra–Gries summary and re-counted exactly
    * over a broadcast candidate set ([[Sketch.heavyHitters]]). The sketch
    * prunes the search; integer arithmetic decides — so the output is
    * exact and DuckDB-oracle-able even though a sketch drives the plan. */
  private def heavyHittersQ(s: SparkSession, d: String): DataFrame =
    Sketch.heavyHitters(
      documents(s, d).select(explode(Text.tokens(col("text"))).as("tok")),
      "tok", k = 60)

  /** Correlated scalar subqueries (q98): orders worth more than 2× their
    * own customer's average order — the decorrelation planner surface
    * (Catalyst rewrites each correlated aggregate into a join against a
    * grouped aggregate; PlanSpec pins no per-row subquery remains). The
    * threshold compare is integer cents arithmetic (`cents·n > 2·Σcents`)
    * so the boundary is exact in both engines — an avg-of-doubles compare
    * would be last-ulp flaky exactly at the rows that matter. */
  private def correlatedSubqueryQ(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_v")
    s.sql("""
      SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
      FROM orders_v o
      WHERE CAST(round(o_totalprice * 100) AS BIGINT) *
            (SELECT count(*) FROM orders_v o2
             WHERE o2.o_custkey = o.o_custkey)
          > 2 * (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
                 FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)""")
  }

  /** Calendar-spine daily volume (q99): the dbt_utils.date_spine pattern
    * behind reporting marts — a generated complete day spine (sequence +
    * explode over the corpus min/max), left-joined to per-day counts so
    * quiet days appear as explicit zero rows with a gap flag instead of
    * silently missing from the mart. The spine is calendar-sized (rows =
    * days, not orders) so it broadcasts; the count side is one date-keyed
    * aggregate of the fact table. */
  private def dateSpineQ(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(to_date(col("o_orderdate")).as("day"))
    val spine = o.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val counts = o.groupBy(col("day")).agg(count(lit(1)).as("n"))
    spine.join(counts, Seq("day"), "left")
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        col("n").isNull.as("is_gap"))
  }

  /** Interval RANGE frames (q100): 30-day trailing spend per customer —
    * the value-based window frame family (RANGE over a time axis, frame
    * membership by VALUE distance including peers) next to the ROWS
    * frames of q08. The order key is integer epoch-days and the summed
    * measure integer cents, so frame membership and the rolling sum are
    * exact in any engine; one customer-keyed shuffle. */
  private def rangeFrameQ(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("epoch_day"))
      .rangeBetween(-30, Window.currentRow)
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
          .cast("long").as("epoch_day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .withColumn("rolling_30d_cents", sum(col("cents")).over(w))
      .withColumn("n_in_window", count(lit(1)).over(w))
      .select(col("o_orderkey"), col("o_custkey"), col("epoch_day"),
        col("rolling_30d_cents"), col("n_in_window"))
  }

  /** Unpivot/melt (q101): the inverse of q87's pivot — the wide per-type
    * count columns fold back to (day, event_type, n) long form via
    * `Dataset.unpivot` (plans as a single Expand over the pivoted frame,
    * no joins). Zero-filled cells from the dense pivot are dropped, so
    * pivot→unpivot is exactly the direct `groupBy(day, type)` — which is
    * what the oracle computes: the roundtrip is the proof. */
  private def unpivotEventsQ(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    pivotEventsQ(s, d)
      .unpivot(Array(col("day")), types.map(col).toArray,
        "event_type", "n_events")
      .filter(col("n_events") > 0)
  }

  /** CUBE (q102): all four cross-tabulations of (mktsegment, orderpriority)
    * — subtotals per segment, per priority, and the grand total — in ONE
    * Expand-based aggregation pass over one scan, completing the
    * Expand-family trio next to q86's ROLLUP chain and q91's explicit
    * GROUPING SETS. `grouping()` flags distinguish rolled-up levels from
    * genuine NULL keys. */
  private def cubeRevenueQ(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderpriority"))
      .agg(grouping(col("c_mktsegment")).cast("long").as("g_seg"),
        grouping(col("o_orderpriority")).cast("long").as("g_pri"),
        count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("revenue"))

  /** Window navigation (q103): per-segment quarterly revenue with lag
    * (QoQ delta), first_value (vs first quarter) and last_value over the
    * full frame (vs final quarter) — the navigation family (lag/lead/
    * first/last/nth) completing the declared window surface. Revenue is
    * integer cents, so every delta is engine-exact; one segment-keyed
    * shuffle serves the aggregate and all three windows. */
  private def windowNavQ(s: SparkSession, d: String): DataFrame = {
    val q = orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        (year(col("o_orderdate")) * 4 + quarter(col("o_orderdate")) - 1)
          .cast("long").as("quarter_index"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("quarter_index"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    q.select(col("c_mktsegment"), col("quarter_index"), col("cents"),
      (col("cents") - lag(col("cents"), 1).over(w)).as("qoq_delta"),
      (col("cents") - first_value(col("cents")).over(w)).as("vs_first"),
      (col("cents") - last_value(col("cents")).over(full)).as("vs_last"))
  }

  /** q104: HLL distinct-token estimate per language — the constant-space
    * member of the distinct-count family (q40's KMV ships k longs per
    * group; HLL ships exactly 2^p bytes). Declared over the native
    * mergeable [[graft.functions.expressions.HllSketch]] aggregate; the
    * oracle rebuilds the identical registers relationally in DuckDB
    * (SHA lanes + `bin()` bit math — no floating log2). */
  private def hllDistinctTokens(s: SparkSession, d: String): DataFrame =
    Sketch.hllDistinctSketch(
      documents(s, d).select(col("lang"),
        explode(Text.tokens(col("text"))).as("token")),
      Seq("lang"), Sketch.shaLane(col("token")), p = 6)

  /** q105: pairwise token-overlap estimates (union / Jaccard /
    * intersection) across the 20 document sources from composable KMV
    * sketches — the corpus shuffles its bottom-k lanes ONCE per source,
    * and all C(20,2) pair statistics are array math on (source × k)
    * longs. Corpus-mix planning / cross-source contamination sizing
    * without an O(n²) token join. */
  private def kmvOverlapQ(s: SparkSession, d: String): DataFrame =
    Sketch.kmvOverlap(
      documents(s, d).select(col("source"),
        explode(Text.tokens(col("text"))).as("token")),
      "source", Sketch.shaLane(col("token")), k = 128)

  /** q106: incremental aggregate maintenance — the mart is kept as
    * per-key partial aggregates (integer cents; sum/min/max/count all
    * decomposable) and a delta batch folds in by re-aggregating
    * `mart ∪ agg(delta)`, never rescanning the base facts. The declared
    * query materializes the mart pre-1997, folds the 1997+ delta in, and
    * the oracle re-derives the SAME mart from ALL raw facts in DuckDB —
    * the merge-vs-recompute equivalence IS the correctness statement. */
  private def incrementalAggQ(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderpriority").as("priority"),
      date_format(col("o_orderdate"), "yyyy-MM").as("month"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val keys = Seq("priority", "month")
    def part(f: DataFrame) = Incremental.aggregate(f, keys, Seq("cents"),
      mins = Seq("cents"), maxs = Seq("cents"))
    Incremental.mergeAggregates(
      Seq(part(o.filter(col("month") < "1997-01")),
          part(o.filter(col("month") >= "1997-01"))),
      keys, Seq("cents"), mins = Seq("cents"), maxs = Seq("cents"))
  }

  /** q107: zone-map statistics over the q51 z-value space — per z-range
    * bucket (top 10 bits ≈ one clustered file) the row count and BOTH
    * dimensions' min/max, i.e. the stats table a data-skipping reader
    * prunes against. The declared query oracles the stats aggregation;
    * the skipping EFFECT (tight rectangles vs a hash layout) is
    * ZOrderSpec's quantified assertion. */
  private def zoneMapQ(s: SparkSession, d: String): DataFrame =
    graft.functions.ZOrder.zoneMap(
      events(s, d).select(col("user_id"),
        unix_timestamp(col("ts")).as("ts_sec")),
      col("user_id"), col("ts_sec"), bucketBits = 10)

  /** q108: EWMA smoothing of daily revenue per priority — the signal
    * tier's recency-weighted companion to the q08 rolling z-score. α is
    * 1/2 so every weight is a power of two: with integer-cent inputs
    * the whole smoother is exact doubles and hash-matches the DuckDB
    * lag-chain oracle bit-for-bit. One ordered window, scan-side array
    * math ([[Trend.ewma]]). */
  private def ewmaQ(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d).groupBy(
        col("o_orderpriority").as("priority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    Trend.ewma(daily, Seq("priority"), col("day"), col("cents"), window = 8)
  }

  /** q109: k-anonymity / l-diversity audit over (event_type, day) as
    * the quasi-identifier and user_id as the sensitive attribute — the
    * governance-tier group-size screen ([[Privacy.kAnonymityAudit]]):
    * one QI-keyed aggregate, no joins. */
  private def kAnonQ(s: SparkSession, d: String): DataFrame =
    Privacy.kAnonymityAudit(
      events(s, d).select(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id")),
      Seq("event_type", "day"), col("user_id"), k = 20, minL = 5)

  /** q110: bounded-hop BFS distances over the customer↔supplier trade
    * graph from a small customer seed set — the recursive-CTE
    * capability (Spark has no WITH RECURSIVE) expressed as frontier
    * iteration ([[Graph.bfsDistances]]: per-round work is frontier-
    * adjacent edges only, anti-join prunes visited). The oracle IS
    * DuckDB's `WITH RECURSIVE` over the same graph — two genuinely
    * different fixpoint computations, one answer. */
  private def bfsQ(s: SparkSession, d: String): DataFrame = {
    val pairs = orders(s, d)
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    // materialize the edge table once: every frontier round references it,
    // and unlike q95 (where ReuseExchange already dedups the per-iteration
    // subtree and an eager cache measured slower) the checkpoint is a
    // measured win here — sf0.1 medians 2.8 s → 1.9-2.6 s; it also
    // truncates lineage for deeper hop counts
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
      .localCheckpoint()
    val seeds = pairs.filter(col("c") <= 40).select(col("c").as("node"))
    Graph.bfsDistances(edges, seeds, maxHops = 3)
      .select(
        when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("node_type"),
        when(col("node") % 2 === 0, expr("node div 2"))
          .otherwise(expr("(node - 1) div 2")).as("entity_id"),
        col("dist"))
  }

  /** q111: AQP revenue estimation — grouped COUNT/SUM estimated from a
    * 25% deterministic hash sample with Horvitz-Thompson scale-up and a
    * standard-error column ([[Aqp.sampledAggregate]]): the sample
    * filter is scan-side, so the only exchange aggregates the SAMPLE;
    * the full table is never shuffled. Dyadic rate ⇒ exact scale-ups;
    * the oracle runs the identical estimator in DuckDB. */
  private def aqpQ(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderpriority").as("priority"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      concat(lit("aqp|"), col("o_orderkey").cast("string")).as("tag"))
    Aqp.sampledAggregate(o, Seq("priority"), col("cents"), 0.25, col("tag"))
  }

  /** q112: personalized PageRank from the same customer seed set as
    * q110 — "entities related to these customers, ranked". Integer-
    * scaled like q95 (bit-identical in any engine); the rank vector is
    * SPARSE (mass only ever reaches nodes within k hops of the seeds),
    * and the oracle unrolls the same four rounds as plain SQL layers. */
  private def pprQ(s: SparkSession, d: String): DataFrame = {
    // PAIR checkpoint (upgraded from the old edges-only checkpoint, r13):
    // seeds used to derive from the raw orders⨝lineitem distinct, so the
    // seed-count action plus every iteration's teleport rows re-ran the
    // join — at sf1 that was most of the query. Checkpointing the pair
    // set once makes edges AND seeds cheap projections of materialized
    // rows (the 4-round propagation itself was already the cheap part).
    val pairs = orders(s, d)
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
      .localCheckpoint()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
    val seeds = pairs.filter(col("c") <= 40).select(col("c").as("node"))
    Graph.personalizedPageRank(edges, seeds, iterations = 4)
      .select(
        when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("node_type"),
        when(col("node") % 2 === 0, expr("node div 2"))
          .otherwise(expr("(node - 1) div 2")).as("entity_id"),
        col("rank"))
  }

  /** q113: HLL distinct-user estimates inside CUBE — the sketch tier
    * composing with the OLAP Expand tier: one pass computes per-cell,
    * per-row-slice, per-column-slice and grand-total distinct counts,
    * each cell a 64-byte register set (count-distinct inside a cube is
    * exactly where exact per-group distinct state explodes at 100 TB).
    * The oracle rebuilds every grouping set relationally (UNION ALL
    * mirror of Expand) and re-derives the registers per level. */
  private def cubeDistinctQ(s: SparkSession, d: String): DataFrame = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    events(s, d).select(col("event_type"),
        date_format(col("ts"), "yyyy-MM").as("month"),
        Sketch.shaLane(concat(lit("u|"), col("user_id").cast("string"))).as("lane"))
      .cube(col("event_type"), col("month"))
      .agg(grouping(col("event_type")).cast("long").as("g_et"),
        grouping(col("month")).cast("long").as("g_m"),
        count(lit(1)).as("n"),
        round(call_function("graft_hll", col("lane"), lit(6)), 4).as("est_users"))
  }

  /** q114: robust daily-revenue outlier screen per priority — MAD-based
    * modified z-scores ([[Trend.robustOutlierStats]]), the heavy-tail-
    * safe companion to q08's rolling mean/stddev signal (an extreme day
    * inflates a stddev and hides itself; it barely moves a median). */
  private def robustSignalsQ(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d).groupBy(
        col("o_orderpriority").as("priority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    Trend.robustOutlierStats(daily, Seq("priority"), col("cents"), z = 3.5)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"    -> (pricingSummary _),
    "q02_revenue_filter"     -> (revenueFilter _),
    "q03_segment_revenue"    -> (segmentRevenue _),
    "q04_region_nation_revenue" -> (regionNationRevenue _),
    "q05_priority_class"     -> (priorityClass _),
    "q06_doc_topics_ilike"   -> (docTopics _),
    "q07_top_events_per_user" -> (topEventsPerUser _),
    "q08_early_signals"      -> (earlySignals _),
    "q09_order_lines_listagg" -> (orderLinesListagg _),
    "q10_token_counts"       -> (tokenCounts _),
    "q11_order_surrogate_keys" -> (orderSurrogateKeys _),
    "q12_json_extract"       -> (jsonExtract _),
    "q13_parse_dates"        -> (parseDates _),
    "q14_dedup_exact"        -> (dedupExact _),
    "q15_ngram_jaccard"      -> (ngramJaccard _),
    "q16_knn_brute"          -> (knnBrute _),
    "q17_text_quality"       -> (textQuality _),
    "q18_langid"             -> (langId _),
    "q19_fingerprint"        -> (fingerprints _),
    "q20_minhash_lsh"        -> (minhashLsh _),
    "q21_simhash_pairs"      -> (simhashPairs _),
    "q22_embedding_neardup"  -> (embeddingNearDup _),
    "q23_bm25"               -> (bm25 _),
    "q24_sessionize"         -> (sessionize _),
    "q25_lsh_knn"            -> (lshKnn _),
    "q26_hybrid_search"      -> (hybridSearch _),
    "q27_ivf_knn"            -> (ivfKnn _),
    "q28_multimodal_features" -> (multimodalFeatures _),
    "q29_enrich"             -> (enrichDocs _),
    "q30_frame_offsets"      -> (frameOffsets _),
    "q31_salted_agg"         -> (saltedAgg _),
    "q32_salted_join"        -> (saltedJoin _),
    "q33_promo_revenue"      -> (promoRevenue _),
    "q34_dedup_components"   -> (dedupComponents _),
    "q35_sequence_packing"   -> (sequencePacking _),
    "q36_quality_filter"     -> (qualityFilter _),
    "q37_corpus_quantiles"   -> (corpusQuantiles _),
    "q38_asof_join"          -> (asofCheckpoints _),
    "q39_range_join"         -> (rangeJoinWindows _),
    "q40_kmv_distinct"       -> (kmvDistinctTokens _),
    "q41_stratified_sample"  -> (stratifiedSample _),
    "q42_keep_latest"        -> (keepLatestEvent _),
    "q43_source_quota"       -> (sourceQuota _),
    "q44_pii_scrub"          -> (piiScrub _),
    "q45_tfidf_topterms"     -> (tfidfTopTerms _),
    "q46_lsh_neardup"        -> (lshNearDup _),
    "q47_kmeans_train"       -> (kmeansTrain _),
    "q48_resize_plan"        -> (resizePlanQuery _),
    "q49_quality_checks"     -> (qualityChecks _),
    "q50_lsh_admit"          -> (lshAdmit _),
    "q51_zorder"             -> (zorderValues _),
    "q52_cms_counts"         -> (cmsTokenCounts _),
    "q53_corpus_build"       -> (corpusBuild _),
    "q54_quantize_i8"        -> (quantizeEmbeddings _),
    "q55_decontaminate"      -> (decontaminateTrain _),
    "q56_bloom_admit"        -> (bloomAdmit _),
    "q57_train_split"        -> (trainSplit _),
    "q58_doc_chunks"         -> (docChunks _),
    "q59_passage_dedup"      -> (passageDedupQ _),
    "q60_pq_codes"           -> (pqCodes _),
    "q61_rep_metrics"        -> (repMetrics _),
    "q62_corpus_build2"      -> (corpusBuild2 _),
    "q63_neg_samples"        -> (negSamples _),
    "q64_corpus_mix"         -> (corpusMix _),
    "q65_semantic_dedup"     -> (semanticDedupQ _),
    "q66_lm_surprisal"       -> (lmSurprisal _),
    "q67_dsir_weights"       -> (dsirWeightsQ _),
    "q68_rare_ngrams"        -> (rareNgramsQ _),
    "q69_centroid_outliers"  -> (centroidOutliersQ _),
    "q70_corpus_report"      -> (corpusReport _),
    "q71_label_cohesion"     -> (labelCohesionQ _),
    "q72_hard_negatives"     -> (hardNegativesQ _),
    "q73_funnel"             -> (funnelQ _),
    "q74_retention"          -> (retentionQ _),
    "q75_model_filter"       -> (modelFilterQ _),
    "q76_normalize"          -> (normalizeQ _),
    "q77_coverage_shift"     -> (coverageShiftQ _),
    "q78_dsir_resample"      -> (dsirResampleQ _),
    "q79_matryoshka"         -> (matryoshkaQ _),
    "q80_pq_distortion"      -> (pqDistortionQ _),
    "q81_bpe_pairs"          -> (bpePairsQ _),
    "q82_snapshot_diff"      -> (snapshotDiffQ _),
    "q83_edit_distance"      -> (editDistanceQ _),
    "q84_weighted_sample"    -> (weightedSampleQ _),
    "q85_boilerplate"        -> (boilerplateQ _),
    "q86_rollup_revenue"     -> (rollupRevenueQ _),
    "q87_pivot_events"       -> (pivotEventsQ _),
    "q88_set_ops"            -> (setOpsQ _),
    "q89_cdc_merge"          -> (cdcMergeQ _),
    "q90_scd2_history"       -> (scd2Q _),
    "q91_grouping_sets"      -> (groupingSetsQ _),
    "q92_user_distribution"  -> (userDistributionQ _),
    "q93_canonical_docs"     -> (canonicalDocsQ _),
    "q94_prr_signals"        -> (prrSignalsQ _),
    "q95_pagerank"           -> (pageRankQ _),
    "q96_prefix_jaccard"     -> (prefixJaccardQ _),
    "q97_heavy_hitters"      -> (heavyHittersQ _),
    "q98_correlated_premium" -> (correlatedSubqueryQ _),
    "q99_date_spine"         -> (dateSpineQ _),
    "q100_range_frame"       -> (rangeFrameQ _),
    "q101_unpivot"           -> (unpivotEventsQ _),
    "q102_cube"              -> (cubeRevenueQ _),
    "q103_window_nav"        -> (windowNavQ _),
    "q104_hll_distinct"      -> (hllDistinctTokens _),
    "q105_kmv_overlap"       -> (kmvOverlapQ _),
    "q106_incremental_agg"   -> (incrementalAggQ _),
    "q107_zone_map"          -> (zoneMapQ _),
    "q108_ewma"              -> (ewmaQ _),
    "q109_k_anonymity"       -> (kAnonQ _),
    "q110_bfs"               -> (bfsQ _),
    "q111_aqp_revenue"       -> (aqpQ _),
    "q112_ppr"               -> (pprQ _),
    "q113_cube_distinct"     -> (cubeDistinctQ _),
    "q114_robust_signals"    -> (robustSignalsQ _),
    "q115_variant_extract"   -> (variantExtract _),
    "q116_scd1_replay"       -> (scd1ReplayQ _),
    "q117_distinct_replay"   -> (distinctReplayQ _),
    "q118_components_dist"   -> (dedupComponentsDist _),
    "q119_cms_replay"        -> (cmsReplayQ _),
    "q120_profile"           -> (profileQ _),
    "q121_histogram"         -> (histogramQ _),
    "q122_transitions"       -> (transitionsQ _),
    "q123_hh_replay"         -> (heavyHittersReplayQ _),
    "q124_point_in_time"     -> (pointInTimeQ _),
    "q125_forward_fill"      -> (forwardFillQ _),
    "q126_vec_index_replay"  -> (vectorIndexReplayQ _),
    "q127_funnel_replay"     -> (funnelReplayQ _),
    "q128_search_index_replay" -> (searchIndexReplayQ _),
    "q129_sessionize_replay"   -> (sessionizeReplayQ _),
    "q130_interval_join"       -> (intervalJoinQ _),
    "q131_semantic_decontam"   -> (semanticDecontaminateQ _),
    "q132_dup_span_dedup"      -> (dupSpanQ _),
    "q133_retrieval_eval"      -> (retrievalEvalQ _),
    "q134_compaction"          -> (compactQ _),
    "q135_skew_report"         -> (skewReportQ _),
    "q136_retrieval_macro"     -> (retrievalEvalMacroQ _),
    "q137_join_ivm"            -> (joinDeltaQ _),
    "q138_name_match"          -> (nameMatchQ _),
    "q139_ndcg"                -> (ndcgQ _),
    "q140_maude_ingest_replay" -> (maudeIngestReplayQ _),
    "q141_avg_precision"       -> (apQ _),
    "q142_graded_macro"        -> (gradedMacroQ _),
    "q143_masking_policy"      -> (maskingPolicyQ _),
    "q144_row_access_policy"   -> (rowAccessQ _),
    "q145_policy_catalog"      -> (policyCatalogQ _),
    "q146_signals_ivm"         -> (signalsIvmQ _),
    "q147_lineage"             -> (lineageQ _),
    "q148_column_lineage"      -> (lineageColumnsQ _),
    "q149_mv_rewrite"          -> (mvRewriteQ _),
    "q150_mv_rollup"           -> (mvRollupQ _),
    "q151_agg_policy"          -> (aggPolicyQ _),
    "q152_conditional_mask"    -> (conditionalMaskQ _),
    "q153_projection_policy"   -> (projectionPolicyQ _),
    "q154_classify"            -> (classifyQ _),
    "q155_auto_mask"           -> (autoMaskQ _),
    "q156_match_recognize"     -> (matchRecognizeQ _),
    "q157_epoch_shuffle"       -> (epochShuffleQ _),
    "q158_hopping_window"      -> (hoppingWindowQ _),
    "q159_seasonal_decompose"  -> (seasonalDecomposeQ _),
    "q160_cusum"               -> (cusumQ _),
    "q161_regression_trend"    -> (regressionTrendQ _),
    "q162_alarm_replay"        -> (alarmReplayQ _),
    "q163_benford"             -> (benfordQ _),
    "q164_stratified_exact"    -> (stratifiedExactQ _),
    "q165_skyline"             -> (skylineQ _),
    "q166_association_rules"   -> (associationRulesQ _),
    "q167_drift"               -> (driftQ _),
    "q168_keyness"             -> (keynessQ _),
    "q169_interpolate"         -> (interpolateQ _),
    "q170_vocab_coverage"      -> (vocabCoverageQ _),
    "q171_attribution"         -> (attributionQ _),
    "q172_acf"                 -> (acfQ _),
    "q173_weighted_median"     -> (weightedMedianQ _),
    "q174_concentration"       -> (concentrationQ _),
    "q175_triangles"           -> (trianglesQ _),
    "q176_rfm"                 -> (rfmQ _),
    "q177_islands"             -> (islandsQ _),
    "q178_twap"                -> (twapQ _),
    "q179_cramers_v"           -> (cramersQ _),
    "q180_drift_replay"        -> (driftReplayQ _),
    "q181_kcore"               -> (kcoreQ _),
    "q182_sssp"                -> (ssspQ _),
    "q183_seq_rules"           -> (seqRulesQ _),
    "q184_ab_test"             -> (abTestQ _),
    "q185_theil_sen"           -> (theilSenQ _),
    "q186_assortativity"       -> (assortativityQ _),
    "q187_phrase_search"       -> (phraseSearchQ _),
    "q188_rank_surface"        -> (rankSurfaceQ _),
    "q189_m4_downsample"       -> (m4Q _),
    "q190_target_encode"       -> (targetEncodeQ _),
    "q191_woe_iv"              -> (woeIvQ _),
    "q192_kaplan_meier"        -> (kaplanMeierQ _),
    "q193_cat_profile"         -> (catProfileQ _),
    "q194_woe_iv_replay"       -> (woeIvReplayQ _),
    "q195_mutual_info"         -> (mutualInfoQ _),
    "q196_ols2"                -> (ols2Q _),
    "q197_consistent_hash"     -> (consistentHashQ _),
    "q198_equidepth_hist"      -> (equiDepthQ _),
    "q199_conversion_latency"  -> (convLatencyQ _),
    "q200_m4_replay"           -> (m4ReplayQ _),
    "q201_calibration"         -> (calibrationQ _),
    "q202_cohens_kappa"        -> (kappaQ _),
    "q203_group_kfold"         -> (groupKFoldQ _),
    "q204_jensen_shannon"      -> (jsdQ _),
    "q205_chao1_richness"      -> (chao1Q _),
    "q206_ks_statistic"        -> (ksQ _),
    "q207_repetition"          -> (repetitionQ _),
    "q208_zipf_slope"          -> (zipfQ _),
    "q209_containment"         -> (containmentQ _),
    "q210_kmv_replay"          -> (kmvReplayQ _),
    "q211_robust_outliers"     -> (robustOutliersQ _),
    "q212_publish_interop"     -> (publishInteropQ _),
    "q213_change_feed"         -> (changeFeedQ _),
    "q214_scd2_snapshot"       -> (scd2SnapshotQ _),
    "q215_scd_hard_delete"     -> (scdHardDeleteQ _),
    "q216_partition_publish"   -> (partitionPublishQ _),
    "q217_scd2_asof"           -> (scd2AsOfQ _),
    "q218_stream_ingest"       -> (streamIngestQ _),
    "q219_schema_evolution"    -> (publishEvolutionQ _),
  )

  // ------------------------------------------------------------ oracle SQL

  import graft.functions.ShaLanes.{duckHexLane, duckLane}

  /** Fraction-of-equal-signature-components estimate between sig aliases
    * `a` and `b` (shared by the q20 and q50 oracles). */
  private def minhashMatchSum: String = (0 until 16)
    .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)").mkString(" + ")

  /** Shared CTE prefix of the q20/q50 oracles: tokens → distinct word
    * 3-shingles → 4 SHA-256 digests → 16 lanes → per-doc min-lane
    * signature (`sig`) → band-bucket rows (`bk`), mirroring
    * [[Dedup.minhashSignaturesSha]] + its banding (4 bands × 4 rows). */
  private def minhashSigCte: String = {
    val lanes = (0 until 16).map(i =>
      s"${duckHexLane(s"d${i / 4}", graft.functions.ShaLanes.LaneOffsets(i % 4))} AS l$i")
      .mkString(",\n    ")
    val mins = (0 until 16).map(i => s"min(l$i) AS m$i").mkString(", ")
    val bandRows = (1 until 4).map(b =>
      s"  UNION ALL SELECT doc, $b, ${(0 until 4).map(r => s"m${b * 4 + r}").mkString(", ")} FROM sig")
      .mkString("\n")
    s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
       |s0 AS (
       |  SELECT doc_id AS doc, unnest(list_distinct(
       |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks)-1)])) AS sh
       |  FROM t WHERE len(toks) >= 3),
       |dg AS (SELECT doc, sha256('0|' || sh) AS d0, sha256('1|' || sh) AS d1,
       |              sha256('2|' || sh) AS d2, sha256('3|' || sh) AS d3 FROM s0),
       |ln AS (SELECT doc,
       |    $lanes
       |  FROM dg),
       |sig AS (SELECT doc, $mins FROM ln GROUP BY doc),
       |bk AS (
       |  SELECT doc, 0 AS band, m0 AS v0, m1 AS v1, m2 AS v2, m3 AS v3 FROM sig
       |$bandRows)""".stripMargin
  }

  /** q20 oracle: SHA-lane MinHash + banded LSH, mirroring
    * [[Dedup.minhashLshPairsSha]] (4 bands × 4 rows, 16 lanes from 4
    * digests per shingle). */
  private def minhashOracle: String =
    s"""$minhashSigCte,
       |cand AS (
       |  SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
       |  FROM bk x JOIN bk y ON x.band = y.band AND x.v0 = y.v0 AND x.v1 = y.v1
       |    AND x.v2 = y.v2 AND x.v3 = y.v3 AND x.doc < y.doc)
       |SELECT doc_a, doc_b, round(($minhashMatchSum) / 16.0, 6) AS est_jaccard
       |FROM cand JOIN sig a ON doc_a = a.doc JOIN sig b ON doc_b = b.doc""".stripMargin

  /** q50 oracle: incremental dedup admission, mirroring
    * [[Dedup.admitIncremental]] — the corpus with doc_id >= 250 is the
    * already-admitted index, the fixed 250-doc batch (doc_id < 250) is
    * admitted against it; a batch doc's `dup_of` is the smallest doc id
    * (any index doc, or a smaller-id batch doc) whose banded signature
    * collides at estimated Jaccard >= 0.5. */
  private def lshAdmitOracle: String =
    s"""$minhashSigCte,
       |cand AS (
       |  SELECT DISTINCT y.doc AS doc, x.doc AS cand
       |  FROM bk x JOIN bk y ON x.band = y.band AND x.v0 = y.v0 AND x.v1 = y.v1
       |    AND x.v2 = y.v2 AND x.v3 = y.v3
       |  WHERE y.doc < 250 AND (x.doc >= 250 OR x.doc < y.doc)),
       |est AS (
       |  SELECT c.doc, c.cand, round(($minhashMatchSum) / 16.0, 6) AS est_jaccard
       |  FROM cand c JOIN sig a ON c.cand = a.doc JOIN sig b ON c.doc = b.doc),
       |best AS (
       |  SELECT doc, min(cand) AS dup_of FROM est
       |  WHERE est_jaccard >= 0.5 GROUP BY doc)
       |SELECT d.doc_id AS doc, w.dup_of, w.est_jaccard
       |FROM (SELECT doc_id FROM documents WHERE doc_id < 250) d
       |LEFT JOIN (
       |  SELECT b.doc, b.dup_of, e.est_jaccard
       |  FROM best b JOIN est e ON e.doc = b.doc AND e.cand = b.dup_of) w
       |ON d.doc_id = w.doc""".stripMargin

  /** q97/q123 shared oracle: the EXACT heavy hitters (count·(k+1) > N
    * over all document tokens, k = 60). Both the one-shot Misra–Gries
    * plan (q97) and the streaming replay (q123) are sketch-DRIVEN but
    * exact-DECIDED, so the relational answer binds both. */
  private def heavyHittersOracle: String =
    """WITH toks AS (
      |  SELECT unnest(str_split(text, ' ')) AS tok FROM documents),
      |tot AS (SELECT count(*)::BIGINT AS n_total FROM toks)
      |SELECT tok, count(*)::BIGINT AS cnt
      |FROM toks CROSS JOIN tot
      |GROUP BY tok, n_total
      |HAVING count(*) * 61 > n_total""".stripMargin

  /** q52/q119 shared oracle: exact CMS bucket counts rebuilt
    * relationally over the SHA lanes (the sketch's counters ARE exact
    * relational counts of (row, depth) bucket assignments). q52 binds it
    * for the one-shot aggregate; q119 for the streaming counter-delta
    * replay — CMS linearity makes the two bit-equal. */
  private def cmsCountsOracle: String =
    s"""WITH toks AS (SELECT unnest(str_split(text, ' ')) AS v FROM documents),
       |r AS (SELECT unnest(range(4)) AS j),
       |b AS (SELECT j, ${duckLane("j::VARCHAR || '|' || v")} % 64 AS bucket
       |      FROM toks CROSS JOIN r)
       |SELECT j, bucket, count(*) AS cnt FROM b GROUP BY 1, 2""".stripMargin

  /** q34/q118 shared oracle: near-dup pair edges + DuckDB's actual
    * recursive reachability CTE, min-labeled. Two declared queries bind
    * it: q34 (the byte-budgeted driver union-find path) and q118 (the
    * distributed min-label-propagation loop, budget forced to 0) — both
    * must produce the identical labeling. */
  private def dedupComponentsOracle: String =
    """WITH RECURSIVE
      |t AS (
      |  SELECT doc_id, str_split(text, ' ') AS toks
      |  FROM documents WHERE doc_id < 1000),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))])) AS sh
      |  FROM t WHERE len(toks) >= 2),
      |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      |p AS (
      |  SELECT doc_a, doc_b FROM (
      |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |    FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |    GROUP BY 1, 2) i
      |  JOIN cnt ca ON doc_a = ca.doc_id
      |  JOIN cnt cb ON doc_b = cb.doc_id
      |  WHERE n_inter / (ca.n_sh + cb.n_sh - n_inter) >= 0.2),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM p
      |  UNION ALL SELECT doc_b, doc_a FROM p),
      |verts AS (SELECT DISTINCT src AS doc FROM edges),
      |reach(src, dst) AS (
      |  SELECT doc, doc FROM verts
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
      |SELECT src AS doc, min(dst) AS component FROM reach GROUP BY src""".stripMargin

  /** q51 oracle: the identical bit-spread chain as
    * [[graft.functions.ZOrder.zvalue]] — (shift, mask) steps applied to
    * the 31-bit-masked inputs via a CTE chain, then odd/even interleave. */
  private def zorderOracle: String = {
    val steps = Seq(16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
      4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
      1 -> 0x5555555555555555L)
    val ctes = steps.zipWithIndex.map { case ((s, m), i) =>
      s"""z${i + 1} AS (SELECT event_id,
         |  ((a | (a << $s)) & $m) AS a, ((b | (b << $s)) & $m) AS b FROM z$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH z0 AS (
       |  SELECT event_id,
       |    user_id & 2147483647 AS a,
       |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) & 2147483647 AS b
       |  FROM events),
       |$ctes
       |SELECT event_id, a | (b << 1) AS zvalue FROM z5""".stripMargin
  }

  /** q107 oracle: bounds pass → integer range-normalization onto the
    * 31-bit interleave domain (`//` floors like Spark's DIV on the
    * non-negative operands here) → the q51 bit-spread CTE chain carrying
    * the ORIGINAL dims → per-z-bucket stats aggregate. */
  private def zoneMapOracle: String = {
    val steps = Seq(16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
      4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
      1 -> 0x5555555555555555L)
    val ctes = steps.zipWithIndex.map { case ((s, m), i) =>
      s"""z${i + 1} AS (SELECT a0, b0,
         |  ((a | (a << $s)) & $m) AS a, ((b | (b << $s)) & $m) AS b FROM z$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT user_id AS a0,
       |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS b0
       |  FROM events),
       |bd AS (SELECT min(a0) AS a_min, max(a0) AS a_max,
       |              min(b0) AS b_min, max(b0) AS b_max FROM e),
       |z0 AS (SELECT a0, b0,
       |    ((a0 - a_min) * 2147483647 // greatest(a_max - a_min, 1))
       |      & 2147483647 AS a,
       |    ((b0 - b_min) * 2147483647 // greatest(b_max - b_min, 1))
       |      & 2147483647 AS b
       |  FROM e CROSS JOIN bd),
       |$ctes,
       |zv AS (SELECT a0, b0, (a | (b << 1)) >> 52 AS bucket FROM z5)
       |SELECT bucket, count(*) AS n,
       |  min(a0) AS min_a, max(a0) AS max_a,
       |  min(b0) AS min_b, max(b0) AS max_b
       |FROM zv GROUP BY bucket""".stripMargin
  }

  /** q108 oracle: the EWMA numerator as an explicit 8-term lag chain
    * (weights are 2^-k, written as exact decimal literals), denominator
    * in the closed form `2 − 2^{1−n}` — identical exact-double terms to
    * [[graft.operators.Trend.ewma]]'s array fold. */
  private def ewmaOracle: String = {
    val terms = (1 until 8).map { k =>
      val wt = (BigDecimal(1) / BigDecimal(1L << k)).bigDecimal.toPlainString
      s"coalesce(lag(cents, $k) OVER w, 0) * $wt"
    }.mkString("\n    + ")
    s"""WITH daily AS (
       |  SELECT o_orderpriority AS priority,
       |    strftime(o_orderdate, '%Y-%m-%d') AS day,
       |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS cents
       |  FROM orders GROUP BY 1, 2)
       |SELECT priority, day, cents,
       |  round((CAST(cents AS DOUBLE)
       |    + $terms)
       |   / (2 - pow(2.0, -(CAST(count(*) OVER wf AS DOUBLE) - 1))), 4)
       |   AS ewma
       |FROM daily
       |WINDOW w AS (PARTITION BY priority ORDER BY day),
       |  wf AS (PARTITION BY priority ORDER BY day
       |         ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)""".stripMargin
  }

  /** q112 oracle: the four personalized-PageRank rounds unrolled as
    * plain SQL layers (a recursive CTE cannot re-apply the seed teleport
    * without referencing itself twice) — identical integer arithmetic
    * to [[graft.operators.Graph.personalizedPageRank]]. */
  private def pprOracle: String = {
    val layers = (1 to 4).map { i =>
      s"""pr$i AS (
         |  SELECT node, CAST(sum(m) AS BIGINT) AS rank FROM (
         |    SELECT e.dst AS node, (85 * p.rank) // (100 * d.deg) AS m
         |    FROM pr${i - 1} p
         |    JOIN edges e ON e.src = p.node
         |    JOIN deg d ON d.src = p.node
         |    UNION ALL
         |    SELECT node, t AS m FROM seeds CROSS JOIN tele
         |  ) GROUP BY node HAVING sum(m) > 0)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (
       |  SELECT c AS src, s AS dst FROM pairs
       |  UNION ALL SELECT s, c FROM pairs),
       |deg AS (SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
       |seeds AS (SELECT DISTINCT c AS node FROM pairs WHERE c <= 40),
       |nn AS (SELECT count(*)::BIGINT AS s FROM seeds),
       |tele AS (SELECT (15000000000000 // (100 * s))::BIGINT AS t,
       |                (1000000000000 // s)::BIGINT AS r0 FROM nn),
       |pr0 AS (SELECT node, r0 AS rank FROM seeds CROSS JOIN tele),
       |$layers
       |SELECT
       |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |    AS node_type,
       |  (CASE WHEN node % 2 = 0 THEN node ELSE node - 1 END // 2)::BIGINT
       |    AS entity_id,
       |  rank
       |FROM pr4""".stripMargin
  }

  /** q21 oracle: 60-bit SHA-lane SimHash, mirroring [[Dedup.simhashPairsSha]]
    * (prefixBits=8 → bucket = fingerprint >> 52; Hamming ≤ 8). */
  private def simhashOracle: String = {
    val sums = (0 until 60).map(j =>
      s"CAST(sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS w_$j")
      .mkString(",\n    ")
    val fpSum = (0 until 60)
      .map(j => s"(CASE WHEN w_$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"""WITH toks AS (SELECT doc_id AS doc, unnest(str_split(text, ' ')) AS tok FROM documents),
       |h AS (SELECT doc, ${duckLane("tok")} AS h FROM toks),
       |w AS (SELECT doc,
       |    $sums
       |  FROM h GROUP BY doc),
       |fp AS (SELECT doc, CAST($fpSum AS BIGINT) AS simhash FROM w),
       |b AS (SELECT doc, simhash, simhash >> 52 AS bucket FROM fp)
       |SELECT a.doc AS doc_a, b2.doc AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b2.simhash)) AS BIGINT) AS hamming
       |FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.doc < b2.doc
       |WHERE bit_count(xor(a.simhash, b2.simhash)) <= 8""".stripMargin
  }

  /** q25 oracle: sign-LSH kNN with SHA-derived hyperplanes (2 tables ×
    * 8 bits over 64 dims), mirroring [[Knn.lshTopK]] with
    * [[Knn.lshSignatureSha]]. Plane weights come from the same
    * `sha256("t,p,d")` lanes; `list(w ORDER BY d)` + `list_dot_product`
    * keeps the projection accumulation order (and hence every sign bit)
    * identical. */
  private def lshKnnOracle: String = {
    val laneExpr = duckLane("t.range::VARCHAR || ',' || p.range::VARCHAR || ',' || d.range::VARCHAR")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |pw AS (
       |  SELECT t.range AS t, p.range AS p, d.range AS d,
       |    $laneExpr / 576460752303423488.0 - 1.0 AS w
       |  FROM range(0, 2) t, range(0, 8) p, range(0, 64) d),
       |pl AS (SELECT t, p, list(w ORDER BY d) AS pv FROM pw GROUP BY t, p),
       |sg AS (
       |  SELECT e.vec_id, pl.t,
       |    CAST(sum(CASE WHEN list_dot_product(e.v, pl.pv) >= 0
       |      THEN (1::BIGINT << pl.p) ELSE 0 END) AS BIGINT) AS sig
       |  FROM e CROSS JOIN pl GROUP BY e.vec_id, pl.t),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM sg q JOIN sg c ON q.t = c.t AND q.sig = c.sig AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 10),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
       |  FROM cand JOIN e a ON a.vec_id = cand.query_id JOIN e b ON b.vec_id = cand.neighbor_id)
       |SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, neighbor_id) AS rank FROM scored)
       |WHERE rank <= 5""".stripMargin
  }

  /** q60 oracle: PQ encoding over the SHA-lane codebook rebuilt from a
    * range(s)×range(c)×range(d) CTE (the q25 hyperplane pattern); sub
    * distances written as the same left-assoc 8-term sums Scala reduces,
    * argmin = rank by (dist, c) — first-minimum, matching array_position. */
  /** Shared q60/q80 oracle CTE chain: SHA-lane codebook (8×16×8), per-
    * (vec, subspace) L2 argmin code — ends at `r` (rn = 1 row = the
    * chosen code), mirroring [[Pq.shaCodebook]] + [[Pq.encodeCol]]. */
  private def pqCtes: String = {
    val dist = (0 until 8).map(dd =>
      s"(v[s*8+${dd + 1}] - cv[${dd + 1}]) * (v[s*8+${dd + 1}] - cv[${dd + 1}])")
      .mkString(" + ")
    val laneExpr = duckLane(
      "'pq|' || s.range::VARCHAR || ',' || c.range::VARCHAR || ',' || d.range::VARCHAR")
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE embedding IS NOT NULL),
       |cw AS (SELECT s.range AS s, c.range AS c, d.range AS d,
       |  $laneExpr / 576460752303423488.0 - 1.0 AS w
       |  FROM range(0, 8) s, range(0, 16) c, range(0, 8) d),
       |cb AS (SELECT s, c, list(w ORDER BY d) AS cv FROM cw GROUP BY s, c),
       |dist AS (SELECT e.vec_id, cb.s, cb.c, $dist AS dist
       |  FROM e CROSS JOIN cb),
       |r AS (SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s
       |  ORDER BY dist, c) AS rn FROM dist)""".stripMargin
  }

  private def pqOracle: String =
    s"""WITH $pqCtes
       |SELECT vec_id, s AS sub, c AS code FROM r WHERE rn = 1""".stripMargin

  /** Shared q23/q128 oracle: one-shot Okapi BM25 over the documents
    * corpus for the fixed 3-term query — q128's replayed incremental
    * index must serve exactly these corpus-wide statistics. */
  private def bm25Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id AS doc, unnest(str_split(text, ' ')) AS term FROM documents),
      |tf AS (
      |  SELECT doc, term, count(*) AS tf FROM toks
      |  WHERE term IN ('spark','join','fast') GROUP BY 1, 2),
      |dl AS (SELECT doc_id AS doc, len(str_split(text, ' '))::DOUBLE AS dl FROM documents),
      |corpus AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
      |SELECT tf.doc, round(sum(
      |  ln((n_docs::DOUBLE - df + 0.5) / (df + 0.5) + 1.0) *
      |  (tf::DOUBLE * 2.2) / (tf::DOUBLE + 1.2 * (0.25 + 0.75 * dl / avgdl))
      |), 4) AS bm25
      |FROM tf JOIN dfreq USING (term) JOIN dl USING (doc) CROSS JOIN corpus
      |GROUP BY tf.doc""".stripMargin

  /** q126 oracle: the ONE-SHOT IVF-PQ index + probe, rebuilt relationally
    * — q27's nearest-centroid assignment SQL over the q60 codebook/code
    * CTEs, probed with vec 0's embedding: top-4 lists by centroid cosine
    * (index-asc tie-break, [[Pq.probeLists]]'s rule), ADC distance =
    * per-subspace squared L2 between the query's subvector and each
    * vector's CHOSEN codeword, summed per vector. Replayed maintained
    * index == this one-shot build is the streaming operator's freshness
    * contract. */
  /** Shared CTE chain of the q133/q136/q139 oracles (the q27 IVF top-20
    * graded against q16's brute-force top-10 truth): IVF ranking (approx),
    * brute-force truth, per-query truth size (nrel) and the rank-flagged
    * join (f) — everything up to the metric fold itself. */
  private def retrievalCommonCtes: String =
    """e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      |assign AS (SELECT vec_id, v, cid FROM (
      |  SELECT e.vec_id, e.v, c.cid,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      list_dot_product(e.v, c.cv) /
      |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
      |      DESC, c.cid) AS rk
      |  FROM e CROSS JOIN cent c) WHERE rk = 1),
      |probe AS (SELECT qid, cid FROM (
      |  SELECT q.vec_id AS qid, c.cid,
      |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |      list_dot_product(q.v, c.cv) /
      |        (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.cv, c.cv)))
      |      DESC, c.cid) AS rk
      |  FROM e q CROSS JOIN cent c WHERE q.vec_id < 10) WHERE rk <= 4),
      |cand AS (SELECT p.qid AS query_id, a.vec_id AS neighbor_id,
      |    list_dot_product(qe.v, a.v) /
      |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(a.v, a.v))) AS cos
      |  FROM probe p JOIN assign a ON p.cid = a.cid
      |  JOIN e qe ON qe.vec_id = p.qid WHERE p.qid <> a.vec_id),
      |approx AS (SELECT query_id, neighbor_id, rank FROM (
      |    SELECT query_id, neighbor_id, row_number() OVER (
      |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |    FROM cand) WHERE rank <= 20),
      |truth AS (SELECT query_id, neighbor_id FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        list_dot_product(q.v, c.v) /
      |          (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))
      |        DESC, c.vec_id) AS rank
      |    FROM e q JOIN e c ON q.vec_id <> c.vec_id WHERE q.vec_id < 10)
      |  WHERE rank <= 10),
      |nrel AS (SELECT query_id, count(*)::BIGINT AS n_rel FROM truth GROUP BY 1),
      |f AS (SELECT a.query_id, a.rank, (t.neighbor_id IS NOT NULL) AS rel
      |  FROM approx a LEFT JOIN truth t ON a.query_id = t.query_id
      |    AND a.neighbor_id = t.neighbor_id)""".stripMargin

  private def retrievalEvalOracle: String =
    s"""WITH $retrievalCommonCtes,
      |pq AS (SELECT query_id,
      |    sum(CASE WHEN rel AND rank <= 10 THEN 1 ELSE 0 END)::BIGINT AS hits_at_k,
      |    min(CASE WHEN rel THEN rank END) AS first_rel_rank
      |  FROM f GROUP BY 1)
      |SELECT coalesce(pq.query_id, n.query_id) AS query_id,
      |  coalesce(n.n_rel, 0)::BIGINT AS n_rel,
      |  coalesce(pq.hits_at_k, 0)::BIGINT AS hits_at_k,
      |  round(coalesce(pq.hits_at_k, 0) / n.n_rel, 6) AS recall_at_k,
      |  round(coalesce(pq.hits_at_k, 0) / 10.0, 6) AS precision_at_k,
      |  round(coalesce(1.0 / pq.first_rel_rank, 0.0), 6) AS rr,
      |  (coalesce(pq.hits_at_k, 0) > 0) AS success_at_k
      |FROM pq FULL OUTER JOIN nrel n ON pq.query_id = n.query_id""".stripMargin

  private def vecIndexReplayOracle: String = {
    val qdist = (0 until 8).map(dd =>
      s"(q.q[r.s*8+${dd + 1}] - cb.cv[${dd + 1}]) * " +
        s"(q.q[r.s*8+${dd + 1}] - cb.cv[${dd + 1}])")
      .mkString(" + ")
    s"""WITH $pqCtes,
       |cent AS (SELECT vec_id AS cid, v AS cv2 FROM e WHERE vec_id < 16),
       |qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
       |assign AS (SELECT vec_id, cid FROM (
       |  SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY list_dot_product(e.v, c.cv2) /
       |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv2, c.cv2)))
       |    DESC, c.cid) AS rk FROM e CROSS JOIN cent c) WHERE rk = 1),
       |probe AS (SELECT cid FROM (
       |  SELECT c.cid, row_number() OVER (ORDER BY
       |    list_dot_product(q.q, c.cv2) /
       |      (sqrt(list_dot_product(q.q, q.q)) * sqrt(list_dot_product(c.cv2, c.cv2)))
       |    DESC, c.cid) AS rk FROM cent c CROSS JOIN qv q) WHERE rk <= 4),
       |adcsub AS (SELECT r.vec_id, r.s, $qdist AS sd
       |  FROM r JOIN cb ON r.s = cb.s AND r.c = cb.c CROSS JOIN qv q
       |  WHERE r.rn = 1),
       |-- ordered sequential fold, NOT sum(): the rank below orders by the
       |-- RAW double, and a parallel group-sum's accumulation order is
       |-- nondeterministic — near-tied candidates would permute run to run
       |-- (observed once at sf0.01: ranks 6..8 tie at 6dp). list(ORDER BY s)
       |-- + list_aggregate reproduces Spark's left-to-right subspace fold
       |-- bit-for-bit.
       |adc AS (SELECT a.vec_id,
       |  list_aggregate(list(a.sd ORDER BY a.s), 'sum') AS adc_dist
       |  FROM adcsub a JOIN assign USING (vec_id) JOIN probe USING (cid)
       |  GROUP BY a.vec_id)
       |SELECT vec_id AS neighbor_id, rank, round(adc_dist, 6) AS adc_dist FROM (
       |  SELECT vec_id, adc_dist,
       |    row_number() OVER (ORDER BY adc_dist, vec_id) AS rank FROM adc)
       |WHERE rank <= 10""".stripMargin
  }

  /** q80 oracle: decode the chosen codes back through the codebook
    * (flatten in subspace order) and compare to the original by round-4
    * cosine — [[Pq.encodeCol]]'s reconstruction-fidelity audit. */
  private def pqDistortionOracle: String =
    s"""WITH $pqCtes,
       |dec AS (
       |  SELECT vec_id, flatten(list(cv ORDER BY s)) AS vhat FROM (
       |    SELECT r.vec_id, r.s, cb.cv FROM r JOIN cb
       |    ON r.s = cb.s AND r.c = cb.c WHERE r.rn = 1)
       |  GROUP BY vec_id)
       |SELECT e.vec_id,
       |  round(list_dot_product(e.v, d.vhat) /
       |    (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(d.vhat, d.vhat))), 4)
       |    AS recon_cosine
       |FROM e JOIN dec d USING (vec_id)""".stripMargin

  /** q140/q218 shared oracle: the merged MAUDE ingest state recomputed
    * one-shot — the staging transform of the LATEST report per key,
    * straight from the base columns the NDJSON payload was built from.
    * Shared because the state is micro-batch-split-invariant: q140's
    * three time-sliced drops and q218's file-capped streaming catch-up
    * must both land exactly here. */
  private def maudeStateOracle: String =
    """WITH o AS (SELECT o_orderkey AS seq, o_orderkey % 1000 AS rk,
      |    o_orderdate FROM orders),
      |last AS (SELECT seq, rk, o_orderdate FROM (
      |    SELECT *, row_number() OVER (PARTITION BY rk ORDER BY seq DESC)
      |      AS rn FROM o) WHERE rn = 1)
      |SELECT printf('MDR%07d', rk) AS mdr_report_key,
      |  'RN-' || seq AS report_number,
      |  CASE WHEN seq % 97 = 0 THEN NULL
      |    ELSE strftime(o_orderdate::DATE, '%Y-%m-%d') END AS date_received,
      |  CASE seq % 5 WHEN 0 THEN 'Injury' WHEN 1 THEN 'Malfunction'
      |    WHEN 2 THEN 'Death' WHEN 3 THEN 'No Answer Provided'
      |    ELSE 'Other' END AS event_type,
      |  printf('P%02d', seq % 40) AS product_code,
      |  list_extract(['ACME CORP', 'acme corp', 'MedTech GmbH',
      |    'ZETA DEVICES', 'NoSuch Inc'], seq % 5 + 1) AS manufacturer_name,
      |  'Brand' || (seq % 12) AS brand_name,
      |  length(list_extract(['routine operation reported',
      |      'leak detected near valve',
      |      'pump fracture and break observed',
      |      'thrombus noted on lead'], seq % 4 + 1)
      |    || chr(10) || 'detail fragment ' || seq)::BIGINT AS narrative_len,
      |  seq::BIGINT AS seq
      |FROM last""".stripMargin

  /** q62 oracle: the full corpus pipeline composed from the q53 quality
    * CTEs, the q61 repetition metrics, the q55 decontamination join, the
    * q14 dedup keep-set, the q43 quota window, the q57 split thresholds
    * and the q53 prefix-sum packing. The `wv` CTE mirrors the Spark
    * side's corpus-scaled shingle width (3 + max(0, ⌊log10(n/500)⌋)) so
    * the one static SQL verifies every scale factor. */
  private def corpusBuild2Oracle: String =
    s"""WITH wv AS (SELECT CAST(3 + greatest(0,
       |    floor(log10(greatest(count(*), 1) / 500.0))) AS INT) AS w
       |  FROM documents),
       |t AS (SELECT doc_id, source, text, str_split(text, ' ') AS toks FROM documents),
       |m AS (SELECT doc_id, source, text, toks,
       |  len(toks) AS n,
       |  list_aggregate(list_transform(toks, x -> length(x)), 'sum') / len(toks) AS avg_len,
       |  len(list_filter(toks, x -> x IN ('the','a','of','to','in','and','is','it','on','for'))) / len(toks) AS stop_ratio,
       |  len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS distinct_ratio,
       |  greatest(len(toks) - 1, 0) AS t2,
       |  len(list_distinct([toks[i] || ' ' || toks[i+1]
       |    for i in range(1, len(toks))])) AS d2,
       |  greatest(len(toks) - 2, 0) AS t3,
       |  len(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
       |    for i in range(1, len(toks) - 1)])) AS d3,
       |  list_max(list_transform(list_distinct(toks),
       |    x -> len(list_filter(toks, y -> y = x)))) AS topcnt
       |FROM t),
       |f AS (SELECT *,
       |  CASE WHEN t2 > 0 THEN CAST(t2 - d2 AS DOUBLE) / CAST(t2 AS DOUBLE)
       |       ELSE 0.0 END AS f2,
       |  CASE WHEN t3 > 0 THEN CAST(t3 - d3 AS DOUBLE) / CAST(t3 AS DOUBLE)
       |       ELSE 0.0 END AS f3,
       |  CAST(topcnt AS DOUBLE) / CAST(n AS DOUBLE) AS tt FROM m),
       |q AS (SELECT doc_id, source, text, toks FROM f
       |  WHERE doc_id % 17 <> 0
       |    AND n BETWEEN 30 AND 100000 AND avg_len BETWEEN 3.0 AND 10.0
       |    AND stop_ratio >= 0.05 AND distinct_ratio >= 0.3
       |    AND NOT (f2 > CAST(0.2 AS DOUBLE) OR f3 > CAST(0.15 AS DOUBLE)
       |      OR tt > CAST(0.2 AS DOUBLE))),
       |ev AS (SELECT toks FROM t WHERE doc_id % 17 = 0),
       |evs AS (SELECT DISTINCT unnest(
       |    [array_to_string(toks[i:i+wv.w-1], ' ') for i in range(1, len(toks)-wv.w+2)]) AS sh
       |  FROM ev, wv WHERE len(toks) >= wv.w),
       |trs AS (SELECT doc_id, unnest(list_distinct(
       |    [array_to_string(toks[i:i+wv.w-1], ' ') for i in range(1, len(toks)-wv.w+2)])) AS sh
       |  FROM q, wv WHERE len(toks) >= wv.w),
       |hits AS (SELECT tr.doc_id, count(e.sh) AS n_hit
       |  FROM trs tr LEFT JOIN evs e ON tr.sh = e.sh GROUP BY tr.doc_id),
       |cl AS (SELECT q.* FROM q LEFT JOIN hits USING (doc_id)
       |  WHERE coalesce(n_hit, 0) < 2),
       |k AS (SELECT min(doc_id) AS doc_id FROM cl GROUP BY text),
       |dd AS (SELECT cl.* FROM cl JOIN k USING (doc_id)),
       |r AS (SELECT doc_id, source, toks,
       |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk FROM dd),
       |qt AS (SELECT doc_id, source, toks FROM r WHERE rk <= 20),
       |sp AS (SELECT doc_id, source,
       |  CASE WHEN lane < 0.8 * 1152921504606846976.0 THEN 'train'
       |       WHEN lane < (0.8 + 0.1) * 1152921504606846976.0 THEN 'val'
       |       ELSE 'test' END AS split,
       |  CAST(len(toks) AS BIGINT) AS n_tokens
       |  FROM (SELECT *, CAST(${duckLane("'split|' || doc_id::VARCHAR")} AS DOUBLE) AS lane
       |        FROM qt)),
       |p AS (SELECT doc_id, source, split, n_tokens,
       |  coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |FROM sp)
       |SELECT doc_id, source, split, n_tokens,
       |  CAST(floor(cum_before / 2048.0) AS BIGINT) AS chunk_id FROM p""".stripMargin

  /** q46 oracle: sign-LSH bucketed near-dup pairs over the same
    * SHA-derived hyperplanes as q25 (2 tables × 8 bits over 64 dims):
    * candidates are pairs colliding in any (table, signature) bucket,
    * each verified by exact cosine ≥ 0.3 — mirroring
    * [[Dedup.lshNearDupPairs]] with [[Knn.lshSignatureSha]]. */
  private def lshNearDupOracle: String = {
    val laneExpr = duckLane("t.range::VARCHAR || ',' || p.range::VARCHAR || ',' || d.range::VARCHAR")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |pw AS (
       |  SELECT t.range AS t, p.range AS p, d.range AS d,
       |    $laneExpr / 576460752303423488.0 - 1.0 AS w
       |  FROM range(0, 2) t, range(0, 8) p, range(0, 64) d),
       |pl AS (SELECT t, p, list(w ORDER BY d) AS pv FROM pw GROUP BY t, p),
       |sg AS (
       |  SELECT e.vec_id, pl.t,
       |    CAST(sum(CASE WHEN list_dot_product(e.v, pl.pv) >= 0
       |      THEN (1::BIGINT << pl.p) ELSE 0 END) AS BIGINT) AS sig
       |  FROM e CROSS JOIN pl GROUP BY e.vec_id, pl.t),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM sg a JOIN sg b ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, cosine FROM (
       |  SELECT cand.id_a, cand.id_b,
       |    round(list_dot_product(x.v, y.v) /
       |      (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6) AS cosine
       |  FROM cand JOIN e x ON x.vec_id = cand.id_a JOIN e y ON y.vec_id = cand.id_b)
       |WHERE cosine >= 0.3""".stripMargin
  }

  /** q47 oracle: two unrolled Lloyd iterations mirroring
    * [[Knn.kmeansCentroidsSha]] (k = 8, dim = 64). Init = the 8 vectors
    * with the smallest SHA lane of the string id; assignment = cosine
    * argmax with ties to the lowest cid (bit-identical cosines — the
    * [[graft.functions.Vec.cosine]] oracle contract); means per
    * (cid, pos) with empty clusters keeping the previous centroid;
    * output rounded to 4dp (means differ across engines only by fp
    * accumulation order). */
  /** Cosine-argmax assignment of each `e` row against centroid table
    * `prev` (ties to the lowest cid) — one Lloyd assignment step as a
    * DuckDB CTE, shared by the q47/q65 oracles. */
  private def kmeansAssignCte(prev: String, a: String): String =
    s"""$a AS (
       |  SELECT vec_id, v, cid FROM (
       |    SELECT e.vec_id, e.v, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        list_dot_product(e.v, c.v) /
       |          (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.v, c.v))) DESC,
       |        c.cid ASC) AS rn
       |    FROM e CROSS JOIN $prev c) WHERE rn = 1)"""

  /** The shared q47/q65 oracle CTE chain: embeddings → SHA-lane init →
    * two unrolled Lloyd iterations, ending at centroid table `c2`
    * (mirrors [[Knn.kmeansCentroidsSha]], k = 8, dim = 64). */
  private def kmeansCtes: String = {
    val lane = duckLane("vec_id::VARCHAR")
    def iter(prev: String, a: String, m: String, next: String): String =
      s"""${kmeansAssignCte(prev, a)},
         |$m AS (
         |  SELECT cid, r.range AS pos, avg(v[r.range + 1]) AS val
         |  FROM $a CROSS JOIN range(0, 64) r GROUP BY cid, r.range),
         |$next AS (
         |  SELECT p.cid, list(coalesce(m.val, p.v[r.range + 1]) ORDER BY r.range) AS v
         |  FROM $prev p CROSS JOIN range(0, 64) r
         |  LEFT JOIN $m m ON m.cid = p.cid AND m.pos = r.range
         |  GROUP BY p.cid)"""
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ini AS (
       |  SELECT vec_id, v, $lane AS lane FROM e ORDER BY lane, vec_id LIMIT 8),
       |c0 AS (
       |  SELECT row_number() OVER (ORDER BY lane, vec_id) - 1 AS cid, v FROM ini),
       |${iter("c0", "a1", "m1", "c1")},
       |${iter("c1", "a2", "m2", "c2")}""".stripMargin
  }

  private def kmeansOracle: String =
    s"""WITH $kmeansCtes
       |SELECT cid::BIGINT AS cid, r.range::BIGINT AS pos,
       |  round(c2.v[r.range + 1], 4) AS c
       |FROM c2 CROSS JOIN range(0, 64) r""".stripMargin

  /** q67 oracle (also the q78 CTE): DSIR weights — distinct bigram
    * SHA-lane buckets (mod 256), doc-frequency distributions over target
    * (lang='en') vs raw, add-0.5 smoothing, round(avg, 4). The outer
    * comprehension variable must NOT be `i`: duckLane's hex-parse
    * comprehension binds `i` and would shadow it. */
  private def dsirOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang = 'en' AS is_target, str_split(text, ' ') AS toks
       |  FROM documents WHERE text IS NOT NULL),
       |s AS (
       |  SELECT doc_id, is_target, unnest(list_distinct(
       |    [${duckLane("toks[gi] || ' ' || toks[gi+1]")} % 256 for gi in range(1, len(toks))])) AS b
       |  FROM t WHERE len(toks) >= 2),
       |c AS (SELECT b, count(*) AS c_raw,
       |    sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_tgt
       |  FROM s GROUP BY 1),
       |tot AS (SELECT sum(c_raw)::DOUBLE AS n_raw, sum(c_tgt)::DOUBLE AS n_tgt FROM c)
       |SELECT doc_id, is_target, count(*)::BIGINT AS n_feats,
       |  round(avg(ln((c_tgt::DOUBLE + 0.5) / (n_tgt + 128.0)) -
       |            ln((c_raw::DOUBLE + 0.5) / (n_raw + 128.0))), 4) AS dsir_logweight
       |FROM s JOIN c USING (b) CROSS JOIN tot
       |GROUP BY doc_id, is_target""".stripMargin

  /** q65 oracle: assign every vector against the trained `c2` centroids,
    * then NOT EXISTS a smaller-id cluster-mate at round-6 cosine ≥ 0.3 —
    * the [[Dedup.semanticDedup]] drop rule verbatim. */
  private def semanticDedupOracle: String =
    s"""WITH $kmeansCtes,
       |${kmeansAssignCte("c2", "asg")}
       |SELECT s.vec_id, s.cid::BIGINT AS cid, NOT EXISTS (
       |  SELECT 1 FROM asg o WHERE o.cid = s.cid AND o.vec_id < s.vec_id
       |    AND round(list_dot_product(o.v, s.v) /
       |      (sqrt(list_dot_product(o.v, o.v)) * sqrt(list_dot_product(s.v, s.v))), 6) >= 0.3
       |) AS kept
       |FROM asg s""".stripMargin

  /** q28 oracle: SHA-lane codec features through the same math as
    * [[Multimodal.ShaCodec]] — lane → [-1,1) → FLOAT quantize → DOUBLE,
    * then a sequential-accumulation norm. */
  private def multimodalOracle: String = {
    val fv = (0 until 16).map(dd =>
      s"CAST(CAST(${duckLane(s"text || '|$dd'")} / 576460752303423488.0 - 1.0 AS REAL) AS DOUBLE)")
      .mkString("[\n    ", ",\n    ", "]")
    s"""SELECT asset_id, modality, n_bytes, round(sqrt(list_dot_product(fv, fv)), 4) AS feat_norm
       |FROM (
       |  SELECT doc_id AS asset_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'image'
       |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |    $fv AS fv
       |  FROM documents)""".stripMargin
  }

  /** q40 oracle: window-rank KMV over SHA lanes — the executable spec of
    * the [[graft.functions.expressions.KmvSketch]] aggregate (identical
    * estimates: both keep the k smallest distinct lanes). */
  private def kmvOracle: String =
    s"""WITH toks AS (SELECT lang, unnest(str_split(text, ' ')) AS token FROM documents),
       |h AS (SELECT DISTINCT lang, ${duckLane("token")} AS lane FROM toks),
       |r AS (SELECT lang, lane,
       |    row_number() OVER (PARTITION BY lang ORDER BY lane) AS rn FROM h),
       |kk AS (SELECT lang, count(*) AS n_kept, max(lane) AS lane_k
       |  FROM r WHERE rn <= 256 GROUP BY lang)
       |SELECT lang, round(CASE WHEN n_kept < 256 THEN CAST(n_kept AS DOUBLE)
       |  ELSE 255.0 / ((CAST(lane_k AS DOUBLE) + 1.0) / 1152921504606846977.0) END, 4) AS est_distinct
       |FROM kk""".stripMargin

  /** q160/q162 shared oracle: the batch CUSUM pipeline — q162 gates
    * its incrementally-maintained replay against this exact text. */
  private val cusumOracle: String =
        """WITH daily AS (
          |  SELECT event_type,
          |         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
          |         count(*) AS n
          |  FROM events GROUP BY 1, 2
          |), rk AS (
          |  SELECT *, row_number() OVER (PARTITION BY event_type
          |    ORDER BY day) AS rn
          |  FROM daily
          |), mu AS (
          |  SELECT event_type, CAST(floor(avg(n)) AS DOUBLE) AS mu0
          |  FROM rk WHERE rn <= 14 GROUP BY event_type
          |), d2 AS (
          |  SELECT d.event_type, d.day, d.n, mu.mu0,
          |         d.n - mu.mu0 - 0.5 AS dev
          |  FROM daily d JOIN mu USING (event_type)
          |), s2 AS (
          |  SELECT *, sum(dev) OVER (PARTITION BY event_type
          |    ORDER BY day) AS s
          |  FROM d2
          |), c2 AS (
          |  SELECT *, s - least(min(s) OVER (PARTITION BY event_type
          |    ORDER BY day), 0.0) AS cusum
          |  FROM s2
          |)
          |SELECT event_type,
          |       strftime(DATE '1970-01-01' + CAST(day AS INTEGER),
          |         '%Y-%m-%d') AS d,
          |       CAST(n AS BIGINT) AS n, mu0, s, cusum,
          |       CAST(cusum > 24.0 AS BIGINT) AS alarm
          |FROM c2""".stripMargin

  /** Shared by q167 (batch) and q180 (replay-maintained). */
  private def driftOracle: String =
    """WITH e AS (SELECT event_type, value,
        |             (ts < TIMESTAMP '2024-01-16') AS ina FROM events),
        |u AS (SELECT 'event_type' AS dim, event_type AS bin, ina FROM e
        |      UNION ALL
        |      SELECT 'value_band',
        |             CAST(CAST(floor(value / 50) AS BIGINT) AS VARCHAR), ina
        |      FROM e),
        |t AS (SELECT dim, bin,
        |        sum(CASE WHEN ina THEN 1 ELSE 0 END) AS n_a,
        |        sum(CASE WHEN ina THEN 0 ELSE 1 END) AS n_b
        |      FROM u GROUP BY 1, 2),
        |w AS (SELECT dim, bin, n_a, n_b,
        |        sum(n_a) OVER (PARTITION BY dim) AS ta,
        |        sum(n_b) OVER (PARTITION BY dim) AS tb
        |      FROM t),
        |s AS (SELECT dim, bin, n_a, n_b, ta, tb,
        |        CAST(n_a AS DOUBLE) / CAST(ta AS DOUBLE) AS p_a,
        |        CAST(n_b AS DOUBLE) / CAST(tb AS DOUBLE) AS p_b,
        |        CAST(n_a + n_b AS DOUBLE) * CAST(ta AS DOUBLE)
        |          / CAST(ta + tb AS DOUBLE) AS ea,
        |        CAST(n_a + n_b AS DOUBLE) * CAST(tb AS DOUBLE)
        |          / CAST(ta + tb AS DOUBLE) AS eb
        |      FROM w)
        |SELECT dim, bin, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |       p_a, p_b,
        |       CASE WHEN n_a > 0 AND n_b > 0
        |            THEN round((p_a - p_b) * ln(p_a / p_b), 6) END AS psi_term,
        |       (CAST(n_a AS DOUBLE) - ea) * (CAST(n_a AS DOUBLE) - ea) / ea
        |         + (CAST(n_b AS DOUBLE) - eb) * (CAST(n_b AS DOUBLE) - eb) / eb
        |         AS chi2_term
        |FROM s""".stripMargin

  /** q181: the same 4 peel rounds unrolled as chained SQL layers —
    * bounded-round semantics make "unrolled" exact, not approximate.
    * Every CTE is MATERIALIZED: each round references the previous edge
    * set THREE times (two degree-union legs + the probe), so left to
    * its inlining heuristic DuckDB re-expands the chain 3^4-fold — at
    * sf0.1 that filled >70 GB of spill before failing; materialization
    * is the same fix the Spark side's per-round localCheckpoint is. */
  private def kcoreOracle: String = {
    val rounds = (1 to 4).map { i =>
      s"""d$i AS MATERIALIZED (SELECT n, count(*) AS deg FROM (
         |        SELECT a AS n FROM e${i - 1}
         |        UNION ALL SELECT b FROM e${i - 1}) GROUP BY 1),
         |k$i AS MATERIALIZED (SELECT n FROM d$i WHERE deg >= 20),
         |e$i AS MATERIALIZED (SELECT e.a, e.b FROM e${i - 1} e
         |        JOIN k$i x ON e.a = x.n JOIN k$i y ON e.b = y.n),"""
        .stripMargin
    }.mkString("\n")
    s"""WITH pairs AS MATERIALIZED (SELECT DISTINCT o_custkey * 2 AS c,
       |                 l_suppkey * 2 + 1 AS s
       |               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e0 AS MATERIALIZED (SELECT least(c, s) AS a, greatest(c, s) AS b
       |               FROM pairs),
       |$rounds
       |fin AS (SELECT n, count(*) AS deg FROM (
       |          SELECT a AS n FROM e4 UNION ALL SELECT b FROM e4) GROUP BY 1)
       |SELECT CASE WHEN n % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |         AS node_type,
       |       ((CASE WHEN n % 2 = 0 THEN n ELSE n - 1 END) // 2)::BIGINT
       |         AS entity_id,
       |       CAST(deg AS BIGINT) AS degree
       |FROM fin""".stripMargin
  }

  /** Shared by q191 (batch) and q194 (replay-maintained): the cells are
    * linear sums, so both sides reduce to the same derivation. */
  private def woeIvOracle: String =
    """WITH e AS (SELECT CAST(floor(value / 50) AS BIGINT) AS bin,
      |        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |      FROM events),
      |c AS (SELECT bin, sum(y) AS n_pos, sum(1 - y) AS n_neg
      |      FROM e GROUP BY 1),
      |t AS (SELECT sum(n_pos) AS tp, sum(n_neg) AS tn FROM c),
      |s AS (SELECT bin, n_pos, n_neg,
      |        (CAST(n_pos AS DOUBLE) + 0.5) / (CAST(tp AS DOUBLE) + 0.5)
      |          AS pp,
      |        (CAST(n_neg AS DOUBLE) + 0.5) / (CAST(tn AS DOUBLE) + 0.5)
      |          AS pn
      |      FROM c CROSS JOIN t)
      |SELECT bin, CAST(n_pos AS BIGINT) AS n_pos,
      |       CAST(n_neg AS BIGINT) AS n_neg,
      |       round(ln(pp / pn), 6) AS woe,
      |       round((pp - pn) * ln(pp / pn), 6) AS iv_term
      |FROM s""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q41_stratified_sample" ->
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang,
         |    ${duckLane("'sample|' || doc_id::VARCHAR")} AS lane,
         |    CASE WHEN lang = 'en' THEN 0.5 ELSE 0.2 END AS rate
         |  FROM documents)
         |WHERE CAST(lane AS DOUBLE) < rate * 1152921504606846976.0""".stripMargin,

    "q42_keep_latest" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_sec
        |  FROM events)
        |SELECT user_id, event_id, ts_sec FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts_sec DESC, event_id DESC) AS rn FROM ev)
        |WHERE rn = 1""".stripMargin,

    "q43_source_quota" ->
      """SELECT source, doc_id, rk FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 10""".stripMargin,

    "q44_pii_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{4,}', '<NUM>', 'g') AS scrubbed
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN text || ' contact 123456789 or bob.smith@example.com now'
        |      ELSE text END AS t
        |  FROM documents)""".stripMargin,

    "q45_tfidf_topterms" ->
      """WITH toks AS (SELECT doc_id AS doc, unnest(str_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT doc, term,
        |    round(tf::DOUBLE * ln(n_docs::DOUBLE / df::DOUBLE), 6) AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |SELECT doc, term, tfidf, rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc
        |    ORDER BY tfidf DESC, term) AS rk FROM s)
        |WHERE rk <= 3""".stripMargin,

    "q20_minhash_lsh" -> minhashOracle,
    "q50_lsh_admit" -> lshAdmitOracle,
    "q51_zorder" -> zorderOracle,
    "q107_zone_map" -> zoneMapOracle,
    "q108_ewma" -> ewmaOracle,

    "q109_k_anonymity" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |  count(*) AS n, count(DISTINCT user_id) AS l,
        |  count(*) >= 20 AS k_anonymous,
        |  count(DISTINCT user_id) >= 5 AS l_diverse
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q52_cms_counts" -> cmsCountsOracle,
    // q119: identical oracle — CMS is a LINEAR sketch, so the replayed
    // per-batch counter deltas sum to counters bit-equal to the one-shot
    // sketch over everything.
    "q119_cms_replay" -> cmsCountsOracle,

    // q126: the one-shot IVF-PQ rebuild — replayed batch-partitioned
    // index == one-shot index because writes are per-batch-partition and
    // assignment/encode are per-row (no cross-batch state at all)
    "q126_vec_index_replay" -> vecIndexReplayOracle,

    // q127: greedy earliest-match funnel rebuilt relationally under the
    // STREAM's own order key (event-time millis, event_id — Timestamp
    // .getTime semantics, vs q73's micros): stage k+1 is the first
    // step-event strictly after stage k's match in (ms, event_id) order.
    // One row per stage actually reached; replay == one-shot because the
    // time-sliced batches preserve that global order.
    "q127_funnel_replay" ->
      """WITH ev AS (SELECT user_id, epoch_ns(ts) // 1000000 AS ms,
        |    event_id, event_type
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |s1 AS (SELECT user_id, ms, event_id FROM (
        |  SELECT user_id, ms, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ms, event_id)
        |      AS rk
        |  FROM ev WHERE event_type = 'view') WHERE rk = 1),
        |s2 AS (SELECT user_id, ms, event_id FROM (
        |  SELECT e.user_id, e.ms, e.event_id,
        |    row_number() OVER (PARTITION BY e.user_id
        |      ORDER BY e.ms, e.event_id) AS rk
        |  FROM ev e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click'
        |    AND (e.ms > s1.ms OR (e.ms = s1.ms AND e.event_id > s1.event_id)))
        |  WHERE rk = 1),
        |s3 AS (SELECT user_id, ms, event_id FROM (
        |  SELECT e.user_id, e.ms, e.event_id,
        |    row_number() OVER (PARTITION BY e.user_id
        |      ORDER BY e.ms, e.event_id) AS rk
        |  FROM ev e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND (e.ms > s2.ms OR (e.ms = s2.ms AND e.event_id > s2.event_id)))
        |  WHERE rk = 1)
        |SELECT user_id, CAST(1 AS BIGINT) AS stage, ms AS ts_ms,
        |  FALSE AS converted FROM s1
        |UNION ALL SELECT user_id, CAST(2 AS BIGINT), ms, FALSE FROM s2
        |UNION ALL SELECT user_id, CAST(3 AS BIGINT), ms, TRUE FROM s3""".stripMargin,
    "q53_corpus_build" ->
      """WITH t AS (SELECT doc_id, source, text, str_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT doc_id, source, text, toks,
        |  len(toks) AS n,
        |  list_aggregate(list_transform(toks, x -> length(x)), 'sum') / len(toks) AS avg_len,
        |  len(list_filter(toks, x -> x IN ('the','a','of','to','in','and','is','it','on','for'))) / len(toks) AS stop_ratio,
        |  len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS distinct_ratio
        |FROM t),
        |q AS (SELECT doc_id, source, text, toks FROM m
        |  WHERE n BETWEEN 30 AND 100000 AND avg_len BETWEEN 3.0 AND 10.0
        |    AND stop_ratio >= 0.05 AND distinct_ratio >= 0.3),
        |k AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY text),
        |d AS (SELECT q.* FROM q JOIN k USING (doc_id)),
        |r AS (SELECT doc_id, source, toks,
        |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk FROM d),
        |qt AS (SELECT doc_id, source, rk, CAST(len(toks) AS BIGINT) AS n_tokens
        |  FROM r WHERE rk <= 25),
        |p AS (SELECT doc_id, source, rk, n_tokens,
        |  coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |FROM qt)
        |SELECT doc_id, source, rk, n_tokens,
        |  CAST(floor(cum_before / 2048.0) AS BIGINT) AS chunk_id FROM p""".stripMargin,
    "q54_quantize_i8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |s AS (SELECT vec_id, v,
        |  coalesce(list_max(list_transform(v, x -> abs(x))), 0.0) AS sc FROM e),
        |p AS (SELECT vec_id, sc, r.range AS pos, v[r.range + 1] AS x
        |  FROM s CROSS JOIN range(0, 64) r)
        |SELECT vec_id, round(sc, 6) AS q8_scale, pos,
        |  CASE WHEN sc = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST(round(x / sc * 127.0) AS BIGINT) END AS q
        |FROM p""".stripMargin,
    "q55_decontaminate" ->
      """WITH tr AS (SELECT doc_id, text, str_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id % 17 <> 0),
        |ev AS (SELECT str_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id % 17 = 0),
        |trs AS (SELECT doc_id AS doc, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks)-1)])) AS sh
        |  FROM tr WHERE len(toks) >= 3),
        |evs AS (SELECT DISTINCT unnest(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks)-1)]) AS sh
        |  FROM ev WHERE len(toks) >= 3),
        |agg AS (SELECT t.doc, count(*) AS n_shingles, count(e.sh) AS n_hit
        |  FROM trs t LEFT JOIN evs e ON t.sh = e.sh GROUP BY t.doc)
        |SELECT doc, n_shingles, n_hit, n_hit >= 2 AS contaminated FROM agg
        |UNION ALL
        |SELECT doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT), false
        |FROM tr WHERE text IS NULL OR len(toks) < 3""".stripMargin,

    "q56_bloom_admit" ->
      """WITH corpus AS (SELECT DISTINCT text FROM documents
        |  WHERE doc_id % 7 <> 0 AND text IS NOT NULL),
        |b AS (
        |  SELECT doc_id + 1000000 AS doc, text FROM documents WHERE doc_id % 7 = 3
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc, text || ' batch-novel' AS text
        |  FROM documents WHERE doc_id % 7 = 0)
        |SELECT b.doc, (c.text IS NULL) AS admitted
        |FROM b LEFT JOIN corpus c ON b.text = c.text""".stripMargin,

    // thresholds written as the same double SUMS Scala's scanLeft
    // accumulates (0.8 + 0.1 != 0.9 in IEEE double) so both engines
    // compare lanes against bit-identical bounds
    "q57_train_split" ->
      s"""SELECT doc_id, source,
         |  CASE WHEN lane < 0.8 * 1152921504606846976.0 THEN 'train'
         |       WHEN lane < (0.8 + 0.1) * 1152921504606846976.0 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, source,
         |  CAST(${duckLane("'split|' || doc_id::VARCHAR")} AS DOUBLE) AS lane
         |  FROM documents)""".stripMargin,

    "q58_doc_chunks" ->
      """WITH t AS (SELECT doc_id AS doc, str_split(text, ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |w AS (SELECT doc, toks,
        |  CASE WHEN len(toks) <= 64 THEN 1
        |       ELSE CAST(ceil((len(toks) - 64) / 48.0) AS BIGINT) + 1 END AS nwin
        |  FROM t),
        |c AS (SELECT doc, toks, unnest(range(nwin)) AS chunk_id FROM w)
        |SELECT doc, chunk_id,
        |  CAST(len(toks[chunk_id*48 + 1 : chunk_id*48 + 64]) AS BIGINT) AS n_tokens,
        |  array_to_string(toks[chunk_id*48 + 1 : chunk_id*48 + 64], ' ') AS chunk_text
        |FROM c""".stripMargin,

    "q59_passage_dedup" ->
      """WITH sp AS (SELECT doc_id AS doc, str_split(text, '. ') AS l
        |  FROM documents WHERE text IS NOT NULL),
        |p AS (SELECT doc, CAST(len(l) AS BIGINT) AS n_passages,
        |  unnest(l) AS passage, unnest(range(len(l))) AS pos FROM sp),
        |r AS (SELECT *, row_number() OVER (PARTITION BY passage
        |  ORDER BY doc, pos) AS rn FROM p)
        |SELECT doc, any_value(n_passages) AS n_passages, count(*) AS n_kept,
        |  string_agg(passage, '. ' ORDER BY pos) AS clean_text
        |FROM r WHERE rn = 1 GROUP BY doc""".stripMargin,

    "q21_simhash_pairs" -> simhashOracle,
    "q25_lsh_knn" -> lshKnnOracle,
    "q46_lsh_neardup" -> lshNearDupOracle,
    "q60_pq_codes" -> pqOracle,
    "q80_pq_distortion" -> pqDistortionOracle,

    // q81: same word-frequency-weighted adjacent char-pair counts; the
    // top-30 cut is deterministic under the (cnt desc, pair asc) tiebreak
    "q81_bpe_pairs" ->
      """WITH w AS (SELECT unnest(str_split(text, ' ')) AS w
        |  FROM documents WHERE text IS NOT NULL),
        |wc AS (SELECT w, count(*) AS c FROM w WHERE length(w) >= 2 GROUP BY 1),
        |p AS (SELECT unnest([substr(w, i, 2) for i in range(1, length(w))]) AS pair, c
        |  FROM wc)
        |SELECT pair, sum(c)::BIGINT AS cnt FROM p GROUP BY 1
        |ORDER BY cnt DESC, pair ASC LIMIT 30""".stripMargin,

    // q82: the same digest-compare classification; || propagates NULL
    // text exactly like Spark's concat, and IS DISTINCT FROM mirrors the
    // null-safe <=> comparison
    "q82_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, sha256(text) AS d_old FROM documents
        |  WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id, sha256(CASE WHEN doc_id % 11 = 0
        |    THEN text || ' rev2' ELSE text END) AS d_new
        |  FROM documents WHERE doc_id % 5 <> 0)
        |SELECT doc_id, status FROM (
        |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN n.doc_id IS NULL THEN 'removed'
        |         WHEN o.d_old IS DISTINCT FROM n.d_new THEN 'changed'
        |    END AS status
        |  FROM o FULL JOIN n ON o.doc_id = n.doc_id)
        |WHERE status IS NOT NULL""".stripMargin,

    // q83: the q20 SHA banded-LSH candidate CTEs, then unbounded
    // levenshtein + a <= filter — the same pair set as Spark's
    // threshold-banded kernel (which returns -1 past the bound)
    "q83_edit_distance" ->
      s"""$minhashSigCte,
         |cand AS (
         |  SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
         |  FROM bk x JOIN bk y ON x.band = y.band AND x.v0 = y.v0 AND x.v1 = y.v1
         |    AND x.v2 = y.v2 AND x.v3 = y.v3 AND x.doc < y.doc)
         |SELECT doc_a AS id_a, doc_b AS id_b,
         |  levenshtein(a.text, b.text)::BIGINT AS dist
         |FROM cand JOIN documents a ON doc_a = a.doc_id
         |  JOIN documents b ON doc_b = b.doc_id
         |WHERE levenshtein(a.text, b.text) <= 100""".stripMargin,

    // q84: the identical exponential-race key — (lane+1)/2^60 ∈ (0,1],
    // -ln(u)/w — ranked per source; the race key itself is not emitted,
    // so sub-ulp ln() library drift can only matter at an exact rank-5
    // boundary tie (probability ~0 over continuous keys)
    "q84_weighted_sample" ->
      s"""WITH d AS (SELECT source, doc_id,
         |    len(str_split(text, ' '))::BIGINT AS n_tok,
         |    'ws|' || doc_id::VARCHAR AS k
         |  FROM documents WHERE text IS NOT NULL),
         |r AS (SELECT source, doc_id, n_tok, k,
         |    -ln((CAST(${duckLane("k")} AS DOUBLE) + 1.0) /
         |        1152921504606846976.0) / CAST(n_tok AS DOUBLE) AS race
         |  FROM d WHERE n_tok > 0)
         |SELECT source, doc_id, n_tok, rk FROM (
         |  SELECT source, doc_id, n_tok,
         |    row_number() OVER (PARTITION BY source ORDER BY race ASC, k ASC)::BIGINT AS rk
         |  FROM r)
         |WHERE rk <= 5""".stripMargin,
    // q85: the q59 split/rebuild shape with a corpus-frequency window in
    // place of the first-occurrence rank; partitioning by the passage
    // text groups identically to Spark's SHA-256 digest key
    "q85_boilerplate" ->
      """WITH sp AS (SELECT doc_id AS doc, str_split(text, '. ') AS l
        |  FROM documents WHERE text IS NOT NULL),
        |p AS (SELECT doc, CAST(len(l) AS BIGINT) AS n_passages,
        |  unnest(l) AS passage, unnest(range(len(l))) AS pos FROM sp),
        |f AS (SELECT *, count(*) OVER (PARTITION BY passage) AS freq FROM p)
        |SELECT doc, any_value(n_passages) AS n_passages, count(*) AS n_kept,
        |  string_agg(passage, '. ' ORDER BY pos) AS clean_text
        |FROM f WHERE freq <= 3 GROUP BY doc""".stripMargin,

    // q86: same one-pass ROLLUP; GROUPING() disambiguates subtotal rows
    // from genuine NULL keys exactly like Spark's grouping() flags
    "q86_rollup_revenue" ->
      """SELECT r_name, n_name,
        |  grouping(r_name)::BIGINT AS g_region,
        |  grouping(n_name)::BIGINT AS g_nation,
        |  count(*)::BIGINT AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    // q87: conditional aggregation computes the same dense pivot —
    // FILTER count yields 0 where Spark's pivot cell coalesces to 0
    "q87_pivot_events" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  count(*) FILTER (WHERE event_type = 'click')::BIGINT AS click,
        |  count(*) FILTER (WHERE event_type = 'error')::BIGINT AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup')::BIGINT AS signup,
        |  count(*) FILTER (WHERE event_type = 'view')::BIGINT AS view
        |FROM events GROUP BY 1""".stripMargin,

    // q88: identical INTERSECT / EXCEPT classification
    "q88_set_ops" ->
      """WITH y96 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate <  TIMESTAMP '1997-01-01'),
        |y97 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate <  TIMESTAMP '1998-01-01')
        |SELECT o_custkey, 'retained' AS status FROM (
        |  SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
        |UNION ALL
        |SELECT o_custkey, 'churned' AS status FROM (
        |  SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)""".stripMargin,

    // q89: the one-shot fold of the whole changelog — equal to Spark's
    // base-plus-delta merge by Cdc.merge associativity (every delta row
    // orders after every base row); us = epoch_ns // 1000 ≡ unix_micros
    "q89_cdc_merge" ->
      """WITH log AS (SELECT user_id, event_type AS state,
        |    epoch_ns(ts) // 1000 AS us, event_id,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rk
        |  FROM log)
        |SELECT user_id, state AS last_type, us AS last_us,
        |  event_id AS last_event_id
        |FROM r WHERE rk = 1 AND op <> 'D'""".stripMargin,

    // q90: identical run-collapse (IS DISTINCT FROM = Spark's null-safe
    // <=> negation) + interval windows over the same user/us ordering
    "q90_scd2_history" ->
      """WITH log AS (SELECT user_id, event_type AS state,
        |    epoch_ns(ts) // 1000 AS us, event_id FROM events),
        |x AS (SELECT *, lag(state) OVER w AS prev,
        |    row_number() OVER w AS rn FROM log
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |c AS (SELECT * FROM x WHERE rn = 1 OR prev IS DISTINCT FROM state)
        |SELECT user_id, state, us AS valid_from_us,
        |  lead(us) OVER w2 AS valid_to_us,
        |  row_number() OVER w2 AS version,
        |  lead(us) OVER w2 IS NULL AS is_current
        |FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id)""".stripMargin,

    // q91: identical explicit set list; GROUPING() flags disambiguate
    // subtotal rows exactly like Spark's grouping()
    "q91_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  grouping(l_returnflag)::BIGINT AS g_rf,
        |  grouping(l_linestatus)::BIGINT AS g_ls,
        |  count(*)::BIGINT AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus))""".stripMargin,

    // q93: q34's recursive component CTE, then the same deterministic
    // argmax (quality DESC, doc ASC) — rn arithmetic is engine-agnostic
    "q93_canonical_docs" ->
      """WITH RECURSIVE
        |t AS (
        |  SELECT doc_id, str_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 1000),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))])) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |p AS (
        |  SELECT doc_a, doc_b FROM (
        |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        |    FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |    GROUP BY 1, 2) i
        |  JOIN cnt ca ON doc_a = ca.doc_id
        |  JOIN cnt cb ON doc_b = cb.doc_id
        |  WHERE n_inter / (ca.n_sh + cb.n_sh - n_inter) >= 0.2),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |verts AS (SELECT DISTINCT src AS doc FROM edges),
        |reach(src, dst) AS (
        |  SELECT doc, doc FROM verts
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (SELECT src AS doc, min(dst) AS component FROM reach GROUP BY src),
        |qual AS (
        |  SELECT doc_id, CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT)
        |    AS quality
        |  FROM documents WHERE doc_id < 1000),
        |r AS (
        |  SELECT component, doc, quality, row_number() OVER (
        |    PARTITION BY component ORDER BY quality DESC, doc ASC) AS rn
        |  FROM comp JOIN qual ON doc = doc_id)
        |SELECT component, count(*)::BIGINT AS n_docs,
        |  max(CASE WHEN rn = 1 THEN doc END) AS kept_doc,
        |  max(CASE WHEN rn = 1 THEN quality END) AS kept_quality
        |FROM r GROUP BY component""".stripMargin,

    // q94: every statistic is rational arithmetic over exact integer
    // counts plus one sqrt (IEEE correctly-rounded in both engines) —
    // expression trees mirror SparkEntry's left-associative order
    // exactly, so the rounded doubles hash-match; ln/exp (CI bounds)
    // are deliberately left to callers (last-ulp engine divergence)
    "q94_prr_signals" ->
      """WITH r AS (
        |  SELECT source, lang FROM documents
        |  WHERE source IS NOT NULL AND lang IS NOT NULL),
        |cells AS (
        |  SELECT source, lang, count(*)::BIGINT AS a FROM r GROUP BY 1, 2),
        |et AS (SELECT source, sum(a)::BIGINT AS n_entity FROM cells GROUP BY 1),
        |vt AS (SELECT lang, sum(a)::BIGINT AS n_event FROM cells GROUP BY 1),
        |g AS (SELECT sum(a)::BIGINT AS n_total FROM cells),
        |j AS (
        |  SELECT source, lang, a, n_entity, n_event, n_total,
        |    a::DOUBLE AS ad, (n_entity - a)::DOUBLE AS b,
        |    (n_event - a)::DOUBLE AS c,
        |    (n_total - n_entity - n_event + a)::DOUBLE AS dd,
        |    n_total::DOUBLE AS nd
        |  FROM cells JOIN et USING (source) JOIN vt USING (lang) CROSS JOIN g
        |  WHERE a >= 3),
        |s AS (
        |  SELECT *, ad * dd - b * c AS chinum,
        |    CASE WHEN c > 0 THEN (ad / n_entity) / (c / (nd - n_entity))
        |         ELSE 'infinity'::DOUBLE END AS prr_raw,
        |    nd * (ad * dd - b * c) * (ad * dd - b * c) /
        |      (n_entity::DOUBLE * (nd - n_entity) * n_event * (nd - n_event))
        |      AS chi2_raw
        |  FROM j)
        |SELECT source, lang, a AS n_reports, n_entity, n_event, n_total,
        |  round(n_entity::DOUBLE * n_event / nd, 4) AS expected,
        |  round(CASE WHEN c > 0
        |    THEN (ad / n_entity) / (c / (nd - n_entity)) END, 4) AS prr,
        |  round(CASE WHEN b > 0 AND c > 0 THEN ad * dd / (b * c) END, 4)
        |    AS ror,
        |  round(CASE WHEN b > 0 AND c > 0
        |    THEN sqrt(1.0 / ad + 1.0 / b + 1.0 / c + 1.0 / dd) END, 4)
        |    AS se_log_ror,
        |  round(chi2_raw, 4) AS chi2,
        |  (prr_raw >= 2.0 AND chi2_raw >= 4.0) AS is_signal
        |FROM s""".stripMargin,

    // q103: navigation windows over integer cents — deltas engine-exact;
    // quarter() buckets identically from the same timestamps
    // q106: the oracle recomputes the mart from ALL raw facts — equality
    // with the Spark-side base∪delta partial-aggregate merge is the
    // incremental-maintenance correctness property (integer cents: exact)
    "q106_incremental_agg" ->
      """SELECT o_orderpriority AS priority,
        |  strftime(o_orderdate, '%Y-%m') AS month,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(min(cents) AS BIGINT) AS min_cents,
        |  CAST(max(cents) AS BIGINT) AS max_cents,
        |  count(*) AS n
        |FROM (SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |      FROM orders)
        |GROUP BY 1, 2""".stripMargin,

    // q104: relational rebuild of the HLL registers — bucket = top 6 lane
    // bits, rho = leading zeros of the remaining 54 bits + 1 (bin() gives
    // the minimal binary string in both engines, so length(bin(w))-1 is
    // floor(log2 w) EXACTLY; floating log2 rounds up just under powers of
    // two at 50+ bits), then the classic estimator with the same alpha,
    // double-op grouping, and small-range correction as HllSketch.eval.
    "q104_hll_distinct" ->
      s"""WITH toks AS (SELECT lang, unnest(str_split(text, ' ')) AS token FROM documents),
         |h AS (SELECT DISTINCT lang, ${duckLane("token")} AS lane FROM toks),
         |b AS (SELECT lang, lane >> 54 AS bucket,
         |        lane & ${(1L << 54) - 1} AS w FROM h),
         |regs AS (SELECT lang, bucket,
         |    max(CASE WHEN w = 0 THEN 55
         |             ELSE 54 - (length(bin(w)) - 1) END) AS r
         |  FROM b GROUP BY lang, bucket),
         |agg AS (SELECT lang, sum(pow(2.0, -r)) AS present, count(*) AS np
         |  FROM regs GROUP BY lang),
         |est AS (SELECT lang,
         |    0.709 * 64.0 * 64.0 / (present + CAST(64 - np AS DOUBLE)) AS raw,
         |    CAST(64 - np AS DOUBLE) AS v
         |  FROM agg)
         |SELECT lang, round(CASE WHEN raw <= 160.0 AND v > 0
         |    THEN 64.0 * ln(64.0 / v) ELSE raw END, 4) AS est_distinct
         |FROM est""".stripMargin,

    // q105: relational mirror of the sketch-merge overlap — bottom-k lanes
    // per source, pair universe = union of the two bottom-k sets, rank,
    // keep k; the k-th union lane drives the KMV union estimate and the
    // both-sides fraction the Jaccard; intersection = J x union (raw
    // doubles multiplied BEFORE rounding, as in Sketch.kmvOverlap).
    "q105_kmv_overlap" ->
      s"""WITH toks AS (SELECT source, unnest(str_split(text, ' ')) AS token FROM documents),
         |h AS (SELECT DISTINCT source, ${duckLane("token")} AS lane FROM toks),
         |r AS (SELECT source, lane,
         |    row_number() OVER (PARTITION BY source ORDER BY lane) AS rn FROM h),
         |sk AS (SELECT source, lane FROM r WHERE rn <= 128),
         |srcs AS (SELECT DISTINCT source FROM sk),
         |prs AS (SELECT a.source AS sa, b.source AS sb
         |  FROM srcs a JOIN srcs b ON a.source < b.source),
         |ul AS (SELECT p.sa, p.sb, s.lane,
         |    max(CASE WHEN s.source = p.sa THEN 1 ELSE 0 END) AS in_a,
         |    max(CASE WHEN s.source = p.sb THEN 1 ELSE 0 END) AS in_b
         |  FROM prs p JOIN sk s ON s.source IN (p.sa, p.sb)
         |  GROUP BY p.sa, p.sb, s.lane),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY sa, sb ORDER BY lane) AS rn,
         |    count(*) OVER (PARTITION BY sa, sb) AS nu FROM ul),
         |kk AS (SELECT sa, sb, count(*) AS kcnt, max(lane) AS lane_k,
         |    sum(in_a * in_b) AS matches, max(nu) AS nu
         |  FROM rk WHERE rn <= 128 GROUP BY sa, sb),
         |est AS (SELECT sa, sb,
         |    CASE WHEN nu < 128 THEN CAST(nu AS DOUBLE)
         |         ELSE 127.0 / ((CAST(lane_k AS DOUBLE) + 1.0)
         |                        / 1152921504606846977.0) END AS u_est,
         |    CAST(matches AS DOUBLE) / CAST(kcnt AS DOUBLE) AS jac
         |  FROM kk)
         |SELECT sa AS src_a, sb AS src_b,
         |  round(u_est, 4) AS est_union,
         |  round(jac, 4) AS est_jaccard,
         |  round(jac * u_est, 4) AS est_intersection
         |FROM est""".stripMargin,

    "q103_window_nav" ->
      """WITH q AS (
        |  SELECT c_mktsegment,
        |    (year(o_orderdate) * 4 + quarter(o_orderdate) - 1)::BIGINT
        |      AS quarter_index,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT c_mktsegment, quarter_index, cents,
        |  CAST(cents - lag(cents, 1) OVER w AS BIGINT) AS qoq_delta,
        |  CAST(cents - first_value(cents) OVER w AS BIGINT) AS vs_first,
        |  CAST(cents - last_value(cents) OVER
        |    (PARTITION BY c_mktsegment ORDER BY quarter_index
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS BIGINT) AS vs_last
        |FROM q
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY quarter_index)""".stripMargin,

    // q102: identical CUBE — grouping flags disambiguate rolled-up levels
    "q102_cube" ->
      """SELECT c_mktsegment, o_orderpriority,
        |  grouping(c_mktsegment)::BIGINT AS g_seg,
        |  grouping(o_orderpriority)::BIGINT AS g_pri,
        |  count(*)::BIGINT AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE (c_mktsegment, o_orderpriority)""".stripMargin,

    // q101: pivot -> unpivot (dropping dense zeros) == direct group-by;
    // the oracle computes the direct form, proving the roundtrip lossless
    "q101_unpivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |  count(*)::BIGINT AS n_events
        |FROM events
        |WHERE event_type IN ('click','error','purchase','signup','view')
        |GROUP BY 1, 2""".stripMargin,

    // q100: RANGE frame membership is integer-day arithmetic and the sum
    // integer cents — value-based frames with peer inclusion, engine-exact
    "q100_range_frame" ->
      """SELECT o_orderkey, o_custkey,
        |  (o_orderdate::DATE - DATE '1970-01-01')::BIGINT AS epoch_day,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
        |    AS BIGINT) AS rolling_30d_cents,
        |  count(*) OVER w AS n_in_window
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY (o_orderdate::DATE - DATE '1970-01-01')
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)""".stripMargin,

    // q99: day spine + zero-fill; counts and date truncation are exact in
    // both engines (session timezone UTC)
    "q99_date_spine" ->
      """WITH o AS (SELECT o_orderdate::DATE AS day FROM orders),
        |spine AS (
        |  SELECT unnest(generate_series(
        |    (SELECT min(day) FROM o), (SELECT max(day) FROM o),
        |    INTERVAL 1 DAY))::DATE AS day),
        |cnt AS (SELECT day, count(*)::BIGINT AS n FROM o GROUP BY 1)
        |SELECT strftime(s.day, '%Y-%m-%d') AS day,
        |  coalesce(n, 0)::BIGINT AS n_orders, (n IS NULL) AS is_gap
        |FROM spine s LEFT JOIN cnt USING (day)""".stripMargin,

    // q98: identical correlated-subquery text — both engines decorrelate;
    // the integer-cents compare makes the boundary engine-exact
    "q98_correlated_premium" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        |FROM orders o
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT) *
        |      (SELECT count(*) FROM orders o2
        |       WHERE o2.o_custkey = o.o_custkey)
        |    > 2 * (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
        |           FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin,

    // q97: Misra-Gries guarantees no false negatives above N/(k+1) and
    // the verify pass is exact integer counting, so the oracle is the
    // direct exact formulation with the same integer threshold compare
    "q97_heavy_hitters" -> heavyHittersOracle,
    // q123: identical oracle — the replayed MG merge keeps every true
    // heavy hitter (no-false-negative bound) and the exact recount +
    // integer decision drops everything else, so the batch sketch (q97)
    // and the streaming replay converge on the same exact answer.
    "q123_hh_replay" -> heavyHittersOracle,

    // q96: prefix filtering is lossless, so the oracle is the BRUTE
    // inverted-index formulation (q15's shape at 3-gram/0.3) — the
    // hash-compare proves the candidate pruning dropped nothing
    "q96_prefix_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, str_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 1500),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |     for i in range(1, len(toks) - 1)])) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(n_inter / (ca.n_sh + cb.n_sh - n_inter), 6) AS jaccard
        |FROM pairs
        |JOIN cnt ca ON doc_a = ca.doc_id
        |JOIN cnt cb ON doc_b = cb.doc_id
        |WHERE n_inter / (ca.n_sh + cb.n_sh - n_inter) >= 0.3""".stripMargin,

    // q95: every step is BIGINT arithmetic (integer division, associative
    // integer sums), so six recursive PageRank rounds are bit-identical
    // to Spark's loop under any evaluation order — no rounding needed.
    // CONSTRAINT: this recursive form inner-joins the message flow, so it
    // only matches Graph.pageRank (whose rank update is total over the
    // node set) on graphs where every node has an in-edge — guaranteed
    // here because the query symmetrizes the edge list. Re-pointing q95
    // at a DIRECTED graph requires reworking the oracle, not just the
    // query (an in-degree-0 node would drop out of the CTE's working
    // table but keep its teleport share in Spark).
    "q95_pagerank" ->
      """WITH RECURSIVE
        |pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (
        |  SELECT c AS src, s AS dst FROM pairs
        |  UNION ALL SELECT s, c FROM pairs),
        |deg AS (SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
        |nn AS (SELECT count(*)::BIGINT AS n FROM deg),
        |tele AS (
        |  SELECT (15000000000000 // (100 * n))::BIGINT AS t,
        |         (1000000000000 // n)::BIGINT AS r0 FROM nn),
        |pr(iter, node, rank) AS (
        |  SELECT 0, src, r0 FROM deg CROSS JOIN tele
        |  UNION ALL
        |  SELECT p.iter + 1, e.dst,
        |    (t.t + sum((85 * p.rank) // (100 * d.deg)))::BIGINT
        |  FROM pr p
        |  JOIN edges e ON p.node = e.src
        |  JOIN deg d ON d.src = p.node
        |  CROSS JOIN tele t
        |  WHERE p.iter < 6
        |  GROUP BY 1, 2, t.t)
        |SELECT
        |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
        |    AS node_type,
        |  (CASE WHEN node % 2 = 0 THEN node ELSE node - 1 END // 2)::BIGINT
        |    AS entity_id,
        |  d.deg, p.rank
        |FROM pr p JOIN deg d ON d.src = p.node
        |WHERE p.iter = 6""".stripMargin,

    // q110: min(dist) over the recursive walk == first-visit distance of
    // the frontier iteration (unit edge weights); integer-exact
    "q110_bfs" ->
      """WITH RECURSIVE
        |pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (
        |  SELECT c AS src, s AS dst FROM pairs
        |  UNION ALL SELECT s, c FROM pairs),
        |walk(node, dist) AS (
        |  SELECT DISTINCT c AS node, CAST(0 AS BIGINT) AS dist
        |  FROM pairs WHERE c <= 40
        |  UNION
        |  SELECT e.dst, w.dist + 1
        |  FROM walk w JOIN edges e ON e.src = w.node
        |  WHERE w.dist < 3)
        |SELECT
        |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
        |    AS node_type,
        |  (CASE WHEN node % 2 = 0 THEN node ELSE node - 1 END // 2)::BIGINT
        |    AS entity_id,
        |  min(dist) AS dist
        |FROM walk GROUP BY 1, 2""".stripMargin,

    // q111: the identical HT estimator over the identical deterministic
    // sample — dyadic rate 1/4 makes every scale-up exact; the variance
    // factor (1-p)/p^2 = 12 is exact in both engines
    "q111_aqp_revenue" ->
      s"""WITH o AS (
         |  SELECT o_orderpriority AS priority,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         |    ${duckLane("'aqp|' || o_orderkey::VARCHAR")} AS lane
         |  FROM orders),
         |smp AS (SELECT * FROM o
         |  WHERE CAST(lane AS DOUBLE) < 0.25 * 1152921504606846976.0)
         |SELECT priority, count(*) AS n_s,
         |  count(*) / 0.25 AS n_est,
         |  sum(cents) / 0.25 AS sum_est,
         |  round(sqrt(sum(pow(CAST(cents AS DOUBLE), 2.0))
         |             * ((1 - 0.25) / (0.25 * 0.25))), 2) AS se_sum
         |FROM smp GROUP BY priority""".stripMargin,

    "q112_ppr" -> pprOracle,

    // q113: UNION ALL of the four grouping sets is the relational mirror
    // of Expand; registers rebuild per level exactly as in the q104
    // oracle, and grouping flags disambiguate rolled-up NULLs
    "q113_cube_distinct" ->
      s"""WITH base AS (
         |  SELECT event_type, strftime(ts, '%Y-%m') AS month,
         |    ${duckLane("'u|' || user_id::VARCHAR")} AS lane
         |  FROM events),
         |lvl AS (
         |  SELECT event_type, month, 0 AS g_et, 0 AS g_m, lane FROM base
         |  UNION ALL SELECT event_type, NULL, 0, 1, lane FROM base
         |  UNION ALL SELECT NULL, month, 1, 0, lane FROM base
         |  UNION ALL SELECT NULL, NULL, 1, 1, lane FROM base),
         |cnt AS (SELECT event_type, month, g_et, g_m, count(*) AS n
         |  FROM lvl GROUP BY 1, 2, 3, 4),
         |h AS (SELECT DISTINCT event_type, month, g_et, g_m, lane FROM lvl),
         |b AS (SELECT event_type, month, g_et, g_m, lane >> 54 AS bucket,
         |        lane & ${(1L << 54) - 1} AS w FROM h),
         |regs AS (SELECT event_type, month, g_et, g_m, bucket,
         |    max(CASE WHEN w = 0 THEN 55
         |             ELSE 54 - (length(bin(w)) - 1) END) AS r
         |  FROM b GROUP BY 1, 2, 3, 4, 5),
         |agg AS (SELECT event_type, month, g_et, g_m,
         |    sum(pow(2.0, -r)) AS present, count(*) AS np
         |  FROM regs GROUP BY 1, 2, 3, 4),
         |est AS (SELECT event_type, month, g_et, g_m,
         |    0.709 * 64.0 * 64.0 / (present + CAST(64 - np AS DOUBLE)) AS raw,
         |    CAST(64 - np AS DOUBLE) AS v
         |  FROM agg)
         |SELECT c.event_type, c.month,
         |  c.g_et::BIGINT AS g_et, c.g_m::BIGINT AS g_m, c.n,
         |  round(CASE WHEN raw <= 160.0 AND v > 0
         |      THEN 64.0 * ln(64.0 / v) ELSE raw END, 4) AS est_users
         |FROM cnt c JOIN est e ON c.g_et = e.g_et AND c.g_m = e.g_m
         |  AND c.event_type IS NOT DISTINCT FROM e.event_type
         |  AND c.month IS NOT DISTINCT FROM e.month""".stripMargin,

    // q114: med/mad interpolate exact integer-cent halves (double-exact),
    // and the outlier compare is the multiplied form on identical doubles
    "q114_robust_signals" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS priority,
        |    strftime(o_orderdate, '%Y-%m-%d') AS day,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1, 2),
        |med AS (SELECT priority,
        |    quantile_cont(CAST(cents AS DOUBLE), 0.5) AS med
        |  FROM daily GROUP BY 1),
        |dev AS (SELECT d.priority, m.med,
        |    abs(CAST(d.cents AS DOUBLE) - m.med) AS dev
        |  FROM daily d JOIN med m ON d.priority = m.priority),
        |mad AS (SELECT priority, quantile_cont(dev, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT v.priority, count(*) AS n,
        |  round(max(v.med), 4) AS med, round(max(a.mad), 4) AS mad,
        |  CAST(sum(CASE WHEN 0.6745 * v.dev > 3.5 * a.mad
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev v JOIN mad a ON v.priority = a.priority
        |GROUP BY v.priority""".stripMargin,

    // q115: the Spark side round-trips every value through a VARIANT
    // (to_json → try_parse_json → try_variant_get); the oracle reads the
    // same values straight off the base columns — round-trip equality is
    // the correctness statement. Malformed payloads (o_orderkey % 97 = 0)
    // must DROP, and the missing path must be NULL, never an error.
    "q115_variant_extract" ->
      """SELECT o_orderkey, o_orderstatus AS status,
        |  strftime(o_orderdate, '%Y-%m-%d') AS odate,
        |  o_orderpriority AS first_priority, o_custkey AS first_cust,
        |  CAST(NULL AS VARCHAR) AS missing_path
        |FROM orders WHERE o_orderkey % 97 <> 0""".stripMargin,

    // q120: per-column stats as UNION ALL branches; min/max computed on
    // the native type then rendered (BIGINT/VARCHAR casts match Spark's
    // long/string rendering exactly)
    "q120_profile" ->
      """WITH t AS (SELECT user_id, event_type,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
        |  FROM events)
        |SELECT 'user_id' AS col_name, count(*) AS n,
        |  count(*) - count(user_id) AS n_null,
        |  count(DISTINCT user_id) AS n_distinct,
        |  min(user_id)::VARCHAR AS min_v, max(user_id)::VARCHAR AS max_v
        |FROM t
        |UNION ALL
        |SELECT 'event_type', count(*), count(*) - count(event_type),
        |  count(DISTINCT event_type),
        |  min(event_type), max(event_type) FROM t
        |UNION ALL
        |SELECT 'k_value', count(*), count(*) - count(k_value),
        |  count(DISTINCT k_value),
        |  min(k_value)::VARCHAR, max(k_value)::VARCHAR FROM t""".stripMargin,

    // q124: q90's history rebuild + the same interval-predicate join —
    // exactly one version matches each probe instant by construction
    // (intervals partition each user's timeline)
    "q124_point_in_time" ->
      """WITH log AS (SELECT user_id, event_type AS state,
        |    epoch_ns(ts) // 1000 AS us, event_id FROM events),
        |x AS (SELECT *, lag(state) OVER w AS prev,
        |    row_number() OVER w AS rn FROM log
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |c AS (SELECT * FROM x WHERE rn = 1 OR prev IS DISTINCT FROM state),
        |h AS (SELECT user_id, state, us AS valid_from,
        |    lead(us) OVER w2 AS valid_to,
        |    row_number() OVER w2 AS version
        |  FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id)),
        |p AS (SELECT event_id AS probe_id, user_id AS p_user,
        |    epoch_ns(ts) // 1000 + 1800000000 AS p_us
        |  FROM events WHERE event_id % 7 = 0)
        |SELECT probe_id, h.user_id, p_us, state, version
        |FROM p JOIN h ON p_user = h.user_id AND valid_from <= p_us
        |  AND (valid_to IS NULL OR p_us < valid_to)""".stripMargin,

    // q125: same spine idiom as q99; DuckDB's IGNORE NULLS window mirrors
    // Spark's last(_, ignoreNulls=true) under the identical frame
    "q125_forward_fill" ->
      """WITH daily AS (SELECT o_orderpriority AS priority,
        |    o_orderdate::DATE AS day,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1, 2),
        |spine AS (
        |  SELECT unnest(generate_series(
        |    (SELECT min(o_orderdate)::DATE FROM orders),
        |    (SELECT max(o_orderdate)::DATE FROM orders),
        |    INTERVAL 1 DAY))::DATE AS day),
        |grid AS (SELECT p.priority, s.day
        |  FROM spine s CROSS JOIN (SELECT DISTINCT priority FROM daily) p),
        |j AS (SELECT g.priority, g.day, d.cents
        |  FROM grid g LEFT JOIN daily d USING (priority, day))
        |SELECT priority, strftime(day, '%Y-%m-%d') AS day, cents,
        |  last_value(cents IGNORE NULLS) OVER w AS filled_cents,
        |  CAST(date_diff('day',
        |    last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER w, day) AS BIGINT) AS staleness_days
        |FROM j WINDOW w AS (PARTITION BY priority ORDER BY day
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    // q121: identical integer bin arithmetic — BIGINT DIV on both sides,
    // no floating-point boundary drift possible
    "q121_histogram" ->
      """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders),
        |b AS (SELECT min(v) AS v_min, max(v) AS v_max FROM v)
        |SELECT (v - v_min) * 20 // (v_max - v_min + 1) AS bucket,
        |  count(*) AS n, min(v) AS lo, max(v) AS hi
        |FROM v CROSS JOIN b GROUP BY 1""".stripMargin,

    // q122: successor via lead() under the same (us, event_id) tie-broken
    // ordering both engines share; probabilities are exact integer ratios
    // rounded once
    "q122_transitions" ->
      """WITH e AS (SELECT user_id, event_type,
        |    epoch_ns(ts) // 1000 AS us, event_id
        |  FROM events),
        |p AS (SELECT event_type AS from_state,
        |    lead(event_type, 1) OVER (
        |      PARTITION BY user_id ORDER BY us, event_id) AS to_state
        |  FROM e),
        |c AS (SELECT from_state, to_state, count(*) AS n FROM p
        |  WHERE to_state IS NOT NULL GROUP BY 1, 2)
        |SELECT from_state, to_state, n,
        |  round(n / CAST(sum(n) OVER (PARTITION BY from_state) AS DOUBLE),
        |    6) AS prob
        |FROM c""".stripMargin,

    // q116: the Spark side replays the changelog through the persisted
    // bucket-partial SCD-1 fold in three micro-batches; the oracle folds
    // the WHOLE log once (q89's SQL) — incremental == one-shot is the
    // streaming operator's correctness statement.
    "q116_scd1_replay" ->
      """WITH log AS (SELECT user_id, event_type AS state,
        |    epoch_ns(ts) // 1000 AS us, event_id,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rk
        |  FROM log)
        |SELECT user_id, state AS last_type, us AS last_us,
        |  event_id AS last_event_id
        |FROM r WHERE rk = 1 AND op <> 'D'""".stripMargin,

    // q117: the Spark side max-merges three persisted per-batch HLL
    // register deltas (with a mid-replay compaction fold); the oracle
    // rebuilds the registers from ALL events in one pass — equality is
    // exact because registers form a max-lattice (q104's bin() machinery,
    // keyless, p=6 ⇒ lane >> 54).
    "q117_distinct_replay" ->
      s"""WITH h AS (SELECT DISTINCT ${duckLane("user_id::VARCHAR")} AS lane
         |  FROM events),
         |b AS (SELECT lane >> 54 AS bucket,
         |        lane & ${(1L << 54) - 1} AS w FROM h),
         |regs AS (SELECT bucket,
         |    max(CASE WHEN w = 0 THEN 55
         |             ELSE 54 - (length(bin(w)) - 1) END) AS r
         |  FROM b GROUP BY bucket),
         |agg AS (SELECT sum(pow(2.0, -r)) AS present, count(*) AS np
         |  FROM regs),
         |est AS (SELECT
         |    0.709 * 64.0 * 64.0 / (present + CAST(64 - np AS DOUBLE)) AS raw,
         |    CAST(64 - np AS DOUBLE) AS v
         |  FROM agg)
         |SELECT round(CASE WHEN raw <= 160.0 AND v > 0
         |    THEN 64.0 * ln(64.0 / v) ELSE raw END, 4) AS est_distinct
         |FROM est""".stripMargin,

    // q92: ntile/percent_rank/cume_dist are rank-arithmetic on exact
    // integers in both engines, so the rounded doubles hash-match
    "q92_user_distribution" ->
      """WITH c AS (SELECT event_type, user_id, count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, user_id, n,
        |  (ntile(4) OVER w)::BIGINT AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM c WINDOW w AS (
        |  PARTITION BY event_type ORDER BY n DESC, user_id ASC)""".stripMargin,

    "q62_corpus_build2" -> corpusBuild2Oracle,
    // rate arithmetic written as the same left-assoc (w · B) / t double
    // ops the Scala driver computes from the collected totals
    "q64_corpus_mix" ->
      s"""WITH tot AS (SELECT source, sum(len(str_split(text, ' '))) AS t
         |  FROM documents GROUP BY source),
         |r AS (SELECT source, least(1.0,
         |  (CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
         |        THEN 0.07 ELSE 0.03 END)
         |    * CAST(15000 AS DOUBLE) / CAST(t AS DOUBLE)) AS rate FROM tot)
         |SELECT doc_id, d.source FROM documents d JOIN r ON d.source = r.source
         |WHERE CAST(${duckLane("'mix|' || doc_id::VARCHAR")} AS DOUBLE)
         |  < rate * 1152921504606846976.0""".stripMargin,

    "q63_neg_samples" ->
      s"""WITH ids AS (SELECT doc_id FROM documents),
         |n AS (SELECT max(doc_id) + 1 AS space FROM ids),
         |d AS (SELECT doc_id AS anchor, j.range AS j,
         |  ${duckLane("'neg|' || doc_id::VARCHAR || ',' || j.range::VARCHAR")} % space AS neg_id
         |  FROM ids CROSS JOIN range(0, 4) j CROSS JOIN n)
         |SELECT anchor, j, neg_id FROM d JOIN ids ON d.neg_id = ids.doc_id
         |WHERE neg_id <> anchor""".stripMargin,
    "q61_rep_metrics" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (SELECT doc_id, len(toks) AS n,
        |  greatest(len(toks) - 1, 0) AS t2,
        |  len(list_distinct([toks[i] || ' ' || toks[i+1]
        |    for i in range(1, len(toks))])) AS d2,
        |  greatest(len(toks) - 2, 0) AS t3,
        |  len(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |    for i in range(1, len(toks) - 1)])) AS d3,
        |  list_max(list_transform(list_distinct(toks),
        |    x -> len(list_filter(toks, y -> y = x)))) AS topcnt
        |  FROM t),
        |f AS (SELECT doc_id,
        |  CASE WHEN t2 > 0 THEN CAST(t2 - d2 AS DOUBLE) / CAST(t2 AS DOUBLE)
        |       ELSE 0.0 END AS f2,
        |  CASE WHEN t3 > 0 THEN CAST(t3 - d3 AS DOUBLE) / CAST(t3 AS DOUBLE)
        |       ELSE 0.0 END AS f3,
        |  CAST(topcnt AS DOUBLE) / CAST(n AS DOUBLE) AS tt FROM m)
        |SELECT doc_id, round(f2, 6) AS dup2_frac, round(f3, 6) AS dup3_frac,
        |  round(tt, 6) AS top_token_ratio,
        |  (f2 > CAST(0.2 AS DOUBLE) OR f3 > CAST(0.15 AS DOUBLE)
        |    OR tt > CAST(0.2 AS DOUBLE)) AS repetitive
        |FROM f""".stripMargin,
    "q47_kmeans_train" -> kmeansOracle,
    "q65_semantic_dedup" -> semanticDedupOracle,

    // q131: q27's assignment SQL + the same-list candidate rule + round-6
    // cosine threshold — the IVF approximation is part of the declared
    // semantics on both engines
    "q131_semantic_decontam" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |assign AS (SELECT vec_id, v, cid FROM (
        |  SELECT e.vec_id, e.v, c.cid,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, c.cv) /
        |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |      DESC, c.cid) AS rk
        |  FROM e CROSS JOIN cent c) WHERE rk = 1),
        |tr AS (SELECT * FROM assign WHERE vec_id % 17 <> 0),
        |ev AS (SELECT * FROM assign WHERE vec_id % 17 = 0),
        |hits AS (SELECT DISTINCT tr.vec_id FROM tr JOIN ev ON tr.cid = ev.cid
        |  AND round(list_dot_product(tr.v, ev.v) /
        |    (sqrt(list_dot_product(tr.v, tr.v)) * sqrt(list_dot_product(ev.v, ev.v))), 6)
        |    >= 0.35)
        |SELECT tr.vec_id, tr.cid::BIGINT AS cid,
        |  (h.vec_id IS NOT NULL) AS contaminated
        |FROM tr LEFT JOIN hits h ON tr.vec_id = h.vec_id""".stripMargin,

    // q132: duplicate detection re-derived on the raw window TEXT (the
    // stronger statement — Spark groups by sha2(window), so hash equality
    // here also certifies the digesting introduced no collisions on this
    // corpus); coverage re-derived by exploding dup windows into removed
    // token indices
    "q132_dup_span_dedup" ->
      """WITH b AS (SELECT doc_id AS doc, str_split(text, ' ') AS toks,
        |    CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE text IS NOT NULL),
        |w AS (SELECT doc, unnest(range(len(toks) - 4)) AS pos,
        |    unnest([array_to_string(toks[i+1:i+5], ' ')
        |            for i in range(0, len(toks) - 4)]) AS wt
        |  FROM b WHERE n_tokens >= 5),
        |r AS (SELECT doc, pos,
        |    row_number() OVER (PARTITION BY wt ORDER BY doc, pos) AS rn FROM w),
        |dw AS (SELECT doc, count(*)::BIGINT AS n_dup_windows
        |  FROM r WHERE rn > 1 GROUP BY doc),
        |rem AS (SELECT DISTINCT doc, unnest(range(pos, pos + 5)) AS i
        |  FROM r WHERE rn > 1),
        |tok AS (SELECT doc, unnest(toks) AS tk, unnest(range(len(toks))) AS i
        |  FROM b),
        |kept AS (SELECT t.doc, t.tk, t.i
        |  FROM tok t LEFT JOIN rem ON t.doc = rem.doc AND t.i = rem.i
        |  WHERE rem.i IS NULL),
        |agg AS (SELECT doc, count(*)::BIGINT AS n_kept,
        |    string_agg(tk, ' ' ORDER BY i) AS clean_text
        |  FROM kept GROUP BY doc)
        |SELECT b.doc, b.n_tokens,
        |  coalesce(dw.n_dup_windows, 0)::BIGINT AS n_dup_windows,
        |  (b.n_tokens - coalesce(agg.n_kept, 0))::BIGINT AS n_removed,
        |  coalesce(agg.clean_text, '') AS clean_text
        |FROM b LEFT JOIN dw ON b.doc = dw.doc
        |  LEFT JOIN agg ON b.doc = agg.doc""".stripMargin,

    // q133: the IVF top-20 (q27's SQL, rank bound raised) graded against
    // brute-force top-10 truth (q16's SQL); metrics are exact integer
    // ratios rounded 6dp, so the hash compare certifies the metric math,
    // not just the rankings
    "q133_retrieval_eval" -> retrievalEvalOracle,

    // q136: q133's per-query table folded to the corpus-level macro row
    // (avg skips NULL recalls on both engines by aggregate semantics)
    "q136_retrieval_macro" ->
      s"""WITH per AS ($retrievalEvalOracle)
         |SELECT count(*)::BIGINT AS n_queries,
         |  round(avg(recall_at_k), 6) AS mean_recall,
         |  round(avg(precision_at_k), 6) AS mean_precision,
         |  round(avg(rr), 6) AS mrr,
         |  round(avg(CASE WHEN success_at_k THEN 1.0 ELSE 0.0 END), 6)
         |    AS success_rate
         |FROM per""".stripMargin,

    // q139: rational-gain nDCG@10 over the same ranked/truth CTEs —
    // DCG/IDCG as exact integers at scale 2520 = lcm(1..10) (2520 // r
    // is exact for every r <= 10), the ratio a single correctly-rounded
    // division: bit-identical across engines by IEEE-754, no float sums
    "q139_ndcg" ->
      s"""WITH $retrievalCommonCtes,
        |pq AS (SELECT query_id,
        |    sum(CASE WHEN rel AND rank <= 10 THEN 2520 // rank ELSE 0 END)::BIGINT
        |      AS dcg_num
        |  FROM f GROUP BY 1),
        |j AS (SELECT coalesce(pq.query_id, n.query_id) AS query_id,
        |    coalesce(n.n_rel, 0)::BIGINT AS n_rel,
        |    coalesce(pq.dcg_num, 0)::BIGINT AS dcg_num
        |  FROM pq FULL OUTER JOIN nrel n ON pq.query_id = n.query_id),
        |w AS (SELECT query_id, n_rel, dcg_num,
        |    (CASE WHEN n_rel > 0 THEN list_sum(list_transform(
        |        range(1, least(n_rel, 10) + 1), r -> 2520 // r))
        |      ELSE 0 END)::BIGINT AS idcg_num
        |  FROM j)
        |SELECT query_id, n_rel, dcg_num, idcg_num,
        |  CASE WHEN idcg_num > 0
        |    THEN round(dcg_num / idcg_num, 6) END AS ndcg_at_k
        |FROM w""".stripMargin,

    // q140: the replayed incremental MAUDE ingest (NDJSON micro-batches →
    // production parse → staging → SCD-1 upsert) must equal the one-shot
    // staging transform of the LATEST report per key, recomputed straight
    // from the base columns the payload was built from (the q115
    // round-trip pattern + q116's replay-equals-batch statement)
    "q140_maude_ingest_replay" -> maudeStateOracle,

    // q218: the GENUINE streaming ingest (readStream → AvailableNow →
    // incrementalScd1) must converge to the SAME state as q140's batch
    // replay — the merge is split-invariant (max-seq per key wins
    // regardless of micro-batch boundaries), so the one-shot oracle is
    // shared verbatim: stream fold == batch fold == one-shot merge
    "q218_stream_ingest" -> maudeStateOracle,

    // q141: average precision over the same ranked/truth CTEs — the
    // running relevant count is an integer window, each AP term is
    // cumhits * (2520 // rank) exact, denominator 2520 * min(n_rel, 10);
    // one correctly-rounded division, no float sums (q139's discipline)
    "q141_avg_precision" ->
      s"""WITH $retrievalCommonCtes,
        |c AS (SELECT query_id, rank, rel,
        |    sum(CASE WHEN rel THEN 1 ELSE 0 END) OVER (
        |      PARTITION BY query_id ORDER BY rank) AS cumhits
        |  FROM f),
        |pq AS (SELECT query_id,
        |    sum(CASE WHEN rel AND rank <= 10
        |      THEN cumhits * (2520 // rank) ELSE 0 END)::BIGINT AS ap_num
        |  FROM c GROUP BY 1),
        |j AS (SELECT coalesce(pq.query_id, n.query_id) AS query_id,
        |    coalesce(n.n_rel, 0)::BIGINT AS n_rel,
        |    coalesce(pq.ap_num, 0)::BIGINT AS ap_num
        |  FROM pq FULL OUTER JOIN nrel n ON pq.query_id = n.query_id)
        |SELECT query_id, n_rel, ap_num,
        |  (2520 * least(n_rel, 10))::BIGINT AS ap_den,
        |  CASE WHEN n_rel > 0
        |    THEN round(ap_num / (2520 * least(n_rel, 10)), 6)
        |  END AS ap_at_k
        |FROM j""".stripMargin,

    // q142: the q139/q141 per-query folds (same exact-integer
    // arithmetic) averaged to the corpus-level graded row — avg skips
    // the NULL undefined values on both engines (q136's rule), and the
    // averaged inputs are already 6dp-rounded exact ratios
    "q142_graded_macro" ->
      s"""WITH $retrievalCommonCtes,
        |npq AS (SELECT query_id,
        |    sum(CASE WHEN rel AND rank <= 10 THEN 2520 // rank ELSE 0 END)::BIGINT
        |      AS dcg_num
        |  FROM f GROUP BY 1),
        |nj AS (SELECT coalesce(npq.query_id, n.query_id) AS query_id,
        |    coalesce(n.n_rel, 0) AS n_rel, coalesce(npq.dcg_num, 0) AS dcg_num
        |  FROM npq FULL OUTER JOIN nrel n ON npq.query_id = n.query_id),
        |nd AS (SELECT query_id, CASE WHEN n_rel > 0
        |    THEN round(dcg_num / list_sum(list_transform(
        |      range(1, least(n_rel, 10) + 1), r -> 2520 // r)), 6)
        |  END AS ndcg_at_k FROM nj),
        |cc AS (SELECT query_id, rank, rel,
        |    sum(CASE WHEN rel THEN 1 ELSE 0 END) OVER (
        |      PARTITION BY query_id ORDER BY rank) AS cumhits
        |  FROM f),
        |apq AS (SELECT query_id,
        |    sum(CASE WHEN rel AND rank <= 10
        |      THEN cumhits * (2520 // rank) ELSE 0 END)::BIGINT AS ap_num
        |  FROM cc GROUP BY 1),
        |aj AS (SELECT coalesce(apq.query_id, n.query_id) AS query_id,
        |    coalesce(n.n_rel, 0) AS n_rel, coalesce(apq.ap_num, 0) AS ap_num
        |  FROM apq FULL OUTER JOIN nrel n ON apq.query_id = n.query_id),
        |ap AS (SELECT query_id, CASE WHEN n_rel > 0
        |    THEN round(ap_num / (2520 * least(n_rel, 10)), 6)
        |  END AS ap_at_k FROM aj)
        |SELECT count(*)::BIGINT AS n_queries,
        |  round(avg(ndcg_at_k), 6) AS mean_ndcg,
        |  round(avg(ap_at_k), 6) AS map
        |FROM nd FULL OUTER JOIN ap USING (query_id)""".stripMargin,

    // q143: every mask recomputed relationally — the RE2-safe
    // repeat/right twin of the lookahead-regex partial mask, DuckDB's
    // own sha256 for the token lane, CASE for the redaction; the
    // allowed-role column (c_acctbal) must arrive RAW or the hash
    // diverges — the pass-through is part of the gated contract
    "q143_masking_policy" ->
      """SELECT c_custkey,
        |  CASE WHEN c_name IS NULL THEN NULL
        |    WHEN length(c_name) <= 3 THEN c_name
        |    ELSE repeat('*', length(c_name) - 3) || right(c_name, 3)
        |  END AS c_name,
        |  CASE WHEN c_custkey IS NOT NULL
        |    THEN sha256(c_custkey::VARCHAR) END AS cust_token,
        |  CASE WHEN c_mktsegment IS NOT NULL
        |    THEN '***MASKED***' END AS c_mktsegment,
        |  c_acctbal
        |FROM customer""".stripMargin,

    // q144: the entitlement set as an IN-subquery over the same
    // region/nation derivation; sum cast back to BIGINT (DuckDB sums
    // BIGINT into HUGEINT)
    "q144_row_access_policy" ->
      """WITH ent AS (SELECT n_nationkey FROM nation
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT c_nationkey, count(*)::BIGINT AS n_customers,
        |  sum(CAST(round(c_acctbal * 100) AS BIGINT))::BIGINT AS cents
        |FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM ent)
        |GROUP BY 1""".stripMargin,

    // q145: the catalog-composed governed view recomputed relationally —
    // q143's mask arithmetic (repeat/right + sha256 + CASE redaction,
    // acctbal raw because its policy allows the role) intersected with
    // q144's entitlement IN-subquery; the catalog itself lives only on
    // the declared side (what's being certified is that reading policies
    // from the persisted table composes to exactly this relational form)
    "q145_policy_catalog" ->
      """WITH ent AS (SELECT n_nationkey FROM nation
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT c_nationkey, c_custkey,
        |  CASE WHEN c_name IS NULL THEN NULL
        |    WHEN length(c_name) <= 3 THEN c_name
        |    ELSE repeat('*', length(c_name) - 3) || right(c_name, 3)
        |  END AS c_name,
        |  CASE WHEN c_custkey IS NOT NULL
        |    THEN sha256(c_custkey::VARCHAR) END AS cust_token,
        |  CASE WHEN c_mktsegment IS NOT NULL
        |    THEN '***MASKED***' END AS c_mktsegment,
        |  c_acctbal
        |FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM ent)""".stripMargin,

    // q146: the maintained counts+signals marts must equal the WHOLE DAG
    // recomputed flat — latest report per key (q140's fixture CTE), the
    // fact derivations (canonicalization collapses both ACME case
    // variants, the ILIKE ladder over the narrative, the '(unknown)'
    // defaults, the NULL-date filter), ae_counts_q's grouping, then
    // v_ae_early_signals' windows verbatim from the q08 oracle shape —
    // maintained == rebuilt is the IVM identity on the reference's
    // flagship analytic
    "q146_signals_ivm" ->
      """WITH o AS (SELECT o_orderkey AS seq, o_orderkey % 1000 AS rk,
        |    o_orderdate FROM orders),
        |last AS (SELECT seq, rk, o_orderdate FROM (
        |    SELECT *, row_number() OVER (PARTITION BY rk ORDER BY seq DESC)
        |      AS rn FROM o) WHERE rn = 1),
        |fact AS (SELECT
        |    CASE seq % 5 WHEN 0 THEN 'ACME' WHEN 1 THEN 'ACME'
        |      WHEN 2 THEN 'MEDTECH' WHEN 3 THEN 'ZETA'
        |      ELSE 'NoSuch Inc' END AS canonical_mfr,
        |    CASE seq % 4 WHEN 0 THEN '(unknown)' WHEN 1 THEN 'LEAK'
        |      WHEN 2 THEN 'FRACTURE' ELSE 'THROMBUS/CLOT'
        |    END AS failure_mode,
        |    o_orderdate::DATE AS date_received
        |  FROM last WHERE seq % 97 <> 0),
        |c AS (SELECT canonical_mfr, failure_mode,
        |    year(date_received)*4 + quarter(date_received) AS quarter_index,
        |    year(date_received)::VARCHAR || '-Q' ||
        |      quarter(date_received)::VARCHAR AS year_quarter,
        |    count(*) AS n_events
        |  FROM fact GROUP BY 1, 2, 3, 4)
        |SELECT canonical_mfr, failure_mode, year_quarter, quarter_index,
        |  n_events,
        |  round(avg(n_events) OVER w, 4) AS mean_4,
        |  round(stddev_samp(n_events) OVER w, 4) AS std_4,
        |  round(CASE WHEN (stddev_samp(n_events) OVER w) IS NULL
        |               OR (stddev_samp(n_events) OVER w) = 0 THEN NULL
        |        ELSE (n_events - (avg(n_events) OVER w))
        |             / (stddev_samp(n_events) OVER w) END, 4) AS z_score
        |FROM c
        |WINDOW w AS (PARTITION BY canonical_mfr, failure_mode
        |  ORDER BY quarter_index
        |  ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING)""".stripMargin,

    // q147: the expected lineage edges as constants — deliberately
    // static truth: the declared side EXTRACTS the edges from the
    // analyzed plans, so the compare is a lineage regression gate (a
    // model gaining/losing a source table hash-diverges here)
    "q147_lineage" ->
      """SELECT * FROM (VALUES
        |  ('q01_pricing_summary', 'lineitem.parquet'),
        |  ('q04_region_nation_revenue', 'nation.parquet'),
        |  ('q04_region_nation_revenue', 'region.parquet'),
        |  ('q04_region_nation_revenue', 'lineitem.parquet'),
        |  ('q04_region_nation_revenue', 'orders.parquet'),
        |  ('q04_region_nation_revenue', 'customer.parquet'),
        |  ('q04_region_nation_revenue', 'supplier.parquet'),
        |  ('q14_dedup_exact', 'documents.parquet'))
        |  AS t(model, source)""".stripMargin,

    // q149: flat recompute from orders — the declared side materialized
    // the rollup, re-issued the query, REQUIRED the plan to scan the
    // mart, and returned the mart-derived rows; equality here gates the
    // whole materialize->rewrite->serve path
    "q149_mv_rewrite" ->
      """SELECT o_orderpriority,
        |       count(*) AS n_orders,
        |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
        |       round(CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) / count(*), 2) AS avg_order_value
        |FROM orders
        |GROUP BY o_orderpriority
        |HAVING count(*) > 0""".stripMargin,

    // q150: flat recompute from orders — the declared side served the
    // rollup FROM the (priority, status) mart (plan-required), so
    // equality proves sum/count/min/max re-aggregation over group
    // partials matches the flat computation; round(…,2) absorbs
    // double accumulation-order drift per house rules
    "q150_mv_rollup" ->
      """SELECT o_orderstatus,
        |       count(*) AS n_orders,
        |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
        |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 2) AS avg_order_value,
        |       round(min(o_totalprice), 2) AS min_total,
        |       round(max(o_totalprice), 2) AS max_total
        |FROM orders
        |GROUP BY o_orderstatus""".stripMargin,

    // q151: the aggregation policy stated relationally — group, NULL
    // the under-floor keys, regroup; counts re-aggregate as sums (cast
    // back to BIGINT: DuckDB's sum-of-BIGINT widens to HUGEINT)
    "q151_agg_policy" ->
      """WITH g AS (
        |  SELECT o_custkey, count(o_totalprice) AS n,
        |         sum(o_totalprice) AS s, max(o_totalprice) AS m
        |  FROM orders GROUP BY o_custkey
        |), r AS (
        |  SELECT CASE WHEN n >= 15 THEN o_custkey END AS o_custkey,
        |         n, s, m
        |  FROM g
        |)
        |SELECT o_custkey,
        |       CAST(sum(n) AS BIGINT) AS n_orders,
        |       round(sum(s), 2) AS revenue,
        |       round(max(m), 2) AS max_total
        |FROM r GROUP BY o_custkey""".stripMargin,

    // q152: both masks as CASE ladders — the conditional tail mask
    // opens per row on the derived consent flag (positive balance),
    // stays closed on NULL, and the unconditional full mask composes
    "q152_conditional_mask" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal > 0 THEN c_name
        |       WHEN c_name IS NULL THEN NULL
        |       WHEN length(c_name) <= 6 THEN c_name
        |       ELSE repeat('*', length(c_name) - 6) || right(c_name, 6)
        |  END AS c_name,
        |  CASE WHEN c_mktsegment IS NULL THEN NULL
        |       ELSE '***MASKED***' END AS c_mktsegment,
        |  c_acctbal
        |FROM customer""".stripMargin,

    // q153: the projection-policy ALLOWED query stated flat — the
    // protected c_acctbal appears only in the predicate, the served
    // columns derive from unprotected inputs (the deny side is
    // spec-pinned: it throws, so no SQL can state it)
    "q153_projection_policy" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |       count(DISTINCT c_nationkey) AS n_nations
        |FROM customer
        |WHERE c_acctbal > 5000
        |GROUP BY c_mktsegment""".stripMargin,

    // q154: the classifier sweep restated relationally — UNPIVOT each
    // table to long form, cross the category registry, count
    // anchored-regex matches, pick the best candidate per column
    // (count desc, precedence), and decide in INTEGER space
    // (n_match * 1e6 >= 9e5 * n_values), so no float ever reaches the
    // hash. DuckDB's UNPIVOT drops NULL values; Spark counts non-nulls
    // — same denominator either way.
    "q154_classify" ->
      """WITH cats(category, prec, re) AS (VALUES
        |  ('entity_id', 0, '^[A-Za-z]+#[0-9]+$'),
        |  ('lang_code', 1, '^[a-z]{2}$'),
        |  ('json_object', 2, '^\{.*\}$')
        |), long AS (
        |  SELECT 'customer' AS table_name, column_name, v FROM (
        |    UNPIVOT (SELECT c_name, c_mktsegment FROM customer)
        |    ON c_name, c_mktsegment INTO NAME column_name VALUE v)
        |  UNION ALL
        |  SELECT 'documents', column_name, v FROM (
        |    UNPIVOT (SELECT "text", lang, source FROM documents)
        |    ON "text", lang, source INTO NAME column_name VALUE v)
        |  UNION ALL
        |  SELECT 'events', column_name, v FROM (
        |    UNPIVOT (SELECT event_type, props FROM events)
        |    ON event_type, props INTO NAME column_name VALUE v)
        |), m AS (
        |  SELECT table_name, column_name, category, prec,
        |         count(v) AS n_values,
        |         sum(CASE WHEN regexp_matches(v, re) THEN 1 ELSE 0 END)
        |           AS n_match
        |  FROM long CROSS JOIN cats
        |  GROUP BY table_name, column_name, category, prec
        |), best AS (
        |  SELECT *, row_number() OVER (PARTITION BY table_name, column_name
        |    ORDER BY n_match DESC, prec) AS rn FROM m
        |)
        |SELECT table_name, column_name,
        |       CASE WHEN n_values > 0
        |                 AND n_match * 1000000 >= 900000 * n_values
        |            THEN category ELSE 'text' END AS semantic_category,
        |       CAST(n_values AS BIGINT) AS n_values,
        |       CAST(n_match AS BIGINT) AS n_match
        |FROM best WHERE rn = 1""".stripMargin,

    // q155: the auto-bound mask restated — the classifier decides
    // c_name is an entity id (the oracle trusts q154's gate for that),
    // the entity_id rule binds mask_tail(4), so the served view is the
    // usual last-4 CASE ladder; unclassified columns ride through raw
    "q155_auto_mask" ->
      """SELECT c_custkey,
        |  CASE WHEN c_name IS NULL THEN NULL
        |       WHEN length(c_name) <= 4 THEN c_name
        |       ELSE repeat('*', length(c_name) - 4) || right(c_name, 4)
        |  END AS c_name,
        |  c_mktsegment
        |FROM customer""".stripMargin,

    // q156: the V-pattern MATCH_RECOGNIZE stated relationally — lag
    // delta → symbol ladder → run numbering (null-safe lag compare) →
    // run collapse (first/last values via unbounded-frame windows) →
    // lead chain → down-then-up candidates. With distinct pattern
    // symbols overlap is impossible, so the candidate set IS the match
    // set and no greedy de-overlap appears (the engine takes the same
    // fast path; the repeated-symbol W case is spec-pinned instead).
    "q156_match_recognize" ->
      """WITH pre AS (
        |  SELECT user_id, ts, event_id, value,
        |         value - lag(value) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS dv
        |  FROM events
        |), c AS (
        |  SELECT user_id, ts, event_id, value,
        |         CASE WHEN dv < 0 THEN 'down'
        |              WHEN dv > 0 THEN 'up' END AS sym
        |  FROM pre
        |), nr AS (
        |  SELECT *, CASE WHEN sym IS NOT DISTINCT FROM
        |      lag(sym) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      THEN 0 ELSE 1 END AS new_run
        |  FROM c
        |), r AS (
        |  SELECT *, sum(new_run)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run_id
        |  FROM nr
        |), rv AS (
        |  SELECT *, first_value(value) OVER pr AS vf,
        |         last_value(value) OVER pr AS vl
        |  FROM r
        |  WINDOW pr AS (PARTITION BY user_id, run_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |), runs AS (
        |  SELECT user_id, run_id, min(sym) AS sym, count(*) AS n,
        |         min(ts) AS o_first, max(ts) AS o_last,
        |         min(vf) AS v_first, min(vl) AS v_last,
        |         min(value) AS v_min
        |  FROM rv GROUP BY user_id, run_id
        |), cand AS (
        |  SELECT user_id, run_id, sym, n, o_first, v_first, v_min,
        |         lead(sym) OVER rw AS sym2, lead(n) OVER rw AS n2,
        |         lead(o_last) OVER rw AS o_last2,
        |         lead(v_last) OVER rw AS v_last2,
        |         lead(v_min) OVER rw AS v_min2
        |  FROM runs WINDOW rw AS (PARTITION BY user_id ORDER BY run_id)
        |)
        |SELECT user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id
        |         ORDER BY run_id) AS BIGINT) AS match_num,
        |       strftime(o_first, '%Y-%m-%d %H:%M:%S') AS t_start,
        |       strftime(o_last2, '%Y-%m-%d %H:%M:%S') AS t_end,
        |       CAST(n AS BIGINT) AS down_rows,
        |       CAST(n2 AS BIGINT) AS up_rows,
        |       v_first AS v_start, least(v_min, v_min2) AS v_bottom,
        |       v_last2 AS v_end
        |FROM cand WHERE sym = 'down' AND sym2 = 'up'""".stripMargin,

    // q157: the epoch-7 permutation restated — identical SHA lanes
    // (the ShaLanes cross-engine contract), shard = lane mod 16, pos =
    // per-shard rank over (lane, doc_id)
    "q157_epoch_shuffle" ->
      s"""SELECT CAST(lane % 16 AS BIGINT) AS shard,
         |       CAST(row_number() OVER (PARTITION BY lane % 16
         |         ORDER BY lane, doc_id) AS BIGINT) AS pos,
         |       doc_id
         |FROM (SELECT doc_id,
         |  ${graft.functions.ShaLanes.duckLane("'epoch7|' || doc_id::VARCHAR")} AS lane
         |  FROM documents)""".stripMargin,

    // q158: hopping windows restated — every event lands in the
    // day-aligned 2-day window starting at its UTC day and the one
    // before (two UNION legs), then the same (window, type) group;
    // window bounds as UTC date strings (session tz is UTC on both
    // engines), sums rounded per house float rules
    "q158_hopping_window" ->
      """WITH e AS (
        |  SELECT event_type, value,
        |         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day0
        |  FROM events
        |), x AS (
        |  SELECT event_type, value, day0 AS w FROM e
        |  UNION ALL
        |  SELECT event_type, value, day0 - 1 FROM e
        |)
        |SELECT strftime(DATE '1970-01-01' + CAST(w AS INTEGER),
        |         '%Y-%m-%d') AS w_start,
        |       strftime(DATE '1970-01-01' + CAST(w + 2 AS INTEGER),
        |         '%Y-%m-%d') AS w_end,
        |       event_type, count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS v_sum
        |FROM x GROUP BY 1, 2, 3""".stripMargin,

    // q159: the decomposition restated with the SAME exact arithmetic —
    // integer frame sums cast to double, trend as one division, the
    // detrended value scaled by lcm(1..7)=420 so the seasonal group sum
    // adds integer-valued doubles (order-independent), seasonal and
    // residual as single divisions/subtractions on identical operands;
    // raw doubles hash-match with NO rounding
    "q159_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), t AS (
        |  SELECT event_type, day, n,
        |         CAST(sum(n) OVER f AS DOUBLE) AS s,
        |         CAST(count(n) OVER f AS DOUBLE) AS k
        |  FROM daily
        |  WINDOW f AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |), d2 AS (
        |  SELECT *, s / k AS trend,
        |         420.0 * n - (420.0 / k) * s AS det420,
        |         day % 7 AS pos
        |  FROM t
        |), s2 AS (
        |  SELECT *, sum(det420) OVER (PARTITION BY event_type, pos) AS sdet,
        |            count(*) OVER (PARTITION BY event_type, pos) AS cdet
        |  FROM d2
        |)
        |SELECT event_type,
        |       strftime(DATE '1970-01-01' + CAST(day AS INTEGER),
        |         '%Y-%m-%d') AS d,
        |       CAST(n AS BIGINT) AS n, trend,
        |       sdet / (cdet * 420.0) AS seasonal,
        |       n - trend - (sdet / (cdet * 420.0)) AS residual
        |FROM s2""".stripMargin,

    // q160: CUSUM restated — same prefix mean (floor of one exact
    // division), same dyadic deviations, running sum then running min
    // in SEPARATE CTEs (DuckDB rejects nested window calls); day is
    // unique per series so the default RANGE frame equals Spark's ROWS
    "q160_cusum" -> cusumOracle,

    // q162: the SAME batch pipeline is the oracle for the replayed
    // (incrementally maintained, disk-state) counts feeding CUSUM —
    // maintained == recomputed IS the freshness claim
    "q162_alarm_replay" -> cusumOracle,

    // q163: Benford restated — exact cents, first digit, the same nine
    // decimal-literal probabilities (cast to DOUBLE: DuckDB parses bare
    // decimals as DECIMAL), expected/chi2 as single ops on identical
    // operands — raw doubles hash-match
    "q163_benford" ->
      """WITH c AS (
        |  SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |           AS VARCHAR), 1, 1) AS digit
        |  FROM orders
        |), o AS (
        |  SELECT digit, count(*) AS n_obs FROM c GROUP BY digit
        |), t AS (
        |  SELECT *, sum(n_obs) OVER () AS n_total FROM o
        |), p(digit, pr) AS (VALUES
        |  ('1', CAST(0.3010299956639812 AS DOUBLE)),
        |  ('2', CAST(0.17609125905568124 AS DOUBLE)),
        |  ('3', CAST(0.12493873660829992 AS DOUBLE)),
        |  ('4', CAST(0.09691001300805642 AS DOUBLE)),
        |  ('5', CAST(0.07918124604762482 AS DOUBLE)),
        |  ('6', CAST(0.06694678963061322 AS DOUBLE)),
        |  ('7', CAST(0.05799194697768673 AS DOUBLE)),
        |  ('8', CAST(0.05115252244738129 AS DOUBLE)),
        |  ('9', CAST(0.04575749056067514 AS DOUBLE))
        |)
        |SELECT t.digit, CAST(n_obs AS BIGINT) AS n_obs,
        |       CAST(n_total AS BIGINT) AS n_total,
        |       n_total * pr AS expected,
        |       (n_obs - n_total * pr) * (n_obs - n_total * pr)
        |         / (n_total * pr) AS chi2_term
        |FROM t JOIN p USING (digit)""".stripMargin,

    // q164: Hamilton apportionment restated relationally — floor-div
    // base + row_number over (remainder DESC, lang) hands out the
    // leftover units; stratum membership is the identical SHA-lane rank
    // the Spark side computes. All integer: the 100 sampled rows must
    // match exactly.
    "q164_stratified_exact" ->
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |t AS (SELECT sum(n) AS pop FROM c),
        |a0 AS (SELECT lang, n, (100 * n) // pop AS base,
        |              (100 * n) % pop AS rem FROM c CROSS JOIN t),
        |d AS (SELECT 100 - sum(base) AS deficit FROM a0),
        |a AS (SELECT lang,
        |        base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
        |                         <= deficit THEN 1 ELSE 0 END AS alloc
        |      FROM a0 CROSS JOIN d),
        |r AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang ORDER BY
        |          ${graft.functions.ShaLanes.duckLane("'strat|' || CAST(doc_id AS VARCHAR)")},
        |          doc_id) AS rk
        |      FROM documents)
        |SELECT r.doc_id, r.lang, CAST(r.rk AS BIGINT) AS rk
        |FROM r JOIN a USING (lang) WHERE r.rk <= a.alloc""".stripMargin,

    // q165: the same sort-free 2-D skyline — per-price best size, strict
    // running max over the distinct-price curve (ROWS ... 1 PRECEDING on
    // the grouped table = all strictly cheaper prices), frontier join
    // back. Doubles compared on identical parquet bits, never computed.
    "q165_skyline" ->
      """WITH g AS (SELECT p_retailprice AS pr, max(p_size) AS best
        |           FROM part GROUP BY 1),
        |f AS (SELECT pr, best, max(best) OVER (ORDER BY pr
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS strict
        |      FROM g)
        |SELECT p_partkey, p_name, p_retailprice,
        |       CAST(p_size AS BIGINT) AS p_size
        |FROM part JOIN f ON p_retailprice = pr
        |WHERE p_size = best AND (strict IS NULL OR strict < p_size)""".stripMargin,

    // q166: the Apriori pipeline restated — distinct baskets, ceil-rate
    // threshold, frequent-1 prune inside the pair join's WHERE, both
    // rule directions. Metrics are the identical single divisions of
    // integer counts/products; no rounding.
    "q166_association_rules" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, p_brand AS i
        |            FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT count(DISTINCT b) AS nbk FROM bi),
        |th AS (SELECT CAST(ceil(0.02 * nbk) AS BIGINT) AS t, nbk FROM n),
        |c1 AS (SELECT i, count(*) AS ni FROM bi GROUP BY 1),
        |f1 AS (SELECT i, ni FROM c1 CROSS JOIN th WHERE ni >= t),
        |p AS (SELECT a.i AS ia, bb.i AS ib, count(*) AS nab
        |      FROM bi a JOIN bi bb ON a.b = bb.b AND a.i < bb.i
        |      WHERE a.i IN (SELECT i FROM f1)
        |        AND bb.i IN (SELECT i FROM f1)
        |      GROUP BY 1, 2),
        |fp AS (SELECT ia, ib, nab, fa.ni AS na, fb.ni AS nc, th.nbk
        |       FROM p JOIN f1 fa ON p.ia = fa.i
        |              JOIN f1 fb ON p.ib = fb.i
        |       CROSS JOIN th WHERE nab >= t)
        |SELECT ia AS antecedent, ib AS consequent,
        |       CAST(nbk AS BIGINT) AS n_baskets, CAST(na AS BIGINT) AS n_ante,
        |       CAST(nc AS BIGINT) AS n_cons, CAST(nab AS BIGINT) AS n_both,
        |       CAST(nab AS DOUBLE) / CAST(nbk AS DOUBLE) AS support,
        |       CAST(nab AS DOUBLE) / CAST(na AS DOUBLE) AS confidence,
        |       CAST(nbk AS DOUBLE) * CAST(nab AS DOUBLE)
        |         / (CAST(na AS DOUBLE) * CAST(nc AS DOUBLE)) AS lift
        |FROM fp
        |UNION ALL
        |SELECT ib, ia, CAST(nbk AS BIGINT), CAST(nc AS BIGINT),
        |       CAST(na AS BIGINT), CAST(nab AS BIGINT),
        |       CAST(nab AS DOUBLE) / CAST(nbk AS DOUBLE),
        |       CAST(nab AS DOUBLE) / CAST(nc AS DOUBLE),
        |       CAST(nbk AS DOUBLE) * CAST(nab AS DOUBLE)
        |         / (CAST(na AS DOUBLE) * CAST(nc AS DOUBLE))
        |FROM fp""".stripMargin,

    // q167: the same 2×K contingency tables (per dim), shares and
    // expectations as the identical chained correctly-rounded float ops
    // on integer counts (chi2 raw), PSI through round-6 (the ln lane).
    "q167_drift" -> driftOracle,

    // q180: identical oracle — the incrementally maintained contingency
    // mart must serve the SAME metrics the batch recompute yields
    // (maintained == recomputed IS the freshness claim, q162's posture)
    "q180_drift_replay" -> driftOracle,

    // q168: the same G² pipeline — cohort-conditional term counts, one
    // vocabulary window for totals, integer cross-products for `leans`,
    // expectations as the identical chained float ops, G² through
    // round-6 (the ln lane)
    "q168_keyness" ->
      """WITH toks AS (SELECT (CAST(substr(source, 4) AS INT) < 10) AS a,
        |                unnest(str_split(text, ' ')) AS term
        |              FROM documents),
        |t AS (SELECT term, sum(CASE WHEN a THEN 1 ELSE 0 END) AS n_a,
        |             sum(CASE WHEN a THEN 0 ELSE 1 END) AS n_b
        |      FROM toks GROUP BY 1),
        |w AS (SELECT *, sum(n_a) OVER () AS ta, sum(n_b) OVER () AS tb
        |      FROM t),
        |f AS (SELECT * FROM w WHERE n_a + n_b >= 20),
        |s AS (SELECT term, n_a, n_b, ta, tb,
        |        CAST(n_a + n_b AS DOUBLE) * CAST(ta AS DOUBLE)
        |          / CAST(ta + tb AS DOUBLE) AS ea,
        |        CAST(n_a + n_b AS DOUBLE) * CAST(tb AS DOUBLE)
        |          / CAST(ta + tb AS DOUBLE) AS eb
        |      FROM f)
        |SELECT term, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |       CASE WHEN n_a * tb > n_b * ta THEN 'A'
        |            WHEN n_a * tb < n_b * ta THEN 'B' ELSE '=' END AS leans,
        |       round(2 * (CASE WHEN n_a > 0 THEN CAST(n_a AS DOUBLE)
        |                    * ln(CAST(n_a AS DOUBLE) / ea) ELSE 0 END
        |                + CASE WHEN n_b > 0 THEN CAST(n_b AS DOUBLE)
        |                    * ln(CAST(n_b AS DOUBLE) / eb) ELSE 0 END), 6)
        |         AS g2
        |FROM s""".stripMargin,

    // q169: the identical spine + bracketing-observation windows (the
    // q125 IGNORE NULLS idiom, both frame directions); the interpolation
    // numerator is BIGINT-exact, one division + one addition — raw
    // doubles hash-match
    "q169_interpolate" ->
      """WITH daily AS (SELECT o_orderpriority AS priority,
        |        CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS t,
        |        count(*) AS n FROM orders GROUP BY 1, 2),
        |r AS (SELECT priority, min(t) AS t0, max(t) AS t1
        |      FROM daily GROUP BY 1),
        |spine AS (SELECT priority, unnest(generate_series(t0, t1)) AS t
        |          FROM r),
        |j AS (SELECT s.priority, s.t, d.n FROM spine s
        |      LEFT JOIN daily d ON s.priority = d.priority AND s.t = d.t),
        |w AS (SELECT priority, t, n,
        |        last_value(n IGNORE NULLS) OVER wb AS pv,
        |        last_value(CASE WHEN n IS NOT NULL THEN t END IGNORE NULLS)
        |          OVER wb AS pt,
        |        first_value(n IGNORE NULLS) OVER wf AS nv,
        |        first_value(CASE WHEN n IS NOT NULL THEN t END IGNORE NULLS)
        |          OVER wf AS nt
        |      FROM j
        |      WINDOW wb AS (PARTITION BY priority ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |             wf AS (PARTITION BY priority ORDER BY t
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT priority, t, CAST(n IS NOT NULL AS BIGINT) AS observed,
        |       CAST(n AS BIGINT) AS n,
        |       CASE WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
        |            WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
        |            WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
        |            ELSE CAST(pv AS DOUBLE)
        |              + CAST((nv - pv) * (t - pt) AS DOUBLE)
        |                / CAST(nt - pt AS DOUBLE)
        |       END AS v_interp
        |FROM w""".stripMargin,

    // q170: same rank + running-sum over the vocabulary, the minimal-
    // prefix membership as the identical cross-multiplied integer
    // comparison
    "q170_vocab_coverage" ->
      """WITH toks AS (SELECT unnest(str_split(text, ' ')) AS term
        |              FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
        |w AS (SELECT term, CAST(cnt AS BIGINT) AS cnt,
        |        CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT)
        |          AS rk,
        |        CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum_cnt,
        |        CAST(sum(cnt) OVER () AS BIGINT) AS total_cnt
        |      FROM c)
        |SELECT term, cnt, rk, cum_cnt, total_cnt
        |FROM w WHERE 100 * (cum_cnt - cnt) < 95 * total_cnt""".stripMargin,

    // q171: the same join + three-model credit table, rolled up — the
    // per-pair credits are exact (integer flags, one division 1/n), the
    // grouped sum rides round-4 like every aggregated double
    "q171_attribution" ->
      """WITH c AS (SELECT user_id AS u, ts AS cts, event_id AS cid
        |           FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id AS u, ts AS tts, event_id AS tid,
        |             event_type AS channel
        |      FROM events WHERE event_type IN ('click', 'view')),
        |j AS (SELECT c.u, cid, tid, channel, tts, cts
        |      FROM c JOIN t USING (u)
        |      WHERE tts <= cts AND tts > cts - INTERVAL 7 DAY
        |        AND tid <> cid),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY cid ORDER BY tts, tid) AS rf,
        |        row_number() OVER (PARTITION BY cid
        |          ORDER BY tts DESC, tid DESC) AS rl,
        |        count(*) OVER (PARTITION BY cid) AS n
        |      FROM j),
        |p AS (SELECT cid, channel, 'first_touch' AS model,
        |        CASE WHEN rf = 1 THEN 1.0 ELSE 0.0 END AS credit FROM r
        |      UNION ALL
        |      SELECT cid, channel, 'last_touch',
        |        CASE WHEN rl = 1 THEN 1.0 ELSE 0.0 END FROM r
        |      UNION ALL
        |      SELECT cid, channel, 'linear', 1.0 / CAST(n AS DOUBLE) FROM r)
        |SELECT model, channel, round(sum(credit), 4) AS credit,
        |       CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(count(DISTINCT CASE WHEN credit > 0 THEN cid END)
        |         AS BIGINT) AS n_credited
        |FROM p GROUP BY 1, 2""".stripMargin,

    // q172: the same lag columns unpivoted by UNION (DuckDB's stack),
    // corr dropping NULL-lagged pairs on both sides, round-6 moments
    "q172_acf" -> {
      val legs = (1 to 7).map(k =>
        s"""SELECT event_type, CAST($k AS BIGINT) AS lag,
           |        CAST(n AS DOUBLE) AS v, CAST(l$k AS DOUBLE) AS lv FROM l"""
          .stripMargin).mkString("\n      UNION ALL\n      ")
      s"""WITH daily AS (SELECT event_type,
        |        CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
        |        count(*) AS n FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, n,
        |        ${(1 to 7).map(k => s"lag(n, $k) OVER w AS l$k").mkString(", ")}
        |      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |u AS ($legs)
        |SELECT event_type, lag, CAST(count(lv) AS BIGINT) AS n_pairs,
        |       round(corr(v, lv), 6) AS acf
        |FROM u GROUP BY 1, 2""".stripMargin
    },

    // q173: identical distinct-value weight curve and integer crossing
    // test — both engines land on the same row with no float anywhere
    "q173_weighted_median" ->
      """WITH g AS (SELECT l_returnflag, l_quantity AS v,
        |             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS w
        |           FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT *, sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
        |        sum(w) OVER (PARTITION BY l_returnflag) AS total_w
        |      FROM g)
        |SELECT l_returnflag, v AS median, CAST(w AS BIGINT) AS w_at,
        |       CAST(cum_w AS BIGINT) AS cum_w,
        |       CAST(total_w AS BIGINT) AS total_w
        |FROM c WHERE 2 * cum_w >= total_w AND 2 * (cum_w - w) < total_w"""
        .stripMargin,

    // q174: same member-mass curve; Gini from Long-exact Σi·x / n·Σx
    // (raw), HHI through round-6 (squared-share accumulation)
    "q174_concentration" ->
      """WITH rev AS (SELECT r_name, l_suppkey AS m,
        |               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS x
        |             FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |               JOIN nation ON s_nationkey = n_nationkey
        |               JOIN region ON n_regionkey = r_regionkey
        |             GROUP BY 1, 2),
        |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY r_name
        |         ORDER BY x, m) AS BIGINT) AS i FROM rev),
        |a AS (SELECT r_name, CAST(count(*) AS BIGINT) AS n_members,
        |        CAST(sum(x) AS BIGINT) AS total_mass,
        |        CAST(sum(i * x) AS BIGINT) AS s,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sq
        |      FROM rk GROUP BY 1)
        |SELECT r_name, n_members, total_mass,
        |       2.0 * CAST(s AS DOUBLE) / CAST(n_members * total_mass AS DOUBLE)
        |         - CAST(n_members + 1 AS DOUBLE) / CAST(n_members AS DOUBLE)
        |         AS gini,
        |       round(sq / (CAST(total_mass AS DOUBLE)
        |         * CAST(total_mass AS DOUBLE)), 6) AS hhi
        |FROM a""".stripMargin,

    // q175: unoriented 3-way closure under a < b < c (each triangle
    // once, matching the orientation argument), same degree table and
    // the identical exact-Long cc division
    "q175_triangles" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem),
        |e AS (SELECT DISTINCT x.p AS a, y.p AS b
        |      FROM bi x JOIN bi y ON x.o = y.o AND x.p < y.p),
        |deg AS (SELECT n, count(*) AS degree FROM (
        |          SELECT a AS n FROM e UNION ALL SELECT b FROM e)
        |        GROUP BY 1),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
        |                  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |pn AS (SELECT n, count(*) AS n_tri FROM (
        |         SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
        |         UNION ALL SELECT z FROM tri)
        |       GROUP BY 1)
        |SELECT deg.n AS node, CAST(degree AS BIGINT) AS degree,
        |       CAST(coalesce(n_tri, 0) AS BIGINT) AS n_tri,
        |       CAST(2 * coalesce(n_tri, 0) AS DOUBLE)
        |         / CAST(degree * (degree - 1) AS DOUBLE) AS local_cc
        |FROM deg LEFT JOIN pn ON deg.n = pn.n
        |WHERE degree >= 2""".stripMargin,

    // q176: same per-customer aggregates, quantile_cont boundaries (the
    // interpolated-percentile twin of Spark's percentile), identical
    // scan-side boundary comparisons, exact segment-cube counts
    "q176_rfm" ->
      """WITH cust AS (SELECT o_custkey,
        |    max(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT))
        |      AS last_day,
        |    count(*) AS freq,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary
        |  FROM orders GROUP BY 1),
        |b AS (SELECT quantile_cont(last_day, [0.2, 0.4, 0.6, 0.8]) AS rb,
        |             quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS fb,
        |             quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mb
        |      FROM cust),
        |q AS (SELECT monetary,
        |    1 + CAST(CAST(last_day AS DOUBLE) > rb[1] AS BIGINT)
        |      + CAST(CAST(last_day AS DOUBLE) > rb[2] AS BIGINT)
        |      + CAST(CAST(last_day AS DOUBLE) > rb[3] AS BIGINT)
        |      + CAST(CAST(last_day AS DOUBLE) > rb[4] AS BIGINT) AS r_q,
        |    1 + CAST(CAST(freq AS DOUBLE) > fb[1] AS BIGINT)
        |      + CAST(CAST(freq AS DOUBLE) > fb[2] AS BIGINT)
        |      + CAST(CAST(freq AS DOUBLE) > fb[3] AS BIGINT)
        |      + CAST(CAST(freq AS DOUBLE) > fb[4] AS BIGINT) AS f_q,
        |    1 + CAST(CAST(monetary AS DOUBLE) > mb[1] AS BIGINT)
        |      + CAST(CAST(monetary AS DOUBLE) > mb[2] AS BIGINT)
        |      + CAST(CAST(monetary AS DOUBLE) > mb[3] AS BIGINT)
        |      + CAST(CAST(monetary AS DOUBLE) > mb[4] AS BIGINT) AS m_q
        |  FROM cust CROSS JOIN b)
        |SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(monetary) AS BIGINT) AS total_cents,
        |       CAST(sum(monetary) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |         AS avg_cents
        |FROM q GROUP BY 1, 2, 3""".stripMargin,

    // q177: the identical day − row_number run key and grouped collapse
    "q177_islands" ->
      """WITH daily AS (SELECT o_orderpriority AS priority,
        |        CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
        |        count(*) AS n
        |      FROM orders GROUP BY 1, 2),
        |g AS (SELECT *, day - row_number() OVER (PARTITION BY priority
        |        ORDER BY day) AS grp FROM daily)
        |SELECT priority, CAST(min(day) AS BIGINT) AS start_day,
        |       CAST(max(day) AS BIGINT) AS end_day,
        |       CAST(count(*) AS BIGINT) AS len_days,
        |       CAST(sum(n) AS BIGINT) AS n_orders
        |FROM g GROUP BY priority, grp""".stripMargin,

    // q178: same micros lead() durations under the same tie-break; the
    // product sum rides round-6
    "q178_twap" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS t, value AS v,
        |             event_id FROM events),
        |l AS (SELECT event_type, v,
        |        lead(t) OVER (PARTITION BY event_type
        |          ORDER BY t, event_id) - t AS dt
        |      FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals,
        |       CAST(sum(dt) AS BIGINT) AS total_dt,
        |       round(sum(v * CAST(dt AS DOUBLE)) / CAST(sum(dt) AS DOUBLE), 6)
        |         AS twap
        |FROM l WHERE dt IS NOT NULL GROUP BY 1""".stripMargin,

    // q179: the same cells/marginals over the FULL R×C grid (a
    // zero-observed cell still contributes exp to chi2); chi2 rounded
    // 6, V from the ROUNDED chi2 via correctly-rounded sqrt/division
    "q179_cramers_v" ->
      """WITH cells AS (SELECT event_type AS r,
        |        (CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7) AS c,
        |        count(*) AS n FROM events GROUP BY 1, 2),
        |rt AS (SELECT r, sum(n) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT c, sum(n) AS ct FROM cells GROUP BY 1),
        |t AS (SELECT sum(n) AS t, count(DISTINCT r) AS rl,
        |             count(DISTINCT c) AS cl FROM cells),
        |j AS (SELECT coalesce(cells.n, 0) AS n, rt.rt, ct.ct,
        |             t.t, t.rl, t.cl
        |      FROM rt CROSS JOIN ct
        |      LEFT JOIN cells ON cells.r = rt.r AND cells.c = ct.c
        |      CROSS JOIN t),
        |a AS (SELECT t, rl, cl,
        |        round(sum((CAST(n AS DOUBLE)
        |            - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |              / CAST(t AS DOUBLE))
        |          * (CAST(n AS DOUBLE)
        |            - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |              / CAST(t AS DOUBLE))
        |          / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |              / CAST(t AS DOUBLE))), 6) AS chi2
        |      FROM j GROUP BY 1, 2, 3)
        |SELECT CAST(t AS BIGINT) AS n, CAST(rl AS BIGINT) AS r_levels,
        |       CAST(cl AS BIGINT) AS c_levels, chi2,
        |       sqrt(chi2 / CAST(t * least(rl - 1, cl - 1) AS DOUBLE))
        |         AS cramers_v
        |FROM a""".stripMargin,

    "q181_kcore" -> kcoreOracle,

    // q182: bounded recursive-CTE walk enumeration; min over ≤4-hop
    // walks == 4 Bellman-Ford rounds under non-negative weights
    "q182_sssp" ->
      """WITH RECURSIVE
        |pairs AS (SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
        |            count(DISTINCT o_orderkey) AS n
        |          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |          GROUP BY 1, 2),
        |edges AS (SELECT c AS src, s AS dst, greatest(1, 10 - n) AS w
        |          FROM pairs
        |          UNION ALL
        |          SELECT s, c, greatest(1, 10 - n) FROM pairs),
        |walk(node, cost, hops) AS (
        |  SELECT DISTINCT c AS node, CAST(0 AS BIGINT) AS cost, 0 AS hops
        |  FROM pairs WHERE c <= 40
        |  UNION
        |  SELECT e.dst, w.cost + e.w, w.hops + 1
        |  FROM walk w JOIN edges e ON e.src = w.node
        |  WHERE w.hops < 4)
        |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
        |         AS node_type,
        |       ((CASE WHEN node % 2 = 0 THEN node ELSE node - 1 END) // 2)
        |         ::BIGINT AS entity_id,
        |       CAST(min(cost) AS BIGINT) AS cost
        |FROM walk GROUP BY 1, 2""".stripMargin,

    // q183: the identical (ts, event_id)-ordered lead chain; confidence
    // one exact-Long division (raw)
    "q183_seq_rules" ->
      """WITH seq AS (SELECT event_type AS antecedent,
        |        lead(event_type) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS consequent
        |      FROM events),
        |p AS (SELECT antecedent, consequent FROM seq
        |      WHERE consequent IS NOT NULL),
        |na AS (SELECT antecedent, count(*) AS n_ante FROM p GROUP BY 1),
        |pc AS (SELECT antecedent, consequent, count(*) AS n_pair
        |       FROM p GROUP BY 1, 2)
        |SELECT antecedent, consequent, CAST(n_pair AS BIGINT) AS n_pair,
        |       CAST(n_ante AS BIGINT) AS n_ante,
        |       CAST(n_pair AS DOUBLE) / CAST(n_ante AS DOUBLE) AS confidence
        |FROM pc JOIN na USING (antecedent)
        |WHERE n_pair >= 5""".stripMargin,

    // q184: identical unit collapse and Wilson dag; z² written 1.96*1.96
    // so both engines square the same double; bounds round-6
    "q184_ab_test" ->
      """WITH u AS (SELECT user_id,
        |        CASE WHEN user_id % 2 = 0 THEN 'control'
        |             ELSE 'treatment' END AS variant,
        |        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |          AS conv
        |      FROM events GROUP BY 1, 2),
        |c AS (SELECT variant, count(*) AS n_units, sum(conv) AS n_conv
        |      FROM u GROUP BY 1),
        |s AS (SELECT variant, n_units, n_conv,
        |        CAST(n_units AS DOUBLE) AS n,
        |        CAST(n_conv AS DOUBLE) / CAST(n_units AS DOUBLE) AS p
        |      FROM c)
        |SELECT variant, CAST(n_units AS BIGINT) AS n_units,
        |       CAST(n_conv AS BIGINT) AS n_conv, p AS rate,
        |       round((p + 1.96 * 1.96 / (2.0 * n)
        |           - 1.96 * sqrt(p * (1.0 - p) / n
        |               + 1.96 * 1.96 / (4.0 * n * n)))
        |         / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_lo,
        |       round((p + 1.96 * 1.96 / (2.0 * n)
        |           + 1.96 * sqrt(p * (1.0 - p) / n
        |               + 1.96 * 1.96 / (4.0 * n * n)))
        |         / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_hi
        |FROM s""".stripMargin,

    // q185: same pair slopes in integer micro-units under the same
    // explicit pmod floor division, same lower-median rank — no float
    "q185_theil_sen" ->
      """WITH m AS (SELECT o_orderpriority AS priority,
        |        CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
        |          AS BIGINT) AS t,
        |        CAST(count(*) AS BIGINT) AS v
        |      FROM orders GROUP BY 1, 2),
        |p AS (SELECT a.priority, 1000000 * (b.v - a.v) AS dy,
        |        b.t - a.t AS dx
        |      FROM m a JOIN m b ON a.priority = b.priority AND a.t < b.t),
        |s AS (SELECT priority,
        |        (dy - ((dy % dx) + dx) % dx) // dx AS slope FROM p),
        |r AS (SELECT priority, slope,
        |        row_number() OVER (PARTITION BY priority ORDER BY slope)
        |          AS rk,
        |        count(*) OVER (PARTITION BY priority) AS np FROM s),
        |n AS (SELECT priority, count(*) AS n_points FROM m GROUP BY 1)
        |SELECT r.priority, CAST(n_points AS BIGINT) AS n_points,
        |       CAST(np AS BIGINT) AS n_pairs,
        |       CAST(slope AS BIGINT) AS slope_micro
        |FROM r JOIN n USING (priority)
        |WHERE rk = (np + 1) // 2""".stripMargin,

    // q186: same canonical edges/degrees, same exact-BIGINT moment sums,
    // r one division of identical exact operands (raw)
    "q186_assortativity" ->
      """WITH pairs AS (SELECT DISTINCT o_custkey * 2 AS c,
        |                 l_suppkey * 2 + 1 AS s
        |               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT least(c, s) AS a, greatest(c, s) AS b FROM pairs),
        |deg AS (SELECT n, count(*) AS deg FROM (
        |          SELECT a AS n FROM e UNION ALL SELECT b FROM e)
        |        GROUP BY 1),
        |wd AS (SELECT da.deg AS x, db.deg AS y
        |       FROM e JOIN deg da ON e.a = da.n JOIN deg db ON e.b = db.n),
        |b AS (SELECT x, y FROM wd UNION ALL SELECT y, x FROM wd),
        |s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |        CAST(sum(x) AS HUGEINT) AS sx,
        |        CAST(sum(x * y) AS HUGEINT) AS sxy,
        |        CAST(sum(x * x) AS HUGEINT) AS sxx FROM b)
        |SELECT (n // 2)::BIGINT AS n_edges,
        |       (SELECT count(*)::BIGINT FROM deg) AS n_nodes,
        |       CASE WHEN n * sxx - sx * sx <> 0
        |            THEN CAST(n * sxy - sx * sx AS DOUBLE)
        |                 / CAST(n * sxx - sx * sx AS DOUBLE) END AS r
        |FROM s""".stripMargin,

    // q187: the same adjacent-trigram start positions from DuckDB's list
    // comprehension (1-indexed); exact integer hit counts
    "q187_phrase_search" ->
      """WITH t AS (SELECT doc_id AS doc, str_split(text, ' ') AS a
        |           FROM documents),
        |g AS (SELECT doc, unnest(
        |        [a[i] || ' ' || a[i+1] || ' ' || a[i+2]
        |         for i in range(1, len(a) - 1)]) AS tri FROM t)
        |SELECT doc, CAST(count(*) AS BIGINT) AS n_hits
        |FROM g WHERE tri = 'slow hash batch' GROUP BY 1""".stripMargin,

    // q188: same total order (cents, key) so rank == row_number and the
    // rank transforms are exact integer divisions; ntile BIGINT-cast
    "q188_rank_surface" ->
      """WITH o AS (SELECT o_orderpriority AS priority, o_orderkey,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders)
        |SELECT priority, o_orderkey, cents,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume,
        |       CAST(ntile(4) OVER w AS BIGINT) AS tile
        |FROM o WINDOW w AS (PARTITION BY priority
        |  ORDER BY cents, o_orderkey)""".stripMargin,

    // q189: identical integer bin arithmetic; arg_min/arg_max are
    // tie-free because the (type, bin, t) grid is pre-collapsed
    "q189_m4_downsample" ->
      """WITH e AS (SELECT event_type,
        |        CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |        CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |b AS (SELECT event_type, min(t) AS t0, max(t) AS t1
        |      FROM e GROUP BY 1),
        |x AS (SELECT e.event_type, ((t - t0) * 16) // (t1 - t0 + 1) AS bin,
        |        t, v
        |      FROM e JOIN b ON e.event_type = b.event_type),
        |g1 AS (SELECT event_type, bin, t, count(*) AS c,
        |         min(v) AS lo, max(v) AS hi
        |       FROM x GROUP BY 1, 2, 3)
        |SELECT event_type, CAST(bin AS BIGINT) AS bin,
        |       CAST(sum(c) AS BIGINT) AS n,
        |       CAST(arg_min(t, t) AS BIGINT) AS t_first,
        |       CAST(arg_min(lo, t) AS BIGINT) AS v_first,
        |       CAST(arg_max(t, t) AS BIGINT) AS t_last,
        |       CAST(arg_max(hi, t) AS BIGINT) AS v_last,
        |       CAST(min(lo) AS BIGINT) AS v_min,
        |       CAST(max(hi) AS BIGINT) AS v_max
        |FROM g1 GROUP BY 1, 2""".stripMargin,

    // q190: same category sums; each row's encoding one exact-Long
    // division (raw); singleton categories NULL
    "q190_target_encode" ->
      """WITH e AS (SELECT event_id, event_type AS cat,
        |             CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS y
        |           FROM events),
        |s AS (SELECT cat, sum(y) AS sy, count(*) AS n FROM e GROUP BY 1)
        |SELECT e.cat, e.event_id, CAST(e.y AS BIGINT) AS y,
        |       CASE WHEN n > 1 THEN CAST(sy - y AS DOUBLE)
        |              / CAST(n - 1 AS DOUBLE) END AS te
        |FROM e JOIN s USING (cat)""".stripMargin,

    // q191: identical ½-smoothed shares and log dag; woe/iv round-6.
    // q194: identical oracle — the cell counts are LINEAR, so the
    // replay-maintained mart's sums are bit-equal to the one-shot
    // aggregate and the derivation dag is shared code.
    "q191_woe_iv" -> woeIvOracle,
    "q194_woe_iv_replay" -> woeIvOracle,

    // q195: same observed-cell MI sum and marginal entropies, same
    // round-6 lane, nmi from the ROUNDED values
    "q195_mutual_info" ->
      """WITH cells AS (SELECT event_type AS x,
        |        (CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7) AS y,
        |        count(*) AS n
        |      FROM events GROUP BY 1, 2),
        |xt AS (SELECT x, sum(n) AS xt FROM cells GROUP BY 1),
        |yt AS (SELECT y, sum(n) AS yt FROM cells GROUP BY 1),
        |t AS (SELECT sum(n) AS t, count(DISTINCT x) AS xl,
        |             count(DISTINCT y) AS yl FROM cells),
        |mi AS (SELECT t, xl, yl,
        |        round(sum((CAST(n AS DOUBLE) / CAST(t AS DOUBLE))
        |          * ln(CAST(n AS DOUBLE) / CAST(t AS DOUBLE)
        |              * CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
        |              / (CAST(xt AS DOUBLE) * CAST(yt AS DOUBLE)))), 6)
        |          AS mi
        |       FROM cells JOIN xt USING (x) JOIN yt USING (y)
        |       CROSS JOIN t GROUP BY 1, 2, 3),
        |hx AS (SELECT round(sum(-(CAST(xt AS DOUBLE) / CAST(t AS DOUBLE))
        |          * ln(CAST(xt AS DOUBLE) / CAST(t AS DOUBLE))), 6) AS h_x
        |       FROM xt CROSS JOIN t),
        |hy AS (SELECT round(sum(-(CAST(yt AS DOUBLE) / CAST(t AS DOUBLE))
        |          * ln(CAST(yt AS DOUBLE) / CAST(t AS DOUBLE))), 6) AS h_y
        |       FROM yt CROSS JOIN t)
        |SELECT CAST(t AS BIGINT) AS n, CAST(xl AS BIGINT) AS x_levels,
        |       CAST(yl AS BIGINT) AS y_levels, mi, h_x, h_y,
        |       CASE WHEN least(h_x, h_y) > 0.0
        |            THEN round(mi / least(h_x, h_y), 6) END AS nmi
        |FROM mi CROSS JOIN hx CROSS JOIN hy""".stripMargin,

    // q196: the same nine exact-Long moments and the same Cramer
    // determinant dag (identical parenthesization); betas round-6
    "q196_ols2" ->
      """WITH b AS (SELECT l_returnflag AS rf,
        |        CAST(l_quantity AS BIGINT) AS x1,
        |        CAST(round(l_discount * 100) AS BIGINT) AS x2,
        |        CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |      FROM lineitem),
        |m AS (SELECT rf, count(*) AS n,
        |        CAST(sum(x1) AS BIGINT) AS s1,
        |        CAST(sum(x2) AS BIGINT) AS s2,
        |        CAST(sum(y) AS BIGINT) AS sy,
        |        CAST(sum(x1 * x1) AS BIGINT) AS s11,
        |        CAST(sum(x2 * x2) AS BIGINT) AS s22,
        |        CAST(sum(x1 * x2) AS BIGINT) AS s12,
        |        CAST(sum(x1 * y) AS BIGINT) AS s1y,
        |        CAST(sum(x2 * y) AS BIGINT) AS s2y
        |      FROM b GROUP BY 1),
        |c AS (SELECT rf, n,
        |        CAST(n AS DOUBLE) AS dn, CAST(s1 AS DOUBLE) AS d1,
        |        CAST(s2 AS DOUBLE) AS d2, CAST(sy AS DOUBLE) AS dy,
        |        CAST(s11 AS DOUBLE) AS d11, CAST(s22 AS DOUBLE) AS d22,
        |        CAST(s12 AS DOUBLE) AS d12, CAST(s1y AS DOUBLE) AS d1y,
        |        CAST(s2y AS DOUBLE) AS d2y
        |      FROM m),
        |e AS (SELECT rf, n,
        |        dn * (d11 * d22 - d12 * d12) - d1 * (d1 * d22 - d12 * d2)
        |          + d2 * (d1 * d12 - d11 * d2) AS det,
        |        dy * (d11 * d22 - d12 * d12) - d1 * (d1y * d22 - d12 * d2y)
        |          + d2 * (d1y * d12 - d11 * d2y) AS det0,
        |        dn * (d1y * d22 - d12 * d2y) - dy * (d1 * d22 - d12 * d2)
        |          + d2 * (d1 * d2y - d1y * d2) AS det1,
        |        dn * (d11 * d2y - d1y * d12) - d1 * (d1 * d2y - d1y * d2)
        |          + dy * (d1 * d12 - d11 * d2) AS det2
        |      FROM c)
        |SELECT rf AS l_returnflag, CAST(n AS BIGINT) AS n,
        |       CASE WHEN det <> 0.0 THEN round(det0 / det, 6) END AS b0,
        |       CASE WHEN det <> 0.0 THEN round(det1 / det, 6) END AS b1,
        |       CASE WHEN det <> 0.0 THEN round(det2 / det, 6) END AS b2
        |FROM e""".stripMargin,

    // q197: both rings rebuilt from sha256 over range() CTEs (the q25
    // hyperplane pattern); successor = arg_min over pt >= h (ring
    // points are 60-bit lanes — collision-free at 144 points), wrap
    // rows take the global ring head
    "q197_consistent_hash" -> {
      def ring(name: String, n: Int): String =
        s"""$name AS (SELECT ${duckLane("'ring|n' || n || '|' || v")} AS pt,
           |        'n' || n AS node
           |      FROM range(0, $n) r(n), range(0, 16) s(v))""".stripMargin
      def owns(name: String, ringName: String): String =
        s"""$name AS (
           |  SELECT d.doc_id, arg_min(r.node, r.pt) AS owner
           |  FROM docs d JOIN $ringName r ON r.pt >= d.h GROUP BY 1
           |  UNION ALL
           |  SELECT d.doc_id, (SELECT arg_min(node, pt) FROM $ringName)
           |  FROM docs d
           |  WHERE d.h > (SELECT max(pt) FROM $ringName))""".stripMargin
      s"""WITH ${ring("ring8", 8)},
         |${ring("ring9", 9)},
         |docs AS (SELECT doc_id,
         |           ${duckLane("'doc|' || doc_id::VARCHAR")} AS h
         |         FROM documents),
         |${owns("o8", "ring8")},
         |${owns("o9", "ring9")}
         |SELECT o8.owner AS owner_old, o9.owner AS owner_new,
         |       CAST(count(*) AS BIGINT) AS n_keys
         |FROM o8 JOIN o9 USING (doc_id) GROUP BY 1, 2""".stripMargin
    },

    // q198: same dyadic quantile boundaries (quantile_cont == Spark
    // percentile, q176-proven) and the same scan-side comparisons;
    // per-bucket stats exact Longs
    "q198_equidepth_hist" ->
      """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
        |           FROM orders),
        |b AS (SELECT quantile_cont(c, [0.125, 0.25, 0.375, 0.5,
        |                              0.625, 0.75, 0.875]) AS q FROM v),
        |x AS (SELECT
        |        CAST(CAST(c AS DOUBLE) > q[1] AS BIGINT)
        |      + CAST(CAST(c AS DOUBLE) > q[2] AS BIGINT)
        |      + CAST(CAST(c AS DOUBLE) > q[3] AS BIGINT)
        |      + CAST(CAST(c AS DOUBLE) > q[4] AS BIGINT)
        |      + CAST(CAST(c AS DOUBLE) > q[5] AS BIGINT)
        |      + CAST(CAST(c AS DOUBLE) > q[6] AS BIGINT)
        |      + CAST(CAST(c AS DOUBLE) > q[7] AS BIGINT) AS bucket, c
        |      FROM v CROSS JOIN b)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(c) AS BIGINT) AS v_min,
        |       CAST(max(c) AS BIGINT) AS v_max
        |FROM x GROUP BY 1""".stripMargin,

    // q200: one-shot SQL over the same FIXED viewport — the per-tick
    // grid is mergeable (counts sum, min/max re-min/max), so the
    // replay-maintained mart reduces to this exactly
    "q200_m4_replay" ->
      """WITH e AS (SELECT event_type,
        |        CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |        CAST(round(value * 100) AS BIGINT) AS v FROM events
        |      WHERE CAST(floor(epoch(ts)) AS BIGINT)
        |        BETWEEN 1704067200 AND 1706745599),
        |x AS (SELECT event_type,
        |        ((t - 1704067200) * 16) // 2678400 AS bin, t, v FROM e),
        |g1 AS (SELECT event_type, bin, t, count(*) AS c,
        |         min(v) AS lo, max(v) AS hi
        |       FROM x GROUP BY 1, 2, 3)
        |SELECT event_type, CAST(bin AS BIGINT) AS bin,
        |       CAST(sum(c) AS BIGINT) AS n,
        |       CAST(arg_min(t, t) AS BIGINT) AS t_first,
        |       CAST(arg_min(lo, t) AS BIGINT) AS v_first,
        |       CAST(arg_max(t, t) AS BIGINT) AS t_last,
        |       CAST(arg_max(hi, t) AS BIGINT) AS v_last,
        |       CAST(min(lo) AS BIGINT) AS v_min,
        |       CAST(max(hi) AS BIGINT) AS v_max
        |FROM g1 GROUP BY 1, 2""".stripMargin,

    // q201: same clamp, bins, and gap dag; score sums ride round-6
    "q201_calibration" ->
      """WITH b AS (SELECT least(value, 500.0) / 500.0 AS s,
        |        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |      FROM events),
        |c AS (SELECT least(CAST(floor(s * 10.0) AS BIGINT), 9) AS bin,
        |        count(*) AS n, sum(s) AS ss, sum(y) AS sy
        |      FROM b GROUP BY 1),
        |t AS (SELECT sum(n) AS nt FROM c)
        |SELECT bin, CAST(n AS BIGINT) AS n,
        |       round(ss / CAST(n AS DOUBLE), 6) AS avg_score,
        |       round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
        |       round(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE)
        |         * abs(ss / CAST(n AS DOUBLE)
        |             - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |         AS ece_term
        |FROM c CROSS JOIN t""".stripMargin,

    // q202: identical cell/marginal derivation; p_e product sum rides
    // doubles with round-6; kappa derived FROM the rounded po/pe
    "q202_cohens_kappa" ->
      """WITH r AS (SELECT event_type AS a,
        |        CASE WHEN value < 25.0 THEN 'view'
        |             WHEN value < 50.0 THEN 'click'
        |             WHEN value < 75.0 THEN 'signup'
        |             WHEN value < 100.0 THEN 'error'
        |             ELSE 'purchase' END AS b
        |      FROM events),
        |cells AS (SELECT a, b, count(*) AS n FROM r GROUP BY 1, 2),
        |ma AS (SELECT a, sum(n) AS s_a FROM cells GROUP BY 1),
        |mb AS (SELECT b, sum(n) AS s_b FROM cells GROUP BY 1),
        |t AS (SELECT sum(n) AS n,
        |        coalesce(sum(CASE WHEN a = b THEN n END), 0) AS n_agree
        |      FROM cells),
        |pe AS (SELECT coalesce(sum(CAST(s_a AS DOUBLE)
        |                           * CAST(s_b AS DOUBLE)), 0.0) AS pe_num
        |       FROM ma JOIN mb ON ma.a = mb.b),
        |x AS (SELECT CAST(t.n AS BIGINT) AS n,
        |        CAST(t.n_agree AS BIGINT) AS n_agree,
        |        round(CAST(t.n_agree AS DOUBLE) / CAST(t.n AS DOUBLE), 6)
        |          AS po,
        |        round(pe.pe_num
        |          / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)), 6) AS pe
        |      FROM t CROSS JOIN pe)
        |SELECT n, n_agree, po, pe,
        |       CASE WHEN pe < 1.0
        |            THEN round((po - pe) / (1.0 - pe), 6) END AS kappa
        |FROM x""".stripMargin,

    // q203: the identical SHA fold lane rebuilt in SQL (lane is
    // non-negative, so % == pmod)
    "q203_group_kfold" ->
      s"""WITH f AS (SELECT user_id,
        |        ${graft.functions.ShaLanes.duckLane(
               "'fold|' || CAST(user_id AS VARCHAR)")} % 5 AS fold
        |      FROM events)
        |SELECT fold, CAST(count(DISTINCT user_id) AS BIGINT) AS n_groups,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM f GROUP BY 1""".stripMargin,

    // q204: the same 2xK cells and per-side x*ln(x/m) terms; jsd_norm
    // divides the ROUNDED jsd by ln(2) (same correctly-rounded double
    // in both engines)
    "q204_jensen_shannon" ->
      """WITH cells AS (SELECT event_type AS c,
        |        sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS p,
        |        sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS q
        |      FROM events GROUP BY 1),
        |t AS (SELECT sum(p) AS n_p, sum(q) AS n_q, count(*) AS k_cats
        |      FROM cells),
        |j AS (SELECT CAST(t.n_p AS BIGINT) AS n_p,
        |        CAST(t.n_q AS BIGINT) AS n_q,
        |        CAST(t.k_cats AS BIGINT) AS k_cats,
        |        CASE WHEN min(t.n_p) > 0 AND min(t.n_q) > 0 THEN
        |          round(sum(
        |            CASE WHEN cells.p > 0 THEN
        |              (CAST(cells.p AS DOUBLE) / CAST(t.n_p AS DOUBLE))
        |              * ln((CAST(cells.p AS DOUBLE) / CAST(t.n_p AS DOUBLE))
        |                / ((CAST(cells.p AS DOUBLE) / CAST(t.n_p AS DOUBLE)
        |                    + CAST(cells.q AS DOUBLE)
        |                      / CAST(t.n_q AS DOUBLE)) / 2.0))
        |            ELSE 0.0 END
        |          + CASE WHEN cells.q > 0 THEN
        |              (CAST(cells.q AS DOUBLE) / CAST(t.n_q AS DOUBLE))
        |              * ln((CAST(cells.q AS DOUBLE) / CAST(t.n_q AS DOUBLE))
        |                / ((CAST(cells.p AS DOUBLE) / CAST(t.n_p AS DOUBLE)
        |                    + CAST(cells.q AS DOUBLE)
        |                      / CAST(t.n_q AS DOUBLE)) / 2.0))
        |            ELSE 0.0 END) / 2.0, 6) END AS jsd
        |      FROM cells CROSS JOIN t
        |      GROUP BY t.n_p, t.n_q, t.k_cats)
        |SELECT n_p, n_q, k_cats, jsd, round(jsd / ln(2.0), 6) AS jsd_norm
        |FROM j""".stripMargin,

    // q205: same type-count fold; chao1 is one exact-integer-operand
    // division (raw)
    "q205_chao1_richness" ->
      """WITH c AS (SELECT term, count(*) AS n FROM
        |        (SELECT unnest(str_split(text, ' ')) AS term
        |         FROM documents) GROUP BY 1),
        |a AS (SELECT CAST(sum(n) AS BIGINT) AS n_tokens,
        |        CAST(count(*) AS BIGINT) AS n_types,
        |        CAST(coalesce(sum(CASE WHEN n = 1 THEN 1 END), 0) AS BIGINT)
        |          AS f1,
        |        CAST(coalesce(sum(CASE WHEN n = 2 THEN 1 END), 0) AS BIGINT)
        |          AS f2
        |      FROM c)
        |SELECT n_tokens, n_types, f1, f2,
        |       CAST(n_types AS DOUBLE)
        |         + CAST(f1 * (f1 - 1) AS DOUBLE)
        |           / CAST(2 * (f2 + 1) AS DOUBLE) AS chao1
        |FROM a""".stripMargin,

    // q206: the oracle takes the plain full-sort window (oracle-side
    // only); the argmax is the same exact Long cross-multiplication
    "q206_ks_statistic" ->
      """WITH g AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |        sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                 THEN 1 ELSE 0 END) AS ca,
        |        sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                 THEN 0 ELSE 1 END) AS cb
        |      FROM orders GROUP BY 1),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM g),
        |w AS (SELECT sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |          PRECEDING AND CURRENT ROW) AS cuma,
        |        sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |          PRECEDING AND CURRENT ROW) AS cumb
        |      FROM g)
        |SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
        |       CAST(count(*) AS BIGINT) AS n_values,
        |       CASE WHEN t.na > 0 AND t.nb > 0 THEN
        |         CAST(max(abs(cuma * t.nb - cumb * t.na)) AS DOUBLE)
        |           / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE))
        |       END AS d_stat
        |FROM w CROSS JOIN t GROUP BY t.na, t.nb""".stripMargin,

    // q207: the oracle takes the explode+groupBy shape (oracle-side
    // only; the engine folds per doc scan-side) — max count == max
    // run length over any sorted order, so the two agree exactly
    "q207_repetition" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, unnest([array_to_string(w[i:i+2], ' ')
        |        for i in generate_series(1, len(w) - 2)]) AS ng
        |      FROM t WHERE len(w) >= 3),
        |c AS (SELECT doc_id, ng, count(*) AS cnt FROM g GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_ngrams,
        |        CAST(count(*) AS BIGINT) AS n_distinct,
        |        CAST(max(cnt) AS BIGINT) AS top_cnt
        |      FROM c GROUP BY 1)
        |SELECT doc_id, n_ngrams, n_distinct, top_cnt,
        |       CAST(n_ngrams - n_distinct AS DOUBLE)
        |         / CAST(n_ngrams AS DOUBLE) AS dup_frac,
        |       CAST(top_cnt AS DOUBLE) / CAST(n_ngrams AS DOUBLE)
        |         AS top_share
        |FROM a""".stripMargin,

    // q208: oracle ranks with a plain window (oracle-side only), same
    // (cnt DESC, term ASC) order; RAW sums, only the final
    // slope/intercept round-6 (accumulation-order noise ~1e-13 dies in
    // the final round; rounding inputs would bias the fit)
    "q208_zipf_slope" ->
      """WITH c AS (SELECT term, count(*) AS cnt FROM
        |        (SELECT unnest(str_split(text, ' ')) AS term
        |         FROM documents) GROUP BY 1),
        |w AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term)
        |        AS rk FROM c),
        |h AS (SELECT ln(CAST(rk AS DOUBLE)) AS x,
        |        ln(CAST(cnt AS DOUBLE)) AS y FROM w WHERE rk <= 100),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS k_terms,
        |        sum(x) AS sx, sum(y) AS sy,
        |        sum(x * x) AS sxx, sum(x * y) AS sxy
        |      FROM h)
        |SELECT k_terms,
        |       CASE WHEN k_terms > 1 THEN
        |         round((CAST(k_terms AS DOUBLE) * sxy - sx * sy)
        |           / (CAST(k_terms AS DOUBLE) * sxx - sx * sx), 6)
        |       END AS zipf_slope,
        |       CASE WHEN k_terms > 1 THEN
        |         round((sy - (CAST(k_terms AS DOUBLE) * sxy - sx * sy)
        |             / (CAST(k_terms AS DOUBLE) * sxx - sx * sx) * sx)
        |           / CAST(k_terms AS DOUBLE), 6)
        |       END AS zipf_intercept
        |FROM s""".stripMargin,

    // q199: identical per-user firsts and gap filter; quantiles ride
    // the q37 round-4 lane
    "q199_conversion_latency" ->
      """WITH u AS (SELECT user_id,
        |        CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END
        |          AS cohort,
        |        min(CASE WHEN event_type = 'view'
        |              THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS fv,
        |        min(CASE WHEN event_type = 'purchase'
        |              THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS fp
        |      FROM events GROUP BY 1, 2),
        |g AS (SELECT cohort, fp - fv AS gap FROM u
        |      WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv)
        |SELECT cohort, CAST(count(*) AS BIGINT) AS n_converted,
        |       round(quantile_cont(CAST(gap AS DOUBLE), 0.5), 4) AS p50_s,
        |       round(quantile_cont(CAST(gap AS DOUBLE), 0.9), 4) AS p90_s
        |FROM g GROUP BY 1""".stripMargin,

    // q193: the same dim/value cells, deterministic (count desc, value
    // asc) mode rank, cell-level -p ln p terms; entropy round-6 and the
    // normalization divides the ROUNDED entropy in both engines
    "q193_cat_profile" ->
      """WITH u AS (SELECT 'event_type' AS dim, event_type AS v FROM events
        |      UNION ALL
        |      SELECT 'value_band',
        |             CAST(CAST(floor(value / 50) AS BIGINT) AS VARCHAR)
        |      FROM events),
        |g AS (SELECT dim, v, count(*) AS c FROM u GROUP BY 1, 2),
        |w AS (SELECT dim, v, c,
        |        row_number() OVER (PARTITION BY dim
        |          ORDER BY c DESC, v ASC) AS rk,
        |        sum(c) OVER (PARTITION BY dim) AS n FROM g),
        |a AS (SELECT dim, max(n) AS n, count(*) AS n_distinct,
        |        max(CASE WHEN rk = 1 THEN v END) AS mode_value,
        |        max(CASE WHEN rk = 1 THEN c END) AS mode_n,
        |        round(sum(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |          * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))), 6)
        |          AS entropy
        |      FROM w GROUP BY 1)
        |SELECT dim, CAST(n AS BIGINT) AS n,
        |       CAST(n_distinct AS BIGINT) AS n_distinct,
        |       mode_value, CAST(mode_n AS BIGINT) AS mode_n, entropy,
        |       CASE WHEN n_distinct > 1
        |            THEN round(entropy / ln(CAST(n_distinct AS DOUBLE)), 6)
        |       END AS norm_entropy
        |FROM a""".stripMargin,

    // q192: the same per-time cells, prior-rows risk-set window and
    // ordered log-sum running product; whole-risk-set steps pinned to 0
    // identically (ln(0) is engine-divergent, so it never evaluates)
    "q192_kaplan_meier" ->
      """WITH u AS (SELECT user_id,
        |        CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END
        |          AS cohort,
        |        min(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS d0,
        |        max(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS d1,
        |        min(CASE WHEN event_type = 'purchase'
        |              THEN CAST(floor(epoch(ts) / 86400) AS BIGINT) END)
        |          AS dp
        |      FROM events GROUP BY 1, 2),
        |s AS (SELECT cohort, coalesce(dp, d1) - d0 AS t,
        |        CASE WHEN dp IS NOT NULL THEN 1 ELSE 0 END AS e FROM u),
        |c AS (SELECT cohort, t, sum(e) AS d, count(*) AS cnt
        |      FROM s GROUP BY 1, 2),
        |r AS (SELECT cohort, t, d, cnt,
        |        sum(cnt) OVER (PARTITION BY cohort)
        |          - coalesce(sum(cnt) OVER (PARTITION BY cohort ORDER BY t
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS n_risk
        |      FROM c),
        |f AS (SELECT cohort, t, d, n_risk,
        |        CASE WHEN d < n_risk
        |             THEN 1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
        |        END AS fct,
        |        CASE WHEN d = n_risk THEN 1 ELSE 0 END AS z
        |      FROM r),
        |k AS (SELECT cohort, t, d, n_risk,
        |        round(CASE WHEN max(z) OVER w = 1 THEN 0.0
        |          ELSE exp(coalesce(sum(ln(fct)) OVER w, 0.0)) END, 6)
        |          AS survival
        |      FROM f WINDOW w AS (PARTITION BY cohort ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT cohort, CAST(t AS BIGINT) AS t, CAST(d AS BIGINT) AS d,
        |       CAST(n_risk AS BIGINT) AS n_risk, survival
        |FROM k WHERE d > 0""".stripMargin,

    // q161: the same daily series through DuckDB's regr_*/corr family;
    // both engines accumulate moments, round(6) absorbs order drift
    "q161_regression_trend" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, count(*) AS n_days,
        |       round(regr_slope(n, day), 6) AS slope,
        |       round(regr_intercept(n, day), 6) AS intercept,
        |       round(corr(n, day), 6) AS r
        |FROM daily GROUP BY event_type""".stripMargin,

    // q148: expected column-derivation edges as constants (the q147
    // design one level deeper): the declared side EXTRACTS these from
    // the analyzed plans, so a column changing its derivation — e.g.
    // revenue losing the discount term — hash-diverges even when the
    // table-level edge set is unchanged
    "q148_column_lineage" ->
      """SELECT * FROM (VALUES
        |  ('q01_pricing_summary', 'l_returnflag',   'lineitem.parquet', 'l_returnflag'),
        |  ('q01_pricing_summary', 'l_linestatus',   'lineitem.parquet', 'l_linestatus'),
        |  ('q01_pricing_summary', 'sum_qty',        'lineitem.parquet', 'l_quantity'),
        |  ('q01_pricing_summary', 'sum_base_price', 'lineitem.parquet', 'l_extendedprice'),
        |  ('q01_pricing_summary', 'sum_disc_price', 'lineitem.parquet', 'l_extendedprice'),
        |  ('q01_pricing_summary', 'sum_disc_price', 'lineitem.parquet', 'l_discount'),
        |  ('q01_pricing_summary', 'sum_charge',     'lineitem.parquet', 'l_extendedprice'),
        |  ('q01_pricing_summary', 'sum_charge',     'lineitem.parquet', 'l_discount'),
        |  ('q01_pricing_summary', 'sum_charge',     'lineitem.parquet', 'l_tax'),
        |  ('q01_pricing_summary', 'avg_qty',        'lineitem.parquet', 'l_quantity'),
        |  ('q01_pricing_summary', 'avg_disc',       'lineitem.parquet', 'l_discount'),
        |  ('q04_region_nation_revenue', 'n_name',   'nation.parquet',   'n_name'),
        |  ('q04_region_nation_revenue', 'revenue',  'lineitem.parquet', 'l_extendedprice'),
        |  ('q04_region_nation_revenue', 'revenue',  'lineitem.parquet', 'l_discount'))
        |  AS t(model, "column", source_table, source_column)""".stripMargin,

    // q138: every candidate score recomputed by DuckDB's own
    // jaro_winkler_similarity — identical integer-derived double formula,
    // so raw-threshold filtering agrees bit-for-bit
    "q138_name_match" ->
      """WITH names AS (SELECT DISTINCT p_name AS nm FROM part),
        |ent AS (SELECT nm AS id, nm FROM names
        |  UNION ALL SELECT nm || 'x', nm || 'x' FROM names),
        |v AS (SELECT id, nm, substr(lower(nm), 1, 2) AS blk FROM ent),
        |p AS (SELECT a.id AS name_a, b.id AS name_b,
        |    jaro_winkler_similarity(a.nm, b.nm) AS jw
        |  FROM v a JOIN v b ON a.blk = b.blk AND a.id < b.id)
        |SELECT name_a, name_b, round(jw, 6) AS jw FROM p
        |WHERE jw >= 0.9 AND jw < 1.0""".stripMargin,

    // q137: the view recomputed flat from ALL rows — equality against the
    // base ∪ delta-join composition is the IVM identity itself
    "q137_join_ivm" ->
      """SELECT o.o_custkey AS custkey, o.o_orderkey,
        |  CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
        |  c.c_mktsegment
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,

    // q134: content preservation through the bin-pack rewrite, re-derived
    // from the RAW lineitem table; files_after = 1 is the bin-pack
    // arithmetic's deterministic answer at a 1 GiB target (the declared
    // side measures it from the post-compaction filesystem — a failed or
    // skipped rewrite would report the fragmented count and hash-diverge)
    "q134_compaction" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n_rows,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS sum_cents,
        |  min(l_orderkey) AS min_orderkey, max(l_orderkey) AS max_orderkey,
        |  1::BIGINT AS files_after
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q135_skew_report" ->
      """WITH c AS (SELECT l_suppkey, count(*)::BIGINT AS cnt
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT sum(cnt)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys,
        |  max(cnt) AS max_cnt FROM c)
        |SELECT c.l_suppkey, c.cnt, round(c.cnt / g.n_rows, 6) AS share,
        |  g.n_rows, g.n_keys,
        |  round(CAST(g.max_cnt * g.n_keys AS DOUBLE) / g.n_rows, 4) AS skew_ratio
        |FROM c, g ORDER BY c.cnt DESC, c.l_suppkey LIMIT 10""".stripMargin,

    // q66: the identical smoothed-unigram math — vocab = top-20 tokens by
    // (count desc, token asc), α = 0.5; round(avg, 4) absorbs sum-order fp
    // drift exactly like the q23 bm25 oracle
    "q66_lm_surprisal" ->
      """WITH toks AS (
        |  SELECT doc_id AS id, unnest(str_split(text, ' ')) AS token
        |  FROM documents WHERE text IS NOT NULL),
        |counts AS (SELECT token, count(*) AS c FROM toks GROUP BY 1),
        |vocab AS (SELECT token, c FROM counts ORDER BY c DESC, token ASC LIMIT 20),
        |stats AS (SELECT (SELECT sum(c)::DOUBLE FROM counts) AS n_total,
        |                 (SELECT count(*)::DOUBLE FROM vocab) AS k_vocab)
        |SELECT id AS doc_id, count(*)::BIGINT AS n_tokens,
        |  round(avg(-ln((coalesce(v.c, 0)::DOUBLE + 0.5) /
        |    (n_total + 0.5 * (k_vocab + 1.0)))), 4) AS avg_surprisal,
        |  round(avg(CASE WHEN v.c IS NULL THEN 1.0 ELSE 0.0 END), 6) AS oov_frac
        |FROM toks t LEFT JOIN vocab v USING (token) CROSS JOIN stats
        |GROUP BY id""".stripMargin,

    // q67: identical DSIR math — distinct bigram SHA-lane buckets (mod
    // 256), doc-frequency distributions over target (lang='en') vs raw,
    // add-0.5 smoothing, round(avg, 4)
    "q67_dsir_weights" -> dsirOracle,

    // q78: q67's weights through the sigmoid acceptance draw (T = 20);
    // the lane compare promotes BIGINT to DOUBLE exactly like Spark's
    // cast, and exp sees the identical round-4 argument in both engines
    "q78_dsir_resample" ->
      s"""WITH w AS ($dsirOracle)
         |SELECT doc_id, is_target, dsir_logweight,
         |  round(1.0 / (1.0 + exp(-20.0 * dsir_logweight)), 6) AS p_accept
         |FROM w
         |WHERE ${duckLane("'resample|' || doc_id::VARCHAR")} <
         |  (1.0 / (1.0 + exp(-20.0 * dsir_logweight))) * 1152921504606846976.0""".stripMargin,

    // q68: identical rarity math over SHA-lane 5-gram digests (the
    // declared twin of the xxhash64 primary); `gi`, never `i` (duckLane)
    "q68_rare_ngrams" ->
      s"""WITH t AS (
         |  SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
         |s AS (
         |  SELECT doc_id AS doc, unnest(list_distinct(
         |    [toks[gi] || ' ' || toks[gi+1] || ' ' || toks[gi+2] || ' ' ||
         |       toks[gi+3] || ' ' || toks[gi+4] for gi in range(1, len(toks) - 3)])) AS sh
         |  FROM t WHERE len(toks) >= 5),
         |p AS (SELECT doc, ${duckLane("'rare|' || sh")} AS h FROM s),
         |c AS (SELECT h, count(*) AS df FROM p GROUP BY 1)
         |SELECT doc, n_ngrams, n_unique,
         |  round(n_unique::DOUBLE / n_ngrams, 6) AS uniq_frac,
         |  n_unique::DOUBLE / n_ngrams > 0.5 AS risky
         |FROM (
         |  SELECT doc, count(*)::BIGINT AS n_ngrams,
         |    sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique
         |  FROM p JOIN c USING (h) GROUP BY doc)""".stripMargin,

    // q73: the greedy automaton as iterated "first qualifying occurrence
    // strictly after the previous match" struct-mins (equivalent by the
    // greedy-subsequence property); order = microsecond truncation
    // (epoch_ns // 1000 ≡ Spark's unix_micros after Tables' DIV 1000)
    // with event_id tiebreak
    "q73_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id AS eid, event_type AS t
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |s1 AS (SELECT user_id, min((us, eid)) AS k1 FROM ev
        |  WHERE t = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min((us, eid)) AS k2 FROM ev e
        |  JOIN s1 USING (user_id) WHERE t = 'click' AND (us, eid) > k1
        |  GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min((us, eid)) AS k3 FROM ev e
        |  JOIN s2 USING (user_id) WHERE t = 'purchase' AND (us, eid) > k2
        |  GROUP BY e.user_id)
        |SELECT u.user_id,
        |  (CASE WHEN k3 IS NOT NULL THEN 3 WHEN k2 IS NOT NULL THEN 2
        |        WHEN k1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS stage_reached,
        |  k3 IS NOT NULL AS converted
        |FROM (SELECT DISTINCT user_id FROM ev) u
        |LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id)""".stripMargin,

    // q77: assignment against the trained centroids, slice = odd vec_id;
    // all ratios are exact integer-derived divisions, so the shift flag
    // compares bit-identical doubles in both engines
    "q77_coverage_shift" ->
      s"""WITH $kmeansCtes,
         |${kmeansAssignCte("c2", "asg")},
         |a AS (SELECT cid, vec_id % 2 = 1 AS in_slice FROM asg),
         |g AS (SELECT sum(CASE WHEN in_slice THEN 1 ELSE 0 END)::DOUBLE /
         |        count(*)::DOUBLE AS gs FROM a)
         |SELECT cid, n_total, n_slice,
         |  round(n_slice::DOUBLE / n_total, 6) AS slice_share,
         |  abs(n_slice::DOUBLE / n_total - gs) > 0.02 AS shifted
         |FROM (
         |  SELECT cid::BIGINT AS cid, count(*)::BIGINT AS n_total,
         |    sum(CASE WHEN in_slice THEN 1 ELSE 0 END)::BIGINT AS n_slice
         |  FROM a GROUP BY 1) CROSS JOIN g""".stripMargin,

    // q79: prefix-norm ratios with DuckDB's inclusive 1-based list slice
    // mirroring Spark's slice(v, 1, k); quantile_cont ≡ percentile (q37)
    "q79_matryoshka" ->
      """WITH e AS (
        |  SELECT embedding::DOUBLE[] AS v FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |r AS (
        |  SELECT b.dims,
        |    sqrt(list_dot_product(v[1:b.dims], v[1:b.dims])) /
        |      sqrt(list_dot_product(v, v)) AS r
        |  FROM e CROSS JOIN (VALUES (16), (32), (48)) b(dims))
        |SELECT dims::BIGINT AS dims, count(*)::BIGINT AS n_vecs,
        |  round(avg(r), 4) AS avg_retained,
        |  round(quantile_cont(r, 0.1), 4) AS p10_retained
        |FROM r GROUP BY 1""".stripMargin,

    // q76: the same cleaning composition over DuckDB's UAX#15 NFC
    "q76_normalize" ->
      """SELECT doc_id, clean_text,
        |  length(clean_text)::BIGINT AS clean_len,
        |  (length(text) - length(clean_text))::BIGINT AS n_removed
        |FROM (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS clean_text
        |  FROM documents WHERE text IS NOT NULL)""".stripMargin,

    // q75: the q36 rules + q61 repetition flags + q66 fluency as CTEs,
    // conjoined — each sub-expression is its source oracle's verbatim
    "q75_model_filter" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |q AS (SELECT doc_id,
        |    (len(toks) BETWEEN 30 AND 100000)
        |    AND (list_aggregate(list_transform(toks, x -> length(x)), 'sum') / len(toks)
        |         BETWEEN 3.0 AND 10.0)
        |    AND len(list_filter(toks, x -> x IN ('the','a','of','to','in','and','is','it','on','for'))) / len(toks) >= 0.05
        |    AND len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) >= 0.3
        |    AS quality_ok
        |  FROM t),
        |r AS (SELECT doc_id, NOT (
        |    (CASE WHEN greatest(len(toks) - 1, 0) > 0 THEN
        |      CAST(greatest(len(toks) - 1, 0) - len(list_distinct([toks[i] || ' ' || toks[i+1]
        |        for i in range(1, len(toks))])) AS DOUBLE) / greatest(len(toks) - 1, 0)
        |      ELSE 0.0 END) > CAST(0.2 AS DOUBLE)
        |    OR (CASE WHEN greatest(len(toks) - 2, 0) > 0 THEN
        |      CAST(greatest(len(toks) - 2, 0) - len(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |        for i in range(1, len(toks) - 1)])) AS DOUBLE) / greatest(len(toks) - 2, 0)
        |      ELSE 0.0 END) > CAST(0.15 AS DOUBLE)
        |    OR CAST(list_max(list_transform(list_distinct(toks),
        |        x -> len(list_filter(toks, y -> y = x)))) AS DOUBLE) / len(toks)
        |      > CAST(0.2 AS DOUBLE)) AS not_repetitive
        |  FROM t),
        |toklist AS (SELECT doc_id AS id, unnest(toks) AS token FROM t),
        |counts AS (SELECT token, count(*) AS c FROM toklist GROUP BY 1),
        |vocab AS (SELECT token, c FROM counts ORDER BY c DESC, token ASC LIMIT 20),
        |stats AS (SELECT (SELECT sum(c)::DOUBLE FROM counts) AS n_total,
        |                 (SELECT count(*)::DOUBLE FROM vocab) AS k_vocab),
        |f AS (SELECT id AS doc_id,
        |    round(avg(-ln((coalesce(v.c, 0)::DOUBLE + 0.5) /
        |      (n_total + 0.5 * (k_vocab + 1.0)))), 4) <= 6.0 AS fluent
        |  FROM toklist tl LEFT JOIN vocab v USING (token) CROSS JOIN stats
        |  GROUP BY id)
        |SELECT doc_id, quality_ok, not_repetitive, fluent,
        |  quality_ok AND not_repetitive AND fluent AS keep
        |FROM q JOIN r USING (doc_id) JOIN f USING (doc_id)""".stripMargin,

    // q74: identical cohort math; ISO Monday week buckets in both engines
    "q74_retention" ->
      """WITH w AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_week FROM w GROUP BY 1)
        |SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
        |  ((wk - cohort_week) // 7)::BIGINT AS week_offset,
        |  count(DISTINCT user_id)::BIGINT AS n_users
        |FROM w JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    // q71: per-label position-wise mean (the q47 Lloyd-mean shape), then
    // average member cosine to it — round-4 absorbs the engines' mean
    // accumulation-order drift exactly like the q47 output contract
    "q71_label_cohesion" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |m AS (
        |  SELECT label, r.range AS pos, avg(v[r.range + 1]) AS val
        |  FROM e CROSS JOIN range(0, 64) r GROUP BY 1, 2),
        |mv AS (SELECT label, list(val ORDER BY pos) AS mv FROM m GROUP BY label),
        |n AS (SELECT label, count(*) AS n_vecs FROM e GROUP BY label)
        |SELECT e.label::BIGINT AS label, n.n_vecs::BIGINT AS n_vecs,
        |  round(avg(list_dot_product(e.v, mv.mv) /
        |    (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(mv.mv, mv.mv)))), 4)
        |    AS cohesion
        |FROM e JOIN mv USING (label) JOIN n USING (label)
        |GROUP BY 1, 2""".stripMargin,

    // q72: the q27 IVF oracle with the cross-label predicate inside the
    // candidate set (rank AFTER the filter), labels riding the assign CTE
    "q72_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |assign AS (
        |  SELECT vec_id, label, v, cid FROM (
        |    SELECT e.vec_id, e.label, e.v, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(e.v, c.cv) /
        |          (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |        DESC, c.cid) AS rk
        |    FROM e CROSS JOIN cent c)
        |  WHERE rk = 1),
        |probe AS (
        |  SELECT qid, cid FROM (
        |    SELECT q.vec_id AS qid, c.cid,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_dot_product(q.v, c.cv) /
        |          (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |        DESC, c.cid) AS rk
        |    FROM e q CROSS JOIN cent c WHERE q.vec_id < 10)
        |  WHERE rk <= 4),
        |cand AS (
        |  SELECT p.qid AS query_id, a.vec_id AS neighbor_id,
        |    a.label AS neg_label,
        |    list_dot_product(qe.v, a.v) /
        |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(a.v, a.v))) AS cos
        |  FROM probe p
        |  JOIN assign a ON p.cid = a.cid
        |  JOIN e qe ON qe.vec_id = p.qid
        |  WHERE p.qid <> a.vec_id AND qe.label <> a.label)
        |SELECT query_id, neighbor_id, neg_label::BIGINT AS neg_label,
        |  rank, round(cos, 6) AS cosine FROM (
        |  SELECT query_id, neighbor_id, neg_label, cos,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM cand)
        |WHERE rank <= 5""".stripMargin,

    // q70: identical health-report math; exact interpolated p90
    // (quantile_cont ≡ Spark percentile, the q37 contract)
    "q70_corpus_report" ->
      """SELECT source, n_docs, n_null_text, n_distinct_texts,
        |  round(1.0 - n_distinct_texts::DOUBLE /
        |    nullif((n_docs - n_null_text)::DOUBLE, 0.0), 6) AS dup_frac,
        |  avg_tokens, p90_tokens, n_langs
        |FROM (
        |  SELECT source, count(*)::BIGINT AS n_docs,
        |    sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_text,
        |    count(DISTINCT sha256(text))::BIGINT AS n_distinct_texts,
        |    round(avg(CAST(len(str_split(text, ' ')) AS DOUBLE)), 4) AS avg_tokens,
        |    round(quantile_cont(CAST(len(str_split(text, ' ')) AS DOUBLE), 0.9), 4) AS p90_tokens,
        |    count(DISTINCT lang)::BIGINT AS n_langs
        |  FROM documents GROUP BY source)""".stripMargin,

    // q69: assignment against the q47-trained centroids, then round-4
    // cosine to the OWN centroid (4dp absorbs the engines' Lloyd-mean
    // accumulation-order drift, like the q47 output contract)
    "q69_centroid_outliers" ->
      s"""WITH $kmeansCtes,
         |${kmeansAssignCte("c2", "asg")}
         |SELECT vec_id, cid, cos_centroid, cos_centroid < 0.2 AS is_outlier
         |FROM (
         |  SELECT s.vec_id, s.cid::BIGINT AS cid,
         |    round(list_dot_product(s.v, c.v) /
         |      (sqrt(list_dot_product(s.v, s.v)) * sqrt(list_dot_product(c.v, c.v))), 4)
         |      AS cos_centroid
         |  FROM asg s JOIN c2 c ON s.cid = c.cid)""".stripMargin,
    "q28_multimodal_features" -> multimodalOracle,
    "q40_kmv_distinct" -> kmvOracle,

    // q210: maintained == rebuilt — the oracle is the BATCH sketch SQL
    // verbatim (k-minima exact under merge-truncate)
    "q210_kmv_replay" -> kmvOracle,

    // q211: same two-median derivation; medians interpolate on exact
    // integer cents (quantile_cont == Spark percentile on dyadic
    // midpoints); membership decided on the raw modified z
    "q211_robust_outliers" ->
      """WITH v AS (SELECT event_type, event_id AS id,
        |        CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |m AS (SELECT event_type, quantile_cont(CAST(v AS DOUBLE), 0.5)
        |        AS med FROM v GROUP BY 1),
        |d AS (SELECT v.event_type, v.id, v.v, m.med,
        |        abs(CAST(v.v AS DOUBLE) - m.med) AS ad
        |      FROM v JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
        |       FROM d GROUP BY 1)
        |SELECT d.event_type, d.id, d.v, d.med, md.mad,
        |       round(0.6745 * (CAST(d.v AS DOUBLE) - d.med) / md.mad, 6)
        |         AS modified_z
        |FROM d JOIN md USING (event_type)
        |WHERE md.mad > 0.0
        |  AND abs(0.6745 * (CAST(d.v AS DOUBLE) - d.med) / md.mad) > 3.5""".stripMargin,
    // q213: the feed recomputed flat from the base columns — per key,
    // the keep-latest winner among drops {0,1} vs among {0,1,2}; a
    // different (or newly appearing) winner IS the change row, with the
    // staging event_type derivation applied to both images (NULL-guarded:
    // a simple CASE on a NULL selector would fall through to 'Other')
    "q213_change_feed" -> {
      def ev(x: String) =
        s"""CASE WHEN $x IS NULL THEN NULL ELSE
           |  CASE $x % 5 WHEN 0 THEN 'Injury' WHEN 1 THEN 'Malfunction'
           |    WHEN 2 THEN 'Death' WHEN 3 THEN 'No Answer Provided'
           |    ELSE 'Other' END END""".stripMargin
      s"""WITH o AS (SELECT o_orderkey AS seq, o_orderkey % 1000 AS rk,
         |    o_orderkey % 3 AS b FROM orders),
         |w1 AS (SELECT rk, max(seq) AS seq FROM o WHERE b < 2 GROUP BY 1),
         |w2 AS (SELECT rk, max(seq) AS seq FROM o GROUP BY 1),
         |ch AS (SELECT w2.rk, w1.seq AS bseq, w2.seq AS aseq
         |       FROM w2 LEFT JOIN w1 ON w2.rk = w1.rk
         |       WHERE w1.seq IS NULL OR w1.seq <> w2.seq)
         |SELECT printf('MDR%07d', rk) AS mdr_report_key,
         |  CASE WHEN bseq IS NULL THEN 'insert' ELSE 'update' END AS op,
         |  ${ev("bseq")} AS before_event_type, bseq::BIGINT AS before_seq,
         |  ${ev("aseq")} AS after_event_type, aseq::BIGINT AS after_seq
         |FROM ch""".stripMargin
    },

    // q214: the history recomputed flat — per key the keep-latest winner
    // AS OF each drop (o.b <= t.bb), consecutive equal winners collapsed
    // into segments, each segment closed by the next segment's open batch
    "q214_scd2_snapshot" ->
      """WITH o AS (SELECT o_orderkey AS seq, o_orderkey % 1000 AS rk,
        |    o_orderkey % 3 AS b FROM orders),
        |w AS (SELECT rk, bb AS batch, max(seq) AS seq
        |      FROM o JOIN (VALUES (0), (1), (2)) AS t(bb) ON o.b <= t.bb
        |      GROUP BY rk, bb),
        |seg AS (SELECT rk, batch, seq,
        |        lag(seq) OVER (PARTITION BY rk ORDER BY batch) AS prev_seq
        |        FROM w),
        |starts AS (SELECT rk, batch AS valid_from, seq FROM seg
        |           WHERE prev_seq IS NULL OR prev_seq <> seq),
        |fin AS (SELECT rk, seq, valid_from,
        |        lead(valid_from) OVER (PARTITION BY rk ORDER BY valid_from)
        |          AS valid_to
        |        FROM starts)
        |SELECT printf('MDR%07d', rk) AS mdr_report_key, seq::BIGINT AS seq,
        |  CASE seq % 5 WHEN 0 THEN 'Injury' WHEN 1 THEN 'Malfunction'
        |    WHEN 2 THEN 'Death' WHEN 3 THEN 'No Answer Provided'
        |    ELSE 'Other' END AS event_type,
        |  valid_from::BIGINT AS valid_from, valid_to::BIGINT AS valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM fin""".stripMargin,

    // q215: the hard-delete history flat — keep-latest winner per user
    // (q116's derivation); winners that are tombstones were inserted at
    // batch 0 (the feed's after-image IS the tombstone row) and closed
    // forever at the purge batch 1; everything else stays current
    "q215_scd_hard_delete" ->
      """WITH log AS (SELECT user_id, event_type AS state,
        |    epoch_ns(ts) // 1000 AS us, event_id,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rk
        |  FROM log)
        |SELECT user_id, state AS last_type, us AS last_us,
        |  event_id AS last_event_id, op,
        |  0::BIGINT AS valid_from,
        |  (CASE WHEN op = 'D' THEN 1 ELSE NULL END)::BIGINT AS valid_to,
        |  (op <> 'D') AS is_current
        |FROM r WHERE rk = 1""".stripMargin,

    // q217: the as-of state flat — keep-latest winner per key among
    // drops {0,1}: a PAST state only the history can answer
    "q217_scd2_asof" ->
      """WITH o AS (SELECT o_orderkey AS seq, o_orderkey % 1000 AS rk,
        |    o_orderkey % 3 AS b FROM orders),
        |w AS (SELECT rk, max(seq) AS seq FROM o WHERE b <= 1 GROUP BY 1)
        |SELECT printf('MDR%07d', rk) AS mdr_report_key, seq::BIGINT AS seq,
        |  CASE seq % 5 WHEN 0 THEN 'Injury' WHEN 1 THEN 'Malfunction'
        |    WHEN 2 THEN 'Death' WHEN 3 THEN 'No Answer Provided'
        |    ELSE 'Other' END AS event_type
        |FROM w""".stripMargin,

    // q216: the published mart flat from all orders — incremental
    // partition refresh == full rebuild is the replaceWhere identity
    "q216_partition_publish" ->
      """SELECT year(o_orderdate)::BIGINT AS o_year,
        |  quarter(o_orderdate)::BIGINT AS o_q,
        |  count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1, 2""".stripMargin,

    // q212: the SQL reads the PUBLISHED files themselves (not the source
    // tables) — the digest matching the Spark read-back IS the ≥2-engine
    // interop assertion; content is sf-independent so any run ordering
    // rewrites identical bytes
    "q212_publish_interop" ->
      s"""SELECT count(*)::BIGINT AS n_rows,
         |       sum(severity)::BIGINT AS sum_severity,
         |       bit_xor(${duckLane(
                  "doc_id::VARCHAR || '|' || topic || '|' || " +
                  "severity::VARCHAR || '|' || summary")})::BIGINT
         |         AS content_xor
         |FROM read_parquet('$InteropPublishDir/*/*.parquet',
         |                  hive_partitioning = true)""".stripMargin,

    // q219: the SQL reads the published files through DuckDB's OWN
    // schema-merging reader (union_by_name) — per-version digests pin
    // that both engines null-fill the pre-evolution files identically
    // and round-trip the evolved column's values (and its nulls)
    "q219_schema_evolution" ->
      s"""SELECT v::BIGINT AS v,
         |       count(*)::BIGINT AS n_rows,
         |       sum(severity)::BIGINT AS sum_severity,
         |       bit_xor(${duckLane(
                  "doc_id::VARCHAR || '|' || topic || '|' || " +
                  "severity::VARCHAR || '|' || coalesce(review_flag, '-') " +
                  "|| '|' || summary")})::BIGINT
         |         AS content_xor
         |FROM read_parquet('$EvolutionPublishDir/*/*.parquet',
         |                  hive_partitioning = true,
         |                  union_by_name = true)
         |GROUP BY v""".stripMargin,

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),2) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))*CAST(1.0-l_discount AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))*CAST(1.0-l_discount AS DECIMAL(12,2))*CAST(1.0+l_tax AS DECIMAL(12,2))),2) AS DOUBLE) AS sum_charge,
        |  round(avg(l_quantity),4) AS avg_qty,
        |  round(avg(l_discount),4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_filter" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))*CAST(l_discount AS DECIMAL(12,2))),2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q03_segment_revenue" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))),2) AS DOUBLE) AS revenue,
        |  round(avg(c_acctbal),4) AS avg_acctbal
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q04_region_nation_revenue" ->
      """SELECT n_name,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))*CAST(1.0-l_discount AS DECIMAL(12,2))),2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,

    "q05_priority_class" ->
      """SELECT CASE
        |  WHEN upper(trim(o_orderpriority)) IN ('1-URGENT','2-HIGH') THEN 'Critical'
        |  WHEN o_orderpriority IS NULL OR upper(trim(o_orderpriority)) = ''
        |       OR upper(trim(o_orderpriority)) = '4-NOT SPECIFIED' THEN 'No Answer Provided'
        |  ELSE 'Other' END AS priority_class,
        |  count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,

    "q06_doc_topics_ilike" ->
      """SELECT coalesce(CASE
        |  WHEN text ILIKE '%window%' THEN 'WINDOW'
        |  WHEN text ILIKE '%stream%' THEN 'STREAM'
        |  WHEN text ILIKE '%merge%' THEN 'MERGE'
        |  WHEN text ILIKE '%join%' THEN 'JOIN'
        |  WHEN text ILIKE '%sort%' THEN 'SORT'
        |  WHEN text ILIKE '%hash%' THEN 'HASH'
        |  WHEN text ILIKE '%scan%' THEN 'SCAN' END, '(unknown)') AS topic,
        |  count(*) AS n
        |FROM documents GROUP BY 1""".stripMargin,

    "q07_top_events_per_user" ->
      """SELECT user_id, event_id, value, rank FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rank
        |  FROM events) WHERE rank <= 3""".stripMargin,

    "q08_early_signals" ->
      """WITH c AS (
        |  SELECT o_orderpriority,
        |    year(o_orderdate)*4 + quarter(o_orderdate) AS quarter_index,
        |    year(o_orderdate)::VARCHAR || '-Q' || quarter(o_orderdate)::VARCHAR AS year_quarter,
        |    count(*) AS n_events
        |  FROM orders WHERE o_orderdate IS NOT NULL
        |  GROUP BY 1, 2, 3)
        |SELECT o_orderpriority, quarter_index, year_quarter, n_events,
        |  row_number() OVER w0 AS rn,
        |  round(avg(n_events) OVER w, 4) AS mean_4,
        |  round(stddev_samp(n_events) OVER w, 4) AS std_4,
        |  round(CASE WHEN (stddev_samp(n_events) OVER w) IS NULL
        |               OR (stddev_samp(n_events) OVER w) = 0 THEN NULL
        |        ELSE (n_events - (avg(n_events) OVER w)) / (stddev_samp(n_events) OVER w)
        |        END, 4) AS z_score
        |FROM c
        |WINDOW w0 AS (PARTITION BY o_orderpriority ORDER BY quarter_index),
        |       w  AS (PARTITION BY o_orderpriority ORDER BY quarter_index
        |              ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING)""".stripMargin,

    "q09_order_lines_listagg" ->
      """SELECT l_orderkey,
        |  string_agg(l_linenumber::VARCHAR, ',' ORDER BY l_linenumber) AS line_numbers,
        |  count(*) AS n_lines
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,

    "q10_token_counts" ->
      """SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs FROM (
        |  SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents)
        |GROUP BY token""".stripMargin,

    "q11_order_surrogate_keys" ->
      """SELECT o_orderkey,
        |  sha256(concat_ws('|', coalesce(o_orderkey::VARCHAR,''),
        |    coalesce(o_orderstatus,''), coalesce(strftime(o_orderdate,'%Y-%m-%d'),''))) AS order_sk
        |FROM orders""".stripMargin,

    "q12_json_extract" ->
      """SELECT event_id,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
        |FROM events""".stripMargin,

    "q13_parse_dates" ->
      """WITH r AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 97 = 0 THEN '1999x101'
        |         ELSE strftime(o_orderdate, '%Y%m%d') END AS raw
        |  FROM orders)
        |SELECT o_orderkey,
        |  strftime(try_strptime(raw, '%Y%m%d'), '%Y-%m-%d') AS parsed_date,
        |  CASE WHEN try_strptime(raw, '%Y%m%d') IS NULL THEN NULL
        |    ELSE year(try_strptime(raw, '%Y%m%d'))::VARCHAR || '-Q' ||
        |         quarter(try_strptime(raw, '%Y%m%d'))::VARCHAR END AS year_quarter
        |FROM r""".stripMargin,

    "q14_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies, sha256(text) AS text_hash
        |FROM documents GROUP BY text""".stripMargin,

    "q15_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, str_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 1000),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))])) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(n_inter / (ca.n_sh + cb.n_sh - n_inter), 6) AS jaccard
        |FROM pairs
        |JOIN cnt ca ON doc_a = ca.doc_id
        |JOIN cnt cb ON doc_b = cb.doc_id
        |WHERE n_inter / (ca.n_sh + cb.n_sh - n_inter) >= 0.2""".stripMargin,

    // q209: q15's oracle shape with directional containment scores;
    // greatest() decides membership on the same raw divisions
    "q209_containment" ->
      """WITH t AS (
        |  SELECT doc_id, str_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 1000),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))])) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, CAST(n_inter AS BIGINT) AS n_inter,
        |  round(n_inter / ca.n_sh, 6) AS contain_a_in_b,
        |  round(n_inter / cb.n_sh, 6) AS contain_b_in_a
        |FROM pairs
        |JOIN cnt ca ON doc_a = ca.doc_id
        |JOIN cnt cb ON doc_b = cb.doc_id
        |WHERE greatest(n_inter / ca.n_sh, n_inter / cb.n_sh) >= 0.6""".stripMargin,

    "q16_knn_brute" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) /
        |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
        |  FROM e q JOIN e c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10)
        |SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos DESC, neighbor_id) AS rank FROM scored)
        |WHERE rank <= 5""".stripMargin,

    "q17_text_quality" ->
      """WITH t AS (SELECT doc_id, text, str_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  len(toks) AS n_tokens,
        |  len(list_distinct(toks)) AS n_distinct,
        |  round(list_aggregate(list_transform(toks, x -> length(x)), 'sum') / len(toks), 4) AS avg_token_len,
        |  round(len(list_filter(toks, x -> x IN ('the','a','of','to','in','and','is','it','on','for'))) / len(toks), 6) AS stop_ratio,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_bpe_tokens
        |FROM t""".stripMargin,

    "q18_langid" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_filter(toks, x -> x IN ('the','a','of','to','in','and','is','it','on','for'))) AS en_score,
        |  len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ich','zu','mit','ein'))) AS de_score,
        |  len(list_filter(toks, x -> x IN ('le','la','de','et','un','une','est','pas','je','que'))) AS fr_score
        |FROM t)
        |SELECT doc_id,
        |  CASE WHEN en_score >= de_score AND en_score >= fr_score THEN 'en'
        |       WHEN de_score >= fr_score THEN 'de' ELSE 'fr' END AS lang_guess,
        |  en_score, de_score, fr_score
        |FROM s""".stripMargin,

    "q19_fingerprint" ->
      """SELECT doc_id,
        |  sha256(array_to_string(list_sort(list_distinct(str_split(text, ' '))), ' ')) AS fingerprint
        |FROM documents""".stripMargin,

    "q22_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT id_a, id_b, cosine FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |WHERE cosine >= 0.3""".stripMargin,

    "q23_bm25" -> bm25Oracle,

    // q128: the replayed incremental index serves EXACTLY the one-shot
    // corpus statistics (tf/dl are per-doc rows partitioned by batch;
    // N/avgdl derive at read time from the unioned dl table), so q23's
    // one-shot oracle binds verbatim
    "q128_search_index_replay" -> bm25Oracle,

    // q129: gaps-and-islands rebuilt under the STREAM's own clock
    // (event-time millis, event_id — Timestamp.getTime semantics; q24's
    // batch twin uses second truncation). Replay == one-shot because the
    // time-sliced batches preserve that global order and the end-of-log
    // flush closes exactly the sessions the watermark timeout would.
    "q129_sessionize_replay" ->
      """WITH base AS (SELECT user_id, epoch_ns(ts) // 1000000 AS ms,
        |    event_id FROM events),
        |flagged AS (
        |  SELECT user_id, ms, event_id,
        |    CASE WHEN lag(ms) OVER w IS NULL
        |           OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS is_new
        |  FROM base
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |sess AS (
        |  SELECT user_id, ms,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ms) AS start_ms, max(ms) AS end_ms,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  (max(ms) - min(ms)) // 1000 AS duration_sec
        |FROM sess GROUP BY user_id, sid""".stripMargin,

    // q130: inclusive two-sided interval join in DuckDB microseconds —
    // identical bounds to the production function's timestamp arithmetic
    "q130_interval_join" ->
      """WITH v AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id
        |  FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id
        |  FROM events WHERE event_type = 'click')
        |SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
        |  (c.us - v.us) // 1000000 AS lag_sec
        |FROM v JOIN c ON v.user_id = c.user_id
        |  AND c.us >= v.us AND c.us <= v.us + 900000000""".stripMargin,

    "q24_sessionize" ->
      """WITH base AS (
        |  SELECT user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_sec, event_id
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, ts_sec, event_id,
        |    CASE WHEN lag(ts_sec) OVER w IS NULL
        |           OR ts_sec - lag(ts_sec) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM base
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
        |sess AS (
        |  SELECT user_id, ts_sec,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  max(ts_sec) - min(ts_sec) AS duration_sec
        |FROM sess GROUP BY user_id, session_id""".stripMargin,

    "q26_hybrid_search" ->
      """WITH corpus AS (
        |  SELECT d.doc_id AS doc, d.text, e.embedding::DOUBLE[] AS v
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
        |qv AS (SELECT [((i*37)%19 - 9)/7.0 for i in range(0, 64)] AS q),
        |toks AS (SELECT doc, unnest(str_split(text, ' ')) AS term FROM corpus),
        |tf AS (SELECT doc, term, count(*) AS tf FROM toks
        |       WHERE term IN ('spark','join','fast') GROUP BY 1, 2),
        |dl AS (SELECT doc, len(str_split(text, ' '))::DOUBLE AS dl FROM corpus),
        |cs AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |bm AS (
        |  SELECT tf.doc, round(sum(
        |    ln((n_docs::DOUBLE - df + 0.5) / (df + 0.5) + 1.0) *
        |    (tf::DOUBLE * 2.2) / (tf::DOUBLE + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  ), 4) AS bm25
        |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc) CROSS JOIN cs
        |  GROUP BY tf.doc),
        |lexc AS (SELECT doc, bm25 FROM bm ORDER BY bm25 DESC, doc LIMIT 100),
        |lex AS (SELECT doc, bm25,
        |  row_number() OVER (ORDER BY bm25 DESC, doc) AS r_lex FROM lexc),
        |cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE vec_id < 16),
        |assign AS (
        |  SELECT doc, v, cid FROM (
        |    SELECT c2.doc, c2.v, ct.cid,
        |      row_number() OVER (PARTITION BY c2.doc ORDER BY
        |        list_dot_product(c2.v, ct.cv) /
        |          (sqrt(list_dot_product(c2.v, c2.v)) * sqrt(list_dot_product(ct.cv, ct.cv)))
        |        DESC, ct.cid) AS rk
        |    FROM corpus c2 CROSS JOIN cent ct)
        |  WHERE rk = 1),
        |probe AS (
        |  SELECT cid FROM (
        |    SELECT ct.cid,
        |      list_dot_product(ct.cv, q) /
        |        (sqrt(list_dot_product(ct.cv, ct.cv)) * sqrt(list_dot_product(q, q))) AS ccos
        |    FROM cent ct CROSS JOIN qv)
        |  ORDER BY ccos DESC, cid LIMIT 4),
        |vecc AS (
        |  SELECT doc, cos FROM (
        |    SELECT a.doc, list_dot_product(a.v, q) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q, q))) AS cos
        |    FROM assign a JOIN probe USING (cid) CROSS JOIN qv)
        |  ORDER BY cos DESC, doc LIMIT 100),
        |vec AS (SELECT doc, cos,
        |  row_number() OVER (ORDER BY cos DESC, doc) AS r_vec FROM vecc),
        |fused AS (
        |  SELECT coalesce(l.doc, vv.doc) AS doc, l.bm25, l.r_lex, vv.cos, vv.r_vec,
        |    coalesce(1.0/(60.0 + l.r_lex), 0.0) +
        |    coalesce(1.0/(60.0 + vv.r_vec), 0.0) AS rrf
        |  FROM lex l FULL OUTER JOIN vec vv ON l.doc = vv.doc)
        |SELECT doc, bm25, r_lex, round(cos, 6) AS cos, r_vec, round(rrf, 6) AS rrf
        |FROM fused ORDER BY rrf DESC, doc LIMIT 20""".stripMargin,

    "q27_ivf_knn" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |assign AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(e.v, c.cv) /
        |          (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |        DESC, c.cid) AS rk
        |    FROM e CROSS JOIN cent c)
        |  WHERE rk = 1),
        |probe AS (
        |  SELECT qid, cid FROM (
        |    SELECT q.vec_id AS qid, c.cid,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_dot_product(q.v, c.cv) /
        |          (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        |        DESC, c.cid) AS rk
        |    FROM e q CROSS JOIN cent c WHERE q.vec_id < 10)
        |  WHERE rk <= 4),
        |cand AS (
        |  SELECT p.qid AS query_id, a.vec_id AS neighbor_id,
        |    list_dot_product(qe.v, a.v) /
        |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(a.v, a.v))) AS cos
        |  FROM probe p
        |  JOIN assign a ON p.cid = a.cid
        |  JOIN e qe ON qe.vec_id = p.qid
        |  WHERE p.qid <> a.vec_id)
        |SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM cand)
        |WHERE rank <= 5""".stripMargin,

    "q29_enrich" ->
      """SELECT doc_id,
        |  CASE WHEN text ILIKE '%BATTERY%' OR text ILIKE '%POWER%' THEN 'power_system'
        |       WHEN text ILIKE '%SOFTWARE%' OR text ILIKE '%ERROR CODE%' THEN 'software'
        |       WHEN text ILIKE '%LEAD%' OR text ILIKE '%WIRE%' THEN 'leads_wiring'
        |       WHEN text ILIKE '%PUMP%' OR text ILIKE '%OCCLU%' THEN 'infusion'
        |       ELSE 'general' END AS topic,
        |  CAST(CASE WHEN text ILIKE '%DEATH%' OR text ILIKE '%DIED%' THEN 3
        |       WHEN text ILIKE '%INJUR%' OR text ILIKE '%HOSPITAL%' THEN 2
        |       WHEN text IS NOT NULL AND length(text) > 0 THEN 1
        |       ELSE 0 END AS BIGINT) AS severity,
        |  CASE WHEN text IS NULL OR length(text) <= 200 THEN text
        |       ELSE substring(text, 1, 200) || '…' END AS summary
        |FROM documents""".stripMargin,

    "q30_frame_offsets" ->
      """SELECT doc_id AS asset_id,
        |  unnest([CAST(floor((n_chars*100*i)/4.0) AS BIGINT) for i in range(0, 4)])
        |    AS frame_offset_ms
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin,

    "q49_quality_checks" ->
      """SELECT 'orders_orderkey_unique' AS check_name, (
        |  SELECT count(*) FROM (
        |    SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
        |  ) AS violations
        |UNION ALL SELECT 'orders_custkey_not_null', (
        |  SELECT count(*) FROM orders WHERE o_custkey IS NULL)
        |UNION ALL SELECT 'orders_custkey_fk_customer', (
        |  SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |UNION ALL SELECT 'lineitem_returnflag_accepted', (
        |  SELECT count(*) FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A', 'N', 'R'))
        |UNION ALL SELECT 'lineitem_orderkey_fk_orders', (
        |  SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |UNION ALL SELECT 'documents_lang_accepted', (
        |  SELECT count(*) FROM documents
        |  WHERE lang IS NOT NULL AND lang NOT IN ('en', 'es', 'de', 'fr'))
        |UNION ALL SELECT 'documents_text_not_null_when_en', (
        |  SELECT count(*) FROM documents WHERE lang = 'en' AND text IS NULL)""".stripMargin,

    "q48_resize_plan" ->
      """SELECT asset_id, width::BIGINT AS width, height::BIGINT AS height,
        |  CAST(round(width * scale) AS BIGINT) AS target_width,
        |  CAST(round(height * scale) AS BIGINT) AS target_height
        |FROM (
        |  SELECT asset_id, w AS width, h AS height,
        |    least(1.0, 512.0 / greatest(w, h)) AS scale
        |  FROM (SELECT doc_id AS asset_id,
        |          (320 + (doc_id % 7) * 160)::DOUBLE AS w,
        |          (240 + (doc_id % 5) * 144)::DOUBLE AS h
        |        FROM documents
        |        WHERE doc_id % 3 = 0 AND doc_id % 11 <> 0))""".stripMargin,

    "q31_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q32_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q33_promo_revenue" ->
      """SELECT round(100.0 *
        |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0-l_discount AS DECIMAL(12,2)) END) AS DOUBLE) /
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0-l_discount AS DECIMAL(12,2))) AS DOUBLE), 4) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1996-03-01'""".stripMargin,

    "q34_dedup_components" -> dedupComponentsOracle,
    // q118: identical oracle — the distributed label-propagation loop and
    // the driver union-find must produce the same labeling.
    "q118_components_dist" -> dedupComponentsOracle,

    "q35_sequence_packing" ->
      """SELECT doc_id, n_tokens,
        |  CAST(floor(cum_before / 4096.0) AS BIGINT) AS chunk_id
        |FROM (
        |  SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    coalesce(sum(len(str_split(text, ' '))) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM documents)""".stripMargin,

    "q36_quality_filter" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT doc_id,
        |  len(toks) AS n,
        |  list_aggregate(list_transform(toks, x -> length(x)), 'sum') / len(toks) AS avg_len,
        |  len(list_filter(toks, x -> x IN ('the','a','of','to','in','and','is','it','on','for'))) / len(toks) AS stop_ratio,
        |  len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS distinct_ratio
        |FROM t)
        |SELECT doc_id,
        |  n BETWEEN 30 AND 100000 AS rule_len,
        |  avg_len BETWEEN 3.0 AND 10.0 AS rule_token_len,
        |  stop_ratio >= 0.05 AS rule_stopwords,
        |  distinct_ratio >= 0.3 AS rule_distinct,
        |  (n BETWEEN 30 AND 100000) AND (avg_len BETWEEN 3.0 AND 10.0)
        |    AND stop_ratio >= 0.05 AND distinct_ratio >= 0.3 AS keep
        |FROM m""".stripMargin,

    "q37_corpus_quantiles" ->
      """SELECT lang, count(*) AS n_docs,
        |  round(quantile_cont(CAST(len(str_split(text, ' ')) AS DOUBLE), 0.5), 4) AS p50,
        |  round(quantile_cont(CAST(len(str_split(text, ' ')) AS DOUBLE), 0.9), 4) AS p90,
        |  round(quantile_cont(CAST(len(str_split(text, ' ')) AS DOUBLE), 0.99), 4) AS p99
        |FROM documents GROUP BY lang""".stripMargin,

    "q38_asof_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_sec
        |  FROM events),
        |cp AS (
        |  SELECT user_id, ts_sec, max(event_id) AS checkpoint_id
        |  FROM ev WHERE event_id % 10 = 0 GROUP BY user_id, ts_sec)
        |SELECT e.user_id, e.ts_sec, e.event_id, c.checkpoint_id
        |FROM ev e ASOF LEFT JOIN cp c
        |  ON e.user_id = c.user_id AND e.ts_sec >= c.ts_sec""".stripMargin,

    "q39_range_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_sec
        |  FROM events),
        |iv AS (
        |  SELECT user_id, event_id AS iv_id, ts_sec AS s, ts_sec + 3600 AS e
        |  FROM ev WHERE event_id % 20 = 0)
        |SELECT e.user_id, e.event_id, i.iv_id
        |FROM ev e JOIN iv i
        |  ON e.user_id = i.user_id AND e.ts_sec BETWEEN i.s AND i.e""".stripMargin,
  )
}
