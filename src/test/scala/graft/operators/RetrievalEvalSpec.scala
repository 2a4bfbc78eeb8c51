package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  // q1: 4 results, relevant = {b, d, z} (z never retrieved)
  // q2: retrieved but absent from qrels (n_rel = 0 — recall undefined)
  // q3: retrieved, relevant exists, but never found
  // q4: in the TRUTH set but the system returned NOTHING for it
  private lazy val ranked = Seq(
    ("q1", "a", 1L), ("q1", "b", 2L), ("q1", "c", 3L), ("q1", "d", 4L),
    ("q2", "a", 1L), ("q2", "b", 2L),
    ("q3", "e", 1L), ("q3", "f", 2L)
  ).toDF("qid", "doc", "rank")

  private lazy val qrels = Seq(
    ("q1", "b"), ("q1", "d"), ("q1", "z"), ("q3", "g"), ("q4", "h")
  ).toDF("qid", "doc")

  private def byQid(k: Int): Map[String, Row] =
    RetrievalEval.evaluate(ranked, qrels, "qid", "doc", "rank", k)
      .collect().map(r => r.getString(0) -> r).toMap

  test("hits, recall, precision, rr at k=2") {
    val m = byQid(2)
    val q1 = m("q1")
    assert(q1.getAs[Long]("n_rel") === 3L)
    assert(q1.getAs[Long]("hits_at_k") === 1L)      // only b in top-2
    assert(q1.getAs[Double]("recall_at_k") === 0.333333)
    assert(q1.getAs[Double]("precision_at_k") === 0.5)
    assert(q1.getAs[Double]("rr") === 0.5)          // first relevant at rank 2
    assert(q1.getAs[Boolean]("success_at_k"))
  }

  test("relevant result below k still counts for rr, not for hits") {
    // d at rank 4 > k: excluded from hits/recall, but rr looks at the
    // whole ranked list — first relevant is still b at rank 2
    val m = byQid(3)
    val q1 = m("q1")
    assert(q1.getAs[Long]("hits_at_k") === 1L)
    assert(q1.getAs[Double]("rr") === 0.5)
    val m4 = byQid(4)
    assert(m4("q1").getAs[Long]("hits_at_k") === 2L)
    assert(m4("q1").getAs[Double]("recall_at_k") === 0.666667)
  }

  test("query with no qrels: n_rel 0, recall NULL (undefined), rr 0") {
    val q2 = byQid(2)("q2")
    assert(q2.getAs[Long]("n_rel") === 0L)
    assert(q2.isNullAt(q2.fieldIndex("recall_at_k")))
    assert(q2.getAs[Double]("rr") === 0.0)
    assert(!q2.getAs[Boolean]("success_at_k"))
  }

  test("unanswered truth query appears with recall 0, not silently dropped") {
    val q4 = byQid(2)("q4")
    assert(q4.getAs[Long]("n_rel") === 1L)
    assert(q4.getAs[Long]("hits_at_k") === 0L)
    assert(q4.getAs[Double]("recall_at_k") === 0.0)
    assert(q4.getAs[Double]("rr") === 0.0)
    assert(!q4.getAs[Boolean]("success_at_k"))
  }

  test("summarize: macro row; undefined recalls excluded but still counted elsewhere") {
    val per = RetrievalEval.evaluate(ranked, qrels, "qid", "doc", "rank", 2)
    val s = RetrievalEval.summarize(per).head()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(s.getAs[Long]("n_queries") === 4L)
    // recalls: q1 1/3, q2 NULL (excluded from the mean), q3 0.0, q4 0.0
    assert(s.getAs[Double]("mean_recall") === r6((0.333333 + 0.0 + 0.0) / 3))
    // q2 contributes zeros to precision/mrr/success — junk for an
    // unanswerable query still counts against the system — and the
    // unanswered q4 drags every answered-rate metric down
    assert(s.getAs[Double]("mean_precision") === r6(0.5 / 4))
    assert(s.getAs[Double]("mrr") === r6(0.5 / 4))
    assert(s.getAs[Double]("success_rate") === r6(1.0 / 4))
  }

  test("ndcg: exact rational harmonic-discount DCG at scale lcm(1..k)") {
    val m = RetrievalEval.ndcg(ranked, qrels, "qid", "doc", "rank", 4)
      .collect().map(r => r.getString(0) -> r).toMap
    // lcm(1..4) = 12. q1 hits at ranks 2 (b) and 4 (d):
    // dcg_num = 12/2 + 12/4 = 9; n_rel = 3 → idcg_num = 12 + 6 + 4 = 22
    val q1 = m("q1")
    assert(q1.getAs[Long]("dcg_num") === 9L)
    assert(q1.getAs[Long]("idcg_num") === 22L)
    assert(q1.getAs[Double]("ndcg_at_k") ===
      BigDecimal(9.0 / 22.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    // q2: no truth → idcg 0, ndcg NULL (undefined, not 0)
    val q2 = m("q2")
    assert(q2.getAs[Long]("idcg_num") === 0L)
    assert(q2.isNullAt(q2.fieldIndex("ndcg_at_k")))
    // q3: truth exists, nothing found → ndcg 0.0; idcg = 12 (n_rel 1)
    val q3 = m("q3")
    assert(q3.getAs[Long]("dcg_num") === 0L)
    assert(q3.getAs[Long]("idcg_num") === 12L)
    assert(q3.getAs[Double]("ndcg_at_k") === 0.0)
    // q4: unanswered truth query still appears (full-outer), ndcg 0
    val q4 = m("q4")
    assert(q4.getAs[Long]("n_rel") === 1L)
    assert(q4.getAs[Double]("ndcg_at_k") === 0.0)
  }

  test("ndcg: ideal ranking scores exactly 1; IDCG truncates at k") {
    // perfect system: the 3 relevant docs of qx at ranks 1..3, k=2 —
    // only ranks <= k count in DCG, and IDCG uses min(n_rel, k) terms,
    // so dcg_num = idcg_num = 2 + 1 = 3 at scale lcm(1..2) = 2
    val r = Seq(("qx", "a", 1L), ("qx", "b", 2L), ("qx", "c", 3L))
      .toDF("qid", "doc", "rank")
    val t = Seq(("qx", "a"), ("qx", "b"), ("qx", "c")).toDF("qid", "doc")
    val row = RetrievalEval.ndcg(r, t, "qid", "doc", "rank", 2).head()
    assert(row.getAs[Long]("dcg_num") === 3L)
    assert(row.getAs[Long]("idcg_num") === 3L)
    assert(row.getAs[Double]("ndcg_at_k") === 1.0)
  }

  test("averagePrecision: exact integer AP terms at scale lcm(1..k)") {
    val m = RetrievalEval
      .averagePrecision(ranked, qrels, "qid", "doc", "rank", 4)
      .collect().map(r => r.getString(0) -> r).toMap
    // lcm(1..4) = 12. q1 relevant hits: b at rank 2 (cumhits 1) and d at
    // rank 4 (cumhits 2): ap_num = 1*(12/2) + 2*(12/4) = 12;
    // ap_den = 12 * min(3, 4) = 36 → AP = 1/3
    val q1 = m("q1")
    assert(q1.getAs[Long]("ap_num") === 12L)
    assert(q1.getAs[Long]("ap_den") === 36L)
    assert(q1.getAs[Double]("ap_at_k") === 0.333333)
    // q2: no truth → AP NULL (undefined), den 0
    val q2 = m("q2")
    assert(q2.getAs[Long]("ap_den") === 0L)
    assert(q2.isNullAt(q2.fieldIndex("ap_at_k")))
    // q3: truth exists, nothing relevant retrieved → AP 0.0
    assert(m("q3").getAs[Double]("ap_at_k") === 0.0)
    // q4: unanswered truth query appears with AP 0
    assert(m("q4").getAs[Long]("n_rel") === 1L)
    assert(m("q4").getAs[Double]("ap_at_k") === 0.0)
  }

  test("averagePrecision: perfect prefix ranking scores exactly 1") {
    // both relevant docs at ranks 1..2, k=3: P(1)=1, P(2)=1 →
    // ap_num = 1*6 + 2*3 = 12 = ap_den = 6 * min(2,3) ... at L=lcm(1..3)=6
    val r = Seq(("qx", "a", 1L), ("qx", "b", 2L), ("qx", "c", 3L))
      .toDF("qid", "doc", "rank")
    val t = Seq(("qx", "a"), ("qx", "b")).toDF("qid", "doc")
    val row = RetrievalEval.averagePrecision(r, t, "qid", "doc", "rank", 3)
      .head()
    assert(row.getAs[Long]("ap_num") === 12L)
    assert(row.getAs[Long]("ap_den") === 12L)
    assert(row.getAs[Double]("ap_at_k") === 1.0)
  }

  test("summarizeGraded: macro nDCG/MAP, undefined queries excluded from means") {
    val nd = RetrievalEval.ndcg(ranked, qrels, "qid", "doc", "rank", 4)
    val ap = RetrievalEval.averagePrecision(ranked, qrels, "qid", "doc",
      "rank", 4)
    val s = RetrievalEval.summarizeGraded(nd, ap, "qid").head()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(s.getAs[Long]("n_queries") === 4L)
    // per-query ndcg: q1 = 9/22, q2 NULL (excluded), q3 0, q4 0
    assert(s.getAs[Double]("mean_ndcg") === r6((r6(9.0 / 22) + 0.0 + 0.0) / 3))
    // per-query ap: q1 = 12/36, q2 NULL, q3 0, q4 0
    assert(s.getAs[Double]("map") === r6((r6(12.0 / 36) + 0.0 + 0.0) / 3))
  }

  test("ndcgLog2: tolerance lane agrees with an independent StrictMath reference") {
    // independent computation: relevant ranks derived by hand from the
    // fixture, folded with StrictMath — NOT Spark's log — so agreement
    // within epsilon certifies the operator, and any engine-side libm
    // ulp drift stays inside the documented lane (SURVEY §8)
    def disc(r: Long): Double = 1.0 / (StrictMath.log(r + 1.0) / StrictMath.log(2.0))
    def ref(relRanks: Seq[Long], nRel: Long, k: Int): Double = {
      val dcg = relRanks.filter(_ <= k).map(disc).sum
      val idcg = (1L to math.min(nRel, k.toLong)).map(disc).sum
      dcg / idcg
    }
    val m = RetrievalEval.ndcgLog2(ranked, qrels, "qid", "doc", "rank", 4)
      .collect().map(r => r.getString(0) -> r).toMap
    val eps = 2e-6 // 6dp rounding + one lane's worth of ulp headroom
    // q1: relevant at ranks 2 and 4, n_rel 3
    assert(math.abs(m("q1").getAs[Double]("ndcg_log2_at_k") -
      ref(Seq(2L, 4L), 3L, 4)) < eps)
    // q2: no truth → undefined, NULL (same contract as the rational lane)
    assert(m("q2").isNullAt(m("q2").fieldIndex("ndcg_log2_at_k")))
    // q3: truth exists, nothing found → 0.0 exactly
    assert(m("q3").getAs[Double]("ndcg_log2_at_k") === 0.0)
    // q4: unanswered truth query still appears (full-outer), 0.0
    assert(m("q4").getAs[Long]("n_rel") === 1L)
    assert(m("q4").getAs[Double]("ndcg_log2_at_k") === 0.0)
    // ideal ranking is exactly 1 (dcg and idcg are the SAME sequential
    // fold, so equality here is exact, not epsilon)
    val r = Seq(("qx", "a", 1L), ("qx", "b", 2L), ("qx", "c", 3L))
      .toDF("qid", "doc", "rank")
    val t = Seq(("qx", "a"), ("qx", "b"), ("qx", "c")).toDF("qid", "doc")
    assert(RetrievalEval.ndcgLog2(r, t, "qid", "doc", "rank", 3)
      .head().getAs[Double]("ndcg_log2_at_k") === 1.0)
    // run-to-run determinism by construction: the sorted sequential fold
    // makes repeated evaluation bit-identical
    val again = RetrievalEval.ndcgLog2(ranked, qrels, "qid", "doc", "rank", 4)
      .collect().map(r2 => r2.getString(0) -> r2).toMap
    assert(again("q1").getAs[Double]("ndcg_log2_at_k") ===
      m("q1").getAs[Double]("ndcg_log2_at_k"))
  }

  test("query that finds nothing relevant: zeros, rr 0, no success") {
    val q3 = byQid(2)("q3")
    assert(q3.getAs[Long]("n_rel") === 1L)
    assert(q3.getAs[Long]("hits_at_k") === 0L)
    assert(q3.getAs[Double]("recall_at_k") === 0.0)
    assert(q3.getAs[Double]("rr") === 0.0)
    assert(!q3.getAs[Boolean]("success_at_k"))
  }
}
