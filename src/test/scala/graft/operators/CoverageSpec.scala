package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CoverageSpec extends SparkSpec {
  import spark.implicits._

  // corpus: a×6, b×2, c×1, d×1 (10 tokens)
  private val docs = Seq(
    Seq("a", "a", "a", "b"), Seq("a", "a", "a", "b"), Seq("c", "d"))
    .toDF("toks")

  test("coverageCutoff: minimal prefix, hand-checked at several targets") {
    def terms(pct: Long) =
      Tokenize.coverageCutoff(docs, col("toks"), pct)
        .orderBy("rk").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 60%: 'a' alone covers exactly 6/10 — minimal prefix is just 'a'
    assert(terms(60).toSeq === Seq(("a", 6L, 1L, 6L)))
    // 80%: a(6)+b(2)=8/10
    assert(terms(80).map(_._1).toSeq === Seq("a", "b"))
    // 90%: needs c too (ties broken by term asc: c before d)
    assert(terms(90).map(_._1).toSeq === Seq("a", "b", "c"))
    // 100%: whole vocabulary
    assert(terms(100).map(_._1).toSeq === Seq("a", "b", "c", "d"))
  }

  test("coverageCutoff: totals ride every row; bounds checked") {
    val rows = Tokenize.coverageCutoff(docs, col("toks"), 95L).collect()
    assert(rows.forall(_.getLong(4) === 10L))
    intercept[IllegalArgumentException] {
      Tokenize.coverageCutoff(docs, col("toks"), 0L)
    }
    intercept[IllegalArgumentException] {
      Tokenize.coverageCutoff(docs, col("toks"), 101L)
    }
  }

  test("coverageCutoff: the emitted prefix is exactly the first rows where " +
      "coverage was still short") {
    val rows = Tokenize.coverageCutoff(docs, col("toks"), 95L)
      .orderBy("rk").collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getLong(3)))
    // ranks contiguous from 1
    assert(rows.map(_._1).toSeq === (1L to rows.size))
    // every kept row was needed: before it, coverage < 95%
    rows.foreach { case (_, cnt, cum) =>
      assert(100L * (cum - cnt) < 95L * 10L) }
    // and the prefix reaches the target (or exhausts the vocab)
    assert(100L * rows.last._3 >= 95L * 10L || rows.size == 4)
  }

  private def chao1(ds: Seq[Seq[String]]) = {
    val r = Tokenize.chao1Richness(ds.toDF("toks"), col("toks"))
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
  }

  test("chao1Richness: hand-checked singleton/doubleton estimate") {
    // a×2, b×1, c×1: S=3, f1=2, f2=1 -> 3 + 2*1/(2*(1+1)) = 3.5
    val (nTok, nTyp, f1, f2, est) = chao1(Seq(Seq("a", "a", "b"), Seq("c")))
    assert((nTok, nTyp, f1, f2) === ((4L, 3L, 2L, 1L)))
    assert(est === 3.5)
  }

  test("chao1Richness: no singletons -> estimate equals observed types") {
    val (_, nTyp, f1, _, est) =
      chao1(Seq(Seq("a", "a", "b", "b"), Seq("c", "c", "c")))
    assert(f1 === 0L && est === nTyp.toDouble)
  }

  test("chao1Richness: all-singleton corpus gives the maximal correction") {
    // S=4, f1=4, f2=0 -> 4 + 4*3/2 = 10.0 (the classic undersampled read)
    val (_, _, _, _, est) = chao1(Seq(Seq("a", "b"), Seq("c", "d")))
    assert(est === 10.0)
  }

  private def rep(texts: Seq[(Long, String)], n: Int = 3) =
    Tokenize.repetitionStats(texts.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).toMap

  test("repetitionStats: hand-checked trigram repetition") {
    // "a b a b a b": grams = [a b a, b a b, a b a, b a b]
    //   total 4, distinct 2, top 2 -> dup 0.5, top_share 0.5
    // "w x y z": grams all distinct -> dup 0, top_share 1/2
    val got = rep(Seq((1L, "a b a b a b"), (2L, "w x y z")))
    assert(got(1L) === ((4L, 2L, 2L, 0.5, 0.5)))
    assert(got(2L) === ((2L, 2L, 1L, 0.0, 0.5)))
  }

  test("repetitionStats: pure template spam reads ~1; short docs excluded") {
    val spam = ("buy now " * 30).trim // 60 tokens of a 2-token loop
    val got = rep(Seq((1L, spam), (2L, "too short")))
    assert(!got.contains(2L), "a doc under n tokens has no n-grams")
    val (total, distinct, top, dup, share) = got(1L)
    assert(total === 58L && distinct === 2L)
    assert(top === 29L, "the dominant trigram repeats ~L/2 times")
    assert(dup > 0.96 && share === 0.5)
  }

  private def zipf(ds: Seq[Seq[String]], k: Int = 100) = {
    val r = Tokenize.zipfSlope(ds.toDF("toks"), col("toks"), k).collect().head
    (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))
  }

  test("zipfSlope: an exact cnt = K/r spectrum fits slope -1, intercept ln K") {
    // a×12, b×6, c×4, d×3: ln cnt = ln 12 - 1·ln rk exactly at every rank
    val corpus = Seq(Seq.fill(12)("a"), Seq.fill(6)("b"),
      Seq.fill(4)("c"), Seq.fill(3)("d")).map(identity)
    val (k, slope, icept) = zipf(corpus)
    assert(k === 4L)
    assert(slope === Some(-1.0))
    assert(icept === Some(BigDecimal(math.log(12.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("zipfSlope: topK caps the head; flat spectrum reads slope 0") {
    // six equal-count terms: cnt constant -> y constant -> slope 0
    val flat = Seq(Seq("a", "b", "c", "d", "e", "f"))
    val (k3, slope, _) = zipf(flat, k = 3)
    assert(k3 === 3L && slope === Some(0.0))
  }

  test("zipfSlope: a single ranked term has no fit - NULL, not NaN") {
    val (k, slope, icept) = zipf(Seq(Seq.fill(5)("only")), k = 100)
    assert(k === 1L && slope === None && icept === None)
  }

  test("repetitionStats: plan is one scan-side projection - no shuffle, no join") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val p = Tokenize.repetitionStats(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join") &&
      !p.contains("Window"), s"expected a pure projection:\n$p")
  }
}
