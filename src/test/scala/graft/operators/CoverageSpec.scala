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
}
