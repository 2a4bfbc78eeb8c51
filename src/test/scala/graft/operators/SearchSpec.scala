package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "pump leak detected leak confirmed leak", Array(1.0f, 0.0f)),
    (2L, "pump leak detected once only", Array(0.9f, 0.1f)),
    (3L, "battery depleted early replacement needed", Array(0.0f, 1.0f)),
    (4L, "software error code displayed on screen", Array(0.1f, 0.9f))
  ).toDF("doc_id", "text", "embedding")

  test("bm25 ranks higher term frequency above lower, omits non-matching docs") {
    val scores = Bm25.score(docs, "doc_id", "text", Seq("leak"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.keySet === Set(1L, 2L))
    assert(scores(1L) > scores(2L))
  }

  test("indexed bm25 equals one-shot scoring; index reuse across queries") {
    val idx = Bm25.buildIndex(docs, "doc_id", "text")
    for (terms <- Seq(Seq("leak"), Seq("pump", "battery"), Seq("software"))) {
      val oneShot = Bm25.score(docs, "doc_id", "text", terms)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val indexed = Bm25.scoreIndexed(idx, terms)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(indexed === oneShot, s"terms=$terms")
    }
  }

  test("hybrid RRF fuses lexical and vector evidence with filters pushed first") {
    val top = HybridSearch.similarCases(
      docs, "doc_id", "text", "embedding",
      queryText = "pump leak", queryVec = Seq(1.0, 0.0), k = 2)
      .collect().map(_.getAs[Long]("doc"))
    assert(top.toSeq === Seq(1L, 2L))

    val filtered = HybridSearch.similarCases(
      docs, "doc_id", "text", "embedding",
      queryText = "pump leak", queryVec = Seq(1.0, 0.0),
      filters = Seq(col("doc_id") =!= 1L), k = 2)
      .collect().map(_.getAs[Long]("doc"))
    assert(!filtered.contains(1L))
    assert(filtered.head === 2L)
  }

  test("hybrid achieves Recall@20 = 1.0 on a planted near-dup eval set") {
    // 30 filler docs + 3 planted relevants for the query
    val filler = (100 until 130).map(i =>
      (i.toLong, s"routine maintenance report number $i nothing unusual",
        Array(0.0f, 1.0f)))
    val planted = Seq(
      (1L, "catheter balloon leak during inflation procedure", Array(1.0f, 0.0f)),
      (2L, "balloon leak observed on catheter inflation", Array(0.95f, 0.05f)),
      (3L, "inflation leak catheter balloon failure", Array(0.9f, 0.1f)))
    val corpus = (planted ++ filler).toDF("doc_id", "text", "embedding")
    val top20 = HybridSearch.similarCases(corpus, "doc_id", "text", "embedding",
      queryText = "catheter balloon leak inflation", queryVec = Seq(1.0, 0.0), k = 20)
      .collect().map(_.getAs[Long]("doc")).toSet
    val recall = Set(1L, 2L, 3L).intersect(top20).size / 3.0
    assert(recall === 1.0)
  }
}
