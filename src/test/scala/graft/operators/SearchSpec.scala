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

  test("indexed hybrid equals one-shot IVF hybrid; close releases caches") {
    val corpus = docs
    val cent = docs.filter(col("doc_id") <= 2L).select(col("doc_id"), col("embedding"))
    val oneShot = HybridSearch.similarCases(corpus, "doc_id", "text", "embedding",
      queryText = "pump leak", queryVec = Seq(1.0, 0.0), k = 4,
      centroids = Some(cent), nProbe = 1)
      .collect().map(r => (r.getAs[Long]("doc"), r.getAs[Double]("rrf"))).toSeq
    val idx = HybridSearch.buildIndex(corpus, "doc_id", "text", "embedding", cent)
    try {
      val warm = HybridSearch.similarCasesIndexed(idx, "pump leak", Seq(1.0, 0.0),
        k = 4, nProbe = 1)
        .collect().map(r => (r.getAs[Long]("doc"), r.getAs[Double]("rrf"))).toSeq
      assert(warm === oneShot)
      // repeated warm calls keep working (the P95 SLO usage pattern)
      val again = HybridSearch.similarCasesIndexed(idx, "battery replacement",
        Seq(0.0, 1.0), k = 2, nProbe = 1).collect()
      assert(again.nonEmpty)
    } finally idx.close()
    assert(idx.bm25.postings.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
    assert(idx.assigned.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
  }

  test("IVF-probed hybrid restricts the vector leg but keeps lexical coverage") {
    // centroid set = docs 1 and 3 (pump-ish vs battery/software-ish);
    // probing 1 list means the vector leg sees only that cluster, while
    // the lexical leg still scores everything — fusion keeps both signals
    val cent = docs.filter(col("doc_id").isin(1L, 3L)).select(col("doc_id"), col("embedding"))
    val top = HybridSearch.similarCases(docs, "doc_id", "text", "embedding",
      queryText = "pump leak", queryVec = Seq(1.0, 0.0), k = 4,
      centroids = Some(cent), nProbe = 1)
      .collect().map(_.getAs[Long]("doc"))
    assert(top.head === 1L, s"got ${top.toSeq}")
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

  private def phrase(corpus: Seq[(Long, String)], terms: String*) =
    Bm25.phraseSearch(corpus.toDF("doc_id", "text"), "doc_id", "text",
        terms.toSeq)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("phraseSearch: adjacency, not bag-of-words; overlaps each start counted") {
    val corpus = Seq(
      (1L, "pump leak detected pump leak confirmed"), // phrase twice
      (2L, "leak pump detected"),                     // terms present, reversed
      (3L, "pump seal leak"),                         // terms present, gap
      (4L, "nothing here"))
    assert(phrase(corpus, "pump", "leak") === Map(1L -> 2L))
  }

  test("phraseSearch: trigram needs all three in order; repeated-word phrases work") {
    val corpus = Seq(
      (1L, "a b c a b c"),     // "a b c" twice
      (2L, "a b x c"),         // broken adjacency
      (3L, "b b b"))           // self-overlapping repeated phrase
    assert(phrase(corpus, "a", "b", "c") === Map(1L -> 2L))
    // "b b": starts at positions 0 and 1 — both count
    assert(phrase(corpus, "b", "b") === Map(3L -> 2L))
  }

  test("phraseSearch: single-term phrase degenerates to term frequency") {
    val corpus = Seq((1L, "x y x"), (2L, "y"))
    assert(phrase(corpus, "x") === Map(1L -> 2L))
  }
}
