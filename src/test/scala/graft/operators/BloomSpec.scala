package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    1L -> "alpha beta gamma", 2L -> "delta epsilon zeta",
    3L -> "eta theta iota", 4L -> null.asInstanceOf[String]
  ).toDF("doc_id", "text")

  test("bloom probe has no false negatives over the corpus it was built from") {
    val bytes = Bloom.buildLong(corpus.filter(col("text").isNotNull),
      xxhash64(col("text")), expectedItems = 1024, fpp = 0.01)
    val n = corpus.filter(col("text").isNotNull)
      .filter(Bloom.mightContain(bytes, xxhash64(col("text")))).count()
    assert(n === 3)
  }

  test("admitExact matches the exact anti-join decision; NULL text admitted") {
    val batch = Seq(
      10L -> "alpha beta gamma",       // byte-identical to corpus doc 1 -> rejected
      11L -> "totally novel content",  // not in corpus -> admitted
      12L -> null.asInstanceOf[String] // NULL equals nothing -> admitted
    ).toDF("doc_id", "text")
    val out = Bloom.admitExact(corpus, batch, "doc_id", "text",
      expectedItems = 1024)
    val rows = out.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rows === Map(10L -> false, 11L -> true, 12L -> true))
    // (the scan-side-probe plan shape is pinned in PlanSpec over the real
    // parquet tables — a local fixture constant-folds the probe away)
  }
}
