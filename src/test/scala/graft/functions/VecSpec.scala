package graft.functions

import graft.SparkSpec
import graft.functions.Text
import org.apache.spark.sql.functions._

class VecSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pairs = {
    // deterministic pseudo-random float vectors, incl. edge cases
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(16)(d => (((i * 37 + d * 11) % 19) - 9) / 7.0f))
    } :+ (50L, Array.fill(16)(0.0f)) // zero vector
    vecs.toDF("id", "v")
  }

  test("native cosine expression is bit-identical to the HOF formulation") {
    val joined = pairs.as("a").join(pairs.as("b"), col("a.id") < col("b.id"))
    val diff = joined.select(
        Vec.cosine(col("a.v"), col("b.v")).as("fast"),
        Vec.cosineHof(col("a.v"), col("b.v")).as("ref"))
      .filter(!(col("fast") <=> col("ref")))
    assert(diff.count() === 0)
  }

  test("native cosine: NULL on zero norm, NULL input, length mismatch") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 0.0f)),           // zero norm
      (Array(1.0f, 0.0f), null.asInstanceOf[Array[Float]])) // null input
      .toDF("a", "b")
      .select(Vec.cosine(col("a"), col("b")).as("c"))
    assert(df.collect().forall(_.isNullAt(0)))
    val mismatch = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(Vec.cosine(col("a"), col("b")).as("c"))
    assert(mismatch.collect().head.isNullAt(0))
  }

  test("native shingles match the HOF formulation on edge cases") {
    val docs = Seq(
      "a b c d e",            // normal
      "a a a a",              // duplicate shingles collapse
      "x y",                  // shorter than n=3 → empty
      "",                     // one empty token
      "solo",
      "p q r p q r p q"       // repeated pattern
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(1, 2, 3)) {
      val both = docs.select(
        Text.shingles(Text.tokens(col("text")), n).as("fast"),
        Text.shinglesHof(Text.tokens(col("text")), n).as("ref"))
      val bad = both.filter(!(col("fast") <=> col("ref"))).count()
      assert(bad === 0, s"n=$n mismatch")
    }
  }

  test("native shingles: NULL token array yields empty array") {
    val df = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(Text.shingles(Text.tokens(col("text")), 2).as("sh"))
    assert(df.collect().head.getSeq[String](0) === Seq.empty)
  }

  test("native cosine value sanity") {
    val got = Seq((Array(1.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(Vec.cosine(col("a"), col("b"))).collect().head.getDouble(0)
    assert(math.abs(got - 1.0 / math.sqrt(2.0)) < 1e-15)
  }

  test("int8 quantization: bounded round-trip error; cosine over codes is scale-free") {
    val q = pairs.select(col("id"), col("v"),
      Vec.q8Scale(col("v")).as("sc"), Vec.quantQ8(col("v")).as("q"))
    // codes stay in the int8 range; zero vector → zero scale and codes
    q.collect().foreach { r =>
      val codes = r.getSeq[Byte](3)
      assert(codes.forall(c => c >= -127 && c <= 127), s"id ${r.getLong(0)}")
      if (r.getDouble(2) == 0.0) assert(codes.forall(_ == 0))
    }
    // reconstruction error per element <= scale/254 (half a code step)
    val worst = q.select(greatest(array_max(transform(
        zip_with(col("v").cast("array<double>"),
          Vec.dequantQ8(col("q"), col("sc")), (x, y) => abs(x - y)),
        e => e / when(col("sc") === 0.0, 1.0).otherwise(col("sc")))), lit(0.0)).as("rel"))
      .agg(max("rel")).head().getDouble(0)
    assert(worst <= 1.0 / 254.0 + 1e-12, s"worst relative error $worst")

    // cosine over the CODES equals cosine over the dequantized vectors
    // exactly — per-vector scales cancel (the int math IS the answer)
    val j = q.as("a").join(q.as("b"), col("a.id") < col("b.id"))
      .filter(col("a.sc") > 0 && col("b.sc") > 0)
    val bad = j.select(
        Vec.cosineQ8(col("a.q"), col("b.q")).as("qc"),
        Vec.cosine(Vec.dequantQ8(col("a.q"), col("a.sc")),
          Vec.dequantQ8(col("b.q"), col("b.sc"))).as("dc"))
      .filter(!(col("qc") <=> col("dc")) && abs(col("qc") - col("dc")) > lit(1e-12))
      .count()
    assert(bad === 0)
    // and approximates the full-precision cosine well at 16 dims
    val drift = j.select(max(abs(Vec.cosineQ8(col("a.q"), col("b.q")) -
        Vec.cosine(col("a.v"), col("b.v")))).as("d"))
      .head().getDouble(0)
    assert(drift < 0.02, s"quantized cosine drift $drift")
  }

  test("vector_sum: NULL vectors ignored, all-NULL group NULL, float upcast, dim guard") {
    val df = Seq(
      (1L, Array(1.0, 2.0)),
      (1L, null.asInstanceOf[Array[Double]]),
      (1L, Array(3.0, 4.0)),
      (2L, null.asInstanceOf[Array[Double]])
    ).toDF("g", "v")
    val got = df.groupBy("g").agg(Vec.vectorSum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Double](1))).toMap
    assert(got(1L) === Some(Seq(4.0, 6.0)))
    assert(got(2L) === None)
    // float inputs upcast element-wise to double (exact here)
    val f = Seq(Array(1.5f, 2.5f), Array(0.5f, 0.25f)).toDF("v")
      .agg(Vec.vectorSum(col("v"))).collect().head.getSeq[Double](0)
    assert(f === Seq(2.0, 2.75))
    // ragged dimensions fail fast instead of silently desyncing the sums
    val ragged = Seq(Array(1.0), Array(1.0, 2.0)).toDF("v")
    intercept[Exception] { ragged.agg(Vec.vectorSum(col("v"))).collect() }
  }
}
