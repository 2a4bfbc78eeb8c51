package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private val M = 4
  private val K = 8
  private val D = 4 // subDim; vectors are M*D = 16-dim

  private lazy val cb = Pq.shaCodebook(M, K, D)

  // vectors assembled EXACTLY from codebook entries: vector i uses entry
  // (i + s) % K in subspace s
  private def planted(n: Int): Seq[(Long, Array[Double])] =
    (0 until n).map { i =>
      i.toLong -> (0 until M).flatMap(s => cb(s)((i + s) % K)).toArray
    }

  test("encode recovers the planted codes; ADC is exact on codebook points") {
    val df = planted(8).toDF("vec_id", "embedding")
    val codes = Pq.encode(df, "vec_id", "embedding", cb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (i <- 0 until 8; s <- 0 until M)
      assert(codes((i.toLong, s.toLong)) === ((i + s) % K).toLong,
        s"vector $i subspace $s")
    // a query that IS row 3's vector: ADC distance to row 3 is exactly 0
    // and row 3 ranks first
    val packed = Pq.encodePacked(df, "vec_id", "embedding", cb)
    val top = Pq.adcTopK(packed, "vec_id", planted(8)(3)._2.toSeq, cb, k = 3)
      .collect()
    assert(top.head.getLong(0) === 3L)
    assert(top.head.getDouble(1) === 0.0)
  }

  test("native pq encoder is bit-identical to the column formulation") {
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 60).map(i =>
      i.toLong -> Array.fill(M * D)(rnd.nextDouble() * 2 - 1))
    val df = vecs.toDF("vec_id", "embedding")
    def codes(enc: (org.apache.spark.sql.Column, Array[Array[Array[Double]]]) =>
        org.apache.spark.sql.Column) =
      df.select(col("vec_id"), enc(col("embedding"), cb).as("c"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(Pq.encodeCol) === codes(Pq.encodeColHof))
    // float input widens identically
    val fdf = vecs.map { case (id, v) => id -> v.map(_.toFloat) }
      .toDF("vec_id", "embedding")
    val f = fdf.select(Pq.encodeCol(col("embedding"), cb).as("c"))
      .collect().map(_.getSeq[Int](0))
    // float->double widening happens before arithmetic in both forms, so
    // the float kernel must match the HOF over the same widened floats
    val dWide = fdf.select(Pq.encodeColHof(col("embedding").cast("array<double>"), cb).as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(f === dWide)
  }

  test("short vector from a NON-nullable input yields SQL NULL (kernel nullability)") {
    // array(lit, ...) is a non-nullable column: without the kernel's
    // nullable override this advertised a non-nullable result while eval
    // returned null — EXPRESSION_DECODING_FAILED at collect time
    val out = spark.range(1)
      .select(Pq.encodeCol(array(lit(0.1), lit(0.2), lit(0.3)), cb).as("c"))
    assert(out.collect().head.isNullAt(0))
  }

  test("NULL vectors are skipped; codes always in [0, k)") {
    val df = (planted(5) :+ (99L -> null.asInstanceOf[Array[Double]]))
      .toDF("vec_id", "embedding")
    val out = Pq.encode(df, "vec_id", "embedding", cb).collect()
    assert(!out.exists(_.getLong(0) == 99L))
    assert(out.forall(r => r.getLong(2) >= 0 && r.getLong(2) < K))
    assert(out.length === 5 * M)
  }

  test("ivf-pq: probing every list equals plain ADC; nProbe=1 stays in the query's list") {
    val df = planted(8).toDF("vec_id", "embedding")
    val cent = Seq(planted(8)(0), planted(8)(5))
      .map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
    val q = planted(8)(3)._2.toSeq
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // full probe -> IVF pruning admits everything -> identical to ADC
    val full = rows(Pq.ivfPqTopK(df, cent, "vec_id", "embedding", cb, q,
      k = 5, nProbe = 2))
    val adc = rows(Pq.adcTopK(Pq.encodePacked(df, "vec_id", "embedding", cb),
      "vec_id", q, cb, k = 5))
    assert(full === adc)

    // axis-aligned clusters: nProbe=1 must only ever score the query's list
    val dim = M * D
    val clustered = (0 until 30).map { i =>
      val axis = i % 3
      i.toLong -> Array.tabulate(dim)(d =>
        (if (d == axis) 3.0 else 0.0) + 0.01 * ((i * 31 + d) % 7 - 3))
    }
    val cdf = clustered.toDF("vec_id", "embedding")
    val centers = (0 until 3).map(a =>
      (a.toLong, Array.tabulate(dim)(d => if (d == a) 3.0 else 0.0)))
      .toDF("vec_id", "embedding")
    val got = Pq.ivfPqTopK(cdf, centers, "vec_id", "embedding", cb,
        clustered(6)._2.toSeq, k = 30, nProbe = 1)
      .collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got.forall(_ % 3 === 0L),
      s"nProbe=1 must stay inside cluster 0's list, got $got")
  }

  test("decodeCol rebuilds exactly the chosen codewords, in subspace order") {
    // planted vectors ARE codebook points -> decode(encode(v)) == v
    val df = planted(10).toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"),
        Pq.decodeCol(Pq.encodeCol(col("embedding"), cb), cb).as("vhat"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    planted(10).foreach { case (id, v) =>
      assert(out(id).toArray.toSeq === v.toSeq, s"vec $id") }
    // an off-codebook vector decodes to its per-subspace L2-argmin entry
    val v = Array.tabulate(M * D)(i => 0.1 * i - 0.7)
    val got = Seq(0L -> v).toDF("vec_id", "embedding")
      .select(Pq.decodeCol(Pq.encodeCol(col("embedding"), cb), cb))
      .head().getSeq[Double](0)
    val expect = (0 until M).flatMap { s =>
      cb(s).zipWithIndex.minBy { case (e, c) =>
        ((0 until D).map(d => math.pow(v(s * D + d) - e(d), 2)).sum, c) }._1
    }
    assert(got.toSeq === expect)
  }

  test("trained codebook reconstructs strictly better than the SHA codebook") {
    // clustered data: 3 tight clusters per subspace, far from the SHA
    // codebook's uniform entries
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(3, M * D)(rnd.nextDouble() * 8 - 4)
    val vecs = (0 until 120).map { i =>
      val c = centers(i % 3)
      i.toLong -> c.map(_ + rnd.nextGaussian() * 0.05)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val trained = Pq.trainCodebook(df, "vec_id", "embedding", M, K, D, iters = 4)

    def mse(codebook: Array[Array[Array[Double]]]): Double = {
      val codes = Pq.encodePacked(df, "vec_id", "embedding", codebook)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      vecs.map { case (id, v) =>
        (0 until M).map { s =>
          val e = codebook(s)(codes(id)(s))
          (0 until D).map(d => math.pow(v(s * D + d) - e(d), 2)).sum
        }.sum
      }.sum / vecs.size
    }
    val (tMse, sMse) = (mse(trained), mse(cb))
    assert(tMse < sMse,
      s"trained codebook must reconstruct better: trained=$tMse sha=$sMse")
  }
}
