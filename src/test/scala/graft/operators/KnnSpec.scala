package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnnSpec extends SparkSpec {
  import spark.implicits._

  /** 3 well-separated clusters in 8-dim: ids 0-9 near e0, 10-19 near e1,
    * 20-29 near e2 (deterministic "noise" from the id). */
  private lazy val corpus = (0 until 30).map { i =>
    val base = Array.fill(8)(0.0f)
    base(i / 10) = 1.0f
    val noisy = base.zipWithIndex.map { case (v, d) =>
      v + 0.05f * (((i * 31 + d * 17) % 7) - 3)
    }
    (i.toLong, noisy)
  }.toDF("vec_id", "embedding")

  test("brute-force top-k returns same-cluster neighbors, ranked") {
    val out = Knn.bruteTopK(corpus, corpus.filter(col("vec_id") === 0), "vec_id", "embedding", 5)
      .collect()
    assert(out.length === 5)
    assert(out.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    out.foreach(r => assert(r.getAs[Long]("neighbor_id") < 10,
      s"neighbor ${r.getAs[Long]("neighbor_id")} not in query's cluster"))
    assert(out.map(_.getAs[Double]("cosine")).toSeq.reverse.sorted.reverse ===
      out.map(_.getAs[Double]("cosine")).toSeq) // descending
  }

  test("IVF top-k: full probe = exact brute answer; 1-probe stays in-list") {
    val queries = corpus.filter(col("vec_id") < 3)
    // one centroid per cluster (ids 0, 10, 20 are near-axis vectors)
    val centroids = corpus.filter(col("vec_id").isin(0L, 10L, 20L))
    def answerSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = answerSet(Knn.bruteTopK(corpus, queries, "vec_id", "embedding", 5))
    // probing every centroid makes IVF exhaustive → must equal brute force
    val full = answerSet(Knn.ivfTopK(corpus, queries, centroids,
      "vec_id", "embedding", k = 5, nProbe = 3))
    assert(full === exact)
    // a single probe only searches the query's own cluster list — with
    // well-separated clusters that still recovers the exact answer
    val one = answerSet(Knn.ivfTopK(corpus, queries, centroids,
      "vec_id", "embedding", k = 5, nProbe = 1))
    assert(one === exact)
  }

  test("k-means centroids separate the clusters; trained IVF matches brute") {
    val centroids = Knn.kmeansCentroids(corpus, "vec_id", "embedding", k = 3, iters = 3)
    val cents = centroids.collect()
    assert(cents.length === 3)
    // each trained centroid points at a distinct true cluster axis
    val axes = cents.map { r =>
      val v = r.getSeq[Double](1)
      v.indexOf(v.max) / 1  // dominant dimension
    }.toSet
    assert(axes.size === 3)

    val queries = corpus.filter(col("vec_id") < 3)
    def answerSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = answerSet(Knn.bruteTopK(corpus, queries, "vec_id", "embedding", 5))
    val trained = answerSet(Knn.ivfTopK(corpus, queries, centroids,
      "vec_id", "embedding", k = 5, nProbe = 1))
    assert(trained === exact)
  }

  test("nearest-centroid kernels are bit-identical to the crossJoin+window argmax") {
    import graft.functions.Vec
    import org.apache.spark.sql.expressions.Window
    // centroids = ids 0..6 ascending, so window cid order == matrix index
    // order; include a zero vector (undefined cosine → NULLS LAST tail)
    val cent = corpus.filter(col("vec_id") < 7)
      .select(col("vec_id").as("cid"),
        when(col("cid") === 5, typedlit(Array.fill(8)(0.0f)))
          .otherwise(col("embedding")).as("cv"))
    val matrix = Knn.centroidMatrix(cent)
    assert(matrix.size === 7)
    for (take <- Seq(1, 3, 7, 9)) {
      val w = Window.partitionBy(col("id")).orderBy(col("ccos").desc, col("cid").asc)
      val win = corpus.select(col("vec_id").as("id"), col("embedding").as("v"))
        .crossJoin(broadcast(cent))
        .withColumn("ccos", Vec.cosine(col("v"), col("cv")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= take)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("rk")) -> r.getAs[Long]("cid"))
        .toMap
      val kern = corpus
        .select(col("vec_id").as("id"),
          posexplode(Vec.nearestCentroids(col("embedding"), matrix, take))
            .as(Seq("pos", "cidx")))
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("pos") + 1) -> r.getAs[Int]("cidx").toLong)
        .toMap
      assert(kern === win, s"take=$take diverged from the window formulation")
    }
    // scalar argmax variant agrees with top-1
    val one = corpus.select(col("vec_id").as("id"),
        Vec.nearestCentroid(col("embedding"), matrix).as("cidx"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val winOne = corpus.select(col("vec_id").as("id"),
        element_at(Vec.nearestCentroids(col("embedding"), matrix, 1), 1).as("cidx"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(one === winOne)
  }

  test("native LSH signatures are bit-identical to the HOF formulation") {
    for (table <- 0 until 3; bits <- Seq(4, 8)) {
      val bad = corpus.select(
          Knn.lshSignature(col("embedding"), bits, table).as("fast"),
          Knn.lshSignatureHof(col("embedding"), bits, table).as("ref"))
        .filter(!(col("fast") <=> col("ref"))).count()
      assert(bad === 0, s"table=$table bits=$bits")
    }
  }

  test("LSH top-k recalls most of the brute-force answer") {
    val queries = corpus.filter(col("vec_id") < 3)
    def answerSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = answerSet(Knn.bruteTopK(corpus, queries, "vec_id", "embedding", 5))
    val approx = answerSet(Knn.lshTopK(corpus, queries, "vec_id", "embedding", 5,
      bits = 4, tables = 6))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall too low; got ${approx.size} pairs")
  }

  test("label cohesion: hand-computed means and cosines") {
    val vecs = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(0.0f, 1.0f)),
      (1, Array(1.0f, 0.0f)), (1, Array(1.0f, 0.0f)), (1, Array(1.0f, 0.0f)),
      (2, null.asInstanceOf[Array[Float]])
    ).toDF("label", "embedding")
    val out = Knn.labelCohesion(vecs, "label", "embedding")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // label 0: mean (.5, .5); cos(e_i, mean) = 1/sqrt(2) each
    assert(out(0) === ((2L,
      BigDecimal(1.0 / math.sqrt(2.0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out(1) === ((3L, 1.0)))
    assert(!out.contains(2), "all-NULL label has no vectors")
  }

  test("hard negatives: full probe equals brute cross-label top-k") {
    val labeled = corpus.withColumn("label", (col("vec_id") / 10).cast("int"))
    val queries = labeled.filter(col("vec_id") < 3)
    val cents = Knn.kmeansCentroids(labeled, "vec_id", "embedding", k = 3, iters = 3)
      .withColumn("label", lit(-1))
    val out = Knn.hardNegatives(labeled, queries, cents,
        "vec_id", "embedding", "label", k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3)) ->
        ((r.getLong(1), r.getInt(2), r.getDouble(4)))).toMap
    // driver-side brute reference with the same sequential-double cosine
    val rows = corpus.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    for (q <- 0L until 3L) {
      val expect = rows.toSeq
        .filter { case (id, _) => id / 10 != q / 10 && id != q }
        .map { case (id, v) => (id, cos(rows(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5)
      expect.zipWithIndex.foreach { case ((id, c), i) =>
        val got = out((q, i + 1L))
        assert(got._1 === id, s"q=$q rank=${i + 1}")
        assert(got._2 === (id / 10).toInt, "neighbor label must differ")
        assert(got._3 === BigDecimal(c)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    // never a same-label "negative"
    out.foreach { case ((q, _), (_, lab, _)) => assert(lab != (q / 10).toInt) }
  }

  test("coverage shift: planted all-slice cluster flagged, balanced ones are not") {
    // corpus has 3 tight clusters of 10; slice = cluster 2 entirely plus
    // nothing else -> its lists shift hard, the others sit at share 0
    val cents = Knn.kmeansCentroids(corpus, "vec_id", "embedding", k = 3, iters = 3)
    val out = Knn.coverageShift(corpus, cents, "vec_id", "embedding",
        slice = col("vec_id") >= 20, tolerance = 0.2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out.values.map(_._1).sum === 30L)
    assert(out.values.map(_._2).sum === 10L)
    // global share = 1/3; the pure-slice cluster (share 1.0) and the
    // empty-slice clusters (share 0.0) all deviate by > 0.2
    out.values.foreach { case (_, _, share, shifted) =>
      assert(shifted === (math.abs(share - 1.0 / 3) > 0.2), s"share=$share") }
    assert(out.values.exists(_._3 === 1.0) && out.values.exists(_._3 === 0.0))
  }

  test("centroid outliers: junk vector flagged, cluster members are not") {
    // corpus + one vector pointing into an unused dimension: far from
    // every cluster centroid, so its best cosine is low
    val junk = Seq((99L, {
      val v = Array.fill(8)(0.0f); v(7) = 1.0f; v
    })).toDF("vec_id", "embedding")
    val all = corpus.unionByName(junk)
    val cents = Knn.kmeansCentroids(all, "vec_id", "embedding", k = 3, iters = 3)
    val out = Knn.centroidOutliers(all, cents, "vec_id", "embedding", threshold = 0.6)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.size === 31)
    assert(out(99L)._3, s"junk vector must be an outlier: ${out(99L)}")
    (0 until 30).foreach(i => assert(!out(i.toLong)._3,
      s"cluster member $i flagged: ${out(i.toLong)}"))
    // flag is exactly the rounded-cosine threshold compare
    out.values.foreach { case (_, c, o) => assert(o === (c < 0.6)) }
  }

  test("SHA-init k-means (q47's trainer) separates the clusters too") {
    val centroids = Knn.kmeansCentroidsSha(corpus, "vec_id", "embedding", k = 3, iters = 3)
    val cents = centroids.collect()
    assert(cents.length === 3)
    val axes = cents.map { r =>
      val v = r.getSeq[Double](1)
      v.indexOf(v.max)
    }.toSet
    assert(axes.size === 3, s"each trained centroid should own a distinct axis: $axes")
  }

  test("Lloyd update: vector-sum aggregate is bit-equal to the explode spec") {
    // integer-valued doubles: position sums are exact under any addition
    // order, so the two formulations must agree to the bit
    val vdf = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(6)(d => ((i * 13 + d * 7) % 11).toDouble))
    }.toDF("id", "vec")
    val matrix = Seq(
      Seq(5.0, 1.0, 0.0, 0.0, 2.0, 0.0),
      Seq(0.0, 4.0, 3.0, 0.0, 0.0, 1.0),
      Seq(1.0, 0.0, 0.0, 6.0, 0.0, 2.0))
    val prod = Knn.clusterMeans(vdf, matrix)
    val spec = Knn.clusterMeansExplode(vdf, matrix)
    assert(prod.nonEmpty)
    assert(prod === spec)
  }

  test("NULL embeddings neither deflate Lloyd means nor poison k-means init") {
    // vectorSum skips NULL vectors; a bare row count would not — the mean
    // would divide by too large an n, and the NULL cid group would break
    // the (cid, sums, n) decode. Both must behave as if the rows were absent.
    val clean = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(4)(d => ((i * 7 + d * 3) % 5).toDouble))
    }
    val withNulls = clean.map { case (id, v) => (id, Option(v)) } ++
      Seq((100L, Option.empty[Array[Double]]), (101L, Option.empty[Array[Double]]))
    val matrix = Seq(Seq(4.0, 1.0, 0.0, 0.0), Seq(0.0, 0.0, 3.0, 2.0))
    assert(Knn.clusterMeans(withNulls.toDF("id", "vec"), matrix) ===
      Knn.clusterMeans(clean.toDF("id", "vec"), matrix))
    // init sampling must never seed a centroid from a NULL vector, even
    // when NULL-vec ids hash into the smallest-lane sample
    val cents = Knn.kmeansCentroids(
      withNulls.toDF("id", "vec"), "id", "vec", k = 2, iters = 2).collect()
    assert(cents.length === 2)
    assert(cents.forall(_.getSeq[Double](1) != null))
  }
}
