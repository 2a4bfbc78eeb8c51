package graft.operators

import graft.functions.Vec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * k-nearest-neighbor similarity search over an embedding column
 * (reference README.md:72,116 — "top-K podobieństwa", Recall@20 SLO).
 *
 * Two paths:
 *  - [[bruteTopK]]: exact cosine top-k. The query set is broadcast, so the
 *    corpus is scanned once with no shuffle of the corpus side; ranking
 *    shuffles only |queries|×|corpus| scored rows partitioned by query.
 *    Right answer for ≤ millions of rows or as the verifier/baseline.
 *  - [[lshTopK]]: random-hyperplane (sign) LSH — corpus is bucketed by an
 *    h-bit signature per hash table; each query only scores rows sharing a
 *    bucket in at least one table. The 100 TB path: bucket count 2^bits
 *    bounds per-task candidate work; recall is tunable via `tables`.
 *
 * Hyperplanes are pseudo-random but fully deterministic: component d of
 * plane p in table t is a hash-derived uniform in [-1,1) from (t,p,d) —
 * no RNG state, reproducible across runs and executors.
 */
object Knn {

  /** Exact brute-force top-k by cosine. `queries` must be small enough to
    * broadcast (it is hinted); ties break by ascending neighbor id. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, k: Int): DataFrame = {
    // Repartition the corpus so the scoring scan parallelizes even off a
    // single-file (1-partition) source; queries stay broadcast.
    val p = corpus.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .repartition(p)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Vec.cosine(col("qvec"), col("cvec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  /**
   * Deterministic Lloyd k-means for IVF centroid training
   * ([[ivfTopK]]'s scale path: "centroids from k-means over a corpus
   * sample"). Init = the k vectors with the smallest xxhash64(id) — a
   * deterministic pseudo-random sample, id type agnostic (the id value
   * itself is never decoded); each iteration assigns by cosine and recomputes per-cluster
   * means; empty clusters keep their previous centroid. Centroids live on
   * the driver between iterations (k × dim doubles — tiny at any corpus
   * scale), so each iteration is one scan-side kernel assignment plus one
   * per-dimension mean aggregation; the corpus is never shuffled.
   *
   * Returns (cid: Long, cvec: array<double>), ready for [[ivfTopK]].
   */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 5): DataFrame =
    kmeansWith(corpus, idCol, vecCol, k, iters, xxhash64(_))

  /** Oracle-parity k-means (q47): the identical Lloyd loop, but the
    * init-sample ordering lane is the 60-bit SHA-256 lane of the STRING
    * id ([[graft.functions.ShaLanes]]). Every step is then reproducible
    * in DuckDB SQL — init selection by lane, assignment via the
    * bit-reproducible cosine ([[graft.functions.Vec.cosine]]'s oracle
    * contract), per-position means — so centroid TRAINING itself is a
    * declared query, not just a spec-tested helper. The xxhash64 form
    * stays the scale primary (one digest per id vs a SHA-256). */
  def kmeansCentroidsSha(corpus: DataFrame, idCol: String, vecCol: String,
                         k: Int, iters: Int = 2): DataFrame =
    kmeansWith(corpus, idCol, vecCol, k, iters,
      id => graft.functions.ShaLanes.lane(id.cast("string")))

  private def kmeansWith(corpus: DataFrame, idCol: String, vecCol: String,
                         k: Int, iters: Int, laneOf: Column => Column): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // NULL embeddings carry no training signal and would otherwise skew
    // the Lloyd update (vectorSum skips them but a bare row count would
    // not) — drop them before init sampling so a NULL vector can never be
    // picked as a seed centroid either.
    val v = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec"))
      .filter(col("vec").isNotNull)
    val n = v.count()
    require(n >= k, s"need at least $k vectors, have $n")
    // Deterministic pseudo-random init: the k vectors with the smallest
    // hash lane of the id — a distributed top-k (TakeOrderedAndProject),
    // spread uniformly over the corpus with NO global window/sort (a
    // row_number-stride sample would funnel every vector through one
    // partition before training even starts).
    var centroids: Seq[(Long, Seq[Double])] = v
      .orderBy(laneOf(col("id")).asc, col("id").asc)
      .limit(k)
      // collect the HASH as the ordering key, not the id itself — ids of
      // any type (string, decimal…) work without a cast. The k rows
      // arrive (lane, id)-ordered; the stable sortBy keeps that order, so
      // cid assignment is deterministic even under lane ties.
      .select(laneOf(col("id")).as("hid"), col("vec"))
      .as[(Long, Seq[Double])].collect().toSeq
      .sortBy(_._1).zipWithIndex
      .map { case ((_, vec), i) => (i.toLong, vec) }

    for (_ <- 0 until iters) {
      // scan-side assignment: the centroid matrix rides into the scan as a
      // kernel reference — the corpus is never crossJoined or shuffled to
      // learn its cluster ids; the only exchange is the per-cluster
      // fixed-width vector-sum partial (ONE dim-wide row per
      // cluster × partition — the corpus is never exploded)
      val means = clusterMeans(v, centroids.map(_._2))
      centroids = centroids.map { case (cid, old) =>
        (cid, means.getOrElse(cid.toInt, old))
      }
    }
    // column names follow the corpus so the result plugs into ivfTopK
    centroids.toDF("cid", "cvec")
      .select(col("cid").as(idCol), col("cvec").as(vecCol))
  }

  /** One Lloyd update as a DataFrame: scan-side kernel assignment, then
    * per-cluster [[Vec.vectorSum]] + row count. The aggregate's per-group
    * state is a single dim-wide double array
    * ([[graft.functions.expressions.VectorSum]]), so the shuffle carries
    * ONE (sum vector, count) pair per cluster × partition — the corpus is
    * never exploded. NULL vectors are dropped here (not just ignored by
    * the sum): vectorSum skips them but `count` would not, which deflates
    * the mean — and a NULL vector's NULL cid breaks the caller's decode.
    * Returns (cid, s: array<double>, n: long). */
  private[graft] def clusterSumsFrame(v: DataFrame, matrix: Seq[Seq[Double]]): DataFrame =
    v.filter(col("vec").isNotNull)
      .select(Vec.nearestCentroid(col("vec"), matrix).as("cid"), col("vec"))
      .groupBy(col("cid"))
      .agg(Vec.vectorSum(col("vec")).as("s"), count(lit(1)).as("n"))

  /** Per-cluster mean vectors via [[clusterSumsFrame]] (the production
    * Lloyd update; empty clusters are simply absent from the map). */
  private[graft] def clusterMeans(v: DataFrame,
                                  matrix: Seq[Seq[Double]]): Map[Int, Seq[Double]] = {
    val spark = v.sparkSession
    import spark.implicits._
    clusterSumsFrame(v, matrix)
      .as[(Int, Seq[Double], Long)].collect()
      .map { case (cid, s, n) => cid -> s.map(_ / n) }.toMap
  }

  /** `posexplode` + per-(cid, pos) AVG formulation — the executable spec
    * for [[clusterMeans]]: both forms drop NULL vectors, then sum the
    * same doubles per position and divide by the same count (VectorSum
    * fails fast on NULL elements, so the per-position AVG count always
    * equals the surviving row count), hence identical means whenever the
    * position sums are order-exact (integer-valued fixtures; KnnSpec pins
    * equality). Kept as the spec only: it materializes corpus × dim rows
    * through the map-side hash aggregate before combining. */
  private[graft] def clusterMeansExplode(v: DataFrame,
                                         matrix: Seq[Seq[Double]]): Map[Int, Seq[Double]] = {
    val spark = v.sparkSession
    import spark.implicits._
    v.filter(col("vec").isNotNull)
      .select(Vec.nearestCentroid(col("vec"), matrix).as("cid"),
        posexplode(col("vec")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("m"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cvec"))
      .as[(Int, Seq[Double])].collect().toMap
  }

  /** Collect a (cid, cv) centroid frame into an ascending-cid matrix for
    * the scan-side nearest-centroid kernels — k × dim doubles on the
    * driver, the same size class as a broadcast threshold. Matrix index i
    * ≡ the i-th centroid in cid order, so the kernels' index-asc tie-break
    * is exactly the window formulation's `cid asc`. */
  private[graft] def centroidMatrix(cent: DataFrame): Seq[Seq[Double]] =
    // coalesce(1) + sortWithinPartitions, NOT orderBy: a global sort would
    // range-partition, and range partitioning runs a separate bounds-
    // sampling job — 2 jobs to order ≤64k tiny rows. The narrow single-
    // partition sort keeps Spark's own ordering semantics for cid (so the
    // kernels' index order ≡ the window form's `cid asc` for any type) in
    // one job with no extra scan.
    cent.coalesce(1).sortWithinPartitions(col("cid").asc)
      .select(col("cv").cast("array<double>"))
      .collect().map(_.getSeq[Double](0)).toSeq

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim): uniform in [-1, 1) derived from a 64-bit avalanche hash. */
  private def planeComponent(table: Int, plane: Int, d: Column): Column =
    xxhash64(lit(table), lit(plane), d).cast("double") / lit(Long.MaxValue.toDouble)

  /** `bits`-bit sign-LSH signature of a vector under hash table `table`:
    * bit p = [dot(v, plane_{table,p}) >= 0].
    *
    * Dispatches to the native codegen'd
    * [[graft.functions.expressions.LshSig]] kernel (the HOF formulation,
    * kept as [[lshSignatureHof]], evaluates interpreted at bits × dims
    * lambda calls per row). */
  def lshSignature(vec: Column, bits: Int, table: Int): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    call_function("graft_lsh_sig", vec, lit(bits), lit(table))
  }

  /** Higher-order-function sign-LSH signature (interpreted reference
    * formulation the native expression is cross-checked against). */
  def lshSignatureHof(vec: Column, bits: Int, table: Int): Column = {
    val v = vec.cast("array<double>")
    val bitCols = (0 until bits).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => x * planeComponent(table, p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bitCols.reduce(_ bitwiseOR _)
  }

  /**
   * IVF (inverted-file) approximate top-k: every corpus vector is assigned
   * to its nearest centroid once (the "inverted list"), and a query scores
   * only the lists of its `nProbe` nearest centroids.
   *
   * Scale shape: assignment is a scan-side projection — the centroid
   * matrix enters the native [[graft.functions.expressions.NearestCentroid]]
   * kernel as a reference object, so the corpus is never crossJoined,
   * shuffled, or windowed to learn its list ids — and candidate work per
   * query is ~ nProbe/|centroids| of the corpus: the partition-pruning
   * analog for vector search. At 100 TB the centroid set comes from sampled k-means
   * over a corpus fraction and the assigned table is written out
   * partitioned by `cid` so probes prune whole files; here centroids are
   * any caller-chosen deterministic subset, which keeps the operator (and
   * its DuckDB oracle) reproducible.
   *
   * `centroids` must carry the same `idCol`/`vecCol` columns as the corpus.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int, nProbe: Int = 2): DataFrame = {
    val matrix = centroidMatrix(
      centroids.select(col(idCol).as("cid"), col(vecCol).as("cv")))
    // scan-side assignment and probing: both sides learn their list ids as
    // pure projections (native nearest-centroid kernels) — no corpus ×
    // centroids materialization, no per-id window, zero exchanges before
    // the candidate join
    val assigned = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .filter(col("cvec").isNotNull)
      .withColumn("cid", Vec.nearestCentroid(col("cvec"), matrix))
    val probed = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .filter(col("qvec").isNotNull)
      .withColumn("cid",
        explode(Vec.nearestCentroids(col("qvec"), matrix, nProbe)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    // |probed| = |queries| × nProbe — broadcast it so the assigned corpus
    // (the big side) is never shuffled by centroid id
    broadcast(probed).join(assigned, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Vec.cosine(col("qvec"), col("cvec")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Embedding-space coverage shift: how differently two corpus slices
    * (e.g. train vs eval, old crawl vs new) populate the clustered
    * embedding space — the domain-shift check run before training or
    * after a crawl refresh. Vectors are assigned scan-side to the given
    * centroids, one grouped pass counts both slices per list (the slice
    * count rides the total's shuffle as a conditional sum), and the
    * output flags lists whose slice share drifts from the global share
    * by more than `tolerance` (absolute). Zero joins; one k-row-output
    * aggregate.
    *
    * Returns (cid, n_total, n_slice, slice_share (6dp), shifted). */
  def coverageShift(vecs: DataFrame, centroids: DataFrame, idCol: String,
                    vecCol: String, slice: Column,
                    tolerance: Double): DataFrame = {
    val matrix = centroidMatrix(
      centroids.select(col(idCol).as("cid"), col(vecCol).as("cv")))
    val assigned = vecs
      .select(col(vecCol).cast("array<double>").as("vec"), slice.as("in_slice"))
      .filter(col("vec").isNotNull)
      .select(Vec.nearestCentroid(col("vec"), matrix).cast("long").as("cid"),
        col("in_slice"))
    val global = assigned.agg(
        sum(when(col("in_slice"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"))
      .head().getDouble(0)
    assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("in_slice"), 1L).otherwise(0L)).as("n_slice"))
      .select(col("cid"), col("n_total"), col("n_slice"),
        round(col("n_slice").cast("double") / col("n_total"), 6).as("slice_share"),
        (abs(col("n_slice").cast("double") / col("n_total") - lit(global)) >
          tolerance).as("shifted"))
  }

  /** Per-label embedding cohesion — the contrastive-training QA metric:
    * for each label, the mean vector and the average cosine of members
    * to it. Labels whose cohesion is low are noisy classes (mislabeled
    * rows, heterogeneous buckets) that poison contrastive pairs.
    *
    * Two scan passes, both scale-clean: the mean pass is the fixed-width
    * [[Vec.vectorSum]] aggregate (ONE dim-wide row per label × partition
    * — the k-means Lloyd shuffle bound), and the cohesion pass re-joins
    * the |labels|-row mean table back as a broadcast. Returns
    * (label, n_vecs, cohesion (4dp)). */
  def labelCohesion(vecs: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val v = vecs.select(col(labelCol).as("label"),
        col(vecCol).cast("array<double>").as("vec"))
      .filter(col("vec").isNotNull)
    val means = v.groupBy(col("label"))
      .agg(Vec.vectorSum(col("vec")).as("sv"), count(lit(1)).as("n_vecs"))
      .select(col("label"), col("n_vecs"),
        transform(col("sv"), x => x / col("n_vecs")).as("mv"))
    v.join(broadcast(means), Seq("label"))
      .select(col("label"), col("n_vecs"), Vec.cosine(col("vec"), col("mv")).as("c"))
      .groupBy(col("label"), col("n_vecs"))
      .agg(round(avg(col("c")), 4).as("cohesion"))
  }

  /** Hard-negative mining for contrastive training: for each query, the
    * top-k most-similar corpus vectors with a DIFFERENT label — the
    * "looks alike, isn't" pairs that carry the most contrastive signal
    * (the ANN counterpart of [[graft.operators.Curate.negativeSamples]]'
    * uniform draws). Exactly [[ivfTopK]]'s candidate-bounded plan shape
    * (scan-side assignment/probing kernels, probe side broadcast, corpus
    * never shuffled) with the label-mismatch predicate applied inside the
    * candidate join — ranking happens AFTER the filter, so the k
    * negatives are the best cross-label candidates in the probed lists. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
                    idCol: String, vecCol: String, labelCol: String,
                    k: Int, nProbe: Int = 2): DataFrame = {
    val matrix = centroidMatrix(
      centroids.select(col(idCol).as("cid"), col(vecCol).as("cv")))
    val assigned = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
        col(labelCol).as("neg_label"))
      .filter(col("cvec").isNotNull)
      .withColumn("cid", Vec.nearestCentroid(col("cvec"), matrix))
    val probed = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        col(labelCol).as("q_label"))
      .filter(col("qvec").isNotNull)
      .withColumn("cid",
        explode(Vec.nearestCentroids(col("qvec"), matrix, nProbe)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(probed).join(assigned, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id") &&
        col("q_label") =!= col("neg_label"))
      .select(col("query_id"), col("neighbor_id"), col("neg_label"),
        Vec.cosine(col("qvec"), col("cvec")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("neg_label"),
        col("rank"), round(col("cos"), 6).as("cosine"))
  }

  /** Embedding outlier scoring: each vector's cosine to its OWN nearest
    * centroid — low similarity means the vector sits between clusters
    * (noise, mislabeled modality, garbage embeddings), the standard
    * cluster-distance curation signal next to [[graft.operators.Dedup.semanticDedup]]'s
    * within-cluster pruning. Returns (id, cid, cos_centroid (4dp),
    * is_outlier = cos_centroid < threshold).
    *
    * Scale shape: assignment is the scan-side nearest-centroid kernel
    * (zero exchanges), and the centroid vectors ride back in as a
    * broadcast of k rows — the corpus is scanned once and never
    * shuffled. */
  def centroidOutliers(corpus: DataFrame, centroids: DataFrame,
                       idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    val cents = centroids.select(col(idCol).cast("long").as("cid"),
      col(vecCol).cast("array<double>").as("cvec"))
    val matrix = centroidMatrix(
      centroids.select(col(idCol).as("cid"), col(vecCol).as("cv")))
    corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec"))
      .filter(col("vec").isNotNull)
      .withColumn("cid", Vec.nearestCentroid(col("vec"), matrix).cast("long"))
      .join(broadcast(cents), Seq("cid"))
      .select(col("id").as(idCol), col("cid"),
        round(Vec.cosine(col("vec"), col("cvec")), 4).as("cos_centroid"))
      .withColumn("is_outlier", col("cos_centroid") < threshold)
  }

  /** Oracle-parity sign-LSH signature: SHA-256-derived hyperplanes
    * ([[graft.functions.expressions.LshSigSha]]) that a DuckDB oracle can
    * rebuild exactly from a `range(t)×range(p)×range(d)` plane CTE. */
  def lshSignatureSha(vec: Column, bits: Int, table: Int): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    call_function("graft_lsh_sig_sha", vec, lit(bits), lit(table))
  }

  /**
   * Approximate top-k: corpus and queries are signed into 2^bits buckets in
   * each of `tables` independent hash tables; candidates = rows sharing the
   * query's bucket in ANY table, then exact cosine re-rank of candidates.
   *
   * `sig` selects the signature family: [[lshSignature]] (xxhash64 planes,
   * scale default) or [[lshSignatureSha]] (oracle-parity planes).
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, bits: Int = 8, tables: Int = 2,
              sig: (Column, Int, Int) => Column = lshSignature): DataFrame = {
    def bucketed(df: DataFrame, id: String, vecAs: String): DataFrame = {
      val sigs = (0 until tables).map(t =>
        struct(lit(t).as("t"), sig(col(vecCol), bits, t).as("sig")))
      df.select(col(idCol).as(id), col(vecCol).as(vecAs),
          explode(array(sigs: _*)).as("bk"))
        .select(col(id), col(vecAs), col("bk.t").as("t"), col("bk.sig").as("sig"))
    }
    val c = bucketed(corpus, "neighbor_id", "cvec").as("c")
    val q = bucketed(queries, "query_id", "qvec").as("q")
    val cand = c.join(broadcast(q),
        col("c.t") === col("q.t") && col("c.sig") === col("q.sig") &&
          col("q.query_id") =!= col("c.neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qvec"), col("cvec"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand
      .select(col("query_id"), col("neighbor_id"),
        Vec.cosine(col("qvec"), col("cvec")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }
}
