package graft.operators

import graft.functions.ShaLanes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Product quantization (PQ) — the missing half of the 100 TB vector-index
 * stack next to IVF ([[Knn.ivfTopK]]): each embedding is cut into `m`
 * sub-vectors and every sub-vector is replaced by the id of its nearest
 * codebook centroid, so a 64-dim float vector (256 B) compresses to `m`
 * small codes (8 B at m=8, k=16 — 32× smaller than float32, 8× smaller
 * than the int8 codes of `Vec.quantQ8`). Distances are then evaluated
 * against CODES ONLY via asymmetric distance computation (ADC): per
 * query, an m×k lookup table of exact sub-distances is computed once on
 * the driver (m·k doubles — the IVF-probe size class) and a corpus row's
 * approximate distance is m table lookups — no float vectors are read,
 * shuffled, or even stored in the serving path.
 *
 * Codebooks:
 *  - [[shaCodebook]] — deterministic SHA-lane codebook (entries uniform
 *    in [-1, 1)), the oracle-parity form: DuckDB rebuilds it exactly from
 *    a range(s)×range(c)×range(d) CTE (same pattern as the q25 LSH
 *    hyperplanes), which is what makes PQ ENCODING a declarable query.
 *  - [[trainCodebook]] — the production form: `m` independent
 *    deterministic k-means runs ([[Knn.kmeansCentroids]]) over the sliced
 *    corpus, one per subspace (train on a corpus sample; PqSpec pins that
 *    trained codebooks reconstruct strictly better than the SHA ones).
 *
 * Encoding is a pure scan-side projection — the nearest-sub-centroid
 * argmins are fixed-size expression trees over codebook literals, zero
 * shuffle/join/window (PlanSpec-pinned), the exact posture of the IVF
 * assignment kernel.
 */
object Pq {

  /** Deterministic oracle-parity codebook: entry (s, c, d) =
    * lane("pq|s,c,d") / 2^59 − 1 ∈ [−1, 1). */
  def shaCodebook(m: Int, k: Int, subDim: Int): Array[Array[Array[Double]]] =
    Array.tabulate(m, k, subDim) { (s, c, d) =>
      ShaLanes.jvmLane(s"pq|$s,$c,$d") / ShaLanes.HalfLane - 1.0
    }

  /** Production codebook: per-subspace deterministic k-means over the
    * (sampled) corpus. Returns m × k × subDim; clusters that k-means
    * leaves empty keep their init centroid (k-means' own rule). */
  def trainCodebook(df: DataFrame, idCol: String, vecCol: String,
                    m: Int, k: Int, subDim: Int,
                    iters: Int = 5): Array[Array[Array[Double]]] =
    Array.tabulate(m) { s =>
      val sub = df
        .filter(col(vecCol).isNotNull)
        .select(col(idCol).as("id"),
          slice(col(vecCol).cast("array<double>"), s * subDim + 1, subDim).as("v"))
      Knn.kmeansCentroids(sub, "id", "v", k, iters)
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        .sortBy(_._1).map(_._2)
    }

  /** Squared L2 between sub-vector `s` of `v` (1-based slicing) and a
    * codebook entry, as a left-assoc sum — the exact arithmetic the
    * DuckDB oracle mirrors term by term. */
  private def subDistSq(v: Column, s: Int, entry: Array[Double]): Column =
    entry.indices.map { d =>
      val x = element_at(v, s * entry.length + d + 1) - lit(entry(d))
      x * x
    }.reduce(_ + _)

  /** PQ code array (m ints) for one vector column — the native
    * [[graft.functions.expressions.PqEncode]] kernel: the codebook rides
    * into generated code as a reference object, so encoding stays one
    * tight codegen'd loop regardless of m·k·subDim. First-minimum
    * tie-break (array_position semantics, identical to the oracle's
    * rank-by-(dist, c)); [[encodeColHof]] keeps the Column-combinator
    * formulation as the cross-checked executable spec. */
  def encodeCol(vec: Column, codebook: Array[Array[Array[Double]]]): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    call_function("graft_pq_encode", vec,
      typedlit(codebook.map(_.map(_.toSeq).toSeq).toSeq))
  }

  /** Scan-side PQ decode: codes → the concatenated codeword vector
    * (subspace order), the reconstruction [[adcTopK]] scores against
    * implicitly. The codebook rides in as a literal; indices are always
    * in-range by construction (codes come from [[encodeCol]] over the
    * same codebook), so ANSI array access cannot throw. Pair with
    * [[encodeCol]] for the fidelity audit (q80): cosine(v, decode(
    * encode(v))) is the per-vector quantization error. */
  def decodeCol(codes: Column, codebook: Array[Array[Array[Double]]]): Column = {
    val cb = typedlit(codebook.map(_.map(_.toSeq).toSeq).toSeq)
    flatten(transform(sequence(lit(0), lit(codebook.length - 1)),
      s => element_at(element_at(cb, s + lit(1)),
        element_at(codes, s + lit(1)) + lit(1))))
  }

  /** Column-combinator PQ encoding (the executable spec for [[encodeCol]]
    * — PqSpec pins bit-equality). NOT the production path: the
    * m·k·subDim-term tree (1024 terms at 8×16×8) exceeds codegen method
    * limits and falls back to interpreted eval (46 s vs sub-second for
    * the kernel on 40k×64-dim at sf0.1), and `array_position(dists,
    * array_min(dists))` evaluates every sub-distance twice. */
  def encodeColHof(vec: Column, codebook: Array[Array[Array[Double]]]): Column = {
    val v = vec.cast("array<double>")
    val codes = codebook.indices.map { s =>
      val dists = array(codebook(s).indices.map(c =>
        subDistSq(v, s, codebook(s)(c))): _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    array(codes: _*)
  }

  /** Exploded encoding — one row per (id, sub, code); the oracle-hashable
    * layout of [[encodeCol]]. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             codebook: Array[Array[Array[Double]]]): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol),
        posexplode(encodeCol(col(vecCol), codebook)).as(Seq("sub", "code")))
      .select(col(idCol), col("sub").cast("long").as("sub"),
        col("code").cast("long").as("code"))

  /** Per-row packed codes — the serving-side layout for [[adcTopK]]. */
  def encodePacked(df: DataFrame, idCol: String, vecCol: String,
                   codebook: Array[Array[Array[Double]]]): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol), encodeCol(col(vecCol), codebook).as("codes"))

  /** ADC approximate squared-L2 of packed codes against one query vector:
    * the m×k sub-distance table is computed here (driver, m·k doubles)
    * and the score is m `element_at` lookups per corpus row — scan-side,
    * vectors never touched. */
  def adcScore(codes: Column, queryVec: Seq[Double],
               codebook: Array[Array[Array[Double]]]): Column = {
    val subDim = codebook(0)(0).length
    val tables: Seq[Seq[Double]] = codebook.indices.map { s =>
      codebook(s).indices.map { c =>
        codebook(s)(c).indices.map { d =>
          val x = queryVec(s * subDim + d) - codebook(s)(c)(d)
          x * x
        }.sum
      }
    }
    codebook.indices.map { s =>
      element_at(typedlit(tables(s)), element_at(codes, s + 1) + 1)
    }.reduce(_ + _)
  }

  /** Approximate top-k nearest (squared L2) of one query over packed
    * codes: ADC score + distributed TakeOrderedAndProject — no shuffle,
    * no vector reads; ties broken by id. */
  def adcTopK(packed: DataFrame, idCol: String, queryVec: Seq[Double],
              codebook: Array[Array[Array[Double]]], k: Int): DataFrame =
    packed
      .select(col(idCol),
        adcScore(col("codes"), queryVec, codebook).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol).asc)
      .limit(k)

  /** Driver-side IVF probe: the `nProbe` centroid list ids nearest the
    * query by cosine, index-asc tie-break — the SAME metric and tie rule
    * as the scan-side assignment kernel, so a probed list is exactly the
    * list the kernel assigned. */
  def probeLists(matrix: Seq[Seq[Double]], queryVec: Seq[Double],
                 nProbe: Int): Seq[Int] = {
    val qNorm = math.sqrt(queryVec.map(x => x * x).sum)
    matrix.zipWithIndex.map { case (cv, i) =>
      val dot = cv.zip(queryVec).map { case (a, b) => a * b }.sum
      val n = math.sqrt(cv.map(x => x * x).sum) * qNorm
      (if (n == 0) Double.NegativeInfinity else dot / n, i)
    }.sortBy { case (cos, i) => (-cos, i) }.take(nProbe).map(_._2)
  }

  /** ADC top-k over an already-materialized (idCol, cid, codes) index
    * frame (e.g. the persisted table [[graft.streaming.Streams.incrementalVectorIndex]]
    * maintains): probe on the driver, prune by list id — partition
    * pruning when the index is laid out by cid — and score codes only. */
  def ivfPqQuery(index: DataFrame, matrix: Seq[Seq[Double]], idCol: String,
                 codebook: Array[Array[Array[Double]]],
                 queryVec: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    val probed = probeLists(matrix, queryVec, nProbe)
    index
      .filter(col("cid").isin(probed: _*))
      .select(col(idCol),
        adcScore(col("codes"), queryVec, codebook).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol).asc)
      .limit(k)
  }

  /**
   * IVF-PQ — the composed serving path, and the shape a 100 TB vector
   * index actually takes: IVF list assignment bounds WHICH rows are
   * scored (probe `nProbe` of the centroid lists — the partition-pruning
   * analog; in production the (cid, codes) table is persisted partitioned
   * by cid so probes prune whole files) and PQ-ADC bounds WHAT scoring
   * costs (m table lookups per candidate — no float vectors in the
   * serving path at all).
   *
   * `centroids` carries (idCol, vecCol) like [[Knn.ivfTopK]]'s; the query
   * probe runs on the driver against the resident centroid matrix (k ×
   * dim doubles) — see [[probeLists]].
   */
  def ivfPqTopK(corpus: DataFrame, centroids: DataFrame,
                idCol: String, vecCol: String,
                codebook: Array[Array[Array[Double]]],
                queryVec: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    val matrix = Knn.centroidMatrix(
      centroids.select(col(idCol).as("cid"), col(vecCol).as("cv")))
    val indexed = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol),
        graft.functions.Vec.nearestCentroid(col(vecCol), matrix).as("cid"),
        encodeCol(col(vecCol), codebook).as("codes"))
    ivfPqQuery(indexed, matrix, idCol, codebook, queryVec, k, nProbe)
  }
}
