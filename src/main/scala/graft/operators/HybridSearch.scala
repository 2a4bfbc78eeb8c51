package graft.operators

import graft.functions.Vec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid BM25 + vector retrieval (reference README.md:61,73,117: UC1
 * "similar cases" — text + metadata filters → top-K, Recall@20 ≥ 0.7 SLO).
 *
 * Fusion is Reciprocal Rank Fusion (RRF): score = Σ 1/(k0 + rank_modality),
 * which is scale-free (no score normalization across BM25 and cosine) and
 * the standard robust choice for hybrid retrieval.
 *
 * Both legs produce (doc, rank) with the corpus filtered *first* — metadata
 * predicates push into the parquet scan before any scoring work.
 */
object HybridSearch {

  val RrfK = 60.0

  /**
   * @param corpus    documents with id, text and embedding columns
   * @param queryText whitespace-tokenized query for the lexical leg
   * @param queryVec  embedding of the query for the vector leg
   * @param filters   metadata predicates (product_code, manufacturer, date…)
   * @param k         results to return
   */
  def similarCases(corpus: DataFrame, idCol: String, textCol: String, vecCol: String,
                   queryText: String, queryVec: Seq[Double],
                   filters: Seq[Column] = Nil, k: Int = 20): DataFrame = {
    val filtered = filters.foldLeft(corpus)((df, p) => df.filter(p)).cache()

    val terms = queryText.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    val byBm25 = Window.orderBy(col("bm25").desc, col("doc").asc)
    val lexical = Bm25.score(filtered, idCol, textCol, terms)
      .withColumn("r_lex", row_number().over(byBm25).cast("long"))

    val qv = array(queryVec.map(lit): _*)
    val byCos = Window.orderBy(col("cos").desc, col("doc").asc)
    val vector = filtered
      .select(col(idCol).as("doc"), Vec.cosine(col(vecCol), qv).as("cos"))
      .withColumn("r_vec", row_number().over(byCos).cast("long"))

    val rrf =
      coalesce(lit(1.0) / (lit(RrfK) + col("r_lex")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(RrfK) + col("r_vec")), lit(0.0))

    lexical.select(col("doc"), col("bm25"), col("r_lex"))
      .join(vector.select(col("doc"), col("cos"), col("r_vec")), Seq("doc"), "full_outer")
      .withColumn("rrf", rrf)
      .orderBy(col("rrf").desc, col("doc").asc)
      .limit(k)
  }
}
