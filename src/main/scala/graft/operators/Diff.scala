package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus snapshot diff: the CDC-style "what changed between two
 * materializations" operator a lakehouse pipeline runs before an
 * incremental rebuild (re-embed only changed docs, re-index only
 * added ones, tombstone removed ones). Classifies every id present in
 * either snapshot as added / removed / changed / unchanged by comparing
 * content digests.
 *
 * Scale shape: each side collapses to (id, 64-char SHA-256 hex) in its
 * own scan — document payloads never shuffle — and the single shuffle is
 * the id-keyed full-outer join of the two digest tables (~80 bytes/row).
 * At 100 TB of documents that join is a few hundred GB of digests, and
 * the unchanged majority is filtered before anything downstream runs.
 */
object Diff {

  /**
   * Diff two snapshots of a corpus on `idCol`, comparing SHA-256 of
   * `textCol`. Returns (idCol, status) for every NON-unchanged id,
   * status ∈ {added, removed, changed}. Digest comparison is null-safe:
   * two NULL texts are equal (unchanged), NULL vs non-NULL is changed.
   */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("id"),
      sha2(col(textCol), 256).as("d_old"), lit(true).as("in_old"))
    val n = newSnap.select(col(idCol).as("id"),
      sha2(col(textCol), 256).as("d_new"), lit(true).as("in_new"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("in_old").isNull, lit("added"))
          .when(col("in_new").isNull, lit("removed"))
          .when(!(col("d_old") <=> col("d_new")), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col("id").as(idCol), col("status"))
  }
}
