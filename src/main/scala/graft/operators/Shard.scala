package graft.operators

import graft.functions.ShaLanes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Consistent-hash ring assignment — the placement primitive behind
 * shard routing, cache partitioning, and "what moves if we add a node"
 * capacity planning (Karger et al. 1997): each node projects
 * `vnodesPerNode` virtual points onto a hash ring, a key is owned by
 * the first ring point at or after its own hash (wrapping), and adding
 * a node relocates only the keys that fall into the new node's arcs —
 * ~1/(n+1) of them — where naive `hash mod n` reshuffles nearly
 * everything.
 *
 * Determinism is the SHA-lane contract ([[ShaLanes]]): ring points are
 * `lane("ring|<node>|<vnode>")` and key hashes `lane(prefix || key)`,
 * bit-identical in any engine — the q25 hyperplane pattern, so the
 * oracle REBUILDS the same ring from `sha256` in SQL rather than
 * receiving it as constants.
 *
 * Scale shape: the ring is nodes×vnodes driver-side Longs (hundreds of
 * bytes) baked into the plan as a SORTED array literal; the successor
 * lookup is a scan-side HOF (`filter` + first element, wrap to the
 * ring head) — zero joins, zero shuffles beyond whatever the caller
 * aggregates afterwards. Binary search would beat the linear HOF only
 * past thousands of vnodes; at the conventional 100–300 points the
 * filter is branch-predictable scan work.
 */
object Shard {

  /**
   * Rebalance audit: the (owner-before, owner-after) movement matrix
   * for adding `addedNodes` to an existing ring — exact integer counts,
   * one grouped pass, ownership computed scan-side for both rings in
   * the same projection.
   */
  def rebalanceMatrix(df: DataFrame, key: Column, nodes: Seq[String],
                      addedNodes: Seq[String],
                      vnodesPerNode: Int): DataFrame = {
    df.select(
        owner(key, nodes, vnodesPerNode).as("owner_old"),
        owner(key, nodes ++ addedNodes, vnodesPerNode).as("owner_new"))
      .groupBy(col("owner_old"), col("owner_new"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** Owner column for `key` on the ring of `nodes` × `vnodesPerNode` —
    * the scan-side successor lookup (sorted ring literal, filter HOF,
    * wrap to the ring head on empty). */
  def owner(key: Column, nodes: Seq[String], vnodesPerNode: Int): Column = {
    require(nodes.nonEmpty, "need at least one node")
    require(vnodesPerNode >= 1, "vnodesPerNode must be >= 1")
    val ring = nodes.flatMap { n =>
      (0 until vnodesPerNode).map(v => ShaLanes.jvmLane(s"ring|$n|$v") -> n)
    }.sortBy(_._1)
    val arr = array(ring.map { case (pt, n) =>
      struct(lit(pt).as("pt"), lit(n).as("node")) }: _*)
    val h = ShaLanes.lane(key)
    val succ = filter(arr, e => e.getField("pt") >= h)
    coalesce(get(succ, lit(0)).getField("node"), lit(ring.head._2))
  }
}
