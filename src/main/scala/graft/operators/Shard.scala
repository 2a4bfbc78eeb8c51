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
 * bytes) carried into the plan as reference objects; the successor
 * lookup is the native codegen'd binary search
 * ([[graft.functions.expressions.RingOwner]]) — zero joins, zero
 * shuffles beyond whatever the caller aggregates afterwards. (Round 12:
 * the original `filter` HOF formulation ran its lambda INTERPRETED —
 * ~272 struct compares per row across q197's two rings — and was the
 * query's entire hot cost; the kernel is ≤8 long compares in
 * whole-stage codegen, and the key is SHA-hashed ONCE for both rings.)
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
    // hash once: both rings look up the SAME 60-bit lane (by definition —
    // that is what makes consistent hashing consistent), so the SHA-256
    // runs once per key, not once per ring
    df.select(ShaLanes.lane(key).as("__h"))
      .select(
        ownerOfLane(col("__h"), nodes, vnodesPerNode).as("owner_old"),
        ownerOfLane(col("__h"), nodes ++ addedNodes, vnodesPerNode)
          .as("owner_new"))
      .groupBy(col("owner_old"), col("owner_new"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** Owner column for `key` on the ring of `nodes` × `vnodesPerNode`. */
  def owner(key: Column, nodes: Seq[String], vnodesPerNode: Int): Column =
    ownerOfLane(ShaLanes.lane(key), nodes, vnodesPerNode)

  /** Owner of an ALREADY-HASHED 60-bit lane — the native binary-search
    * successor lookup ([[graft.functions.expressions.RingOwner]]); use
    * this form when several rings route the same key so the SHA runs
    * once. */
  def ownerOfLane(lane: Column, nodes: Seq[String],
                  vnodesPerNode: Int): Column = {
    require(nodes.nonEmpty, "need at least one node")
    require(vnodesPerNode >= 1, "vnodesPerNode must be >= 1")
    val ring = nodes.flatMap { n =>
      (0 until vnodesPerNode).map(v => ShaLanes.jvmLane(s"ring|$n|$v") -> n)
    }.sortBy(_._1)
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.expressions.GraftExpressions.register)
    // NULL lane → ring head, matching the pre-RingOwner filter-HOF
    // formulation (its filter dropped every element on a NULL hash and
    // the coalesce fallback fired); RingOwner itself is a null-intolerant
    // UnaryExpression (NULL in → NULL out), so the historical contract
    // lives here, at the ring-construction site that knows the head
    coalesce(
      call_function("graft_ring_owner", lane,
        typedlit(ring.map(_._1)), typedlit(ring.map(_._2))),
      lit(ring.head._2))
  }
}
