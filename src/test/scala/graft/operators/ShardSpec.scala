package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Consistent hashing: the minimal-movement contract and wrap edges. */
class ShardSpec extends SparkSpec {
  import spark.implicits._

  private val keys = (1L to 2000L).map(i => s"k$i").toDF("k")

  test("rebalanceMatrix: adding a node only moves keys INTO the new node") {
    val m = Shard.rebalanceMatrix(keys, col("k"),
        nodes = (0 until 8).map(i => s"n$i"), addedNodes = Seq("n8"),
        vnodesPerNode = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    m.keys.foreach { case (old, nw) =>
      assert(old == nw || nw == "n8",
        s"a key moved $old -> $nw without involving the added node")
    }
    val moved = m.collect { case ((o, n), c) if o != n => c }.sum
    val total = m.values.sum
    assert(total === 2000L)
    // expected movement is 1/9 of keys; allow wide slack for 2000 draws
    assert(moved > total / 30 && moved < total / 3,
      s"movement $moved/$total far from the ~1/9 consistent-hashing claim")
  }

  test("owner: total (every key owned) and deterministic across partitionings") {
    def owners(parts: Int) = keys.repartition(parts)
      .select(col("k"), Shard.owner(col("k"), Seq("a", "b", "c"), 8).as("o"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val one = owners(1)
    assert(one.values.toSet.subsetOf(Set("a", "b", "c")))
    assert(one.size === 2000)
    assert(owners(13) === one)
    // all three nodes actually receive keys at this scale
    assert(one.values.toSet === Set("a", "b", "c"))
  }

  test("owner: native binary-search kernel == driver-side linear reference") {
    // the round-12 RingOwner expression replaced the interpreted filter
    // HOF; this pins it to an independent linear successor scan over the
    // same jvmLane ring (including the wrap), key by key
    import graft.functions.ShaLanes
    val nodes = (0 until 5).map(i => s"m$i")
    val ring = nodes.flatMap { n =>
      (0 until 16).map(v => ShaLanes.jvmLane(s"ring|$n|$v") -> n)
    }.sortBy(_._1)
    def refOwner(k: String): String = {
      val h = ShaLanes.jvmLane(k)
      ring.find(_._1 >= h).getOrElse(ring.head)._2
    }
    val got = keys.select(col("k"), Shard.owner(col("k"), nodes, 16).as("o"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    got.foreach { case (k, o) => assert(o === refOwner(k), s"key $k") }
  }

  test("owner: keys past the last ring point wrap to the ring head") {
    // with a single 1-vnode node everything trivially lands there,
    // including keys hashing above the single point (the wrap branch)
    val o = keys.select(Shard.owner(col("k"), Seq("solo"), 1).as("o"))
      .distinct().collect().map(_.getString(0)).toSeq
    assert(o === Seq("solo"))
  }
}
