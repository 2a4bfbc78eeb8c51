package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Tokenize.bpePairCounts]], [[Diff.snapshotDiff]] and
  * [[Dedup.editDistancePairs]] against in-memory reference models. */
class TokenizeDiffSpec extends SparkSpec {
  import spark.implicits._

  // Independently-coded greedy BPE reference: recursive min-rank passes.
  private def refEncode(w: String, ranks: Map[(String, String), Int]): List[String] = {
    def pass(ps: List[String], best: Int): List[String] = ps match {
      case x :: y :: rest if ranks.getOrElse((x, y), Int.MaxValue) == best =>
        (x + y) :: pass(rest, best)
      case x :: rest => x :: pass(rest, best)
      case Nil => Nil
    }
    def loop(ps: List[String]): List[String] = {
      val ranksPresent = ps.zip(ps.drop(1))
        .map(p => ranks.getOrElse(p, Int.MaxValue))
      val best = if (ranksPresent.isEmpty) Int.MaxValue else ranksPresent.min
      if (best == Int.MaxValue) ps else loop(pass(ps, best))
    }
    loop(w.map(_.toString).toList)
  }

  test("bpeEncode: agrees with the recursive reference on random vocabularies") {
    val rnd = new scala.util.Random(31)
    val alphabet = "abcd"
    val words = (0 until 60).map(_ =>
      (0 until 1 + rnd.nextInt(9)).map(_ => alphabet(rnd.nextInt(4))).mkString)
    // random merge list over symbols reachable by earlier merges
    var symbols = alphabet.map(_.toString).toVector
    val merges = (0 until 25).map { _ =>
      val a = symbols(rnd.nextInt(symbols.length))
      val b = symbols(rnd.nextInt(symbols.length))
      symbols = symbols :+ (a + b)
      (a, b)
    }.distinct
    val ranks = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val docs = words.grouped(6).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val got = Tokenize.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val ref = words.grouped(6).zipWithIndex.map { case (ws, i) =>
      i.toLong -> ws.flatMap(w => refEncode(w, ranks)) }.toMap
    got.foreach { case (id, toks) => assert(toks === ref(id), s"doc $id") }
    // losslessness: concatenating a word's tokens rebuilds the word
    got.values.flatten.foreach(t => assert(t.nonEmpty))
    val rebuilt = got.toSeq.sortBy(_._1).map(_._2.mkString).mkString
    assert(rebuilt === words.mkString)
  }

  test("bpeEncode: rank priority beats position; repartition-proof; null-safe") {
    // merges: (b,c) rank 0, (a,bc) rank 1, (a,b) rank 2. 'abc' must go
    // a|b|c -> a|bc (rank 0 first, not the leftmost (a,b)) -> abc
    val merges = Seq(("b", "c"), ("a", "bc"), ("a", "b"))
    val docs = Seq((1L, "abc ab"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Tokenize.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) === Seq("abc", "ab"))
    assert(out(2L) === Seq.empty)
    val repart = Tokenize.bpeEncode(docs.repartition(5), "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(repart === out)
  }

  test("bpeEncode: applying the induced top pair shrinks token counts by its frequency") {
    val docs = Seq((1L, "low lower lowest"), (2L, "slow glow low")).toDF("doc_id", "text")
    val top = Tokenize.bpePairCounts(docs, "text", topK = 1).head()
    val pair = (top.getString(0).substring(0, 1), top.getString(0).substring(1))
    assert(top.getString(0) === "lo" && top.getLong(1) === 6L)
    val before = Tokenize.bpeEncode(docs, "doc_id", "text", Nil)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    val after = Tokenize.bpeEncode(docs, "doc_id", "text", Seq(pair))
      .agg(sum(col("n_tokens"))).head().getLong(0)
    assert(before - after === 6L, "each occurrence of the merged pair saves one token")
  }

  test("bpePairCounts matches the sliding-window reference model") {
    val texts = Seq("low lower lowest", "low low newest widest",
      "a ab low b", null)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // reference: word frequencies over length>=2 words, then sliding pairs
    val wc = texts.filter(_ != null).flatMap(_.split(" "))
      .filter(_.length >= 2).groupBy(identity).view.mapValues(_.size.toLong)
    val ref = wc.toSeq.flatMap { case (w, c) => w.sliding(2).map(_ -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = Tokenize.bpePairCounts(df, "text", topK = 1000)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === ref)
    // the corpus's most frequent pair: "lo" (low x4, lower, lowest) = 6
    assert(got("lo") === 6L)
  }

  test("bpePairCounts topK cut is deterministic under count ties") {
    // four pairs all with count 1: ab, bc | cd, de — topK=2 must take the
    // lexicographically-first ties, not an arbitrary subset
    val df = Seq((1L, "abc"), (2L, "cde")).toDF("doc_id", "text")
    val got = Tokenize.bpePairCounts(df, "text", topK = 2)
      .collect().map(_.getString(0)).toSet
    assert(got === Set("ab", "bc"))
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val oldSnap = Seq((1L, "same"), (2L, "was this"), (3L, "gone"),
      (5L, null: String), (6L, null: String), (7L, "now null"))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, "same"), (2L, "now that"), (4L, "new doc"),
      (5L, null: String), (6L, "was null"), (7L, null: String))
      .toDF("doc_id", "text")
    val got = Diff.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      2L -> "changed",   // digest differs
      3L -> "removed",   // only in old
      4L -> "added",     // only in new
      6L -> "changed",   // NULL -> text
      7L -> "changed"))  // text -> NULL; 1 and 5 (NULL==NULL) unchanged
  }

  test("editDistancePairs: threshold-bounded distances inside (group, band) buckets") {
    // band width 8, maxDist 3; all texts length < 8 -> band 0
    val df = Seq(
      (1L, "s1", "kitten"), (2L, "s1", "sitting"), // classic distance 3
      (3L, "s1", "kitten"),                        // distance 0 to id 1
      (4L, "s1", "abcdefg"),                       // > 3 edits from all
      (5L, "s2", "kitten")                         // other group: no pair
    ).toDF("doc_id", "source", "text")
    val got = Dedup.editDistancePairs(df, "doc_id", "text",
        groupCols = Seq("source"), bandChars = 8, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((1L, 2L) -> 3L, (1L, 3L) -> 0L, (2L, 3L) -> 3L))
  }

  test("editDistancePairs: candidates form only within the same length band") {
    // identical-prefix texts whose lengths straddle the band boundary are
    // NOT candidates (documented banding semantics: production unions the
    // adjacent-band join)
    val df = Seq((1L, "g", "aaaaaaa"), (2L, "g", "aaaaaaaaa"))
      .toDF("doc_id", "source", "text")
    val got = Dedup.editDistancePairs(df, "doc_id", "text",
      groupCols = Seq("source"), bandChars = 8, maxDist = 4)
    assert(got.count() === 0)
  }
}
