package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 10, 11: exact duplicates. 20, 21: near-duplicates (one token differs).
  // 30, 31: unrelated.
  private lazy val docs = Seq(
    10L -> "the quick brown fox jumps over the lazy dog near the river bank",
    11L -> "the quick brown fox jumps over the lazy dog near the river bank",
    20L -> "data pipelines shuffle partitions across executors during wide transformations at scale",
    21L -> "data pipelines shuffle partitions across workers during wide transformations at scale",
    30L -> "completely different content about cooking pasta with tomato sauce and basil leaves",
    31L -> "astronomy telescopes observe distant galaxies through adaptive optics instruments tonight"
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id and counts copies") {
    val out = Dedup.exact(docs, "doc_id", "text")
    assert(out.count() === 5)
    val dup = out.filter(col("n_copies") > 1).collect()
    assert(dup.length === 1)
    assert(dup.head.getAs[Long]("doc_id") === 10L)
    assert(dup.head.getAs[Long]("n_copies") === 2L)
  }

  test("n-gram jaccard finds near-dup pair and nothing else at 0.5") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((10L, 11L), (20L, 21L)))
  }

  test("containmentPairs: a wholesale quote scores ~1 where Jaccard misses it") {
    val quote = "alpha beta gamma delta"
    val wrapper = quote + " " + (1 to 20).map(i => s"pad$i").mkString(" ")
    val corpus = Seq((1L, quote), (2L, wrapper), (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(corpus, "doc_id", "text",
        n = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // doc 1's 3 bigrams all appear in doc 2 (24 words -> 23 bigrams):
    // c(1→2) = 1.0, c(2→1) = 3/23 — and Jaccard = 3/23 won't pass 0.9
    assert(got.keySet === Set((1L, 2L)))
    assert(got((1L, 2L)) === ((3L, 1.0, 0.130435)))
    val jac = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
        n = 2, threshold = 0.9).count()
    assert(jac === 0L, "Jaccard at the same threshold misses the quote")
  }

  test("containmentPairs: direction is reported, not collapsed; threshold filters") {
    // two half-overlapping docs: symmetric containment 0.5 — below 0.6
    val corpus = Seq((1L, "a b c d"), (2L, "c d e f")).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(corpus, "doc_id", "text", 2, 0.6).count() === 0L)
    val loose = Dedup.containmentPairs(corpus, "doc_id", "text", 2, 0.3)
      .collect().map(r => (r.getDouble(3), r.getDouble(4))).head
    // shared bigram: only "c d" — 1/3 each direction
    assert(loose === ((0.333333, 0.333333)))
  }

  test("prefix-filtered jaccard equals the brute inverted-index form") {
    for (t <- Seq(0.2, 0.5, 0.8); n <- Seq(2, 3)) {
      val brute = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pref = Dedup.prefixFilteredJaccardPairs(docs, "doc_id", "text", n, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pref === brute, s"n=$n t=$t")
    }
  }

  test("prefix filtering prunes: fewer index rows than the full shingle index") {
    // at t=0.8 each doc exposes ~20% of its shingles + slack; the brute
    // index exposes all of them — counted through the operator's OWN
    // prefix builder so the sizing cannot drift from what it joins
    val canonical = Dedup.canonicalShingleDocs(docs, "doc_id", "text", 2)
    val full = canonical.agg(sum(col("n_sh"))).head().getLong(0)
    val pref = Dedup.jaccardPrefixIndex(canonical, 0.8).count()
    assert(pref < full / 2, s"prefix index $pref of $full")
  }

  test("minhash LSH surfaces duplicate candidates; exact dup has est 1.0") {
    val out = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 2, bands = 4, rowsPerBand = 4).collect()
    val byPair = out.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(byPair((10L, 11L)) === 1.0)          // identical docs always collide
    assert(byPair.contains((20L, 21L)))          // near-dup caught by banding
    assert(byPair((20L, 21L)) > 0.4)
    assert(!byPair.contains((30L, 31L)))         // unrelated never bucket together
  }

  test("simhash: identical docs share fingerprints; near-dups within hamming radius") {
    val fp = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(10L) === fp(11L))
    assert(java.lang.Long.bitCount(fp(20L) ^ fp(21L)) <= 12)
    assert(java.lang.Long.bitCount(fp(10L) ^ fp(31L)) > 12)
  }

  // parity fixture includes NULL text (native kernels must drop the row
  // like the agg formulations' explode does) and empty text (one ""
  // token both sides)
  private lazy val docsEdge = docs.unionByName(Seq(
    (40L, null.asInstanceOf[String]), (41L, "")).toDF("doc_id", "text"))

  test("native minhash signatures are bit-identical to the aggregation formulation") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val native = rows(Dedup.minhashSignatures(docsEdge, "doc_id", "text", 3, 16))
    val agg = rows(Dedup.minhashSignaturesAgg(docsEdge, "doc_id", "text", 3, 16))
    assert(native === agg)
    assert(!native.contains(40L))
  }

  test("native simhash is bit-identical to the aggregation formulation") {
    val native = Dedup.simhash(docsEdge, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = Dedup.simhashAgg(docsEdge, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === agg)
    assert(!native.contains(40L) && native.contains(41L))
  }

  test("native sha minhash signatures are bit-identical to the aggregation formulation") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val native = rows(Dedup.minhashSignaturesSha(docsEdge, "doc_id", "text", 3, 16))
    val agg = rows(Dedup.minhashSignaturesShaAgg(docsEdge, "doc_id", "text", 3, 16))
    assert(native === agg)
    assert(!native.contains(40L))
  }

  test("native sha simhash is bit-identical to the aggregation formulation") {
    val native = Dedup.simhashSha(docsEdge, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = Dedup.simhashShaAgg(docsEdge, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === agg)
    assert(!native.contains(40L) && native.contains(41L))
  }

  test("connected components label chains and keep isolated docs out") {
    import spark.implicits._
    // chain 1-2-3, triangle 10-11-12 (+ redundant edge), pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    // driver union-find fast path
    val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === expected)
    // distributed min-label propagation path (forced)
    val dist = Dedup.connectedComponents(pairs, "doc_a", "doc_b",
        driverBudgetBytes = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === expected)

    val corpus = (1L to 25L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val kept = Dedup.canonicalize(corpus, "doc_id", pairs, "doc_a", "doc_b")
      .collect().map(_.getLong(0)).toSet
    // representatives survive, other members dropped, isolated docs kept
    assert(kept.contains(1L) && !kept.contains(2L) && !kept.contains(3L))
    assert(kept.contains(10L) && !kept.contains(11L) && !kept.contains(12L))
    assert(kept.contains(20L) && !kept.contains(21L))
    assert(kept.contains(5L) && kept.contains(25L))
    assert(kept.size === 25 - 5)
  }

  test("composed pipeline: LSH scan -> Jaccard verify -> canonicalize keep set") {
    import spark.implicits._
    // near-dup family {1,2,3} + distinct docs; candidates from banded LSH,
    // verified against exact n-gram Jaccard, clustered, then canonicalized
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "a quick brown fox jumps over the lazy dog again and again"),
      (4L, "completely different content about streaming query engines"),
      (5L, "yet another unrelated document mentioning vector search at scale"))
      .toDF("doc_id", "text")
    val candidates = Dedup.minhashLshPairs(corpus, "doc_id", "text",
      shingleN = 3, bands = 8, rowsPerBand = 2)
    val verified = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
        n = 3, threshold = 0.5).as("j")
      .join(candidates.as("c"),
        col("j.doc_a") === col("c.doc_a") && col("j.doc_b") === col("c.doc_b"),
        "left_semi")
    val kept = Dedup.canonicalize(corpus, "doc_id", verified, "doc_a", "doc_b")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L, 5L),
      s"family {1,2,3} should collapse to 1; got $kept")
  }

  test("incremental admission agrees with banded pairs over the union corpus") {
    // Index docs carry ids 100+ (admitted earlier, ids larger than the
    // batch's — admission must not assume index ids are smaller); batch
    // brings an exact dup of an indexed doc, a near-dup, an in-batch dup
    // chain, and fresh content.
    val index = Seq(
      100L -> "the quick brown fox jumps over the lazy dog near the river bank",
      101L -> "data pipelines shuffle partitions across executors during wide transformations at scale",
      102L -> "astronomy telescopes observe distant galaxies through adaptive optics instruments tonight"
    ).toDF("doc_id", "text")
    val batch = Seq(
      1L -> "the quick brown fox jumps over the lazy dog near the river bank",
      // appended-token near-dup of 101: 9 of 10 shingles shared (J = 0.9)
      2L -> "data pipelines shuffle partitions across executors during wide transformations at scale today",
      3L -> "completely new content about cooking pasta with tomato sauce and basil",
      4L -> "completely new content about cooking pasta with tomato sauce and basil",
      5L -> "tiny"  // < shingleN tokens: no signature, always admitted
    ).toDF("doc_id", "text")

    for (sigFn <- Seq(Dedup.minhashSignatures _, Dedup.minhashSignaturesSha _)) {
      val idx = Dedup.lshIndex(index, "doc_id", "text", 3, 4, 4, sigFn)
      val out = Dedup.admitIncremental(idx, batch, "doc_id", "text",
          threshold = 0.5, 3, 4, 4, sigFn).collect()
        .map(r => r.getLong(0) ->
          (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(3))).toMap
      assert(out.size === 5)
      assert(out(1L) === (Some(100L), false))   // exact dup of indexed doc
      assert(out(2L) === (Some(101L), false))   // near-dup of indexed doc
      assert(out(3L) === (None, true))          // fresh: admitted
      assert(out(4L) === (Some(3L), false))     // in-batch dup of smaller id
      assert(out(5L) === (None, true))          // unshingleable: admitted
    }

    // ground truth (xxhash64 family): every decision is derivable from the
    // banded pairs of the UNION corpus — a batch doc's dup_of is the min
    // partner among {any index doc, smaller batch ids} at est >= 0.5
    val batchIds = Set(1L, 2L, 3L, 4L, 5L)
    val expected = Dedup.minhashLshPairs(index.unionByName(batch),
        "doc_id", "text", 3, 4, 4)
      .filter(col("est_jaccard") >= 0.5).collect()
      .flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        Seq((a, b), (b, a)).collect {
          case (p, d) if batchIds(d) && (!batchIds(p) || p < d) => d -> p
        }
      }
      .groupBy(_._1).map { case (d, ps) => d -> ps.map(_._2).min }
    val got = Dedup.admitIncremental(
        Dedup.lshIndex(index, "doc_id", "text"), batch, "doc_id", "text",
        threshold = 0.5).collect()
      .flatMap(r => Option(r.get(1)).map(p => r.getLong(0) -> p.asInstanceOf[Long]))
      .toMap
    assert(got === expected)
  }

  test("ANN near-dup (sign-LSH) has precision 1.0 vs the brute baseline") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 30).flatMap { i =>
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      val near = v.map(x => x + (rnd.nextGaussian() * 0.01).toFloat)
      Seq((i.toLong, v), (i + 100L, near))
    }
    val df = rows.toDF("vec_id", "embedding")
    def pairs(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val brute = pairs(Dedup.embeddingNearDups(df, "vec_id", "embedding", 0.95))
    assert(brute.size >= 30)                     // every planted (i, i+100) pair
    for (sig <- Seq(Knn.lshSignature _, Knn.lshSignatureSha _)) {
      val ann = pairs(Dedup.lshNearDupPairs(df, "vec_id", "embedding", 0.95,
        bits = 6, tables = 4, sig = sig))
      // precision exactly 1.0: every ANN pair is a brute pair, same cosine
      ann.foreach { case (k, c) =>
        assert(brute.get(k).contains(c), s"false positive or cosine drift at $k") }
      // tiny-angle planted pairs should nearly all collide in >=1 of 4 tables
      assert(ann.size >= (brute.size * 0.8).toInt,
        s"recall too low: ${ann.size}/${brute.size}")
    }
  }

  test("rare-ngram stats match a from-scratch model; hash twins agree") {
    // reference model straight from the definition over the shared fixture
    val sh = docs.collect().map(r => r.getLong(0) ->
        r.getString(1).split(" ").sliding(5).map(_.mkString(" ")).toSeq.distinct)
      .toMap
    val dfreq = sh.values.flatten.toSeq.groupBy(identity).view.mapValues(_.size).toMap
    val expected = sh.map { case (id, ss) =>
      val uniq = ss.count(s => dfreq(s) == 1)
      val frac = BigDecimal(uniq.toDouble / ss.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> ((ss.size.toLong, uniq.toLong, frac, uniq.toDouble / ss.size > 0.5))
    }
    for (out <- Seq(Dedup.rareNgramStats(docs, "doc_id", "text"),
                    Dedup.rareNgramStatsSha(docs, "doc_id", "text"))) {
      val got = out.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
      assert(got === expected)
    }
    // identical docs can have no globally-unique ngrams
    assert(expected(10L)._2 === 0L && expected(11L)._2 === 0L)
    // unrelated docs are all-unique -> risky
    assert(expected(30L)._4 && expected(31L)._4)
  }

  test("semantic dedup drops exactly the smaller-id near-dups within clusters") {
    val rnd = new scala.util.Random(11)
    val seeds = Array.fill(4)(Array.fill(16)(rnd.nextGaussian()))
    // ids 0..15 hug their seed (near-dups of each other); 16..39 scatter
    val rows = (0 until 40).map { i =>
      val jitter = if (i < 16) 0.001 else 0.6
      val v = seeds(i % 4).map(x => (x + rnd.nextGaussian() * jitter).toFloat)
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val cents = Knn.kmeansCentroids(df, "vec_id", "embedding", k = 4, iters = 2)
    val out = Dedup.semanticDedup(df, cents, "vec_id", "embedding", 0.95)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.size === 40)
    // reference model: recompute the drop rule from the operator's own
    // cluster ids with driver-side cosine at the same round-6 compare
    val vec = rows.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def cos6(a: Array[Double], b: Array[Double]): BigDecimal = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    out.foreach { case (id, (cid, kept)) =>
      val expected = !out.exists { case (o, (ocid, _)) =>
        ocid == cid && o < id && cos6(vec(o), vec(id)) >= BigDecimal(0.95) }
      assert(kept === expected, s"id=$id cid=$cid")
    }
    // the planted near-dup ids (0..15, 4 per cluster) must collapse to one
    // survivor each; the scattered tail keeps a healthy mix of both flags
    assert((0 until 16).count(i => out(i.toLong)._2) === 4)
    assert(out.count(_._2._2) > 4 && out.count(!_._2._2) >= 12)
  }

  test("embedding near-dup by cosine threshold") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(vecs, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("passage dedup keeps first occurrence corpus-wide, rebuilds in order") {
    val corpus = Seq(
      1L -> "alpha beta. gamma delta. only here",
      2L -> "alpha beta. fresh text",          // first passage is doc 1's
      3L -> "alpha beta. gamma delta. only here", // exact copy -> vanishes
      4L -> null.asInstanceOf[String]
    ).toDF("doc_id", "text")
    val out = Dedup.passageDedup(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((3L, 3L, "alpha beta. gamma delta. only here")))
    assert(out(2L) === ((2L, 1L, "fresh text")))
    assert(!out.contains(3L), "a fully-deduped doc must vanish")
    assert(!out.contains(4L))
  }

  test("boilerplate filter drops over-frequent passages from EVERY doc, firsts included") {
    // "promo line" appears 3 times > maxFreq=2 -> removed everywhere
    // (passageDedup would have kept doc 1's copy); "rare once"/"rare twice"
    // survive in order
    val corpus = Seq(
      1L -> "promo line. rare once",
      2L -> "promo line. rare twice",
      3L -> "rare twice. promo line",
      4L -> "promo line",                      // all boilerplate -> vanishes
      5L -> null.asInstanceOf[String]
    ).toDF("doc_id", "text")
    val out = Dedup.passageFrequencyFilter(corpus, "doc_id", "text", maxFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((2L, 1L, "rare once")))
    assert(out(2L) === ((2L, 1L, "rare twice")))
    assert(out(3L) === ((2L, 1L, "rare twice")))
    assert(!out.contains(4L), "an all-boilerplate doc must vanish")
    assert(!out.contains(5L))
  }

  test("edit-distance verify: bounded kernel over explicit candidates only") {
    val docs = Seq((1L, "kitten"), (2L, "sitting"), (3L, "kitchen"),
      (4L, "completely different text"), (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val cand = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.editDistanceVerify(docs, "doc_id", "text", cand, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // kitten-sitting = 3 (at the bound), kitten-kitchen = 2; 1-4 exceeds
    // the bound (kernel returns -1), 1-5 has NULL text, and the in-reach
    // pair (2,3) is NOT a candidate so it must not appear
    assert(out === Map((1L, 2L) -> 3L, (1L, 3L) -> 2L))
  }

  test("decontamination flags train docs sharing >= minHits shingles with eval") {
    // eval quotes doc 20's phrasing; doc 11 is an exact copy of eval text;
    // 30/31 share nothing; 50 is too short to shingle; 51 has NULL text
    val train = docs.unionByName(Seq(
      (50L, "tiny doc"), (51L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val eval = Seq(
      100L -> "the quick brown fox jumps over the lazy dog near the river bank",
      101L -> "shuffle partitions across executors during wide transformations"
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, eval, "doc_id", "text",
      shingleN = 3, minHits = 2)
    val rows = out.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rows.keySet === Set(10L, 11L, 20L, 21L, 30L, 31L, 50L, 51L))
    assert(rows(10L)._3 && rows(11L)._3)     // exact quotes of eval text
    assert(rows(20L)._3 && rows(21L)._3)     // both share the quoted phrase
    assert(!rows(30L)._3 && !rows(31L)._3)   // unrelated content
    assert(rows(50L) === ((0L, 0L, false)))  // too short to shingle
    assert(rows(51L) === ((0L, 0L, false)))  // NULL text
    // n_hit never exceeds n_shingles, and a doc's hits are distinct shingles
    rows.values.foreach { case (nSh, nHit, _) => assert(nHit <= nSh) }
  }

  test("canonicalize keeps the argmax-quality doc per component, ties to min id") {
    // components: {1,2,3} labeled 1, {7,8} labeled 7
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc", "component")
    // component 1: doc 2 wins on quality; component 7: tie → min id 7
    val qual = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 4L), (8L, 4L),
      (99L, 100L)) // unlabeled doc must not leak in
      .toDF("doc_id", "quality")
    val out = Dedup.canonicalize(comps, qual, "doc_id", "quality").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out === Map(
      1L -> ((3L, 2L, 9L)),   // 3 docs, doc 2 (quality 9 beats 9@3 by id)
      7L -> ((2L, 7L, 4L))))  // tie at 4 → smallest id
  }

  test("semantic decontamination flags same-list near-eval vectors only") {
    // centroids at the two axes; train 10 ~ eval 100 (same list, cos ~1),
    // train 11 in the other list, train 12 same list but orthogonal-ish
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val train = Seq(
      (10L, Array(0.9f, 0.1f)),   // near eval 100, list 0 -> contaminated
      (11L, Array(0.1f, 0.9f)),   // list 1, no eval there -> clean
      (12L, Array(0.7f, -0.7f))   // list 0 but cos to eval < threshold
    ).toDF("vec_id", "embedding")
    val eval = Seq((100L, Array(1.0f, 0.05f))).toDF("vec_id", "embedding")
    val out = Dedup.semanticDecontaminate(train, eval, cents,
        "vec_id", "embedding", threshold = 0.8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out(10L) === ((0L, true)))
    assert(out(11L) === ((1L, false)))
    assert(out(12L)._2 === false)
    assert(out.size === 3, "one row per train vector, eval never emitted")
  }

  test("connected components fail loudly when label propagation can't converge") {
    // a path graph 0-1-2-...-8 has diameter 8: min-label propagation needs
    // ~8 rounds, so maxIters=2 on the forced distributed path must throw
    // rather than hand back partially-propagated (wrong) labels
    val path = (0L until 8L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(path, "doc_a", "doc_b",
        maxIters = 2, driverBudgetBytes = 0).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // the same graph converges fine with an adequate budget
    val ok = Dedup.connectedComponents(path, "doc_a", "doc_b",
      maxIters = 20, driverBudgetBytes = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.values.toSet === Set(0L))
  }

  test("dup-span dedup removes later occurrences, keeps the first, merges overlaps") {
    // doc 1 holds the first occurrence of every duplicated window; doc 2
    // repeats the 5-gram mid-doc; doc 3 is too short for any window;
    // doc 4 IS the duplicated 5-gram (fully removed); doc 5 overlaps three
    // duplicated windows, whose covers must merge into one maximal span
    val spanDocs = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta",
      2L -> "x y alpha beta gamma delta epsilon",
      3L -> "short doc here",
      4L -> "alpha beta gamma delta epsilon",
      5L -> "p q alpha beta gamma delta epsilon zeta eta r"
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpanDedup(spanDocs, "doc_id", "text", win = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L) === ((0L, 0L, "alpha beta gamma delta epsilon zeta eta")),
      "first occurrence is never removed")
    assert(out(2L) === ((1L, 5L, "x y")))
    assert(out(3L) === ((0L, 0L, "short doc here")),
      "docs shorter than the window pass through")
    assert(out(4L) === ((1L, 5L, "")), "fully-duplicated doc empties")
    assert(out(5L) === ((3L, 7L, "p q r")),
      "overlapping duplicated windows merge into one removed span")
  }
}
