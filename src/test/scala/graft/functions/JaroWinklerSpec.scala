package graft.functions

import graft.SparkSpec
import graft.functions.expressions.JaroWinkler
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // fixture values probed from DuckDB jaro_winkler_similarity (the
  // declared parity contract) — textbook cases plus the edges that
  // distinguish implementations
  private val fixtures = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),     // transpositions + prefix
    ("DIXON", "DICKSONX", 0.8133333333333332),    // unequal lengths
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964), // no common prefix
    ("CRATE", "TRACE", 0.7333333333333334),       // jaro > 0.7, prefix 0
    ("spark", "sprak", 0.9466666666666665),
    ("aabab", "ababa", 0.88),                     // greedy-matching order
    ("ab", "axxxxxx", 0.5476190476190476),        // below boost threshold:
                                                  // prefix bonus NOT applied
    ("abcdxxxx", "abcdyyyy", 0.6666666666666666), // prefix 4 but jaro < 0.7
    ("abcXYZ", "cabXYZ", 0.9444444444444445),     // ODD half-transposition
                                                  // count: floored to 1,
                                                  // not 1.5 (3-cycle)
    ("café", "cafe", 0.8483333333333334),         // UTF-8 BYTE semantics:
    ("naïve", "naive", 0.8577777777777779),       // é/ï count 2 bytes
    ("ab", "ba", 0.0),                            // window 0: no matches
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("a", "", 0.0),
    ("", "", 0.0)                                 // DuckDB: both-empty = 0
  )

  test("score matches DuckDB jaro_winkler_similarity bit-for-bit (interpreted)") {
    fixtures.foreach { case (a, b, want) =>
      assert(JaroWinkler.score(a, b) === want, s"score($a, $b)")
      assert(JaroWinkler.score(b, a) === want, s"symmetric score($b, $a)")
    }
  }

  test("kernel through real execution (codegen path), NULL semantics") {
    val df = fixtures.toDF("a", "b", "want")
    val out = df.select(Text.jaroWinkler(col("a"), col("b")).as("jw"),
      col("want")).collect()
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    val nulls = Seq((Some("x"), None: Option[String]), (None: Option[String], Some("x")))
      .toDF("a", "b")
      .select(Text.jaroWinkler(col("a"), col("b"))).collect()
    assert(nulls.forall(_.isNullAt(0)), "NULL in, NULL out")
  }

  test("nameMatchPairs: blocked candidates, exact dups excluded by default") {
    val ents = Seq(
      ("1", "red widget"), ("2", "red widgetx"), ("3", "red widget"),
      ("4", "blue bolt"), ("5", "tiny gear")
    ).toDF("id", "nm")
    val pairs = graft.operators.Dedup
      .nameMatchPairs(ents, "id", "nm", threshold = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // (1,3) is an exact dup (jw = 1.0) — excluded; the dirty twin matches
    // both copies; blue/tiny share no block with red
    assert(pairs === Set(("1", "2"), ("2", "3")))
    val withExact = graft.operators.Dedup
      .nameMatchPairs(ents, "id", "nm", threshold = 0.9, includeExact = true)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(withExact === Set(("1", "2"), ("2", "3"), ("1", "3")))
  }
}
