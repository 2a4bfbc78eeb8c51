package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

class GraftSparkExtensionsSpec extends AnyFunSuite {

  test("extensions inject every native expression (one source of truth)") {
    // the extensions class must consume the SAME builder list the
    // imperative GraftExpressions.register path uses — a kernel added to
    // one but not the other would work in tests and vanish under
    // spark.sql.extensions deployment
    val ext = new SparkSessionExtensions
    (new GraftSparkExtensions)(ext) // must inject without throwing
    val names = graft.functions.expressions.GraftExpressions.all.map(_._1.funcName)
    assert(names.distinct.size === names.size, "duplicate function names")
    assert(names.toSet.contains("graft_cosine_sim"))
    assert(names.toSet.contains("graft_bloom_might_contain"))
    assert(names.size >= 15)
  }
}
