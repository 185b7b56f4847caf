package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry() returns rows on sf0.001, and every
  * registered query has a unique name; every oracle key refers to a real
  * query.
  */
class EntrySpec extends AnyFunSuite {
  import TestSpark.spark

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry is consistent: unique names, oracles reference queries") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct)}")
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"orphan oracle: $k"))
  }

  test("every query declares a doc string (operator provenance)") {
    Registry.all.foreach(q => assert(q.doc.nonEmpty, q.name))
  }
}
