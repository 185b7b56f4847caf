package graft

import org.scalatest.funsuite.AnyFunSuite

class EdaSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("approx distinct stays within the configured error bound of exact") {
    val rows = Registry.queries("q27_approx_distinct")(spark, sf).collect()
    val exact = Registry.queries("q21_distinct_agg")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (tpe, approx) = (r.getString(0), r.getLong(1))
      val e = exact(tpe).toDouble
      // rsd 0.02 → generous 5x slack for small cardinalities
      assert(math.abs(approx - e) / e <= 0.10,
        s"$tpe: approx $approx vs exact $e")
    }
  }

  test("rollup emits per-group rows, per-type subtotals, and a grand total") {
    val rows = Registry.queries("q25_rollup")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val grand = rows.filter(r => r._1 == "<all>" && r._2 == "<all>")
    assert(grand.length == 1)
    val total = grand.head._3
    val typeSubtotals = rows.filter(r => r._1 != "<all>" && r._2 == "<all>")
    assert(typeSubtotals.map(_._3).sum == total)
    val leaves = rows.filter(r => r._1 != "<all>" && r._2 != "<all>")
    assert(leaves.map(_._3).sum == total)
  }

  test("salted aggregation equals direct aggregation (q24 vs q01 totals)") {
    val salted = Registry.queries("q24_salted_agg")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val direct = Registry.queries("q01_count_by_type")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }
}
