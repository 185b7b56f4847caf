package graft

import org.scalatest.funsuite.AnyFunSuite

/** Global physical-plan audit across the whole registry: no query may
  * silently degrade to a non-broadcast Cartesian product — the one plan
  * shape that is always a scale bug (broadcast nested-loop joins against
  * a bounded side are whitelisted where they ARE the algorithm, e.g. the
  * brute-force ANN baseline and the broadcast bloom/bounds single-row
  * frames).
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("no query's physical plan contains a CartesianProduct") {
    // planFn (where present) is the lazy un-checkpointed form: eager-
    // checkpointing queries would otherwise show only a LogicalRDD leaf
    // here, silently exempting their interior joins from the audit
    val offenders = Registry.all.flatMap { q =>
      val plan =
        try q.planFn.getOrElse(q.fn)(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"<failed: ${e.getMessage}>" }
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"CartesianProduct in: ${offenders.mkString(", ")}")
  }
}
