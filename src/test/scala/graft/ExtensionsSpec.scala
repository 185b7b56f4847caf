package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

/** GraftFunctions.install wires the optimizer rule + SQL function into an
  * existing session (the Verify/Bench path); GraftExtensions does the same
  * at builder time. The shared test session keeps this suite independent
  * of suite execution order.
  */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = { GraftFunctions.install(TestSpark.spark); TestSpark.spark }

  test("rule rewrites size(array_intersect(distinct, distinct)) to the native expression") {
    import spark.implicits._
    val df = spark.range(50)
      .select(
        array_distinct(sequence(col("id"), col("id") + 10)).as("a"),
        array_distinct(sequence(col("id") + 5, col("id") + 15)).as("b"))
      .select(size(array_intersect(col("a"), col("b"))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("sortedlongintersectcount"),
      s"rewrite did not fire:\n$optimized")
    // value preservation: [id..id+10] ∩ [id+5..id+15] has 6 elements
    assert(df.as[Int].collect().forall(_ == 6))
  }

  test("rule does NOT fire without the distinct guard (possible duplicates)") {
    val df = spark.range(10)
      .select(sequence(col("id"), col("id") + 3).as("a"),
        sequence(col("id"), col("id") + 3).as("b"))
      .select(size(array_intersect(col("a"), col("b"))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("sortedlongintersectcount"), optimized)
  }

  test("rule does NOT fire for non-long element types") {
    import spark.implicits._
    val df = Seq((Seq("a", "b"), Seq("b", "c"))).toDF("a", "b")
      .select(size(array_intersect(array_distinct(col("a")),
        array_distinct(col("b")))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("sortedlongintersectcount"), optimized)
    assert(df.as[Int].head() == 1)
  }

  test("rule does NOT fire when array elements may be NULL (containsNull)") {
    import spark.implicits._
    // array(when(...)) yields ArrayType(LongType, containsNull = true);
    // getLong would read a NULL slot as 0 while array_intersect keeps NULL
    // as a distinct element — the rewrite must decline.
    val df = Seq((1L, 2L)).toDF("x", "y")
      .select(
        array_distinct(array(when(col("x") > 0, col("x")), col("y"))).as("a"),
        array_distinct(array(col("x"), lit(null).cast("long"))).as("b"))
      .select(size(array_intersect(col("a"), col("b"))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("sortedlongintersectcount"), optimized)
    // built-in semantics preserved: {1,2} ∩ {1,NULL} = {1}
    assert(df.as[Int].head() == 1)
  }

  test("rule does NOT fire under spark.sql.legacy.sizeOfNull=true") {
    // ANSI mode (default-on in Spark 4) masks the legacy flag — Size only
    // honors legacySizeOfNull when ANSI is off, so flip both for the test.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
    try {
      val df = spark.range(5)
        .select(
          array_distinct(sequence(col("id"), col("id") + 2)).as("a"),
          array_distinct(sequence(col("id") + 1, col("id") + 3)).as("b"))
        .select(size(array_intersect(col("a"), col("b"))).as("n"))
      val optimized = df.queryExecution.optimizedPlan.toString
      // legacy size(NULL) = -1; the null-propagating native expression
      // would change that contract, so the rule must decline.
      assert(!optimized.contains("sortedlongintersectcount"), optimized)
    } finally {
      spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
      spark.conf.set("spark.sql.ansi.enabled", "true")
    }
  }

  test("graft_intersect_count is callable from SQL") {
    val n = spark.sql(
      "SELECT graft_intersect_count(array(1L, 3L, 5L), array(3L, 5L, 7L)) AS n")
      .collect().head.getInt(0)
    assert(n == 2)
  }
}
