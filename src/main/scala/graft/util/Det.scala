package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism toolkit for DuckDB-oracle hash parity.
  *
  * The driver compares our parquet output against DuckDB results by value
  * hash, so every emitted cell must be bit-identical across engines. Doubles
  * summed in nondeterministic partial-aggregation order are NOT (IEEE
  * addition is order-sensitive); these helpers route every aggregate through
  * exact arithmetic:
  *
  *  - [[dsum]]: sum through `DECIMAL(18,4)` (exact, order-insensitive) and
  *    cast the final total back to double (a single deterministic rounding).
  *  - [[dmean]] / [[dstddev]]: derive moments from exact decimal sums, then
  *    do the scalar double math (deterministic given identical inputs).
  *  - [[seqDot]] and friends: sequential left-to-right folds over arrays so
  *    both engines add in the same order.
  *
  * At 100 TB scale these stay fully distributed: decimal sums use the same
  * partial/final hash-aggregation as double sums (Spark's `Sum` over
  * `DecimalType` is codegen'd), and the folds are per-row expressions inside
  * whole-stage codegen.
  */
object Det {

  /** Exact sum of a double column: decimal(18,4) accumulation → double.
    *
    * Scale 4 is deliberate twice over: (1) the testdata carries at most 2
    * real decimal digits, so per-row casts are never near a rounding tie;
    * (2) the summed integer representation stays < 2^53 (up to ~9e11 in
    * sum magnitude), so the final decimal→double conversion is a single
    * correctly-rounded step in BOTH engines — Spark goes through
    * BigDecimal.doubleValue, DuckDB divides the int128 by 10^scale; they
    * only agree when that int128 is itself exactly representable.
    */
  def dsum(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  /** Deterministic mean: exact decimal sum divided by count, in doubles. */
  def dmean(c: Column): Column =
    dsum(c) / count(c)

  /** Deterministic sample stddev from exact decimal moments:
    * sqrt((n*Σx² − (Σx)²) / (n·(n−1))). Matches `stddev_samp` (ddof=1 —
    * pandas `.std()` semantics, SURVEY §7.4) but with order-insensitive
    * accumulation. x is cast at scale 2 (the data's true scale) so squares
    * have exactly 4 decimals — no per-row rounding at all — and sums stay
    * exactly double-representable (see [[dsum]]).
    */
  def dstddev(c: Column): Column = {
    val n = count(c).cast("double")
    val x = c.cast("decimal(12,2)")
    val s = sum(x).cast("double")
    val s2 = sum((x * x).cast("decimal(30,4)")).cast("double")
    when(count(c) > 1, sqrt((s2 * n - s * s) / (n * (n - lit(1.0)))))
  }

  /** Sequential dot product of two float/double arrays — both engines
    * accumulate in index order, so the result is bit-identical. Backed by
    * the native codegen expression [[org.apache.spark.sql.graft.SeqDotProduct]],
    * which performs the exact IEEE operation sequence of the reference
    * fold `aggregate(zip_with(a,b,(x,y) -> double(x)*double(y)), 0.0, +)`
    * (equivalence pinned in ExpressionSpec) without the interpreted
    * higher-order-function cost. Used by cosine similarity
    * (similarity/SimilarityQueries.scala).
    */
  def seqDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftFunctions.seqDot(a, b)

  /** Sequential sum of squares of one array (for norms). */
  def seqNormSq(a: Column): Column = seqDot(a, a)

  /** Jaro-Winkler similarity (native codegen expression,
    * [[org.apache.spark.sql.graft.JaroWinkler]]) — bit-identical to
    * DuckDB's `jaro_winkler_similarity` (same match window,
    * transposition halving, 0.7 boost threshold and operation order).
    * Evidence: ExpressionSpec pins the published Winkler vectors to
    * DuckDB's exact output doubles plus a 20k-random-pair
    * codegen≡interpreted sweep, and the q228 oracle hash-compares the
    * raw scores of every blocked candidate pair against DuckDB.
    */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftFunctions.jaroWinkler(a, b)

  /** Polynomial rolling hash of a string, char-by-char:
    * fold(acc = seed; acc = (acc*31 + codepoint) mod 1_000_000_007).
    * Pure integer math — bit-exact in any engine; intermediate values stay
    * below 2^35 so 64-bit overflow is impossible. Runs inside whole-stage
    * codegen (no UDF). DuckDB equivalent:
    * `list_reduce(list_prepend(seed, list_transform(string_split(t,''),
    *   c -> unicode(c))), (a,b) -> (a*31+b) % 1000000007)`.
    *
    * CONTRACT: ASCII/BMP input only. Spark's `split(s, "")` yields UTF-16
    * code units — a non-BMP character (emoji, astral CJK) becomes TWO lone
    * surrogates and `ascii` sees each separately, while DuckDB's
    * `string_split` yields ONE codepoint — the mirrors diverge. The driver
    * testdata is pure ASCII (TESTDATA.md), where code unit == codepoint ==
    * byte and the two sides are provably identical. To extend past the BMP,
    * hash UTF-8 bytes on both sides (`encode(s,'utf-8')` here, `encode(s)`
    * in DuckDB) instead of characters.
    */
  def polyHash(s: Column, seed: Long = 7L): Column =
    org.apache.spark.sql.graft.GraftFunctions.polyHash(s, seed)

  /** The HOF reference form of [[polyHash]] — kept as the spec's
    * equivalence baseline (ExpressionSpec pins the native expression
    * against it); queries use the native one.
    */
  def polyHashHof(s: Column, seed: Long = 7L): Column =
    aggregate(
      // drop empty-char artifacts: split("","") yields [""] in Spark while
      // ascii("")=0 and DuckDB's unicode('')=-1 — filtering empties makes
      // polyHash("") = seed identically in both engines
      filter(split(s, ""), ch => ch =!= ""),
      lit(seed),
      (acc, ch) => (acc * 31 + ascii(ch)) % 1000000007L)

  /** The DuckDB mirror of [[polyHash]] over a SQL expression. Every oracle
    * that fingerprints text MUST build its SQL through this helper so the
    * two implementations can never drift.
    */
  def polyHashSql(e: String, seed: Long = 7L): String =
    s"list_reduce(list_prepend(CAST($seed AS BIGINT), " +
      s"list_transform(list_filter(string_split($e, ''), c -> c != ''), " +
      "c -> CAST(unicode(c) AS BIGINT))), (a, b) -> (a * 31 + b) % 1000000007)"

  /** Integer fixed-point log2 at scale 4096 — the piecewise-linear
    * approximation log2(n) ≈ (bl−1) + (n − 2^(bl−1))/2^(bl−1) with bl =
    * n's bit length, evaluated ENTIRELY in int64 arithmetic (bit length
    * via the binary-string length — exact in both engines; no float log
    * whose last ulp could differ between libm and DuckDB). Monotonic,
    * exact at powers of two, max error ~0.086 bits — argmax/ranking
    * consumers (q205 NB, q209 BM25) are insensitive at that error, and
    * the scores stay hash-exact across engines. `e` must be ≥ 1.
    * Returns a Spark SQL expression string (use inside `expr`).
    */
  def fplog2Spark(e: String): String = {
    val bl = s"length(bin($e))"
    val p = s"shiftleft(CAST(1 AS BIGINT), $bl - 1)"
    s"(CAST($bl - 1 AS BIGINT) * 4096 + (4096 * (($e) - $p)) div $p)"
  }

  /** DuckDB mirror of [[fplog2Spark]] (binary string via printf('%b')). */
  def fplog2Sql(e: String): String = {
    val bl = s"length(printf('%b', $e))"
    val p = s"(CAST(1 AS BIGINT) << ($bl - 1))"
    s"(CAST($bl - 1 AS BIGINT) * 4096 + (4096 * (($e) - $p)) // $p)"
  }
}
