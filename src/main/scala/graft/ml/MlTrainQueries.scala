package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.util.Det

/** ML training operators — the reference's model-building stage (PPTX
  * slides 13-16: SMOTE oversampling to balance classes, then an SGD
  * classifier) re-expressed as deterministic relational plans:
  *
  *  - q136: SMOTE-style synthetic minority oversampling over `embeddings`.
  *    Neighbor choice and interpolation factors are pure hash arithmetic
  *    (not RNG draws), so the synthesis is reproducible on any cluster —
  *    and, unusually for SMOTE, fully DuckDB-oracle-able.
  *  - q137: a linear classifier trained by batch subgradient descent on
  *    the hinge loss (scikit-learn `SGDClassifier(loss="hinge")`'s
  *    objective — the reference's classifier family) in FIXED-POINT
  *    INTEGER arithmetic (q132 PageRank's recipe): features quantized to
  *    integer grids, weights at scale 1e6, every update a truncating
  *    integer division. Bit-exact in any engine by construction.
  *
  * Scale: q136 is two window passes + an equi-join within class blocks
  * (linear, shuffle on `label`); q137 is K fixed unrolled iterations of
  * one aggregate over the feature frame each — the classic distributed
  * batch-GD shape (gradients are map-side-combined sums; the model is a
  * broadcast 1-row frame, never a shuffle key).
  */
object MlTrainQueries {

  // ---------------------------------------------------------------- q136

  /** SMOTE-style oversampling: every class is brought up to the majority
    * class's size by synthesizing points on line segments between a
    * minority sample and a same-class neighbor: z = x + λ·(y − x).
    *
    * Determinism (vs the textbook algorithm's two RNG draws):
    *  - neighbor: rows are ranked within class by a multiplicative hash of
    *    vec_id; each row's partner is its rank-successor on the hash ring
    *    (cyclic). A kNN neighbor (textbook SMOTE) plugs in via the ANN
    *    family (q47/q48) at the cost of oracle-ability; the hash ring keeps
    *    the "interpolate between same-class points" semantics exact and
    *    SQL-expressible.
    *  - λ: a hash of (source id, duplicate index) mapped to [0, 1) in
    *    thousandths — a deterministic stand-in for U(0,1).
    *
    * Output: the synthesized rows (source, neighbor, duplicate index, the
    * first 4 synthesized coordinates, and the full-vector sequential-fold
    * norm² so all 64 dims are oracle-checked, not just the projection).
    */
  private def q136(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val ranked = e.select(col("vec_id"), col("label"), col("embedding"),
      row_number().over(Window.partitionBy("label")
        .orderBy(pmod(col("vec_id") * 2654435761L, lit(1000000007L)), col("vec_id"))).as("rk"),
      count(lit(1)).over(Window.partitionBy("label")).as("n_c"))
    val mx = broadcast(
      e.groupBy("label").agg(count(lit(1)).as("n")).agg(max("n").as("maxn")))
    // reps = ceil((maxn - n_c) / n_c) = (maxn - 1) div n_c for minority rows
    val src = ranked.crossJoin(mx).filter(col("maxn") > col("n_c"))
      .select(col("vec_id"), col("label"), col("embedding"), col("rk"), col("n_c"),
        (col("maxn") - col("n_c")).as("need"),
        expr("(maxn - 1) div n_c").as("reps"))
    val expanded = src
      .select(col("*"), explode(sequence(lit(1L), col("reps"))).as("k"))
      .filter((col("k") - 1) * col("n_c") + col("rk") <= col("need"))
    val nbr = ranked.select(col("label").as("nbr_label"), col("vec_id").as("nbr_id"),
      col("rk").as("nbr_rk"), col("embedding").as("b"))
    val paired = expanded.join(nbr,
      col("nbr_label") === col("label") &&
        col("nbr_rk") === pmod(col("rk"), col("n_c")) + 1)
      .select(col("label"), col("vec_id").as("src_id"), col("nbr_id"), col("k"),
        (pmod(col("vec_id") * 31 + col("k") * 2654435761L, lit(1000L)).cast("double")
          / lit(1000.0)).as("lam"),
        col("embedding").as("a"), col("b"))
    val synth = paired.select(col("label"), col("src_id"), col("nbr_id"), col("k"),
      zip_with(col("a"), col("b"), (x, y) =>
        x.cast("double") + col("lam") * (y.cast("double") - x.cast("double"))).as("z"))
    synth.select(col("label"), col("src_id"), col("nbr_id"), col("k"),
      element_at(col("z"), 1).as("z0"), element_at(col("z"), 2).as("z1"),
      element_at(col("z"), 3).as("z2"), element_at(col("z"), 4).as("z3"),
      Det.seqNormSq(col("z")).as("znormsq"))
      .orderBy("label", "src_id", "k")
  }

  private val q136Sql =
    """WITH ranked AS (
      |  SELECT vec_id, label, embedding,
      |    row_number() OVER (PARTITION BY label
      |      ORDER BY (vec_id * 2654435761) % 1000000007, vec_id) AS rk,
      |    count(*) OVER (PARTITION BY label) AS n_c
      |  FROM embeddings),
      |mx AS (SELECT max(n) AS maxn FROM (SELECT count(*) AS n FROM embeddings GROUP BY label)),
      |src AS (
      |  SELECT r.vec_id, r.label, r.embedding, r.rk, r.n_c, maxn - n_c AS need,
      |         (maxn - 1) // n_c AS reps
      |  FROM ranked r CROSS JOIN mx WHERE maxn > n_c),
      |expanded AS (
      |  SELECT s.*, k FROM src s, LATERAL (SELECT unnest(range(1, reps + 1)) AS k) t
      |  WHERE (k - 1) * n_c + rk <= need),
      |paired AS (
      |  SELECT e.label, e.vec_id AS src_id, n.vec_id AS nbr_id, CAST(e.k AS BIGINT) AS k,
      |    CAST((e.vec_id * 31 + e.k * 2654435761) % 1000 AS DOUBLE) / 1000.0 AS lam,
      |    e.embedding AS a, n.embedding AS b
      |  FROM expanded e JOIN ranked n ON n.label = e.label AND n.rk = e.rk % e.n_c + 1),
      |synth AS (
      |  SELECT label, src_id, nbr_id, k,
      |    list_transform(list_zip(a, b),
      |      p -> CAST(p[1] AS DOUBLE) + lam * (CAST(p[2] AS DOUBLE) - CAST(p[1] AS DOUBLE))) AS z
      |  FROM paired)
      |SELECT label, src_id, nbr_id, k, z[1] AS z0, z[2] AS z1, z[3] AS z2, z[4] AS z3,
      |  list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(z, x -> x * x)),
      |    (x, y) -> x + y) AS znormsq
      |FROM synth ORDER BY label, src_id, k""".stripMargin

  // ---------------------------------------------------------------- q137

  /** Fixed-point scale for weights (w_int = w · 1e6). */
  private val WScale = 1000000L

  /** Feature scale: quantized features live on a 0..1024 grid, so a unit
    * margin is 1024 · WScale in integer units.
    */
  private val MarginUnit = 1024L * WScale

  private val NumIters = 5

  /** Linear classifier trained by batch subgradient descent on the hinge
    * loss, entirely in integer arithmetic. The task is real (not noise):
    * predict from per-order lineitem aggregates — item count, total
    * quantity, extended-price cents, discount cents — whether the order's
    * total price exceeds 150k. The features are engine-computed (join +
    * exact decimal sums), quantized to a 0..1024 integer grid by integer
    * division, so the whole pipeline — featurize, margin, hinge mask,
    * gradient, update — is closed over the integers: no float op anywhere,
    * hence bit-exact in any engine (q132's fixed-point recipe; Spark `div`
    * and DuckDB `//` both truncate toward zero, verified including
    * negatives).
    *
    * Each of the 5 unrolled iterations is ONE aggregate over the feature
    * frame (partial-aggregated map-side) producing the hinge-active
    * gradient sums; the model is a broadcast single-row frame,
    * localCheckpointed per step to keep the plan flat. lr = 1/2 (validated
    * monotone-decreasing at sf0.001/0.01/0.1). Output: per-iteration rows
    * (iter, hinge loss in margin units, weights) — the training curve
    * itself, so the oracle checks every step of the descent, and
    * MlTrainSpec asserts the loss strictly decreases.
    */
  private def q137(s: SparkSession, d: String): DataFrame = {
    val nf = 5 // 4 quantized features + bias
    val fx = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_totalprice"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("ext"),
        sum(col("l_discount").cast("decimal(18,2)")).as("disc"))
      .select(
        when((col("o_totalprice") * 100).cast("long") > 15000000L, 1L)
          .otherwise(-1L).as("y"),
        expr("n_items * 1024 div 7").as("x0"),
        expr("(cast(qty as bigint) * 1024) div 350").as("x1"),
        expr("(cast(ext * 100 as bigint) * 1024) div 60000000").as("x2"),
        expr("(cast(disc * 100 as bigint) * 1024) div 70").as("x3"),
        lit(1024L).as("x4"))
      .localCheckpoint(true) // 6 aggregate passes read it; cut the join lineage once
    val margin = (0 until nf).map(j => col(s"x$j") * col(s"w$j")).reduce(_ + _)
    var w: DataFrame = s.range(1)
      .select((0 until nf).map(j => lit(0L).as(s"w$j")): _*)
    val rows = Seq.newBuilder[DataFrame]
    for (t <- 0 to NumIters) {
      val scored = fx.crossJoin(broadcast(w))
        .select(col("y") +: (0 until nf).map(j => col(s"x$j")) :+
          (col("y") * margin).as("ym"): _*)
      val aggCols = sum(greatest(lit(0L), lit(MarginUnit) - col("ym"))).as("loss") +:
        (0 until nf).map(j =>
          coalesce(sum(when(col("ym") < MarginUnit, col("y") * col(s"x$j"))), lit(0L))
            .as(s"g$j"))
      val agg = scored.agg(count(lit(1)).as("n"), aggCols: _*)
      // one tiny eager job per step: both consumers (output row + next
      // weights) read the checkpointed 1-row frame, keeping lineage flat
      val step = agg.crossJoin(w).localCheckpoint(true)
      rows += step.select(lit(t.toLong).as("iter") +: col("loss") +:
        (0 until nf).map(j => col(s"w$j")): _*)
      if (t < NumIters)
        w = step.select((0 until nf).map(j =>
          // w += lr·S·Σ_active(y·x_j) / (1024·n), lr = 1/2 ⇒ 2048·n
          (col(s"w$j") + expr(s"($WScale * g$j) div (2048 * n)")).as(s"w$j")): _*)
    }
    rows.result().reduce(_ unionAll _).orderBy("iter")
  }

  private val q137Sql = {
    val nf = 5
    def wCols(p: String) = (0 until nf).map(j => s"$p.w$j").mkString(", ")
    val feats =
      s"""fx AS (
         |  SELECT CASE WHEN CAST(o.o_totalprice * 100 AS BIGINT) > 15000000 THEN 1 ELSE -1 END AS y,
         |    (count(*) * 1024) // 7 AS x0,
         |    (CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS BIGINT) * 1024) // 350 AS x1,
         |    (CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) * 1024) // 60000000 AS x2,
         |    (CAST(sum(CAST(l.l_discount AS DECIMAL(18,2))) * 100 AS BIGINT) * 1024) // 70 AS x3,
         |    CAST(1024 AS BIGINT) AS x4
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |  GROUP BY o.o_orderkey, o.o_totalprice)""".stripMargin
    val w0 = "w0 AS (SELECT " +
      (0 until nf).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ") + ")"
    val ctes = Seq.newBuilder[String]
    ctes += feats
    ctes += w0
    for (t <- 0 to NumIters) {
      val m = (0 until nf).map(j => s"f.x$j*w.w$j").mkString(" + ")
      ctes +=
        s"""a$t AS (
           |  SELECT count(*) AS n, CAST(sum(greatest(0, $MarginUnit - ym)) AS BIGINT) AS loss,
           |    ${(0 until nf).map(j =>
                 s"CAST(coalesce(sum(CASE WHEN ym < $MarginUnit THEN y*x$j END), 0) AS BIGINT) AS g$j")
                 .mkString(",\n    ")}
           |  FROM (SELECT f.*, f.y*($m) AS ym FROM fx f CROSS JOIN w$t w))""".stripMargin
      if (t < NumIters)
        ctes += s"w${t + 1} AS (SELECT ${(0 until nf).map(j =>
          s"w.w$j + ($WScale*a.g$j) // (2048*a.n) AS w$j").mkString(", ")}" +
          s" FROM w$t w CROSS JOIN a$t a)"
    }
    val sel = (0 to NumIters).map(t =>
      s"SELECT CAST($t AS BIGINT) AS iter, a$t.loss, ${wCols(s"w$t")} FROM a$t CROSS JOIN w$t")
      .mkString(" UNION ALL ")
    "WITH " + ctes.result().mkString(",\n") + s"\nSELECT * FROM ($sel) ORDER BY iter"
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q136_smote_oversample", q136, Some(q136Sql),
      "deterministic SMOTE minority oversampling (hash-ring neighbors, full-vector oracle)"),
    QueryDef("q137_hinge_sgd", q137, Some(q137Sql),
      "fixed-point batch-subgradient hinge classifier, 5 unrolled iterations"))
}
