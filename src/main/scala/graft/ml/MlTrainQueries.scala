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
        .orderBy(pmod(pmod(col("vec_id"), lit(1000000007L)) * 2654435761L,
          lit(1000000007L)), col("vec_id"))).as("rk"),
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
        (pmod(pmod(col("vec_id"), lit(1000000007L)) * 31 +
          pmod(col("k"), lit(1000000007L)) * 2654435761L, lit(1000L)).cast("double")
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
      |      ORDER BY ((vec_id % 1000000007) * 2654435761) % 1000000007, vec_id) AS rk,
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
      |    CAST(((e.vec_id % 1000000007) * 31 + (e.k % 1000000007) * 2654435761) % 1000
      |      AS DOUBLE) / 1000.0 AS lam,
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
    * loss, entirely in integer arithmetic: per-order lineitem aggregates
    * (item count, total quantity, extended-price cents, discount cents —
    * engine-computed via join + exact decimal sums) quantized to a
    * centered ±512 integer grid by integer division, against the teacher
    * label of [[featureFrame]]. The whole pipeline — featurize, margin,
    * hinge mask, gradient, update — is closed over the integers: no float
    * op anywhere, hence bit-exact in any engine (q132's fixed-point
    * recipe; Spark `div` and DuckDB `//` both truncate toward zero,
    * verified including negatives).
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
  private val NumFeats = 5 // 4 quantized features + bias

  /** Quantized, centered per-order feature frame (shared by q137/q138),
    * with the q104-style hash split bucket attached. localCheckpointed:
    * up to 9 aggregate passes read it per query; cut the join lineage
    * once.
    *
    * The label is a TEACHER RULE: a fixed linear function of the features
    * (3·x1 − 2·x2 + x0 > −300) with 10% of labels flipped by a
    * deterministic hash — sklearn's `make_classification` recipe, applied
    * relationally. This is deliberate and measured: every cross-column
    * pair in the driver testdata is mutually independent (per-class
    * feature means coincide — checked for totalprice/lineitem sums,
    * lang/text markers, label/embedding, type/value), so NO natural label
    * here is learnable and any trainer would plateau at the majority
    * rate. A known ground truth is the only way to validate end-to-end
    * that the trainer RECOVERS structure and generalizes to held-out
    * rows; on real data the label column simply replaces the teacher
    * expression.
    */
  /** Session-scoped memo for [[featureFrame]] and [[trainedWeights]] —
    * keyed by (applicationId, dataset dir) so entries never cross Spark
    * contexts or datasets. Training is deterministic and the cached frames
    * are localCheckpointed (materialized, lineage-free), so sharing them
    * across q137/q138/q139/q168/q169 cannot change any oracle output; it
    * removes the redundant 8-iteration retrain each evaluation query paid
    * (~12 s of the round-5 bench — VERDICT r5 finding 2).
    */
  private val frameMemo =
    scala.collection.mutable.HashMap.empty[(String, String, String), DataFrame]

  /** Best-effort release of the blocks behind a `localCheckpoint(true)`
    * frame: the checkpointed RDD is the leaf `LogicalRDD`'s rdd.
    * `Dataset.unpersist` cannot reach it (the persistence was applied to
    * the internal RDD, not through the cache manager).
    */
  private def releaseCheckpoint(df: DataFrame): Unit =
    try df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
    } catch { case _: Throwable => () }

  /** Memoize under a lock (a bare getOrElseUpdate can run `build` — an
    * 8-iteration training job — twice under concurrent first calls), and
    * bound the memo to ONE (app, dataset) at a time: on a dataset switch
    * the previous dataset's checkpointed frames are evicted AND their
    * blocks released, so a long-lived session walking many datasets holds
    * at most one dataset's worth of checkpoint blocks (ADVICE r6).
    * The lock is reentrant, so `trainedWeights`' build calling
    * [[featureFrame]] (which re-enters memo) is safe.
    */
  private def memo(s: SparkSession, d: String, what: String)(
      build: => DataFrame): DataFrame = frameMemo.synchronized {
    val key = (s.sparkContext.applicationId, d, what)
    frameMemo.getOrElse(key, {
      val stale = frameMemo.keySet.filterNot(k => k._1 == key._1 && k._2 == key._2)
      stale.toList.foreach(k => frameMemo.remove(k).foreach(releaseCheckpoint))
      val df = build
      frameMemo.put(key, df)
      df
    })
  }

  private def featureFrame(s: SparkSession, d: String): DataFrame =
    memo(s, d, "feats")(featureFrameBuild(s, d))

  private def featureFrameBuild(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("ext"),
        sum(col("l_discount").cast("decimal(18,2)")).as("disc"))
      .select(
        col("o_orderkey"),
        expr("n_items * 1024 div 7 - 512").as("x0"),
        expr("(cast(qty as bigint) * 1024) div 350 - 512").as("x1"),
        expr("(cast(ext * 100 as bigint) * 1024) div 60000000 - 512").as("x2"),
        expr("(cast(disc * 100 as bigint) * 1024) div 70 - 512").as("x3"))
      .select(
        col("o_orderkey"),
        // pre-mod before the multiply: the q156/q104 int64-overflow guard
        pmod(pmod(col("o_orderkey"), lit(1000000007L)) * 2654435761L,
          lit(100L)).as("bkt"),
        when((col("x1") * 3 - col("x2") * 2 + col("x0") > -300) =!=
          (pmod(col("o_orderkey") * 7919L, lit(10L)) === 0), 1L)
          .otherwise(-1L).as("y"),
        col("x0"), col("x1"), col("x2"), col("x3"), lit(1024L).as("x4"))
      .localCheckpoint(true)

  private def marginExpr = (0 until NumFeats)
    .map(j => col(s"x$j") * col(s"w$j")).reduce(_ + _)

  /** One training step: aggregate hinge loss + active-gradient sums of
    * `fx` under the broadcast 1-row weights frame `w`, returning the
    * checkpointed 1-row (n, loss, g0..g4, w0..w4) frame. Checkpointing
    * keeps lineage flat — both consumers (curve row, next weights) read
    * the tiny materialized row, not the aggregate's plan.
    */
  private def trainStep(fx: DataFrame, w: DataFrame): DataFrame = {
    val scored = fx.crossJoin(broadcast(w))
      .select(col("y") +: (0 until NumFeats).map(j => col(s"x$j")) :+
        (col("y") * marginExpr).as("ym"): _*)
    val aggCols = sum(greatest(lit(0L), lit(MarginUnit) - col("ym"))).as("loss") +:
      (0 until NumFeats).map(j =>
        coalesce(sum(when(col("ym") < MarginUnit, col("y") * col(s"x$j"))), lit(0L))
          .as(s"g$j"))
    scored.agg(count(lit(1)).as("n"), aggCols: _*)
      .crossJoin(w).localCheckpoint(true)
  }

  /** w += lr·S·Σ_active(y·x_j) / (1024·n) with lr = lrNum/lrDen. */
  private def updateWeights(step: DataFrame, lrNum: Int, lrDen: Int): DataFrame =
    step.select((0 until NumFeats).map(j =>
      (col(s"w$j") +
        expr(s"($lrNum * $WScale * g$j) div ($lrDen * 1024 * n)")).as(s"w$j")): _*)

  private def zeroWeights(s: SparkSession): DataFrame =
    s.range(1).select((0 until NumFeats).map(j => lit(0L).as(s"w$j")): _*)

  /** The [[EvalIters]]-step (lr = 1) weights trained on the bkt < 80 split
    * — the model every evaluation query (q138 confusion matrix, q139 AUC,
    * q168 slices, q169 calibration) scores with. Memoized per session ×
    * dataset; the result is an eagerly checkpointed 1-row frame.
    */
  private def trainedWeights(s: SparkSession, d: String): DataFrame =
    memo(s, d, "weights") {
      val train = featureFrame(s, d).filter(col("bkt") < 80)
      var w = zeroWeights(s)
      for (_ <- 1 to EvalIters) w = updateWeights(trainStep(train, w), 1, 1)
      w.localCheckpoint(true)
    }

  private def q137(s: SparkSession, d: String): DataFrame = {
    val fx = featureFrame(s, d)
    var w = zeroWeights(s)
    val rows = Seq.newBuilder[DataFrame]
    for (t <- 0 to NumIters) {
      val step = trainStep(fx, w)
      rows += step.select(lit(t.toLong).as("iter") +: col("loss") +:
        (0 until NumFeats).map(j => col(s"w$j")): _*)
      if (t < NumIters) w = updateWeights(step, 1, 2)
    }
    rows.result().reduce(_ unionAll _).orderBy("iter")
  }

  /** Shared DuckDB mirror of [[featureFrame]]. */
  private val featsSql =
    s"""fx AS MATERIALIZED (
       |  SELECT o.o_orderkey, ((o.o_orderkey % 1000000007) * 2654435761) % 100 AS bkt,
       |    CASE WHEN (3*x1 - 2*x2 + x0 > -300) != ((o.o_orderkey * 7919) % 10 = 0)
       |         THEN 1 ELSE -1 END AS y,
       |    x0, x1, x2, x3, CAST(1024 AS BIGINT) AS x4
       |  FROM (
       |    SELECT o_orderkey,
       |      (count(*) * 1024) // 7 - 512 AS x0,
       |      (CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS BIGINT) * 1024) // 350 - 512 AS x1,
       |      (CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) * 1024) // 60000000 - 512 AS x2,
       |      (CAST(sum(CAST(l.l_discount AS DECIMAL(18,2))) * 100 AS BIGINT) * 1024) // 70 - 512 AS x3
       |    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |    GROUP BY o.o_orderkey) o)""".stripMargin

  private val zeroWSql = "w0 AS MATERIALIZED (SELECT " +
    (0 until NumFeats).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ") + ")"

  private def marginSql = (0 until NumFeats).map(j => s"f.x$j*w.w$j").mkString(" + ")

  /** One training-iteration CTE pair (aggregate a_t, weights w_{t+1}). */
  private def iterSql(t: Int, src: String, lrNum: Int, lrDen: Int,
      withLoss: Boolean, emitNext: Boolean): Seq[String] = {
    val loss =
      if (withLoss) s" CAST(sum(greatest(0, $MarginUnit - ym)) AS BIGINT) AS loss," else ""
    val a =
      s"""a$t AS MATERIALIZED (
         |  SELECT count(*) AS n,$loss
         |    ${(0 until NumFeats).map(j =>
               s"CAST(coalesce(sum(CASE WHEN ym < $MarginUnit THEN y*x$j END), 0) AS BIGINT) AS g$j")
               .mkString(",\n    ")}
         |  FROM (SELECT f.*, f.y*($marginSql) AS ym FROM $src f CROSS JOIN w$t w))""".stripMargin
    val w =
      s"w${t + 1} AS MATERIALIZED (SELECT ${(0 until NumFeats).map(j =>
        s"w.w$j + ($lrNum*$WScale*a.g$j) // ($lrDen*1024*a.n) AS w$j").mkString(", ")}" +
        s" FROM w$t w CROSS JOIN a$t a)"
    if (emitNext) Seq(a, w) else Seq(a)
  }

  private val q137Sql = {
    def wCols(p: String) = (0 until NumFeats).map(j => s"$p.w$j").mkString(", ")
    val ctes = Seq.newBuilder[String]
    ctes += featsSql
    ctes += zeroWSql
    for (t <- 0 to NumIters)
      ctes ++= iterSql(t, "fx", 1, 2, withLoss = true, emitNext = t < NumIters)
    val sel = (0 to NumIters).map(t =>
      s"SELECT CAST($t AS BIGINT) AS iter, a$t.loss, ${wCols(s"w$t")} FROM a$t CROSS JOIN w$t")
      .mkString(" UNION ALL ")
    "WITH " + ctes.result().mkString(",\n") + s"\nSELECT * FROM ($sel) ORDER BY iter"
  }

  // ---------------------------------------------------------------- q138

  private val EvalIters = 8

  /** Held-out model evaluation — the reference's "validation accuracy"
    * metric (PPTX slide 16) as an engine operator: train the fixed-point
    * hinge classifier on the hash-split train partition (o_orderkey
    * buckets 0-79, q104's split recipe; lr = 1, 8 iterations), score the
    * held-out 20%, and emit the confusion matrix (y, pred, n).
    * Prediction is an integer sign test on the margin — the whole
    * train→score→evaluate pipeline stays closed over the integers, so
    * the entire learning outcome is hash-oracled, and MlTrainSpec
    * asserts the held-out accuracy beats the always-majority baseline by
    * a clear margin (validated at sf0.001/0.01/0.1: ~0.65-0.67 vs
    * ~0.51-0.53 majority against the 10%-noise teacher).
    *
    * Scale: scoring is a shuffle-free broadcast of the 1-row model over
    * the test scan; the confusion matrix is a 4-group aggregate.
    */
  private def q138(s: SparkSession, d: String): DataFrame = {
    val fx = featureFrame(s, d)
    val w = trainedWeights(s, d)
    fx.filter(col("bkt") >= 80).crossJoin(broadcast(w))
      .select(col("y"),
        when(marginExpr > 0, 1L).otherwise(-1L).as("pred"))
      .groupBy("y", "pred").agg(count(lit(1)).as("n"))
      .orderBy("y", "pred")
  }

  private val q138Sql = {
    val ctes = Seq.newBuilder[String]
    ctes += featsSql
    ctes += "tr AS MATERIALIZED (SELECT * FROM fx WHERE bkt < 80)"
    ctes += zeroWSql
    for (t <- 0 until EvalIters)
      ctes ++= iterSql(t, "tr", 1, 1, withLoss = false, emitNext = true)
    "WITH " + ctes.result().mkString(",\n") +
      s"""
         |SELECT CAST(y AS BIGINT) AS y, CAST(pred AS BIGINT) AS pred, count(*) AS n FROM (
         |  SELECT f.y, CASE WHEN ($marginSql) > 0 THEN 1 ELSE -1 END AS pred
         |  FROM fx f CROSS JOIN w$EvalIters w WHERE f.bkt >= 80)
         |GROUP BY y, pred ORDER BY y, pred""".stripMargin
  }

  // ---------------------------------------------------------------- q139

  /** Exact ROC-AUC of the trained classifier on the held-out split —
    * the threshold-free companion to q138's accuracy, computed as the
    * Mann-Whitney U statistic over the INTEGER margins:
    *
    *   AUC = (Σ_pos avg_rank − n⁺(n⁺+1)/2) / (n⁺·n⁻)
    *
    * with tie groups (equal margins) taking the average rank. Everything
    * stays integer until the final division: per margin-group
    * cumulative counts give lo/hi rank bounds, a tie group's summed
    * positive ranks are pos_cnt·(lo+hi)/2, and doubling through the
    * algebra clears the halves — so auc_num/auc_den are exact BIGINTs
    * and the emitted double is one deterministic division. Scale: one
    * narrow aggregate by margin + one running-sum window over the
    * distinct margins (here a single ordered pass; at 100 TB swap in
    * q90's two-level global-rank recipe), then a single-row reduce.
    */
  private def q139(s: SparkSession, d: String): DataFrame = {
    val fx = featureFrame(s, d)
    val w = trainedWeights(s, d)
    val scored = fx.filter(col("bkt") >= 80).crossJoin(broadcast(w))
      .select(col("y"), marginExpr.as("m"))
    val groups = scored.groupBy("m").agg(
      count(lit(1)).as("cnt"),
      coalesce(sum(when(col("y") === 1, 1L)), lit(0L)).as("pos"))
    val win = Window.orderBy("m")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = groups.select(col("cnt"), col("pos"),
      sum(col("cnt")).over(win).as("hi"))
      .select(col("pos"),
        // 2·Σ ranks of this group's positives = pos·(lo+hi), lo = hi−cnt+1
        (col("pos") * (col("hi") * 2 - col("cnt") + 1)).as("r2"))
    ranked.agg(
      coalesce(sum("pos"), lit(0L)).as("np"),
      coalesce(sum("r2"), lit(0L)).as("sum2"))
      .crossJoin(broadcast(scored.agg(count(lit(1)).as("n"))))
      .select(col("np"), (col("n") - col("np")).as("nn"),
        (col("sum2") - col("np") * (col("np") + 1)).as("auc_num"),
        (col("np") * (col("n") - col("np")) * 2).as("auc_den"))
      .select(col("np"), col("nn"), col("auc_num"), col("auc_den"),
        (col("auc_num").cast("double") / col("auc_den")).as("auc"))
  }

  private val q139Sql = {
    val ctes = Seq.newBuilder[String]
    ctes += featsSql
    ctes += "tr AS MATERIALIZED (SELECT * FROM fx WHERE bkt < 80)"
    ctes += zeroWSql
    for (t <- 0 until EvalIters)
      ctes ++= iterSql(t, "tr", 1, 1, withLoss = false, emitNext = true)
    "WITH " + ctes.result().mkString(",\n") +
      s""",
         |scored AS (
         |  SELECT f.y, ($marginSql) AS m
         |  FROM fx f CROSS JOIN w$EvalIters w WHERE f.bkt >= 80),
         |grp AS (
         |  SELECT m, count(*) AS cnt,
         |    CAST(coalesce(sum(CASE WHEN y = 1 THEN 1 END), 0) AS BIGINT) AS pos
         |  FROM scored GROUP BY m),
         |rk AS (
         |  SELECT pos, pos * (2 * sum(cnt) OVER (ORDER BY m
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt + 1) AS r2
         |  FROM grp),
         |agg AS (
         |  SELECT CAST(coalesce(sum(pos), 0) AS BIGINT) AS np,
         |    CAST(coalesce(sum(r2), 0) AS BIGINT) AS sum2,
         |    (SELECT count(*) FROM scored) AS n
         |  FROM rk)
         |SELECT np, CAST(n - np AS BIGINT) AS nn,
         |  CAST(sum2 - np * (np + 1) AS BIGINT) AS auc_num,
         |  CAST(np * (n - np) * 2 AS BIGINT) AS auc_den,
         |  CAST(sum2 - np * (np + 1) AS DOUBLE) / (np * (n - np) * 2) AS auc
         |FROM agg""".stripMargin
  }

  // ---------------------------------------------------------------- q168

  /** Sliced model evaluation — q138's held-out accuracy broken out by a
    * data slice (order priority): the responsible-AI practice of never
    * shipping a model on one aggregate number, because a model that is
    * 66% overall and 45% on one slice is broken. Same trained weights,
    * same integer sign-test predictions; one extra broadcast-joined
    * slice column and a (slice) group. MlTrainSpec asserts the weighted
    * slice accuracies recompose exactly to q138's confusion matrix.
    *
    * Scale: identical to q138 (shuffle-free broadcast scoring) plus one
    * join to the orders dimension on the already-carried key; the
    * output is slice-cardinality rows.
    */
  private def q168(s: SparkSession, d: String): DataFrame = {
    val fx = featureFrame(s, d)
    val w = trainedWeights(s, d)
    val slices = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
    fx.filter(col("bkt") >= 80).crossJoin(broadcast(w))
      .select(col("o_orderkey"), col("y"),
        when(marginExpr > 0, 1L).otherwise(-1L).as("pred"))
      .join(slices, "o_orderkey")
      .groupBy(col("o_orderpriority").as("slice"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("y") === col("pred"), 1L)), lit(0L)).as("correct"))
      .select(col("slice"), col("n"), col("correct"),
        expr("correct * 10000 div n").as("accuracy_fp"))
      .orderBy("slice")
  }

  private val q168Sql = {
    val ctes = Seq.newBuilder[String]
    ctes += featsSql
    ctes += "tr AS MATERIALIZED (SELECT * FROM fx WHERE bkt < 80)"
    ctes += zeroWSql
    for (t <- 0 until EvalIters)
      ctes ++= iterSql(t, "tr", 1, 1, withLoss = false, emitNext = true)
    "WITH " + ctes.result().mkString(",\n") +
      s""",
         |scored AS (
         |  SELECT f.o_orderkey, f.y,
         |    CASE WHEN ($marginSql) > 0 THEN 1 ELSE -1 END AS pred
         |  FROM fx f CROSS JOIN w$EvalIters w WHERE f.bkt >= 80)
         |SELECT o.o_orderpriority AS slice, count(*) AS n,
         |  CAST(coalesce(sum(CASE WHEN s.y = s.pred THEN 1 END), 0) AS BIGINT)
         |    AS correct,
         |  CAST(coalesce(sum(CASE WHEN s.y = s.pred THEN 1 END), 0) * 10000
         |    // count(*) AS BIGINT) AS accuracy_fp
         |FROM scored s JOIN orders o ON s.o_orderkey = o.o_orderkey
         |GROUP BY o.o_orderpriority ORDER BY slice""".stripMargin
  }

  // ---------------------------------------------------------------- q169

  /** Margin calibration report — the reliability-diagram companion to
    * q138/q139: bucket held-out margins into fixed margin-unit bins
    * (clamped to ±5 units) and report each bin's empirical positive
    * rate. A usable classifier shows the rate rising with the margin —
    * the property that makes a margin threshold meaningful as a
    * confidence knob (MlTrainSpec asserts top-bin rate ≥ bottom-bin
    * rate + 0.3 and that bins recompose to the full held-out count).
    * The bin id is a clamped integer division — no float op anywhere,
    * so the whole report hash-matches.
    *
    * Scale: q138's shuffle-free scoring plus one tiny (bin) aggregate;
    * output is ≤ 11 rows at any corpus size.
    */
  private def q169(s: SparkSession, d: String): DataFrame = {
    val fx = featureFrame(s, d)
    val w = trainedWeights(s, d)
    fx.filter(col("bkt") >= 80).crossJoin(broadcast(w))
      .select(col("y"), marginExpr.as("m"))
      // integer div (truncating, like DuckDB //) — Column./ would be FP
      .select(col("y"),
        least(greatest(expr(s"m div $MarginUnit"), lit(-5L)), lit(5L)).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("y") === 1, 1L)), lit(0L)).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("n_pos * 10000 div n").as("pos_rate_fp"))
      .orderBy("bin")
  }

  private val q169Sql = {
    val ctes = Seq.newBuilder[String]
    ctes += featsSql
    ctes += "tr AS MATERIALIZED (SELECT * FROM fx WHERE bkt < 80)"
    ctes += zeroWSql
    for (t <- 0 until EvalIters)
      ctes ++= iterSql(t, "tr", 1, 1, withLoss = false, emitNext = true)
    "WITH " + ctes.result().mkString(",\n") +
      s""",
         |scored AS (
         |  SELECT f.y,
         |    least(greatest(($marginSql) // $MarginUnit, -5), 5) AS bin
         |  FROM fx f CROSS JOIN w$EvalIters w WHERE f.bkt >= 80)
         |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n,
         |  CAST(coalesce(sum(CASE WHEN y = 1 THEN 1 END), 0) AS BIGINT) AS n_pos,
         |  CAST(coalesce(sum(CASE WHEN y = 1 THEN 1 END), 0) * 10000
         |    // count(*) AS BIGINT) AS pos_rate_fp
         |FROM scored GROUP BY bin ORDER BY bin""".stripMargin
  }

  // ---------------------------------------------------------------- q205

  // fixed-point log2 shared with q209 BM25 — see graft.util.Det
  private def fplogSpark(e: String): String = Det.fplog2Spark(e)
  private def fplogSql(e: String): String = Det.fplog2Sql(e)

  /** Multinomial Naive Bayes language classifier — TRAINED FROM THE DATA
    * (the fastText/CCNet-style learned quality-and-language classifier
    * family; complements q35's fixed n-gram heuristic and q153's
    * pinned-weight scorer, which never train). One declarative plan does
    * both stages:
    *
    *  - TRAIN (docs with doc_id%5 < 4): per-(lang, word) counts, per-lang
    *    token totals and doc priors, vocabulary size — Laplace(+1)
    *    smoothing. These are vocabulary-scale aggregates: ONE shuffle on
    *    (lang, word), then the model is a small frame.
    *  - APPLY (held-out docs): score(c, d) = fplog(docs_c)
    *    + Σ_w cnt_dw·fplog(n_cw+1) − n_d·fplog(tot_c+V), argmax over
    *    classes (ties → lexicographically first class). The model, class
    *    priors, and vocab count are BROADCAST — scoring a 100 TB corpus
    *    shuffles only (doc_id, word) counts, never the model.
    *
    * All arithmetic is [[fplogSpark]] int64 fixed point, so the emitted
    * score column is hash-exact against the DuckDB mirror.
    */
  private def q205(s: SparkSession, d: String): DataFrame =
    nbClassify(Tables.documents(s, d))

  /** q205's core on an injectable (doc_id, lang, text) frame — exposed so
    * MlTrainSpec can prove the LEARNING mechanics on a corpus whose class
    * vocabularies are actually separable (the driver testdata's `lang`
    * labels are independent of its synthetic text, so there the held-out
    * accuracy is necessarily ≈ the class prior — the oracle checks engine
    * parity, the spec checks that the classifier classifies).
    */
  private[graft] def nbClassify(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("lang"),
        explode(graft.clean.TextOps.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
    val tr = toks.filter(col("doc_id") % 5 < 4)
    val te = toks.filter(col("doc_id") % 5 === 4)
    val model = tr.groupBy("lang", "word").agg(count(lit(1)).as("n_cw"))
    val tot = tr.groupBy("lang").agg(count(lit(1)).as("tot_c"))
    val pri = docs.filter(col("doc_id") % 5 < 4)
      .groupBy("lang").agg(count(lit(1)).as("docs_c"))
    val vocab = tr.agg(countDistinct(col("word")).as("vocab"))
    val twc = te.groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
    val tn = te.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    val tdocs = docs.filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"), col("lang").as("actual"))
    val contrib = twc
      .crossJoin(broadcast(pri.select(col("lang"))))
      .join(broadcast(model), Seq("lang", "word"), "left")
      .withColumn("t",
        expr(s"cnt * ${fplogSpark("coalesce(n_cw, CAST(0 AS BIGINT)) + 1")}"))
      .groupBy("doc_id", "lang").agg(sum(col("t")).as("s"))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("lang"))
    tdocs
      .crossJoin(broadcast(pri))
      .join(broadcast(tot), Seq("lang"))
      .crossJoin(broadcast(vocab))
      .join(contrib, Seq("doc_id", "lang"), "left")
      .join(tn, Seq("doc_id"), "left")
      .withColumn("score", expr(
        s"${fplogSpark("docs_c")} + coalesce(s, CAST(0 AS BIGINT)) " +
          s"- coalesce(n_tok, CAST(0 AS BIGINT)) * ${fplogSpark("tot_c + vocab")}"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("predicted"), col("actual"),
        (col("lang") === col("actual")).as("correct"), col("score"))
      .orderBy("doc_id")
  }

  private val q205Sql = {
    val contribLog = fplogSql("coalesce(m.n_cw, 0) + 1")
    s"""WITH toks AS (
       |  SELECT doc_id, lang, w AS word
       |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
       |        FROM documents) t
       |  WHERE w != ''),
       |tr AS (SELECT * FROM toks WHERE doc_id % 5 < 4),
       |te AS (SELECT * FROM toks WHERE doc_id % 5 = 4),
       |model AS (SELECT lang, word, CAST(count(*) AS BIGINT) AS n_cw
       |          FROM tr GROUP BY lang, word),
       |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS tot_c
       |        FROM tr GROUP BY lang),
       |pri AS (SELECT lang, CAST(count(*) AS BIGINT) AS docs_c
       |        FROM documents WHERE doc_id % 5 < 4 GROUP BY lang),
       |v AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS vocab FROM tr),
       |twc AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cnt
       |        FROM te GROUP BY doc_id, word),
       |tn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok
       |       FROM te GROUP BY doc_id),
       |tdocs AS (SELECT doc_id, lang AS actual FROM documents
       |          WHERE doc_id % 5 = 4),
       |contrib AS (
       |  SELECT t.doc_id, c.lang,
       |    CAST(sum(t.cnt * $contribLog) AS BIGINT) AS s
       |  FROM twc t CROSS JOIN (SELECT lang FROM pri) c
       |  LEFT JOIN model m ON m.lang = c.lang AND m.word = t.word
       |  GROUP BY t.doc_id, c.lang),
       |sc AS (
       |  SELECT d.doc_id, d.actual, p.lang,
       |    ${fplogSql("p.docs_c")} + coalesce(ct.s, 0)
       |      - coalesce(tn.n_tok, 0) * ${fplogSql("tot.tot_c + v.vocab")} AS score
       |  FROM tdocs d CROSS JOIN pri p
       |  JOIN tot ON tot.lang = p.lang CROSS JOIN v
       |  LEFT JOIN contrib ct ON ct.doc_id = d.doc_id AND ct.lang = p.lang
       |  LEFT JOIN tn ON tn.doc_id = d.doc_id),
       |rk AS (SELECT *, row_number() OVER
       |         (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
       |       FROM sc)
       |SELECT doc_id, lang AS predicted, actual, (lang = actual) AS correct,
       |  CAST(score AS BIGINT) AS score
       |FROM rk WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q205_naive_bayes", q205, Some(q205Sql),
      "multinomial Naive Bayes language classifier trained from the corpus (Laplace smoothing, int64 fixed-point log scores, broadcast model apply)"),
    QueryDef("q168_sliced_eval", q168, Some(q168Sql),
      "held-out accuracy sliced by order priority (no single-number model acceptance)"),
    QueryDef("q169_calibration", q169, Some(q169Sql),
      "margin-bin calibration report (empirical positive rate per margin unit)"),
    QueryDef("q136_smote_oversample", q136, Some(q136Sql),
      "deterministic SMOTE minority oversampling (hash-ring neighbors, full-vector oracle)"),
    QueryDef("q137_hinge_sgd", q137, Some(q137Sql),
      "fixed-point batch-subgradient hinge classifier, 5 unrolled iterations"),
    QueryDef("q138_model_eval", q138, Some(q138Sql),
      "held-out confusion matrix of the fixed-point hinge classifier (slide-16 validation accuracy)"),
    QueryDef("q139_auc", q139, Some(q139Sql),
      "exact tie-aware ROC-AUC (Mann-Whitney) of the classifier on held-out margins"))
}
