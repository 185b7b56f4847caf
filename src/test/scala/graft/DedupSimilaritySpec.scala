package graft

import org.scalatest.funsuite.AnyFunSuite

class DedupSimilaritySpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("PassJoin pigeonhole (q59): every 16-char pair with lev<=3 shares a segment key") {
    // the q59 candidate filter in pure form: a-side keys are the 4 fixed
    // 4-char segments; b-side keys are 4-grams starting within +-3 of the
    // segment's home position. The pigeonhole argument says lev<=3 implies
    // a shared key — fuzz it with adversarial small-alphabet edits.
    def segKeys(s: String): Set[(Int, String)] =
      (0 until 4).map(g => g -> s.substring(4 * g, 4 * g + 4)).toSet
    def winKeys(s: String): Set[(Int, String)] =
      (0 until 4).flatMap { g =>
        (math.max(0, 4 * g - 3) to math.min(12, 4 * g + 3)).map(p =>
          g -> s.substring(p, p + 4))
      }.toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(11)
    def randChar = ('a' + rnd.nextInt(3)).toChar // tiny alphabet: hardest case
    var checked = 0
    (1 to 3000).foreach { _ =>
      val base = List.fill(24)(randChar).mkString
      // <=3 random edits on the underlying text, then re-take 16 chars
      var t = base
      (1 to rnd.nextInt(4)).foreach { _ =>
        val i = rnd.nextInt(t.length)
        t = rnd.nextInt(3) match {
          case 0 => t.updated(i, randChar)
          case 1 => t.take(i) + randChar + t.drop(i)
          case 2 if t.length > 17 => t.take(i) + t.drop(i + 1)
          case _ => t
        }
      }
      val (a, b) = (base.take(16), t.take(16))
      if (lev(a, b) <= 3) {
        checked += 1
        assert(segKeys(a).intersect(winKeys(b)).nonEmpty,
          s"filter would miss: a=$a b=$b lev=${lev(a, b)}")
      }
    }
    assert(checked > 1000, s"generator produced too few qualifying pairs: $checked")
  }

  test("q81 pigeonhole: hamming<=1 pairs always collide in a half, and are emitted once") {
    val rnd = new scala.util.Random(5)
    (1 to 2000).foreach { _ =>
      val x = rnd.nextLong() & 0xFFFFFFFFL
      val y = if (rnd.nextBoolean()) x else x ^ (1L << rnd.nextInt(32))
      val lowMatch = (x & 0xFFFFL) == (y & 0xFFFFL)
      val highMatch = (x >> 16) == (y >> 16)
      assert(lowMatch || highMatch) // recall: at least one bucket shared
      // canonical-discovery: block-0 hit kept always; block-1 hit kept only
      // when the low halves differ → exactly one emission
      val emissions = (if (lowMatch) 1 else 0) + (if (highMatch && !lowMatch) 1 else 0)
      assert(emissions == 1)
    }
  }

  test("minhash LSH candidates are a high-recall, zero-false-positive " +
    "subset of the exact jaccard answer") {
    val exact = Registry.queries("q42_jaccard_pairs")(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Registry.queries("q44_minhash_lsh")(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH+verify must never emit a non-duplicate pair")
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, f"LSH recall $recall%.3f below 0.9")
  }

  test("ann brute force: 5 neighbors per query, ranks 1..5, cos in [-1,1]") {
    val rows = Registry.queries("q47_ann_bruteforce")(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 20)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      val coss = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b }, "ranked by cos desc")
      assert(coss.forall(c => c >= -1.0 && c <= 1.0))
    }
  }

  test("partitioned ann is consistent with brute force where partitions agree") {
    // every partitioned neighbor must appear no higher-ranked in brute
    // force than a same-label candidate it beat — weak sanity: top-1 of
    // the partitioned variant has cos <= brute-force top-1
    val bf = Registry.queries("q47_ann_bruteforce")(spark, sf).collect()
      .filter(_.getLong(3) == 1L).map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val pt = Registry.queries("q48_ann_partitioned")(spark, sf).collect()
      .filter(_.getLong(3) == 1L).map(r => r.getLong(0) -> r.getDouble(2)).toMap
    pt.foreach { case (q, c) => assert(c <= bf(q) + 1e-15) }
  }

  test("RP-LSH near-dup: perfect precision after verify, high recall vs exact") {
    // q46 is label-BLOCKED; RP-LSH is global, so the reference here is an
    // unblocked driver-side brute force with the same sequential fold
    // arithmetic (bit-identical to the engine's cosine)
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toSeq.sorted
    val exact = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      if cos(vecs(ids(i)), vecs(ids(j))) >= 0.4
    } yield (ids(i), ids(j))).toSet
    val lsh = Registry.queries("q80_ann_rplsh")(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact).take(5)}")
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.6, f"RP-LSH recall $recall%.2f below 0.6 (${exact.size} exact pairs)")
    }
  }

  test("dup clustering: CC labels are component minima and cover every doc") {
    val pairs = Registry.queries("q42_jaccard_pairs")(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Registry.queries("q58_dup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nDocs = Registry.queries("q41_dedup_exact")(spark, sf).count()
    // partition covers every doc exactly once
    assert(clusters.values.sum == nDocs)
    // reference CC via union-find on the driver
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.toSeq.map(find).distinct
      .map(root => root -> parent.keys.count(k => find(k) == root))
    expected.foreach { case (root, size) =>
      // every non-singleton component appears with min-id label + exact size
      val canonical = parent.keys.filter(k => find(k) == root).min
      assert(clusters.get(canonical).contains(size.toLong),
        s"component $canonical expected size $size, got ${clusters.get(canonical)}")
    }
  }

  test("simhash: near-identical token sets give near hamming distance") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // build two docs sharing 19/20 tokens and one disjoint doc
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val near = (1 to 19).map(i => s"tok$i").mkString(" ") + " other"
    val far = (1 to 20).map(i => s"zzz$i").mkString(" ")
    val df = Seq((0L, base), (1L, near), (2L, far)).toDF("doc_id", "text")
    df.createOrReplaceTempView("documents_simhash_test")
    // reuse the production expression by running q45's plan over a temp
    // stand-in: simplest is recomputing via the registry over a temp dir —
    // instead compute hamming on polyHash-based simhash directly
    val hashes = transform(array_distinct(split(col("text"), " ")),
      t => graft.util.Det.polyHash(t))
    val simhash = (0 until 32).map { i =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, i).bitwiseAND(lit(1L)) * 2 - 1))
      when(vote >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val out = df.select(col("doc_id"), simhash.as("sh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(out(0L), out(1L)) < hamming(out(0L), out(2L)),
      "near-dup pair must be closer in hamming space than unrelated pair")
  }

  test("q129 streaming LSH filter is batch-boundary independent") {
    def run(n: Int) = graft.dedup.DedupQueries.q129WithSlices(spark, sf, n)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    val threeBatches = run(3)
    val oneBatch = run(1) // degenerate: everything in a single micro-batch
    assert(threeBatches == oneBatch)
    // sanity: at least one accept, and doc 0 (first arrival) always accepted
    assert(threeBatches.head == (0L -> true))
    assert(threeBatches.exists(!_._2) || threeBatches.forall(_._2))
  }

  test("jaccardPairs skew guard: capped routing is output-identical and candidate-bounded") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // synthetic skewed corpus, ONE block of 200 docs: 20 near-dups (token
    // sets pairwise J = 38/42 ≈ 0.905) + 180 mutually disjoint docs — the
    // "one language dominates the crawl" shape the BlockCap guards against
    val nearDup = (0 until 20).map { i =>
      (i.toLong, "xx", ((0L until 40L).filter(_ != i.toLong) :+ (1000L + i)).sorted)
    }
    val diverse = (20 until 200).map { i =>
      (i.toLong, "xx", (0L until 40L).map(10000L + 100L * i + _).sorted)
    }
    val docs = (nearDup ++ diverse).toDF("doc_id", "lang", "arr")
    def run(cap: Int) =
      graft.dedup.DedupQueries.jaccardPairs(docs, 9, 10, cap, Some(docs.select("lang")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val capped = run(50)      // block of 200 > 50 → prefix-posting path
    val uncapped = run(1000000) // all-pairs path
    assert(capped == uncapped, "routing must not change results")
    assert(capped.length == 20 * 19 / 2, "all near-dup pairs found, none else")
    // the guard's point: candidates ∝ near-dup mass, not block², on a
    // skewed-but-diverse block (all-pairs would materialize 19,900 pairs)
    val cands = graft.dedup.DedupQueries.prefixCandidates(
      docs.withColumn("n_blk", lit(200L)), 9, 10).count()
    assert(cands <= 250, s"prefix filter must bound candidates, got $cands")
  }

  test("jaccardPairs capped path: exact-content collapse expands to the full pair list") {
    import spark.implicits._
    // duplicate-HEAVY corpus (the shape the collapse exists for): 5
    // content groups × 4 exact copies each, groups 0/1 near-dup to each
    // other (J = 39/41 ≈ 0.951), groups 2-4 mutually disjoint, plus 10
    // singletons. Copy ids INTERLEAVED so group representatives (min id)
    // aren't contiguous. Exercises intra-group expansion (J = 1 pairs),
    // cross-group expansion (rep-pair stats inherited by all member
    // pairs), and the least/greatest orientation.
    val bases: Seq[Seq[Long]] = Seq(
      (0L until 40L),
      (1L until 40L) :+ 1000L,
      (2000L until 2040L),
      (3000L until 3040L),
      (4000L until 4040L)).map(_.sorted.toSeq)
    val copies = for (c <- 0 until 4; g <- 0 until 5)
      yield ((c * 5 + g).toLong, "xx", bases(g))
    val singles = (20 until 30).map(i =>
      (i.toLong, "xx", (50000L + 100L * i until 50040L + 100L * i).toSeq))
    val docs = (copies ++ singles).toDF("doc_id", "lang", "arr")
    val all = (copies ++ singles).map(t => t._1 -> t._3.toSet).toMap
    val expected = (for {
      a <- all.keys; b <- all.keys if a < b
      inter = (all(a) & all(b)).size
      union = (all(a) | all(b)).size
      if inter * 10 >= union * 9
    } yield (a, b, inter.toDouble / union, inter.toLong, union.toLong))
      .toSeq.sortBy(t => (t._1, t._2))
    def run(cap: Int) = graft.dedup.DedupQueries
      .jaccardPairs(docs, 9, 10, cap, Some(docs.select("lang")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val capped = run(5) // 30-doc block > 5 → collapse + prefix path
    assert(capped == expected, "capped pair list must equal brute force")
    assert(run(1000000) == expected, "uncapped pair list must equal brute force")
    // sanity on the fixture itself: 4-copy groups contribute C(4,2)=6
    // intra pairs × 5 groups, and the g0/g1 near-dup family contributes
    // 4×4 cross pairs on top
    assert(expected.count(_._3 == 1.0) == 30)
    assert(expected.count(_._3 < 1.0) == 16)
  }

  test("q140 dup-span coverage matches a driver-side interval-union reference") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val occs = docs.toSeq.flatMap { case (id, ws) =>
      ws.sliding(8).zipWithIndex.collect {
        case (g, i) if g.length == 8 => (id, i, g.mkString(" "))
      }
    }
    val dupGrams = occs.groupBy(_._3).collect {
      case (g, os) if os.map(_._1).distinct.size > 1 => g
    }.toSet
    val expected = docs.map { case (id, ws) =>
      val ivs = occs.filter(o => o._1 == id && dupGrams(o._3))
        .map(o => (o._2, o._2 + 7)).sortBy(_._1)
      val covered = ivs.foldLeft((0L, -1)) { case ((acc, prevEn), (st, en)) =>
        (acc + math.max(0, en - math.max(st - 1, prevEn)), math.max(prevEn, en))
      }._1
      id -> ((ws.size.toLong, covered, ivs.size.toLong))
    }
    val got = Registry.queries("q140_dup_spans")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // sanity: the statistic is non-trivial on the testdata
    assert(expected.values.exists(_._2 > 0), "no duplicated spans found at all")
  }

  test("q149 subset pairs match a driver-side set-containment reference") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").toSet))
    val expected = (for {
      a <- docs; b <- docs
      if a._2 == b._2 && a._1 < b._1
      inter = a._3.intersect(b._3).size
      if inter == math.min(a._3.size, b._3.size)
    } yield {
      val (sub, sup) =
        if (a._3.size < b._3.size) (a._1, b._1)
        else if (b._3.size < a._3.size) (b._1, a._1)
        else (a._1, b._1)
      (sub, sup, inter.toLong)
    }).sortBy(t => (t._1, t._2)).toSeq
    val got = Registry.queries("q149_subset_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(expected.nonEmpty)
  }

  test("q141 semantic dedup: survivors = all minus cosine-dominated, within label only") {
    val es = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val dropped = (for {
      a <- es; b <- es
      if a._2 == b._2 && a._1 < b._1 && cos(a._3, b._3) >= 0.42
    } yield b._1).toSet
    val expected = es.map(_._1).filterNot(dropped).sorted.toSeq
    val got = Registry.queries("q141_semantic_dedup")(spark, sf).collect()
      .map(_.getLong(0)).toSeq
    assert(got == expected)
  }

  test("q176/q177 decision forms agree with a brute-force keep-bit reference") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").distinct.toSet))
    def jac(a: Set[String], b: Set[String]): Boolean = {
      val i = (a & b).size; 10 * i >= 9 * (a.size + b.size - i)
    }
    val jacDropped = (for {
      (ia, la, ta) <- docs; (ib, lb, tb) <- docs
      if la == lb && ia < ib && jac(ta, tb)
    } yield ib).toSet
    val gotJ = Registry.queries("q176_jaccard_keep")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(gotJ == docs.map(d => d._1 -> !jacDropped(d._1)).toMap)
    assert(jacDropped.nonEmpty) // fixture actually exercises both bits
    val subDropped = (for {
      (ia, la, ta) <- docs; (ib, lb, tb) <- docs
      if la == lb && ia != ib && ta.subsetOf(tb) &&
        (ta.size < tb.size || (ta.size == tb.size && ib < ia))
    } yield ia).toSet
    val gotC = Registry.queries("q177_containment_keep")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(gotC == docs.map(d => d._1 -> !subDropped(d._1)).toMap)
    assert(subDropped.nonEmpty)
  }

  test("q141 size gate: mega-cluster routes through RP-LSH with bounded candidates, identical output") {
    import org.apache.spark.sql.functions.{col, sqrt}
    import graft.similarity.SimilarityQueries
    import graft.util.Det
    import spark.implicits._
    // one label holding 120 vectors (40 groups × 3 EXACT duplicates, groups
    // pairwise orthogonal via disjoint one-hot dims → cross-group cosine 0)
    val rows = for (g <- 0 until 40; r <- 0 until 3)
      yield (g * 3L + r, 7, Array.tabulate(64)(dd => if (dd == g % 64) 1.0f else 0.0f))
    val e = rows.toDF("vec_id", "label", "embedding")
      .select(col("vec_id"), col("label"), col("embedding"),
        sqrt(Det.seqNormSq(col("embedding"))).as("norm"))
    // the LSH route must produce strictly fewer candidate pairs than the
    // all-pairs block it replaces (its whole point at 100 TB)
    val nc = SimilarityQueries.rplshWithinCluster(e).count()
    assert(nc < 120L * 119 / 2, s"LSH candidates ($nc) not bounded below all-pairs")
    // cap = 50 < 120 forces the gate; exact duplicates share every band, so
    // the LSH route keeps recall 1 here: min id per duplicate group survives
    val gated = SimilarityQueries.semanticDedup(e, tau = 0.42, cap = 50)
      .collect().map(_.getLong(0)).toSeq
    assert(gated == (0 until 40).map(_ * 3L))
    // and with the cap above the cluster size, the plain path agrees
    val plain = SimilarityQueries.semanticDedup(e, tau = 0.42, cap = 1000)
      .collect().map(_.getLong(0)).toSeq
    assert(plain == gated)
  }

  test("q144 hybrid search matches a full driver-side lexical+dense reference") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = docs.size.toLong
    val df = docs.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size.toLong)
    val qTerms = docs(0L).distinct.toSet
    val scores = docs.collect { case (id, ws) if id != 0L =>
      val sc = ws.filter(qTerms).groupBy(identity).map { case (t, os) =>
        os.size.toLong * ((1000000L * n) / df(t))
      }.sum
      id -> sc
    }.filter(_._2 > 0)
    val es = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val top = scores.toSeq.filter(t => es.contains(t._1))
      .sortBy { case (id, sc) => (-sc, id) }.take(10)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val qv = es(0L)
    val reranked = top.map { case (id, sc) =>
      (id, sc, dot(qv, es(id)) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(es(id), es(id)))))
    }.sortBy { case (id, _, c) => (-c, id) }
    val got = Registry.queries("q144_hybrid_search")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.map(t => (t._1, t._2)).toSeq == reranked.map(t => (t._1, t._2)))
    got.map(_._3).zip(reranked.map(_._3)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12)
    }
  }

  test("q154 canonical pick: survivor is the max-quality member; ledger adds up") {
    val clusters = Registry.queries("q58_dup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val quality = Tables.documents(spark, sf).select("doc_id", "text", "n_chars")
      .collect().map { r =>
        val toks = r.getString(1).split(" ", -1)
        (r.getLong(0), toks.distinct.length.toLong * 1000 / toks.length,
          r.getLong(2))
      }.map(t => t._1 -> (t._2, t._3)).toMap
    val got = Registry.queries("q154_canonical_pick")(spark, sf).collect()
    assert(got.length == clusters.size)
    // labels equal q58's canonical ids; discard counts match cluster sizes
    got.foreach { r =>
      val label = r.getLong(0)
      assert(r.getLong(3) == clusters(label) - 1, s"cluster $label")
      assert(quality(r.getLong(1))._1 == r.getLong(2), s"cluster $label")
    }
    // for multi-doc clusters, no member outranks the survivor
    val labelOf = Registry.queries("q156_leakage_safe_split")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val members = labelOf.groupBy(_._2).view.mapValues(_.keys.toSeq)
    got.filter(_.getLong(3) > 0).foreach { r =>
      val best = members(r.getLong(0))
        .map(id => (-quality(id)._1, id)).min
      assert(best._2 == r.getLong(1), s"cluster ${r.getLong(0)}")
      val removed = members(r.getLong(0)).filter(_ != r.getLong(1))
        .map(id => quality(id)._2).sum
      assert(r.getLong(4) == removed)
    }
  }

  test("q156 split: near-dup pairs never straddle; fractions are sane") {
    val split = Registry.queries("q156_leakage_safe_split")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = split.map(t => t._1 -> t._3).toMap
    // every q42 near-dup pair lands in the same split
    Registry.queries("q42_jaccard_pairs")(spark, sf).collect().foreach { r =>
      assert(byDoc(r.getLong(0)) == byDoc(r.getLong(1)),
        s"pair ${r.getLong(0)},${r.getLong(1)}")
    }
    // cluster-mates share a split by construction
    split.groupBy(_._2).values.foreach(g => assert(g.map(_._3).distinct.length == 1))
    val frac = split.groupBy(_._3).view.mapValues(_.length.toDouble / split.length)
    assert(frac("train") > 0.5)
    assert(frac.keySet.subsetOf(Set("train", "val", "test")))
  }

  test("q157 int8 codes are in range and satisfy the quantization error bound") {
    val got = Registry.queries("q157_int8_quant")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val maxabs = r.getDouble(1)
      Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)).foreach { c =>
        assert(c >= -127 && c <= 127, s"vec ${r.getLong(0)}")
      }
      // per-dim error <= half step (step = maxabs/127), 64 dims, fp slack
      val bound = 64.0 * math.pow(maxabs / 254.0, 2) * (1 + 1e-9)
      assert(r.getDouble(7) <= bound, s"vec ${r.getLong(0)}")
    }
    // codes round-trip a driver-side recomputation for one vector
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val r0 = got.head
    val v = e(r0.getLong(0)).map(_.toDouble)
    val ma = v.map(math.abs).max
    val codes = v.map(x => math.floor(x * 127.0 / ma + 0.5).toLong)
    assert(r0.getDouble(1) == ma)
    assert(Seq(codes(0), codes(1), codes(2), codes(3)) ==
      Seq(r0.getLong(2), r0.getLong(3), r0.getLong(4), r0.getLong(5)))
    assert(r0.getLong(6) == codes.sum)
  }

  test("q160 ANN recall matches a driver-side exact/IVF comparison") {
    val es = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val queries = es.filter(_._1 < 20)
    val expected = queries.map { q =>
      def top3(cands: Seq[(Long, Int, Array[Double])]): Set[Long] =
        cands.filter(_._1 != q._1)
          .map(c => (-cos(q._3, c._3), c._1)).sorted.take(3).map(_._2).toSet
      val exact = top3(es.toSeq)
      val ivf = top3(es.filter(_._2 == q._2).toSeq)
      q._1 -> (exact & ivf).size.toLong
    }.toMap
    val got = Registry.queries("q160_ann_recall")(spark, sf).collect()
    assert(got.length == queries.length)
    got.foreach { r =>
      assert(r.getLong(1) == 3L)
      assert(r.getLong(2) == expected(r.getLong(0)), s"query ${r.getLong(0)}")
      assert(r.getLong(3) == r.getLong(2) * 100 / 3)
    }
  }

  test("q164 winnowing matches a driver-side reference; gap guarantee holds") {
    def polyHash(s: String): Long =
      s.foldLeft(7L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val P = 1000000007L
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val got = Registry.queries("q164_winnowing")(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val hs = text.split(" ", -1).map(polyHash)
      val grams = hs.sliding(3).map(g => ((g(0) * 31 + g(1)) % P * 31 + g(2)) % P)
        .toArray.zipWithIndex.map { case (h, p) => (p, h) }
      val sel = (0 to grams.length - 4).map { start =>
        grams.slice(start, start + 4).minBy { case (p, h) => (h, -p) }
      }.distinct.sortBy(_._1)
      val r = got(id)
      assert(r.getLong(1) == grams.length.toLong, s"doc $id kgrams")
      assert(r.getLong(2) == sel.size.toLong, s"doc $id n_fp")
      val sig = sel.map(_._2).foldLeft(7L)((acc, h) => (acc * 31 + h) % P)
      assert(r.getLong(3) == sig, s"doc $id sig")
      // winnowing guarantee: every 4-window contains a selected position
      val ps = sel.map(_._1)
      ps.zip(ps.drop(1)).foreach { case (a, b) => assert(b - a <= 4, s"doc $id gap") }
    }
  }

  test("q165 projection matches a driver recompute; JL preserves norms on average") {
    val dirs = (0 until 16).map { i =>
      (0 until 64).map { dd =>
        val x = (i * 64 + dd + 1) * 2654435761L % 4093
        (x.toDouble / 4093.0) * 2.0 - 1.0
      }.toArray
    }
    val es = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val got = Registry.queries("q165_random_projection")(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    var ratioSum = 0.0
    es.foreach { case (id, v) =>
      val y = dirs.map(dir => dot(v, dir) / 4.0)
      val r = got(id)
      (0 until 4).foreach(j =>
        assert(math.abs(r.getDouble(1 + j) - y(j)) < 1e-12, s"vec $id y$j"))
      val ynorm = y.map(x => x * x).sum
      val xnorm = dot(v, v)
      assert(math.abs(r.getDouble(5) - ynorm) < 1e-9)
      ratioSum += ynorm / (xnorm / 3.0) // E[||y||^2] = ||x||^2 * (d_in/3) / d_out... measured below
    }
    // the pinned uniform(-1,1) directions have E[r_j^2] = 1/3, so
    // E[||y||^2] = ||x||^2 * 16 * (1/3) / 16 = ||x||^2 / 3 — the mean
    // measured ratio should sit near 1 with ~0.35/sqrt(n) noise
    val mean = ratioSum / es.length
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean")
  }

  test("q171 centroid update matches a driver-side two-phase merge") {
    val es = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).take(8).map(_.toDouble).toArray))
      .sortBy(_._1)
    val cut = (es.map(_._1).max + 1) * 9 / 10
    val got = Registry.queries("q171_centroid_update")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (l, dim) = (r.getInt(0), r.getLong(1).toInt)
      val base = es.filter(t => t._2 == l && t._1 < cut).map(_._3(dim))
      val batch = es.filter(t => t._2 == l && t._1 >= cut).map(_._3(dim))
      assert(r.getLong(2) == base.length.toLong && r.getLong(3) == batch.length.toLong)
      val sumOld = base.foldLeft(0.0)(_ + _)
      val sumNew = batch.foldLeft(0.0)(_ + _)
      assert(math.abs(r.getDouble(4) - sumOld / base.length) < 1e-12)
      val merged = (sumOld + sumNew) / (base.length + batch.length)
      assert(math.abs(r.getDouble(5) - merged) < 1e-12)
      assert(math.abs(r.getDouble(6) - (merged - sumOld / base.length)) < 1e-12)
    }
    // covers every (label, dim<8) pair
    assert(got.length == es.map(_._2).distinct.length * 8)
  }

  test("q162 cluster quality matches a driver-side inertia/separation recompute") {
    val es = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).take(8).map(_.toDouble).toArray))
      .sortBy(_._1)
    val byLabel = es.groupBy(_._2)
    val cent = byLabel.view.mapValues { ms =>
      (0 until 8).map(j => ms.map(_._3(j)).foldLeft(0.0)(_ + _) / ms.size).toArray
    }.toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      (0 until 8).foldLeft(0.0)((acc, j) => acc + (a(j) - b(j)) * (a(j) - b(j)))
    val got = Registry.queries("q162_cluster_quality")(spark, sf).collect()
    assert(got.map(_.getLong(1)).sum == es.length)
    got.foreach { r =>
      val l = r.getInt(0)
      val inertia = byLabel(l).map(m => d2(m._3, cent(l))).foldLeft(0.0)(_ + _)
      assert(math.abs(r.getDouble(2) - inertia) < 1e-9, s"cluster $l inertia")
      val sep = cent.collect { case (o, c) if o != l => d2(cent(l), c) }.min
      assert(math.abs(r.getDouble(4) - sep) < 1e-9, s"cluster $l separation")
      assert(r.getBoolean(5) == (r.getDouble(4) > r.getDouble(2) / r.getLong(1)))
    }
  }

  test("q161 snapshot dedup: two-tier, asymmetric, zero false positives") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).distinct.toSet))
    val cut = (docs.map(_._1).max + 1) * 9 / 10
    val byId = docs.map(t => t._1 -> t).toMap
    val got = Registry.queries("q161_snapshot_dedup")(spark, sf).collect()
    assert(got.nonEmpty)
    assert(got.exists(_.getString(4) == "exact")) // testdata has exact copies
    got.foreach { r =>
      val (deltaId, dupOf) = (r.getLong(0), r.getLong(1))
      assert(deltaId >= cut && dupOf < cut, s"roles violated for $deltaId")
      val (_, la, ta) = byId(deltaId)
      val (_, lb, tb) = byId(dupOf)
      assert(la == lb)
      val sameLangBases = docs.filter(t => t._1 < cut && t._2 == la)
      r.getString(4) match {
        case "exact" =>
          assert(ta == tb, s"exact match $deltaId->$dupOf not set-equal")
          assert(r.getDouble(2) == 1.0)
          val equalBases = sameLangBases.filter(_._3 == ta).map(_._1)
          assert(dupOf == equalBases.min, s"dup_of not the earliest copy")
          assert(r.getLong(3) == equalBases.length.toLong)
        case "near" =>
          // exact tier must have been empty for this delta
          assert(!sameLangBases.exists(_._3 == ta), s"$deltaId belongs in exact tier")
          val inter = (ta & tb).size
          val union = ta.size + tb.size - inter
          assert(inter * 10 >= union * 9, s"false positive $deltaId->$dupOf")
          assert(math.abs(r.getDouble(2) - inter.toDouble / union) < 1e-15)
          val accepted = sameLangBases.filter { case (_, _, t) =>
            val i = (ta & t).size; val u = ta.size + t.size - i
            i * 10 >= u * 9
          }.map(_._1)
          assert(accepted.nonEmpty && dupOf >= accepted.min)
      }
    }
  }

  test("q178 chunk dedup: first global occurrence kept, duplicates removed") {
    import spark.implicits._
    // doc 0: two chunks (32 + 8 tokens); doc 1: exact copy; doc 2: equals
    // doc 0's first chunk exactly; doc 3: unique content
    val t0 = (0 until 40).map(i => s"w$i").mkString(" ")
    val t2 = (0 until 32).map(i => s"w$i").mkString(" ")
    val t3 = (100 until 140).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, t0), (1L, t0), (2L, t2), (3L, t3)).toDF("doc_id", "text")
    val got = dedup.DedupQueries.chunkDedup(docs, 32).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 0L),   // keeper of both of its chunks
      (1L, 2L, 0L, 40L),  // exact copy: both chunks removed, 40 tokens
      (2L, 1L, 0L, 32L),  // equals doc 0's first chunk: removed
      (3L, 2L, 2L, 0L)))  // unique: fully kept
    // conservation on the real corpus: kept chunks == distinct fingerprints
    val real = Registry.queries("q178_chunk_dedup")(spark, sf).collect()
    real.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    assert(real.map(_.getLong(2)).sum > 0)
  }

  test("q179 threshold curve: monotone, conserving, and q176-consistent at 0.9") {
    val rows = Registry.queries("q179_threshold_curve")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(50L, 60L, 70L, 80L, 90L))
    val drops = rows.map(_.getLong(1))
    assert(drops.zip(drops.tail).forall { case (a, b) => a >= b },
      s"drop counts must not increase with threshold: ${drops.toSeq}")
    val nDocs = Tables.documents(spark, sf).count()
    rows.foreach(r => assert(r.getLong(1) + r.getLong(2) == nDocs))
    // at tau = 0.9 the curve must agree exactly with the q176 keep bits
    val q176drop = Registry.queries("q176_jaccard_keep")(spark, sf)
      .collect().count(!_.getBoolean(1)).toLong
    assert(drops.last == q176drop)
  }

  test("q180 chunk-clean transform: duplicate-only docs vanish, keepers intact") {
    import spark.implicits._
    val t0 = (0 until 40).map(i => s"w$i").mkString(" ")
    val t2 = (0 until 32).map(i => s"w$i").mkString(" ")
    val t3 = (100 until 140).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, t0), (1L, t0), (2L, t2), (3L, t3)).toDF("doc_id", "text")
    // drive the registry form through a temp dir-shaped frame? the spine is
    // shared with chunkDedup, so assert consistency through the real corpus
    // below and the hand case through chunkDedup's kept accounting
    val stats = dedup.DedupQueries.chunkDedup(docs, 32).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(stats(1L) == 0L && stats(2L) == 0L) // would vanish from q180
    val clean = Registry.queries("q180_chunk_clean")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ledger = Registry.queries("q178_chunk_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // q180 emits exactly the docs whose n_kept > 0, and the kept token
    // count matches the cleaned text's token count
    assert(clean.map(_._1).toSeq == ledger.filter(_._3 > 0).map(_._1))
    val byId = ledger.map(r => r._1 -> r).toMap
    clean.foreach { case (id, text, nKept) =>
      assert(text.split(" ").length.toLong == nKept, s"doc $id token count")
      assert(byId(id)._3 > 0)
    }
  }

  test("q190 IVF-PQ: within-cell results only; high recall vs q48's exact cell scan") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = Registry.queries("q190_ivf_pq")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val labels = Tables.embeddings(spark, dir)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("label").cast("long")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every hit lives in its query's cell (the nprobe=1 contract)
      got.foreach { case (q, _, v) =>
        assert(labels(v) == labels(q), s"q$q hit $v outside its cell")
      }
      // recall@3 vs q48 (the EXACT scan of the same cell)
      val exact = Registry.queries("q48_ann_partitioned")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val approx = got.map(t => (t._1, t._3)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      assert(approx.keySet == exact.keySet)
      val recall = approx.keys.toSeq.map(q =>
        (approx(q) & exact(q)).size.toDouble / exact(q).size).sum / approx.size
      info(f"$dir IVF-PQ recall@3 vs exact cell scan = $recall%.3f")
      assert(recall >= 0.9, f"IVF-PQ recall@3 $recall%.3f below 0.9 at $dir")
    }
  }

  test("q181 PQ-ADC search: exact re-rank ordering, bounded recall loss vs brute force") {
    val got = Registry.queries("q181_pq_search")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == (0L until 20L).toSet)
    byQ.values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == (1L to 10L)) // dense ranks
      // exact re-rank: cos non-increasing with rank
      val byRank = rows.sortBy(_._2).map(_._4)
      byRank.zip(byRank.tail).foreach { case (a, b) => assert(a >= b) }
    }
    // recall@10 vs a driver-side exact brute force, pinned ≥ 0.9 at both
    // driver SFs (VERDICT r6 weak 3: the 8-subspace seed-only codebook
    // scored 0.70; the 16×16 Lloyd-trained one must stay ≥ 0.9)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val res = Registry.queries("q181_pq_search")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1)
      val embs = Tables.embeddings(spark, dir)
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
      val recalls = (0L until 20L).map { qid =>
        val truth = embs.toSeq.filter(_._1 != qid)
          .map { case (id, v) => (cos(embs(qid), v), id) }
          .sortBy { case (c, id) => (-c, id) }.take(10).map(_._2).toSet
        val mine = res(qid).map(_._2).toSet
        truth.intersect(mine).size / 10.0
      }
      val meanRecall = recalls.sum / recalls.length
      info(s"$dir mean recall@10 = $meanRecall")
      assert(meanRecall >= 0.9, s"PQ recall@10 $meanRecall below 0.9 at $dir")
    }
  }

  test("q185 cluster decontamination: purge is the cluster-closure of contamination") {
    val rows = Registry.queries("q185_cluster_decontam")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    // purge ⊇ contaminated: a doc sharing a benchmark n-gram is never kept
    rows.foreach { case (id, _, cont, purge) =>
      assert(!cont || purge, s"doc $id contaminated but not purged")
    }
    // purge is constant within a cluster label
    rows.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.map(_._4).distinct.length == 1,
        s"cluster $lbl has mixed purge bits")
    }
    // driver-side recount: a cluster purges iff it contains a contaminated
    // doc or a benchmark (src0) doc. q185 omits benchmark docs from its
    // output, so recover their labels from q156 (same clusterLabels frame).
    val allLabels = Registry.queries("q156_leakage_safe_split")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, lbl, _, _) =>
      assert(allLabels(id) == lbl, s"doc $id label drifted between q185 and q156")
    }
    val srcs = Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val benchLabels = srcs.collect { case (id, "src0") => allLabels(id) }.toSet
    val contLabels = rows.collect { case (_, lbl, true, _) => lbl }.toSet
    val shouldPurge = contLabels ++ benchLabels
    rows.foreach { case (id, lbl, _, purge) =>
      assert(purge == shouldPurge.contains(lbl),
        s"doc $id label $lbl: purge=$purge expected=${shouldPurge.contains(lbl)}")
    }
    // the propagation is non-trivial on this corpus: some purged doc is not
    // itself contaminated (the dup-laundered leakage q112 misses)
    assert(rows.exists { case (_, _, cont, purge) => purge && !cont },
      "no cluster-propagated purge found — fixture lost its dup-laundered leak")
  }

  test("q209 BM25 matches a plain-Scala fixed-point reference; ranking is sane") {
    val queries = Seq(1L -> "spark", 1L -> "table", 2L -> "data", 2L -> "stream",
      3L -> "join", 3L -> "merge", 3L -> "window")
    val qTerms = queries.map(_._2).distinct.toSet
    val docs = Tables.documents(spark, TestSpark.sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    def fplog(n: Long): Long = {
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(n)
      val p = 1L << (bl - 1)
      (bl - 1).toLong * 4096 + 4096 * (n - p) / p
    }
    val nDocs = docs.length.toLong
    val dl = docs.map { case (id, ws) => id -> ws.length.toLong }.toMap
    val avgdlFp = dl.values.sum * 1000 / nDocs
    val tf = docs.flatMap { case (id, ws) =>
      ws.filter(qTerms).groupBy(identity).map { case (w, o) => (w, id, o.length.toLong) }
    }
    val df = tf.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val perDoc = tf.map { case (w, id, f) =>
      val idf = fplog(2 * nDocs + 2) - fplog(2 * df(w) + 1)
      val nf = 250 + 750 * dl(id) * 1000 / avgdlFp
      (w, id, idf * (f * 1000000 / (f * 1000 + 1200 * nf / 1000)))
    }
    val expected = queries.flatMap { case (qid, t) =>
      perDoc.collect { case (w, id, sc) if w == t => ((qid, id), sc) }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .groupBy(_._1._1).flatMap { case (qid, rows) =>
        rows.sortBy { case ((_, id), sc) => (-sc, id) }.take(10).zipWithIndex
          .map { case (((_, id), sc), i) => (qid, id, sc, i + 1L) }
      }.toSet
    val got = Registry.queries("q209_bm25")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, s"got ${got.toSeq.sorted}\nexpected ${expected.toSeq.sorted}")
    // scores positive and each query returned something
    assert(got.nonEmpty && got.forall(_._3 > 0))
    assert(got.map(_._1) == Set(1L, 2L, 3L))
  }

  test("q210 NDCG matches a plain-Scala reference and is bounded by the ideal") {
    val queries = Seq(1L -> "spark", 1L -> "table", 2L -> "data", 2L -> "stream",
      3L -> "join", 3L -> "merge", 3L -> "window")
    def fplog(n: Long): Long = {
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(n)
      val p = 1L << (bl - 1)
      (bl - 1).toLong * 4096 + 4096 * (n - p) / p
    }
    val docs = Tables.documents(spark, TestSpark.sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    // graded relevance: capped occurrence count per (query, doc)
    val rel = queries.groupBy(_._1).view.mapValues { qs =>
      val terms = qs.map(_._2).toSet
      docs.map { case (id, ws) =>
        id -> math.min(8L, ws.count(terms).toLong)
      }.filter(_._2 > 0).toMap
    }.toMap
    val ranked = Registry.queries("q209_bm25")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    def g(relv: Long, rank: Long): Long =
      ((1L << relv.toInt) - 1) * 40960000L / fplog(rank + 1)
    val expDcg = ranked.groupBy(_._1).view.mapValues(_.map { case (q, id, rk) =>
      g(rel(q).getOrElse(id, 0L), rk)
    }.sum).toMap
    val expIdcg = rel.map { case (q, m) =>
      q -> m.toSeq.sortBy { case (id, r) => (-r, id) }.take(10).zipWithIndex
        .map { case ((_, r), i) => g(r, i + 1L) }.sum
    }
    val got = Registry.queries("q210_ndcg")(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    got.foreach { case (q, (dcg, idcg, ndcg)) =>
      assert(dcg == expDcg(q), s"q$q dcg $dcg != ${expDcg(q)}")
      assert(idcg == expIdcg(q), s"q$q idcg $idcg != ${expIdcg(q)}")
      assert(dcg <= idcg, s"q$q dcg above ideal")
      assert(ndcg == dcg * 10000 / idcg && ndcg >= 0 && ndcg <= 10000)
    }
  }

  test("q223 multi-probe IVF: per-query recall monotone in nprobe, mean recall@3 >= 0.85 at nprobe=8") {
    val rows = Registry.queries("q223_ivf_nprobe_sweep")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5)))
    val byQ = rows.groupBy(_._2)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      val ordered = rs.sortBy(_._1)
      assert(ordered.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L), s"query $q nprobe rows")
      // candidate sets nest as nprobe grows and the exact top-3 is the
      // global cosine order, so hits (and cost) can only grow
      assert(ordered.map(_._3).sliding(2).forall(p => p(0) <= p(1)),
        s"query $q recall not monotone: ${ordered.map(_._3).mkString(",")}")
      assert(ordered.map(_._4).sliding(2).forall(p => p(0) <= p(1)),
        s"query $q probe cost not monotone")
    }
    val at8 = rows.filter(_._1 == 8L).map(_._3)
    val mean = at8.sum.toDouble / at8.length
    assert(mean >= 85.0, s"mean recall@3 at nprobe=8 = $mean < 85")
  }

  test("q228 record linkage: planted pairs resolved, verdicts consistent") {
    val rows = Registry.queries("q228_record_linkage")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    // every entity has at least its planted counterpart in the block
    assert(rows.forall(_._5 >= 1))
    // verdict is exactly the threshold predicate
    assert(rows.forall { case (_, _, jw, _, _, m, _) => m == (jw >= 0.85) })
    // a planted pair is <= 1 edit away by construction
    rows.filter(_._7).foreach { case (a, _, _, lev, _, _, _) =>
      assert(lev <= 1, s"planted pair for $a: lev=$lev")
    }
    // linkage quality on the fixture: >= 90% of entities resolve to
    // their planted counterpart (near-identical titles in the dedup
    // corpus can legitimately out-score the corrupted self), and >= 90%
    // of those clear the 0.85 verdict (JW of a single mid-string edit
    // occasionally dips below it when the deletion shifts the match
    // window — that recall loss IS the operator's documented tradeoff)
    val frac = rows.count(_._7).toDouble / rows.length
    assert(frac >= 0.9, s"planted-pair resolution $frac < 0.9")
    val planted = rows.filter(_._7)
    val matched = planted.count(_._6).toDouble / planted.length
    assert(matched >= 0.9, s"planted-pair match rate $matched < 0.9")
  }

  test("q236 MMR selection equals an independent sequential greedy replay") {
    import org.apache.spark.sql.functions.col
    val bm = Registry.queries("q209_bm25")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val emb = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def cosFp(a: Long, b: Long): Long = {
      val (va, vb) = (emb(a), emb(b))
      math.floor(dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb))) * 1000000).toLong
    }
    val expected = bm.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      val cands = rows.filter(r => emb.contains(r._2))
      val mx = cands.map(_._3).max
      val rel = cands.map(r => r._2 -> r._3 * 1000 / mx).toMap
      var selected = Vector.empty[Long]
      (1 to 5).flatMap { rank =>
        val remaining = rel.keys.filterNot(selected.contains).toSeq
        if (remaining.isEmpty) None
        else {
          val scored = remaining.map { d =>
            val ms = if (selected.isEmpty) 0L else selected.map(cosFp(d, _)).max
            (d, ms, 7000L * rel(d) - 3L * ms)
          }
          val (d, ms, mmr) = scored.minBy { case (d, _, m) => (-m, d) }
          selected :+= d
          Some((qid, d, rel(d), ms, mmr, rank.toLong))
        }
      }
    }.sortBy(t => (t._1, t._6))
    val got = Registry.queries("q236_mmr_rerank")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == expected, s"MMR replay mismatch:\n got=$got\n exp=$expected")
    // diversification actually bites: some pick differs from pure-relevance order
    val pureRel = bm.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(5).map(r => (qid, r._2)).toSeq
    }.toSet
    assert(got.exists(g => !pureRel.contains((g._1, g._2))),
      "MMR never deviated from pure relevance — diversification inert on fixture")
  }

  test("q247 RRF fusion equals an independent two-leg rank replay") {
    import org.apache.spark.sql.functions.col
    val bm = Registry.queries("q209_bm25")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))) // qid, doc, rank
    val emb = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (emb(a), emb(b))
      dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb)))
    }
    val expected = bm.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      val cands = rows.filter(r => emb.contains(r._2)).sortBy(_._3)
      val rLex = cands.zipWithIndex.map { case (r, i) => r._2 -> (i + 1L) }.toMap
      val q = cands.head._2
      val rDense = cands.map(_._2).sortBy(d => (-cos(q, d), d))
        .zipWithIndex.map { case (d, i) => d -> (i + 1L) }.toMap
      val fused = rLex.keys.toSeq.map { d =>
        (d, rLex(d), rDense(d), 1000000L / (60 + rLex(d)) + 1000000L / (60 + rDense(d)))
      }.sortBy(t => (-t._4, t._1)).take(5)
      fused.zipWithIndex.map { case ((d, rl, rd, rrf), i) =>
        (qid, i + 1L, d, rl, rd, rrf)
      }
    }.sortBy(t => (t._1, t._2))
    val got = Registry.queries("q247_rrf_fusion")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"RRF replay mismatch (first got=${got.headOption})")
    // fusion bites: some fused top-5 ordering differs from pure lexical order
    assert(got.exists(g => g._2 != g._4), "RRF never reordered — dense leg inert")
  }
}
