package graft

import org.scalatest.funsuite.AnyFunSuite

class DedupSimilaritySpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

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
}
