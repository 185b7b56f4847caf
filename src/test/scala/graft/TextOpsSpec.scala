package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.clean.TextOps
import graft.util.Det

class TextOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def clean1(s: String): String =
    Seq(s).toDF("t").select(TextOps.cleanPost(col("t"))).as[String].head()

  test("cleanPost masks emails and urls, strips symbols, collapses spaces") {
    assert(clean1("Mail me at bob.smith+x@example.com  now!") ==
      "mail me at emailaddress now")
    assert(clean1("see https://example.com/a?b=1 and www.foo.org/x too") ==
      "see website and website too")
    assert(clean1("  A,B;;C   d  ") == "a b c d")
  }

  test("q195 URL canonicalization pins every rule (hand-computed vectors)") {
    val rows = graft.Registry.queries("q195_url_normalize")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getBoolean(5)))).toMap
    // doc 0: HTTP://WWW.Example0.COM:80/Cat0/item0?utm_source=s0&ref=r0
    //        &q=0&utm_campaign=c0#sec0
    val (u0, c0, h0, _, f0) = rows(0L)
    assert(u0 == "HTTP://WWW.Example0.COM:80/Cat0/item0?utm_source=s0&ref=r0&q=0&utm_campaign=c0#sec0")
    assert(rows(0L)._2 == rows(12L)._2 && rows(12L)._1 != u0) // 12 collapses onto 0's canon
    assert(c0 == "http://example0.com/Cat0/item0?q=0&ref=r0") // lower scheme+host,
    // www+port+fragment+utm stripped, params sorted (q=0 < ref=r0)
    assert(h0 == "example0.com" && f0)
    // doc 1: https, :443, trailing slash — all normalized away
    val (_, c1, h1, _, _) = rows(1L)
    assert(c1 == "https://example1.com/Cat1/item1?q=1&ref=r1")
    assert(h1 == "example1.com")
    // canonical class = id mod 12 (lcm of the canonical-relevant
    // residues), so docs 0 and 12 share a canon while their raw URLs
    // differ in tracking params; every group's is_first marks its min
    val byCanon = rows.toSeq.groupBy(_._2._2)
    byCanon.foreach { case (_, ms) =>
      val ids = ms.map(_._1)
      ms.foreach { case (id, (_, _, _, nSame, isFirst)) =>
        assert(nSame == ids.size.toLong)
        assert(isFirst == (id == ids.min))
      }
    }
    // the fixture genuinely exercises the collapse (some group > 1)
    assert(byCanon.exists(_._2.size > 1), "no canonical collisions at this SF")
  }

  test("cleanPost is idempotent") {
    val samples = Seq("Hello, World! x@y.com", "a  b   c", "http://a.b c&d")
    samples.foreach { s =>
      val once = clean1(s)
      assert(clean1(once) == once, s"not idempotent for: $s")
    }
  }

  test("stopword removal preserves order and duplicates of kept tokens") {
    val got = Seq("the cat the cat sat on a mat")
      .toDF("t")
      .select(array_join(TextOps.removeStopwords(TextOps.tokens(col("t"))), " "))
      .as[String].head()
    assert(got == "cat cat sat mat")
  }

  test("polyHash pins the documented polynomial (cross-engine contract)") {
    // 'ab': ((7*31+97)*31+98) % 1000000007 = 9832 — same value DuckDB's
    // list_reduce mirror produces; a silent change here breaks every
    // fingerprint/minhash oracle.
    val got = Seq("ab").toDF("t").select(Det.polyHash(col("t"))).as[Long].head()
    assert(got == 9832L)
  }

  test("quality inputs: token math matches scala reference") {
    val row = Seq("the quick brown fox").toDF("t")
      .select(
        size(TextOps.tokens(col("t"))).as("n"),
        aggregate(transform(TextOps.tokens(col("t")), x => length(x)),
          lit(0), (a, b) => a + b).as("tot"))
      .as[(Int, Int)].head()
    assert(row == ((4, 16)))
  }

  test("q207 mojibake: counts match a plain-Scala mirror of the corruption + detector") {
    val texts = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Registry.queries("q207_mojibake")(spark, TestSpark.sf).collect()
    assert(out.length == texts.size)
    out.foreach { r =>
      val id = r.getLong(0)
      val s = (id % 7) match {
        case 0 => texts(id).replace("a", "Ã¡")
        case 1 => texts(id).replace("e", "�")
        case 2 => texts(id) + "\u0007x"
        case _ => texts(id)
      }
      val nRepl = s.count(_ == '�').toLong
      val nCtrl = s.count(c => c < 32 && c != 9 && c != 10 && c != 13).toLong
      val nMoji = s.count(_ == 'Ã').toLong
      val nNonAscii = s.count(_ > 127).toLong
      assert(r.getLong(1) == nRepl, s"doc $id n_repl")
      assert(r.getLong(2) == nCtrl, s"doc $id n_ctrl")
      assert(r.getLong(3) == nMoji, s"doc $id n_moji")
      assert(r.getLong(4) == nNonAscii, s"doc $id n_nonascii")
      assert(r.getLong(5) == s.length.toLong, s"doc $id n_chars")
      assert(r.getBoolean(6) == (nRepl == 0 && nCtrl == 0 && nMoji == 0), s"doc $id keep")
    }
  }

  test("q221 RAKE: hand-computed scores on a real-stopword fixture") {
    // the classic RAKE abstract example, trimmed to our stopword list
    // (of/the/over are stopwords): candidate phrases are
    // [compatibility] [systems] [linear constraints] [set] [natural numbers]
    val docs = Seq((0L,
      "compatibility of systems of linear constraints over the set of natural numbers"))
      .toDF("doc_id", "text")
    val out = clean.TextQueries.rakeKeywords(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // deg/freq: words in 2-word phrases score 2000 fp; singles 1000
    assert(out("linear constraints") == ((1L, 4000L)))
    assert(out("natural numbers") == ((1L, 4000L)))
    assert(out("compatibility") == ((1L, 1000L)))
    assert(out("systems") == ((1L, 1000L)))
    assert(out("set") == ((1L, 1000L)))
    // multi-word technical phrases outrank frequent singles — RAKE's point
    val ranked = clean.TextQueries.rakeKeywords(docs).collect().map(_.getString(0))
    assert(ranked.take(2).toSet == Set("linear constraints", "natural numbers"))
  }

  test("q208 triangles match a brute-force count of the fixture graph") {
    val n = Tables.documents(spark, TestSpark.sf).count()
    // the q196/q208 fixture: doc i links to (i*7+k) mod n for k in 1..1+i%3
    val edges = (0L until n).flatMap { i =>
      (1L to (1 + i % 3)).map(k => (i, (i * 7 + k) % n))
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val triCount = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      Seq(a, b, c) <- nodes.combinations(3)
      if edges((a, b)) && edges((a, c)) && edges((b, c))
    } { triCount(a) += 1; triCount(b) += 1; triCount(c) += 1 }
    val got = Registry.queries("q208_triangles")(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == triCount.toMap, s"got $got expected $triCount")
  }

  test("q232 crawl-frontier BFS equals a sequential BFS over the fixture graph") {
    val n = Tables.documents(spark, TestSpark.sf).count()
    val adj = (0L until n).map { i =>
      i -> (1L to (1 + i % 3)).map(k => (i * 7 + k) % n).distinct
    }.toMap
    val dist = scala.collection.mutable.Map.empty[Long, Long]
    var frontier = (0L until n).filter(_ % 101 == 0)
    frontier.foreach(v => dist(v) = 0L)
    var d = 0L
    while (frontier.nonEmpty && d < 64) {
      d += 1
      frontier = frontier.flatMap(adj(_)).distinct.filterNot(dist.contains)
      frontier.foreach(v => dist(v) = d)
    }
    val got = Registry.queries("q232_crawl_frontier")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == n)
    got.foreach { case (v, dv, reached) =>
      assert(reached == dist.contains(v), s"reached bit wrong for $v")
      assert(dv == dist.getOrElse(v, -1L), s"dist($v): got $dv want ${dist.getOrElse(v, -1L)}")
    }
  }

  test("q243 LPA equals a sequential synchronous replay; q244 equals brute-force lcc") {
    val n = Tables.documents(spark, TestSpark.sf).count()
    val und = (0L until n).flatMap { i =>
      (1L to (1 + i % 3)).map(k => (i, (i * 7 + k) % n))
    }.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var lbl = (0L until n).map(v => v -> v).toMap
    (1 to 4).foreach { _ =>
      lbl = lbl.map { case (v, old) =>
        adj.get(v) match {
          case None => v -> old
          case Some(ns) =>
            val counts = ns.groupBy(lbl).map { case (l, xs) => (l, xs.size) }
            v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }
    }
    val sizes = lbl.values.groupBy(identity).map { case (l, vs) => l -> vs.size.toLong }
    val gotLpa = Registry.queries("q243_label_propagation")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(gotLpa.length == n)
    gotLpa.foreach { case (v, c, sz) =>
      assert(c == lbl(v), s"community($v): got $c want ${lbl(v)}")
      assert(sz == sizes(c), s"community_size($v): got $sz want ${sizes(c)}")
    }
    // communities are finer than (or equal to) components, never coarser:
    // same community ⇒ connected (spot: label must be reachable, so lcc
    // coarsest check — every community label is one of its members)
    assert(gotLpa.forall { case (_, c, _) => gotLpa.exists(_._1 == c) })
    // q244: brute-force lcc from the same edge set
    val undSet = und.toSet
    val deg = adj.map { case (v, ns) => v -> ns.size.toLong }
    val tri = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      Seq(a, b, c) <- adj.keys.toSeq.sorted.combinations(3)
      if undSet((a, b)) && undSet((a, c)) && undSet((b, c))
    } { tri(a) += 1; tri(b) += 1; tri(c) += 1 }
    val gotLcc = Registry.queries("q244_clustering_coefficient")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    gotLcc.foreach { case (v, d, t, bp) =>
      assert(d == deg.getOrElse(v, 0L), s"deg($v)")
      assert(t == tri(v), s"tri($v)")
      val want = if (d >= 2) 10000L * 2 * tri(v) / (d * (d - 1)) else 0L
      assert(bp == want, s"lcc($v): got $bp want $want")
    }
  }

  test("q234 components equal sequential union-find over the fixture graph") {
    val n = Tables.documents(spark, TestSpark.sf).count()
    val parent = Array.tabulate(n.toInt)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    def union(a: Int, b: Int): Unit = {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).foreach { i =>
      (1L to (1 + i % 3)).foreach { k =>
        val j = (i * 7 + k) % n; if (i != j) union(i.toInt, j.toInt)
      }
    }
    // path-compress to component minima (union always roots at the min)
    val comp = Array.tabulate(n.toInt)(i => find(i).toLong)
    val size = comp.groupBy(identity).map { case (c, vs) => c -> vs.length.toLong }
    val got = Registry.queries("q234_connected_components")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == n)
    got.foreach { case (v, c, sz) =>
      assert(c == comp(v.toInt), s"component($v): got $c want ${comp(v.toInt)}")
      assert(sz == size(c), s"comp_size($v): got $sz want ${size(c)}")
    }
  }
}
