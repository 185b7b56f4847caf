package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.util.Det

/** Deduplication operator family over `documents` — the training-data-
  * pipeline operators: exact dedup, blocked token-set Jaccard, word-n-gram
  * Jaccard, MinHash+LSH banding, and SimHash fingerprints.
  *
  * Determinism: Jaccard thresholds are integer-ratio comparisons
  * (`den·|A∩B| ≥ num·|A∪B|`) — no float compare anywhere near a boundary;
  * the emitted jaccard value itself is a single division of two small ints
  * (bit-identical in any engine). Hashes are the polynomial rolling hash
  * (Det.polyHash) — pure 64-bit integer math.
  *
  * Scale: the oracled pairwise queries are *blocked* (by `lang` here; by
  * any cheap partition key in production) so the join is co-partitioned and
  * each block is quadratic only locally. The LSH query is the real 100 TB
  * path: signature → band keys → shuffle on band key → candidate pairs →
  * exact verify; cost is Θ(candidates), not Θ(n²).
  */
object DedupQueries {

  private def toksDistinct(c: Column): Column = array_distinct(split(c, " "))

  /** Exact dedup (hash-groupBy on content): canonical id + group size.
    * One shuffle on the text hash; at scale, group on a 128-bit content
    * hash instead of the raw text to keep shuffle rows narrow.
    */
  private def q41(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("text")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
      .select("canonical_id", "n_copies")
      .orderBy("canonical_id")

  private val q41Sql =
    """SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY canonical_id""".stripMargin

  /** Near-dup pairs by token-set Jaccard ≥ 0.9, blocked by lang.
    * The exact (non-probabilistic) reference answer that q44's LSH
    * approximates.
    */
  private def q42(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), toksDistinct(col("text")).as("toks"))
    val a = docs.select(col("doc_id").as("id_a"), col("lang"), col("toks").as("toks_a"))
    val b = docs.select(col("doc_id").as("id_b"), col("lang"), col("toks").as("toks_b"))
    val inter = size(array_intersect(col("toks_a"), col("toks_b")))
    val union = size(col("toks_a")) + size(col("toks_b")) - inter
    a.join(b, Seq("lang"))
      .filter(col("id_a") < col("id_b"))
      .filter(inter * 10 >= union * 9)
      .select(col("id_a"), col("id_b"),
        (inter.cast("double") / union).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  private val q42Sql =
    """WITH t AS (
      |  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
      |  FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      |    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jaccard
      |FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |WHERE 10 * len(list_intersect(a.toks, b.toks))
      |  >= 9 * (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      |ORDER BY id_a, id_b""".stripMargin

  /** Word-bigram (shingle) Jaccard ≥ 0.1 — n-gram dedup variant; shingles
    * are far more discriminative than token sets on small vocabularies.
    */
  private def q43(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    val bigrams = array_distinct(
      when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
        .otherwise(array()))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), bigrams.as("bg"))
    val a = docs.select(col("doc_id").as("id_a"), col("lang"), col("bg").as("bg_a"))
    val b = docs.select(col("doc_id").as("id_b"), col("lang"), col("bg").as("bg_b"))
    val inter = size(array_intersect(col("bg_a"), col("bg_b")))
    val union = size(col("bg_a")) + size(col("bg_b")) - inter
    a.join(b, Seq("lang"))
      .filter(col("id_a") < col("id_b"))
      .filter(inter * 10 >= union)
      .select(col("id_a"), col("id_b"),
        (inter.cast("double") / union).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  private val q43Sql =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    list_distinct([string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |      for i in range(1, len(string_split(text,' ')))]) AS bg
      |  FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_intersect(a.bg, b.bg)) AS DOUBLE)
      |    / (len(a.bg) + len(b.bg) - len(list_intersect(a.bg, b.bg))) AS jaccard
      |FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |WHERE 10 * len(list_intersect(a.bg, b.bg))
      |  >= (len(a.bg) + len(b.bg) - len(list_intersect(a.bg, b.bg)))
      |ORDER BY id_a, id_b""".stripMargin

  /** MinHash signature parameters: k=16 permutations h_i(x)=(a_i·x+b_i)
    * mod p, banded 4×4. Constants are fixed odd multipliers / offsets
    * (pinned, seedless — Date.now-free determinism).
    */
  private[dedup] val P = 1000000007L
  private[dedup] val minhashParams: Seq[(Long, Long)] = Seq(
    (131L, 7L), (137L, 89L), (139L, 283L), (149L, 659L),
    (151L, 1021L), (157L, 1511L), (163L, 2039L), (167L, 2617L),
    (173L, 3181L), (179L, 3767L), (181L, 4349L), (191L, 4973L),
    (193L, 5641L), (197L, 6311L), (199L, 6997L), (211L, 7681L))

  private[dedup] def minhashSignature(toksD: Column): Seq[Column] = {
    val hashes = transform(toksD, t => Det.polyHash(t))
    minhashParams.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(hashes, h => (h * a + b) % P)).as(s"mh_$i")
    }
  }

  /** MinHash + LSH banded dedup (the 100 TB near-dup path): signatures →
    * 4 band keys per doc → shuffle on band key → same-bucket candidate
    * pairs → exact Jaccard verify ≥ 0.9. Probabilistic recall (≥ ~99% at
    * j=0.9 with 4×4 banding) → no SQL oracle; rows-only check + MinHashSpec
    * measures recall against q42's exact answer.
    */
  private def q44(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), toksDistinct(col("text")).as("toks"))
    val sig = docs.select(col("doc_id") +: col("lang") +: col("toks") +:
      minhashSignature(col("toks")): _*)
    val banded = sig.select(col("doc_id"), col("lang"), col("toks"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          concat_ws("_", (0 until 4).map(r => col(s"mh_${b * 4 + r}")): _*).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("lang"), col("toks"),
        concat_ws("#", col("bk.band"), col("bk.key")).as("band_key"))
    val a = banded.select(col("band_key"), col("doc_id").as("id_a"),
      col("lang").as("lang_a"), col("toks").as("toks_a"))
    val b = banded.select(col("band_key"), col("doc_id").as("id_b"),
      col("lang").as("lang_b"), col("toks").as("toks_b"))
    val candidates = a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b") && col("lang_a") === col("lang_b"))
      .select("id_a", "id_b", "toks_a", "toks_b")
      .dropDuplicates("id_a", "id_b")
    val inter = size(array_intersect(col("toks_a"), col("toks_b")))
    val union = size(col("toks_a")) + size(col("toks_b")) - inter
    candidates
      .filter(inter * 10 >= union * 9)
      .select(col("id_a"), col("id_b"), (inter.cast("double") / union).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** SimHash (32-bit) per document from distinct-token hashes — hamming-
    * proximity fingerprints for near-dup bucketing. Pure integer math →
    * fully oracled (SQL generated to mirror the 32 bit-votes).
    */
  private def q45(s: SparkSession, d: String): DataFrame = {
    val hashes = transform(toksDistinct(col("text")), t => Det.polyHash(t))
    val simhash = (0 until 32).map { i =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, i).bitwiseAND(lit(1L)) * 2 - 1))
      when(vote >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    Tables.documents(s, d)
      .select(col("doc_id"), simhash.as("simhash"))
      .orderBy("doc_id")
  }

  private val q45Sql = {
    val hs = "list_transform(list_distinct(string_split(text,' ')), " +
      s"t -> ${Det.polyHashSql("t")})"
    val terms = (0 until 32).map { i =>
      s"(CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(hs, x -> ((x >> $i) & 1) * 2 - 1)), (a,b) -> a+b) >= 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH h AS (SELECT doc_id, $hs AS hs FROM documents)
       |SELECT doc_id, $terms AS simhash FROM h ORDER BY doc_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q41_dedup_exact", q41, Some(q41Sql), "exact content dedup"),
    QueryDef("q42_jaccard_pairs", q42, Some(q42Sql), "blocked token-set Jaccard >=0.9"),
    QueryDef("q43_ngram_jaccard", q43, Some(q43Sql), "word-bigram Jaccard >=0.1"),
    QueryDef("q44_minhash_lsh", q44, None, "MinHash 4x4 LSH banded dedup (probabilistic; see MinHashSpec)"),
    QueryDef("q45_simhash", q45, Some(q45Sql), "32-bit SimHash fingerprint"))
}
