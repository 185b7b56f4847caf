package graft.clean

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._


/** Text-cleaning column macros — the reference's `clean_post` pipeline
  * (NB cell 36 ln 1720: 7 chained `F.regexp_replace` + lower + a stopword
  * UDF) and the hot-path title cleaning (S/kinesis_processing_2.py:71-79),
  * re-expressed as pure Catalyst column expressions. No UDFs anywhere:
  * every operator here stays inside whole-stage codegen, which is what
  * makes this run at 100 TB — a Python/Scala UDF would break codegen and
  * serialize every row.
  */
object TextOps {

  /** Reference stopword inventory (S/kinesis_processing_2.py:16-31 carries
    * a standard 174-word English list; NB cell 36 uses nltk's). This is the
    * standard English core subset — enough to cover every stopword that can
    * occur in the testdata vocabulary while keeping oracle SQL literals
    * readable.
    */
  val stopwords: Seq[String] = Seq(
    "i", "me", "my", "we", "our", "you", "your", "he", "him", "his", "she",
    "her", "it", "its", "they", "them", "their", "what", "which", "who",
    "this", "that", "these", "those", "am", "is", "are", "was", "were", "be",
    "been", "being", "have", "has", "had", "do", "does", "did", "a", "an",
    "the", "and", "but", "if", "or", "because", "as", "until", "while", "of",
    "at", "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to", "from",
    "up", "down", "in", "out", "on", "off", "over", "under", "again", "then",
    "once", "here", "there", "when", "where", "why", "how", "all", "any",
    "both", "each", "few", "more", "most", "other", "some", "such", "no",
    "nor", "not", "only", "own", "same", "so", "than", "too", "very", "can",
    "will", "just", "should", "now")

  /** Stopwords as a literal array column (broadcast into codegen). */
  def stopwordArray: Column = array(stopwords.map(lit): _*)

  /** Stopwords as a DuckDB SQL list literal (for oracle queries). */
  def stopwordSqlList: String =
    stopwords.map(w => s"'$w'").mkString("[", ",", "]")

  /** The clean_post chain (NB cell 36): mask emails, mask URLs, strip
    * non-alphanumerics to spaces, collapse whitespace, trim, lowercase.
    * Regexes are written in the common Java-regex ∩ RE2 dialect so the
    * DuckDB oracle can run the identical patterns.
    */
  def cleanPost(c: Column): Column = {
    val email = regexp_replace(c, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "emailaddress")
    val url = regexp_replace(email, "(https?://|www\\.)[^ ]+", "website")
    val alnum = regexp_replace(url, "[^A-Za-z0-9 ]", " ")
    val collapsed = regexp_replace(alnum, " +", " ")
    lower(trim(collapsed))
  }

  /** Identical chain as DuckDB SQL over a column expression (note the 'g'
    * flag — DuckDB replaces only the first match by default).
    */
  def cleanPostSql(c: String): String =
    "lower(trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      s"$c, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', 'emailaddress', 'g')" +
      ", '(https?://|www\\.)[^ ]+', 'website', 'g')" +
      ", '[^A-Za-z0-9 ]', ' ', 'g')" +
      ", ' +', ' ', 'g')))"

  /** Whitespace tokenization (S/kinesis_processing_2.py:79 `title.split()`).
    * Single-space split to mirror DuckDB's non-regex `string_split`.
    */
  def tokens(c: Column): Column = split(c, " ")

  /** Stopword removal as a native higher-order filter — replaces the
    * reference's Python UDF (NB cell 36, SURVEY U1) with a codegen'd
    * expression. Preserves duplicates and order (unlike `array_except`,
    * which dedups — semantics differ from the reference's list filter).
    */
  def removeStopwords(tokensCol: Column): Column =
    filter(tokensCol, t => !array_contains(stopwordArray, t))
}
