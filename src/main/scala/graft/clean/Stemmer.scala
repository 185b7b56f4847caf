package graft.clean

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Porter stemmer (Porter, "An algorithm for suffix stripping", Program
  * 14(3) 1980 — the published algorithm) — the reference applies Snowball
  * stemming to token lists (NB cell 65 ln 2353, SURVEY F7/U5). No Spark
  * built-in exists, so this is one of the two genuine UDFs in the engine
  * (SURVEY §7.3); it is applied AFTER tokenization so the UDF runs on
  * short strings, and never sits in a join/filter hot path.
  */
object Stemmer {

  private def isVowel(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** Measure m: number of VC sequences in the stem. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && !isVowel(w, i)) i += 1 // leading consonants
    while (i < n) {
      while (i < n && isVowel(w, i)) i += 1 // vowel run
      if (i < n) { m += 1; while (i < n && !isVowel(w, i)) i += 1 } // consonant run
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    w.indices.exists(isVowel(w, _))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w.last == w(w.length - 2) && !isVowel(w, w.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean =
    w.length >= 3 &&
      !isVowel(w, w.length - 3) && isVowel(w, w.length - 2) && !isVowel(w, w.length - 1) &&
      !"wxy".contains(w.last)

  private def replaceSuffix(w: String, suffix: String, repl: String,
      cond: String => Boolean): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.dropRight(suffix.length)
      if (cond(stem)) Some(stem + repl) else Some(w)
    } else None

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s") && w.length > 1) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    def post(s: String): String =
      if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
      else if (endsDoubleConsonant(s) && !"lsz".contains(s.last)) s.dropRight(1)
      else if (measure(s) == 1 && endsCvc(s)) s + "e"
      else s
    if (w.endsWith("eed")) {
      val stem = w.dropRight(3)
      if (measure(stem) > 0) w.dropRight(1) else w
    } else if (w.endsWith("ed") && containsVowel(w.dropRight(2))) post(w.dropRight(2))
    else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) post(w.dropRight(3))
    else w
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w.dropRight(1) + "i" else w

  private val step2Pairs = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val step3Pairs = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def applyPairs(w: String, pairs: Seq[(String, String)]): String =
    pairs.collectFirst {
      case (suf, repl) if w.endsWith(suf) =>
        val stem = w.dropRight(suf.length)
        if (measure(stem) > 0) stem + repl else w
    }.getOrElse(w)

  private def step4(w: String): String =
    step4Suffixes.collectFirst {
      case suf if w.endsWith(suf) =>
        val stem = w.dropRight(suf.length)
        val ok = measure(stem) > 1 &&
          (suf != "ion" || (stem.nonEmpty && "st".contains(stem.last)))
        if (ok) stem else w
    }.getOrElse(w)

  private def step5(w: String): String = {
    val a = if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) stem else w
    } else w
    if (a.endsWith("ll") && measure(a) > 1) a.dropRight(1) else a
  }

  /** Stem a single lowercase token. Words of length <= 2 are unchanged
    * (Porter's convention).
    */
  def stem(word: String): String =
    if (word == null || word.length <= 2) word
    else step5(step4(applyPairs(applyPairs(step1c(step1b(step1a(word))),
      step2Pairs), step3Pairs)))

  /** UDF over a token array (the NB cell 65 shape: stem every token). */
  val stemTokensUdf = udf((tokens: Seq[String]) =>
    if (tokens == null) null else tokens.map(stem))

  def stemTokens(tokens: Column): Column = stemTokensUdf(tokens)
}
