package graft.clean

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Porter2 ("Snowball English") stemmer — the algorithm the reference
  * actually applies to token lists (`SnowballStemmer`, NB cell 65 ln 2353,
  * SURVEY F7/U5), as published at snowballstem.org (M.F. Porter, 2001;
  * the 2005 revision that NLTK's EnglishStemmer implements). Replaces the
  * round-2 Porter-1980 implementation, closing the dialect divergence the
  * round-3 verdict flagged (they differ on e.g. `agreed` → agree vs agre,
  * and Porter2's exceptional forms skis/dying/early/…).
  *
  * No Spark built-in exists, so this is one of the two genuine UDFs in
  * the engine (SURVEY §7.3); it runs AFTER tokenization on short strings
  * and never sits in a join/filter hot path.
  *
  * Structure: the y-marking prelude and the R1/R2 region starts are
  * computed once per word; suffix steps only ever shorten the word from
  * the right (or re-append a fixed tail after testing), so "suffix lies
  * in R1/R2" stays a simple index comparison against the fixed region
  * starts. `Y` marks consonant-y and is excluded from the vowel set until
  * the final un-marking.
  */
object Porter2 {

  private val vowels = "aeiouy" // marked 'Y' is a consonant by exclusion

  private def isVowel(c: Char): Boolean = vowels.indexOf(c) >= 0

  /** Exceptional forms, applied before any step. */
  private val exception1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  /** Invariant forms checked after step 1a. */
  private val exception2: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  /** First position i ≥ from+1 with word(i-1) vowel and word(i) non-vowel;
    * the region starts at i+1 (= word.length when no such pair exists).
    */
  private def regionStart(w: String, from: Int): Int = {
    var i = from + 1
    while (i < w.length && !(isVowel(w.charAt(i - 1)) && !isVowel(w.charAt(i))))
      i += 1
    if (i >= w.length) w.length else i + 1
  }

  /** Short syllable at the END of w: vowel + non-vowel (≠ w/x/Y) preceded
    * by a non-vowel, or a vowel at position 0 followed by a non-vowel.
    */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) isVowel(w.charAt(0)) && !isVowel(w.charAt(1))
    else n >= 3 && {
      val (a, b, c) = (w.charAt(n - 3), w.charAt(n - 2), w.charAt(n - 1))
      !isVowel(a) && isVowel(b) && !isVowel(c) && "wxY".indexOf(c) < 0
    }
  }

  private def containsVowel(w: String): Boolean = w.exists(isVowel)

  private val doubles =
    Seq("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

  private val liEnding = "cdeghkmnrt"

  def stem(input: String): String = {
    if (input.length <= 2) return input
    exception1.get(input) match {
      case Some(e) => return e
      case None =>
    }
    var w = if (input.startsWith("'")) input.substring(1) else input
    if (w.length <= 2) return w

    // prelude: mark consonant y as Y (initial y, or y after a vowel)
    {
      val sb = new StringBuilder(w)
      if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
      var i = 1
      while (i < sb.length) {
        if (sb.charAt(i) == 'y' && isVowel(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
        i += 1
      }
      w = sb.toString
    }

    // R1/R2 starts, fixed for the rest of the algorithm (steps only
    // shorten from the right). gener-/commun-/arsen- pin R1 per the spec.
    val p1 =
      if (w.startsWith("gener")) 5
      else if (w.startsWith("commun")) 6
      else if (w.startsWith("arsen")) 5
      else regionStart(w, 0)
    val p2 = if (p1 >= w.length) w.length else regionStart(w, p1)
    def inR1(suffixLen: Int) = w.length - suffixLen >= p1
    def inR2(suffixLen: Int) = w.length - suffixLen >= p2

    // step 0: longest of  's'  's  '
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      w = if (w.length > 4) w.dropRight(2) else w.dropRight(1)
    else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s") &&
        w.substring(0, (w.length - 2) max 0).exists(isVowel))
      w = w.dropRight(1)

    if (exception2.contains(w)) return w

    // step 1b (longest matching suffix decides; no fallback to shorter)
    val s1b = Seq("eedly", "ingly", "edly", "eed", "ing", "ed")
      .find(w.endsWith)
    s1b match {
      case Some(s @ ("eedly" | "eed")) =>
        if (inR1(s.length)) w = w.dropRight(s.length) + "ee"
      case Some(s) =>
        val stem0 = w.dropRight(s.length)
        if (containsVowel(stem0)) {
          w = stem0
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz"))
            w = w + "e"
          else if (doubles.exists(w.endsWith)) w = w.dropRight(1)
          else if (p1 >= w.length && endsShortSyllable(w)) w = w + "e"
        }
      case None =>
    }

    // step 1c: y/Y → i after a non-vowel that is not the first letter
    if ((w.endsWith("y") || w.endsWith("Y")) && w.length > 2 &&
        !isVowel(w.charAt(w.length - 2)))
      w = w.dropRight(1) + "i"

    // step 2 (suffix must lie in R1)
    val step2: Seq[(String, String)] = Seq(
      "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
      "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
      "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
      "ation" -> "ate", "alism" -> "al", "aliti" -> "al",
      "ousli" -> "ous", "iviti" -> "ive", "fulli" -> "ful",
      "enci" -> "ence", "anci" -> "ance", "abli" -> "able",
      "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
      "bli" -> "ble", "ogi" -> "og", "li" -> "")
    step2.find { case (s, _) => w.endsWith(s) }.foreach { case (s, r) =>
      if (inR1(s.length)) {
        if (s == "ogi") {
          if (w.length > 3 && w.charAt(w.length - 4) == 'l')
            w = w.dropRight(s.length) + r
        } else if (s == "li") {
          if (w.length > 2 && liEnding.indexOf(w.charAt(w.length - 3)) >= 0)
            w = w.dropRight(s.length)
        } else w = w.dropRight(s.length) + r
      }
    }

    // step 3 (suffix in R1; `ative` additionally needs R2)
    val step3: Seq[(String, String)] = Seq(
      "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
      "icate" -> "ic", "iciti" -> "ic", "ative" -> "",
      "ical" -> "ic", "ness" -> "", "ful" -> "")
    step3.find { case (s, _) => w.endsWith(s) }.foreach { case (s, r) =>
      if (inR1(s.length)) {
        if (s == "ative") { if (inR2(s.length)) w = w.dropRight(s.length) }
        else w = w.dropRight(s.length) + r
      }
    }

    // step 4 (suffix in R2; `ion` only after s/t)
    val step4: Seq[String] = Seq(
      "ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
      "ion", "al", "er", "ic")
    step4.find(w.endsWith).foreach { s =>
      if (inR2(s.length)) {
        if (s == "ion") {
          if (w.length > 3 && "st".indexOf(w.charAt(w.length - 4)) >= 0)
            w = w.dropRight(s.length)
        } else w = w.dropRight(s.length)
      }
    }

    // step 5
    if (w.endsWith("e") &&
        (inR2(1) || (inR1(1) && !endsShortSyllable(w.dropRight(1)))))
      w = w.dropRight(1)
    else if (w.endsWith("l") && inR2(1) && w.length > 1 &&
        w.charAt(w.length - 2) == 'l')
      w = w.dropRight(1)

    w.replace('Y', 'y')
  }

  /** Stem every element of a token array (the reference's
    * `[stemmer.stem(w) for w in tokens]`).
    */
  val stemTokens: Column => Column = {
    val f = udf((toks: Seq[String]) => if (toks == null) null else toks.map(stem))
    (c: Column) => f(c)
  }
}
