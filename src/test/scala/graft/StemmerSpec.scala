package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.clean.Porter2

/** Porter2 (Snowball English) vectors. The two blocks of word→stem pairs
  * are from the published sample vocabulary on the Snowball English
  * stemmer page (the consign… and knack… excerpts shown there), plus the
  * algorithm's own exceptional-forms table and per-step examples.
  */
class StemmerSpec extends AnyFunSuite {

  private def check(pairs: (String, String)*): Unit =
    pairs.foreach { case (w, s) =>
      assert(Porter2.stem(w) == s, s"stem($w) = ${Porter2.stem(w)}, want $s")
    }

  test("published sample vocabulary: consign block") {
    check(
      "consign" -> "consign", "consigned" -> "consign",
      "consigning" -> "consign", "consignment" -> "consign",
      "consist" -> "consist", "consisted" -> "consist",
      "consistency" -> "consist", "consistent" -> "consist",
      "consistently" -> "consist", "consisting" -> "consist",
      "consists" -> "consist",
      "consolation" -> "consol", "consolations" -> "consol",
      "consolatory" -> "consolatori",
      "console" -> "consol", "consoled" -> "consol", "consoles" -> "consol",
      "consolidate" -> "consolid", "consolidated" -> "consolid",
      "consolidating" -> "consolid",
      "consoling" -> "consol", "consolingly" -> "consol",
      "consols" -> "consol",
      "consonant" -> "conson",
      "consort" -> "consort", "consorted" -> "consort",
      "consorting" -> "consort",
      "conspicuous" -> "conspicu", "conspicuously" -> "conspicu",
      "conspiracy" -> "conspiraci",
      "conspirator" -> "conspir", "conspirators" -> "conspir",
      "conspire" -> "conspir", "conspired" -> "conspir",
      "conspiring" -> "conspir",
      "constable" -> "constabl", "constables" -> "constabl",
      "constance" -> "constanc", "constancy" -> "constanc",
      "constant" -> "constant")
  }

  test("published sample vocabulary: knack block") {
    check(
      "knack" -> "knack", "knackeries" -> "knackeri", "knacks" -> "knack",
      "knag" -> "knag",
      "knave" -> "knave", "knaves" -> "knave", "knavish" -> "knavish",
      "kneaded" -> "knead", "kneading" -> "knead",
      "knee" -> "knee",
      "kneel" -> "kneel", "kneeled" -> "kneel", "kneeling" -> "kneel",
      "kneels" -> "kneel", "knees" -> "knee",
      "knell" -> "knell", "knelt" -> "knelt", "knew" -> "knew",
      "knick" -> "knick", "knif" -> "knif", "knife" -> "knife",
      "knight" -> "knight", "knightly" -> "knight", "knights" -> "knight",
      "knit" -> "knit", "knits" -> "knit", "knitted" -> "knit",
      "knitting" -> "knit",
      "knives" -> "knive",
      "knob" -> "knob", "knobs" -> "knob",
      "knock" -> "knock", "knocked" -> "knock",
      "knocker" -> "knocker", "knockers" -> "knocker",
      "knocking" -> "knock", "knocks" -> "knock",
      "knopp" -> "knopp", "knot" -> "knot", "knots" -> "knot")
  }

  test("exceptional forms") {
    check(
      "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
      "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl",
      "ugly" -> "ugli", "early" -> "earli", "only" -> "onli",
      "singly" -> "singl",
      "sky" -> "sky", "news" -> "news", "howe" -> "howe",
      "atlas" -> "atlas", "cosmos" -> "cosmos", "bias" -> "bias",
      "andes" -> "andes",
      // invariants after step 1a
      "inning" -> "inning", "innings" -> "inning",
      "outing" -> "outing", "canning" -> "canning",
      "herring" -> "herring", "earring" -> "earring", "earrings" -> "earring",
      "proceed" -> "proceed", "exceed" -> "exceed", "succeed" -> "succeed")
  }

  test("per-step behaviors") {
    check(
      // 1a
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "tie",
      "caress" -> "caress", "cats" -> "cat", "gas" -> "gas",
      // 1b: eed in R1 → ee (then step 5 drops the final e again)
      "agreed" -> "agre", "feed" -> "feed",
      "plastered" -> "plaster", "bled" -> "bled",
      "motoring" -> "motor", "sing" -> "sing",
      // 1b post-rules: at/bl/iz +e, undouble, short-word +e
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz",
      "failing" -> "fail", "filing" -> "file",
      // 1c
      "happy" -> "happi", "dry" -> "dri", "say" -> "say",
      // gener-/commun-/arsen- R1 exceptions
      "generate" -> "generat", "generously" -> "generous",
      "general" -> "general",
      // steps 2-5
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "digitizer" -> "digit",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "callousness" -> "callous", "formality" -> "formal",
      "sensibility" -> "sensibl", "triplicate" -> "triplic",
      // 'ative' needs R2 in Porter2 (1980 deleted at m>1: form); here it
      // misses R2 so step 4 strips 'ive' instead; decorative reaches R2
      "formative" -> "format", "decorative" -> "decor",
      "formalize" -> "formal",
      "electricity" -> "electr", "electrical" -> "electr",
      "hopeful" -> "hope", "goodness" -> "good",
      "revival" -> "reviv", "allowance" -> "allow",
      "inference" -> "infer", "airliner" -> "airlin",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "irritant" -> "irrit", "replacement" -> "replac",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "communism" -> "communism",
      "activate" -> "activ", "effective" -> "effect")
  }

  test("published sample vocabulary: extended cross-section") {
    check(
      "abandon" -> "abandon", "abandoned" -> "abandon",
      "abandoning" -> "abandon", "abandonment" -> "abandon",
      "abate" -> "abat", "abated" -> "abat", "abatement" -> "abat",
      "accompany" -> "accompani", "accompanied" -> "accompani",
      "achieve" -> "achiev", "achieved" -> "achiev",
      "achievement" -> "achiev", "achievements" -> "achiev",
      "announce" -> "announc", "announced" -> "announc",
      "announcement" -> "announc", "announcing" -> "announc",
      "argue" -> "argu", "argued" -> "argu", "arguing" -> "argu",
      "arrange" -> "arrang", "arranged" -> "arrang",
      "arrangement" -> "arrang", "arranging" -> "arrang",
      "beauty" -> "beauti", "beautiful" -> "beauti",
      "beautifully" -> "beauti",
      "believe" -> "believ", "believed" -> "believ",
      "believing" -> "believ", "belief" -> "belief",
      "carefully" -> "care", "careful" -> "care",
      "careless" -> "careless", "carelessness" -> "careless",
      "cheerful" -> "cheer", "cheerfulness" -> "cheer",
      "develop" -> "develop", "developed" -> "develop",
      "developing" -> "develop", "development" -> "develop",
      "developments" -> "develop",
      "entertain" -> "entertain", "entertained" -> "entertain",
      "entertainment" -> "entertain",
      "happiness" -> "happi", "happily" -> "happili",
      "important" -> "import", "importance" -> "import",
      "improve" -> "improv", "improved" -> "improv",
      "improvement" -> "improv", "improvements" -> "improv",
      "manage" -> "manag", "managed" -> "manag",
      "management" -> "manag", "manager" -> "manag",
      "move" -> "move", "moved" -> "move", "movement" -> "movement",
      "moving" -> "move",
      "nation" -> "nation", "national" -> "nation",
      "nations" -> "nation",
      "observe" -> "observ", "observed" -> "observ",
      "observation" -> "observ", "observations" -> "observ",
      "occupy" -> "occupi", "occupied" -> "occupi",
      "occupation" -> "occup", "occupations" -> "occup",
      "organ" -> "organ", "organic" -> "organ",
      "organization" -> "organ", "organized" -> "organ",
      "possible" -> "possibl", "possibly" -> "possibl",
      "possibility" -> "possibl",
      "govern" -> "govern", "government" -> "govern",
      "governments" -> "govern", "governor" -> "governor")
  }

  test("stemTokens maps over arrays inside a plan") {
    import TestSpark.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = Seq(Seq("knights", "consoling", "skies"))
      .toDF("toks")
      .select(Porter2.stemTokens(col("toks")).as("s"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("knight", "consol", "sky"))
  }
}
