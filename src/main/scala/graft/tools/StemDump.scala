package graft.tools

/** Dev-only: regenerates the pinned vocabulary→stem map embedded in
  * q49's oracle SQL (clean/TextQueries.stemMap). Run after a testdata
  * vocabulary change and paste the output back into the map literal.
  */
object StemDump {
  def main(args: Array[String]): Unit = {
    val vocab = Seq("a", "agg", "batch", "big", "column", "customer",
      "data", "dup", "fast", "filter", "group", "hash", "join", "key",
      "line", "merge", "order", "part", "query", "row", "scan", "slow",
      "small", "sort", "spark", "stream", "table", "the", "value",
      "vector", "window")
    vocab.foreach(w => println(w + "\t" + graft.clean.Porter2.stem(w)))
  }
}
