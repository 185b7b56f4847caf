package graft.similarity

import graft.QueryDef

object SimilarityQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
