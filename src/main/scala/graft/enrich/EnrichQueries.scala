package graft.enrich

import graft.QueryDef

object EnrichQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
