package graft.dedup

import graft.QueryDef

object DedupQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
