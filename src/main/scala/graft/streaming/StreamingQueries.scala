package graft.streaming

import graft.QueryDef

object StreamingQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
