package graft.serve

import graft.QueryDef

object ServeQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
