package graft.clean

import graft.QueryDef

object TextQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
