package graft.multimodal

import graft.QueryDef

object MultimodalQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
