package graft.queries

import graft.QueryDef

/** LLM-data-pipeline extension operators (dedup, similarity search, text
  * analysis, multimodal) — filled in as they land; see graft.operators. */
object Extensions {
  val defs: Seq[QueryDef] = Seq()
}
