package graft.queries

import graft.QueryDef

/** Streaming parity — MV incremental maintenance replayed over the `events`
  * fixture, with a batch-SQL oracle (the MV invariant: incremental state ==
  * batch re-evaluation). Filled in with graft.engine.Mv. */
object StreamingParity {
  val defs: Seq[QueryDef] = Seq()
}
