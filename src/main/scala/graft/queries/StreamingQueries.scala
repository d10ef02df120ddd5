package graft.queries

/** Structured Streaming operators (tumbling/sliding/session windows,
  * stateful dedup) — populated by graft.streaming; see StreamingOps.
  */
object StreamingQueries {
  def queries: Seq[QueryDef] = Seq.empty
}
