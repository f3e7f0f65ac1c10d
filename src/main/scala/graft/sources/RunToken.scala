package graft.sources

/** ONE per-JVM run token: every scratch path (round-trip dirs,
  * bucketed-table locations) shares it, so concurrent runs — even on
  * the same sfDir — get disjoint paths, and there is exactly one
  * cleanup convention to track. */
private[graft] object RunToken {
  val value: String = java.util.UUID.randomUUID().toString.take(8)
}
