package graft.queries

import graft.util.QueryDef

/** SFA-core queries (words, bags, index search) over the events table.
  * Populated by the transform/sfa packages; non-SQL-expressible parts are
  * rows-only, validated instead by ScalaTest parity suites (MFT ≡ DFT,
  * bins monotone, index ≡ brute-force scan).
  */
object SfaQ {
  val defs: Map[String, QueryDef] = Map.empty
}
