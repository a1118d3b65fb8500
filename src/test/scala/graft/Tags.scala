package graft

import org.scalatest.Tag

/** Tests excluded from the default `sbt test` run (build.sbt filters
  * this tag) — run explicitly with
  * `sbt "testOnly <Spec> -- -n graft.Slow"`.
  */
object Slow extends Tag("graft.Slow")
