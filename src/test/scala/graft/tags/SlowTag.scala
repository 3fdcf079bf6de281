package graft.tags

/** Per-test twin of the [[Slow]] suite annotation — same tag string, so
  * the single `-l graft.tags.Slow` argument in build.sbt excludes both
  * whole annotated suites and individually tagged tests.
  */
object SlowTag extends org.scalatest.Tag("graft.tags.Slow")
