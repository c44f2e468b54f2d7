package graft

/** Driver-side phase stopwatch for LIFECYCLE queries (q133/q142/q144/
  * q148/q149/q152): their registry rows honestly time a whole store
  * lifecycle — wipe, model init, N ingestion appends, maintenance, serve —
  * which buries the steady-state serve latency inside build cost (the
  * round-11 verdict's visibility gap: a serve regression hides inside a
  * 15 s lifecycle number; q136 made serve visible for ONE store, this
  * generalizes). Queries wrap their eager sections in [[timed]]; the
  * bench drains the accumulated per-phase seconds after each rep and
  * publishes a per-query `phases` map (per-phase MIN across reps, the
  * same estimator as the headline numbers).
  *
  * A phase must be EAGER (writes, localCheckpoints) to be attributable —
  * lazy plan construction costs nothing here and executes at the caller's
  * action. The lifecycle queries satisfy this by design: their serves are
  * localCheckpoint-materialized inside the query so the store tables can
  * be dropped before return.
  *
  * Driver-thread only (the bench and Verify run queries sequentially);
  * recording is two nanoTime calls per phase. Outside the bench the
  * records are simply never drained — harmless. */
object Phases {

  private val acc =
    scala.collection.mutable.LinkedHashMap[String, Double]()

  /** Time `body` and accumulate its wall seconds under `phase`. */
  def timed[T](phase: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally acc.synchronized {
      val dt = (System.nanoTime() - t0) / 1e9
      acc(phase) = acc.getOrElse(phase, 0d) + dt
    }
  }

  /** Return and clear everything recorded since the last drain. */
  def drain(): Map[String, Double] = acc.synchronized {
    val out = acc.toMap
    acc.clear()
    out
  }
}
