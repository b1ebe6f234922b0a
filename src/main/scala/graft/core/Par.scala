package graft.core

/** Overlap two INDEPENDENT Spark actions (optimization guide §2.6):
  * the scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially. The store-maintenance phases write several
  * derived artifacts (stats sidecar + dict sidecar, postings-store
  * compaction + stats-store compaction) whose jobs are tiny at gate
  * scale and tail-heavy at cluster scale; running each pair
  * concurrently lets the second job's tasks back-fill the first's
  * stragglers and halves the driver's job-boundary dead time.
  *
  * ONLY for actions with no ordering dependency and disjoint write
  * targets — each caller documents why its pair commutes. Exceptions
  * from either side propagate; the primary side always waits for the
  * secondary to settle first, so no write is ever abandoned mid-flight
  * behind a thrown exception.
  */
object Par {

  def both[A, B](a: => A, b: => B): (A, B) = {
    val fb = new java.util.concurrent.FutureTask(() => b)
    val t = new Thread(fb, "graft-par-secondary")
    t.setDaemon(true)
    t.start()
    val ra =
      try a
      catch {
        case e: Throwable =>
          // let the secondary settle before surfacing the primary's
          // failure — a caller's finally (lease release) must not run
          // while the secondary still writes under that lease
          try fb.get()
          catch { case s: Throwable => e.addSuppressed(s) }
          throw e
      }
    val rb =
      try fb.get()
      catch {
        case e: java.util.concurrent.ExecutionException => throw e.getCause
      }
    (ra, rb)
  }
}
