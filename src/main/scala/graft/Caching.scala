package graft

import org.apache.spark.sql.Dataset

/** The library cache contract. Several operators persist intermediate
  * frames that are reused across joins or iterations (MinHash shingle
  * sets, Sessionize summaries, connected-component labels); a long-lived
  * session that never unpersists them leaks executor memory/disk.
  *
  * [[withCleanup]] scopes that lifetime: run an action (or any block that
  * fully materializes what it needs) while the frames stay cached, then
  * unpersist them whether the block succeeds or throws. Callers that hold
  * a LAZY result derived from a cached frame must materialize it inside
  * the block — after cleanup the cached partitions are gone and any
  * recomputation falls back to full lineage.
  */
object Caching {

  /** Evaluate `body`, then unpersist every frame in `cached` (non-blocking;
    * Spark drops the blocks asynchronously). Returns `body`'s result. */
  def withCleanup[A](cached: Dataset[_]*)(body: => A): A =
    try body
    finally cached.foreach(_.unpersist(blocking = false))
}
