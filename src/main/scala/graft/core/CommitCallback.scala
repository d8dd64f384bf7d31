package graft.core

/** Post-commit extension hook (reference: paimon-core
  * `table/sink/CommitCallback.java:36` + CoreOptions `commit.callbacks`):
  * implementations listed (comma-separated class names) in the table option
  * `commit.callbacks` are instantiated reflectively (no-arg constructor)
  * and invoked after every successful commit — the seam for syncing new
  * partitions to an external metastore, emitting audit events, or marking
  * partitions done.
  *
  * Contract (same as the reference): the callback MUST be idempotent — a
  * crash between the durable commit and the callback means it may not fire
  * for that commit, and a retried commit path may fire it more than once.
  * Exceptions are logged and swallowed: a callback failure never fails the
  * already-durable write.
  */
trait CommitCallback {

  /** @param table   the committed table (schema, store and reads available)
    * @param snapshot the snapshot the commit produced
    * @param entries  the commit's manifest entries (ADDs and DELETEs)
    */
  def call(table: graft.table.GraftTable, snapshot: Snapshot,
      entries: Seq[ManifestEntry]): Unit
}
