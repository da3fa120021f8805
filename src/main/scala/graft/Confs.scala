package graft

import org.apache.spark.sql.SparkSession

/** Session-conf hygiene utilities.
  *
  * Two distinct conf classes exist and need different treatment:
  *
  *  1. Execution-scoped knobs (shuffle partitions, state-store provider):
  *     consumed eagerly inside the operator body — a stream's state-partition
  *     count and store provider are frozen at `.start()`. These use
  *     [[withConf]]: set, run, restore — no other key ever observes the
  *     mutation, so key order can't change results.
  *
  *  2. Read-schema knobs (`spark.sql.legacy.parquet.nanosAsLong`): consumed
  *     LAZILY — Spark re-reads the session conf at physical-planning time,
  *     which for a returned DataFrame is after the operator body exits
  *     (Verify/Bench call `.count()`/`.write` on the result). Save/restore
  *     around the body would silently break execution of every events-table
  *     query, so this one is an idempotent engine-wide default set through a
  *     single documented entry point ([[ensureNanosAsLong]]) with a single
  *     value — order-independent because every caller sets the same value.
  */
object Confs {

  /** Set `kvs`, run `body`, restore prior values (unset if previously unset). */
  def withConf[T](s: SparkSession, kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
    kvs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  /** Streaming keys: cap `spark.sql.shuffle.partitions` for the duration of
    * the stream so each stateful operator materializes `n` state-store
    * instances per micro-batch instead of inheriting the ambient session
    * parallelism (32 in the harness). On small per-batch volumes state-store
    * setup dominates wall-clock and scales with the partition count, not the
    * data; at production scale the same knob is raised per-stream to match
    * throughput — the point is that state parallelism is a per-stream
    * decision, never ambient config. The restore runs before the returned
    * read-back DataFrame executes, so batch post-processing keeps the
    * session's full parallelism. */
  def withStreamShuffle[T](s: SparkSession, n: Int = 4)(body: => T): T =
    withConf(s, "spark.sql.shuffle.partitions" -> n.toString)(body)

  /** events.ts is TIMESTAMP(NANOS) parquet; Spark 4 refuses NANOS unless the
    * legacy conf maps it to Long. Idempotent, single-value, engine-wide —
    * see object doc for why this one cannot be save/restored. */
  def ensureNanosAsLong(s: SparkSession): Unit =
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
}
