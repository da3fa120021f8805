package graft.functions

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions
import scala.collection.mutable.ArrayBuffer

/** Event-sequence aggregates (SURVEY.md §2.4): WINDOW_FUNNEL and
  * SEQUENCE_MATCH, Doris' per-group behavioral-analytics functions
  * ([doris: be/src/vec/aggregate_functions/aggregate_function_window_funnel.h],
  * [doris: .../aggregate_function_sequence_match.h]).
  *
  * Semantics implemented (documented because engines differ in corner cases):
  *  - window_funnel(window, steps): max L such that events e_1 < ... < e_L
  *    exist in ts order with step(e_i) = i and ts(e_L) - ts(e_1) <= window.
  *    Exact: every step-1 event is tried as chain start with greedy forward
  *    matching (greedy is optimal for a fixed start).
  *  - sequence_match(steps): true iff the step sequence occurs as a
  *    subsequence of the ts-ordered events (greedy scan — optimal for
  *    subsequence existence).
  *
  * Scale notes: typed Aggregators run as ObjectHashAggregate with map-side
  * partial aggregation; the shuffled state per group is the (ts, step) list of
  * *relevant* events only — callers pre-filter to the funnel's event types, so
  * state is bounded by per-user funnel activity, not total event volume. For
  * pathological groups (one user = billions of events) pre-bucket by
  * (user, time-bucket) first.
  */
object EventSeqAggregators {

  case class TsStep(ts: Long, step: Int)

  /** Funnel level reached scanning from anchor index `i` of `ev` (sorted by
    * (ts, step)) under `mode` — the single scan shared by the batch
    * aggregator and the streaming funnel, so batch/stream parity is parity
    * of the state plumbing, never of two divergent scan copies. */
  private[graft] def funnelLevelFrom(ev: Array[TsStep], i: Int,
      windowMicros: Long, numSteps: Int, mode: String): Int = {
    val limit = ev(i).ts + windowMicros
    var lvl = 1
    var lastTs = ev(i).ts
    var broken = false
    var j = i + 1
    while (!broken && j < ev.length && ev(j).ts <= limit && lvl < numSteps) {
      val st = ev(j).step
      mode match {
        case "increase" =>
          if (st == lvl + 1 && ev(j).ts > lastTs) { lvl += 1; lastTs = ev(j).ts }
        case "deduplication" =>
          if (st == lvl + 1) lvl += 1
          else if (st >= 1 && st <= lvl) broken = true
        case "fixed" =>
          if (st == lvl + 1) lvl += 1 else broken = true
        case _ =>
          if (st == lvl + 1) lvl += 1
      }
      j += 1
    }
    lvl
  }

  /** Doris window_funnel(window, mode, ts, e1, ..., eN). Modes
    * [doris: be/src/vec/aggregate_functions/aggregate_function_window_funnel.h]:
    *  - "default": any interleaving events allowed between matched steps;
    *  - "deduplication": a repeat of an ALREADY-matched step ends the chain;
    *  - "fixed": any funnel event other than the expected next step ends it;
    *  - "increase": matched steps must have strictly increasing timestamps.
    */
  class WindowFunnelAgg(windowMicros: Long, numSteps: Int, mode: String = "default")
      extends Aggregator[TsStep, ArrayBuffer[TsStep], Int] {
    override def zero: ArrayBuffer[TsStep] = ArrayBuffer.empty
    override def reduce(b: ArrayBuffer[TsStep], e: TsStep): ArrayBuffer[TsStep] = {
      if (e.step >= 1 && e.step <= numSteps) b += e
      b
    }
    override def merge(a: ArrayBuffer[TsStep], b: ArrayBuffer[TsStep]): ArrayBuffer[TsStep] = a ++= b
    override def finish(buf: ArrayBuffer[TsStep]): Int = {
      val ev = buf.sortBy(e => (e.ts, e.step)).toArray
      var best = 0
      var i = 0
      while (i < ev.length && best < numSteps) {
        if (ev(i).step == 1) {
          val lvl = funnelLevelFrom(ev, i, windowMicros, numSteps, mode)
          if (lvl > best) best = lvl
        }
        i += 1
      }
      best
    }
    override def bufferEncoder = Encoders.kryo[ArrayBuffer[TsStep]]
    override def outputEncoder = Encoders.scalaInt
  }

  /** Doris sequence_match('(?1)...(?N)', ts, e1, ..., eN) — subsequence form. */
  class SequenceMatchAgg(numSteps: Int)
      extends Aggregator[TsStep, ArrayBuffer[TsStep], Boolean] {
    override def zero: ArrayBuffer[TsStep] = ArrayBuffer.empty
    override def reduce(b: ArrayBuffer[TsStep], e: TsStep): ArrayBuffer[TsStep] = {
      if (e.step >= 1 && e.step <= numSteps) b += e
      b
    }
    override def merge(a: ArrayBuffer[TsStep], b: ArrayBuffer[TsStep]): ArrayBuffer[TsStep] = a ++= b
    override def finish(buf: ArrayBuffer[TsStep]): Boolean = {
      val ev = buf.sortBy(e => (e.ts, e.step)).toArray
      var want = 1
      var i = 0
      while (i < ev.length && want <= numSteps) {
        if (ev(i).step == want) want += 1
        i += 1
      }
      want > numSteps
    }
    override def bufferEncoder = Encoders.kryo[ArrayBuffer[TsStep]]
    override def outputEncoder = Encoders.scalaBoolean
  }

  /** Doris sequence_count('(?1)...(?N)', ts, e1..eN) — number of
    * NON-OVERLAPPING occurrences of the step pattern as a subsequence of the
    * ts-ordered events. Greedy left-to-right matching is optimal for
    * non-overlapping subsequence counting (earliest completion never blocks
    * a later match that a different completion would allow). */
  class SequenceCountAgg(numSteps: Int)
      extends Aggregator[TsStep, ArrayBuffer[TsStep], Long] {
    override def zero: ArrayBuffer[TsStep] = ArrayBuffer.empty
    override def reduce(b: ArrayBuffer[TsStep], e: TsStep): ArrayBuffer[TsStep] = {
      if (e.step >= 1 && e.step <= numSteps) b += e
      b
    }
    override def merge(a: ArrayBuffer[TsStep], b: ArrayBuffer[TsStep]): ArrayBuffer[TsStep] = a ++= b
    override def finish(buf: ArrayBuffer[TsStep]): Long = {
      val ev = buf.sortBy(e => (e.ts, e.step)).toArray
      var want = 1
      var n = 0L
      var i = 0
      while (i < ev.length) {
        if (ev(i).step == want) {
          if (want == numSteps) { n += 1; want = 1 } else want += 1
        }
        i += 1
      }
      n
    }
    override def bufferEncoder = Encoders.kryo[ArrayBuffer[TsStep]]
    override def outputEncoder = Encoders.scalaLong
  }

  /** Column API: window_funnel over (tsMicros, step) columns. */
  def window_funnel(windowMicros: Long, numSteps: Int, mode: String = "default")(
      ts: Column, step: Column): Column =
    functions.udaf(new WindowFunnelAgg(windowMicros, numSteps, mode),
      Encoders.product[TsStep]).apply(ts, step)

  def sequence_match(numSteps: Int)(ts: Column, step: Column): Column =
    functions.udaf(new SequenceMatchAgg(numSteps),
      Encoders.product[TsStep]).apply(ts, step)

  def sequence_count(numSteps: Int)(ts: Column, step: Column): Column =
    functions.udaf(new SequenceCountAgg(numSteps),
      Encoders.product[TsStep]).apply(ts, step)
}
