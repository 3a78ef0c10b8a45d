package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.Dataset

/** Streaming k-anonymity release gate via `flatMapGroupsWithState` —
  * the continuous form of [[graft.operators.Profile.kAnonFilter]]: a
  * record may only be RELEASED downstream once its quasi-identifier
  * cell has accumulated at least k records, so no released row ever
  * describes a group smaller than k — including transiently, which is
  * the part the batch operator cannot give a live pipeline (filtering
  * each micro-batch independently would re-leak small cells that only
  * reach k across batches; filtering at the end isn't streaming).
  *
  * Per-cell state is a buffer of AT MOST k−1 held-back records plus one
  * released flag: the gate flushes and collapses to the flag the moment
  * the cell crosses k, and every later record passes straight through.
  * State is therefore O(cells · k) — bounded by the quasi-identifier
  * domain, never by stream length — and the released set at any drain
  * point equals the batch `kAnonFilter` of everything fed so far,
  * REGARDLESS of arrival order or micro-batch boundaries (the gate
  * commutes: buffered + arriving partitions into the same flush set).
  * That fixed-point equality is exactly what the DuckDB oracle replays.
  */
object StreamKAnon {

  case class Record(cell: String, sub: Long, id: Long)
  /** `released` = the cell crossed k (buffer is then always empty). */
  case class CellState(released: Boolean, buffered: List[Record])

  def gate(k: Int)(cell: (String, Long), recs: Iterator[Record],
                   state: GroupState[CellState]): Iterator[Record] = {
    val st = state.getOption.getOrElse(CellState(released = false, Nil))
    val arrived = recs.toList
    if (st.released) arrived.iterator
    else {
      val buf = st.buffered ++ arrived
      if (buf.size >= k) {
        state.update(CellState(released = true, Nil))
        buf.iterator
      } else {
        state.update(CellState(released = false, buf))
        Iterator.empty
      }
    }
  }

  /** Apply to a streaming (or batch) Dataset of records keyed by
    * (cell, sub). Use with `OutputMode.Append`. */
  def apply(records: Dataset[Record], k: Int): Dataset[Record] = {
    import records.sparkSession.implicits._
    records.groupByKey(r => (r.cell, r.sub))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout())(gate(k))
  }

  val outputMode: OutputMode = OutputMode.Append()
}
