package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.Dataset

/** Continuously-maintained upsert view — the streaming twin of
  * [[graft.operators.Diff.applyChangelog]] and the materialized-view
  * maintenance primitive: per key, state is the highest-seq change
  * record seen so far (CONSTANT per key — a (seq, op, value) triple),
  * and each micro-batch emits the keys whose current record changed.
  * The latest emission per key IS the view: op=U rows are the live
  * table, op=D rows are tombstones.
  *
  * At scale the state store shards by key exactly like the batch
  * merge's shuffle; a snapshot-read of the view = the latest emission
  * per key (what [[StreamEntries.streamUpsert]] reduces with max_by
  * and gates against the batch merge / dst identity). */
object StreamUpsert {

  case class Chg(key: String, value: String, seq: Long, op: String)
  case class KeyState(seq: Long, op: String, value: String)

  val outputMode: OutputMode = OutputMode.Update()

  /** Precedence identical to the batch merge's window
    * (`ORDER BY seq DESC, op ASC` → at equal seq, D beats U). */
  private def rank(seq: Long, op: String): (Long, Int) =
    (seq, if (op == "D") 1 else 0)

  def apply(changes: Dataset[Chg]): Dataset[Chg] = {
    import changes.sparkSession.implicits._
    implicit val ord: Ordering[(Long, Int)] = Ordering.Tuple2[Long, Int]
    changes.groupByKey(_.key)
      .mapGroupsWithState[KeyState, Chg](GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Chg], state: GroupState[KeyState]) =>
          val incoming = it.maxBy(c => rank(c.seq, c.op))
          val winner = state.getOption match {
            case Some(st) if ord.gteq(rank(st.seq, st.op),
                rank(incoming.seq, incoming.op)) => st
            case _ => KeyState(incoming.seq, incoming.op, incoming.value)
          }
          state.update(winner)
          Chg(key, winner.value, winner.seq, winner.op)
      }
  }
}
