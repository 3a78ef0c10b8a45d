package graft.streaming

import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, Encoders}

/** Streaming as-of enrichment — the continuous twin of
  * [[graft.operators.Events.asofJoin]] (backward direction): every
  * right-type event is emitted joined to the most recent left-type
  * event of the same user seen so far, with the per-user latest-left
  * carried ACROSS micro-batches in the state store. This is the
  * stateful-join member of the streaming family the others don't
  * cover: sessions fold windows, upsert keeps last-per-key, checksum
  * folds a monoid — as-of is an ORDER-SENSITIVE join against state.
  *
  * State is one (ts_us, event_id) pair per user — O(users), the
  * smallest possible for the semantics. At scale the production form
  * adds a watermark + event-time timeout so idle users' state evicts
  * (the [[StreamingSessions]] pattern); the verification feed is
  * bounded and keeps NoTimeout.
  *
  * Batch-equivalence contract: within a batch, a user's events process
  * in (ts_us, event_id) order; fed batches split by event TIME (all of
  * batch N's events ≤ all of batch N+1's), so the state's latest-left
  * is exactly the batch window's "last left strictly before" for every
  * right event — the sink equals the batch as-of join, which is the
  * oracle. (A time-ordered feed is the Kafka-partition-per-key
  * assumption every streaming enrichment makes; out-of-order arrival
  * beyond the split is the watermark's job, not this operator's.) */
object StreamAsof {

  case class Evt(user_id: Long, ts_us: Long, event_id: Long, event_type: String)
  case class AsofState(ts_us: Long, event_id: Long)
  case class Enriched(event_id: Long, user_id: Long, ts_us: Long,
                      asof_event_id: Option[Long], asof_ts_us: Option[Long])

  val outputMode: OutputMode = OutputMode.Append()

  def apply(ds: Dataset[Evt], leftType: String, rightType: String): Dataset[Enriched] = {
    implicit val stateEnc = Encoders.product[AsofState]
    implicit val outEnc = Encoders.product[Enriched]
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(outputMode, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Evt],
         state: org.apache.spark.sql.streaming.GroupState[AsofState]) =>
          // a micro-batch's group iterator is unordered: restore the
          // (ts_us, event_id) total order before replaying the merge
          val evs = it.toVector.sortBy(e => (e.ts_us, e.event_id))
          var latest = state.getOption
          val out = Vector.newBuilder[Enriched]
          evs.foreach { e =>
            if (e.event_type == leftType) {
              latest = Some(AsofState(e.ts_us, e.event_id))
            } else if (e.event_type == rightType) {
              out += Enriched(e.event_id, e.user_id, e.ts_us,
                latest.map(_.event_id), latest.map(_.ts_us))
            }
          }
          latest.foreach(state.update)
          out.result().iterator
      }
  }
}
