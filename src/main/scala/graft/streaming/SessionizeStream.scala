package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the Structured-Streaming twin of
  * the batch `q16_sessionize` operator, built on
  * `KeyValueGroupedDataset.flatMapGroupsWithState` (custom per-key state,
  * the Spark idiom for semantics windows can't express).
  *
  * Semantics match the batch op: a session is a maximal run of a user's
  * events with inter-event gaps ≤ `gapMinutes`. A session is emitted when
  * a longer gap arrives in-stream, or when the event-time watermark
  * passes `lastTs + gap` (EventTimeTimeout) — so results are exactly the
  * batch answer once the stream drains.
  *
  * At scale: state is one small record per ACTIVE user (not per event);
  * the shuffle is on user_id; the watermark bounds state lifetime —
  * idle users' sessions close and their state is freed.
  */
object SessionizeStream {

  case class SessEvent(user_id: Long, ts: Timestamp)
  case class SessState(startUs: Long, lastUs: Long, nEvents: Long)
  case class Session(
      user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** events must have columns user_id: long, ts: timestamp and a
    * watermark already set (the caller chooses lateness).
    */
  def sessions(events: DataFrame, gapMinutes: Int): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    events.select("user_id", "ts").as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, evs, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's close point → emit it
            val s = state.get
            state.remove()
            Iterator.single(Session(uid, s.startUs, s.lastUs, s.nEvents))
          } else {
            // micro-batch order is not guaranteed — sort by event time
            val times = evs.map(e => e.ts.getTime * 1000L).toSeq.sorted
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            times.foreach { us =>
              cur match {
                case Some(s) if us - s.lastUs <= gapUs =>
                  cur = Some(SessState(s.startUs, us, s.nEvents + 1))
                case Some(s) =>
                  closed += Session(uid, s.startUs, s.lastUs, s.nEvents)
                  cur = Some(SessState(us, us, 1))
                case None =>
                  cur = Some(SessState(us, us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the open session once the watermark passes its gap
              state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
