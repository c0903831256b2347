package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-domain admission quota — the ingest-edge twin of the
  * batch `sample_domain_cap` (G11). A batch corpus caps each source at
  * ceil(√n) AFTER seeing everything; a stream cannot know final domain
  * sizes, so the streaming-correct semantics is a PER-WINDOW quota: at
  * most `cap` documents admitted per (source, event-time window) — the
  * crawl-frontier rate limit that keeps one exploding domain (a spam
  * burst, a mirror network) from flooding the corpus between batch
  * re-balances. The admitted stream then flows into the same batch
  * capping/dedup passes on the accumulated store.
  *
  * Built on `flatMapGroupsWithState` keyed by (source, window): state
  * is ONE counter per active (domain, window) — O(active domains ×
  * windows inside the watermark horizon), freed by EventTimeTimeout
  * when the watermark passes the window end. Admission within a
  * micro-batch is deterministic: rows sort by (ts, doc_id) before the
  * quota applies, and `seq` records each doc's admission number so
  * downstream can re-derive the decision.
  *
  * At scale: the shuffle is on (source, window) — Zipf-skewed domains
  * land on one task per window, but the per-group work is the quota
  * counter, not the documents (rejected rows drop in-task), so a hot
  * domain costs its arrival rate once, never state.
  */
object DomainCapStream {

  case class CapDoc(doc_id: Long, ts: Timestamp, source: String)
  case class AdmitKey(source: String, window_start_us: Long)
  case class Admitted(
      source: String, window_start_us: Long, doc_id: Long, seq: Int)

  /** docs must have columns doc_id: long, ts: timestamp, source: string
    * and a watermark already set (the caller chooses lateness).
    */
  def admitted(
      docs: DataFrame,
      cap: Int,
      windowMinutes: Int = 60): Dataset[Admitted] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val winUs = windowMinutes * 60L * 1000000L

    docs.select("doc_id", "ts", "source").as[CapDoc]
      .groupByKey(d =>
        AdmitKey(d.source, (d.ts.getTime * 1000L / winUs) * winUs))
      .flatMapGroupsWithState[Int, Admitted](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, ds, state: GroupState[Int]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sofar = state.getOption.getOrElse(0)
            // micro-batch order is not guaranteed — admission must be
            // deterministic, so sort by (ts, doc_id) before the quota
            val sorted = ds.toSeq
              .sortBy(d => (d.ts.getTime, d.doc_id))
            val take = sorted.take(math.max(cap - sofar, 0))
            state.update(sofar + take.size)
            // free the counter once the watermark passes the window end
            // (clamped above the current watermark — Spark rejects a
            // timeout at-or-below it, reachable when a straggler lands
            // in an almost-expired window)
            state.setTimeoutTimestamp(
              math.max((key.window_start_us + winUs) / 1000L,
                state.getCurrentWatermarkMs() + 1000L))
            take.zipWithIndex.map { case (d, k) =>
              Admitted(key.source, key.window_start_us, d.doc_id,
                sofar + k + 1)
            }.iterator
          }
      }
  }
}
