package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analogue of the NIL-clustering stage (reference C1/B2,
  * RunKBPEntityLinkerSystem.clusterNils): mentions arrive as a stream and
  * each alias group gets ONE stable cluster id — the first-seen mention id —
  * assigned incrementally with `mapGroupsWithState` (the reference's
  * `fbidClusterMap.getOrElseUpdate` driver map becomes per-key distributed
  * state).
  *
  * The reference is batch-only (SURVEY.md §1.3); this is engine capability
  * for ingest-time linking: the state per alias is ONE string (the minted
  * cluster id), so state size is bounded by the number of DISTINCT aliases,
  * not the stream length. A long-running deploy would add a state TTL
  * (ProcessingTimeTimeout + setTimeoutDuration) to expire dormant aliases;
  * the operator here uses NoTimeout because processing-time timeouts make
  * `processAllAvailable` unreliable in tests (it never quiesces while
  * timeout batches keep scheduling) — the TTL is a one-line deploy switch.
  */
object StreamingLink {

  final case class MentionEvent(mentionId: String, alias: String)
  final case class LinkAssignment(mentionId: String, alias: String, clusterId: String)

  /** Per-alias state transition: mint "NIL:" + first mention id once, then
    * reuse it for every later arrival of the alias (first-writer-wins, the
    * reference's getOrElseUpdate semantics made deterministic per group
    * because Spark serializes calls per key).
    */
  private[streaming] def assign(
      alias: String,
      events: Iterator[MentionEvent],
      state: GroupState[String]): Iterator[LinkAssignment] = {
    val batch = events.toSeq
    val clusterId = state.getOption.getOrElse {
      val minted = "NIL:" + batch.map(_.mentionId).min // deterministic within batch
      state.update(minted)
      minted
    }
    batch.iterator.map(e => LinkAssignment(e.mentionId, e.alias, clusterId))
  }

  /** Wire the stateful assignment over a (possibly streaming) mention
    * Dataset. Output mode: update (one row per input mention).
    */
  def assignClusters(mentions: Dataset[MentionEvent]): Dataset[LinkAssignment] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    mentions
      .groupByKey(_.alias)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (alias: String, it: Iterator[MentionEvent], st: GroupState[String]) =>
          assign(alias, it, st).toSeq)
      .flatMap(identity)
  }
}
