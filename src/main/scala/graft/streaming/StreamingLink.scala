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
  * not the stream length. For long-running deploys, pass `ttl` to expire
  * dormant aliases via ProcessingTimeTimeout (state removed on timeout; a
  * returning alias mints a FRESH cluster id — the deploy trade: bounded
  * state in exchange for id stability only within the TTL window). The
  * default stays NoTimeout because processing-time timeouts make
  * `processAllAvailable` unreliable in tests (it never quiesces while
  * timeout batches keep scheduling); the transition function itself is
  * TestGroupState-covered either way (StreamingSpec).
  */
object StreamingLink {

  final case class MentionEvent(mentionId: String, alias: String)
  final case class LinkAssignment(mentionId: String, alias: String, clusterId: String)

  /** Per-alias state transition: mint "NIL:" + first mention id once, then
    * reuse it for every later arrival of the alias (first-writer-wins, the
    * reference's getOrElseUpdate semantics made deterministic per group
    * because Spark serializes calls per key).
    */
  private[graft] def assign(
      alias: String,
      events: Iterator[MentionEvent],
      state: GroupState[String],
      ttl: Option[scala.concurrent.duration.Duration] = None): Iterator[LinkAssignment] = {
    // TTL expiry: Spark invokes the function once with an empty batch and
    // hasTimedOut set when no event arrived for the alias within the TTL —
    // drop the state (the dormant alias's id) and emit nothing
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val batch = events.toSeq
    val clusterId = state.getOption.getOrElse {
      val minted = "NIL:" + batch.map(_.mentionId).min // deterministic within batch
      state.update(minted)
      minted
    }
    // refresh the expiry clock on every batch that touches the alias
    ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
    batch.iterator.map(e => LinkAssignment(e.mentionId, e.alias, clusterId))
  }

  /** Wire the stateful assignment over a (possibly streaming) mention
    * Dataset. Output mode: update (one row per input mention). `ttl`
    * switches on ProcessingTimeTimeout state expiry for dormant aliases.
    */
  def assignClusters(mentions: Dataset[MentionEvent],
                     ttl: Option[scala.concurrent.duration.Duration] = None)
      : Dataset[LinkAssignment] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    mentions
      .groupByKey(_.alias)
      .mapGroupsWithState(timeoutConf)(
        (alias: String, it: Iterator[MentionEvent], st: GroupState[String]) =>
          assign(alias, it, st, ttl).toSeq)
      .flatMap(identity)
  }
}
