package graft.streaming

import java.util.concurrent.{ConcurrentHashMap, Executors}
import java.util.concurrent.atomic.AtomicLong

import scala.concurrent.{ExecutionContext, Future}
import scala.jdk.CollectionConverters._

/** E1/E2: typed publish/subscribe with predicate unsubscribe.
  *
  * Reference: legacy-java/.../EventPort.java:20-101 — `subscribe(type,
  * handler)` filters by event type, `unsubscribe(predicate)` removes
  * matching registrations, `publish` fans out synchronously to matching
  * handlers.
  *
  * This is the in-process control-plane bus (worker wake-ups, metric
  * hooks); the durable, replayable dataflow twin is the event-sourced
  * `sync_events` table + SyncEventStream — both exist in the reference
  * too (EventPort vs the sync log). Handlers run on the publisher's
  * thread, matching the reference's synchronous dispatch.
  */
object EventBus {
  final case class Subscription[E](id: Long, eventType: String, handler: E => Unit)

  // one ordered daemon worker shared by every bus — async deliveries never
  // hold the JVM open and never reorder relative to each other
  private[streaming] val asyncEc: ExecutionContext =
    ExecutionContext.fromExecutor(Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, "graft-eventbus-async")
      t.setDaemon(true)
      t
    })
}

final class EventBus[E] {
  import EventBus.Subscription

  private val subs = new ConcurrentHashMap[Long, Subscription[E]]()
  private val ids = new AtomicLong(0L)

  /** Register a handler for one event type ("*" = every type). Returns
    * the subscription id for targeted unsubscribe. */
  def subscribe(eventType: String)(handler: E => Unit): Long = {
    val id = ids.incrementAndGet()
    subs.put(id, Subscription(id, eventType, handler))
    id
  }

  def unsubscribe(id: Long): Boolean = subs.remove(id) != null

  /** Predicate unsubscribe (EventPort.java:66-74): drop every
    * subscription whose type matches. Returns how many were removed. */
  def unsubscribeWhere(p: String => Boolean): Int = {
    val doomed = subs.values.asScala.filter(s => p(s.eventType)).map(_.id).toSeq
    doomed.count(subs.remove(_) != null)
  }

  /** Fan out to handlers registered for this type (plus wildcards), in
    * subscription order. A throwing handler does not block the rest;
    * returns the number of handlers that ran cleanly. */
  def publish(eventType: String, event: E): Int =
    subs.values.asScala.toSeq.sortBy(_.id)
      .filter(s => s.eventType == "*" || s.eventType == eventType)
      .count { s =>
        try { s.handler(event); true }
        catch { case _: Exception => false }
      }

  /** Async publish (EventPort.java:20-101 carries both sync and async
    * forms): dispatch on a single daemon worker so the publisher never
    * blocks on slow handlers, while deliveries from one bus stay in
    * publish order (the reference's async port is an ordered queue, not
    * a free-for-all thread pool). */
  def publishAsync(eventType: String, event: E): Future[Int] =
    Future(publish(eventType, event))(EventBus.asyncEc)

  def subscriptionCount: Int = subs.size
}
