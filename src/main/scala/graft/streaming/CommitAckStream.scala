package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.connector.read.streaming.Offset
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, MemoryStream}

/** A [[MemoryStream]] that DEFERS broker acks to checkpoint commit — the
  * delivery-guarantee core shared by the Pulsar and NATS JetStream
  * inputs: the reader thread [[enqueue]]s each message together with its
  * ack token WITHOUT acking, and `ackOne` runs for a message only after
  * Spark has committed the micro-batch holding it. A driver crash
  * between enqueue and commit therefore REDELIVERS from the broker
  * cursor instead of losing acked messages — at-least-once across
  * restarts, where ack-on-read (the reference's behavior and this
  * engine's until round 8) was at-most-once.
  *
  * The enqueue/ack bookkeeping lives HERE, under one lock, because the
  * correctness invariant is offset arithmetic this class owns: each
  * `enqueue` adds ONE message as one block, and MemoryStream offsets
  * START AT -1, so a committed [[LongOffset]] `k` means messages
  * `0..k` — `k + 1` of them — are safe to ack (an earlier revision
  * acked only `k` and permanently starved the newest message of its
  * ack, an endless redeliver-duplicate loop at ack_wait cadence).
  *
  * Timing boundary, stated: Spark invokes a source's `commit(end)` while
  * CONSTRUCTING the batch after the one that processed `end`, so acks
  * lag one micro-batch — and a stream that goes quiet leaves its tail
  * unacked until the next arrival or restart. That is exactly the
  * at-least-once shape: the broker's ack-timeout redelivers the unacked
  * tail, never loses it; downstream sinks stay idempotent-per-batchId
  * for consumer-side dedupe of redeliveries.
  *
  * Ack failures (connection closed mid-shutdown) are swallowed: the
  * broker redelivers the unacked message, which at-least-once permits.
  */
object CommitAckStream {
  // clear of MemoryStream.apply's own small counter so ids never collide
  private val ids = new AtomicInteger(1 << 20)
}

final class CommitAckStream[A: Encoder, T](spark: SparkSession,
    ackOne: T => Unit)
  extends MemoryStream[A](CommitAckStream.ids.getAndIncrement(), spark, None) {

  private val lock = new Object
  private val unacked = new scala.collection.mutable.Queue[T]()
  private var ackedThrough = 0L

  /** Append one message and its ack token under ONE lock, so the stream
    * offset always counts exactly the tokens queued. */
  def enqueue(row: A, token: T): Unit = lock.synchronized {
    addData(row)
    unacked.enqueue(token)
  }

  override def commit(end: Offset): Unit = {
    super.commit(end)
    val committedMessages = 1L + (end match {
      case l: LongOffset => l.offset
      case other => other.json.trim.toLong // LongOffset json IS the number
    })
    lock.synchronized {
      while (ackedThrough < committedMessages && unacked.nonEmpty) {
        val token = unacked.dequeue()
        try ackOne(token)
        catch { case _: java.io.IOException => () } // closed: broker redelivers
        ackedThrough += 1
      }
    }
  }
}
