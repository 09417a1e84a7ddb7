package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.connector.read.streaming.Offset
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, MemoryStream}

/** A [[MemoryStream]] whose checkpoint COMMIT is observable — the
  * delivery-guarantee hook for broker-acked inputs (Pulsar, NATS
  * JetStream): the reader thread enqueues messages WITHOUT acking, and
  * broker acks ride [[commit]], which Spark calls only after the batch
  * containing those offsets has committed to the checkpoint. A driver
  * crash between enqueue and commit therefore REDELIVERS from the
  * broker cursor instead of losing acked messages — at-least-once
  * across restarts, where ack-on-read (the reference's behavior and
  * this engine's until round 8) was at-most-once.
  *
  * Each reader `addData` call appends ONE message as one block, so the
  * committed [[LongOffset]] equals the count of enqueued messages — the
  * `onCommit(n)` callback acks exactly the first n. Downstream sinks
  * remain idempotent-per-batchId, so redelivered messages after a crash
  * re-produce the same (batch, rows) for consumer-side dedupe.
  *
  * Timing boundary, stated: Spark invokes a source's `commit(end)` while
  * CONSTRUCTING the batch after the one that processed `end`, so acks
  * lag one micro-batch — and a stream that goes quiet leaves its tail
  * unacked until the next arrival or restart. That is exactly the
  * at-least-once shape: the broker's ack-timeout redelivers the unacked
  * tail, never loses it.
  */
object CommitAckStream {
  // clear of MemoryStream.apply's own small counter so ids never collide
  private val ids = new AtomicInteger(1 << 20)
}

final class CommitAckStream[A: Encoder](spark: SparkSession,
    onCommit: Long => Unit)
  extends MemoryStream[A](CommitAckStream.ids.getAndIncrement(), spark, None) {

  override def commit(end: Offset): Unit = {
    super.commit(end)
    val n = end match {
      case l: LongOffset => l.offset
      case other => other.json.trim.toLong // LongOffset json IS the number
    }
    onCommit(n)
  }
}
