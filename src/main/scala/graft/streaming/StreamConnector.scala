package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * The plug-in point for unbounded stream brokers — the Spark recast of the
 * reference's StreamConnector contract (reference nodestream/pipeline/
 * extractors/streams/extractor.py:47-99): `connect`, then a poll loop where
 * a non-empty poll yields records and an empty poll is the Flush signal
 * that drives a writer flush downstream. Here each poll becomes exactly one
 * Structured-Streaming micro-batch (micro-batch boundary == Flush,
 * SURVEY.md §2.6), so any sink built on `foreachBatch` — e.g.
 * [[Incremental.streamAppend]]'s atomic per-batch table commit — gets the
 * reference's flush-per-poll semantics for free.
 *
 * A Kafka broker is absent in this environment, so the shipped
 * implementations are [[IterableStreamConnector]] (bounded replay, tests)
 * — but the trait is exactly the surface a KafkaStreamConnector implements
 * (reference …/streams/kafka.py:53-129): `poll(maxRecords)` maps to
 * `consumer.poll(timeout, max_records)`, `disconnect` to `consumer.close`.
 */
trait StreamConnector[T] {
  /** Open the broker connection / subscribe. */
  def connect(): Unit

  /** One poll: up to `maxRecords` records — the rate limit, like the
    * reference's `max_records` (kafka.py:87) — or empty, which signals a
    * Flush boundary to the pipeline. */
  def poll(maxRecords: Int): Seq[T]

  /** Release the broker connection. */
  def disconnect(): Unit
}

/** Bounded replay connector: each element of `batches` is one poll's worth
  * of records; exhausted ⇒ every further poll is empty (a Flush), which is
  * how [[StreamConnector.drain]] knows to stop. */
final class IterableStreamConnector[T](batches: Iterator[Seq[T]]) extends StreamConnector[T] {
  private var connected = false
  private val buffer = scala.collection.mutable.Queue.empty[T]
  override def connect(): Unit = connected = true
  override def poll(maxRecords: Int): Seq[T] = {
    require(connected, "poll() before connect()")
    // records beyond maxRecords stay buffered for the next poll, like
    // unread offsets stay on a broker — a rate limit must not lose data
    if (buffer.isEmpty && batches.hasNext) buffer.enqueueAll(batches.next())
    Seq.fill(math.min(maxRecords, buffer.size))(buffer.dequeue())
  }
  override def disconnect(): Unit = connected = false
}

/**
 * A REAL unbounded connector: tails a spool directory for newly-arriving
 * files and emits their lines — the classic log-shipping feed (flume/
 * filebeat-style), and the second implementation that proves the trait
 * against something genuinely unbounded (files keep arriving while the
 * drain runs; an empty poll means "nothing new yet", exactly the
 * reference's Flush signal). Producers must land files atomically
 * (write-temp-then-rename, the universal spool-dir contract); files are
 * consumed whole, once, in (name) order — the name carries the ordering,
 * like a Kafka offset.
 */
final class DirectoryTailConnector(
    dir: java.nio.file.Path,
    suffix: String = ".jsonl",
    // an empty poll BLOCKS this long before returning, like
    // `consumer.poll(timeout)` — without it an idle drain loop would spin
    // through its empty-poll budget in microseconds
    pollWaitMs: Long = 50L) extends StreamConnector[String] {
  private var connected = false
  private val consumed = scala.collection.mutable.Set[String]()
  private val buffer = scala.collection.mutable.Queue.empty[String]
  /** Polls that returned at least one record (observability for tests/ops). */
  @volatile var pollsWithData: Int = 0

  override def connect(): Unit = {
    require(java.nio.file.Files.isDirectory(dir), s"$dir is not a directory")
    connected = true
  }

  override def poll(maxRecords: Int): Seq[String] = {
    require(connected, "poll() before connect()")
    if (buffer.isEmpty) {
      import scala.jdk.CollectionConverters._
      val fresh = {
        val s = java.nio.file.Files.list(dir)
        try s.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(suffix) &&
            !consumed.contains(p.getFileName.toString))
          .toSeq.sortBy(_.getFileName.toString)
        finally s.close()
      }
      // ONE file per refill: buffered memory is bounded by the largest
      // single spool file, never by a backlog of files — a deep backlog
      // drains across successive polls. (`consumed` holds one NAME per file
      // for the connector's lifetime — bytes per file, the same order of
      // state as a broker's offset map.)
      fresh.headOption.foreach { p =>
        buffer.enqueueAll(java.nio.file.Files.readAllLines(p).asScala)
        consumed += p.getFileName.toString
      }
    }
    val out = Seq.fill(math.min(maxRecords, buffer.size))(buffer.dequeue())
    if (out.nonEmpty) pollsWithData += 1
    else if (pollWaitMs > 0) Thread.sleep(pollWaitMs)
    out
  }

  override def disconnect(): Unit = connected = false
}

object StreamConnector {

  /**
   * Drive a connector through Structured Streaming: `sink` builds the
   * streaming query over the connector's record stream, then each non-empty
   * poll is pumped through as ONE micro-batch (the Flush), and
   * `maxConsecutiveEmptyPolls` empty polls end the drain — the reference's
   * idle-shutdown rule (extractor.py:71-80). Returns the record count.
   *
   * The poll loop itself is driver-side by design — it is control flow, one
   * `addData` call per poll; every record still flows through the engine's
   * distributed micro-batch machinery, exactly as a socket/Kafka source's
   * driver-side offset tracking does.
   */
  def drain[T: Encoder](
      spark: SparkSession,
      connector: StreamConnector[T],
      sink: Dataset[T] => StreamingQuery,
      maxRecords: Int = 1000,
      maxConsecutiveEmptyPolls: Int = 2): Long = {
    connector.connect()
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val stream = MemoryStream[T]
      val query = sink(stream.toDS())
      try {
        var empties = 0
        var n = 0L
        while (empties < maxConsecutiveEmptyPolls) {
          val records = connector.poll(maxRecords)
          if (records.isEmpty) empties += 1
          else {
            empties = 0
            n += records.size
            stream.addData(records)
            query.processAllAvailable() // poll boundary == Flush == one micro-batch
          }
        }
        query.processAllAvailable()
        n
      } finally query.stop()
    } finally connector.disconnect()
  }
}
