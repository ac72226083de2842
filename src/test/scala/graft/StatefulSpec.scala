package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Stateful

/** Event-time stateful streaming: flatMapGroupsWithState sessionization
  * closes sessions both by a later out-of-gap event and by event-time
  * timeout, and never emits a session the watermark cannot yet prove closed. */
class StatefulSpec extends SparkSpec {
  import spark.implicits._

  private def ev(u: Long, sec: Long) = Stateful.Event(u, new Timestamp(sec * 1000))

  test("sessionize closes by gap, closes by event-time timeout, keeps open sessions") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Stateful.Event]
    val sessions = Stateful.sessionize(input.toDS(), gapMs = 60000, watermarkDelay = "0 seconds")
    val name = "sess_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = sessions.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // user 1: [5s, 30s] then an event at 200s (gap 60s exceeded) closes it
      // user 2: single event at 10s, closed later by timeout
      // note: an event at ts=0 would equal the initial watermark and be dropped as late
      input.addData(ev(1, 5), ev(1, 30), ev(1, 200), ev(2, 10))
      q.processAllAvailable()
      // watermark is now 200s: user 2's timeout (10s + 60s) fires on the next
      // batch; user 1's new session [1000s] stays open (timeout 1060s > wm)
      input.addData(ev(1, 1000))
      q.processAllAvailable()
      val out = spark.table(name).as[Stateful.Session].collect()
        .map(s => (s.user_id, s.start.getTime / 1000, s.end.getTime / 1000, s.n_events))
        .toSet
      assert(out == Set((1L, 5L, 30L, 2L), (1L, 200L, 200L, 1L), (2L, 10L, 10L, 1L)))
    } finally q.stop()
  }

  test("sessionize: a valid late event before the stored session is not absorbed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Stateful.Event]
    // generous watermark delay keeps early events valid across batches
    val sessions = Stateful.sessionize(input.toDS(), gapMs = 60000, watermarkDelay = "1 hour")
    val name = "sess_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = sessions.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(ev(3, 300))
      q.processAllAvailable()
      // late but valid: 100s is beyond the gap BEFORE [300,300] — it must
      // become its own earlier session, never extend [300,300]'s start
      input.addData(ev(3, 100))
      q.processAllAvailable()
      // and an in-gap late event (260s) must merge with [300,300]
      input.addData(ev(3, 260))
      q.processAllAvailable()
      // watermark is still 0 (max ts 300s − 1h): NOTHING may be emitted
      // yet — a valid late event could still extend [100,100]'s gap window
      assert(spark.table(name).isEmpty)
      // push the watermark to 3700s (7300 − 3600): both early sessions are
      // now provably closed; [7300,7300] stays open (7360 > 3700)
      input.addData(ev(3, 7300))
      q.processAllAvailable()
      val out = spark.table(name).as[Stateful.Session].collect()
        .map(s => (s.user_id, s.start.getTime / 1000, s.end.getTime / 1000, s.n_events)).toSet
      assert(out == Set((3L, 100L, 100L, 1L), (3L, 260L, 300L, 2L)))
    } finally q.stop()
  }

  test("sessionize: no phantom session when a late in-gap event follows an out-of-gap one") {
    // The append-mode soundness case: 300, then 100, then 150 (gap 60s,
    // 1h watermark). Eager emission would ship [100,100] before the
    // watermark proves it closed, and 150 — still valid — would then
    // surface as an unretractable phantom [150,150]. Correct output merges
    // them: [100,150].
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Stateful.Event]
    val sessions = Stateful.sessionize(input.toDS(), gapMs = 60000, watermarkDelay = "1 hour")
    val name = "sess_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = sessions.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(ev(4, 300))
      q.processAllAvailable()
      input.addData(ev(4, 100))
      q.processAllAvailable()
      input.addData(ev(4, 150)) // in-gap of [100,100]: must merge, not fork
      q.processAllAvailable()
      input.addData(ev(4, 7300)) // watermark → 3700s: close everything early
      q.processAllAvailable()
      val out = spark.table(name).as[Stateful.Session].collect()
        .map(s => (s.user_id, s.start.getTime / 1000, s.end.getTime / 1000, s.n_events)).toSet
      assert(out == Set((4L, 100L, 150L, 2L), (4L, 300L, 300L, 1L)))
    } finally q.stop()
  }

  test("sessionize merges in-gap events across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Stateful.Event]
    val sessions = Stateful.sessionize(input.toDS(), gapMs = 60000, watermarkDelay = "0 seconds")
    val name = "sess_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = sessions.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(ev(7, 100))
      q.processAllAvailable()
      input.addData(ev(7, 150)) // within gap: extends the open session
      q.processAllAvailable()
      input.addData(ev(7, 500)) // past gap: closes [100, 150] with 2 events
      q.processAllAvailable()
      val out = spark.table(name).as[Stateful.Session].collect()
        .map(s => (s.user_id, s.start.getTime / 1000, s.end.getTime / 1000, s.n_events))
        .toSet
      assert(out == Set((7L, 100L, 150L, 2L)))
    } finally q.stop()
  }
}
