package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.functions._

import graft.gen.SequenceGen
import graft.maintenance.Maintenance

/** Optimistic concurrency end-to-end: two writers race disjoint update
  * batches into one table; the loser's conflict must replan (not abort, not
  * double-apply) so BOTH land. Complements the conflict-abort path already
  * pinned in TokenTableSpec. */
class ConcurrentMergeSpec extends SparkSpec {

  test("stale-planned merge conflicts deterministically; the retry replans and lands") {
    val root = tmpDir("stale") + "/tbl"
    val t1 = SequenceGen.createTable(spark, root, 1000, 4)
    val t2 = graft.table.TokenTable.load(spark, root) // second writer handle
    // writer 2 rewrites every file while writer 1's plan state is stale
    Maintenance.compact(spark, t2, targetFileBytes = 1 << 20,
      smallFileThreshold = Some(64 << 20))
    val batch = SequenceGen.sequences(spark, 100) // same ids => updates
      .select(col("doc_id"), col("tokens"), col("n_tok"), lit("upd").as("source"))
    // plain merge planned from t1's stale snapshot must conflict, not corrupt
    intercept[graft.table.CommitConflictException] {
      Maintenance.mergeInto(spark, t1, batch)
    }
    // the retrying merge replans against the compacted snapshot and lands
    Maintenance.mergeIntoRetrying(spark, t1, batch)
    assert(t1.scan(spark).filter(col("source") === "upd").count() == 100)
    assert(t1.scan(spark).count() == 1000)
  }

  test("two racing merges both commit via replan-retry; content = both applied") {
    val t = SequenceGen.createTable(spark, tmpDir("race") + "/tbl", 2000, 6)
    val snaps0 = t.metadata.snapshots.size
    // disjoint halves, both touching every scattered seed file
    def upd(half: Int, src: String) = t.scan(spark)
      .filter(pmod(xxhash64(col("doc_id")), lit(2)) === half)
      .select(col("doc_id"), col("tokens"), col("n_tok"), lit(src).as("source"))
      .localCheckpoint() // pin the batch BEFORE the races mutate the table
    val a = upd(0, "ra")
    val b = upd(1, "rb")
    val na = a.count(); val nb = b.count()
    assert(na > 0 && nb > 0 && na + nb == 2000)
    // generous attempt + wall budgets: under a fully loaded test machine
    // (29 suites in parallel on a noisy shared host) the rename+conflict
    // retries and the two full CoW merge jobs can need far more than the
    // default headroom — an Await timeout here is a harness artifact, not
    // a concurrency bug, so the budget errs long
    val fa = Future(Maintenance.mergeIntoRetrying(spark, t, a, maxAttempts = 10))
    val fb = Future(Maintenance.mergeIntoRetrying(spark, t, b, maxAttempts = 10))
    val sa = Await.result(fa, 15.minutes)
    val sb = Await.result(fb, 15.minutes)
    t.refresh()
    assert(t.metadata.snapshots.size == snaps0 + 2, "both merges must commit")
    assert(sa.snapshotId != sb.snapshotId)
    val bySrc = t.scan(spark).groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("ra" -> na, "rb" -> nb), s"got $bySrc")
    // the loser's abandoned staging is GC-able, never referenced
    t.removeOrphans(0)
    assert(t.scan(spark).count() == 2000)
  }
}
