package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.gen.SequenceGen
import graft.table.TokenTable

/** Named snapshot refs: tag pinning, branch write-audit-publish with the
  * ancestry contract, rollback, and expire/GC safety for ref targets. */
class RefsSpec extends SparkSpec {

  private def checksum(df: DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("doc_id"), col("tokens")))).head
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def fresh(): TokenTable =
    SequenceGen.createTable(spark, tmpDir("refs") + "/tbl", 1500, 4)

  private def batch(n: Long, seed: Long) =
    SequenceGen.sequences(spark, n, seed)
      .withColumn("doc_id", concat(lit("x"), col("doc_id")))

  test("a tag pins its snapshot across later commits; expire retains the target") {
    val t = fresh()
    val pinned = checksum(t.scan(spark))
    t.setRef("prod", t.metadata.currentSnapshotId.get, "tag")
    t.commit("append", t.stageWrite(batch(200, 7), "later"))
    assert(checksum(t.scanRef(spark, "prod")) == pinned)
    assert(checksum(t.scan(spark)) != pinned)
    t.expireSnapshots(retainLast = 1)
    // the tag target survives retainLast=1 and still scans
    assert(checksum(t.scanRef(spark, "prod")) == pinned)
    val removed = t.removeOrphans(0)
    assert(checksum(t.scanRef(spark, "prod")) == pinned,
      s"GC broke the pinned tag (removed: $removed)")
  }

  test("branch commits are invisible on main until fastForward publishes them") {
    val t = fresh()
    val main0 = checksum(t.scan(spark))
    t.commit("append", t.stageWrite(batch(300, 11), "audit-1"), branch = Some("audit"))
    t.commit("append", t.stageWrite(batch(100, 13), "audit-2"), branch = Some("audit"))
    assert(checksum(t.scan(spark)) == main0, "unpublished branch leaked")
    assert(checksum(t.scanRef(spark, "audit"))._1 == main0._1 + 400)
    t.fastForward("audit")
    assert(checksum(t.scan(spark))._1 == main0._1 + 400)
  }

  test("fastForward refuses when main advanced past the branch point") {
    val t = fresh()
    t.commit("append", t.stageWrite(batch(50, 17), "br"), branch = Some("audit"))
    // main-line commit the branch never saw
    t.commit("append", t.stageWrite(batch(60, 19), "mainline"))
    intercept[IllegalArgumentException] { t.fastForward("audit") }
  }

  test("rollback returns the main line to an earlier snapshot") {
    val t = fresh()
    val s0 = t.metadata.currentSnapshotId.get
    val before = checksum(t.scan(spark))
    t.commit("append", t.stageWrite(batch(80, 23), "extra"))
    assert(checksum(t.scan(spark)) != before)
    t.rollbackTo(s0)
    assert(checksum(t.scan(spark)) == before)
  }

  test("tags are immutable: commit(branch = tagName) is rejected") {
    val t = fresh()
    t.setRef("v1", t.metadata.currentSnapshotId.get, "tag")
    intercept[IllegalArgumentException] {
      t.commit("append", t.stageWrite(batch(10, 29), "totag"), branch = Some("v1"))
    }
  }

  test("expire keeps a branch's ancestor chain so it can still publish") {
    val t = fresh()
    t.commit("append", t.stageWrite(batch(40, 31), "a1"), branch = Some("audit"))
    t.commit("append", t.stageWrite(batch(40, 37), "a2"), branch = Some("audit"))
    t.expireSnapshots(retainLast = 1)
    // the intermediate branch snapshot survived; publish still proves ancestry
    t.fastForward("audit")
    assert(checksum(t.scan(spark))._1 == 1500 + 80)
  }

  test("rollback refuses a snapshot reachable only via a branch ref") {
    val t = fresh()
    val sBranch = t.commit("append", t.stageWrite(batch(30, 41), "br-only"),
      branch = Some("audit")).snapshotId
    // an advance of the main line puts the branch snapshot off the main chain
    t.commit("append", t.stageWrite(batch(20, 43), "mainline2"))
    // rolling "back" onto the branch head would publish unaudited commits
    intercept[IllegalArgumentException] { t.rollbackTo(sBranch) }
    // a genuine ancestor still works
    val s0 = Iterator.iterate(t.metadata.currentSnapshot)(
      _.flatMap(_.parentId).flatMap(t.metadata.snapshot))
      .takeWhile(_.nonEmpty).flatten.toSeq.last.snapshotId
    t.rollbackTo(s0)
  }

  test("unknown refs and unknown snapshots fail loudly") {
    val t = fresh()
    intercept[NoSuchElementException] { t.refSnapshotId("nope") }
    intercept[IllegalArgumentException] { t.setRef("bad", 99999L) }
    intercept[IllegalArgumentException] { t.rollbackTo(99999L) }
  }
}
