package graft

import java.nio.file.{Files, Paths}

import graft.gen.SequenceGen
import graft.maintenance.Maintenance
import graft.table.{DataFileMeta, TableJson, TokenTable}

/** Commit metadata cost at streaming ingest rates: every commit used to
  * rewrite v{N}.json with the FULL snapshot log's manifest lists inline, so
  * per-commit metadata bytes grew O(history x manifests) — quadratic for a
  * per-trigger merge-on-read writer. With per-snapshot manifest-list files
  * (the Iceberg shape) the version file carries only headers, and a commit
  * writes one new list file sized by the CURRENT snapshot. */
class MetadataScaleSpec extends SparkSpec {

  private def entry(i: Int): DataFileMeta = {
    val id = f"doc$i%012d"
    DataFileMeta(path = s"data/c$i/$id.parquet", records = 1, bytes = 100,
      minDocId = id, maxDocId = id, minNTok = 16, maxNTok = 512,
      sumNTok = 100L, sources = Seq("web"))
  }

  /** Bytes of metadata written BY commit number `n`: the version file plus
    * the new snapshot's manifest-list file. */
  private def commitBytes(root: String, t: TokenTable): Long = {
    val v = t.currentVersion()
    val vLen = Files.size(Paths.get(root, s"metadata/v$v.json"))
    val listLen = t.metadata.currentSnapshot.get.manifestList
      .map(rel => Files.size(Paths.get(root, s"metadata/$rel"))).getOrElse(0L)
    vLen + listLen
  }

  test("1000 streaming commits: per-commit metadata bytes stay flat under steady-state maintenance") {
    val root = tmpDir("md-scale") + "/tbl"
    val t = TokenTable.create(spark, root)
    var sampleAt100 = 0L
    var sampleAt1000 = 0L
    (1 to 1000).foreach { i =>
      t.commit("append", Seq(entry(i)))
      // production steady state: periodic manifest compaction + history
      // retention — exactly what a per-trigger streaming writer schedules
      if (i % 100 == 0) {
        Maintenance.rewriteManifests(t, entriesPerManifest = 10000)
        t.expireSnapshots(retainLast = 8)
      }
      if (i == 100) sampleAt100 = commitBytes(root, t)
      if (i == 1000) sampleAt1000 = commitBytes(root, t)
    }
    assert(t.liveFiles().size == 1000)
    // flat = independent of total history; allow slack for the growing live
    // file set's single rewritten manifest META entry and longer paths
    assert(sampleAt1000 <= sampleAt100 * 2,
      s"commit metadata grew: $sampleAt100 B at commit 100 -> $sampleAt1000 B at commit 1000")
    // the version file itself must carry zero manifest entries
    val vJson = Files.readString(Paths.get(root, s"metadata/v${t.currentVersion()}.json"))
    assert(!vJson.contains("data/"), "v{N}.json still inlines manifest entries")
  }

  test("a cold instance hydrates lists from snap-* files; scan and time travel agree") {
    val root = tmpDir("md-hydrate") + "/tbl"
    val t = SequenceGen.createTable(spark, root, 500, 4)
    val before = t.scan(spark).count()
    Maintenance.compact(spark, t, targetFileBytes = 256L * 1024)
    val oldSnap = t.metadata.snapshots.head.snapshotId
    // fresh instance: no warm cache, must read list files
    val cold = TokenTable.load(spark, root)
    assert(cold.scan(spark).count() == before)
    assert(cold.scan(spark, snapshotId = Some(oldSnap)).count() == before)
    assert(cold.metadata.snapshots.forall(s => s.manifests.nonEmpty))
  }

  test("legacy inline-manifest metadata reads unchanged; next commit externalizes it") {
    val root = tmpDir("md-legacy") + "/tbl"
    val t = SequenceGen.createTable(spark, root, 300, 3)
    // rewrite the CURRENT version file into the old inline shape
    val v = t.currentVersion()
    val inline = t.metadata.copy(snapshots = t.metadata.snapshots.map(
      _.copy(manifestList = None)))
    // write through the Hadoop fs — a java.nio write leaves a stale .crc
    val out = t.fs.create(new org.apache.hadoop.fs.Path(root, s"metadata/v$v.json"), true)
    out.write(TableJson.write(inline).getBytes("UTF-8")); out.close()
    val legacy = TokenTable.load(spark, root)
    assert(legacy.scan(spark).count() == 300)
    legacy.commit("append", Seq.empty) // any commit externalizes the whole log
    val vJson = Files.readString(Paths.get(root, s"metadata/v${legacy.currentVersion()}.json"))
    assert(!vJson.contains("data/"), "post-migration version file should be header-only")
    assert(legacy.scan(spark).count() == 300)
    // and a third instance round-trips the migrated form
    assert(TokenTable.load(spark, root).scan(spark).count() == 300)
  }

  test("spilled-list metadata is stamped format 2; a newer format fails loudly") {
    val root = tmpDir("md-fv") + "/tbl"
    val t = SequenceGen.createTable(spark, root, 100, 1)
    // v0 (create, no snapshots) stays version 1; the first spilled list
    // bumps the written file to 2 — a lenient version-1 reader would parse
    // the dehydrated snapshots as EMPTY, so the bump is what makes it fail
    // loudly instead
    val vJson = Files.readString(Paths.get(root, s"metadata/v${t.currentVersion()}.json"))
    assert(TableJson.readMetadata(vJson).formatVersion == 2)
    assert(TokenTable.load(spark, root).scan(spark).count() == 100)
    // doctor a FUTURE format version: load must refuse, not read garbage
    val v = t.currentVersion()
    val future = vJson.replaceFirst("\"formatVersion\"\\s*:\\s*2", "\"formatVersion\":99")
    assert(future != vJson)
    val out = t.fs.create(new org.apache.hadoop.fs.Path(root, s"metadata/v${v + 1}.json"), true)
    out.write(future.getBytes("UTF-8")); out.close()
    val e = intercept[IllegalArgumentException](TokenTable.load(spark, root).metadata)
    assert(e.getMessage.contains("format version 99"))
  }

  test("manifest-list cache is bounded by retained history across expire cycles") {
    val root = tmpDir("md-cache") + "/tbl"
    val t = TokenTable.create(spark, root)
    (1 to 60).foreach { i =>
      t.commit("append", Seq(entry(i)))
      if (i % 20 == 0) t.expireSnapshots(retainLast = 5)
    }
    t.refresh()
    val retained = t.metadata.snapshots.size
    assert(retained <= 25, s"retention broken: $retained snapshots")
    assert(t.manifestListCacheSize <= retained + 1,
      s"cache leaked: ${t.manifestListCacheSize} entries for $retained retained snapshots")
  }

  test("expired snapshots' list files become orphans and GC sweeps them") {
    val root = tmpDir("md-gc") + "/tbl"
    val t = SequenceGen.createTable(spark, root, 200, 2)
    t.commit("append", Seq.empty) // second snapshot
    val firstList = t.metadata.snapshots.head.manifestList
    t.expireSnapshots(retainLast = 1)
    val dead = t.removeOrphans(0)
    firstList.foreach { rel =>
      assert(dead.contains(rel), s"expired snapshot's list file $rel not swept")
      assert(!Files.exists(Paths.get(root, s"metadata/$rel")))
    }
    // current snapshot's list survives
    val curList = t.metadata.currentSnapshot.get.manifestList.get
    assert(Files.exists(Paths.get(root, s"metadata/$curList")))
    assert(t.scan(spark).count() == 200)
  }
}
