package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.gen.SequenceGen
import graft.table.{AddColumn, Migration, TokenTable}

/** The spark-submit CLI surface (graft.Run): YAML pipeline parse → run
  * against a table root, with the reference run-command's option semantics
  * (annotations filtering, !config resolution, auto-migrate, audit exit
  * count — cli/commands/run.py). Driven in-process via Run.execute. */
class RunSpec extends SparkSpec {

  private def write(path: String, text: String): String = {
    Files.write(Paths.get(path), text.getBytes(StandardCharsets.UTF_8))
    path
  }

  test("parseArgs: full option surface, subcommands, required table") {
    val a = Run.parseArgs(Array("p.yaml", "--table", "/t", "--create",
      "--annotations", "nightly,weekly", "--config", "retain=3",
      "--auto-migrate", "migs/", "--audit", "--json"))
    assert(a == Run.Args("run", "p.yaml", "/t", create = true,
      annotations = Some(Set("nightly", "weekly")),
      config = Map("retain" -> "3"), autoMigrate = Some("migs/"),
      audit = true, json = true))
    val s = Run.parseArgs(Array("schema", "--table", "/t", "--format", "graphql"))
    assert(s.command == "schema" && s.format == "graphql" && s.pipeline == null)
    intercept[Exception](Run.parseArgs(Array("p.yaml")))
    intercept[Exception](Run.parseArgs(Array("p.yaml", "--table", "/t", "--bogus")))
    val trailing = intercept[Exception](Run.parseArgs(Array("p.yaml", "--table")))
    assert(trailing.getMessage.contains("expects a value"))
    for (help <- Seq(Array("--help"), Array("help"), Array("p.yaml", "--help")))
      assert(intercept[Exception](Run.parseArgs(help)).isInstanceOf[Run.HelpRequested])
  }

  test("run: create, maintenance pipeline with annotations + !config, content preserved") {
    val root = tmpDir("runspec") + "/tbl"
    val t0 = SequenceGen.createTable(spark, root, 2000, 16)
    val before = t0.scan(spark)
      .agg(bit_xor(xxhash64(col("doc_id"), col("tokens")))).first.getLong(0)
    val nFilesBefore = t0.liveFiles(t0.metadata).size

    val yaml = write(tmpDir("runspec") + "/p.yaml",
      """- implementation: compact
        |  arguments: { target_file_bytes: 67108864 }
        |- implementation: zorder
        |  arguments: { columns: [doc_id, source, n_tok] }
        |- implementation: expire_snapshots
        |  arguments: { retain_last: !config retain }
        |- implementation: remove_orphans
        |  arguments: { grace_ms: 0 }
        |  annotations: [nightly]
        |- implementation: rollback
        |  arguments: { snapshot_id: 0 }
        |  annotations: [never]
        |""".stripMargin)

    // 'nightly' targeted -> remove_orphans runs, 'never'-annotated rollback skipped
    val failures = Run.execute(spark, Run.Args("run", yaml, root,
      annotations = Some(Set("nightly")), config = Map("retain" -> "1")))
    assert(failures == 0)

    val t = TokenTable.load(spark, root)
    val after = t.scan(spark)
      .agg(bit_xor(xxhash64(col("doc_id"), col("tokens")))).first.getLong(0)
    assert(after == before, "pipeline changed table content")
    assert(t.liveFiles(t.metadata).size < nFilesBefore, "compaction did not reduce files")
    assert(t.metadata.snapshots.size == 1, "expire retain_last=1 (!config) not applied")
    assert(t.metadata.sortOrder.nonEmpty, "zorder did not declare a sort order")
  }

  test("run: --auto-migrate applies pending migrations before the pipeline") {
    val root = tmpDir("runspec-mig") + "/tbl"
    SequenceGen.createTable(spark, root, 200, 4)
    val migDir = tmpDir("runspec-mig") + "/migrations"
    val t = TokenTable.load(spark, root)
    Migration("m1_add_quality", Seq(AddColumn("quality", "DOUBLE")), Nil)
      .writeToDirectory(t.fs, new org.apache.hadoop.fs.Path(migDir))
    val yaml = write(tmpDir("runspec-mig") + "/p.yaml",
      "- implementation: compact\n")
    Run.execute(spark, Run.Args("run", yaml, root, autoMigrate = Some(migDir)))
    t.refresh()
    assert(t.schema.fieldNames.contains("quality"), "migration not applied")
  }

  test("run: --audit returns the failure count; a retention policy clears it") {
    val root = tmpDir("runspec-audit") + "/tbl"
    SequenceGen.createTable(spark, root, 200, 4)
    val yaml = write(tmpDir("runspec-audit") + "/p.yaml",
      "- implementation: compact\n")
    // no retention configured -> audit fails
    assert(Run.execute(spark, Run.Args("run", yaml, root, audit = true)) > 0)
    // configure retention -> audit failure drops
    val t = TokenTable.load(spark, root)
    t.updateProperties(Map("retention.snapshot.keep-last" -> "2"))
    assert(Run.execute(spark, Run.Args("run", yaml, root, audit = true)) == 0)
  }

  test("subcommands: schema formats (stdout and --out), audit count, history") {
    val base = tmpDir("runspec-sub")
    val root = base + "/tbl"
    SequenceGen.createTable(spark, root, 100, 2)

    val outFile = base + "/schema.graphql"
    assert(Run.execute(spark, Run.Args("schema", null, root,
      format = "graphql", out = Some(outFile))) == 0)
    val gql = new String(Files.readAllBytes(Paths.get(outFile)), StandardCharsets.UTF_8)
    assert(gql.contains("type") && gql.contains("doc_id"), gql)
    for (f <- Seq("plain", "ddl", "cypher"))
      assert(Run.execute(spark, Run.Args("schema", null, root, format = f)) == 0)
    intercept[Exception](
      Run.execute(spark, Run.Args("schema", null, root, format = "bogus")))

    // standalone audit: fresh table has no retention -> nonzero count
    assert(Run.execute(spark, Run.Args("audit", null, root)) > 0)
    assert(Run.execute(spark, Run.Args("history", null, root)) == 0)
    assert(Run.execute(spark, Run.Args("partitions", null, root)) == 0)

    // subcommands never auto-create
    intercept[Exception](
      Run.execute(spark, Run.Args("schema", null, base + "/none", create = true)))
  }

  test("copy subcommand: content-identical destination, --to required") {
    val base = tmpDir("runspec-copy")
    val src = base + "/src"
    SequenceGen.createTable(spark, src, 500, 8)
    assert(Run.execute(spark, Run.Args("copy", null, src,
      create = true, to = Some(base + "/dst"))) == 0)
    val s = TokenTable.load(spark, src).scan(spark)
      .agg(bit_xor(xxhash64(col("doc_id"), col("tokens")))).first.getLong(0)
    val d = TokenTable.load(spark, base + "/dst").scan(spark)
      .agg(bit_xor(xxhash64(col("doc_id"), col("tokens")))).first.getLong(0)
    assert(s == d, "copy is not content-identical")
    intercept[Exception](Run.execute(spark, Run.Args("copy", null, src)))
  }

  test("migrations subcommand: pending count as exit, applied after auto-migrate") {
    val base = tmpDir("runspec-migshow")
    val root = base + "/tbl"
    SequenceGen.createTable(spark, root, 100, 2)
    val migDir = base + "/migrations"
    val t = TokenTable.load(spark, root)
    Migration("m1_add_quality", Seq(AddColumn("quality", "DOUBLE")), Nil)
      .writeToDirectory(t.fs, new org.apache.hadoop.fs.Path(migDir))
    // one pending
    assert(Run.execute(spark, Run.Args("migrations", null, root,
      autoMigrate = Some(migDir))) == 1)
    // run with --auto-migrate applies it; show drops to zero pending
    val yaml = write(base + "/p.yaml", "- implementation: compact\n")
    Run.execute(spark, Run.Args("run", yaml, root, autoMigrate = Some(migDir)))
    assert(Run.execute(spark, Run.Args("migrations", null, root,
      autoMigrate = Some(migDir))) == 0)
  }

  test("migrations --make: captures direct schema drift, replayable on another table") {
    val base = tmpDir("runspec-make")
    val src = base + "/src"
    SequenceGen.createTable(spark, src, 100, 2)
    val migDir = base + "/migrations"
    // drift applied DIRECTLY to the table, bypassing named migrations
    TokenTable.load(spark, src).evolveSchema(Seq(AddColumn("lang", "STRING")))

    // dry-run prints the detected op, writes nothing
    assert(Run.execute(spark, Run.Args("migrations", null, src,
      autoMigrate = Some(migDir), make = true, dryRun = true)) == 0)
    assert(!new java.io.File(migDir).exists())

    // make writes the migration; a second make detects nothing new
    assert(Run.execute(spark, Run.Args("migrations", null, src,
      autoMigrate = Some(migDir), make = true, name = Some("m001_lang"))) == 0)
    assert(new java.io.File(migDir, "m001_lang.yaml").exists())

    // replay onto a fresh table: auto-migrate applies the captured drift
    val dst = base + "/dst"
    SequenceGen.createTable(spark, dst, 50, 2)
    val yaml = write(base + "/p.yaml", "- implementation: compact\n")
    Run.execute(spark, Run.Args("run", yaml, dst, autoMigrate = Some(migDir)))
    val t = TokenTable.load(spark, dst)
    assert(t.schema.fieldNames.contains("lang"), "captured drift not replayed")
    // and the destination now shows zero pending
    assert(Run.execute(spark, Run.Args("migrations", null, dst,
      autoMigrate = Some(migDir))) == 0)
  }

  test("migrations --from/--to: squash writes a reduced replacing migration") {
    import graft.table.{Migration, RenameColumn}
    val base = tmpDir("runspec-squash")
    val root = base + "/tbl"
    SequenceGen.createTable(spark, root, 50, 2)
    val migDir = base + "/migrations"
    val t = TokenTable.load(spark, root)
    val dirPath = new org.apache.hadoop.fs.Path(migDir)
    Migration("m1_add", Seq(AddColumn("q", "DOUBLE")), Nil).writeToDirectory(t.fs, dirPath)
    Migration("m2_rename", Seq(RenameColumn("q", "quality")), Seq("m1_add"))
      .writeToDirectory(t.fs, dirPath)

    assert(Run.execute(spark, Run.Args("migrations", null, root,
      autoMigrate = Some(migDir), from = Some("m1_add"), name = Some("m12"))) == 0)
    val sq = Migration.fromYaml(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(migDir, "m12.yaml")), StandardCharsets.UTF_8))
    // add(q) + rename(q->quality) algebraically reduce to add(quality)
    assert(sq.operations == Seq(AddColumn("quality", "DOUBLE")), sq.operations.toString)
    assert(sq.replaces == Seq("m1_add", "m2_rename"))

    // a fresh table applies ONLY the squashed migration
    val dst = base + "/dst"
    SequenceGen.createTable(spark, dst, 20, 2)
    val yaml = write(base + "/p.yaml", "- implementation: compact\n")
    Run.execute(spark, Run.Args("run", yaml, dst, autoMigrate = Some(migDir)))
    val d = TokenTable.load(spark, dst)
    assert(d.schema.fieldNames.contains("quality") && !d.schema.fieldNames.contains("q"))
  }

  test("run: missing table without --create fails loudly") {
    val yaml = write(tmpDir("runspec-miss") + "/p.yaml", "- implementation: compact\n")
    val e = intercept[Exception](
      Run.execute(spark, Run.Args("run", yaml, tmpDir("runspec-miss") + "/none")))
    assert(e.getMessage.contains("--create"))
  }
}
