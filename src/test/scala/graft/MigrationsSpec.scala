package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import graft.table._

/** The reified migration DAG: YAML round-trip, topological planning,
  * squash-aware plan selection, and the table-backed Migrator
  * (reference nodestream/schema/migrations/migrations.py:10-270). */
class MigrationsSpec extends SparkSpec {

  private val m1 = Migration("m1_add_quality", Seq(AddColumn("quality", "DOUBLE")), Nil)
  private val m2 = Migration("m2_rename_q", Seq(RenameColumn("quality", "q")), Seq("m1_add_quality"))
  private val m3 = Migration("m3_add_lang", Seq(AddColumn("lang", "STRING")), Seq("m1_add_quality"))
  private val m4 = Migration("m4_drop_lang", Seq(DropColumn("lang")), Seq("m2_rename_q", "m3_add_lang"))

  test("YAML round-trip preserves name, ops, dependencies and replaces") {
    val sq = Migration.squash("s_1_2", Seq(m1, m2))
    Seq(m1, m2, m3, m4, sq).foreach { m =>
      assert(Migration.fromYaml(m.toYaml) == m, s"round-trip of ${m.name}")
    }
  }

  test("topological order is dependency-first and deterministic; leaves/roots detected") {
    val g = MigrationGraph.fromMigrations(Seq(m4, m2, m3, m1)) // shuffled input
    val order = g.topologicalOrder.map(_.name)
    assert(order == Seq("m1_add_quality", "m2_rename_q", "m3_add_lang", "m4_drop_lang"))
    assert(g.roots.map(_.name) == Seq("m1_add_quality"))
    assert(g.leaves.map(_.name) == Seq("m4_drop_lang"))
  }

  test("unknown dependency and cycles fail loudly") {
    val dangling = Migration("x", Nil, Seq("nope"))
    intercept[NoSuchElementException] {
      MigrationGraph.fromMigrations(Seq(dangling)).topologicalOrder
    }
    val a = Migration("a", Nil, Seq("b"))
    val b = Migration("b", Nil, Seq("a"))
    intercept[IllegalStateException] {
      MigrationGraph.fromMigrations(Seq(a, b)).topologicalOrder
    }
  }

  test("squash: reduced ops, external dependency frontier, replaces recorded") {
    val sq = Migration.squash("s_2_4", Seq(m2, m3, m4))
    // rename(quality→q) survives; add(lang)+drop(lang) annihilates
    assert(sq.operations == Seq(RenameColumn("quality", "q")))
    assert(sq.dependencies == Seq("m1_add_quality")) // m2/m3 internal deps dropped
    assert(sq.replaces.toSet == Set("m2_rename_q", "m3_add_lang", "m4_drop_lang"))
    assert(sq.isSquashed)
    val g = MigrationGraph.fromMigrations(Seq(m1, m2, m3, m4))
    val sq2 = g.squashBetween("s_all_after_m1", m2)
    assert(sq2.replaces.toSet == Set("m2_rename_q", "m3_add_lang", "m4_drop_lang"))
  }

  test("plan: completed skipped; squash used on a clean slate, members used when chain started") {
    val sq = Migration.squash("s_2_4", Seq(m2, m3, m4))
    val g = MigrationGraph.fromMigrations(Seq(m1, m2, m3, m4, sq))

    // clean slate after m1: the squash stands in for its three members
    assert(g.orderedPlan(Set("m1_add_quality")).map(_.name) == Seq("s_2_4"))

    // chain partially applied (m2 done): members finish one by one, squash skipped
    assert(g.orderedPlan(Set("m1_add_quality", "m2_rename_q")).map(_.name) ==
      Seq("m3_add_lang", "m4_drop_lang"))

    // everything done (via squash): nothing to do
    assert(g.orderedPlan(Set("m1_add_quality", "s_2_4")).isEmpty)
  }

  test("plan orders a dependent of a replaced member AFTER the stand-in squash") {
    // m1 <- m2 <- m3_dependent, squash s_2 replaces {m2}. On a clean slate
    // the plan substitutes s_2 for m2; m3_dependent's dependency edge points
    // at the skipped m2, and its name sorts BEFORE s_2 — the raw topological
    // order would run it first and apply ops against a schema that lacks
    // m2's column. The effective-dependency reorder must put s_2 first.
    val a1 = Migration("m1", Seq(AddColumn("quality", "DOUBLE")), Nil)
    val a2 = Migration("m2", Seq(RenameColumn("quality", "q")), Seq("m1"))
    val dep = Migration("m3_dependent", Seq(DropColumn("q")), Seq("m2"))
    val sq = Migration.squash("s_2", Seq(a2))
    val g = MigrationGraph.fromMigrations(Seq(a1, a2, dep, sq))
    val plan = g.orderedPlan(Set.empty).map(_.name)
    assert(plan.indexOf("s_2") >= 0 && plan.indexOf("s_2") < plan.indexOf("m3_dependent"),
      s"squash must precede its members' dependents, got $plan")
    // and the whole plan actually applies cleanly against a table
    val t = TokenTable.create(spark, tmpDir("migplan"))
    Migrator.migrate(t, g)
    assert(!t.schema.fieldNames.contains("q") && !t.schema.fieldNames.contains("quality"))
  }

  test("plan orders a dependent of a SKIPPED squash after the members standing in for it") {
    // z2 (deps m1) and squash s replacing {m1, z2}; a_dep depends on the
    // squash itself. With m1 completed the chain finishes member-wise: s is
    // skipped and z2 runs — a_dep's dependency on s must resolve to z2, and
    // a_dep (which sorts FIRST by name) must still run after it.
    val m1x = Migration("m1", Seq(AddColumn("quality", "DOUBLE")), Nil)
    val z2 = Migration("z2", Seq(RenameColumn("quality", "q")), Seq("m1"))
    val sq = Migration.squash("s", Seq(m1x, z2))
    val aDep = Migration("a_dep", Seq(DropColumn("q")), Seq("s"))
    val g = MigrationGraph.fromMigrations(Seq(m1x, z2, sq, aDep))
    val plan = g.orderedPlan(Set("m1")).map(_.name)
    assert(plan == Seq("z2", "a_dep"), s"got $plan")
    // and it applies cleanly end-to-end
    val t = TokenTable.create(spark, tmpDir("migplan2"))
    t.applyMigration("m1", m1x.operations)
    Migrator.migrate(t, g)
    assert(!t.schema.fieldNames.contains("q") && !t.schema.fieldNames.contains("quality"))
  }

  test("applyMigration records name and schema change in ONE metadata commit (atomic, idempotent)") {
    val t = TokenTable.create(spark, tmpDir("migatomic"))
    val v0 = t.currentVersion()
    t.applyMigration("m1_add_quality", Seq(AddColumn("quality", "DOUBLE")))
    assert(t.currentVersion() == v0 + 1,
      "apply + record must be one commit — no window where the schema changed but the name is unrecorded")
    assert(t.appliedMigrations() == Set("m1_add_quality"))
    assert(t.schema.fieldNames.contains("quality"))
    // re-apply of a recorded name is a no-op, not a double-apply failure
    val v1 = t.currentVersion()
    t.applyMigration("m1_add_quality", Seq(AddColumn("quality", "DOUBLE")))
    assert(t.currentVersion() == v1)
    // a no-op migration still records completion
    t.applyMigration("m_noop", Seq.empty)
    assert(t.appliedMigrations().contains("m_noop"))
  }

  test("directory round-trip loads the same graph") {
    val fs = new Path(tmpDir("migdir")).getFileSystem(
      spark.sessionState.newHadoopConf())
    val dir = new Path(tmpDir("migdir"), "migrations")
    Seq(m1, m2, m3, m4).foreach(_.writeToDirectory(fs, dir))
    val g = MigrationGraph.fromDirectory(fs, dir)
    assert(g.all.map(_.name) ==
      Seq("m1_add_quality", "m2_rename_q", "m3_add_lang", "m4_drop_lang"))
    assert(g.topologicalOrder.map(_.name).last == "m4_drop_lang")
  }

  test("Migrator applies the outstanding plan to a table, records state, re-runs idempotently") {
    val t = TokenTable.create(spark, tmpDir("migtable"))
    val g = MigrationGraph.fromMigrations(Seq(m1, m2, m3))

    val applied = Migrator.migrate(t, g)
    assert(applied.map(_.name) == Seq("m1_add_quality", "m2_rename_q", "m3_add_lang"))
    assert(Migrator.completed(t) == Set("m1_add_quality", "m2_rename_q", "m3_add_lang"))
    val cols = t.schema.fieldNames.toSeq
    assert(cols.contains("q") && cols.contains("lang") && !cols.contains("quality"))

    // idempotent: nothing outstanding
    assert(Migrator.migrate(t, g).isEmpty)

    // new leaf arrives: only it runs, schema versions keep marching
    val g2 = MigrationGraph.fromMigrations(Seq(m1, m2, m3, m4))
    assert(Migrator.migrate(t, g2).map(_.name) == Seq("m4_drop_lang"))
    assert(!t.schema.fieldNames.contains("lang"))
  }

  test("Migrator resumes mid-plan: a pre-recorded prefix is not re-applied") {
    val t = TokenTable.create(spark, tmpDir("migtable2"))
    // simulate a crash that applied m1 (schema change + log) but nothing after
    t.evolveSchema(m1.operations)
    TokenTable.writeString(t.fs, new Path(t.metadataDir, "migrations.log"),
      "m1_add_quality\n", overwrite = true)
    val g = MigrationGraph.fromMigrations(Seq(m1, m2, m3))
    val applied = Migrator.migrate(t, g)
    assert(applied.map(_.name) == Seq("m2_rename_q", "m3_add_lang"))
    assert(t.schema.fieldNames.count(_ == "q") == 1)
  }
}
