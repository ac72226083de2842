package graft

import graft.gen.SequenceGen
import graft.table._

/** Printer output is operator UX: pin the load-bearing lines (field ids,
  * partition spec, starred current snapshot, refs, plan checkboxes) rather
  * than byte-exact layout. */
class DescribeSpec extends SparkSpec {

  test("schema printer: field ids, partition spec, properties; DDL flavor") {
    val t = TokenTable.create(spark, tmpDir("describe") + "/tbl",
      properties = Map("owner" -> "graft"),
      partitionSpec = Seq(
        PartitionField("source", "identity"),
        PartitionField("doc_id", "bucket", Some(8))))
    val s = Describe.schema(t)
    assert(s.contains("doc_id") && s.contains("STRING NOT NULL"))
    assert(s.contains("tokens") && s.contains("ARRAY<INT>"))
    assert(s.contains("partitioned by: [source, bucket(doc_id, 8)]"))
    assert(s.contains("property owner = graft"))
    val ddl = Describe.schemaDdl(t, "seqs")
    assert(ddl.startsWith("CREATE TABLE seqs ("))
    assert(ddl.contains("PARTITIONED BY (source, bucket(8, doc_id))"))
  }

  test("schema printer shows evolved field ids stable under rename") {
    val t = SequenceGen.createTable(spark, tmpDir("describe-ev") + "/tbl", 100, 2)
    t.evolveSchema(Seq(AddColumn("quality", "DOUBLE")))
    t.evolveSchema(Seq(RenameColumn("quality", "q")))
    val s = Describe.schema(t)
    // the renamed column keeps its field id (4 = first added after the 4 base)
    assert(s.contains(": q") && s.contains("schema 2"), s)
    val idLine = s.linesIterator.find(_.contains(": q")).get
    assert(idLine.trim.startsWith("4:"), idLine)
  }

  test("graphql printer: camelized type, label kept, scalar mapping, required marks") {
    val t = TokenTable.create(spark, tmpDir("describe-gql") + "/tbl",
      partitionSpec = Seq(PartitionField("source", "identity")))
    val g = Describe.schemaGraphql(t, "token_table")
    // golden shape: directives + label on the camelized type
    assert(g.startsWith("type TokenTable @exclude(operations: [CREATE, DELETE, UPDATE])" +
      " @queryOptions(limit: {default: 10}) @node(labels: [\"token_table\"]) {"), g)
    assert(g.contains("    # Node Properties"), g)
    assert(g.contains("    doc_id: String!"), g)   // non-null string key
    assert(g.contains("    tokens: [BigInt]"), g)  // array<int> -> [BigInt]
    assert(g.trim.endsWith("}"), g)
    // already-camel name: no label directive
    val g2 = Describe.schemaGraphql(t, "Sequences")
    assert(g2.startsWith("type Sequences @exclude") && !g2.contains("@node"), g2)
  }

  test("cypher-esque printer: node-type line, empty graph sections, ensure-index statements") {
    val t = TokenTable.create(spark, tmpDir("describe-cy") + "/tbl",
      partitionSpec = Seq(
        PartitionField("source", "identity"),
        PartitionField("doc_id", "bucket", Some(8))))
    val c = Describe.schemaCypher(t, "token_table")
    val lines = c.linesIterator.toSeq
    assert(lines.head == "Node Types:", c)
    assert(lines(1).startsWith("token_table: doc_id: string"), c)
    assert(lines.contains("Relationship Types:") && lines.contains("Adjacencies:"), c)
    assert(c.contains(
      "CREATE INDEX token_table_idx_0 IF NOT EXISTS FOR (n:TokenTable) ON (n.source)"), c)
    assert(c.contains("ON (n.doc_id)"), c)
  }

  test("cypher-esque printer: sort-order EXPRESSIONS render as per-column indexes") {
    val t = SequenceGen.createTable(spark, tmpDir("describe-cy-sort") + "/tbl", 200, 2)
    graft.maintenance.Maintenance.cluster(spark, t,
      graft.maintenance.ZOrder(Seq("doc_id", "n_tok")))
    assert(t.refresh().sortOrder == Seq("zorder(doc_id,n_tok)"))
    val c = Describe.schemaCypher(t, "token_table")
    // the expression string is reduced to its column list — never spliced
    // verbatim as a (syntactically invalid) property name
    assert(!c.contains("n.zorder("), c)
    assert(c.contains("ON (n.doc_id)"), c)
    assert(c.contains("ON (n.n_tok)"), c)
  }

  test("history printer: one line per snapshot, current starred, refs attached") {
    val t = SequenceGen.createTable(spark, tmpDir("describe-h") + "/tbl", 100, 2)
    t.setRef("prod", t.metadata.currentSnapshotId.get, "tag")
    t.commit("append", t.stageWrite(
      SequenceGen.sequences(spark, 10, 7L)
        .withColumn("doc_id", org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("x"),
          org.apache.spark.sql.functions.col("doc_id"))), "h2"))
    val h = Describe.history(t)
    val lines = h.linesIterator.toSeq
    assert(lines.head.startsWith("snapshot"))
    assert(lines.count(_.contains("append")) == 2)
    assert(lines.exists(l => l.contains("prod(tag)")), h)
    assert(lines.count(_.startsWith("*")) == 1)
    assert(lines.find(_.startsWith("*")).get.contains("2"), h)
  }

  test("migration plan printer: applied checked, pending ordered, squash skip marked") {
    val t = SequenceGen.createTable(spark, tmpDir("describe-m") + "/tbl", 100, 2)
    val m1 = Migration("m1_add", Seq(AddColumn("quality", "DOUBLE")), Nil)
    val m2 = Migration("m2_ren", Seq(RenameColumn("quality", "q")), Seq("m1_add"))
    val sq = Migration.squash("s_all", Seq(m1, m2))
    val graph = MigrationGraph(Map(m1.name -> m1, m2.name -> m2, sq.name -> sq))
    val before = Describe.migrationPlan(t, graph)
    assert(before.contains("[ ] s_all"), before)   // squash runs
    assert(before.contains("[-] m1_add"), before)  // members skipped
    assert(before.contains("0 applied"), before)
    Migrator.migrate(t, graph)
    val after = Describe.migrationPlan(t, graph)
    assert(after.contains("[x] s_all"), after)
    assert(after.contains("0 to apply"), after)
  }

  test("audit: missing retention FAILS, unlaid-out table WARNS, clean table passes") {
    val t = SequenceGen.createTable(spark, tmpDir("describe-audit") + "/tbl", 100, 2)
    val r0 = Describe.audit(t)
    assert(r0.failureCount == 1 && r0.failures.head.contains("retention not configured"), r0.render)
    assert(r0.warnings.exists(_.contains("full scan")), r0.render)
    assert(r0.render.startsWith("FAIL "), r0.render)

    // unknown retention.* key is the "TTL for unknown object type" analogue
    t.updateProperties(Map(
      "retention.snapshot.keep-last" -> "5",
      "retention.snapshots.keep" -> "7"))
    val r1 = Describe.audit(t)
    assert(r1.failureCount == 0, r1.render)
    assert(r1.warnings.exists(_.contains("unknown key 'retention.snapshots.keep'")), r1.render)

    // unparseable policy fails loudly — a policy that cannot apply is worse than none
    t.updateProperties(Map("retention.snapshot.keep-last" -> "soon"))
    assert(Describe.audit(t).failures.exists(_.contains("not a positive integer")))

    // laid-out + valid retention => success summary, zero failures/warnings on layout
    t.updateProperties(Map("retention.snapshot.keep-last" -> "5"))
    graft.maintenance.Maintenance.cluster(spark, t,
      graft.maintenance.ZOrder(Seq("doc_id", "source")))
    val r2 = Describe.audit(t)
    assert(r2.failureCount == 0, r2.render)
    assert(!r2.warnings.exists(_.contains("full scan")), r2.render)
    assert(r2.successes.exists(_.contains("all retention policies configured")), r2.render)
    assert(r2.successes.exists(_.contains("sort order")), r2.render)
  }
}
