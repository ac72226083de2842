package graft.table

import org.apache.spark.sql.types.StructType

/**
 * Human-readable printers for table state — the engine's analogue of the
 * reference's schema printers (`nodestream print schema` with plain /
 * GraphQL / cypher-esque renderers, reference
 * nodestream/schema/printers/schema_printer.py:10-28 and siblings): a table
 * format is operated by humans, and `describe`-style text is the operator
 * UX for "what is this table right now".
 *
 * Three surfaces: the current schema (plain and DDL flavors, with field ids
 * and the partition spec), the snapshot history (one line per snapshot with
 * refs attached), and the outstanding migration plan.
 */
object Describe {

  /** Render one partition field, e.g. `source` or `bucket(doc_id, 8)`. */
  private def fieldSpec(f: PartitionField): String = f.transform match {
    case "identity" => f.column
    case "bucket"   => s"bucket(${f.column}, ${f.n.get})"
    case "truncate" => s"truncate(${f.column}, ${f.n.get})"
  }

  /** Plain schema rendering: one line per column with its stable field id,
    * then partition spec, sort order and properties. */
  def schema(t: TokenTable): String = {
    val m = t.metadata
    val cur = m.schemaVersion(m.schemaIdNow)
    val st = org.apache.spark.sql.types.DataType.fromJson(cur.schemaJson).asInstanceOf[StructType]
    val sb = new StringBuilder
    sb ++= s"table ${m.tableUuid} (format v${m.formatVersion}, schema ${cur.schemaId})\n"
    st.fields.foreach { f =>
      val id = cur.fieldIds.getOrElse(f.name, -1)
      val req = if (f.nullable) "" else " NOT NULL"
      sb ++= f"  $id%3d: ${f.name}%-12s ${f.dataType.sql}$req%s\n"
    }
    if (m.spec.nonEmpty)
      sb ++= m.spec.map(fieldSpec).mkString("partitioned by: [", ", ", "]\n")
    if (m.sortOrder.nonEmpty) sb ++= s"sorted by: ${m.sortOrder.mkString(", ")}\n"
    m.properties.toSeq.sortBy(_._1).foreach { case (k, v) => sb ++= s"property $k = $v\n" }
    sb.result()
  }

  /** DDL-flavor schema (the "second renderer" the reference ships as
    * GraphQL; for a lakehouse table SQL DDL is the lingua franca). */
  def schemaDdl(t: TokenTable, name: String = "token_table"): String = {
    val m = t.metadata
    val st = t.schema
    val cols = st.fields.map(f =>
      s"  ${f.name} ${f.dataType.sql}${if (f.nullable) "" else " NOT NULL"}")
    val part =
      if (m.spec.isEmpty) ""
      else m.spec.map(f => f.transform match {
        case "identity" => f.column
        case "bucket"   => s"bucket(${f.n.get}, ${f.column})"
        case "truncate" => s"truncate(${f.n.get}, ${f.column})"
      }).mkString("\nPARTITIONED BY (", ", ", ")")
    s"CREATE TABLE $name (\n${cols.mkString(",\n")}\n)$part"
  }

  /** GraphQL scalar for a Spark type, per the reference's field mapping
    * (graphql_schema_printer.py:55-66): integers render as BigInt, floats as
    * Float, timestamps/dates as DateTime, arrays as list types; anything
    * without a GraphQL analogue (binary, struct, map) degrades to String. */
  private def graphqlType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => "String"
      case LongType | IntegerType | ShortType | ByteType => "BigInt"
      case DoubleType | FloatType | _: DecimalType => "Float"
      case BooleanType => "Boolean"
      case TimestampType | DateType => "DateTime"
      case ArrayType(e, _) => s"[${graphqlType(e)}]"
      case _ => "String"
    }
  }

  /** `snake_case` → `SnakeCase` when the name is snake case, otherwise
    * unchanged (the reference's ensure_camel_case,
    * graphql_schema_printer.py:79-83). */
  private def camelize(name: String): String =
    if (name.matches("^[a-z0-9]+(_[a-z0-9]+)*$"))
      name.split('_').map(_.capitalize).mkString
    else name

  /** GraphQL type-definition rendering of the current schema — the
    * reference's GraphQL printer (graphql_schema_printer.py:8-36)
    * re-expressed for a table: the table is the one node type (a table
    * engine has no adjacency graph, so the relationship sections are
    * empty by construction rather than omitted), camel-cased with the
    * original name kept as a label when camelization changed it, read-only
    * directives included, one field per column with the reference's
    * scalar mapping. */
  def schemaGraphql(t: TokenTable, name: String = "token_table"): String = {
    val typeName = camelize(name)
    val label = if (typeName != name) s""" @node(labels: ["$name"])""" else ""
    val sb = new StringBuilder
    sb ++= s"type $typeName @exclude(operations: [CREATE, DELETE, UPDATE])" +
      s" @queryOptions(limit: {default: 10})$label {\n"
    sb ++= "    # Node Properties\n"
    t.schema.fields.foreach { f =>
      val gql = graphqlType(f.dataType)
      val req = if (f.nullable) "" else "!"
      sb ++= s"    ${f.name}: $gql$req\n"
    }
    sb ++= "    # Inbound Relationships\n"
    sb ++= "    # Outbound Relationships\n"
    sb ++= "}\n"
    sb.result()
  }

  /** Cypher-esque rendering — the reference's third printer
    * (cypheresque.py:5-60): node types with `name: type` property lists,
    * then relationship types and adjacency patterns (both empty for a
    * single-table engine), then the operator-useful extra a table format
    * can offer where a graph database has ensure-index migrations: the
    * index statements implied by the partition spec and sort order. */
  def schemaCypher(t: TokenTable, name: String = "token_table"): String = {
    val m = t.metadata
    val props = t.schema.fields
      .map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")
    // sortOrder entries are expression strings ("zorder(doc_id,source,n_tok)"
    // or bare column names — TableMeta.sortOrder): reduce each to its column
    // list and keep only real schema fields, so the rendered statements are
    // property references, never spliced expression syntax.
    val fieldNames = t.schema.fieldNames.toSet
    val fnRe = "^[A-Za-z_]+\\((.*)\\)$".r
    val sortCols = m.sortOrder.flatMap {
      _.trim match {
        case fnRe(args) => args.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        case bare       => Seq(bare)
      }
    }.filter(fieldNames.contains)
    val indexCols = (m.spec.map(_.column) ++ sortCols).distinct
    val indexes = indexCols.zipWithIndex.map { case (c, i) =>
      s"CREATE INDEX ${name}_idx_$i IF NOT EXISTS FOR (n:${camelize(name)}) ON (n.$c)"
    }
    s"""Node Types:
       |$name: $props
       |Relationship Types:
       |
       |Adjacencies:
       |
       |Ensure Indexes:
       |${indexes.mkString("\n")}
       |""".stripMargin
  }

  /** Snapshot history, oldest first: id, parent, operation, timestamp,
    * manifest/file/record counts, pending delete files, and any refs
    * pointing at the snapshot. The current snapshot is starred. */
  def history(t: TokenTable): String = {
    val m = t.metadata
    val refsBySnap: Map[Long, Seq[String]] = m.refMap.toSeq
      .groupBy(_._2.snapshotId)
      .view.mapValues(_.map { case (n, r) => s"$n(${r.kind})" }.sorted).toMap
    val sb = new StringBuilder
    sb ++= "snapshot  parent    operation            timestamp-ms    files  records  deletes  refs\n"
    m.snapshots.sortBy(_.snapshotId).foreach { s =>
      val cur = if (m.currentSnapshotId.contains(s.snapshotId)) "*" else " "
      val files = s.manifests.map(_.addedFiles).sum
      val records = s.manifests.map(_.records).sum
      val dels = s.deletes.map(_.addedFiles).sum
      val refs = refsBySnap.getOrElse(s.snapshotId, Seq.empty).mkString(",")
      sb ++= f"$cur${s.snapshotId}%-9d ${s.parentId.map(_.toString).getOrElse("-")}%-9s " +
        f"${s.operation}%-20s ${s.timestampMs}%-15d $files%-6d $records%-8d $dels%-8d $refs%s\n"
    }
    sb.result()
  }

  /** Per-partition-tuple summary of the live file set: files, records,
    * bytes per tuple, plus files predating the current spec (no tuple). */
  def partitions(t: TokenTable): String = {
    val live = t.liveFiles()
    val m = t.metadata
    val sb = new StringBuilder
    if (m.spec.isEmpty) sb ++= "table is unpartitioned\n"
    else sb ++= m.spec.map(fieldSpec).mkString("spec: [", ", ", "]\n")
    val (tupled, untupled) = live.partition(_.partition.nonEmpty)
    tupled.groupBy(_.partition.get).toSeq
      .sortBy(_._1.toSeq.sortBy(_._1).map(_._2).mkString("/"))
      .foreach { case (tuple, fs) =>
        val key = tuple.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("/")
        sb ++= f"  $key%-40s files=${fs.size}%-5d records=${fs.map(_.records).sum}%-9d bytes=${fs.map(_.bytes).sum}%d\n"
      }
    if (untupled.nonEmpty)
      sb ++= s"  (pre-spec, stats-pruned only)            files=${untupled.size}\n"
    sb.result()
  }

  /** The outstanding migration plan against a graph: applied names checked
    * off, pending ones in execution order with their operations. */
  def migrationPlan(t: TokenTable, graph: MigrationGraph): String = {
    val done = Migrator.completed(t)
    val plan = graph.orderedPlan(done)
    val planned = plan.map(_.name).toSet
    val sb = new StringBuilder
    graph.topologicalOrder.foreach { mg =>
      val mark =
        if (done.contains(mg.name)) "[x]"
        else if (planned.contains(mg.name)) "[ ]"
        else "[-]" // skipped (e.g. replaced by a squash, or member already ran)
      val deps = if (mg.dependencies.isEmpty) "" else s" <- ${mg.dependencies.sorted.mkString(", ")}"
      sb ++= s"$mark ${mg.name}$deps\n"
      if (planned.contains(mg.name))
        mg.operations.foreach(op => sb ++= s"      $op\n")
    }
    sb ++= s"${plan.size} to apply, ${done.intersect(graph.byName.keySet).size} applied\n"
    sb.result()
  }

  /** Audit result in the reference's shape (audits/audit.py:10-60): ordered
    * messages with success/warning/failure counters; a CLI would exit with
    * `failures.size` like the reference's audit command
    * (cli/commands/audit_command.py:8-23). */
  final case class AuditReport(
      successes: Seq[String], warnings: Seq[String], failures: Seq[String]) {
    def failureCount: Int = failures.size
    def render: String =
      (failures.map("FAIL " + _) ++ warnings.map("WARN " + _) ++
        successes.map("OK   " + _)).mkString("", "\n", "\n")
  }

  /** Retention keys the audit recognizes as a declared policy. */
  val RetentionKeys: Seq[String] =
    Seq("retention.snapshot.keep-last", "retention.snapshot.max-age-ms")

  /**
   * Table-state lint — the lakehouse analogue of the reference's TTL audit
   * (project/audits/audit_ttls.py:24-46: FAIL each object type without a
   * TTL, WARN each TTL naming an unknown type, success when clean). On a
   * table the "object type that ages out" is the snapshot log, so:
   *
   *  - FAIL when no retention policy property is declared ([[RetentionKeys]])
   *    — without one, snapshots (and the files they pin) accumulate forever,
   *    the same unbounded-growth bug the reference's audit exists to catch;
   *  - FAIL when a declared retention value does not parse as a positive
   *    long (a policy that silently cannot apply is worse than none);
   *  - WARN on `retention.*` keys outside the recognized set (the analogue
   *    of "TTL configured for unknown object type");
   *  - WARN when the table has files but no sort order and no partition
   *    spec — every scan is a full scan at 100 TB.
   */
  def audit(t: TokenTable): AuditReport = {
    val m = t.metadata
    val ok = Seq.newBuilder[String]
    val warn = Seq.newBuilder[String]
    val fail = Seq.newBuilder[String]

    val declared = RetentionKeys.flatMap(k => m.properties.get(k).map(k -> _))
    if (declared.isEmpty)
      fail += s"retention not configured: set one of ${RetentionKeys.mkString(", ")}"
    declared.foreach { case (k, v) =>
      if (scala.util.Try(v.trim.toLong).toOption.exists(_ > 0))
        ok += s"retention policy $k = $v"
      else fail += s"retention policy $k = '$v' is not a positive integer"
    }
    m.properties.keys.filter(k => k.startsWith("retention.") &&
        !RetentionKeys.contains(k)).toSeq.sorted
      .foreach(k => warn += s"retention configured for unknown key '$k'")

    if (m.sortOrder.isEmpty && m.spec.isEmpty && t.liveFiles().nonEmpty)
      warn += "no sort order and no partition spec: every scan is a full scan"
    else if (m.sortOrder.nonEmpty || m.spec.nonEmpty)
      ok += ((if (m.sortOrder.nonEmpty)
                Seq(s"sort order: ${m.sortOrder.mkString(", ")}") else Seq.empty) ++
        (if (m.spec.nonEmpty)
           Seq(s"partition spec: ${m.spec.map(fieldSpec).mkString(", ")}") else Seq.empty))
        .mkString("; ")

    val report = AuditReport(ok.result(), warn.result(), fail.result())
    if (report.failureCount == 0 && report.successes.nonEmpty)
      report.copy(successes = report.successes :+ "all retention policies configured")
    else report
  }
}
