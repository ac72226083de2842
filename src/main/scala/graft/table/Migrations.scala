package graft.table

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Reified schema migrations: named migration artifacts with dependencies,
 * arranged in a DAG, topologically planned, squashable, and persisted as
 * reviewable YAML files — the migration *workflow* of the reference
 * (reference nodestream/schema/migrations/migrations.py:10-270) recast over
 * this table's column algebra ([[SchemaOp]] / [[SchemaEvolution]]).
 *
 * A migration names a list of operations plus the migrations it depends on;
 * `replaces` marks a squashed migration standing in for the ones it lists
 * (reference migrations.py:90-127). Planning walks the DAG in dependency
 * order and skips anything already applied, with the reference's
 * squash-awareness: a squashed migration is used only when NONE of the
 * migrations it replaces have run, and a replaced migration is used only
 * when at least one of its squash-siblings already ran (so a half-applied
 * chain finishes step-by-step instead of double-applying via the squash;
 * reference migrations.py:153-197).
 *
 * Everything here is driver-side metadata work — the actual schema change is
 * [[TokenTable.evolveSchema]], a metadata-only commit; no data file is read
 * or written however many migrations the plan holds.
 */
final case class Migration(
    name: String,
    operations: Seq[SchemaOp],
    dependencies: Seq[String],
    replaces: Seq[String] = Nil) {

  def isRoot: Boolean = dependencies.isEmpty
  def isSquashed: Boolean = replaces.nonEmpty
  def isLeaf(graph: MigrationGraph): Boolean =
    !graph.all.exists(_.dependencies.contains(name))

  /** YAML file form, mirroring the reference's on-disk migration shape
    * (`name` / `operations` [{operation, arguments}] / `dependencies` /
    * `replaces`; reference migrations.py:21-38). */
  def toYaml: String = {
    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("name", name)
    m.put("operations", operations.map(Migration.opToYaml).asJava)
    m.put("dependencies", dependencies.asJava)
    m.put("replaces", replaces.asJava)
    val opts = new org.yaml.snakeyaml.DumperOptions
    opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    new org.yaml.snakeyaml.Yaml(opts).dump(m)
  }

  /** Persist as `<dir>/<name>.yaml` (reference migrations.py:70-78). */
  def writeToDirectory(fs: FileSystem, dir: Path): Path = {
    val p = new Path(dir, s"$name.yaml")
    fs.mkdirs(dir)
    TokenTable.writeString(fs, p, toYaml, overwrite = true)
    p
  }
}

object Migration {

  private def opToYaml(op: SchemaOp): java.util.Map[String, Object] = {
    val (tpe, args) = op match {
      case AddColumn(n, t)    => ("add_column", Seq("name" -> n, "type" -> t))
      case RenameColumn(a, b) => ("rename_column", Seq("from" -> a, "to" -> b))
      case DropColumn(n)      => ("drop_column", Seq("name" -> n))
    }
    val a = new java.util.LinkedHashMap[String, Object]()
    args.foreach { case (k, v) => a.put(k, v) }
    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("operation", tpe)
    m.put("arguments", a)
    m
  }

  private def opFromYaml(m: java.util.Map[String, Object]): SchemaOp = {
    val args = m.get("arguments").asInstanceOf[java.util.Map[String, Object]]
    def s(k: String): String = {
      val v = args.get(k)
      require(v != null, s"migration operation missing argument '$k'")
      v.toString
    }
    m.get("operation").toString match {
      case "add_column"    => AddColumn(s("name"), s("type"))
      case "rename_column" => RenameColumn(s("from"), s("to"))
      case "drop_column"   => DropColumn(s("name"))
      case other           => throw new IllegalArgumentException(s"unknown migration operation '$other'")
    }
  }

  def fromYaml(text: String): Migration = {
    val yaml = new org.yaml.snakeyaml.Yaml(
      new org.yaml.snakeyaml.constructor.SafeConstructor(new org.yaml.snakeyaml.LoaderOptions))
    val m = yaml.load[java.util.Map[String, Object]](text)
    def strings(k: String): Seq[String] = m.get(k) match {
      case null                 => Nil
      case l: java.util.List[_] => l.asScala.map(_.toString).toSeq
      case other                => throw new IllegalArgumentException(s"'$k' must be a list, got $other")
    }
    Migration(
      name = m.get("name").toString,
      operations = m.get("operations") match {
        case null                 => Nil
        case l: java.util.List[_] =>
          l.asScala.map(o => opFromYaml(o.asInstanceOf[java.util.Map[String, Object]])).toSeq
      },
      dependencies = strings("dependencies"),
      replaces = strings("replaces"))
  }

  /**
   * Squash migrations into one: operations concatenate (and reduce to the
   * algebraic minimum — add+drop annihilates, rename chains collapse — via
   * [[SchemaEvolution.reduce]], the analogue of the reference's
   * `Operation.optimize` peephole loop), dependencies become the external
   * dependency frontier, `replaces` records the squashed names
   * (reference migrations.py:90-127).
   */
  def squash(
      newName: String,
      migrations: Seq[Migration],
      optimizeOperations: Boolean = true): Migration = {
    val squashedNames = migrations.map(_.name).toSet
    val ops = migrations.flatMap(_.operations)
    Migration(
      name = newName,
      operations = if (optimizeOperations) SchemaEvolution.reduce(ops) else ops,
      dependencies = migrations.flatMap(_.dependencies).distinct
        .filterNot(squashedNames.contains),
      replaces = migrations.map(_.name))
  }
}

/** The migration DAG (adjacency by name), with deterministic planning:
  * leaves and dependency fan-out are visited in sorted-name order so the
  * same migration set always yields the same plan on every driver. */
final case class MigrationGraph(byName: Map[String, Migration]) {

  def all: Seq[Migration] = byName.values.toSeq.sortBy(_.name)

  def get(name: String): Migration =
    byName.getOrElse(name, throw new NoSuchElementException(s"no migration named '$name'"))

  def leaves: Seq[Migration] = all.filter(_.isLeaf(this))
  def roots: Seq[Migration] = all.filter(_.isRoot)

  /**
   * Dependency-first total order over the whole DAG: iterative post-order
   * DFS from every leaf (reference migrations.py:199-240), hardened with
   * missing-dependency and cycle detection (a migration directory is
   * hand-edited by humans; fail loudly, not with a stack overflow).
   */
  def topologicalOrder: Seq[Migration] = {
    val order = scala.collection.mutable.ArrayBuffer[Migration]()
    val done = scala.collection.mutable.Set[String]()
    val inProgress = scala.collection.mutable.Set[String]()
    // stack entries: (migration, childrenProcessed)
    val stack = scala.collection.mutable.Stack[(Migration, Boolean)]()
    leaves.reverseIterator.foreach(l => stack.push((l, false)))
    while (stack.nonEmpty) {
      val (m, processed) = stack.pop()
      if (!done.contains(m.name)) {
        if (processed) {
          order += m; done += m.name; inProgress -= m.name
        } else {
          if (inProgress.contains(m.name))
            throw new IllegalStateException(s"migration dependency cycle through '${m.name}'")
          inProgress += m.name
          stack.push((m, true))
          m.dependencies.sorted.reverseIterator.foreach { d =>
            val dep = byName.getOrElse(d, throw new NoSuchElementException(
              s"migration '${m.name}' depends on unknown migration '$d'"))
            if (!done.contains(dep.name)) stack.push((dep, false))
          }
        }
      }
    }
    // A finite dependency graph where some node is unreachable from every
    // leaf can only mean a cycle (a cyclic component has no leaf to start
    // from, so the DFS above never enters it).
    if (done.size != byName.size) {
      val missed = byName.keys.filterNot(done.contains).toSeq.sorted
      throw new IllegalStateException(
        s"migration dependency cycle through '${missed.mkString("', '")}'")
    }
    order.toSeq
  }

  /**
   * The outstanding plan given the set of already-applied migration names —
   * topological order minus completed work, with the reference's
   * squash-replacement rules (migrations.py:153-197): a replaced migration
   * runs only when its squash is partially applied; a squashed migration
   * runs only when none of its members have.
   */
  def orderedPlan(completed: Set[String]): Seq[Migration] = {
    val replacementIndex: Map[String, Migration] =
      all.flatMap(m => m.replaces.map(_ -> m)).toMap
    val selected = topologicalOrder.filter { m =>
      if (completed.contains(m.name)) false
      else replacementIndex.get(m.name) match {
        case Some(squash) =>
          // m was replaced: run it only if its squash chain already started.
          squash.replaces.exists(completed.contains)
        case None =>
          // A squash runs only on a clean slate of its members.
          !(m.isSquashed && m.replaces.exists(completed.contains))
      }
    }
    // The raw topological order is not sufficient once a squash stands in
    // for its members (or vice versa): a dependency edge can point at a
    // SKIPPED migration. Re-order the selected set over EFFECTIVE
    // dependencies — a dependency on a skipped replaced member resolves to
    // the squash running in its place; a dependency on a skipped squash
    // (its chain already started, members finish one-by-one) resolves to
    // the selected members standing in for IT; a completed dependency
    // resolves to nothing.
    val byNameSel = selected.map(m => m.name -> m).toMap
    def effDeps(m: Migration): Seq[String] = m.dependencies.flatMap { d =>
      if (byNameSel.contains(d)) Seq(d)
      else {
        val viaSquash = replacementIndex.get(d).map(_.name).filter(byNameSel.contains).toSeq
        val viaMembers = byName.get(d).filter(_.isSquashed)
          .map(_.replaces.filter(byNameSel.contains)).getOrElse(Seq.empty)
        viaSquash ++ viaMembers
      }
    }.distinct
    // Iterative DFS (like topologicalOrder above — a thousands-long linear
    // migration chain must not stack-overflow), gray set for cycle detection
    // in the substituted graph.
    val order = scala.collection.mutable.ArrayBuffer[Migration]()
    val done = scala.collection.mutable.Set[String]()
    val gray = scala.collection.mutable.Set[String]()
    val stack = scala.collection.mutable.Stack[(Migration, Boolean)]()
    selected.reverseIterator.foreach(m => stack.push((m, false)))
    while (stack.nonEmpty) {
      val (m, processed) = stack.pop()
      if (!done.contains(m.name)) {
        if (processed) {
          order += m; done += m.name; gray -= m.name
        } else {
          if (gray.contains(m.name))
            throw new IllegalStateException(
              s"squash substitution creates a dependency cycle through '${m.name}'")
          gray += m.name
          stack.push((m, true))
          effDeps(m).sorted.reverseIterator.foreach { d =>
            if (!done.contains(d)) stack.push((byNameSel(d), false))
          }
        }
      }
    }
    order.toSeq
  }

  /** Squash the contiguous topological span [from, to] (to = last when
    * absent) into one named migration (reference migrations.py:219-240). */
  def squashBetween(
      name: String,
      fromMigration: Migration,
      toMigration: Option[Migration] = None): Migration = {
    val ordered = topologicalOrder
    val fromIdx = ordered.indexWhere(_.name == fromMigration.name)
    require(fromIdx >= 0, s"'${fromMigration.name}' is not in this graph")
    val toIdx = toMigration match {
      case Some(t) =>
        val i = ordered.indexWhere(_.name == t.name)
        require(i >= 0, s"'${t.name}' is not in this graph"); i
      case None => ordered.size - 1
    }
    Migration.squash(name, ordered.slice(fromIdx, toIdx + 1))
  }
}

object MigrationGraph {
  def fromMigrations(ms: Iterable[Migration]): MigrationGraph = {
    val grouped = ms.groupBy(_.name)
    grouped.find(_._2.size > 1).foreach { case (n, _) =>
      throw new IllegalArgumentException(s"duplicate migration name '$n'")
    }
    MigrationGraph(grouped.view.mapValues(_.head).toMap)
  }

  /** Load every `*.yaml` in a directory (reference migrations.py:256-270). */
  def fromDirectory(fs: FileSystem, dir: Path): MigrationGraph = {
    val files =
      if (!fs.exists(dir)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(dir).filter(f => f.isFile && f.getPath.getName.endsWith(".yaml"))
    fromMigrations(files.toSeq.map(f => Migration.fromYaml(TokenTable.readString(fs, f.getPath))))
  }
}

/**
 * Executes a migration plan against a [[TokenTable]] — the analogue of
 * the reference's per-database migrator + completed-migration state provider
 * (reference nodestream/schema/migrations/migrator.py, state_providers.py).
 * Each migration is applied AND recorded by [[TokenTable.applyMigration]] in
 * one atomic metadata commit (the applied-name list lives in table
 * properties, versioned with the schema itself), so a crash at any point
 * resumes at the first unapplied migration and can never double-apply —
 * there is no window between "schema changed" and "name recorded".
 * `metadata/migrations.log` is still honored read-only for tables migrated
 * by older engine versions.
 */
object Migrator {

  private def logPath(table: TokenTable): Path =
    new Path(table.metadataDir, "migrations.log")

  def completed(table: TokenTable): Set[String] = {
    val legacy =
      if (!table.fs.exists(logPath(table))) Set.empty[String]
      else TokenTable.readString(table.fs, logPath(table))
        .linesIterator.map(_.trim).filter(_.nonEmpty).toSet
    legacy ++ table.appliedMigrations()
  }

  /** Apply every outstanding migration in plan order; returns what ran. */
  def migrate(table: TokenTable, graph: MigrationGraph): Seq[Migration] = {
    val plan = graph.orderedPlan(completed(table))
    plan.foreach(m => table.applyMigration(m.name, m.operations))
    plan
  }
}
