package graft.table

import org.apache.spark.sql.types._

/**
 * Metadata-only schema evolution — the table-format recast of nodestream's
 * migration system: 20 operation types over a migration DAG with algebraic
 * reduction (create+drop ⇒ no-op, rename chains collapse, drop wins;
 * reference nodestream/schema/migrations/operations.py:94-149, squashing at
 * migrations.py:90-127). Here the operation set is the column algebra of a
 * single table; applying ops writes a new schema version (with stable
 * field-ids) into the metadata — no data file is touched.
 *
 * The four canonical sequence columns (BASELINE.json input_hint) are
 * protected: they cannot be renamed or dropped.
 */
sealed trait SchemaOp {
  /** Column names this op reads/writes, for reduction bookkeeping. */
  def touches: Set[String]
}
final case class AddColumn(name: String, sqlType: String) extends SchemaOp {
  def touches: Set[String] = Set(name)
}
final case class RenameColumn(from: String, to: String) extends SchemaOp {
  def touches: Set[String] = Set(from, to)
}
final case class DropColumn(name: String) extends SchemaOp {
  def touches: Set[String] = Set(name)
}

object SchemaEvolution {

  val protectedColumns: Set[String] = Set("doc_id", "tokens", "n_tok", "source")

  /**
   * Algebraic reduction by simulation (the fixpoint-free equivalent of the
   * reference's pairwise peephole loop): replay the ops over an abstract
   * column state, then emit the minimal op sequence — drops of original
   * columns first, then collapsed renames, then surviving adds.
   * add+drop annihilate; rename chains collapse; rename+drop becomes a drop
   * of the original name. (Cyclic rename swaps are rejected by `validate`
   * at apply time, not reordered.)
   */
  def reduce(ops: Seq[SchemaOp]): Seq[SchemaOp] = {
    sealed trait Origin
    final case class Existing(orig: String) extends Origin
    final case class Added(sqlType: String) extends Origin

    var cur = scala.collection.immutable.ListMap.empty[String, Origin]
    val droppedOriginals = scala.collection.mutable.ArrayBuffer[String]()
    ops.foreach {
      case AddColumn(n, t) =>
        require(!cur.contains(n), s"add of existing column $n")
        cur += (n -> Added(t))
      case RenameColumn(a, b) =>
        require(!cur.contains(b), s"rename target $b already exists in op stream")
        val o = cur.getOrElse(a, Existing(a))
        cur -= a
        cur += (b -> o)
      case DropColumn(n) =>
        cur.getOrElse(n, Existing(n)) match {
          case Existing(orig) => droppedOriginals += orig
          case Added(_)       => () // add+drop ⇒ no-op
        }
        cur -= n
    }
    val drops = droppedOriginals.map(DropColumn.apply).toSeq
    val renames = cur.collect {
      case (now, Existing(orig)) if now != orig => RenameColumn(orig, now)
    }.toSeq
    val adds = cur.collect { case (now, Added(t)) => AddColumn(now, t) }.toSeq
    drops ++ renames ++ adds
  }

  /**
   * Auto change detection: diff two schema states into the minimal op list
   * that evolves `old` into `target` — the reference's migration
   * auto-detector (reference nodestream/schema/migrations/
   * auto_change_detector.py:234-590) recast over the table's column algebra.
   * Columns are matched by stable field-id, so renames are detected exactly
   * (same id, different name); ids present only in `old` become drops, names
   * present only in `target` become adds. Ops come out in the canonical
   * reduced order (drops, renames, adds), and round-trip:
   * `applyOps(old, diff(old, target)) == target` (property-tested).
   */
  def diff(
      oldSchema: StructType, oldIds: Map[String, Int],
      targetSchema: StructType, targetIds: Map[String, Int]): Seq[SchemaOp] = {
    val oldById = oldIds.map(_.swap)
    val targetById = targetIds.map(_.swap)
    val drops = oldSchema.fields.toSeq
      .filter(f => !targetById.contains(oldIds(f.name)))
      .map(f => DropColumn(f.name))
    val renames = oldSchema.fields.toSeq.flatMap { f =>
      targetById.get(oldIds(f.name)).filter(_ != f.name).map(RenameColumn(f.name, _))
    }
    val adds = targetSchema.fields.toSeq
      .filter(f => !oldById.contains(targetIds(f.name)))
      .map(f => AddColumn(f.name, f.dataType.sql))
    drops ++ renames ++ adds
  }

  /** Name-matched diff for when field-ids are unknown (e.g. comparing to an
    * external desired schema): same-name columns are kept, old-only columns
    * dropped, target-only columns added — renames are indistinguishable from
    * drop+add without ids, exactly like the reference detector without its
    * interactive rename prompt. */
  def diffByName(oldSchema: StructType, targetSchema: StructType): Seq[SchemaOp] = {
    val oldNames = oldSchema.fieldNames.toSet
    val targetNames = targetSchema.fieldNames.toSet
    oldSchema.fields.toSeq.filterNot(f => targetNames.contains(f.name))
      .map(f => DropColumn(f.name)) ++
      targetSchema.fields.toSeq.filterNot(f => oldNames.contains(f.name))
        .map(f => AddColumn(f.name, f.dataType.sql))
  }

  /** Apply (already reduced) ops to a schema + field-id map; returns the new
    * schema, the new name→fieldId map, and the next unused field id. */
  def applyOps(
      schema: StructType,
      fieldIds: Map[String, Int],
      ops: Seq[SchemaOp]): (StructType, Map[String, Int]) = {
    var fields = schema.fields.toVector
    var ids = fieldIds
    var nextId = (ids.values ++ Seq(-1)).max + 1
    ops.foreach {
      case AddColumn(n, t) =>
        require(!fields.exists(_.name == n), s"column $n already exists")
        fields = fields :+ StructField(n, DataType.fromDDL(t), nullable = true)
        ids += (n -> nextId); nextId += 1
      case RenameColumn(a, b) =>
        require(!protectedColumns.contains(a), s"cannot rename protected column $a")
        require(fields.exists(_.name == a), s"no column $a")
        require(!fields.exists(_.name == b), s"column $b already exists")
        fields = fields.map(f => if (f.name == a) f.copy(name = b) else f)
        ids = ids - a + (b -> ids(a))
      case DropColumn(n) =>
        require(!protectedColumns.contains(n), s"cannot drop protected column $n")
        require(fields.exists(_.name == n), s"no column $n")
        fields = fields.filterNot(_.name == n)
        ids -= n
    }
    (StructType(fields), ids)
  }
}
