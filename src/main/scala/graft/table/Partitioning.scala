package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/**
 * Partition-transform evaluation for hidden partitioning (TableMetadata
 * .partitionSpec) — both forms of every transform, kept adjacent so they
 * cannot drift:
 *
 *  - the COLUMN form stamps `_p_<name>` columns onto a DataFrame for the
 *    partition-aligned write (`df.write.partitionBy`), evaluated by Spark
 *    per row;
 *  - the VALUE form computes the same transform driver-side for pruning
 *    (a point-lookup key → its bucket, compared against each file's
 *    recorded partition tuple).
 *
 * Bucket hashing uses the engine's portable polynomial char hash
 * ([[graft.functions.TextHash.polyHash]] / the native CharPolyHash
 * expression) for strings — reproducible by an independent engine, unlike
 * xxhash64 — and `pmod(value, n)` for integral columns. The nodestream
 * analogue is the per-type copy concurrency split
 * (reference nodestream/databases/copy.py:103-155): work is routed by a
 * declared key derivation, and every derived value is recorded so later
 * stages prune by it.
 */
object Partitioning {

  /** Staging-column prefix: `partitionBy` removes these from the data file,
    * leaving the original columns intact (identity values are DUPLICATED
    * into `_p_<col>`, never moved — an identity-partitioned file still
    * carries its source column, unlike naive `partitionBy(source)`). */
  val ColPrefix = "_p_"

  def partitionColName(f: PartitionField): String = ColPrefix + f.name

  /** The column form of one transform. */
  def transformCol(f: PartitionField, dataType: org.apache.spark.sql.types.DataType): Column =
    f.transform match {
      case "identity" => col(f.column).cast(StringType)
      case "bucket" =>
        val n = f.n.get
        if (dataType == StringType)
          pmod(graft.functions.GraftFunctions.char_poly_hash(
            col(f.column), 131, graft.functions.TextHash.P1), lit(n.toLong))
        else pmod(col(f.column).cast("long"), lit(n.toLong))
      case "truncate" =>
        val w = f.n.get
        if (dataType == StringType) substring(col(f.column), 1, w)
        else {
          // floor to the width's multiple (Iceberg truncate): pmod keeps the
          // floor correct for negative values too (-7 truncate 10 -> -10)
          val v = col(f.column).cast("long")
          v - pmod(v, lit(w.toLong))
        }
    }

  /** The driver-side value form: the partition value a row with `value` in
    * the field's column lands in (string rendering matches the column form's
    * directory name). `dataType` must be the column's ACTUAL type, looked up
    * from the table schema — the bucket hash for an integral column is
    * `value % n` in BOTH forms, while a string column polynomial-hashes;
    * passing the wrong type disagrees with the column form and prunes rows
    * away. No default: a silently-assumed StringType on an integral bucket
    * column compiles and then drops rows. */
  def transformValue(
      f: PartitionField, value: String,
      dataType: org.apache.spark.sql.types.DataType): String = f.transform match {
    case "identity" => value
    case "bucket" if dataType == StringType =>
      (graft.functions.TextHash.polyHash(
        UTF8String.fromString(value), 131, graft.functions.TextHash.P1) % f.n.get).toString
    case "bucket" =>
      // mirrors the column form's pmod(cast long, n) for integral columns
      (((value.toLong % f.n.get) + f.n.get) % f.n.get).toString
    case "truncate" if dataType == StringType =>
      // Spark's substring counts CODE POINTS, not UTF-16 units — a
      // String.substring(0, w) would cut supplementary characters
      // differently and disagree with the tuple the column form recorded
      val end = value.offsetByCodePoints(
        0, math.min(f.n.get, value.codePointCount(0, value.length)))
      value.substring(0, end)
    case "truncate" =>
      val v = value.toLong
      val w = f.n.get
      (v - (((v % w) + w) % w)).toString
  }

  /** Exact interval test for a truncate-partitioned integral column: a file
    * whose tuple records truncate value `v` holds only rows in
    * [v, v + width), so it can match a query range iff the intervals
    * overlap. Drives stats-free range pruning in `TokenTable.planFiles`. */
  def truncateIntervalMayContain(
      truncValue: String, width: Int, lo: Option[Long], hi: Option[Long]): Boolean = {
    val v = truncValue.toLong
    lo.forall(l => v + width > l) && hi.forall(h => v <= h)
  }

  /** Stamp the spec's `_p_*` columns onto a frame (no-op for empty spec). */
  def withPartitionCols(df: DataFrame, spec: Seq[PartitionField]): DataFrame =
    spec.foldLeft(df) { (d, f) =>
      d.withColumn(partitionColName(f), transformCol(f, df.schema(f.column).dataType))
    }

  /** Spark's directory name for a null/empty dynamic-partition value. A
    * tuple entry with this sentinel is dropped (recorded as "value unknown")
    * rather than stored verbatim: exact-match pruning against the literal
    * sentinel would silently hide every empty-valued row from pruned scans,
    * while an absent entry falls back to stats — conservative, never wrong. */
  val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Parse a staged file's partition tuple from its relative path —
    * `.../_p_source=web/_p_doc_id_bucket4=3/part-0.parquet` →
    * Map(source -> web, doc_id_bucket4 -> 3). Returns None when the path
    * carries no partition directories. */
  def partitionFromPath(relPath: String): Option[Map[String, String]] = {
    val kvs = relPath.split('/').toSeq.flatMap { seg =>
      val eq = seg.indexOf('=')
      if (seg.startsWith(ColPrefix) && eq > ColPrefix.length)
        Some(seg.substring(ColPrefix.length, eq) -> unescapePathValue(seg.substring(eq + 1)))
      else None
    }.filterNot(_._2 == HiveDefaultPartition)
    if (kvs.isEmpty) None else Some(kvs.toMap)
  }

  /** Undo Spark's partition-directory escaping (percent-encoded bytes; the
    * same scheme Hive uses). Plain values pass through untouched. */
  private[graft] def unescapePathValue(s: String): String = {
    if (!s.contains('%')) return s
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val hexByte =
        if (s.charAt(i) == '%' && i + 2 < s.length)
          scala.util.Try(Integer.parseInt(s.substring(i + 1, i + 3), 16)).toOption
        else None
      if (hexByte.nonEmpty) {
        out.write(hexByte.get)
        i += 3
      } else {
        // copy the whole raw run up to the next '%' in ONE getBytes call —
        // per-UTF-16-unit conversion would split surrogate pairs and mangle
        // supplementary-plane characters into '?'
        var j = i + 1
        while (j < s.length && s.charAt(j) != '%') j += 1
        out.write(s.substring(i, j).getBytes("UTF-8"))
        i = j
      }
    }
    new String(out.toByteArray, "UTF-8")
  }

  /** Cluster a frame by its partition tuple before writing (partition-aware
    * write distribution): each write task then holds few partition values,
    * so `partitionBy` fan-out stays bounded instead of every task writing a
    * file per value. `saltBuckets > 1` adds a doc_id-hash salt to the
    * distribution key: without it parallelism is capped at the distinct
    * tuple count and each tuple lands as ONE file however large — a skewed
    * tuple would OOM its single task at scale. With salt s, a tuple splits
    * across up to s tasks/files, so file sizing (nOut/targetFileBytes) is
    * honored again. */
  def distributeByPartition(
      df: DataFrame, spec: Seq[PartitionField], nOut: Int,
      saltBuckets: Int = 1): DataFrame = {
    if (spec.isEmpty) return df
    val stamped = withPartitionCols(df, spec)
    val salt =
      if (saltBuckets > 1 && df.columns.contains("doc_id"))
        Seq(pmod(graft.functions.GraftFunctions.char_poly_hash(
          col("doc_id"), 137, graft.functions.TextHash.P2), lit(saltBuckets.toLong)))
      else Seq.empty
    stamped.repartition(nOut, spec.map(f => col(partitionColName(f))) ++ salt: _*)
      .drop(spec.map(partitionColName): _*)
  }
}
