package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.gen.SequenceGen
import graft.table._

class SchemaEvolutionSpec extends SparkSpec {

  test("property: reduced op stream is semantics-preserving on random valid sequences") {
    // stepwise generator keeps each random op valid against the evolving state
    val rng = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val base = StructType(Seq(
        StructField("doc_id", StringType), StructField("tokens", ArrayType(IntegerType)),
        StructField("n_tok", IntegerType), StructField("source", StringType),
        StructField("a", DoubleType), StructField("b", LongType), StructField("c", StringType)))
      val baseIds = base.fieldNames.zipWithIndex.toMap
      var live = Set("a", "b", "c")
      var fresh = 0
      def freshName(): String = { fresh += 1; s"x$fresh" }
      val ops = (1 to (1 + rng.nextInt(20))).flatMap { _ =>
        rng.nextInt(3) match {
          case 0 =>
            val n = freshName(); live += n; Some(AddColumn(n, "DOUBLE"))
          case 1 if live.nonEmpty =>
            val from = live.toSeq.sorted(Ordering.String)(rng.nextInt(live.size))
            val to = freshName(); live = live - from + to; Some(RenameColumn(from, to))
          case 2 if live.nonEmpty =>
            val n = live.toSeq.sorted(Ordering.String)(rng.nextInt(live.size))
            live -= n; Some(DropColumn(n))
          case _ => None
        }
      }
      val (s1, ids1) = SchemaEvolution.applyOps(base, baseIds, ops)
      val (s2, ids2) = SchemaEvolution.applyOps(base, baseIds, SchemaEvolution.reduce(ops))
      // same surviving columns and types (order may differ for late adds)
      assert(s1.fields.map(f => (f.name, f.dataType)).toSet ==
        s2.fields.map(f => (f.name, f.dataType)).toSet, s"ops=$ops")
      // surviving ORIGINAL columns keep their original field ids on both paths
      val origIds = baseIds.values.toSet
      assert(ids1.filter(kv => origIds.contains(kv._2)) ==
        ids2.filter(kv => origIds.contains(kv._2)), s"ops=$ops")
    }
  }

  test("reduction: add+drop annihilates, rename chains collapse, drop wins") {
    assert(SchemaEvolution.reduce(Seq(
      AddColumn("q", "DOUBLE"), DropColumn("q"))) == Seq.empty)
    assert(SchemaEvolution.reduce(Seq(
      RenameColumn("a", "b"), RenameColumn("b", "c"))) == Seq(RenameColumn("a", "c")))
    assert(SchemaEvolution.reduce(Seq(
      RenameColumn("a", "b"), DropColumn("b"))) == Seq(DropColumn("a")))
    assert(SchemaEvolution.reduce(Seq(
      AddColumn("q", "DOUBLE"), RenameColumn("q", "quality"))) ==
      Seq(AddColumn("quality", "DOUBLE")))
    // independent ops survive untouched
    assert(SchemaEvolution.reduce(Seq(
      AddColumn("q", "DOUBLE"), DropColumn("other"))).toSet ==
      Set(AddColumn("q", "DOUBLE"), DropColumn("other")))
  }

  test("rename identity collapses to nothing") {
    assert(SchemaEvolution.reduce(Seq(
      RenameColumn("a", "b"), RenameColumn("b", "a"))) == Seq.empty)
  }

  test("protected columns cannot be dropped or renamed") {
    val root = tmpDir("se-protect")
    val t = SequenceGen.createTable(spark, s"$root/tbl", nDocs = 100, nFiles = 2)
    intercept[IllegalArgumentException] {
      t.evolveSchema(Seq(DropColumn("tokens")))
    }
    intercept[IllegalArgumentException] {
      t.evolveSchema(Seq(RenameColumn("doc_id", "id")))
    }
  }

  test("add column is metadata-only; old files read as null; new writes carry it") {
    val root = tmpDir("se-add")
    val t = SequenceGen.createTable(spark, s"$root/tbl", nDocs = 500, nFiles = 4)
    val dataFilesBefore = t.listDataFiles().toSet

    t.evolveSchema(Seq(AddColumn("quality", "DOUBLE")))
    assert(t.listDataFiles().toSet == dataFilesBefore) // no data rewritten
    assert(t.schema.fieldNames.contains("quality"))

    val scanned = t.scan(spark)
    assert(scanned.schema("quality").dataType == DoubleType)
    assert(scanned.filter(col("quality").isNotNull).count() == 0)

    // append rows under the new schema
    val withQ = SequenceGen.sequences(spark, 100, seed = 9)
      .withColumn("doc_id", concat(lit("new-"), col("doc_id")))
      .withColumn("quality", lit(0.5))
    t.commit("append", t.stageWrite(withQ, "q-append"))
    val out = t.scan(spark)
    assert(out.count() == 600)
    assert(out.filter(col("quality") === 0.5).count() == 100)
    assert(out.filter(col("quality").isNull).count() == 500)
  }

  test("rename is safe for files written before the rename (field-id resolution)") {
    val root = tmpDir("se-rename")
    val t = SequenceGen.createTable(spark, s"$root/tbl", nDocs = 200, nFiles = 2)
    t.evolveSchema(Seq(AddColumn("q", "DOUBLE")))
    val withQ = SequenceGen.sequences(spark, 50, seed = 3)
      .withColumn("doc_id", concat(lit("q-"), col("doc_id")))
      .withColumn("q", lit(1.25))
    t.commit("append", t.stageWrite(withQ, "q1"))

    // rename q -> quality: files on disk still carry column "q"
    t.evolveSchema(Seq(RenameColumn("q", "quality")))
    val out = t.scan(spark)
    assert(out.schema.fieldNames.contains("quality") && !out.schema.fieldNames.contains("q"))
    assert(out.filter(col("quality") === 1.25).count() == 50)

    // and writes under the *new* name coexist with old-name files
    val withQuality = SequenceGen.sequences(spark, 25, seed = 4)
      .withColumn("doc_id", concat(lit("q2-"), col("doc_id")))
      .withColumn("quality", lit(2.5))
    t.commit("append", t.stageWrite(withQuality, "q2"))
    val out2 = t.scan(spark)
    assert(out2.filter(col("quality") === 1.25).count() == 50)
    assert(out2.filter(col("quality") === 2.5).count() == 25)
    assert(out2.count() == 275)
  }

  test("drop column then compaction rewrites without it; merge keeps extras") {
    val root = tmpDir("se-drop")
    val t = SequenceGen.createTable(spark, s"$root/tbl", nDocs = 300, nFiles = 6)
    t.evolveSchema(Seq(AddColumn("tag", "STRING"), AddColumn("junk", "INT")))
    t.evolveSchema(Seq(DropColumn("junk")))
    assert(!t.schema.fieldNames.contains("junk"))

    // merge preserves the evolved extra column on untouched target rows
    import spark.implicits._
    val batch = Seq(("doc000000000001", Seq(1, 2), 2, "web"))
      .toDF("doc_id", "tokens", "n_tok", "source")
    graft.maintenance.Maintenance.mergeInto(spark, t, batch)
    val out = t.scan(spark)
    assert(out.schema.fieldNames.contains("tag"))
    assert(out.count() == 300)
    assert(out.filter($"doc_id" === "doc000000000001").select("n_tok").head().getInt(0) == 2)

    // full rewrite under current schema still succeeds (old files projected)
    graft.maintenance.Maintenance.compact(spark, t, targetFileBytes = 64L * 1024 * 1024)
    assert(t.scan(spark).count() == 300)
  }
}
