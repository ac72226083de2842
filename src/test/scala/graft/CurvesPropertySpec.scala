package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Curves
import graft.maintenance.Maintenance
import graft.table.DataFileMeta

/** Property tests from SURVEY.md §5: curve-key bijectivity and locality,
  * bin-packing conservation. Pure ScalaCheck props are run through
  * `Test.check` (no scalatest bridge in the offline cache); structured
  * exhaustive checks use plain loops. */
class CurvesPropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  test("z-order value is injective and range-bounded (property)") {
    val bits = 8
    val coord = Gen.choose(0, (1 << bits) - 1)
    val point = Gen.listOfN(3, coord).map(_.toArray)
    check("z bijective", Prop.forAll(point, point) { (a, b) =>
      val za = Curves.zValue(a, bits)
      val zb = Curves.zValue(b, bits)
      ((za == zb) == a.sameElements(b)) && za >= 0 && za < (1L << (3 * bits))
    })
  }

  test("hilbert value is a bijection on the 2d cube (exhaustive)") {
    val seen = scala.collection.mutable.Map[Long, (Int, Int)]()
    for (x <- 0 until 32; y <- 0 until 32) {
      val h = Curves.hilbertValue(Array(x, y), 5)
      assert(h >= 0 && h < 1024)
      assert(!seen.contains(h), s"collision at ($x,$y) with ${seen.get(h)}")
      seen(h) = (x, y)
    }
    assert(seen.size == 1024)
  }

  test("hilbert curve is unit-step continuous (locality, exhaustive)") {
    val byIndex = (for (x <- 0 until 32; y <- 0 until 32)
      yield Curves.hilbertValue(Array(x, y), 5) -> (x, y)).toMap
    (0 until 1023).foreach { i =>
      val (x1, y1) = byIndex(i.toLong)
      val (x2, y2) = byIndex((i + 1).toLong)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between $i ($x1,$y1) and ${i + 1} ($x2,$y2)")
    }
  }

  test("hilbert bijective in 3d at 4 bits (exhaustive)") {
    val seen = scala.collection.mutable.Set[Long]()
    for (x <- 0 until 16; y <- 0 until 16; z <- 0 until 16) {
      val h = Curves.hilbertValue(Array(x, y, z), 4)
      assert(h >= 0 && h < 4096)
      assert(seen.add(h), s"collision at ($x,$y,$z)")
    }
  }

  test("bucketOf returns the count of bounds strictly below v (property)") {
    val boundsGen = Gen.listOf(Gen.choose(-1000, 1000)).map(_.distinct.sorted)
    check("bucketOf rank", Prop.forAll(boundsGen, Gen.choose(-1100, 1100)) { (bounds, v) =>
      val arr = bounds.map(Integer.valueOf(_).asInstanceOf[AnyRef]).toArray
      val got = Curves.bucketOf(v.asInstanceOf[Comparable[Any]], arr)
      // exclusive uppers: v lands in the bucket of the first bound >= v
      got == bounds.count(_ < v) && got >= 0 && got <= bounds.size
    })
  }

  test("bin-packing conserves files; bins exceed target only when singleton (property)") {
    val fileGen = for {
      sz <- Gen.choose(1L, 64L * 1024 * 1024)
      id <- Gen.uuid
    } yield DataFileMeta(s"data/$id.parquet", 1, sz, "a", "z", 1, 10, 10, Seq("web"))
    val targetGen = Gen.choose(1L * 1024 * 1024, 128L * 1024 * 1024)
    check("binPack", Prop.forAll(Gen.listOf(fileGen), targetGen) { (files, target) =>
      val bins = Maintenance.binPack(files, target)
      val flat = bins.flatten
      flat.map(_.path).sorted == files.map(_.path).sorted &&
      bins.forall(bin => bin.map(_.bytes).sum <= target || bin.size == 1)
    })
  }
}
