package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TokenCodec

/** Round-trip law for the shuffle-payload codec behind the curve-cluster
  * exchange ([[graft.maintenance.Maintenance]] curveShuffle). */
class TokenCodecSpec extends AnyFunSuite {

  private def roundtrip(vals: Seq[Any]): Seq[Any] = {
    val packed = TokenCodec.pack(new GenericArrayData(vals.toArray))
    val out = TokenCodec.unpack(packed)
    (0 until out.numElements()).map(i => if (out.isNullAt(i)) null else out.getInt(i))
  }

  test("dense arrays round-trip exactly") {
    val cases = Seq(
      Seq.empty[Any],
      Seq[Any](0),
      Seq[Any](42),
      Seq[Any](1, 2, 3, 4, 5),
      Seq[Any](50020, 0, 50020, 1), // wrap-style jumps
      Seq[Any](Int.MaxValue, Int.MinValue, -1, 0, 7),
      (0 until 10000).map(i => (i * 31 + 7) % 50021: Any))
    cases.foreach(c => assert(roundtrip(c) == c))
  }

  test("arrays with null elements round-trip exactly") {
    val cases = Seq(
      Seq[Any](null),
      Seq[Any](null, 1, null, 2, null),
      Seq[Any](1, null, -5, null, Int.MinValue),
      (0 until 100).map(i => if (i % 7 == 0) null else i - 50: Any))
    cases.foreach(c => assert(roundtrip(c) == c))
  }

  test("packed size is small for vocabulary-range token streams") {
    val toks = (0 until 4096).map(i => (i * 31 + 123) % 50021: Any)
    val packed = TokenCodec.pack(new GenericArrayData(toks.toArray))
    // arithmetic-delta streams approach ~1 byte/token (raw is 4)
    assert(packed.length < toks.length * 2, s"packed ${packed.length}B for ${toks.length} tokens")
  }

  test("worst-case arbitrary int32 stays within the 5-bytes/element bound") {
    val rnd = new scala.util.Random(7)
    val toks = (0 until 4096).map(_ => rnd.nextInt(): Any)
    val packed = TokenCodec.pack(new GenericArrayData(toks.toArray))
    assert(packed.length <= toks.length * 5 + 5)
    assert(roundtrip(toks) == toks)
  }
}
