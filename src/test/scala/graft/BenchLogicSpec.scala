package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.Bench.{ScalePair, incoherent, medianCappedNormalized, needsExtraPairs, plausibleOf}

/** The bench's north-rule estimator and its adaptive-recovery trigger are
  * pure functions over (throughput, bandwidth-probe) pairs — testable
  * without spawning pinned JVMs. */
class BenchLogicSpec extends AnyFunSuite {

  private def pair(thrN: Double, bwN: Double, thr4N: Double, bw4N: Double) =
    ScalePair(thrN, bwN, thr4N, bw4N, coreRatio = 4.0)

  // a clean window: 4N gets ~2.3x the box's bandwidth and converts ~95% of it
  private val clean = pair(30000, 100, 66000, 230)   // normalized ≈ 0.9565
  // a degraded 4N window: throughput collapsed while the probe stayed high
  private val degraded = pair(30000, 100, 28000, 230) // normalized ≈ 0.4058

  test("normalized ratio converts bandwidth share; raw divides by core ratio") {
    assert(math.abs(clean.normalized - (66000.0 / 30000) / 2.3) < 1e-9)
    assert(math.abs(clean.raw - (66000.0 / 30000) / 4.0) < 1e-9)
  }

  test("probe ratios outside [1, coreRatio] are clamped before normalizing") {
    val sub = pair(30000, 100, 60000, 80) // bw ratio 0.8 -> clamps to 1
    assert(sub.bwRatio == 1.0 && math.abs(sub.normalized - 2.0) < 1e-9)
    val sup = pair(30000, 100, 60000, 500) // 5x -> clamps to coreRatio 4
    assert(sup.bwRatio == 4.0 && math.abs(sup.normalized - 0.5) < 1e-9)
  }

  test("median is over plausible pairs, capped at 1; implausible pairs are dropped") {
    val impossible = pair(10000, 100, 48000, 230) // raw 1.2 > 1 — impossible
    assert(plausibleOf(Seq(clean, degraded, impossible)) == Seq(clean, degraded))
    val m = medianCappedNormalized(Seq(clean, degraded, impossible))
    assert(math.abs(m - (clean.normalized + degraded.normalized) / 2) < 1e-9)
  }

  test("all-implausible case reports the UNCAPPED median, never a laundered 1.0") {
    val a = pair(10000, 100, 48000, 230) // raw 1.2
    val b = pair(10000, 100, 52000, 230) // raw 1.3
    val m = medianCappedNormalized(Seq(a, b))
    assert(m > 1.1, s"expected uncapped implausible median, got $m")
  }

  test("incoherence: >25% same-core probe spread across pairs") {
    assert(!incoherent(Seq(clean, clean)))
    val shifted = pair(30000, 100, 66000, 160) // bw4N 230 vs 160 — 44% spread
    assert(incoherent(Seq(clean, shifted)))
  }

  test("incoherence: an impossible pair or probe ratio flags the session") {
    assert(incoherent(Seq(clean, pair(10000, 230, 48000, 230)))) // raw > 1
    assert(incoherent(Seq(pair(30000, 100, 60000, 80))))         // bw ratio < 1
  }

  test("adaptive trigger: degraded-but-coherent session stands; mixed windows recover") {
    // every window equally degraded and coherent -> a real result, no extras
    assert(!needsExtraPairs(Seq(degraded.copy(bw4N = 230), degraded)))
    // mixed clean/degraded windows below the bar -> extras warranted
    val mixed = Seq(degraded, degraded, pair(30000, 100, 66000, 170))
    assert(medianCappedNormalized(mixed) < 0.8 && incoherent(mixed))
    assert(needsExtraPairs(mixed))
    // extra clean pairs lift the median only if clean windows now dominate
    val recovered = mixed ++ Seq(clean, clean, clean)
    assert(medianCappedNormalized(recovered) >= 0.8)
    assert(!needsExtraPairs(recovered))
  }
}
