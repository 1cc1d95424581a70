package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replays committed bench history against the self-adjudication trigger
  * predicate. The load-bearing case is the r11 cold spike (verdict r11 #4):
  * `corpus_clean_incr` recorded cold = 172.0 s against an r10 prior cold of
  * 8.27 s, but warm (16.4 s vs prior 15.6 s) was unremarkable — so neither
  * the inversion trigger nor the cross-round WARM trigger fired and a 20x
  * cold regression shipped unadjudicated. Trigger C (cold-vs-prior-cold,
  * same cost weighting) must catch exactly that row.
  */
class BenchTriggerSpec extends AnyFunSuite {

  // r11 driver run vs r10 prior: calib 0.140 / 0.156
  private val calibRatio = 0.140 / 0.156

  test("r11 cold spike replay: corpus_clean_incr fires on trigger C") {
    assert(Bench.shouldReadjudicate(
      isStream = false, hasErr = false, noWarm = false,
      cold = 172.01, warmStat = 16.422,
      priorWarm = Some(15.584), priorCold = Some(8.274),
      calibRatio = calibRatio))
  }

  test("r11 cold spike replay: warm alone would NOT have fired (the blind spot)") {
    // the identical row with the prior-cold information withheld — i.e.
    // the r11 machinery, which only had the warm triggers. Warm 16.4 vs
    // prior 15.6 is quiet, and cold 172 >> warm blocks the inversion
    // trigger, so the 20x cold regression shipped silently.
    assert(!Bench.shouldReadjudicate(
      isStream = false, hasErr = false, noWarm = false,
      cold = 172.01, warmStat = 16.422,
      priorWarm = Some(15.584), priorCold = None,
      calibRatio = calibRatio))
  }

  test("healthy heavyweight row does not fire") {
    assert(!Bench.shouldReadjudicate(
      isStream = false, hasErr = false, noWarm = false,
      cold = 9.1, warmStat = 5.8,
      priorWarm = Some(5.5), priorCold = Some(8.9), calibRatio = 1.0))
  }

  test("cost weighting: cheap query needs 3x, expensive 2x") {
    // prior warm 0.5 s (cheap): 2.2x miss stays quiet, 3.5x fires
    assert(!Bench.shouldReadjudicate(false, false, false,
      cold = 2.0, warmStat = 1.1, Some(0.5), Some(1.8), 1.0))
    assert(Bench.shouldReadjudicate(false, false, false,
      cold = 3.0, warmStat = 1.8, Some(0.5), Some(2.8), 1.0))
    // prior warm 3 s (expensive): 2.2x fires
    assert(Bench.shouldReadjudicate(false, false, false,
      cold = 8.0, warmStat = 6.6, Some(3.0), Some(7.5), 1.0))
  }

  test("inversion trigger unchanged") {
    assert(Bench.shouldReadjudicate(false, false, false,
      cold = 1.0, warmStat = 2.0, None, None, 1.0))
    assert(!Bench.shouldReadjudicate(false, false, false,
      cold = 1.0, warmStat = 1.2, None, None, 1.0))
  }

  test("streams and errored rows are excluded") {
    assert(!Bench.shouldReadjudicate(true, false, false,
      cold = 172.0, warmStat = 16.0, Some(15.0), Some(8.0), 1.0))
    assert(!Bench.shouldReadjudicate(false, true, false,
      cold = 172.0, warmStat = 16.0, Some(15.0), Some(8.0), 1.0))
  }

  test("calib normalization: a uniformly 2x-slower box does not fire") {
    // every number doubled, calibRatio 2.0 — nothing should trigger
    assert(!Bench.shouldReadjudicate(false, false, false,
      cold = 16.5, warmStat = 11.0, Some(5.5), Some(8.2), 2.0))
  }
}
