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

  test("cost weighting: sub-second fires at 1.5x, >= 1 s fires at 2x (monotone)") {
    // prior warm 0.5 s (SUB-SECOND, r14 verdict #3): 1.3x stays quiet...
    assert(!Bench.shouldReadjudicate(false, false, false,
      cold = 2.0, warmStat = 0.65, Some(0.5), Some(1.8), 1.0))
    // ...but 2.2x now fires — the json_extract class (0.39 -> 0.84 =
    // 2.12x) that escaped the old 3x factor + 0.3 s floor
    assert(Bench.shouldReadjudicate(false, false, false,
      cold = 2.0, warmStat = 1.1, Some(0.5), Some(1.8), 1.0))
    // a 60 ms wobble under the 0.15 s jitter floor never fires
    assert(!Bench.shouldReadjudicate(false, false, false,
      cold = 0.3, warmStat = 0.14, Some(0.08), Some(0.28), 1.0))
    // prior warm 1.2 s: 1.8x stays quiet, 2.2x fires — the r15 ADVICE
    // blind spot (the old ladder gave [1,2) s priors a 3x factor, the
    // LEAST sensitive tier: a 1.9 s -> 5.5 s regression stayed quiet
    // while a 0.9 s -> 1.4 s one fired; tiers are now monotone in cost)
    assert(!Bench.shouldReadjudicate(false, false, false,
      cold = 4.0, warmStat = 2.16, Some(1.2), Some(3.8), 1.0))
    assert(Bench.shouldReadjudicate(false, false, false,
      cold = 4.0, warmStat = 2.64, Some(1.2), Some(3.8), 1.0))
    // the ADVICE's own example: 1.9 s -> 5.5 s (2.9x) must fire now
    assert(Bench.shouldReadjudicate(false, false, false,
      cold = 6.0, warmStat = 5.5, Some(1.9), Some(5.8), 1.0))
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

  test("a new query (no prior row) readjudicates once; trivial new rows and streams do not") {
    // the r16 case: sim_ivfpq_batch's first committed in-suite warm was
    // 22.9 s against a 12.7 s solo median, and no prior-keyed trigger
    // could fire on a row with no prior — new queries get one solo block
    assert(Bench.shouldReadjudicate(false, false, false,
      cold = 17.3, warmStat = 22.9, None, None, 1.0, newQuery = true))
    // under the jitter floor a new row is not worth a solo block
    assert(!Bench.shouldReadjudicate(false, false, false,
      cold = 0.4, warmStat = 0.2, None, None, 1.0, newQuery = true))
    // a new STREAM stays with the class protocol
    assert(!Bench.shouldReadjudicate(true, false, false,
      cold = 5.0, warmStat = 4.0, None, None, 1.0, newQuery = true))
  }

  test("streams without a cross-round warm regression, and errored rows, stay quiet") {
    // a stream whose warm median sits at its prior (16 vs 15) never fires,
    // whatever its cold does — stream cold carries checkpoint-dir setup
    assert(!Bench.shouldReadjudicate(true, false, false,
      cold = 172.0, warmStat = 16.0, Some(15.0), Some(8.0), 1.0))
    assert(!Bench.shouldReadjudicate(false, true, false,
      cold = 172.0, warmStat = 16.0, Some(15.0), Some(8.0), 1.0))
  }

  test("stream tier (r16 verdict #2): cross-round warm regression fires, inversion alone does not") {
    // the r16 driver-window case: stream_pattern's committed median read
    // 4.86 s against a 0.84 s prior (5.8x) and NO trigger could examine
    // it — the per-query stream tier must fire on exactly that row
    assert(Bench.shouldReadjudicate(true, false, false,
      cold = 5.2, warmStat = 4.86, Some(0.84), Some(1.9), 1.0))
    // in-suite warm>cold inversion alone stays quiet for streams: the
    // state-store setup noise the median-of-3+ protocol absorbs would
    // fire it every round
    assert(!Bench.shouldReadjudicate(true, false, false,
      cold = 1.0, warmStat = 2.0, Some(1.8), Some(1.1), 1.0))
    // sub-second streams use the same monotone sub-second tier
    assert(Bench.shouldReadjudicate(true, false, false,
      cold = 1.2, warmStat = 0.9, Some(0.4), Some(1.0), 1.0))
    // and the calib normalization applies unchanged
    assert(!Bench.shouldReadjudicate(true, false, false,
      cold = 10.0, warmStat = 9.7, Some(5.0), Some(9.0), 2.0))
  }

  test("calib normalization: a uniformly 2x-slower box does not fire") {
    // every number doubled, calibRatio 2.0 — nothing should trigger
    assert(!Bench.shouldReadjudicate(false, false, false,
      cold = 16.5, warmStat = 11.0, Some(5.5), Some(8.2), 2.0))
  }

  test("fold: the r12 noise-hit solo block is flagged suspect, not folded") {
    // the exact numbers the r12 driver folded into its headline: in-suite
    // warm 13.111, solo warms [80.702, 65.805] at block calib 0.101 vs
    // suite calib 0.171 — the solo median is 5x the in-suite number with
    // the host measured FASTER during the block, so the re-run itself is
    // the outlier (the judge's five independent solo runs: 6.0-7.3 s)
    val (fold, suspect) = Bench.foldReadjudicated(
      inSuiteWarm = 13.111, soloWarms = Seq(80.702, 65.805),
      suiteCalib = 0.171, calibBefore = 0.101, calibAfter = 0.101)
    assert(fold.isEmpty && suspect)
  }

  test("fold: a legitimate in-suite spike refuted solo folds the median") {
    // dedup_keep_best r12: in-suite 77.8 s, solo ~3.3-4.0 — solo BETTER
    // than in-suite is exactly what readjudication exists to accept
    val (fold, suspect) = Bench.foldReadjudicated(
      inSuiteWarm = 77.79, soloWarms = Seq(3.3, 3.76, 4.0),
      suiteCalib = 0.171, calibBefore = 0.101, calibAfter = 0.110)
    assert(fold.contains(3.76) && !suspect)
  }

  test("fold: solo-worse explained by measured host drift is accepted") {
    // the box slowed 2x between suite and block (calib 0.1 -> 0.2): a
    // solo warm up to 2x the in-suite number (+0.3 floor) is the host,
    // not the query
    val (fold, suspect) = Bench.foldReadjudicated(
      inSuiteWarm = 5.0, soloWarms = Seq(9.0, 9.4, 9.1),
      suiteCalib = 0.1, calibBefore = 0.2, calibAfter = 0.2)
    assert(fold.contains(9.1) && !suspect)
    // ...but beyond the drift allowance it is suspect
    val (f2, s2) = Bench.foldReadjudicated(5.0, Seq(11.0, 11.2, 11.1), 0.1, 0.2, 0.2)
    assert(f2.isEmpty && s2)
  }

  test("fold: no successful solo runs folds nothing and flags nothing") {
    assert(Bench.foldReadjudicated(5.0, Nil, 0.1, 0.1, 0.1) === ((None, false)))
  }

  test("stream group trigger: class-median inflation fires, one outlier does not") {
    // r12: byte-unchanged stream rows inflated ~3x as a GROUP in-suite
    assert(Bench.streamGroupRegressed(Seq(2.9, 3.4, 2.5, 4.7, 2.2)))
    // a single regressed stream in an otherwise healthy class is not a
    // class-wide host effect — median stays quiet
    assert(!Bench.streamGroupRegressed(Seq(1.0, 1.1, 0.9, 5.0)))
    assert(!Bench.streamGroupRegressed(Nil))
  }

  test("deriveRound: max of verdict header and artifact rounds, plus one") {
    // the r13 failure case: VERDICT said round 13 and BENCH_r13.json /
    // CORRECTNESS_r13.json existed, yet the hard-coded default wrote
    // BENCH_LOCAL_r12.json — the derived name must be r14
    assert(Bench.deriveRound(Some("# VERDICT — round 13"),
      Seq("BENCH_r13.json", "CORRECTNESS_r13.json", "BENCH_LOCAL_r13.json",
        "BENCH_r09.json", "SURVEY.md")) === Some(14))
    // stale verdict cannot pull the name backwards onto a committed file
    assert(Bench.deriveRound(Some("# VERDICT — round 2"),
      Seq("BENCH_r13.json")) === Some(14))
    // zero-padded early-round artifact names parse
    assert(Bench.deriveRound(None, Seq("CORRECTNESS_r01.json")) === Some(2))
    // no signal at all -> None (caller falls back to a non-round name)
    assert(Bench.deriveRound(None, Seq("README.md")) === None)
    // BENCH_LOCAL files are NOT authoritative (this run may be re-run)
    assert(Bench.deriveRound(None, Seq("BENCH_LOCAL_r12.json")) === None)
  }

  test("r12 driver-file replay: one suspect, adjudicated total lands at the clean number") {
    // end-to-end done-criterion for r12 verdict #3: replaying the
    // committed driver bench through the new fold yields ~210 s (the
    // builder's clean run adjudicated 216.6 at a worse calib window) and
    // flags exactly the corpus_clean_incr block the judge refuted.
    // FROZEN fixture (r13 verdict #1): the original assertion read the
    // live repo-root BENCH_LOCAL_r12.json, which the driver's own r13
    // bench run overwrote with r13 data — a spec must never depend on a
    // driver-mutable artifact path, so the r12 replay content is frozen
    // under test resources where nothing but a deliberate edit touches it.
    val in = getClass.getResourceAsStream("/bench_r12_replay.json")
    assume(in != null, "frozen replay fixture missing from test resources")
    val bytes = try {
      in.readAllBytes()
    } finally in.close()
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(bytes)
    val calib = root.path("calib_sec").asDouble(0.0)
    val qs = root.path("queries")
    var total = 0.0
    var suspects = List.empty[String]
    val names = qs.fieldNames()
    while (names.hasNext) {
      val name = names.next()
      val q = qs.path(name)
      val warm = q.path("warm").asDouble(Double.NaN)
      val r = q.path("readjudicated")
      val solos = if (r.isMissingNode) Nil
        else (0 until r.path("runs").size())
          .map(i => r.path("runs").get(i))
          .filterNot(_.isNull).map(_.asDouble).toSeq
      if (r.isMissingNode || solos.isEmpty) total += warm
      else {
        val cb = r.path("calib_sec").asDouble(calib)
        val (fold, suspect) = Bench.foldReadjudicated(warm, solos, calib, cb, cb)
        total += fold.getOrElse(warm)
        if (suspect) suspects ::= name
      }
    }
    assert(suspects === List("corpus_clean_incr"))
    assert(total > 195 && total < 230, s"replayed adjudicated total $total")
  }
}
