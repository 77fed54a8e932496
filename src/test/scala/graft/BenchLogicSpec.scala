package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round-4 verdict's acceptance test for the contention defense: a
  * deliberately-loaded run's emitted `total_clean` must stay within 15% of
  * the quiet-host total. The load is simulated deterministically (a virtual
  * clock with an 8x multiplier window) rather than with a live CPU hog so
  * the assertion is exact and CI-stable — the logic under test only ever
  * sees elapsed-seconds samples, so the simulation exercises the identical
  * code path the real bench drives.
  */
class BenchLogicSpec extends AnyFunSuite {
  import BenchLogic._

  // -- measure(): the per-query adaptive loop ------------------------------

  test("transient spike washed by the second base repeat: no escalation") {
    val seq = Iterator(9.0, 0.9)
    val o = measure("q", () => seq.next(), Some(1.0), 2, turbulent = false)
    assert(o.samples == Vector(9.0, 0.9))
    assert(o.best == 0.9 && !o.contended && o.clean == 0.9)
  }

  test("suspect min escalates until a clean agreeing pair appears") {
    val seq = Iterator(9.0, 9.1, 0.95, 1.0)
    val o = measure("q", () => seq.next(), Some(1.0), 2, turbulent = false)
    // base pair suspect (9.0 > 3x1.0) -> extra run 0.95 clears suspicion but
    // best-two [0.95, 9.0] disagree -> one more run 1.0 agrees -> stop at 4
    assert(o.samples.size == 4)
    assert(o.best == 0.95 && !o.contended && o.clean == 0.95)
  }

  test("sustained load exhausts MaxAttempts, flags contended, substitutes record") {
    val o = measure("q", () => 9.0, Some(1.0), 2, turbulent = false)
    assert(o.samples.size == MaxAttempts)
    assert(o.best == 9.0 && o.contended && o.clean == 1.0)
  }

  test("escalated query that never agrees is flagged even when min dips under 3x") {
    // sustained load with one sample creeping to 2.9x the record: the
    // suspect ratio alone would report clean=2.9 unflagged — the
    // escalation's own never-agreed criterion must flag it
    val seq = Iterator(9.0, 9.1, 2.9, 9.2, 9.2, 9.2)
    val o = measure("q", () => seq.next(), Some(1.0), 2, turbulent = false)
    assert(o.samples.size == MaxAttempts)
    assert(o.best == 2.9 && o.contended && o.clean == 1.0)
  }

  test("genuine regression under a quiet host: flagged, clean keeps the record") {
    // A real 4x regression reproduces identically on every re-run; the
    // artifact flags it (total_clean is then too OPTIMISTIC, but `total`
    // carries the true measurement and the flag says which to read).
    val o = measure("q", () => 4.0, Some(1.0), 2, turbulent = false)
    assert(o.contended && o.best == 4.0 && o.clean == 1.0)
  }

  test("no record: no escalation on a quiet host, min taken") {
    val seq = Iterator(2.0, 1.0)
    val o = measure("q", () => seq.next(), None, 2, turbulent = false)
    assert(o.samples.size == 2 && o.best == 1.0 && !o.contended)
  }

  test("no record + turbulent block: extra repeat, disagreement flags") {
    val seq = Iterator(8.0, 4.0, 2.0)
    val o = measure("q", () => seq.next(), None, 2, turbulent = true)
    assert(o.samples.size == 3)
    assert(o.best == 2.0 && o.contended && o.clean == 2.0)
  }

  test("record floor: a 10ms query measured at 40ms does not escalate") {
    val o = measure("q", () => 0.04, Some(0.01), 2, turbulent = false)
    assert(o.samples.size == 2 && !o.contended)
  }

  test("all repeats failing records -1 best, never a small elapsed time") {
    val o = measure("q", () => -1.0, Some(1.0), 2, turbulent = false)
    assert(o.best == -1.0 && o.clean == -1.0 && !o.contended)
  }

  // -- loadRecord(): committed-record extraction ---------------------------

  test("loadRecord parses the self-generated format and drops failures") {
    val text = """{"metric":"total","value":10.0,"unit":"sec","queries":{"a":1.500,"b":-1.000,"c":0.250},"sentinel":[0.100,0.300,0.200],"sf":"/x"}"""
    val (q, med) = loadRecord(text)
    assert(q == Map("a" -> 1.5, "c" -> 0.25))
    assert(med.contains(0.2))
  }

  test("loadRecord on garbage yields empty, not a crash") {
    assert(loadRecord("not json at all") == (Map.empty, None))
  }

  test("loadRecord tolerates Python-style whitespace after colons and commas") {
    // round 5's regression: external tooling re-serialized the committed
    // record with `"key": value` spacing and the colon-tight regexes parsed
    // it to empty — the defense silently ran recordless in the driver.
    val text = """{"metric": "total", "value": 10.0, "queries": {"a": 1.5, "b": -1.0, "c": 0.25}, "sentinel": [0.1, 0.3, 0.2], "sf": "/x"}"""
    val (q, med) = loadRecord(text)
    assert(q == Map("a" -> 1.5, "c" -> 0.25))
    assert(med.contains(0.2))
  }

  test("recordMatchesSf tolerates whitespace and regex metacharacters in the path") {
    assert(recordMatchesSf("""{"sf": "/root/testdata/sf0.1"}""", "/root/testdata/sf0.1"))
    assert(recordMatchesSf("""{"sf":"/root/testdata/sf0.1"}""", "/root/testdata/sf0.1"))
    // the `.` in sf0.1 must not match sfX1 (Pattern.quote)
    assert(!recordMatchesSf("""{"sf": "/root/testdata/sfXY1"}""", "/root/testdata/sf0.1"))
    assert(!recordMatchesSf("""{"sf": "/other"}""", "/root/testdata/sf0.1"))
  }

  test("the ACTUAL committed bench_record.json parses: >=280 records + sentinel median") {
    // the integration gap that shipped round 5 broken: the spec only ever
    // saw self-generated text. This reads the real committed file from the
    // repo root (sbt test cwd) and asserts the defense would actually arm.
    val p = java.nio.file.Paths.get("bench_record.json")
    assume(java.nio.file.Files.exists(p), "bench_record.json not committed yet")
    val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val (q, med) = loadRecord(text)
    assert(q.size >= 280, s"only ${q.size} records parsed from the committed file")
    assert(med.isDefined, "sentinel median must parse from the committed file")
    assert(recordMatchesSf(text, "/root/testdata/sf0.1"),
      "committed record must be recognized as the sf0.1 record")
    assert(q.values.forall(v => v > 0 && v < 600), "record times must be sane seconds")
  }

  // -- remeasurePass(): end-of-suite recovery ------------------------------

  private def outcomeOf(name: String, best: Double,
                        contended: Boolean = false): Outcome =
    Outcome(name, Vector(best, best), best,
      if (contended) -999 else best, contended)

  test("remeasurePass rescues a transient inflation after the suite ends") {
    // kv_shard_chi2's round-5 shape: record 0.48, every in-suite sample 5.0
    // (pressure window wider than MaxAttempts), but the end-of-suite re-run
    // lands minutes later on a quiet host.
    val suite = SuiteResult(Vector(
      Outcome("chi2", Vector(5.0, 5.0, 5.0, 5.0, 5.0, 5.0), 5.0, 0.48, contended = true),
      outcomeOf("fine", 0.2)), Vector(0.02))
    val replay = Iterator(0.51, 0.50)
    val out = remeasurePass(suite,
      Map("chi2" -> (() => replay.next()), "fine" -> (() => 99.0)),
      Map("chi2" -> 0.48, "fine" -> 0.2))
    val chi2 = out.outcomes.find(_.name == "chi2").get
    assert(chi2.best == 0.50 && !chi2.contended && chi2.clean == 0.50)
    assert(chi2.samples.size == 8)
    // "fine" was under the gate: untouched, its runner never invoked
    val fine = out.outcomes.find(_.name == "fine").get
    assert(fine.best == 0.2 && fine.samples.size == 2)
  }

  test("remeasurePass keeps the flag for a genuine regression") {
    val suite = SuiteResult(Vector(
      Outcome("reg", Vector(4.0, 4.0, 4.0, 4.0, 4.0, 4.0), 4.0, 1.0, contended = true)),
      Vector(0.02))
    val out = remeasurePass(suite, Map("reg" -> (() => 4.0)), Map("reg" -> 1.0))
    val reg = out.outcomes.find(_.name == "reg").get
    assert(reg.best == 4.0 && reg.contended && reg.clean == 1.0)
  }

  test("remeasurePass caps at maxQueries, worst absolute excess first") {
    val outcomes = (1 to 5).map { i =>
      // record 1.0 each; excess grows with i
      Outcome(s"q$i", Vector(1.0 + i), 1.0 + i, 1.0, contended = true)
    }.toVector
    var ran = Set.empty[String]
    val runners = outcomes.map(o => o.name -> { () => ran += o.name; 1.0 }).toMap
    val records = outcomes.map(_.name -> 1.0).toMap
    remeasurePass(SuiteResult(outcomes, Vector(0.02)), runners, records,
      maxQueries = 2)
    assert(ran == Set("q4", "q5"))
  }

  test("remeasurePass ignores queries without a record or with failed best") {
    val suite = SuiteResult(Vector(
      outcomeOf("norec", 9.0),
      Outcome("failed", Vector(-1.0, -1.0), -1.0, -1.0, contended = false)),
      Vector(0.02))
    val out = remeasurePass(suite,
      Map("norec" -> (() => 0.1), "failed" -> (() => 0.1)),
      Map("failed" -> 1.0))
    assert(out == suite)
  }

  // -- runSuite(): the acceptance test -------------------------------------

  test("loaded-window run: total_clean within 15% of the quiet total") {
    // 40 queries with committed records equal to their true clean cost —
    // the state the suite is in after any committed clean run. A host-load
    // window covers roughly the middle half of the run at 8x inflation.
    val names = (1 to 40).map(i => f"q$i%02d")
    val cleanOf = names.zipWithIndex.map { case (n, i) =>
      n -> (0.1 + 0.15 * (i % 7))
    }.toMap
    val quietTotal = names.map(cleanOf).sum

    var clock = 0.0
    def loaded = clock >= 5.0 && clock < 60.0
    def timed(clean: Double): Double = {
      val e = if (loaded) clean * 8.0 else clean
      clock += e; e
    }
    val res = runSuite(
      names.map(n => n -> (() => timed(cleanOf(n)))),
      () => timed(0.02), cleanOf, Some(0.02))

    assert(res.contendedNames.nonEmpty,
      s"the 8x window must flag at least one query; sentinel=${res.sentinel}")
    // escalation rescues queries whose re-runs escape the window, so the
    // raw total is only partially inflated — but still visibly above both
    // the quiet truth and the cleaned number (honest measurement).
    assert(res.total > quietTotal * 1.1 && res.total > res.totalClean,
      s"raw total ${res.total} must show residual inflation over $quietTotal")
    val err = math.abs(res.totalClean - quietTotal) / quietTotal
    assert(err <= 0.15,
      f"total_clean ${res.totalClean}%.2f vs quiet $quietTotal%.2f: ${err * 100}%.1f%% off")
  }

  test("quiet run: nothing flagged, total == total_clean, 2 repeats each") {
    val names = (1 to 20).map(i => s"q$i")
    val cleanOf = names.map(n => n -> 0.2).toMap
    val res = runSuite(names.map(n => n -> (() => 0.2)), () => 0.02,
      cleanOf, Some(0.02))
    assert(res.contendedNames.isEmpty)
    assert(math.abs(res.total - res.totalClean) < 1e-9)
    assert(res.outcomes.forall(_.samples.size == 2))
  }

  test("new queries (no record) in a quiet run cost exactly 2 repeats") {
    val res = runSuite(Seq("new1" -> (() => 0.3)), () => 0.02,
      Map.empty, Some(0.02))
    assert(res.outcomes.head.samples.size == 2)
    assert(res.totalClean == 0.3)
  }
}
