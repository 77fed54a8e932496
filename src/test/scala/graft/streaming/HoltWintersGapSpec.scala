package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the init behavior on a GAPPED first week — the case the module
  * doc declares in-scope (day gaps) but a bare `.get` used to crash:
  * a weekday absent from the first seven PRESENT days defaults its
  * seasonal slot to 0.0 (level-only prediction), and a weekday present
  * twice takes its FIRST occurrence. Both match the batch fold
  * (SeasonalQueries.hwFits coalesce + element_at(filter,1)) and the
  * oracle CTE (COALESCE + ORDER BY i LIMIT 1). Driven through `process`
  * with a TestGroupState so the assertion is on the exact state. */
class HoltWintersGapSpec extends AnyFunSuite {

  private def freshState: TestGroupState[HwState] =
    TestGroupState.create[HwState](Optional.empty[HwState](),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long](),
      hasTimedOut = false)

  // weekday(day) = (day + 3) % 7. Days 6 and 13 are skipped, so weekday 2
  // never appears in either init week; day 7 duplicates day 0's weekday 3.
  private val gappedDays =
    Seq(0L, 1L, 2L, 3L, 4L, 5L, 7L, // week 1: weekdays 3,4,5,6,0,1,3
        8L, 9L, 10L, 11L, 12L, 14L, 15L) // week 2: 4,5,6,0,1,3,4
  private def dc(day: Long) = DayCount("s", day, 10L + day)

  test("weekday missing from both init weeks: slot 0.0, no crash") {
    val state = freshState
    val emitted = HoltWintersStream.process(
      "s", gappedDays.map(dc).iterator, state).toVector
    assert(emitted.isEmpty, "exactly 2*Period entries all buffer/init")
    val st = state.get
    assert(st.initialized)
    // weekday 2 was never observed: its slot holds the defined 0.0 default
    // through init AND the week-2 replay (updates touch only seen weekdays)
    assert(st.s(2) == 0.0)
    assert(st.s.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("duplicated weekday takes the first occurrence, like the batch fold") {
    val state = freshState
    HoltWintersStream.process("s", gappedDays.map(dc).iterator, state)
    // m1 = mean of week-1 counts; s0(3) came from day 0 (n=10), not day 7
    // (n=17) — then the week-2 replay updated it when day 14 (weekday 3)
    // arrived. Recompute the same two steps here to pin first-match init.
    val m1 = Seq(10, 11, 12, 13, 14, 15, 17).sum.toDouble / 7.0
    val s0w3 = 10.0 - m1
    // replay: week-2 days in order 8,9,10,11,12,14,15; weekday 3 is day 14
    var st = HwState(initialized = true, m1,
      (Seq(18, 19, 20, 21, 22, 24, 25).sum.toDouble / 7.0 - m1) / 7.0,
      Seq(14.0 - m1, 15.0 - m1, 0.0, s0w3, 11.0 - m1, 12.0 - m1, 13.0 - m1),
      Nil)
    Seq(8L, 9L, 10L, 11L, 12L, 14L, 15L).foreach { d =>
      st = HoltWintersStream.step("s", st, d, 10L + d)._1
    }
    assert(state.get.s == st.s, "state must replay from the FIRST-match init")
    assert(state.get.l == st.l && state.get.b == st.b)
  }

  test("post-init fit on the never-seen weekday uses seasonal 0.0") {
    val state = freshState
    HoltWintersStream.process("s", gappedDays.map(dc).iterator, state)
    val pre = state.get
    // day 20 -> weekday (20+3)%7 = 2, the never-observed slot
    val emitted = HoltWintersStream.process(
      "s", Iterator(dc(20L)), state).toVector
    assert(emitted.size == 1)
    val fit = emitted.head
    assert(fit.seasonal == 0.0, "never-seen weekday predicts level-only")
    // fitted = pre-update l + b + s[2] = l + b + 0.0
    assert(fit.fitted == pre.l + pre.b)
    assert(!fit.level.isNaN && !fit.trend.isNaN)
  }
}
