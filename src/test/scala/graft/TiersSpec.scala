package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Tiers

/** buildConcurrently: bounded fan-out, and failures aggregate instead of
  * the first masking its siblings. */
class TiersSpec extends AnyFunSuite {

  test("two failing builds both surface; survivors still run") {
    val ran = new AtomicInteger(0)
    val ex = intercept[RuntimeException] {
      Tiers.buildConcurrently(Seq(
        () => { ran.incrementAndGet(); () },
        () => throw new RuntimeException("tier A broke"),
        () => { ran.incrementAndGet(); () },
        () => throw new RuntimeException("tier B broke")))
    }
    val all = (ex +: ex.getSuppressed.toSeq).map(_.getMessage).toSet
    assert(all === Set("tier A broke", "tier B broke"))
    assert(ran.get() === 2)
  }

  test("driver-thread fan-out never exceeds the bound") {
    val live = new AtomicInteger(0)
    val peak = new AtomicInteger(0)
    Tiers.buildConcurrently((1 to 16).map(_ => () => {
      val n = live.incrementAndGet()
      peak.updateAndGet(math.max(_, n))
      Thread.sleep(20)
      live.decrementAndGet(); ()
    }))
    assert(peak.get() <= Tiers.MaxConcurrentBuilds)
    assert(peak.get() >= 2) // and it genuinely overlaps
  }

  test("empty task list is a no-op") {
    Tiers.buildConcurrently(Nil)
  }
}
