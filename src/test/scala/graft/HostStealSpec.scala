package graft

import org.scalatest.funsuite.AnyFunSuite

/** The /proc/stat steal reader both certification mains gate on
  * (SCALING.md r19 "The whipsaw NAMED"). The math must be exact and
  * the reader must degrade to None — never throw, never fabricate —
  * off-Linux or on a malformed file, because a crashed reader would
  * take the whole measurement main down with it.
  */
class HostStealSpec extends AnyFunSuite {

  test("stolenFrac: exact fraction of runnable ticks") {
    val before = Some((1000L, 100L))
    val after = Some((2000L, 350L))
    // runnable delta 1000, steal delta 250
    assert(HostSteal.stolenFrac(before, after).contains(0.25))
  }

  test("stolenFrac: None when either snapshot is missing or no time passed") {
    assert(HostSteal.stolenFrac(None, Some((10L, 1L))).isEmpty)
    assert(HostSteal.stolenFrac(Some((10L, 1L)), None).isEmpty)
    // equal snapshots: no runnable time elapsed — undefined, not 0/0
    assert(HostSteal.stolenFrac(Some((10L, 1L)), Some((10L, 1L))).isEmpty)
  }

  test("ticks: reads the live /proc/stat on Linux and is monotone") {
    val t0 = HostSteal.ticks()
    assume(t0.isDefined, "no /proc/stat on this platform")
    // burn a little CPU so runnable ticks must advance
    val deadline = System.nanoTime() + 300000000L
    var x = 0L
    while (System.nanoTime() < deadline) x += 1
    val t1 = HostSteal.ticks()
    assert(t1.isDefined)
    val (r0, s0) = t0.get
    val (r1, s1) = t1.get
    assert(r1 >= r0 && s1 >= s0, s"ticks went backwards: ($r0,$s0) -> ($r1,$s1)")
    assert(r1 > r0, "runnable ticks did not advance across a busy spin")
    assert(s0 <= r0 && s1 <= r1, "steal cannot exceed runnable")
  }

  test("memProbe: streams the 256 MiB buffer in bounded time") {
    val once = HostSteal.memProbeOnce()
    val best = HostSteal.memProbe()
    // a 256 MiB streaming sum takes milliseconds on any sane machine
    // and must never take seconds — if it does, the probe itself would
    // dominate the gate's poll cadence
    assert(once > 0.0 && once < 5.0, s"memProbeOnce out of range: $once")
    assert(best > 0.0 && best < 5.0, s"memProbe out of range: $best")
  }

  test("timed: returns the body's value, its wall seconds, and a frac in [0,1]") {
    val (v, sec, frac) = HostSteal.timed {
      Thread.sleep(30); 42
    }
    assert(v == 42)
    assert(sec >= 0.03 && sec < 5.0)
    frac.foreach(f => assert(f >= 0.0 && f <= 1.0, s"frac out of range: $f"))
  }
}
