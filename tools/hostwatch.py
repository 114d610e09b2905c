#!/usr/bin/env python3
"""Log /proc/stat CPU deltas (busy%, steal%, iowait%) every N seconds.

Companion to the bracketed bench protocol (SCALING.md r18-r19): the
in-JVM q_dedup_embed sentinel detects contention but cannot name its
mechanism, and seven consecutive refused q_dup_spans@1000x gate reads
(r18-r19) left open whether the slow windows are co-tenant CPU steal
(hypervisor), our own background load, or something else. A saturated
local[32] job that runs 2.4x slow while the guest's own load average
reads only ~6 is the steal signature — but only the steal column can
confirm it. Run this in a side terminal during gate attempts and read
the log alongside the probe brackets:

    python3 tools/hostwatch.py /tmp/hostwatch.log 5 &

Columns: unix_ts busy% steal% iowait% (of total ticks incl. idle).
Pure observer: ~0 cost, no JVM, safe to leave running across a session.

CAVEAT (learned the first idle night): steal only accrues while the
guest's vCPUs are RUNNABLE — an idle guest cannot see a hot neighbor
at all, so a flat passive trace does NOT certify a window. To certify,
actively sample with a burn:

    python3 tools/hostwatch.py --burn 8 3

spawns 8 spin processes for 3 s and prints the stolen_frac measured
under that load — the hypervisor's answer to "would you give me CPU
right now". stolen_frac < 0.03 under burn = genuinely quiet.
"""
import multiprocessing
import sys, time


def _spin(deadline):
    while time.time() < deadline:
        pass


def burn(nproc, seconds):
    before = sample()
    deadline = time.time() + seconds
    procs = [
        multiprocessing.Process(target=_spin, args=(deadline,))
        for _ in range(nproc)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    after = sample()
    db, ds, dw, dt = (a - b for a, b in zip(after, before))
    run = db + ds
    frac = ds / run if run > 0 else 0.0
    print(
        f"burn nproc={nproc} sec={seconds} busy={100*db/dt:.1f} "
        f"steal={100*ds/dt:.1f} stolen_frac={frac:.3f}"
    )
    return frac


def sample():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    # user nice system idle iowait irq softirq steal [guest guest_nice]
    user, nice, system, idle, iowait, irq, softirq, steal = vals[:8]
    busy = user + nice + system + irq + softirq
    total = busy + idle + iowait + steal
    return busy, steal, iowait, total


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--burn":
        nproc = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
        frac = burn(nproc, seconds)
        sys.exit(0 if frac < 0.03 else 1)
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hostwatch.log"
    period = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    prev = sample()
    with open(out, "a", buffering=1) as f:
        f.write(f"# hostwatch start {time.time():.0f} period={period}\n")
        while True:
            time.sleep(period)
            cur = sample()
            db, ds, dw, dt = (c - p for c, p in zip(cur, prev))
            prev = cur
            if dt <= 0:
                continue
            # stolen_frac = steal/(busy+steal): the fraction of time the
            # guest's RUNNABLE vCPUs were denied the physical CPU — the
            # effective slowdown factor is 1/(1-stolen_frac). steal% of
            # total ticks understates it badly when few vCPUs are busy
            # (first r19 bench window: steal 7.5% of total ticks was 65%
            # of runnable time).
            run = db + ds
            # frac is meaningless on an idle guest (0.4 steal ticks over
            # 0.4 runnable reads 0.91 from noise); report it only when
            # the guest was actually asking for CPU (>0.5% of capacity).
            frac = f"{ds/run:.2f}" if run > 0.005 * dt else "-"
            f.write(
                f"{time.time():.0f} busy={100*db/dt:.1f} "
                f"steal={100*ds/dt:.1f} iowait={100*dw/dt:.1f} "
                f"stolen_frac={frac}\n"
            )


if __name__ == "__main__":
    main()
