#!/usr/bin/env python3
"""Tightening-only row-patch of BENCH_QUERIES.json from a BenchRows
candidate (r19; mechanizes what r18 did by hand for run 3).

Rules (SCALING.md, r18 'BenchRows run 3' section):
  - Only rows the candidate ACCEPTED (present in protocol.brackets —
    i.e. carrying per-row bracket evidence) are eligible.
  - A row is PATCHED only when the certified value tightens the
    committed reference by more than the 5% noise floor.
  - A certified value within ±5% of the committed reference is a
    CONFIRMATION — recorded (printed) but not patched; it retires the
    row's "never-certified" status without moving the reference.
  - A certified value >5% SLOWER than the reference is printed as
    such and NOT patched (the committed reference stays; BenchRows'
    own bracket gate already vouched the window, so a slower read
    usually means the reference came from an especially lucky window
    — the tightening-only rule keeps the tripwire conservative).

Usage:
  python3 tools/rowpatch_bench.py BENCH_ROWS_CAND.json [--apply]
Without --apply it is a dry run.
"""
import json
import sys
import math


def main():
    cand_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_ROWS_CAND.json"
    apply_it = "--apply" in sys.argv
    cand = json.load(open(cand_path))
    ref = json.load(open("BENCH_QUERIES.json"))
    refq = ref["queries"]
    brackets = cand.get("protocol", {}).get("brackets", {})
    anchor = cand.get("protocol", {}).get("anchor")
    band = cand.get("protocol", {}).get("band")
    candq = cand.get("queries", {})

    patched, confirmed, slower, skipped = [], [], [], []
    for name, v in sorted(candq.items()):
        if v is None or v <= 0:
            continue
        if name not in brackets:
            skipped.append(name)
            continue
        old = refq.get(name)
        if old is None:
            skipped.append(name)
            continue
        if v < old * 0.95:
            patched.append((name, old, v))
        elif v <= old * 1.05:
            confirmed.append((name, old, v))
        else:
            slower.append((name, old, v))

    print(f"candidate {cand_path}: anchor={anchor} band={band} "
          f"accepted={len(brackets)}")
    for name, old, v in patched:
        b = brackets[name]
        print(f"  PATCH   {name}: {old:.3f} -> {v:.3f} "
              f"(brackets [{b[0]:.3f},{b[1]:.3f}])")
    for name, old, v in confirmed:
        print(f"  CONFIRM {name}: ref {old:.3f}, certified {v:.3f}")
    for name, old, v in slower:
        print(f"  SLOWER  {name}: ref {old:.3f}, certified {v:.3f} "
              f"— reference kept (tightening-only)")
    if skipped:
        print(f"  skipped (no bracket evidence / not in reference): "
              f"{skipped}")

    if apply_it and patched:
        for name, _, v in patched:
            refq[name] = v
        ref["value"] = round(sum(refq.values()), 3)
        g = math.exp(sum(math.log(candq[n] / o) for n, o, _ in
                         [(n, o, v) for n, o, v in
                          patched + confirmed + slower]) /
                     max(1, len(patched) + len(confirmed) + len(slower)))
        # ONE-LINE compact JSON, like Bench writes it: graft.Bench reads
        # this file with whitespace-INTOLERANT regexes ("key":{...} /
        # "name":value, no space after the colon), so a pretty-printed
        # reference silently disarms the per-query regression tripwire
        # (flatObj returns empty maps). Caught in r19 — do not re-indent.
        with open("BENCH_QUERIES.json", "w") as f:
            json.dump(ref, f, separators=(",", ":"))
            f.write("\n")
        print(f"applied {len(patched)} patches; new total {ref['value']}; "
              f"certified-vs-ref geomean {g:.3f}")
    elif apply_it:
        print("nothing to apply")
    else:
        print("dry run (pass --apply to patch)")


if __name__ == "__main__":
    main()
