#!/usr/bin/env python3
"""Per-query bench diff: old vs new bench_out JSON.

Usage: bench_diff.py OLD.json NEW.json [threshold_sec]

Accepts both sidecar shapes: the legacy min-only {"queries": {q: sec}}
and the r17 {"query_stats": {q: {"min": .., "med": .., "n": ..}}}.
Compares MIN to MIN (the contention-robust regression gate) and, when
both sides carry medians, MED to MED (the round-over-round drift
statistic). Prints queries whose delta exceeds the threshold (default
0.3 s), sorted by absolute delta, plus totals.
"""
import json
import sys


def load(path):
    with open(path) as f:
        doc = json.loads(f.read().strip().splitlines()[-1])
    if "query_stats" in doc:
        mins = {k: v["min"] for k, v in doc["query_stats"].items()}
        meds = {k: v["med"] for k, v in doc["query_stats"].items()}
    else:
        mins = dict(doc.get("queries", {}))
        meds = None
    return doc, mins, meds


def main():
    old_doc, old_min, old_med = load(sys.argv[1])
    new_doc, new_min, new_med = load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    common = sorted(set(old_min) & set(new_min))
    only_old = sorted(set(old_min) - set(new_min))
    only_new = sorted(set(new_min) - set(old_min))
    print(f"common={len(common)} only_old={only_old} only_new={only_new}")
    print(f"old cal={old_doc.get('calibration')} new cal={new_doc.get('calibration')}")
    tot_o = sum(old_min[q] for q in common)
    tot_n = sum(new_min[q] for q in common)
    print(f"common-set min total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({100 * (tot_n - tot_o) / tot_o:+.1f}%)")
    deltas = sorted(((new_min[q] - old_min[q], q) for q in common),
                    key=lambda t: -abs(t[0]))
    print(f"-- min deltas over {thr}s --")
    for d, q in deltas:
        if abs(d) >= thr:
            print(f"  {q}: {old_min[q]:.2f} -> {new_min[q]:.2f} ({d:+.2f})")
    if old_med and new_med:
        both = sorted(set(old_med) & set(new_med))
        tot_o = sum(old_med[q] for q in both)
        tot_n = sum(new_med[q] for q in both)
        print(f"common-set med total: {tot_o:.1f}s -> {tot_n:.1f}s "
              f"({100 * (tot_n - tot_o) / tot_o:+.1f}%)")
        deltas = sorted(((new_med[q] - old_med[q], q) for q in both),
                        key=lambda t: -abs(t[0]))
        print(f"-- med deltas over {thr}s --")
        for d, q in deltas:
            if abs(d) >= thr:
                print(f"  {q}: {old_med[q]:.2f} -> {new_med[q]:.2f} ({d:+.2f})")


if __name__ == "__main__":
    main()
