#!/usr/bin/env python3
"""Warm-methodology scaling report: join BENCH_PRIOR.json (clean sf0.1
per-query min, graft.Bench best-of protocol) against a graft.Bench
artifact produced on ScaleUp-generated sf1 (10x) data, and emit the
ratio table body for SCALING.md.

Usage:
  tools/scaling_warm_report.py BENCH_PRIOR.json bench_sf1.json \
      [declared,names] [cold_sf01.tsv cold_sf1.tsv]

The optional cold sweeps (graft.tools.Scaling output) add a cold
single-run ratio column for cross-checking the warm numbers.
"""
import json
import sys


def bench_queries(path):
    # take the LAST parseable line that has a "queries" map (Bench emits a
    # provisional line first, then the full artifact, detail, final)
    best = None
    for line in open(path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if "queries" in d and d["queries"]:
            best = d
    if best is None:
        # BENCH_PRIOR.json is pretty-printed (multi-line) — parse whole-file
        d = json.load(open(path))
        if "queries" in d and d["queries"]:
            best = d
    if best is None:
        raise SystemExit(f"{path}: no parseable artifact with a queries map")
    return best["queries"], best


def cold(path):
    out = {}
    for line in open(path):
        p = line.rstrip("\n").split("\t")
        if len(p) >= 2:
            try:
                out[p[0]] = float(p[1])
            except ValueError:
                out[p[0]] = None  # TIMEOUT/ERROR
    return out


def main():
    prior, prior_art = bench_queries(sys.argv[1])
    # floors whose warmup populates a cache()/localCheckpoint (annotated
    # in BENCH_PRIOR.json from PLAN_FINGERPRINTS.txt): hot-cache best-of
    # minimums that a sweep can't necessarily reproduce — their >12x
    # flags need a cold cross-check before they mean anything
    cache_class = set(prior_art.get("cache_class", []))
    sf1, art = bench_queries(sys.argv[2])
    declared = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    c01 = cold(sys.argv[4]) if len(sys.argv) > 5 else {}
    c1 = cold(sys.argv[5]) if len(sys.argv) > 5 else {}

    rows = []
    for name in sorted(set(prior) | set(sf1)):
        a, b = prior.get(name), sf1.get(name)
        if b is not None and b < 0:
            b = None  # Bench error marker (capped/errored at sf1)
        ratio = (b / max(a, 1e-9)) if (a is not None and b is not None) else None
        ca, cb = c01.get(name), c1.get(name)
        cr = (cb / max(ca, 1e-9)) if (ca and cb) else None
        rows.append((name, a, b, ratio, cr))
    rows.sort(key=lambda r: -(r[3] if r[3] is not None else -1))

    print("| query | sf0.1 warm s | sf1 warm s | warm ratio | cold ratio | note |")
    print("|---|---|---|---|---|---|")
    flagged = []
    cache_suspect = []
    for name, a, b, ratio, cr in rows:
        note = ""
        if name in declared and ratio is None:
            note = "declared exact/O(n²) baseline — skipped at sf1 by design"
        elif name in declared:
            note = "declared exact/O(n²) baseline (scale sibling registered)"
        elif ratio is None:
            note = "unmeasured"
        elif ratio > 12 and name in cache_class:
            note = ("**>12x vs a HOT-CACHE floor** (warmup-populated "
                    "cache/checkpoint, BENCH_PRIOR cache_class) — "
                    "cold cross-check required before reading as growth")
            cache_suspect.append(name)
        elif ratio > 12:
            note = "**>12x warm — see the flagged-query analysis section**"
            flagged.append(name)
        fa = f"{a:.3f}" if a is not None else "—"
        fb = f"{b:.3f}" if b is not None else "—"
        fr = f"{ratio:.1f}x" if ratio is not None else "—"
        fc = f"{cr:.1f}x" if cr is not None else "—"
        print(f"| {name} | {fa} | {fb} | {fr} | {fc} | {note} |")

    ms = sorted(r[3] for r in rows if r[3] is not None and r[0] not in declared)
    if ms:
        tot_a = sum(r[1] for r in rows if r[1] is not None and r[3] is not None)
        tot_b = sum(r[2] for r in rows if r[2] is not None and r[3] is not None)
        print()
        print(f"Measured: {len(ms)} queries; total {tot_a:.1f} s -> {tot_b:.1f} s "
              f"({tot_b / tot_a:.1f}x); median ratio {ms[len(ms) // 2]:.1f}x; "
              f"p90 {ms[int(len(ms) * 0.9)]:.1f}x; max {ms[-1]:.1f}x; "
              f"flagged >12x: {len(flagged)} {flagged}; "
              f">12x vs hot-cache floors (cold-check first): "
              f"{len(cache_suspect)} {cache_suspect}")


if __name__ == "__main__":
    main()
