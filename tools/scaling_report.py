#!/usr/bin/env python3
"""Join two graft.tools.Scaling sweeps (sf0.1 and sf1 = 10x data) into
SCALING.md ratio rows.

Usage: tools/scaling_report.py sweep_sf01.tsv sweep_sf1.tsv > SCALING.md.body

Each input line: name<TAB>seconds<TAB>rows=N   (or TIMEOUT / ERROR).
"""
import sys


def parse(path):
    out = {}
    for line in open(path):
        parts = line.rstrip("\n").split("\t")
        if len(parts) < 2 or not parts[0] or " " in parts[0]:
            continue
        name = parts[0]
        if parts[1].startswith("TIMEOUT") or parts[1] == "ERROR":
            out[name] = (None, parts[1])
        else:
            try:
                rows = None
                if len(parts) > 2 and parts[2].startswith("rows="):
                    rows = int(parts[2][5:])
                out[name] = (float(parts[1]), rows)
            except ValueError:
                pass
    return out


def main():
    a, b = parse(sys.argv[1]), parse(sys.argv[2])
    declared = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    rows = []
    for name in sorted(set(a) | set(b)):
        sa = a.get(name, (None, "MISSING"))
        sb = b.get(name, (None, "MISSING"))
        if sa[0] is None or sb[0] is None:
            rows.append((name, sa, sb, None))
        else:
            rows.append((name, sa, sb, sb[0] / max(sa[0], 1e-9)))
    # sort by ratio desc, unmeasurables first
    rows.sort(key=lambda r: (-(r[3] if r[3] is not None else 1e9)))
    print("| query | sf0.1 s | sf1 s | ratio | note |")
    print("|---|---|---|---|---|")
    flagged = 0
    for name, sa, sb, ratio in rows:
        t1 = f"{sa[0]:.2f}" if sa[0] is not None else str(sa[1])
        t2 = f"{sb[0]:.2f}" if sb[0] is not None else str(sb[1])
        note = ""
        if name in declared:
            note = "declared O(n^2)/exact baseline (scale path registered separately)"
        elif ratio is not None and ratio > 12:
            note = "**superlinear — investigate**"
            flagged += 1
        elif ratio is None:
            note = "**unmeasured — investigate**"
            flagged += 1
        r = f"{ratio:.1f}x" if ratio is not None else "—"
        print(f"| {name} | {t1} | {t2} | {r} | {note} |")
    print()
    ms = [r[3] for r in rows if r[3] is not None and r[0] not in declared]
    if ms:
        ms.sort()
        med = ms[len(ms) // 2]
        print(f"Non-baseline queries measured: {len(ms)}; median ratio "
              f"{med:.1f}x; max {ms[-1]:.1f}x; flagged >12x: {flagged}.")


if __name__ == "__main__":
    main()
