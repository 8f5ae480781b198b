#!/usr/bin/env python3
"""Min-merge a fresh clean bench run (bench_last.json) into
BENCH_PRIOR.json, add floors for newly-registered queries, and attach
COLD floors (graft.tools.Scaling single cold runs) for the cache_class
queries — the r15 verdict ask: clean-run drift for cache()-returning
queries was read against hot-cache minimums, so worst-drift tables were
led by floor artifacts, not regressions.

Usage:
  tools/update_prior.py BENCH_PRIOR.json bench_last.json sweep_sf01.tsv \
      "provenance note"
"""
import json
import sys


def bench_queries(path):
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
    return best


def main():
    prior_path, bench_path, sweep_path, note = sys.argv[1:5]
    prior = json.load(open(prior_path))
    bench = bench_queries(bench_path)
    assert bench is not None, "no parseable bench artifact line"

    merged = dict(prior["queries"])
    added, improved = [], 0
    for name, secs in bench["queries"].items():
        if secs is None or secs < 0:
            continue
        if name not in merged:
            merged[name] = round(secs, 4)
            added.append(name)
        elif secs < merged[name]:
            merged[name] = round(secs, 4)
            improved += 1
    prior["queries"] = dict(sorted(merged.items()))
    prior["value"] = round(sum(prior["queries"].values()), 4)

    # cold floors for the cache_class queries from the cold sweep
    cold = {}
    for line in open(sweep_path):
        parts = line.rstrip("\n").split("\t")
        if len(parts) >= 2 and parts[0] in prior.get("cache_class", []):
            try:
                cold[parts[0]] = float(parts[1])
            except ValueError:
                pass
    # MERGE with any previously-recorded cold floors: a query capped or
    # skipped in THIS sweep must keep its historical cold floor, or the
    # next round's drift read falls back to hot-cache minimums — the
    # exact artifact this map exists to prevent
    old_cold = prior.get("cold_floor", {})
    merged_cold = dict(old_cold)
    for k, v in cold.items():
        merged_cold[k] = round(min(v, old_cold.get(k, v)), 4)
    prior["cold_floor"] = dict(sorted(merged_cold.items()))
    prior["cold_floor_note"] = (
        "single COLD run per cache_class query (graft.tools.Scaling, no "
        "warmup, cache population included in the timing) - the floor to "
        "read clean-run drift of cache()-returning queries against; the "
        "hot minimums in 'queries' stay for the warm best-of protocol")

    prior["provenance"] = prior.get("provenance", "") + " | " + note
    with open(prior_path, "w") as f:
        json.dump(prior, f, indent=1)
        f.write("\n")
    print(f"added {len(added)}: {added}")
    print(f"improved floors: {improved}")
    print(f"cold floors: {len(prior['cold_floor'])}")
    print(f"total floor: {prior['value']}")


if __name__ == "__main__":
    main()
