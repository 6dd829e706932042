#!/usr/bin/env python3
"""Assemble BENCH_full_r{N}.json from replicated Bench runs.

Usage: python3 tools/bench_full.py OUT.json run1.json run2.json [run3.json ...]
       [--shuffled shuf.json]

Each runN.json is the /tmp/graft_bench.json mirror of one full-surface
`graft.Bench` run. The artifact is the PER-QUERY MINIMUM across runs —
the replicated-minima record that stops single-run contention deltas
from being read as regressions (VERDICT r6 #3 discipline). If a
shuffled-order run is given, its total is recorded alongside as the
order-independence check.
"""
import sys, json


def main():
    args = sys.argv[1:]
    shuf = None
    if "--shuffled" in args:
        i = args.index("--shuffled")
        shuf = json.load(open(args[i + 1]))
        args = args[:i] + args[i + 2:]
    out, runs = args[0], [json.load(open(p)) for p in args[1:]]
    assert len(runs) >= 2, "need >= 2 runs for minima"
    keys = set(runs[0]["queries"])
    for r in runs[1:]:
        assert set(r["queries"]) == keys, "runs cover different surfaces"
        assert r["failed"] == 0, "a run had failures — not minima material"
    minima = {k: min(r["queries"][k] for r in runs) for k in sorted(keys)}
    total = sum(minima.values())
    wall = "/".join(f"{r['value']:.3f}" for r in runs)
    note = (f"per-query minima over {len(runs)} full-surface runs "
            f"(wall totals: {wall} s); canonical order, shared caches "
            f"pre-warmed untimed, builds graded by q172/q194/q195")
    if shuf is not None:
        note += (f"; shuffled-order check (seed run): total "
                 f"{shuf['value']:.3f} s, failed {shuf['failed']}")
    art = {"metric": "total", "value": round(total, 3), "unit": "sec",
           "cpus": runs[0]["cpus"], "queries": minima,
           "errors": {}, "failed": 0, "sf": runs[0]["sf"], "note": note}
    json.dump(art, open(out, "w"), indent=None, separators=(",", ":"))
    print(f"{out}: {total:.3f}s minima over {len(runs)} runs, "
          f"{len(minima)} queries" + (f"; shuffled {shuf['value']:.3f}s"
                                      if shuf else ""))


if __name__ == "__main__":
    main()
