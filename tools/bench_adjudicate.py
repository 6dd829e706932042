#!/usr/bin/env python3
"""Adjudicate a new replicated-minima bench artifact against the previous
canonical-config one — mechanically, so two past failure modes can't recur:

  * the r10 silent config switch (an sf0.01/8-cpu artifact compared against
    sf0.1/32 history): comparison across different (sf, cpus) is REFUSED,
    and a non-canonical new artifact fails the adjudication outright;
  * the r11 single-run noise misread (q205/q226/q165 looked 1.6x slower in
    a single driver run while their replicated minima had improved): this
    tool only ever reads BENCH_full minima artifacts, and flags a shared
    query only when its MINIMUM regressed > --threshold (default 1.25x).

Usage:
  python3 tools/bench_adjudicate.py NEW.json [PREV.json ...]
      [--threshold 1.25] [--canonical-sf sf0.1] [--canonical-cpus 32]
      [--write-note] [--justify "reason"]

--justify is the explicit human override for a flagged regression: the
run still prints every REGRESSED line, but exits 0 and records the
justification verbatim in the artifact note (under --write-note), so an
accepted regression is signed and auditable instead of silently passed.
Config drift and dropped queries can NOT be justified — those always fail.

With no PREV given, every other BENCH_full_r*.json next to NEW is scanned
and the lexicographically-latest artifact with MATCHING (sf, cpus) is used;
artifacts with a different config are listed as skipped, never compared.

Exit 0: adjudication clean (summary printed, and appended to NEW's `note`
        under --write-note).
Exit 1: loud failure — config drift, no comparable predecessor, a shared
        query regressed past threshold, or the new artifact has failures.

`--selftest ART.json` is the deliberate-regression dry run: it forges a
copy of ART with one query slowed 2x (must fail), a copy at a different
config (must be refused), and a clean copy (must pass), and verifies each
outcome — proof the gate fails loudly, runnable any round.
"""
import sys, json, os, glob, subprocess, tempfile, shutil


def selftest(art_path):
    me = os.path.abspath(__file__)
    tmp = tempfile.mkdtemp(prefix="bench_adj_selftest_")
    try:
        base = json.load(open(art_path))
        prev = os.path.join(tmp, "BENCH_full_r90.json")
        json.dump(base, open(prev, "w"))

        def run(newart, *extra):
            p = os.path.join(tmp, "BENCH_full_r91.json")
            json.dump(newart, open(p, "w"))
            r = subprocess.run([sys.executable, me, p, prev, *extra],
                               capture_output=True, text=True)
            return r.returncode, r.stdout + r.stderr

        q0 = sorted(base["queries"])[0]
        slowed = json.loads(json.dumps(base))
        slowed["queries"][q0] = base["queries"][q0] * 2.0
        code, out = run(slowed)
        assert code == 1 and "REGRESSED" in out and q0 in out, \
            f"2x-slowed {q0} must fail loudly, got exit {code}:\n{out}"
        print(f"selftest 1 OK: 2x regression on {q0} fails loudly")

        drifted = json.loads(json.dumps(base))
        drifted["cpus"] = 8
        code, out = run(drifted)
        assert code == 1 and "CONFIG DRIFT" in out, \
            f"config drift must be refused, got exit {code}:\n{out}"
        print("selftest 2 OK: non-canonical config refused")

        code, out = run(json.loads(json.dumps(base)))
        assert code == 0, f"identical artifact must pass, got exit {code}:\n{out}"
        print("selftest 3 OK: clean artifact passes")

        code, out = run(slowed, "--justify", "selftest: deliberate")
        assert code == 0 and "REGRESSED" in out and \
            "accepted with justification" in out, \
            f"justified regression must pass loudly, got exit {code}:\n{out}"
        print("selftest 4 OK: justified regression passes but stays loud")
        print("selftest PASSED")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def fail(msg):
    print(f"ADJUDICATION FAILED: {msg}", file=sys.stderr)
    sys.exit(1)


def config(art):
    # compare the sf by its basename (sf0.1) so testdata roots can move
    return (os.path.basename(str(art.get("sf", "")).rstrip("/")),
            art.get("cpus"))


def main():
    args = sys.argv[1:]

    def opt(name, default=None, flag=False):
        if name in args:
            i = args.index(name)
            if flag:
                args.pop(i)
                return True
            args.pop(i)
            if i >= len(args) or args[i].startswith("--"):
                fail(f"{name} requires a value")
            return args.pop(i)
        return default

    st = opt("--selftest")
    if st:
        selftest(st)
        return

    threshold = float(opt("--threshold", "1.25"))
    canon = (opt("--canonical-sf", "sf0.1"), int(opt("--canonical-cpus", "32")))
    write_note = opt("--write-note", flag=True)
    justify = opt("--justify")
    if not args:
        fail("no NEW artifact given")
    new_path, prev_paths = args[0], args[1:]
    new = json.load(open(new_path))

    if new.get("failed", 0) != 0 or new.get("errors"):
        fail(f"{new_path} has failed queries: failed={new.get('failed')} "
             f"errors={list(new.get('errors', {}))}")
    if config(new) != canon:
        fail(f"CONFIG DRIFT: {new_path} is {config(new)}, canonical is "
             f"{canon} — regenerate at the canonical config instead of "
             f"comparing apples to oranges (the r10 failure mode)")

    if not prev_paths:
        here = os.path.dirname(os.path.abspath(new_path)) or "."
        prev_paths = sorted(p for p in glob.glob(os.path.join(here, "BENCH_full_r*.json"))
                            if os.path.abspath(p) != os.path.abspath(new_path))
    cands, skipped = [], []
    # sort by basename whether the list came from the scan or from
    # explicit arguments, so "latest matching artifact" never depends on
    # argument order
    for p in sorted(prev_paths, key=os.path.basename):
        art = json.load(open(p))
        (cands if config(art) == config(new) else skipped).append((p, art))
    for p, art in skipped:
        print(f"skipped {p}: config {config(art)} != {config(new)} "
              f"(cross-config comparison refused)")
    if not cands:
        fail(f"no previous canonical-config artifact to compare against "
             f"(scanned {len(prev_paths)}, all skipped)")
    prev_path, prev = cands[-1]

    nq, pq = new["queries"], prev["queries"]
    shared = sorted(set(nq) & set(pq))
    added = sorted(set(nq) - set(pq))
    dropped = sorted(set(pq) - set(nq))
    if dropped:
        fail(f"queries present in {prev_path} but MISSING from {new_path}: "
             f"{dropped} — a shrinking surface is not an improvement")
    # a zero recorded previous minimum cannot form a ratio, but it must
    # not silently EXEMPT the query from regression detection either:
    # any shared query with pq == 0 whose new minimum exceeds a small
    # absolute epsilon is flagged (ratio rendered as inf)
    zero_eps = 0.05
    regressed = [(q, pq[q], nq[q],
                  (nq[q] / pq[q]) if pq[q] > 0 else float("inf"))
                 for q in shared
                 if (pq[q] > 0 and nq[q] / pq[q] > threshold)
                 or (pq[q] <= 0 and nq[q] > zero_eps)]
    improved = [(q, pq[q], nq[q], pq[q] / nq[q]) for q in shared
                if nq[q] > 0 and pq[q] / nq[q] > threshold]
    s_new, s_prev = sum(nq[q] for q in shared), sum(pq[q] for q in shared)

    # window-drift diagnostic: when the HOST window shifted globally,
    # every query drifts by a similar factor; the median shared-query
    # ratio estimates that factor mechanically, and the normalized list
    # separates per-query causes from window drift. DIAGNOSTIC ONLY —
    # it never gates: a regression past threshold still fails without
    # an explicit --justify, which can now cite these numbers.
    ratios = sorted(nq[q] / pq[q] for q in shared if pq[q] > 0)
    med = ratios[len(ratios) // 2] if ratios else 1.0
    norm_flagged = sorted(q for q, p, n, r in regressed
                          if r != float("inf") and r / med > threshold)
    window = (f"window diagnostic: median shared-query ratio {med:.2f}x; "
              f"still >{threshold}x after normalizing by it: "
              f"{norm_flagged if norm_flagged else 'none'}")

    summary = (f"adjudicated vs {os.path.basename(prev_path)} (same config "
               f"{config(new)[0]}/{config(new)[1]}cpus): shared {len(shared)} "
               f"queries {s_new:.1f}s vs {s_prev:.1f}s = {s_new / s_prev:.2f}x, "
               f"{len(regressed)} regressed >{threshold}x, "
               f"{len(improved)} improved >{threshold}x"
               + (f", {len(added)} new queries ({'/'.join(added)})" if added else "")
               + f"; {window}")
    print(summary)
    for q, p, n, r in sorted(improved, key=lambda t: -t[3]):
        print(f"  improved  {q}: {p:.3f}s -> {n:.3f}s ({r:.2f}x faster)")
    for q, p, n, r in sorted(regressed, key=lambda t: -t[3]):
        print(f"  REGRESSED {q}: {p:.3f}s -> {n:.3f}s ({r:.2f}x slower)",
              file=sys.stderr)
    if regressed and justify:
        summary += ("; regression" + ("s" if len(regressed) > 1 else "") +
                    " JUSTIFIED: " + justify)
        print(f"accepted with justification: {justify}")
    elif regressed:
        fail(f"{len(regressed)} shared quer{'y' if len(regressed) == 1 else 'ies'} "
             f"regressed past {threshold}x on replicated minima — justify "
             f"(--justify) or fix before recording the artifact")

    if write_note:
        new["note"] = new.get("note", "").rstrip("; ") + "; " + summary
        json.dump(new, open(new_path, "w"), indent=None, separators=(",", ":"))
        print(f"note appended to {new_path}")


if __name__ == "__main__":
    main()
