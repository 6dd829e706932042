#!/usr/bin/env python3
"""Adjudicate a new replicated-minima bench artifact against the previous
canonical-config one — mechanically, so three past failure modes can't
recur:

  * the r10 silent config switch (an sf0.01/8-cpu artifact compared against
    sf0.1/32 history): comparison across different (sf, cpus) is REFUSED,
    and a non-canonical new artifact fails the adjudication outright;
  * the r11 single-run noise misread (q205/q226/q165 looked 1.6x slower in
    a single driver run while their replicated minima had improved): this
    tool only ever reads BENCH_full minima artifacts, and compares MINIMA;
  * the r13/r14 window-drift blindness (3 then 82 raw flags, every one a
    uniform host slowdown, each covered by ONE --justify string): the raw
    per-query flags are INFORMATION, and the GATE is the median-normalized
    list — when the whole shared surface drifts by a common factor, the
    median shared-query ratio estimates that factor, and a query is a
    code-caused regression only if it regressed past threshold RELATIVE
    to it. A real regression hidden under a drifted window still flags
    (selftest 6 proves it); a pure window shift no longer needs a
    justification that would otherwise carry no information.

Usage:
  python3 tools/bench_adjudicate.py NEW.json [PREV.json ...]
      [--threshold 1.25] [--canonical-sf sf0.1] [--canonical-cpus 32]
      [--med-cap 1.75] [--write-note] [--justify "reason"]

--med-cap overrides the window-attribution cap for ONE invocation, so a
legitimate uniform shift past the default is accepted by a flag visible
in the gate's invocation history instead of an in-place edit of the
constant (VERDICT r15). Under a FASTER window (median < 1) the
normalized threshold widens by exactly the ratio amplification the
division introduces (x 1/median, capped at 10%) — ratio noise around an
improving window otherwise converts sub-threshold raw movements into
gating "normalized" flags (ADVICE r15), while a flat widening would
hide genuine regressions under any marginally-faster window — and a
median below 1/cap reports as "uniform speedup needs confirmation",
not as a regression.

--justify is the explicit human override for a NORMALIZED flag: the run
still prints every flagged line, but exits 0 and records the
justification verbatim in the artifact note (under --write-note), so an
accepted regression is signed and auditable instead of silently passed.
Config drift and dropped queries can NOT be justified — those always fail.

With no PREV given, every other BENCH_full_r*.json next to NEW is scanned
and the lexicographically-latest artifact with MATCHING (sf, cpus) is used;
artifacts with a different config are listed as skipped, never compared.

Exit 0: adjudication clean (summary printed, and appended to NEW's `note`
        under --write-note). Raw >threshold movements that normalize away
        under the median window factor are printed and recorded as
        window-attributed, not failed.
Exit 1: loud failure — config drift, no comparable predecessor, a shared
        query regressed past threshold AFTER normalizing by the median
        window factor (or from a zero baseline), the median itself sits
        outside the 1.75x window-attribution cap (a uniform shift that
        large is as likely a shared-path code regression as a host, and
        may only pass with --justify citing out-of-band evidence), or
        the new artifact has failures.

`--selftest ART.json` is the deliberate-regression dry run: it forges
copies of ART covering every contract branch — a 2x single-query
regression (must fail), a config switch (must be refused), a clean copy
(must pass), a justified regression (must pass loudly), a uniform 1.4x
window drift (must pass WITHOUT justification, raw flags printed), the
same drifted window with one query slowed a FURTHER 2x (must fail, with
that query in the normalized list), a uniform 2x shift hitting the cap
(must fail unjustified, pass justified, AND pass under --med-cap 2.5),
a flat query under a 2x-faster window (must fail), sub-threshold raw
noise under a 0.9x window (must pass via the widened med<1 bar), a
uniform 2.5x speedup (must ask for confirmation with speedup wording),
a degenerate all-zero-minima artifact (must fail cleanly through
the speedup-confirmation wording, never a ZeroDivisionError), and the
same all-zero artifact as the BASELINE side (must fail cleanly as a
degenerate baseline) — and
verifies each outcome: proof the gate fails loudly exactly when the
code regressed, runnable any round.
"""
import sys, json, os, glob, statistics, subprocess, tempfile, shutil


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

        # uniform host-window drift: every query 1.4x slower, no code
        # cause — must PASS without a justification (the r13/r14 regime
        # where --justify carried no information), while every raw flag
        # still prints
        window = json.loads(json.dumps(base))
        window["queries"] = {q: v * 1.4 for q, v in base["queries"].items()}
        code, out = run(window)
        assert code == 0 and "REGRESSED" in out and "window" in out, \
            f"uniform 1.4x drift must pass with loud raw flags, got exit {code}:\n{out}"
        print("selftest 5 OK: uniform window drift passes, raw flags stay loud")

        # a REAL regression hidden under that same drifted window: q0 is
        # 2x slower than the window explains — the normalized gate MUST
        # still flag it (the promotion criterion this gate exists for)
        hidden = json.loads(json.dumps(window))
        hidden["queries"][q0] = base["queries"][q0] * 1.4 * 2.0
        code, out = run(hidden)
        assert code == 1 and q0 in out and "normaliz" in out, \
            f"regression hidden under drift must fail, got exit {code}:\n{out}"
        print(f"selftest 6 OK: {q0} hidden under a 1.4x window still flags")

        # a UNIFORM 2x shift: normalization would absorb it entirely, but
        # a shift that large is as likely a shared-path code regression
        # as a host — the window-attribution cap must refuse to
        # self-certify it (justifiable only with out-of-band evidence)
        big = json.loads(json.dumps(base))
        big["queries"] = {q: v * 2.0 for q, v in base["queries"].items()}
        code, out = run(big)
        assert code == 1 and "cap" in out, \
            f"uniform 2x shift must hit the window cap, got exit {code}:\n{out}"
        code, out = run(big, "--justify", "selftest: A/B evidence cited")
        assert code == 0, \
            f"capped shift with justification must pass, got exit {code}:\n{out}"
        print("selftest 7 OK: uniform 2x shift gates on the window cap, "
              "passes only justified")

        # the inverse masking: the host gets 2x FASTER and one query
        # stays flat — raw detection sees nothing (nothing regressed
        # raw), but relative to the window the flat query is a 2x code
        # regression; the normalized sweep must run over ALL shared
        # queries and flag it
        fastwin = json.loads(json.dumps(base))
        fastwin["queries"] = {q: (v if q == q0 else v * 0.5)
                              for q, v in base["queries"].items()}
        code, out = run(fastwin)
        assert code == 1 and q0 in out and "faster window" in out, \
            f"flat query under a faster window must flag, got exit {code}:\n{out}"
        print(f"selftest 8 OK: {q0} flat under a 2x-faster window still flags")

        # --med-cap accepts a legitimate larger shift VISIBLY: the same
        # uniform 2x passes when the cap is raised on the command line
        # (the override lives in the invocation history, not an edit)
        code, out = run(big, "--med-cap", "2.5")
        assert code == 0, \
            f"--med-cap 2.5 must accept a uniform 2x shift, got exit {code}:\n{out}"
        print("selftest 9 OK: --med-cap raises the cap per-invocation")

        # ratio noise under a mildly FASTER window must not gate: whole
        # surface at 0.9x, one query at 1.2x raw — 1.33x normalized,
        # past the base threshold but inside the widened med<1 bar
        noisy = json.loads(json.dumps(base))
        noisy["queries"] = {q: v * 0.9 for q, v in base["queries"].items()}
        noisy["queries"][q0] = base["queries"][q0] * 1.2
        code, out = run(noisy)
        assert code == 0, \
            f"1.2x raw under a 0.9x window must not gate, got exit {code}:\n{out}"
        print("selftest 10 OK: sub-threshold noise under a mild faster window absorbed")

        # a uniform speedup past the cap gates with the SPEEDUP wording
        # (dropped work / config change suspicion, not a regression),
        # and passes once confirmed
        fast = json.loads(json.dumps(base))
        fast["queries"] = {q: v * 0.4 for q, v in base["queries"].items()}
        code, out = run(fast)
        assert code == 1 and "speedup needs confirmation" in out, \
            f"uniform 2.5x speedup must ask for confirmation, got exit {code}:\n{out}"
        code, out = run(fast, "--justify", "selftest: confirmed improvement")
        assert code == 0, \
            f"confirmed uniform speedup must pass, got exit {code}:\n{out}"
        print("selftest 11 OK: uniform speedup gates with speedup wording, "
              "passes confirmed")

        # the widening must be PROPORTIONAL to the amplification, never
        # flat: a genuine 1.32x regression under a 0.98x noise median
        # reads 1.347x normalized against a 1.25*(1/0.98)=1.276x bar —
        # a flat 10% widening (bar 1.375) would have passed it silently
        creep = json.loads(json.dumps(base))
        creep["queries"] = {q: v * 0.98 for q, v in base["queries"].items()}
        creep["queries"][q0] = base["queries"][q0] * 1.32
        code, out = run(creep)
        assert code == 1 and q0 in out, \
            f"1.32x regression under a 0.98x median must gate, got exit {code}:\n{out}"
        print(f"selftest 12 OK: {q0} at 1.32x under a 0.98x noise median still gates")

        # a degenerate artifact (all-zero new minima -> median ratio 0)
        # must fail CLEANLY through the gate's own speedup-confirmation
        # wording, never an uncaught ZeroDivisionError (the bare 1/med
        # widening used to blow past the clean fail() path, ADVICE r16)
        dead = json.loads(json.dumps(base))
        dead["queries"] = {q: 0.0 for q in base["queries"]}
        code, out = run(dead)
        assert code == 1 and "ZeroDivisionError" not in out \
            and "speedup needs confirmation" in out, \
            f"all-zero artifact must fail cleanly via the cap, got exit {code}:\n{out}"
        print("selftest 13 OK: degenerate all-zero artifact fails cleanly, "
              "no ZeroDivisionError")

        # the symmetric case: an all-zero artifact used as the PREVIOUS
        # baseline must also fail cleanly (the summary's s_new/s_prev
        # used to raise ZeroDivisionError before any gating)
        deadprev = os.path.join(tmp, "BENCH_full_r89.json")
        json.dump(dead, open(deadprev, "w"))
        goodnew = os.path.join(tmp, "BENCH_full_r92.json")
        json.dump(base, open(goodnew, "w"))
        r = subprocess.run([sys.executable, me, goodnew, deadprev],
                           capture_output=True, text=True)
        out14 = r.stdout + r.stderr
        assert r.returncode == 1 and "ZeroDivisionError" not in out14 \
            and "degenerate baseline" in out14, \
            f"all-zero PREV must fail cleanly, got exit {r.returncode}:\n{out14}"
        print("selftest 14 OK: degenerate all-zero BASELINE fails cleanly, "
              "no ZeroDivisionError")
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
    med_cap = float(opt("--med-cap", "1.75"))
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
    # absolute epsilon is flagged (ratio rendered as inf) and gates
    # unconditionally — it cannot be window-normalized
    zero_eps = 0.05
    regressed = [(q, pq[q], nq[q],
                  (nq[q] / pq[q]) if pq[q] > 0 else float("inf"))
                 for q in shared
                 if (pq[q] > 0 and nq[q] / pq[q] > threshold)
                 or (pq[q] <= 0 and nq[q] > zero_eps)]
    improved = [(q, pq[q], nq[q], pq[q] / nq[q]) for q in shared
                if nq[q] > 0 and pq[q] / nq[q] > threshold]
    s_new, s_prev = sum(nq[q] for q in shared), sum(pq[q] for q in shared)
    # a degenerate PREVIOUS artifact (all-zero shared minima) cannot
    # anchor an adjudication: every ratio is undefined, and the summary's
    # s_new/s_prev would raise ZeroDivisionError past the clean fail()
    # path (the r16 guard only covered the NEW side's all-zero case)
    if s_prev <= 0:
        fail(f"{prev_path} is a degenerate baseline: its shared-query "
             f"minima sum to {s_prev}s — an all-zero artifact cannot "
             f"anchor an adjudication; compare against a real prior "
             f"artifact instead")

    # THE GATE (promoted from diagnostic in r15, per the stated
    # criterion "if window drift recurs across rounds" — r13 signed 3
    # drift flags, r14 signed 82): when the HOST window shifts globally,
    # every query drifts by a similar factor; the median shared-query
    # ratio estimates that factor mechanically. Raw >threshold
    # movements are printed as INFORMATION; the adjudication FAILS on
    # the NORMALIZED list — queries still past threshold after dividing
    # out the window factor — plus any zero-baseline (inf) flag, which
    # has no ratio to normalize. Queries with pq == 0 are excluded from
    # the median (noted below) but not from gating.
    ratios = sorted(nq[q] / pq[q] for q in shared if pq[q] > 0)
    zero_base = sum(1 for q in shared if pq[q] <= 0)
    med = statistics.median(ratios) if ratios else 1.0
    # the normalized sweep runs over ALL shared queries, not just the
    # raw-flagged ones: under a FASTER window (med < 1) a query that
    # merely stayed flat is a code regression relative to the window
    # and would never appear in the raw list. A faster window also
    # AMPLIFIES ratios — dividing by med < 1 scales every ratio by
    # 1/med — so the normalized threshold widens by exactly that
    # amplification factor (a 1.2x raw under a 0.9x median reads 1.33x
    # normalized but only regressed 1.2x against its own baseline),
    # capped at 10% so a strongly improving window cannot hide a real
    # regression behind an ever-wider bar (selftest 8's
    # flat-query-under-2x-faster reads 2.0x, far past the cap). A flat
    # widening would lower recall for every mild med in (0.91, 1.0):
    # a genuine 1.32x code regression under a 0.98x noise median must
    # still gate (selftest 12).
    # med == 0 (>= half the shared queries record a zero NEW minimum) is
    # a degenerate artifact, not a window: skip normalization entirely
    # (norm 1.0 leaves ratios raw) and let the med-cap branch below gate
    # it as an unconfirmable uniform "speedup" (ADVICE r16 — the bare
    # 1/med raised an uncaught ZeroDivisionError past the clean fail())
    widen = min(1.1, 1.0 / med) if 0.0 < med < 1.0 else 1.0
    norm = med if med > 0 else 1.0
    eff_threshold = threshold * widen
    gate_names = sorted(
        [q for q in shared if pq[q] > 0 and (nq[q] / pq[q]) / norm > eff_threshold]
        + [q for q in shared if pq[q] <= 0 and nq[q] > zero_eps])
    # the cap on what "window drift" may absorb: a uniform CODE
    # regression (a session-config change, a shared-path slowdown) is
    # mechanically indistinguishable from a slow host, so a median past
    # this bound cannot self-certify as window — it needs a --justify
    # citing out-of-band evidence (an A/B at a prior commit on the same
    # host, the r14 discipline). The default 1.75x covers every host
    # swing observed to date (r13/r14 drift: 1.23x; the judge's
    # corroboration run: 1.43x vs r13 minima) with slack; a legitimate
    # larger shift is accepted via --med-cap, visible in the invocation
    # history. The symmetric branch (med < 1/cap) is a uniform SPEEDUP
    # that large — suspicious in the other direction (dropped work, a
    # config change) — so it too needs confirmation, reported as such.
    med_capped = med > med_cap or med < 1.0 / med_cap
    window = (f"window factor (median shared-query ratio): {med:.2f}x"
              + (f" over {len(ratios)} ratios"
                 + (f" ({zero_base} zero-baseline shared queries excluded "
                    f"from the median, gated raw)" if zero_base else ""))
              + f"; still >{eff_threshold:.3g}x after normalizing by it: "
              + (f"{gate_names}" if gate_names else "none"))

    summary = (f"adjudicated vs {os.path.basename(prev_path)} (same config "
               f"{config(new)[0]}/{config(new)[1]}cpus): shared {len(shared)} "
               f"queries {s_new:.1f}s vs {s_prev:.1f}s = {s_new / s_prev:.2f}x, "
               f"{len(regressed)} raw >{threshold}x, "
               f"{len(gate_names)} NORMALIZED flags (the gate), "
               f"{len(improved)} improved >{threshold}x"
               + (f", {len(added)} new queries ({'/'.join(added)})" if added else "")
               + f"; {window}")
    print(summary)
    for q, p, n, r in sorted(improved, key=lambda t: -t[3]):
        print(f"  improved  {q}: {p:.3f}s -> {n:.3f}s ({r:.2f}x faster)")
    for q, p, n, r in sorted(regressed, key=lambda t: -t[3]):
        gated = q in gate_names
        print(f"  REGRESSED {q}: {p:.3f}s -> {n:.3f}s ({r:.2f}x raw, "
              + (f"{r / norm:.2f}x normalized"
                 if r != float("inf") else "zero baseline")
              + (" — GATES)" if gated
                 else (" — window-attributed)" if med >= 1.0
                       else " — within the widened noise bar)")),
              file=sys.stderr if gated else sys.stdout)
    raw_flagged = {q for q, _, _, _ in regressed}
    for q in gate_names:
        if q not in raw_flagged and pq.get(q, 0) > 0:
            r = nq[q] / pq[q]
            print(f"  REGRESSED {q}: {pq[q]:.3f}s -> {nq[q]:.3f}s ({r:.2f}x raw "
                  f"— flat under a {med:.2f}x faster window, "
                  f"{r / norm:.2f}x normalized — GATES)", file=sys.stderr)
    if regressed and not gate_names and not med_capped:
        print(f"{len(regressed)} raw movement(s) fully window-attributed "
              f"(median factor {med:.2f}x) — informational, not gating")
    gating_causes = []
    if gate_names:
        gating_causes.append(
            f"{len(gate_names)} shared quer{'y' if len(gate_names) == 1 else 'ies'} "
            f"regressed past {eff_threshold:.3g}x after normalizing by the "
            f"{med:.2f}x window factor: {gate_names}")
    if med_capped and med > 1.0:
        gating_causes.append(
            f"uniform {med:.2f}x shift exceeds the {med_cap}x window-"
            f"attribution cap — a shift this large cannot self-certify as "
            f"host drift; cite out-of-band evidence (e.g. an A/B at a "
            f"prior commit on this host) via --justify, or raise the cap "
            f"visibly via --med-cap")
    elif med_capped:
        gating_causes.append(
            f"uniform speedup needs confirmation: the {med:.2f}x median is "
            f"below 1/{med_cap}x — an improvement this uniform is as likely "
            f"dropped work or a config change as a genuinely faster path; "
            f"confirm via --justify (e.g. an A/B at a prior commit), or "
            f"raise the cap visibly via --med-cap")
    if gating_causes and justify:
        summary += "; gated finding(s) JUSTIFIED: " + justify
        print(f"accepted with justification: {justify}")
    elif gating_causes:
        fail("; AND ".join(gating_causes) +
             " — justify (--justify) or fix before recording the artifact")
    elif justify:
        print(f"note: --justify given but nothing gated; not recorded")

    if write_note:
        new["note"] = new.get("note", "").rstrip("; ") + "; " + summary
        json.dump(new, open(new_path, "w"), indent=None, separators=(",", ":"))
        print(f"note appended to {new_path}")


if __name__ == "__main__":
    main()
