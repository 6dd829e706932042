#!/usr/bin/env python3
"""One-command end-of-round gate (VERDICT r12 item 3): composes every
ritual ARCHITECTURE.md prescribes into a single exit code, so "gates
green" is one run instead of five.

  python3 tools/round_gate.py --round 13 [--bench BENCH_full_r13.json]
      [--skip-plans] [--skip-preflight]

Checks, in order (each prints PASS/FAIL; the tool exits nonzero if ANY
fails):

  1. preflight    — tools/preflight.py: full Verify + DuckDB oracle
                    compare + output-type audit at sf0.001 AND sf0.01.
                    Runs sbt — never overlap with another sbt task.
  2. adj-selftest — tools/bench_adjudicate.py --selftest on the round's
                    minima artifact: proves the regression gate still
                    fails loudly before trusting it.
  3. adjudicate   — tools/bench_adjudicate.py on the round's artifact
                    vs the latest same-config predecessor (refuses
                    config drift; GATES on >1.25x minima regressions
                    that survive median-window normalization — raw
                    flags that the window factor explains are printed
                    as information, not failed).
  4. leak-grep    — an independent re-check of the LEAKCHECK surface:
                    buckets/URLs/keys/internal hosts over src/, tools/,
                    build.sbt, project/*.sbt|*.scala (build caches under
                    target/ excluded — third-party resolution metadata,
                    not authored code). The driver's LEAKCHECK.json is
                    the canonical artifact; this catches a regression
                    BEFORE the driver does.
  5. copycheck    — COPYCHECK.json exists and has zero flagged files.
  6. plans-fresh  — PLANS.md regenerated at HEAD: re-runs graft.PlanDump
                    into a temp file and diffs (sbt; skippable with
                    --skip-plans when iterating).
  7. advice-fresh — ADVICE.md was rewritten since the previous driver
                    round commit (the self-review must be THIS round's).
"""
import sys, os, re, glob, json, subprocess, tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(ROOT, "tools")

RESULTS = []


def check(name, ok, detail=""):
    RESULTS.append((name, ok))
    print(f"[round_gate] {'PASS' if ok else 'FAIL'}  {name}"
          + (f"  ({detail})" if detail else ""))
    return ok


def sh(cmd):
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
    return r.returncode, r.stdout + r.stderr


def main():
    args = sys.argv[1:]

    def opt(name, default=None, flag=False):
        if name in args:
            i = args.index(name)
            if flag:
                args.pop(i)
                return True
            args.pop(i)
            if i >= len(args):
                sys.exit(f"usage: {name} requires a value "
                         f"(e.g. {name} <value>)")
            return args.pop(i)
        return default

    rnd = opt("--round")
    skip_plans = opt("--skip-plans", flag=True)
    skip_preflight = opt("--skip-preflight", flag=True)
    justify = opt("--justify")  # passthrough: sign an accepted regression
    bench = opt("--bench",
                os.path.join(ROOT, f"BENCH_full_r{rnd}.json") if rnd else None)

    # 1. dual-SF pre-flight (Verify + DuckDB compare + type audit)
    if skip_preflight:
        print("[round_gate] SKIP  preflight (--skip-preflight)")
    else:
        code, out = sh([sys.executable, os.path.join(TOOLS, "preflight.py")])
        tail = "\n".join(out.splitlines()[-12:])
        if not check("preflight", code == 0):
            print(tail)
        else:
            # echo the per-sf summary + the ARCHITECTURE.md paragraph so
            # the round record can cite this run's numbers directly
            for l in out.splitlines():
                if " pass, " in l or l.startswith("pre-flight"):
                    print(f"  {l}")

    # 2+3. bench adjudication: selftest first, then the real run
    if bench and os.path.exists(bench):
        code, out = sh([sys.executable,
                        os.path.join(TOOLS, "bench_adjudicate.py"),
                        "--selftest", bench])
        check("adj-selftest", code == 0 and "selftest PASSED" in out)
        code, out = sh([sys.executable,
                        os.path.join(TOOLS, "bench_adjudicate.py"), bench]
                       + (["--justify", justify] if justify else []))
        if not check("adjudicate", code == 0,
                     out.splitlines()[-1] if out.splitlines() else ""):
            print(out)
        else:
            for l in out.splitlines():
                if "adjudicated vs" in l:
                    print(f"  {l}")
    else:
        check("adjudicate", False,
              f"minima artifact missing: {bench} — generate the 3-run + "
              "shuffled fleet and bench_full.py first")

    # 4. independent leak grep (authored files only; build caches under
    # any target/ are third-party resolution metadata, not ours)
    pat = re.compile(
        r"s3://|gs://|wasb|abfss://|AKIA[0-9A-Z]{16}|BEGIN (RSA |EC )?PRIVATE"
        r"|https?://(?!localhost|127\.0\.0\.1)")
    files = []
    for base in ("src", "tools"):
        for dp, dns, fns in os.walk(os.path.join(ROOT, base)):
            dns[:] = [d for d in dns if d != "target"]
            files += [os.path.join(dp, f) for f in fns
                      if f.endswith((".scala", ".py", ".sbt", ".sql", ".conf"))]
    files.append(os.path.join(ROOT, "build.sbt"))
    files += [p for p in glob.glob(os.path.join(ROOT, "project", "*"))
              if p.endswith((".sbt", ".scala", ".properties"))]
    me = os.path.abspath(__file__)
    hits = []
    for p in files:
        if os.path.abspath(p) == me:  # this file CONTAINS the patterns
            continue
        try:
            for i, line in enumerate(open(p, errors="replace"), 1):
                if pat.search(line):
                    hits.append(f"{os.path.relpath(p, ROOT)}:{i}: {line.strip()[:100]}")
        except OSError:
            hits.append(f"{p}: unreadable")
    if not check("leak-grep", not hits, f"{len(files)} files scanned"):
        print("\n".join(hits[:20]))

    # 5. copycheck artifact: present and clean
    cc = os.path.join(ROOT, "COPYCHECK.json")
    try:
        flagged = json.load(open(cc)).get("flagged", None)
        check("copycheck", flagged == [], f"flagged={flagged}")
    except (OSError, ValueError) as e:
        check("copycheck", False, str(e))

    # 6. PLANS.md freshness: regenerate and diff
    if skip_plans:
        print("[round_gate] SKIP  plans-fresh (--skip-plans)")
    else:
        with tempfile.NamedTemporaryFile(suffix=".md", delete=False) as tf:
            tmp = tf.name
        try:
            code, out = sh(["sbt", "-batch",
                            f"runMain graft.PlanDump /root/testdata/sf0.01 {tmp}"])
            if code != 0:
                check("plans-fresh", False, "PlanDump failed")
                print(out[-1500:])
            else:
                dcode, dout = sh(["diff", "-q", tmp,
                                  os.path.join(ROOT, "PLANS.md")])
                if not check("plans-fresh", dcode == 0):
                    code2, d2 = sh(["diff", tmp, os.path.join(ROOT, "PLANS.md")])
                    print("\n".join(d2.splitlines()[:20]))
                    print("  -> regenerate: sbt 'runMain graft.PlanDump "
                          "/root/testdata/sf0.01 PLANS.md'")
        finally:
            os.unlink(tmp)

    # 7. ADVICE.md freshness: rewritten since the previous driver round
    # commit ("round N: verdict/advice/correctness/bench")
    code, last_round = sh(["git", "log", "-1", "--format=%H",
                           "--grep", "^round [0-9]*:"])
    code2, advice_head = sh(["git", "log", "-1", "--format=%H", "--", "ADVICE.md"])
    lr, ah = last_round.strip(), advice_head.strip()
    if not lr or not ah:
        check("advice-fresh", False, "git history unreadable")
    else:
        # fresh if ADVICE.md's last commit is NOT an ancestor-or-equal of
        # the driver round commit (i.e. it was touched after it), or if
        # it is uncommitted-but-modified right now
        code3, _ = sh(["git", "merge-base", "--is-ancestor", lr, ah])
        _, dirty = sh(["git", "status", "--porcelain", "ADVICE.md"])
        fresh = (code3 == 0 and ah != lr) or bool(dirty.strip())
        check("advice-fresh", fresh,
              "rewrite ADVICE.md with this round's self-review" if not fresh else "")

    bad = [n for n, ok in RESULTS if not ok]
    print(f"\n[round_gate] {'ALL GREEN' if not bad else 'FAILED: ' + ', '.join(bad)}"
          f" ({len(RESULTS) - len(bad)}/{len(RESULTS)} checks)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
