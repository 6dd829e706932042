#!/usr/bin/env python3
"""Local mirror of the driver's copy detector: flags any repo source
file whose line-level similarity to ANY reference file exceeds the
threshold (default 0.6, the driver's). Writes COPYCHECK.json
({"flagged": [...], "checked": N, "threshold": t}) next to this repo's
root so tools/round_gate.py has the artifact between driver rounds.

Similarity = difflib.SequenceMatcher ratio over normalized non-blank
lines (whitespace collapsed, comments kept — copied comments are
copies too). The reference is a different language (Python/SQL vs
Scala), so a true copy would surface through shared literals,
identifiers, and structure; this is deliberately the same blunt
instrument the driver uses, not a semantic clone detector.

Usage: python3 tools/copycheck_local.py [--threshold 0.6]
       [--reference /root/reference] [--out COPYCHECK.json]
"""
import sys, os, json, difflib

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def norm_lines(path):
    try:
        with open(path, errors="replace") as f:
            return [" ".join(l.split()) for l in f if l.strip()]
    except OSError:
        return []


def main():
    args = sys.argv[1:]

    def opt(name, default):
        if name in args:
            i = args.index(name)
            args.pop(i)
            if i >= len(args):
                sys.exit(f"usage: {name} requires a value")
            return args.pop(i)
        return default

    threshold = float(opt("--threshold", "0.6"))
    ref_root = opt("--reference", "/root/reference")
    out = opt("--out", os.path.join(ROOT, "COPYCHECK.json"))

    ref_files = []
    for dp, dns, fns in os.walk(ref_root):
        dns[:] = [d for d in dns if not d.startswith(".")]
        ref_files += [os.path.join(dp, f) for f in fns
                      if f.endswith((".py", ".sql", ".scala", ".java",
                                     ".go", ".rs", ".cpp", ".cc", ".ipynb"))]
    ref_lines = {p: norm_lines(p) for p in ref_files}

    repo_files = []
    for base in ("src", "tools"):
        for dp, dns, fns in os.walk(os.path.join(ROOT, base)):
            dns[:] = [d for d in dns if d != "target"]
            repo_files += [os.path.join(dp, f) for f in fns
                           if f.endswith((".scala", ".py", ".sql"))]

    me = os.path.abspath(__file__)
    flagged = []
    for rp in sorted(repo_files):
        if os.path.abspath(rp) == me:
            continue
        mine = norm_lines(rp)
        if not mine:
            continue
        for fp, theirs in ref_lines.items():
            if not theirs:
                continue
            # autojunk=False: the default heuristic discounts lines that
            # occur in >1% of a >200-line sequence (braces, imports,
            # boilerplate), which would UNDER-report similarity on larger
            # files relative to a detector without it — a pre-gate mirror
            # must err toward over-flagging (ADVICE r14)
            r = difflib.SequenceMatcher(None, mine, theirs,
                                        autojunk=False).ratio()
            if r > threshold:
                flagged.append({"repo": os.path.relpath(rp, ROOT),
                                "reference": os.path.relpath(fp, ref_root),
                                "similarity": round(r, 3)})
    art = {"flagged": flagged, "checked": len(repo_files),
           "reference_files": len(ref_files), "threshold": threshold,
           "tool": "tools/copycheck_local.py (local mirror of the driver's "
                   "line-similarity detector)"}
    json.dump(art, open(out, "w"), indent=1)
    print(f"copycheck: {len(repo_files)} repo files vs {len(ref_files)} "
          f"reference files, threshold {threshold} -> "
          f"{len(flagged)} flagged; wrote {out}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
