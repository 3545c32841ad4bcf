#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. BENCH_r3 vs BENCH_r4): classify every
timing delta by whether the query's structural plan hash changed.

Wall-clock on the bench VM is noise-dominated (BASELINE.md), so the rule
is: a slowdown WITHOUT a plan change is weather; a plan change is a real
event whatever the clock says.

Usage: python3 tools/diff_bench.py <old.json> <new.json> [--threshold SECS]
"""
import json
import sys


def load(path):
    with open(path) as f:
        txt = f.read()
    # tolerate sbt's "[info] " prefix and surrounding log lines
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    # driver BENCH_rN.json wrapper: the raw line is a (possibly truncated)
    # "tail" string — recover whatever query/plan pairs survived
    import re
    try:
        wrapper = json.loads(txt)
    except json.JSONDecodeError:
        raise SystemExit(f"no bench JSON line found in {path}")
    tail = wrapper.get("tail", "")
    qs = {m.group(1): float(m.group(2)) for m in
          re.finditer(r'"(q[0-9]\w+)":([0-9.]+)', tail)}
    plans = {m.group(1): m.group(2) for m in
             re.finditer(r'"(q[0-9]\w+)":"([0-9a-f]{16})"', tail)}
    if not qs:
        raise SystemExit(f"no bench JSON line found in {path}")
    return {"queries": qs, "plans": plans}


def main():
    # two-token form (--threshold 2) consumes its value so it is never
    # mistaken for a positional file argument
    argv, args, thr = sys.argv[1:], [], 1.0
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            elif i + 1 < len(argv):
                i += 1
                thr = float(argv[i])
            else:
                raise SystemExit("--threshold needs a value")
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        raise SystemExit(__doc__.strip().splitlines()[-1])
    old, new = load(args[0]), load(args[1])
    oq, nq = old.get("queries", {}), new.get("queries", {})
    op, np_ = old.get("plans", {}), new.get("plans", {})

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    plan_changed, noise, faster = [], [], []
    for name in sorted(set(oq) & set(nq)):
        dt = nq[name] - oq[name]
        pc = name in op and name in np_ and op[name] != np_[name]
        if pc:
            plan_changed.append((name, oq[name], nq[name], op.get(name), np_.get(name)))
        elif dt >= thr:
            noise.append((name, oq[name], nq[name]))
        elif dt <= -thr:
            faster.append((name, oq[name], nq[name]))

    if plan_changed:
        print("== PLAN CHANGED (real events — review these):")
        for n, a, b, ha, hb in plan_changed:
            print(f"  {n}: {a:.2f}s -> {b:.2f}s  plan {ha} -> {hb}")
    if added:
        print(f"== NEW queries: {', '.join(added)}")
    if removed:
        print(f"== REMOVED queries: {', '.join(removed)}")
    if noise:
        print(f"== slower >= {thr}s with UNCHANGED plan (noise until proven otherwise):")
        for n, a, b in noise:
            print(f"  {n}: {a:.2f}s -> {b:.2f}s")
    if faster:
        print(f"== faster >= {thr}s with unchanged plan:")
        for n, a, b in faster:
            print(f"  {n}: {a:.2f}s -> {b:.2f}s")
    ot, nt = old.get("value"), new.get("value")
    if ot is not None and nt is not None:
        print(f"== totals: {ot:.1f}s ({len(oq)} queries) -> {nt:.1f}s ({len(nq)} queries)")
    if not (op and np_):
        print("note: one side lacks plan hashes — classification is timing-only")


if __name__ == "__main__":
    main()
