#!/usr/bin/env python3
"""Round-over-round bench comparison over per-query MINs.

Usage: python3 scripts/bench_compare.py <old BENCH_r*.json> <new BENCH_r*.json>
       [--threshold 1.3]

Bench.scala already reports min-of-3 round-robin per query (the stable
signal per the round-13 noise lesson); this script diffs two such lines,
prints the host fingerprints (load1 / cached_kb) next to any regression
list, and exits 1 only when regressions exceed the threshold on a QUIET
pair of runs (both load1 < 2.0). Broad same-direction deltas across
dozens of untouched queries are flagged as probable host noise instead.
"""
import json, os, signal, sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)

# non-query numeric keys that can leak out of a tail regex scrape
NOT_QUERIES = {"value", "load1", "cached_kb", "n_queries"}


def resolve_full(d, path):
    """Bench's compact trailing line carries only the slowest queries
    plus a `queries_full` pointer to the complete per-query map
    (bench_last.json, committed per round). Follow it, but only when
    the total-value stamp matches — bench_last.json is overwritten
    every local run and must not be attributed to an older round."""
    ptr = d.get("queries_full")
    if not ptr:
        return d
    for base in (os.path.dirname(os.path.abspath(path)), "."):
        cand = os.path.join(base, ptr)
        try:
            full = load_metric_line(open(cand).read())
        except (OSError, SystemExit):
            continue
        if full and abs(float(full.get("value", -1)) -
                        float(d.get("value", -2))) < 1e-6:
            return full
    return d


def load_metric_line(text):
    """First parseable {"metric":...} line in a text blob, or None."""
    for line in text.splitlines():
        if '"metric"' in line:
            try:
                d = json.loads(line[line.index('{'):])
            except (json.JSONDecodeError, ValueError):
                continue
            if isinstance(d, dict) and "queries" in d:
                return d
    return None


def load(path):
    """Accepts a Bench stdout log, a bench_last.json, or the driver's
    BENCH_r*.json wrapper. For the wrapper: prefer the driver-parsed
    compact line (following its queries_full pointer), then a complete
    metric line inside `tail`, then a regex scrape of the tail
    fragment."""
    text = open(path).read()
    d = load_metric_line(text)
    if d is not None:
        return resolve_full(d, path)
    try:
        wrapper = json.loads(text)
    except json.JSONDecodeError:
        raise SystemExit(f"no metric line in {path}")
    parsed = wrapper.get("parsed")
    if isinstance(parsed, dict) and "queries" in parsed:
        return resolve_full(parsed, path)
    tail = wrapper.get("tail", "")
    d = load_metric_line(tail)
    if d is not None:
        return resolve_full(d, path)
    import re
    qs = {k: float(v) for k, v in
          re.findall(r'"([a-z]\w+)":([0-9.]+)', tail)
          if k not in NOT_QUERIES}
    return {"queries": qs, "load1": wrapper.get("load1", -1),
            "cached_kb": wrapper.get("cached_kb", -1)}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.3
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else thr
    old, new = load(args[0]), load(args[1])
    oq = {k: v for k, v in old["queries"].items() if v > 0}
    nq = {k: v for k, v in new["queries"].items() if v > 0}
    common = sorted(set(oq) & set(nq))
    print(f"common queries: {len(common)}  "
          f"(old n={len(oq)}, new n={len(nq)})")
    print(f"host: old load1={old.get('load1')} cached_kb={old.get('cached_kb')}"
          f" | new load1={new.get('load1')} cached_kb={new.get('cached_kb')}")
    regs, imps = [], []
    for k in common:
        r = nq[k] / oq[k]
        if r > thr and nq[k] - oq[k] > 0.05:
            regs.append((k, oq[k], nq[k], r))
        elif r < 1 / thr and oq[k] - nq[k] > 0.05:
            imps.append((k, oq[k], nq[k], r))
    tot_o = sum(oq[k] for k in common)
    tot_n = sum(nq[k] for k in common)
    if tot_o > 0:
        print(f"common-query total: {tot_o:.1f}s -> {tot_n:.1f}s "
              f"({tot_n / tot_o:.2f}x)")
    if common:
        import math
        geo = math.exp(sum(math.log(nq[k] / oq[k]) for k in common)
                       / len(common))
        print(f"geomean over common queries: {geo:.3f}x")
    for k, a, b, r in sorted(imps, key=lambda x: x[3]):
        print(f"  [faster] {k}: {a:.3f} -> {b:.3f}  ({r:.2f}x)")
    for k, a, b, r in sorted(regs, key=lambda x: -x[3]):
        print(f"  [SLOWER] {k}: {a:.3f} -> {b:.3f}  ({r:.2f}x)")
    if not regs:
        print("no regressions above threshold")
        return 0
    quiet = (float(old.get("load1", 99)) < 2.0 and
             float(new.get("load1", 99)) < 2.0)
    broad = len(regs) > max(5, len(common) // 10)
    if broad:
        print(f"NOTE: {len(regs)} regressions across the suite — the "
              "round-13 lesson says broad same-direction deltas are host "
              "noise (check load1/cached_kb above); re-run in a quiet "
              "window before believing them")
        return 0
    if not quiet:
        print("NOTE: a run was on a loaded host (load1 >= 2.0) — re-probe "
              "before believing these")
        return 0
    print("regressions on a quiet host pair — investigate")
    return 1


if __name__ == "__main__":
    sys.exit(main())
