#!/usr/bin/env python3
"""Cross-round bench comparison with host-speed adjudication.

Joins two bench artifacts (the full record graft.Bench writes to
bench_out.json / line 1 of stdout, or the driver's BENCH_r*.json wrapper,
which carries only the summary + top5), rescales for host speed, and
prints a per-query verdict — the table the round verdict previously had
to build by hand with a manual control re-run (r17's anchor, r18's 86 s
cdc outlier, r19's 18.7 s lsh / 9.05 s ivf readings were all host-band
artifacts invisible to runq-wait).

Host-factor resolution, strongest first:
 1. CANARY (r20+ artifacts): both carry `canary.median_mt_sec` — wall
    seconds for identical fixed CPU-bound work, so factor = canB/canA
    exactly. Rescaling is announced whenever the canaries differ >20%.
 2. MEDIAN-RATIO heuristic (pre-canary artifacts): the median of
    per-query ratios over shared queries. A hypervisor band slows every
    query by roughly the same factor; genuine regressions are outliers
    against it. This reproduces the judge's manual method (BENCH_r19:
    uniform ~x2 boot factor, median over 32 shared queries).

Per-query verdicts (after rescaling by the host factor):
    improved / unchanged (host-band) / REGRESSED (canary mode) or
    OUTLIER—re-measure (heuristic mode: can't distinguish a genuine
    regression from a single-query host burst without a canary).
Queries whose `methodology_notes` annotation differs between the two
artifacts are excluded as not-comparable (e.g. the r19 slot-fixture
accounting change).

usage: benchdiff.py A.json B.json [--threshold 1.5] [--min-delta 0.2]
       benchdiff.py --selftest
"""
import argparse
import json
import sys
from statistics import median


def load(path):
    with open(path) as f:
        d = json.load(f)
    # driver wrapper: {"n":..,"rc":..,"parsed":{summary}} — the summary
    # has no full query map; salvage top5 so SOME comparison is possible
    if "parsed" in d and "queries" not in d:
        p = d["parsed"] or {}
        return {
            "queries": dict(p.get("top5", {})),
            "partial": True,
            "value": p.get("value"),
            "iterations": p.get("iterations"),
            "methodology_version": p.get("methodology_version"),
            "canary_mt": p.get("canary_mt_sec"),
            "contended": p.get("contended"),
            "notes": {},
        }
    return {
        "queries": d.get("queries", {}),
        "partial": False,
        "value": d.get("value"),
        "iterations": d.get("iterations"),
        "methodology_version": d.get("methodology_version"),
        "canary_mt": (d.get("canary") or {}).get("median_mt_sec"),
        "contended": (d.get("env") or {}).get("contended"),
        "notes": d.get("methodology_notes", {}),
    }


def compare(a, b, threshold=1.5, min_delta=0.2):
    """Returns (rows, meta). rows: (name, wallA, wallB, adjRatio, verdict)."""
    if (a["methodology_version"] is not None
            and b["methodology_version"] is not None
            and a["methodology_version"] != b["methodology_version"]):
        raise SystemExit(
            f"REFUSING: methodology_version {a['methodology_version']} vs "
            f"{b['methodology_version']} - per-query numbers are not "
            "comparable across versions (cache accounting changed)")
    shared = sorted(set(a["queries"]) & set(b["queries"]))
    if not shared:
        raise SystemExit("REFUSING: no shared queries between artifacts")
    skipped = [n for n in shared
               if a["notes"].get(n) != b["notes"].get(n)]
    usable = [n for n in shared if n not in skipped]

    if a["canary_mt"] and b["canary_mt"]:
        factor = b["canary_mt"] / a["canary_mt"]
        mode = "canary"
    else:
        ratios = sorted(b["queries"][n] / a["queries"][n]
                        for n in usable if a["queries"][n] > 1e-9)
        if len(ratios) < 5:
            factor, mode = 1.0, "raw (too few shared queries for heuristic)"
        else:
            factor, mode = median(ratios), "median-ratio heuristic"

    rows = []
    for n in shared:
        wa, wb = a["queries"][n], b["queries"][n]
        if n in skipped:
            rows.append((n, wa, wb, None, "methodology-changed: skip"))
            continue
        adj = (wb / factor) / wa if wa > 1e-9 else float("inf")
        delta = abs(wb / factor - wa)
        if adj > threshold and delta > min_delta:
            v = ("REGRESSED" if mode == "canary"
                 else "OUTLIER - re-measure (regression or host burst)")
        elif adj < 1.0 / threshold and delta > min_delta:
            v = "improved"
        else:
            v = "unchanged (host-band)"
        rows.append((n, wa, wb, adj, v))
    meta = {"mode": mode, "host_factor": factor, "n_shared": len(shared),
            "n_skipped": len(skipped),
            "partial": a["partial"] or b["partial"]}
    return rows, meta


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("artifacts", nargs="*")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-delta", type=float, default=0.2)
    ap.add_argument("--selftest", action="store_true")
    args = ap.parse_args(argv)
    if args.selftest:
        return selftest()
    if len(args.artifacts) != 2:
        ap.error("need exactly two artifacts (or --selftest)")
    a, b = load(args.artifacts[0]), load(args.artifacts[1])
    rows, meta = compare(a, b, args.threshold, args.min_delta)
    if meta["partial"]:
        print("NOTE: at least one artifact is a driver summary wrapper - "
              "only its top5 queries are visible; this is a partial "
              "comparison, not full-registry adjudication")
    print(f"host-speed mode: {meta['mode']}  "
          f"factor(B/A) = {meta['host_factor']:.3f}"
          + ("  ** hosts differ >20%: comparing RESCALED walls **"
             if abs(meta["host_factor"] - 1) > 0.2 else ""))
    if any(x["contended"] for x in (a, b)):
        print("NOTE: a run is flagged contended - treat its numbers as "
              "upper bounds")
    w = max(len(r[0]) for r in rows)
    for n, wa, wb, adj, v in sorted(
            rows, key=lambda r: -(r[3] or 0)):
        adj_s = f"{adj:6.2f}x" if adj is not None else "    n/a"
        print(f"{n:<{w}}  A={wa:8.3f}s  B={wb:8.3f}s  adj={adj_s}  {v}")
    from collections import Counter
    counts = Counter(v for *_, v in rows)
    print("; ".join(f"{k}: {c}" for k, c in sorted(counts.items())))
    return 0


def selftest():
    """The adjudication the tool must reproduce: host B is uniformly 2x
    slower (the r19 boot band) AND one query genuinely regressed 5x.
    The heuristic must call the band 'unchanged' and flag ONLY the real
    outlier; the canary path must do the same with an exact factor."""
    qa = {f"q{i}": 1.0 + i * 0.1 for i in range(20)}
    qb = {n: w * 2.0 for n, w in qa.items()}
    qb["q7"] = qa["q7"] * 2.0 * 5.0          # genuine regression
    base = {"partial": False, "value": None, "iterations": 3,
            "methodology_version": 2, "contended": False, "notes": {}}
    # heuristic path (pre-canary artifacts)
    a = dict(base, queries=qa, canary_mt=None)
    b = dict(base, queries=qb, canary_mt=None)
    rows, meta = compare(a, b)
    flagged = [n for n, *_, v in [(r[0], r[4]) for r in rows]
               if "OUTLIER" in v]
    assert 1.9 < meta["host_factor"] < 2.1, meta
    assert flagged == ["q7"], f"heuristic flagged {flagged}"
    # canary path: exact factor, REGRESSED verdict
    a2 = dict(base, queries=qa, canary_mt=0.20)
    b2 = dict(base, queries=qb, canary_mt=0.40)
    rows2, meta2 = compare(a2, b2)
    flagged2 = [r[0] for r in rows2 if r[4] == "REGRESSED"]
    assert meta2["host_factor"] == 2.0
    assert flagged2 == ["q7"], f"canary flagged {flagged2}"
    unchanged = [r for r in rows2 if r[4] == "unchanged (host-band)"]
    assert len(unchanged) == 19, len(unchanged)
    # methodology-note divergence excludes the row
    a3 = dict(a2, notes={"q3": "old accounting"})
    rows3, _ = compare(a3, b2)
    assert [r for r in rows3 if r[0] == "q3"][0][4].startswith(
        "methodology-changed")
    # version mismatch refuses
    try:
        compare(dict(a2, methodology_version=1), b2)
        raise AssertionError("version mismatch must refuse")
    except SystemExit:
        pass
    print("selftest OK: band absorbed, outlier flagged (both modes), "
          "note-divergence skipped, version mismatch refused")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
