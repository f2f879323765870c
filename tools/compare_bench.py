#!/usr/bin/env python3
"""Compare two Bench JSON artifacts with calibration normalization.

Usage: python3 tools/compare_bench.py BENCH_A.json BENCH_B.json [--threshold 0.2]

The bench line carries a fixed-work CPU spin calibration ("calib"): identical
arithmetic every run, so its seconds measure the BOX (co-tenant steal,
frequency scaling), not the code. Run B's timings are normalized by the
spin32 ratio before flagging, so a global host-speed shift between the two
runs does not read as a per-query regression. Only queries whose median
exceeds 1 s in either run are flagged (sub-second medians are dominated by
per-sample scheduling jitter, which the "spread" field records).
"""
import json
import sys


def load(path):
    with open(path) as f:
        txt = f.read()
    # accept either a bare JSON object or a log containing metric lines;
    # with several appended bench runs, the LAST line is the current one
    lines = [l for l in txt.splitlines() if l.startswith('{"metric"')]
    if lines:
        return json.loads(lines[-1])
    return json.loads(txt)


def main():
    argv = sys.argv[1:]
    thr = 0.2
    args = []
    i = 0
    while i < len(argv):
        tok = argv[i]
        if tok.startswith("--threshold"):
            thr = float(tok.split("=", 1)[1]) if "=" in tok else float(argv[i + 1])
            i += 1 if "=" in tok else 2
            continue
        args.append(tok)
        i += 1
    a, b = load(args[0]), load(args[1])
    ca = a.get("calib", {}).get("spin32")
    cb = b.get("calib", {}).get("spin32")
    scale = (ca / cb) if (ca and cb) else 1.0
    print(f"A total {a['value']:.1f}s  B total {b['value']:.1f}s  "
          f"calib32 A={ca} B={cb}  B->A scale {scale:.3f}")
    flagged = []
    for q in sorted(set(a["queries"]) & set(b["queries"])):
        va, vb = a["queries"][q], b["queries"][q]
        if va < 0 or vb < 0:
            flagged.append((q, va, vb, "FAILED"))
            continue
        if max(va, vb) <= 1.0:
            continue
        vbn = vb * scale
        rel = abs(va - vbn) / max(min(va, vbn), 1e-3)
        mark = "REGRESSED" if rel > thr and vbn > va else (
            "IMPROVED" if rel > thr else "ok")
        print(f"{q:30s} A {va:7.2f}  B {vb:7.2f}  B(norm) {vbn:7.2f}  "
              f"delta {rel * 100:5.1f}%  {mark}")
        if mark != "ok":
            flagged.append((q, va, vb, mark))
    print(f"\n{len(flagged)} queries beyond {thr:.0%} after calib normalization")
    for q, va, vb, mark in flagged:
        spread_a = a.get("spread", {}).get(q)
        spread_b = b.get("spread", {}).get(q)
        print(f"  {q}: {mark}  A spread {spread_a}  B spread {spread_b}")
    # nonzero for anything a CI gate should stop on: failures OR regressions
    sys.exit(1 if any(m in ("FAILED", "REGRESSED") for _, _, _, m in flagged) else 0)


if __name__ == "__main__":
    main()
