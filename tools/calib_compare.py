#!/usr/bin/env python3
"""Calibration-normalized bench comparison (VERDICT r18 #3 protocol).

Usage: calib_compare.py <bench_log_or_json_A> <bench_log_or_json_B>

Each argument is either a driver BENCH_r{N}.json (whose `tail` field
holds the bench stdout) or a raw local bench log. The script extracts
the final compact line `{"metric":"total",...,"queries":{...}}` from
each, then prints per-row ratios B/A divided by the calibration ratio
(x_calibration_fold B / A) — the host-speed-corrected drift the round
adjudication quotes instead of a hand-reconstructed shared-row median.
"""
import json
import re
import sys


def load_queries(path):
    text = open(path).read()
    if path.endswith(".json"):
        try:
            doc = json.loads(text)
            text = doc.get("tail", text)
        except json.JSONDecodeError as e:
            # distinguish "not valid json" (regex would scan the raw,
            # still-escaped text and silently find nothing) from a
            # genuinely missing bench line in a parsed tail
            sys.exit(f"{path} ends in .json but failed to parse ({e}); "
                     "pass the raw bench log instead")
    # the final compact line (single-line JSON with metric:total)
    best = None
    for m in re.finditer(r'\{"metric":"total".*?"queries":\{[^}]*\}\}', text):
        best = m.group(0)
    if best is None:
        sys.exit(f"no compact bench line found in {path}")
    # the tail field holds escaped newlines; the regex already scopes one line
    doc = json.loads(best)
    return doc


def main():
    a, b = sys.argv[1], sys.argv[2]
    da, db = load_queries(a), load_queries(b)
    qa, qb = da["queries"], db["queries"]
    ca, cb = qa.get("x_calibration_fold"), qb.get("x_calibration_fold")
    if not ca or not cb:
        sys.exit("x_calibration_fold missing from one side")
    calib = cb / ca
    print(f"run A: {da.get('run')}  total {da.get('value')}  calib {ca}")
    print(f"run B: {db.get('run')}  total {db.get('value')}  calib {cb}")
    print(f"calibration ratio B/A = {calib:.3f}  "
          f"(host-speed correction; divide every raw ratio by it)")
    shared = sorted(set(qa) & set(qb) - {"x_calibration_fold"})
    rows = []
    for k in shared:
        raw = qb[k] / qa[k]
        rows.append((raw / calib, raw, k))
    rows.sort(reverse=True)
    print(f"\n{len(shared)} shared rows   normalized  raw      A        B")
    for norm, raw, k in rows:
        flag = "  <== check" if norm > 1.25 else ""
        print(f"{k:38s} x{norm:5.3f}   x{raw:5.3f}  {qa[k]:7.3f}  {qb[k]:7.3f}{flag}")
    norms = sorted(r[0] for r in rows)
    if not norms:
        sys.exit("no shared query rows between the two benches — "
                 "nothing to normalize (are these the same suite?)")
    med = norms[len(norms) // 2]
    print(f"\nmedian normalized row ratio: x{med:.3f}")


if __name__ == "__main__":
    main()
