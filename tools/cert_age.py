"""Certification-age ledger: recompute, from the driver's own
CORRECTNESS_r*.json artifacts, each registered query's NEWEST green
driver cert — the bookkeeping behind the per-round `_PRIORITY`
re-certification window (r11/r12 verdicts: no row's newest cert should
age more than a few rounds; the driver certifies only the first 50 of
``queries()`` per round, so the window must rotate oldest-first).

Run: python tools/cert_age.py            (from the repo root)
Prints the newest-cert histogram, the ordered stale list (oldest
first — paste-ready for the next round's window), and flags any
registered query with NO green cert ever (should be only brand-new
entries).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def newest_green_certs() -> "dict[str, int]":
    newest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            d = json.load(open(f))
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in d.items():
            if (isinstance(row, dict) and row.get("err") is None
                    and row.get("rows_match")):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def main() -> None:
    from amundsendatabuilder_spark.plans.oracle_suite import QUERIES
    newest = newest_green_certs()
    latest = max(newest.values(), default=0)
    hist: dict[int, int] = {}
    for r in newest.values():
        hist[r] = hist.get(r, 0) + 1
    print(f"registered queries: {len(QUERIES)}; "
          f"ever driver-certified: {len(newest)}; latest round: r{latest}")
    print("newest-cert histogram:",
          {f"r{r}": n for r, n in sorted(hist.items())})
    never = sorted(q for q in QUERIES if q not in newest)
    if never:
        print(f"NEVER certified ({len(never)} — new entries expected "
              f"here, anything else is a gap): {never}")
    stale = sorted(((r, q) for q, r in newest.items() if r <= latest - 4))
    print(f"\nstale rows (newest cert <= r{latest - 4}, oldest first — "
          f"{len(stale)} rows, paste-ready for the next _PRIORITY "
          "window):")
    for r, q in stale:
        print(f"  r{r}  {q}")


if __name__ == "__main__":
    main()
