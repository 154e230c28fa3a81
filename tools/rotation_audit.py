"""Audit driver-row freshness for the correctness-prefix rotation.

    python tools/rotation_audit.py            # freshness table + proposed queue
    python tools/rotation_audit.py --queue 50 # print just the next-N queue

The rotation discipline (queries/__init__.py::_PRIORITY comment): the
driver hash-checks only the first 50 registry entries each round, so
the prefix rotates toward "no registry query's driver row is more than
one round old". The audit source of truth is max round per key across
CORRECTNESS_r0*.json — never memory or comments. This tool computes:

- per-query latest GREEN driver round (hash_match, or rows_match for
  oracle-less rows) and latest checked round;
- the freshness histogram (how many rows per round);
- the proposed next-round queue: never-driver-checked queries first
  (newest gates), then stalest-green, ties by name — the same order the
  rotation comment prescribes.

Queries whose latest row is RED are flagged loudly: a red row means the
driver saw a mismatch that round and the fix must be re-verified.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_rows(repo_root: str) -> dict[str, dict[int, bool]]:
    """{query: {round: green?}} across every CORRECTNESS_r*.json."""
    out: dict[str, dict[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = bool(
                row.get("hash_match")
                or (row.get("hash_match") is None and row.get("rows_match"))
            )
            out.setdefault(name, {})[rnd] = green
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--queue", type=int, default=None, help="print only the next-N rotation queue")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = load_rows(repo)

    from dbt_slabbing_spark.queries import _PRIORITY, registry

    reg = registry()
    latest_green: dict[str, int] = {}
    latest_any: dict[str, int] = {}
    red_latest: list[str] = []
    for name in reg:
        hist = rows.get(name, {})
        greens = [r for r, g in hist.items() if g]
        if greens:
            latest_green[name] = max(greens)
        if hist:
            latest_any[name] = max(hist)
            if not hist[max(hist)]:
                red_latest.append(name)

    # rotation queue: never-checked first (newest gates land here), then
    # stalest green; ties by name for a stable, reviewable order
    never = sorted(n for n in reg if n not in latest_any)
    stale = sorted((latest_green.get(n, 0), n) for n in reg if n in latest_any)
    queue = never + [n for _r, n in stale]

    if args.queue:
        for n in queue[: args.queue]:
            print(n)
        return 0

    hist: dict[str, int] = {}
    for n in reg:
        key = f"r{latest_green[n]}" if n in latest_green else ("RED" if n in latest_any else "never")
        hist[key] = hist.get(key, 0) + 1
    print(f"registry: {len(reg)} queries; prefix: {len(_PRIORITY)}")
    # numeric round order (lexicographic would put r10 before r2 from
    # round 10 on), with never/RED pushed to the end
    print("freshness (latest green driver round):",
          dict(sorted(hist.items(),
                      key=lambda kv: (not kv[0].startswith("r"),
                                      int(kv[0][1:]) if kv[0].startswith("r") else -1))))
    if red_latest:
        print(f"!! latest driver row RED for: {sorted(red_latest)}")
    in_prefix = set(_PRIORITY)
    stale_prefixed = [n for n in _PRIORITY if n in latest_green and n in latest_any]
    print("prefix rows never driver-checked:",
          sum(1 for n in _PRIORITY if n not in latest_any))
    oldest = sorted((latest_green.get(n, 0), n) for n in stale_prefixed)[:5]
    print("stalest prefixed greens:", oldest)
    print(f"\nproposed next-round queue (first {len(_PRIORITY)}):")
    for n in queue[: len(_PRIORITY)]:
        mark = "*" if n in in_prefix else " "
        r = f"r{latest_green[n]}" if n in latest_green else ("RED" if n in latest_any else "never")
        print(f"  {mark} {n:44s} {r}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
