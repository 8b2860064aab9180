"""Which oracle-gated queries still lack a green driver-correctness row?

The external driver verifies the first 50 ``load_all()`` entries per
round (registry._CHECK_PRIORITY controls the order). Each round's
results land in CORRECTNESS_r{N}.json. This script diffs the registry
against every recorded round so the next session can rebuild the
priority window mechanically instead of by archaeology:

    python scripts/rotation_candidates.py

Prints: per-category counts, the never-checked oracle-gated names in
registration order (the rotation candidates), and any red rows.

With ``--age``, instead prints every driver-green query ordered by the
round of its most recent green row (oldest first) — once the
never-checked backlog is smaller than the 50-slot window, the spare
slots should re-bank the stalest banked rows (r1/r2 greens age as the
code around them evolves).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sigma_rx7_spark import registry  # noqa: E402


def main() -> None:
    specs = registry.load_all()
    checked: dict[str, bool] = {}
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        with open(path) as fh:
            for name, row in json.load(fh).items():
                ok = bool(row.get("hash_match")) or (
                    row.get("err") is None and bool(row.get("rows_match")))
                checked[name] = checked.get(name, False) or ok
                if ok:
                    last_green[name] = max(last_green.get(name, 0), rnd)

    if "--age" in sys.argv:
        # Oldest-checked first: ties broken by registration order so the
        # emitted list is deterministic round over round.
        reg_pos = {n: i for i, n in enumerate(specs)}
        aged = sorted(last_green, key=lambda n: (last_green[n],
                                                 reg_pos.get(n, 1 << 30)))
        print("re-bank candidates (driver-green, oldest round first; "
              "fill spare window slots from the top):")
        for n in aged:
            print(f"  r{last_green[n]:<2} {n}")
        return
    gated = [n for n, s in specs.items() if s.oracle]
    rows_only = [n for n, s in specs.items() if not s.oracle]
    green = [n for n in gated if checked.get(n)]
    # red = an oracle-GATED query with only failing rows; rows-only
    # queries legitimately record no-oracle rows and are not failures
    red = [n for n in checked
           if not checked[n] and n in gated]
    pending = [n for n in gated if n not in checked]
    print(f"registered={len(specs)} oracle-gated={len(gated)} "
          f"rows-only={len(rows_only)}")
    print(f"driver-green={len(green)} red={len(red)} "
          f"never-checked={len(pending)}")
    if red:
        print("\nRED rows (fix first):")
        for n in red:
            print(f"  {n}")
    print("\nrotation candidates (never-checked, registration order; "
          "the next _CHECK_PRIORITY takes the first 50):")
    for n in pending:
        print(f"  {n}")


if __name__ == "__main__":
    main()
