"""Regenerate _DRIVER_WINDOW_PRIORITY from the attestation history.

Policy (r12+): the driver attests the first 50 entries each round, so the
list is ordered as

1. never-attested entries (new this round), in registry order;
2. every already-attested entry, ascending by newest-attested round
   (stable on the prior list order) — the window slots after the new
   entries take the GLOBALLY stalest band, and the tail stays in
   non-decreasing staleness order (pinned in tests/test_plans.py).

Usage: PYTHONPATH=. python tools/regen_window.py   (rewrites queries.py
between the _DRIVER_WINDOW_PRIORITY brackets, preserving the banner
comment; run the test_plans window pins afterwards)
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QPATH = os.path.join(ROOT, "datalake_brief_spark", "queries.py")


def main() -> None:
    from datalake_brief_spark.queries import _DRIVER_WINDOW_PRIORITY, QUERIES

    latest: dict[str, int] = {}
    for f in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name in json.load(open(f)):
            latest[name] = max(latest.get(name, 0), r)
    prior = {n: i for i, n in enumerate(_DRIVER_WINDOW_PRIORITY)}
    names = list(QUERIES)
    new = [n for n in names if n not in latest]
    old = sorted(
        (n for n in names if n in latest),
        key=lambda n: (latest[n], prior.get(n, 1 << 30)),
    )
    ordered = new + old
    n_window = len(new) + max(0, 50 - len(new))
    print(f"{len(new)} new, window fills to {min(n_window, 50)}; "
          f"stalest attested band: r{latest[old[0]]}..r{latest[old[min(49 - len(new), len(old) - 1)]]}")
    src = open(QPATH).read()
    m = re.search(
        r"(_DRIVER_WINDOW_PRIORITY = \[\n)((?:    #[^\n]*\n)*)((?:    \"[^\"]+\",\n)+)(\])",
        src,
    )
    if not m:
        raise SystemExit("could not locate _DRIVER_WINDOW_PRIORITY block")
    body = "".join(f'    "{n}",\n' for n in ordered)
    src = src[: m.start(3)] + body + src[m.end(3) :]
    open(QPATH, "w").write(src)
    print(f"rewrote {len(ordered)} entries")


if __name__ == "__main__":
    main()
