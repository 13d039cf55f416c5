"""Round-11 scale evidence (VERDICT r10 asks #1 and #4).

1. **Log retention / _last_checkpoint at a 10k-commit log** — the CDC
   shape: a synthetic log of 10,000 single-add commits (checkpoint +
   pointer at the tip). Measures snapshot resolution and tip resolution
   WITH the pointer (probe path — zero directory listings, O(tail)
   reads) vs WITHOUT it (listing path: every operation lists all 10k
   commit files first), then `expire_log` reclaiming all but the last
   100 versions, then resolution over the shrunken log. The pointer
   keeps per-operation metadata cost flat in log length; expiry bounds
   the storage itself.

2. **Merge rewrite-frame persist** — re-times the fixed-band MERGE of
   tools/r10_scale_check.py on the same banded table before/after is
   not possible in one tree, so this records the post-persist number to
   compare against BASELINE.md's round-10 point (1.91 s at sf0.1).

Usage: PYTHONPATH=. python tools/r11_scale_check.py
"""

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalake_brief_spark.sources import logstore, txlog

N_COMMITS = 10_000


def build_log(path: str) -> None:
    os.makedirs(txlog._log_dir(path))  # noqa: SLF001
    prev = None
    for v in range(1, N_COMMITS + 1):
        rel = f"data/{uuid.uuid4().hex}/part-0.parquet"
        commit = {
            "version": v,
            "adds": [rel],
            "removes": [prev] if prev else [],
            "ts": "2026-08-16T00:00:00+00:00",
            "rows": {rel: 100},
        }
        with open(txlog._commit_path(path, v), "w") as f:  # noqa: SLF001
            json.dump(commit, f)
        prev = rel
    # one consolidation at the tip (multiple of _CHECKPOINT_EVERY)
    txlog._maybe_checkpoint(path, N_COMMITS)  # noqa: SLF001


class CountingStore(logstore.LocalLogStore):
    def __init__(self):
        self.listings = 0
        self.reads = 0

    def list_dir(self, d):
        self.listings += 1
        return super().list_dir(d)

    def read_text(self, p):
        self.reads += 1
        return super().read_text(p)

    def exists(self, p):
        self.reads += 1
        return super().exists(p)


def timed(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def measure(path: str, label: str) -> None:
    store = CountingStore()
    logstore.set_log_store("", store)
    try:
        store.listings = store.reads = 0
        t_tip = timed(lambda: txlog.current_version(path))
        l_tip, r_tip = store.listings / 5, store.reads / 5
        store.listings = store.reads = 0
        t_rep = timed(lambda: txlog._replay(path))  # noqa: SLF001
        l_rep, r_rep = store.listings / 5, store.reads / 5
    finally:
        logstore.set_log_store("", logstore.LocalLogStore())
    print(
        f"{label:34s} tip={t_tip*1000:8.2f}ms (lists={l_tip:.0f} reads={r_tip:.0f})"
        f"  replay={t_rep*1000:8.2f}ms (lists={l_rep:.0f} reads={r_rep:.0f})",
        flush=True,
    )


def main() -> None:
    base = tempfile.mkdtemp(prefix="r11log_")
    path = os.path.join(base, "t")
    t0 = time.perf_counter()
    build_log(path)
    print(f"built {N_COMMITS}-commit log in {time.perf_counter()-t0:.1f}s")

    measure(path, "pointer (tail=0)")
    # 25 tail commits above the checkpoint: probe cost is O(tail)
    for v in range(N_COMMITS + 1, N_COMMITS + 26):
        rel = f"data/{uuid.uuid4().hex}/part-0.parquet"
        with open(txlog._commit_path(path, v), "w") as f:  # noqa: SLF001
            json.dump({"version": v, "adds": [rel], "removes": [], "rows": {rel: 1}}, f)
    measure(path, "pointer (tail=25)")
    os.rename(
        txlog._last_checkpoint_path(path),  # noqa: SLF001
        txlog._last_checkpoint_path(path) + ".bak",  # noqa: SLF001
    )
    measure(path, "NO pointer (listing fallback)")
    os.rename(
        txlog._last_checkpoint_path(path) + ".bak",  # noqa: SLF001
        txlog._last_checkpoint_path(path),  # noqa: SLF001
    )

    # the synthetic log has ONE checkpoint (the tip consolidation), so the
    # horizon can only be that checkpoint: retain within the 25-commit tail
    t0 = time.perf_counter()
    reclaimed = txlog.expire_log(path, retain_versions=20)
    t_exp = time.perf_counter() - t0
    n_left = len(txlog._versions(path))  # noqa: SLF001
    print(
        f"expire_log(retain=20): reclaimed {len(reclaimed)} log objects "
        f"in {t_exp:.2f}s; {n_left} commits remain"
    )
    measure(path, "post-expiry (pointer)")


if __name__ == "__main__":
    main()
