"""Minimal transaction-log parquet table: ACID-ish commits over a plain
filesystem, closing the "Parquet/Delta" gap without a Delta/Iceberg
dependency (none is installed in this environment).

Design follows the published Delta Lake protocol shape (Armbrust et al.,
VLDB 2020, "Delta Lake: High-Performance ACID Table Storage over Cloud
Object Stores" — public knowledge): an ordered log of commit files is the
source of truth; data files are immutable; readers resolve a snapshot from
the log, never from directory listing.

Layout::

    <path>/_txlog/00000000000000000001.json   one JSON commit per version
    <path>/data/<uuid>/part-*.parquet         immutable data-file groups

Commit file: ``{"version": N, "adds": [...], "removes": [...]}`` with paths
relative to the table root. Visible files at version V = all adds minus all
removes across commits 1..V.

Guarantees (and their mechanism):

- **Atomic commits** — a write lands data files FIRST, then creates the
  next commit file with O_EXCL. Readers only see files the log names, so a
  writer that dies mid-write leaves invisible garbage, never a torn table.
- **Optimistic concurrency** — two writers racing to version N+1 collide on
  the O_EXCL create; the loser re-reads the log and retries against the new
  tip (blind appends always merge cleanly; overwrites re-validate).
- **Snapshot isolation / time travel** — ``read(version=...)`` resolves the
  file list for any retained version; concurrent commits never disturb an
  in-flight read because its files are immutable.
- **Vacuum** — deletes data files no longer referenced by any retained
  version; the log itself is never rewritten.

Every operation the protocol's atomicity rides on — the commit-file
create-if-absent, torn-write-safe checkpoint writes, and file
reclamation — goes through the :mod:`logstore` seam (``LogStore``):
local filesystems ship working (O_EXCL / atomic rename), and porting to
S3/ABFS/GCS means implementing that one interface (conditional put /
etag-guarded create — strategies documented there), not auditing this
module's file calls.

At 100 TB the log stays tiny (one small JSON per commit), and resolution
cost stays FLAT as history grows: every 10th commit consolidates the live
state — small tables into one ``<v>.checkpoint.json``, large ones into
multi-part PARQUET checkpoint files with the JSON reduced to a completion
marker (the Delta multi-part checkpoint design; readers replay only the
commits after the newest covering checkpoint and a million-file state is
a columnar read, never one giant JSON parse). Data file counts bound plan
size exactly as for any parquet table, and MERGE is clause-based and
file-pruned (:func:`merge_into`): per-file key stats + blooms bound the
rewrite to the files that actually hold matched keys, so a CDC upsert
stream costs ∝ its touched data, never the table.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import logstore

_LOG_DIR = "_txlog"
_DATA_DIR = "data"
_CDC_DIR = "_change_data"
_PAD = 20


class CommitConflict(RuntimeError):
    """Another writer committed the version this transaction targeted."""


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG_DIR)


def _commit_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:0{_PAD}d}.json")


def _versions(path: str) -> list[int]:
    return sorted(
        int(f[: -len(".json")])
        for f in logstore.for_path(path).list_dir(_log_dir(path))
        if f.endswith(".json") and ".checkpoint." not in f
    )


def _load_commit(path: str, version: int) -> dict:
    """Read one commit record through the LogStore seam."""
    return json.loads(
        logstore.for_path(path).read_text(_commit_path(path, version))
    )


_CHECKPOINT_EVERY = 10

#: Delta's ``_last_checkpoint`` design: a tiny pointer file naming the
#: newest checkpoint version, refreshed with every checkpoint write. With
#: it, snapshot resolution never LISTS the log directory — the pointer
#: names the start state and the dense commit tail above it is probed
#: version-by-version (commits are strictly sequential, so the first
#: missing version IS the tip). Listing an object-store prefix is
#: O(objects) paginated requests; at a CDC stream's cadence the log holds
#: millions of commit files and the listing — not the replay — becomes
#: the per-operation bottleneck. Absent/torn/stale pointers fall back to
#: the listing path, so the pointer is purely an accelerator.
_LAST_CP = "_last_checkpoint"


def _last_checkpoint_path(path: str) -> str:
    return os.path.join(_log_dir(path), _LAST_CP)


def _pointer_version(path: str) -> int | None:
    """The ``_last_checkpoint`` pointer's version, or None when the file
    is absent or unparseable (fall back to listing — never fail a read
    over a busted accelerator)."""
    try:
        d = json.loads(
            logstore.for_path(path).read_text(_last_checkpoint_path(path))
        )
        v = int(d["version"])
    except (FileNotFoundError, ValueError, KeyError, TypeError):
        return None
    return v if v > 0 else None


def _probe_tail(path: str, after: int, version: int | None) -> list[int]:
    """The dense commit versions in ``(after, version]`` (None → tip),
    discovered by existence probes instead of a directory listing. Sound
    because commits are strictly sequential (put_if_absent at tip+1) and
    expire_log only ever deletes below a surviving checkpoint — the log
    can have no interior gaps above one."""
    store = logstore.for_path(path)
    out = []
    v = after + 1
    while version is None or v <= version:
        if not store.exists(_commit_path(path, v)):
            break
        out.append(v)
        v += 1
    return out


def _checkpoint_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:0{_PAD}d}.checkpoint.json")


def _checkpoint_versions(path: str) -> list[int]:
    suffix = ".checkpoint.json"
    return sorted(
        int(f[: -len(suffix)])
        for f in logstore.for_path(path).list_dir(_log_dir(path))
        if f.endswith(suffix)
    )


def _apply_commit(live: dict, commit: dict) -> None:
    """Fold one commit record into the live-file state dict (the single
    replay step shared by the pointer-probe and listing resolution
    paths)."""
    stats = commit.get("stats", {})
    blooms = commit.get("blooms", {})
    rows = commit.get("rows", {})
    for rel in commit.get("adds", []):
        live[rel] = {
            "stats": stats.get(rel),
            "blooms": blooms.get(rel),
            "rows": rows.get(rel),
            "dvs": [],
            "base": None,
        }
    for rel in commit.get("removes", []):
        live.pop(rel, None)
    # merge-on-read deletion vectors: each mapped sidecar ACCUMULATES
    # onto its file (reads apply the union); a file's removal above
    # dropped its DV list with it (rewrites start clean).
    for rel, dv_rel in commit.get("dv_adds", {}).items():
        if rel in live:
            live[rel].setdefault("dvs", []).append(dv_rel)
    # dv_set REPLACES a file's whole DV list (possibly with []) — the
    # primitive RESTORE and CLONE need to reproduce another snapshot's
    # exact DV state: accumulate-only semantics could never shrink a
    # list back to the target version's.
    for rel, dv_list in commit.get("dv_set", {}).items():
        if rel in live:
            live[rel]["dvs"] = list(dv_list)
    # row tracking: a file's base row id rides with the file (fresh
    # files get a base from the allocating commit; re-asserted by
    # restore/clone; files carrying MATERIALIZED ids record none)
    for rel, b in commit.get("row_bases", {}).items():
        if rel in live:
            live[rel]["base"] = b


def _expired_read_error(path: str, version: int) -> "FileNotFoundError":
    """The deterministic below-horizon error (same contract as vacuum's):
    names the earliest version a reader can actually resolve — the
    earliest surviving commit that has a checkpoint anchor at or below
    it (in the healthy post-expiry state that IS the first surviving
    commit; in a crash-mid-expiry window they can diverge, and with no
    surviving checkpoint at all NO version resolves from the log alone)."""
    vs = _versions(path)
    cps = _checkpoint_versions(path)
    # checkpoint versions are themselves readable even when their commit
    # record was reclaimed (the snapshot loads straight from the
    # checkpoint with an empty replay tail), so they are floor candidates
    # alongside surviving commit records
    anchored = [v for v in sorted(set(vs) | set(cps)) if any(c <= v for c in cps)]
    if anchored:
        floor = f"earliest readable version is {anchored[0]}"
    else:
        floor = (
            "no surviving checkpoint anchors ANY version — the log alone "
            "cannot resolve this table (crash-mid-expiry window; restore "
            "the reclaimed log objects from backup)"
        )
    return FileNotFoundError(
        f"version {version} of table at {path!r} is below the expired-log "
        f"horizon (expire_log reclaimed its commit records); {floor}"
    )


def _replay(path: str, version: int | None = None) -> dict:
    """Resolve the live-file state at ``version`` (None → latest): rel path
    → {"stats": ..., "blooms": ...}. Starts from the newest checkpoint at
    or below the target and replays only the commits AFTER it — O(tail),
    not O(versions); without a checkpoint it replays the full log. The
    single resolution primitive behind visible_files/visible_stats/
    visible_blooms, so every reader benefits identically.

    Resolution never lists the log directory when the ``_last_checkpoint``
    pointer applies (pointer checkpoint + probed dense tail — the Delta
    design; see ``_LAST_CP``); a pointer that is absent, torn, above the
    requested time-travel version, or pointing at a reclaimed checkpoint
    falls back to the listing path. Versions below an ``expire_log``
    horizon fail deterministically, naming the earliest readable one."""
    ptr = _pointer_version(path)
    if ptr is not None and (version is None or ptr <= version):
        try:
            live = _load_checkpoint(path, ptr)
        except (FileNotFoundError, ValueError, KeyError):
            live = None  # stale/torn pointer → listing path
        if live is not None:
            # read-until-miss instead of exists-probe + read: halves the
            # per-tail-commit IO on the hottest path in the engine
            v = ptr + 1
            while version is None or v <= version:
                try:
                    commit = _load_commit(path, v)
                except FileNotFoundError:
                    break
                _apply_commit(live, commit)
                v += 1
            if version is not None and v <= version:
                # the tail above the pointer is dense by construction
                # (expiry reclaims only below the newest checkpoint), so
                # a missing commit here means the requested version does
                # not exist yet — same contract as the listing path
                raise ValueError(
                    f"version {version} is beyond the latest commit "
                    f"({v - 1}) of table at {path!r}"
                )
            return live
    live = {}
    start_after = 0
    cps = [v for v in _checkpoint_versions(path) if version is None or v <= version]
    if cps:
        start_after = max(cps)
        live = _load_checkpoint(path, start_after)
    vs = _versions(path)
    if start_after == 0 and vs and vs[0] > 1:
        # No checkpoint anchors this resolution and the commit sequence
        # does not start at 1: the base state below the first surviving
        # commit is unknown. A legitimate post-expiry read always has a
        # checkpoint at or below its target (expire_log only reclaims
        # strictly below the newest checkpoint), so this fires exactly on
        # (a) time travel below the retention horizon and (b) the
        # crash-mid-expiry window where a PREFIX of commits vanished
        # before their checkpoint was anchored — replaying from empty at
        # vs[0] would be a silently partial snapshot; fail loudly instead.
        raise _expired_read_error(path, version if version is not None else vs[0])
    expect = None
    for v in vs:
        if v <= start_after:
            continue
        if version is not None and v > version:
            break
        # Density check: the log is contiguous above any surviving
        # checkpoint by construction; a hole means a crashed/concurrent
        # expire_log reclaimed records this resolution needs — fail
        # loudly (stale-but-plausible snapshots are silent corruption).
        if expect is None:
            if start_after and v != start_after + 1:
                raise _expired_read_error(path, version if version is not None else v)
            if not start_after and version is not None and v > version:
                break
        elif v != expect:
            raise _expired_read_error(path, version if version is not None else v)
        expect = v + 1
        _apply_commit(live, _load_commit(path, v))
    if version is not None and version > start_after:
        # Completeness check for ANCHORED reads: the loop must have
        # applied the dense run start_after+1..version. A crash-mid-
        # expiry can reclaim commits ABOVE an older surviving checkpoint
        # (commits delete ascending toward a NEWER horizon, checkpoints
        # only after) — without this, read(version=12) over checkpoints
        # {10, 20} with commits 11..12 reclaimed would return the
        # checkpoint-10 state silently labeled as version 12.
        applied_through = (expect - 1) if expect is not None else start_after
        if applied_through != version:
            if vs and version > vs[-1]:
                raise ValueError(
                    f"version {version} is beyond the latest commit "
                    f"({vs[-1]}) of table at {path!r}"
                )
            raise _expired_read_error(path, version)
    return live


# Past this many live files a checkpoint spills from one JSON blob to
# multi-part parquet (the Delta multi-part checkpoint design): a single
# driver-parsed JSON of every live file is THE log-resolution bottleneck
# at millions of files, while parquet parts are columnar, compressed,
# individually bounded, and readable as a table (checkpoint_as_dataframe).
_CHECKPOINT_MULTIPART_MIN_FILES = 20_000
_CHECKPOINT_PART_ENTRIES = 10_000


def _checkpoint_part_path(path: str, version: int, n: int, k: int) -> str:
    return os.path.join(
        _log_dir(path), f"{version:0{_PAD}d}.checkpoint.{n:04d}.{k:04d}.parquet"
    )


def _checkpoint_part_tables(live: dict):
    """Chunk the live-state dict into pyarrow tables of
    ``_CHECKPOINT_PART_ENTRIES`` rows. Stats/blooms ride as JSON strings
    per entry — exactly Delta's checkpoint convention (its ``stats``
    column is a JSON string inside the parquet)."""
    import pyarrow as pa

    rels = sorted(live)
    for i in range(0, len(rels), _CHECKPOINT_PART_ENTRIES):
        chunk = rels[i : i + _CHECKPOINT_PART_ENTRIES]
        yield pa.table(
            {
                "rel": chunk,
                "stats": [
                    json.dumps(live[r]["stats"]) if live[r].get("stats") else None
                    for r in chunk
                ],
                "blooms": [
                    json.dumps(live[r]["blooms"]) if live[r].get("blooms") else None
                    for r in chunk
                ],
                "rows": pa.array(
                    [live[r].get("rows") for r in chunk], type=pa.int64()
                ),
                "dvs": pa.array(
                    [list(live[r].get("dvs") or []) for r in chunk],
                    type=pa.list_(pa.string()),
                ),
                "base": pa.array(
                    [live[r].get("base") for r in chunk], type=pa.int64()
                ),
            }
        )


def _load_checkpoint(path: str, version: int) -> dict:
    """Resolve a checkpoint's live-state dict: inline JSON for small
    tables, else the marker names its parquet part count and the parts
    are read columnar (never one giant JSON parse)."""
    store = logstore.for_path(path)
    cp = json.loads(store.read_text(_checkpoint_path(path, version)))
    if "parts" not in cp:
        return {
            rel: {
                "stats": e.get("stats"),
                "blooms": e.get("blooms"),
                "rows": e.get("rows"),
                "dvs": list(e.get("dvs") or []),
                "base": e.get("base"),
            }
            for rel, e in cp["files"].items()
        }
    import io as _io

    import pyarrow.parquet as _pq

    k = cp["parts"]
    live: dict[str, dict] = {}
    for n in range(1, k + 1):
        buf = store.read_bytes(_checkpoint_part_path(path, version, n, k))
        t = _pq.read_table(_io.BytesIO(buf))
        cols = {c: t.column(c).to_pylist() for c in t.column_names}
        # ONE json.loads per column per part, not one per entry: the
        # strings join into a JSON array and parse at C speed — per-entry
        # loads() measured 2× slower than the legacy single-blob parse at
        # 100k files; this form beats it.
        stats = json.loads("[%s]" % ",".join(s or "null" for s in cols["stats"]))
        blooms = json.loads("[%s]" % ",".join(s or "null" for s in cols["blooms"]))
        for i, rel in enumerate(cols["rel"]):
            live[rel] = {
                "stats": stats[i],
                "blooms": blooms[i],
                "rows": cols["rows"][i],
                "dvs": list(cols["dvs"][i] or []),
                "base": cols["base"][i],
            }
    return live


def _maybe_checkpoint(path: str, version: int) -> None:
    """Every ``_CHECKPOINT_EVERY`` commits, consolidate the live state.
    Small tables land one ``<v>.checkpoint.json`` (O_EXCL — a racing
    duplicate writer loses harmlessly: the content is a deterministic
    function of the log). Past ``_CHECKPOINT_MULTIPART_MIN_FILES`` live
    files the state spills to ``<v>.checkpoint.<n>.<k>.parquet`` parts
    with the JSON reduced to a completion MARKER naming the part count —
    parts land first, the marker last, so a writer dying mid-checkpoint
    leaves no visible (torn) checkpoint, only orphan parts a later
    writer overwrites with identical content. Commit files are never
    deleted, so time travel below the checkpoint still replays the
    original log."""
    if version % _CHECKPOINT_EVERY != 0:
        return
    _write_checkpoint(path, version)


def checkpoint_now(path: str) -> int:
    """Force a checkpoint at the CURRENT tip regardless of the cadence —
    the operational lever under :func:`expire_log`: the retention horizon
    can only ever be a checkpoint, so a table with a long un-checkpointed
    tail (or one whose cadence-aligned checkpoints all sit inside the
    retention window) cannot expire until one lands. Idempotent: an
    existing checkpoint at the tip is reused. Returns the checkpointed
    version (0 on an empty log). Racing writers produce identical
    deterministic content — safe, like every checkpoint write."""
    v = current_version(path)
    if v == 0:
        return 0
    if logstore.for_path(path).exists(_checkpoint_path(path, v)):
        return v
    _write_checkpoint(path, v)
    return v


def _write_checkpoint(path: str, version: int) -> None:
    store = logstore.for_path(path)
    live = _replay(path, version)
    # Fold the commit-meta state in too (the Delta checkpoints-carry-
    # metadata design): latest_meta otherwise walks commit JSONs
    # newest-first until a commit records the key — O(versions) on a
    # table whose recent commits are all mutations that re-record no
    # schema/mapping. With meta_latest in the marker, resolution is
    # O(tail) like the file list. Folding starts from the previous
    # checkpoint's fold when one exists (same O(tail) write cost).
    meta_latest: dict = {}
    prior = [v for v in _checkpoint_versions(path) if v < version]
    start_after = 0
    if prior:
        start_after = max(prior)
        cp = json.loads(store.read_text(_checkpoint_path(path, start_after)))
        meta_latest = dict(cp.get("meta_latest") or {})
        if "meta_latest" not in cp:
            start_after = 0  # legacy checkpoint: fold the whole log once
            meta_latest = {}
    for v in _versions(path):
        if v <= start_after or v > version:
            continue
        meta_latest.update(_load_commit(path, v).get("meta", {}))
    if len(live) < _CHECKPOINT_MULTIPART_MIN_FILES:
        payload = json.dumps(
            {"version": version, "files": live, "meta_latest": meta_latest}
        )
        # put_atomic: a writer dying mid-write must never leave a TORN
        # checkpoint (readers would fail on json.load forever). Racing
        # writers produce identical content (the state is a deterministic
        # function of the log), so last-writer-wins is safe.
        store.put_atomic(_checkpoint_path(path, version), payload)
        _advance_pointer(store, path, version)
        return
    import pyarrow.parquet as _pq

    parts = list(_checkpoint_part_tables(live))
    k = len(parts)
    for n, table in enumerate(parts, start=1):
        import io as _io

        buf = _io.BytesIO()
        _pq.write_table(table, buf, compression="zstd")
        store.put_atomic_bytes(
            _checkpoint_part_path(path, version, n, k), buf.getvalue()
        )
    store.put_atomic(
        _checkpoint_path(path, version),
        json.dumps(
            {
                "version": version,
                "parts": k,
                "n_files": len(live),
                "meta_latest": meta_latest,
            }
        ),
    )
    _advance_pointer(store, path, version)


def _advance_pointer(store, path: str, version: int) -> None:
    """Refresh ``_last_checkpoint`` to ``version`` — monotonically: two
    checkpoint writers racing at different versions must never regress
    the pointer (a regressed pointer is only slower, but the check is one
    tiny read). Written AFTER the checkpoint marker, so a pointer can
    only ever name a complete checkpoint; last-writer-wins atomicity via
    put_atomic."""
    cur = _pointer_version(path)
    if cur is not None and cur >= version:
        return
    store.put_atomic(_last_checkpoint_path(path), json.dumps({"version": version}))


def checkpoint_as_dataframe(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """The newest checkpoint at or below ``version``, AS A TABLE — one row
    per live data file (rel, stats/blooms JSON, rows, dvs, base) — the
    Delta "checkpoint readable as parquet" property. Multi-part
    checkpoints are a plain distributed parquet scan of the parts (the
    driver never holds the file list); JSON checkpoints are reconstructed
    into the identical schema. Raises when no checkpoint exists yet."""
    cps = [v for v in _checkpoint_versions(path) if version is None or v <= version]
    if not cps:
        raise FileNotFoundError(f"no checkpoint at or below {version} in {path!r}")
    cp_v = max(cps)
    cp = json.loads(logstore.for_path(path).read_text(_checkpoint_path(path, cp_v)))
    ddl = (
        "rel string, stats string, blooms string, rows bigint, "
        "dvs array<string>, base bigint"
    )
    if "parts" in cp:
        k = cp["parts"]
        return spark.read.schema(ddl).parquet(
            *[_checkpoint_part_path(path, cp_v, n, k) for n in range(1, k + 1)]
        )
    rows = [
        (
            rel,
            json.dumps(e["stats"]) if e.get("stats") else None,
            json.dumps(e["blooms"]) if e.get("blooms") else None,
            e.get("rows"),
            list(e.get("dvs") or []),
            e.get("base"),
        )
        for rel, e in sorted(cp["files"].items())
    ]
    return spark.createDataFrame(rows, ddl)


def current_version(path: str) -> int:
    """Latest committed version (0 = table absent/empty log). Pointer-
    accelerated: with a valid ``_last_checkpoint`` the tip resolves by
    probing the dense tail above the pointed version — O(tail) existence
    checks, no log-directory listing (see ``_LAST_CP``)."""
    ptr = _pointer_version(path)
    if ptr is not None and logstore.for_path(path).exists(_commit_path(path, ptr)):
        tail = _probe_tail(path, ptr, None)
        return tail[-1] if tail else ptr
    vs = _versions(path)
    return vs[-1] if vs else 0


def visible_files(path: str, version: int | None = None) -> list[str]:
    """Resolve the snapshot's data-file list from the log (absolute paths).
    ``version=None`` → latest. Checkpoint-accelerated: replays only the
    commits after the newest checkpoint at or below the target."""
    return [os.path.join(path, rel) for rel in sorted(_replay(path, version))]


def _read_data(
    spark: SparkSession,
    path: str,
    files: list[str],
    merge_schema: bool = False,
    version: int | None = None,
    type_overrides: dict | None = None,
):
    """Scan an explicit list of the table's data files — the ONE way any
    txlog code touches data bytes. Partitioned appends keep every column
    INLINE in the data files and encode the layout in ``__part_<col>=v``
    directory segments (see _write_data_files), so a plain file-list
    read is always complete: no basePath, no partition reconstruction,
    no mixed-layout hazard when partitioned and unpartitioned file
    groups coexist in one snapshot (rewrites land unpartitioned).

    When the log records a schema (every modern commit does), the scan
    uses it EXPLICITLY — translated to physical names at ``version``,
    plus the reserved ``__row_id`` column on row-tracking tables — the
    Delta "schema from the log, never the footers" contract. That makes
    mixed-schema snapshots deterministic (a file-pruned MERGE/UPDATE
    leaves old-schema files live next to evolved ones; files missing a
    column read NULL, retired physical columns never leak in) and costs
    ZERO footer reads at plan time regardless of ``merge_schema``. The
    footer path survives only for tables that predate logged schemas."""
    schema = latest_meta(path, "schema", version)
    if schema:
        if type_overrides:
            # widening-aware cross-epoch scans (_snapshot_diff): a file
            # list spanning a type widening may carry physical pages
            # WIDER than this version's logical type — scan at the
            # covering (wider) type so nothing downcasts or fails
            schema = {c: type_overrides.get(c, t) for c, t in schema.items()}
        mapping = _column_mapping(path, version)
        parts = [f"`{mapping.get(c, c)}` {t}" for c, t in schema.items()]
        tracking = row_tracking_enabled(path, version)
        if tracking:
            parts.append(f"`{_ROWID}` bigint")
        reader_schema = ", ".join(parts)
        # initial column defaults (Iceberg v3): files that PREDATE a
        # defaulted column render the default, not NULL — split the file
        # list into groups by which defaulted columns each file predates
        # and union the group scans (pruning/pushdown stay per-group;
        # tables without initial defaults take the single-scan path with
        # zero extra work beyond one meta lookup)
        cds = latest_meta(path, "column_defaults", version) or {}
        init = {
            c: d
            for c, d in cds.items()
            if d.get("initial") is not None and c in schema
        }
        if init and files:
            groups = _default_file_groups(path, files, init, mapping)
            if any(groups):
                dfs = []
                for predated, fl in groups.items():
                    g = spark.read.schema(reader_schema).parquet(*fl)
                    if predated:
                        # the STORED evaluated value is authoritative
                        # (Iceberg semantics: the default is evaluated
                        # once at declaration) — batch, stream, and CDF
                        # render bit-identical backfill
                        sel = [
                            (
                                F.lit(init[c]["initial_value"])
                                .cast(t)
                                .alias(mapping.get(c, c))
                                if c in predated
                                else F.col(f"`{mapping.get(c, c)}`")
                            )
                            for c, t in schema.items()
                        ]
                        if tracking:
                            sel.append(F.col(f"`{_ROWID}`"))
                        g = g.select(*sel)
                    dfs.append(g)
                out = dfs[0]
                for g in dfs[1:]:
                    out = out.unionByName(g)
                return out
        return spark.read.schema(reader_schema).parquet(*files)
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*files)


def _write_data_files(df: DataFrame, path: str, partition_by=None) -> list[str]:
    """Land a new immutable data-file group; return table-relative paths.
    Nothing is visible until a commit references these files."""
    group = os.path.join(_DATA_DIR, uuid.uuid4().hex)
    target = os.path.join(path, group)
    out = df
    if partition_by:
        # partition on PREFIXED DUPLICATES so the real columns stay inline
        # in every data file: Spark's partitionBy drops the partition
        # column from the files, and a snapshot mixing dir-encoded and
        # inline layouts (any rewrite lands unpartitioned) cannot be read
        # in one scan (CONFLICTING_DIRECTORY_STRUCTURES). The __part_*
        # dirs exist for humans, external tools, and _partition_stats.
        out = df.select(
            "*", *[F.col(c).alias(f"__part_{c}") for c in partition_by]
        )
    w = out.write.mode("error")
    if partition_by:
        w = w.partitionBy(*[f"__part_{c}" for c in partition_by])
    w.parquet(target)
    rels = []
    for root, _, files in os.walk(target):
        for f in files:
            if f.endswith(".parquet"):
                rels.append(os.path.relpath(os.path.join(root, f), path))
    return sorted(rels)


def _write_change_files(df: DataFrame, path: str) -> list[str]:
    """Land a CHANGE-DATA file group (the Delta ``_change_data`` design):
    the row-level pre/post images a rewrite commit produced, with a
    ``_change_type`` column inline, in PHYSICAL column names. Referenced
    by the commit's ``change_data`` key; read only by CDC (never part of
    any snapshot), reclaimed by vacuum with its commit's retention. Cost
    is proportional to the CHANGED rows — this is what lets
    ``table_changes`` and the streaming CDF answer rewrite commits
    without the cross-file diff no per-partition reader can do."""
    group = os.path.join(_CDC_DIR, uuid.uuid4().hex)
    target = os.path.join(path, group)
    df.write.mode("error").parquet(target)
    rels = []
    for root, _, files in os.walk(target):
        for f in files:
            if f.endswith(".parquet"):
                rels.append(os.path.relpath(os.path.join(root, f), path))
    return sorted(rels)


def _canon_stat(x, is_min: bool):
    """JSON-safe, order-preserving canonical form for a parquet stat value.

    datetime/date serialize to fixed-width ISO strings (lexicographic order ==
    chronological order at constant precision); Decimal converts to float
    widened OUTWARD (min rounds down, max rounds up) so float rounding can
    only ever keep an extra file, never false-skip one. Probe bounds pass
    through :func:`_canon_bound` so both sides compare in the same domain."""
    import decimal
    import math

    if isinstance(x, _dt.datetime):
        return _canon_ts(x)
    if isinstance(x, _dt.date):
        return x.isoformat()
    if isinstance(x, decimal.Decimal):
        f = float(x)
        return math.nextafter(f, -math.inf) if is_min else math.nextafter(f, math.inf)
    return x


def _canon_ts(x: "_dt.datetime") -> str:
    """Fixed-width ISO form in naive UTC: tz-aware values (pyarrow returns
    these for parquet TIMESTAMP_MICROS with isAdjustedToUTC) convert to UTC
    and drop the offset; naive values are taken AS UTC (the session timezone
    — session.py pins ``spark.sql.session.timeZone=UTC``). Constant width ⇒
    lexicographic order == chronological order on both sides."""
    if x.tzinfo is not None:
        x = x.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return x.isoformat(sep=" ", timespec="microseconds")


def _canon_bound(x):
    """Canonicalize a caller-supplied prune bound to the stats domain of
    :func:`_canon_stat` (plain float for Decimal — the file ranges were
    already widened outward, so no rounding here can false-skip)."""
    import decimal

    if isinstance(x, _dt.datetime):
        return _canon_ts(x)
    if isinstance(x, _dt.date):
        return x.isoformat()
    if isinstance(x, decimal.Decimal):
        return float(x)
    return x


_DATE10 = None  # compiled lazily


def _unify_stat_strs(a, b):
    """Date stats serialize as 10-char ``YYYY-MM-DD``; timestamps as
    26-char ``YYYY-MM-DD HH:MM:SS.ffffff``. When a bound and a stat mix
    the two widths, pad the date form to midnight — exactly Spark's
    date→timestamp cast — so the lexicographic skip decision agrees with
    the residual filter (a bare mixed-width compare would false-skip a
    file whose timestamp min is midnight of a date hi bound)."""
    global _DATE10
    if isinstance(a, str) and isinstance(b, str) and len(a) != len(b):
        if _DATE10 is None:
            import re

            _DATE10 = re.compile(r"\d{4}-\d{2}-\d{2}")
        if len(a) == 10 and len(b) == 26 and _DATE10.fullmatch(a):
            a = a + " 00:00:00.000000"
        elif len(b) == 10 and len(a) == 26 and _DATE10.fullmatch(b):
            b = b + " 00:00:00.000000"
        # Second-precision timestamp strings (19 chars) appear in commits
        # written before partition stats parsed timestamp dtypes; pad to
        # the canonical microsecond width so legacy stats keep comparing
        # correctly against canonicalized bounds.
        elif len(a) == 19 and len(b) == 26 and _DATE10.match(a):
            a = a + ".000000"
        elif len(b) == 19 and len(a) == 26 and _DATE10.match(b):
            b = b + ".000000"
    return a, b


def _range_excludes(rng, c_lo, c_hi) -> bool:
    """True iff a file's logged [min, max] provably cannot intersect the
    canonicalized [c_lo, c_hi] — the ONE skip decision every pruned read
    and pruned rewrite shares."""
    if rng is None:
        return False
    fmin, fmax = rng[0], rng[1]  # entry may carry [min, max, null_count]
    if c_hi is not None:
        a, b = _unify_stat_strs(fmin, c_hi)
        if a > b:
            return True
    if c_lo is not None:
        a, b = _unify_stat_strs(fmax, c_lo)
        if a < b:
            return True
    return False


def _decode_decimal_raw(raw, scale: int):
    """Unscaled parquet decimal stat → ``decimal.Decimal``."""
    import decimal

    unscaled = (
        int.from_bytes(raw, "big", signed=True) if isinstance(raw, bytes) else int(raw)
    )
    return decimal.Decimal(unscaled).scaleb(-scale)


def _file_minmax(abs_path: str, cols: list[str]) -> dict[str, list]:
    """Per-file min/max for ``cols`` from the parquet footer's row-group
    statistics (no data pages read). A column missing stats in ANY row
    group is omitted — absence means "cannot prune", never "no rows".
    Byte stats (parquet physical strings) decode to str; temporal/decimal
    stats canonicalize via :func:`_canon_stat` so the commit stays JSON.
    Each entry is ``[min, max, null_count]`` (null_count None when any row
    group omits it) — the third element feeds ``read_pruned_nulls``."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    nulls: dict[str, object] = {}
    seen: dict[str, int] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for i in range(g.num_columns):
            c = g.column(i)
            name = c.path_in_schema
            if name not in cols:
                continue
            st = c.statistics
            if st is None or not st.has_min_max:
                continue
            if st.has_null_count and nulls.get(name, 0) is not None:
                nulls[name] = nulls.get(name, 0) + st.null_count
            else:
                nulls[name] = None  # any gap poisons the count — unknown
            try:
                lo, hi = st.min, st.max
            except Exception:
                # pyarrow can't cast decimal stats; decode the raw scaled
                # integer (int32/int64, or big-endian two's-complement bytes
                # for FIXED_LEN_BYTE_ARRAY) ourselves. Anything else stays
                # conservative: no stats ⇒ the file is never skipped.
                lt = st.logical_type
                if lt is None or getattr(lt, "type", None) != "DECIMAL":
                    continue
                scale = json.loads(lt.to_json())["scale"]
                lo = _decode_decimal_raw(st.min_raw, scale)
                hi = _decode_decimal_raw(st.max_raw, scale)
            if isinstance(lo, bytes):
                lo, hi = lo.decode("utf-8", "replace"), hi.decode("utf-8", "replace")
            seen[name] = seen.get(name, 0) + 1
            if name not in mins or lo < mins[name]:
                mins[name] = lo
            if name not in maxs or hi > maxs[name]:
                maxs[name] = hi
    return {
        c: [_canon_stat(mins[c], True), _canon_stat(maxs[c], False), nulls.get(c)]
        for c in cols
        if seen.get(c, 0) == md.num_row_groups and md.num_row_groups > 0
    }


def _collect_stats(
    path: str, rels: list[str], stats_cols: list[str] | None
) -> dict[str, dict[str, list]]:
    if not stats_cols:
        return {}
    out = {}
    for rel in rels:
        s = _file_minmax(os.path.join(path, rel), stats_cols)
        if s:
            out[rel] = s
    return out


def _partition_stats(
    path: str, rels: list[str], phys_types: dict[str, str]
) -> dict[str, dict[str, list]]:
    """Per-file [min, max, null_count] stats derived from hive-style
    ``key=value`` directory segments of partitioned-append file paths —
    a partition column is CONSTANT per file, so its stats are exact
    (min == max == the value) and the generic stats-pruning ladder gets
    partition pruning with zero extra machinery. Values parse back
    through the LOGGED type (directory names are URL-escaped strings);
    the null partition (__HIVE_DEFAULT_PARTITION__) records no range —
    conservative keep, with read_pruned_nulls unaffected (no claim
    beats a wrong claim)."""
    import datetime as _date_mod
    from decimal import Decimal as _Dec
    from urllib.parse import unquote

    def _typed(v: str, dtype: str):
        if dtype in ("tinyint", "smallint", "int", "bigint"):
            return int(v)
        if dtype in ("float", "double"):
            return float(v)
        if dtype.startswith("decimal"):
            return _Dec(v)
        if dtype == "date":
            return _date_mod.date.fromisoformat(v)
        if dtype in ("timestamp", "timestamp_ntz"):
            # Directory values render in session time (pinned UTC) at
            # whatever precision Spark wrote; parse to datetime so
            # _canon_stat emits the same 26-char microsecond form
            # _canon_bound uses for probe bounds. A raw 19-char string
            # lexicographically mis-compares against that and false-skips
            # the partition whose value equals the lo bound.
            return _date_mod.datetime.fromisoformat(v)
        if dtype == "boolean":
            return v == "true"
        if dtype in ("string", "varchar", "char") or dtype.startswith(
            ("varchar(", "char(")
        ):
            return v
        # Unrecognized dtype: record NO range for this column (the except
        # clause below turns this into a conservative keep) — a raw-string
        # stat in a non-string domain can only produce wrong skips.
        raise ValueError(f"unprunable partition dtype: {dtype}")

    out: dict[str, dict[str, list]] = {}
    for rel in rels:
        cols: dict[str, list] = {}
        for seg in rel.split(os.sep)[:-1]:
            if "=" not in seg:
                continue
            k, _, raw = seg.partition("=")
            k = unquote(k)
            if not k.startswith("__part_"):
                continue
            k = k[len("__part_"):]
            if k not in phys_types:
                continue
            if raw == "__HIVE_DEFAULT_PARTITION__":
                continue
            try:
                v = _typed(unquote(raw), phys_types[k])
            except (ValueError, ArithmeticError):
                continue
            cols[k] = [_canon_stat(v, True), _canon_stat(v, False), 0]
        if cols:
            out[rel] = cols
    return out


_BLOOM_MIN_BITS = 8 * 1024  # floor: 1 KiB per (file, column)
_BLOOM_BITS_PER_VALUE = 10  # ~1% FPR at k=7 — sized to the DATA, not fixed
_BLOOM_HASHES = 7


def _bloom_n_bits(n_values: int) -> int:
    """Power-of-two bloom size ≥ 10 bits/value: a FIXED size saturates as
    files grow (8 Kib at 3,750 keys ≈ 75% false-keep — no skipping at all);
    scaling with the value count holds ~1% FPR at any file size. The size
    is recovered at probe time from the stored filter's own length, so
    every file can carry a different size and old commits stay readable."""
    import math

    need = max(_BLOOM_MIN_BITS, _BLOOM_BITS_PER_VALUE * max(n_values, 1))
    return 1 << math.ceil(math.log2(need))


def _bloom_positions(values, n_bits: int, seed_base: int = 0x9E3779B9):
    """k bit positions per value via double hashing over xxhash64-style
    mixing (numpy-vectorized)."""
    import numpy as np

    v = np.asarray(values, dtype=np.uint64)
    h1 = v * np.uint64(0xFF51AFD7ED558CCD)
    h1 ^= h1 >> np.uint64(33)
    h2 = v * np.uint64(seed_base) + np.uint64(1)
    h2 ^= h2 >> np.uint64(29)
    return [
        ((h1 + np.uint64(i) * h2) % np.uint64(n_bits)).astype(np.int64)
        for i in range(_BLOOM_HASHES)
    ]


#: Spark simpleString type names bloom_cols accepts. Hashing is value-
#: REPRESENTATION-sensitive (write side hashes pyarrow to_pylist values, the
#: probe hashes the caller's Python value), so only types whose Python form is
#: unambiguous on both sides are allowed — a double column would hash 5.0 as
#: '5.0' at write but an int probe 5 by its bits, silently false-skipping.
_BLOOM_OK_TYPES = {"tinyint", "smallint", "int", "bigint", "string", "boolean"}


def _check_bloom_cols(
    df: DataFrame, bloom_cols: list[str] | None, path: str | None = None
) -> None:
    if not bloom_cols:
        return
    types = dict(df.dtypes)
    if path is not None:
        # validate against the LOGGED type where one exists: after a
        # chain-leaving widen (int→double) a narrow producer's frame is
        # still int, but probes against the now-double LOGICAL column
        # hash the repr — a bloom built from this frame would false-skip
        logged = latest_meta(path, "schema") or {}
        types = {c: logged.get(c, t) for c, t in types.items()}
    bad = {c: types[c] for c in bloom_cols if types.get(c) not in _BLOOM_OK_TYPES}
    if bad:
        raise TypeError(
            f"bloom_cols supports integer/string/boolean columns only "
            f"(value hashing is representation-sensitive; the TABLE's "
            f"logged type is the contract); got {bad}. Use stats_cols "
            f"for range-prunable float/decimal/temporal columns."
        )


def _hash_values(col_values) -> "object":
    """Map a column's python values to uint64 for the bloom: ints use their
    two's-complement bits; everything else hashes its UTF-8 repr. Probe
    values normalize the same way (bool→0/1, int/np.integer→bits), and
    :func:`_check_bloom_cols` rejects column types whose write-side pylist
    form could diverge from a caller's probe value."""
    import numpy as np

    out = np.empty(len(col_values), dtype=np.uint64)
    for i, x in enumerate(col_values):
        if isinstance(x, bool) or x is None:
            out[i] = np.uint64(1 if x else 0)
        elif isinstance(x, (int, np.integer)):
            out[i] = np.uint64(int(x) & 0xFFFFFFFFFFFFFFFF)
        else:
            import hashlib

            out[i] = np.uint64(
                int.from_bytes(
                    hashlib.blake2b(str(x).encode(), digest_size=8).digest(), "big"
                )
            )
    return out


def _file_bloom(abs_path: str, col: str) -> str:
    """Base64 bloom filter of a column's values in one data file (reads only
    that column)."""
    import base64

    import numpy as np
    import pyarrow.parquet as pq

    vals = pq.read_table(abs_path, columns=[col]).column(col).to_pylist()
    hashed = _hash_values(vals) if vals else None
    # size on DISTINCT values (post-hash unique), not raw rows: a 10M-row
    # file with 1k distinct keys needs KiB, not a multi-MiB blob re-embedded
    # into every checkpoint
    n_distinct = int(np.unique(hashed).size) if vals else 0
    bits = np.zeros(_bloom_n_bits(n_distinct), dtype=bool)
    if vals:
        for pos in _bloom_positions(hashed, bits.size):
            bits[pos] = True
    return base64.b64encode(np.packbits(bits).tobytes()).decode()


def _bloom_may_contain(b64: str, value) -> bool:
    import base64

    import numpy as np

    bits = np.unpackbits(np.frombuffer(base64.b64decode(b64), dtype=np.uint8))
    # the filter's own (power-of-two, byte-aligned) length IS its bit count
    for pos in _bloom_positions(_hash_values([value]), bits.size):
        if not bits[pos[0]]:
            return False
    return True


def _collect_blooms(
    path: str, rels: list[str], bloom_cols: list[str] | None
) -> dict[str, dict[str, str]]:
    if not bloom_cols:
        return {}
    out: dict[str, dict[str, str]] = {}
    for rel in rels:
        entry = {
            c: _file_bloom(os.path.join(path, rel), c) for c in bloom_cols
        }
        if entry:
            out[rel] = entry
    return out


def _file_rows(abs_path: str) -> int:
    """Exact row count from the parquet footer (no data pages read)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(abs_path).metadata.num_rows


def _try_commit(
    path: str,
    version: int,
    adds: list[str],
    removes: list[str],
    stats: dict[str, dict[str, list]] | None = None,
    blooms: dict[str, dict[str, str]] | None = None,
    meta: dict | None = None,
    dv_adds: dict[str, str] | None = None,
    dv_set: dict[str, list[str]] | None = None,
    change_data: list[str] | None = None,
    row_bases: dict[str, int] | None = None,
) -> None:
    commit = {
        "version": version,
        "adds": adds,
        "removes": removes,
        # Commit wall-clock (UTC ISO) — the timestampAsOf resolution key.
        # Older commits without one fall back to the commit file's mtime,
        # the same source of truth Delta uses.
        "ts": _dt.datetime.now(_dt.timezone.utc).isoformat(),
    }
    if adds:
        # every commit records its added files' exact row counts (one footer
        # read each — the files were just written, their pages are hot), so
        # COUNT(*) resolves from the log alone at any table size: fast_count
        commit["rows"] = {rel: _file_rows(os.path.join(path, rel)) for rel in adds}
    if stats:
        commit["stats"] = stats
    if blooms:
        commit["blooms"] = blooms
    if meta:
        commit["meta"] = meta
    if dv_adds:
        commit["dv_adds"] = dv_adds
    if dv_set:
        commit["dv_set"] = dv_set
    if change_data is not None:
        # the commit's row-level change record (may be an empty list: "this
        # commit provably changed no rows" — distinct from ABSENT, which
        # means "no record; CDC must diff snapshots or refuse")
        commit["change_data"] = change_data
    if row_bases:
        commit["row_bases"] = row_bases
    payload = json.dumps(commit)
    # The LogStore seam IS the commit: put_if_absent's mutual exclusion
    # (O_EXCL locally; conditional put on an object store) decides which
    # of two racing writers owns this version.
    try:
        logstore.for_path(path).put_if_absent(_commit_path(path, version), payload)
    except FileExistsError as e:
        raise CommitConflict(f"version {version} already committed") from e
    _maybe_checkpoint(path, version)


# Widening lattice (the Delta type-widening GA rules): moves where every
# value of the source type is exactly representable in the target, so the
# parquet reader renders narrower physical pages at the wider type natively
# under an explicit scan schema — neither history nor new narrow appends
# ever need a rewrite. Spark 4's vectorized reader supports the whole
# lattice (it was built for exactly this feature).
_INT_CHAIN = ["tinyint", "smallint", "int", "bigint"]
#: max base-10 digits an integer type needs in a decimal's integral part
#: (Delta's own requirements: byte→dec(3+,·), short→5, int→10, long→20)
_INT_DIGITS = {"tinyint": 3, "smallint": 5, "int": 10, "bigint": 20}
_DECIMAL_RE = re.compile(r"^decimal\((\d+),\s*(\d+)\)$")


def _widens_to(frm: str, to: str) -> bool:
    """True iff ``frm`` → ``to`` is a strict, lossless widening:
    tinyint→smallint→int→bigint; float→double; tinyint/smallint/int→double;
    any integer→decimal with enough integral digits; decimal→decimal when
    the integral part and the scale both grow-or-hold (and something
    grows). Everything else — narrowing, cross-family, float→decimal —
    is not metadata-only safe."""
    if frm in _INT_CHAIN and to in _INT_CHAIN:
        return _INT_CHAIN.index(frm) < _INT_CHAIN.index(to)
    if frm == "float" and to == "double":
        return True
    if frm in ("tinyint", "smallint", "int") and to == "double":
        # every int32 is exact in a float64 (53-bit mantissa); bigint is
        # NOT (precision loss above 2^53), matching Delta's rule
        return True
    m_to = _DECIMAL_RE.match(to or "")
    if m_to:
        p2, s2 = int(m_to.group(1)), int(m_to.group(2))
        if frm in _INT_CHAIN:
            return p2 - s2 >= _INT_DIGITS[frm]
        m_frm = _DECIMAL_RE.match(frm or "")
        if m_frm:
            p1, s1 = int(m_frm.group(1)), int(m_frm.group(2))
            return (
                (p2, s2) != (p1, s1)
                and s2 >= s1
                and p2 - s2 >= p1 - s1
            )
    return False


def _validate_append_schema(
    path: str, df: DataFrame, merge_schema: bool, system_cols=frozenset()
) -> dict[str, str]:
    """Writer-side schema enforcement (the Delta contract): compare the
    incoming frame against the schema recorded in the log and return the
    schema dict this commit should record.

    - A TYPE CHANGE on an existing column is always rejected — two files
      disagreeing on a column's type poison every later read, and no read
      option repairs it.
    - ADDED columns require an explicit ``merge_schema=True`` (additive
      evolution is legal but must be opted into, exactly like Delta's
      ``mergeSchema`` write option) — a typo'd column name must fail
      loudly, not fork the schema silently.
    - MISSING columns are always fine (the rows read NULL there) — this is
      what makes additive evolution race-safe: a writer validated against
      the old schema keeps working after a concurrent evolution append,
      instead of suddenly "missing" the new column.

    Tables created before schemas were logged have no entry — enforcement
    starts at their next schema-recording commit (backward compatible)."""
    logged = latest_meta(path, "schema")
    cur = dict(df.dtypes)
    if logged is None:
        return cur
    conflicts = {}
    widened = {}
    for c in cur:
        if c in logged and logged[c] != cur[c]:
            if _widens_to(cur[c], logged[c]):
                # the incoming frame is NARROWER on a widening chain (the
                # table was widened after this producer's schema froze —
                # the steady state of every CDC source feeding a widened
                # table): legal. Files land at the narrow physical type
                # and the commit keeps recording the logged WIDE type —
                # the explicit-schema scan upcasts narrow pages natively,
                # exactly as it does for pre-widen history.
                widened[c] = logged[c]
            else:
                conflicts[c] = (logged[c], cur[c])
    if conflicts:
        raise TypeError(
            f"append schema conflicts with the table schema (column: "
            f"(table type, append type)): {conflicts}; only widening "
            f"upcasts are metadata-safe — see widen_column_type"
        )
    added = set(cur) - set(logged) - set(system_cols)
    if added and not merge_schema:
        raise ValueError(
            f"append schema adds columns the table does not have "
            f"({sorted(added)}); pass merge_schema=True to evolve the "
            f"schema additively"
        )
    return {**logged, **cur, **widened}


# ---------------------------------------------------------------------------
# Protocol feature gating (the Delta reader/writer-features contract): the
# first commit that makes a table depend on a capability older readers lack
# (deletion vectors, column mapping) records it in a ``protocol`` meta; every
# read path checks the table's required reader features against what this
# build understands and REFUSES with the feature named rather than silently
# mis-reading (a DV-unaware reader would resurrect deleted rows; a
# mapping-unaware one would mis-name columns). Version-resolved: time travel
# below a feature's introduction needs nothing.
# ---------------------------------------------------------------------------

_READER_FEATURES = {
    "deletion-vectors",
    "column-mapping",
    "log-retention",
    "type-widening",
    "column-defaults",
}


def table_protocol(path: str, version: int | None = None) -> dict:
    """The table's protocol declaration at ``version`` (``{}`` for tables
    that never used a gated feature)."""
    return latest_meta(path, "protocol", version) or {}


def _check_reader(path: str, version: int | None = None) -> None:
    required = set(table_protocol(path, version).get("reader_features", []))
    unknown = required - _READER_FEATURES
    if unknown:
        raise ValueError(
            f"table at {path!r} requires reader feature(s) this build does "
            f"not support: {sorted(unknown)} (supported: "
            f"{sorted(_READER_FEATURES)})"
        )


def _with_feature(path: str, meta: dict, feature: str) -> dict:
    """Fold ``feature`` into the commit meta's protocol declaration if the
    table has not declared it yet (idempotent — later commits carry no
    protocol key, so latest_meta resolution stays O(first declaration))."""
    cur = set(table_protocol(path).get("reader_features", []))
    if feature not in cur:
        meta = {
            **meta,
            "protocol": {"reader_features": sorted(cur | {feature})},
        }
    return meta


def _arrow_spark_type(t) -> str:
    """Arrow footer type → Spark simpleString, for the primitive types the
    widening lattice and the schema contract speak. Complex/unknown types
    return their arrow repr — never equal to a Spark string, so callers
    treat them as "not provably clean" rather than silently passing."""
    import pyarrow as pa

    if pa.types.is_int8(t):
        return "tinyint"
    if pa.types.is_int16(t):
        return "smallint"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_date32(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    return str(t)


def drop_feature(path: str, feature: str) -> int:
    """``ALTER TABLE ... DROP FEATURE`` — the protocol ladder DOWN. A
    reader feature, once declared, locks out engine builds that predate
    it; when the live state no longer needs the feature, dropping it lets
    those readers back in. The drop VERIFIES non-use first (fail-closed —
    a drop that lied would make old readers silently mis-read, e.g.
    resurrect DV-deleted rows), then lands one metadata-only commit whose
    protocol omits the feature. History stays safe on both sides: the
    protocol is version-resolved, so time travel BELOW the drop still
    demands the feature from whoever reads it, and any later operation
    that re-needs the feature (a ``use_dvs`` merge, a rename, a widen, a
    RESTORE to a pre-drop snapshot) re-declares it automatically via
    :func:`_with_feature` — the ladder works both ways.

    Per-feature droppability (each error names the remediation):

    - ``deletion-vectors``: no live file carries a DV sidecar
      (``reorg_purge`` materializes them) and the ``deletionVectors``
      TBLPROPERTY is not 'true' (the next merge would re-declare
      immediately — unset the policy first, Delta's rule).
    - ``type-widening``: every live file's footer already stores each
      column at the logged (widened) type — a narrower file would read
      wrong on a build without the upcasting scan. ``optimize`` rewrites
      narrow files at the declared type.
    - ``column-mapping``: the live mapping must be IDENTITY and no live
      footer may carry a column outside the logical schema (dropped-
      column residue purges on any rewrite — ``reorg_purge``). A
      non-identity mapping has no un-mapping rewrite; it is not
      droppable (Delta's restriction).
    - ``log-retention``: the commit log must be complete from version 1
      (nothing ever expired) — once history is reclaimed, the floor
      checks this feature gates are load-bearing forever.
    - ``column-defaults``: no live file may still PREDATE any column's
      initial default (a feature-less reader would read NULL where the
      table says the default); ``reorg_purge`` migrates the backfill
      into the files.

    Returns the drop commit's version. Raises ``ValueError`` when the
    feature is unknown/undeclared or verification fails; a racing commit
    surfaces as :class:`CommitConflict` (re-run, like every DDL)."""
    if feature not in _READER_FEATURES:
        raise ValueError(
            f"unknown feature {feature!r} (supported: {sorted(_READER_FEATURES)})"
        )
    cur = set(table_protocol(path).get("reader_features", []))
    if feature not in cur:
        raise ValueError(
            f"feature {feature!r} is not declared on {path!r} "
            f"(declared: {sorted(cur)})"
        )
    read_v = current_version(path)
    live = _replay(path, read_v)
    if feature == "deletion-vectors":
        if (
            table_properties(path, read_v).get("deletionVectors", "").lower()
            == "true"
        ):
            raise ValueError(
                "cannot drop 'deletion-vectors': the deletionVectors "
                "TBLPROPERTY is 'true', so the next merge would re-declare "
                "it — unset the property first"
            )
        dv_files = sorted(rel for rel, e in live.items() if e.get("dvs"))
        if dv_files:
            raise ValueError(
                f"cannot drop 'deletion-vectors': {len(dv_files)} live "
                f"file(s) carry deletion vectors, e.g. {dv_files[0]!r} — "
                f"run reorg_purge() to materialize them first"
            )
    elif feature == "type-widening":
        import pyarrow.parquet as _pq

        schema = latest_meta(path, "schema", read_v) or {}
        mapping = _column_mapping(path, read_v)
        phys_type = {mapping.get(c, c): t for c, t in schema.items()}
        narrow = []
        for rel in sorted(live):
            fs = _pq.read_schema(os.path.join(path, rel))
            for name, logged in phys_type.items():
                idx = fs.get_field_index(name)
                if idx < 0:
                    continue
                ft = _arrow_spark_type(fs.field(idx).type)
                if ft != logged and _widens_to(ft, logged):
                    narrow.append((rel, name, ft, logged))
        if narrow:
            rel, name, ft, logged = narrow[0]
            raise ValueError(
                f"cannot drop 'type-widening': {len(narrow)} live file/"
                f"column(s) still store a pre-widen type, e.g. {rel!r} has "
                f"{name!r} as {ft} vs logged {logged} — run optimize() to "
                f"rewrite them at the declared type first"
            )
    elif feature == "column-mapping":
        import pyarrow.parquet as _pq

        schema = latest_meta(path, "schema", read_v) or {}
        mapping = _column_mapping(path, read_v)
        renamed = {c: p for c, p in mapping.items() if c != p}
        if renamed:
            raise ValueError(
                f"cannot drop 'column-mapping': {len(renamed)} column(s) "
                f"map to a different physical name, e.g. "
                f"{sorted(renamed)[0]!r} — a non-identity mapping has no "
                f"un-mapping rewrite and is not droppable"
            )
        allowed = set(schema) | {_ROWID}
        residue = []
        for rel in sorted(live):
            extra = [
                n
                for n in _pq.read_schema(os.path.join(path, rel)).names
                if n not in allowed
            ]
            if extra:
                residue.append((rel, extra[0]))
        if residue:
            rel, name = residue[0]
            raise ValueError(
                f"cannot drop 'column-mapping': {len(residue)} live "
                f"file(s) still carry dropped-column bytes, e.g. {rel!r} "
                f"has {name!r} — run reorg_purge() to purge them first"
            )
    elif feature == "log-retention":
        vs = _versions(path)
        if not vs or vs[0] != 1 or vs != list(range(1, vs[-1] + 1)):
            raise ValueError(
                "cannot drop 'log-retention': history below the expiry "
                "horizon is already reclaimed, so the floor checks this "
                "feature gates are load-bearing forever"
            )
    elif feature == "column-defaults":
        cds = latest_meta(path, "column_defaults", read_v) or {}
        init = {
            c: d for c, d in cds.items() if d.get("initial") is not None
        }
        if init:
            groups = _default_file_groups(
                path, visible_files(path, read_v), init
            )
            blocked = sorted(
                {c for key in groups for c in key if key}
            )
            if blocked:
                raise ValueError(
                    f"cannot drop 'column-defaults': live file(s) still "
                    f"predate the initial default of column(s) "
                    f"{blocked} — a reader without the feature would "
                    f"read NULL where the table says the default; "
                    f"run reorg_purge() to migrate the backfill into "
                    f"the files first"
                )
    _try_commit(
        path,
        read_v + 1,
        [],
        [],
        meta={
            "op": "drop_feature",
            "feature": feature,
            "protocol": {"reader_features": sorted(cur - {feature})},
        },
    )
    return read_v + 1


# ---------------------------------------------------------------------------
# Column mapping (the Delta column-mapping "name" mode): RENAME/DROP COLUMN
# as metadata-only commits — no data file is rewritten. Data files keep each
# column's PHYSICAL name forever (assigned when the column first appears);
# the log carries a logical→physical mapping and readers rename/project at
# plan build. A physical name is RESERVED for all time once any file may
# carry it — reusing one for a new logical column would resurrect old bytes
# under the new name, so appends that re-introduce a reserved name get a
# fresh generated physical name instead.
# ---------------------------------------------------------------------------


def _column_mapping(path: str, version: int | None = None) -> dict[str, str]:
    """Live logical→physical column-name mapping at ``version``. Empty ⇒
    identity (every table that never renamed — the zero-overhead path)."""
    return latest_meta(path, "column_mapping", version) or {}


def _physical_reserved(path: str, version: int | None = None) -> set[str]:
    """Every physical column name any live-or-historical data file may
    carry: the logged reservation list plus the current schema's physical
    names. Renames/drops are metadata-only, so a renamed-away or dropped
    physical name stays in files until a rewrite purges it — it may never
    be handed to a NEW logical column."""
    reserved = set(latest_meta(path, "physical_reserved", version) or [])
    schema = latest_meta(path, "schema", version) or {}
    mapping = _column_mapping(path, version)
    reserved.update(mapping.get(c, c) for c in schema)
    return reserved


def _to_logical(df: DataFrame, schema, mapping, passthrough=()) -> DataFrame:
    """Physical scan → logical view: rename via the mapping, PROJECT OUT
    physical columns absent from the logical schema (dropped columns),
    and CAST any column whose scan type drifted from the logged type —
    hive-style partition reconstruction INFERS types from directory
    strings (a bigint partition column reads back as int), and the
    logged schema, not the inference, is the contract. Identity mapping
    + matching columns/types is a no-op (the plan is untouched for every
    pre-mapping, unpartitioned table)."""
    phys_to_log = {p: l for l, p in mapping.items()}
    dd = dict(df.dtypes)
    if not phys_to_log and (
        schema is None
        or all(
            c in passthrough or (c in schema and dd[c] == schema[c])
            for c in df.columns
        )
    ):
        return df
    cols = []
    for c in df.columns:
        if c in passthrough:
            cols.append(F.col(c))
            continue
        lc = phys_to_log.get(c, c)
        # A physical column is readable ONLY if it is the CURRENT physical
        # name of its logical column. A retired physical name (its logical
        # name dropped, then recycled by a merge-schema append under a
        # fresh generated physical) would otherwise identity-map back in —
        # producing a duplicate logical column whose stale bytes resurrect
        # dropped data (observed: read() after drop+recycle returned two
        # `v` columns, one carrying the dropped values).
        if (schema is None or lc in schema) and mapping.get(lc, lc) == c:
            col = F.col(c)
            if schema is not None and dd.get(c) != schema[lc]:
                col = col.cast(schema[lc])
            cols.append(col.alias(lc))
    return df.select(*cols)


def _logical_view(
    df: DataFrame, path: str, version: int | None = None, passthrough=()
) -> DataFrame:
    return _to_logical(
        df,
        latest_meta(path, "schema", version),
        _column_mapping(path, version),
        passthrough,
    )


def _to_physical(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Logical frame → physical column names for landing data files."""
    if not mapping:
        return df
    return df.select(*[F.col(c).alias(mapping.get(c, c)) for c in df.columns])


def _phys_name(path: str, version: int | None, col: str) -> str:
    """Translate one LOGICAL column name to its physical form — the name
    stats/blooms are keyed by (they describe file contents)."""
    return _column_mapping(path, version).get(col, col)


def _guard_constraint_refs(path: str, col: str, action: str) -> None:
    import re as _re

    cons = latest_meta(path, "constraints") or {}
    hits = sorted(
        n for n, sql in cons.items() if _re.search(rf"\b{_re.escape(col)}\b", sql)
    )
    if hits:
        raise ValueError(
            f"cannot {action} column {col!r}: referenced by CHECK "
            f"constraint(s) {hits}; drop them first"
        )
    # same rule for the write-contract derivations: renaming/dropping a
    # generated column (or an input its expression names) would break
    # every later write's compute-or-validate; an identity column's
    # allocation is keyed by name
    gens = latest_meta(path, "generated") or {}
    ghits = sorted(
        n
        for n, g in gens.items()
        if n == col or _re.search(rf"\b{_re.escape(col)}\b", g["expr"])
    )
    if ghits:
        raise ValueError(
            f"cannot {action} column {col!r}: it is (or is referenced by) "
            f"generated column(s) {ghits}"
        )
    if col in (latest_meta(path, "identity") or {}):
        raise ValueError(
            f"cannot {action} column {col!r}: it is an identity column"
        )


def rename_column(path: str, old: str, new: str) -> int:
    """``ALTER TABLE RENAME COLUMN old TO new`` as a METADATA-ONLY commit
    (Delta column-mapping name mode): zero data files rewritten at any
    table size — the column keeps its physical name in every file and
    readers alias it at plan build. Time travel below the rename sees the
    old name (the mapping resolves per version). Rejected when: the
    column is referenced by a CHECK constraint (the expression would
    silently stop matching), the new name already exists logically, or
    the new name collides with a RESERVED physical name still present in
    data files (old bytes would resurrect under it). Renaming back to a
    column's own original name is always legal."""
    read_v = current_version(path)
    if read_v == 0:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    schema = latest_meta(path, "schema")
    if schema is None:
        raise ValueError(
            "table has no logged schema; rename requires schema-recording "
            "commits (append/overwrite since schemas were logged)"
        )
    if old not in schema:
        raise ValueError(f"no column {old!r} (have {sorted(schema)})")
    if new in schema:
        raise ValueError(f"column {new!r} already exists")
    _guard_constraint_refs(path, old, "rename")
    mapping = dict(_column_mapping(path))
    phys = mapping.pop(old, old)
    reserved = _physical_reserved(path)
    if new in reserved - {phys}:
        raise ValueError(
            f"cannot rename {old!r} to {new!r}: {new!r} is a reserved "
            f"physical column name still present in data files"
        )
    if new != phys:
        mapping[new] = phys
    new_schema = {(new if k == old else k): t for k, t in schema.items()}
    extra = {}
    cds = latest_meta(path, "column_defaults") or {}
    if old in cds:
        # defaults are keyed by LOGICAL name — they follow the rename
        extra["column_defaults"] = {
            (new if k == old else k): d for k, d in cds.items()
        }
    _try_commit(
        path,
        read_v + 1,
        [],
        [],
        meta=_with_feature(path, {
            "op": "rename_column",
            "renamed": [old, new],
            **extra,
            "schema": new_schema,
            "column_mapping": mapping,
            "physical_reserved": sorted(reserved | {phys}),
        }, "column-mapping"),
    )
    return read_v + 1


def drop_column(path: str, name: str) -> int:
    """``ALTER TABLE DROP COLUMN`` as a METADATA-ONLY commit: the physical
    data stays in the files (readers project it out at plan build) and is
    PURGED LAZILY by any later rewrite that touches a file (CoW mutation,
    OPTIMIZE/Z-order — the Delta ``REORG ... PURGE`` effect without a
    dedicated command). The physical name stays reserved forever; a later
    append re-introducing the same logical name gets a fresh generated
    physical name, so the old bytes can never resurrect. Time travel
    below the drop still reads the column."""
    read_v = current_version(path)
    if read_v == 0:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    schema = latest_meta(path, "schema")
    if schema is None or name not in schema:
        raise ValueError(f"no column {name!r} (have {sorted(schema or {})})")
    if len(schema) == 1:
        raise ValueError("cannot drop the last column")
    _guard_constraint_refs(path, name, "drop")
    mapping = dict(_column_mapping(path))
    phys = mapping.pop(name, name)
    reserved = _physical_reserved(path) | {phys}
    new_schema = {k: t for k, t in schema.items() if k != name}
    extra = {}
    cds = latest_meta(path, "column_defaults") or {}
    if name in cds:
        # the column's defaults die with it (a later re-add starts fresh)
        extra["column_defaults"] = {
            k: d for k, d in cds.items() if k != name
        }
    _try_commit(
        path,
        read_v + 1,
        [],
        [],
        meta=_with_feature(path, {
            "op": "drop_column",
            "dropped": name,
            "schema": new_schema,
            **extra,
            "column_mapping": mapping,
            "physical_reserved": sorted(reserved),
        }, "column-mapping"),
    )
    return read_v + 1


def widen_column_type(path: str, col: str, to_type: str) -> int:
    """``ALTER TABLE ... ALTER COLUMN ... TYPE`` restricted to WIDENING
    upcasts — the Delta type-widening design as a METADATA-ONLY commit:
    the logged schema flips to the wider type and ZERO data files are
    rewritten at any table size. Every txlog read already scans with the
    logged schema translated to physical names (see :func:`_read_data`),
    and the parquet reader upcasts narrower physical pages natively
    (int32 pages render as bigint), so pre-widen history, change files,
    and post-widen appends that still land the narrow type (see
    :func:`_validate_append_schema`) all read at the wide type with no
    rewrite and no read-side special case. The operational shape at
    100 TB: an id/count column outgrowing ``int`` needs one tiny commit,
    not a petabyte rewrite — and CDC producers whose source schema froze
    at the narrow type keep appending unchanged.

    Legal moves are the Delta type-widening GA lattice (see
    :func:`_widens_to`): tinyint→smallint→int→bigint, float→double,
    tinyint/smallint/int→double, any integer→decimal with enough
    integral digits, and decimal growth (integral part and scale each
    hold-or-grow). Same-type is a no-op; anything else is rejected
    (narrowing or cross-family changes would corrupt or lose precision
    silently).
    Schema is version-resolved, so time travel below the widening sees
    the old type. The first widening folds the ``type-widening`` READER
    FEATURE into the protocol: this engine's readers upcast natively,
    but builds or integrations that resolve types from data-file footers
    would see mixed physical types — Delta gates its own typeWidening
    identically.

    Cites: Delta Lake type widening (public docs/protocol); the
    reference has no ALTER surface (SURVEY §2.13)."""
    read_v = current_version(path)
    if read_v == 0:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    schema = latest_meta(path, "schema")
    if schema is None:
        raise ValueError(
            "table has no logged schema; widening requires schema-"
            "recording commits (append/overwrite since schemas were "
            "logged)"
        )
    if col not in schema:
        raise ValueError(f"no column {col!r} (have {sorted(schema)})")
    cur_t = schema[col]
    if cur_t == to_type:
        return read_v  # no-op: already that type
    if not _widens_to(cur_t, to_type):
        raise ValueError(
            f"cannot change {col!r} from {cur_t!r} to {to_type!r}: only "
            f"strict widenings (int chain, float->double, int->double, "
            f"integer->decimal, decimal growth) are metadata-only safe"
        )
    meta = {
        "op": "widen_column_type",
        "widened": [col, cur_t, to_type],
        "schema": {
            k: (to_type if k == col else t) for k, t in schema.items()
        },
    }
    if cur_t in _INT_CHAIN and to_type not in _INT_CHAIN:
        # Bloom hashing is value-REPRESENTATION-sensitive: stored blooms
        # hashed the column's INT bits, but probes against a double/
        # decimal column hash the repr — consulting them would silently
        # FALSE-SKIP files (wrong results, not just wasted IO). Within
        # the int chain probes stay python ints and hash identically, so
        # only chain-leaving moves are affected: the widening commit
        # RETIRES the column's blooms (visible_blooms stops serving
        # them), trading its point-skipping for correctness. Stats-range
        # pruning is numeric and unaffected.
        pcol = _phys_name(path, read_v, col)
        if any(pcol in bl for bl in visible_blooms(path, read_v).values()):
            retired = set(latest_meta(path, "bloom_retired") or [])
            meta["bloom_retired"] = sorted(retired | {pcol})
    _try_commit(
        path,
        read_v + 1,
        [],
        [],
        meta=_with_feature(path, meta, "type-widening"),
    )
    return read_v + 1


def _eval_default(spark: SparkSession, expr_sql: str, dtype: str):
    """Validate a default expression: must be a CONSTANT (no column
    references — evaluated over a zero-column one-row frame), castable to
    ``dtype``, and its value JSON-representable (primitives; temporal and
    decimal values canonicalize to strings the arrow/Spark casts round-
    trip). Returns the evaluated plain-Python value."""
    try:
        row = spark.range(1).select().select(
            F.expr(expr_sql).cast(dtype).alias("v")
        ).collect()
    except Exception as e:  # noqa: BLE001 - analysis errors vary by expr
        raise ValueError(
            f"default {expr_sql!r} is not a constant expression castable "
            f"to {dtype}: {e}"
        ) from e
    v = row[0]["v"]
    if v is None:
        raise ValueError(
            f"default {expr_sql!r} evaluates to NULL under CAST to "
            f"{dtype} — a NULL default is spelled by omitting the default"
        )
    import decimal

    # EXACT canonical forms (unlike the stats channel, which widens
    # decimals outward for skip-safety): the stored value IS the default
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, _dt.datetime):
        return _canon_ts(v)
    if isinstance(v, _dt.date):
        return v.isoformat()
    if not isinstance(v, (int, float, str, bool)):
        raise ValueError(
            f"default {expr_sql!r} has unsupported type for a column "
            f"default (primitives only): {type(v).__name__}"
        )
    return v


def add_column(
    spark: SparkSession,
    path: str,
    name: str,
    dtype: str,
    default: str | None = None,
) -> int:
    """``ALTER TABLE ADD COLUMN`` — metadata-only at any table size, with
    the Iceberg-v3 default-value semantics when ``default`` (a constant
    SQL expression string) is given:

    - **initial default**: every row written BEFORE the column existed
      reads ``default`` — a metadata-only backfill (at 100 TB the
      alternative is a full-table rewrite). Resolution is per FILE: a
      live file predates the column iff it was visible at the add
      commit, so post-add NULLs are never confused with backfill.
    - **write default**: a later write that OMITS the column gets
      ``default`` filled in at write time (appends, the MERGE insert
      leg, replaceWhere frames). Changeable via
      :func:`set_column_default`; the initial default is immutable,
      and while one exists the write default cannot be CLEARED — that
      invariant ("post-add files always carry the column") is what lets
      per-file backfill ride on column ABSENCE in the streaming readers.

    Without ``default`` this is plain additive evolution as an explicit
    DDL (the column reads NULL everywhere), no reader feature needed;
    with one, the commit declares the ``column-defaults`` reader feature
    — a build that ignored it would read NULL where the table says
    ``default``. A re-introduced name that is still physically RESERVED
    (dropped earlier) maps to a fresh physical name, exactly like the
    append path. Returns the new version."""
    read_v = current_version(path)
    if read_v == 0:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    schema = latest_meta(path, "schema", read_v)
    if schema is None:
        raise ValueError(
            "add_column needs a table with a logged schema (any append "
            "by this engine records one)"
        )
    if name in schema:
        raise ValueError(f"column {name!r} already exists")
    # probe the type string itself (independent of the default)
    try:
        spark.range(1).select().select(F.lit(None).cast(dtype))
    except Exception as e:  # noqa: BLE001
        raise ValueError(f"invalid column type {dtype!r}: {e}") from e
    meta: dict = {
        "op": "add_column",
        "added": [name, dtype],
        "schema": {**schema, name: dtype},
    }
    reserved = _physical_reserved(path, read_v)
    mapping = dict(_column_mapping(path, read_v))
    if name in reserved:
        phys = f"{name}__c{uuid.uuid4().hex[:8]}"
        mapping[name] = phys
        meta["column_mapping"] = mapping
        meta["physical_reserved"] = sorted(reserved | {phys})
        meta = _with_feature(path, meta, "column-mapping")
    if default is not None:
        value = _eval_default(spark, default, dtype)
        cds = dict(latest_meta(path, "column_defaults", read_v) or {})
        cds[name] = {
            "initial": default,
            "initial_value": value,
            "write": default,
            "v_add": read_v + 1,
        }
        meta["column_defaults"] = cds
        meta = _with_feature(path, meta, "column-defaults")
    _try_commit(path, read_v + 1, [], [], meta=meta)
    return read_v + 1


def set_column_default(
    spark: SparkSession, path: str, name: str, write_default: str | None
) -> int:
    """``ALTER TABLE ALTER COLUMN ... SET/DROP DEFAULT`` — change the
    WRITE default (what fills the column when a write omits it). The
    INITIAL default (the pre-add backfill) is immutable, and while one
    exists the write default may change but never clear (see
    :func:`add_column`'s invariant). Setting a first-ever write default
    on an existing column is allowed and needs no reader feature (write
    defaults are writer-side — the files carry real values)."""
    read_v = current_version(path)
    schema = latest_meta(path, "schema", read_v) or {}
    if name not in schema:
        raise ValueError(f"no column {name!r} (have {sorted(schema)})")
    cds = dict(latest_meta(path, "column_defaults", read_v) or {})
    cur = dict(cds.get(name, {}))
    if write_default is None:
        if cur.get("initial") is not None:
            raise ValueError(
                f"cannot clear the write default of {name!r}: its initial "
                f"default requires every post-add file to carry the "
                f"column (the per-file backfill invariant)"
            )
        if name in cds:
            cur["write"] = None
            cds[name] = cur
    else:
        _eval_default(spark, write_default, schema[name])
        cur.setdefault("initial", None)
        cur.setdefault("initial_value", None)
        cur.setdefault("v_add", read_v + 1)
        cur["write"] = write_default
        cds[name] = cur
    _try_commit(
        path,
        read_v + 1,
        [],
        [],
        meta={
            "op": "set_column_default",
            "column": name,
            "column_defaults": cds,
        },
    )
    return read_v + 1


def _apply_write_defaults(df: DataFrame, path: str) -> DataFrame:
    """Fill every column the batch OMITS that carries a write default
    (the Iceberg write-default contract) — before identity/generated/
    constraint processing, so a generated expression or CHECK referencing
    a defaulted column sees the filled value."""
    cds = latest_meta(path, "column_defaults") or {}
    if not cds:
        return df
    schema = latest_meta(path, "schema") or {}
    for c, d in cds.items():
        if (
            d.get("write") is not None
            and c in schema
            and c not in df.columns
        ):
            df = df.withColumn(c, F.expr(d["write"]).cast(schema[c]))
    return df


def _default_file_groups(
    path: str, files: list[str], init: dict, mapping: dict | None = None
) -> dict[frozenset, list[str]]:
    """Group an absolute-path file list by WHICH initial-defaulted
    columns each file predates. Membership is per column: the files
    visible at the add commit (metadata resolution — the add was
    metadata-only, so that set IS the pre-add population), or the
    explicit ``pre_files`` list a clone recorded (a clone's log cannot
    resolve the source's versions). Restores re-adding pre-add files
    stay correctly grouped — membership, not version intervals."""
    pre_sets = {}
    for c, d in init.items():
        if d.get("pre_files") is not None:
            pre_sets[c] = {os.path.join(path, p) for p in d["pre_files"]}
        else:
            pre_sets[c] = set(visible_files(path, d["v_add"]))
    cdc_prefix = os.path.join(path, _CDC_DIR) + os.sep
    groups: dict[frozenset, list[str]] = {}
    footer_names: dict[str, set] | None = None
    for f in files:
        if f.startswith(cdc_prefix):
            # CHANGE-DATA files are never in any snapshot's visible set —
            # but they obey the same invariant (post-add change files
            # derive from filled/logical frames, so they CARRY defaulted
            # columns): footer truth decides, bounded by the CDC window
            if footer_names is None:
                footer_names = {}
            if f not in footer_names:
                import pyarrow.parquet as _pq

                footer_names[f] = set(_pq.read_schema(f).names)
            key = frozenset(
                c
                for c in init
                if (mapping or {}).get(c, c) not in footer_names[f]
            )
        else:
            key = frozenset(c for c, s in pre_sets.items() if f in s)
        groups.setdefault(key, []).append(f)
    return groups


def table_properties(path: str, version: int | None = None) -> dict[str, str]:
    """The table's property map at ``version`` (``{}`` when none set) —
    the ``TBLPROPERTIES`` surface. Version-resolved like every meta key:
    time travel sees the properties in force at that version."""
    return latest_meta(path, "properties", version) or {}


def set_table_properties(path: str, props: dict) -> int:
    """``ALTER TABLE ... SET TBLPROPERTIES`` as ONE metadata-only commit
    merging ``props`` into the logged property map (values stringify —
    the Delta convention). Unknown keys store verbatim as application
    metadata; keys the ENGINE honors:

    - ``autoCompact`` = 'true'/'false' — appends (and the streaming
      append sink) with ``auto_compact=None`` (the default) run the
      post-commit best-effort compaction when 'true'; the per-call
      argument always overrides. This is the table-level home for the
      policy (Delta's ``delta.autoOptimize.autoCompact``): every writer
      of a CDC table inherits it, instead of each call site remembering
      a flag.
    - ``autoCompact.minFiles`` (int, default 16) and
      ``autoCompact.targetBytes`` (int, default 128 MiB) — the trigger
      and output sizing for property-driven compaction.
    - ``deletionVectors`` = 'true' — ``merge_into`` defaults to the
      MERGE-ON-READ path (clause hits land DV sidecar positions +
      rewritten-row appends; zero candidate files rewritten); the
      per-call ``use_dvs`` argument always overrides.
    - ``clustering.columns`` = 'a,b' + ``clustering.auto`` = 'true'
      (with ``clustering.maxOverlap``/``clustering.minFiles``/
      ``clustering.nFiles``) — :func:`maintain` consults
      :func:`clustering_decay` and re-clusters the decayed band via
      scoped ``optimize_zorder``.
    - ``checkpoint.onMaintain``, ``logRetention.versions`` /
      ``logRetention.ageSeconds``, ``vacuum.retainVersions`` — the
      :func:`maintain` lifecycle steps.

    Racing writers: the merge base is the CURRENT map, so two concurrent
    sets of DIFFERENT keys serialize via the commit race (the loser's
    retry is the caller's re-run, same contract as the other DDL)."""
    read_v = current_version(path)
    if read_v == 0:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    cur = dict(table_properties(path))
    cur.update({str(k): str(v) for k, v in props.items()})
    _try_commit(
        path,
        read_v + 1,
        [],
        [],
        meta={"op": "set_properties", "properties": cur},
    )
    return read_v + 1


def maintain(spark: SparkSession, path: str) -> dict:
    """One-call, PROPERTY-DRIVEN table maintenance — the operational
    surface a 100 TB deployment schedules: one cron entry per table runs
    whatever that table's TBLPROPERTIES ask for, in the dependency-safe
    order re-cluster → compact → checkpoint → expire → vacuum (the
    clustered rewrite already compacts its band, so it precedes
    compaction; the retention horizon can only be a checkpoint, so the
    forced checkpoint precedes expiry; expiry and vacuum compose in
    either order but expiring first lets vacuum's sweep skip reclaimed
    log objects). Policies live with the TABLE, not in pipeline code.

    Honored properties (all optional; absent → that step is a no-op):

    - ``clustering.columns`` = 'a,b' + ``clustering.auto`` = 'true' —
      consult :func:`clustering_decay` (per-file stats overlap fraction
      on the clustered dims, metadata-only) and, when ≥
      ``clustering.minFiles`` (default 4) files have decayed past
      ``clustering.maxOverlap`` (default 0.5), run a SCOPED
      ``optimize_zorder(..., WHERE cols[0] in the decayed band)`` — the
      unclustered CDC tail re-clusters, every cold file stays referenced
      byte-identical. Runs FIRST: the clustered rewrite already compacts
      its band, so compaction never wastes a rewrite the Z-order is
      about to redo. Output file count comes from the band's bytes at
      ``autoCompact.targetBytes`` (or ``clustering.nFiles``).
    - ``autoCompact`` = 'true' (+ ``autoCompact.minFiles`` /
      ``autoCompact.targetBytes``) — run the small-file compaction if
      trip-wired (same trigger as the post-commit hook; a lost commit
      race yields benignly).
    - ``checkpoint.onMaintain`` = 'true' — force an idempotent
      checkpoint at the tip (``checkpoint_now``), making the table
      expirable regardless of the 10-commit cadence.
    - ``logRetention.versions`` (int) and/or ``logRetention.ageSeconds``
      (int) — ``expire_log`` with those constraints.
    - ``vacuum.retainVersions`` (int) — ``vacuum`` with that floor.

    Returns a report dict: ``{'reclustered_to', 'compacted_to',
    'checkpointed', 'log_expired', 'files_vacuumed'}`` (None/0 for
    skipped steps)."""
    props = table_properties(path)
    report: dict = {
        "reclustered_to": None,
        "compacted_to": None,
        "checkpointed": None,
        "log_expired": 0,
        "files_vacuumed": 0,
    }
    ccols = [
        c.strip()
        for c in props.get("clustering.columns", "").split(",")
        if c.strip()
    ]
    if ccols and props.get("clustering.auto", "").lower() == "true":
        decay = clustering_decay(
            path,
            ccols,
            max_overlap=float(props.get("clustering.maxOverlap", 0.5)),
            min_files=int(props.get("clustering.minFiles", 4)),
        )
        if decay["recommended"] and decay["band"] is not None:
            lo, hi = decay["band"]
            target_bytes = int(
                props.get("autoCompact.targetBytes", 128 * 1024 * 1024)
            )
            # size the rewrite from the band's bytes (metadata-only)
            cur = current_version(path)
            pcol0 = _phys_name(path, cur, ccols[0])
            fstats = visible_stats(path, cur)
            c_lo, c_hi = _canon_bound(lo), _canon_bound(hi)
            band_bytes = sum(
                os.path.getsize(p)
                for p in visible_files(path, cur)
                if not _range_excludes(
                    fstats.get(os.path.relpath(p, path), {}).get(pcol0),
                    c_lo,
                    c_hi,
                )
            )
            n_files = int(
                props.get(
                    "clustering.nFiles", max(1, -(-band_bytes // target_bytes))
                )
            )
            report["reclustered_to"] = optimize_zorder(
                spark,
                path,
                ccols,
                n_files=n_files,
                stats_cols=ccols,
                prune_col=ccols[0],
                lo=lo,
                hi=hi,
            )
    if props.get("autoCompact", "").lower() == "true":
        report["compacted_to"] = _auto_compact_after_commit(
            spark,
            path,
            int(props.get("autoCompact.minFiles", 16)),
            int(props.get("autoCompact.targetBytes", 128 * 1024 * 1024)),
        )
    if props.get("checkpoint.onMaintain", "").lower() == "true":
        report["checkpointed"] = checkpoint_now(path)
    rv = props.get("logRetention.versions")
    ra = props.get("logRetention.ageSeconds")
    if rv is not None or ra is not None:
        report["log_expired"] = len(
            expire_log(
                path,
                retain_versions=int(rv) if rv is not None else None,
                retain_age=(
                    _dt.timedelta(seconds=int(ra)) if ra is not None else None
                ),
            )
        )
    vr = props.get("vacuum.retainVersions")
    if vr is not None:
        report["files_vacuumed"] = len(vacuum(path, retain_versions=int(vr)))
    return report


def unset_table_properties(path: str, keys: list[str]) -> int:
    """``ALTER TABLE ... UNSET TBLPROPERTIES`` — metadata-only commit
    removing ``keys`` (missing keys are ignored, like Delta's
    IF EXISTS)."""
    read_v = current_version(path)
    if read_v == 0:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    cur = dict(table_properties(path))
    for k in keys:
        cur.pop(str(k), None)
    _try_commit(
        path,
        read_v + 1,
        [],
        [],
        meta={"op": "unset_properties", "properties": cur},
    )
    return read_v + 1


def add_constraint(
    spark: SparkSession, path: str, name: str, check_sql: str
) -> int:
    """``ALTER TABLE ADD CONSTRAINT name CHECK (expr)``: the constraint
    rides in commit meta (like the schema) and every later write validates
    its incoming rows against it BEFORE any commit — bad data is rejected
    at the door, the lakehouse data-quality contract. Existing rows are
    validated first (a constraint the table already violates is a lie).
    SQL CHECK semantics: only rows where the expression is FALSE violate —
    NULL passes, as in every SQL engine. Returns the new version (a
    metadata-only commit: no files move)."""
    cur = dict(latest_meta(path, "constraints") or {})
    if name in cur:
        raise ValueError(f"constraint {name!r} already exists: {cur[name]!r}")
    read_v = current_version(path)
    if read_v == 0:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    existing_bad = (
        read(spark, path, read_v, merge_schema=True)
        .filter(F.expr(check_sql) == F.lit(False))
        .limit(1)
        .count()
    )
    if existing_bad:
        raise ValueError(
            f"cannot add constraint {name!r}: existing rows violate {check_sql!r}"
        )
    cur[name] = check_sql
    _try_commit(
        path,
        read_v + 1,
        [],
        [],
        meta={"op": "add_constraint", "constraints": cur, "constraint": name},
    )
    return read_v + 1


def drop_constraint(path: str, name: str) -> int:
    """``ALTER TABLE DROP CONSTRAINT``: metadata-only commit removing the
    named constraint from enforcement."""
    cur = dict(latest_meta(path, "constraints") or {})
    if name not in cur:
        raise ValueError(f"no constraint {name!r} (have {sorted(cur)})")
    del cur[name]
    v = current_version(path)
    _try_commit(
        path,
        v + 1,
        [],
        [],
        meta={"op": "drop_constraint", "constraints": cur, "constraint": name},
    )
    return v + 1


def _enforce_constraints(df: DataFrame, path: str) -> None:
    """Reject a write whose rows violate any logged CHECK constraint (one
    combined pass over the incoming batch; the per-constraint re-check runs
    only on the error path to name the offenders)."""
    cons = latest_meta(path, "constraints") or {}
    if not cons:
        return
    viol = None
    for sql in cons.values():
        c = F.expr(sql) == F.lit(False)
        viol = c if viol is None else viol | c
    if df.filter(viol).limit(1).count():
        bad = sorted(
            n
            for n, sql in cons.items()
            if df.filter(F.expr(sql) == F.lit(False)).limit(1).count()
        )
        raise ValueError(f"CHECK constraint(s) violated by the write: {bad}")


def add_generated_column(
    path: str,
    name: str,
    expr: str,
    dtype: str,
    spark: SparkSession | None = None,
) -> int:
    """``GENERATED ALWAYS AS (<expr>)`` (the Delta generated-columns
    feature): record ``name`` → deterministic SQL expression over the
    row's other columns in table meta; every write path thereafter
    COMPUTES the column when the batch omits it and VALIDATES it when
    supplied (a mismatching explicit value is rejected — the Delta
    contract, which is what lets the optimizer and partition layouts
    trust the derivation). Metadata-only commit.

    Delta only allows declaring these at table creation; this form is
    strictly more useful: on a NON-EMPTY table the column must already
    exist and every existing row is validated against the expression
    first (one scan, fail-closed), so the invariant is true from the
    declaring commit onward — never retroactively assumed."""
    v = current_version(path)
    if v == 0:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    gens = dict(latest_meta(path, "generated") or {})
    if name in gens:
        raise ValueError(f"column {name!r} already has a generation expression")
    schema = latest_meta(path, "schema") or {}
    if _replay(path, v):
        if name not in schema:
            raise ValueError(
                f"cannot add a generation expression for absent column "
                f"{name!r} on a non-empty table (a backfill rewrite would "
                f"be needed; add the column via a write first)"
            )
        if spark is None:
            raise ValueError(
                "declaring a generation expression on a NON-EMPTY table "
                "validates every existing row first; pass spark="
            )
        bad = (
            read(spark, path, v, merge_schema=True)
            .filter(~F.col(name).eqNullSafe(F.expr(expr).cast(schema[name])))
            .limit(1)
            .count()
        )
        if bad:
            raise ValueError(
                f"existing rows violate the generation expression for "
                f"{name!r}; fix the data before declaring it generated"
            )
    gens[name] = {"expr": expr, "type": dtype}
    _try_commit(
        path, v + 1, [], [],
        meta={"op": "add_generated_column", "generated": gens},
    )
    return v + 1


def add_identity_column(path: str, name: str, start: int = 1, step: int = 1) -> int:
    """``GENERATED ALWAYS AS IDENTITY`` (the Delta identity-columns
    feature): appends auto-assign ``name`` from a logged high-water mark.
    The guarantee is Delta's exactly: values are UNIQUE and move in
    ``step``'s direction, but are NOT consecutive — each task derives its
    values from ``monotonically_increasing_id`` (partition-id high bits),
    so gaps occur, and the watermark advances to the landed maximum
    (footer stats, no extra scan) plus one step on every commit. Batches
    that SUPPLY the column are rejected (ALWAYS mode). Declaration is
    creation-time like Delta's: the table must still be empty of visible
    files and the name unused."""
    if step == 0:
        raise ValueError("identity step must be non-zero")
    v = current_version(path)
    if v and _replay(path, v):
        raise ValueError(
            "identity columns are declared at table creation (Delta "
            "contract); this table already has visible data files"
        )
    schema = latest_meta(path, "schema") or {}
    idents = dict(latest_meta(path, "identity") or {})
    if name in schema or name in idents:
        raise ValueError(f"column {name!r} already exists")
    idents[name] = {"start": start, "step": step, "next": start}
    _try_commit(
        path, v + 1, [], [],
        meta={"op": "add_identity_column", "identity": idents},
    )
    return v + 1


def _apply_generated(df: DataFrame, path: str) -> DataFrame:
    """Compute-or-validate every logged generation expression on a write
    batch: absent columns are computed; supplied ones must match the
    expression on EVERY row (NULL-safe compare, fail-closed) — the Delta
    generated-column write contract, enforced on append/overwrite, the
    MERGE insert leg, and every rewritten-row frame (so a mutation that
    breaks the derivation fails loudly instead of poisoning the table)."""
    gens = latest_meta(path, "generated") or {}
    for name, g in gens.items():
        expr = F.expr(g["expr"]).cast(g["type"])
        if name not in df.columns:
            df = df.withColumn(name, expr)
        elif (
            df.filter(~F.col(name).eqNullSafe(expr)).limit(1).count()
        ):
            raise ValueError(
                f"supplied values for generated column {name!r} do not "
                f"match its generation expression {g['expr']!r}"
            )
    return df


def _apply_identity(df: DataFrame, path: str) -> tuple[DataFrame, dict]:
    """Assign identity values for an append batch from the logged
    watermark. Returns (frame with the columns, meta watermark update) —
    the commit loop re-invokes per attempt so a lost race re-reads the
    winner's watermark. Values bake into the data files; see append's
    identity re-land note for the conflict path."""
    idents = latest_meta(path, "identity") or {}
    if not idents:
        return df, {}
    for name in idents:
        if name in df.columns:
            raise ValueError(
                f"{name!r} is GENERATED ALWAYS AS IDENTITY; batches must "
                f"not supply it"
            )
    out = df
    for name, spec in idents.items():
        base, step = int(spec["next"]), int(spec["step"])
        out = out.withColumn(
            name,
            (F.lit(base) + F.lit(step) * F.monotonically_increasing_id()).cast(
                "bigint"
            ),
        )
    return out, {"identity": idents}


def _advance_identity(path: str, adds: list[str], idents_meta: dict) -> dict:
    """Post-land watermark advance: the landed files' footer min/max of
    each identity column (no data pages read) move ``next`` one step past
    the batch's extreme — the same footer-stats trick fast_count uses."""
    if not idents_meta:
        return {}
    idents = {k: dict(v) for k, v in idents_meta["identity"].items()}
    for name, spec in idents.items():
        step = int(spec["step"])
        extreme = None
        for rel in adds:
            mm = _file_minmax(os.path.join(path, rel), [name]).get(name)
            if mm is None or mm[0] is None:
                continue
            cand = mm[1] if step > 0 else mm[0]
            if extreme is None or (cand > extreme if step > 0 else cand < extreme):
                extreme = cand
        if extreme is not None:
            spec["next"] = int(extreme) + step
    return {"identity": idents}


def append(
    df: DataFrame,
    path: str,
    max_retries: int = 10,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    meta: dict | None = None,
    merge_schema: bool = False,
    partition_by: list[str] | None = None,
    auto_compact: bool | None = None,
    auto_compact_min_files: int = 16,
    auto_compact_target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Blind append: always merges cleanly under races (adds only — no
    read-set to validate), so a conflict just re-targets the new tip.

    ``partition_by`` lands this batch hive-partitioned
    (``__part_<col>=value`` directories; the real columns stay INLINE in
    every file, so partitioned and unpartitioned file groups always read
    in one plain scan) and records each file's partition VALUES as
    per-file min==max stats in the commit — so partition pruning IS
    stats pruning: read_pruned / read_pruned_multi / the mutation
    ladders skip whole partitions from the log alone, with no special
    partition-column code path, and files from later unpartitioned
    appends or rewrites simply carry footer stats for the same columns.

    ``meta`` rides inside the commit file (see :func:`overwrite` /
    :func:`latest_meta`) — the idempotent-writer hook: a streaming sink
    records its (app id → epoch) watermark atomically with the data, so a
    replayed micro-batch can be detected and skipped (the Delta
    txnAppId/txnVersion pattern; see streaming.sinks.apply_append_batch).

    ``stats_cols`` records per-file min/max for those columns in the commit
    (footer-only reads, no data pages) so ``read_pruned`` can skip files
    from the log alone — the Delta-style stats-in-log design. Pair with
    io.write_sorted/write_zorder-shaped data for tight ranges.

    ``bloom_cols`` additionally stores a 1 KiB per-file Bloom filter per
    column in the commit: min/max ranges cannot skip POINT lookups on a
    high-cardinality key in unclustered data (every file's range covers
    every id), a membership sketch can — ``read_point`` skips any file
    whose bloom excludes the value (~1% false-keep, zero false-skip).
    Costs one column read per file at write time. Bloom columns must be
    integer/string/boolean (validated against the schema BEFORE any data
    file lands) — see ``_check_bloom_cols``.

    Writer-side schema enforcement: the commit records the table schema in
    its meta, a type change on an existing column is rejected unless it is
    a widening-lattice upcast of the logged type (see
    :func:`widen_column_type`), and added/missing columns require
    ``merge_schema=True`` (additive evolution — pair with
    ``read(merge_schema=True)``); see :func:`_validate_append_schema`.

    ``auto_compact=True`` runs a best-effort post-commit compaction when
    at least ``auto_compact_min_files`` visible files are under half
    ``auto_compact_target_bytes`` — the Delta autoCompact shape that keeps
    a high-cadence append stream's file count bounded without a scheduled
    OPTIMIZE; see :func:`_auto_compact_after_commit`. The default ``None``
    defers to the table's ``autoCompact`` TBLPROPERTY (with
    ``autoCompact.minFiles`` / ``autoCompact.targetBytes`` overrides) so
    every writer inherits the table's policy; an explicit ``False`` opts
    this call out. The returned version is the APPEND's commit; a
    compaction that fires lands one more."""
    _check_bloom_cols(df, bloom_cols, path)
    # write defaults, then identity + generated columns join the batch
    # BEFORE any validation (they are part of the schema the validations
    # speak about; defaults first so generated/CHECK expressions see the
    # filled values)
    df = _apply_write_defaults(df, path)
    df, idents_meta = _apply_identity(df, path)
    df = _apply_generated(df, path)
    ident_cols = frozenset(idents_meta.get("identity", {}))
    _validate_append_schema(  # fail BEFORE data lands
        path, df, merge_schema, system_cols=ident_cols
    )
    _enforce_constraints(df, path)
    if partition_by:
        missing_p = [c for c in partition_by if c not in df.columns]
        if missing_p:
            raise ValueError(f"partition_by references unknown columns: {missing_p}")
    # Column mapping: land PHYSICAL column names. A merge_schema append may
    # re-introduce a logical name whose physical form is RESERVED (a
    # renamed-away or dropped column still present in old files) — it gets
    # a fresh generated physical name, or the old bytes would resurrect
    # under the new column.
    if _ROWID in df.columns and row_tracking_enabled(path):
        raise ValueError(
            f"{_ROWID!r} is the reserved row-tracking column; appended "
            f"frames must not carry it"
        )
    base_mapping = _column_mapping(path)
    mapping = dict(base_mapping)
    logged = latest_meta(path, "schema")
    reserved = _physical_reserved(path)
    generated: set[str] = set()
    for c in df.columns:
        if logged is not None and c not in logged and c in reserved:
            mapping[c] = f"{c}__c{uuid.uuid4().hex[:8]}"
            reserved.add(mapping[c])
            generated.add(c)
    map_meta = (
        {"column_mapping": mapping, "physical_reserved": sorted(reserved)}
        if generated
        else {}
    )
    phys_parts = [mapping.get(c, c) for c in partition_by] if partition_by else None
    adds = _write_data_files(_to_physical(df, mapping), path, phys_parts)
    p_stats = [mapping.get(c, c) for c in stats_cols] if stats_cols else stats_cols
    p_blooms = [mapping.get(c, c) for c in bloom_cols] if bloom_cols else bloom_cols
    stats = _collect_stats(path, adds, p_stats)
    blooms = _collect_blooms(path, adds, p_blooms)
    if partition_by:
        phys_types = {mapping.get(c, c): t for c, t in df.dtypes}
        pstats = _partition_stats(path, adds, phys_types)
        for rel, s in pstats.items():
            stats.setdefault(rel, {}).update(s)
    ident_advance = _advance_identity(path, adds, idents_meta)
    for _ in range(max_retries):
        # re-resolve against the tip each attempt: a racing writer may have
        # evolved the schema between our validation and our commit
        schema_meta = _validate_append_schema(
            path, df, merge_schema, system_cols=ident_cols
        )
        # identity values are BAKED into the landed files from the
        # watermark read above — if a concurrent identity append advanced
        # it since, our values would collide with the winner's range.
        # Surface the conflict (the caller re-runs; an explicit error
        # beats silently duplicated ids).
        if idents_meta:
            cur_id = latest_meta(path, "identity") or {}
            if any(
                cur_id.get(k, {}).get("next") != idents_meta["identity"][k]["next"]
                for k in idents_meta["identity"]
            ):
                raise CommitConflict(
                    "append lost an identity race: the identity watermark "
                    "moved after this append's values were assigned; "
                    "re-run the append"
                )
        # The data files above landed under the column mapping / reserved
        # set read BEFORE this loop. A concurrent rename_column/drop_column
        # that touches THIS append's columns (or any mapping drift while we
        # carry a stale full-mapping map_meta) would silently undo the DDL
        # or resurrect reserved physical bytes under a re-introduced
        # logical name — fail the whole transaction instead (ADVICE r8).
        # Benign races stay benign: plain appends and ADDITIVE schema
        # evolution by a racer never trip this (race-safe by design).
        cur_mapping = _column_mapping(path)
        drift = bool(generated) and cur_mapping != base_mapping
        if not drift:
            cur_logged = latest_meta(path, "schema")
            if cur_logged is not None:
                cur_reserved = _physical_reserved(path)
                for c in df.columns:
                    p = mapping.get(c, c)
                    if c in cur_logged:
                        if cur_mapping.get(c, c) != p:
                            drift = True  # rename raced onto our column
                            break
                    elif c not in generated and p in cur_reserved:
                        drift = True  # drop/rename made our layout stale
                        break
        if drift:
            raise CommitConflict(
                "append lost a metadata race: the table's column mapping "
                "changed (concurrent rename/drop) after this append's data "
                "files landed; re-run the append against the new schema"
            )
        # row tracking: RE-RESOLVE the flag and allocate fresh id ranges
        # PER ATTEMPT — a lost race re-reads the watermark the winner
        # advanced (ranges never overlap), and an enable_row_tracking that
        # landed since this append's files were written still gets bases
        # allocated (the landed files carry no ids of their own, so a
        # stale tracking=False would commit permanently uncovered files)
        rt_meta, row_bases = {}, None
        if row_tracking_enabled(path):
            if _ROWID in df.columns:
                raise CommitConflict(
                    f"append lost a metadata race: row tracking was enabled "
                    f"concurrently and the frame carries the reserved "
                    f"{_ROWID!r} column"
                )
            row_bases, wm = _alloc_row_bases(path, adds)
            rt_meta = {"row_id_watermark": wm}
        v = current_version(path) + 1
        commit_meta = {
            "op": "append",
            "schema": schema_meta,
            **map_meta,
            **rt_meta,
            **ident_advance,
            **(meta or {}),
        }
        # a NARROW producer on a widened column lands files the scan must
        # upcast — normally the widen declared 'type-widening' already,
        # but after drop_feature the protocol no longer carries it: fold
        # it back in (re-checked per attempt, so a concurrent drop is
        # also healed on retry)
        need = set()
        if any(
            schema_meta.get(c) != t
            and c in schema_meta
            and _widens_to(t, schema_meta[c])
            for c, t in df.dtypes
        ):
            need.add("type-widening")
        # same ladder rule for a freshly GENERATED physical mapping (a
        # reserved name re-introduced after drop_column): post-drop_feature
        # the protocol may no longer declare column-mapping, and a reader
        # without it would surface the generated physical name
        if generated:
            need.add("column-mapping")
        cur_feats = set(table_protocol(path).get("reader_features", []))
        if need - cur_feats:
            commit_meta = {
                **commit_meta,
                "protocol": {"reader_features": sorted(cur_feats | need)},
            }
        try:
            _try_commit(
                path,
                v,
                adds,
                [],
                stats,
                blooms,
                meta=commit_meta,
                row_bases=row_bases,
            )
            ac = auto_compact
            ac_min, ac_target = auto_compact_min_files, auto_compact_target_bytes
            if ac is None:
                # table-level policy (TBLPROPERTIES): None defers to the
                # autoCompact property so every writer of the table
                # inherits the setting; an explicit True/False overrides
                props = table_properties(path)
                ac = props.get("autoCompact", "").lower() == "true"
                if ac:
                    ac_min = int(props.get("autoCompact.minFiles", ac_min))
                    ac_target = int(
                        props.get("autoCompact.targetBytes", ac_target)
                    )
            if ac:
                # post-commit, best-effort (the Delta autoCompact shape):
                # the append above is already durable at version v; the
                # compaction lands as its own commit or not at all
                _auto_compact_after_commit(
                    df.sparkSession, path, ac_min, ac_target
                )
            return v
        except CommitConflict:
            continue
    raise CommitConflict(f"append lost {max_retries} commit races")


def append_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    bits: int = 8,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    merge_schema: bool = False,
) -> int:
    """Z-order-clustered append: range-partition + sort on the interleaved
    Morton key (io.zorder_value) so EVERY clustered column is range-bounded
    per file, then commit with per-file stats on those columns. The write
    that makes ``read_pruned`` effective on any clustered dimension — the
    OPTIMIZE ZORDER BY + stats-in-log composition, paid once at write
    time."""
    from pyspark.sql import functions as F

    from datalake_brief_spark.sources.io import zorder_value

    z = zorder_value(df, cluster_cols, bits=bits)
    arranged = (
        z.repartitionByRange(n_files, F.col("__zval"))
        .sortWithinPartitions("__zval")
        .drop("__zval")
    )
    return append(
        arranged,
        path,
        stats_cols=stats_cols or cluster_cols,
        bloom_cols=bloom_cols,
        merge_schema=merge_schema,
    )


def overwrite(
    df: DataFrame,
    path: str,
    stats_cols: list[str] | None = None,
    meta: dict | None = None,
) -> int:
    """Replace the table contents in one commit (adds new group, removes
    every file visible at the read version). If a concurrent commit lands
    in between, the conflict surfaces — the caller decides whether to
    re-run against the new state (write-write conflicts on overlapping data
    are not auto-mergeable, unlike appends).

    ``meta`` rides INSIDE the commit file, so application state (e.g. an
    incremental MV's reflected source version) becomes visible atomically
    with the data it describes — the Delta ``txn``-action pattern. Read it
    back with :func:`latest_meta`."""
    read_v = current_version(path)
    if row_tracking_enabled(path, read_v) and _ROWID in df.columns:
        raise ValueError(
            f"{_ROWID!r} is the reserved row-tracking column; overwritten "
            f"frames must not carry it"
        )
    # identity continues from the logged watermark (an overwrite replaces
    # ROWS, it never recycles identities); generated columns compute-or-
    # validate exactly as on append
    df, idents_meta = _apply_identity(df, path)
    df = _apply_generated(df, path)
    _enforce_constraints(df, path)
    removes = [os.path.relpath(p, path) for p in visible_files(path, read_v)]
    # overwrite replaces the WHOLE table: the new files carry the frame's
    # own (logical == physical) names, so any column mapping RESETS to
    # identity; the reservation list persists (old files stay on disk for
    # time travel, so their physical names are never reusable).
    map_meta = {}
    if _column_mapping(path, read_v):
        map_meta = {
            "column_mapping": {},
            "physical_reserved": sorted(
                _physical_reserved(path, read_v) | set(dict(df.dtypes))
            ),
        }
    if latest_meta(path, "bloom_retired", read_v):
        # a full overwrite removes every file whose blooms a chain-leaving
        # widen retired (they hashed the old integer representation); the
        # replacement files' blooms hash the CURRENT schema's values, so
        # keeping the retirement would silently filter fresh, valid blooms
        # out of visible_blooms forever — clear it with the mapping reset
        map_meta["bloom_retired"] = []
    cds = latest_meta(path, "column_defaults", read_v) or {}
    if cds:
        # no pre-add file survives a full replacement: INITIAL defaults
        # clear (the read path stops grouping); WRITE defaults survive
        # for the columns the new schema keeps
        map_meta["column_defaults"] = {
            c: {**d, "initial": None, "initial_value": None}
            for c, d in cds.items()
            if c in dict(df.dtypes)
        }
    adds = _write_data_files(df, path)
    stats = _collect_stats(path, adds, stats_cols)
    ident_advance = _advance_identity(path, adds, idents_meta)
    # row tracking: full overwrite replaces every row — fresh id ranges
    # for the new files (single-attempt commit, race → conflict)
    rt_meta, row_bases = {}, None
    if row_tracking_enabled(path, read_v):
        row_bases, wm = _alloc_row_bases(path, adds)
        rt_meta = {"row_id_watermark": wm}
    _try_commit(
        path,
        read_v + 1,
        adds,
        removes,
        stats,
        # overwrite replaces the WHOLE table, so its schema simply becomes
        # the table schema (Delta's overwriteSchema shape)
        meta={
            "op": "overwrite",
            "schema": dict(df.dtypes),
            **map_meta,
            **rt_meta,
            **ident_advance,
            **(meta or {}),
        },
        row_bases=row_bases,
    )
    return read_v + 1


def latest_meta(path: str, key: str, version: int | None = None):
    """Most recent commit-embedded ``meta[key]`` at or below ``version``
    (None if no commit carries it). Because the meta landed in the same
    O_EXCL commit file as the adds/removes it describes, a reader can never
    observe data from a commit without that commit's meta — no torn
    state/meta window exists.

    Checkpoint-accelerated like the file list (the Delta checkpoints-
    carry-metadata design): markers store the per-key latest-wins fold
    (``meta_latest``), so resolution walks only the post-checkpoint tail
    instead of the log back to whichever commit last recorded the key —
    O(versions) otherwise, on every logical-view build, for a table
    whose recent commits are all schema-silent mutations. Legacy markers
    without the fold keep the full walk.

    Pointer-accelerated like _replay: this runs on EVERY logical-view
    build (read → _logical_view → column mapping), so with a valid
    ``_last_checkpoint`` the tail walk uses probed versions and the
    marker comes straight from the pointer — zero log-directory listings
    on the hot read path."""
    ptr = _pointer_version(path)
    if ptr is not None and (version is None or ptr <= version):
        store = logstore.for_path(path)
        try:
            cp = json.loads(store.read_text(_checkpoint_path(path, ptr)))
        except (FileNotFoundError, ValueError):
            cp = None  # stale/torn pointer → listing path below
        if cp is not None:
            for v in reversed(_probe_tail(path, ptr, version)):
                m = _load_commit(path, v).get("meta", {})
                if key in m:
                    return m[key]
            if "meta_latest" in cp:
                return cp["meta_latest"].get(key)
            for v in reversed(_versions(path)):  # legacy marker: full walk
                if v > ptr:
                    continue
                m = _load_commit(path, v).get("meta", {})
                if key in m:
                    return m[key]
            return None
    cps = [v for v in _checkpoint_versions(path) if version is None or v <= version]
    cp_v = max(cps) if cps else 0
    stop_at = 0 if not cp_v else cp_v
    for v in reversed(_versions(path)):
        if version is not None and v > version:
            continue
        if v <= stop_at:
            break
        m = _load_commit(path, v).get("meta", {})
        if key in m:
            return m[key]
    if cp_v:
        cp = json.loads(
            logstore.for_path(path).read_text(_checkpoint_path(path, cp_v))
        )
        if "meta_latest" in cp:
            return cp["meta_latest"].get(key)
        for v in reversed(_versions(path)):
            if v > cp_v:
                continue
            m = _load_commit(path, v).get("meta", {})
            if key in m:
                return m[key]
    return None


def read(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Snapshot read (time travel with ``version=``): the plan scans exactly
    the log-resolved file list — uncommitted or vacuumed-away files can
    never leak in.

    ``merge_schema=True`` enables additive schema evolution: commits may
    carry new columns, and the snapshot unifies all visible footers (older
    rows read NULL for columns they predate — the standard lakehouse
    evolution contract). Off by default because schema unification reads
    every file's footer instead of one.

    Column mapping: the scan carries PHYSICAL column names; the returned
    frame is the LOGICAL view at ``version`` (renames aliased, dropped
    columns projected out) — identity on every table that never
    renamed/dropped."""
    _check_reader(path, version)
    files = visible_files(path, version)
    if not files:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    try:
        # Happy path stays metadata-only: Spark reads footers at plan
        # creation and raises PATH_NOT_FOUND itself if a file is gone —
        # only THEN do we pay the per-file existence sweep to diagnose a
        # vacuumed snapshot (never O(n_files) stat calls on every read).
        return _logical_view(
            _read_data(spark, path, files, merge_schema, version), path, version
        )
    except Exception as e:
        missing = [f for f in files if not os.path.exists(f)]
        if missing:
            v = current_version(path) if version is None else version
            raise FileNotFoundError(
                f"version {v} of table at {path!r} references vacuumed data "
                f"file(s), e.g. {os.path.relpath(missing[0], path)!r}; "
                f"earliest fully-readable version is "
                f"{earliest_readable_version(path)}"
            ) from e
        raise


def _commit_ts(path: str, version: int) -> "_dt.datetime":
    """Commit wall-clock: the ``ts`` recorded in the commit JSON, else the
    commit file's mtime (Delta's fallback for the same situation)."""
    p = _commit_path(path, version)
    with open(p) as f:
        ts = json.load(f).get("ts")
    if ts is not None:
        return _dt.datetime.fromisoformat(ts)
    return _dt.datetime.fromtimestamp(os.path.getmtime(p), _dt.timezone.utc)


def version_at_timestamp(path: str, ts: "_dt.datetime | str") -> int:
    """Resolve ``timestampAsOf`` semantics: the newest version whose commit
    wall-clock is ≤ ``ts`` (Delta's contract — you read the table as a
    reader at that instant would have). Naive datetimes/strings are taken
    as UTC. Raises if ``ts`` predates the first commit; a future ``ts``
    resolves to the current version. O(versions) metadata reads."""
    if isinstance(ts, str):
        ts = _dt.datetime.fromisoformat(ts)
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=_dt.timezone.utc)
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    chosen = None
    # Commit timestamps are clamped monotonic non-decreasing during the
    # scan (ts_v = max(ts_v, ts_prev)), exactly as Delta does: the mtime
    # fallback for pre-``ts`` commits, or writer clock skew, can make the
    # raw sequence dip, and an unclamped early-exit scan would then
    # mis-resolve a valid instant to an older version (or raise) even
    # though a later commit qualifies.
    clamped = None
    for v in vs:
        raw = _commit_ts(path, v)
        clamped = raw if clamped is None else max(clamped, raw)
        if clamped <= ts:
            chosen = v
        else:
            break
    if chosen is None:
        first = _commit_ts(path, vs[0]).isoformat()
        raise ValueError(
            f"timestamp {ts.isoformat()} predates the table's first commit "
            f"({first}); earliest readable timestamp is {first}"
        )
    return chosen


def read_at_timestamp(
    spark: SparkSession,
    path: str,
    ts: "_dt.datetime | str",
    merge_schema: bool = False,
) -> DataFrame:
    """Snapshot read as of a wall-clock instant (the Delta
    ``timestampAsOf`` surface): resolves the version via
    :func:`version_at_timestamp`, then reads that snapshot."""
    return read(spark, path, version=version_at_timestamp(path, ts), merge_schema=merge_schema)


def table_changes_between_timestamps(
    spark: SparkSession,
    path: str,
    from_ts: "_dt.datetime | str",
    to_ts: "_dt.datetime | str | None" = None,
) -> DataFrame:
    """Change data feed between two wall-clock instants — the timestamp
    twin of :func:`table_changes`: each endpoint resolves through
    :func:`version_at_timestamp` (newest commit at or before the
    instant), so "what changed since last night's run" needs no version
    bookkeeping on the caller's side."""
    from_v = version_at_timestamp(path, from_ts)
    to_v = None if to_ts is None else version_at_timestamp(path, to_ts)
    return table_changes(spark, path, from_v, to_v)


def earliest_readable_version(path: str) -> int:
    """Oldest version whose full file set still exists on disk — the time
    travel horizon after vacuums. Error-path/diagnostic helper: O(versions)
    log replays, no data pages."""
    for v in _versions(path):
        if all(os.path.exists(f) for f in visible_files(path, v)):
            return v
    raise FileNotFoundError(f"no fully-readable version at {path!r}")


def visible_stats(path: str, version: int | None = None) -> dict[str, dict[str, list]]:
    """Per-file min/max stats for the snapshot, resolved from the log the
    same way as the file list (checkpoint-accelerated). Files committed
    without ``stats_cols`` have no entry (reader must keep them)."""
    return {
        rel: e["stats"]
        for rel, e in _replay(path, version).items()
        if e.get("stats")
    }


def fast_count(path: str, version: int | None = None) -> int:
    """Exact ``COUNT(*)`` without scanning any data: per-file row counts
    land in every commit (and checkpoint), so the count is a sum over the
    log resolution — O(live files) metadata, independent of table bytes,
    the same trick Delta/Iceberg use to answer bare counts from the
    transaction log. Files from commits that predate row-count recording
    fall back to ONE parquet footer read each (still no data pages)."""
    _check_reader(path, version)
    live = _replay(path, version)
    if not live:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    total = 0
    for rel, e in live.items():
        n = e.get("rows")
        total += _file_rows(os.path.join(path, rel)) if n is None else int(n)
    return total


def read_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo=None,
    hi=None,
    version: int | None = None,
) -> DataFrame:
    """Snapshot read that skips data files whose logged [min, max] for
    ``col`` cannot intersect [lo, hi] (either bound may be None = open).
    The skip happens at PLAN BUILD from the log alone — no footer reads, no
    listing, no scan of skipped files; ``df.inputFiles()`` shows only
    survivors. Files without logged stats are conservatively kept, and the
    residual predicate is applied to survivors, so results always equal
    ``read().filter(...)`` — stats only ever remove whole files that cannot
    match. This is the read half of the data-skipping story: write-side
    clustering (io.write_sorted / write_zorder) makes the per-file ranges
    narrow, the log carries them, and this read turns them into IO savings
    proportional to selectivity. ``col`` is the LOGICAL name; stats are
    keyed by the physical name (files never change), so a rename costs
    no skipping."""
    _check_reader(path, version)
    all_files = visible_files(path, version)
    if not all_files:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    stats = visible_stats(path, version)
    pcol = _phys_name(path, version, col)
    c_lo, c_hi = _canon_bound(lo), _canon_bound(hi)
    keep = []
    for abs_p in all_files:
        rel = os.path.relpath(abs_p, path)
        rng = stats.get(rel, {}).get(pcol)
        if rng is None:
            keep.append(abs_p)
            continue
        if _range_excludes(rng, c_lo, c_hi):
            continue
        keep.append(abs_p)
    if not keep:
        df = _read_data(spark, path, all_files, version=version).limit(0)
    else:
        df = _read_data(spark, path, keep, version=version)
    df = _logical_view(df, path, version)
    if lo is not None:
        df = df.filter(F.col(col) >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col(col) <= F.lit(hi))
    return df


def read_pruned_nulls(
    spark: SparkSession,
    path: str,
    col: str,
    is_null: bool = True,
    version: int | None = None,
) -> DataFrame:
    """``IS [NOT] NULL`` read that skips files from the log's null counts
    (the Delta ``nullCount`` stat): an ``IS NULL`` probe skips every file
    whose logged null_count is 0; ``IS NOT NULL`` skips files that are
    all-null (null_count == the file's row count). Neither min/max ranges
    nor blooms can answer these — NULL never satisfies a range predicate
    and never enters a bloom — so the null tally is its own skip channel.
    Same conservative contract as every pruned read: files without the
    stat are kept, the residual predicate applies, results always equal
    ``read().filter(...)``."""
    _check_reader(path, version)
    live = _replay(path, version)
    if not live:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    pcol = _phys_name(path, version, col)
    keep = []
    for rel in sorted(live):
        e = live[rel]
        st = (e.get("stats") or {}).get(pcol)
        nc = st[2] if st is not None and len(st) > 2 else None
        rows = e.get("rows")
        if nc is not None:
            if is_null and int(nc) == 0:
                continue
            if not is_null and rows is not None and int(nc) == int(rows):
                continue
        keep.append(os.path.join(path, rel))
    if not keep:
        all_files = [os.path.join(path, rel) for rel in sorted(live)]
        df = _read_data(spark, path, all_files, version=version).limit(0)
    else:
        df = _read_data(spark, path, keep, version=version)
    df = _logical_view(df, path, version)
    return df.filter(F.col(col).isNull() if is_null else F.col(col).isNotNull())


def merge(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
) -> int:
    """Latest-wins MERGE as one atomic commit: per key, keep the
    max-``order_col`` row among {existing row, updates rows}. Since round
    10 this is a thin wrapper over the clause-based :func:`merge_into` —
    the updates batch is first reduced to its own per-key winner (one
    window over the UPDATES, cost ∝ |updates|), then merged with
    ``whenMatched UPDATE`` conditioned on ``s.order > t.order``
    (STRICTLY newer: an update whose ``order_col`` equals the existing
    row's is a re-delivery, and condition-aware pruning then rewrites
    ZERO files and commits NOTHING — the streaming MERGE sink's
    at-least-once replays become true no-ops, no file churn, no no-op
    CDF pairs) plus ``whenNotMatched INSERT`` — so only the files that
    actually contain NEWLY-updated keys are rewritten, instead of the
    whole snapshot. A same-order update carrying DIFFERENT values is a
    data bug upstream (order columns must totally order versions, see
    the sink's fixed-width ``ord`` convention); the old union-window
    picked one nondeterministically, this form deterministically keeps
    the existing row.

    Additive schema evolution on MERGE (the Delta ``mergeSchema`` upsert
    contract): an updates batch may carry columns the table predates —
    existing rows read NULL for them — and may omit columns the table
    has — a WINNING update row reads NULL there (latest-wins replaces the
    whole row, so table-only columns are explicitly assigned NULL, not
    kept). Key and order columns must exist in the updates batch; a table
    that predates ``order_col`` treats every existing row as older than
    any update."""
    read_v = current_version(path)
    _enforce_constraints(updates, path)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    latest = (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if read_v == 0:
        # Same contract on an empty table: one row per key survives, not a
        # verbatim append of a possibly multi-row-per-key updates batch.
        return append(latest, path)
    table_cols = list(
        (latest_meta(path, "schema", read_v) or dict(read(spark, path, read_v).dtypes))
    )
    upd_cols = set(latest.columns)
    post_cols = table_cols + [c for c in latest.columns if c not in set(table_cols)]
    # latest-wins replaces the WHOLE row: source columns from the update,
    # table-only columns explicitly NULL (the old union-window semantics)
    assigns = {
        c: (F.col(f"s.`{c}`") if c in upd_cols else F.lit(None))
        for c in post_cols
    }
    newer = F.col(f"t.`{order_col}`").isNull() | (
        F.col(f"s.`{order_col}`") > F.col(f"t.`{order_col}`")
    ) if order_col in table_cols else F.lit(True)
    return merge_into(
        spark,
        path,
        latest,
        keys,
        when_matched=[("update", assigns, newer)],
        when_not_matched=True,
        merge_schema=True,
    )


_MERGE_BLOOM_PROBE_MAX = 4096

#: MERGE broadcasts its source-side joins when the source holds at most
#: this many rows (~64 MB at CDC-typical row widths — the session's
#: autoBroadcastJoinThreshold). Needed because Python-created sources
#: plan as LogicalRDD with an UNKNOWN size statistic, which the planner
#: treats as enormous and never broadcasts; past the cap the usual
#: shuffle join stands.
_MERGE_BROADCAST_MAX_ROWS = 1_000_000


def _merge_candidate_files(
    spark: SparkSession,
    path: str,
    read_v: int,
    source: DataFrame,
    keys: list[str],
) -> tuple[list[str], dict]:
    """File-level candidate pruning for MERGE: which of the snapshot's
    files COULD contain a row whose key equals some source key. Three
    layers, driver cost bounded by metadata (never table data):

    1. **Range skip** — one agg over the source computes each key
       column's [min, max]; a file whose logged stats cannot intersect
       that envelope on ANY key column is out (a matching row would need
       equality on EVERY key column).
    2. **Bloom skip** — when the source's distinct key values on a
       bloom-indexed column fit under ``_MERGE_BLOOM_PROBE_MAX``, probe
       each surviving file's bloom: a file whose filter excludes every
       source value of that column cannot match.
    3. The caller's exact match scan (a semi-join of the survivors
       against the source keys) decides the final rewrite set.

    Returns ``(candidate absolute paths, {key: (lo, hi)} envelope,
    n_source_rows, src_keys_unique)`` — the envelope doubles as the WriteSerializable
    phantom predicate; the row count (free: it rides the SAME one-pass
    agg as the envelope) drives the explicit broadcast decision for the
    merge's source-side joins. A Python-created source plans as a
    LogicalRDD whose size statistic is UNKNOWN (Spark substitutes
    defaultSizeInBytes ≈ 8 EB), so the planner NEVER auto-broadcasts it
    and every merge join sort-merges the whole candidate band — measured
    4-8× of pure sort waste on a 16M-row band against a 40-row CDC
    batch."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    nn = None
    for k in keys:
        aggs += [F.min(k).alias(f"__lo_{k}"), F.max(k).alias(f"__hi_{k}")]
        leg = F.col(k).isNotNull()
        nn = leg if nn is None else (nn & leg)
    # key-uniqueness rides the SAME one-pass agg (r14): when every non-null
    # key tuple is distinct, NO target row can match two source rows, so
    # the caller skips the dup-keys guard job entirely — one fewer Spark
    # job per merge in the overwhelmingly common unique-key CDC case.
    # Null-key rows never equi-match anything, so they are excluded from
    # both sides of the comparison.
    aggs += [
        F.count_if(nn).alias("__nn"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("__nd"),
    ]
    row = source.agg(*aggs).collect()[0].asDict()
    envelope = {k: (row[f"__lo_{k}"], row[f"__hi_{k}"]) for k in keys}
    n_src = int(row["__n"])
    src_keys_unique = int(row["__nd"]) == int(row["__nn"])
    all_files = visible_files(path, read_v)
    if any(lo is None for lo, _ in envelope.values()):
        # some key column is all-NULL in the source → no source tuple can
        # equal any target tuple (NULL never matches an equi-join)
        return [], envelope, n_src, src_keys_unique
    stats = visible_stats(path, read_v)
    phys = {k: _phys_name(path, read_v, k) for k in keys}
    canon = {k: (_canon_bound(lo), _canon_bound(hi)) for k, (lo, hi) in envelope.items()}
    candidates = []
    for abs_p in all_files:
        fstats = stats.get(os.path.relpath(abs_p, path), {})
        if any(
            _range_excludes(fstats.get(phys[k]), *canon[k]) for k in keys
        ):
            continue
        candidates.append(abs_p)
    if not candidates:
        return [], envelope, n_src, src_keys_unique
    # bloom probe: per key column, collect the source's distinct values
    # only when bounded (the driver holds ≤ _MERGE_BLOOM_PROBE_MAX values)
    blooms = visible_blooms(path, read_v)
    for k in keys:
        if not any(
            phys[k] in blooms.get(os.path.relpath(p, path), {}) for p in candidates
        ):
            continue
        vals = [
            r[0]
            for r in source.select(k)
            .where(F.col(k).isNotNull())
            .distinct()
            .limit(_MERGE_BLOOM_PROBE_MAX + 1)
            .collect()
        ]
        if len(vals) > _MERGE_BLOOM_PROBE_MAX:
            continue  # unbounded key set: stats + match scan carry it
        kept = []
        for abs_p in candidates:
            b64 = blooms.get(os.path.relpath(abs_p, path), {}).get(phys[k])
            if b64 is not None and not any(
                _bloom_may_contain(b64, v) for v in vals
            ):
                continue
            kept.append(abs_p)
        candidates = kept
        if not candidates:
            break
    return candidates, envelope, n_src, src_keys_unique


def merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    when_matched: list[tuple] | None = None,
    when_not_matched=True,
    when_not_matched_by_source: list[tuple] | None = None,
    merge_schema: bool = False,
    use_dvs: bool | None = None,
) -> int:
    """Clause-based MERGE INTO (the Delta/SQL:2003 ``MERGE`` contract) as
    one atomic, FILE-PRUNED commit: only files that contain source keys
    are rewritten; every other file stays referenced byte-identical, so
    cost tracks the matched data, never the table (the #1 requirement for
    a CDC upsert stream into a 100 TB table — the old latest-wins form
    rewrote the whole snapshot every call).

    ``keys`` is the equi-join condition (target.k = source.k per column;
    SQL semantics — NULL keys never match). Clauses:

    - ``when_matched``: ordered list of ``("update", assignments, cond)``
      / ``("delete", cond)`` (``cond`` optional in both; trailing element
      may be omitted). The FIRST clause whose condition is TRUE (NULL →
      false) applies to a matched row; no true clause → the row passes
      through unchanged. Every clause except the last must carry a
      condition (later clauses would be unreachable — the Delta rule).
      ``assignments`` is ``{col: expr}`` (Column or SQL string; reference
      the two sides as ``t.<col>`` / ``s.<col>``) or ``"*"`` = set every
      column present in the source from the source, keep the rest.
    - ``when_not_matched``: ``True`` (insert source rows verbatim, table
      columns the source lacks read NULL), ``("insert", values, cond)``
      (``values`` = ``{col: expr}`` over source columns or None for
      verbatim), or ``None``/``False`` (insert-nothing).
    - ``when_not_matched_by_source``: ordered ``("update", assignments,
      cond)`` / ``("delete", cond)`` clauses for TARGET rows with no
      source match (the Delta ``whenNotMatchedBySource`` surface — "age
      out everything this snapshot didn't mention"). Conditions and
      assignments may reference ``t.<col>`` only (there is no source
      row). COST NOTE: any file may hold unmatched rows, so these
      clauses scan the whole snapshot and rewrite every file where one
      fires — inherent to the semantics (Delta's docs say the same);
      condition-aware pruning still spares files where no clause fires.

    Matching rows are found with the same metadata-first ladder as the
    CoW mutations: per-file stats envelope skip + bloom probe
    (:func:`_merge_candidate_files`), then ONE semi-join scan tags the
    files that actually hold source keys. A target row matched by MORE
    THAN ONE source row with any when_matched clause raises (the Delta
    "multiple source rows matched" rule — the result would be
    nondeterministic).

    Row tracking: matched rows KEEP their stable ids — the rewrite rides
    :func:`_read_files_with_dvs`, which materializes each row's id into
    the replacement files exactly like CoW UPDATE — and only the
    not-matched INSERT file group allocates fresh ranges. The change
    record carries each updated row's delete+insert pair sharing one id.

    Additive schema evolution needs ``merge_schema=True`` (source columns
    the table lacks extend the logical schema; existing rows read NULL).
    Concurrency: WriteSerializable via :func:`_commit_serializable` with
    the key envelope as the phantom predicate — a concurrent append
    inside the source's key range conflicts, disjoint appends re-target.
    Returns the new version (the current one when nothing changed).

    ``use_dvs=True`` (or the ``deletionVectors`` = 'true' TBLPROPERTY,
    overridable per call) switches the matched UPDATE/DELETE clauses to
    MERGE-ON-READ: clause-hit rows' pre-image POSITIONS land in a
    deletion-vector sidecar and ONLY the rewritten update outputs append
    as a new file group — ZERO matched data files rewrite, so a CDC
    merge touching 1 row in each of 1,000 files writes one sidecar + one
    small file group instead of 1,000 file rewrites (cost ∝ touched
    ROWS, not touched FILES — the Delta merge-with-DVs shape). The
    contract surface is identical to the CoW path: same clause
    semantics, same CDF delete+insert pairs sharing stable row ids, same
    WriteSerializable conflicts; readers must use :func:`read_mor` (plain
    :func:`read` sees pre-merge rows — the delete_where_dv contract),
    and OPTIMIZE/REORG PURGE materialize later. Default (``None``)
    consults the table property and falls back to copy-on-write."""
    read_v = current_version(path)
    if read_v == 0:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    if not keys:
        raise ValueError("merge_into needs at least one key column")
    if use_dvs is None:
        use_dvs = (
            table_properties(path, read_v).get("deletionVectors", "").lower()
            == "true"
        )
    # --- normalize clauses -------------------------------------------------
    matched_clauses: list[tuple] = []
    for cl in when_matched or []:
        kind = cl[0]
        if kind == "update":
            assigns = cl[1]
            cond = cl[2] if len(cl) > 2 else None
        elif kind == "delete":
            assigns = None
            cond = cl[1] if len(cl) > 1 else None
        else:
            raise ValueError(f"unknown when_matched clause kind {kind!r}")
        matched_clauses.append((kind, assigns, cond))
    for kind, _, cond in matched_clauses[:-1]:
        if cond is None:
            raise ValueError(
                "every when_matched clause except the last needs a "
                "condition (later clauses would be unreachable)"
            )
    bys_clauses: list[tuple] = []
    for cl in when_not_matched_by_source or []:
        kind = cl[0]
        if kind == "update":
            assigns = cl[1]
            cond = cl[2] if len(cl) > 2 else None
        elif kind == "delete":
            assigns = None
            cond = cl[1] if len(cl) > 1 else None
        else:
            raise ValueError(
                f"unknown when_not_matched_by_source clause kind {kind!r}"
            )
        if assigns == "*":
            raise ValueError(
                "when_not_matched_by_source UPDATE cannot use '*' — there "
                "is no source row to copy from"
            )
        bys_clauses.append((kind, assigns, cond))
    for kind, _, cond in bys_clauses[:-1]:
        if cond is None:
            raise ValueError(
                "every when_not_matched_by_source clause except the last "
                "needs a condition (later clauses would be unreachable)"
            )
    if when_not_matched is True:
        ins_clause = (None, None)
    elif when_not_matched in (None, False):
        ins_clause = None
    else:
        if when_not_matched[0] != "insert":
            raise ValueError(
                f"unknown when_not_matched clause {when_not_matched[0]!r}"
            )
        ins_clause = (
            when_not_matched[1] if len(when_not_matched) > 1 else None,
            when_not_matched[2] if len(when_not_matched) > 2 else None,
        )
    if not matched_clauses and ins_clause is None and not bys_clauses:
        raise ValueError("merge_into with no clauses is a no-op by construction")

    def _as_cond(c):
        return F.expr(c) if isinstance(c, str) else c

    # --- post-merge schema -------------------------------------------------
    table_df = read(spark, path, read_v, merge_schema=True)
    table_fields = dict(table_df.dtypes)
    src_fields = dict(source.dtypes)
    missing_keys = [k for k in keys if k not in table_fields or k not in src_fields]
    if missing_keys:
        raise ValueError(
            f"merge keys must exist on both sides; missing: {missing_keys}"
        )
    extra = [c for c in source.columns if c not in table_fields]
    if extra and not merge_schema:
        # source-only columns are fine as condition/assignment INPUTS
        # (e.g. a delete flag) — they only evolve the table when a
        # verbatim clause would WRITE them, and that needs the opt-in
        writes_all = any(
            kind == "update" and assigns == "*"
            for kind, assigns, _ in matched_clauses
        ) or (ins_clause is not None and ins_clause[0] is None)
        if writes_all:
            raise ValueError(
                f"source adds columns the table does not have ({extra}) "
                f"and a verbatim clause (UPDATE */INSERT) would write "
                f"them; pass merge_schema=True to evolve the schema "
                f"additively"
            )
        extra = []
    post_cols = list(table_fields) + extra
    post_types = {**table_fields, **{c: src_fields[c] for c in extra}}
    tracking = row_tracking_enabled(path, read_v)
    if _ROWID in source.columns:
        raise ValueError(
            f"{_ROWID!r} is the reserved row-tracking column; merge "
            f"sources must not carry it"
        )
    # GENERATED ALWAYS AS IDENTITY under MERGE: the table's identity
    # columns are assigned by the engine — ALWAYS mode rejects any clause
    # that would write them. INSERT *is* supported (VERDICT r10 ask #3):
    # values are reserved per commit ATTEMPT inside _commit_serializable's
    # retry body (the same per-attempt re-read append's loop does for row
    # bases), so a lost race re-lands the insert files with fresh ids off
    # the winner's advanced watermark instead of refusing — see the
    # ins_factory built in phase 3.
    idents = latest_meta(path, "identity", read_v) or {}
    if idents:
        bad_src = [c for c in idents if c in source.columns]
        if bad_src and (
            ins_clause is not None
            or any(a == "*" for _, a, _ in matched_clauses)
        ):
            raise ValueError(
                f"{bad_src} are GENERATED ALWAYS AS IDENTITY; merge "
                f"sources must not supply them to an INSERT or UPDATE * "
                f"clause"
            )
        for _kind, assigns, _ in matched_clauses + bys_clauses:
            if isinstance(assigns, dict) and set(assigns) & set(idents):
                raise ValueError(
                    f"{sorted(set(assigns) & set(idents))} are GENERATED "
                    f"ALWAYS AS IDENTITY; merge clauses must not assign "
                    f"them"
                )
        if ins_clause is not None and isinstance(ins_clause[0], dict):
            if set(ins_clause[0]) & set(idents):
                raise ValueError(
                    f"{sorted(set(ins_clause[0]) & set(idents))} are "
                    f"GENERATED ALWAYS AS IDENTITY; INSERT values must "
                    f"not supply them"
                )

    # --- phase 1: which files contain source keys, and which must REWRITE --
    # Two file sets fall out of one scan of the stats/bloom candidates:
    # ``matched`` (≥1 key-matched row — the INSERT anti-join must see all
    # of these, or a source key whose target rows fail every clause
    # condition would wrongly re-insert) and ``rewrite`` (≥1 key-matched
    # row where some clause CONDITION fires — only these files change;
    # a CDC batch re-delivering already-applied rows touches ZERO files).
    # Materialize the source ONCE for the whole merge (Delta's
    # merge.materializeSource): the envelope agg, the bloom probe, the
    # dup-keys guard, and every join build below each run as their own
    # job, and each would otherwise re-evaluate the source plan from
    # scratch — a Python-created (LogicalRDD) CDC batch re-pays its
    # Python-worker evaluation PER JOB (measured seconds each, dwarfing
    # the actual merge work), and a non-deterministic source could even
    # change between phases. First evaluation fills the cache; every
    # later job reads it. Released in the finally with the joined frame.
    _src_persisted = False
    if not (source.storageLevel.useMemory or source.storageLevel.useDisk):
        source = source.persist()
        _src_persisted = True
    candidates, envelope, n_src, _src_keys_unique = _merge_candidate_files(
        spark, path, read_v, source, keys
    )
    # Explicit broadcast decision for every source-side join below: a
    # Python/RDD-backed source has NO size statistic (the planner sees
    # ~8 EB and sort-merges), so the engine decides from the row count it
    # already paid for. Above the cap the planner's choice stands — a
    # multi-GB CDC batch must never be forced onto every executor.
    if n_src <= _MERGE_BROADCAST_MAX_ROWS:
        _src_b = F.broadcast
    else:
        def _src_b(df):
            return df
    matched: list[str] = []
    rewrite: list[str] = []
    on = None
    for k in keys:
        leg = F.col(f"t.`{k}`") == F.col(f"s.`{k}`")
        on = leg if on is None else (on & leg)

    def _or_conds(clauses):
        fires = F.lit(False)
        for _kind, _a, cond in clauses:
            leg = (
                F.lit(True)
                if cond is None
                else F.coalesce(_as_cond(cond), F.lit(False))
            )
            fires = fires | leg
        return fires

    # by-source clauses act on rows with NO source match — any file may
    # hold one, so their scan is the whole snapshot (inherent; see doc)
    scan_files = visible_files(path, read_v) if bys_clauses else candidates
    if scan_files:
        from urllib.parse import unquote, urlparse

        def _norm(p: str) -> str:
            return unquote(urlparse(p).path) if p.startswith("file:") else p

        # the file tag must be a REAL column before the join —
        # input_file_name()/_metadata resolve on the scan stage only, and
        # a post-shuffle evaluation would return "" (wrong files matched)
        raw = _read_data(spark, path, scan_files, merge_schema=True, version=read_v)
        raw = raw.select("*", F.col("_metadata.file_path").alias("__fp"))
        scan = _logical_view(raw, path, read_v, passthrough=("__fp",))
        fires = _or_conds(matched_clauses)
        if bys_clauses:
            srcm1 = source.withColumn("__m", F.lit(True))
            jj = scan.alias("t").join(_src_b(srcm1.alias("s")), on, "left_outer")
            m = F.coalesce(F.col("s.__m"), F.lit(False))
            need = (m & fires) | (~m & _or_conds(bys_clauses))
            per_file = (
                jj.groupBy(F.col("t.__fp").alias("__fp"))
                .agg(
                    F.max(need.cast("int")).alias("__need"),
                    F.max(m.cast("int")).alias("__haskey"),
                )
                .collect()
            )
            matched = [_norm(r["__fp"]) for r in per_file if r["__haskey"]]
            rewrite = [_norm(r["__fp"]) for r in per_file if r["__need"]]
        else:
            per_file = (
                scan.alias("t")
                .join(_src_b(source.alias("s")), on, "inner")
                .groupBy(F.col("t.__fp").alias("__fp"))
                .agg(F.max(fires.cast("int")).alias("__need"))
                .collect()
            )
            matched = [_norm(r["__fp"]) for r in per_file]
            rewrite = [_norm(r["__fp"]) for r in per_file if r["__need"]]
    # phantom predicate for the conflict-resolution probe: a concurrent
    # append inside the source's key envelope may hold a row a serial
    # MERGE would have matched → conflict. All-NULL key column → nothing
    # can ever match (lit False short-circuits the conjunction).
    phantom = None
    for k, (lo, hi) in envelope.items():
        leg = (
            F.col(k).between(F.lit(lo), F.lit(hi))
            if lo is not None
            else F.lit(False)
        )
        phantom = leg if phantom is None else (phantom & leg)
    if bys_clauses:
        # ANY concurrently appended row is "not matched by source" — a
        # serial merge would have clause-processed it, so every append
        # inside the window conflicts (conservative and correct)
        phantom = F.lit(True)

    # Column mapping for the landed files. Evolution may re-introduce a
    # logical name whose physical form is RESERVED (dropped earlier, or
    # renamed away) — exactly append's hazard: identity-mapping it would
    # let the retired bytes in UNTOUCHED files resurrect under the new
    # column. Generate a fresh physical name, same scheme as append.
    # (Concurrent mapping DDL is fenced: rename/drop are _SNAPSHOT_OPS,
    # so the commit retry below surfaces any race instead of drifting.)
    mapping = dict(_column_mapping(path, read_v))
    mapping_meta: dict = {}
    if extra:
        reserved = _physical_reserved(path, read_v)
        for c in extra:
            if c in reserved:
                mapping[c] = f"{c}__c{uuid.uuid4().hex[:8]}"
        reserved |= {mapping.get(c, c) for c in extra}
        if mapping:
            mapping_meta = {
                "column_mapping": mapping,
                "physical_reserved": sorted(reserved),
            }
    adds: list[str] = []
    removes: list[str] = []
    dv_adds: dict[str, str] = {}
    _sweep: list[str] = []  # pre-landed groups a losing writer must reclaim
    change_legs: list[DataFrame] = []
    rowid_pass = ()

    # Frames re-evaluated across several actions inside one commit are
    # persisted for the commit's duration and dropped in the finally
    # (VERDICT r10 ask #4: the joined rewrite frame fed the rewritten
    # output plus up to five change-feed legs as redundant scans).
    _cached: list = []
    # r14 (guide §2.6 — overlap independent jobs): the phase-2 data-file
    # write, the change-feed write and the phase-3 insert job are
    # INDEPENDENT Spark jobs (all derive from the persisted join frame /
    # the persisted source, none reads another's output), yet they ran
    # strictly serially — each job's straggler tail left the cluster idle.
    # The phase-2 write is submitted to a driver thread; the change/insert
    # jobs back-fill its tail, and the future resolves before the stats
    # collection that needs the written paths (and in the finally on every
    # error path). Spark's cache locks serialize the first materialization
    # of the shared persisted frame, so no work duplicates.
    from concurrent.futures import ThreadPoolExecutor

    _write_pool: ThreadPoolExecutor | None = None
    _pending_adds: tuple | None = None  # (future, insert_at, dv_sweep)
    try:
        # --- phase 2: rewrite the files where a clause fires ---------------------
        tgt_m = None
        if matched:
            # ALL key-matched files (DV-applied): the insert anti-join's view
            # of "exists in target" — a superset of the rewrite set when
            # clause conditions spared some files
            tgt_m = _read_files_with_dvs(spark, path, read_v, matched)
            for name, dtype in table_fields.items():
                if name not in tgt_m.columns:
                    tgt_m = tgt_m.withColumn(name, F.lit(None).cast(dtype))
        if rewrite and (matched_clauses or bys_clauses):
            if use_dvs:
                # merge-on-read input: DV-applied rows WITH their (file,
                # row_index) position tags — clause hits land as sidecar
                # positions instead of file rewrites
                tgt_r = _tagged_live_frame(spark, path, read_v, rewrite)
            else:
                tgt_r = _read_files_with_dvs(spark, path, read_v, rewrite)
            for name, dtype in table_fields.items():
                if name not in tgt_r.columns:
                    tgt_r = tgt_r.withColumn(name, F.lit(None).cast(dtype))
            if matched_clauses and not _src_keys_unique:
                # the Delta nondeterminism rule: >1 source row matching one
                # target row with any when_matched clause is ill-defined.
                # Skipped outright when the candidate-pruning agg already
                # proved every non-null source key tuple distinct (r14) —
                # no target row can then match two source rows, and the
                # guard's semi-join job is pure overhead in the common
                # unique-key CDC case.
                dup_keys = (
                    source.groupBy(*keys)
                    .agg(F.count(F.lit(1)).alias("__n"))
                    .filter(F.col("__n") > 1)
                    .select(*keys)
                )
                if tgt_r.join(_src_b(dup_keys), keys, "left_semi").limit(1).count():
                    raise ValueError(
                        "merge_into: multiple source rows match the same target "
                        "row — de-duplicate the source on the merge keys first"
                    )
            srcm = source.withColumn("__m", F.lit(True))
            # the DV path only ever consumes CLAUSE-HIT rows (sidecar
            # positions, appended updates, change legs) — with no
            # by-source clauses every hit is key-MATCHED, so the band
            # joins INNER: the probe streams the candidate scan but
            # materializes only the hits, instead of the left-outer
            # materializing every band row (tags, source columns, clause
            # CASE chains) just to filter ~all of them back out. At a
            # 16M-row band with 40 hits this is the difference between
            # the join costing ~the scan and costing 8x the scan. CoW
            # (and by-source clauses) still needs the unmatched rows —
            # survivors re-land in the rewritten files — so it keeps the
            # left outer join.
            jtype = "inner" if (use_dvs and not bys_clauses) else "left_outer"
            j = tgt_r.alias("t").join(_src_b(srcm.alias("s")), on, jtype)
            is_matched = F.coalesce(F.col("s.__m"), F.lit(False))

            def _act_chain(clauses, gate):
                chain = None
                for i, (kind, _, cond) in enumerate(clauses):
                    c = gate
                    if cond is not None:
                        c = c & F.coalesce(_as_cond(cond), F.lit(False))
                    chain = (
                        F.when(c, F.lit(i)) if chain is None else chain.when(c, F.lit(i))
                    )
                return F.lit(-1) if chain is None else chain.otherwise(F.lit(-1))

            j = j.withColumn("__act", _act_chain(matched_clauses, is_matched))
            j = j.withColumn("__bact", _act_chain(bys_clauses, ~is_matched))
            # persist: the joined frame feeds the rewritten output AND up
            # to five change-feed legs — without it each leg re-scans and
            # re-joins the matched files (a 2–4× constant of redundant
            # work per merge, bounded by the touched band but pure waste).
            # CoW must cache ALL rows of the touched files (they all
            # re-land); the DV path's every output — sidecar positions,
            # appended update rows, change legs — derives from CLAUSE-HIT
            # rows only, so it caches exactly those: ONE scan of the
            # candidate band materializes a hit-row-sized cache, and all
            # later actions are O(hits), never O(band).
            if use_dvs:
                j = j.filter(
                    (F.col("__act") >= 0) | (F.col("__bact") >= 0)
                ).persist()
            else:
                j = j.persist()
            _cached.append(j)

            def t_val(c):
                if c in tgt_r.columns:
                    return F.col(f"t.`{c}`")
                return F.lit(None).cast(post_types[c])

            out_vals, pre_vals = [], []
            for c in post_cols:
                v = t_val(c)
                for i, (kind, assigns, _) in enumerate(matched_clauses):
                    if kind != "update":
                        continue
                    if assigns == "*":
                        av = F.col(f"s.`{c}`") if c in source.columns else None
                    else:
                        unknown = set(assigns) - set(post_cols)
                        if unknown:
                            raise ValueError(
                                f"update assignments reference unknown "
                                f"columns: {sorted(unknown)}"
                            )
                        av = assigns.get(c)
                        if av is not None:
                            av = F.expr(av) if isinstance(av, str) else av
                    if av is not None:
                        v = F.when(
                            F.col("__act") == i, av.cast(post_types[c])
                        ).otherwise(v)
                for i, (kind, assigns, _) in enumerate(bys_clauses):
                    if kind != "update":
                        continue
                    unknown = set(assigns) - set(post_cols)
                    if unknown:
                        raise ValueError(
                            f"by-source update assignments reference unknown "
                            f"columns: {sorted(unknown)}"
                        )
                    av = assigns.get(c)
                    if av is not None:
                        av = F.expr(av) if isinstance(av, str) else av
                        v = F.when(
                            F.col("__bact") == i, av.cast(post_types[c])
                        ).otherwise(v)
                out_vals.append(v.alias(c))
                pre_vals.append(t_val(c).alias(c))
            del_idx = [i for i, (k, _, _) in enumerate(matched_clauses) if k == "delete"]
            upd_idx = [i for i, (k, _, _) in enumerate(matched_clauses) if k == "update"]
            bs_del = [i for i, (k, _, _) in enumerate(bys_clauses) if k == "delete"]
            bs_upd = [i for i, (k, _, _) in enumerate(bys_clauses) if k == "update"]
            if tracking:
                rowid_pass = (F.col(f"t.`{_ROWID}`").alias(_ROWID),)
            phase2_live = True
            if use_dvs:
                # merge-on-read: every clause-hit row's PRE-IMAGE position
                # lands in one DV sidecar group (hiding it from read_mor);
                # only the UPDATE outputs append. No candidate file is
                # rewritten — cost ∝ hit rows, never file count.
                dv_group = os.path.join(_DV_DIR, uuid.uuid4().hex)
                dv_target = os.path.join(path, dv_group)
                # j is already the persisted clause-hit subset here
                j.select(
                    F.col("t.__fn").alias("file_name"),
                    F.col("t.__ri").alias("row_index"),
                ).write.mode("error").parquet(dv_target)
                touched = [
                    r.file_name
                    for r in spark.read.parquet(dv_target)
                    .select("file_name")
                    .distinct()
                    .collect()
                ]
                if not touched:
                    # every phase-1 hit row was already DV-dead (phase 1
                    # scans raw files): phase 2 contributes nothing — the
                    # redelivered-batch no-op shape
                    logstore.for_path(path).delete_tree(dv_target)
                    phase2_live = False
                else:
                    _sweep.append(dv_target)
                    by_base = {
                        os.path.basename(p): os.path.relpath(p, path)
                        for p in visible_files(path, read_v)
                    }
                    dv_adds = {
                        by_base[fn]: dv_group for fn in touched if fn in by_base
                    }
                    upd_hit = F.lit(False)
                    if upd_idx:
                        upd_hit = upd_hit | F.col("__act").isin(upd_idx)
                    if bs_upd:
                        upd_hit = upd_hit | F.col("__bact").isin(bs_upd)
                    if upd_idx or bs_upd:
                        rewritten = j.filter(upd_hit).select(
                            *out_vals, *rowid_pass
                        )
                        if rewritten.limit(1).count():
                            _enforce_constraints(rewritten, path)
                            _apply_generated(rewritten, path)
                            _write_pool = ThreadPoolExecutor(max_workers=1)
                            _pending_adds = (
                                _write_pool.submit(
                                    _write_data_files,
                                    _to_physical(rewritten, mapping),
                                    path,
                                ),
                                len(adds),
                                True,
                            )
            else:
                keep = j
                if del_idx:
                    keep = keep.filter(~F.col("__act").isin(del_idx))
                if bs_del:
                    keep = keep.filter(~F.col("__bact").isin(bs_del))
                rewritten = keep.select(*out_vals, *rowid_pass)
                _enforce_constraints(rewritten, path)
                # an UPDATE clause that changes a generated column's inputs
                # must keep the derivation true (assign both consistently) —
                # validated here, never silently broken into the files
                _apply_generated(rewritten, path)
                removes = [os.path.relpath(p, path) for p in rewrite]
                _write_pool = ThreadPoolExecutor(max_workers=1)
                _pending_adds = (
                    _write_pool.submit(
                        _write_data_files, _to_physical(rewritten, mapping), path
                    ),
                    len(adds),
                    False,
                )
            # change record: each clause-hit row's images — updates as their
            # delete+insert pair SHARING the row's stable id, deletes as
            # pre-images. No-hit and unmatched rows re-land byte-identical
            # (CoW) or stay untouched in place (DV): not a change, not
            # recorded.
            if phase2_live and upd_idx:
                hit_u = j.filter(F.col("__act").isin(upd_idx))
                change_legs.append(
                    hit_u.select(*pre_vals, *rowid_pass).withColumn(
                        "_change_type", F.lit("delete")
                    )
                )
                change_legs.append(
                    hit_u.select(*out_vals, *rowid_pass).withColumn(
                        "_change_type", F.lit("insert")
                    )
                )
            if phase2_live and del_idx:
                change_legs.append(
                    j.filter(F.col("__act").isin(del_idx))
                    .select(*pre_vals, *rowid_pass)
                    .withColumn("_change_type", F.lit("delete"))
                )
            if phase2_live and bs_upd:
                hit_b = j.filter(F.col("__bact").isin(bs_upd))
                change_legs.append(
                    hit_b.select(*pre_vals, *rowid_pass).withColumn(
                        "_change_type", F.lit("delete")
                    )
                )
                change_legs.append(
                    hit_b.select(*out_vals, *rowid_pass).withColumn(
                        "_change_type", F.lit("insert")
                    )
                )
            if phase2_live and bs_del:
                change_legs.append(
                    j.filter(F.col("__bact").isin(bs_del))
                    .select(*pre_vals, *rowid_pass)
                    .withColumn("_change_type", F.lit("delete"))
                )

        # --- phase 3: not-matched inserts ---------------------------------------
        ins_adds: list[str] = []
        ins_factory = None
        ins_frame = None
        if ins_clause is not None:
            ins_values, ins_cond = ins_clause
            nm = source
            if tgt_m is not None:
                # anti-join against the DV-APPLIED matched rows: a key whose
                # only target occurrence is deletion-vector-deleted is NOT
                # matched (it must insert, not vanish). Files outside the
                # matched set hold no source keys by phase-1 construction.
                nm = nm.join(tgt_m.select(*keys), keys, "left_anti")
            nm = nm.alias("s")
            if ins_cond is not None:
                nm = nm.filter(F.coalesce(_as_cond(ins_cond), F.lit(False)))
            gens = latest_meta(path, "generated", read_v) or {}
            ins_cols, computed_later = [], []
            for c in post_cols:
                if c in idents:
                    # GENERATED ALWAYS AS IDENTITY: assigned per commit
                    # ATTEMPT from the tip watermark (the ins_factory below)
                    continue
                if ins_values is not None:
                    unknown = set(ins_values) - set(post_cols)
                    if unknown:
                        raise ValueError(
                            f"insert values reference unknown columns: "
                            f"{sorted(unknown)}"
                        )
                    iv = ins_values.get(c)
                    iv = F.expr(iv) if isinstance(iv, str) else iv
                else:
                    iv = F.col(f"s.`{c}`") if c in source.columns else None
                if iv is None:
                    if c in gens:
                        # generated column the source does not supply: compute
                        # from the inserted row (the write contract), never NULL
                        computed_later.append(c)
                        continue
                    # a write-defaulted column the source omits fills the
                    # default (the Iceberg write-default contract), same
                    # as the append path
                    wd = (
                        latest_meta(path, "column_defaults", read_v) or {}
                    ).get(c, {}).get("write")
                    iv = F.expr(wd) if wd is not None else F.lit(None)
                ins_cols.append(iv.cast(post_types[c]).alias(c))
            inserts = nm.select(*ins_cols)
            if computed_later and not idents:
                inserts = _apply_generated(inserts, path).select(*post_cols)
            # persist: the anti-join frame otherwise re-scans the matched
            # files for the non-empty probe, the data write, the change leg,
            # and every constraint/generated validation (VERDICT r10 ask #4)
            inserts = inserts.persist()
            _cached.append(inserts)
            if inserts.limit(1).count():
                if idents:
                    # the reservation protocol: values assigned inside the
                    # commit retry loop; generated columns compute AFTER the
                    # identity values exist (an expression may reference
                    # them). The factory itself is built below, once the
                    # skipping-column set of the removed files is known.
                    ins_frame = inserts
                else:
                    _enforce_constraints(inserts, path)
                    if not computed_later:
                        _apply_generated(inserts, path)  # validate supplied values
                    ins_adds = _write_data_files(_to_physical(inserts, mapping), path)
                    adds += ins_adds
                    change_legs.append(
                        inserts.withColumn("_change_type", F.lit("insert"))
                    )

        if not removes and not dv_adds and not ins_adds and ins_frame is None:
            return read_v  # nothing matched, nothing to insert: no empty commit
        if change_legs:
            change = change_legs[0]
            for leg in change_legs[1:]:
                change = change.unionByName(leg, allowMissingColumns=True)
            change_data = _write_change_files(_to_physical(change, mapping), path)
            if use_dvs and change_data:
                _sweep.append(
                    os.path.dirname(os.path.join(path, change_data[0]))
                )
        else:
            # identity-insert-only merge: the change record rides with the
            # per-attempt factory files (appended at commit time)
            change_data = []
        # skipping channels: CoW recollects what the removed files carried;
        # the DV path removes nothing, so its appended update outputs keep
        # the TABLE's live channels alive (the update_where_dv contract)
        if _pending_adds is not None:
            # resolve the overlapped phase-2 write: every job that could
            # back-fill it (change feed, inserts) has now run
            _fut, _at, _dv_sweep = _pending_adds
            _new_adds = _fut.result()
            adds[_at:_at] = _new_adds
            if _dv_sweep and _new_adds:
                _sweep.append(
                    os.path.dirname(os.path.join(path, _new_adds[0]))
                )
            _pending_adds = None
        skip_src = removes
        if dv_adds:
            skip_src = [
                os.path.relpath(p, path) for p in visible_files(path, read_v)
            ]
        stat_cols, bloom_cols = _removed_skipping_cols(path, read_v, skip_src)
        stats = _collect_stats(path, adds, stat_cols or None)
        blooms = _collect_blooms(path, adds, bloom_cols or None)
        if ins_frame is not None:
            ins_factory = _identity_insert_factory(
                path, ins_frame, post_cols, mapping, stat_cols, bloom_cols
            )
        merge_meta = {
            "op": "merge",
            "schema": {c: post_types[c] for c in post_cols},
            **mapping_meta,
        }
        if dv_adds:
            # irreversible-layout gate, same as delete_where_dv: pre-DV
            # engine builds must refuse the table, not resurrect rows
            merge_meta = _with_feature(path, merge_meta, "deletion-vectors")
        try:
            return _commit_serializable(
                spark,
                path,
                read_v,
                adds,
                removes,
                stats,
                blooms,
                merge_meta,
                predicate=phantom,
                change_data=change_data,
                dv_adds=dv_adds or None,
                alloc_row_bases_for=(ins_adds if tracking else None) or None,
                ins_factory=ins_factory,
                ins_factory_alloc=tracking,
            )
        except CommitConflict:
            # losing DV writer sweeps its pre-landed groups (sidecar +
            # update outputs + change record), mirroring update_where_dv;
            # the CoW path keeps its historical leave-to-vacuum behavior
            for g in _sweep:
                logstore.for_path(path).delete_tree(g)
            raise
    finally:
        if _pending_adds is not None:
            # error path with the write still in flight: wait it out so the
            # unpersists below never yank a frame from under a running job
            # (its files are unreferenced by any commit — vacuum territory,
            # same as any failed CoW write)
            try:
                _pending_adds[0].result()
            except Exception:
                pass
        if _write_pool is not None:
            _write_pool.shutdown(wait=True)
        for _df in _cached:
            _df.unpersist()
        if _src_persisted:
            source.unpersist()


def _identity_insert_factory(
    path: str,
    inserts: DataFrame,
    post_cols,
    mapping,
    stat_cols=None,
    bloom_cols=None,
):
    """MERGE INSERT into an identity table — the per-attempt reservation
    protocol (VERDICT r10 ask #3, mirroring append's loop): the returned
    closure runs inside ``_commit_serializable``'s retry body and, on
    each attempt whose identity watermark differs from the last, (1)
    deletes the lost attempt's unreferenced files, (2) re-derives the
    insert frame with fresh identity values from the CURRENT tip
    watermark (``_apply_identity``), (3) computes/validates generated
    columns and constraints on the completed rows, (4) lands fresh data +
    change files, and (5) folds the footer-stats watermark advance
    (``_advance_identity``) into the commit meta. put_if_absent then
    serializes the watermark read against every concurrent writer: our
    commit wins → no one else advanced it since the read; our commit
    loses → the next attempt re-reads the winner's advance. A concurrent
    plain append that read the same watermark but commits AFTER us trips
    its own identity-race guard — ids stay globally unique without any
    coordination beyond the log itself."""
    state: dict = {"wm": None, "adds": [], "change": [], "stats": {}, "blooms": {}, "meta": {}}

    def factory() -> dict:
        cur = latest_meta(path, "identity") or {}
        wm = {k: (v.get("next"), v.get("step")) for k, v in cur.items()}
        if state["wm"] == wm:
            return state  # watermark unmoved — the landed files stay valid
        store = logstore.for_path(path)
        for rel in state["adds"] + state["change"]:
            store.delete(os.path.join(path, rel))  # lost-race cleanup
        frame, idents_meta = _apply_identity(inserts, path)
        frame = _apply_generated(frame, path).select(*post_cols)
        _enforce_constraints(frame, path)
        adds = _write_data_files(_to_physical(frame, mapping), path)
        change = _write_change_files(
            _to_physical(
                frame.withColumn("_change_type", F.lit("insert")), mapping
            ),
            path,
        )
        state.update(
            wm=wm,
            adds=adds,
            change=change,
            # skipping parity with the rewrite adds: the commit must not
            # silently degrade pruning on the columns the removed files
            # carried stats/blooms for
            stats=_collect_stats(path, adds, stat_cols or None),
            blooms=_collect_blooms(path, adds, bloom_cols or None),
            meta=_advance_identity(path, adds, idents_meta),
        )
        return state

    return factory


def read_pruned_multi(
    spark: SparkSession,
    path: str,
    ranges: dict,
    version: int | None = None,
) -> DataFrame:
    """Snapshot read pruned on SEVERAL column ranges at once: a file
    survives only if every constrained column's logged [min, max] can
    intersect its range — the file sets intersect, so a Z-order-clustered
    table (append_clustered) prunes tighter than any single dimension
    allows. ``ranges`` maps column → (lo, hi), either bound None = open.
    Same conservative contract as read_pruned: statless files are kept and
    every residual predicate applies."""
    _check_reader(path, version)
    all_files = visible_files(path, version)
    if not all_files:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    stats = visible_stats(path, version)
    mapping = _column_mapping(path, version)
    canon = {
        mapping.get(c, c): (_canon_bound(lo), _canon_bound(hi))
        for c, (lo, hi) in ranges.items()
    }
    keep = []
    for abs_p in all_files:
        fstats = stats.get(os.path.relpath(abs_p, path), {})
        drop = False
        for col, (lo, hi) in canon.items():
            if _range_excludes(fstats.get(col), lo, hi):
                drop = True
                break
        if not drop:
            keep.append(abs_p)
    df = (
        _read_data(spark, path, keep, version=version)
        if keep
        else _read_data(spark, path, all_files, version=version).limit(0)
    )
    df = _logical_view(df, path, version)
    for col, (lo, hi) in ranges.items():
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
    return df


def visible_blooms(path: str, version: int | None = None) -> dict[str, dict[str, str]]:
    """Per-file bloom filters for the snapshot, resolved like the file
    list (checkpoint-accelerated). Files committed without ``bloom_cols``
    have no entry (reader must keep them). Columns RETIRED by a
    chain-leaving type widening (``bloom_retired`` meta — their stored
    hashes use the old integer representation) are filtered out, so
    point reads conservatively keep those files instead of false-
    skipping on a representation-mismatched probe."""
    retired = set(latest_meta(path, "bloom_retired", version) or [])
    out = {}
    for rel, e in _replay(path, version).items():
        bl = e.get("blooms")
        if not bl:
            continue
        if retired:
            bl = {c: b for c, b in bl.items() if c not in retired}
            if not bl:
                continue
        out[rel] = bl
    return out


def read_point(
    spark: SparkSession,
    path: str,
    col: str,
    value,
    version: int | None = None,
) -> DataFrame:
    """Point-lookup read: skip every data file whose logged Bloom filter
    proves ``col = value`` cannot match. The complement of ``read_pruned``:
    min/max ranges skip RANGE predicates on clustered data but are useless
    for a point probe on a high-cardinality key in unclustered data (every
    file's range covers every id); the membership sketch skips there.
    Blooms never false-skip; ~1% of files false-keep and are eliminated by
    the residual filter. Files without a logged bloom are conservatively
    read, so results always equal ``read().filter(col = value)``."""
    _check_reader(path, version)
    all_files = visible_files(path, version)
    if not all_files:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    blooms = visible_blooms(path, version)
    pcol = _phys_name(path, version, col)
    keep = []
    for abs_p in all_files:
        b64 = blooms.get(os.path.relpath(abs_p, path), {}).get(pcol)
        if b64 is not None and not _bloom_may_contain(b64, value):
            continue
        keep.append(abs_p)
    if not keep:
        df = _read_data(spark, path, all_files, version=version).limit(0)
    else:
        df = _read_data(spark, path, keep, version=version)
    df = _logical_view(df, path, version)
    return df.filter(F.col(col) == F.lit(value))


# Operations that restructure the whole snapshot (or its schema layer):
# a racing row-level mutation can never prove disjointness against them,
# so conflict resolution always surfaces the conflict instead.
_SNAPSHOT_OPS = {
    "overwrite",
    "restore",
    "merge",
    "optimize",
    "optimize_zorder",
    "replace_where",
    "rename_column",
    "drop_column",
    "reorg_purge",
    "add_constraint",
    # a mutation re-targeting past a concurrent protocol DOWNGRADE could
    # land dv_adds/widened state the new tip's protocol no longer
    # declares (its _with_feature fold was computed against the
    # pre-drop protocol) — surface the conflict; the re-run re-folds
    "drop_feature",
}


def _commit_serializable(
    spark: SparkSession,
    path: str,
    read_v: int,
    adds: list[str],
    removes: list[str],
    stats,
    blooms,
    meta: dict,
    predicate=None,
    dv_adds: dict[str, str] | None = None,
    max_retries: int = 3,
    change_data: list[str] | None = None,
    alloc_row_bases_for: list[str] | None = None,
    ins_factory=None,
    ins_factory_alloc: bool = False,
) -> int:
    """WriteSerializable commit for the row-level mutations — the Delta
    conflict-RESOLUTION rules instead of fail-on-any-race: when another
    writer stole our target version, examine what actually landed and
    retry against the new tip iff the result is provably the same as a
    serial execution:

    - a snapshot-restructuring op (_SNAPSHOT_OPS) or any dv_set commit →
      surface the conflict (no disjointness argument exists);
    - the concurrent commit REMOVED or DV'd a file we mutate →
      ConcurrentDelete conflict (write-write on the same rows);
    - the concurrent commit APPENDED files → evaluate OUR predicate over
      exactly those files (one bounded scan of the new data, logical
      view): a match is a phantom row the serial order would have
      mutated → conflict; no match → the append is disjoint, re-target.

    Blind appends keep their own simpler retry (append never conflicts).
    Returns the committed version; raises CommitConflict with the named
    reason when resolution is impossible.

    ``ins_factory`` (identity-table MERGE INSERT) is invoked once per
    attempt: it returns the attempt's extra adds/stats/blooms/change
    files and the identity-watermark meta advance, re-landing the insert
    files with fresh values whenever the watermark moved since the last
    attempt (see :func:`_identity_insert_factory`).
    ``ins_factory_alloc=True`` additionally allocates row-tracking bases
    for the factory's files, per attempt like the static list."""
    target = read_v + 1
    for _ in range(max_retries + 1):
        # row tracking: fresh-id allocation re-derives PER ATTEMPT from the
        # tip watermark (same serialization argument as append's loop)
        meta_rt, row_bases = dict(meta), None
        adds_t, stats_t, blooms_t = adds, stats, blooms
        change_t = change_data
        alloc = list(alloc_row_bases_for or [])
        if ins_factory is not None:
            ins = ins_factory()
            adds_t = list(adds) + ins["adds"]
            stats_t = {**(stats or {}), **ins["stats"]}
            blooms_t = {**(blooms or {}), **ins["blooms"]}
            change_t = list(change_data or []) + ins["change"]
            meta_rt.update(ins["meta"])
            if ins_factory_alloc:
                alloc += ins["adds"]
        if alloc:
            row_bases, wm = _alloc_row_bases(path, alloc)
            meta_rt["row_id_watermark"] = wm
        try:
            _try_commit(
                path, target, adds_t, removes, stats_t, blooms_t,
                meta=meta_rt, dv_adds=dv_adds, change_data=change_t,
                row_bases=row_bases,
            )
            return target
        except CommitConflict as e:
            tip = current_version(path)
            ours = set(removes) | set(dv_adds or {})
            new_files: list[str] = []
            for v in range(target, tip + 1):
                c = _load_commit(path, v)
                op = c.get("meta", {}).get("op", "write")
                if op in _SNAPSHOT_OPS or c.get("dv_set"):
                    raise CommitConflict(
                        f"concurrent snapshot-level operation {op!r} at "
                        f"version {v}; cannot prove serializability"
                    ) from e
                if set(c.get("removes", [])) & ours:
                    raise CommitConflict(
                        f"concurrent commit {v} removed file(s) this "
                        f"mutation rewrites (write-write conflict)"
                    ) from e
                if set(c.get("dv_adds", {})) & ours:
                    raise CommitConflict(
                        f"concurrent commit {v} added deletion vectors on "
                        f"file(s) this mutation touches"
                    ) from e
                new_files.extend(c.get("adds", []))
            if new_files and predicate is not None:
                probe = _logical_view(
                    _read_data(
                        spark,
                        path,
                        [os.path.join(path, r) for r in new_files],
                        merge_schema=True,
                        version=tip,
                    ),
                    path,
                    tip,
                )
                if probe.filter(predicate).limit(1).count():
                    raise CommitConflict(
                        "concurrent append added rows matching this "
                        "mutation's predicate (phantom conflict under "
                        "WriteSerializable)"
                    ) from e
            target = tip + 1
    raise CommitConflict(
        f"mutation lost {max_retries} serializability retries"
    )


def _matched_files(
    spark: SparkSession,
    path: str,
    read_v: int,
    predicate,
    prune_col: str | None,
    lo,
    hi,
) -> list[str]:
    """Shared candidate-pruning + file-level match scan for the
    copy-on-write mutations (DELETE/UPDATE): stats skip (+ bloom skip for
    point predicates) → one predicate scan tagging which files contain
    TRUE rows (``input_file_name``, URI-normalized via urlparse+unquote).
    Returns absolute paths of matched files (empty = nothing to rewrite)."""
    from urllib.parse import unquote, urlparse

    all_files = visible_files(path, read_v)
    candidates = all_files
    if prune_col is not None:
        prune_col = _phys_name(path, read_v, prune_col)
        stats = visible_stats(path, read_v)
        # a point predicate (lo == hi) can additionally consult the blooms —
        # the unclustered-key case where every file's range matches
        blooms = visible_blooms(path, read_v) if lo is not None and lo == hi else {}
        c_lo, c_hi = _canon_bound(lo), _canon_bound(hi)
        candidates = []
        for abs_p in all_files:
            rel = os.path.relpath(abs_p, path)
            if _range_excludes(stats.get(rel, {}).get(prune_col), c_lo, c_hi):
                continue
            b64 = blooms.get(rel, {}).get(prune_col)
            if b64 is not None and not _bloom_may_contain(b64, lo):
                continue
            candidates.append(abs_p)
    if not candidates:
        return []
    # mergeSchema: candidate files may span additive schema evolution; the
    # narrower single-footer schema would drop evolved columns on rewrite.
    # The predicate is LOGICAL — match against the logical view.
    scan = _logical_view(
        _read_data(spark, path, candidates, merge_schema=True, version=read_v), path, read_v
    )
    matched = [
        r[0]
        for r in scan.filter(predicate)
        .select(F.input_file_name())
        .distinct()
        .collect()
    ]
    return [
        unquote(urlparse(p).path) if p.startswith("file:") else p for p in matched
    ]


def _removed_skipping_cols(
    path: str, read_v: int, removes: list[str]
) -> tuple[list[str], list[str]]:
    """Column names the removed files carried stats/blooms for — a rewrite
    commit must recollect BOTH on its replacement files, or the mutation
    silently degrades data skipping for every later read."""
    live_stats = visible_stats(path, read_v)
    live_blooms = visible_blooms(path, read_v)
    stat_cols = sorted({c for rel in removes for c in live_stats.get(rel, {})})
    bloom_cols = sorted({c for rel in removes for c in live_blooms.get(rel, {})})
    return stat_cols, bloom_cols


def delete_where(
    spark: SparkSession,
    path: str,
    predicate,
    prune_col: str | None = None,
    lo=None,
    hi=None,
) -> int:
    """Row-level DELETE as one atomic commit, touching only the files that
    must change. Three pruning layers, each cutting the rewrite set:

    1. **Stats skip** (free when ``prune_col``/``lo``/``hi`` given and the
       commits carry stats): files whose logged [min, max] cannot intersect
       the range are never even scanned.
    2. **File-level match scan**: one pass over the surviving candidates
       tags which FILES actually contain matching rows
       (``input_file_name``); files with zero matches stay referenced,
       byte-identical — copy-on-write at file granularity, the Delta/
       Iceberg CoW contract.
    3. **Rewrite**: only matched files re-land, minus the deleted rows.

    SQL DELETE semantics: only rows where the predicate evaluates to TRUE
    are deleted — rows where it is NULL survive (three-valued logic: a bare
    ``NOT(pred)`` keep-filter would silently drop NULL-predicate rows from
    rewritten files while identical rows in untouched files survived).

    Returns the new version (or the current one when nothing matched —
    no empty commit)."""
    read_v = current_version(path)
    if read_v == 0:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    if isinstance(predicate, str):
        predicate = F.expr(predicate)
    matched = _matched_files(spark, path, read_v, predicate, prune_col, lo, hi)
    if not matched:
        return read_v
    src = _read_files_with_dvs(spark, path, read_v, matched)
    hit = F.coalesce(predicate, F.lit(False))
    keep = src.filter(~hit)
    removes = [os.path.relpath(p, path) for p in matched]
    stat_cols, bloom_cols = _removed_skipping_cols(path, read_v, removes)
    mapping = _column_mapping(path, read_v)
    adds = _write_data_files(_to_physical(keep, mapping), path)
    # the commit's row-level change record: exactly the deleted rows
    # (pre-images), so CDC never needs a cross-file diff for this commit
    change_data = _write_change_files(
        _to_physical(src.filter(hit), mapping).withColumn(
            "_change_type", F.lit("delete")
        ),
        path,
    )
    stats = _collect_stats(path, adds, stat_cols or None)
    blooms = _collect_blooms(path, adds, bloom_cols or None)
    return _commit_serializable(
        spark, path, read_v, adds, removes, stats, blooms,
        {"op": "delete"}, predicate=predicate, change_data=change_data,
    )


def update_where(
    spark: SparkSession,
    path: str,
    predicate,
    assignments: dict,
    prune_col: str | None = None,
    lo=None,
    hi=None,
) -> int:
    """Row-level ``UPDATE ... SET`` as one atomic copy-on-write commit —
    the mutation twin of :func:`delete_where`, with the same three pruning
    layers (stats skip → file-level match scan → rewrite only matched
    files). ``assignments`` maps column → new-value expression (Column or
    SQL string); each assignment casts back to the column's existing type
    so the table schema never drifts under an UPDATE.

    SQL UPDATE semantics: only rows where the predicate evaluates to TRUE
    change; NULL-predicate rows pass through byte-identical. Unmatched
    files stay referenced untouched, so rewrite cost tracks the matched
    data, never the table. Returns the new version (current one when
    nothing matched)."""
    read_v = current_version(path)
    if read_v == 0:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    if isinstance(predicate, str):
        predicate = F.expr(predicate)
    # Validate assignments against the TABLE schema up front — a no-match
    # UPDATE with a misspelled SET column must error, not silently no-op,
    # and an assignment to an evolved column must work even when every
    # matched file predates it.
    table_schema = read(spark, path, read_v, merge_schema=True).schema
    table_fields = {f.name: f.dataType for f in table_schema.fields}
    unknown = set(assignments) - set(table_fields)
    if unknown:
        raise ValueError(f"assignments reference unknown columns: {sorted(unknown)}")
    matched = _matched_files(spark, path, read_v, predicate, prune_col, lo, hi)
    if not matched:
        return read_v
    src = _read_files_with_dvs(spark, path, read_v, matched)
    for name, dtype in table_fields.items():
        if name not in src.columns:
            src = src.withColumn(name, F.lit(None).cast(dtype))
    hit = F.coalesce(predicate, F.lit(False))
    cols = []
    for field in src.schema.fields:
        if field.name in assignments:
            a = assignments[field.name]
            a = F.expr(a) if isinstance(a, str) else a
            cols.append(
                F.when(hit, a.cast(field.dataType))
                .otherwise(F.col(field.name))
                .alias(field.name)
            )
        else:
            cols.append(F.col(field.name))
    rewritten = src.select(*cols)
    _enforce_constraints(rewritten, path)
    # an UPDATE that changes a generated column's inputs must keep the
    # derivation true (assign both consistently) — fail loudly instead
    # of baking a violated derivation into the rewritten files
    _apply_generated(rewritten, path)
    removes = [os.path.relpath(p, path) for p in matched]
    stat_cols, bloom_cols = _removed_skipping_cols(path, read_v, removes)
    mapping = _column_mapping(path, read_v)
    adds = _write_data_files(_to_physical(rewritten, mapping), path)
    # change record: each updated row as its delete (pre-image) + insert
    # (post-image) pair — the documented update convention of this CDF.
    # The post-image filter must use the PRE-update predicate value (the
    # assignment may flip it), so select the updated columns alongside the
    # original-row hit flag instead of re-filtering the rewritten frame.
    post = (
        src.select(*cols, hit.alias("__hit"))
        .filter("__hit")
        .drop("__hit")
        .withColumn("_change_type", F.lit("insert"))
    )
    pre = src.filter(hit).withColumn("_change_type", F.lit("delete"))
    change_data = _write_change_files(
        _to_physical(pre.unionByName(post), mapping), path
    )
    stats = _collect_stats(path, adds, stat_cols or None)
    blooms = _collect_blooms(path, adds, bloom_cols or None)
    return _commit_serializable(
        spark, path, read_v, adds, removes, stats, blooms,
        {"op": "update"}, predicate=predicate, change_data=change_data,
    )


def overwrite_where(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    predicate,
    prune_col: str | None = None,
    lo=None,
    hi=None,
    enforce: bool = True,
) -> int:
    """Predicate-scoped atomic overwrite (the Delta ``replaceWhere``
    contract): in ONE commit, delete every row where ``predicate`` is TRUE
    and insert ``new_df`` — the idempotent-backfill primitive (re-land one
    day/partition of a 100 TB table without touching the rest).

    Same three pruning layers as :func:`delete_where` bound the rewrite to
    the files that actually contain matching rows; files with no matches
    stay referenced byte-identical, so cost tracks the replaced band, never
    the table. ``enforce=True`` (default, as in Delta) rejects the write if
    any ``new_df`` row does NOT satisfy the predicate — otherwise a bad
    backfill silently leaks rows outside its declared scope and a replay
    would duplicate them. NULL-predicate rows count as outside the scope on
    both sides (delete keeps them, enforcement rejects them).

    Returns the new version. Unlike delete_where, a no-match predicate
    still commits (the insert half must land)."""
    read_v = current_version(path)
    if read_v == 0:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    if latest_meta(path, "identity", read_v) or {}:
        raise ValueError(
            "overwrite_where cannot land replacement rows into a table "
            "with identity columns yet (baked watermark values under the "
            "WriteSerializable retry loop need a reservation protocol); "
            "delete_where + append instead"
        )
    new_df = _apply_write_defaults(new_df, path)
    new_df = _apply_generated(new_df, path)
    schema_meta = _validate_append_schema(path, new_df, merge_schema=False)
    _enforce_constraints(new_df, path)
    if isinstance(predicate, str):
        predicate = F.expr(predicate)
    if enforce:
        stray = new_df.filter(~F.coalesce(predicate, F.lit(False))).limit(1).count()
        if stray:
            raise ValueError(
                "overwrite_where: new_df contains rows that do not satisfy "
                "the replace predicate (pass enforce=False to allow)"
            )
    tracking = row_tracking_enabled(path, read_v)
    if tracking and _ROWID in new_df.columns:
        raise ValueError(
            f"{_ROWID!r} is the reserved row-tracking column; replacement "
            f"frames must not carry it"
        )
    matched = _matched_files(spark, path, read_v, predicate, prune_col, lo, hi)
    mapping = _column_mapping(path, read_v)
    adds = _write_data_files(_to_physical(new_df, mapping), path)
    # row tracking: the REPLACEMENT rows are new logical rows (fresh id
    # ranges, allocated per commit attempt); band survivors rewritten
    # below carry their MATERIALIZED ids — untouched-row ids never move
    new_row_files = list(adds) if tracking else None
    # change record: the replaced band's pre-images as deletes + new_df as
    # inserts (survivor rows pass through byte-identical — not a change)
    change_data = _write_change_files(
        _to_physical(new_df, mapping).withColumn("_change_type", F.lit("insert")),
        path,
    )
    removes = []
    if matched:
        src = _read_files_with_dvs(spark, path, read_v, matched)
        hit = F.coalesce(predicate, F.lit(False))
        adds += _write_data_files(_to_physical(src.filter(~hit), mapping), path)
        removes = [os.path.relpath(p, path) for p in matched]
        change_data += _write_change_files(
            _to_physical(src.filter(hit), mapping).withColumn(
                "_change_type", F.lit("delete")
            ),
            path,
        )
    stat_cols, bloom_cols = _removed_skipping_cols(path, read_v, removes)
    stats = _collect_stats(path, adds, stat_cols or None)
    blooms = _collect_blooms(path, adds, bloom_cols or None)
    return _commit_serializable(
        spark, path, read_v, adds, removes, stats, blooms,
        {"op": "replace_where", "schema": schema_meta}, predicate=predicate,
        change_data=sorted(change_data),
        alloc_row_bases_for=new_row_files,
    )


def restore(path: str, version: int, spark: SparkSession | None = None) -> int:
    """Roll the table back to an earlier version as a NEW commit (the
    lakehouse ``RESTORE TABLE ... TO VERSION``): flips visibility only —
    no data is rewritten, and history is preserved (the rollback itself is
    a version you can inspect or restore past). The re-added files carry
    their stats/blooms forward from the target version's resolution, so
    data skipping survives the rollback, and every file's DELETION-VECTOR
    state is pinned to the target version's via a ``dv_set`` replacement
    (files common to both snapshots drop DVs accumulated after the
    target; re-added files get their at-target DV lists back — the
    accumulate-only ``dv_adds`` channel could express neither). Fails up
    front if vacuum already reclaimed any data file OR DV sidecar the
    target version needs.

    Pass ``spark`` to MATERIALIZE the restore's row-level change record
    (``_change_data`` files, via one :func:`_snapshot_diff` pass at
    restore time): the streaming CDF can then drain the restore commit
    instead of refusing it. Without a session, batch ``table_changes``
    still answers the commit by diffing at read time."""
    cur_v = current_version(path)
    if not 1 <= version <= cur_v:
        raise ValueError(f"version {version} not in [1, {cur_v}]")
    target = visible_files(path, version)
    missing = [p for p in target if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            f"cannot restore to version {version}: {len(missing)} data "
            f"file(s) already vacuumed, e.g. {missing[0]!r}"
        )
    current = set(visible_files(path, cur_v))
    adds = sorted(os.path.relpath(p, path) for p in set(target) - current)
    removes = sorted(os.path.relpath(p, path) for p in current - set(target))
    old_stats = visible_stats(path, version)
    old_blooms = visible_blooms(path, version)
    stats = {rel: old_stats[rel] for rel in adds if rel in old_stats}
    blooms = {rel: old_blooms[rel] for rel in adds if rel in old_blooms}
    # Reproduce the target version's exact DV state on every surviving
    # file: replay-time dv_set REPLACES the list, so post-target deletes
    # un-hide and pre-target deletes re-apply (a plain file-visibility
    # flip would do neither).
    tgt_state = _replay(path, version)
    cur_state = _replay(path, cur_v)
    dv_set: dict[str, list[str]] = {}
    for rel, e in tgt_state.items():
        tgt_dvs = list(e.get("dvs") or [])
        cur_dvs = list(cur_state.get(rel, {}).get("dvs") or [])
        if rel in cur_state and cur_dvs == tgt_dvs:
            continue
        if tgt_dvs or rel in cur_state:
            dv_set[rel] = tgt_dvs
    missing_dv = sorted(
        g
        for groups in dv_set.values()
        for g in groups
        if not os.path.isdir(os.path.join(path, g))
    )
    if missing_dv:
        raise FileNotFoundError(
            f"cannot restore to version {version}: {len(missing_dv)} deletion-"
            f"vector sidecar group(s) already vacuumed, e.g. {missing_dv[0]!r}"
        )
    # RESTORE also restores the SCHEMA-layer metadata (logical schema +
    # column mapping) to the target version's — the restored files carry
    # the physical names that mapping describes, so restoring data without
    # its mapping would mis-resolve renamed columns. The reservation list
    # only ever grows (files from both epochs remain on disk).
    meta = {"op": "restore", "restored_version": version}
    # a feature dropped AFTER the target may be load-bearing in the
    # restored state (live DVs, pre-widen files, a mapping) — re-declare
    # by unioning the target version's protocol back in (conservative:
    # the target's protocol provably sufficed to read the target state;
    # a user who still wants the feature gone re-runs drop_feature, whose
    # verification pass then judges the RESTORED state)
    cur_feats = set(table_protocol(path).get("reader_features", []))
    tgt_feats = set(table_protocol(path, version).get("reader_features", []))
    if tgt_feats - cur_feats:
        meta["protocol"] = {"reader_features": sorted(cur_feats | tgt_feats)}
    tgt_schema = latest_meta(path, "schema", version)
    if tgt_schema is not None and tgt_schema != latest_meta(path, "schema"):
        meta["schema"] = tgt_schema
        # a generation expression declared AFTER the target may derive a
        # column the restored schema no longer has — keeping it would make
        # every later append fail schema validation on the auto-computed
        # column. Identity metadata is deliberately NOT reverted (the
        # watermark never rolls back — ids stay history-unique, same rule
        # as row tracking below).
        gens = latest_meta(path, "generated") or {}
        kept = {n: g for n, g in gens.items() if n in tgt_schema}
        if kept != gens:
            meta["generated"] = kept
    cur_map = _column_mapping(path)
    tgt_map = _column_mapping(path, version)
    if tgt_map != cur_map:
        meta["column_mapping"] = tgt_map
        meta["physical_reserved"] = sorted(
            _physical_reserved(path) | _physical_reserved(path, version)
        )
    # column defaults revert WITH the schema (a restore below an
    # add_column must stop rendering the default; one above a later
    # set_column_default must restore the write default then in force)
    tgt_cds = latest_meta(path, "column_defaults", version) or {}
    if tgt_cds != (latest_meta(path, "column_defaults") or {}):
        meta["column_defaults"] = tgt_cds
    change_data = None
    if spark is not None:
        d = _snapshot_diff(spark, path, cur_v, version, schema_v=version)
        change_data = (
            []
            if d is None
            else _write_change_files(_to_physical(d, tgt_map), path)
        )
    # row tracking: re-added files get their AT-TARGET base row ids back
    # (a plain visibility flip would leave them base-less and break
    # read_with_row_ids); the watermark never rolls back — ids stay
    # history-unique even across restores.
    row_bases = {
        rel: tgt_state[rel]["base"]
        for rel in adds
        if tgt_state.get(rel, {}).get("base") is not None
    }
    _try_commit(
        path,
        cur_v + 1,
        adds,
        removes,
        stats or None,
        blooms or None,
        meta=meta,
        dv_set=dv_set or None,
        change_data=change_data,
        row_bases=row_bases or None,
    )
    return cur_v + 1


def history(path: str) -> list[dict]:
    """Commit history, newest first (the ``DESCRIBE HISTORY`` surface):
    one dict per version with the operation name (recorded in commit meta
    by each writer; older commits without one report ``write``) and the
    add/remove file counts. Reads only the log — O(versions), no data."""
    out = []
    for v in _versions(path):
        commit = _load_commit(path, v)
        meta = commit.get("meta", {})
        out.append(
            {
                "version": v,
                "ts": commit.get("ts"),
                "op": meta.get("op", "write"),
                "n_added": len(commit.get("adds", [])),
                "n_removed": len(commit.get("removes", [])),
                # schema meta is bookkeeping, not an operation detail —
                # surface it via latest_meta(path, "schema"), not history rows
                **{
                    k: meta[k]
                    for k in meta
                    if k not in ("op", "schema")
                },
            }
        )
    return sorted(out, key=lambda d: -d["version"])


def describe_detail(path: str, version: int | None = None) -> dict:
    """The ``DESCRIBE DETAIL`` surface: one dict of table facts resolved
    from the log + filesystem metadata only (no data pages) — current
    version, file count, total bytes, exact row count (fast_count), the
    logged schema, and which skipping channels the live files carry
    (stats / bloom columns). The at-a-glance health check before deciding
    whether a table needs OPTIMIZE / ZORDER / bloom re-append."""
    live = _replay(path, version)
    if not live:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    stat_cols = sorted({c for e in live.values() for c in (e.get("stats") or {})})
    bloom_cols = sorted({c for e in live.values() for c in (e.get("blooms") or {})})
    return {
        "version": current_version(path) if version is None else version,
        "num_files": len(live),
        "size_bytes": sum(
            os.path.getsize(os.path.join(path, rel)) for rel in live
        ),
        "num_rows": fast_count(path, version),
        "schema": latest_meta(path, "schema", version),
        "constraints": latest_meta(path, "constraints", version) or {},
        "properties": table_properties(path, version),
        "column_mapping": _column_mapping(path, version),
        "protocol": table_protocol(path, version),
        "stats_cols": stat_cols,
        "bloom_cols": bloom_cols,
        "vacuum_retention_floor": vacuum_retention_floor(path),
        # write-contract features a consumer must know before writing
        "row_tracking": bool(latest_meta(path, "row_tracking", version)),
        "generated_columns": latest_meta(path, "generated", version) or {},
        "identity_columns": latest_meta(path, "identity", version) or {},
        # log lifecycle facts (retention planning): the pointer's target
        # and the oldest version whose commit record still exists — the
        # time-travel floor expire_log has moved
        "last_checkpoint_version": _pointer_version(path),
        "log_earliest_version": (_versions(path) or [0])[0],
    }


#: maintenance ops that rewrite bytes without changing table content —
#: skipped wholesale by CDC (Delta's dataChange=false)
_CDC_NO_CHANGE_OPS = {
    "optimize",
    "optimize_zorder",
    "reorg_purge",
    "add_constraint",
    "drop_constraint",
}


def table_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
    include_row_ids: bool = False,
) -> DataFrame:
    """Change data feed over ``(from_version, to_version]``, PER COMMIT
    (the Delta CDF contract): every row gains ``_change_type``
    (``insert`` / ``delete``; an update appears as its delete + insert
    pair) and ``_commit_version`` (the commit that produced it).

    Resolution ladder, cheapest first, per commit in the window:

    - maintenance rewrites (``optimize``/``optimize_zorder``/
      ``reorg_purge``/constraint DDL) are dataChange=false — skipped;
    - a commit with a stored ``change_data`` record (CoW DELETE/UPDATE,
      MERGE, replaceWhere, spark-assisted RESTORE — the Delta
      ``_change_data`` design) reads ONLY its change files: cost tracks
      the changed rows, no diffing;
    - a pure append streams its added files as inserts;
    - deletion-vector commits and LEGACY rewrite commits (written before
      change records existed) fall back to a per-commit snapshot diff
      (:func:`_snapshot_diff` — file-set symmetric difference + DV
      corrections, identical rewrites cancelling via ``exceptAll``).

    Unlike the pre-change-record implementation (one NET diff across the
    whole window), per-commit emission reports intermediate changes: an
    insert later deleted inside the window shows BOTH rows, each tagged
    with its commit — the semantics incremental consumers fold correctly
    and Delta's CDF documents.

    RENAME/DROP boundary contract: the whole feed renders in the
    TO-version's logical schema. Physical column names are immutable
    under column mapping, so this is well-defined for every commit in
    the window — rows from before a rename appear under the NEW logical
    name (same physical bytes), columns dropped by ``to_v`` are absent
    from the feed, and a name recycled after a DROP reads NULL for
    pre-drop rows (the fresh generated physical name never matches the
    retired one, so old bytes cannot resurrect). Delta refuses this
    window; rendering at to_v is strictly more useful and loses nothing
    the to_v schema can express. The STREAMING CDF still fails on a
    mid-stream mapping change — its column resolution is fixed at
    stream start (see streaming/source.py) — so batch table_changes is
    the documented path across such a boundary.

    ``include_row_ids=True`` (row-tracking tables only) adds the stable
    ``row_id`` to every change row the ladder can attribute: stored
    change records carry the ids their rewrite materialized (an UPDATE's
    delete+insert pair shares ONE id — join the pair on it), pure
    appends compute ids from their own commit's base allocation, and
    deletion-vector commits resolve position-exactly. A MERGE's matched
    update/delete images carry their rows' preserved ids (the update
    pair shares one id). ``row_id`` is NULL only where no identity
    exists at record-write time: merge/overwrite/replaceWhere INSERT
    images (their ids allocate at commit, after the change record
    lands) and legacy pre-change-record rewrite commits (their diff
    predates id materialization)."""
    to_v = current_version(path) if to_version is None else to_version
    _check_reader(path, to_v)
    # the feed reads every commit record in (from_v, to_v]; a window
    # reaching below an expire_log horizon fails deterministically with
    # the named floor (same contract as snapshot reads below it)
    vs0 = _versions(path)
    if vs0 and vs0[0] > 1 and from_version + 1 < vs0[0]:
        raise _expired_read_error(path, from_version + 1)
    if include_row_ids and not row_tracking_enabled(path, to_v):
        raise ValueError(
            f"include_row_ids needs row tracking enabled on {path!r}"
        )
    legs: list[DataFrame] = []
    saw_data_commit = False
    for v in range(from_version + 1, to_v + 1):
        commit = _load_commit(path, v)
        op = commit.get("meta", {}).get("op", "write")
        if op in _CDC_NO_CHANGE_OPS:
            saw_data_commit = True  # data-bearing, provably zero row change
            continue
        if "change_data" in commit:
            saw_data_commit = True
            rels = commit["change_data"]
            if not rels:
                continue
            cd = spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(path, r) for r in rels]
            )
            passthrough = ["_change_type"]
            if include_row_ids:
                rid = (
                    F.col(_ROWID).cast("long")
                    if _ROWID in cd.columns
                    else F.lit(None).cast("long")
                )
                cd = cd.withColumn("row_id", rid)
                passthrough.append("row_id")
            # render at to_v's schema, EXCEPT columns whose stored change
            # file is WIDER (a restore below a type widening records the
            # removed wide rows losslessly — casting them to the narrow
            # post-restore type would overflow exactly those rows)
            sch = latest_meta(path, "schema", to_v)
            if sch is not None:
                mapping = _column_mapping(path, to_v)
                dd = dict(cd.dtypes)
                render = {
                    c: (
                        dd[mapping.get(c, c)]
                        if _widens_to(t, dd.get(mapping.get(c, c), t))
                        else t
                    )
                    for c, t in sch.items()
                }
                cd = _to_logical(
                    cd, render, mapping, passthrough=tuple(passthrough)
                )
            else:
                cd = _logical_view(
                    cd, path, to_v, passthrough=tuple(passthrough)
                )
            # change files from commits BELOW a column's initial-default
            # add render the backfill, like every data-file read (the
            # commit version is the exact predates test here — all of
            # this commit's change files share it)
            cds_meta = latest_meta(path, "column_defaults", to_v) or {}
            sch_to = latest_meta(path, "schema", to_v) or {}
            for c, d in cds_meta.items():
                if (
                    d.get("initial") is not None
                    and c in sch_to
                    and v < d["v_add"]
                    and c not in cd.columns
                ):
                    cd = cd.withColumn(
                        c, F.lit(d["initial_value"]).cast(sch_to[c])
                    )
            legs.append(
                cd.withColumn("_commit_version", F.lit(v).cast("bigint"))
            )
            continue
        has_state = (
            commit.get("adds")
            or commit.get("removes")
            or commit.get("dv_adds")
            or commit.get("dv_set")
            or op == "restore"
        )
        if not has_state:
            continue  # metadata-only commit (no rows involved)
        saw_data_commit = True
        if (
            commit.get("adds")
            and not commit.get("removes")
            and not commit.get("dv_adds")
            and not commit.get("dv_set")
            and op != "restore"
        ):
            # pure append: its added files ARE the change record. The
            # files carry the types at THIS commit's version — when a
            # column was WIDER at v than at to_v (a restore below a type
            # widening sits inside the window), scan and render at the
            # covering type, or the explicit narrow scan schema fails on
            # the wide pages (the same fix as _snapshot_diff's)
            sch_to = latest_meta(path, "schema", to_v) or {}
            sch_at_v = latest_meta(path, "schema", v) or {}
            cdf_overrides = {
                c: t
                for c, t in sch_at_v.items()
                if c in sch_to and t != sch_to[c] and _widens_to(sch_to[c], t)
            }
            raw = _read_data(
                spark,
                path,
                [os.path.join(path, r) for r in commit["adds"]],
                merge_schema=True,
                version=to_v,
                type_overrides=cdf_overrides or None,
            )
            passthrough = ()
            if include_row_ids:
                # the commit's OWN base allocation names each row's id; a
                # PRE-ENABLE append's bases live in the enable commit's
                # backfill — resolve those at this commit's version so the
                # feed never NULLs an id the log actually holds
                bases = dict(commit.get("row_bases", {}))
                missing = [r for r in commit["adds"] if r not in bases]
                if missing:
                    backfill = _row_base_registry(path, up_to=to_v)
                    for r in missing:
                        if r in backfill:
                            bases[r] = backfill[r]
                base_df = spark.createDataFrame(
                    [(os.path.basename(rel), b) for rel, b in bases.items()],
                    "__fn string, __base long",
                )
                raw = (
                    raw.select(
                        "*",
                        _file_name_col().alias("__fn"),
                        F.col("_metadata.row_index").alias("__ri"),
                    )
                    .join(F.broadcast(base_df), "__fn", "left")
                    .withColumn("row_id", F.col("__base") + F.col("__ri"))
                    .drop("__fn", "__ri", "__base")
                )
                passthrough = ("row_id",)
            if cdf_overrides:
                rows = _to_logical(
                    raw,
                    {**sch_to, **cdf_overrides},
                    _column_mapping(path, to_v),
                    passthrough=passthrough,
                )
            else:
                rows = _logical_view(raw, path, to_v, passthrough=passthrough)
            legs.append(
                rows.withColumn("_change_type", F.lit("insert")).withColumn(
                    "_commit_version", F.lit(v).cast("bigint")
                )
            )
            continue
        d = _snapshot_diff(
            spark, path, v - 1, v, schema_v=to_v,
            include_row_ids=include_row_ids,
        )
        if d is not None:
            legs.append(
                d.withColumn("_commit_version", F.lit(v).cast("bigint"))
            )
    if not saw_data_commit:
        raise ValueError(f"no changes between versions {from_version} and {to_v}")
    if not legs:
        # data-bearing commits, zero row-level change (e.g. an OPTIMIZE-only
        # window): an EMPTY frame in the feed's schema, not an error
        files = visible_files(path, to_v) or visible_files(path, from_version)
        if files:
            t = _logical_view(
                _read_data(spark, path, files, merge_schema=True, version=to_v).limit(0),
                path,
                to_v,
            )
        elif (s_to := latest_meta(path, "schema", to_v)):
            t = spark.createDataFrame(
                [], ", ".join(f"`{c}` {typ}" for c, typ in s_to.items())
            )
        else:
            raise ValueError(
                f"no changes between versions {from_version} and {to_v}"
            )
        extra = (
            [F.lit(None).cast("long").alias("row_id")] if include_row_ids else []
        )
        return t.select(
            "*",
            F.lit(None).cast("string").alias("_change_type"),
            F.lit(None).cast("bigint").alias("_commit_version"),
            *extra,
        ).limit(0)
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg, allowMissingColumns=True)
    if include_row_ids and "row_id" not in out.columns:
        out = out.withColumn("row_id", F.lit(None).cast("long"))
    return out


def _snapshot_diff(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    schema_v: int,
    include_row_ids: bool = False,
) -> DataFrame | None:
    """Net row-level diff between two snapshots — the cross-file CDC
    engine: file-set symmetric difference + deletion-vector corrections,
    rewritten-but-identical rows cancelling via ``exceptAll`` (a shuffle
    bounded by changed-file rows). Used per-commit by
    :func:`table_changes` for commits without a stored change record and
    by :func:`restore` to MATERIALIZE its record. Columns resolve to the
    logical schema at ``schema_v``, except that a column WIDENED in
    either snapshot relative to ``schema_v`` renders at the covering
    (wider) type: a restore below a type widening removes files whose
    physical pages the narrow type cannot hold — scanning narrow would
    fail (or silently wrap) on exactly the rows the record must report,
    so the record stays lossless at the wide type. Returns ``None`` when
    the snapshots are provably identical (no file or DV difference)."""
    f_from = set(visible_files(path, v_from))
    f_to = set(visible_files(path, v_to))
    added = sorted(f_to - f_from)
    removed = sorted(f_from - f_to)
    sv = latest_meta(path, "schema", schema_v) or {}
    type_overrides: dict = {}
    for other_v in (v_from, v_to):
        if other_v == schema_v:
            continue
        so = latest_meta(path, "schema", other_v) or {}
        for c, t in so.items():
            base = type_overrides.get(c, sv.get(c))
            if base is not None and t != base and _widens_to(base, t):
                type_overrides[c] = t

    # Deletion-vector awareness: a DV commit changes no files, so the
    # file-set diff alone would miss (or double-report) logical deletes.
    # Three corrections, all position-exact:
    #   - rows of ADDED files that are already DV-dead at v_to were never
    #     part of the target snapshot -> drop from the insert side;
    #   - rows of REMOVED files that were DV-dead at v_from were not
    #     part of the source snapshot -> drop from the delete side (a CoW
    #     rewrite after a DV delete must not re-report those rows);
    #   - files visible in BOTH snapshots whose DV set CHANGED emit the
    #     positions added as deletes and — since RESTORE's dv_set can
    #     SHRINK a file's DV list back to an older state — the positions
    #     removed as inserts (resurrected rows re-enter the snapshot).
    dvs_from = visible_dvs(path, v_from)
    dvs_to = visible_dvs(path, v_to)

    def _positions(dv_map, files):
        rels = {os.path.relpath(f, path) for f in files}
        paths = sorted({p for rel, ps in dv_map.items() if rel in rels for p in ps})
        if not paths:
            return None
        return spark.read.parquet(*paths).select("file_name", "row_index")

    def _read_minus_dvs(files, dv_map):
        df = _read_data(
            spark, path, files, version=schema_v,
            type_overrides=type_overrides or None,
        ).select(
            "*",
            _file_name_col().alias("__fn"),
            F.col("_metadata.row_index").alias("__ri"),
        )
        # render at schema_v's logical names but the COVERING types (the
        # narrow logged type would downcast-overflow the wide rows this
        # record exists to report)
        render = latest_meta(path, "schema", schema_v)
        if render is not None and type_overrides:
            render = {**render, **type_overrides}
        df = _to_logical(
            df,
            render,
            _column_mapping(path, schema_v),
            passthrough=("__fn", "__ri"),
        )
        pos = _positions(dv_map, files)
        if pos is not None:
            pos = pos.select(
                F.col("file_name").alias("__fn"), F.col("row_index").alias("__ri")
            )
            df = df.join(F.broadcast(pos), ["__fn", "__ri"], "left_anti")
        return df.drop("__fn", "__ri")

    common = sorted(f_from & f_to)
    dv_changed = [
        f
        for f in common
        if set(dvs_to.get(os.path.relpath(f, path), []))
        != set(dvs_from.get(os.path.relpath(f, path), []))
    ]
    if not added and not removed and not dv_changed:
        return None
    a = _read_minus_dvs(added, dvs_to) if added else None
    r = _read_minus_dvs(removed, dvs_from) if removed else None
    if a is None and r is None:
        template = _logical_view(
            _read_data(spark, path, sorted(f_to or f_from), version=schema_v).limit(0),
            path,
            schema_v,
        )
        a = r = template
    elif a is None:
        a = r.limit(0)
    elif r is None:
        r = a.limit(0)
    inserts = a.exceptAll(r).withColumn("_change_type", F.lit("insert"))
    deletes = r.exceptAll(a).withColumn("_change_type", F.lit("delete"))
    out = inserts.unionByName(deletes)
    if include_row_ids:
        # the exceptAll legs serve only LEGACY pre-change-record rewrites
        # and session-less RESTOREs — no id was materialized by those
        # writers; NULL, never a guess
        out = out.withColumn("row_id", F.lit(None).cast("long"))
    if dv_changed:
        new_pos = _positions(dvs_to, dv_changed)
        old_pos = _positions(dvs_from, dv_changed)
        raw = _read_data(spark, path, dv_changed, version=schema_v)
        rows = raw.select(
            "*",
            _file_name_col().alias("__fn"),
            F.col("_metadata.row_index").alias("__ri"),
        )
        passthrough = ["__fn", "__ri"]
        if include_row_ids:
            # position-exact identity for DV-commit changes: materialized
            # column if the file carries one, else base + position
            mat = (
                F.col(_ROWID).cast("long")
                if _ROWID in raw.columns
                else F.lit(None).cast("long")
            )
            bases = visible_row_bases(path, v_to)
            base_df = spark.createDataFrame(
                [(os.path.basename(rel), b) for rel, b in bases.items()],
                "__fn string, __base long",
            )
            rows = (
                rows.withColumn("__mat", mat)
                .join(F.broadcast(base_df), "__fn", "left")
                .withColumn(
                    "row_id",
                    F.coalesce(F.col("__mat"), F.col("__base") + F.col("__ri")),
                )
                .drop("__mat", "__base")
            )
            passthrough.append("row_id")
        rows = _logical_view(rows, path, schema_v, passthrough=tuple(passthrough))

        def _emit(pos, change_type):
            return (
                rows.join(
                    F.broadcast(
                        pos.select(
                            F.col("file_name").alias("__fn"),
                            F.col("row_index").alias("__ri"),
                        )
                    ),
                    ["__fn", "__ri"],
                )
                .drop("__fn", "__ri")
                .withColumn("_change_type", F.lit(change_type))
            )

        if new_pos is not None:
            d = new_pos
            if old_pos is not None:
                d = d.join(old_pos, ["file_name", "row_index"], "left_anti")
            out = out.unionByName(_emit(d, "delete"))
        if old_pos is not None:
            i = old_pos
            if new_pos is not None:
                i = i.join(new_pos, ["file_name", "row_index"], "left_anti")
            out = out.unionByName(_emit(i, "insert"))
    return out


def optimize(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    small_file_bytes: int | None = None,
    prune_col: str | None = None,
    lo=None,
    hi=None,
) -> int:
    """Atomic small-file compaction (the lakehouse ``OPTIMIZE``): rewrite
    the snapshot's undersized data files into ``ceil(bytes/target)`` files
    and flip visibility in ONE commit — readers see the table before or
    after compaction, never duplicates (contrast ``io.compact_parquet``,
    whose plain-directory swap has a duplicate window by necessity).

    Only files below ``small_file_bytes`` (default half the target) are
    read or rewritten; right-sized files stay referenced untouched, so the
    rewrite cost is bounded by the small-file bytes regardless of table
    size. The superseded files remain on disk for time travel until
    ``vacuum`` reclaims them. Returns the new version (or the current one
    if there was nothing to compact).

    ``prune_col``/``lo``/``hi`` scope the compaction to files whose logged
    stats can intersect the range (the ``OPTIMIZE ... WHERE`` surface):
    with partition-value or clustered stats this compacts ONE
    partition/band of a 100 TB table — the shape a streaming sink needs,
    compacting only the hot ingest partition while cold history stays
    byte-identical. Conservative like every stats consumer: statless
    files are considered in scope. ``prune_col`` is the LOGICAL name."""
    import math

    if small_file_bytes is None:
        small_file_bytes = target_file_bytes // 2
    read_v = current_version(path)
    if read_v == 0:
        return 0
    in_scope = visible_files(path, read_v)
    if prune_col is not None:
        pcol = _phys_name(path, read_v, prune_col)
        stats = visible_stats(path, read_v)
        c_lo, c_hi = _canon_bound(lo), _canon_bound(hi)
        in_scope = [
            p
            for p in in_scope
            if not _range_excludes(
                stats.get(os.path.relpath(p, path), {}).get(pcol), c_lo, c_hi
            )
        ]
    small = [p for p in in_scope if os.path.getsize(p) < small_file_bytes]
    if len(small) < 2:
        return read_v
    total = sum(os.path.getsize(p) for p in small)
    n_out = max(1, math.ceil(total / target_file_bytes))
    # mergeSchema: compacting across additive schema evolution must unify
    # the footers, or the rewrite could pick the narrower schema and lose
    # evolved columns permanently once vacuum reclaims the originals.
    compacted = _read_files_with_dvs(spark, path, read_v, small).coalesce(n_out)
    adds = _write_data_files(
        _to_physical(compacted, _column_mapping(path, read_v)), path
    )
    removes = [os.path.relpath(p, path) for p in small]
    # Compaction must not silently degrade data skipping: recollect stats
    # AND blooms for the rewritten files on every column the superseded
    # files carried them for.
    stat_cols, bloom_cols = _removed_skipping_cols(path, read_v, removes)
    stats = _collect_stats(path, adds, stat_cols or None)
    blooms = _collect_blooms(path, adds, bloom_cols or None)
    _try_commit(path, read_v + 1, adds, removes, stats, blooms, meta={"op": "optimize"})
    return read_v + 1


def _auto_compact_after_commit(
    spark: SparkSession,
    path: str,
    min_files: int,
    target_bytes: int,
) -> int | None:
    """Post-commit auto-compaction (the Delta autoCompact design): bound
    the table's small-file count at write cadence instead of waiting for
    a scheduled OPTIMIZE. Round 11 bounded LOG growth (expire_log); this
    bounds DATA-FILE-COUNT growth — the other unbounded accretion a
    per-few-seconds CDC append stream produces, and the one that degrades
    every scan (per-file open/footer costs) rather than just metadata ops.

    Trigger is metadata-cheap: count visible files under half the target
    size (log listing + size stats, no data read); below ``min_files``
    small files, do nothing. Best-effort like Delta's: the triggering
    append is already durable, so a compaction that loses its commit race
    simply yields — the racer's own post-commit hook (or the next
    append's) sees the same small files and retries. Any error other
    than the benign race propagates."""
    small_bytes = target_bytes // 2

    def _size(p: str) -> int:
        try:
            return os.path.getsize(p)
        except FileNotFoundError:
            # a concurrent optimize+vacuum reclaimed a file between our
            # snapshot resolution and this stat — it is not small anymore
            return target_bytes

    n_small = sum(1 for p in visible_files(path) if _size(p) < small_bytes)
    if n_small < min_files:
        return None
    try:
        return optimize(
            spark,
            path,
            target_file_bytes=target_bytes,
            small_file_bytes=small_bytes,
        )
    except (CommitConflict, FileNotFoundError):
        # best-effort, and the APPEND is already durable: a lost commit
        # race or a concurrently-reclaimed file must not make a landed
        # append look failed — the next append's hook retries
        return None


def optimize_zorder(
    spark: SparkSession,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    bits: int = 8,
    stats_cols: list[str] | None = None,
    prune_col: str | None = None,
    lo=None,
    hi=None,
) -> int:
    """``OPTIMIZE ... ZORDER BY`` — the maintenance-time twin of
    ``append_clustered``: rewrite the snapshot range-partitioned + sorted
    on the interleaved Morton key and flip visibility in one commit, so a
    table that accreted unclustered appends becomes multi-dimension
    prunable after the fact. Per-file stats on every clustered column land
    in the same commit; superseded files stay on disk for time travel until
    vacuum. Returns the new version (current one on an empty table).

    ``prune_col``/``lo``/``hi`` scope the rewrite to files whose logged
    stats can intersect the range — the ``OPTIMIZE ZORDER ... WHERE``
    surface (VERDICT r10 ask #5): re-cluster ONE hot band of a 100 TB
    table (the streaming-ingest partition, yesterday's date range) while
    every out-of-band file stays referenced byte-identical. Unscoped, the
    cost is one full snapshot rewrite — schedule it like any OPTIMIZE,
    off the write path. Statless files are conservatively in scope, and
    ``prune_col`` is the LOGICAL name, exactly like ``optimize``'s WHERE."""
    from datalake_brief_spark.sources.io import zorder_value

    read_v = current_version(path)
    if read_v == 0:
        return 0
    in_scope = visible_files(path, read_v)
    if prune_col is not None:
        pcol = _phys_name(path, read_v, prune_col)
        fstats = visible_stats(path, read_v)
        c_lo, c_hi = _canon_bound(lo), _canon_bound(hi)
        in_scope = [
            p
            for p in in_scope
            if not _range_excludes(
                fstats.get(os.path.relpath(p, path), {}).get(pcol), c_lo, c_hi
            )
        ]
        if not in_scope:
            return read_v
    # MOR-aware: any rewrite must apply live deletion vectors or it would
    # resurrect DV-deleted rows. On a row-tracking table the
    # files-with-dvs read carries __row_id, so the clustered rewrite
    # MATERIALIZES every row's id (maintenance never re-keys). The scoped
    # form reads ONLY the in-band files — cost tracks the band.
    df = _read_files_with_dvs(spark, path, read_v, in_scope)
    z = zorder_value(df, cluster_cols, bits=bits)
    arranged = (
        z.repartitionByRange(n_files, F.col("__zval"))
        .sortWithinPartitions("__zval")
        .drop("__zval")
    )
    removes = [os.path.relpath(p, path) for p in in_scope]
    prev_stat_cols, prev_bloom_cols = _removed_skipping_cols(path, read_v, removes)
    mapping = _column_mapping(path, read_v)
    adds = _write_data_files(_to_physical(arranged, mapping), path)
    stats = _collect_stats(
        path,
        adds,
        sorted(
            {mapping.get(c, c) for c in (stats_cols or cluster_cols)}
            | set(prev_stat_cols)
        ),
    )
    blooms = _collect_blooms(path, adds, prev_bloom_cols or None)
    _try_commit(
        path, read_v + 1, adds, removes, stats, blooms, meta={"op": "optimize_zorder"}
    )
    return read_v + 1


def clone(src_path: str, dst_path: str, version: int | None = None) -> int:
    """SHALLOW CLONE (the Delta ``CREATE TABLE ... SHALLOW CLONE``
    surface): a new table whose first commit REFERENCES the source
    snapshot's data files — zero bytes copied, metadata-only, any table
    size. The clone evolves independently afterwards: its commits land in
    its own log, its ``vacuum`` walks only its own data directory (cloned
    references live under the SOURCE root and are never deleted by the
    clone), and source commits after the clone point are invisible to it.
    The source's stats/blooms/row counts ride along, so data skipping and
    fast_count work on the clone immediately. Caveat (same as Delta):
    vacuuming the SOURCE can reclaim files the clone references — retain
    accordingly, or deep-copy via ``overwrite(read(...), dst)``.
    Returns the clone's first version."""
    live = _replay(src_path, version)
    if not live:
        raise FileNotFoundError(f"no table at {src_path!r} (empty log)")
    if _versions(dst_path):
        raise FileExistsError(f"clone target {dst_path!r} already has a log")
    os.makedirs(dst_path, exist_ok=True)
    # re-key every entry to a dst-relative path that resolves to the
    # source's physical file (os.path.join(dst, rel) == src file)
    rel_map = {
        os.path.relpath(os.path.join(src_path, rel), dst_path): e
        for rel, e in live.items()
    }
    meta = {"op": "clone", "source": os.path.abspath(src_path)}
    for key in (
        "schema",
        "constraints",
        "column_mapping",
        "physical_reserved",
        "protocol",
        # write-contract metadata rides too: a clone losing the identity
        # watermark would silently stop assigning (column reads NULL), a
        # clone losing generation expressions would stop enforcing them
        "identity",
        "generated",
        # the clone copies the raw blooms, so the retirement list MUST
        # ride with them — a chain-leaving-widened source's int-hashed
        # blooms would otherwise resurrect on the clone's (double/
        # decimal) column and false-skip point reads
        "bloom_retired",
        # TBLPROPERTIES travel with the table (Delta clones carry them):
        # a clone silently losing autoCompact/retention policy breaks
        # the policies-live-with-the-data story
        "properties",
    ):
        m = latest_meta(src_path, key, version)
        if m is not None:
            meta[key] = m
    # column defaults ride along, but a clone's one-commit log cannot
    # resolve the SOURCE's add-commit versions — record each initial
    # default's pre-add population as an explicit dst-relative file list
    # (bounded by the clone's own file count, like the stats it already
    # serializes). Clone-of-clone re-keys the list it inherited.
    cds = latest_meta(src_path, "column_defaults", version)
    if cds is not None:
        out_cds = {}
        for c, d in cds.items():
            d = dict(d)
            if d.get("initial") is not None:
                if d.get("pre_files") is not None:
                    pre_abs = {
                        os.path.join(src_path, p) for p in d["pre_files"]
                    }
                else:
                    pre_abs = set(visible_files(src_path, d["v_add"]))
                d["pre_files"] = sorted(
                    os.path.relpath(os.path.join(src_path, rel), dst_path)
                    for rel in live
                    if os.path.join(src_path, rel) in pre_abs
                )
            out_cds[c] = d
        meta["column_defaults"] = out_cds
    # live deletion vectors ride along (dv_set — replay-time replacement),
    # each sidecar group re-keyed dst-relative exactly like the data files:
    # without this a shallow clone would resurrect every DV-deleted row.
    dv_set = {
        rel: [
            os.path.relpath(os.path.join(src_path, d), dst_path)
            for d in e["dvs"]
        ]
        for rel, e in rel_map.items()
        if e.get("dvs")
    }
    # row tracking carries into the clone: per-file bases ride like stats,
    # the flag + watermark like any meta (ids in the clone == ids in the
    # source snapshot; the clone allocates its own fresh ids from the
    # carried watermark thereafter)
    for key in ("row_tracking", "row_id_watermark"):
        m = latest_meta(src_path, key, version)
        if m is not None:
            meta[key] = m
    row_bases = {
        rel: e["base"] for rel, e in rel_map.items() if e.get("base") is not None
    }
    commit = {
        "version": 1,
        "adds": sorted(rel_map),
        "removes": [],
        "ts": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        "rows": {rel: e.get("rows") for rel, e in rel_map.items()},
        "stats": {rel: e["stats"] for rel, e in rel_map.items() if e.get("stats")},
        "blooms": {rel: e["blooms"] for rel, e in rel_map.items() if e.get("blooms")},
        "meta": meta,
    }
    if dv_set:
        commit["dv_set"] = dv_set
    if row_bases:
        commit["row_bases"] = row_bases
    logstore.for_path(dst_path).put_if_absent(
        _commit_path(dst_path, 1), json.dumps(commit)
    )
    return 1


def vacuum_retention_floor(path: str) -> int:
    """Minimum ``retain_versions`` that :func:`vacuum` will honor — the
    reader-race guard. Readers resolve their snapshot starting from the
    newest checkpoint and replay the tail; a vacuum that reclaims files
    referenced by any version at or after that checkpoint can delete data
    out from under a reader that resolved its file list moments earlier.
    Floor = number of versions at or after the newest checkpoint — the
    replay window of every checkpoint-started resolution, bounded by the
    checkpoint cadence (``_CHECKPOINT_EVERY`` commits). A young
    checkpoint-less table has no checkpoint-derived window: floor 1 (the
    current version only — an explicit vacuum there is the operator's
    call, exactly as before checkpoints existed). Reported by
    ``describe_detail`` as ``vacuum_retention_floor``."""
    vs = _versions(path)
    if not vs:
        return 0
    cps = _checkpoint_versions(path)
    if not cps:
        return 1
    newest_cp = max(cps)
    return sum(1 for v in vs if v >= newest_cp)


def vacuum(path: str, retain_versions: int = 1, dry_run: bool = False) -> list[str]:
    """Delete data files unreferenced by the ``retain_versions`` most recent
    versions (older time travel — and ``restore``/``table_changes`` into
    the vacuumed window — stops working, as documented for any vacuum).
    ``retain_versions`` is clamped up to :func:`vacuum_retention_floor`
    (versions at/after the newest checkpoint) so a concurrent reader that
    resolved its snapshot from that checkpoint never loses files mid-scan;
    reads pinned below the vacuumed horizon fail deterministically with a
    clear error naming the earliest readable version (see :func:`read`).
    Returns the deleted table-relative paths; ``dry_run=True`` returns the
    would-delete list without removing anything (the Delta ``VACUUM ...
    DRY RUN`` surface — audit the blast radius before reclaiming)."""
    vs = _versions(path)
    # The floor applies unconditionally — vacuum(path, 0) must not delete
    # the checkpoint-window versions the guard exists to protect.
    retain_versions = max(retain_versions, vacuum_retention_floor(path))
    keep: set[str] = set()
    keep_dv_groups: set[str] = set()
    keep_cdc: set[str] = set()
    for v in vs[-retain_versions:] if retain_versions > 0 else []:
        keep.update(os.path.relpath(p, path) for p in visible_files(path, v))
        # deletion-vector sidecars referenced by any retained version stay;
        # orphaned groups (their file rewritten/removed everywhere in the
        # window) reclaim with the data files.
        for dv_paths in visible_dvs(path, v).values():
            keep_dv_groups.update(
                os.path.relpath(d, path) for d in dv_paths
            )
        # change-data files age out WITH their commit: a CDC read needs
        # every commit in its window readable, and table_changes into the
        # vacuumed horizon already fails deterministically — so only the
        # retained versions' change records stay (Delta ties CDC file
        # retention to log retention the same way).
        keep_cdc.update(_load_commit(path, v).get("change_data", []))
    deleted = []
    store = logstore.for_path(path)

    # The metadata trees have their own lifecycles (log: reclaimed only
    # by expire_log; DV/change-data: group-granularity sweeps below;
    # manifest: a static export) — everything else under the root is
    # data, INCLUDING files imported in place by convert_to_txlog, which
    # live outside data/.
    _META_DIRS = {_LOG_DIR, _DV_DIR, _CDC_DIR, _MANIFEST_DIR}

    def _sweep(root_dir: str, is_kept) -> None:
        if not os.path.isdir(root_dir):
            return
        for root, dirs, files in os.walk(root_dir):
            if root == root_dir:
                dirs[:] = [d for d in dirs if d not in _META_DIRS]
            for f in files:
                rel = os.path.relpath(os.path.join(root, f), path)
                if f.endswith(".parquet") and not is_kept(rel):
                    if not dry_run:
                        store.delete(os.path.join(path, rel))
                    deleted.append(rel)
        if not dry_run:
            for root, dirs, files in list(os.walk(root_dir, topdown=False)):
                if root == root_dir or os.path.basename(root) in _META_DIRS:
                    continue
                if not dirs and not files:
                    store.delete_tree(root)

    _sweep(path, lambda rel: rel in keep)
    # DV sidecars reclaim at GROUP granularity (each delete commit wrote one
    # _dv/<uuid>/ directory): an orphaned group goes wholesale, including
    # its _SUCCESS/.crc markers.
    dv_root = os.path.join(path, _DV_DIR)
    if os.path.isdir(dv_root):
        for g in sorted(os.listdir(dv_root)):
            grel = os.path.join(_DV_DIR, g)
            gabs = os.path.join(path, grel)
            if not os.path.isdir(gabs) or grel in keep_dv_groups:
                continue
            for root, _, files in os.walk(gabs):
                for f in files:
                    if f.endswith(".parquet"):
                        deleted.append(os.path.relpath(os.path.join(root, f), path))
            if not dry_run:
                store.delete_tree(gabs)
    # Change-data groups (one _change_data/<uuid>/ dir per file group a
    # rewrite commit landed) reclaim wholesale, markers included, once no
    # retained version's commit references them.
    keep_cdc_groups = {os.path.dirname(r) for r in keep_cdc}
    cdc_root = os.path.join(path, _CDC_DIR)
    if os.path.isdir(cdc_root):
        for g in sorted(os.listdir(cdc_root)):
            grel = os.path.join(_CDC_DIR, g)
            gabs = os.path.join(path, grel)
            if not os.path.isdir(gabs) or grel in keep_cdc_groups:
                continue
            for root, _, files in os.walk(gabs):
                for f in files:
                    if f.endswith(".parquet"):
                        deleted.append(os.path.relpath(os.path.join(root, f), path))
            if not dry_run:
                store.delete_tree(gabs)
    return sorted(deleted)


def expire_log(
    path: str,
    retain_versions: int | None = None,
    retain_age: "_dt.timedelta | None" = None,
    dry_run: bool = False,
) -> list[str]:
    """Reclaim old COMMIT records and superseded checkpoints — the Delta
    ``logRetentionDuration`` design, and the last unbounded-growth path
    at CDC cadence: a stream committing every few seconds accrues ~10⁶
    commit JSONs a month, and without expiry the log directory grows
    without bound even though resolution is already O(tail).

    The horizon ``B`` is the newest CHECKPOINT version satisfying every
    given constraint (``retain_versions``: at least that many newest
    versions stay time-travelable; ``retain_age``: only commits strictly
    older than the timedelta are reclaimed — commit wall-clocks are
    clamped monotonic exactly as ``version_at_timestamp`` reads them).
    Everything strictly below ``B`` goes: commit JSONs, checkpoint
    markers, and multi-part checkpoint parquet parts. ``B`` itself — a
    complete checkpoint plus the dense commit tail above it — remains,
    so every version ≥ ``B`` resolves exactly as before (reads, streams,
    CDF, restore, vacuum all unaffected above the horizon), while time
    travel and change feeds below ``B`` fail deterministically naming
    the earliest readable version (the same error contract vacuum gives
    reclaimed data files). Data-file reclamation stays vacuum's job —
    the two compose in either order.

    Crash safety: commits are deleted before their checkpoints, and the
    listing-path replay carries a density check, so a reader racing a
    half-finished expiry either resolves normally or fails with the
    named-floor error — never a silently stale or holed snapshot. Like
    VACUUM, choose retention generous enough that no reader still
    replays below it (Delta defaults to 30 days for the same reason).

    The first effective expiry writes a metadata-only commit folding the
    ``log-retention`` READER FEATURE into the table protocol (same gate
    mechanism as deletion vectors / column mapping): engine builds that
    predate the expiry floor checks refuse the table with an unknown-
    feature error instead of mis-reading a reclaimed log.

    Returns the reclaimed log-file basenames; ``dry_run=True`` previews
    without deleting."""
    if retain_versions is None and retain_age is None:
        raise ValueError("expire_log needs retain_versions and/or retain_age")
    if retain_versions is not None and retain_versions < 1:
        raise ValueError("retain_versions must be >= 1")
    vs = _versions(path)
    if not vs:
        return []
    tip = vs[-1]
    cps = _checkpoint_versions(path)
    bound = tip + 1
    if retain_versions is not None:
        bound = min(bound, tip - retain_versions + 1)
    if retain_age is not None:
        cutoff = _dt.datetime.now(_dt.timezone.utc) - retain_age
        first_young = None
        clamped = None
        for v in vs:
            ts = _commit_ts(path, v)
            clamped = ts if clamped is None else max(clamped, ts)
            if clamped >= cutoff:
                first_young = v
                break
        bound = min(bound, first_young if first_young is not None else tip + 1)
    horizon = max((c for c in cps if vs[0] <= c <= bound), default=None)
    if horizon is None or horizon <= vs[0]:
        return []  # nothing expirable yet (young table / tight retention)
    if not dry_run and "log-retention" not in set(
        table_protocol(path).get("reader_features", [])
    ):
        # Declare the reader feature BEFORE reclaiming anything: engine
        # builds that predate the expiry floor/density checks then refuse
        # the table outright (unknown feature) instead of silently
        # replaying a partial snapshot from the surviving prefix — the
        # same irreversible-layout gate DVs and column mapping use.
        # Protocol is version-resolved, so time travel below this
        # declaring commit is not gated (Delta's protocol upgrades share
        # that shape); the retention-generosity guidance above is the
        # complementary defense.
        declare = tip + 1
        # bounded retry: every other DDL surfaces CommitConflict to the
        # caller (loser's-retry-is-the-caller's-re-run); under sustained
        # append contention an unbounded loop would let a maintenance
        # sweep spin indefinitely. A handful of attempts absorbs the
        # benign transient races; past that the caller re-runs.
        for attempt in range(5):
            try:
                _try_commit(
                    path,
                    declare,
                    [],
                    [],
                    meta=_with_feature(
                        path, {"op": "expire_log"}, "log-retention"
                    ),
                )
                break
            except CommitConflict:
                if "log-retention" in set(
                    table_protocol(path).get("reader_features", [])
                ):
                    break  # a racing expiry declared it — nothing to add
                if attempt == 4:
                    raise
                declare = current_version(path) + 1
    store = logstore.for_path(path)
    reclaimed: list[str] = []
    # commits first (ascending), checkpoints after: at every intermediate
    # crash point the surviving checkpoints cover all surviving commits,
    # and the replay density check converts any transient hole into the
    # deterministic floor error instead of a stale snapshot.
    for v in vs:
        if v >= horizon:
            break
        p = _commit_path(path, v)
        reclaimed.append(os.path.basename(p))
        if not dry_run:
            store.delete(p)
    for c in cps:
        if c >= horizon:
            continue
        marker = _checkpoint_path(path, c)
        try:
            k = json.loads(store.read_text(marker)).get("parts", 0)
        except (FileNotFoundError, ValueError):
            k = 0
        for n in range(1, k + 1):
            part = _checkpoint_part_path(path, c, n, k)
            reclaimed.append(os.path.basename(part))
            if not dry_run:
                store.delete(part)
        reclaimed.append(os.path.basename(marker))
        if not dry_run:
            store.delete(marker)
    return reclaimed


def needs_optimize(
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_small_files: int = 8,
    small_file_bytes: int | None = None,
) -> dict:
    """Compaction advisor — the maintenance-schedule complement of
    :func:`optimize`. METADATA-ONLY: the snapshot's file list comes from
    the log and sizes from file stats; no data page is read, so the check
    costs O(n_files) stat calls at any table size.

    Returns ``{'n_files', 'n_small', 'small_bytes', 'recommended',
    'n_dv_rows', 'mor_join_strategy', 'reorg_recommended'}``;
    ``recommended`` is True when at least ``min_small_files`` undersized
    files exist (below ``small_file_bytes``, default half the target) —
    the point where per-file open/footer overhead starts to dominate
    scans and an OPTIMIZE pays for itself. Streaming sinks commit one
    file set per micro-batch, so this trips naturally after sustained
    ingestion; run ``optimize(...)`` when it does.

    Deletion-vector read amplification is its OWN advice channel
    (``reorg_recommended``): a LARGE file that accumulated a big DV is
    invisible to the small-file criterion, yet every MOR read pays its
    dead positions — once the accumulated DVs would push the anti-join
    into the shuffle regime (DV_BROADCAST_MAX_ROWS), run
    :func:`reorg_purge` to rewrite exactly the DV-carrying files."""
    if small_file_bytes is None:
        small_file_bytes = target_file_bytes // 2
    cur = current_version(path)
    files = visible_files(path, cur) if cur else []
    sizes = [os.path.getsize(p) for p in files]
    small = [s for s in sizes if s < small_file_bytes]
    dv_paths = sorted(
        {p for ps in visible_dvs(path, cur).values() for p in ps}
    ) if cur else []
    n_dv_rows = _dv_rows_from_footers(dv_paths)
    return {
        "n_files": len(files),
        "n_small": len(small),
        "small_bytes": int(sum(small)),
        "recommended": len(small) >= min_small_files,
        "n_dv_rows": n_dv_rows,
        "mor_join_strategy": (
            "none"
            if not n_dv_rows
            else ("broadcast" if n_dv_rows <= DV_BROADCAST_MAX_ROWS else "shuffle")
        ),
        "reorg_recommended": n_dv_rows > DV_BROADCAST_MAX_ROWS,
    }


def clustering_decay(
    path: str,
    cols: list[str] | None = None,
    max_overlap: float = 0.5,
    min_files: int = 4,
    version: int | None = None,
) -> dict:
    """Clustering-decay advisor — the Z-order complement of
    :func:`needs_optimize`: unclustered appends (CDC tails, backfills)
    silently widen per-file ranges until multi-dimension pruning stops
    skipping anything, and nothing on the write path reports it. This
    check is METADATA-ONLY (per-file stats from the log; no data page
    read) and O(n·d log n) via a per-dimension interval sweep.

    Decay signal: each file's OVERLAP FRACTION on the clustered dims —
    for every dimension, the fraction of other files whose [lo, hi]
    stats interval intersects this file's, then the MIN across
    dimensions (an upper bound on joint overlap: Z-order clusters
    jointly, so a file well-separated on ANY dim still prunes). A
    well-clustered snapshot scores near 1/n_files; an unclustered append
    spanning the key space scores ~1.0. Files with missing stats on a
    clustered dim conservatively score 1.0 (they defeat pruning by
    construction).

    ``cols`` defaults to the ``clustering.columns`` TBLPROPERTY. Returns
    ``{'columns', 'n_files', 'n_decayed', 'decayed_fraction',
    'recommended', 'band'}`` where ``band`` is the decayed files'
    combined [lo, hi] on ``cols[0]`` — the scope to hand
    ``optimize_zorder(..., prune_col=cols[0], lo, hi)`` so the rewrite
    touches the DECAYED BAND only and every cold file stays referenced
    byte-identical. ``recommended`` trips at ``min_files`` files above
    ``max_overlap``.

    The fraction is TABLE-GLOBAL: it detects the dominant decay shape —
    unclustered appends spanning the clustered key space (every CDC
    tail, backfill, or un-sorted bulk load does) — at any table size,
    because such files overlap ~everything. A tail confined to a narrow
    band of a very large table dilutes below a global threshold; lower
    ``clustering.maxOverlap`` proportionally for such tables, or run a
    scoped ``optimize_zorder`` on the known-hot band directly."""
    import bisect

    if cols is None:
        raw = table_properties(path, version).get("clustering.columns", "")
        cols = [c.strip() for c in raw.split(",") if c.strip()]
    if not cols:
        raise ValueError(
            "clustering_decay needs cluster columns (argument or the "
            "clustering.columns TBLPROPERTY)"
        )
    cur = version if version is not None else current_version(path)
    files = visible_files(path, cur) if cur else []
    out = {
        "columns": list(cols),
        "n_files": len(files),
        "n_decayed": 0,
        "decayed_fraction": 0.0,
        "recommended": False,
        "band": None,
    }
    if len(files) < 2:
        return out
    stats = visible_stats(path, cur)
    rels = [os.path.relpath(p, path) for p in files]
    pcols = [_phys_name(path, cur, c) for c in cols]
    n = len(rels)
    # per-dim interval sweep: overlap count for file i on dim d =
    # |{j : lo_j <= hi_i}| - |{j : hi_j < lo_i}| - 1 (two bisects over
    # the sorted endpoint arrays — O(n log n), never pairwise)
    scores = [1.0] * n  # min across dims; statless stays 1.0
    for pcol in pcols:
        ivals = []
        for rel in rels:
            s = stats.get(rel, {}).get(pcol)
            if s is None or s[0] is None or s[1] is None:
                ivals.append(None)
            else:
                ivals.append((_canon_stat(s[0], True), _canon_stat(s[1], False)))
        known = [iv for iv in ivals if iv is not None]
        if len(known) < 2:
            continue  # dim carries no usable stats: no evidence either way
        strs = [x for iv in known for x in iv if isinstance(x, str)]
        if strs and len(strs) != 2 * len(known):
            continue  # mixed str/numeric stats (type chaos): no evidence
        if strs and len(set(map(len, strs))) > 1:
            # mixed-width date/timestamp strings: unify ONCE against the
            # widest form so plain lexicographic bisect stays correct
            ref = max(strs, key=len)

            def _u(x):
                return _unify_stat_strs(x, ref)[0] if isinstance(x, str) else x

            ivals = [
                None if iv is None else (_u(iv[0]), _u(iv[1])) for iv in ivals
            ]
            known = [iv for iv in ivals if iv is not None]
        los = sorted(lo for lo, _ in known)
        his = sorted(hi for _, hi in known)
        m = len(known)
        for i, iv in enumerate(ivals):
            if iv is None:
                continue  # statless: score stays 1.0 (prune-defeating)
            lo_i, hi_i = iv
            cnt = (
                bisect.bisect_right(los, hi_i)
                - bisect.bisect_left(his, lo_i)
                - 1
            )
            frac = cnt / (m - 1) if m > 1 else 0.0
            scores[i] = min(scores[i], frac)
    decayed_idx = [i for i, s in enumerate(scores) if s > max_overlap]
    out["n_decayed"] = len(decayed_idx)
    out["decayed_fraction"] = round(len(decayed_idx) / n, 4)
    out["recommended"] = len(decayed_idx) >= min_files
    if decayed_idx:
        # scope on the FIRST clustered column: raw stat values (not the
        # canon forms) so the band feeds optimize_zorder's bounds verbatim
        p0 = pcols[0]
        bounds = [
            stats.get(rels[i], {}).get(p0)
            for i in decayed_idx
            if stats.get(rels[i], {}).get(p0) is not None
        ]
        bounds = [b for b in bounds if b[0] is not None and b[1] is not None]
        if bounds:
            lo = min((b[0] for b in bounds), key=lambda x: _canon_stat(x, True))
            hi = max((b[1] for b in bounds), key=lambda x: _canon_stat(x, False))
            out["band"] = [lo, hi]
    return out


# ---------------------------------------------------------------------------
# Merge-on-read deletion vectors (the Delta DV / Iceberg positional-delete
# shape): DELETE writes a row-position sidecar instead of rewriting data
# files; reads anti-join the union of a file's sidecars on
# (file, _metadata.row_index). Copy-on-write (delete_where) rewrites
# matched files — O(matched bytes) per delete, zero read overhead; DV
# deletes cost O(matched ROWS) metadata per delete and a bounded anti-join
# at read — the right trade for frequent small deletes (GDPR erasure,
# late-event retraction) on huge files. A file's DVs vanish when the file
# is rewritten/removed (CoW mutations, overwrite, compaction), so the two
# mutation families compose.
# ---------------------------------------------------------------------------

_DV_DIR = "_dv"


def visible_dvs(path: str, version: int | None = None) -> dict[str, list[str]]:
    """Live deletion-vector sidecars at ``version``: data-file rel path →
    list of sidecar parquet groups (absolute), in commit order. Resolved
    by the same checkpoint-accelerated replay as visible_files."""
    return {
        rel: [os.path.join(path, d) for d in (e.get("dvs") or [])]
        for rel, e in _replay(path, version).items()
        if e.get("dvs")
    }


def _file_name_col():
    """Basename of the scanned parquet file — data files are uuid-grouped
    part files, so the basename is unique table-wide and stable under
    table relocation (absolute URIs are not)."""
    return F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)


def _read_files_with_dvs(
    spark: SparkSession, path: str, read_v: int, files: list[str]
) -> DataFrame:
    """Read specific live data files with their deletion vectors applied —
    the ONLY correct input for any rewrite (CoW DELETE/UPDATE,
    replaceWhere survivors, compaction, Z-order): rewriting raw file
    bytes would RESURRECT DV-deleted rows, because the rewrite commit
    drops the file's DVs along with the file. mergeSchema for the usual
    evolution reason. Returns the LOGICAL view (rewriters re-translate
    with _to_physical before landing files) — which also means any
    rewrite lazily PURGES dropped-column bytes from the files it
    touches, the REORG PURGE effect.

    On a row-tracking table the view additionally carries each row's
    stable id in the reserved ``__row_id`` PHYSICAL column, so every
    rewrite that lands this frame MATERIALIZES the ids into its new
    files — preservation happens by construction, no rewrite path can
    forget it."""
    if row_tracking_enabled(path, read_v):
        tagged = _rid_frame(spark, path, read_v, files)
    else:
        raw = _read_data(spark, path, files, merge_schema=True, version=read_v)
        tagged = None
    dvs = visible_dvs(path, read_v)
    rels = {os.path.relpath(f, path) for f in files}
    dv_paths = sorted(
        {p for rel, ps in dvs.items() if rel in rels for p in ps}
    )
    if tagged is None and not dv_paths:
        return _logical_view(raw, path, read_v)
    if tagged is None:
        # tag from the RAW scan (the _metadata pseudo-column resolves only
        # on the file-source relation), then translate to the logical view
        tagged = raw.select(
            "*",
            _file_name_col().alias("__fn"),
            F.col("_metadata.row_index").alias("__ri"),
        )
        tagged = _logical_view(tagged, path, read_v, passthrough=("__fn", "__ri"))
    if dv_paths:
        dv = spark.read.parquet(*dv_paths).select(
            F.col("file_name").alias("__fn"), F.col("row_index").alias("__ri")
        )
        out = _anti_join_dvs(
            tagged, dv, _dv_rows_from_footers(dv_paths), DV_BROADCAST_MAX_ROWS
        )
    else:
        out = tagged.drop("__fn", "__ri")
    if "__rid" in out.columns:
        out = out.withColumnRenamed("__rid", _ROWID)
    return out


def _tagged_live_frame(
    spark: SparkSession, path: str, read_v: int, files: list[str]
) -> DataFrame:
    """Like :func:`_read_files_with_dvs` but KEEPING the position tags
    (``__fn`` file basename / ``__ri`` row index) — the input for
    merge-on-read mutations, which land the live hit positions as
    deletion-vector sidecar rows instead of rewriting files. Existing DV
    positions are anti-joined out here, so a caller can never re-delete
    (or resurrect) an already-dead row. On a row-tracking table the
    stable id rides in ``__row_id`` like the CoW twin's frame."""
    if row_tracking_enabled(path, read_v):
        tagged = _rid_frame(spark, path, read_v, files)
        tagged = tagged.withColumnRenamed("__rid", _ROWID)
    else:
        raw = _read_data(spark, path, files, merge_schema=True, version=read_v)
        tagged = raw.select(
            "*",
            _file_name_col().alias("__fn"),
            F.col("_metadata.row_index").alias("__ri"),
        )
        tagged = _logical_view(tagged, path, read_v, passthrough=("__fn", "__ri"))
    dvs = visible_dvs(path, read_v)
    rels = {os.path.relpath(f, path) for f in files}
    dv_paths = sorted({p for rel, ps in dvs.items() if rel in rels for p in ps})
    if dv_paths:
        dv = spark.read.parquet(*dv_paths).select(
            F.col("file_name").alias("__fn"), F.col("row_index").alias("__ri")
        )
        build = (
            F.broadcast(dv)
            if _dv_rows_from_footers(dv_paths) <= DV_BROADCAST_MAX_ROWS
            else dv
        )
        tagged = tagged.join(build, ["__fn", "__ri"], "left_anti")
    return tagged


def delete_where_dv(
    spark: SparkSession,
    path: str,
    predicate,
    prune_col: str | None = None,
    lo=None,
    hi=None,
) -> int:
    """Row-level DELETE without rewriting any data file: matched row
    POSITIONS land in a parquet sidecar and one atomic commit maps it
    onto the affected files (``dv_adds``). Same pruning ladder as the
    copy-on-write twin (stats skip → bloom skip for point predicates),
    then ONE scan over surviving candidates emits (file, row_index) for
    predicate-TRUE rows — already-deleted positions are anti-joined out
    so a repeated delete is a no-op commit-wise, and SQL three-valued
    semantics hold (NULL-predicate rows are never matched). The sidecar
    write is distributed (never a driver collect of row ids); the commit
    is metadata-only. Readers must use :func:`read_mor`; plain
    :func:`read` (and footer-based fast_count) see pre-delete rows by
    design — the same contract as Delta readers without DV support.

    Returns the new version (current version when nothing matched)."""
    read_v = current_version(path)
    if read_v == 0:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    if isinstance(predicate, str):
        predicate = F.expr(predicate)
    all_files = visible_files(path, read_v)
    candidates = all_files
    if prune_col is not None:
        prune_col = _phys_name(path, read_v, prune_col)
        stats = visible_stats(path, read_v)
        blooms = visible_blooms(path, read_v) if lo is not None and lo == hi else {}
        c_lo, c_hi = _canon_bound(lo), _canon_bound(hi)
        candidates = []
        for abs_p in all_files:
            rel = os.path.relpath(abs_p, path)
            if _range_excludes(stats.get(rel, {}).get(prune_col), c_lo, c_hi):
                continue
            b64 = blooms.get(rel, {}).get(prune_col)
            if b64 is not None and not _bloom_may_contain(b64, lo):
                continue
            candidates.append(abs_p)
    if not candidates:
        return read_v
    # tag positions on the RAW scan, then evaluate the LOGICAL predicate
    # against the logical view (passthrough keeps the position tags)
    scan = _read_data(spark, path, candidates, merge_schema=True, version=read_v).select(
        "*",
        _file_name_col().alias("file_name"),
        F.col("_metadata.row_index").alias("row_index"),
    )
    scan = _logical_view(
        scan, path, read_v, passthrough=("file_name", "row_index")
    )
    hits = scan.filter(predicate).select("file_name", "row_index")
    existing = visible_dvs(path, read_v)
    existing_paths = sorted({p for ps in existing.values() for p in ps})
    if existing_paths:
        prior = spark.read.parquet(*existing_paths).select("file_name", "row_index")
        hits = hits.join(F.broadcast(prior), ["file_name", "row_index"], "left_anti")
    group = os.path.join(_DV_DIR, uuid.uuid4().hex)
    target = os.path.join(path, group)
    hits.write.mode("error").parquet(target)
    touched = [
        r.file_name
        for r in spark.read.parquet(target).select("file_name").distinct().collect()
    ]
    if not touched:
        logstore.for_path(path).delete_tree(target)
        return read_v
    by_base = {os.path.basename(p): os.path.relpath(p, path) for p in all_files}
    dv_adds = {by_base[fn]: group for fn in touched if fn in by_base}
    try:
        return _commit_serializable(
            spark, path, read_v, [], [], None, None,
            _with_feature(path, {"op": "delete_dv"}, "deletion-vectors"),
            predicate=predicate, dv_adds=dv_adds,
        )
    except CommitConflict:
        # the sidecar group landed before the commit; a losing writer must
        # sweep it (mirroring the no-touched-files cleanup above) or the
        # orphan lingers until a vacuum pass happens to catch it
        logstore.for_path(path).delete_tree(target)
        raise


# Past this many accumulated DV positions the MOR anti-join build side no
# longer broadcasts: a broadcast must fit in driver + every executor's
# memory, and a few hundred MB of (file_name, row_index) pairs IS the
# failure mode at that point. The fallback is a shuffle anti-join — cost
# still tracks the deleted-row count, spread across reducers instead of
# materialized whole on every node. ~4M positions ≈ 60-80 MB serialized,
# comfortably under Spark's own 8 GB broadcast hard cap with margin for
# row overhead.
DV_BROADCAST_MAX_ROWS = 4_000_000


def _dv_rows_from_footers(paths: list[str]) -> int:
    """Total DV positions across sidecar groups, from parquet FOOTERS only
    (each group is a directory of part files; no data pages read) — the
    metadata-cost signal that picks the MOR anti-join strategy."""
    total = 0
    for group in paths:
        for root, _, files in os.walk(group):
            for f in files:
                if f.endswith(".parquet"):
                    total += _file_rows(os.path.join(root, f))
    return total


def _anti_join_dvs(df: DataFrame, dv: DataFrame, n_dv_rows: int, max_broadcast: int):
    """Anti-join ``df`` (tagged __fn/__ri) against DV positions, choosing
    the build strategy by DV size: broadcast below ``max_broadcast``
    positions, shuffle above (see DV_BROADCAST_MAX_ROWS)."""
    build = F.broadcast(dv) if n_dv_rows <= max_broadcast else dv
    return df.join(build, ["__fn", "__ri"], "left_anti").drop("__fn", "__ri")


def read_mor(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    merge_schema: bool = False,
    dv_broadcast_max_rows: int | None = None,
) -> DataFrame:
    """Merge-on-read snapshot: the plain snapshot scan anti-joined against
    the union of the visible deletion-vector sidecars on
    (file basename, _metadata.row_index). With no live DVs this IS
    :func:`read` — zero overhead on pure-CoW tables. The anti-join
    build side is the DELETED-ROW COUNT, not the table size; below
    ``dv_broadcast_max_rows`` (default DV_BROADCAST_MAX_ROWS) it
    broadcasts and MOR read cost is scan + a broadcast hash anti-join at
    any table size; above it the build switches to a shuffle anti-join —
    a table that has accumulated hundreds of MB of positions must not
    materialize them whole on every executor (dv_metrics surfaces the
    chosen strategy and is the OPTIMIZE trigger). The row total comes
    from sidecar parquet footers, so strategy choice is metadata-only.
    Time travel works unchanged: a version below the delete resolves no
    DVs."""
    _check_reader(path, version)
    dvs = visible_dvs(path, version)
    if not dvs:
        return read(spark, path, version, merge_schema)
    files = visible_files(path, version)
    df = _read_data(spark, path, files, merge_schema, version=version).select(
        "*",
        _file_name_col().alias("__fn"),
        F.col("_metadata.row_index").alias("__ri"),
    )
    df = _logical_view(df, path, version, passthrough=("__fn", "__ri"))
    dv_paths = sorted({p for ps in dvs.values() for p in ps})
    dv = spark.read.parquet(*dv_paths).select(
        F.col("file_name").alias("__fn"), F.col("row_index").alias("__ri")
    )
    cap = DV_BROADCAST_MAX_ROWS if dv_broadcast_max_rows is None else dv_broadcast_max_rows
    return _anti_join_dvs(df, dv, _dv_rows_from_footers(dv_paths), cap)


def update_where_dv(
    spark: SparkSession,
    path: str,
    predicate,
    assignments: dict,
    prune_col: str | None = None,
    lo=None,
    hi=None,
) -> int:
    """Merge-on-read ``UPDATE ... SET`` — the mutation that makes a
    1%-row update cost 1% of the data instead of every touched file: in
    ONE atomic commit, the matched rows' POSITIONS land in a deletion-
    vector sidecar (hiding the old versions from :func:`read_mor`) and
    ONLY the rewritten rows append as a new file group. This is the
    Delta/Iceberg DV-backed UPDATE shape (delete-vector old row + append
    new row); :func:`update_where` remains the copy-on-write
    materialization that OPTIMIZE-style maintenance prefers.

    Same contract surface as the CoW twin: assignments validate against
    the TABLE schema up front (a misspelled SET column errors even on a
    no-match predicate), each assignment casts back to the column's
    existing type, CHECK constraints gate the rewritten rows, the
    stats/bloom channels the table carries are recollected on the
    appended files, and the pruning ladder (stats skip → bloom skip for
    point predicates) bounds the scan. SQL three-valued semantics hold
    (NULL-predicate rows untouched), already-DV-dead positions are never
    re-updated or resurrected (anti-join against the live DV union), and
    a repeated no-match call is a commit-free no-op. Plain :func:`read`
    sees old AND new row versions by design — the same contract as
    delete_where_dv. Returns the new version."""
    read_v = current_version(path)
    if read_v == 0:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    if isinstance(predicate, str):
        predicate = F.expr(predicate)
    table_schema = read(spark, path, read_v, merge_schema=True).schema
    table_fields = {f.name: f.dataType for f in table_schema.fields}
    unknown = set(assignments) - set(table_fields)
    if unknown:
        raise ValueError(f"assignments reference unknown columns: {sorted(unknown)}")
    all_files = visible_files(path, read_v)
    candidates = all_files
    if prune_col is not None:
        prune_col = _phys_name(path, read_v, prune_col)
        stats = visible_stats(path, read_v)
        blooms = visible_blooms(path, read_v) if lo is not None and lo == hi else {}
        c_lo, c_hi = _canon_bound(lo), _canon_bound(hi)
        candidates = []
        for abs_p in all_files:
            rel = os.path.relpath(abs_p, path)
            if _range_excludes(stats.get(rel, {}).get(prune_col), c_lo, c_hi):
                continue
            b64 = blooms.get(rel, {}).get(prune_col)
            if b64 is not None and not _bloom_may_contain(b64, lo):
                continue
            candidates.append(abs_p)
    if not candidates:
        return read_v
    # tag positions on the RAW scan, then evaluate the LOGICAL predicate
    # against the logical view (passthrough keeps the position tags)
    raw = _read_data(spark, path, candidates, merge_schema=True, version=read_v)
    scan = raw.select(
        "*",
        _file_name_col().alias("file_name"),
        F.col("_metadata.row_index").alias("row_index"),
    )
    tracking = row_tracking_enabled(path, read_v)
    passthrough = ["file_name", "row_index"]
    if tracking:
        # stable row ids ride with the updated rows: resolve each hit's id
        # (materialized column or base + position) so the appended rewrite
        # MATERIALIZES it — a DV UPDATE preserves identity like the CoW twin
        mat = (
            F.col(_ROWID) if _ROWID in raw.columns else F.lit(None).cast("long")
        )
        bases = visible_row_bases(path, read_v)
        base_df = spark.createDataFrame(
            [(os.path.basename(r), b) for r, b in bases.items()],
            "file_name string, __base long",
        )
        scan = scan.withColumn("__mat", mat).join(
            F.broadcast(base_df), "file_name", "left"
        )
        scan = scan.withColumn(
            "__rid",
            F.coalesce(F.col("__mat"), F.col("__base") + F.col("row_index")),
        ).drop("__mat", "__base")
        passthrough.append("__rid")
    scan = _logical_view(scan, path, read_v, passthrough=tuple(passthrough))
    hits = scan.filter(predicate)
    existing = visible_dvs(path, read_v)
    existing_paths = sorted({p for ps in existing.values() for p in ps})
    if existing_paths:
        prior = spark.read.parquet(*existing_paths).select("file_name", "row_index")
        hits = hits.join(
            F.broadcast(prior)
            if _dv_rows_from_footers(existing_paths) <= DV_BROADCAST_MAX_ROWS
            else prior,
            ["file_name", "row_index"],
            "left_anti",
        )
    group = os.path.join(_DV_DIR, uuid.uuid4().hex)
    target = os.path.join(path, group)
    hits.select("file_name", "row_index").write.mode("error").parquet(target)
    touched = [
        r.file_name
        for r in spark.read.parquet(target).select("file_name").distinct().collect()
    ]
    if not touched:
        logstore.for_path(path).delete_tree(target)
        return read_v
    # rewrite ONLY the matched rows (recomputed from the same immutable
    # candidate files — deterministic), padded to the evolved table schema,
    # every row predicate-TRUE so assignments apply unconditionally
    src = hits.drop("file_name", "row_index")
    for name, dtype in table_fields.items():
        if name not in src.columns:
            src = src.withColumn(name, F.lit(None).cast(dtype))
    cols = []
    for field in table_schema.fields:
        if field.name in assignments:
            a = assignments[field.name]
            a = F.expr(a) if isinstance(a, str) else a
            cols.append(a.cast(field.dataType).alias(field.name))
        else:
            cols.append(F.col(field.name))
    if tracking:
        cols.append(F.col("__rid").alias(_ROWID))
    rewritten = src.select(*cols)
    _enforce_constraints(rewritten, path)
    live_rels = [os.path.relpath(p, path) for p in all_files]
    stat_cols, bloom_cols = _removed_skipping_cols(path, read_v, live_rels)
    mapping = _column_mapping(path, read_v)
    adds = _write_data_files(_to_physical(rewritten, mapping), path)
    # change record, like the CoW twin: each updated row's pre-image
    # (original values, same stable id when tracking) + post-image (the
    # rewritten rows) — CDC over a DV-update window reads ONLY these
    # files, and the streaming CDF drains the commit from them (the DV
    # positions themselves must NOT be reported separately; the stored
    # record covers them, which is why the resolution ladder checks
    # change_data before dv state).
    pre_cols = [F.col(f.name) for f in table_schema.fields]
    if tracking:
        pre_cols.append(F.col("__rid").alias(_ROWID))
    pre = src.select(*pre_cols).withColumn("_change_type", F.lit("delete"))
    post = rewritten.withColumn("_change_type", F.lit("insert"))
    change_data = _write_change_files(
        _to_physical(pre.unionByName(post), mapping), path
    )
    stats_new = _collect_stats(path, adds, stat_cols or None)
    blooms_new = _collect_blooms(path, adds, bloom_cols or None)
    by_base = {os.path.basename(p): os.path.relpath(p, path) for p in all_files}
    dv_adds = {by_base[fn]: group for fn in touched if fn in by_base}
    try:
        return _commit_serializable(
            spark, path, read_v, adds, [], stats_new, blooms_new,
            _with_feature(path, {"op": "update_dv"}, "deletion-vectors"),
            predicate=predicate, dv_adds=dv_adds, change_data=change_data,
        )
    except CommitConflict:
        # losing writer sweeps ALL pre-landed groups (sidecar + data +
        # change record)
        logstore.for_path(path).delete_tree(target)
        for group_rels in (adds, change_data):
            if group_rels:
                logstore.for_path(path).delete_tree(
                    os.path.dirname(os.path.join(path, group_rels[0]))
                )
        raise


def dv_metrics(spark: SparkSession, path: str, version: int | None = None):
    """Deletion-vector health at a snapshot (metadata + sidecars only, no
    data pages): total DV'd rows, files carrying DVs, the worst
    single-file DV count, and the MOR anti-join strategy those numbers
    select (``broadcast`` under DV_BROADCAST_MAX_ROWS positions,
    ``shuffle`` past it) — the read-amplification signals that say when
    to OPTIMIZE a merge-on-read table (every MOR read anti-joins
    n_dv_rows; a file with a huge DV share is mostly-dead bytes; a
    shuffle-regime table is overdue). Returns a 1-row DataFrame
    (n_files, n_files_with_dv, n_dv_rows, max_file_dv_rows,
    mor_join_strategy)."""
    n_files = len(visible_files(path, version))
    dvs = visible_dvs(path, version)
    dv_paths = sorted({p for ps in dvs.values() for p in ps})
    if not dv_paths:
        return spark.createDataFrame(
            [(n_files, 0, 0, 0, "none")],
            "n_files long, n_files_with_dv long, n_dv_rows long, "
            "max_file_dv_rows long, mor_join_strategy string",
        )
    strategy = (
        "broadcast"
        if _dv_rows_from_footers(dv_paths) <= DV_BROADCAST_MAX_ROWS
        else "shuffle"
    )
    per = (
        spark.read.parquet(*dv_paths)
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return per.agg(
        F.lit(n_files).cast("long").alias("n_files"),
        F.count(F.lit(1)).cast("long").alias("n_files_with_dv"),
        F.sum("__n").cast("long").alias("n_dv_rows"),
        F.max("__n").cast("long").alias("max_file_dv_rows"),
        F.lit(strategy).alias("mor_join_strategy"),
    )


def reorg_purge(
    spark: SparkSession, path: str, min_file_dv_rows: int = 1
) -> int:
    """``REORG TABLE ... APPLY (PURGE)``: rewrite EXACTLY the files whose
    bytes are partially dead — files carrying ≥ ``min_file_dv_rows``
    deletion-vector positions (their MOR anti-join cost), and files still
    carrying RETIRED physical columns (dropped, or renamed-away-and-
    recycled) — leaving every fully-live file untouched, in one atomic
    commit. The targeted complement of :func:`optimize`: the small-file
    criterion never touches a LARGE file that accumulated a big DV, yet
    every merge-on-read scan pays its dead positions forever;
    ``needs_optimize.reorg_recommended`` trips when the accumulated DVs
    would push :func:`read_mor` into the shuffle regime. Candidate
    selection is metadata-only (sidecar per-file counts + parquet footer
    schemas). After the purge a plain :func:`read` equals
    :func:`read_mor` for the rewritten span and the dead column bytes
    are gone. Returns the new version (current one when nothing needs
    purging)."""
    read_v = current_version(path)
    if read_v == 0:
        return 0
    all_files = visible_files(path, read_v)
    by_base = {os.path.basename(p): p for p in all_files}
    targets: set[str] = set()
    dvs = visible_dvs(path, read_v)
    dv_paths = sorted({p for ps in dvs.values() for p in ps})
    if dv_paths:
        per = (
            spark.read.parquet(*dv_paths)
            .groupBy("file_name")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") >= min_file_dv_rows)
            .collect()
        )  # driver-scale: ≤ one row per DV-carrying file
        targets.update(
            by_base[r.file_name] for r in per if r.file_name in by_base
        )
    # files still carrying retired physical column bytes (footer-only)
    schema = latest_meta(path, "schema", read_v)
    if schema is not None:
        mapping = _column_mapping(path, read_v)
        live_phys = {mapping.get(c, c) for c in schema}
        retired = _physical_reserved(path, read_v) - live_phys
        if row_tracking_enabled(path, read_v):
            # __row_id is reserved so no logical column can ever recycle
            # its physical name, but on a tracking table it is a LIVE
            # internal column — treating it as retired would make every
            # purge rewrite all id-carrying files (and re-materialize the
            # ids via _read_files_with_dvs), so reorg_purge never
            # converges to its documented no-op.
            retired -= {_ROWID}
        if retired:
            import pyarrow.parquet as pq

            for p in all_files:
                if p in targets:
                    continue
                if retired & set(pq.ParquetFile(p).schema_arrow.names):
                    targets.add(p)
    # files that PREDATE an initial-defaulted column carry legacy layout
    # too — their backfill lives in metadata; the purge rewrite reads
    # through the logical view (defaults materialized) and migrates it
    # into the bytes, which is what lets drop_feature('column-defaults')
    # verify non-use afterwards
    cds = latest_meta(path, "column_defaults", read_v) or {}
    init = {c: d for c, d in cds.items() if d.get("initial") is not None}
    if init:
        for key, fl in _default_file_groups(path, all_files, init).items():
            if key:
                targets.update(fl)
    if not targets:
        return read_v
    rewritten = _read_files_with_dvs(spark, path, read_v, sorted(targets))
    removes = [os.path.relpath(p, path) for p in sorted(targets)]
    stat_cols, bloom_cols = _removed_skipping_cols(path, read_v, removes)
    # retired columns are being purged — drop their stat/bloom channels
    if schema is not None:
        live_phys = {
            _column_mapping(path, read_v).get(c, c) for c in schema
        }
        stat_cols = [c for c in stat_cols if c in live_phys]
        bloom_cols = [c for c in bloom_cols if c in live_phys]
    adds = _write_data_files(
        _to_physical(rewritten, _column_mapping(path, read_v)), path
    )
    stats = _collect_stats(path, adds, stat_cols or None)
    blooms = _collect_blooms(path, adds, bloom_cols or None)
    _try_commit(
        path, read_v + 1, adds, removes, stats, blooms, meta={"op": "reorg_purge"}
    )
    return read_v + 1


def convert_to_txlog(
    spark: SparkSession,
    path: str,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> int:
    """In-place IMPORT of an existing plain-parquet directory as a txlog
    table (the Delta ``CONVERT TO DELTA`` shape): ONE metadata-only
    commit references the files WHERE THEY ARE — zero rows rewritten at
    any size; cost is O(n_files) footer reads (row counts, optional
    stats/blooms). After conversion the directory is a full citizen:
    appends, CoW/DV mutations, merge, CDC, time travel (version 1 = the
    imported snapshot), OPTIMIZE — everything — because the commit log
    only ever records file VISIBILITY, never layout.

    Refused up front:

    - a directory that already has a commit log (double-convert would
      fork history);
    - hive-partitioned layouts (``key=value`` path segments): this
      engine keeps every column INLINE in the data files, so a converted
      hive read would silently drop the partition columns — re-land
      through ``append(..., partition_by=...)`` instead, which stores
      them inline AND keeps the directory layout.

    The logged schema is the footers' ADDITIVE union (a column missing
    from some files reads NULL there — the merge-schema contract);
    conflicting types across footers refuse, same as any append would.
    """
    if _versions(path):
        raise ValueError(
            f"{path!r} already has a commit log (version "
            f"{current_version(path)}); convert_to_txlog imports plain "
            f"directories only"
        )
    rels = []
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                rels.append(os.path.relpath(os.path.join(root, f), path))
    if not rels:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    hive = sorted(r for r in rels if "=" in os.path.dirname(r))
    if hive:
        raise ValueError(
            f"hive-partitioned layout detected ({hive[0]!r}): partition "
            f"values live only in directory names there, and this engine "
            f"keeps columns inline — re-land via append(partition_by=...) "
            f"instead of converting in place"
        )
    rels = sorted(rels)
    # additive-union schema from the actual files (spark types, logged
    # exactly like an append's schema record); type conflicts fail here
    unified = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(path, r) for r in rels]
    )
    schema = dict(unified.dtypes)
    stats = _collect_stats(path, rels, stats_cols or None)
    blooms = _collect_blooms(path, rels, bloom_cols or None)
    _try_commit(
        path,
        1,
        rels,
        [],
        stats or None,
        blooms or None,
        meta={"op": "convert", "schema": schema},
    )
    return 1


_MANIFEST_DIR = "_symlink_format_manifest"


def generate_symlink_manifest(
    path: str, version: int | None = None, allow_row_ids: bool = False
) -> str:
    """External-reader handoff (the Delta ``GENERATE
    symlink_format_manifest`` surface): write
    ``_symlink_format_manifest/manifest`` — one absolute data-file URI
    per line for the snapshot — so engines with no txlog connector
    (Trino/Presto/Athena/Hive external tables) read EXACTLY the
    snapshot's live files, never uncommitted or superseded ones.
    Metadata-only, O(n_files); re-run after commits to refresh (the
    manifest is a static export, not a live view — same contract as
    Delta's). Torn-write-safe through the LogStore seam.

    Refuses a snapshot with live deletion vectors: an external reader
    has no DV semantics, so the manifest would resurrect every DV-dead
    row — run :func:`reorg_purge` (rewrites exactly the DV-carrying
    files) first, then export.

    Likewise refuses (by default) a row-tracking snapshot whose visible
    files materialize the internal ``__row_id`` column: a plain
    ``spark.read.parquet`` through the manifest would surface an
    undocumented extra column. Pass ``allow_row_ids=True`` to export
    anyway — the manifest is then documented to carry ``__row_id`` and
    external readers must project it away themselves."""
    v = current_version(path) if version is None else version
    _check_reader(path, v)
    dvs = visible_dvs(path, v)
    if any(dvs.values()):
        raise ValueError(
            f"snapshot v{v} carries live deletion vectors on "
            f"{sum(1 for x in dvs.values() if x)} file(s); an external "
            f"reader would resurrect the DV-dead rows — run "
            f"reorg_purge() first, then re-export"
        )
    files = visible_files(path, v)
    if not allow_row_ids and row_tracking_enabled(path, v):
        import pyarrow.parquet as pq

        carriers = [
            f
            for f in files
            if _ROWID in pq.ParquetFile(f).schema_arrow.names
        ]
        if carriers:
            raise ValueError(
                f"snapshot v{v} materializes the internal '{_ROWID}' "
                f"column in {len(carriers)} file(s); a plain parquet "
                f"reader through the manifest would see an undocumented "
                f"extra column — pass allow_row_ids=True to export "
                f"anyway (readers must project it away)"
            )
    if not files:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    manifest = os.path.join(path, _MANIFEST_DIR, "manifest")
    logstore.for_path(path).put_atomic(
        manifest,
        "\n".join(f"file://{os.path.abspath(f)}" for f in files) + "\n",
    )
    return manifest


# ---------------------------------------------------------------------------
# Row tracking (the Delta row-ID feature): a stable 64-bit identity per row,
# assigned at write and PRESERVED across every file-scoped rewrite.
# ---------------------------------------------------------------------------

#: the reserved PHYSICAL column materialized row ids live in once a rewrite
#: touches a file; never part of any logical schema, so plain reads drop it
_ROWID = "__row_id"


def row_tracking_enabled(path: str, version: int | None = None) -> bool:
    return bool(latest_meta(path, "row_tracking", version))


def _row_id_watermark(path: str) -> int:
    return int(latest_meta(path, "row_id_watermark") or 0)


def _alloc_row_bases(path: str, rels: list[str], wm: int | None = None):
    """Allocate contiguous fresh-id ranges for new file groups: each file's
    base is the running watermark, advanced by its exact footer row count.
    Returns ``(row_bases, new_watermark)``. Callers racing for a version
    re-invoke per commit attempt — only the commit WINNER's allocation
    lands, so id ranges are serialized by commit order and never overlap."""
    if wm is None:
        wm = _row_id_watermark(path)
    bases: dict[str, int] = {}
    for rel in sorted(rels):
        bases[rel] = wm
        wm += _file_rows(os.path.join(path, rel))
    return bases, wm


def _row_base_registry(path: str, up_to: int | None = None) -> dict[str, int]:
    """EVERY base row id the log ever assigned (rel → base), visible or
    not: a file's base is immutable once assigned (its append commit, the
    enable backfill, or a restore re-record — always the same value), so
    the union over commits is well-defined regardless of order. The
    resolution for change feeds and streams, where the file may already
    be REMOVED at the resolution version even though its rows' ids are
    the real, attributable identities."""
    out: dict[str, int] = {}
    for v in _versions(path):
        if up_to is not None and v > up_to:
            break
        out.update(_load_commit(path, v).get("row_bases", {}))
    return out


def visible_row_bases(path: str, version: int | None = None) -> dict[str, int]:
    """rel path → base row id for every live file that carries one (files
    whose ids are MATERIALIZED in a ``__row_id`` column carry none)."""
    return {
        rel: e["base"]
        for rel, e in _replay(path, version).items()
        if e.get("base") is not None
    }


def enable_row_tracking(path: str) -> int:
    """Turn on row tracking for an existing table in ONE metadata-only
    commit (the Delta ``delta.enableRowTracking`` shape): every visible
    file gets a ``base_row_id`` backfilled from its exact footer row
    count, and every later write either allocates fresh ranges from the
    logged watermark (appends, merge, overwrite, replaceWhere inserts) or
    MATERIALIZES the ids it read into the files it rewrites (CoW
    DELETE/UPDATE, DV UPDATE's rewritten rows, OPTIMIZE/Z-order/REORG) —
    so a row's id survives any sequence of file-scoped rewrites.
    Read ids back with :func:`read_with_row_ids`.

    Semantics (documented contract): ids identify LOGICAL rows — stable
    across UPDATE (both CoW and DV forms), across MERGE for every
    matched and pass-through row (the clause-based merge rewrites only
    matched files through _read_files_with_dvs, so lineage survives;
    only its not-matched INSERTS allocate fresh ranges), and across
    every maintenance rewrite. The snapshot-RESTRUCTURING writes
    (overwrite, replaceWhere's replacement rows) assign fresh ids to the
    rows they produce — a full replacement has no per-row lineage to
    preserve. RESTORE brings the target snapshot's ids back with it;
    CLONE carries ids into the clone.

    Requires a logged schema (the enabling commit must know the table's
    columns so the reserved ``__row_id`` physical name can never
    collide) and refuses a table that already has a column of that name.
    Writers predating the feature do not allocate — their appends make
    :func:`read_with_row_ids` fail fast on the uncovered file (never a
    silent wrong id)."""
    v = current_version(path)
    if v == 0:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    if row_tracking_enabled(path):
        raise ValueError(f"row tracking already enabled on {path!r}")
    schema = latest_meta(path, "schema")
    if schema is None:
        raise ValueError(
            "row tracking needs a logged schema; write once with a "
            "schema-recording commit (any append/overwrite) first"
        )
    if _ROWID in schema or _ROWID in _physical_reserved(path):
        raise ValueError(
            f"table has a column or reserved physical name {_ROWID!r}"
        )
    rels = [os.path.relpath(p, path) for p in visible_files(path, v)]
    bases, wm = _alloc_row_bases(path, rels, wm=0)
    _try_commit(
        path,
        v + 1,
        [],
        [],
        meta={
            "op": "enable_row_tracking",
            "row_tracking": True,
            "row_id_watermark": wm,
            "physical_reserved": sorted(_physical_reserved(path) | {_ROWID}),
        },
        row_bases=bases,
    )
    return v + 1


def _rid_frame(spark: SparkSession, path: str, version, files, passthrough=()):
    """Internal: logical view of ``files`` with a ``__rid`` column — each
    row's stable id, resolved per file as COALESCE(materialized
    ``__row_id`` column, base_row_id + ``_metadata.row_index``). The base
    map is metadata-sized (n_files) and broadcast, mirroring the DV
    anti-join shape. Rows with NEITHER source fail loudly (a file written
    by a pre-feature writer), never return a wrong id. Tags ``__fn``/
    ``__ri`` are kept for the caller's DV handling."""
    raw = _read_data(spark, path, files, merge_schema=True, version=version)
    mat = F.col(_ROWID) if _ROWID in raw.columns else F.lit(None).cast("long")
    tagged = raw.select(
        "*",
        _file_name_col().alias("__fn"),
        F.col("_metadata.row_index").alias("__ri"),
    )
    bases = visible_row_bases(path, version)
    base_df = spark.createDataFrame(
        [(os.path.basename(r), b) for r, b in bases.items()],
        "__fn string, __base long",
    )
    tagged = tagged.join(F.broadcast(base_df), "__fn", "left")
    rid = F.coalesce(mat, F.col("__base") + F.col("__ri"))
    rid = F.when(
        rid.isNull(),
        F.raise_error(
            F.lit(
                "row tracking: a visible file carries neither a base row "
                "id nor materialized ids (written by a pre-feature "
                "writer?); re-run enable_row_tracking after an OPTIMIZE "
                "of the uncovered files"
            )
        ).cast("long"),
    ).otherwise(rid)
    out = tagged.withColumn("__rid", rid).drop("__base")
    return _logical_view(
        out, path, version, passthrough=("__fn", "__ri", "__rid", *passthrough)
    )


def read_with_row_ids(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read with the stable ``row_id`` column (merge-on-read:
    deletion vectors applied, like :func:`read_mor`). The id is unique
    across the table's whole history — deleted rows' ids are never
    recycled (the watermark only grows) — which is what makes it usable
    as a join key for external enrichment, incremental ML feature
    stores, and audit lineage across rewrites."""
    if not row_tracking_enabled(path, version):
        raise ValueError(
            f"row tracking is not enabled on {path!r} (enable_row_tracking)"
        )
    _check_reader(path, version)
    files = visible_files(path, version)
    if not files:
        raise FileNotFoundError(f"no table at {path!r} (empty log)")
    df = _rid_frame(spark, path, version, files)
    dvs = visible_dvs(path, version)
    dv_paths = sorted({p for ps in dvs.values() for p in ps})
    if dv_paths:
        dv = spark.read.parquet(*dv_paths).select(
            F.col("file_name").alias("__fn"), F.col("row_index").alias("__ri")
        )
        df = _anti_join_dvs(
            df, dv, _dv_rows_from_footers(dv_paths), DV_BROADCAST_MAX_ROWS
        )
    else:
        df = df.drop("__fn", "__ri")
    return df.withColumnRenamed("__rid", "row_id")
