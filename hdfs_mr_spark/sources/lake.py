"""Transactional lakehouse table format (SURVEY.md §2.14, r9).

VERDICT r8's "what's missing" item 2: the repo emulated lakehouse
commit DISCIPLINE (version pointers, two-phase sinks) piecemeal, but
had no actual transactional table. This module builds one from first
principles on plain parquet + a JSON commit log — the Delta/Iceberg
architecture with no package dependency:

- **Commit log**: `_log/v%010d.json` files, one per version, each a
  list of `add` / `remove` file actions. A reader's snapshot at
  version V is fold(adds) - fold(removes) over versions <= V.
- **Atomic put-if-absent commits**: a writer stages its JSON to a
  temp file and publishes via ``os.link`` to the version path — link
  fails with EEXIST when another writer took the version, which IS
  optimistic concurrency control (the local-FS analogue of an object
  store's if-none-match put, Delta's commit primitive). The loser
  re-reads the log and retries at the next version.
- **Snapshot isolation**: data files are immutable once added;
  updates are copy-on-write rewrites (new files added, old files
  tombstoned by `remove` actions) so a reader pinned to version V
  never observes a torn update.
- **Time travel**: any historical version remains readable until
  `vacuum` physically deletes tombstoned files (and vacuum never
  touches files live in the LATEST snapshot).
- **Checkpoints**: a parquet checkpoint of the accumulated file list
  at version V lets readers skip replaying the v0..vV JSON tail —
  Delta's `_last_checkpoint` discipline.

Every operator reads its own isolated store (built once per testdata
fingerprint, atomically published tmp-dir + rename) and hash-checks
against a DuckDB oracle that replays the SAME logical content from
the raw `orders` table — so a torn commit, a lost update, a stale
snapshot, or an over-eager vacuum all surface as value mismatches,
not just test-local assertions.

Scale stance: the log is O(versions) tiny JSON + bounded checkpoints;
data file actions are the unit of commit (not rows), matching object
stores; reads are ordinary parquet scans over the snapshot's file
list, so all of Catalyst's pushdown/pruning applies unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import functions as F

from hdfs_mr_spark.io import table
from hdfs_mr_spark.registry import query
from hdfs_mr_spark.sources.scans import _fixture_dir

_FAM = "2.14 lakehouse txn"

# integer-cents rendering shared by every oracle below
_SQL_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


def _commit(log_dir: Path, version: int, actions: dict) -> bool:
    """Put-if-absent commit of ``version``: stage the full JSON to a
    temp file, publish via os.link (target appears atomically with
    complete content; EEXIST = another writer won the version).

    Filesystems without hard links (some overlay/network mounts) raise
    OSError from link(); we degrade to O_CREAT|O_EXCL + write + fsync —
    still put-if-absent, but the target becomes visible before its
    content is complete, so readers must tolerate a torn tail (they do:
    json.loads raises and the snapshot fold retries). ADVICE r9."""
    log_dir.mkdir(parents=True, exist_ok=True)
    payload = json.dumps(actions, sort_keys=True)
    target = log_dir / f"v{version:010d}.json"
    tmp = log_dir / f".tmp_{uuid.uuid4().hex}"
    tmp.write_text(payload)
    try:
        os.link(tmp, target)
        return True
    except FileExistsError:
        return False
    except OSError:
        # no-hard-link fallback: O_CREAT|O_EXCL is the atomic claim
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        return True
    finally:
        tmp.unlink(missing_ok=True)


def _log_versions(root: Path) -> list[int]:
    return sorted(
        int(p.stem[1:]) for p in (root / "_log").glob("v*.json")
    )


def _add_path(entry) -> str:
    """An ``add`` action is a bare path (r9 format) or a dict carrying
    per-file column stats (r10, Delta's stats-in-add discipline):
    ``{"path": ..., "stats": {col: {"min": v, "max": v}}}``."""
    return entry["path"] if isinstance(entry, dict) else entry


def _snapshot_files(root: Path, as_of: int | None = None) -> list[str]:
    """Fold the commit log into the live file set at version
    ``as_of`` (None = latest). Starts from the newest checkpoint at or
    below as_of when one exists (readers never replay the full tail)."""
    import pyarrow.parquet as pq

    versions = [v for v in _log_versions(root)
                if as_of is None or v <= as_of]
    live: set[str] = set()
    start = 0
    ckpts = sorted(
        int(p.stem.split("_")[1])
        for p in (root / "_log").glob("ckpt_*.parquet")
        if as_of is None or int(p.stem.split("_")[1]) <= as_of
    )
    if ckpts:
        cv = ckpts[-1]
        t = pq.read_table(root / "_log" / f"ckpt_{cv:010d}.parquet")
        live = set(t.column("path").to_pylist())
        start = cv + 1
    for v in versions:
        if v < start:
            continue
        acts = json.loads((root / "_log" / f"v{v:010d}.json").read_text())
        live.difference_update(acts.get("remove", []))
        live.update(_add_path(e) for e in acts.get("add", []))
    return sorted(live)


def _snapshot_adds(root: Path, as_of: int | None = None) -> dict:
    """Live file -> stats dict ({} when the add carried none) at
    version ``as_of`` — the metadata a data-skipping reader folds.
    Pure log replay (no checkpoint fast path here: a production
    checkpoint would carry the stats columns too)."""
    out: dict[str, dict] = {}
    for v in _log_versions(root):
        if as_of is not None and v > as_of:
            break
        acts = json.loads((root / "_log" / f"v{v:010d}.json").read_text())
        for r in acts.get("remove", []):
            out.pop(r, None)
        for e in acts.get("add", []):
            if isinstance(e, dict):
                out[e["path"]] = e.get("stats", {})
            else:
                out[e] = {}
    return out


def _file_stats(root: Path, rel_path: str, cols: list[str]) -> dict:
    """TRUE file-level min/max for ``cols``, read from the parquet
    footer (row-group statistics folded across groups) — the values a
    writer records into the commit-log add action. Timestamps/dates
    serialize as ISO strings (lexicographic == chronological)."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(root / rel_path)
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    out: dict[str, dict] = {}
    for c in cols:
        i = names.index(c)
        lo = hi = None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(i).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is None:
            continue  # no stats -> reader must scan the file
        enc = (lambda x: x.isoformat(sep=" ")
               if hasattr(x, "isoformat") else x)
        out[c] = {"min": enc(lo), "max": enc(hi)}
    return out


def _pruned_files(root: Path, col: str, lo, hi,
                  as_of: int | None = None) -> tuple[list[str], int]:
    """Data skipping: (files whose [min,max] intersects [lo, hi],
    live-file count). A file with no recorded stats for ``col`` is
    conservatively kept — skipping is an optimization, never a filter."""
    enc = lo.isoformat(sep=" ") if hasattr(lo, "isoformat") else lo
    enc_hi = hi.isoformat(sep=" ") if hasattr(hi, "isoformat") else hi
    adds = _snapshot_adds(root, as_of)
    keep = [
        f for f, st in sorted(adds.items())
        if col not in st
        or (st[col]["max"] >= enc and st[col]["min"] <= enc_hi)
    ]
    return keep, len(adds)


def _rel_file_path(root: Path):
    """``_metadata.file_path`` relativized against the store root,
    robust to the URI scheme rendering (``file:/abs`` vs ``file:///abs``
    — ADVICE r10): normalize ``scheme:/+`` to a single ``/`` with a
    regex, then drop the absolute root prefix. Callers that persist
    these paths assert at build time that they resolve on disk."""
    prefix = str(root).rstrip("/") + "/"
    norm = F.regexp_replace(
        F.col("_metadata.file_path"), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/"
    )
    return F.substring(norm, len(prefix) + 1, 1 << 30)


def _write_files(df, data_dir: Path, n_files: int = 2) -> list[str]:
    """Write ``df`` as exactly n_files immutable parquet files into a
    fresh subdir; return their store-relative paths."""
    sub = data_dir / uuid.uuid4().hex
    df.repartition(n_files).write.mode("overwrite").parquet(str(sub))
    return sorted(
        str(p.relative_to(data_dir.parent))
        for p in sub.glob("*.parquet")
    )


def _read_snapshot(spark, root: Path, as_of: int | None = None):
    files = _snapshot_files(root, as_of)
    return spark.read.parquet(*[str(root / f) for f in files])


def _publish_store(build_fn, store: Path) -> Path:
    """Idempotent atomic store build: construct in a tmp sibling, then
    one os.rename (the PQ-store discipline)."""
    if (store / "_built").exists():
        return store
    tmp = store.parent / f"{store.name}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    build_fn(tmp)
    (tmp / "_built").touch()
    try:
        os.rename(tmp, store)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not (store / "_built").exists():
            raise
    return store


def _base_commits(spark, sf_dir, root: Path) -> None:
    """v0..v2: three append commits, one per o_orderkey%3 batch."""
    o = table(spark, sf_dir, "orders")
    for k in range(3):
        files = _write_files(
            o.filter(F.col("o_orderkey") % 3 == k), root / "data"
        )
        assert _commit(root / "_log", k, {"add": files, "remove": []})


def _store(spark, sf_dir, name: str, extra=None) -> Path:
    def build(tmp: Path):
        _base_commits(spark, sf_dir, tmp)
        if extra is not None:
            extra(tmp)

    return _publish_store(
        build, _fixture_dir(sf_dir) / f"lake_{name}"
    )


def _write_cdc(df, root: Path) -> list[str]:
    """Write one change-data sidecar file (full row + ``_change_type``)
    under ``_change_data/``; return store-relative paths."""
    sub = root / "_change_data" / uuid.uuid4().hex
    df.coalesce(1).write.mode("overwrite").parquet(str(sub))
    return sorted(
        str(p.relative_to(root)) for p in sub.glob("*.parquet")
    )


def _merge_commit(spark, root: Path) -> None:
    """v3: copy-on-write MERGE — every 7th order's priority re-stated
    to 1-URGENT. Each live file containing a match is rewritten in
    full (matched rows updated, others carried), the new files are
    added and EVERY rewritten file is tombstoned in the same commit —
    one atomic version, so a concurrent reader sees all-old or
    all-new, never a mix.

    The commit also records CHANGE-DATA sidecars (Delta's
    ``_change_data/`` discipline, one per rewritten file, ``cdc``
    action in the log): the rows the merge actually changed, as
    update_preimage/update_postimage pairs with the full row carried.
    A CDF consumer then reads O(changed rows) per file IN PARALLEL —
    per-file sidecars are the partition unit of the streaming change
    feed — instead of diffing the rewrite, and commits whose writers
    did not record sidecars still fall back to the pyarrow file diff
    (``version_changes(use_cdc=False)``)."""
    live = _snapshot_files(root)
    adds, removes, cdc = [], [], []
    for f in live:
        df = spark.read.parquet(str(root / f))
        if df.filter(F.col("o_orderkey") % 7 == 0).isEmpty():
            continue
        updated = df.withColumn(
            "o_orderpriority",
            F.when(F.col("o_orderkey") % 7 == 0, F.lit("1-URGENT"))
            .otherwise(F.col("o_orderpriority")),
        )
        adds += _write_files(updated, root / "data", n_files=1)
        removes.append(f)
        # changed = matched AND actually different post-merge (a row
        # already 1-URGENT is carried, not changed — the file diff
        # drops it, so the sidecar must too)
        changed = df.filter(
            (F.col("o_orderkey") % 7 == 0)
            & (F.col("o_orderpriority") != "1-URGENT")
        )
        pre = changed.withColumn("_change_type", F.lit("update_preimage"))
        post = (
            changed.withColumn("o_orderpriority", F.lit("1-URGENT"))
            .withColumn("_change_type", F.lit("update_postimage"))
        )
        pair = pre.unionByName(post)
        if not pair.isEmpty():
            cdc += _write_cdc(pair, root)
    assert _commit(root / "_log", 3,
                   {"add": adds, "remove": removes, "cdc": cdc})


@query(
    "lake_txn_append",
    oracle=f"""
SELECT o_orderstatus,
       CAST(2 AS BIGINT) AS version,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM({_SQL_CENTS}) AS BIGINT) AS cents,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    family=_FAM,
)
def lake_txn_append(spark, sf_dir):
    """Append-only transactional table: three put-if-absent commits
    (module docstring has the log/commit design), then a LATEST-
    snapshot read aggregated per status. The oracle replays the same
    content from the raw table, so a lost or duplicated commit
    hash-mismatches; the emitted version pins the log length."""
    root = _store(spark, sf_dir, "append")
    ver = _log_versions(root)[-1]
    return (
        _read_snapshot(spark, root)
        .groupBy("o_orderstatus")
        .agg(
            F.lit(ver).cast("bigint").alias("version"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.max("o_orderkey").cast("bigint").alias("max_key"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "lake_time_travel",
    oracle=f"""
SELECT o_orderstatus,
       CAST(1 AS BIGINT) AS version,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM({_SQL_CENTS}) AS BIGINT) AS cents
FROM orders WHERE o_orderkey % 3 IN (0, 1)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    family=_FAM,
)
def lake_time_travel(spark, sf_dir):
    """Time travel: the same store read AS OF version 1 — only the
    first two append batches exist in that snapshot, which the oracle
    states as the o_orderkey%3 predicate. Immutable data files +
    log-fold snapshots make every historical version a first-class
    read (until vacuum)."""
    root = _store(spark, sf_dir, "append")
    return (
        _read_snapshot(spark, root, as_of=1)
        .groupBy("o_orderstatus")
        .agg(
            F.lit(1).cast("bigint").alias("version"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "lake_merge_txn",
    oracle=f"""
WITH merged AS (
  SELECT CASE WHEN o_orderkey % 7 = 0 THEN '1-URGENT'
              ELSE o_orderpriority END AS prio,
         {_SQL_CENTS} AS cents
  FROM orders
)
SELECT prio AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM merged
GROUP BY prio
ORDER BY prio
""",
    family=_FAM,
)
def lake_merge_txn(spark, sf_dir):
    """Copy-on-write MERGE in one atomic commit: every live file with
    a matching row (o_orderkey%7==0 -> priority 1-URGENT) is rewritten
    and tombstoned in the SAME version, so readers see all-old or
    all-new. The post-merge snapshot aggregates by priority against
    the oracle's CASE replay — a file updated but not tombstoned
    (double rows) or tombstoned but not rewritten (lost rows) both
    hash-mismatch."""
    root = _store(
        spark, sf_dir, "merge2", extra=lambda tmp: _merge_commit(spark, tmp)
    )
    return (
        _read_snapshot(spark, root)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "lake_txn_conflict",
    oracle=f"""
WITH base AS (
  SELECT o_orderstatus, {_SQL_CENTS} AS cents FROM orders
),
wa AS (
  SELECT 'WA' AS o_orderstatus, {_SQL_CENTS} AS cents
  FROM orders WHERE o_orderkey % 13 = 0
),
wb AS (
  SELECT 'WB' AS o_orderstatus, {_SQL_CENTS} AS cents
  FROM orders WHERE o_orderkey % 17 = 0
),
un AS (SELECT * FROM base UNION ALL SELECT * FROM wa
       UNION ALL SELECT * FROM wb)
SELECT o_orderstatus,
       CAST(4 AS BIGINT) AS version,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM un
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    family=_FAM,
)
def lake_txn_conflict(spark, sf_dir):
    """Optimistic concurrency: two writers prepare version 3
    concurrently (both read the log at v2, both stage their files);
    writer A's put-if-absent link lands v3, writer B's raises EEXIST —
    the LOST UPDATE detected, not silently overwritten — so B re-reads
    the log and retries at v4. Both appends survive (A tags status WA,
    B tags WB), the final version is 4, and the oracle replays the
    serial outcome — a clobbered commit would drop one writer's rows
    and hash-mismatch."""

    def race(tmp: Path):
        o = table(spark, sf_dir, "orders")
        wa = o.filter(F.col("o_orderkey") % 13 == 0).withColumn(
            "o_orderstatus", F.lit("WA")
        )
        wb = o.filter(F.col("o_orderkey") % 17 == 0).withColumn(
            "o_orderstatus", F.lit("WB")
        )
        # both writers stage against the SAME read version (v2)
        files_a = _write_files(wa, tmp / "data", n_files=1)
        files_b = _write_files(wb, tmp / "data", n_files=1)
        target = _log_versions(tmp)[-1] + 1  # both computed 3
        assert _commit(tmp / "_log", target, {"add": files_a, "remove": []})
        ok_b = _commit(tmp / "_log", target, {"add": files_b, "remove": []})
        assert not ok_b, "conflict went undetected — lost update"
        retry = _log_versions(tmp)[-1] + 1
        assert _commit(tmp / "_log", retry, {"add": files_b, "remove": []})

    root = _store(spark, sf_dir, "conflict", extra=race)
    ver = _log_versions(root)[-1]
    return (
        _read_snapshot(spark, root)
        .groupBy("o_orderstatus")
        .agg(
            F.lit(ver).cast("bigint").alias("version"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "lake_vacuum",
    oracle=f"""
WITH merged AS (
  SELECT CASE WHEN o_orderkey % 7 = 0 THEN '1-URGENT'
              ELSE o_orderpriority END AS prio,
         {_SQL_CENTS} AS cents
  FROM orders
)
SELECT prio AS o_orderpriority,
       CAST(12 AS BIGINT) AS files_before,
       CAST(6 AS BIGINT) AS files_removed,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM merged
GROUP BY prio
ORDER BY prio
""",
    family=_FAM,
)
def lake_vacuum(spark, sf_dir):
    """VACUUM: physically delete files tombstoned by the merge's
    remove-actions — and ONLY those (never a file live in the latest
    snapshot). The emitted counts pin the physical layout (3 batches x
    2 files plus 6 single-file COW rewrites = 12 ever-added; the 6
    originals are dead after the merge), and the post-vacuum snapshot still hash-matches the merged
    oracle — an over-eager vacuum that deleted a live file would fail
    the read; an under-eager one would leave dead bytes but keep
    hashes green, which the files_removed column catches."""

    def build(tmp: Path):
        _merge_commit(spark, tmp)
        live = set(_snapshot_files(tmp))
        all_added: set[str] = set()
        for v in _log_versions(tmp):
            acts = json.loads(
                (tmp / "_log" / f"v{v:010d}.json").read_text()
            )
            all_added.update(acts.get("add", []))
        dead = sorted(all_added - live)
        (tmp / "_vacuum_stats").write_text(json.dumps({
            "files_before": len(all_added),
            "files_removed": len(dead),
        }))
        for f in dead:
            (tmp / f).unlink()

    root = _store(spark, sf_dir, "vacuum", extra=build)
    stats = json.loads((root / "_vacuum_stats").read_text())
    return (
        _read_snapshot(spark, root)
        .groupBy("o_orderpriority")
        .agg(
            F.lit(stats["files_before"]).cast("bigint").alias("files_before"),
            F.lit(stats["files_removed"]).cast("bigint").alias("files_removed"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .select(
            "o_orderpriority", "files_before", "files_removed",
            "n_orders", "cents",
        )
        .orderBy("o_orderpriority")
    )


@query(
    "lake_checkpoint",
    oracle=f"""
WITH merged AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN '1-URGENT'
              ELSE o_orderpriority END AS prio,
         {_SQL_CENTS} AS cents
  FROM orders
),
extra AS (
  SELECT o_orderkey, '5-APPENDED' AS prio, {_SQL_CENTS} AS cents
  FROM orders WHERE o_orderkey % 19 = 0
),
un AS (SELECT * FROM merged UNION ALL SELECT * FROM extra)
SELECT prio AS o_orderpriority,
       CAST(1 AS BIGINT) AS log_files_replayed,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM un
GROUP BY prio
ORDER BY prio
""",
    family=_FAM,
)
def lake_checkpoint(spark, sf_dir):
    """Log CHECKPOINT: after the merge (v3) the accumulated live file
    list is written as a parquet checkpoint, so a reader folds ONLY
    the post-checkpoint JSON tail (here: the single v4 append) instead
    of replaying v0..v3 — Delta's _last_checkpoint discipline, the
    thing that keeps log replay O(delta) instead of O(history) at a
    million commits. log_files_replayed pins that the reader really
    took the checkpoint path; content hash-checks against the
    merge+append replay."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def build(tmp: Path):
        _merge_commit(spark, tmp)
        live = _snapshot_files(tmp)
        pq.write_table(
            pa.table({"path": pa.array(live, pa.string())}),
            tmp / "_log" / f"ckpt_{3:010d}.parquet",
        )
        extra = table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 19 == 0
        ).withColumn("o_orderpriority", F.lit("5-APPENDED"))
        files = _write_files(extra, tmp / "data", n_files=1)
        assert _commit(tmp / "_log", 4, {"add": files, "remove": []})

    root = _store(spark, sf_dir, "ckpt", extra=build)
    # count the JSON versions a checkpoint-aware reader must replay
    ckpt_v = 3
    replayed = len([v for v in _log_versions(root) if v > ckpt_v])
    return (
        _read_snapshot(spark, root)
        .groupBy("o_orderpriority")
        .agg(
            F.lit(replayed).cast("bigint").alias("log_files_replayed"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "lake_stats_skipping",
    oracle=f"""
SELECT o_orderstatus,
       CAST(7 AS BIGINT) AS files_live,
       CAST(1 AS BIGINT) AS files_scanned,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM({_SQL_CENTS}) AS BIGINT) AS cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    family=_FAM,
)
def lake_stats_skipping(spark, sf_dir):
    """File-level DATA SKIPPING (VERDICT r9 next-round item 1 — the
    biggest lakehouse read lever after partition pruning): each commit's
    add action records the file's TRUE parquet-footer min/max for the
    clustering columns, and a predicate read folds the log's stats to
    drop files whose [min,max] cannot intersect the predicate BEFORE the
    parquet scan is planned. The store appends one commit per order
    year (1995..2001, natural arrival clustering — the table is
    UNPARTITIONED, no directory scheme); the 1997 predicate read then
    scans exactly 1 of 7 live files. files_live/files_scanned pin that
    the pruning really fired (7 -> 1); content hash-checks against the
    raw replay, so an over-eager prune (dropped live rows) or stats
    drift (file rewritten without re-stating) mismatches.

    Scale: the fold is O(live files) driver-side metadata — the same
    work Delta/Iceberg do with add-action stats / manifest ranges — and
    at 100 TB it is the difference between scanning ~14% and 100% of an
    unpartitioned table for a time-ranged query. Catalyst's row-group
    pushdown still applies INSIDE the surviving files (the predicate is
    also applied to the pruned frame)."""
    from datetime import datetime

    def build(tmp: Path):
        o = table(spark, sf_dir, "orders")
        for k, yr in enumerate(range(1995, 2002)):
            files = _write_files(
                o.filter(F.year("o_orderdate") == yr),
                tmp / "data", n_files=1,
            )
            adds = [
                {"path": f,
                 "stats": _file_stats(tmp, f, ["o_orderdate", "o_orderkey"])}
                for f in files
            ]
            assert _commit(tmp / "_log", k, {"add": adds, "remove": []})

    root = _publish_store(build, _fixture_dir(sf_dir) / "lake_stats")
    lo = datetime(1997, 1, 1)
    hi = datetime(1997, 12, 31, 23, 59, 59, 999999)
    files, n_live = _pruned_files(root, "o_orderdate", lo, hi)
    pred = (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    return (
        spark.read.parquet(*[str(root / f) for f in files])
        .filter(pred)
        .groupBy("o_orderstatus")
        .agg(
            F.lit(n_live).cast("bigint").alias("files_live"),
            F.lit(len(files)).cast("bigint").alias("files_scanned"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .select("o_orderstatus", "files_live", "files_scanned",
                "n_orders", "cents")
        .orderBy("o_orderstatus")
    )


@query(
    "lake_schema_evolution",
    oracle=f"""
WITH base AS (
  SELECT CAST(NULL AS VARCHAR) AS ch, {_SQL_CENTS} AS cents FROM orders
),
ev AS (
  SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'WEB' ELSE 'STORE' END AS ch,
         {_SQL_CENTS} AS cents
  FROM orders WHERE o_orderkey % 19 = 0
),
un AS (SELECT * FROM base UNION ALL SELECT * FROM ev)
SELECT coalesce(ch, 'PRE_EVOLUTION') AS o_channel,
       CAST(6 AS BIGINT) AS v2_ncols,
       CAST(7 AS BIGINT) AS latest_ncols,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM un
GROUP BY coalesce(ch, 'PRE_EVOLUTION')
ORDER BY o_channel
""",
    family=_FAM,
)
def lake_schema_evolution(spark, sf_dir):
    """SCHEMA EVOLUTION in the commit log (VERDICT r9 item 3): v3 is an
    add-column commit — its files carry a new ``o_channel`` column and
    the commit records a ``metaData`` action re-stating the table
    schema (Delta's discipline: schema changes are log events, data
    files are never rewritten). The LATEST snapshot read reconciles
    v0..v2 six-column files with v3 seven-column files via mergeSchema
    (NULL backfill for pre-evolution rows), while TIME TRAVEL to v2
    still returns the original six-column schema — both widths pinned
    as literals (6/7), content hash-checked against the UNION replay.

    Scale: evolution costs one log entry; readers pay only the footer
    merge of the schemas actually present in their snapshot — no table
    rewrite, the property that makes wide-table evolution viable at
    100 TB."""

    def build(tmp: Path):
        _base_commits(spark, sf_dir, tmp)
        ev = (
            table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 19 == 0)
            .withColumn(
                "o_channel",
                F.when(F.col("o_orderkey") % 2 == 0, F.lit("WEB"))
                .otherwise(F.lit("STORE")),
            )
        )
        files = _write_files(ev, tmp / "data", n_files=1)
        assert _commit(tmp / "_log", 3, {
            "add": files, "remove": [],
            "metaData": {"schemaChange": "add column o_channel string"},
        })

    root = _publish_store(build, _fixture_dir(sf_dir) / "lake_evolve")
    old = _read_snapshot(spark, root, as_of=2)
    v2_ncols = len(old.columns)
    latest_files = _snapshot_files(root)
    latest = spark.read.option("mergeSchema", "true").parquet(
        *[str(root / f) for f in latest_files]
    )
    latest_ncols = len(latest.columns)
    assert "o_channel" not in old.columns and "o_channel" in latest.columns
    return (
        latest
        .groupBy(
            F.coalesce(F.col("o_channel"), F.lit("PRE_EVOLUTION"))
            .alias("o_channel")
        )
        .agg(
            F.lit(v2_ncols).cast("bigint").alias("v2_ncols"),
            F.lit(latest_ncols).cast("bigint").alias("latest_ncols"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .select("o_channel", "v2_ncols", "latest_ncols", "n_orders", "cents")
        .orderBy("o_channel")
    )


def version_adds(root: Path, version: int) -> list[str]:
    """Files ADDED by commit ``version`` — the unit of an incremental
    (streaming) read. REFUSES versions carrying remove-actions: a COW
    merge/delete changes already-delivered rows, which an append-tail
    consumer cannot represent (Delta's streaming source fails the same
    way unless ignoreChanges is set); the caller must re-seed from a
    full snapshot instead."""
    acts = json.loads((root / "_log" / f"v{version:010d}.json").read_text())
    if acts.get("remove"):
        raise ValueError(
            f"version {version} contains remove-actions; "
            "an append-only tail cannot represent data changes"
        )
    return [_add_path(e) for e in acts.get("add", [])]


@query(
    "lake_compact_optimize",
    oracle=f"""
WITH base AS (
  SELECT o_orderstatus, {_SQL_CENTS} AS cents FROM orders
),
late AS (
  SELECT 'LATE' AS o_orderstatus, {_SQL_CENTS} AS cents
  FROM orders WHERE o_orderkey % 19 = 0
),
un AS (SELECT * FROM base UNION ALL SELECT * FROM late)
SELECT o_orderstatus,
       CAST(9 AS BIGINT) AS version,
       CAST(16 AS BIGINT) AS files_compacted,
       CAST(3 AS BIGINT) AS files_live,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM un
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    family=_FAM,
)
def lake_compact_optimize(spark, sf_dir):
    """OPTIMIZE (small-file compaction) as one transactional commit,
    racing a concurrent append — the lifecycle op an append-heavy lake
    table lives or dies by: 8 streaming-shaped appends leave 16 small
    files; the compactor reads that snapshot, bin-packs the 16 files
    into 2 (stats-carrying adds, so data skipping survives
    compaction), and commits remove(16)+add(2) as ONE version. A
    concurrent append steals the compactor's target version first
    (put-if-absent loses), so the compactor RE-READS the log and
    REVALIDATES before retrying: every file it is tombstoning must
    still be live — the append touched disjoint files, so the retry
    commits cleanly at the next version (Delta's disjoint-file
    conflict resolution; had the race been a COW merge over the same
    files, the revalidation would force a fresh compaction instead of
    silently resurrecting replaced data). Content is invariant by
    construction — the oracle replays orders + the late slice — and
    the pinned version/file counts prove the race and the packing both
    happened: a compactor that clobbered the append, double-counted a
    compacted file, or lost one would hash-mismatch.

    At 100 TB this is the table-maintenance path that keeps scan task
    counts bounded as micro-batch appends accumulate; rewrites are
    content-neutral so readers pinned to older versions stay correct
    until vacuum."""

    def build(tmp: Path):
        o = table(spark, sf_dir, "orders")
        for k in range(8):
            files = _write_files(
                o.filter(F.col("o_orderkey") % 8 == k), tmp / "data",
                n_files=2,
            )
            assert _commit(tmp / "_log", k, {"add": files, "remove": []})
        # compactor: snapshot at v7 (16 small files), bin-pack to 2
        victims = _snapshot_files(tmp)
        assert len(victims) == 16
        packed = spark.read.parquet(*[str(tmp / f) for f in victims])
        new_files = _write_files(packed, tmp / "data", n_files=2)
        adds = [
            {"path": f, "stats": _file_stats(tmp, f, ["o_orderkey"])}
            for f in new_files
        ]
        # concurrent append wins version 8 first
        late = o.filter(F.col("o_orderkey") % 19 == 0).withColumn(
            "o_orderstatus", F.lit("LATE")
        )
        late_files = _write_files(late, tmp / "data", n_files=1)
        assert _commit(tmp / "_log", 8, {"add": late_files, "remove": []})
        # compactor's first attempt targets the version it computed
        # BEFORE the append landed -> put-if-absent refuses
        assert not _commit(tmp / "_log", 8,
                           {"add": adds, "remove": victims})
        # retry: re-read the log, REVALIDATE the tombstone set is
        # still live (disjoint-file rule), commit at the next version
        live_now = set(_snapshot_files(tmp))
        assert set(victims) <= live_now, "conflicting rewrite; recompact"
        assert _commit(tmp / "_log", 9, {"add": adds, "remove": victims})

    root = _publish_store(build, _fixture_dir(sf_dir) / "lake_compact")
    ver = _log_versions(root)[-1]
    files_live = len(_snapshot_files(root))
    acts = json.loads((root / "_log" / f"v{ver:010d}.json").read_text())
    return (
        _read_snapshot(spark, root)
        .groupBy("o_orderstatus")
        .agg(
            F.lit(ver).cast("bigint").alias("version"),
            F.lit(len(acts["remove"])).cast("bigint")
            .alias("files_compacted"),
            F.lit(files_live).cast("bigint").alias("files_live"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .select("o_orderstatus", "version", "files_compacted",
                "files_live", "n_orders", "cents")
        .orderBy("o_orderstatus")
    )


def _snapshot_delete_files(root: Path, as_of: int | None = None) -> list[str]:
    """Live position-delete sidecars at ``as_of`` — the merge-on-read
    fold. A ``deleteVectors`` action publishes Iceberg-style position
    delete files ({path, pos} rows; one sidecar may cover many data
    files). Entries pointing at since-removed data files are inert:
    the read-side anti-join matches on (path, pos), and a removed
    file's rows are no longer in the scan."""
    out: list[str] = []
    for v in _log_versions(root):
        if as_of is not None and v > as_of:
            break
        acts = json.loads((root / "_log" / f"v{v:010d}.json").read_text())
        out += [d["file"] for d in acts.get("deleteVectors", [])]
    return out


@query(
    "lake_delete_vectors",
    oracle=f"""
SELECT o_orderstatus,
       CAST(6 AS BIGINT) AS files_live,
       CAST(0 AS BIGINT) AS files_rewritten,
       CAST(1 AS BIGINT) AS dv_files,
       CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey % 11 = 0)
            AS BIGINT) AS rows_deleted,
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_pre_delete,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM({_SQL_CENTS}) AS BIGINT) AS cents
FROM orders WHERE o_orderkey % 11 <> 0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    family=_FAM,
)
def lake_delete_vectors(spark, sf_dir):
    """MERGE-ON-READ DELETE via position-delete sidecars (deletion
    vectors) — the third write strategy after append and COW: a sparse
    DELETE (o_orderkey%11==0, ~9% of rows spread across EVERY file)
    commits ONE tiny sidecar of (data-file path, row position) pairs
    instead of rewriting all six data files; the read path scans the
    unchanged files and drops deleted rows with a BROADCAST anti-join
    on Spark's native parquet ``_metadata.row_index`` / ``file_path``
    columns. The pinned columns prove the mechanism: files_rewritten=0
    and files_live=6 (the data layout is untouched — a COW delete here
    would rewrite 6/6 files for 9% of rows, the write-amplification
    DVs exist to avoid), dv_files=1, rows_deleted ties the sidecar's
    cardinality to the true predicate count, and n_pre_delete pins
    that TIME TRAVEL to the pre-delete version (the DV fold respects
    as_of) still sees every row. Content hash-checks the survivor set
    against the raw replay — a DV that dropped a wrong position or
    missed one mismatches.

    Scale: this is the Delta deletion-vector / Iceberg position-delete
    architecture — at 100 TB a GDPR-style sparse delete costs O(deleted
    rows) metadata + a broadcast-sized sidecar at read, not an O(table)
    rewrite; compaction (lake_compact_optimize) later materializes DVs
    away. The anti-join side is bounded by delete cardinality, so
    Catalyst broadcasts it and the scan stays one pass."""

    def build(tmp: Path):
        _base_commits(spark, sf_dir, tmp)
        import pyarrow.parquet as pq

        live = _snapshot_files(tmp)
        dels = (
            spark.read.parquet(*[str(tmp / f) for f in live])
            .filter(F.col("o_orderkey") % 11 == 0)
            .select(
                _rel_file_path(tmp).alias("path"),
                F.col("_metadata.row_index").alias("pos"),
            )
        )
        # build-time guard (ADVICE r10): the relativized paths must
        # name real files under the store root — a Hadoop URI-rendering
        # change would otherwise surface only as an oracle hash miss.
        rels = {r["path"] for r in dels.select("path").distinct().collect()}
        bad = [r for r in rels if not (tmp / r).exists()]
        assert not bad, f"DV paths do not resolve under store root: {bad}"
        (tmp / "dv").mkdir()
        sub = tmp / "dv" / uuid.uuid4().hex
        dels.coalesce(1).write.parquet(str(sub))
        dv_file = sorted(sub.glob("*.parquet"))[0]
        rel = str(dv_file.relative_to(tmp))
        card = pq.read_metadata(dv_file).num_rows
        assert _commit(tmp / "_log", 3, {
            "add": [], "remove": [],
            "deleteVectors": [{"file": rel, "cardinality": card}],
        })

    root = _publish_store(build, _fixture_dir(sf_dir) / "lake_dv")
    files = _snapshot_files(root)
    dv_files = _snapshot_delete_files(root)
    acts = json.loads((root / "_log" / f"v{3:010d}.json").read_text())
    deleted = sum(d["cardinality"] for d in acts["deleteVectors"])
    data = (
        spark.read.parquet(*[str(root / f) for f in files])
        .withColumn("_dv_path", _rel_file_path(root))
        .withColumn("_dv_pos", F.col("_metadata.row_index"))
    )
    dels = spark.read.parquet(*[str(root / f) for f in dv_files])
    alive = data.join(
        F.broadcast(dels),
        (data["_dv_path"] == dels["path"]) & (data["_dv_pos"] == dels["pos"]),
        "left_anti",
    )
    # time travel to v2: the DV fold is empty there -> every row visible
    assert _snapshot_delete_files(root, as_of=2) == []
    pre = (
        _read_snapshot(spark, root, as_of=2)
        .agg(F.count("*").cast("bigint").alias("n_pre_delete"))
    )
    return (
        alive.groupBy("o_orderstatus")
        .agg(
            F.lit(len(files)).cast("bigint").alias("files_live"),
            F.lit(len(acts["add"])).cast("bigint").alias("files_rewritten"),
            F.lit(len(dv_files)).cast("bigint").alias("dv_files"),
            F.lit(deleted).cast("bigint").alias("rows_deleted"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .join(F.broadcast(pre))
        .select("o_orderstatus", "files_live", "files_rewritten",
                "dv_files", "rows_deleted", "n_pre_delete",
                "n_orders", "cents")
        .orderBy("o_orderstatus")
    )


@query(
    "lake_change_feed",
    oracle=f"""
WITH ch AS (
  SELECT 'insert' AS ct, 1 AS v, o_orderpriority AS prio,
         {_SQL_CENTS} AS cents
  FROM orders WHERE o_orderkey % 3 = 1
  UNION ALL
  SELECT 'insert', 2, o_orderpriority, {_SQL_CENTS}
  FROM orders WHERE o_orderkey % 3 = 2
  UNION ALL
  SELECT 'update_preimage', 3, o_orderpriority, {_SQL_CENTS}
  FROM orders
  WHERE o_orderkey % 7 = 0 AND o_orderpriority <> '1-URGENT'
  UNION ALL
  SELECT 'update_postimage', 3, '1-URGENT', {_SQL_CENTS}
  FROM orders
  WHERE o_orderkey % 7 = 0 AND o_orderpriority <> '1-URGENT'
)
SELECT ct AS _change_type,
       CAST(v AS BIGINT) AS _commit_version,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE prio = '1-URGENT') AS BIGINT)
         AS n_urgent,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM ch
GROUP BY ct, v
ORDER BY ct, v
""",
    family=_FAM,
)
def lake_change_feed(spark, sf_dir):
    """CHANGE DATA FEED over a version range — row-level CDC
    reconstructed from the commit log's file diffs, with NO stored
    change files (Delta CDF semantics, Iceberg changelog-scan
    mechanics): versions 1..3 of the merge store are replayed; an
    append commit's added files are pure inserts; the COW merge commit
    is diffed by joining the rows of its REMOVED files (pre-images)
    against its ADDED files (post-images) on the table key — rows
    whose full-row struct is unchanged are carried rewrites, NOT
    changes, and are dropped; differing rows emit update_preimage +
    update_postimage pairs (keys on one side only would emit
    insert/delete). Note the oracle's ``<> '1-URGENT'`` clause: an
    order already urgent before the merge produces an identical
    rewritten row, so a faithful CDF must NOT report it — a diff that
    compared keys instead of row contents would.

    The n_urgent column pins image direction (pre-images keep the old
    priority, post-images are all urgent); counts and cents pin the
    row sets per (change_type, version).

    Scale: CDC cost is O(files touched by each commit), not O(table) —
    the diff join reads only the rewritten files, and each append
    streams straight through with no join at all. This is what lets a
    downstream incremental consumer follow a 100 TB table by reading
    deltas."""
    root = _store(
        spark, sf_dir, "merge2", extra=lambda tmp: _merge_commit(spark, tmp)
    )
    frames = []
    for v in _log_versions(root):
        if v < 1:
            continue
        acts = json.loads((root / "_log" / f"v{v:010d}.json").read_text())
        adds = [_add_path(e) for e in acts.get("add", [])]
        removes = acts.get("remove", [])
        if not removes:
            ins = spark.read.parquet(*[str(root / f) for f in adds])
            frames.append(ins.select(
                F.lit("insert").alias("_change_type"),
                F.lit(v).cast("bigint").alias("_commit_version"),
                F.struct(*ins.columns).alias("_row"),
            ))
            continue
        pre = spark.read.parquet(*[str(root / f) for f in removes])
        post = spark.read.parquet(*[str(root / f) for f in adds])
        cols = pre.columns
        p = pre.select(
            "o_orderkey", F.struct(*cols).alias("_prow")
        ).alias("p")
        q = post.select(
            "o_orderkey", F.struct(*cols).alias("_qrow")
        ).alias("q")
        j = p.join(q, "o_orderkey", "full")
        both = j.filter(
            F.col("_prow").isNotNull() & F.col("_qrow").isNotNull()
            & (F.col("_prow") != F.col("_qrow"))
        )
        for ct, side in (("update_preimage", "_prow"),
                         ("update_postimage", "_qrow")):
            frames.append(both.select(
                F.lit(ct).alias("_change_type"),
                F.lit(v).cast("bigint").alias("_commit_version"),
                F.col(side).alias("_row"),
            ))
        frames.append(j.filter(F.col("_prow").isNull()).select(
            F.lit("insert").alias("_change_type"),
            F.lit(v).cast("bigint").alias("_commit_version"),
            F.col("_qrow").alias("_row"),
        ))
        frames.append(j.filter(F.col("_qrow").isNull()).select(
            F.lit("delete").alias("_change_type"),
            F.lit(v).cast("bigint").alias("_commit_version"),
            F.col("_prow").alias("_row"),
        ))
    cdf = frames[0]
    for fr in frames[1:]:
        cdf = cdf.unionByName(fr)
    return (
        cdf.select("_change_type", "_commit_version", "_row.*")
        .groupBy("_change_type", "_commit_version")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum((F.col("o_orderpriority") == "1-URGENT").cast("bigint"))
            .cast("bigint").alias("n_urgent"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .select("_change_type", "_commit_version", "n_rows",
                "n_urgent", "cents")
        .orderBy("_change_type", "_commit_version")
    )


def _pruned_files_multi(root: Path, preds: dict) -> tuple[list[str], int]:
    """Data skipping on a CONJUNCTION of range predicates: keep files
    whose recorded [min,max] intersects EVERY predicate's [lo,hi] —
    files lacking stats for a column are conservatively kept on that
    column (skipping is an optimization, never a filter)."""
    adds = _snapshot_adds(root)
    keep = [
        f for f, st in sorted(adds.items())
        if all(
            c not in st or (st[c]["max"] >= lo and st[c]["min"] <= hi)
            for c, (lo, hi) in preds.items()
        )
    ]
    return keep, len(adds)


@query(
    "lake_zorder_skipping",
    oracle=f"""
SELECT o_orderstatus,
       CAST(1 AS BIGINT) AS z_files_2d,
       CAST(2 AS BIGINT) AS lin_files_2d,
       CAST(4 AS BIGINT) AS z_files_date,
       CAST(8 AS BIGINT) AS lin_files_date,
       CAST(8 AS BIGINT) AS files_live,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM({_SQL_CENTS}) AS BIGINT) AS cents
FROM orders
WHERE o_custkey * 16 < 4 * ((SELECT MAX(o_custkey) FROM orders) + 1)
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    family=_FAM,
)
def lake_zorder_skipping(spark, sf_dir):
    """Z-ORDER clustering × data skipping — the multi-dimensional read
    lever single-column clustering cannot give: the SAME orders table
    is laid out twice in 8 files each, once clustered linearly by
    o_custkey and once by the bit-interleave (Morton code) of a 4-bit
    o_custkey bucket with a 4-bit order-half-year bucket; both layouts
    record true parquet-footer min/max per file in their commit-log
    add actions. Because the Morton curve gives every file a bounded
    range in BOTH dimensions, the 2-D predicate (first custkey
    quartile AND orderdate < 1997) prunes the z-store to 1 of 8 files
    while the custkey-clustered store scans 2 (its date ranges are
    full-width, only the custkey dimension prunes); a DATE-ONLY
    predicate prunes the z-store to 4 of 8 while the linear store
    scans ALL 8 — the classic z-order trade: slightly coarser on the
    clustered column, bounded on every interleaved one. All four
    counts are literal-pinned (derivable from the bit-interleave
    alone, independent of data), and the 2-D read's content
    hash-checks against the raw replay, so an interleave bug that
    mis-bucketed rows would surface as a content mismatch, not just a
    count drift.

    Scale: this is Delta's OPTIMIZE ZORDER BY / Iceberg's
    sort-order-with-z-curve discipline — at 100 TB it turns multi-
    predicate scans over an unpartitioned table from O(table) into
    O(matching sub-rectangles) using the same O(files) metadata fold
    as lake_stats_skipping, with zero query-side cost: the pruned
    read is an ordinary parquet scan Catalyst pushes the residual
    predicate into."""
    from datetime import datetime

    def _zexpr(maxc: int):
        a = F.expr(f"CAST(o_custkey AS BIGINT) * 16 DIV {maxc + 1}")
        b = (
            (F.year("o_orderdate") - F.lit(1995)) * 2
            + (F.month("o_orderdate") > 6).cast("int")
        )
        z = F.lit(0)
        for i in range(4):
            z = (
                z
                + F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i + 1)
                + F.shiftleft(F.shiftright(b, i).bitwiseAND(1), 2 * i)
            )
        return a, z

    def build(tmp: Path):
        o = table(spark, sf_dir, "orders")
        maxc = o.agg(F.max("o_custkey")).first()[0]
        tmp.mkdir(parents=True, exist_ok=True)
        (tmp / "_meta").write_text(json.dumps({"maxc": int(maxc)}))
        a, z = _zexpr(int(maxc))
        stats_cols = ["o_custkey", "o_orderdate"]
        for layout, bucket in (("z", z / 32), ("lin", a / 2)):
            sub = tmp / layout
            sub.mkdir(parents=True, exist_ok=True)
            for k in range(8):
                files = _write_files(
                    o.filter(F.floor(bucket) == k), sub / "data",
                    n_files=1,
                )
                adds = [
                    {"path": f,
                     "stats": _file_stats(sub, f, stats_cols)}
                    for f in files
                ]
                assert _commit(sub / "_log", k,
                               {"add": adds, "remove": []})

    root = _publish_store(build, _fixture_dir(sf_dir) / "lake_zorder")
    maxc = json.loads((root / "_meta").read_text())["maxc"]
    cut = (4 * (maxc + 1) - 1) // 16  # o_custkey <= cut <=> bucket a <= 3
    date_lo = datetime(1901, 1, 1)
    date_hi = datetime(1996, 12, 31, 23, 59, 59, 999999)
    pred_2d = {"o_custkey": (0, cut), "o_orderdate": (date_lo, date_hi)}
    pred_dt = {"o_orderdate": (date_lo, date_hi)}
    # encode timestamps the way _file_stats recorded them
    enc = {
        c: (lo.isoformat(sep=" ") if hasattr(lo, "isoformat") else lo,
            hi.isoformat(sep=" ") if hasattr(hi, "isoformat") else hi)
        for c, (lo, hi) in pred_2d.items()
    }
    z_2d, z_live = _pruned_files_multi(root / "z", enc)
    lin_2d, lin_live = _pruned_files_multi(root / "lin", enc)
    enc_dt = {"o_orderdate": enc["o_orderdate"]}
    z_dt, _ = _pruned_files_multi(root / "z", enc_dt)
    lin_dt, _ = _pruned_files_multi(root / "lin", enc_dt)
    assert z_live == lin_live == 8
    pred = (F.col("o_custkey") <= cut) & (
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    return (
        spark.read.parquet(*[str(root / "z" / f) for f in z_2d])
        .filter(pred)
        .groupBy("o_orderstatus")
        .agg(
            F.lit(len(z_2d)).cast("bigint").alias("z_files_2d"),
            F.lit(len(lin_2d)).cast("bigint").alias("lin_files_2d"),
            F.lit(len(z_dt)).cast("bigint").alias("z_files_date"),
            F.lit(len(lin_dt)).cast("bigint").alias("lin_files_date"),
            F.lit(z_live).cast("bigint").alias("files_live"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .select("o_orderstatus", "z_files_2d", "lin_files_2d",
                "z_files_date", "lin_files_date", "files_live",
                "n_orders", "cents")
        .orderBy("o_orderstatus")
    )


def version_changes(root: Path, version: int,
                    use_cdc: bool = True) -> list[tuple]:
    """Row-level CDC for commit ``version`` with pure pyarrow (no
    Spark — callable from a streaming source's runner process or an
    executor worker). Two paths, Delta's exact layering:

    - the commit recorded ``cdc`` change-data sidecars (r11 writers):
      read them directly — O(changed rows), one file per rewritten
      data file, the parallel unit of the streaming change feed;
    - no sidecars (or ``use_cdc=False``): an append commit's added
      files are inserts; a remove-carrying (COW) commit is diffed by
      FULL-ROW comparison keyed on o_orderkey — carried rewrites drop
      out, changed rows emit update_preimage/update_postimage pairs,
      one-sided keys emit insert/delete.

    Returns (change_type, version, o_orderkey, o_orderpriority, cents)
    tuples; the diff comparison is over ALL columns, so a row differing
    only in an unserved column still reports as changed. A unit test
    pins sidecar == diff row-for-row on the merge store."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    acts = json.loads((root / "_log" / f"v{version:010d}.json").read_text())
    adds = [_add_path(e) for e in acts.get("add", [])]
    removes = acts.get("remove", [])

    if use_cdc and acts.get("cdc"):
        out = []
        for f in acts["cdc"]:
            t = pq.read_table(
                root / f,
                columns=["_change_type", "o_orderkey",
                         "o_orderpriority", "o_totalprice"],
            )
            cents = pc.cast(
                pc.round(pc.multiply(t.column("o_totalprice"), 100),
                         round_mode="half_towards_infinity"),
                "int64",
            ).to_pylist()
            out.extend(zip(
                t.column("_change_type").to_pylist(),
                [version] * t.num_rows,
                t.column("o_orderkey").to_pylist(),
                t.column("o_orderpriority").to_pylist(),
                cents,
            ))
        return out

    if not removes:
        # insert-only commit: serve just the three emitted columns —
        # the full-row read below exists for the diff, not for inserts
        out = []
        for f in adds:
            t = pq.read_table(
                root / f,
                columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
            )
            cents = pc.cast(
                pc.round(pc.multiply(t.column("o_totalprice"), 100),
                         round_mode="half_towards_infinity"),
                "int64",
            ).to_pylist()
            keys = t.column("o_orderkey").to_pylist()
            prios = t.column("o_orderpriority").to_pylist()
            out.extend(
                ("insert", version, k, p, ce)
                for k, p, ce in zip(keys, prios, cents)
            )
        return out

    def rows(files):
        out = {}
        for f in files:
            t = pq.read_table(root / f)
            names = t.column_names
            ki = names.index("o_orderkey")
            pi = names.index("o_orderpriority")
            ci = names.index("o_totalprice")
            cents = pc.cast(
                pc.round(pc.multiply(t.column("o_totalprice"), 100),
                         round_mode="half_towards_infinity"),
                "int64",
            ).to_pylist()
            cols = [t.column(c).to_pylist() for c in names]
            for j in range(t.num_rows):
                full = tuple(col[j] for col in cols)
                out[full[ki]] = (full, full[pi], cents[j])
        return out

    post = rows(adds)
    pre = rows(removes)
    changes = []
    for k, (full, pr, ce) in pre.items():
        hit = post.get(k)
        if hit is None:
            changes.append(("delete", version, k, pr, ce))
        elif hit[0] != full:
            changes.append(("update_preimage", version, k, pr, ce))
            changes.append(("update_postimage", version, k,
                            hit[1], hit[2]))
    for k, (_, pr, ce) in post.items():
        if k not in pre:
            changes.append(("insert", version, k, pr, ce))
    return changes


@query(
    "lake_restore_version",
    oracle=f"""
SELECT o_orderpriority,
       CAST(4 AS BIGINT) AS version,
       CAST(4 AS BIGINT) AS files_readded,
       CAST(6 AS BIGINT) AS files_removed,
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_orderkey % 7 = 0 OR o_orderpriority = '1-URGENT')
            AS BIGINT) AS v3_urgent_orders,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM({_SQL_CENTS}) AS BIGINT) AS cents
FROM orders WHERE o_orderkey % 3 IN (0, 1)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    family=_FAM,
)
def lake_restore_version(spark, sf_dir):
    """RESTORE (rollback-as-a-commit): after the COW merge (v3), the
    table is restored to version 1 by committing v4 = re-add(files
    live at v1 but not at v3) + remove(files live at v3 but not at
    v1) — a pure METADATA commit (Delta's RESTORE): no data file is
    copied or rewritten, the bad version stays in history (v3 remains
    time-travelable — v3_urgent_orders pins its merged content via the
    as-of read), and readers pinned to v3 are unaffected. The LATEST
    read then equals v1's content: only the first two append batches,
    with their ORIGINAL priorities — grouping by priority proves the
    merge's 1-URGENT restatement was actually rolled back, not merely
    row counts restored. files_readded/files_removed pin the diff
    commit's shape.

    Scale: restore cost is O(|live(v_from)| + |live(v_to)|) metadata —
    the recovery path after a bad backfill on a 100 TB table, where
    re-writing data would be days and this is one log entry. Vacuum
    must respect restored-live files (ours does: it keeps anything
    live in the LATEST snapshot)."""

    def build(tmp: Path):
        _merge_commit(spark, tmp)
        want = set(_snapshot_files(tmp, as_of=1))
        have = set(_snapshot_files(tmp))
        assert _commit(tmp / "_log", 4, {
            "add": sorted(want - have),
            "remove": sorted(have - want),
            "restore": {"to_version": 1},
        })

    root = _store(spark, sf_dir, "restore", extra=build)
    ver = _log_versions(root)[-1]
    acts = json.loads((root / "_log" / f"v{ver:010d}.json").read_text())
    # the rolled-back version must stay a first-class historical read
    v3_urgent = (
        _read_snapshot(spark, root, as_of=3)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .agg(F.count("*").cast("bigint").alias("v3_urgent_orders"))
    )
    return (
        _read_snapshot(spark, root)
        .groupBy("o_orderpriority")
        .agg(
            F.lit(ver).cast("bigint").alias("version"),
            F.lit(len(acts["add"])).cast("bigint").alias("files_readded"),
            F.lit(len(acts["remove"])).cast("bigint")
            .alias("files_removed"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .join(F.broadcast(v3_urgent))
        .select("o_orderpriority", "version", "files_readded",
                "files_removed", "v3_urgent_orders", "n_orders", "cents")
        .orderBy("o_orderpriority")
    )


@query(
    "lake_clone_shallow",
    oracle=f"""
WITH src AS (
  SELECT 'src' AS tbl, o_orderstatus, {_SQL_CENTS} AS cents FROM orders
  UNION ALL
  SELECT 'src', 'SRC_ONLY', {_SQL_CENTS}
  FROM orders WHERE o_orderkey % 23 = 0
),
cl AS (
  SELECT 'clone' AS tbl, o_orderstatus, {_SQL_CENTS} AS cents FROM orders
  UNION ALL
  SELECT 'clone', 'CLONE_ONLY', {_SQL_CENTS}
  FROM orders WHERE o_orderkey % 19 = 0
),
un AS (SELECT * FROM src UNION ALL SELECT * FROM cl)
SELECT tbl, o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM un
GROUP BY tbl, o_orderstatus
ORDER BY tbl, o_orderstatus
""",
    family=_FAM,
)
def lake_clone_shallow(spark, sf_dir):
    """SHALLOW CLONE (zero-copy branch): the clone table's v0 commit
    lists the SOURCE table's live data files by cross-table relative
    path — no byte is copied — after which the two tables diverge
    independently: the clone appends a CLONE_ONLY slice (its v1), the
    source appends a SRC_ONLY slice (its v3), and neither append is
    visible through the other table's log. The grouped read of both
    tables pins exactly that: shared base content appears in both,
    each table sees only its own divergent append — a clone that
    accidentally wrote through to the source log (or re-resolved the
    source's LATEST instead of the cloned version) would leak the
    other slice and hash-mismatch.

    This is Delta SHALLOW CLONE / Iceberg branch semantics, the
    dev/test-against-production primitive: at 100 TB a full copy is
    immaterial, a clone commit is O(live files) metadata. Caveat
    (Delta has the same one): the source's vacuum does not know about
    clone references — production either vacuums clone-aware or
    treats clones as bounded-lifetime; documented here rather than
    hidden."""

    def build(tmp: Path):
        _base_commits(spark, sf_dir, tmp / "src")
        o = table(spark, sf_dir, "orders")
        # clone v0: reference src's live files relatively — zero copy
        src_live = _snapshot_files(tmp / "src")
        (tmp / "clone").mkdir(parents=True, exist_ok=True)
        assert _commit(tmp / "clone" / "_log", 0, {
            "add": [f"../src/{f}" for f in src_live], "remove": [],
            "clone": {"source": "src", "source_version": 2},
        })
        # divergent appends: clone v1 ...
        cl_extra = o.filter(F.col("o_orderkey") % 19 == 0).withColumn(
            "o_orderstatus", F.lit("CLONE_ONLY")
        )
        files = _write_files(cl_extra, tmp / "clone" / "data", n_files=1)
        assert _commit(tmp / "clone" / "_log", 1,
                       {"add": files, "remove": []})
        # ... and src v3, invisible to the clone
        src_extra = o.filter(F.col("o_orderkey") % 23 == 0).withColumn(
            "o_orderstatus", F.lit("SRC_ONLY")
        )
        files = _write_files(src_extra, tmp / "src" / "data", n_files=1)
        assert _commit(tmp / "src" / "_log", 3,
                       {"add": files, "remove": []})

    root = _publish_store(build, _fixture_dir(sf_dir) / "lake_clone")
    frames = []
    for tbl in ("src", "clone"):
        frames.append(
            _read_snapshot(spark, root / tbl)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").cast("bigint").alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("bigint").alias("cents"),
            )
            .select(F.lit(tbl).alias("tbl"), "o_orderstatus",
                    "n_orders", "cents")
        )
    return (
        frames[0].unionByName(frames[1])
        .orderBy("tbl", "o_orderstatus")
    )


def _bloom_positions(key: int, m: int, k: int = 4) -> list[int]:
    """k md5-derived bit positions for ``key`` in an m-bit bloom —
    portable, engine-independent, and stable across runs (unlike
    xxhash64 seeds)."""
    import hashlib

    return [
        int(hashlib.md5(f"{key}:{i}".encode()).hexdigest()[:8], 16) % m
        for i in range(k)
    ]


_BLOOM_M = 1 << 18  # 32 KiB per file: <1% FP at ~21k keys/file (sf0.1)


@query(
    "lake_bloom_index",
    oracle=f"""
WITH key AS (
  SELECT MIN(o_orderkey) AS k FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
)
SELECT o.o_orderkey,
       o.o_orderstatus,
       CAST(7 AS BIGINT) AS files_live,
       CAST(1 AS BIGINT) AS files_scanned,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM({_SQL_CENTS}) AS BIGINT) AS cents
FROM orders o, key
WHERE o.o_orderkey = key.k
GROUP BY o.o_orderkey, o.o_orderstatus
ORDER BY o.o_orderkey
""",
    family=_FAM,
)
def lake_bloom_index(spark, sf_dir):
    """BLOOM-FILTER POINT-LOOKUP INDEX (Delta's bloom filter index /
    Hyperspace's class of sidecar indexes): the table is clustered by
    YEAR, so a point lookup on the UNRELATED o_orderkey column gets
    nothing from min/max stats (every file spans the whole keyspace) —
    the worst case for data skipping and the classic lakes-can't-do-
    point-reads complaint. Each commit therefore publishes a 2^18-bit
    bloom sidecar over its file's orderkeys (k=4 md5-derived
    positions — portable and run-stable); a point lookup folds the
    log, tests the key against each live file's bloom (O(files) driver
    metadata + 32 KiB per file), and scans only possible files.

    Structural guarantee: a bloom has NO false negatives, so the
    pruned scan provably contains every matching row — that is what
    the content hash checks. files_scanned is pinned at 1: a false
    positive would raise it, but the bloom is hash-deterministic over
    this dataset (verified at all fixture SFs, <1% FP per file by
    sizing), so the pin is stable, not flaky — a resize or hash change
    that degraded the index would surface here as a count mismatch
    rather than silent slow scans.

    Scale: this is how a 100 TB year-partitioned lake serves needle
    lookups without a secondary database — 32 KiB/file sidecars and a
    metadata fold replace a full-table scan; the same discipline
    extends to any high-cardinality scattered column."""
    import pyarrow.parquet as pq

    def build(tmp: Path):
        o = table(spark, sf_dir, "orders")
        (tmp / "_index").mkdir(parents=True, exist_ok=True)
        lookup_key = None
        for kk, yr in enumerate(range(1995, 2002)):
            files = _write_files(
                o.filter(F.year("o_orderdate") == yr), tmp / "data",
                n_files=1,
            )
            adds = []
            for f in files:
                keys = pq.read_table(
                    tmp / f, columns=["o_orderkey"]
                ).column("o_orderkey").to_pylist()
                bits = bytearray(_BLOOM_M // 8)
                for key in keys:
                    for p in _bloom_positions(int(key), _BLOOM_M):
                        bits[p >> 3] |= 1 << (p & 7)
                # sidecar name derives from the DATA FILE, not the
                # commit index: a multi-file commit must never collide
                # two files onto one bloom (last-write-wins would give
                # false negatives = silently dropped rows). ADVICE r10.
                bpath = "_index/" + f.replace("/", "__") + ".bloom"
                (tmp / bpath).write_bytes(bytes(bits))
                adds.append({"path": f, "bloom": bpath})
                if yr == 1997:
                    lookup_key = min(keys)
            assert _commit(tmp / "_log", kk, {"add": adds, "remove": []})
        (tmp / "_meta").write_text(json.dumps({"lookup_key": lookup_key}))

    root = _publish_store(build, _fixture_dir(sf_dir) / "lake_bloom")
    key = json.loads((root / "_meta").read_text())["lookup_key"]
    # fold the log: live file -> bloom sidecar
    blooms: dict[str, str] = {}
    for v in _log_versions(root):
        acts = json.loads((root / "_log" / f"v{v:010d}.json").read_text())
        for r in acts.get("remove", []):
            blooms.pop(r, None)
        for e in acts.get("add", []):
            blooms[_add_path(e)] = e["bloom"] if isinstance(e, dict) else None
    pos = _bloom_positions(int(key), _BLOOM_M)
    keep = []
    for f, bpath in sorted(blooms.items()):
        if bpath is None:
            keep.append(f)  # unindexed file: must scan
            continue
        bits = (root / bpath).read_bytes()
        if all(bits[p >> 3] & (1 << (p & 7)) for p in pos):
            keep.append(f)
    return (
        spark.read.parquet(*[str(root / f) for f in keep])
        .filter(F.col("o_orderkey") == key)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.lit(len(blooms)).cast("bigint").alias("files_live"),
            F.lit(len(keep)).cast("bigint").alias("files_scanned"),
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .select("o_orderkey", "o_orderstatus", "files_live",
                "files_scanned", "n_rows", "cents")
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Partitioned lake table (VERDICT r10 item 3): hive-style partition
# columns INSIDE the transactional format — partitionValues recorded in
# the commit-log add actions (Delta's field, verbatim), snapshot reads
# pruning partitions BEFORE file-stats skipping, and dynamic partition
# overwrite as one atomic commit.
# --------------------------------------------------------------------------


def _snapshot_actions(root: Path, as_of: int | None = None) -> dict:
    """Live file -> FULL add-action dict (path/stats/partitionValues) at
    version ``as_of`` — the metadata fold a partition-aware reader
    walks. O(live files) driver-side JSON, exactly Delta's snapshot
    state; bare-path adds (old writers) normalize to ``{"path": f}``."""
    out: dict[str, dict] = {}
    for v in _log_versions(root):
        if as_of is not None and v > as_of:
            break
        acts = json.loads((root / "_log" / f"v{v:010d}.json").read_text())
        for r in acts.get("remove", []):
            out.pop(r, None)
        for e in acts.get("add", []):
            if isinstance(e, dict):
                out[e["path"]] = e
            else:
                out[e] = {"path": e}
    return out


def _pruned_files_partition_first(
    root: Path, part_col: str, part_vals: set[str],
    stats_col: str | None = None, lo=None, hi=None,
    as_of: int | None = None,
) -> dict:
    """Two-level metadata prune, partition pruning FIRST (the cheap
    exact level — a file either belongs to a matching partition or it
    does not), then min/max stats skipping WITHIN the surviving
    partitions. Files with no recorded partitionValues or stats are
    conservatively kept at their respective level — pruning is an
    optimization, never a filter. Returns the counts the pinned oracle
    columns check: partitions_live/scanned, files_live, files after
    each level, and the surviving file list."""
    acts = _snapshot_actions(root, as_of)
    # partition-count sets hold REAL partition values only: a file
    # with no recorded partitionValues (legacy bare-path add on an
    # evolved table) is "partition unknown", not a partition named
    # None — counting it would inflate partitions_live/scanned on
    # mixed stores (r11 ADVICE). Such files are still conservatively
    # KEPT by the prune below and surfaced via files_unpartitioned.
    parts_live = {
        e["partitionValues"][part_col]
        for e in acts.values()
        if e.get("partitionValues", {}).get(part_col) is not None
    }
    after_part = {
        f: e for f, e in acts.items()
        if e.get("partitionValues", {}).get(part_col) is None
        or e["partitionValues"][part_col] in part_vals
    }
    parts_scanned = {
        e["partitionValues"][part_col]
        for e in after_part.values()
        if e.get("partitionValues", {}).get(part_col) is not None
    }
    n_unpartitioned = sum(
        1 for e in acts.values()
        if e.get("partitionValues", {}).get(part_col) is None
    )
    keep = sorted(after_part)
    if stats_col is not None:
        enc = lo.isoformat(sep=" ") if hasattr(lo, "isoformat") else lo
        enc_hi = hi.isoformat(sep=" ") if hasattr(hi, "isoformat") else hi
        keep = [
            f for f, e in sorted(after_part.items())
            if stats_col not in e.get("stats", {})
            or (e["stats"][stats_col]["max"] >= enc
                and e["stats"][stats_col]["min"] <= enc_hi)
        ]
    return {
        "files": keep,
        "partitions_live": len(parts_live),
        "partitions_scanned": len(parts_scanned),
        "files_live": len(acts),
        "files_after_partition_prune": len(after_part),
        "files_scanned": len(keep),
        "files_unpartitioned": n_unpartitioned,
    }


def _part_add(root: Path, f: str, part_col: str, part_val: str,
              stats_cols: list[str]) -> dict:
    return {
        "path": f,
        "partitionValues": {part_col: part_val},
        "stats": _file_stats(root, f, stats_cols),
    }


def _build_partitioned_store(spark, sf_dir, tmp: Path) -> None:
    """v0..v6: one commit per o_orderdate year (1995..2001), each year
    a hive-style ``data/o_year=YYYY/`` directory holding TWO files
    clustered by half-year (so stats skipping has something to do
    INSIDE a partition); every add records partitionValues + true
    footer stats."""
    o = table(spark, sf_dir, "orders")
    for k, yr in enumerate(range(1995, 2002)):
        pdir = tmp / "data" / f"o_year={yr}"
        adds = []
        for half_pred in (
            F.month("o_orderdate") <= 6,
            F.month("o_orderdate") > 6,
        ):
            # _write_files relativizes to data_dir.parent; re-anchor
            # the nested hive layout to the STORE root (the log's
            # path convention)
            files = [
                f"data/{f}" for f in _write_files(
                    o.filter((F.year("o_orderdate") == yr) & half_pred),
                    pdir, n_files=1,
                )
            ]
            adds += [
                _part_add(tmp, f, "o_year", str(yr),
                          ["o_orderdate", "o_orderkey"])
                for f in files
            ]
        assert _commit(tmp / "_log", k, {"add": adds, "remove": []})


@query(
    "lake_partition_pruned",
    oracle=f"""
SELECT o_orderstatus,
       CAST(7 AS BIGINT) AS partitions_live,
       CAST(1 AS BIGINT) AS partitions_scanned,
       CAST(14 AS BIGINT) AS files_live,
       CAST(2 AS BIGINT) AS files_after_partition_prune,
       CAST(1 AS BIGINT) AS files_scanned,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM({_SQL_CENTS}) AS BIGINT) AS cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    family=_FAM,
)
def lake_partition_pruned(spark, sf_dir):
    """HIVE-STYLE PARTITIONING inside the transactional format
    (VERDICT r10 item 3 — the single most common real 100 TB lake
    layout, previously expressible only OUTSIDE the format via
    scan_partition_pruned): every add action records
    ``partitionValues`` (Delta's field) alongside file stats, and a
    predicate read prunes in the canonical two-level order — partition
    values FIRST (exact, zero-IO: 7 year-partitions -> 1), then
    min/max stats skipping WITHIN the surviving partition (the H2-1997
    predicate drops the H1 file: 2 -> 1). All six counters are pinned
    as oracle columns, so a prune that stopped firing (or fired too
    eagerly, dropping live rows) hash-mismatches rather than silently
    slowing down; content is checked against the raw replay.

    Scale: both levels are O(live files) driver-side metadata folds
    over the commit log — no directory listing (the hive layout on
    disk is cosmetic; the LOG is authoritative, exactly Delta) — and
    partition pruning composes with everything downstream: the scan
    Spark plans never learns the dropped files existed."""
    from datetime import datetime

    root = _publish_store(
        lambda tmp: _build_partitioned_store(spark, sf_dir, tmp),
        _fixture_dir(sf_dir) / "lake_part",
    )
    pr = _pruned_files_partition_first(
        root, "o_year", {"1997"},
        stats_col="o_orderdate",
        lo=datetime(1997, 7, 1),
        hi=datetime(1997, 12, 31, 23, 59, 59, 999999),
    )
    pred = (
        F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp")
    ) & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    return (
        spark.read.parquet(*[str(root / f) for f in pr["files"]])
        .filter(pred)
        .groupBy("o_orderstatus")
        .agg(
            F.lit(pr["partitions_live"]).cast("bigint")
            .alias("partitions_live"),
            F.lit(pr["partitions_scanned"]).cast("bigint")
            .alias("partitions_scanned"),
            F.lit(pr["files_live"]).cast("bigint").alias("files_live"),
            F.lit(pr["files_after_partition_prune"]).cast("bigint")
            .alias("files_after_partition_prune"),
            F.lit(pr["files_scanned"]).cast("bigint")
            .alias("files_scanned"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .select("o_orderstatus", "partitions_live", "partitions_scanned",
                "files_live", "files_after_partition_prune",
                "files_scanned", "n_orders", "cents")
        .orderBy("o_orderstatus")
    )


@query(
    "lake_partition_overwrite",
    oracle=f"""
WITH pre AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
),
cur AS (
  SELECT o_orderstatus, {_SQL_CENTS} AS cents FROM orders
  WHERE o_orderdate < TIMESTAMP '1997-01-01'
     OR o_orderdate >= TIMESTAMP '1998-01-01'
  UNION ALL
  SELECT o_orderstatus, {_SQL_CENTS} AS cents FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
    AND o_orderkey % 2 = 0
)
SELECT o_orderstatus,
       CAST(7 AS BIGINT) AS version,
       CAST(1 AS BIGINT) AS partitions_replaced,
       CAST(2 AS BIGINT) AS files_removed,
       CAST(1 AS BIGINT) AS files_added,
       (SELECT n FROM pre) AS n_1997_pre_overwrite,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM cur
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    family=_FAM,
)
def lake_partition_overwrite(spark, sf_dir):
    """DYNAMIC PARTITION OVERWRITE as one transactional commit
    (VERDICT r10 item 3, the write side of the partitioned table —
    ``INSERT OVERWRITE ... PARTITION`` / Delta's
    ``replaceWhere``): the incoming reprocessed frame touches only
    partition o_year=1997, so the commit tombstones exactly that
    partition's live files (found by folding partitionValues in the
    log, NOT by listing directories) and adds the replacement files —
    remove(2) + add(1) in ONE version, so a concurrent reader sees the
    old partition or the new one, never a mix, and every OTHER
    partition's files are untouched (their add actions don't even
    appear in the commit). The replacement keeps only even order keys
    (a reprocess that dedups), so content pins the row-level swap;
    n_1997_pre_overwrite pins that TIME TRAVEL to the pre-overwrite
    version still serves the original partition content; the
    files_removed/files_added/partitions_replaced counters pin the
    blast radius.

    Scale: this is the nightly-reprocess primitive of a
    date-partitioned 100 TB lake — cost is O(files in the replaced
    partitions), the log fold keeps it exact (no listing race), and
    the atomic version boundary is what makes backfills safe under
    concurrent readers."""
    from datetime import datetime

    def build(tmp: Path):
        _build_partitioned_store(spark, sf_dir, tmp)
        o = table(spark, sf_dir, "orders")
        repl = o.filter(
            (F.year("o_orderdate") == 1997) & (F.col("o_orderkey") % 2 == 0)
        )
        # dynamic resolution: partitions touched by the incoming frame
        # (bounded driver-side distinct over the partition column)
        touched = {
            str(r[0]) for r in
            repl.select(F.year("o_orderdate")).distinct().collect()
        }
        acts = _snapshot_actions(tmp)
        removes = sorted(
            f for f, e in acts.items()
            if e.get("partitionValues", {}).get("o_year") in touched
        )
        adds = []
        for yr in sorted(touched):
            files = [
                f"data/{f}" for f in _write_files(
                    repl.filter(F.year("o_orderdate") == int(yr)),
                    tmp / "data" / f"o_year={yr}", n_files=1,
                )
            ]
            adds += [
                _part_add(tmp, f, "o_year", yr,
                          ["o_orderdate", "o_orderkey"])
                for f in files
            ]
        assert _commit(tmp / "_log", 7,
                       {"add": adds, "remove": removes,
                        "overwritePartitions": sorted(touched)})

    root = _publish_store(build, _fixture_dir(sf_dir) / "lake_part_ow")
    acts7 = json.loads((root / "_log" / f"v{7:010d}.json").read_text())
    # time travel to v6: the pre-overwrite 1997 partition, still whole —
    # counted from parquet FOOTERS (every row in a partition file IS
    # 1997, so footer sums are exact; no Spark job mid-plan)
    import pyarrow.parquet as pq

    pre = _pruned_files_partition_first(root, "o_year", {"1997"}, as_of=6)
    n_pre = sum(
        pq.read_metadata(root / f).num_rows for f in pre["files"]
    )
    return (
        _read_snapshot(spark, root)
        .groupBy("o_orderstatus")
        .agg(
            F.lit(7).cast("bigint").alias("version"),
            F.lit(len(acts7["overwritePartitions"])).cast("bigint")
            .alias("partitions_replaced"),
            F.lit(len(acts7["remove"])).cast("bigint")
            .alias("files_removed"),
            F.lit(len(acts7["add"])).cast("bigint").alias("files_added"),
            F.lit(n_pre).cast("bigint").alias("n_1997_pre_overwrite"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .select("o_orderstatus", "version", "partitions_replaced",
                "files_removed", "files_added", "n_1997_pre_overwrite",
                "n_orders", "cents")
        .orderBy("o_orderstatus")
    )


@query(
    "lake_partition_evolution",
    oracle=f"""
SELECT o_orderstatus,
       CAST(7 AS BIGINT) AS files_live,
       CAST(2 AS BIGINT) AS files_legacy_kept,
       CAST(1 AS BIGINT) AS files_new_scanned,
       CAST(3 AS BIGINT) AS files_scanned,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM({_SQL_CENTS}) AS BIGINT) AS cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01'
  AND o_orderdate <  TIMESTAMP '1999-01-01'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    family=_FAM,
)
def lake_partition_evolution(spark, sf_dir):
    """PARTITION-SCHEME EVOLUTION as a log event (r11, the optional
    half of VERDICT r10 item 3 — Iceberg's signature capability): the
    table starts UNPARTITIONED (v0/v1 write 1995+1996 as plain files,
    no partitionValues, and — deliberately — no stats: the legacy
    layout a real migration inherits), then v2 records a ``metaData``
    action declaring partitioning by o_year, and v3..v7 write
    1997..2001 as hive-partitioned, partitionValues-carrying adds. No
    data file is ever rewritten — evolution costs ONE log entry
    (Iceberg's spec-evolution contract; Hive/Delta would force a full
    rewrite into the new layout).

    The 1998 read shows exactly what that buys and what it costs:
    partition pruning drops 4 of the 5 NEW files (5 -> 1,
    files_new_scanned pins it) but must CONSERVATIVELY KEEP both
    legacy files (no partitionValues, no stats — a reader that guessed
    would drop live rows), so files_scanned = 3 of 7. The conservative
    keep is load-bearing: 1998 rows live ONLY in the new layout, but
    the engine cannot know that from metadata, and the content hash
    would catch an over-eager prune. Backfilling stats or rewriting
    legacy files into partitions (lake_compact_optimize's job) is the
    documented remedy — evolution makes new data cheap immediately and
    old data cheap lazily.

    Scale: a 100 TB table changes its partition scheme with one
    metadata commit and zero data movement; readers pay full scans
    only on the pre-evolution tail, which compaction retires."""
    def build(tmp: Path):
        o = table(spark, sf_dir, "orders")
        # v0/v1: legacy unpartitioned, stat-less adds (bare paths)
        for k, yr in enumerate((1995, 1996)):
            files = _write_files(
                o.filter(F.year("o_orderdate") == yr),
                tmp / "data", n_files=1,
            )
            assert _commit(tmp / "_log", k, {"add": files, "remove": []})
        # v2: the evolution event — metadata only, no files
        assert _commit(tmp / "_log", 2, {
            "add": [], "remove": [],
            "metaData": {"partitionColumns": ["o_year"]},
        })
        # v3..v7: partitioned adds under the declared scheme
        for k, yr in enumerate(range(1997, 2002), start=3):
            files = [
                f"data/{f}" for f in _write_files(
                    o.filter(F.year("o_orderdate") == yr),
                    tmp / "data" / f"o_year={yr}", n_files=1,
                )
            ]
            adds = [
                _part_add(tmp, f, "o_year", str(yr),
                          ["o_orderdate", "o_orderkey"])
                for f in files
            ]
            assert _commit(tmp / "_log", k, {"add": adds, "remove": []})

    root = _publish_store(build, _fixture_dir(sf_dir) / "lake_part_evo")
    acts = _snapshot_actions(root)
    legacy = sorted(f for f, e in acts.items()
                    if "partitionValues" not in e)
    new_kept = sorted(
        f for f, e in acts.items()
        if e.get("partitionValues", {}).get("o_year") == "1998"
    )
    keep = legacy + new_kept
    pred = (
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    ) & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    return (
        spark.read.parquet(*[str(root / f) for f in keep])
        .filter(pred)
        .groupBy("o_orderstatus")
        .agg(
            F.lit(len(acts)).cast("bigint").alias("files_live"),
            F.lit(len(legacy)).cast("bigint").alias("files_legacy_kept"),
            F.lit(len(new_kept)).cast("bigint").alias("files_new_scanned"),
            F.lit(len(keep)).cast("bigint").alias("files_scanned"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .select("o_orderstatus", "files_live", "files_legacy_kept",
                "files_new_scanned", "files_scanned", "n_orders", "cents")
        .orderBy("o_orderstatus")
    )


@query(
    "lake_concurrent_disjoint",
    oracle=f"""
WITH eff AS (
  SELECT * FROM orders
  WHERE year(o_orderdate) NOT IN (1997, 1999)
     OR (year(o_orderdate) = 1997 AND o_orderkey % 2 = 0)
     OR (year(o_orderdate) = 1999 AND o_orderkey % 3 = 0)
)
SELECT o_orderstatus,
       TRUE AS b_first_rejected,
       CAST(8 AS BIGINT) AS b_retry_version,
       TRUE AS c_first_rejected,
       TRUE AS c_aborted,
       '1997' AS c_conflict_partition,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM({_SQL_CENTS}) AS BIGINT) AS cents
FROM eff
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    family=_FAM,
)
def lake_concurrent_disjoint(spark, sf_dir):
    """PARTITION-LEVEL CONCURRENCY CONTROL (r12 — VERDICT r11 missing
    item 4, Delta's conflict rule that makes multi-tenant backfills
    safe at 100 TB): three writers race dynamic partition overwrites
    from the SAME stale snapshot (v6 of the year-partitioned store).
    Writer A overwrites o_year=1997 (keeps even keys) and wins v7.
    Writer B overwrites o_year=1999 (keeps %3 keys): its v7 commit is
    REJECTED by put-if-absent, so it runs the revalidation protocol —
    re-read every commit between its snapshot and head, prove the
    winners' touched partitionValues are DISJOINT from its own, and
    retry the SAME staged files at the next version with no data
    rewrite: v8 succeeds. Writer C overwrites o_year=1997 (keeps %5
    keys): same rejection, but revalidation finds 1997 in the v7
    winner's blast radius — a logical lost-update — so C ABORTS,
    surfaces the conflicting partition, and deletes its staged files
    (no orphan data). C's revalidation window spans BOTH intervening
    commits (A's v7 and B's v8), pinning that the check walks the
    whole gap, not just one version.

    All three verdicts are pinned as oracle columns (measured from the
    protocol run, not assumed), and the final-state content hash pins
    the merged result: 1997 = A's rows, 1999 = B's rows, every other
    partition untouched — C's aborted rows in NO partition.

    Scale: revalidation is O(intervening commits) driver-side JSON —
    no data IO — which is why disjoint backfills over a 100 TB lake
    retry in milliseconds while a same-partition race fails fast
    instead of corrupting."""

    def build(tmp: Path):
        _build_partitioned_store(spark, sf_dir, tmp)  # v0..v6
        o = table(spark, sf_dir, "orders")
        snap_v = 6

        def stage_overwrite(year: int, pred):
            # each writer folds the log AT ITS SNAPSHOT (stale for all
            # three once A commits) and stages replacement files
            repl = o.filter((F.year("o_orderdate") == year) & pred)
            acts = _snapshot_actions(tmp, as_of=snap_v)
            removes = sorted(
                f for f, e in acts.items()
                if e.get("partitionValues", {}).get("o_year") == str(year)
            )
            files = [
                f"data/{f}" for f in _write_files(
                    repl, tmp / "data" / f"o_year={year}", n_files=1,
                )
            ]
            adds = [
                _part_add(tmp, f, "o_year", str(year),
                          ["o_orderdate", "o_orderkey"])
                for f in files
            ]
            return {"add": adds, "remove": removes,
                    "overwritePartitions": [str(year)]}

        act_a = stage_overwrite(1997, F.col("o_orderkey") % 2 == 0)
        act_b = stage_overwrite(1999, F.col("o_orderkey") % 3 == 0)
        act_c = stage_overwrite(1997, F.col("o_orderkey") % 5 == 0)

        assert _commit(tmp / "_log", snap_v + 1, act_a)  # A wins v7
        b_first = _commit(tmp / "_log", snap_v + 1, act_b)  # rejected
        c_first = _commit(tmp / "_log", snap_v + 1, act_c)  # rejected

        def touched(acts_dict: dict) -> set[str]:
            t = set(acts_dict.get("overwritePartitions", []))
            for e in acts_dict.get("add", []):
                if isinstance(e, dict):
                    t.update(
                        v for v in e.get("partitionValues", {}).values()
                        if v is not None
                    )
            return t

        def revalidate_and_retry(my_acts: dict):
            """Delta's partition-disjointness rule: walk every commit
            the loser did not see; retry iff no winner touched any of
            the loser's partitions (which also guarantees the loser's
            staged removes are still live)."""
            head = max(_log_versions(tmp))
            conflicts: set[str] = set()
            for v in range(snap_v + 1, head + 1):
                win = json.loads(
                    (tmp / "_log" / f"v{v:010d}.json").read_text()
                )
                conflicts |= touched(win) & touched(my_acts)
            if conflicts:
                return None, sorted(conflicts)
            target = head + 1
            assert _commit(tmp / "_log", target, my_acts)
            return target, []

        b_v, b_conf = revalidate_and_retry(act_b)   # disjoint -> v8
        c_v, c_conf = revalidate_and_retry(act_c)   # 1997 -> abort
        if c_v is None:  # abort contract: drop staged files, no orphans
            for e in act_c["add"]:
                # the whole staged uuid subdir (incl. _SUCCESS markers)
                shutil.rmtree((tmp / e["path"]).parent)
        (tmp / "_race.json").write_text(json.dumps({
            "b_first_rejected": not b_first,
            "b_retry_version": b_v,
            "b_conflicts": b_conf,
            "c_first_rejected": not c_first,
            "c_aborted": c_v is None,
            "c_conflict_partitions": c_conf,
        }))

    root = _publish_store(
        build, _fixture_dir(sf_dir) / "lake_conc_disj"
    )
    race = json.loads((root / "_race.json").read_text())
    return (
        _read_snapshot(spark, root)
        .groupBy("o_orderstatus")
        .agg(
            F.lit(race["b_first_rejected"]).alias("b_first_rejected"),
            F.lit(race["b_retry_version"]).cast("bigint")
            .alias("b_retry_version"),
            F.lit(race["c_first_rejected"]).alias("c_first_rejected"),
            F.lit(race["c_aborted"]).alias("c_aborted"),
            F.lit(",".join(race["c_conflict_partitions"]))
            .alias("c_conflict_partition"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .select("o_orderstatus", "b_first_rejected", "b_retry_version",
                "c_first_rejected", "c_aborted", "c_conflict_partition",
                "n_orders", "cents")
        .orderBy("o_orderstatus")
    )


@query(
    "lake_timestamp_travel",
    oracle=f"""
WITH probes AS (
  SELECT * FROM (VALUES
    (0, TIMESTAMP '1995-01-11 00:00:00', 0),
    (1, TIMESTAMP '1995-01-25 12:00:00', 1),
    (2, TIMESTAMP '1999-06-01 00:00:00', 2)
  ) AS t(probe, asof_ts, resolved_version)
),
content AS (
  SELECT p.probe, p.resolved_version,
         COUNT(*) AS n_orders, SUM({_SQL_CENTS}) AS cents
  FROM probes p JOIN orders o
    ON o.o_orderkey % 3 <= p.resolved_version
  GROUP BY p.probe, p.resolved_version
)
SELECT probe,
       CAST(resolved_version AS BIGINT) AS resolved_version,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(cents AS BIGINT) AS cents
FROM content
ORDER BY probe
""",
    family=_FAM,
)
def lake_timestamp_travel(spark, sf_dir):
    """TIME TRAVEL BY TIMESTAMP (r12 — the other half of the time-travel
    API next to lake_time_travel's version form; users overwhelmingly
    ask 'the table as of last night', not 'as of version 1'): every
    commit carries an IN-COMMIT TIMESTAMP in its log entry (Delta's
    ICT feature — the commit's own authoritative clock, immune to the
    file-mtime skew that plagued timestamp resolution before ICT; here
    deterministic v0=1995-01-11, v1=1995-01-21, v2=1995-01-31 so the
    fixture is reproducible). AS OF ts resolves to the LATEST commit
    whose timestamp <= ts — three probes pin the full contract: an
    EXACT commit timestamp resolves to that commit (boundary
    inclusive), a timestamp strictly BETWEEN commits resolves to the
    earlier one (not nearest!), and a far-future timestamp resolves to
    head. Each probe's snapshot content is hash-checked (the %3 batch
    predicate), so a wrong resolution cannot pass on the version
    column alone.

    Scale: resolution is an O(commits) driver-side fold over log
    timestamps (checkpoint-accelerated like every snapshot fold) —
    data files are untouched until the resolved snapshot reads."""
    from datetime import datetime, timedelta

    base = datetime(1995, 1, 1)

    def build(tmp: Path):
        o = table(spark, sf_dir, "orders")
        for k in range(3):
            files = _write_files(
                o.filter(F.col("o_orderkey") % 3 == k), tmp / "data"
            )
            ts = (base + timedelta(days=10 * (k + 1))).isoformat(sep=" ")
            assert _commit(tmp / "_log", k, {
                "add": files, "remove": [],
                "commitTimestamp": ts,
            })

    root = _publish_store(build, _fixture_dir(sf_dir) / "lake_ict")
    cts = {
        v: json.loads(
            (root / "_log" / f"v{v:010d}.json").read_text()
        )["commitTimestamp"]
        for v in _log_versions(root)
    }

    def resolve(asof: str) -> int:
        vs = [v for v, t in cts.items() if t <= asof]
        if not vs:
            raise ValueError(f"no commit at or before {asof}")
        return max(vs)

    probes = [
        (0, "1995-01-11 00:00:00"),   # exact v0 ts -> v0 (inclusive)
        (1, "1995-01-25 12:00:00"),   # between v1 and v2 -> v1
        (2, "1999-06-01 00:00:00"),   # far future -> head
    ]
    # probe 1 sits between v1 (Jan 21) and v2 (Jan 31) and must
    # resolve to v1, the EARLIER commit (not nearest — Jan 31 is
    # closer); the oracle pins each expected resolution AND its
    # content, so a nearest-commit bug hash-mismatches.
    frames = []
    for pid, asof in probes:
        v = resolve(asof)
        frames.append(
            _read_snapshot(spark, root, as_of=v).agg(
                F.lit(pid).alias("probe"),
                F.lit(v).cast("bigint").alias("resolved_version"),
                F.count("*").cast("bigint").alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("bigint").alias("cents"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("probe")
