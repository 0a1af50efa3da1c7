"""Simple-reader twins of the lake streaming sources (offset protocol).

``stream_lake_tail`` and ``stream_lake_cdf`` (streaming/queries.py) run
on the full partition-planned :class:`DataSourceStreamReader` — offsets
handled by the driver-side runner, DATA read by executors, one input
partition per commit file (VERDICT r10 item 1). These module-level
twins keep the r10 ``SimpleDataSourceStreamReader`` implementations
alive as the executable specification of the OFFSET protocol itself —
initialOffset / one-committed-version-per-read / readBetweenOffsets
checkpoint replay / remove-action refusal — exercised directly by
tests/test_units.py without a Spark query in the loop. They are not
registered as a data source: the registry ops own the scale path; these
own the protocol contract.

Both readers are pure pyarrow + commit-log folds (no SparkSession), so
the protocol tests run them in-process.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql.datasource import SimpleDataSourceStreamReader


def plan_tail_partitions(
    root: str, start_v: int, end_v: int,
    part_col: str | None = None, part_val: str | None = None,
) -> list[tuple[int, str]]:
    """Partition plan for an append-tail span (start_v, end_v]: one
    (version, file) per file each commit ADDED — metadata-only (commit
    log reads, no data IO), so it runs in the source runner while the
    file reads land on executors. Remove-carrying versions are refused
    by ``version_adds`` (append-tail contract). Unit-tested directly:
    the base store must plan >1 partition per version.

    With ``part_col``/``part_val`` set, only files whose add action
    recorded a MATCHING partitionValue are planned (the §2.14
    partitioned table meeting the streaming source): non-matching
    files are skipped from metadata alone — zero IO — while files with
    NO recorded partitionValues are conservatively kept, the same
    never-a-filter rule as the batch prune. Note the asymmetry with
    version_adds' remove refusal: partition skipping is an
    optimization over adds, so it is allowed to drop; remove actions
    change delivered rows, so they must refuse."""
    import json as _json

    from hdfs_mr_spark.sources import lake

    parts = []
    for v in lake._log_versions(Path(root)):
        if not (start_v < v <= end_v):
            continue
        files = lake.version_adds(Path(root), v)
        if part_col is not None:
            acts = _json.loads(
                (Path(root) / "_log" / f"v{v:010d}.json").read_text()
            )
            pv = {
                lake._add_path(e): e.get("partitionValues")
                if isinstance(e, dict) else None
                for e in acts.get("add", [])
            }
            files = [
                f for f in files
                if pv.get(f) is None or pv[f].get(part_col) == part_val
            ]
        parts.extend((v, f) for f in files)
    return parts


def plan_cdf_partitions(root: str, start_v: int,
                        end_v: int) -> list[tuple[str, int, str | None]]:
    """Partition plan for a change-feed span (start_v, end_v]: an
    append commit plans one ``("insert", v, file)`` per added file; a
    remove-carrying commit plans one ``("cdc", v, file)`` per recorded
    change-data sidecar (the r11 writer contract — per-file sidecars
    ARE the parallel unit); a COW commit whose writer recorded no
    sidecars degrades to a single ``("diff", v, None)`` partition whose
    executor-side read replays the pyarrow full-row diff. Metadata-only
    in the runner; all row IO lands on executors."""
    from hdfs_mr_spark.sources import lake

    parts: list[tuple[str, int, str | None]] = []
    for v in lake._log_versions(Path(root)):
        if not (start_v < v <= end_v):
            continue
        acts = json.loads(
            (Path(root) / "_log" / f"v{v:010d}.json").read_text()
        )
        adds = [lake._add_path(e) for e in acts.get("add", [])]
        if not acts.get("remove"):
            parts.extend(("insert", v, f) for f in adds)
        elif acts.get("cdc"):
            parts.extend(("cdc", v, f) for f in acts["cdc"])
        else:
            parts.append(("diff", v, None))
    return parts


class LakeTailSimpleReader(SimpleDataSourceStreamReader):
    """Append-tail offset protocol: offsets ARE lake versions; each
    read() advances exactly one committed version and serves the files
    that version ADDED (micro-batch boundaries == commit boundaries,
    Delta's streaming-source contract); readBetweenOffsets replays any
    (start, end] span for checkpoint recovery; versions carrying
    remove-actions are REFUSED (an append tail cannot represent data
    changes — re-seed from a snapshot, Delta without ignoreChanges)."""

    def __init__(self, store_root: str, repo_root: str | None = None):
        self.root = store_root
        self.repo = repo_root

    def _lake(self):
        import sys as _sys

        if self.repo and self.repo not in _sys.path:
            _sys.path.insert(0, self.repo)
        from hdfs_mr_spark.sources import lake as _lake

        return _lake

    def _rows_for(self, version):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        rows = []
        for f in self._lake().version_adds(Path(self.root), version):
            t = pq.read_table(
                Path(self.root) / f,
                columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
            )
            cents = pc.cast(
                pc.round(pc.multiply(t.column("o_totalprice"), 100),
                         round_mode="half_towards_infinity"),
                "int64",
            )
            rows.extend(zip(
                t.column("o_orderkey").to_pylist(),
                t.column("o_orderstatus").to_pylist(),
                cents.to_pylist(),
            ))
        return rows

    def initialOffset(self):
        return {"version": -1}

    def read(self, start):
        v = start["version"]
        pending = [x for x in self._lake()._log_versions(Path(self.root))
                   if x > v]
        if not pending:
            return iter([]), {"version": v}
        nv = pending[0]  # one committed version per micro-batch
        return iter(self._rows_for(nv)), {"version": nv}

    def readBetweenOffsets(self, start, end):
        rows = []
        for x in self._lake()._log_versions(Path(self.root)):
            if start["version"] < x <= end["version"]:
                rows.extend(self._rows_for(x))
        return iter(rows)


class LakeCdfSimpleReader(SimpleDataSourceStreamReader):
    """Change-feed offset protocol: same version-offsets as the tail
    twin, but each read serves commit V's row-level CHANGES
    (lake.version_changes): append commits stream their added rows as
    inserts; a COW commit serves its recorded change-data sidecars, or
    is full-row pre-vs-post diffed when the writer recorded none."""

    def __init__(self, store_root: str, repo_root: str | None = None):
        self.root = store_root
        self.repo = repo_root

    def _lake(self):
        import sys as _sys

        if self.repo and self.repo not in _sys.path:
            _sys.path.insert(0, self.repo)
        from hdfs_mr_spark.sources import lake as _lake

        return _lake

    def _changes(self, version):
        return self._lake().version_changes(Path(self.root), version)

    def initialOffset(self):
        return {"version": -1}

    def read(self, start):
        v = start["version"]
        pending = [x for x in self._lake()._log_versions(Path(self.root))
                   if x > v]
        if not pending:
            return iter([]), {"version": v}
        nv = pending[0]
        return iter(self._changes(nv)), {"version": nv}

    def readBetweenOffsets(self, start, end):
        rows = []
        for x in self._lake()._log_versions(Path(self.root)):
            if start["version"] < x <= end["version"]:
                rows.extend(self._changes(x))
        return iter(rows)
