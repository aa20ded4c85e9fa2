"""Snapshot store — atomic multi-table commits over Parquet.

The reference's checkpoint is a git commit of ``news_json/*.json`` per
run (daum_scrape.yml:47-56): crash → next run restores the last
committed state (SURVEY §3.3). The engine reproduces those semantics
with an Iceberg-shaped layer (no Iceberg runtime jar ships with this
sandbox's pyspark — SURVEY §7.3): every table version is an immutable
Parquet directory; a single JSON manifest names the live version of
every table plus the last committed ``batch_id``; commit = write data
dirs, then atomically swap the manifest (``os.replace`` — POSIX-atomic).
A killed job leaves orphan version dirs (ignored by readers, GC'd on
next commit) and resumes from the last manifest exactly.

Two table modes:
* ``overwrite`` — small state tables (frontier, seed_state, fuzzy
  titles): the manifest points at one directory, rewritten per batch.
* ``append``   — monotone tables (documents, seen, metrics): the
  manifest lists delta directories; read = parquet scan of all of them
  (one ``spark.read.parquet(*dirs)``). A 10^10-row table is never
  rewritten — commits are O(batch), the MERGE's "WHEN NOT MATCHED
  INSERT" arm realized as append-after-anti-join.

Idempotence: ``commit`` records ``batch_id``; re-running an in-flight
batch after a crash re-writes new version dirs and swaps once — the
previously half-written dirs are unreachable. ``last_batch_id`` lets the
driver skip batches already committed.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    MANIFEST = "_manifest.json"

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ manifest

    def _manifest_path(self) -> str:
        return os.path.join(self.root, self.MANIFEST)

    def manifest(self) -> dict:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {"version": 0, "batch_id": -1, "tables": {}, "history": []}
        with open(p) as f:
            return json.load(f)

    @property
    def last_batch_id(self) -> int:
        return int(self.manifest()["batch_id"])

    # ------------------------------------------------------------ read

    def read(self, spark: SparkSession, name: str) -> DataFrame | None:
        """Live snapshot of a table, or None if never committed."""
        entry = self.manifest()["tables"].get(name)
        if not entry:
            return None
        dirs = entry["dirs"]
        if not dirs:
            return None
        return spark.read.parquet(*[os.path.join(self.root, d) for d in dirs])

    def exists(self, name: str) -> bool:
        return bool(self.manifest()["tables"].get(name, {}).get("dirs"))

    def read_at_batch(self, spark: SparkSession, name: str, batch_id: int) -> DataFrame | None:
        """Time travel for append tables: the table as of a committed
        batch (Iceberg snapshot-read semantics). Append deltas are named
        by the version that committed them and the manifest history maps
        batch→version, so the as-of state is the delta dirs with version
        ≤ that batch's version. Overwrite tables are not time-travelable
        here (superseded versions are GC'd — by design, they are derived
        state rebuilt each window)."""
        man = self.manifest()
        entry = man["tables"].get(name)
        if not entry or entry.get("mode") != "append":
            return None
        version_of = {h["batch_id"]: h["version"] for h in man.get("history", [])}
        if batch_id not in version_of:
            return None
        vmax = version_of[batch_id]
        dirs = [d for d in entry["dirs"] if int(d.rsplit("/v", 1)[1]) <= vmax]
        if not dirs:
            return None
        return spark.read.parquet(*[os.path.join(self.root, d) for d in dirs])

    # ------------------------------------------------------------ commit

    def commit(
        self,
        batch_id: int,
        overwrite: dict[str, DataFrame] | None = None,
        append: dict[str, DataFrame] | None = None,
        meta: dict | None = None,
    ) -> None:
        """Atomically publish one micro-batch's table changes.

        All data directories are fully written *before* the manifest
        swap; the swap is the only visible transition.
        """
        man = self.manifest()
        new_version = int(man["version"]) + 1
        tables = {k: dict(v) for k, v in man["tables"].items()}

        # All data dirs are written before the manifest swap; writes are
        # independent Spark jobs, so run them concurrently (the swap below
        # is still the single atomic commit point).
        from concurrent.futures import ThreadPoolExecutor

        jobs: list[tuple[str, DataFrame, str, str]] = []
        for name, df in (overwrite or {}).items():
            jobs.append((name, df, f"{name}/v{new_version}", "overwrite"))
        for name, df in (append or {}).items():
            jobs.append((name, df, f"{name}/v{new_version}", "append"))

        def write(job):
            name, df, d, _mode = job
            df.write.mode("overwrite").parquet(os.path.join(self.root, d))

        if jobs:
            with ThreadPoolExecutor(max_workers=min(8, len(jobs))) as ex:
                list(ex.map(write, jobs))
        for name, df, d, mode in jobs:
            if mode == "overwrite":
                tables[name] = {"mode": "overwrite", "dirs": [d]}
            else:
                prev = tables.get(name, {"mode": "append", "dirs": []})
                tables[name] = {"mode": "append", "dirs": prev["dirs"] + [d]}

        new_man = {
            "version": new_version,
            "batch_id": batch_id,
            "tables": tables,
            "committed_at": time.time(),
            "meta": meta or {},
            "history": (man.get("history") or [])[-50:]
            + [{"version": new_version, "batch_id": batch_id}],
        }
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_man, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path())  # the atomic commit point
        self._gc(tables)

    # ------------------------------------------------------------ gc

    def _gc(self, live_tables: dict) -> None:
        """Remove version dirs no manifest references (orphans from
        crashed batches and superseded overwrite versions)."""
        live: set[str] = set()
        for entry in live_tables.values():
            live.update(entry["dirs"])
        for name in os.listdir(self.root):
            tdir = os.path.join(self.root, name)
            if not os.path.isdir(tdir):
                continue
            for v in os.listdir(tdir):
                rel = f"{name}/{v}"
                if rel not in live:
                    shutil.rmtree(os.path.join(tdir, v), ignore_errors=True)


def merge_insert_new(existing: DataFrame | None, new: DataFrame, key: str) -> DataFrame:
    """MERGE ... WHEN NOT MATCHED THEN INSERT (SURVEY §2.4 D5/J3): the
    reference's save-time dedup loops (Daum_crawler.py:213-217). Returns
    only the rows to append."""
    if existing is None:
        return new.dropDuplicates([key])
    return new.dropDuplicates([key]).join(existing.select(key), on=key, how="left_anti")
