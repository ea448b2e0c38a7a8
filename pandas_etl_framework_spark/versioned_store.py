"""VersionedStore: atomic, time-travelable parquet store — the Delta-style
sink (SURVEY.md §7 phase 4) without an external table format.

Plain ``df.write.parquet(path, mode=...)`` is not atomic to readers: a
failed overwrite leaves a half-written directory, and a concurrent reader
of an append sees a torn file listing. This store separates DATA from
VISIBILITY:

- every write lands in a fresh immutable directory ``data/v{N}/``;
- a version becomes visible only when its manifest ``_manifest/v{N}.json``
  appears, written via temp-file + rename (atomic on POSIX/HDFS);
- a manifest lists ALL data directories composing that version — an append
  is the previous list plus one dir (no data rewrite), an overwrite is a
  fresh single-dir list;
- readers resolve the latest manifest and read exactly its directories:
  crashes before the rename are invisible, and old versions stay readable
  (time travel) until explicitly vacuumed.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class VersionedStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._manifest_dir = os.path.join(path, "_manifest")
        self._data_dir = os.path.join(path, "data")

    # -- manifest plumbing -------------------------------------------------

    def versions(self) -> list[int]:
        if not os.path.isdir(self._manifest_dir):
            return []
        out = []
        for name in os.listdir(self._manifest_dir):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._manifest_dir, f"v{version:010d}.json")) as fh:
            return json.load(fh)

    def _commit(self, version: int, data_dirs: list[str], operation: str) -> None:
        os.makedirs(self._manifest_dir, exist_ok=True)
        payload = json.dumps(
            {"version": version, "data_dirs": data_dirs, "operation": operation}
        )
        fd, tmp = tempfile.mkstemp(dir=self._manifest_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)
        # rename is the atomic visibility switch
        os.rename(tmp, os.path.join(self._manifest_dir, f"v{version:010d}.json"))

    # -- writes ------------------------------------------------------------

    def write(self, df: DataFrame, mode: str = "append") -> int:
        """Commit a new version; returns its number. ``overwrite`` replaces
        the visible content, ``append`` adds to it — both without touching
        any previously committed data file."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unsupported mode: {mode}")
        latest = self.latest_version()
        version = 0 if latest is None else latest + 1
        new_dir = os.path.join(self._data_dir, f"v{version:010d}")
        df.write.parquet(new_dir)
        if mode == "append" and latest is not None:
            dirs = self._manifest(latest)["data_dirs"] + [new_dir]
        else:
            dirs = [new_dir]
        self._commit(version, dirs, mode)
        return version

    # -- reads -------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame | None:
        """Latest committed state, or any historical version (time travel)."""
        if version is None:
            version = self.latest_version()
            if version is None:
                return None
        manifest = self._manifest(version)
        return self.spark.read.parquet(*manifest["data_dirs"])

    # -- maintenance -------------------------------------------------------

    def vacuum(self, keep_latest: int = 1) -> list[int]:
        """Drop manifests (and data dirs referenced by no surviving version)
        older than the ``keep_latest`` most recent. Returns removed versions."""
        import shutil

        vs = self.versions()
        doomed = vs[:-keep_latest] if keep_latest > 0 else vs
        survivors = vs[-keep_latest:] if keep_latest > 0 else []
        still_referenced: set[str] = set()
        for v in survivors:
            still_referenced.update(self._manifest(v)["data_dirs"])
        for v in doomed:
            for d in self._manifest(v)["data_dirs"]:
                if d not in still_referenced and os.path.isdir(d):
                    shutil.rmtree(d)
            os.remove(os.path.join(self._manifest_dir, f"v{v:010d}.json"))
        return doomed
