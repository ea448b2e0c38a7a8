"""Delta Lake backend behind the store API (SURVEY.md §7 phase 4's named
end state; VERDICT r05 item 7).

``VersionedStore`` implements atomic visibility / time travel / CDF with
a self-contained manifest protocol because this sandbox has no
``delta-spark`` distribution. At production scale, users want the
STANDARD open table format instead of a bespoke manifest — this module
is that adapter: the same lifecycle surface (write / merge-upsert /
read / time travel / history) expressed over ``format("delta")``.

Environment contract: Delta needs both the ``delta-spark`` Python
package AND the Delta jars + Catalyst extensions
(``spark.sql.extensions = io.delta.sql.DeltaSparkSessionExtension``,
``spark.sql.catalog.spark_catalog = DeltaCatalog``) configured at
session build. ``delta_available()`` probes for the package;
every entry point raises a single clean ``RuntimeError`` naming the
missing pieces when it is absent, so callers can try/except one error
type. The lifecycle test (tests/test_delta_adapter.py) runs the same
scenario as the VersionedStore lifecycle test and SKIPS with the
recorded environment blocker when the distribution is missing —
documented in COVERAGE.md.

Design note: only thin translation lives here (Delta already provides
atomicity, time travel, and MERGE). The CDC/SCD2 semantics stay in
cdc.py / scd2.py and are format-agnostic: ``merge_upsert`` routes the
reference's merge_cdc (SCDHelpers.py:67-73) through Delta's native
``MERGE INTO`` so the upsert becomes a transactional file-level rewrite
instead of a full-store read-modify-write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    """True when the delta-spark Python package is importable. (The jars
    may still be missing from the session; ``_require_delta`` surfaces
    that as the same RuntimeError at first use.)"""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    return True


def _require_delta(spark: SparkSession):
    if not delta_available():
        raise RuntimeError(
            "Delta Lake backend unavailable: the 'delta-spark' package "
            "(and its jars + DeltaSparkSessionExtension session config) "
            "are not installed in this environment. Use VersionedStore "
            "for the self-contained manifest backend, or install "
            "delta-spark on the cluster."
        )
    from delta.tables import DeltaTable

    return DeltaTable


class DeltaStore:
    """Delta-backed twin of ``VersionedStore``'s lifecycle surface.

    Maps 1:1 onto the manifest store's API so the two are swappable
    behind the same call sites:

    ==================  =========================================
    VersionedStore       DeltaStore
    ==================  =========================================
    write(df, mode)      write(df, mode)            (transactional)
    merge(src, keys)     merge_upsert(src, keys)    (MERGE INTO)
    read(version=N)      read(version=N)            (time travel)
    versions()           versions()                 (DESCRIBE HISTORY)
    changes(since, to)   changes(since, to)         (CDF read)
    vacuum(keep)         vacuum(retention_hours)    (VACUUM)
    ==================  =========================================
    """

    _CDF_DEFAULT_KEY = (
        "spark.databricks.delta.properties.defaults.enableChangeDataFeed"
    )

    def __init__(self, spark: SparkSession, path: str):
        _require_delta(spark)
        self.spark = spark
        self.path = path

    # -- writes ------------------------------------------------------------

    def write(self, df: DataFrame, mode: str = "append") -> None:
        # VersionedStore's CDF is always-on; mirror that here or
        # ``changes()`` would fail on every table this adapter itself
        # creates. The session default is the create-time mechanism for
        # path-based tables, but it is session-global — scope it to this
        # write and restore the caller's value so unrelated Delta tables
        # created later in the session don't silently inherit CDF (and
        # its per-write change-file overhead).
        prev = self.spark.conf.get(self._CDF_DEFAULT_KEY, None)
        self.spark.conf.set(self._CDF_DEFAULT_KEY, "true")
        try:
            (
                df.write.format("delta")
                .mode(mode)
                # VersionedStore evolves schemas
                .option("mergeSchema", "true")
                .save(self.path)
            )
        finally:
            if prev is None:
                self.spark.conf.unset(self._CDF_DEFAULT_KEY)
            else:
                self.spark.conf.set(self._CDF_DEFAULT_KEY, prev)

    def merge_upsert(self, source: DataFrame, key_columns: list[str]) -> None:
        """merge_cdc as a native transactional MERGE (ref semantics
        SCDHelpers.py:67-73: delete-then-insert per key becomes
        whenMatched update + whenNotMatched insert).

        Contract (same as ``VersionedStore.merge``): ``source`` must have
        at most one row per key tuple — callers dedup first. A
        multi-row-per-key source makes the MERGE ambiguous and Delta
        fails it at runtime with its multiple-source-matches error.
        """
        DeltaTable = _require_delta(self.spark)
        target = DeltaTable.forPath(self.spark, self.path)
        cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in key_columns)
        (
            target.alias("t")
            .merge(source.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )

    # -- reads -------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        reader = self.spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version)
        return reader.load(self.path)

    def versions(self) -> list[int]:
        DeltaTable = _require_delta(self.spark)
        hist = DeltaTable.forPath(self.spark, self.path).history()
        return sorted(r["version"] for r in hist.select("version").collect())

    def changes(
        self, since_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Change data feed between versions (requires the table property
        ``delta.enableChangeDataFeed=true``, mirroring VersionedStore's
        always-on CDF)."""
        reader = (
            self.spark.read.format("delta")
            .option("readChangeFeed", "true")
            .option("startingVersion", since_version)
        )
        if to_version is not None:
            reader = reader.option("endingVersion", to_version)
        return reader.load(self.path)

    # -- maintenance -------------------------------------------------------

    def vacuum(self, retention_hours: float = 168.0) -> None:
        DeltaTable = _require_delta(self.spark)
        DeltaTable.forPath(self.spark, self.path).vacuum(retention_hours)
