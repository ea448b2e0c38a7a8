"""Spark 4 Python Data Source for the VersionedStore.

Exposes the manifest-committed store through the standard reader API —
``spark.read.format("versioned_store").option("path", p).load()`` — with
time travel via ``.option("version", N)``, so any Spark consumer (SQL,
other libraries) can read committed-only state without knowing the
manifest protocol.

Parallelism: one InputPartition per parquet FILE of the resolved manifest;
each partition yields Arrow record batches (zero row-by-row Python cost).
The manifest resolution runs on the driver; workers only see file paths.

Register once per session:
    spark.dataSource.register(VersionedStoreDataSource)
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _manifest_for(path: str, version: int | None) -> dict:
    mdir = os.path.join(path, "_manifest")
    if version is None:
        names = [
            n for n in os.listdir(mdir)
            if n.startswith("v") and n.endswith(".json")
        ]
        if not names:
            raise ValueError(f"no committed versions under {path}")
        version = max(int(n[1:-5]) for n in names)
    with open(os.path.join(mdir, f"v{version:010d}.json")) as fh:
        return json.load(fh)


def _files_for(path: str, version: int | None) -> list[str]:
    files: list[str] = []
    for d in _manifest_for(path, version)["data_dirs"]:
        files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    return files


class VersionedStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "versioned_store"

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import StructType

        version = int(self.options["version"]) if "version" in self.options else None
        manifest = _manifest_for(self.options["path"], version)
        if manifest.get("schema"):
            # the committed schema — authoritative after schema evolution
            return StructType.fromJson(manifest["schema"])
        files = _files_for(self.options["path"], version)
        if not files:
            raise ValueError("resolved version has no data files")
        return from_arrow_schema(pq.ParquetFile(files[0]).schema_arrow)

    def reader(self, schema) -> "VersionedStoreReader":
        return VersionedStoreReader(self.options, schema)


class VersionedStoreReader(DataSourceReader):
    def __init__(self, options, schema):
        from pyspark.sql.pandas.types import to_arrow_schema

        self._files = _files_for(
            options["path"],
            int(options["version"]) if "version" in options else None,
        )
        # files written before a schema evolution lack the newer columns;
        # every batch is padded/projected to the resolved read schema
        self._arrow_schema = to_arrow_schema(schema)

    def partitions(self):
        return [InputPartition(f) for f in self._files]

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        target = self._arrow_schema
        for batch in pq.ParquetFile(partition.value).iter_batches():
            if batch.schema == target:
                yield batch
                continue
            cols = []
            for field in target:
                idx = batch.schema.get_field_index(field.name)
                if idx >= 0:
                    col = batch.column(idx)
                    cols.append(
                        col.cast(field.type) if col.type != field.type else col
                    )
                else:
                    cols.append(pa.nulls(batch.num_rows, field.type))
            yield pa.RecordBatch.from_arrays(cols, schema=target)
