"""Custom Python Data Source (Spark 4 DataSource API): a deterministic
synthetic job-listings source.

The reference's only "source" is imperative HTML scraping
(glassdoor-scraper/src/main.py:161-192) — single process, page loop. The
DataSource API is the Spark-native way to wrap such an external feed:
the engine plans PARTITIONS (here: listing-id ranges; in a real scraper:
page ranges or URL shards), executors pull their partition independently,
and the result is a first-class DataFrame with schema, pushdown-ready
columns, and normal lineage. This implementation generates rows
deterministically from the listing id (no RNG, no network) so the
correctness gate can replay it exactly; swapping `_row` for an HTTP fetch
turns it into the distributed scraper without touching the plan.

Usage:
    spark.dataSource.register(JobListingsDataSource)
    spark.read.format("job_listings").option("n", 30).load()
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_TITLES = ("data engineer", "ml engineer", "analyst", "data scientist")
_LOCS = ("NY", "SF", "Remote")

LISTINGS_SCHEMA = StructType(
    [
        StructField("listing_id", IntegerType()),
        StructField("title", StringType()),
        StructField("location", StringType()),
        StructField("salary", DoubleType()),
        StructField("rating", DoubleType()),
    ]
)


def _row(i: int) -> tuple:
    # Deterministic content derived from the id — stands in for the
    # fetched/parsed listing payload.
    return (
        i,
        _TITLES[i % len(_TITLES)],
        _LOCS[i % len(_LOCS)],
        float(60000 + (i * 7919) % 60000),
        round(2.0 + (i % 30) / 10.0, 1),
    )


class _ListingsPartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start, self.end = start, end


class _ListingsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 30))
        self.num_partitions = int(options.get("numPartitions", 4))

    def partitions(self):
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _ListingsPartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _ListingsPartition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class JobListingsDataSource(DataSource):
    """format name: ``job_listings``"""

    @classmethod
    def name(cls) -> str:
        return "job_listings"

    def schema(self) -> StructType:
        return LISTINGS_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _ListingsReader(self.options)


# ---------------------------------------------------------------------------
# Writer side: a JSONL directory sink with per-task files and a driver-side
# commit manifest — the DataSource-API analogue of the reference's
# row-loop DynamoDB put (data_populator/populator.py:47-58): executors
# write their partition independently, the driver commits once, and an
# aborted job leaves no manifest (readers treat the dir as unpublished).
# ---------------------------------------------------------------------------

import json as _json
import os as _os
import uuid as _uuid

from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class _JsonlCommit(WriterCommitMessage):
    filename: str
    n_rows: int


class _JsonlDirWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        _os.makedirs(self.path, exist_ok=True)
        name = f"part-{_uuid.uuid4().hex}.jsonl"
        n = 0
        with open(_os.path.join(self.path, name), "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _JsonlCommit(filename=name, n_rows=n)

    def commit(self, messages):
        """Publish the job: write _MANIFEST.json naming exactly the files of
        committed task attempts. The manifest IS the commit record — readers
        MUST read only manifest-listed files (orphan part files from failed
        or speculative attempts are uuid-named and never appear in a commit
        message, so a glob read would double-count them). Assumes a
        filesystem shared between driver and executors (local mode / NFS /
        fuse mount); on a non-shared FS the manifest still names the right
        files but abort() below cannot reach them."""
        manifest = {
            "files": sorted(m.filename for m in messages if m is not None),
            "total_rows": sum(m.n_rows for m in messages if m is not None),
        }
        with open(_os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            _json.dump(manifest, fh)

    def abort(self, messages):
        """Best-effort cleanup of committed-task files via driver-local
        os.remove — only effective when the driver sees the same filesystem
        the executors wrote (local mode / shared mount). On a non-shared FS
        the orphans remain on executors, which is safe because readers go
        through the manifest (absent after abort ⇒ directory unpublished);
        cleanup there would belong to a storage-side GC, as with Spark's own
        uncommitted cloud-committer files."""
        for m in messages or []:
            if m is not None:
                try:
                    _os.remove(_os.path.join(self.path, m.filename))
                except OSError:
                    pass


class JsonlDirDataSource(DataSource):
    """format name: ``jsonl_dir`` (writer-only)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _JsonlDirWriter(self.options, overwrite)
