"""Python Data Source connector for the reference's whitespace-CSV
format (Spark 4 ``pyspark.sql.datasource`` API).

``sources/ingest.read_whitespace_csv`` reads this format through
``spark.read.text`` + JVM regex splitting — the fast path. THIS
module is the connector form of the same contract: a registered
``wscsv`` format usable as ``spark.read.format("wscsv")``, which is
what "add a source the engine doesn't ship" looks like on Spark 4 —
no JVM code, executor-side Python readers, one input partition per
file so a directory of shards scans in parallel.

Differences from the text-scan path (both pinned by
tests/test_pyds.py):

- per-file headers may order columns DIFFERENTLY — the connector
  maps each file's tokens to the schema by (lowercased) name, where
  the text-scan path refuses mixed headers outright (it cannot know
  which line came from which file after the union);
- rows materialize in executor Python, so the JVM path remains the
  100 TB hot path; the connector is the extensibility story (and
  the right template for sources with no JVM reader at all —
  bespoke binary logs, internal APIs, instrument captures).

Semantics shared with read_whitespace_csv: lowercased header names,
regex-whitespace delimiters, blank lines dropped, DateType fields
parsed from ``date_format`` (default yyyyMMdd), other fields cast
to the schema type, malformed numerics -> NULL (PERMISSIVE).
"""

from __future__ import annotations

import glob
import os
from datetime import datetime
from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

_FORMAT_NAME = "wscsv"


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        out = [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if not f.startswith((".", "_"))
        ]
    else:
        out = sorted(glob.glob(path)) or [path]
    return [f for f in out if os.path.isfile(f)]


_NA = "NA"
_BOOL_TRUE = ("1", "true", "t", "yes")
_BOOL_FALSE = ("0", "false", "f", "no")


def _parse_cell(raw: str, dtype: T.DataType, date_format: str):
    if raw == "":
        return None
    # the writer's NULL sentinel: NULL for every non-string type
    # (strings may legitimately BE the text "NA", and the writer
    # refuses NULL strings, so no ambiguity)
    if raw == _NA and not isinstance(dtype, T.StringType):
        return None
    try:
        if isinstance(dtype, T.DateType):
            return datetime.strptime(raw, date_format).date()
        if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType)):
            return int(raw)
        if isinstance(dtype, (T.DoubleType, T.FloatType)):
            return float(raw)
        if isinstance(dtype, T.BooleanType):
            # strict: unknown tokens are malformed -> NULL, never a
            # silent False
            low = raw.lower()
            if low in _BOOL_TRUE:
                return True
            if low in _BOOL_FALSE:
                return False
            return None
    except ValueError:
        return None  # PERMISSIVE: malformed cell -> NULL
    return raw


class _FilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class WhitespaceCSVReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wscsv: 'path' option is required")
        # strptime directive form of the ingest default yyyyMMdd
        self.date_format = options.get("dateformat", "%Y%m%d")

    def partitions(self):
        files = _list_files(self.path)
        if not files:
            raise FileNotFoundError(f"wscsv: no input files under {self.path!r}")
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        by_name = {f.name.lower(): f for f in self.schema.fields}
        out_names = [f.name for f in self.schema.fields]
        with open(partition.file_path, "r", encoding="utf-8") as fh:
            header = None
            for line in fh:
                toks = line.strip().split()
                if not toks:
                    continue
                if header is None:
                    header = [t.lower() for t in toks]
                    unknown = [n for n in header if n not in by_name]
                    if unknown:
                        raise ValueError(
                            f"wscsv: header columns {unknown} of "
                            f"{partition.file_path!r} not in schema"
                        )
                    continue
                cells = dict(zip(header, toks))
                yield tuple(
                    _parse_cell(
                        cells.get(n.lower(), ""),
                        by_name[n.lower()].dataType,
                        self.date_format,
                    )
                    for n in out_names
                )


class WhitespaceCSVDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return _FORMAT_NAME

    def schema(self):
        raise ValueError(
            "wscsv: pass an explicit schema via spark.read.schema(...) — "
            "whitespace CSV carries no type information to infer from"
        )

    def reader(self, schema: T.StructType) -> WhitespaceCSVReader:
        return WhitespaceCSVReader(schema, self.options)

    def writer(self, schema: T.StructType, overwrite: bool):
        return WhitespaceCSVWriter(schema, self.options, overwrite)


def register(spark) -> None:
    """Idempotently register the ``wscsv`` format on a session."""
    spark.dataSource.register(WhitespaceCSVDataSource)


# --- writer ----------------------------------------------------------
#
# The write half of the connector: each partition writes one
# header-ful whitespace file under a dot-prefixed TEMP name; commit()
# renames the files its messages reference to their final visible
# names, sweeps unreferenced temps, and publishes a _SUCCESS marker;
# abort() removes the temp files (the task-temp + driver-commit
# shape of a real FileCommitProtocol, collapsed to the
# single-filesystem case — object-store deployments swap in a
# manifest commit). Nulls in numeric/date cells round-trip as the
# literal ``NA`` (the PERMISSIVE reader parses it back to NULL);
# strings cannot hold whitespace or represent NULL in this format,
# so the writer REFUSES them loudly instead of corrupting columns.

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)

@dataclass
class _FileCommit(WriterCommitMessage):
    file_path: str
    rows: int


def _format_cell(v, dtype: T.DataType, date_format: str) -> str:
    if v is None:
        if isinstance(dtype, T.StringType):
            raise ValueError(
                "wscsv cannot represent NULL strings — filter or fill first"
            )
        return _NA
    if isinstance(dtype, T.DateType):
        return v.strftime(date_format)
    s = str(v)
    if any(ch.isspace() for ch in s):
        raise ValueError(
            f"wscsv cell {s!r} contains whitespace — the format cannot "
            "hold it; clean the column first"
        )
    return s


class WhitespaceCSVWriter(DataSourceWriter):
    def __init__(self, schema: T.StructType, options: dict, overwrite: bool):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wscsv: 'path' option is required")
        self.date_format = options.get("dateformat", "%Y%m%d")
        self.overwrite = overwrite
        # per-JOB id, minted on the driver and serialized into every
        # task: commit() may only sweep temps carrying its own job id
        # — a concurrent append job's in-flight temps are not ours to
        # delete (its commit would hit a missing file / redo work)
        import uuid

        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _FileCommit:
        import uuid

        os.makedirs(self.path, exist_ok=True)
        # task-temp + driver-commit: tasks write DOT-PREFIXED temp
        # files (readers' _list_files skips . and _ names), commit()
        # renames the ones its messages reference. A failed or
        # speculative attempt's file therefore never becomes visible
        # — in either mode — it just lingers as a temp until this
        # job's commit sweeps its own stale temps.
        stem = f"part-{self.job_id}-{uuid.uuid4().hex}.txt"
        fname = os.path.join(self.path, f".{stem}.tmp")
        names = [f.name for f in self.schema.fields]
        dtypes = [f.dataType for f in self.schema.fields]
        n = 0
        with open(fname, "w", encoding="utf-8") as fh:
            fh.write(" ".join(c.upper() for c in names) + "\n")
            for row in iterator:
                fh.write(
                    " ".join(
                        _format_cell(row[i], dtypes[i], self.date_format)
                        for i in range(len(names))
                    )
                    + "\n"
                )
                n += 1
        return _FileCommit(file_path=fname, rows=n)

    def commit(self, messages) -> None:
        # publish = rename temp -> final (same filesystem, atomic);
        # only files named by a commit message ever become visible,
        # so a dead task attempt can't leak a partial/duplicate file
        # into append-mode reads
        published = set()
        for m in messages:
            if m is None:
                continue
            base = os.path.basename(m.file_path)
            final = base[1:-4]  # strip leading "." and trailing ".tmp"
            os.replace(m.file_path, os.path.join(self.path, final))
            published.add(final)
        for f in os.listdir(self.path):
            full = os.path.join(self.path, f)
            if f.endswith(".tmp") and (
                f.startswith(f".part-{self.job_id}-")
                or (self.overwrite and f.startswith(".part-"))
            ):
                # unreferenced temp from THIS job's failed/speculative
                # attempt; append mode leaves other jobs' temps for
                # their own commit (concurrent appends are legal),
                # while overwrite — which asserts exclusive ownership
                # of the directory — also reclaims temps orphaned by
                # crashed earlier jobs
                os.remove(full)
            elif self.overwrite and (
                (f.endswith(".txt") and f not in published) or f == "_SUCCESS"
            ):
                # old files are deleted only HERE, after every new
                # file is published: a failed overwrite job aborts
                # with the previous dataset intact (new part names
                # are unique, so old and new never collide)
                os.remove(full)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(f"{sum(m.rows for m in messages if m)}\n")

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.file_path):
                os.remove(m.file_path)
