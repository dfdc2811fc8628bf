"""Custom connector via Spark 4's Python DataSource API — the engine's
answer to the reference's Google Drive connector (S4/S5,
/root/reference/airflow/include/google_drive_download.py:62-147):
list a folder with name-prefix + MIME filtering and paginate; download
file content in chunks.

Where the reference drives a remote API from the Airflow worker
(driver-side, serial), this is a REAL Spark data source: the listing
happens once at planning time, rows are served by EXECUTORS in
page-sized partitions (the `page_size=100` pagination of
google_drive_download.py:66 becomes the partition boundary — each page
is a parallel task), and content reads happen inside the partition
reader in bounded chunks (the chunked download of :125-147). Swapping
the `os`-based listing for a Drive/S3/HTTP client changes only the two
helper functions, not the Spark integration.

Usage::

    spark.dataSource.register(FileListingDataSource)
    df = (spark.read.format("file_listing")
          .option("path", "/landing/dir")
          .option("prefix", "loan_")
          .option("mime", "text/csv")        # extension-mapped
          .option("page_size", "100")
          .option("with_content", "true")    # S5: chunked payload read
          .load())
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_EXT_MIME = {
    ".csv": "text/csv",
    ".json": "application/json",
    ".parquet": "application/vnd.apache.parquet",
    ".txt": "text/plain",
    ".gz": "application/gzip",
}

_CHUNK = 1 << 20  # 1 MiB chunked read, google_drive_download.py:138-143


def _mime_of(name: str) -> str:
    return _EXT_MIME.get(os.path.splitext(name)[1].lower(), "application/octet-stream")


class _Page(InputPartition):
    def __init__(self, paths: list[str]):
        self.paths = paths


class FileListingDataSource(DataSource):
    """Listing + optional chunked content read over a directory."""

    @classmethod
    def name(cls) -> str:
        return "file_listing"

    def schema(self) -> str:
        base = (
            "path string, name string, size bigint, modified double, "
            "mime string"
        )
        if self.options.get("with_content", "false").lower() == "true":
            base += ", content binary"
        return base

    def reader(self, schema) -> DataSourceReader:
        return _ListingReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _ListingStreamReader(self.options)


class _ListingReader(DataSourceReader):
    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("file_listing source requires option 'path'")
        self.prefix = options.get("prefix", "")
        self.mime = options.get("mime")
        self.page_size = int(options.get("page_size", "100"))
        self.with_content = (
            options.get("with_content", "false").lower() == "true"
        )

    def partitions(self) -> list[_Page]:
        # Planning-time listing with the PUSHED-DOWN predicates (the
        # reference pushes prefix/MIME into the Drive query string,
        # google_drive_download.py:84-97); each page of results becomes
        # one input partition -> one parallel task.
        names = sorted(
            n
            for n in os.listdir(self.root)
            if n.startswith(self.prefix)
            and (self.mime is None or _mime_of(n) == self.mime)
            and os.path.isfile(os.path.join(self.root, n))
        )
        pages = [
            names[i : i + self.page_size]
            for i in range(0, len(names), self.page_size)
        ] or [[]]
        return [_Page([os.path.join(self.root, n) for n in p]) for p in pages]

    def read(self, partition: _Page):
        for path in partition.paths:
            st = os.stat(path)
            row = [
                path,
                os.path.basename(path),
                st.st_size,
                st.st_mtime,
                _mime_of(path),
            ]
            if self.with_content:
                chunks = []
                with open(path, "rb") as f:
                    while True:
                        c = f.read(_CHUNK)
                        if not c:
                            break
                        chunks.append(c)
                row.append(b"".join(chunks))
            yield tuple(row)


class _ListingStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant: the reference's minute-cadence polling loop
    (drive_auto_compress_email.py:582, ledger :85-111) as a REAL
    Structured Streaming source. The offset is an (mtime, name)
    watermark persisted in the CHECKPOINT — Spark's offset log IS the
    processed-file ledger, so exactly-once needs no side JSON file.
    Each micro-batch serves files strictly after the previous offset in
    (mtime, name) order; the settle delay (MIN_FILE_AGE_SECONDS,
    :227-236) holds back files still being written."""

    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("file_listing source requires option 'path'")
        self.prefix = options.get("prefix", "")
        self.mime = options.get("mime")
        self.with_content = (
            options.get("with_content", "false").lower() == "true"
        )
        self.settle_seconds = float(options.get("settle_seconds", "0"))

    def initialOffset(self) -> dict:
        return {"mtime": 0.0, "name": ""}

    def _eligible(self):
        import time as _t

        now = _t.time()
        out = []
        for n in os.listdir(self.root):
            p = os.path.join(self.root, n)
            if not n.startswith(self.prefix) or not os.path.isfile(p):
                continue
            if self.mime is not None and _mime_of(n) != self.mime:
                continue
            st = os.stat(p)
            if now - st.st_mtime < self.settle_seconds:
                continue
            out.append((st.st_mtime, n, p, st.st_size))
        return sorted(out)

    def read(self, start: dict):
        rows = []
        hi_m, hi_n = start["mtime"], start["name"]
        for mtime, name, path, size in self._eligible():
            if (mtime, name) <= (hi_m, hi_n):
                continue
            row = [path, name, size, mtime, _mime_of(name)]
            if self.with_content:
                with open(path, "rb") as f:
                    row.append(f.read())
            rows.append(tuple(row))
            hi_m, hi_n = mtime, name
        return iter(rows), {"mtime": hi_m, "name": hi_n}

    def readBetweenOffsets(self, start: dict, end: dict):
        # Replay path after a restart: deterministic re-list bounded by
        # the two offsets.
        rows, _ = self.read(start)
        e = (end["mtime"], end["name"])
        return iter(
            r for r in rows if (r[3], r[1]) <= e
        )

    def commit(self, end: dict) -> None:
        pass
