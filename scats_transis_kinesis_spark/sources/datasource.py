"""``format("transis_xml")`` — the reference's push-stream source as a
first-class Spark data source (Python DataSource API, Spark 4).

The reference consumes a long-lived HTTP stream, accumulates bytes, and
splits records on the NUL byte (transis_consumer.py:115-151, delimiter
split :123-139; batch variant :82-89).  This module gives that protocol
a native Spark surface instead of a driver-side loop:

- **batch**: ``spark.read.format("transis_xml").load(dir)`` — one input
  partition PER FILE, so a directory of captured stream dumps scans in
  parallel across executors; each task streams its file and splits on
  ``\\x00`` exactly like the reference's tokenizer.
- **streaming**: ``spark.readStream.format("transis_xml").load(dir)`` —
  a file-arrival offset log (sorted directory listing), so each
  micro-batch picks up newly landed stream captures; offsets make
  replay deterministic (``readBetweenOffsets``), which is the
  checkpoint-recovery story the reference's recursive reconnect loop
  (transis_consumer.py:141-148) lacks.

Rows are ``value: string`` — one XML document per row, undecoded.
Parsing stays in ``sources/xml.py`` (S3), so the source composes with
the existing pipeline operators unchanged.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType

RECORD_DELIMITER = b"\x00"  # reference: transis_consumer.py:133

SCHEMA = StructType([StructField("value", StringType(), True)])


def _split_file(path: str) -> Iterator[tuple[str]]:
    """Split one capture file into documents on the NUL delimiter,
    dropping empty fragments (reference keeps the same guard,
    transis_consumer.py:137-138)."""
    with open(path, "rb") as f:
        data = f.read()
    for doc in data.split(RECORD_DELIMITER):
        if doc:
            yield (doc.decode("utf-8"),)


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _list_captures(path: str) -> list[str]:
    """Deterministic capture listing: every regular file under ``path``
    (or the single file itself), sorted by name."""
    if os.path.isdir(path):
        return sorted(
            p
            for p in glob.glob(os.path.join(path, "*"))
            if os.path.isfile(p)
        )
    return sorted(glob.glob(path))


class TransisXMLBatchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("transis_xml: .load(path) is required")

    def partitions(self) -> list[InputPartition]:
        # One split per capture file: parallelism == number of files,
        # the natural unit for dumped stream segments.
        return [_FilePartition(p) for p in _list_captures(self.path)]

    def read(self, partition: _FilePartition) -> Iterator[tuple[str]]:
        yield from _split_file(partition.path)


class TransisXMLStreamReader(SimpleDataSourceStreamReader):
    """File-arrival streaming: the offset is the count of consumed
    files from the sorted capture listing.  New files land at the end
    of the listing (writers name captures monotonically — e.g.
    zero-padded sequence numbers or timestamps), so ``read`` consumes
    the suffix and advances the offset."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("transis_xml: .load(path) is required")
        # Backpressure: cap how many newly landed captures one
        # micro-batch consumes (same contract as the file source's
        # maxFilesPerTrigger).  Unset = consume everything available,
        # the reference's drain-the-stream behavior.
        max_files = options.get("maxfilespertrigger") or options.get(
            "maxFilesPerTrigger"
        )
        self.max_files = int(max_files) if max_files else None
        if self.max_files is not None and self.max_files < 1:
            raise ValueError("transis_xml: maxFilesPerTrigger must be >= 1")

    def initialOffset(self) -> dict:
        return {"n_files": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple[str]], dict]:
        files = _list_captures(self.path)
        consumed = start["n_files"]
        new = files[consumed:]
        if self.max_files is not None:
            new = new[: self.max_files]
        rows = [row for p in new for row in _split_file(p)]
        return iter(rows), {"n_files": consumed + len(new)}

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[tuple[str]]:
        # Deterministic replay for checkpoint recovery: re-split the
        # exact file range [start, end).
        files = _list_captures(self.path)[start["n_files"] : end["n_files"]]
        for p in files:
            yield from _split_file(p)


class TransisXMLDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "transis_xml"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> TransisXMLBatchReader:
        return TransisXMLBatchReader(self.options)

    def simpleStreamReader(
        self, schema: StructType
    ) -> TransisXMLStreamReader:
        return TransisXMLStreamReader(self.options)


def register_transis_datasource(spark) -> None:
    """Idempotently register ``format("transis_xml")`` on a session."""
    spark.dataSource.register(TransisXMLDataSource)
