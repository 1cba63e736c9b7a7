"""Plain filesystem + callback sinks.

Reference:
- databuilder/loader/file_system_csv_loader.py:20-57 — stream records into
  ONE csv file, header from the first record's fields.
- databuilder/loader/generic_loader.py:25-53 — per-record user callback,
  falsy records skipped.

Spark shape: the single-file CSV is ``coalesce(1)`` + header write (the
reference holds one file handle, so one output file IS the contract —
callers wanting scale-out files use the default partitioned write or
sinks/compaction.write_sized). The callback loader is ``foreachPartition``
so the user function runs executor-side against an iterator, amortizing
any connection setup per partition instead of per record.
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import Any, Callable

from pyspark.sql import DataFrame


def write_single_csv(df: DataFrame, file_path: str) -> str:
    """Write ``df`` as exactly one headered CSV file at ``file_path``
    (reference: one csv.DictWriter over one handle, header from the first
    record — loader/file_system_csv_loader.py:40-46). Column order is the
    DataFrame schema order, as the reference's header is the first
    record's field order. Returns ``file_path``."""
    tmp_dir = file_path + "._spark_tmp"
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp_dir)
    part = glob.glob(os.path.join(tmp_dir, "part-*.csv"))[0]
    os.makedirs(os.path.dirname(file_path) or ".", exist_ok=True)
    shutil.move(part, file_path)
    shutil.rmtree(tmp_dir)
    return file_path


def generic_load(df: DataFrame, callback: Callable[[Any], None]) -> None:
    """Apply a user callback to every record (reference GenericLoader:
    load() calls the configured callback_function per record, skipping
    falsy records — loader/generic_loader.py:38-46). Runs executor-side
    via foreachPartition; the callback must be picklable."""
    def run(rows) -> None:
        for row in rows:
            if not row:
                continue
            callback(row)
    df.foreachPartition(run)
