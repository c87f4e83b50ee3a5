"""Scan-split estimation for the auto fan-out heuristics.

The fan-out decision ("is this scan already spread over >= cores tasks?")
needs the number of scan SPLITS, not the number of files: Spark bin-packs
many small files into one FilePartition (up to
spark.sql.files.maxPartitionBytes of size + openCostInBytes per file), so a
directory of 200 tiny files can scan as 2 tasks. Counting files would
overestimate splits and skip the balancing repartition exactly when it is
needed most (the round-2 advice finding on operators/extract.py).

estimate_scan_splits mirrors Spark's FilePartition packing arithmetic:
ceil(sum(max(bytes, openCost)) / maxSplitBytes) when file sizes are
resolvable (local files — the sandbox case), and falls back to the file
count (a best-effort upper bound) for remote filesystems where stat calls
from the driver would be a per-query penalty. Both callers only use the
estimate to decide whether to repartition UP to defaultParallelism, so an
overestimate degrades to the old behavior, never below it.
"""

from __future__ import annotations

import math
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

_MAX_FILES_TO_STAT = 4096


def _bytes_conf(spark, key: str, default: int) -> int:
    """Parse a Spark byte-size conf ('134217728', '134217728b', '128m')."""
    try:
        raw = str(spark.conf.get(key)).strip().lower()
    except Exception:
        return default
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("b", 1)):
        if raw.endswith(suffix):
            raw = raw[: -len(suffix)]
            mult = m
            break
    try:
        return int(float(raw)) * mult
    except ValueError:
        return default


def estimate_scan_splits(df: DataFrame) -> int:
    """Estimated scan-task count for df's file sources (0 = unknown/no files)."""
    try:
        files = df.inputFiles()
    except Exception:
        return 0
    n = len(files)
    if n == 0:
        return 0
    spark = df.sparkSession
    max_split = _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    if n > _MAX_FILES_TO_STAT:
        # thousands of files: stat cost isn't worth it and the answer is
        # always "plenty of splits" for the fan-out question
        return n
    padded = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("file", ""):
            return n  # remote fs: file count, documented upper bound
        try:
            size = os.path.getsize(unquote(parsed.path))
        except OSError:
            return n
        padded += max(size, open_cost)
    return max(1, math.ceil(padded / max(max_split, 1)))
