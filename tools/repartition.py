#!/usr/bin/env python3
"""Split each single-file test table into N part files so benchmark scans
parallelize like a real multi-file dataset (BASELINE.md "multi-file
variant"). Preserves the parquet schema byte-for-byte (pyarrow read/write,
no Spark type coercion).

Usage: python3 tools/repartition.py SRC_DIR DST_DIR [N]
"""
import math
import pathlib
import sys

import pyarrow.parquet as pq

src, dst = pathlib.Path(sys.argv[1]), pathlib.Path(sys.argv[2])
n = int(sys.argv[3]) if len(sys.argv) > 3 else 8

for table_file in sorted(src.glob("*.parquet")):
    t = pq.read_table(table_file)
    out_dir = dst / table_file.name
    out_dir.mkdir(parents=True, exist_ok=True)
    rows = t.num_rows
    chunk = max(1, math.ceil(rows / n))
    parts = 0
    for i in range(0, rows, chunk):
        pq.write_table(t.slice(i, chunk), out_dir / f"part-{parts:05d}.parquet")
        parts += 1
    print(f"{table_file.name}: {rows} rows -> {parts} files")
