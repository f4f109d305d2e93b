"""Rewrite a fixture SF dir into a multi-file / multi-row-group layout
(round-13 verdict #1 — "next round: do this" item 1).

Every committed plan verdict so far (targeted repartitions, window
choices, AQE reliance, the round-13 scan-repartition negative A/B) was
measured against tables that are ONE parquet file with ONE row group —
the least representative layout possible for the stated 100-TB target,
where every table is thousands of files × many row groups and scans
parallelize natively. This tool makes the representative twin: each
``<table>.parquet`` FILE becomes a ``<table>.parquet`` DIRECTORY of
``part-NNNNN.parquet`` files (Spark reads both shapes identically via
``spark.read.parquet``), rows in the original order, split into
``files`` parts × ``row_groups`` row groups per part.

Row content, order-insensitive values, schema, and logical types are
byte-identical to the source (pyarrow slice + write, no engine
involvement), so any query result over the rewritten dir must equal
the single-split dir's — which lets the bench be re-run against it
and compared key-for-key (PERFORMANCE.md round-14 table).

Usage:
  python tools/make_multisplit.py [src_sf_dir] [dst_dir] [files] [row_groups]
defaults: /root/testdata/sf0.1 /tmp/sfm0.1 8 4   (8x4 = 32 splits,
matching the local[32] cluster width the bench runs at)
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def rewrite(src: str, dst: str, n_files: int, n_groups: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        src_path = os.path.join(src, f"{t}.parquet")
        table = pq.read_table(src_path)
        n = table.num_rows
        out_dir = os.path.join(dst, f"{t}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        # tiny dims (region: 5 rows) keep at least 1 row per part
        parts = min(n_files, max(1, n))
        per_file = (n + parts - 1) // parts
        written = 0
        for i in range(parts):
            chunk = table.slice(i * per_file, per_file)
            if chunk.num_rows == 0:
                break
            rg = max(1, (chunk.num_rows + n_groups - 1) // n_groups)
            pq.write_table(
                chunk,
                os.path.join(out_dir, f"part-{i:05d}.parquet"),
                row_group_size=rg,
                # keep the source's physical timestamp types (events.ts
                # is TIMESTAMP(NANOS) — the engine's normalize path
                # depends on reading the same logical type)
                coerce_timestamps=None,
                store_schema=True,
            )
            written += chunk.num_rows
        meta = pq.ParquetFile(
            os.path.join(out_dir, "part-00000.parquet")
        ).metadata
        print(
            f"{t}: {n} rows -> {parts} files x {meta.num_row_groups} "
            f"row groups (first file)"
        )
        assert written == n, (t, written, n)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfm0.1"
    files = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    groups = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    rewrite(src, dst, files, groups)
