"""Postgres COPY sink via ``foreachPartition`` — the write-speed-parity
option for Postgres targets (SURVEY §4 'physical sink strategy choice').

Spark's JDBC writer uses batched INSERTs; Postgres's COPY protocol is
several times faster for bulk loads, which is why the reference built
its whole pipeline on it (data_transfer.py:210-382). Here COPY is a
*per-partition* sink: each executor task opens one connection and
streams its partition as CSV — N parallel COPYs instead of the
reference's one cursor per table.

``psycopg2`` is not present in this environment, so the connection path
is import-gated; the CSV serialization kernel (exactly the reference's
wire format: NULL as ``\\N``, NUL bytes stripped, data_transfer.py:
277-353) is pure Python and fully tested.
"""

from __future__ import annotations

import csv
import io
from collections.abc import Iterable

from pyspark.sql import DataFrame


def rows_to_copy_csv(rows: Iterable, null_marker: str = r"\N") -> str:
    """Serialize rows to COPY-ready CSV: NULL→marker, NUL bytes stripped
    (Postgres text can't hold \\x00), everything else csv-quoted."""
    buf = io.StringIO()
    writer = csv.writer(buf)
    for row in rows:
        out = []
        for v in row:
            if v is None:
                out.append(null_marker)
            elif isinstance(v, str):
                out.append(v.replace("\x00", ""))
            else:
                out.append(str(v))
        writer.writerow(out)
    return buf.getvalue()


def copy_sql(schema: str, table: str, columns: list[str], null_marker: str = r"\N") -> str:
    """The COPY statement (data_transfer.py:288-292's shape)."""
    cols = ", ".join(f'"{c}"' for c in columns)
    return (
        f'COPY "{schema}"."{table}" ({cols}) '
        f"FROM STDIN WITH (FORMAT csv, NULL '{null_marker}')"
    )


def write_via_copy(
    df: DataFrame,
    dsn: str,
    schema: str,
    table: str,
    batch_rows: int = 50_000,
    null_marker: str = r"\N",
) -> None:
    """Stream every partition to Postgres over COPY. Requires psycopg2
    on the executors; raises ImportError with guidance otherwise."""
    columns = df.columns
    sql = copy_sql(schema, table, columns, null_marker)

    def sink(rows_iter) -> None:
        try:
            import psycopg2  # noqa: PLC0415
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError(
                "write_via_copy needs psycopg2 on executors; use the JDBC "
                "writer (sources.jdbc.write_jdbc) where it is unavailable"
            ) from e
        conn = psycopg2.connect(dsn)
        try:
            cur = conn.cursor()
            batch: list = []
            for row in rows_iter:
                batch.append(row)
                if len(batch) >= batch_rows:
                    cur.copy_expert(sql, io.StringIO(rows_to_copy_csv(batch, null_marker)))
                    conn.commit()
                    batch = []
            if batch:
                cur.copy_expert(sql, io.StringIO(rows_to_copy_csv(batch, null_marker)))
                conn.commit()
        finally:
            conn.close()

    df.foreachPartition(sink)
