"""Round-7 additions: adversarial cross-engine parity for the quarantine
monitor, plus regression pins for this round's verdict/advice fixes."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle_compare import compare_frames


def test_v4_quarantine_adversarial_payload_parity(spark, tmp_path):
    """Round-6 ADVICE: the v4 oracle only agreed with Spark because the
    fixture props were all non-null well-typed objects. The pinned
    semantics — quarantined = payload present, non-blank, and not a
    parseable JSON OBJECT — must now hold on every adversarial shape:
    NULL props, empty/whitespace payloads, type-drifted k (string),
    missing k, JSON arrays, JSON scalars, and truly corrupt documents."""
    from snowflake_to_postgres_spark.operators.breadth import (
        V4_QUARANTINE_ORACLE,
        v4_quarantine_stats,
    )

    rows = [
        # (event_id, event_type, props) — ids chosen so none hits the
        # %8==0 injected-corruption slice; the payloads themselves are
        # the adversarial part.
        (1, "a", '{"k": 1}'),           # well-typed object → clean
        (2, "a", '{"k": "drift"}'),     # type-drifted k → clean (both engines)
        (3, "a", '{"other": 3}'),       # missing k → clean
        (5, "b", "[1, 2]"),             # valid JSON, not an object → quarantined
        (6, "b", "42"),                 # valid JSON scalar → quarantined
        (7, "b", "{not json"),          # corrupt → quarantined
        (9, "c", None),                 # NULL payload → clean (null document)
        (10, "c", ""),                  # empty → clean (null document)
        (11, "c", "   "),               # whitespace → clean (null document)
        (8, "c", '{"k": 9}'),           # %8==0 → prefix-injected → quarantined
    ]
    df = spark.createDataFrame(rows, "event_id bigint, event_type string, props string")
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/events.parquet")

    got = v4_quarantine_stats(spark, sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet/*.parquet')"
    )
    ok, msg = compare_frames(got, con.execute(V4_QUARANTINE_ORACLE))
    assert ok, msg
    counts = {r["event_type"]: (r["n_quarantined"], r["n_clean"]) for r in got.collect()}
    assert counts == {"a": (0, 3), "b": (3, 0), "c": (1, 3)}


def test_quarantine_split_good_rows_carry_typed_columns(spark):
    """Round-6 ADVICE: the docstring promised 'clean rows continue with
    typed columns' but the good branch dropped the parsed struct. The
    projected fields must now be top-level, typed, and NULL for a NULL
    payload."""
    from snowflake_to_postgres_spark.streaming.pipeline import quarantine_split

    df = spark.createDataFrame(
        [
            (1, None, 10, '{"k": 7, "tag": "x"}'),
            (2, None, 11, "{broken"),
            (3, None, 12, None),
        ],
        "event_id bigint, ts timestamp, user_id bigint, props string",
    )
    good, bad = quarantine_split(df)
    assert "k" in good.columns and "tag" in good.columns
    assert dict(good.dtypes)["k"] == "bigint"
    rows = {r["event_id"]: (r["k"], r["tag"]) for r in good.collect()}
    assert rows == {1: (7, "x"), 3: (None, None)}
    assert [r["event_id"] for r in bad.collect()] == [2]
