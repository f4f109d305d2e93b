"""CLI verbs end-to-end through main() (the user-facing surface)."""

from __future__ import annotations

import json

from snowflake_to_postgres_spark.cli import main


def test_cli_migrate_roundtrip(tmp_path, capsys, sf_dir):
    rc = main([
        "migrate", "--source", sf_dir, "--target", str(tmp_path / "out"),
        "--table", "orders", "--workers", "1", "--pk", "o_orderkey",
        "--checkpoint", str(tmp_path / "ckpt.json"),
    ])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    roll = json.loads(out[0])
    assert roll["transferred"] == 1 and roll["errors"] == []
    report = json.loads("\n".join(out[1:]))
    assert report[0]["table"] == "orders" and report[0]["passed"]


def test_cli_destroy_confirm_gate(capsys):
    rc = main(["destroy", "--schema", "x", "--confirm", "WRONG"])
    assert rc == 2


def test_cli_build_dry_run(tmp_path, capsys, sf_dir):
    ddl_out = str(tmp_path / "schema.sql")
    rc = main([
        "build", "--source", sf_dir, "--schema", "tpch",
        "--dry-run", "--ddl-out", ddl_out,
    ])
    assert rc == 0
    text = open(ddl_out).read()
    assert "CREATE SCHEMA" in text and 'CREATE TABLE IF NOT EXISTS "tpch"."lineitem"' in text


def test_cli_discover_jdbc(tmp_path, capsys, spark):
    """discover --jdbc-url against a live (Derby) catalog: S2/S3/S4/S5
    from the CLI surface, constraints included in the JSON doc."""
    url = "jdbc:derby:memory:cli_discover_test"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE t1 (id INT NOT NULL, name VARCHAR(20), "
        "CONSTRAINT pk_t1 PRIMARY KEY (id))"
    )
    st.execute(
        "CREATE TABLE t2 (id INT NOT NULL, t1_id INT, "
        "CONSTRAINT pk_t2 PRIMARY KEY (id), "
        "CONSTRAINT fk_t2_t1 FOREIGN KEY (t1_id) REFERENCES t1 (id))"
    )
    st.execute("INSERT INTO t1 VALUES (1, 'a')")
    # live procedure: must surface in the discover JSON (discovery.py:389-441)
    st.execute(
        "CREATE PROCEDURE sync_t1(IN n INT) LANGUAGE JAVA "
        "PARAMETER STYLE JAVA EXTERNAL NAME 'com.example.Jobs.sync'"
    )
    st.close()
    conn.close()
    rc = main([
        "discover", "--jdbc-url", url, "--jdbc-dialect", "derby",
        "--jdbc-driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver",
        "--schema", "APP",
    ])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    tables = {t["name"]: t for t in doc["tables"]}
    assert set(tables) == {"t1", "t2"}
    assert tables["t1"]["primary_key"]["columns"] == ["id"]
    assert tables["t1"]["row_count"] == 1
    assert tables["t2"]["foreign_keys"][0]["referenced_table"] == "t1"
    assert tables["t2"]["foreign_keys"][0]["type"] == "FOREIGN KEY"
    # Derby's catalog keeps the backing Java class as the "definition"
    assert doc["procedures"] == [{"name": "sync_t1", "ddl": "com.example.Jobs"}]


def test_cli_discover_requires_a_source(capsys):
    rc = main(["discover", "--schema", "x"])
    assert rc == 2


def test_cli_build_views_failure_capture(tmp_path, capsys, spark):
    """build-views: good view created, bad view captured to
    failed_views.sql next to the input (sf_migrate.py:978-1004)."""
    views = tmp_path / "views.sql"
    views.write_text(
        "CREATE VIEW v_ok AS SELECT 1 AS one;\n"
        "CREATE VIEW v_bad AS SELECT FROM nowhere_at_all__;\n"
    )
    rc = main(["build-views", "--views", str(views), "--schema", "default"])
    assert rc == 1
    captured = (tmp_path / "failed_views.sql").read_text()
    assert "v_bad" in captured and "-- ERROR:" in captured
    assert "v_ok" not in captured
    assert spark.sql("SELECT * FROM v_ok").collect()[0]["one"] == 1
    spark.sql("DROP VIEW IF EXISTS v_ok")


def test_cli_build_views_emits_procedure_stubs(tmp_path, capsys, spark):
    """A CREATE PROCEDURE statement in the input never executes — it
    becomes a manual-TODO stub in procedure_stubs.sql next to the input
    (F19 / view_procedure_translator.py:343-383 policy), while views in
    the same file still build."""
    views = tmp_path / "mixed.sql"
    views.write_text(
        "CREATE VIEW v_p_ok AS SELECT 2 AS two;\n"
        "CREATE PROCEDURE refresh_all(IN d INT)\n"
        "  LANGUAGE JAVA PARAMETER STYLE JAVA\n"
        "  EXTERNAL NAME 'com.example.DeptJobs.refresh';\n"
    )
    rc = main(["build-views", "--views", str(views), "--schema", "default"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "emitted procedure stub refresh_all" in out
    stub_text = (tmp_path / "procedure_stubs.sql").read_text()
    assert "PROCEDURE refresh_all: requires manual translation" in stub_text
    assert "com.example.DeptJobs.refresh" in stub_text
    assert spark.sql("SELECT * FROM v_p_ok").collect()[0]["two"] == 2
    spark.sql("DROP VIEW IF EXISTS v_p_ok")


def test_cli_migrate_to_jdbc_database(tmp_path, capsys, spark, sf_dir):
    """The reference's actual shape — migrate into a live DATABASE:
    parquet source → JDBC sink (Derby) → validate reads the target back
    over JDBC and runs the 5-layer validator."""
    url = "jdbc:derby:memory:cli_migrate_jdbc"
    jvm = spark._jvm
    jvm.java.sql.DriverManager.getConnection(url + ";create=true").close()
    common = [
        "--source", sf_dir, "--target", "unused",
        "--table", "nation", "--workers", "1",
        "--target-jdbc-url", url,
        "--jdbc-driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver",
    ]
    rc = main(["migrate", *common, "--pk", "n_nationkey"])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    roll = json.loads(out[0])
    assert roll["transferred"] == 1 and roll["errors"] == []
    report = json.loads("\n".join(out[1:]))
    assert report[0]["table"] == "nation" and report[0]["passed"]


def test_cli_validate_fails_on_corruption(tmp_path, capsys, spark, sf_dir):
    """validate must exit 1 when the target is corrupted (dropped rows)."""
    import pyspark.sql.functions as F

    from snowflake_to_postgres_spark.sources import load_table

    tgt = str(tmp_path / "out" / "orders")
    load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 != 0).write.parquet(tgt)
    rc = main([
        "validate", "--source", sf_dir, "--target", str(tmp_path / "out"),
        "--table", "orders", "--pk", "o_orderkey",
    ])
    assert rc == 1
    report = json.loads(capsys.readouterr().out)
    assert not report[0]["passed"]


def test_cli_merge_upsert(tmp_path, capsys, spark, sf_dir):
    """merge verb: partition-scoped upsert end-to-end from the CLI."""
    import pyspark.sql.functions as F

    from snowflake_to_postgres_spark.operators.transfer import transfer_partitioned
    from snowflake_to_postgres_spark.sources import table_path

    tgt = str(tmp_path / "orders_pt")
    transfer_partitioned(spark, table_path(sf_dir, "orders"), tgt, "o_orderdate")
    before = spark.read.parquet(tgt)
    n_before = before.count()
    upd_dir = str(tmp_path / "updates")
    (
        before.orderBy("o_orderkey").limit(3)
        .withColumn("o_totalprice", F.lit(12345.0))
        .write.parquet(upd_dir)
    )
    rc = main([
        "merge", "--target", tgt, "--updates", upd_dir, "--keys", "o_orderkey",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["table"] == "merge_upsert" and out["rows"] > 0
    after = spark.read.parquet(tgt)
    assert after.count() == n_before
    assert after.filter(F.col("o_totalprice") == 12345.0).count() == 3


def test_cli_clean_corpus(tmp_path, capsys, sf_dir, spark):
    out_dir = str(tmp_path / "corpus")
    rc = main(["clean-corpus", "--source", sf_dir, "--target", out_dir,
               "--pipeline", "fuzzy"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows_in"] > 0
    assert stats["rows_out"] == stats["rows_in"] - stats["removed"]
    assert stats["rows_out"] <= stats["rows_in"]
    written = spark.read.parquet(out_dir)
    assert written.count() == stats["rows_out"]
    # canonical corpus must carry the representation count
    assert "represents" in written.columns


def test_cli_corpus_stats(capsys, sf_dir):
    rc = main(["corpus-stats", "--source", sf_dir])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows"] > 0
    assert sum(stats["langs"].values()) == stats["rows"]
    assert sum(stats["sources"].values()) == stats["rows"]
    assert 0.0 <= stats["exact_dup_rate"] < 1.0
    q = stats["quality"]
    assert q["min"] <= q["p50"] <= q["max"]


def test_cli_scd2(tmp_path, capsys, spark):
    dim = spark.createDataFrame(
        [(1, "a-v1", "2024-01-01", None, True), (2, "b-v1", "2024-01-01", None, True)],
        "k long, attr string, valid_from string, valid_to string, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "a-v2", "2024-09-01")], "k long, attr string, effective_ts string"
    )
    dim.write.parquet(str(tmp_path / "dim"))
    updates.write.parquet(str(tmp_path / "upd"))
    rc = main([
        "scd2", "--dim", str(tmp_path / "dim"), "--updates", str(tmp_path / "upd"),
        "--target", str(tmp_path / "out"), "--keys", "k", "--attrs", "attr",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats == {"rows_before": 2, "rows_after": 3, "current_rows": 2}


def test_cli_bpe_train(tmp_path, capsys, sf_dir):
    import json as _json

    out = tmp_path / "merges.jsonl"
    rc = main(["bpe-train", "--source", sf_dir, "--out", str(out)])
    assert rc == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    lines = [_json.loads(l) for l in out.read_text().splitlines()]
    assert stats["n_merges"] == len(lines) > 0
    assert [m["round"] for m in lines] == list(range(1, len(lines) + 1))
    assert all(m["merged"] == m["left"] + m["right"] for m in lines)
    assert 0 < stats["compression"] < 1


def test_cli_ann_index(tmp_path, capsys, sf_dir):
    import json as _json

    idx = str(tmp_path / "annidx")
    rc = main(["ann-index", "--source", sf_dir, "--index-dir", idx])
    assert rc == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["result_rows"] > 0
    assert stats["queries"] > 0
    import os

    assert os.path.isdir(idx + "/codes") and os.path.isdir(idx + "/centroids")


def test_cli_repair(tmp_path, capsys, sf_dir):
    import json as _json

    from snowflake_to_postgres_spark.operators.transfer import transfer_partitioned
    from snowflake_to_postgres_spark.sources import table_path
    from snowflake_to_postgres_spark.session import get_spark

    spark = get_spark("test-repair-cli")
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    transfer_partitioned(spark, table_path(sf_dir, "orders"), src, None, granularity="month")
    transfer_partitioned(spark, table_path(sf_dir, "orders"), tgt, None, granularity="month")
    rc = main(["repair", "--source", src, "--target", tgt])
    assert rc == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["stale"] == [] and stats["rewritten_rows"] == 0


def test_cli_layout_hilbert(tmp_path, capsys, spark, sf_dir):
    """layout verb: re-cluster orders on (o_custkey, o_orderkey) with
    the Hilbert curve; row count preserved, requested file count
    produced, and the clustered files carry compact min/max ranges."""
    import glob

    src = sf_dir.rstrip("/") + "/orders.parquet"
    out = str(tmp_path / "clustered")
    rc = main([
        "layout", "--source", src, "--target", out,
        "--col-x", "o_custkey", "--col-y", "o_orderkey",
        "--curve", "hilbert", "--n-files", "4",
    ])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_src = spark.read.parquet(src).count()
    assert doc == {"curve": "hilbert", "rows": n_src, "files": 4}
    assert len(glob.glob(out + "/part-*.parquet")) == 4


def test_cli_explain(capsys, spark, sf_dir):
    """explain verb: formatted plan for a registered query; unknown
    names fail with suggestions."""
    rc = main(["explain", "--query", "q1_pricing_summary", "--sf-dir", sf_dir])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Physical Plan" in out and "HashAggregate" in out
    rc = main(["explain", "--query", "q1_pricing_summry", "--sf-dir", sf_dir])
    err = capsys.readouterr().err
    assert rc == 2 and "q1_pricing_summary" in err


def test_cli_graph(capsys, sf_dir):
    """graph verb: every kind prints one JSON object; the degenerate
    sf0.001 partnership graph (threshold keeps nothing) reports empty
    metrics rather than failing; the trade-graph kinds return ranks."""
    rc = main(["graph", "--source", sf_dir, "--kind", "clustering"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["kind"] == "clustering"
    assert out["nodes"] == 0 and out["triangles"] == 0

    rc = main(["graph", "--source", sf_dir, "--kind", "kcore"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["core_nodes"] == 0 and out["k_used"] is None

    rc = main(["graph", "--source", sf_dir, "--kind", "pagerank"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["nodes"] > 0 and len(out["top"]) == 10
    assert out["top"][0][2] >= out["top"][-1][2]  # rank-ordered


def test_cli_sketch_profile(capsys, sf_dir, duck):
    """The sketch verb must profile an arbitrary parquet column: HLL
    estimate near truth, heavy hitters exact-count-verified, quantiles
    present for numerics; unknown columns fail cleanly."""
    rc = main([
        "sketch", "--path", f"{sf_dir}/orders.parquet",
        "--column", "o_custkey", "--top", "3",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    exact = duck.execute("SELECT COUNT(DISTINCT o_custkey) FROM orders").fetchone()[0]
    assert abs(out["approx_distinct"] - exact) / exact < 0.1
    top = duck.execute(
        "SELECT o_custkey, COUNT(*) FROM orders GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 3"
    ).fetchall()
    assert [[v, n] for v, n, _ in out["heavy_hitters"]] == [list(t) for t in top]
    assert all(est >= n for _, n, est in out["heavy_hitters"])
    assert set(out["quantiles"]) == {"0.5", "0.9", "0.99"}

    rc2 = main(["sketch", "--path", f"{sf_dir}/orders.parquet", "--column", "nope"])
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc2 == 2 and "error" in err


def test_cli_skew_plan(capsys, sf_dir):
    """skew-plan emits the salt advisory as JSON and always exits 0
    (planner, not gate); every row carries the exact integer math."""
    rc = main(["skew-plan", "--source", sf_dir])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    for r in rows:
        assert set(r) == {"user_id", "cnt", "share_ppm", "salt_buckets"}
        assert r["share_ppm"] > 31_250 and r["salt_buckets"] >= 1


def test_cli_privacy_check_gates_on_below_k(capsys, sf_dir):
    """privacy-check exits 1 when any quasi group sits below k (the
    tiny fixture has below-k groups by construction) and its <TOTAL>
    row carries the release verdict."""
    rc = main(["privacy-check", "--source", sf_dir])
    rows = json.loads(capsys.readouterr().out)
    total = [r for r in rows if r["quasi_nation"] == "<TOTAL>"]
    assert len(total) == 1
    assert rc == (1 if total[0]["below_k"] else 0)
    assert rc == 1  # sf0.001 has 3-row quasi groups


def test_cli_quality_filter(tmp_path, capsys, spark):
    """quality-filter verb: trains the learned gate, writes the admitted
    corpus, and reports model + calibration as one JSON line. Runs at
    sf0.01 where the probe actually learns (sf0.001 degenerates to the
    majority class and admits nothing)."""
    out = str(tmp_path / "adm")
    rc = main([
        "quality-filter", "--source", "/root/testdata/sf0.01",
        "--target", out,
    ])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert doc["n_docs"] == 500
    assert set(doc["weights"]) == {
        "bias", "chars", "tokens", "distinct_terms",
        "type_token_ratio", "stop_ratio", "is_en",
    }
    assert doc["accuracy"] > 0.9
    assert 0 < doc["admitted"] < doc["n_docs"]
    # the written corpus is exactly the admitted set
    assert spark.read.parquet(out).count() == doc["admitted"]
    # decile accounting covers the corpus
    assert sum(d["n"] for d in doc["deciles"].values()) == doc["n_docs"]
