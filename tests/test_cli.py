"""CLI surface smoke: subprocess-owned Ray session (cli.py is one of the
three permitted `ray.init` owners, CLAUDE.md)."""

from __future__ import annotations

import json
import subprocess
import sys

import duckdb

SF = "/root/testdata/sf0.001"


def test_cli_dedup_exact_matches_oracle(tmp_path):
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "rayhll.cli",
            "dedup",
            "--input",
            f"{SF}/documents.parquet",
            "--mode",
            "exact",
            "--num-cpus",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=180,
        check=True,
    )
    kept = sorted(json.loads(l)["doc_id"] for l in out.stdout.strip().splitlines())
    want = sorted(
        duckdb.sql(
            f"SELECT MIN(doc_id) FROM read_parquet('{SF}/documents.parquet') GROUP BY text"
        ).df()["min(doc_id)"]
    )
    assert kept == want


def test_cli_curate_matches_oracle(tmp_path):
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "rayhll.cli",
            "curate",
            "--input",
            f"{SF}/documents.parquet",
            "--min-tokens",
            "40",
            "--num-cpus",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=180,
        check=True,
    )
    rows = sorted(
        (json.loads(l) for l in out.stdout.strip().splitlines()),
        key=lambda r: r["lang"],
    )
    want = duckdb.sql(
        "WITH s AS (SELECT doc_id, lang, text, "
        "length(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_tokens "
        f"FROM read_parquet('{SF}/documents.parquet')), "
        "f AS (SELECT * FROM s WHERE n_tokens >= 40), "
        "d AS (SELECT MIN(doc_id) AS keep_id FROM f GROUP BY text), "
        "k AS (SELECT f.* FROM f JOIN d ON f.doc_id = d.keep_id) "
        "SELECT lang, COUNT(*) AS n_docs, SUM(n_tokens) AS sum_tokens "
        "FROM k GROUP BY lang ORDER BY lang"
    ).df()
    assert [r["lang"] for r in rows] == list(want["lang"])
    assert [r["n_docs"] for r in rows] == [int(x) for x in want["n_docs"]]
    assert [r["sum_tokens"] for r in rows] == [int(x) for x in want["sum_tokens"]]


def test_cli_curate_full_gates(tmp_path):
    """--max-dup-token-frac and --bench-parquet engage the repetition and
    decontamination gates: the bench corpus is one doc's 24-token prefix,
    so exactly that document drops relative to the base run."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    victim = duckdb.sql(
        "SELECT doc_id, array_to_string(regexp_extract_all(text, '[A-Za-z0-9_]+')[1:24], ' ') AS btext "
        f"FROM read_parquet('{SF}/documents.parquet') "
        "WHERE length(regexp_extract_all(text, '[A-Za-z0-9_]+')) >= 40 LIMIT 1"
    ).df()
    bench_path = tmp_path / "bench.parquet"
    pq.write_table(pa.table({"text": victim["btext"].tolist()}), bench_path)

    def run(extra):
        out = subprocess.run(
            [sys.executable, "-m", "rayhll.cli", "curate",
             "--input", f"{SF}/documents.parquet",
             "--min-tokens", "40", "--num-cpus", "4"] + extra,
            capture_output=True, text=True, timeout=180, check=True,
        )
        rows = [json.loads(l) for l in out.stdout.strip().splitlines()]
        return sum(r["n_docs"] for r in rows)

    base = run([])
    full = run(["--max-dup-token-frac", "0.99",
                "--bench-parquet", str(bench_path)])
    assert full == base - 1  # exactly the victim doc is decontaminated away
