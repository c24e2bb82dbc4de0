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
