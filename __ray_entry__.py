"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.

No ``ray.init``/``ray.shutdown`` here or in any library code (driver owns the
session).  Exact-mode HLL queries use expthresh=18 so every group stays in
the EXPLICIT (exact) representation at sf scales — their estimates equal
COUNT(DISTINCT) and are oracle-gated; probabilistic queries omit the oracle
(rows-only check) and are bound-checked in pytest instead.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# ----------------------------------------------------------------------
# flagship


def entry() -> Any:
    """Flagship on sf0.001: documents reshaped to the input_hint source-code
    schema -> per-(repo, lang) distinct sketches for content/path/(repo,commit)."""
    from rayhll.pipelines import distinct
    from rayhll.sources.synth import code_table_from_documents

    ds = _read("/root/testdata/sf0.001", "documents").map_batches(
        code_table_from_documents, batch_format="pyarrow", zero_copy_batch=True
    )
    return distinct.flagship_grouped(ds)


# ----------------------------------------------------------------------
# queries


def _q_distinct_text(sf_dir: str):
    import pyarrow as pa

    from rayhll import ray_agg

    ds = _read(sf_dir, "documents", columns=["text"])
    est = ray_agg.approx_distinct(ds, ["text"], settings=ray_agg.EXACT_MODE)
    return pa.table({"distinct_text": pa.array([est], type=pa.int64())})


def _q_distinct_text_by_lang(sf_dir: str):
    from rayhll import ray_agg

    ds = _read(sf_dir, "documents", columns=["lang", "text"])
    out = ray_agg.grouped_approx_distinct(
        ds, ["lang"], ["text"], settings=ray_agg.EXACT_MODE
    )
    return out.drop_columns(["rows_in"]).rename_columns(
        {"estimate": "distinct_text"}
    )


def _q_distinct_users_by_event_type(sf_dir: str):
    from rayhll import ray_agg

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    out = ray_agg.grouped_approx_distinct(
        ds, ["event_type"], ["user_id"], settings=ray_agg.EXACT_MODE
    )
    return out.drop_columns(["rows_in"]).rename_columns(
        {"estimate": "distinct_users"}
    )


def _q_distinct_orderkey(sf_dir: str):
    import pyarrow as pa

    from rayhll import ray_agg

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    est = ray_agg.approx_distinct(ds, ["l_orderkey"], settings=ray_agg.EXACT_MODE)
    return pa.table({"distinct_orderkey": pa.array([est], type=pa.int64())})


def _q_distinct_orderkey_linenumber(sf_dir: str):
    import pyarrow as pa

    from rayhll import ray_agg

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])
    est = ray_agg.approx_distinct(
        ds, ["l_orderkey", "l_linenumber"], settings=ray_agg.EXACT_MODE
    )
    return pa.table({"distinct_orderkey_linenumber": pa.array([est], type=pa.int64())})


def _q_distinct_custkey_by_orderstatus(sf_dir: str):
    from rayhll import ray_agg

    ds = _read(sf_dir, "orders", columns=["o_orderstatus", "o_custkey"])
    out = ray_agg.grouped_approx_distinct(
        ds, ["o_orderstatus"], ["o_custkey"], settings=ray_agg.EXACT_MODE
    )
    return out.drop_columns(["rows_in"]).rename_columns(
        {"estimate": "distinct_custkey"}
    )


def _q_sha256_invariant(sf_dir: str):
    import pyarrow as pa

    from rayhll.functions import hashing

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def add_sha(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sha": pa.array(hashing.sha256_hex(batch.column("text")), type=pa.string()),
            }
        )

    return ds.map_batches(add_sha, batch_format="pyarrow", zero_copy_batch=True)


def _q_flagship_code_global(sf_dir: str):
    from rayhll import ray_agg
    from rayhll.pipelines import distinct
    from rayhll.sources.synth import code_table_from_documents

    ds = _read(sf_dir, "documents").map_batches(
        code_table_from_documents, batch_format="pyarrow", zero_copy_batch=True
    )
    return distinct.flagship_global(ds, settings=ray_agg.EXACT_MODE)


def _q_hll_estimate_text_probabilistic(sf_dir: str):
    """Probabilistic estimate at log2m=11 (deterministic, not SQL-expressible:
    rows-only driver check; error bound asserted in tests)."""
    import pyarrow as pa

    from rayhll import ray_agg

    ds = _read(sf_dir, "documents", columns=["text"])
    est = ray_agg.approx_distinct(ds, ["text"])
    return pa.table({"estimate_text": pa.array([est], type=pa.int64())})


def _q_hll_sketch_hex_by_lang(sf_dir: str):
    """Serialized storage-spec v1.0.0 sketch per lang, as postgres hex
    (interop surface; deterministic; rows-only check)."""
    import pyarrow as pa

    from rayhll import ray_agg
    from rayhll.core import serde

    ds = _read(sf_dir, "documents", columns=["lang", "text"])
    merged = ray_agg.grouped_approx_distinct(
        ds, ["lang"], ["text"], include_sketch=True
    )

    def hexify(batch: pa.Table) -> pa.Table:
        hexes = [serde.to_pg_hex(b.as_py()) for b in batch.column(ray_agg.SKETCH_COL)]
        return pa.table(
            {
                "lang": batch.column("lang"),
                "sketch_hex": pa.array(hexes, type=pa.string()),
                "estimate": batch.column(ray_agg.ESTIMATE_COL),
            }
        )

    return merged.map_batches(hexify, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "hll_distinct_text": _q_distinct_text,
        "hll_distinct_text_by_lang": _q_distinct_text_by_lang,
        "hll_distinct_users_by_event_type": _q_distinct_users_by_event_type,
        "hll_distinct_orderkey": _q_distinct_orderkey,
        "hll_distinct_orderkey_linenumber": _q_distinct_orderkey_linenumber,
        "hll_distinct_custkey_by_orderstatus": _q_distinct_custkey_by_orderstatus,
        "sha256_invariant": _q_sha256_invariant,
        "flagship_code_global": _q_flagship_code_global,
        "hll_estimate_text_probabilistic": _q_hll_estimate_text_probabilistic,
        "hll_sketch_hex_by_lang": _q_hll_sketch_hex_by_lang,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "hll_distinct_text": (
            "SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS distinct_text FROM documents"
        ),
        "hll_distinct_text_by_lang": (
            "SELECT lang, CAST(COUNT(DISTINCT text) AS BIGINT) AS distinct_text "
            "FROM documents GROUP BY lang"
        ),
        "hll_distinct_users_by_event_type": (
            "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users "
            "FROM events GROUP BY event_type"
        ),
        "hll_distinct_orderkey": (
            "SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS distinct_orderkey "
            "FROM lineitem"
        ),
        "hll_distinct_orderkey_linenumber": (
            "SELECT CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) "
            "AS distinct_orderkey_linenumber FROM lineitem"
        ),
        "hll_distinct_custkey_by_orderstatus": (
            "SELECT o_orderstatus, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) "
            "AS distinct_custkey FROM orders GROUP BY o_orderstatus"
        ),
        "sha256_invariant": "SELECT doc_id, sha256(text) AS sha FROM documents",
        "flagship_code_global": (
            "SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS est_distinct_content, "
            "CAST(COUNT(DISTINCT ('docs/' || lang || '/doc_' || doc_id || '.txt')) AS BIGINT) "
            "AS est_distinct_path, "
            "CAST(COUNT(DISTINCT (('corpus/' || source), substr(sha256(text), 1, 40))) AS BIGINT) "
            "AS est_distinct_repo_commit, "
            "CAST(COUNT(*) AS BIGINT) AS rows_in FROM documents"
        ),
    }
