"""Command-line entry points.

Examples::

    python -m rayhll.cli flagship --input '/data/code/*.parquet' --output /tmp/out
    python -m rayhll.cli distinct --input '/data/t.parquet' --key content --group repo,lang
    python -m rayhll.cli bench

Designed for ``ray job submit -- python -m rayhll.cli ...`` on a cluster;
locally it initializes Ray itself (guarded, so a driver-owned session is
respected).
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False, ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_flagship(args) -> int:
    from rayhll.core.settings import HllSettings
    from rayhll.state.checkpoint import flagship_checkpointed

    _ensure_ray(args.num_cpus)
    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    settings = HllSettings(args.log2m, args.regwidth, expthresh=args.expthresh)
    result = flagship_checkpointed(files, args.output, settings=settings)
    print(
        json.dumps(
            {
                "groups": result.num_rows,
                "output": args.output,
                "partitions": len(files),
            }
        )
    )
    return 0


def cmd_distinct(args) -> int:
    import ray.data as rd

    from rayhll import ray_agg
    from rayhll.core.settings import HllSettings

    _ensure_ray(args.num_cpus)
    settings = HllSettings(args.log2m, args.regwidth, expthresh=args.expthresh)
    ds = rd.read_parquet(sorted(glob.glob(args.input)))
    keys = args.key.split(",")
    if args.group:
        out = ray_agg.grouped_approx_distinct(
            ds, args.group.split(","), keys, settings=settings
        )
        if args.output:
            out.write_parquet(args.output)
            print(json.dumps({"groups": out.count(), "output": args.output}))
        else:
            for row in out.take_all():
                print(json.dumps(row, default=str))
    else:
        est = ray_agg.approx_distinct(ds, keys, settings=settings)
        print(json.dumps({"keys": keys, "estimate": est}))
    return 0


def cmd_profile(args) -> int:
    import ray.data as rd

    from rayhll import ray_agg
    from rayhll.pipelines.profile import profile_distinct

    _ensure_ray(args.num_cpus)
    ds = rd.read_parquet(sorted(glob.glob(args.input)))
    cols = args.columns.split(",") if args.columns else None
    settings = ray_agg.EXACT_MODE if args.exact else None
    out = profile_distinct(ds, cols, settings=settings)
    for row in out.take_all():
        print(json.dumps(row, default=str))
    return 0


def cmd_dedup(args) -> int:
    import ray.data as rd

    from rayhll.pipelines import dedup

    _ensure_ray(args.num_cpus)
    ds = rd.read_parquet(
        sorted(glob.glob(args.input)), columns=[args.id_col, args.text_col]
    )
    if args.mode == "exact":
        out = dedup.exact_dedup_keep_ids(ds, args.text_col, args.id_col)
    elif args.mode == "minhash":
        out = dedup.minhash_lsh_pairs(
            ds, args.text_col, args.id_col, threshold=args.threshold
        )
    elif args.mode == "simhash":
        out = dedup.simhash_pairs(ds, args.text_col, args.id_col)
    elif args.mode == "ngram":
        out = dedup.ngram_jaccard_pairs(
            ds, args.text_col, args.id_col, threshold=args.threshold
        )
    else:  # pragma: no cover - argparse choices guard
        raise ValueError(args.mode)
    if args.output:
        out.write_parquet(args.output)
        print(json.dumps({"rows": out.count(), "output": args.output}))
    else:
        for row in out.take_all():
            print(json.dumps(row, default=str))
    return 0


def cmd_curate(args) -> int:
    import ray.data as rd

    from rayhll.pipelines.curate import curate_documents

    _ensure_ray(args.num_cpus)
    ds = rd.read_parquet(
        sorted(glob.glob(args.input)),
        columns=[args.id_col, args.lang_col, args.text_col],
    )
    bench_texts = None
    if args.bench_parquet:
        import pyarrow as pa
        import pyarrow.parquet as pq

        bench_texts = pa.concat_tables(
            pq.read_table(f, columns=[args.bench_text_col])
            for f in sorted(glob.glob(args.bench_parquet))
        ).column(args.bench_text_col)
    out = curate_documents(
        ds,
        text_col=args.text_col,
        id_col=args.id_col,
        lang_col=args.lang_col,
        min_tokens=args.min_tokens,
        max_dup_token_frac=args.max_dup_token_frac,
        bench_texts=bench_texts,
        decontam_gram=args.decontam_gram,
    )
    if args.output:
        out.write_parquet(args.output)
        print(json.dumps({"rows": out.count(), "output": args.output}))
    else:
        for row in out.take_all():
            print(json.dumps(row, default=str))
    return 0


def cmd_conformance(args) -> int:
    import subprocess

    return subprocess.call(
        [sys.executable, "-m", "pytest", "tests/conformance", "-q"] + (
            ["-x"] if args.fail_fast else []
        )
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="rayhll")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("flagship", help="checkpointed flagship run over code parquet")
    f.add_argument("--input", required=True, help="input parquet glob")
    f.add_argument("--output", required=True, help="checkpoint/output directory")
    f.add_argument("--log2m", type=int, default=11)
    f.add_argument("--regwidth", type=int, default=5)
    f.add_argument("--expthresh", type=int, default=-1)
    f.add_argument("--num-cpus", type=int, default=None)
    f.set_defaults(fn=cmd_flagship)

    d = sub.add_parser("distinct", help="approximate distinct count")
    d.add_argument("--input", required=True)
    d.add_argument("--key", required=True, help="comma-separated key columns")
    d.add_argument("--group", default=None, help="comma-separated group columns")
    d.add_argument("--output", default=None, help="parquet output dir (grouped mode)")
    d.add_argument("--log2m", type=int, default=11)
    d.add_argument("--regwidth", type=int, default=5)
    d.add_argument("--expthresh", type=int, default=-1)
    d.add_argument("--num-cpus", type=int, default=None)
    d.set_defaults(fn=cmd_distinct)

    dd = sub.add_parser("dedup", help="exact / near-duplicate detection")
    dd.add_argument("--input", required=True, help="input parquet glob")
    dd.add_argument(
        "--mode", choices=("exact", "minhash", "simhash", "ngram"), default="exact"
    )
    dd.add_argument("--text-col", default="text")
    dd.add_argument("--id-col", default="doc_id")
    dd.add_argument("--threshold", type=float, default=0.8)
    dd.add_argument("--output", default=None, help="parquet output dir")
    dd.add_argument("--num-cpus", type=int, default=None)
    dd.set_defaults(fn=cmd_dedup)

    pr = sub.add_parser("profile", help="per-column distinct profile")
    pr.add_argument("--input", required=True)
    pr.add_argument("--columns", default=None, help="comma-separated; default all")
    pr.add_argument("--exact", action="store_true", help="EXPLICIT exact mode")
    pr.add_argument("--num-cpus", type=int, default=None)
    pr.set_defaults(fn=cmd_profile)

    cu = sub.add_parser(
        "curate", help="quality-filter + exact-dedup + per-language rollup"
    )
    cu.add_argument("--input", required=True, help="input parquet glob")
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--id-col", default="doc_id")
    cu.add_argument("--lang-col", default="lang")
    cu.add_argument("--min-tokens", type=int, default=40)
    cu.add_argument(
        "--max-dup-token-frac",
        type=float,
        default=None,
        help="drop docs whose duplicate-token fraction exceeds this (Gopher gate)",
    )
    cu.add_argument(
        "--bench-parquet",
        default=None,
        help="parquet glob of a benchmark/eval corpus; docs sharing a token "
        "n-gram with it are dropped (decontamination gate)",
    )
    cu.add_argument("--bench-text-col", default="text")
    cu.add_argument("--decontam-gram", type=int, default=8)
    cu.add_argument("--output", default=None, help="parquet output dir")
    cu.add_argument("--num-cpus", type=int, default=None)
    cu.set_defaults(fn=cmd_curate)

    c = sub.add_parser("conformance", help="replay the golden corpus")
    c.add_argument("--fail-fast", action="store_true")
    c.set_defaults(fn=cmd_conformance)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
