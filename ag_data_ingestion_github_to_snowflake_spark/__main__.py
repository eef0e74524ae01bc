"""CLI entry point: ``python -m ag_data_ingestion_github_to_snowflake_spark``.

Mirrors the reference's ``main()`` argparse surface
(/root/reference/src/extract_github_data.py:769-792):

- ``--test-mode``   run the full pipeline against the deterministic
                    offline stub transport (no network), logging the
                    same configuration summary;
- ``--use-cache``   read the bronze cache table first and only fetch
                    past its high-watermark (A3/A7);
- ``--skip-upload`` run extraction + validation + metrics but skip the
                    sink write (the reference's S3-upload skip).

Spark-first deltas from the reference (documented in SURVEY §1.1):
the envelope JSON document becomes a flat partitioned table plus a
``_run_metrics`` table, and the watermark commits once per batch
AFTER the sink write succeeds (the reference commits per row).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from ag_data_ingestion_github_to_snowflake_spark.config import EngineConfig


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="ag_data_ingestion_github_to_snowflake_spark",
        description="Extract GitHub repository data with two-step process "
        "(list scan + detail enrichment) on Spark",
    )
    parser.add_argument(
        "--test-mode",
        action="store_true",
        help="Offline run against the deterministic stub transport",
    )
    parser.add_argument(
        "--use-cache",
        action="store_true",
        help="Seed the watermark from the bronze cache before fetching",
    )
    parser.add_argument(
        "--skip-upload",
        action="store_true",
        help="Skip the sink write (for testing)",
    )
    parser.add_argument(
        "--max-pages", type=int, default=1, help="List-scan pages this run"
    )
    parser.add_argument(
        "--n-repos",
        type=int,
        default=300,
        help="Stub universe size (test mode only)",
    )
    parser.add_argument(
        "--base-url",
        default="https://api.github.com",
        help="API root (ignored in test mode)",
    )
    parser.add_argument("--sink", default=None, help="Override sink path")
    parser.add_argument("--state", default=None, help="Override watermark file path")
    return parser


def run(argv: list[str] | None = None, spark=None) -> dict:
    """Parse args, run one incremental batch, return the run summary.

    Separated from ``main()`` so tests can drive it with an injected
    SparkSession and read the summary dict directly.
    """
    from ag_data_ingestion_github_to_snowflake_spark.pipeline.github import (
        incremental_extract,
    )
    from ag_data_ingestion_github_to_snowflake_spark.sources.rest import (
        RestSourceConfig,
        http_transport,
    )
    from ag_data_ingestion_github_to_snowflake_spark.sources.sinks import (
        partitioned_append,
        write_run_metrics,
    )
    from ag_data_ingestion_github_to_snowflake_spark.sources.state import (
        FileWatermark,
    )
    from ag_data_ingestion_github_to_snowflake_spark.sources.stub import (
        StubTransport,
    )

    args = build_parser().parse_args(argv)
    env_cfg = EngineConfig.from_env()
    sink_path = args.sink or env_cfg.sink_path
    state_path = args.state or env_cfg.state_path
    test_mode = args.test_mode or env_cfg.test_mode
    skip_upload = args.skip_upload or env_cfg.skip_upload

    own_session = spark is None
    if own_session:
        from ag_data_ingestion_github_to_snowflake_spark.session import (
            get_spark,
        )

        spark = get_spark()

    print("GitHub Data Extraction - Two-Step Process (Spark)", file=sys.stderr)
    print(
        f"  sink={sink_path} state={state_path} test_mode={test_mode} "
        f"use_cache={args.use_cache} skip_upload={skip_upload}",
        file=sys.stderr,
    )

    if test_mode:
        transport = StubTransport(n_repos=args.n_repos)
    else:  # pragma: no cover - network path, exercised via stub in tests
        transport = http_transport(args.base_url, env_cfg.token)

    os.makedirs(os.path.dirname(state_path) or ".", exist_ok=True)
    state = FileWatermark(state_path)
    if args.use_cache and os.path.exists(sink_path):
        # A3: bronze cache seed — never re-fetch ids already sunk.
        from pyspark.sql import functions as F

        cached_max = (
            spark.read.parquet(sink_path).agg(F.max("id")).collect()[0][0]
        )
        if cached_max is not None and cached_max > state.get():
            state.set(int(cached_max))

    rest_cfg = RestSourceConfig(
        per_page=env_cfg.per_page,
        max_requests_per_run=env_cfg.max_requests_per_run,
        detail_partitions=env_cfg.detail_partitions,
    )
    result = incremental_extract(
        spark,
        transport,
        state,
        config=rest_cfg,
        max_pages=args.max_pages,
        commit_state=False,  # commit AFTER the sink write below
    )

    valid_count = result.valid.count()
    invalid_count = result.invalid.count()
    if not skip_upload and valid_count:
        partitioned_append(result.valid, sink_path, ts_col="updated_at")
        write_run_metrics(result.metrics, sink_path + "_run_metrics")
    # Watermark advances only once the batch is durably sunk (or the
    # run explicitly skipped the sink) — a failed write re-fetches.
    state.set(result.new_watermark)

    summary = {
        "success": True,
        "valid_count": valid_count,
        "invalid_count": invalid_count,
        "new_watermark": result.new_watermark,
        "uploaded": bool(not skip_upload and valid_count),
        "sink_path": sink_path if not skip_upload else None,
        "test_mode": test_mode,
    }
    print(json.dumps(summary))
    if own_session:
        spark.stop()
    return summary


def main() -> int:  # pragma: no cover - thin wrapper
    run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
