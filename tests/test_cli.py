"""CLI entry point (`python -m ag_data_ingestion_github_to_snowflake_spark`),
mirroring the reference's main() flags (extract_github_data.py:769-792):
--test-mode / --use-cache / --skip-upload."""

from __future__ import annotations

import json

from ag_data_ingestion_github_to_snowflake_spark.__main__ import build_parser, run


def test_parser_mirrors_reference_flags():
    args = build_parser().parse_args(
        ["--test-mode", "--use-cache", "--skip-upload"]
    )
    assert args.test_mode and args.use_cache and args.skip_upload


def test_cli_end_to_end_test_mode(spark, tmp_path, capsys):
    # 50 repos fit inside one unauthenticated 60-request budget, so a
    # single run drains the universe and the second run is a no-op
    sink = str(tmp_path / "sink")
    state = str(tmp_path / "state" / "last_repo_id.txt")
    summary = run(
        [
            "--test-mode",
            "--n-repos",
            "50",
            "--sink",
            sink,
            "--state",
            state,
        ],
        spark=spark,
    )
    assert summary["success"] and summary["uploaded"]
    assert summary["valid_count"] > 0
    assert summary["new_watermark"] > 0
    # stdout is exactly one JSON line (machine-readable run summary)
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1]) == summary
    # sink is a readable date-partitioned table
    back = spark.read.parquet(sink)
    assert back.count() == summary["valid_count"]
    assert {"year", "month", "day"} <= set(back.columns)
    # watermark persisted for the next incremental run
    assert int(open(state).read()) == summary["new_watermark"]

    # second run resumes past the watermark: no repos left -> no upload
    summary2 = run(
        ["--test-mode", "--n-repos", "50", "--sink", sink, "--state", state],
        spark=spark,
    )
    assert summary2["valid_count"] == 0 and not summary2["uploaded"]


def test_cli_skip_upload_advances_watermark_without_sink(spark, tmp_path):
    sink = str(tmp_path / "sink")
    state = str(tmp_path / "wm.txt")
    summary = run(
        [
            "--test-mode",
            "--n-repos",
            "60",
            "--skip-upload",
            "--sink",
            sink,
            "--state",
            state,
        ],
        spark=spark,
    )
    assert summary["valid_count"] > 0 and not summary["uploaded"]
    import os

    assert not os.path.exists(sink)
    assert int(open(state).read()) == summary["new_watermark"]


def test_cli_use_cache_seeds_watermark_from_sink(spark, tmp_path):
    sink = str(tmp_path / "sink")
    state = str(tmp_path / "wm.txt")
    run(
        ["--test-mode", "--n-repos", "50", "--sink", sink, "--state", state],
        spark=spark,
    )
    # wipe the state file: --use-cache must recover the cursor from the
    # bronze/sink table instead of refetching from id 0 (A3 semantics)
    import os

    os.remove(state)
    summary = run(
        [
            "--test-mode",
            "--n-repos",
            "50",
            "--use-cache",
            "--sink",
            sink,
            "--state",
            state,
        ],
        spark=spark,
    )
    assert summary["valid_count"] == 0  # nothing past the cached max id
