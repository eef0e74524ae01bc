"""Measure IVF centroid-training cost vs corpus size with ``max_train``
pinned — the FAISS-style bounded-sample training regime added in r3
(``operators/similarity.py:train_ivf_centroids``).

Claim under test: with ``max_train`` set, training cost is
corpus-size-INVARIANT (alpha ~ 0 over a 10x data step) because the
driver collects at most ``max_train`` vectors (cluster-side
sample+limit) and runs the Lloyd iterations as numpy matmuls; only the
later assignment pass over the full corpus scales with N. For
contrast, the tool also times the distributed training path
(``sample_fraction`` only, no cap), whose per-iteration scan DOES grow
with N, and the full-corpus assignment pass, which SHOULD grow ~
linearly (that part is unavoidable and embarrassingly parallel).

Writes ivf_train_scale.json and prints a markdown table for
BASELINE.md. alpha = log10(t_big / t_small) for a 10x data step.

Usage: python tools/ivf_train_scale.py [small_dir] [big_dir] [reps]
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ag_data_ingestion_github_to_snowflake_spark.operators.similarity import (
    _nearest_cell_udf,
    train_ivf_centroids,
)
from ag_data_ingestion_github_to_snowflake_spark.session import get_spark

MAX_TRAIN = 1024
N_CELLS = 8
ITERS = 2


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        root, ".localdata", "sf1.0"
    )
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("ivf-train-scale")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(fn) -> list[float]:
        out = []
        for rep in range(reps + 1):  # +1 warm-up
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            if rep:
                out.append(dt)
        return out

    report: dict = {"max_train": MAX_TRAIN, "n_cells": N_CELLS,
                    "iters": ITERS, "reps": reps, "phases": {}}
    for label, path in (("sf0.1", small), ("sf1.0", big)):
        emb = spark.read.parquet(f"{path}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        n = emb.count()
        phases = {
            # bounded-sample training: the alpha~0 claim
            "train_max_train": timed(
                lambda: train_ivf_centroids(
                    emb, n_cells=N_CELLS, iters=ITERS, max_train=MAX_TRAIN
                )
            ),
            # distributed training without the cap: scans fraction*N per
            # Lloyd iteration -> grows with N (the contrast case)
            "train_distributed": timed(
                lambda: train_ivf_centroids(
                    emb, n_cells=N_CELLS, iters=ITERS, sample_fraction=0.25
                )
            ),
        }
        cents = train_ivf_centroids(
            emb, n_cells=N_CELLS, iters=ITERS, max_train=MAX_TRAIN
        )
        # full-corpus assignment pass: the unavoidable O(N) part
        phases["assign_full_corpus"] = timed(
            lambda: emb.withColumn(
                "cell", _nearest_cell_udf(cents)(F.col("embedding"))
            )
            .groupBy("cell")
            .count()
            .collect()
        )
        report["phases"][label] = {
            "rows": n,
            **{k: [round(x, 4) for x in v] for k, v in phases.items()},
        }

    small_p = report["phases"]["sf0.1"]
    big_p = report["phases"]["sf1.0"]
    table = ["| phase | sf0.1 median s | sf1.0 median s | alpha (10x) |",
             "|---|---|---|---|"]
    report["alpha"] = {}
    for phase in ("train_max_train", "train_distributed", "assign_full_corpus"):
        t_s = statistics.median(small_p[phase])
        t_b = statistics.median(big_p[phase])
        alpha = round(math.log10(t_b / t_s), 3)
        report["alpha"][phase] = alpha
        table.append(f"| {phase} | {t_s:.3f} | {t_b:.3f} | {alpha:+.2f} |")

    with open(os.path.join(root, "ivf_train_scale.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["alpha"], indent=2))
    print("\n".join(table))


if __name__ == "__main__":
    main()
