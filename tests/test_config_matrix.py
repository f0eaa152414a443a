"""Config-matrix run: the catalog must be green at a second parallelism
level (SURVEY §5d) — the reference runs the same binaries under 1w/2w/4w
machine configs (`machine-configs/mach-hc-1w.cfg`/`-2w`,
`default.cfg:44-46`); here the same catalog plans run under local[2]
while the main suite runs local[8].

A SparkContext is process-global, so the low-parallelism session cannot
coexist with the suite's session fixture — the sweep runs in a
subprocess via tools/compare_oracle.py with SPARK_GRAFT_CPUS=2. One
representative query per operator family keeps the matrix run to ~2 min;
any parallelism-dependent bug (partition-count assumptions, salted-key
fan-out, per-partition state) trips the same differential oracle the
driver uses.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# one per family: agg, broadcast join, window-sessionize, as-of,
# correlated subquery, exact/minhash/blocked-matmul/cc dedup, LSH ANN,
# quantized k-means, text stats, streaming stateful, extraction fixture
MATRIX_QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q09_sessionize",
    "q20_asof_join",
    "q24_correlated_subquery",
    "d01_exact_dedup",
    "d03_minhash_lsh",
    "d05_embedding_neardup",
    "d06_dup_clusters",
    "e02_ann_lsh",
    "e05_kmeans",
    "t01_token_stats",
    "s04_stream_milestones",
    "x01_extract_pipeline",
    # round-2 additions whose shapes could plausibly be
    # parallelism-sensitive: salted pack groups, iterative integer
    # propagation, stream-static broadcast, golden-audio windowing
    "p02_sequence_pack",
    "g01_pagerank",
    "s06_stream_static_join",
    "x06_audio_windows",
]


def test_catalog_green_at_low_parallelism(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "compare_oracle.py"), sf_dir]
        + MATRIX_QUERIES,
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    out = proc.stdout.replace("\r", "\n")
    oks = [line for line in out.splitlines() if line.startswith("ok   ")]
    fails = [line for line in out.splitlines() if line.startswith("FAIL ")]
    assert proc.returncode == 0 and not fails and len(oks) == len(MATRIX_QUERIES), (
        f"local[2] matrix: rc={proc.returncode} ok={len(oks)} fails={fails}\n"
        + out[-2000:]
        + proc.stderr[-1000:]
    )
