"""Run one calm-window (2->8) scaling batch and print the merge-ready JSON.

Checks the hardware ceiling FIRST (ceiling < 0.93 = contended window:
abort, don't pollute the pool) then runs `pairs` adjacent interleaved
(2, 8) legs. Output (last line) is the batch dict consumed by
tools/merge_scaling_batch.py. Usage:
    python tools/run_scaling_batch.py [pairs] [n_docs]
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import bench_scaling as bs


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    ceiling = bs.hardware_ceiling()
    print("hardware ceiling:", ceiling, flush=True)
    if ceiling["cpu_ceiling_2_to_8"] < 0.93:
        print("CONTENDED WINDOW (ceiling < 0.93) — aborting, rerun later")
        sys.exit(2)
    pair_28 = bs.interleaved_efficiency(2, 8, n_docs, pairs=pairs)
    ceiling_after = bs.hardware_ceiling()
    print("ceiling after:", ceiling_after, flush=True)
    print("BATCH_JSON:" + json.dumps(
        {"ceiling": ceiling, "ceiling_after": ceiling_after,
         "pair_28": pair_28}))


if __name__ == "__main__":
    main()
