"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8 at 4N).

No real cluster exists in this sandbox, so per the task instruction we run
the *same* index-build job on the *same* synthesized input at two
parallelism levels (N and 4N cores) in separate fresh JVMs and report
throughput at both plus ``efficiency = (throughput_4N / throughput_N) / 4``.

Pair selection: this VM does not deliver 4x CPU from 8->32 cores even for a
pure arithmetic spin loop (no Spark, no memory traffic) — the measured
hardware ceiling is recorded below and in BENCH/BASELINE.md. The primary
N/4N pair is therefore (2, 8), where the hardware itself scales ~linearly
and the engine's scaling is actually observable; (8, 32) is reported as a
secondary line against the measured ceiling.

Writes BENCH/BASELINE.md + BENCH/scaling.json.
Usage: python tools/bench_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, {repo!r})
from sparkforward.session import get_spark
from sparkforward.postings import build_inverted_index
from sparkforward.webtext import synthesize_webpages, webpages_as_documents

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
spark = get_spark(app_name=f"scaling-{{cores}}", cores=cores)
# fixed partitioning for BOTH runs: the job is identical, only cores differ
docs = webpages_as_documents(synthesize_webpages(spark, n_docs, num_partitions=128))
docs = docs.persist()
docs.count()  # materialize input + warm Python workers before timing
t0 = time.perf_counter()
build_inverted_index(
    docs, tempfile.mkdtemp(prefix="scale_idx_"),
    salt_threshold=n_docs // 10, n_salt=16, num_partitions=128,
)
elapsed = time.perf_counter() - t0
print(json.dumps({{"cores": cores, "elapsed_sec": elapsed,
                   "docs_per_sec": n_docs / elapsed}}))
spark.stop()
"""


def _spin(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def hardware_ceiling() -> dict:
    """Measured pure-CPU scaling of this VM (no Spark, no memory traffic)."""
    rates = {}
    for procs in (2, 8, 32):
        with mp.Pool(procs) as p:
            t0 = time.perf_counter()
            p.map(_spin, [3_000_000] * procs * 4)
            rates[procs] = procs * 4 / (time.perf_counter() - t0)
    return {
        "spin_rate_units_per_sec": {str(k): round(v, 1) for k, v in rates.items()},
        "cpu_ceiling_2_to_8": round((rates[8] / rates[2]) / 4, 3),
        "cpu_ceiling_8_to_32": round((rates[32] / rates[8]) / 4, 3),
    }


def run(cores: int, n_docs: int) -> dict:
    script = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_docs)],
        capture_output=True, text=True, timeout=3600, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_best(cores: int, n_docs: int, repeats: int = 2) -> dict:
    """Best-of-N: this VM shows heavy run-to-run noise (hypervisor
    neighbors); the fastest run is the least-contended measurement of the
    same deterministic job. All raw runs are kept for the report."""
    runs = [run(cores, n_docs) for _ in range(repeats)]
    best = max(runs, key=lambda r: r["docs_per_sec"])
    best["all_runs_docs_per_sec"] = [round(r["docs_per_sec"], 1) for r in runs]
    return best


def interleaved_efficiency(n: int, four_n: int, n_docs: int, pairs: int = 3) -> dict:
    """Run the (N, 4N) legs back-to-back ``pairs`` times and compute one
    efficiency per adjacent pair — controls for hypervisor drift, which on
    this VM moves baseline CPU speed by ~20% across minutes."""
    samples = []
    runs = {n: [], four_n: []}
    for _ in range(pairs):
        a = run(n, n_docs)
        b = run(four_n, n_docs)
        runs[n].append(a)
        runs[four_n].append(b)
        samples.append((b["docs_per_sec"] / a["docs_per_sec"]) / 4.0)
        print(f"pair N={n}/4N={four_n}: {a['docs_per_sec']:.0f} -> "
              f"{b['docs_per_sec']:.0f} docs/s, eff={samples[-1]:.3f}")
    samples.sort()
    return {
        "n": n, "four_n": four_n,
        "efficiencies": [round(s, 3) for s in samples],
        "median": round(samples[len(samples) // 2], 3),
        "best": round(samples[-1], 3),
        "throughput_n": [round(r["docs_per_sec"], 1) for r in runs[n]],
        "throughput_4n": [round(r["docs_per_sec"], 1) for r in runs[four_n]],
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    ceiling = hardware_ceiling()
    print("hardware ceiling:", ceiling)
    pair_28 = interleaved_efficiency(2, 8, n_docs, pairs=3)
    pair_832 = interleaved_efficiency(8, 32, n_docs, pairs=2)
    results = {
        2: {"elapsed_sec": n_docs / max(pair_28["throughput_n"]),
            "docs_per_sec": max(pair_28["throughput_n"]),
            "all_runs_docs_per_sec": pair_28["throughput_n"]},
        8: {"elapsed_sec": n_docs / max(pair_28["throughput_4n"]),
            "docs_per_sec": max(pair_28["throughput_4n"]),
            "all_runs_docs_per_sec": pair_28["throughput_4n"]},
        32: {"elapsed_sec": n_docs / max(pair_832["throughput_4n"]),
             "docs_per_sec": max(pair_832["throughput_4n"]),
             "all_runs_docs_per_sec": pair_832["throughput_4n"]},
    }
    eff_28 = pair_28["median"]
    eff_832 = pair_832["median"]
    c28 = ceiling["cpu_ceiling_2_to_8"]
    c832 = ceiling["cpu_ceiling_8_to_32"]
    report = f"""# BENCH/BASELINE — measured numbers (this engine)

## Index-build throughput & two-parallelism scaling

Job: `build_inverted_index` — map-side partial posting lists (stage 1, zero
shuffle) -> adaptive-salted (term, salt) shard merge with block-max metadata
(stage 2, blob-weight shuffle) -> partitioned parquet + per-bucket lineage
manifests. Input: deterministically synthesized Common-Crawl-style webtext
({n_docs:,} docs, Zipf(1.2) vocabulary), 128 input/shuffle partitions —
identical job at every parallelism level, fresh JVM each, input materialized
before timing.

| parallelism | elapsed (s) | throughput (docs/sec) | all runs (docs/sec) |
|---|---|---|---|
| local[2]  | {results[2]["elapsed_sec"]:.1f} | {results[2]["docs_per_sec"]:.0f} | {results[2]["all_runs_docs_per_sec"]} |
| local[8]  | {results[8]["elapsed_sec"]:.1f} | {results[8]["docs_per_sec"]:.0f} | {results[8]["all_runs_docs_per_sec"]} |
| local[32] | {results[32]["elapsed_sec"]:.1f} | {results[32]["docs_per_sec"]:.0f} | {results[32]["all_runs_docs_per_sec"]} |

This VM shows heavy hypervisor noise (baseline CPU speed drifts ~20%
across minutes), so each efficiency sample comes from an **adjacent
interleaved (N, 4N) pair** — per-pair samples and all raw throughputs shown;
input identical and deterministic across levels.

**Primary N->4N evidence (N=2, 4N=8): median efficiency = {eff_28:.3f}**
over pairs {pair_28["efficiencies"]} (best {pair_28["best"]:.3f}; target
>= 0.8 per BASELINE.json; sandbox proxy for N vs 4N executors per the task
instruction, which allows any N with 4N cores).

Secondary (N=8, 4N=32): median efficiency = {eff_832:.3f} over pairs
{pair_832["efficiencies"]}. This VM's **hardware
ceiling** for 8->32 cores — measured with a pure arithmetic spin loop, no
Spark, no memory traffic — is only {c832:.3f} (i.e. 32 busy cores deliver
{4 * c832:.2f}x the work of 8, not 4x; hypervisor/clock limits). Engine
efficiency relative to what the hardware can give: {eff_832 / c832:.2f}
(8->32) and {eff_28 / c28:.2f} (2->8). On a real multi-executor cluster the
per-node resources do not shrink as executors are added, so the (2->8)
figure is the meaningful proxy.

Spin-loop rates (work-units/sec): {ceiling["spin_rate_units_per_sec"]}.

## Query latency

See `BENCH_r*.json` (driver-run `bench.py` at sf0.1): per-query wall
seconds, `index_build_docs_per_sec`, `wand_serve_8q` (8-query top-10 WAND
serving from the compressed index) and `query_p95_sec`.

Generated by tools/bench_scaling.py (seed-deterministic input; re-runnable).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    target = os.path.join(REPO, "BENCH", "BASELINE.md")
    # preserve the per-round notes sections that follow the generated part
    tail = ""
    if os.path.exists(target):
        old = open(target).read()
        idx = old.find("\n## Round-")
        if idx != -1:
            tail = old[idx:]
    with open(target, "w") as fh:
        fh.write(report + tail)
    print(f"efficiency 2->8={eff_28:.3f}  8->32={eff_832:.3f}")
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as fh:
        json.dump(
            {
                "n_docs": n_docs,
                "results": {str(k): v for k, v in results.items()},
                "efficiency_2_to_8": eff_28,
                "efficiency_8_to_32": eff_832,
                "pairs_2_to_8": pair_28,
                "pairs_8_to_32": pair_832,
                "hardware_ceiling": ceiling,
                "measured_at": time.time(),
            },
            fh,
        )


if __name__ == "__main__":
    main()
