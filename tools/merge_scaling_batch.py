"""Merge an additional interleaved (2->8) pair batch into BENCH/scaling.json
and refresh the scaling narrative in BENCH/BASELINE.md.

The per-pair efficiency samples from every window are pooled (each sample is
already drift-controlled by adjacent interleaving); the pooled median is the
headline. Usage: python tools/merge_scaling_batch.py '<batch_json>'
where batch_json = {"ceiling": {...}, "pair_28": {...}} as printed by the
batch runner.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    batch = json.loads(sys.argv[1])
    path = os.path.join(REPO, "BENCH", "scaling.json")
    data = json.load(open(path))

    p = data["pairs_2_to_8"]
    new = batch["pair_28"]
    p["efficiencies"] = sorted(p["efficiencies"] + new["efficiencies"])
    p["throughput_n"] += new["throughput_n"]
    p["throughput_4n"] += new["throughput_4n"]
    n = len(p["efficiencies"])
    med = (
        p["efficiencies"][n // 2]
        if n % 2
        else round(
            (p["efficiencies"][n // 2 - 1] + p["efficiencies"][n // 2]) / 2, 3
        )
    )
    p["median"] = med
    p["best"] = max(p["efficiencies"])
    p["note"] = (
        f"{n} interleaved pairs pooled across three windows; middle window "
        "heavily contended (2-core leg -36%), final window calm "
        "(cpu ceiling 0.96) - see BENCH/BASELINE.md"
    )
    data["efficiency_2_to_8"] = med
    data["hardware_ceiling_final_window"] = batch["ceiling"]
    best8 = max(p["throughput_4n"])
    data["results"]["8"] = {
        "elapsed_sec": round(data["n_docs"] / best8, 2),
        "docs_per_sec": best8,
        "all_runs_docs_per_sec": p["throughput_4n"],
    }
    best2 = max(p["throughput_n"])
    data["results"]["2"] = {
        "elapsed_sec": round(data["n_docs"] / best2, 2),
        "docs_per_sec": best2,
        "all_runs_docs_per_sec": p["throughput_n"],
    }
    data["measured_at"] = time.time()
    json.dump(data, open(path, "w"))
    print(json.dumps({"pooled_median": med, "n_pairs": n,
                      "best": p["best"], "samples": p["efficiencies"]}))

    # Rewrite the primary-evidence line in BENCH/BASELINE.md
    md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    md = open(md_path).read()
    new_line = (
        f"**Primary N->4N evidence (N=2, 4N=8): median efficiency = "
        f"{med:.3f}**\nover {n} pooled interleaved pairs "
        f"{p['efficiencies']}\n(best {p['best']:.3f}; target >= 0.8 per "
        "BASELINE.json; sandbox proxy for N vs 4N\nexecutors per the task "
        "instruction, which allows any N with 4N cores)."
    )
    md2, cnt = re.subn(
        r"\*\*Primary N->4N evidence \(N=2, 4N=8\): median efficiency = "
        r"[\d.]+\*\*\n.*?\n.*?\n.*?\)\.",
        new_line,
        md,
        count=1,
        flags=re.S,
    )
    if cnt != 1:
        print("WARN: BASELINE.md primary-evidence block not found; "
              "append manually", file=sys.stderr)
    else:
        open(md_path, "w").write(md2)
        print("BASELINE.md updated")


if __name__ == "__main__":
    main()
