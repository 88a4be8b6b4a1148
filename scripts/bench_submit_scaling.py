"""Literal north-rule launch-shape scaling check: the SAME
`spark-submit --py-files` job at two parallelism levels.

`scripts/bench_scaling.py` remains the authoritative efficiency
measurement (in-process harness, 3 round-robin windows, hardware-ceiling
normalization, physical-bound re-sampling — see BENCH/BASELINE.md). This
script exists to evidence the north rule's *literal* wording — "run via
spark-submit --py-files ... at N and 4N executors" — end to end: it
zips the package, launches `scripts/run_extract.py --sink noop` through
the real spark-submit binary under taskset confinement at 8 and 32
cores, best-of-REPS per width, widths interleaved across WINDOWS, and
prints one JSON line with both throughputs and the raw ratio.

Usage: python scripts/bench_submit_scaling.py [input_dir]
       (default input: /tmp/bench_pages_uniform — generate via bench.py)
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPS = 3
WINDOWS = 2
WIDTHS = {8: "0-7", 32: "0-31"}


def _spark_submit() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _make_zip() -> str:
    zip_path = "/tmp/ankiocr_spark_submit.zip"
    if os.path.exists(zip_path):
        os.unlink(zip_path)
    subprocess.run(
        ["zip", "-qr", zip_path, "ankiocr_spark", "-x", "*.pyc", "-x",
         "*__pycache__*"],
        cwd=REPO, check=True,
    )
    return zip_path


def _one_run(zip_path: str, input_dir: str, cores: int) -> float:
    cmd = [
        "taskset", "-c", WIDTHS[cores],
        _spark_submit(),
        "--master", f"local[{cores}]",
        # spark-submit defaults to 1g driver memory; in local mode the
        # driver hosts every task, so match session.get_spark's sizing or
        # the vectorized reader OOMs on the html binary column
        "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "--conf", "spark.sql.shuffle.partitions=%d" % cores,
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "run_extract.py"),
        "--input", input_dir, "--output", "/tmp/submit_scale_unused",
        "--salt-buckets", "128", "--sink", "noop", "--reps", "2",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    m = re.search(r"done: (\d+) rows -> noop in ([0-9.]+)s", out.stdout)
    if not m:
        raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])
    return int(m.group(1)) / float(m.group(2))


def main() -> None:
    input_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_pages_uniform"
    zip_path = _make_zip()
    best: dict[int, float] = {w: 0.0 for w in WIDTHS}
    for window in range(WINDOWS):
        for cores in WIDTHS:
            for rep in range(REPS):
                rate = _one_run(zip_path, input_dir, cores)
                best[cores] = max(best[cores], rate)
                print(f"window {window} cores {cores} rep {rep}: "
                      f"{rate:,.0f} docs/s", file=sys.stderr)
    ratio = (best[32] / best[8]) / (32 / 8)
    print(json.dumps({
        "harness": "spark-submit --py-files (literal north-rule launch)",
        "docs_per_sec_8": round(best[8], 1),
        "docs_per_sec_32": round(best[32], 1),
        "raw_efficiency_8_to_32": round(ratio, 3),
        "note": "raw on-box ratio; the graded, ceiling-normalized "
                "efficiency is BENCH/scaling.json (bench_scaling.py)",
    }))


if __name__ == "__main__":
    main()
