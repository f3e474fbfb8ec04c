"""Capture .explain("formatted") for registered queries into a directory.

Usage:
  python scripts/capture_plans.py plans/r08 _before [name ...]

Writes <outdir>/<query><suffix>.txt for each registered query (or the
subset named on the command line). Queries whose construction is eager
(k-means trainer, components loop) run their construction jobs; the
explain itself does not execute the final plan.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r08"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "_before"
    only = set(sys.argv[3:])
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entry
    from ocr_dataset_builder_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    spark = get_spark(
        "odb-plan-capture",
        cores=cpus,
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    qmap = entry.queries()
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = "ERROR capturing plan:\n" + traceback.format_exc()
        with open(path, "w") as fh:
            fh.write(plan)
        print(name, "->", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
