"""Micro-bench: per-group applyInArrow crossing vs block-cut mapInArrow
at the many-tiny-groups extreme (VERDICT r7 ask #5).

``grouped_map_in_arrow`` calls ``block_fn`` once per group via
``applyInArrow`` — fine for today's callers (capped clusters/buckets,
thousands of groups), but its sibling's docstring documents a 40x cliff
for millions of tiny groups on the pandas side. This harness measures
where the cliff starts on the Arrow side: the SAME pair-verification
GEMM kernel (_near_dup_pairs_arrow's _buckets) driven through both
helpers over a replicated 128k-vector relation, with the bucket count
swept from 64 fat buckets to 65k two-row buckets (deterministic
xxhash64 bucket assignment — the regime is about group COUNT, not LSH
semantics).

Run:  python scripts/microbench_grouped.py
Emits one line per (n_buckets, helper) with the noop-forced median of 3.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REP = int(os.environ.get("MICRO_REP", "64"))  # 2000 * 64 = 128k vectors


def main() -> None:
    from pyspark.sql import functions as F

    from ocr_dataset_builder_spark.session import get_spark
    from ocr_dataset_builder_spark import queries_corpus as qc
    from ocr_dataset_builder_spark.operators.grouped import (
        grouped_blocks_in_arrow,
        grouped_map_in_arrow,
    )

    spark = get_spark(
        "microbench-grouped",
        cores=CPUS,
        shuffle_partitions=2 * CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    e = qc._vectors(spark, SF_DIR)
    big = (
        e.select(
            "vec_id",
            "v",
            F.explode(F.sequence(F.lit(0), F.lit(REP - 1))).alias("r"),
        )
        .select(
            (F.col("vec_id") + F.col("r").cast("bigint") * 1000000).alias(
                "vec_id"
            ),
            "v",
        )
        .repartition(2 * CPUS)
        .persist()
    )
    n = big.count()
    print(f"vectors: {n}", flush=True)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    results = {}
    for n_buckets in (64, 1024, 16384, 65536):
        ev = big.select(
            "vec_id",
            "v",
            F.pmod(F.xxhash64("vec_id"), F.lit(n_buckets))
            .cast("int")
            .alias("bucket"),
        )
        bsize = ev.groupBy("bucket").agg(F.count("*").alias("n"))
        ok = bsize.where(
            (F.col("n") > 1) & (F.col("n") <= qc._EMB_BUCKET_CAP)
        ).select("bucket")
        sel = ev.join(ok, "bucket").select("bucket", "vec_id", "v")

        # the exact kernel _near_dup_pairs_arrow registers — reach in so
        # both helpers run the identical block_fn
        captured = {}

        def fake_grouped(df, key, order, fn, schema):
            captured["fn"] = fn
            return None

        import ocr_dataset_builder_spark.operators.grouped as gmod

        real = gmod.grouped_map_in_arrow
        gmod.grouped_map_in_arrow = fake_grouped
        try:
            qc._near_dup_pairs_arrow(ev)
        finally:
            gmod.grouped_map_in_arrow = real
        kernel = captured["fn"]

        out_schema = "a_id bigint, b_id bigint, cos double"
        per_group = grouped_map_in_arrow(
            sel, "bucket", ["vec_id"], kernel, out_schema
        )
        blocks = grouped_blocks_in_arrow(
            sel, "bucket", ["vec_id"], kernel, out_schema
        )

        # equality first (order-insensitive)
        # cos is kernel-rounded to 4dp — an integer checksum keeps the
        # equality check exact regardless of double-sum order
        chk = F.sum(F.round(F.col("cos") * 10000).cast("bigint"))
        a = per_group.groupBy().agg(
            F.count("*"), F.sum("a_id"), F.sum("b_id"), chk
        ).collect()[0]
        b = blocks.groupBy().agg(
            F.count("*"), F.sum("a_id"), F.sum("b_id"), chk
        ).collect()[0]
        assert tuple(a) == tuple(b), (n_buckets, tuple(a), tuple(b))

        for name, df in (("per_group", per_group), ("blocks", blocks)):
            force(df)
            ts = []
            for _ in range(3):
                t0 = time.time()
                force(df)
                ts.append(time.time() - t0)
            med = round(statistics.median(ts), 3)
            results[(n_buckets, name)] = med
            print(
                f"n_buckets={n_buckets:6d} rows/bucket~{n // n_buckets:5d} "
                f"{name:10s} median={med:7.3f} samples="
                f"{[round(t, 3) for t in ts]}",
                flush=True,
            )

    print("\nsummary (n_buckets, helper) -> sec:", flush=True)
    for k, v in results.items():
        print(k, v, flush=True)
    print("loadavg:", os.getloadavg()[0], flush=True)
    big.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
