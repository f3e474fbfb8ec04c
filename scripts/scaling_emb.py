"""Replicated-embeddings scaling evidence (round-5 verdict #4).

The sf0.1 embeddings fixture is 2,000 x dim-64 — too small for the
semantic/ANN caps to ever fire or for the "clusters bound the
quadratic" claim to be measured rather than argued. This harness:

1. BUILDS two replicated relations from the sf0.1 fixture (written once,
   read by both legs):
   - EMB (default 50x = 100,000 vectors): every base vector replicated
     with a tiny per-replica perturbation (near-dup bundles, cos ~ 1 —
     the worst case for a semantic dedup), PLUS a hot bundle of
     ``HOT`` exact-ish copies of one vector so the _SEM_CLUSTER_CAP
     skew backstop actually fires and is observable;
   - KM (default 10x = 20,000 vectors): the k-means trainer input
     (every-50th-id seeding gives 400 centroids — k grows with n, the
     SemDeDup discipline).
2. Runs, at two parallelism levels in fresh JVMs (same input, same
   shuffle policy — the sandbox stand-in for the two-cluster-size
   rule), the three embedding-family jobs:
   - kmeans_train on KM (the trainer IS this leg's timed job);
   - semantic_dedup over EMB with the HELD KM-trained quantizer (the
     production shape: quantizer trained on a sample, applied to the
     corpus — the centroids= knob exists for exactly this);
   - embedding_near_dup_lsh over EMB.
3. Reports T_N / T_4N / efficiency per job plus the cap-fire counts
   (clusters over _SEM_CLUSTER_CAP and their member total; LSH buckets
   over _EMB_BUCKET_CAP) to BENCH_SCALING.md.

Usage:
  python scripts/scaling_emb.py            # orchestrate (build + legs)
  SCALE_N / SCALE_4N / SCALE_ORDER / EMB_REP / KM_REP / HOT env knobs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = os.environ.get("EMB_BASE_SF", "/root/testdata/sf0.1")
# KM_REP must keep the every-50th-id seeds on DISTINCT base vectors
# under interleaved ids (rep in {10, 20, 25, 50}); 20 sizes a Lloyd
# pass at ~32M folds — large enough that per-job fixed costs (driver
# planning, broadcast collect, localCheckpoint) stop dominating the
# measurement (at KM_REP=10 a pass is ~9 s of compute vs ~30 s of
# floor and the efficiency number measures the floor, not the engine)
EMB_REP = int(os.environ.get("EMB_REP", "50"))
KM_REP = int(os.environ.get("KM_REP", "20"))
HOT = int(os.environ.get("HOT", "8000"))
N_CORES = os.environ.get("SCALE_N", "4")
N4_CORES = os.environ.get("SCALE_4N", "16")
# "fold" = the oracle-exact interpreted HOF kernels (the registered
# queries); "arrow" = the GEMM production path (round 7) — same plans,
# numpy kernels. The round-6 definitive run measured the fold at
# 0.31-0.65 efficiency (LSH anti-scaling); the arrow legs answer whether
# the kernel swap restores the >= 0.8 north-rule target.
BACKEND = os.environ.get("SCALE_BACKEND", "fold")


def _replicate(spark, rep: int, hot: int, out: str) -> None:
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    ks = spark.range(rep).withColumnRenamed("id", "k")
    # per-replica perturbation: +((k*7)%13)*1e-4 on dim (k%64) — keeps
    # every bundle a genuine near-dup family (cos ~ 1) without exact ties.
    # ids are INTERLEAVED (base*rep + k), not blocked (base + k*n_base):
    # the trainer seeds on vec_id % 50 == 0, and blocked ids make every
    # seed a replica of the same ~40 base vectors — Lloyd then collapses
    # 400 seeds onto ~40 effective centroids, clusters grow ~10x, and
    # the bounded quadratic blows up ~50x on only ~40 join keys
    # (measured: the first run of this harness sat at 3 of 16 cores for
    # 40+ min). Interleaving makes the same seeding rule pick distinct,
    # unperturbed (k=0) base vectors whenever rep divides 50.
    rep_df = base.crossJoin(ks).select(
        (F.col("vec_id") * rep + F.col("k")).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (
                x
                + F.when(
                    i == (F.col("k") % 64).cast("int"),
                    ((F.col("k") * 7) % 13).cast("float") * F.lit(1e-4),
                ).otherwise(F.lit(0.0))
            ).cast("float"),
        ).alias("embedding"),
        "label",
    )
    parts = [rep_df]
    if hot > 0:
        hot_src = base.where(F.col("vec_id") == 1).select("embedding", "label")
        hot_df = (
            spark.range(hot)
            .withColumnRenamed("id", "h")
            .crossJoin(F.broadcast(hot_src))
            .select(
                (F.col("h") + F.lit(10_000_000)).alias("vec_id"),
                "embedding",
                "label",
            )
        )
        parts.append(hot_df)
    out_df = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    # 64 files: parquet splits only at row-group boundaries, so the
    # legs' low maxPartitionBytes needs multiple files to fan the scan
    # out (one fat file = one effective task regardless of the knob)
    out_df.repartition(64).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )


def _build(emb_dir: str, km_dir: str) -> None:
    from ocr_dataset_builder_spark.session import get_spark

    spark = get_spark("emb-scale-build", cores=8, shuffle_partitions=16)
    _replicate(spark, EMB_REP, HOT, emb_dir)
    _replicate(spark, KM_REP, 0, km_dir)
    spark.stop()


def _leg(cores: int, emb_dir: str, km_dir: str) -> None:
    import time

    from pyspark.sql import functions as F

    from ocr_dataset_builder_spark import queries_corpus as qc
    from ocr_dataset_builder_spark.session import get_spark

    # The replicated fixture is CPU-dense but byte-tiny (~6-13 MB): at
    # the default maxPartitionBytes=128M the whole scan is ONE input
    # partition and every in-row fold runs on one core no matter how
    # many the leg has (measured: first smoke run gave T_N ~= T_4N,
    # efficiency ~0.25 on every job). Identical values on both legs —
    # same task counts, only core counts differ. At real scale the
    # input has enough blocks and this knob is moot.
    spark = get_spark(
        f"emb-scale-{cores}",
        cores=cores,
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(256 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
        },
    )
    res: dict = {"cores": cores, "backend": BACKEND}

    # leg 1: the k-means trainer itself (400 centroids over KM_REP x base)
    t0 = time.monotonic()
    e_km, cent = qc._trained_centroids(spark, km_dir, backend=BACKEND)
    n_assign = qc._assign_to(e_km, cent, 1, backend=BACKEND).count()
    res["kmeans_train_sec"] = round(time.monotonic() - t0, 3)
    res["kmeans_n"] = n_assign
    print(f"JOB kmeans_train {res['kmeans_train_sec']}s", file=sys.stderr, flush=True)
    cent = cent.persist()
    cent.count()

    # leg 2: semantic dedup over EMB with the HELD sample-trained
    # quantizer (k grows with n: 400 clusters for 100k vectors)
    t0 = time.monotonic()
    sem = qc.q_semantic_dedup(
        spark, emb_dir, centroids=cent, backend=BACKEND
    ).persist()
    res["semantic_rows"] = sem.count()
    res["semantic_dedup_sec"] = round(time.monotonic() - t0, 3)
    print(f"JOB semantic_dedup {res['semantic_dedup_sec']}s", file=sys.stderr, flush=True)

    # cap evidence from the stats rollup over the HELD flags (the
    # flags= marginal — no second quadratic pass)
    stats = qc.q_semantic_dedup_stats(spark, emb_dir, flags=sem)
    capped = stats.where(F.col("n_members") > qc._SEM_CLUSTER_CAP).agg(
        F.count("*").alias("c"), F.sum("n_members").alias("m")
    ).collect()[0]
    res["sem_capped_clusters"] = capped["c"]
    res["sem_capped_members"] = int(capped["m"] or 0)
    dropped = stats.agg(F.sum("n_dropped")).collect()[0][0]
    res["sem_dropped"] = int(dropped or 0)
    print("JOB sem_stats done", file=sys.stderr, flush=True)

    # leg 3: LSH near-dup over EMB (+ bucket-cap fire count)
    t0 = time.monotonic()
    res["lsh_pairs"] = qc.q_embedding_near_dup_lsh(
        spark, emb_dir, backend=BACKEND
    ).count()
    res["lsh_sec"] = round(time.monotonic() - t0, 3)
    print(f"JOB lsh {res['lsh_sec']}s", file=sys.stderr, flush=True)

    # leg 4: the daily-crawl ARRIVAL cost (round-6 verdict #4): both
    # store artifacts HELD (quantizer + stored-kept set — sem already
    # holds the per-vector verdicts), the timed job is assignment of a
    # 20% batch + store compare + within-batch dedup.
    kept_store = (
        sem.where(F.col("keep"))
        .select("vec_id", "cent_id")
        .join(
            spark.read.parquet(f"{emb_dir}/embeddings.parquet").select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("v"),
            ),
            "vec_id",
        )
        .where(F.col("vec_id") % qc._SEM_NEW_MOD < 8)
        .persist()
    )
    kept_store.count()
    new_batch = (
        spark.read.parquet(f"{emb_dir}/embeddings.parquet")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .where(F.col("vec_id") % qc._SEM_NEW_MOD >= 8)
    )
    t0 = time.monotonic()
    res["incr_rows"] = qc.semantic_incremental_verdicts(
        new_batch, kept_store, cent, backend=BACKEND
    ).count()
    res["incremental_arrival_sec"] = round(time.monotonic() - t0, 3)
    print(
        f"JOB incremental_arrival {res['incremental_arrival_sec']}s",
        file=sys.stderr,
        flush=True,
    )
    kept_store.unpersist()
    # same backend as the timed LSH leg so the cap evidence counts the
    # buckets that leg actually used (and the fold recompute — ~330
    # core-seconds of interpreted plane folds at 400k vectors — never
    # rides inside an arrow leg)
    b = qc.q_ann_lsh_bucket(spark, emb_dir, backend=BACKEND)
    res["lsh_capped_buckets"] = (
        b.groupBy("bucket")
        .count()
        .where(F.col("count") > qc._EMB_BUCKET_CAP)
        .count()
    )
    spark.stop()
    print("LEGJSON " + json.dumps(res))


def _run_leg(cores: str, emb_dir: str, km_dir: str) -> dict:
    # IDENTICAL heap on both legs: scaling it with cores (the rep600
    # harness's 3 GiB/core rule) both starves the small leg (the 4-core
    # leg OOMed at 12g on the LSH pair expansion the 48g leg absorbed)
    # and confounds the ratio — T_N/T_4N should measure cores, not
    # memory. The input is the same on both legs; so is the heap.
    env = dict(
        os.environ,
        SPARK_DRIVER_MEM=os.environ.get("SCALE_HEAP", "48g"),
        # pin BLAS to 1 thread/worker: this OpenBLAS allows 2 per GEMM
        # (MAX_THREADS=2), so an unpinned leg runs up to 2*cores BLAS
        # threads — the N leg then uses ~2N effective cores and the 4N
        # leg oversubscribes the host, corrupting the efficiency ratio.
        # The 2026-08-18 unpinned arrow runs in BENCH_SCALING.md measured
        # exactly that artifact.
        OPENBLAS_NUM_THREADS="1",
        OMP_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
    )
    p = subprocess.run(
        [sys.executable, __file__, "--leg", cores, emb_dir, km_dir],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        check=True,
    )
    for line in p.stdout.splitlines():
        if line.startswith("LEGJSON "):
            return json.loads(line[len("LEGJSON "):])
    raise RuntimeError(f"no LEGJSON in leg output:\n{p.stdout}\n{p.stderr}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        _leg(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--build":
        _build(sys.argv[2], sys.argv[3])
        return
    import tempfile

    work = tempfile.mkdtemp(prefix="odb_embscale_")
    emb_dir = os.path.join(work, "emb")
    km_dir = os.path.join(work, "km")
    # build in a subprocess: a stopped SparkSession's JVM lingers until
    # its python process exits, and an idle 8g JVM must not sit over
    # the timed legs
    subprocess.run(
        [sys.executable, __file__, "--build", emb_dir, km_dir],
        timeout=1800,
        check=True,
    )

    # Interleaved repeats with a per-job MIN: this host carries
    # EXTERNAL tenant load invisible to the guest's loadavg (the
    # hypervisor is shared; steal time does not show), and a single
    # sample per leg measured the weather, not the engine — the
    # 2026-08-18 runs read an impossible LSH efficiency of 1.486 and
    # kmeans anti-scaling that vanished on re-measurement. Alternating
    # 4N,N,4N,N keeps both legs' samples in the same weather window,
    # and min-of-k is the steady-state capability estimator under
    # strictly additive noise (same rationale as bench.py STAT=best).
    repeats = int(os.environ.get("SCALE_REPEATS", "2"))
    order = os.environ.get("SCALE_ORDER", "4n_first")
    keys = (
        "kmeans_train_sec",
        "semantic_dedup_sec",
        "lsh_sec",
        "incremental_arrival_sec",
    )
    loads: list[str] = []
    rn: dict = {}
    r4n: dict = {}
    for rep in range(repeats):
        pair = [N4_CORES, N_CORES] if order == "4n_first" else [N_CORES, N4_CORES]
        for cores in pair:
            with open("/proc/loadavg") as lf:
                loads.append(f"local[{cores}] rep{rep}: {lf.read().split()[0]}")
            res = _run_leg(cores, emb_dir, km_dir)
            tgt = r4n if cores == N4_CORES else rn
            for k, v in res.items():
                if k in keys and k in tgt:
                    tgt[k] = min(tgt[k], v)
                else:
                    tgt[k] = v

    def eff(key: str) -> float:
        # ratio from the ACTUAL core counts, not a hardcoded 4 — a
        # non-4x pair (SCALE_N/SCALE_4N env knobs) would otherwise
        # write a wrong efficiency column (ADVICE r6)
        core_ratio = int(N4_CORES) / int(N_CORES)
        return round((rn[key] / r4n[key]) / core_ratio, 3)

    block = f"""
## Embeddings scaling run {datetime.now(timezone.utc).isoformat(timespec="seconds")} (backend={BACKEND})

Replicated fixture: {EMB_REP}x sf0.1 = {rn["semantic_rows"]} vectors
(dim 64, near-dup bundles + one {HOT}-copy hot bundle); trainer input
{KM_REP}x = {rn["kmeans_n"]} vectors (every-50th seeding -> k grows
with n). Quantizer HELD across the semantic legs (centroids= knob —
one trainer job, the production shape). Kernel backend: **{BACKEND}**.

| job | T_N (local[{N_CORES}]) | T_4N (local[{N4_CORES}]) | efficiency |
|---|---|---|---|
| kmeans_train ({rn["kmeans_n"]} vecs) | {rn["kmeans_train_sec"]} | {r4n["kmeans_train_sec"]} | {eff("kmeans_train_sec")} |
| semantic_dedup ({rn["semantic_rows"]} vecs) | {rn["semantic_dedup_sec"]} | {r4n["semantic_dedup_sec"]} | {eff("semantic_dedup_sec")} |
| embedding_near_dup_lsh | {rn["lsh_sec"]} | {r4n["lsh_sec"]} | {eff("lsh_sec")} |
| incremental_arrival ({rn.get("incr_rows", "?")} new vecs, store artifacts held) | {rn.get("incremental_arrival_sec", "n/a")} | {r4n.get("incremental_arrival_sec", "n/a")} | {eff("incremental_arrival_sec") if "incremental_arrival_sec" in rn else "n/a"} |

Cap evidence (the bounds are MEASURED firing, not argued):
- _SEM_CLUSTER_CAP: {r4n["sem_capped_clusters"]} cluster(s) over cap
  covering {r4n["sem_capped_members"]} vectors skipped the quadratic by
  design (the hot bundle); {r4n["sem_dropped"]} vectors dropped as
  semantic dups overall.
- _EMB_BUCKET_CAP: {r4n["lsh_capped_buckets"]} LSH bucket(s) over cap
  dropped from the pair expansion; {r4n["lsh_pairs"]} verified pairs.
Leg order: {order}; {repeats} interleaved repeat(s) per leg, per-job
MIN (additive-noise rejection); pre-leg 1-min loadavg: {"; ".join(loads)}.
"""
    path = os.path.join(REPO, "BENCH_SCALING.md")
    with open(path, "a") as f:
        f.write(block)
    print(
        json.dumps(
            {
                "backend": BACKEND,
                "kmeans_eff": eff("kmeans_train_sec"),
                "semantic_eff": eff("semantic_dedup_sec"),
                "lsh_eff": eff("lsh_sec"),
                "incremental_eff": eff("incremental_arrival_sec"),
                "t4n": {
                    k: r4n[k]
                    for k in (
                        "kmeans_train_sec",
                        "semantic_dedup_sec",
                        "lsh_sec",
                        "incremental_arrival_sec",
                    )
                },
            }
        )
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
