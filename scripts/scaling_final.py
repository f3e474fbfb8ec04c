"""corpus_prep_final scaling evidence (round-6 verdict #4).

The composed deliverable is the suite's costliest query and had only
ever run at sf0.1 rep20; its three-localCheckpoint barrier structure is
exactly what could behave differently at 30x rows. This harness:

1. BUILDS a replicated corpus from sf0.1 (written once, read by both
   legs): every document replicated DOC_REP times with a per-copy text
   suffix (" #rN") so the exact-dedup stage does NOT collapse replicas
   (identical texts would md5-collide and shrink the downstream chain
   back to 1x — the scaling run must carry the volume THROUGH all seven
   stages), interleaved doc_ids (base*rep + k, the scaling_emb lesson);
   embeddings replicated the same way with the per-replica perturbation
   so the semantic stage sees genuine near-dup clusters.
2. Runs q_corpus_prep_final at two parallelism levels in fresh JVMs on
   the same input (the sandbox stand-in for the two-cluster-size rule),
   splitting each timing into time-to-barriers (DataFrame construction —
   the three localCheckpoints for stages 1-4 run here) vs stream force
   (stages 5-7 + the final text join), per the verdict's ask.
3. Appends T_N / T_4N / efficiency (+ the barrier/stream split) to
   BENCH_SCALING.md.

Usage:
  python scripts/scaling_final.py
  SCALE_N / SCALE_4N / SCALE_ORDER / DOC_REP / SCALE_BACKEND env knobs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = os.environ.get("FINAL_BASE_SF", "/root/testdata/sf0.1")
DOC_REP = int(os.environ.get("DOC_REP", "30"))
N_CORES = os.environ.get("SCALE_N", "8")
N4_CORES = os.environ.get("SCALE_4N", "32")
BACKEND = os.environ.get("SCALE_BACKEND", "fold")


def _build(out: str) -> None:
    from pyspark.sql import functions as F

    from ocr_dataset_builder_spark.session import get_spark

    spark = get_spark("final-scale-build", cores=8, shuffle_partitions=16)
    ks = spark.range(DOC_REP).withColumnRenamed("id", "k")

    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    # Every replica's text must differ from its siblings' at the
    # SUBSTRING-WINDOW level, not just as a whole: a mere " #rN" suffix
    # defeats exact dedup but leaves every _SUBSTR_W-token window of the
    # shared body identical across the 30 copies, so the composed
    # chain's substring stage (CORRECTLY) empties 29 of every 30
    # replicas and stages 4-7 run on ~nothing — measured: 15,000 docs ->
    # 2 survivors -> 0 output rows, a degenerate "30x" run. Interleaving
    # a per-replica marker token every 4 words guarantees no 8-token
    # window is shared between replicas (W=_SUBSTR_W=8), so the volume
    # rides through ALL seven stages; within-replica (1x-natural)
    # duplication is preserved.
    marked = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda x, i: F.when(
                i % 4 == 3,
                F.concat(x, F.lit(" @r"), F.col("k").cast("string")),
            ).otherwise(x),
        ),
        " ",
    )
    # Replica ids preserve the BASE doc's residue mod _PROBE_MOD (97):
    # id = (base*REP + k)*97 + base%97. With the naive base*REP + k,
    # gcd(REP, 97) = 1 puts ~REP/97 of EVERY base doc's replicas into
    # the decontamination probe set, and the other replicas (sharing
    # the base's shingles) get flagged contaminated — measured 14,632
    # of 14,845 docs wiped at stage 1. Residue-preserving ids make a
    # replica a probe doc iff its BASE is one, exactly the 1x
    # relationship; probe replicas never enter the corpus (the d
    # filter drops them) and contamination reverts to base-corpus
    # rates. Ids stay interleaved for the every-50th centroid seeding.
    rep_docs = docs.crossJoin(ks).select(
        (
            (F.col("doc_id") * DOC_REP + F.col("k")) * 97
            + F.col("doc_id") % 97
        ).alias("doc_id"),
        "source",
        F.concat(marked, F.lit(" #r"), F.col("k")).alias("text"),
        *[
            c
            for c in docs.columns
            if c not in ("doc_id", "source", "text")
        ],
    )
    rep_docs.repartition(64).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    rep_emb = emb.crossJoin(ks).select(
        (
            (F.col("vec_id") * DOC_REP + F.col("k")) * 97
            + F.col("vec_id") % 97
        ).alias("vec_id"),
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
    rep_emb.repartition(64).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )
    spark.stop()


def _leg(cores: int, sf_dir: str) -> None:
    import time

    from ocr_dataset_builder_spark.queries_final import q_corpus_prep_final
    from ocr_dataset_builder_spark.session import get_spark

    spark = get_spark(
        f"final-scale-{cores}",
        cores=cores,
        shuffle_partitions=2 * cores,
        extra_conf={
            # same rationale as scaling_emb: byte-tiny, CPU-dense input
            "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024),
        },
    )
    res: dict = {"cores": cores, "backend": BACKEND}
    t0 = time.monotonic()
    df = q_corpus_prep_final(spark, sf_dir, backend=BACKEND)
    res["barriers_sec"] = round(time.monotonic() - t0, 3)
    t1 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    res["stream_sec"] = round(time.monotonic() - t1, 3)
    res["total_sec"] = round(time.monotonic() - t0, 3)
    res["rows"] = df.count()
    res["docs_in"] = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.stop()
    print("LEGJSON " + json.dumps(res))


def _run_leg(cores: str, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_DRIVER_MEM=os.environ.get("SCALE_HEAP", "48g"),
        # pin BLAS to 1 thread/worker: this OpenBLAS allows 2 per GEMM
        # (MAX_THREADS=2), so an unpinned leg runs up to 2*cores BLAS
        # threads — the N leg then uses ~2N effective cores and the 4N
        # leg oversubscribes the host, corrupting the efficiency ratio.
        OPENBLAS_NUM_THREADS="1",
        OMP_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
    )
    p = subprocess.run(
        [sys.executable, __file__, "--leg", cores, sf_dir],
        env=env,
        capture_output=True,
        text=True,
        timeout=5400,
        check=True,
    )
    for line in p.stdout.splitlines():
        if line.startswith("LEGJSON "):
            return json.loads(line[len("LEGJSON "):])
    raise RuntimeError(f"no LEGJSON in leg output:\n{p.stdout}\n{p.stderr}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        _leg(int(sys.argv[2]), sys.argv[3])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--build":
        _build(sys.argv[2])
        return
    import tempfile

    work = tempfile.mkdtemp(prefix="odb_finalscale_")
    subprocess.run(
        [sys.executable, __file__, "--build", work], timeout=1800, check=True
    )

    # Interleaved repeats + per-key MIN, same rationale as scaling_emb:
    # the hypervisor host carries external tenant load invisible to the
    # guest loadavg, and a single sample per leg measures the weather.
    repeats = int(os.environ.get("SCALE_REPEATS", "2"))
    order = os.environ.get("SCALE_ORDER", "4n_first")
    keys = ("barriers_sec", "stream_sec", "total_sec")
    loads: list[str] = []
    rn: dict = {}
    r4n: dict = {}
    for rep in range(repeats):
        pair = [N4_CORES, N_CORES] if order == "4n_first" else [N_CORES, N4_CORES]
        for cores in pair:
            with open("/proc/loadavg") as lf:
                loads.append(f"local[{cores}] rep{rep}: {lf.read().split()[0]}")
            res = _run_leg(cores, work)
            if res.get("rows", 0) == 0:
                # a zero-row deliverable means a pipeline stage
                # annihilated the replication (see the _build marker
                # comment) — the timings measure a degenerate chain;
                # fail LOUDLY on the rep that produced it (ADVICE r7:
                # the end-of-run check only saw the LAST rep, so an
                # earlier degenerate rep was silently accepted)
                raise RuntimeError(
                    f"degenerate scaling rep: local[{cores}] rep{rep} "
                    "produced a 0-row deliverable — fixture did not "
                    "survive the chain"
                )
            tgt = r4n if cores == N4_CORES else rn
            for k, v in res.items():
                if k in keys and k in tgt:
                    tgt[k] = min(tgt[k], v)
                else:
                    # non-timing fields (rows, docs_in, caps): reps run
                    # the identical deterministic plan, so these must
                    # agree — assert instead of silently keeping the
                    # last rep's value (ADVICE r7: min-of-timings could
                    # otherwise mix reps with mismatched row evidence)
                    if k in tgt and tgt[k] != v:
                        raise RuntimeError(
                            f"rep-to-rep mismatch for {k!r} on "
                            f"local[{cores}]: {tgt[k]!r} vs {v!r}"
                        )
                    tgt[k] = v

    core_ratio = int(N4_CORES) / int(N_CORES)

    def eff(key: str) -> float:
        return round((rn[key] / r4n[key]) / core_ratio, 3)

    block = f"""
## corpus_prep_final scaling run {datetime.now(timezone.utc).isoformat(timespec="seconds")} (backend={BACKEND})

Replicated corpus: {DOC_REP}x sf0.1 = {rn["docs_in"]} documents
(per-replica marker tokens every 4 words — no shared substring window
between replicas; probe-residue-preserving ids — a replica is an eval
doc iff its base is) + {DOC_REP}x embeddings (perturbed near-dup
bundles), output {rn["rows"]} training-stream rows. The funnel is the
CHAIN'S OWN semantics, not fixture loss: the synthetic corpus's tiny
vocab saturates the shingle space (decontaminate flags 94% at plain
1x sf0.1 already) and the semantic stage correctly thins the 30
near-identical replica embeddings back to ~1 — so stages 1-4
(decontaminate probe join, exact dedup, the substring machinery, the
semantic assign+fold) carry the FULL {DOC_REP}x volume while stages
5-7 run on the ~1x survivor set. Barriers = DataFrame construction
(the three stage-1..4 localCheckpoints run here); stream = stages 5-7
force + final text join.

| leg | barriers | stream | total |
|---|---|---|---|
| local[{N_CORES}] | {rn["barriers_sec"]} | {rn["stream_sec"]} | {rn["total_sec"]} |
| local[{N4_CORES}] | {r4n["barriers_sec"]} | {r4n["stream_sec"]} | {r4n["total_sec"]} |

Efficiency (T_N/T_4N)/{core_ratio:g}: barriers {eff("barriers_sec")},
stream {eff("stream_sec")}, total {eff("total_sec")}. Leg order: {order};
{repeats} interleaved repeat(s) per leg, per-key MIN; pre-leg 1-min
loadavg: {"; ".join(loads)}.
"""
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "a") as f:
        f.write(block)
    print(
        json.dumps(
            {
                "backend": BACKEND,
                "total_eff": eff("total_sec"),
                "barriers_eff": eff("barriers_sec"),
                "stream_eff": eff("stream_sec"),
                "rows": r4n["rows"],
                "t4n_total": r4n["total_sec"],
                "tn_total": rn["total_sec"],
            }
        )
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
