"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <flagship seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...,
   "bench_docs": ..., "replication": ...}

The flagship measure is end-to-end span extraction (docs/sec) over the
deterministically replicated corpus (REP copies of the sf documents table,
doc_id offset by 1M per copy) so the timing covers a meaningful volume.
Every query is forced through the noop sink — full execution, no collect.

Scaling evidence (north rule): run scripts/scaling_bench.py, which invokes
this file at two parallelism levels and records throughput + efficiency.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Pin BLAS to one thread per process BEFORE the JVM (and its forked
# Python workers) launches: this container's OpenBLAS is built with
# MAX_THREADS=2, so every numpy GEMM in every Arrow-batch worker may
# spawn 2 threads — at local[32] the `_arrow` kernels would run up to 64
# BLAS threads on 32 cores. That both slows the kernels (oversubscription)
# and decouples "cores" from Spark parallelism, which corrupts any
# N-vs-4N comparison built on these numbers. setdefault so an explicit
# caller override still wins.
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REP = int(os.environ.get("SPARK_GRAFT_BENCH_REP", "20"))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
# median (default): robust per-query regression tracking, MAD alongside.
# best: the steady-state capability estimator the scaling runs use — on a
# multi-tenant host, neighbor spikes are additive noise, and the N-vs-4N
# efficiency metric should compare the engine, not the weather.
STAT = os.environ.get("SPARK_GRAFT_BENCH_STAT", "median")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    from ocr_dataset_builder_spark import synth
    from ocr_dataset_builder_spark.pipeline import extract_spans
    from ocr_dataset_builder_spark.operators.reassembly import reassemble_nested
    from ocr_dataset_builder_spark.session import get_spark
    from ocr_dataset_builder_spark import queries_corpus as qc
    from ocr_dataset_builder_spark import queries_spans as qs
    from ocr_dataset_builder_spark import queries_joins as qj

    spark = get_spark(
        "odb-bench",
        cores=CPUS,
        shuffle_partitions=2 * CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    flat_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_base = flat_docs.count()
    replicated = (
        flat_docs.select(
            "doc_id",
            "text",
            "n_chars",
            F.explode(F.sequence(F.lit(0), F.lit(REP - 1))).alias("r"),
        )
        .select(
            (F.col("doc_id") + F.col("r").cast("bigint") * 1000000).alias("doc_id"),
            "text",
            "n_chars",
        )
    )
    bench_docs = n_base * REP

    # contract-shaped nested input, materialized once (the pipeline's real
    # input is a stored Iceberg table; building it is not part of the
    # measured extraction)
    nested = synth.nest_span_rows(synth.derive_span_rows(replicated))
    nested = nested.repartition(2 * CPUS, "doc_id").persist()
    nested.count()  # materialize outside the timed region

    timings: dict[str, float] = {}
    dispersion: dict[str, float] = {}

    def timed(name: str, df) -> None:
        # warmup run (Python-worker spawn + pandas import + JIT + Arrow
        # pool growth all land here), then MEDIAN of RUNS steady-state
        # samples with the MAD as the dispersion signal — the sandbox
        # host carries external load spikes of up to ~2x, so a single
        # sample (or a best-of-2) makes round-over-round per-query deltas
        # unreadable; the median + MAD pair is what BASELINE.md compares
        import statistics

        force(df)
        samples = []
        for _ in range(RUNS):
            t0 = time.time()
            force(df)
            samples.append(time.time() - t0)
        med = statistics.median(samples)
        timings[name] = round(min(samples) if STAT == "best" else med, 3)
        dispersion[name] = round(
            statistics.median(abs(s - med) for s in samples), 3
        )

    def timed_factory(name: str, mk) -> None:
        # for queries that run eager work at CONSTRUCTION time (the
        # k-means trainer localCheckpoints each Lloyd iteration while
        # the DataFrame is being built): rebuild inside the timed
        # region so the sample covers the whole algorithm, and clear
        # the cache so no run reuses the previous run's checkpoints
        import statistics

        force(mk())
        samples = []
        for _ in range(RUNS):
            spark.catalog.clearCache()
            t0 = time.time()
            force(mk())
            samples.append(time.time() - t0)
        med = statistics.median(samples)
        timings[name] = round(min(samples) if STAT == "best" else med, 3)
        dispersion[name] = round(
            statistics.median(abs(s - med) for s in samples), 3
        )

    # flagship: end-to-end extraction (explode -> OCR -> cleanup -> reassembly)
    timed("flagship_extract", extract_spans(nested))
    flagship_sec = timings["flagship_extract"]

    # nested-output variant (salted two-phase collect_list)
    timed(
        "reassemble_nested",
        reassemble_nested(synth.explode_spans(nested), salt_buckets=8),
    )

    # operator headliners at the raw sf (un-replicated) scale
    timed("fref_decode", qs.q_fref_decode(spark, SF_DIR))
    timed("batch_assemble", qs.q_batch_assemble(spark, SF_DIR))
    timed("strict_join_ocr", qj.q_strict_join_ocr(spark, SF_DIR))
    timed("minhash_lsh", qc.q_minhash_lsh(spark, SF_DIR))
    timed("minhash_jaccard_verify", qc.q_minhash_jaccard_verify(spark, SF_DIR))
    timed("simhash", qc.q_simhash(spark, SF_DIR))
    timed("simhash_near", qc.q_simhash_near(spark, SF_DIR))
    timed("ngram_jaccard", qc.q_ngram_jaccard(spark, SF_DIR))
    timed("ann_cosine_topk", qc.q_ann_cosine_topk(spark, SF_DIR))
    timed("ann_ivf_assign", qc.q_ann_ivf_assign(spark, SF_DIR))
    timed("embedding_near_dup_lsh", qc.q_embedding_near_dup_lsh(spark, SF_DIR))
    timed("quality_score", qc.q_quality_score(spark, SF_DIR))
    timed("token_stats", qc.q_token_stats(spark, SF_DIR))
    timed("cost_tiered_models", qj.q_cost_tiered_models(spark, SF_DIR))

    from ocr_dataset_builder_spark import queries_events as qe
    from ocr_dataset_builder_spark import queries_html as qh

    timed("events_sessions", qe.q_events_sessions(spark, SF_DIR))
    timed("events_asof_join", qe.q_events_asof_join(spark, SF_DIR))
    timed("events_range_join", qe.q_events_range_join(spark, SF_DIR))
    timed("events_rollup", qe.q_events_rollup(spark, SF_DIR))
    timed("html_main_text", qh.q_html_main_text(spark, SF_DIR))
    timed("boilerplate_phrases", qh.q_boilerplate_phrases(spark, SF_DIR))

    from ocr_dataset_builder_spark import queries_dataset as qd
    from ocr_dataset_builder_spark import queries_refine as qr

    timed("dataset_sample", qd.q_dataset_sample(spark, SF_DIR))
    timed("parse_image_batches", qr.q_parse_image_batches(spark, SF_DIR))
    timed("length_percentiles_agg", qc.q_length_percentiles_agg(spark, SF_DIR))

    from ocr_dataset_builder_spark import queries_quality as qq

    timed("quality_repetition", qq.q_quality_repetition(spark, SF_DIR))
    timed("dedup_cross_source", qq.q_dedup_cross_source(spark, SF_DIR))
    timed("decontaminate", qq.q_decontaminate(spark, SF_DIR))
    timed("doc_chunking", qq.q_doc_chunking(spark, SF_DIR))
    timed("pack_blocks", qq.q_pack_blocks(spark, SF_DIR))
    timed("corpus_prep", qq.q_corpus_prep(spark, SF_DIR))
    timed("token_budget_sample", qq.q_token_budget_sample(spark, SF_DIR))
    timed("corpus_prep_budget", qq.q_corpus_prep_budget(spark, SF_DIR))
    timed("corpus_shuffle", qq.q_corpus_shuffle(spark, SF_DIR))
    timed("mixture_epochs", qq.q_mixture_epochs(spark, SF_DIR))
    timed("mixture_expand", qq.q_mixture_expand(spark, SF_DIR))
    timed("vocab_coverage", qq.q_vocab_coverage(spark, SF_DIR))
    timed("quality_deciles", qq.q_quality_deciles(spark, SF_DIR))
    timed("packing_stats", qq.q_packing_stats(spark, SF_DIR))
    timed("quality_filter", qq.q_quality_filter(spark, SF_DIR))
    timed("unigram_logprob", qq.q_unigram_logprob(spark, SF_DIR))
    timed("distinct_sketch", qq.q_distinct_sketch(spark, SF_DIR))
    timed("bm25_score", qq.q_bm25_score(spark, SF_DIR))
    timed("kmeans_step", qc.q_kmeans_step(spark, SF_DIR))
    timed_factory("kmeans_train", lambda: qc.q_kmeans_train(spark, SF_DIR))
    # SemDeDup: trainer runs at construction (localCheckpoint per Lloyd
    # iteration) -> factory form, same as kmeans_train
    timed_factory("semantic_dedup", lambda: qc.q_semantic_dedup(spark, SF_DIR))
    timed_factory(
        "semantic_dedup_stats",
        lambda: qc.q_semantic_dedup_stats(spark, SF_DIR),
    )
    timed_factory(
        "cluster_prototypes",
        lambda: qc.q_cluster_prototypes(spark, SF_DIR),
    )
    timed_factory("semantic_prep", lambda: qc.q_semantic_prep(spark, SF_DIR))
    # components (CC loop) run eagerly at construction -> factory form
    timed_factory(
        "dedup_best_of_cluster",
        lambda: qc.q_dedup_best_of_cluster(spark, SF_DIR),
    )
    # the trainer-sharing knob's honest MARGINAL cost: a pipeline trains
    # ONCE (held centroid relation, persisted + materialized outside the
    # timed region) and each family member pays only its own plan —
    # quantifies the r5 verdict's "one trainer job instead of four"
    timed_factory(
        "semantic_dedup_incremental",
        lambda: qc.q_semantic_dedup_incremental(spark, SF_DIR),
    )
    held_cent = qc._trained_centroids(spark, SF_DIR)[1].persist()
    held_cent.count()
    timed(
        "semantic_dedup_marginal",
        qc.q_semantic_dedup(spark, SF_DIR, centroids=held_cent),
    )
    timed(
        "semantic_dedup_stats_marginal",
        qc.q_semantic_dedup_stats(spark, SF_DIR, centroids=held_cent),
    )
    timed(
        "cluster_prototypes_marginal",
        qc.q_cluster_prototypes(spark, SF_DIR, centroids=held_cent),
    )
    timed(
        "semantic_prep_marginal",
        qc.q_semantic_prep(spark, SF_DIR, centroids=held_cent),
    )
    held_cent.unpersist()

    # the daily-crawl MARGINAL arrival cost (VERDICT r6 #4): a production
    # store holds its already-trained quantizer — hold centroids trained
    # on the STORE subset (exactly what the pure form trains, persisted +
    # materialized outside the timed region) so the sample is assignment
    # + store-compare + within-batch dedup only.
    # held artifacts are localCheckpoint()ed, not persist()ed: the query
    # carries lazy in-plan localCheckpoint barriers (one execution per
    # subtree per action), so each sample must REBUILD the plan
    # (timed_factory) or runs 2+ would reuse run 1's materialized
    # barriers and time only the tail; and clearCache() between factory
    # runs would silently unpersist a cached artifact (turning marginal
    # back into pure) while an RDD checkpoint survives it.
    held_store_cent = qc._trained_centroids(
        spark,
        SF_DIR,
        e=qc._vectors(spark, SF_DIR).where(
            F.col("vec_id") % qc._SEM_NEW_MOD < 8
        ),
    )[1].localCheckpoint()
    timed_factory(
        "semantic_dedup_incremental_marginal",
        lambda: qc.q_semantic_dedup_incremental(
            spark, SF_DIR, centroids=held_store_cent
        ),
    )
    # the TRUE arrival cost: a production store holds its kept set too
    # (it is the store), so the capacity-plan number is the pipeline API
    # with BOTH store artifacts held — assignment of the batch +
    # store-compare + within-batch dedup, nothing else.
    e_all = qc._vectors(spark, SF_DIR)
    store_e = e_all.where(F.col("vec_id") % qc._SEM_NEW_MOD < 8)
    new_e = e_all.where(F.col("vec_id") % qc._SEM_NEW_MOD >= 8)
    s_assign = qc._assign_to(store_e, held_store_cent, 1).select(
        "vec_id", "cent_id", "d2"
    )
    held_kept = (
        s_assign.select("vec_id", "cent_id")
        .join(
            qc._semantic_flags_from(s_assign, store_e)
            .where(F.col("keep"))
            .select("vec_id"),
            "vec_id",
        )
        .join(store_e, "vec_id")
        .localCheckpoint()
    )
    timed_factory(
        "semantic_incremental_arrival",
        lambda: qc.semantic_incremental_verdicts(
            new_e, held_kept, held_store_cent
        ),
    )

    # backend="arrow" production paths (round 7): the GEMM kernels real
    # clusters would run — tracked round-over-round alongside the
    # oracle-exact fold forms. Factory: the arrow trainer collect()s the
    # centroid relation at construction time.
    timed_factory(
        "kmeans_train_arrow",
        lambda: qc.q_kmeans_train(spark, SF_DIR, backend="arrow"),
    )
    timed_factory(
        "semantic_dedup_arrow",
        lambda: qc.q_semantic_dedup(spark, SF_DIR, backend="arrow"),
    )
    timed(
        "embedding_near_dup_lsh_arrow",
        qc.q_embedding_near_dup_lsh(spark, SF_DIR, backend="arrow"),
    )

    # the composed training-ready-corpus deliverable: the trainer AND the
    # two localCheckpoint stage barriers run at construction -> factory
    from ocr_dataset_builder_spark.queries_final import q_corpus_prep_final

    timed_factory(
        "corpus_prep_final", lambda: q_corpus_prep_final(spark, SF_DIR)
    )

    from ocr_dataset_builder_spark import queries_substr as qsub

    timed("substr_dup_spans", qsub.q_substr_dup_spans(spark, SF_DIR))
    timed(
        "substr_dup_spans_xx",
        qsub.q_substr_dup_spans(spark, SF_DIR, fingerprint="xxhash64"),
    )
    timed("dedup_substrings", qsub.q_dedup_substrings(spark, SF_DIR))
    timed("dedup_substr_keep_first", qsub.q_dedup_substr_keep_first(spark, SF_DIR))
    timed("dedup_substr_apply", qsub.q_dedup_substr_apply(spark, SF_DIR))
    timed("corpus_prep_substr", qsub.q_corpus_prep_substr(spark, SF_DIR))
    timed("paragraph_dedup", qsub.q_paragraph_dedup(spark, SF_DIR))
    timed("para_freq_filter", qsub.q_para_freq_filter(spark, SF_DIR))
    timed("dedup_incremental", qsub.q_dedup_incremental(spark, SF_DIR))
    timed("bloom_prefilter_stats", qsub.q_bloom_prefilter_stats(spark, SF_DIR))
    # the rollup's honest MARGINAL cost: a pipeline holds the per-doc
    # report it just signed off on (persisted + materialized outside the
    # timed region) and pays only the source join + partial agg.
    # KEY-SEMANTICS NOTE (ADVICE r6): through BENCH_r05 the
    # `substr_dup_rate` key timed the MARGINAL form (per_doc= held);
    # from BENCH_r06 on it times the PURE form and the marginal lives
    # under `substr_dup_rate_marginal`. Do not compare r<=5
    # substr_dup_rate values against r6+ ones — compare r<=5
    # substr_dup_rate to r6+ substr_dup_rate_marginal instead.
    timed("substr_dup_rate", qsub.q_substr_dup_rate(spark, SF_DIR))
    per_doc = qsub.q_dedup_substrings(spark, SF_DIR).persist()
    per_doc.count()
    timed(
        "substr_dup_rate_marginal",
        qsub.q_substr_dup_rate(spark, SF_DIR, per_doc=per_doc),
    )
    per_doc.unpersist()

    common = {
        "metric": "e2e_span_extraction_wall_sec",
        "value": flagship_sec,
        "unit": "sec",
        "runs_per_query": RUNS,
        "stat": STAT,
        "sf": SF_DIR,
        "cpus": CPUS,
        "replication": REP,
        "bench_docs": bench_docs,
        "docs_per_sec": round(bench_docs / flagship_sec, 1),
    }
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_RESULT.json"),
    )
    full = json.dumps(
        dict(common, queries=timings, queries_mad=dispersion)
    )
    # The driver parses the LAST stdout line as JSON and captures only a
    # ~2000-char tail — the full per-query map (~2.7 KB at 50+ queries)
    # got truncated mid-object in round 4 (parsed=null). So: the COMPLETE
    # result goes to the durable file; the printed final line is a
    # compact summary (flagship + the 5 costliest queries + a pointer)
    # guaranteed to fit. Spark stops first so no JVM writer interleaves.
    top5 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    top5.setdefault("flagship_extract", flagship_sec)
    compact = json.dumps(
        dict(
            common,
            queries=top5,
            n_queries=len(timings),
            queries_note="5 costliest shown; full map + MADs in result_file",
            result_file=out_path,
        )
    )
    spark.stop()
    with open(out_path, "w") as fh:
        fh.write(full + "\n")
    sys.stdout.flush()
    sys.stderr.flush()
    print(compact, flush=True)


if __name__ == "__main__":
    main()
