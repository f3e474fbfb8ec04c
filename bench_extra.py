"""Subset benchmark for optimization iteration (round 8).

bench.py is FROZEN for driver measurement; this file exists so that
individual keys can be re-timed quickly between changes with the SAME
methodology (same session shape, noop sink, warmup + median/MAD of
$SPARK_GRAFT_BENCH_RUNS samples, factory form for eager-construction
queries). Numbers printed here are directly comparable to
BENCH_RESULT.json keys.

Usage:
  python bench_extra.py kmeans_train semantic_dedup corpus_prep_final
  python bench_extra.py           # the default heavy set

Also prints pre/post 1-min loadavg so a disturbed window self-identifies
(VERDICT r7 "What's wrong" #1).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REP = int(os.environ.get("SPARK_GRAFT_BENCH_REP", "20"))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

DEFAULT_KEYS = [
    "kmeans_train",
    "kmeans_step",
    "ann_ivf_assign",
    "semantic_dedup",
    "semantic_dedup_stats",
    "cluster_prototypes",
    "semantic_prep",
    "semantic_dedup_incremental",
    "corpus_prep_final",
    "dedup_best_of_cluster",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    from ocr_dataset_builder_spark.session import get_spark
    from ocr_dataset_builder_spark import queries_corpus as qc
    from ocr_dataset_builder_spark import queries_quality as qq
    from ocr_dataset_builder_spark import queries_substr as qsub
    from ocr_dataset_builder_spark import synth
    from ocr_dataset_builder_spark.pipeline import extract_spans
    from ocr_dataset_builder_spark.queries_final import q_corpus_prep_final

    keys = sys.argv[1:] or DEFAULT_KEYS

    load0 = os.getloadavg()[0]
    spark = get_spark(
        "odb-bench-extra",
        cores=CPUS,
        shuffle_partitions=2 * CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # factories per bench.py semantics: eager-construction queries are
    # rebuilt inside the timed region (with clearCache between runs)
    def flagship_factory():
        flat_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        replicated = (
            flat_docs.select(
                "doc_id",
                "text",
                "n_chars",
                F.explode(F.sequence(F.lit(0), F.lit(REP - 1))).alias("r"),
            )
            .select(
                (F.col("doc_id") + F.col("r").cast("bigint") * 1000000).alias(
                    "doc_id"
                ),
                "text",
                "n_chars",
            )
        )
        nested = synth.nest_span_rows(synth.derive_span_rows(replicated))
        nested = nested.repartition(2 * CPUS, "doc_id").persist()
        nested.count()
        return extract_spans(nested)

    FACTORIES = {
        "kmeans_train": lambda: qc.q_kmeans_train(spark, SF_DIR),
        "kmeans_train_arrow": lambda: qc.q_kmeans_train(
            spark, SF_DIR, backend="arrow"
        ),
        "semantic_dedup": lambda: qc.q_semantic_dedup(spark, SF_DIR),
        "semantic_dedup_arrow": lambda: qc.q_semantic_dedup(
            spark, SF_DIR, backend="arrow"
        ),
        "semantic_dedup_stats": lambda: qc.q_semantic_dedup_stats(spark, SF_DIR),
        "cluster_prototypes": lambda: qc.q_cluster_prototypes(spark, SF_DIR),
        "semantic_prep": lambda: qc.q_semantic_prep(spark, SF_DIR),
        "semantic_dedup_incremental": lambda: qc.q_semantic_dedup_incremental(
            spark, SF_DIR
        ),
        "dedup_best_of_cluster": lambda: qc.q_dedup_best_of_cluster(
            spark, SF_DIR
        ),
        "corpus_prep_final": lambda: q_corpus_prep_final(spark, SF_DIR),
        # VERDICT r7 ask #7: the composed deliverable's production
        # (GEMM) cost, tracked alongside the family's other _arrow keys
        "corpus_prep_final_arrow": lambda: q_corpus_prep_final(
            spark, SF_DIR, backend="arrow"
        ),
    }
    PLAIN = {
        "kmeans_step": lambda: qc.q_kmeans_step(spark, SF_DIR),
        "ann_ivf_assign": lambda: qc.q_ann_ivf_assign(spark, SF_DIR),
        "ann_ivf_trained": lambda: qc.q_ann_ivf_trained(spark, SF_DIR),
        "ann_ivf_probe": lambda: qc.q_ann_ivf_probe(spark, SF_DIR),
        "ann_recall": lambda: qc.q_ann_recall(spark, SF_DIR),
        "ann_cosine_topk": lambda: qc.q_ann_cosine_topk(spark, SF_DIR),
        "embedding_near_dup_lsh": lambda: qc.q_embedding_near_dup_lsh(
            spark, SF_DIR
        ),
        "embedding_near_dup_lsh_arrow": lambda: qc.q_embedding_near_dup_lsh(
            spark, SF_DIR, backend="arrow"
        ),
        "ngram_jaccard": lambda: qc.q_ngram_jaccard(spark, SF_DIR),
        "minhash_lsh": lambda: qc.q_minhash_lsh(spark, SF_DIR),
        "minhash_jaccard_verify": lambda: qc.q_minhash_jaccard_verify(
            spark, SF_DIR
        ),
        "substr_dup_spans": lambda: qsub.q_substr_dup_spans(spark, SF_DIR),
        "dedup_substrings": lambda: qsub.q_dedup_substrings(spark, SF_DIR),
        "dedup_substr_keep_first": lambda: qsub.q_dedup_substr_keep_first(
            spark, SF_DIR
        ),
        "dedup_substr_apply": lambda: qsub.q_dedup_substr_apply(spark, SF_DIR),
        "corpus_prep_substr": lambda: qsub.q_corpus_prep_substr(spark, SF_DIR),
        "bloom_prefilter_stats": lambda: qsub.q_bloom_prefilter_stats(
            spark, SF_DIR
        ),
        "dedup_incremental": lambda: qsub.q_dedup_incremental(spark, SF_DIR),
        "substr_dup_rate": lambda: qsub.q_substr_dup_rate(spark, SF_DIR),
        "corpus_prep_budget": lambda: qq.q_corpus_prep_budget(spark, SF_DIR),
        "token_budget_sample": lambda: qq.q_token_budget_sample(spark, SF_DIR),
        "quality_filter": lambda: qq.q_quality_filter(spark, SF_DIR),
        "dedup_cross_source": lambda: qq.q_dedup_cross_source(spark, SF_DIR),
        "flagship_extract": flagship_factory,
        "quality_deciles": lambda: qq.q_quality_deciles(spark, SF_DIR),
        "distinct_sketch": lambda: qq.q_distinct_sketch(spark, SF_DIR),
        "vocab_coverage": lambda: qq.q_vocab_coverage(spark, SF_DIR),
        "unigram_logprob": lambda: qq.q_unigram_logprob(spark, SF_DIR),
        "paragraph_dedup": lambda: qsub.q_paragraph_dedup(spark, SF_DIR),
        "para_freq_filter": lambda: qsub.q_para_freq_filter(spark, SF_DIR),
        "simhash": lambda: qc.q_simhash(spark, SF_DIR),
        "simhash_near": lambda: qc.q_simhash_near(spark, SF_DIR),
    }

    results: dict[str, float] = {}
    mads: dict[str, float] = {}
    for key in keys:
        if key in FACTORIES:
            mk = FACTORIES[key]
            force(mk())
            samples = []
            for _ in range(RUNS):
                spark.catalog.clearCache()
                t0 = time.time()
                force(mk())
                samples.append(time.time() - t0)
        elif key in PLAIN:
            df = PLAIN[key]()
            force(df)
            samples = []
            for _ in range(RUNS):
                t0 = time.time()
                force(df)
                samples.append(time.time() - t0)
        else:
            print(f"?? unknown key {key}", flush=True)
            continue
        med = statistics.median(samples)
        results[key] = round(med, 3)
        mads[key] = round(statistics.median(abs(s - med) for s in samples), 3)
        print(f"{key:36s} {med:8.3f} mad={mads[key]:.3f}", flush=True)

    load1 = os.getloadavg()[0]
    spark.stop()
    print(
        json.dumps(
            {
                "queries": results,
                "queries_mad": mads,
                "sf": SF_DIR,
                "cpus": CPUS,
                "runs": RUNS,
                "loadavg_pre": round(load0, 2),
                "loadavg_post": round(load1, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
