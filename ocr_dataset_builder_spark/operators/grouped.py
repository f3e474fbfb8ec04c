"""Partition-level grouped processing without per-group Arrow overhead.

``grouped_map_in_pandas`` is the workhorse for operators with sequential
within-group semantics (F:i decode, batch refinement): repartition on the
group key, sort within partitions, then one ``mapInPandas`` pass that cuts
groups at key boundaries, carrying a split trailing group into the next
Arrow batch. One Python crossing per batch instead of per group — with
millions of small doc groups this is the difference between 0.5 s and
20 s per stage (measured at sf0.1).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_map_in_pandas(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    block_fn: Callable[[pd.DataFrame], pd.DataFrame],
    out_schema: str,
) -> DataFrame:
    """Apply ``block_fn`` to each contiguous run of complete groups.

    ``block_fn`` receives a pandas DataFrame sorted by
    (part_cols + order_cols) containing one or more *complete* groups and
    must return the output rows (matching ``out_schema``). It can detect
    group boundaries itself via the part_cols values.

    Co-location hardening (round 7): the repartition keys on
    ``pmod(hash(part_cols), 1<<30)`` rather than the raw columns. A
    raw-column repartition is elided by Catalyst whenever the upstream
    plan is already statically hash-partitioned on the same keys (e.g.
    the caller just joined on them), and the surviving
    ENSURE_REQUIREMENTS exchange can then be re-read with AQE LOCAL
    (mapper-sliced) reads after a runtime broadcast-join conversion —
    interleaving every key through every task and silently fragmenting
    groups (measured on grouped_map_in_arrow's LSH path before its
    applyInArrow rewrite; mapInPandas declares no required distribution,
    so nothing downstream vetoes the rewrite). The hash expression never
    matches an upstream partitioning, so this exchange always
    materializes with user-repartition origin, which AQE neither
    coalesces nor local-reads; co-location still holds because the
    expression is a pure function of the group key.
    """
    sel = df.repartition(
        F.pmod(F.hash(*part_cols), F.lit(1 << 30))
    ).sortWithinPartitions(*part_cols, *order_cols)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            keys = list(zip(*[pdf[c].tolist() for c in part_cols]))
            last = keys[-1]
            cut = len(keys)
            while cut > 0 and keys[cut - 1] == last:
                cut -= 1
            carry = pdf.iloc[cut:].copy()
            if cut > 0:
                yield block_fn(pdf.iloc[:cut])
        if carry is not None and len(carry) > 0:
            yield block_fn(carry)

    return sel.mapInPandas(_run, schema=out_schema)


def iter_groups(block: pd.DataFrame, part_cols: list[str]):
    """Yield (start, end) index ranges of contiguous groups in a block."""
    keys = list(zip(*[block[c].tolist() for c in part_cols]))
    start = 0
    for i in range(1, len(keys) + 1):
        if i == len(keys) or keys[i] != keys[start]:
            yield start, i
            start = i


def grouped_map_in_arrow(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    block_fn,
    out_schema: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Arrow-native sibling of ``grouped_map_in_pandas`` for numeric-key
    kernels (GEMM over per-cluster / per-bucket vector blocks).

    Built on ``groupBy(key).applyInArrow`` — NOT on a manual
    repartition + sortWithinPartitions + mapInArrow chain. The manual
    chain is subtly unsound: ``mapInArrow`` declares no required
    distribution, so when the upstream plan is already statically
    hash-partitioned on ``key_col`` (e.g. the caller just joined on it)
    Catalyst elides the explicit repartition as redundant, and AQE may
    then convert that upstream join to a broadcast join at runtime and
    re-read its pre-planned shuffle with LOCAL reads — mapper-sliced
    partitions that interleave EVERY key through EVERY task. Measured on
    the 20k-vector LSH fixture: 6 tasks each holding ~220 of 228
    buckets, every bucket fragmented 6 ways, 18,225 of 108,153 true
    pairs emitted, flipping per session with AQE's runtime join choice.
    ``applyInArrow`` carries ClusteredDistribution(key) as a REQUIRED
    child distribution, which the planner must satisfy and AQE cannot
    break, so key co-location is guaranteed by contract.

    The explicit ``num_partitions`` repartition ahead of the groupBy
    keeps the heavy per-group compute fanned out (AQE would coalesce a
    small-bytes relation to ~1 partition and run single-threaded, the
    _fan_out lesson); when it is redundant the planner drops it and the
    applyInArrow distribution requirement still holds.

    ``block_fn`` receives a ``pyarrow.Table`` holding one or more
    COMPLETE groups, sorted by (key_col, *order_cols), and yields
    ``pyarrow.RecordBatch`` objects matching ``out_schema`` (here it is
    called once per group)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import _parse_datatype_string

    pa_schema = to_arrow_schema(_parse_datatype_string(out_schema))
    sort_keys = [(key_col, "ascending")] + [
        (c, "ascending") for c in order_cols
    ]

    def _one_group(tbl: "pa.Table") -> "pa.Table":
        tbl = tbl.sort_by(sort_keys)
        batches = list(block_fn(tbl))
        if not batches:
            return pa_schema.empty_table()
        return pa.Table.from_batches(batches).cast(pa_schema)

    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism * 2
    sel = df.repartition(num_partitions, key_col)
    return sel.groupBy(key_col).applyInArrow(_one_group, schema=out_schema)


def grouped_blocks_in_arrow(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    block_fn,
    out_schema: str,
) -> DataFrame:
    """Block-cutting Arrow sibling of ``grouped_map_in_arrow`` for the
    MANY-TINY-GROUPS regime: one Python crossing per Arrow batch instead
    of one ``applyInArrow`` call per group.

    Choosing between the two helpers (r8, measured by
    scripts/microbench_grouped.py on 128k 64-dim vectors, local[32]):

    - ``grouped_map_in_arrow`` (per-group applyInArrow): the per-group
      call costs ~12us (measured: +0.83 s end-to-end at 65,536 two-row
      buckets vs this helper — 2.31 s vs 1.48 s; at 64 fat buckets it
      WINS, 2.18 s vs 2.44 s, because the GEMM dominates and the
      block-cut carry logic is pure overhead) and the REQUIRED
      ClusteredDistribution makes co-location contractual. Use it by
      default — every current caller has capped, thousands-scale groups.
    - ``grouped_blocks_in_arrow``: when the group count reaches ~10^4+
      with <~100 rows per group, the per-group crossing dominates
      (linear in group count: a 10^6-tiny-group shape would pay ~12 s
      of pure call overhead); this form amortizes it to one crossing
      per Arrow batch. Full sweep in OPTIMIZATION_r08.md.

    Co-location: same pmod(hash(key)) user-repartition hardening as
    ``grouped_map_in_pandas`` (Catalyst cannot elide it, AQE neither
    coalesces nor local-reads a user repartition), plus
    sortWithinPartitions so ``block_fn`` sees contiguous key runs.
    ``block_fn`` has the SAME contract as grouped_map_in_arrow's: it
    receives a pyarrow.Table of one or more COMPLETE groups sorted by
    (key_col, *order_cols) and yields RecordBatches matching
    ``out_schema``; a group split across incoming Arrow batches is
    carried and re-joined before block_fn sees it."""
    import numpy as np
    import pyarrow as pa

    sel = df.repartition(
        F.pmod(F.hash(key_col), F.lit(1 << 30))
    ).sortWithinPartitions(key_col, *order_cols)

    def _run(batches):
        carry: "pa.Table | None" = None
        for b in batches:
            tbl = pa.Table.from_batches([b])
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl]).combine_chunks()
                carry = None
            n = tbl.num_rows
            if n == 0:
                continue
            k = tbl.column(key_col).to_numpy(zero_copy_only=False)
            diff = k[::-1] != k[-1]
            trail = int(np.argmax(diff)) if diff.any() else n
            cut = n - trail
            carry = tbl.slice(cut)
            if cut > 0:
                yield from block_fn(tbl.slice(0, cut))
        if carry is not None and carry.num_rows > 0:
            yield from block_fn(carry)

    return sel.mapInArrow(_run, schema=out_schema)
