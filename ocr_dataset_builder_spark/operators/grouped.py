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
    """
    sel = df.repartition(*part_cols).sortWithinPartitions(*part_cols, *order_cols)

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

    Repartitions on ``key_col`` (explicit ``num_partitions`` — an
    explicit count is respected by AQE, which would otherwise coalesce a
    small-bytes relation to ONE partition and run the heavy per-group
    compute single-threaded, the _fan_out lesson), sorts within
    partitions by (key, order_cols), then one ``mapInArrow`` pass that
    cuts at key boundaries, carrying a split trailing group into the
    next batch. ``block_fn`` receives a ``pyarrow.Table`` holding one or
    more COMPLETE groups and yields ``pyarrow.RecordBatch`` objects
    matching ``out_schema``."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism * 2
    sel = df.repartition(num_partitions, key_col).sortWithinPartitions(
        key_col, *order_cols
    )

    def _run(batches):
        import numpy as np
        import pyarrow as pa

        carry = None
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl])
                carry = None
            if tbl.num_rows == 0:
                continue
            keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
            # rows of the last key may continue in the next batch
            neq = np.flatnonzero(keys != keys[-1])
            cut = int(neq[-1]) + 1 if len(neq) else 0
            carry = tbl.slice(cut)
            if cut:
                yield from block_fn(tbl.slice(0, cut))
        if carry is not None and carry.num_rows:
            yield from block_fn(carry)

    return sel.mapInArrow(_run, schema=out_schema)
