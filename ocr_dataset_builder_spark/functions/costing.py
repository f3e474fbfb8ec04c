"""T9 — full tiered model-pricing semantics.

Rebuild of reference llm/utils/costing.py:5-150: a model→pricing dict
with optional per-model token-threshold tiers, base-model inference from
name substrings when the exact model is unknown, and missing-pricing or
missing-token-counts ⇒ 0.0.

Spark-first shape: the pricing dict is a *dimension table* — resolved
via a broadcast join (never a per-row Python lookup), with the substring
fallback expressed as a JVM CASE chain so the whole cost computation
stays inside whole-stage codegen. ``calculate_cost`` is the Python twin
used by the parity tests (tests/test_costing.py executes the reference
module directly and compares).

Also here: T8 ``human_size_col`` (reference video/processing.py:258-273)
— bytes → '3.42 MB' with the reference's exact float/round behavior.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# pricing values per reference llm/utils/costing.py:5-55 (USD per 1M tokens)
# rows: (model, threshold_tokens or None, in_low, out_low, in_high, out_high)
MODEL_PRICING_ROWS: list[tuple] = [
    ("gemini-2.5-pro-preview-05-06", 200_000, 1.25, 10.00, 2.50, 15.00),
    ("gemini-2.5-pro-preview-03-25", 200_000, 1.25, 10.00, 2.50, 15.00),
    ("gemini-1.5-pro-latest", 128_000, 1.25, 5.00, 2.50, 10.00),
    ("gemini-1.5-flash-latest", 128_000, 0.075, 0.30, 0.15, 0.60),
    ("gemini-2.0-flash-latest", None, 0.10, 0.40, None, None),
    ("gemini-2.0-flash-lite-latest", None, 0.075, 0.30, None, None),
    ("gemini-2.5-flash-preview-05-07", None, 0.15, 0.60, None, None),
    ("gemini-1.5-flash-8b-latest", 128_000, 0.0375, 0.15, 0.075, 0.30),
]

_KNOWN = {r[0] for r in MODEL_PRICING_ROWS}

PRICING_SCHEMA = (
    "model string, threshold_tokens bigint, in_low double, out_low double, "
    "in_high double, out_high double"
)


def pricing_table(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(MODEL_PRICING_ROWS, PRICING_SCHEMA)


def resolve_model_col(model: Column) -> Column:
    """Base-model inference, reference costing.py:81-100: unknown names
    containing '-pro' fall back to 1.5-pro (2.5-pro when '2.5' present);
    '-flash' falls back to 1.5-flash (2.0-flash when '2.0' present);
    anything else resolves to NULL (⇒ cost 0.0)."""
    known = model.isin(list(_KNOWN))
    return (
        F.when(known, model)
        .when(
            model.contains("-pro"),
            F.when(model.contains("2.5"), F.lit("gemini-2.5-pro-preview-05-06"))
            .otherwise(F.lit("gemini-1.5-pro-latest")),
        )
        .when(
            model.contains("-flash"),
            F.when(model.contains("2.0"), F.lit("gemini-2.0-flash-latest"))
            .otherwise(F.lit("gemini-1.5-flash-latest")),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def resolve_model_sql(model: str) -> str:
    known = ", ".join(f"'{m}'" for m in sorted(_KNOWN))
    return f"""CASE
      WHEN {model} IN ({known}) THEN {model}
      WHEN {model} LIKE '%-pro%' THEN
        CASE WHEN {model} LIKE '%2.5%' THEN 'gemini-2.5-pro-preview-05-06'
             ELSE 'gemini-1.5-pro-latest' END
      WHEN {model} LIKE '%-flash%' THEN
        CASE WHEN {model} LIKE '%2.0%' THEN 'gemini-2.0-flash-latest'
             ELSE 'gemini-1.5-flash-latest' END
      ELSE NULL END"""


def with_cost(
    df: DataFrame,
    spark: SparkSession,
    model_col: str = "model",
    in_col: str = "input_tokens",
    out_col: str = "output_tokens",
    out_name: str = "cost_usd",
) -> DataFrame:
    """Attach the tiered cost column via a broadcast join against the
    pricing dimension. NULL token counts or unresolvable models ⇒ 0.0
    (reference costing.py:76-79, 96-103)."""
    resolved = df.withColumn("_rm", resolve_model_col(F.col(model_col)))
    priced = resolved.join(
        F.broadcast(pricing_table(spark).withColumnRenamed("model", "_rm")),
        "_rm",
        "left",
    )
    tiered = F.col("threshold_tokens").isNotNull()
    use_high = tiered & (F.col(in_col) > F.col("threshold_tokens"))
    rate_in = F.when(use_high, F.col("in_high")).otherwise(F.col("in_low"))
    rate_out = F.when(use_high, F.col("out_high")).otherwise(F.col("out_low"))
    cost = (
        F.col(in_col) / F.lit(1_000_000.0) * rate_in
        + F.col(out_col) / F.lit(1_000_000.0) * rate_out
    )
    valid = (
        F.col(in_col).isNotNull()
        & F.col(out_col).isNotNull()
        & F.col("_rm").isNotNull()
    )
    return priced.withColumn(
        out_name, F.when(valid, cost).otherwise(F.lit(0.0))
    ).drop(
        "_rm", "threshold_tokens", "in_low", "out_low", "in_high", "out_high"
    )


def cost_sql(in_tok: str, out_tok: str) -> tuple[str, str]:
    """DuckDB twin of with_cost — the pricing dict inlined as a VALUES
    relation; caller joins ``pricing`` on the resolved model."""
    rows = ", ".join(
        "({})".format(
            ", ".join(
                "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else repr(v))
                for v in r
            )
        )
        for r in MODEL_PRICING_ROWS
    )
    return f"""
pricing(model, threshold_tokens, in_low, out_low, in_high, out_high) AS (
  SELECT * FROM (VALUES {rows})
)""", f"""CASE
  WHEN {in_tok} IS NULL OR {out_tok} IS NULL OR p.model IS NULL THEN 0.0
  ELSE {in_tok} / 1000000.0 *
         (CASE WHEN p.threshold_tokens IS NOT NULL AND {in_tok} > p.threshold_tokens
               THEN p.in_high ELSE p.in_low END)
     + {out_tok} / 1000000.0 *
         (CASE WHEN p.threshold_tokens IS NOT NULL AND {in_tok} > p.threshold_tokens
               THEN p.out_high ELSE p.out_low END)
END"""


def calculate_cost(
    model_name: str, input_tokens: int | None, output_tokens: int | None
) -> float:
    """Python twin (parity-tested against the reference module)."""
    if input_tokens is None or output_tokens is None:
        return 0.0
    by_name = {r[0]: r for r in MODEL_PRICING_ROWS}
    row = by_name.get(model_name)
    if row is None:
        base = None
        if "-pro" in model_name:
            base = (
                "gemini-2.5-pro-preview-05-06"
                if "2.5" in model_name
                else "gemini-1.5-pro-latest"
            )
        elif "-flash" in model_name:
            base = (
                "gemini-2.0-flash-latest"
                if "2.0" in model_name
                else "gemini-1.5-flash-latest"
            )
        row = by_name.get(base) if base else None
        if row is None:
            return 0.0
    _, threshold, in_low, out_low, in_high, out_high = row
    if threshold is not None and input_tokens > threshold:
        rate_in, rate_out = in_high, out_high
    else:
        rate_in, rate_out = in_low, out_low
    return input_tokens / 1_000_000 * rate_in + output_tokens / 1_000_000 * rate_out


# ---------------------------------------------------------------------------
# T8 — human-readable size (reference video/processing.py:258-273)
# ---------------------------------------------------------------------------

SIZE_NAMES = ("B", "KB", "MB", "GB", "TB", "PB", "EB", "ZB", "YB")


def human_size(size_bytes: int) -> str:
    """Python twin of the reference formatter."""
    if size_bytes == 0:
        return "0B"
    i = int(math.floor(math.log(size_bytes, 1024)))
    p = math.pow(1024, i)
    s = round(size_bytes / p, 2)
    return f"{s} {SIZE_NAMES[i]}"


def human_size_col(size: Column) -> Column:
    """JVM expression twin: floor(ln(size)/ln(1024)) picks the unit,
    round(size/1024^i, 2) the mantissa. Note Python's round is banker's
    at exact .xx5 ties while Spark/DuckDB round HALF_UP — real file sizes
    never land exactly on a tie (the quotient is a non-terminating
    binary fraction), so the twins agree in practice and the tests pin
    it on the synthetic corpus."""
    i = F.floor(F.log(size.cast("double")) / F.log(F.lit(1024.0))).cast("int")
    p = F.pow(F.lit(1024.0), i.cast("double"))
    s = F.round(size.cast("double") / p, 2)
    name = F.element_at(F.array(*[F.lit(n) for n in SIZE_NAMES]), i + 1)
    return F.when(size == 0, F.lit("0B")).otherwise(
        F.concat(s.cast("string"), F.lit(" "), name)
    )


def human_size_sql(size: str) -> str:
    names = ", ".join(f"'{n}'" for n in SIZE_NAMES)
    i = f"CAST(floor(ln({size}) / ln(1024)) AS INT)"
    return (
        f"CASE WHEN {size} = 0 THEN '0B' ELSE "
        f"CAST(round({size} / pow(1024, {i}), 2) AS VARCHAR) || ' ' || "
        f"(ARRAY[{names}])[{i} + 1] END"
    )
