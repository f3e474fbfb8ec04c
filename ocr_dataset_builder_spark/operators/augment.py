"""OCR-noise augmentation primitives + profiles (U4/U5 in SURVEY.md §2.9).

Re-implementation of the behaviors of reference
data/ocr_augmentations.py:36-420 with one structural change: every
stochastic choice draws from an explicit ``random.Random`` instance
instead of the module-global RNG, and the Spark stage seeds that instance
per (doc_id, offset, setting) — so retries and speculative tasks are
idempotent (SURVEY.md §4 determinism note 3).

RNG call order is kept identical to the reference so that seeding the
reference's global RNG and our instance with the same seed yields
byte-identical outputs — that is exactly what tests/test_augment.py
asserts, executing the reference module directly from /root/reference.

Reference quirks reproduced deliberately (they are part of parity):

* line joins use a literal two-character ``\\n`` (backslash + n), not a
  newline (reference ocr_augmentations.py:82,178,201,220);
* ``augment_whitespace_noise`` duplicates the preceding word when it
  meets an empty split token (reference :268-272), and inserts the extra
  space *without* removing the separator (:282-287).
"""

from __future__ import annotations

import random
import re

# the reference's literal backslash-n join quirk
LINE_JOIN = "\\n"

_SENT_SPLIT = re.compile(r"([.!?])")

DEFAULT_CHAR_MAP = {
    "l": ["1", "|"], "1": ["l", "i"], "o": ["0", "()"], "0": "o",
    "i": ["1", "l", "!"], "s": ["5", "$"], "5": "s", "a": ["@", "4"],
    "e": ["3", "€"], "t": ["7", "+"], "S": ["$", "5"], "G": ["6", "&"],
    "B": ["8", "ß"], "g": ["9", "q"], "c": ["(", "["], "k": ["<"],
    "z": ["2"], "r": ["Я"],
}


def split_sentences(text: str) -> list[str]:
    """Sentence split keeping delimiters (reference :6-28)."""
    if not text:
        return []
    parts = _SENT_SPLIT.split(text)
    sentences = []
    for i in range(0, len(parts) - 1, 2):
        s = parts[i] + parts[i + 1]
        if s.strip():
            sentences.append(s.strip())
    if len(parts) % 2 == 1 and parts[-1].strip():
        sentences.append(parts[-1].strip())
    if not sentences and text.strip():
        sentences = [text.strip()]
    return [s for s in sentences if s]


def delete_sentences(text: str, probability: float, rng: random.Random) -> str:
    if not text or probability == 0:
        return text
    sentences = split_sentences(text)
    if not sentences:
        return text
    kept = [s for s in sentences if rng.random() > probability]
    out = ""
    for i, s in enumerate(kept):
        out += s
        if i < len(kept) - 1:
            if s and s[-1] not in ".!?":
                out += " "
            elif kept[i + 1] and kept[i + 1][0].isalnum():
                out += " "
    return out


def delete_words(text: str, probability: float, rng: random.Random) -> str:
    if not text or probability == 0:
        return text
    words = text.split()
    if not words:
        return text
    return " ".join(w for w in words if rng.random() > probability)


def duplicate_lines(
    text: str, probability: float, rng: random.Random, max_duplicates: int = 1
) -> str:
    if not text or probability == 0:
        return text
    out = []
    for line in text.splitlines():
        out.append(line)
        if rng.random() < probability:
            for _ in range(rng.randint(1, max_duplicates)):
                out.append(line)
    return LINE_JOIN.join(out)


def duplicate_partial_lines(
    text: str,
    probability: float,
    segment_mode: str,
    segment_params: dict,
    rng: random.Random,
    max_duplicates: int = 1,
) -> str:
    """Duplicate a segment of a line in place (reference :84-178)."""
    if not text or probability == 0:
        return text
    out = []
    for line in text.splitlines():
        if not line.strip() or rng.random() >= probability:
            out.append(line)
            continue
        words = line.split()
        if not words:
            out.append(line)
            continue
        n_dups = rng.randint(1, max_duplicates)
        new_line = line
        for _ in range(n_dups):
            if segment_mode == "words_start" and words:
                lo, hi = segment_params["num_words"]
                n = min(rng.randint(lo, hi), len(words))
                seg = " ".join(words[:n])
                # locate end of the first n words as joined with single
                # spaces (approximate, as in the reference)
                tmp = ""
                last_idx = 0
                for i, w in enumerate(words):
                    tmp += w
                    if i < n - 1:
                        tmp += " "
                    if i == n - 1:
                        last_idx = len(tmp)
                        break
                new_line = line[:last_idx] + " " + seg + line[last_idx:]
            elif segment_mode == "words_end" and words:
                lo, hi = segment_params["num_words"]
                n = min(rng.randint(lo, hi), len(words))
                seg_words = words[-n:]
                seg = " ".join(seg_words)
                start = line.rfind(
                    seg_words[0], 0, line.rfind(seg_words[-1]) + len(seg_words[-1])
                )
                if start != -1:
                    new_line = line[:start] + seg + " " + line[start:]
            elif segment_mode == "random_ratio" and words:
                if len(words) == 1:
                    seg_words = words
                else:
                    lo, hi = segment_params["ratio_range"]
                    ratio = rng.uniform(lo, hi)
                    seg_len = max(1, int(len(words) * ratio))
                    start_idx = rng.randint(0, len(words) - seg_len)
                    seg_words = words[start_idx : start_idx + seg_len]
                seg = " ".join(seg_words)
                tmp_words = []
                added = False
                for i, w in enumerate(words):
                    tmp_words.append(w)
                    if (
                        w == seg_words[-1]
                        and words[i - len(seg_words) + 1 : i + 1] == seg_words
                        and not added
                    ):
                        tmp_words.append(seg)
                        added = True
                new_line = " ".join(tmp_words)
            line = new_line
        out.append(line)
    return LINE_JOIN.join(out)


def merge_lines(text: str, probability: float, rng: random.Random) -> str:
    if not text or probability == 0:
        return text
    lines = text.splitlines()
    if len(lines) < 2:
        return text
    out = []
    i = 0
    while i < len(lines):
        if i + 1 < len(lines) and rng.random() < probability:
            out.append(lines[i].strip() + " " + lines[i + 1].strip())
            i += 2
        else:
            out.append(lines[i])
            i += 1
    return LINE_JOIN.join(out)


def split_lines(text: str, probability: float, rng: random.Random) -> str:
    if not text or probability == 0:
        return text
    out = []
    for line in text.splitlines():
        if rng.random() < probability:
            words = line.split()
            if len(words) > 1:
                p = rng.randint(1, len(words) - 1)
                out.append(" ".join(words[:p]))
                out.append(" ".join(words[p:]))
            else:
                out.append(line)
        else:
            out.append(line)
    return LINE_JOIN.join(out)


def character_noise(
    text: str,
    probability: float,
    rng: random.Random,
    char_map: dict | None = None,
) -> str:
    if not text or probability == 0:
        return text
    cmap = char_map if char_map else DEFAULT_CHAR_MAP
    out = []
    for ch in text:
        if rng.random() < probability:
            repl = cmap.get(ch.lower())
            if not repl and ch in cmap:
                repl = cmap.get(ch)
            if repl:
                out.append(rng.choice(repl) if isinstance(repl, list) else repl)
            else:
                out.append(ch)
        else:
            out.append(ch)
    return "".join(out)


def whitespace_noise(
    text: str,
    prob_missing_space: float,
    prob_extra_space: float,
    rng: random.Random,
) -> str:
    if not text or (prob_missing_space == 0 and prob_extra_space == 0):
        return text
    words = text.split(" ")
    if len(words) <= 1:
        return text
    parts = [words[0]]
    for i in range(1, len(words)):
        if not words[i - 1] or not words[i]:
            # reference quirk (:268-272): re-appends the previous word
            if words[i - 1]:
                parts.append(words[i - 1])
            if words[i]:
                parts.append(words[i])
            continue
        r = rng.random()
        if r < prob_missing_space:
            if parts:
                parts[-1] = parts[-1] + words[i]
            else:
                parts.append(words[i])
        elif r < prob_missing_space + prob_extra_space:
            parts.append("  ")
            parts.append(words[i])
        else:
            parts.append(" ")
            parts.append(words[i])
    return "".join(p for p in parts if p)


# ---------------------------------------------------------------------------
# profiles (reference :295-420) — ids 1..10, composition order is parity
# ---------------------------------------------------------------------------


def setting_slight_stutter(t: str, r: random.Random) -> str:
    t = delete_words(t, 0.01, r)
    t = duplicate_lines(t, 0.05, r, 1)
    t = duplicate_partial_lines(t, 0.10, "words_start", {"num_words": (2, 3)}, r, 1)
    t = duplicate_partial_lines(t, 0.10, "words_end", {"num_words": (2, 3)}, r, 1)
    t = whitespace_noise(t, 0.01, 0.02, r)
    return character_noise(t, 0.005, r)


def setting_gappy_and_fragmented(t: str, r: random.Random) -> str:
    t = delete_sentences(t, 0.10, r)
    t = delete_words(t, 0.15, r)
    t = merge_lines(t, 0.02, r)
    t = split_lines(t, 0.02, r)
    return character_noise(t, 0.01, r)


def setting_overly_eager_diff(t: str, r: random.Random) -> str:
    t = delete_words(t, 0.02, r)
    t = duplicate_lines(t, 0.20, r, 2)
    t = duplicate_partial_lines(t, 0.25, "random_ratio", {"ratio_range": (0.3, 0.5)}, r, 1)
    return character_noise(t, 0.005, r)


def setting_line_boundary_chaos(t: str, r: random.Random) -> str:
    t = delete_sentences(t, 0.02, r)
    t = delete_words(t, 0.05, r)
    t = merge_lines(t, 0.20, r)
    t = split_lines(t, 0.15, r)
    t = whitespace_noise(t, 0.025, 0.05, r)
    return character_noise(t, 0.01, r)


def setting_classic_bad_ocr(t: str, r: random.Random) -> str:
    t = delete_sentences(t, 0.03, r)
    t = delete_words(t, 0.08, r)
    t = duplicate_lines(t, 0.01, r, 1)
    t = duplicate_partial_lines(t, 0.01, "random_ratio", {"ratio_range": (0.1, 0.3)}, r, 1)
    t = whitespace_noise(t, 0.015, 0.03, r)
    return character_noise(t, 0.05, r)


def setting_the_echo_chamber(t: str, r: random.Random) -> str:
    t = delete_words(t, 0.005, r)
    t = delete_sentences(t, 0.005, r)
    t = duplicate_lines(t, 0.30, r, 3)
    t = duplicate_partial_lines(t, 0.30, "random_ratio", {"ratio_range": (0.2, 0.6)}, r, 2)
    t = whitespace_noise(t, 0.001, 0.001, r)
    return character_noise(t, 0.001, r)


def setting_telegraphic_transmission(t: str, r: random.Random) -> str:
    t = delete_sentences(t, 0.15, r)
    t = delete_words(t, 0.25, r)
    t = merge_lines(t, 0.05, r)
    t = split_lines(t, 0.05, r)
    return character_noise(t, 0.01, r)


def setting_jittery_frame_capture(t: str, r: random.Random) -> str:
    t = delete_sentences(t, 0.02, r)
    t = delete_words(t, 0.07, r)
    t = duplicate_lines(t, 0.03, r, 1)
    t = duplicate_partial_lines(t, 0.15, "words_start", {"num_words": (1, 2)}, r, 1)
    t = duplicate_partial_lines(t, 0.15, "words_end", {"num_words": (1, 2)}, r, 1)
    t = whitespace_noise(t, 0.01, 0.02, r)
    return character_noise(t, 0.02, r)


def setting_minimalist_diff_max_omission(t: str, r: random.Random) -> str:
    t = delete_sentences(t, 0.25, r)
    t = delete_words(t, 0.30, r)
    t = duplicate_partial_lines(t, 0.02, "random_ratio", {"ratio_range": (0.05, 0.15)}, r, 1)
    t = whitespace_noise(t, 0.005, 0.005, r)
    return character_noise(t, 0.005, r)


def setting_comprehensive_degradation(t: str, r: random.Random) -> str:
    t = delete_sentences(t, 0.05, r)
    t = delete_words(t, 0.10, r)
    t = duplicate_lines(t, 0.10, r, 1)
    t = duplicate_partial_lines(t, 0.10, "random_ratio", {"ratio_range": (0.20, 0.30)}, r, 1)
    t = merge_lines(t, 0.05, r)
    t = split_lines(t, 0.05, r)
    t = whitespace_noise(t, 0.015, 0.03, r)
    return character_noise(t, 0.03, r)


SETTINGS = [
    setting_slight_stutter,
    setting_gappy_and_fragmented,
    setting_overly_eager_diff,
    setting_line_boundary_chaos,
    setting_classic_bad_ocr,
    setting_the_echo_chamber,
    setting_telegraphic_transmission,
    setting_jittery_frame_capture,
    setting_minimalist_diff_max_omission,
    setting_comprehensive_degradation,
]


def apply_setting(text: str, setting_id: int, seed: int) -> str:
    """Apply profile ``setting_id`` (0-based) with a per-row seed.
    Empty text short-circuits to '' (reference pytorch_dataset.py:596-601)."""
    if not text:
        return ""
    rng = random.Random(seed)
    return SETTINGS[setting_id % len(SETTINGS)](text, rng)


# ---------------------------------------------------------------------------
# Spark stage — vectorized batch UDF
# ---------------------------------------------------------------------------


def assign_settings(df, seed: int = 42):
    """Attach (setting_id, aug_seed): profile picked by a stable,
    engine-portable hash of (doc_id, span_offset) — the deterministic
    replacement for the reference's random.choice per sample (U6,
    pytorch_dataset.py:596-601). The hash is the 60-bit md5-prefix
    integer (identical in Spark and DuckDB), so the assignment itself is
    fully SQL-oracle-able (see queries_refine.q_augment_assign)."""
    from pyspark.sql import functions as F

    def _h60(salt: int):
        key = F.concat_ws(
            ":", F.col("doc_id"), F.col("span_offset").cast("string"), F.lit(str(salt))
        )
        return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")

    return df.withColumn(
        "setting_id", F.pmod(_h60(seed), F.lit(10)).cast("int")
    ).withColumn("aug_seed", F.pmod(_h60(seed + 1), F.lit(2**31)).cast("bigint"))


def duckdb_assign_sql(seed: int = 42) -> str:
    """DuckDB twin of assign_settings (same md5-prefix arithmetic)."""
    h = (
        lambda s: "('0x' || substr(md5(doc_id || ':' || CAST(span_offset AS VARCHAR)"
        f" || ':{s}'), 1, 15))::BIGINT"
    )
    return (
        f"CAST({h(seed)} % 10 AS INT) AS setting_id, "
        f"CAST({h(seed + 1)} % {2**31} AS BIGINT) AS aug_seed"
    )


def augment_stage(df, text_col: str = "text", seed: int = 42):
    """Attach (setting_id, aug_seed, augmented): portable-hash profile
    assignment (assign_settings) followed by the seeded text rewrite.
    Runs as mapInPandas over Arrow batches; the per-row Python inside the
    batch is the string-rewrite itself (inherently per-string work, same
    as the reference's augmentation functions).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    with_sid = assign_settings(df, seed=seed)

    schema = StructType(
        list(with_sid.schema.fields) + [StructField("augmented", StringType())]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["augmented"] = [
                apply_setting(t if isinstance(t, str) else "", int(s), int(sd))
                for t, s, sd in zip(pdf[text_col], pdf["setting_id"], pdf["aug_seed"])
            ]
            yield pdf

    return with_sid.mapInPandas(_run, schema=schema)
