"""W1/W2/W3/W5 semantics, pinned to the reference fixture families
(FIXTURES.md fx_frame_dedup, fx_fref_invalid, fx_same_as_prev)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_dataset_builder_spark.operators.frame_dedup import (
    SAME_AS_PREVIOUS,
    decode_fref,
    decode_fref_list,
    densify_frames,
    encode_redundancy,
    fill_same_as_previous,
)


def test_decode_list_reference_semantics():
    # fx_frame_dedup: full, identical, identical, append, full-change,
    # identical, append, identical
    vals = [
        "alpha",
        "F:0",
        "F:1",
        "F:2\nbeta",
        "gamma",
        "F:4",
        "F:5\ndelta",
        "F:6",
    ]
    assert decode_fref_list(vals) == [
        "alpha",
        "alpha",
        "alpha",
        "alpha\nbeta",
        "gamma",
        "gamma",
        "gamma\ndelta",
        "gamma\ndelta",
    ]


def test_decode_list_invalid_refs():
    # fx_fref_invalid — reference pytorch_dataset.py:234-249: no digits,
    # forward ref, self ref all keep the raw value
    vals = ["base", "F:xyz", "F:5", "F:3extra", "F:0tail"]
    assert decode_fref_list(vals) == [
        "base",
        "F:xyz",  # no digits after F:
        "F:5",  # forward ref at idx 2
        "F:3extra",  # self ref at idx 3
        "basetail",  # valid backward ref with append, no separator
    ]


def test_encode_decode_roundtrip(spark):
    # property from SURVEY.md §7.2 step 4: decode(encode(x)) == x
    rows = []
    for doc in range(6):
        n = 5 + doc
        for i in range(n):
            base = f"text {doc} {i // 3}"
            if i % 4 == 3:
                base = f"text {doc} {(i - 1) // 3}\nappended line {i}"
            rows.append((str(doc), i, base))
    df = spark.createDataFrame(rows, "doc_id string, frame_seq int, text string")
    enc = encode_redundancy(df, "text", "frame_seq")
    n_refs = enc.where(F.col("encoded").startswith("F:")).count()
    assert n_refs > 0, "fixture must exercise the encoder"
    dec = decode_fref(enc, text_col="encoded", seq_col="frame_seq")
    joined = df.join(dec, ["doc_id", "frame_seq"]).collect()
    assert len(joined) == len(rows)
    for r in joined:
        assert r["decoded"] == r["text"], (r["doc_id"], r["frame_seq"])


def test_same_as_previous_fill(spark):
    # fx_same_as_prev — chain at 1,2; invalid at frame 0; after a gap
    P = SAME_AS_PREVIOUS
    rows = [
        ("a", 0, "v0"), ("a", 1, P), ("a", 2, P), ("a", 3, "v3"), ("a", 4, P),
        ("b", 0, P), ("b", 1, "w1"), ("b", 2, P),
    ]
    df = spark.createDataFrame(rows, "doc_id string, frame_seq int, text string")
    got = {
        (r["doc_id"], r["frame_seq"]): r["filled"]
        for r in fill_same_as_previous(df).collect()
    }
    assert got == {
        ("a", 0): "v0", ("a", 1): "v0", ("a", 2): "v0",
        ("a", 3): "v3", ("a", 4): "v3",
        ("b", 0): "",  # placeholder at frame 0 -> '' (image_processing.py:326-332)
        ("b", 1): "w1", ("b", 2): "w1",
    }


def test_densify(spark):
    rows = [("a", 0, "x"), ("a", 3, "y"), ("b", 1, "z")]
    df = spark.createDataFrame(rows, "doc_id string, frame_seq int, text string")
    got = {
        (r["doc_id"], r["frame_seq"]): r["text"]
        for r in densify_frames(df).collect()
    }
    assert got == {
        ("a", 0): "x", ("a", 1): "", ("a", 2): "", ("a", 3): "y",
        ("b", 0): "", ("b", 1): "z",
    }


def test_decode_in_row_matches_list_decode(spark):
    """decode_fref_in_row (JVM aggregate fold) == decode_fref_list on the
    shared adversarial fixtures, with passenger columns preserved."""
    from ocr_dataset_builder_spark.operators.frame_dedup import decode_fref_in_row

    cases = [
        ["a", "F:0", "F:1\ntail", "F:", "F:5", "F:2", "plain", "F:xyz", "F:06x"],
        ["only"],
        ["", "F:0", "F:0stuff", "F:1"],
        ["base", "F:xyz", "F:5", "F:3extra", "F:0tail"],
    ]
    rows = [
        (str(d), i, v, f"p{d}-{i}")
        for d, vals in enumerate(cases)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, frame_seq int, encoded string, passenger string"
    )
    out = decode_fref_in_row(df, text_col="encoded", seq_col="frame_seq")
    got = {
        (r["doc_id"], r["frame_seq"]): (r["decoded"], r["passenger"])
        for r in out.collect()
    }
    assert len(got) == len(rows)
    for d, vals in enumerate(cases):
        want = decode_fref_list(vals)
        for i, w in enumerate(want):
            assert got[(str(d), i)] == (w, f"p{d}-{i}"), (d, i)
