"""_np_matrix (r8): the shared dense-view helper behind every Arrow GEMM
kernel must fail LOUDLY on batches violating the uniform-dim/no-null
embedding contract — Arrow flatten() silently drops null entries and an
evenly-dividing ragged batch reshapes into wrong rows (ADVICE r7)."""

import numpy as np
import pyarrow as pa
import pytest

from ocr_dataset_builder_spark.queries_corpus import _np_matrix


def test_uniform_batch_roundtrips():
    arr = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    X = _np_matrix(arr, "t")
    assert X.shape == (3, 2)
    assert X.dtype == np.float64
    assert (X == [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]).all()


def test_ragged_that_divides_evenly_raises():
    # 2 rows, 6 values total -> reshape(2, 3) would "work" and be WRONG
    arr = pa.array([[1.0, 2.0], [3.0, 4.0, 5.0, 6.0]])
    with pytest.raises(ValueError, match="ragged"):
        _np_matrix(arr, "t")


def test_ragged_remainder_raises():
    arr = pa.array([[1.0, 2.0], [3.0]])
    with pytest.raises(ValueError, match="ragged"):
        _np_matrix(arr, "t")


def test_null_entry_raises():
    arr = pa.array([[1.0, 2.0], None, [3.0, 4.0]])
    with pytest.raises(ValueError, match="null"):
        _np_matrix(arr, "t")


def test_sliced_array_is_handled():
    # slices shift the offsets buffer relative to the values buffer;
    # list_value_length + flatten must stay consistent
    arr = pa.array([[9.0, 9.0], [1.0, 2.0], [3.0, 4.0]]).slice(1, 2)
    X = _np_matrix(arr, "t")
    assert X.shape == (2, 2)
    assert (X == [[1.0, 2.0], [3.0, 4.0]]).all()


def test_float32_input_upcasts():
    arr = pa.array([[1.5, 2.5]], type=pa.list_(pa.float32()))
    X = _np_matrix(arr, "t")
    assert X.dtype == np.float64 and X.shape == (1, 2)
