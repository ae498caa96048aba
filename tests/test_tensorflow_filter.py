"""filter_tensorflow plumbing
(plugins/filter_tensorflow/tensorflow.c:246-470)."""

from __future__ import annotations

import numpy as np
import pytest

from fluent_bit_spark.operators.tensorflow_filter import (
    linear_fake_model,
    load_tflite_model,
    tf_filter,
)


def test_linear_fake_model_deterministic():
    m = linear_fake_model(4, 2)
    x = np.array([[0.1, -0.2, 0.3, 0.0]])
    y1, y2 = m(x), m(x)
    assert (y1 == y2).all() and y1.shape == (1, 2)
    # W[0] = [-8,-7,-6,-5]; q = [100,-200,300,0]
    assert y1[0, 0] == -8 * 100 + -7 * -200 + -6 * 300 + -5 * 0


def test_tf_filter(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [0.5, 0.5, 0.5, 0.5]),
         (3, [1.0, 2.0]),  # wrong size -> dropped
         (4, None)],       # missing -> dropped
        "id int, feat array<double>",
    )
    out = tf_filter(
        df, "feat", linear_fake_model(4, 2), input_size=4,
        output_type="array<bigint>", normalization_value=2.0,
    )
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    # include_input_fields keeps the originals; inference_time present
    assert rows[1]["feat"] == [1.0, 2.0, 3.0, 4.0]
    assert rows[1]["inference_time"] >= 0.0
    # x/2 -> [0.5,1,1.5,2] -> q [500,1000,1500,2000]
    # W[0]=[-8,-7,-6,-5]: -4000-7000-9000-10000 = -30000
    # W[1]=[-4,-3,-2,-1]: -2000-3000-3000-2000 = -10000
    assert rows[1]["output"] == [-30000, -10000]

    noin = tf_filter(
        df, "feat", linear_fake_model(4, 2), input_size=4,
        output_type="array<bigint>", include_input_fields=False,
    ).columns
    assert noin == ["inference_time", "output"]


def test_tflite_loader_stub():
    with pytest.raises(NotImplementedError):
        load_tflite_model("/nonexistent/model.tflite")
