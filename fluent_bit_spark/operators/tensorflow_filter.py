"""filter_tensorflow: per-record model inference over an input array.

Reference: /root/reference/plugins/filter_tensorflow/tensorflow.c —
``input_field`` names a numeric-array record key whose length must
match the model's input tensor (:326-335); values are optionally
divided by ``normalization_value`` (:368-372); the output record keeps
the input fields when ``include_input_fields`` (default on, :447-457)
and appends ``inference_time`` (double) plus ``output`` (the model's
float output array, :440-462). Mismatched/empty/non-numeric inputs
drop the record from the output with an error, which the filter
mirrors by filtering them out.

Spark shape: Arrow-batched ``mapInPandas`` — each batch stacks the
input arrays into one matrix and calls the model ONCE (the reference
runs record-at-a-time because TFLite's C API is single-row; batching
is the whole point of doing this on Spark). The model is an
injectable callable ``(np.ndarray[batch, in]) -> np.ndarray[batch,
out]``; ``load_tflite_model`` builds one from a .tflite file when the
``tflite_runtime``/``tensorflow`` wheel is present — neither ships in
this container, so tests and the driver query use
``linear_fake_model``, a deterministic integer-exact stand-in (the
Spark-side plumbing — schema, batching, normalization, validation —
is the real thing either way).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np

from pyspark.sql import DataFrame


def load_tflite_model(model_file: str, batchable: bool = False) -> Callable:
    """Model callable from a .tflite file. Requires tflite_runtime or
    tensorflow — NOT available in this environment; the import guard
    raises with a clear message (stub per the build brief)."""
    try:
        from tflite_runtime.interpreter import Interpreter  # type: ignore
    except ImportError:
        try:
            from tensorflow.lite import Interpreter  # type: ignore
        except ImportError as e:
            raise NotImplementedError(
                "tflite_runtime/tensorflow not installed in this "
                "environment; pass an explicit model callable"
            ) from e

    interp = Interpreter(model_path=model_file)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]

    def run(batch: np.ndarray) -> np.ndarray:
        rows = []
        for row in batch:  # TFLite C API is single-row, like the C
            interp.set_tensor(inp["index"], row[None, :].astype(np.float32))
            interp.invoke()
            rows.append(interp.get_tensor(out["index"])[0])
        return np.stack(rows)

    return run


def linear_fake_model(
    in_size: int, out_size: int, scale: int = 1000
) -> Callable:
    """Deterministic integer-exact stand-in: quantize inputs to
    floor(x*scale + 0.5) int64 and apply a formula-derived integer
    weight matrix W[j,i] = (j*in_size + i) % 17 - 8 — reproducible in
    plain SQL for the correctness oracle, immune to float summation
    order."""
    W = (
        (np.arange(out_size)[:, None] * in_size + np.arange(in_size)[None, :])
        % 17
        - 8
    ).astype(np.int64)

    def run(batch: np.ndarray) -> np.ndarray:
        q = np.floor(batch.astype(np.float64) * scale + 0.5).astype(np.int64)
        return q @ W.T

    return run


def tf_filter(
    df: DataFrame,
    input_field: str,
    model: Callable,
    input_size: int,
    output_type: str = "array<double>",
    include_input_fields: bool = True,
    normalization_value: float | None = None,
) -> DataFrame:
    """Batched inference pass; output schema = [input fields +]
    inference_time double + output array."""
    import time

    import pandas as pd

    in_cols = df.columns if include_input_fields else []
    base = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in in_cols
    )
    schema = (base + ", " if base else "") + (
        f"inference_time double, output {output_type}"
    )

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ok = pdf[input_field].map(
                lambda v: v is not None and len(v) == input_size
            )
            pdf = pdf[ok]
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[input_field].to_numpy()).astype(np.float64)
            if normalization_value:
                x = x / float(normalization_value)
            t0 = time.perf_counter()
            y = model(x)
            dt = time.perf_counter() - t0
            out = pdf[in_cols].copy() if in_cols else pd.DataFrame(
                index=pdf.index
            )
            out["inference_time"] = dt
            out["output"] = list(y)
            yield out

    return df.mapInPandas(infer, schema)
