"""Frame-feature pipeline — the reference's visual path done for real
(SURVEY.md §2.1 S2, §2.6 O1/O3; ``data_helper.py:91,155-183``).

The reference ``np.load``s per-video float16 matrices of shape
(num_frames, dim), then per sample: frames ≤ max → zero-pad + mask;
frames > max → uniform stride sample (test mode). Here the npy bytes are
*actually parsed* in the executor kernel (numpy is a worker dependency —
no stub needed, unlike image codecs), so the ``binaryFile`` scan → decode
→ sample/pad/mask chain is the reference's pipeline end to end:

- bytes never touch the driver; Arrow carries (key, bytes) batches;
- the decode kernel is a self-contained closure (cloudpickle by value);
- sampling/padding semantics mirror ``data_helper.py:155-183`` exactly
  and are pinned by tests/test_frames.py against a pure-Python spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

FLOAT_STORE_DTYPE = "float16"  #: at-rest dtype (data_helper.py:156 "float16")


def decode_frame_features(
    binary_df: DataFrame, max_frames: int = 32
) -> DataFrame:
    """(key, content) → (key, n_frames, frames, frame_mask).

    ``frames`` is the float32 (≤max_frames, dim) matrix as
    array<array<float>>, stride-sampled when over-长 and zero-padded when
    under; ``frame_mask`` marks real rows 1 / padding 0 — exactly the
    (frame_input, frame_mask) pair of ``data_helper.py:212-222``."""

    def kernel(batches):
        import io

        import numpy as np
        import pandas as pd

        def process(buf: bytes):
            mat = np.load(io.BytesIO(buf), allow_pickle=False)
            mat = mat.astype("float32")  # f16 store -> f32 compute (:157)
            n = mat.shape[0]
            if n <= max_frames:
                mask = [1] * n + [0] * (max_frames - n)
                pad = np.zeros((max_frames - n, mat.shape[1]), dtype="float32")
                out = np.concatenate([mat, pad], axis=0)
            else:
                # uniform stride: every (n // max)-th frame, first max
                # (data_helper.py:168-172)
                step = n // max_frames
                idx = list(range(0, n, step))[:max_frames]
                out = mat[idx]
                mask = [1] * max_frames
            return n, [[float(v) for v in row] for row in out], mask

        for pdf in batches:
            decoded = pdf["content"].map(process)
            yield pd.DataFrame(
                {
                    "key": pdf["key"],
                    "n_frames": decoded.map(lambda t: t[0]).astype("int32"),
                    "frames": decoded.map(lambda t: t[1]),
                    "frame_mask": decoded.map(lambda t: t[2]),
                }
            )

    return binary_df.mapInPandas(
        kernel,
        "key string, n_frames int, frames array<array<float>>, frame_mask array<int>",
    )


def load_frame_features(spark, features_dir: str, max_frames: int = 32) -> DataFrame:
    """S2/S3 end to end: keyed binaryFile scan → npy decode → sample/pad."""
    from wx20222_bigdata_spark.sources import read_keyed_binary_dir

    raw = read_keyed_binary_dir(spark, features_dir)
    return decode_frame_features(raw.select("key", "content"), max_frames=max_frames)
