"""Frame-feature decode parity: real .npy files through binaryFile →
mapInPandas np.load → stride/pad/mask, vs a pure-Python reimplementation
of data_helper.py:155-183's semantics."""

from __future__ import annotations

import numpy as np
import pytest

MAX_FRAMES = 4
DIM = 3


def py_spec(mat: np.ndarray, max_frames: int):
    mat = mat.astype("float32")
    n = mat.shape[0]
    if n <= max_frames:
        mask = [1] * n + [0] * (max_frames - n)
        out = np.concatenate(
            [mat, np.zeros((max_frames - n, mat.shape[1]), "float32")], axis=0
        )
    else:
        step = n // max_frames
        out = mat[list(range(0, n, step))[:max_frames]]
        mask = [1] * max_frames
    return n, out, mask


@pytest.fixture(scope="module")
def npy_dir(tmp_path_factory):
    rng = np.random.default_rng(42)
    d = tmp_path_factory.mktemp("npy")
    mats = {}
    # frame counts crossing every branch: under, exact, over (+ragged strides)
    for i, n_frames in enumerate([1, 2, MAX_FRAMES, MAX_FRAMES + 1, 7, 10, 13]):
        mat = rng.standard_normal((n_frames, DIM)).astype("float16")
        np.save(d / f"vid{i}.npy", mat)
        mats[f"vid{i}"] = mat
    return str(d), mats


def test_npy_decode_matches_spec(spark, npy_dir):
    from wx20222_bigdata_spark.operators.frames import load_frame_features

    d, mats = npy_dir
    out = {r.key: r for r in load_frame_features(spark, d, MAX_FRAMES).collect()}
    assert set(out) == set(mats)
    for key, mat in mats.items():
        n, exp_frames, exp_mask = py_spec(mat.astype("float32"), MAX_FRAMES)
        got = out[key]
        assert got.n_frames == n
        assert list(got.frame_mask) == exp_mask
        got_mat = np.array([list(row) for row in got.frames], dtype="float32")
        assert got_mat.shape == (MAX_FRAMES, DIM)
        np.testing.assert_array_equal(got_mat, exp_frames)


def test_npy_decode_rejects_pickled(spark, tmp_path):
    """allow_pickle=False: object-dtype npy (the reference's packed shards
    use pickle) must be rejected, not silently executed — loading pickled
    arrays from untrusted bytes is an RCE vector."""
    from wx20222_bigdata_spark.operators.frames import load_frame_features

    d = tmp_path / "bad"
    d.mkdir()
    np.save(d / "obj.npy", np.array([{"a": 1}], dtype=object), allow_pickle=True)
    with pytest.raises(Exception, match="(?i)pickle"):
        load_frame_features(spark, str(d), MAX_FRAMES).collect()
