"""Generate the committed e5c fixture set: per-key npy frame-feature files
plus the expected decode stats (pure-Python/numpy spec, independent of the
Spark kernel) as parquet.

Run once from the repo root; outputs are committed so the declared
``e5c_decode_features`` query and its DuckDB oracle are reproducible without
regeneration. Deterministic: seeded numpy RNG, fixed file set.

Mirrors the reference's frame-feature store (``data_helper.py:91,155-183``):
float16 (n_frames, dim) matrices, n_frames spanning the pad (< MAX_FRAMES),
exact (== MAX_FRAMES) and stride-sample (> MAX_FRAMES) paths.
"""

from __future__ import annotations

import io
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parents[1]
NPY_DIR = REPO / "fixtures" / "e5c_npy"
EXPECTED = REPO / "fixtures" / "e5c_expected.parquet"

SEED = 20260813
N_FILES = 64
DIM = 16
MAX_FRAMES = 32


def expected_stats(buf: bytes, max_frames: int) -> tuple[int, int, int, float]:
    """Independent decode spec: (n_frames, n_kept, dim, feat_sum).

    feat_sum is a strictly sequential left fold in double over the
    row-major stride-sampled/zero-padded float32 matrix — the same order
    Spark's ``aggregate(flatten(frames), ...)`` folds in."""
    mat = np.load(io.BytesIO(buf), allow_pickle=False).astype("float32")
    n = mat.shape[0]
    if n <= max_frames:
        rows = [[float(v) for v in row] for row in mat]
        rows += [[0.0] * mat.shape[1] for _ in range(max_frames - n)]
        n_kept = n
    else:
        step = n // max_frames
        idx = list(range(0, n, step))[:max_frames]
        rows = [[float(v) for v in mat[i]] for i in idx]
        n_kept = max_frames
    acc = 0.0
    for row in rows:
        for v in row:
            acc += v
    return n, n_kept, mat.shape[1], round(acc, 6)


def main() -> None:
    NPY_DIR.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED)
    keys, n_frames_l, n_kept_l, dim_l, sums = [], [], [], [], []
    for i in range(N_FILES):
        # frame counts sweep 3..70: pad (<32), exact (==32), stride (>32)
        n = [3 + i, 32, 33 + i, 70 - (i % 16)][i % 4]
        n = max(1, min(n, 70))
        mat = (rng.standard_normal((n, DIM)) * 0.5).astype("float16")
        key = f"vid{i:04d}"
        path = NPY_DIR / f"{key}.npy"
        np.save(path, mat, allow_pickle=False)
        nf, nk, d, s = expected_stats(path.read_bytes(), MAX_FRAMES)
        keys.append(key)
        n_frames_l.append(nf)
        n_kept_l.append(nk)
        dim_l.append(d)
        sums.append(s)
    table = pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "n_frames": pa.array(n_frames_l, pa.int32()),
            "n_kept": pa.array(n_kept_l, pa.int64()),
            "dim": pa.array(dim_l, pa.int32()),
            "feat_sum": pa.array(sums, pa.float64()),
        }
    )
    pq.write_table(table, EXPECTED)
    print(f"wrote {N_FILES} npy files to {NPY_DIR} and {EXPECTED}")


if __name__ == "__main__":
    main()
