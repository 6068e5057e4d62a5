"""Pallas suffix-segmented-reduce kernel tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gndnet_tpu.ops.pallas_segment import (
    segment_reduce_canvas,
    suffix_segment_reduce,
)


def make_sorted_stream(rng, n=1024, num_cells=37, width=8, occupancy=0.6):
    """Sorted cell ids with random run lengths (some cells empty) + values."""
    present = np.flatnonzero(rng.random(num_cells) < occupancy)
    if len(present) == 0:
        present = np.array([0])
    weights = rng.random(len(present))
    counts = np.maximum(1, (weights / weights.sum() * n).astype(int))
    while counts.sum() > n:
        counts[np.argmax(counts)] -= 1
    cells = np.repeat(present, counts)
    cells = np.concatenate(
        [cells, np.full(n - len(cells), num_cells)])  # drop segment pads
    x = rng.normal(size=(n, width)).astype(np.float32)
    return x, cells.astype(np.int32)


def suffix_reduce_oracle(x, cells, op):
    out = x.copy()
    n = len(cells)
    for i in range(n - 2, -1, -1):
        if cells[i] == cells[i + 1]:
            if op == "max":
                out[i] = np.maximum(out[i], out[i + 1])
            else:
                out[i] = out[i] + out[i + 1]
    return out


@pytest.mark.parametrize("op", ["max", "sum"])
@pytest.mark.parametrize("chunk", [128, 256, 1024])
def test_suffix_segment_reduce_matches_oracle(rng, op, chunk):
    x, cells = make_sorted_stream(rng)
    want = suffix_reduce_oracle(x, cells, op)
    got = np.asarray(suffix_segment_reduce(
        jnp.asarray(x), jnp.asarray(cells), op=op, chunk=chunk,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_run_spanning_many_chunks(rng):
    """One run covering several chunks exercises multi-step carry."""
    n, width, chunk = 1024, 4, 128
    cells = np.zeros(n, np.int32)
    cells[900:] = 5
    x = rng.normal(size=(n, width)).astype(np.float32)
    for op in ("max", "sum"):
        want = suffix_reduce_oracle(x, cells, op)
        got = np.asarray(suffix_segment_reduce(
            jnp.asarray(x), jnp.asarray(cells), op=op, chunk=chunk,
            interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        # row 0 holds the full reduction of the 900-row run
        if op == "sum":
            np.testing.assert_allclose(got[0], x[:900].sum(0), rtol=1e-3)
        else:
            np.testing.assert_allclose(got[0], x[:900].max(0), rtol=1e-5)


def test_segment_reduce_canvas_matches_scatter(rng):
    """The sorted-stream canvas equals the scatter-based segment max."""
    num_cells = 64
    x, cells = make_sorted_stream(rng, n=512, num_cells=num_cells, width=16)
    x = np.abs(x)  # post-relu-like
    canvas, counts = segment_reduce_canvas(
        jnp.asarray(x), jnp.asarray(cells), num_cells, op="max", chunk=128,
        interpret=True)
    canvas, counts = np.asarray(canvas), np.asarray(counts)

    want = np.zeros((num_cells, 16), np.float32)
    wcount = np.zeros(num_cells, np.int64)
    for row, c in zip(x, cells):
        if c < num_cells:
            want[c] = np.maximum(want[c], row)
            wcount[c] += 1
    np.testing.assert_array_equal(counts, wcount)
    np.testing.assert_allclose(canvas, want, rtol=1e-5)


def test_reduce_rejects_bad_args(rng):
    x, cells = make_sorted_stream(rng, n=256)
    with pytest.raises(ValueError, match="divisible"):
        suffix_segment_reduce(jnp.asarray(x), jnp.asarray(cells), chunk=100,
                              interpret=True)
    with pytest.raises(ValueError, match="op must be"):
        suffix_segment_reduce(jnp.asarray(x), jnp.asarray(cells), op="min",
                              interpret=True)
