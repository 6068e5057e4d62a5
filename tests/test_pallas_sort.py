"""In-VMEM bitonic sort kernel (ops/pallas_sort.py) unit tests.

Interpret-mode at small n (the 153-stage flagship unroll is minutes-slow
in interpret); the compiled flagship-size path is exercised on device by
scripts/verify_tpu.py's canvas checks (the TPU serving engine sorts its
packed keys through this kernel) and benched by bench.py.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gndnet_tpu.ops.pallas_sort import (_schedule, bitonic_sort_i32,  # noqa: E402,E501
                                        sort_padded_i32)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("n", [256, 1024, 8192])
@pytest.mark.parametrize("static", [True, False])
def test_bitonic_matches_npsort(rng, n, static):
    x = rng.integers(-2**31, 2**31 - 1, n).astype(np.int32)
    got = np.asarray(bitonic_sort_i32(jnp.asarray(x), static=static,
                                      interpret=True))
    np.testing.assert_array_equal(got, np.sort(x))


def test_bitonic_duplicates_and_extremes(rng):
    x = np.concatenate([
        rng.integers(-5, 5, 500),
        np.full(200, np.iinfo(np.int32).max),
        np.full(200, np.iinfo(np.int32).min),
        np.zeros(124),
    ]).astype(np.int32)
    got = np.asarray(bitonic_sort_i32(jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, np.sort(x))


def test_sort_padded_non_pow2(rng):
    x = rng.integers(0, 2**31 - 2, 3000).astype(np.int32)
    got = np.asarray(sort_padded_i32(jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, np.sort(x))


def test_schedule_shape():
    s = _schedule(1024)  # log2=10 -> 10*11/2 stages
    assert s.shape == (55, 2)
    assert int(s[-1, 1]) == 1              # final pass ends at distance 1
    assert int(s[-1, 0]) == 1024           # full-array ascending block


def test_sorted_stream_semantics_with_packed_keys(rng):
    """End-to-end semantic check at the call-site's key structure: packed
    (cell << bits | iota) keys decode to a cell-sorted, ORIGINAL-ORDER-
    stable stream after the unstable bitonic sort (key uniqueness gives
    determinism; the embedded iota gives stability)."""
    n = 2048
    cells = rng.integers(0, 37, n).astype(np.int32)
    idxcap = 1 << (n - 1).bit_length()
    key = cells * idxcap + np.arange(n, dtype=np.int32)
    got = np.asarray(bitonic_sort_i32(jnp.asarray(key), interpret=True))
    cell_s, idx_s = got // idxcap, got % idxcap
    assert (np.diff(cell_s) >= 0).all()
    for c in np.unique(cells):
        np.testing.assert_array_equal(idx_s[cell_s == c],
                                      np.sort(np.nonzero(cells == c)[0]))
