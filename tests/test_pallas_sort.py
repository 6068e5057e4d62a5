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
                                        bitonic_sort2_i32, sort_padded_i32,
                                        sort2_padded_i32)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize(
    "n", [256, 1024, pytest.param(8192, marks=pytest.mark.slow)])
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


@pytest.mark.parametrize(
    "n", [256, pytest.param(2048, marks=pytest.mark.slow)])
@pytest.mark.parametrize("static", [True, False])
def test_bitonic2_matches_lexsort(rng, n, static):
    """(hi, lo) lexicographic sort == np.lexsort; duplicate-heavy hi with
    a unique lo iota (the call site's key structure)."""
    hi = rng.integers(0, 63, n).astype(np.int32)
    lo = np.arange(n, dtype=np.int32)
    rng.shuffle(lo)
    hi_s, lo_s = bitonic_sort2_i32(jnp.asarray(hi), jnp.asarray(lo),
                                   static=static, interpret=True)
    order = np.lexsort((lo, hi))
    np.testing.assert_array_equal(np.asarray(hi_s), hi[order])
    np.testing.assert_array_equal(np.asarray(lo_s), lo[order])


@pytest.mark.slow
def test_bitonic2_extremes(rng):
    """hi spanning the full int32 range (incl. the INT32_MAX padding
    sentinel value appearing among REAL keys) still sorts correctly."""
    n = 1024
    hi = np.concatenate([
        rng.integers(-2**31, 2**31 - 1, n - 6),
        np.full(3, np.iinfo(np.int32).max),
        np.full(3, np.iinfo(np.int32).min),
    ]).astype(np.int32)
    lo = np.arange(n, dtype=np.int32)
    hi_s, lo_s = bitonic_sort2_i32(jnp.asarray(hi), jnp.asarray(lo),
                                   interpret=True)
    order = np.lexsort((lo, hi))
    np.testing.assert_array_equal(np.asarray(hi_s), hi[order])
    np.testing.assert_array_equal(np.asarray(lo_s), lo[order])


@pytest.mark.slow
def test_sort2_padded_non_pow2(rng):
    """Padded entry point at the call-site key structure: hi = cell id in
    [0, 62501] (fine_grid's range), lo = stream iota, non-pow2 n.  Must
    equal the XLA (cell, iota) num_keys=2 sort it replaces."""
    n, c3 = 3000, 62501
    hi = rng.integers(0, c3 + 1, n).astype(np.int32)
    lo = np.arange(n, dtype=np.int32)
    hi_s, lo_s = sort2_padded_i32(jnp.asarray(hi), jnp.asarray(lo),
                                  interpret=True)
    order = np.lexsort((lo, hi))
    np.testing.assert_array_equal(np.asarray(hi_s), hi[order])
    np.testing.assert_array_equal(np.asarray(lo_s), lo[order])


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


def test_sort_padded_small_n_falls_back(rng):
    """Below the kernel's 256-key minimum the padded entry points route
    to the XLA sort instead of raising (tiny smoke/debug scans)."""
    from gndnet_tpu.ops.pallas_sort import sort2_padded_i32, sort_padded_i32

    x = rng.integers(-50, 50, 100).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(sort_padded_i32(jnp.asarray(x))),
                                  np.sort(x))
    hi = rng.integers(0, 5, 60).astype(np.int32)
    lo = np.arange(60, dtype=np.int32)
    rng.shuffle(lo)
    hi_s, lo_s = sort2_padded_i32(jnp.asarray(hi), jnp.asarray(lo))
    order = np.lexsort((lo, hi))
    np.testing.assert_array_equal(np.asarray(hi_s), hi[order])
    np.testing.assert_array_equal(np.asarray(lo_s), lo[order])
