"""Native packing kernels: parity with the numpy fallback."""

import numpy as np
import pytest

from nabladft_tpu.data import fastpack

pytestmark = pytest.mark.dataset


def make_columns(rng, n_mols=7):
    ns = rng.integers(2, 9, n_mols)
    offsets = np.zeros(n_mols + 1, np.int64)
    np.cumsum(ns, out=offsets[1:])
    total = int(offsets[-1])
    return (
        rng.integers(1, 17, total).astype(np.int32),
        rng.normal(size=(total, 3)).astype(np.float32),
        rng.normal(size=(total, 3)).astype(np.float32),
        rng.normal(size=n_mols).astype(np.float32),
        offsets,
    )


def test_native_kernel_builds():
    # the toolchain is part of the environment; the kernel must compile
    assert fastpack.available()


def test_pack_energy_matches_fallback(rng):
    z, pos, forces, energy, offsets = make_columns(rng)
    idx = np.array([2, 0, 5], np.int64)
    native = fastpack.pack_energy_batch(z, pos, forces, energy, offsets, idx, 4, 10)

    # force the numpy fallback by calling the internals with lib disabled
    lib_backup = fastpack._lib
    tried_backup = fastpack._tried
    fastpack._lib, fastpack._tried = None, True
    try:
        fallback = fastpack.pack_energy_batch(
            z, pos, forces, energy, offsets, idx, 4, 10
        )
    finally:
        fastpack._lib, fastpack._tried = lib_backup, tried_backup
    for a, b in zip(native, fallback):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # padding slot 3 fully masked
    assert not native[4][3]


def test_pack_square_matrices(rng):
    mats = [rng.normal(size=(n, n)).astype(np.float32) for n in (3, 5, 2)]
    out, mask = fastpack.pack_square_matrices(mats, 4, 6)
    assert out.shape == (4, 6, 6)
    for i, m in enumerate(mats):
        n = m.shape[0]
        np.testing.assert_array_equal(out[i, :n, :n], m)
        assert mask[i, :n].all() and not mask[i, n:].any()
    assert not mask[3].any()
    assert np.abs(out[0, 3:, :]).max() == 0.0
