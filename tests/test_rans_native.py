"""Native rANS codec (native/rans.cpp) vs the pure-Python spec in
nflr/rans.py: byte-exact streams, cross-decoding, both dispatch paths.

The native backend is this framework's equivalent of the reference's C++
range-coder dependency (compressai, reference utils/Networks.py:1062-1086).
Skipped when native/bin/librans.so has not been built (`make -C native`).
"""
import numpy as np
import pytest

from brief_pytorch_tpu.nflr import rans

pytestmark = pytest.mark.skipif(rans._NATIVE is None,
                                reason="librans.so not built")


def _random_case(rng, n_cdfs_max=6, n_max=4000):
    cdfs = [rans.quantize_pmf(rng.dirichlet(np.ones(int(rng.integers(2, 40)))))
            for _ in range(int(rng.integers(1, n_cdfs_max)))]
    n = int(rng.integers(1, n_max))
    ch = rng.integers(0, len(cdfs), n)
    syms = np.array([rng.integers(0, len(cdfs[c]) - 1) for c in ch])
    return cdfs, ch, syms


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_byte_exact_per_channel(seed):
    rng = np.random.default_rng(seed)
    cdfs, ch, syms = _random_case(rng)
    blob_native = rans._native_encode(syms, cdfs, ch)
    blob_py = rans._encode_per_channel_py(syms, cdfs, ch)
    assert blob_native == blob_py
    # cross-decode both directions
    assert np.array_equal(rans._native_decode(blob_py, len(syms), cdfs, ch),
                          syms)
    assert np.array_equal(rans._decode_per_channel_py(blob_native, cdfs, ch),
                          syms)


def test_byte_exact_single_cdf():
    rng = np.random.default_rng(3)
    cdf = rans.quantize_pmf(rng.dirichlet(np.ones(17)))
    syms = rng.integers(0, 16, 2500)
    assert rans._native_encode(syms, [cdf], None) == \
        rans._encode_py(syms, cdf)


def test_public_api_roundtrip():
    """The public encode/decode dispatch (native when built) round-trips."""
    rng = np.random.default_rng(4)
    cdf = rans.quantize_pmf(rng.dirichlet(np.ones(9)))
    syms = rng.integers(0, 8, 1000)
    assert np.array_equal(rans.decode(rans.encode(syms, cdf), 1000, cdf),
                          syms)


def test_skewed_distribution():
    """Heavily skewed pmf with freq-1 tail symbols stays exact."""
    rng = np.random.default_rng(5)
    cdf = rans.quantize_pmf(np.asarray([0.97, 0.02, 0.009, 1e-4, 1e-9]))
    syms = rng.choice(5, 5000, p=[0.97, 0.02, 0.0098, 1e-4, 1e-4]).astype(int)
    blob = rans.encode(syms, cdf)
    assert np.array_equal(rans.decode(blob, len(syms), cdf), syms)
    assert rans._encode_py(syms, cdf) == blob
