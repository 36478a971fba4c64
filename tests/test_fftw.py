"""fftw module: transform roundtrips and oracle checks vs scipy."""

import numpy as np

from kvxopt_tpu import matrix
from kvxopt_tpu import fftw


def test_dft_roundtrip():
    rng = np.random.default_rng(0)
    X = matrix(rng.standard_normal((8, 3)))
    orig = np.asarray(X).copy()
    fftw.dft(X)
    assert X.typecode == "z"
    np.testing.assert_allclose(np.asarray(X),
                               np.fft.fft(orig, axis=0), atol=1e-10)
    fftw.idft(X)
    np.testing.assert_allclose(np.asarray(X).real, orig, atol=1e-10)


def test_dct_roundtrip():
    rng = np.random.default_rng(1)
    X = matrix(rng.standard_normal((16, 2)))
    orig = np.asarray(X).copy()
    fftw.dct(X)
    import scipy.fft
    np.testing.assert_allclose(np.asarray(X),
                               scipy.fft.dct(orig, axis=0), atol=1e-10)
    fftw.idct(X)
    np.testing.assert_allclose(np.asarray(X), orig, atol=1e-10)


def test_dst_roundtrip():
    rng = np.random.default_rng(2)
    X = matrix(rng.standard_normal((10, 1)))
    orig = np.asarray(X).copy()
    fftw.dst(X)
    fftw.idst(X)
    np.testing.assert_allclose(np.asarray(X), orig, atol=1e-10)


def test_dftn_roundtrip():
    rng = np.random.default_rng(3)
    X = matrix(rng.standard_normal((12, 1)))
    orig = np.asarray(X).copy()
    fftw.dftn(X, dims=(3, 4))
    fftw.idftn(X, dims=(3, 4))
    np.testing.assert_allclose(np.asarray(X).real, orig, atol=1e-10)


def test_dctn_idctn():
    rng = np.random.default_rng(4)
    X = matrix(rng.standard_normal((6, 1)))
    orig = np.asarray(X).copy()
    fftw.dctn(X, dims=(2, 3))
    fftw.idctn(X, dims=(2, 3))
    np.testing.assert_allclose(np.asarray(X), orig, atol=1e-10)
