"""Parity of host reference ops vs scipy/np (the reference's actual backend)."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from hsip_tpu.kernels import reference as ref


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(42)
    imgs = [
        rng.uniform(0, 4095, size=(32, 96)),
        rng.uniform(0, 4095, size=(17, 33)),  # odd dims
    ]
    # A sparse/speckled image (morphology stress case).
    sparse = np.zeros((24, 64))
    sparse[rng.integers(0, 24, 60), rng.integers(0, 64, 60)] = rng.uniform(
        10, 100, 60
    )
    imgs.append(sparse)
    return imgs


@pytest.mark.parametrize("k", [2, 3, 4, 5])
def test_grey_opening_matches_scipy(images, k):
    for img in images:
        ours = ref.grey_opening(img, (k, k))
        scipys = ndi.grey_opening(img, size=(k, k))
        np.testing.assert_allclose(ours, scipys, atol=0)


@pytest.mark.parametrize("k", [2, 3, 5])
def test_grey_erosion_dilation_match_scipy(images, k):
    img = images[0]
    np.testing.assert_allclose(
        ref.grey_erosion(img, (k, k)), ndi.grey_erosion(img, size=(k, k))
    )
    np.testing.assert_allclose(
        ref.grey_dilation(img, (k, k)), ndi.grey_dilation(img, size=(k, k))
    )


@pytest.mark.parametrize("sigma", [0.5, 1.5, 2.0, 3.7])
def test_gaussian_filter_matches_scipy(images, sigma):
    for img in images:
        ours = ref.gaussian_filter(img, sigma)
        scipys = ndi.gaussian_filter(img, sigma=sigma)
        np.testing.assert_allclose(ours, scipys, rtol=1e-12, atol=1e-9)


def test_sobel_matches_scipy(images):
    for img in images:
        for axis in (0, 1):
            np.testing.assert_allclose(
                ref.sobel(img, axis=axis), ndi.sobel(img, axis=axis),
                rtol=1e-12, atol=1e-9,
            )


def test_gradient_x_matches_numpy(images):
    for img in images:
        np.testing.assert_allclose(ref.gradient_x(img), np.gradient(img, axis=1))


def test_subtract_scalar_background():
    img = np.array([[10, 200], [50, 5]], dtype=np.uint16)
    out = ref.subtract_scalar_background(img, 40.0)
    np.testing.assert_array_equal(out, [[0, 160], [10, 0]])
    assert out.dtype == np.float64


def test_subtract_prior_frame_threshold():
    curr = np.array([[10.0, 30.0, 100.0]])
    prior = np.array([[5.0, 28.0, 10.0]])
    out = ref.subtract_prior_frame(curr, prior, threshold=5.0)
    np.testing.assert_array_equal(out, [[5.0, 0.0, 90.0]])


def test_three_frame_difference():
    a = np.array([[0.0, 0.0]])
    b = np.array([[10.0, 1.0]])
    c = np.array([[20.0, 1.5]])
    out = ref.three_frame_difference(a, b, c, threshold=2.0)
    # pixel 0: min(|10|, |10|) = 10 -> kept; pixel 1: min(1, .5) = .5 -> zeroed
    np.testing.assert_array_equal(out, [[10.0, 0.0]])


def test_is_empty_frame():
    frame = np.zeros((100, 100))
    assert ref.is_empty_frame(frame, noise_threshold=50.0, min_signal_fraction=0.001)
    frame[:2, :10] = 100.0  # 20 / 10000 = 0.002 > 0.001
    assert not ref.is_empty_frame(frame, 50.0, 0.001)
