"""Audio-metrics sanity: identity -> zero distance; noise -> ordered scores."""
import numpy as np

from vibevoice_tpu.utils import audio_metrics as AM


def _tone(f, sec=0.5, sr=24000):
    t = np.arange(int(sec * sr)) / sr
    return np.sin(2 * np.pi * f * t).astype(np.float32)


def test_identity_is_zero():
    x = _tone(440)
    m = AM.compare(x, x)
    assert m["mel_l2"] == 0.0
    assert m["lsd_db"] == 0.0
    assert m["snr_db"] == float("inf")


def test_noise_ordering():
    rng = np.random.default_rng(0)
    x = _tone(440)
    small = x + rng.normal(0, 1e-3, x.shape).astype(np.float32)
    large = x + rng.normal(0, 1e-1, x.shape).astype(np.float32)
    assert AM.mel_spectral_distance(x, small) < AM.mel_spectral_distance(x, large)
    assert AM.log_spectral_distance(x, small) < AM.log_spectral_distance(x, large)
    assert AM.snr_db(x, small) > AM.snr_db(x, large)
    assert AM.snr_db(x, small) > 40


def test_different_tones_far_apart():
    # a different pitch must read as farther than tiny additive noise
    a, b = _tone(440), _tone(880)
    noisy = a + 1e-4 * np.random.default_rng(1).normal(size=a.shape).astype(np.float32)
    assert AM.mel_spectral_distance(a, b) > AM.mel_spectral_distance(a, noisy)
    assert AM.snr_db(a, b) < 10


def test_length_mismatch_tolerated():
    a = _tone(440, sec=0.5)
    b = _tone(440, sec=0.4)
    m = AM.compare(a, b)
    assert np.isfinite(m["mel_l2"])


def test_mel_filterbank_shape_and_coverage():
    fb = AM.mel_filterbank(24000, 1024, 80)
    assert fb.shape == (80, 513)
    assert (fb.sum(axis=1) > 0).all()  # every filter covers some bins
