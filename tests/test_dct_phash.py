"""Real DCT pHash kernel (codec-gated decode, pure-numpy transform).

The perceptual-hash math is fully testable WITHOUT a codec: the codec is
only the decode step. Fixtures are BROADBAND seeded random fields — a
median-threshold hash is only meaningful on images with a broadband
spectrum (on a degenerate image, e.g. a pure linear gradient, 55 of 63 AC
terms are float noise and any threshold rule is arbitrary; the kernel
quantizes away that noise floor so such images at least hash STABLY).

Pins:
- determinism, self-identity, bounded range;
- perceptual invariance: brightness/contrast shifts leave the hash
  IDENTICAL (DCT AC terms are offset-invariant and sign-scale-invariant);
  mild noise stays within a small hamming radius;
- block-upsampling invariance: x3 pixel-repeat hashes identically (the
  area resample recovers the exact original means);
- discrimination: independent random fields are far apart;
- degenerate-image stability: a flat gradient hashes identically under a
  brightness shift (the quantization guard);
- payload_phash fallback: undecodable payloads (this corpus's header-only
  images) take the loud 'stub' path and match the md5 mirror;
- PIL round-trip (skipped unless a codec is installed): a real encoded
  image takes the 'dct' path.
"""

import numpy as np
import pytest

from pdfextract_spark.functions import multimodal as mm


def _field(seed, h=64, w=64):
    """Deterministic broadband image: seeded uniform noise box-smoothed
    once (keeps energy across the low-frequency block)."""
    rng = np.random.RandomState(seed)
    raw = rng.uniform(0, 255, (h, w))
    k = np.ones((3, 3)) / 9.0
    out = raw.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out += np.roll(np.roll(raw, dy, 0), dx, 1) * k[dy + 1, dx + 1]
    return out / 2.0


def _ham(a, b):
    return bin(a ^ b).count("1")


def test_deterministic_and_bounded():
    img = _field(1)
    a, b = mm.dct_phash(img), mm.dct_phash(img)
    assert a == b
    assert 0 <= a < (1 << 63)


def test_brightness_contrast_invariance():
    img = _field(2)
    base = mm.dct_phash(img)
    assert mm.dct_phash(img + 40.0) == base   # offset: only the DC moves
    assert mm.dct_phash(img * 1.5) == base    # scale: signs and median scale


def test_mild_noise_stays_close():
    img = _field(3, 96, 128)
    base = mm.dct_phash(img)
    rng = np.random.RandomState(7)
    noisy = img + rng.normal(0, 1.0, img.shape)
    assert _ham(base, mm.dct_phash(noisy)) <= 12


def test_block_upsample_invariance():
    img = _field(4, 32, 32)
    up = np.repeat(np.repeat(img, 3, axis=0), 3, axis=1)
    assert mm.dct_phash(up) == mm.dct_phash(img)


def test_discrimination():
    assert _ham(mm.dct_phash(_field(5)), mm.dct_phash(_field(6))) > 16


def test_degenerate_image_hashes_stably():
    y, x = np.mgrid[0:64, 0:64]
    grad = x * 4.0  # near-empty AC block: the quantization guard case
    assert mm.dct_phash(grad + 40.0) == mm.dct_phash(grad)


def test_block_mean_resize_shape_and_mean():
    img = _field(8, 100, 70)
    small = mm.block_mean_resize(img, 32)
    assert small.shape == (32, 32)
    assert abs(small.mean() - img.mean()) < 3.0


def test_payload_phash_stub_fallback_matches_mirror():
    # a header-only PNG payload (what media_table synthesizes) cannot decode
    # to pixels -> the stub path, labelled loudly
    payload = bytes.fromhex(
        "89504E470D0A1A0A0000000D49484452000000400000004008060000000A0B0C0D"
    )
    ph, src = mm.payload_phash(payload)
    assert src == "stub"
    import hashlib

    want = int(
        hashlib.md5(payload.hex().upper().encode()).hexdigest()[:15], 16
    )
    assert ph == want


def test_dct_path_with_codec():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    arr = _field(9).astype("uint8")
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    ph, src = mm.payload_phash(buf.getvalue())
    assert src == "dct"
    assert ph == mm.dct_phash(np.asarray(arr, dtype=np.float64))
