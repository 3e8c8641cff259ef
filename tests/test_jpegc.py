"""Pure-numpy baseline JPEG codec (ops/jpegc): spec-behavior tests.

No reference decoder exists in this sandbox, so correctness is argued
structurally: bitstream legality (the decoder consumes only what DHT/DQT
segments declare), DC-exactness on flat images, a monotone
quality/error curve, subsampling behavior, and bit-determinism."""

import numpy as np
import pytest

from pdf_entity_extraction_ray.ops.jpegc import decode_jpeg, encode_jpeg


def _gradient(h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 // (w - 1)).astype(np.uint8),
            (yy * 255 // (h - 1)).astype(np.uint8),
            ((xx + yy) * 4 % 256).astype(np.uint8),
        ],
        axis=-1,
    )


def test_flat_image_roundtrips_near_exact():
    """A uniform block has only a DC coefficient; quantized DC at q=16
    reconstructs within one rounding step of the original level."""
    for level in (0, 64, 128, 200, 255):
        img = np.full((16, 16, 3), level, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=90))
        assert np.abs(dec.astype(int) - int(level)).max() <= 2, level


def test_quality_monotone_error():
    img = _gradient()
    errs = []
    for q in (95, 75, 40, 10):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(float(np.abs(dec.astype(int) - img.astype(int)).mean()))
    assert errs == sorted(errs)  # lower quality -> more error
    assert errs[0] < 3.0  # q=95 is near-lossless on a smooth gradient


def test_subsampling_420_decodes_and_shapes():
    for h, w in ((24, 32), (13, 9), (8, 8), (17, 17)):
        img = _gradient(h, w)
        dec = decode_jpeg(encode_jpeg(img, quality=85, subsampling="4:2:0"))
        assert dec.shape == (h, w, 3)
        # luminance is full-resolution: gradient error stays small
        lum_err = np.abs(
            dec.astype(np.float64) @ [0.299, 0.587, 0.114]
            - img.astype(np.float64) @ [0.299, 0.587, 0.114]
        ).mean()
        assert lum_err < 6.0, (h, w, lum_err)


def test_deterministic_bits_and_pixels():
    img = _gradient(19, 23)
    e1, e2 = encode_jpeg(img, 85), encode_jpeg(img, 85)
    assert e1 == e2
    d1, d2 = decode_jpeg(e1), decode_jpeg(e1)
    assert np.array_equal(d1, d2)


def test_markers_and_gates():
    img = _gradient(8, 8)
    enc = encode_jpeg(img, 85)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    # lossless SOF3 raises the named gap, not garbage (progressive SOF2
    # is implemented now — covered by TestProgressive below)
    lossless = bytearray(enc)
    sof = lossless.find(b"\xff\xc0")
    lossless[sof + 1] = 0xC3
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(lossless))


def test_decoder_is_table_driven():
    """The decoder reads quantization tables from the FILE, not from
    constants shared with the encoder: doubling the luma DC quant entry
    in the DQT segment visibly rescales every decoded block, proving the
    tables actually flow from the bitstream."""
    img = _gradient(8, 8)
    enc = bytearray(encode_jpeg(img, 85))
    pos = enc.find(b"\xff\xdb")
    # luma DQT entry 0 lives after marker(2) + len(2) + pq/tq(1)
    q_at = pos + 2 + 2 + 1
    enc[q_at] = min(enc[q_at] * 4, 255)
    out = decode_jpeg(bytes(enc))
    assert not np.array_equal(out, decode_jpeg(encode_jpeg(img, 85)))


class TestProgressive:
    """Progressive (SOF2) codec: T.81 Annex G spectral selection +
    successive approximation.  The oracle is exact: baseline and
    progressive encodings share the quantized coefficients, so decoding
    both must yield BYTE-IDENTICAL pixels."""

    def _imgs(self):
        rng = np.random.RandomState(11)
        yield rng.randint(0, 256, size=(17, 23, 3), dtype=np.uint8)
        yield rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
        yield _gradient(40, 24)
        yield np.full((24, 40, 3), 200, np.uint8)  # flat: EOB runs everywhere

    def test_pixels_match_baseline(self):
        from pdf_entity_extraction_ray.ops.jpegc import encode_jpeg_progressive

        for img in self._imgs():
            for sub in ("4:4:4", "4:2:0"):
                for q in (85, 50):
                    base = decode_jpeg(encode_jpeg(img, q, subsampling=sub))
                    prog = decode_jpeg(
                        encode_jpeg_progressive(img, q, subsampling=sub)
                    )
                    assert np.array_equal(base, prog), (img.shape, sub, q)

    def test_emits_sof2_and_multiple_scans(self):
        from pdf_entity_extraction_ray.ops.jpegc import encode_jpeg_progressive

        enc = encode_jpeg_progressive(_gradient(16, 16))
        assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc
        assert enc.count(b"\xff\xda") == 9  # the full scan script

    def test_deterministic_bytes(self):
        from pdf_entity_extraction_ray.ops.jpegc import encode_jpeg_progressive

        img = _gradient(24, 24)
        assert encode_jpeg_progressive(img) == encode_jpeg_progressive(img)
