"""Native C++ preprocessing library vs the Python fallback."""

import io

import numpy as np
import pytest
from PIL import Image

from tmv_tpu.native import available, decode_letterbox, decode_letterbox_batch


def make_jpeg(rng, h=120, w=200):
    # smooth gradient image → resampling differences stay tiny
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([yy * 255 // h, xx * 255 // w,
                    (yy + xx) * 255 // (h + w)], -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95)
    return buf.getvalue(), img


@pytest.mark.skipif(not available(), reason="native toolchain unavailable")
class TestNativePreproc:
    def test_geometry_matches_python(self, rng):
        jb, img = make_jpeg(rng)
        out, meta = decode_letterbox(jb, (416, 416))
        assert out.shape == (416, 416, 3) and out.dtype == np.float32
        pad_y, pad_x, sh, sw = meta.tolist()
        assert (sh, sw) == (120, 200)
        # ratio = 200/416; content height = floor(120/ratio) = 249
        assert pad_x == 0 and pad_y == (416 - 249) // 2
        # padding rows are zero, content rows aren't
        assert out[:pad_y].max() == 0.0
        assert out[pad_y + 1 : pad_y + 248].max() > 0.1

    def test_content_close_to_python(self, rng):
        from tmv_tpu.utils import image_helper

        jb, img = make_jpeg(rng)
        out, _ = decode_letterbox(jb, (416, 416))
        ref_img = image_helper.bytes_to_image(jb)
        ref, _, _ = image_helper.proportional_resize(ref_img, (416, 416))
        ref = ref.astype(np.float32) / 255.0
        # pure bilinear (TF antialias=False parity) vs PIL's filtered
        # resample: close on smooth content
        assert float(np.abs(out - ref).mean()) < 0.02

    def test_batch_api(self, rng):
        jb, _ = make_jpeg(rng)
        jb2, _ = make_jpeg(rng, 80, 80)
        outs, metas = decode_letterbox_batch([jb, jb2, jb], (224, 224))
        assert outs.shape == (3, 224, 224, 3)
        np.testing.assert_array_equal(outs[0], outs[2])
        assert metas[1][2] == 80

    def test_corrupt_jpeg_falls_back_or_errors_cleanly(self, rng):
        jb, _ = make_jpeg(rng)
        with pytest.raises(Exception):
            decode_letterbox(b"not a jpeg", (64, 64))


@pytest.mark.skipif(not available(), reason="native toolchain unavailable")
class TestNativeJpegCodec:
    """r3 serving-hot-path entry points: fused full decode + encode."""

    def test_decode_letterbox_full_matches_parts(self, rng):
        from tmv_tpu.native import decode_letterbox_full

        jb, img = make_jpeg(rng)
        res = decode_letterbox_full(jb, (416, 416))
        assert res is not None
        rgb, out, meta = res
        # full-res frame is the PIL decode, bit-exact (same libjpeg)
        ref = np.asarray(Image.open(io.BytesIO(jb)).convert("RGB"))
        np.testing.assert_array_equal(rgb, ref)
        # letterboxed frame equals the single-output entry point
        out2, meta2 = decode_letterbox(jb, (416, 416))
        np.testing.assert_array_equal(out, out2)
        np.testing.assert_array_equal(meta, meta2)

    def test_encode_roundtrip(self, rng):
        from tmv_tpu.native import encode_jpeg

        _, img = make_jpeg(rng)
        data = encode_jpeg(img, quality=92)
        assert data is not None and data[:2] == b"\xff\xd8"
        back = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert back.shape == img.shape
        # smooth-gradient content survives one JPEG generation
        assert float(np.abs(back.astype(int) - img.astype(int)).mean()) < 3.0

    def test_bad_inputs_return_none(self):
        from tmv_tpu.native import decode_letterbox_full

        assert decode_letterbox_full(b"not a jpeg", (64, 64)) is None
