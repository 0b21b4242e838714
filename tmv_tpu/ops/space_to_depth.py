"""Space-to-depth stem transform (TPU layout optimization).

The reference stem (`layers/stem.py:6-38`) is a 3x3 stride-2 SAME conv on
the raw (H, W, 3) image.  C_in=3 occupies 3 of the TPU's 128 vector lanes,
so XLA's conv pipeline runs the largest-spatial tensor in the network at
~2% lane utilization.  The classic TPU move (MLPerf ResNet / EfficientNet)
is to re-express the identical math as:

    space_to_depth(x, 2)          # (H, W, 3) -> (H/2, W/2, 12)
    conv 2x2 stride-1, pad (0,1)  # weights rearranged from the 3x3 kernel

which is *exactly* the same contraction (the 3x3 kernel is zero-padded to
4x4 and regrouped per parity plane), so converted checkpoints and
activations are preserved bit-for-bit up to float reassociation.  The
checkpoint keeps the reference (3,3,C,F) kernel layout; the rearrangement
happens at apply time (27*F floats — negligible).

Only valid for even H and W (SAME padding for k=3,s=2 on even extents pads
(0,1), which the s2d form reproduces); every EfficientDet D-config input
size is even.
"""

import jax.numpy as jnp


def space_to_depth(x, block: int = 2):
    """NHWC space-to-depth: (B,H,W,C) -> (B,H/b,W/b,b*b*C).

    Channel order is [dy, dx, c] (row-offset major), matching
    ``stem_kernel_to_s2d``.
    """
    b, h, w, c = x.shape
    assert h % block == 0 and w % block == 0, (h, w, block)
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, block * block * c)


def stem_kernel_to_s2d(w3):
    """Rearrange a (3,3,C,F) stride-2 kernel into the equivalent
    (2,2,4C,F) stride-1 kernel for space-to-depth(2) input.

    The 3x3 kernel is zero-padded to 4x4, then split into the four
    (dy,dx) parity planes; output-pixel (oy,ox) of the original conv
    reads input rows 2oy..2oy+2 = s2d rows oy..oy+1, so a 2x2 stride-1
    conv over the s2d tensor (padded (0,1) after, zeros — identical to
    the original SAME padding on even extents) computes the same sums.
    """
    kh, kw, c, f = w3.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    w4 = jnp.pad(w3, ((0, 1), (0, 1), (0, 0), (0, 0)))
    # [2*dy'+dy, 2*dx'+dx, c, f] -> [dy', dx', dy*2C+dx*C+c, f]
    w2 = w4.reshape(2, 2, 2, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
    return w2.reshape(2, 2, 4 * c, f)
