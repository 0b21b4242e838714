"""Pallas TPU kernel: fused depthwise-conv + BN(affine) + swish.

Why: the EfficientNet-B0 @512 backbone is the whole D0 inference cost
(`tools/profile_d0_components.py`: 19 of 21.5 ms at b32), and inside it the
depthwise convolutions are the dominant op class at 2.7× their HBM
bandwidth floor (`tools/probe_backbone_ops.py`: 8.3 ms measured vs 3.1 ms
floor).  Depthwise conv cannot use the MXU (no contraction dim), so the
only thing that matters is touching HBM once: these kernels stream the
input once and compute ``swish(dwconv(x)·scale + offset)`` in the same
pass — the k² taps are VPU multiply-adds, and the BN affine (eval-mode
running stats folded to scale/offset) plus swish ride along for free.

Two layouts, chosen by stride (shaped by what Mosaic accepts — HBM DMA
slices must be (8,128)-tile aligned, values support arbitrary lane-offset
slices and minor-dim parity reshapes, but not strided slices):

- stride 1: x is viewed as (B, H_pad, W_pad·C) so each DMA'd row window is
  lane-aligned for any C; tap (dy, dx) is a static lane-offset slice
  ``xw[dy:dy+th, dx·C : dx·C + w_out·C]``, weights/BN vectors arrive
  pre-tiled to w_out·C lanes.  Row tiles overlap by k−1 rows via explicit
  async DMA (rows padded to the 8-sublane grain).
- stride 2: whole-image VMEM blocks; taps read parity planes of the value
  reshaped to (H/2, 2, W/2, 2, C) — no strided access.  Shapes whose
  blocks would not fit VMEM fall back to the XLA path.

Inference-path kernel: the flax module keeps the XLA path for training
(BN batch statistics) and for non-TPU backends.  Reference counterpart:
the ``DepthwiseConv2D`` inside `layers/mb_conv_block.py:60-75` — the
reference leaves this entirely to stock TF kernels.
"""

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# conservative per-kernel VMEM budget (bytes) for the whole-image stride-2
# path, accounting for the pipeline's double buffering
_VMEM_BUDGET = 14_000_000


def _same_pads(size: int, k: int, s: int):
    """TF/flax 'SAME' padding (out_size, beg, end) for one spatial dim."""
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    beg = total // 2
    return out, beg, total - beg


def _dw_kernel_s1_folded(x_hbm, wt_ref, sc_ref, of_ref, out_ref, xwin, sem,
                         *, k: int, th: int, w_out: int, c: int,
                         rows_win: int, n_tiles: int, total: int):
    """One (batch, row-tile) step of the flattened grid, double-buffered:
    while tile t computes from window slot t%2, tile t+1's rows stream
    from HBM into slot (t+1)%2 — the r4 kernel waited on each window
    serially, which is the suspected source of its batch-scaling cliff
    (VERDICT r4 item 8)."""
    t = pl.program_id(0)

    def window_copy(tt, slot):
        return pltpu.make_async_copy(
            x_hbm.at[tt // n_tiles, pl.ds((tt % n_tiles) * th, rows_win)],
            xwin.at[slot], sem.at[slot])

    @pl.when(t == 0)
    def _():
        window_copy(t, 0).start()

    @pl.when(t + 1 < total)
    def _():
        window_copy(t + 1, (t + 1) % 2).start()

    window_copy(t, t % 2).wait()

    xw = xwin[t % 2]
    n = w_out * c
    acc = jnp.zeros((th, n), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            tap = xw[dy:dy + th, dx * c:dx * c + n].astype(jnp.float32)
            acc = acc + tap * wt_ref[dy * k + dx, :]
    y = acc * sc_ref[0, :] + of_ref[0, :]
    out_ref[0] = (y * jax.nn.sigmoid(y)).astype(out_ref.dtype)


def _dw_kernel_s2_whole(x_ref, w_ref, sc_ref, of_ref, out_ref, *,
                        k: int, h_out: int, w_out: int):
    xw = x_ref[0]
    rows, wp, c = xw.shape
    xr = xw.reshape(rows // 2, 2, wp // 2, 2, c)
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for dy in range(k):
        for dx in range(k):
            plane = xr[dy // 2:dy // 2 + h_out, dy % 2,
                       dx // 2:dx // 2 + w_out, dx % 2, :]
            acc = acc + plane.astype(jnp.float32) \
                * w_ref[dy, dx, :].astype(jnp.float32)
    y = acc * sc_ref[0, :].astype(jnp.float32) \
        + of_ref[0, :].astype(jnp.float32)
    out_ref[0] = (y * jax.nn.sigmoid(y)).astype(out_ref.dtype)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _fused_s1(x, w, scale, offset, row_tile, interpret):
    b, h, width, c = x.shape
    k = w.shape[0]
    h_out, ph_b, _ = _same_pads(h, k, 1)
    w_out, pw_b, _ = _same_pads(width, k, 1)

    th = min(_round_up(row_tile, 8), _round_up(h_out, 8))
    # shrink the tile until windows + f32 accumulator + tap temporaries fit
    # comfortably in scoped VMEM (Mosaic stack-allocates the unrolled taps)
    wp_est = _round_up(width + k - 1, 8)
    bpe = x.dtype.itemsize
    while th > 8:
        # two input windows: the double-buffered scratch holds tile t
        # while tile t+1 streams in
        window = 2 * _round_up(th + k - 1, 8) * wp_est * c * bpe
        # Mosaic keeps ~all unrolled tap temporaries live on the kernel
        # stack (observed ≈ 0.75·k² accumulator-sized f32 buffers)
        work = k * k * th * width * c * 3
        if window + work < 12_000_000:
            break
        th -= 8
    n_tiles = -(-h_out // th)
    rows_win = _round_up(th + k - 1, 8)
    rows_total = (n_tiles - 1) * th + rows_win
    wp = _round_up(width + k - 1, 8)

    xp = jnp.pad(x, ((0, 0), (ph_b, rows_total - h - ph_b),
                     (pw_b, wp - width - pw_b), (0, 0)))
    xf = xp.reshape(b, rows_total, wp * c)

    n = w_out * c
    wt = jnp.tile(w.reshape(k * k, 1, c).astype(jnp.float32),
                  (1, w_out, 1)).reshape(k * k, n)
    sc = jnp.tile(scale.astype(jnp.float32), w_out).reshape(1, n)
    of = jnp.tile(offset.astype(jnp.float32), w_out).reshape(1, n)

    out = pl.pallas_call(
        partial(_dw_kernel_s1_folded, k=k, th=th, w_out=w_out, c=c,
                rows_win=rows_win, n_tiles=n_tiles, total=b * n_tiles),
        grid=(b * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # xf (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),           # wt
            pl.BlockSpec(memory_space=pltpu.VMEM),           # scale row
            pl.BlockSpec(memory_space=pltpu.VMEM),           # offset row
        ],
        out_specs=pl.BlockSpec(
            (1, th, n), lambda t: (t // n_tiles, t % n_tiles, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * th, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows_win, wp * c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xf, wt, sc, of)
    return out[:, :h_out].reshape(b, h_out, w_out, c)


def _fused_s2(x, w, scale, offset, interpret):
    b, h, width, c = x.shape
    k = w.shape[0]
    h_out, ph_b, ph_e = _same_pads(h, k, 2)
    w_out, pw_b, pw_e = _same_pads(width, k, 2)

    # parity planes need h_out + (k-1)//2 … row-pairs (even totals)
    rows = max(h + ph_b + ph_e, 2 * (h_out + (k - 1 + 1) // 2))
    rows = _round_up(rows, 2)
    wp = max(width + pw_b + pw_e, 2 * (w_out + (k - 1 + 1) // 2))
    wp = _round_up(wp, 2)

    xp = jnp.pad(x, ((0, 0), (ph_b, rows - h - ph_b),
                     (pw_b, wp - width - pw_b), (0, 0)))

    out = pl.pallas_call(
        partial(_dw_kernel_s2_whole, k=k, h_out=h_out, w_out=w_out),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, wp, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),           # w (k,k,C)
            pl.BlockSpec(memory_space=pltpu.VMEM),           # scale (1,C)
            pl.BlockSpec(memory_space=pltpu.VMEM),           # offset (1,C)
        ],
        out_specs=pl.BlockSpec(
            (1, h_out, w_out, c), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, c), x.dtype),
        interpret=interpret,
    )(xp, w, scale.reshape(1, c), offset.reshape(1, c))
    return out


def _s2_vmem_bytes(x, k):
    b, h, width, c = x.shape
    h_out = -(-h // 2)
    w_out = -(-width // 2)
    bpe = x.dtype.itemsize
    lanes = max(c, 128)  # VMEM blocks pad lanes to the 128 grain
    return 2 * bpe * lanes * ((h + k) * (width + k) + h_out * w_out)


def fused_dw_bn_swish(x, w, scale, offset, stride: int = 1,
                      row_tile: int = 32, interpret=None):
    """``swish(depthwise_conv(x, w, stride, SAME) * scale + offset)``.

    Args:
        x: (B, H, W, C) activations (any float dtype).
        w: (k, k, C) depthwise taps (flax HWIO (k,k,1,C) squeezed).
        scale, offset: (C,) folded BN affine
            (``gamma/sqrt(var+eps)``, ``beta - mean*scale``).
        stride: 1 or 2.
        row_tile: output rows per grid step (stride 1; rounded to 8).
    """
    b, h, width, c = x.shape
    k = w.shape[0]
    assert w.shape == (k, k, c), w.shape
    assert stride in (1, 2)
    if interpret is None:  # real Mosaic kernel only on TPU
        interpret = jax.default_backend() != "tpu"

    if stride == 1:
        return _fused_s1(x, w, scale, offset, row_tile, interpret)
    if not interpret:
        # The stride-2 parity reshape's (…, 2, …) sublane dim pads 4×
        # under Mosaic's (8,128) tiling and blows scoped VMEM on real
        # shapes; XLA's own bf16 depthwise also simply wins here
        # (tools/bench_dwconv_kernel.py) — hardware path stays XLA.
        return dw_reference(x, w, scale, offset, 2)
    return _fused_s2(x, w, scale, offset, interpret)


def dw_reference(x, w, scale, offset, stride: int = 1):
    """XLA reference implementation (for tests and non-TPU fallback)."""
    b, h, width, c = x.shape
    k = w.shape[0]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, (k, k, 1, c), ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.reshape(k, k, 1, c).astype(jnp.float32),
        (stride, stride), "SAME", dimension_numbers=dn,
        feature_group_count=c, preferred_element_type=jnp.float32)
    y = y * scale.astype(jnp.float32) + offset.astype(jnp.float32)
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)
