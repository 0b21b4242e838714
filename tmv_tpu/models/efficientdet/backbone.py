"""EfficientNet backbone: Stem + MBConv chain with reduction endpoints.

Parity surface:
- ``Stem`` — `layers/stem.py:6-38` (3×3 s2 conv, width-scaled, BN, swish;
  fan-out normal init per `utils/conv_kernel_initializer.py:4-25`).
- ``MBConvBlock`` — `layers/mb_conv_block.py:8-160`: 1×1 expand (skipped at
  expand_ratio 1) → depthwise k×k → SE → 1×1 project, BN after each conv.
  NOTE the reference block has **no residual skip** (its ``call`` returns
  the projection directly, mb_conv_block.py:127-160) — replicated
  faithfully, since converted checkpoints and activations must match.
- ``SE`` — `layers/se.py:5-39`.
- ``BackboneModel`` — `efficientnet/backbone_model.py:12-148`: builds blocks
  from width/depth-scaled args, tracks ``reduction_1..5`` endpoints (tap =
  last block before a stride-2 block, plus the final block), returns
  ``[final, r1..r5]``.
"""

from typing import Any, List, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tmv_tpu.models.efficientdet.config import (
    EfficientDetBlockArgs,
    round_filters,
    round_repeats,
)

# "auto" fused-depthwise batch window.  The r5 double-buffered kernel
# (kernels/dwconv_pallas.py: tile t computes while tile t+1's rows DMA)
# wins the stem shape standalone at every small batch — v5e slope
# measurements (tools/probe_dw_batch_scaling.py): 2.28x at b1, 3.86x at
# b8, 2.22x at b32 — but the FULL-MODEL picture is different at the
# window edges (two-scale measurements, tools/probe_fused_auto.py +
# tools/probe_b1_serving_fused.py, serving_b1_* / fused_auto_* keys in
# baseline_measured.json):
#
# - b1 (single-image serving): XLA compiles the whole b1 eval graph to
#   ~0.79 ms — reproducibly across processes and interleaved blocks
#   (tools/probe_b1_interleave.py) — while the kernel-engaged graph is a
#   stable ~1.40 ms: a 1.8x LOSS.  The kernel's standalone 2.28x b1 win
#   is eaten by the materialization/fusion boundary a pallas_call forces
#   in an otherwise fully-fused small graph.  (The r4 "b1 p50 win
#   2.115 -> 1.553 ms" that justified engaging b1 was K=5 slope noise;
#   the same key measured 0.90 ms in an r5 run of the same program.)
# - b8..b32 (micro-batch serving): parity to +10% with the kernel on.
# - b64 (the north-star bench batch): XLA switches to a ~4x-faster
#   per-image depthwise strategy and the kernel loses 1.5x e2e — the
#   round-4 regression (2370 -> 1573 img/s) shipped because the
#   predicate never looked at batch (verdict r4 weak #1).
#
# So "auto" engages only inside [MIN, MAX]: never at b1 (serving p50
# rides XLA's better graph), never at the bench batch.
FUSED_DW_AUTO_MIN_BATCH = 2
FUSED_DW_AUTO_MAX_BATCH = 32


def conv_kernel_init(key, shape, dtype=jnp.float32):
    """Fan-out normal (`utils/conv_kernel_initializer.py`): N(0, √(2/fan_out))."""
    import jax

    kh, kw, _, out_f = shape
    fan_out = int(kh * kw * out_f)
    return jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / fan_out)


def depthwise_kernel_init(key, shape, dtype=jnp.float32):
    """For depthwise HWIO kernels (I=1, O=channels·multiplier): TF counts
    fan_out with the multiplier only, i.e. kh·kw·multiplier."""
    import jax

    kh, kw, _, _ = shape
    fan_out = int(kh * kw)  # depth_multiplier == 1
    return jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / fan_out)


class SE(nn.Module):
    """Squeeze-and-excitation gate (`layers/se.py:5-39`)."""

    se_filters: int
    output_filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(self.se_filters, (1, 1), padding="SAME", use_bias=True,
                     kernel_init=conv_kernel_init, dtype=self.dtype)(se)
        se = nn.swish(se)
        se = nn.Conv(self.output_filters, (1, 1), padding="SAME", use_bias=True,
                     kernel_init=conv_kernel_init, dtype=self.dtype)(se)
        return nn.sigmoid(se) * x


class Stem(nn.Module):
    """Reference stem (`layers/stem.py:6-38`).

    ``stem_s2d=True`` re-expresses the identical 3x3/s2 conv as
    space-to-depth(2) + a 2x2/s1 conv with the kernel rearranged at apply
    time (`ops/space_to_depth.py`) — same (3,3,C,F) checkpoint layout,
    same math up to float reassociation, TPU lane-utilization move.
    """

    stem_filters: int
    width_coefficient: float
    depth_divisor: int
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from tmv_tpu.quant.dynamic import quant_mode

        filters = round_filters(
            self.stem_filters, self.width_coefficient, self.depth_divisor
        )
        mode = quant_mode()
        if mode == "int8_static" and not train:
            kshape = (3, 3, x.shape[-1], filters)
            _ConvKernelParams(kshape, name="Conv_0")()
            bn = _BNStatsParams(filters, name="BatchNorm_0")()
            y = _static_int8_site(self, "Conv_0", x, kshape, (2, 2), bn,
                                  self.bn_epsilon)
            return nn.swish(y.astype(self.dtype))
        if mode == "calib" and not train:
            _sow_calib(self, "Conv_0", x)
        if self.stem_s2d:
            import jax.lax as lax

            from tmv_tpu.ops.space_to_depth import (
                space_to_depth, stem_kernel_to_s2d,
            )

            kernel = _ConvKernelParams(
                (3, 3, x.shape[-1], filters), name="Conv_0")()
            w2 = stem_kernel_to_s2d(kernel.astype(self.dtype))
            x = lax.conv_general_dilated(
                space_to_depth(x.astype(self.dtype), 2), w2, (1, 1),
                [(0, 1), (0, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            x = nn.Conv(filters, (3, 3), strides=(2, 2), padding="SAME",
                        use_bias=False, kernel_init=conv_kernel_init,
                        dtype=self.dtype, name="Conv_0")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                         dtype=self.dtype, name="BatchNorm_0")(x)
        return nn.swish(x)


class _ConvKernelParams(nn.Module):
    """Param-holder with ``nn.Conv``'s variable layout (kernel only), so
    the static-int8 path keeps byte-identical checkpoints."""

    shape: Sequence[int]
    init: Any = conv_kernel_init

    @nn.compact
    def __call__(self):
        return self.param("kernel", self.init, tuple(self.shape))


def _sow_calib(mdl: nn.Module, name: str, x) -> None:
    from tmv_tpu.quant.static import sow_calib

    sow_calib(mdl, name, x)


def _static_int8_site(mdl: nn.Module, name: str, x, kernel_shape,
                      strides, bn, bn_epsilon, groups: int = 1):
    """One conv+BN site on the static-int8 path (BN affine folded into
    the dequant) — see `quant/static.py::static_conv_site`."""
    from tmv_tpu.quant.static import static_conv_site

    return static_conv_site(mdl, name, x, kernel_shape, strides,
                            groups=groups, bn=bn, bn_epsilon=bn_epsilon)


class _DWKernelParams(nn.Module):
    """Param-holder with ``nn.Conv``'s depthwise variable layout, so the
    fused-kernel path keeps byte-identical checkpoints."""

    kernel_size: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", depthwise_kernel_init,
            (self.kernel_size, self.kernel_size, 1, self.features))


class _BNStatsParams(nn.Module):
    """Param-holder with ``nn.BatchNorm``'s variable layout."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean.value, var.value


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck (reference variant: no residual skip).

    ``fused_dw_eval=True`` routes the eval-mode depthwise+BN+swish through
    the fused Pallas kernel (`kernels/dwconv_pallas.py`) — same variable
    tree (explicit names pin the layout), TPU-only, inference only.
    ``fused_dw_eval="auto"`` uses the kernel only on its measured win
    region (tools/bench_dwconv_kernel.py: XLA wins every B0 dw shape
    except the large-spatial/small-C stride-1 3x3 stem block — and even
    there only inside the [FUSED_DW_AUTO_MIN_BATCH,
    FUSED_DW_AUTO_MAX_BATCH] batch window; see the constants' comment).
    """

    block_args: EfficientDetBlockArgs
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32
    fused_dw_eval: Any = False

    def _fused_dw(self, x, filters: int) -> bool:
        if self.fused_dw_eval == "auto":
            args = self.block_args
            return (FUSED_DW_AUTO_MIN_BATCH <= x.shape[0]
                    <= FUSED_DW_AUTO_MAX_BATCH
                    and x.shape[1] >= 256 and filters <= 64
                    and args.kernel_size == 3
                    and tuple(args.strides)[0] == 1)
        return bool(self.fused_dw_eval)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from tmv_tpu.quant.dynamic import quant_mode

        args = self.block_args
        filters = args.input_filters * args.expand_ratio
        ci = bi = 0  # explicit Conv_i/BatchNorm_i names (= flax auto order)
        mode = quant_mode()
        use_q = mode == "int8_static" and not train
        calib = mode == "calib" and not train

        def bn(y, name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=self.bn_momentum,
                                epsilon=self.bn_epsilon, dtype=self.dtype,
                                name=name)(y)

        if args.expand_ratio != 1:
            if use_q:
                kshape = (1, 1, x.shape[-1], filters)
                _ConvKernelParams(kshape, name=f"Conv_{ci}")()
                bnv = _BNStatsParams(filters, name=f"BatchNorm_{bi}")()
                x = nn.swish(_static_int8_site(
                    self, f"Conv_{ci}", x, kshape, (1, 1), bnv,
                    self.bn_epsilon).astype(self.dtype))
            else:
                if calib:
                    _sow_calib(self, f"Conv_{ci}", x)
                x = nn.Conv(filters, (1, 1), padding="SAME", use_bias=False,
                            kernel_init=conv_kernel_init, dtype=self.dtype,
                            name=f"Conv_{ci}")(x)
                x = nn.swish(bn(x, f"BatchNorm_{bi}"))
            ci += 1
            bi += 1

        # depthwise k×k (+BN+swish): int8 grouped conv on the static-int8
        # path; fused Pallas kernel on the (opt-in) fused eval path
        if use_q:
            kshape = (args.kernel_size, args.kernel_size, 1, filters)
            _ConvKernelParams(kshape, depthwise_kernel_init,
                              name=f"Conv_{ci}")()
            bnv = _BNStatsParams(filters, name=f"BatchNorm_{bi}")()
            x = nn.swish(_static_int8_site(
                self, f"Conv_{ci}", x, kshape, tuple(args.strides), bnv,
                self.bn_epsilon, groups=filters).astype(self.dtype))
        elif self._fused_dw(x, filters) and not train and mode == "off":
            # mode guard: in "calib" this branch would silently skip the
            # absmax sow and the later int8_static apply would fail on the
            # missing quant variable (seen live at 512, where the auto
            # predicate first engages); any quant mode falls through to
            # the stock path, which records calibration correctly
            from tmv_tpu.kernels.dwconv_pallas import fused_dw_bn_swish

            kernel = _DWKernelParams(args.kernel_size, filters,
                                     name=f"Conv_{ci}")()
            scale, bias, mean, var = _BNStatsParams(
                filters, name=f"BatchNorm_{bi}")()
            fscale = scale / jnp.sqrt(var + self.bn_epsilon)
            foffset = bias - mean * fscale
            x = fused_dw_bn_swish(x, kernel[:, :, 0, :], fscale, foffset,
                                  stride=tuple(args.strides)[0])
        else:
            if calib:
                _sow_calib(self, f"Conv_{ci}", x)
            x = nn.Conv(filters, (args.kernel_size, args.kernel_size),
                        strides=tuple(args.strides), padding="SAME",
                        feature_group_count=filters, use_bias=False,
                        kernel_init=depthwise_kernel_init, dtype=self.dtype,
                        name=f"Conv_{ci}")(x)
            x = nn.swish(bn(x, f"BatchNorm_{bi}"))
        ci += 1
        bi += 1

        num_reduced = max(1, int(args.input_filters * args.se_ratio))
        x = SE(num_reduced, filters, self.dtype, name="SE_0")(x)

        if use_q:
            kshape = (1, 1, x.shape[-1], args.output_filters)
            _ConvKernelParams(kshape, name=f"Conv_{ci}")()
            bnv = _BNStatsParams(args.output_filters,
                                 name=f"BatchNorm_{bi}")()
            return _static_int8_site(
                self, f"Conv_{ci}", x, kshape, (1, 1), bnv,
                self.bn_epsilon).astype(self.dtype)
        if calib:
            _sow_calib(self, f"Conv_{ci}", x)
        x = nn.Conv(args.output_filters, (1, 1), padding="SAME",
                    use_bias=False, kernel_init=conv_kernel_init,
                    dtype=self.dtype, name=f"Conv_{ci}")(x)
        return bn(x, f"BatchNorm_{bi}")


class BackboneModel(nn.Module):
    """Stem + scaled MBConv chain; returns ``[final, reduction_1..5]``."""

    blocks_args: Sequence[EfficientDetBlockArgs]
    width_coefficient: float = 1.0
    depth_coefficient: float = 1.0
    depth_divisor: int = 8
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32
    fused_dw_eval: Any = False
    remat: bool = False
    stem_s2d: bool = False

    def scaled_blocks(self) -> List[EfficientDetBlockArgs]:
        out = []
        for args in self.blocks_args:
            assert args.num_repeat > 0
            scaled = args._replace(
                input_filters=round_filters(
                    args.input_filters, self.width_coefficient, self.depth_divisor
                ),
                output_filters=round_filters(
                    args.output_filters, self.width_coefficient, self.depth_divisor
                ),
                num_repeat=round_repeats(args.num_repeat, self.depth_coefficient),
            )
            out.append(scaled)
            if scaled.num_repeat > 1:
                rest = scaled._replace(
                    input_filters=scaled.output_filters, strides=(1, 1)
                )
                out.extend([rest] * (scaled.num_repeat - 1))
        # flatten: one entry per physical block
        flat = []
        for a in out:
            flat.append(a._replace(num_repeat=1))
        return flat

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Stem(self.blocks_args[0].input_filters, self.width_coefficient,
                 self.depth_divisor, self.bn_momentum, self.bn_epsilon,
                 self.dtype, stem_s2d=self.stem_s2d)(x, train)
        blocks = self.scaled_blocks()
        # block-level rematerialization: backward recomputes each MBConv's
        # interior (expand/dw/SE activations) instead of storing it — exact,
        # same variable tree (explicit names pin the direct autonames; see
        # YoloV4.remat)
        Block = (nn.remat(MBConvBlock, static_argnums=(2,))
                 if self.remat else MBConvBlock)
        reductions = []
        for idx, args in enumerate(blocks):
            is_last = idx == len(blocks) - 1
            next_downsamples = (not is_last) and blocks[idx + 1].strides[0] > 1
            x = Block(args, self.bn_momentum, self.bn_epsilon,
                      self.dtype,
                      fused_dw_eval=self.fused_dw_eval,
                      name=f"MBConvBlock_{idx}")(x, train)
            if is_last or next_downsamples:
                reductions.append(x)
        return [x] + reductions
