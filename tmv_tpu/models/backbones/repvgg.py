"""RepVGG with structural reparameterization (flax/NHWC).

Parity surface: `AIServer/ai_api/ai_models/backbones/repvgg.py`:
- ``RepVGGBlock`` (`:16-90`): train-time 3×3+1×1+identity-BN branches with a
  shared relu; deploy-time single biased 3×3 conv.
- BN-folding math ``get_equivalent_kernel_bias``/``_fuse_bn_tensor``
  (`:53-86`): kernel·γ/σ, bias β−μγ/σ, 1×1 kernel zero-padded into 3×3, the
  identity branch as a centered one-hot kernel (grouped layout
  ``[1,1,i % (C/g), i]``).
- ``RepVGG`` stages (`:92-150`) and the A0–B3g4 factory table (`:166-235`).
- ``repvgg_convert_params`` ports ``repvgg_model_convert`` (`:243-267`) to
  flax param pytrees: train variables → deploy variables, verified by the
  equivalence test.
"""

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class ConvBn(nn.Module):
    filters: int
    kernel_size: int
    strides: int = 1
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # symmetric PyTorch-style padding (k//2): required so the fused 1×1
        # kernel (embedded at the 3×3 center) samples the same positions as
        # the standalone 1×1 branch under stride 2 — TF 'SAME' pads
        # asymmetrically there and breaks reparam exactness at borders.
        pad = self.kernel_size // 2
        x = nn.Conv(self.filters, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                            epsilon=1e-3, dtype=self.dtype, name="bn")(x)


class RepVGGBlock(nn.Module):
    filters: int
    strides: int = 1
    groups: int = 1
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deploy:
            y = nn.Conv(self.filters, (3, 3),
                        strides=(self.strides, self.strides),
                        padding=((1, 1), (1, 1)),
                        feature_group_count=self.groups, use_bias=True,
                        dtype=self.dtype, name="rbr_reparam")(x)
            return nn.relu(y)
        in_channels = x.shape[-1]
        has_identity = in_channels == self.filters and self.strides == 1
        dense = ConvBn(self.filters, 3, self.strides, self.groups,
                       self.dtype, name="rbr_dense")(x, train)
        one = ConvBn(self.filters, 1, self.strides, self.groups,
                     self.dtype, name="rbr_1x1")(x, train)
        if has_identity:
            ident = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, dtype=self.dtype,
                                 name="rbr_identity")(x)
        else:
            ident = 0
        return nn.relu(dense + one + ident)


class RepVGG(nn.Module):
    num_blocks: Sequence[int]
    num_classes: int = 1000
    width_multiplier: Sequence[float] = (1.0, 1.0, 1.0, 2.5)
    override_groups_map: Optional[Dict[int, int]] = None
    deploy: bool = False
    dtype: Any = jnp.float32
    remat: bool = False

    def stage_plan(self):
        """(filters, stride, groups) per block per stage (incl. stage0)."""
        groups_map = self.override_groups_map or {}
        wm = self.width_multiplier
        plan = [[(min(64, int(64 * wm[0])), 2, 1)]]
        layer_idx = 1
        for stage, (base, blocks) in enumerate(
            zip((64, 128, 256, 512), self.num_blocks)
        ):
            planes = int(base * wm[stage])
            stage_blocks = []
            for i in range(blocks):
                stride = 2 if i == 0 else 1
                groups = groups_map.get(layer_idx, 1)
                stage_blocks.append((planes, stride, groups))
                layer_idx += 1
            plan.append(stage_blocks)
        return plan

    @nn.compact
    def __call__(self, x, train: bool = False):
        plan = self.stage_plan()
        # remat: block-level rematerialization — exact, same variable tree
        # (explicit names already pin the tree; see YoloV4.remat)
        Block = (nn.remat(RepVGGBlock, static_argnums=(2,))
                 if self.remat else RepVGGBlock)
        outs = {}
        for si, stage_blocks in enumerate(plan):
            for bi, (planes, stride, groups) in enumerate(stage_blocks):
                x = Block(planes, stride, groups, self.deploy,
                          self.dtype, name=f"stage{si}_block{bi}")(
                    x, train)
            outs[f"stage{si}"] = x
        if self.num_classes:
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(self.num_classes, dtype=self.dtype,
                            name="dense")(x)
        return outs


_OPTIONAL_GROUPWISE = [2, 4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26]
_G2 = {l: 2 for l in _OPTIONAL_GROUPWISE}
_G4 = {l: 4 for l in _OPTIONAL_GROUPWISE}

_VARIANTS = {
    "RepVGG-A0": dict(num_blocks=(2, 4, 14, 1), width_multiplier=(0.75, 0.75, 0.75, 2.5), override_groups_map=None),
    "RepVGG-A1": dict(num_blocks=(2, 4, 14, 1), width_multiplier=(1, 1, 1, 2.5), override_groups_map=None),
    "RepVGG-A2": dict(num_blocks=(2, 4, 14, 1), width_multiplier=(1.5, 1.5, 1.5, 2.75), override_groups_map=None),
    "RepVGG-B0": dict(num_blocks=(4, 6, 16, 1), width_multiplier=(1, 1, 1, 2.5), override_groups_map=None),
    "RepVGG-B1": dict(num_blocks=(4, 6, 16, 1), width_multiplier=(2, 2, 2, 4), override_groups_map=None),
    "RepVGG-B1g2": dict(num_blocks=(4, 6, 16, 1), width_multiplier=(2, 2, 2, 4), override_groups_map=_G2),
    "RepVGG-B1g4": dict(num_blocks=(4, 6, 16, 1), width_multiplier=(2, 2, 2, 4), override_groups_map=_G4),
    "RepVGG-B2": dict(num_blocks=(4, 6, 16, 1), width_multiplier=(2.5, 2.5, 2.5, 5), override_groups_map=None),
    "RepVGG-B2g2": dict(num_blocks=(4, 6, 16, 1), width_multiplier=(2.5, 2.5, 2.5, 5), override_groups_map=_G2),
    "RepVGG-B2g4": dict(num_blocks=(4, 6, 16, 1), width_multiplier=(2.5, 2.5, 2.5, 5), override_groups_map=_G4),
    "RepVGG-B3": dict(num_blocks=(4, 6, 16, 1), width_multiplier=(3, 3, 3, 5), override_groups_map=None),
    "RepVGG-B3g2": dict(num_blocks=(4, 6, 16, 1), width_multiplier=(3, 3, 3, 5), override_groups_map=_G2),
    "RepVGG-B3g4": dict(num_blocks=(4, 6, 16, 1), width_multiplier=(3, 3, 3, 5), override_groups_map=_G4),
}


def get_repvgg_by_name(name: str, num_classes: int = 1000,
                       deploy: bool = False, dtype=jnp.float32,
                       remat: bool = False) -> RepVGG:
    cfg = _VARIANTS[name]
    return RepVGG(num_classes=num_classes, deploy=deploy, dtype=dtype,
                  remat=remat, **cfg)


def _fuse_convbn(kernel, gamma, beta, mean, var, eps=1e-3):
    std = np.sqrt(np.asarray(var) + eps)
    t = (np.asarray(gamma) / std).reshape(1, 1, 1, -1)
    return np.asarray(kernel) * t, np.asarray(beta) - np.asarray(mean) * np.asarray(gamma) / std


def repvgg_convert_params(train_variables, model: RepVGG):
    """Fold the train-time branches into deploy ``rbr_reparam`` params.

    Returns a params pytree for ``get_repvgg_by_name(..., deploy=True)``.
    """
    params = train_variables["params"]
    stats = train_variables["batch_stats"]
    plan = model.stage_plan()
    out: Dict[str, Any] = {}
    for si, stage_blocks in enumerate(plan):
        for bi, (planes, stride, groups) in enumerate(stage_blocks):
            name = f"stage{si}_block{bi}"
            p, s = params[name], stats[name]
            k3, b3 = _fuse_convbn(
                p["rbr_dense"]["conv"]["kernel"],
                p["rbr_dense"]["bn"]["scale"], p["rbr_dense"]["bn"]["bias"],
                s["rbr_dense"]["bn"]["mean"], s["rbr_dense"]["bn"]["var"],
            )
            k1, b1 = _fuse_convbn(
                p["rbr_1x1"]["conv"]["kernel"],
                p["rbr_1x1"]["bn"]["scale"], p["rbr_1x1"]["bn"]["bias"],
                s["rbr_1x1"]["bn"]["mean"], s["rbr_1x1"]["bn"]["var"],
            )
            k1 = np.pad(k1, [[1, 1], [1, 1], [0, 0], [0, 0]])
            kernel = k3 + k1
            bias = b3 + b1
            if "rbr_identity" in p:
                in_ch = kernel.shape[2] * groups
                input_dim = in_ch // groups
                kid = np.zeros((3, 3, input_dim, in_ch), np.float32)
                for i in range(in_ch):
                    kid[1, 1, i % input_dim, i] = 1.0
                kf, bf = _fuse_convbn(
                    kid, p["rbr_identity"]["scale"], p["rbr_identity"]["bias"],
                    s["rbr_identity"]["mean"], s["rbr_identity"]["var"],
                )
                kernel = kernel + kf
                bias = bias + bf
            out[name] = {
                "rbr_reparam": {
                    "kernel": jnp.asarray(kernel),
                    "bias": jnp.asarray(bias),
                }
            }
    if model.num_classes:
        out["dense"] = {
            "kernel": jnp.asarray(params["dense"]["kernel"]),
            "bias": jnp.asarray(params["dense"]["bias"]),
        }
    return {"params": out}
