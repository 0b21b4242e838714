"""Pure-numpy forward oracle: the reference's TF layer semantics, transcribed.

This is the equivalence-oracle pattern of the reference's own
`yolo_v3/unit_test/loss_test.py:14-174` (a second, independent
implementation asserted equal to the production one) applied to the model
*forward* math, per the round-2 verdict: numeric parity of the flax models
must rest on a tested oracle, not on code reading.

Every primitive below is transcribed from the reference's TF calls — NOT
from the flax implementations under test:

- ``conv2d`` / SAME padding arithmetic — ``tf.keras.layers.Conv2D``
  semantics used by ``DarknetConv2D`` (`utils/tf_yolo_utils.py:272-289`).
- stride-2 Darknet downsampling — ``ZeroPadding2D(((1,0),(1,0)))`` + VALID
  (`yolo_v3/model.py:17-31`).
- ``batch_norm`` — ``tf.keras.layers.BatchNormalization`` inference math,
  Keras defaults momentum 0.99 / epsilon 1e-3.
- ``leaky``(0.1) — `utils/tf_yolo_utils.py:300`; ``mish`` —
  `utils/mish.py:3-16`; ``swish``/``sigmoid`` — `layers/se.py`.
- ``max_pool_same`` — SPP pools ``MaxPool2D(pool, strides=1, 'same')``
  (`yolo_v4/model.py:109-111`) and the resample downsample
  ``MaxPooling2D(3, 2, 'same')`` (`layers/resample_feature_map.py:28-33`).
- ``upsample2x_nearest`` — ``UpSampling2D(2)`` (`yolo_v3/model.py:120`);
  ``resize_nearest`` — ``tf.image.resize(..., 'nearest')``
  (`layers/resample_feature_map.py:35-41`, half-pixel source mapping).
- MBConv expand → depthwise → SE → project — `layers/mb_conv_block.py:8-160`
  (faithfully WITHOUT the residual skip, like the reference block);
  Stem — `layers/stem.py:6-38`.
- BiFPN raw-scalar fast-attention node math ``Σ wᵢ·xᵢ / (Σw + 1e-4)`` and
  the 8-node P3–P7 cell — `layers/bifpn.py:31-118`.
- ClassNet/BoxNet shared separable convs + per-level BN + i>0 residual and
  the ``(B, h, w, A, out)`` head reshape — `layers/class_net.py:6-103`,
  `layers/box_net.py:5-102`.

The oracle consumes the flax variable tree (weights are just numbers; the
*math* is what is independently re-derived) and returns per-module taps so
tests can assert tap-by-tap equality against
``model.apply(..., capture_intermediates=True)``.

All arithmetic is float64 — the oracle is the high-precision ground truth;
the flax/XLA float32 forward must agree to float32 roundoff.
"""

import numpy as np

# ---------------------------------------------------------------- primitives


def _f64(x):
    return np.asarray(x, np.float64)


def sigmoid(x):
    x = _f64(x)
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


def swish(x):
    return _f64(x) * sigmoid(x)


def leaky(x, alpha=0.1):
    x = _f64(x)
    return np.where(x > 0, x, alpha * x)


def softplus(x):
    return np.logaddexp(0.0, _f64(x))


def mish(x):
    x = _f64(x)
    return x * np.tanh(softplus(x))


def _same_pads(in_size, k, s):
    """TF 'same' padding: total pad so out = ceil(in/s), split before/after
    with the extra row/col AFTER (tf.nn.conv2d semantics)."""
    out = -(-in_size // s)
    pad = max((out - 1) * s + k - in_size, 0)
    return pad // 2, pad - pad // 2


def conv2d(x, kernel, strides=(1, 1), padding="SAME", bias=None,
           explicit_pad=None):
    """Dense conv, NHWC × HWIO.  ``explicit_pad`` = ((pt,pb),(pl,pr))
    forces explicit zero-padding then VALID (Darknet stride-2)."""
    x = _f64(x)
    kernel = _f64(kernel)
    kh, kw, _, co = kernel.shape
    sh, sw = strides
    if explicit_pad is not None:
        (pt, pb), (pl, pr) = explicit_pad
    elif padding == "SAME":
        pt, pb = _same_pads(x.shape[1], kh, sh)
        pl, pr = _same_pads(x.shape[2], kw, sw)
    else:
        pt = pb = pl = pr = 0
    xp = np.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    oh = (xp.shape[1] - kh) // sh + 1
    ow = (xp.shape[2] - kw) // sw + 1
    out = np.zeros((x.shape[0], oh, ow, co), np.float64)
    for di in range(kh):
        for dj in range(kw):
            patch = xp[:, di : di + oh * sh : sh, dj : dj + ow * sw : sw, :]
            out += np.einsum("bhwc,co->bhwo", patch, kernel[di, dj])
    if bias is not None:
        out = out + _f64(bias)
    return out


def depthwise_conv2d(x, kernel, strides=(1, 1), padding="SAME"):
    """Depthwise conv: kernel (kh, kw, 1, C), channel c uses input c only
    (``tf.keras.layers.DepthwiseConv2D`` / SeparableConv2D depthwise)."""
    x = _f64(x)
    kernel = _f64(kernel)
    kh, kw, _, c = kernel.shape
    assert x.shape[-1] == c
    sh, sw = strides
    if padding == "SAME":
        pt, pb = _same_pads(x.shape[1], kh, sh)
        pl, pr = _same_pads(x.shape[2], kw, sw)
    else:
        pt = pb = pl = pr = 0
    xp = np.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    oh = (xp.shape[1] - kh) // sh + 1
    ow = (xp.shape[2] - kw) // sw + 1
    out = np.zeros((x.shape[0], oh, ow, c), np.float64)
    for di in range(kh):
        for dj in range(kw):
            patch = xp[:, di : di + oh * sh : sh, dj : dj + ow * sw : sw, :]
            out += patch * kernel[di, dj, 0]
    return out


def batch_norm(x, scale, bias, mean, var, eps=1e-3):
    return (_f64(x) - _f64(mean)) / np.sqrt(_f64(var) + eps) * _f64(scale) \
        + _f64(bias)


def max_pool_same(x, window, strides=1):
    """MaxPool2D with SAME padding (pads with -inf)."""
    x = _f64(x)
    pt, pb = _same_pads(x.shape[1], window, strides)
    pl, pr = _same_pads(x.shape[2], window, strides)
    xp = np.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)),
                constant_values=-np.inf)
    oh = (xp.shape[1] - window) // strides + 1
    ow = (xp.shape[2] - window) // strides + 1
    out = np.full((x.shape[0], oh, ow, x.shape[-1]), -np.inf)
    for di in range(window):
        for dj in range(window):
            patch = xp[:, di : di + oh * strides : strides,
                       dj : dj + ow * strides : strides, :]
            out = np.maximum(out, patch)
    return out


def upsample2x_nearest(x):
    return np.repeat(np.repeat(_f64(x), 2, axis=1), 2, axis=2)


def resize_nearest(x, out_h, out_w):
    """tf.image.resize nearest with half-pixel centers:
    src = floor((dst + 0.5) * in/out)."""
    x = _f64(x)
    h, w = x.shape[1], x.shape[2]
    ri = np.floor((np.arange(out_h) + 0.5) * h / out_h).astype(int)
    ci = np.floor((np.arange(out_w) + 0.5) * w / out_w).astype(int)
    return x[:, ri][:, :, ci]


# --------------------------------------------------------- shared composites


ACTS = {"leaky": leaky, "mish": mish, "swish": swish, "linear": lambda x: x}


def darknet_conv(x, p, strides=1, bias=True):
    """DarknetConv2D: he-uniform Conv2D, top-left pad + VALID at stride 2
    (`utils/tf_yolo_utils.py:272-289`, `yolo_v3/model.py:17`)."""
    kernel = p["Conv_0"]["kernel"]
    if strides == 2:
        return conv2d(x, kernel, (2, 2), explicit_pad=((1, 0), (1, 0)),
                      bias=p["Conv_0"].get("bias") if bias else None)
    return conv2d(x, kernel, (1, 1), "SAME",
                  bias=p["Conv_0"].get("bias") if bias else None)


def conv_bn(x, p, s, act="leaky", strides=1):
    """DarknetConv2D_BN_{Leaky,Mish} (`utils/tf_yolo_utils.py:291-333`)."""
    x = darknet_conv(x, p["DarknetConv_0"], strides, bias=False)
    bp, bst = p["BatchNorm_0"], s["BatchNorm_0"]
    x = batch_norm(x, bp["scale"], bp["bias"], bst["mean"], bst["var"])
    return ACTS[act](x)


# --------------------------------------------------------------- YOLO v3/v4


def yolo_v3_forward(params, batch_stats, x, taps=None):
    """`yolo_v3/model.py:7-155` transcription.  Returns (h1, h2, h3)."""
    taps = taps if taps is not None else {}

    def CB(x, name, scope_p, scope_s, act="leaky", strides=1):
        return conv_bn(x, scope_p[name], scope_s[name], act, strides)

    def resblock(x, rp, rs, num_blocks):
        x = CB(x, "ConvBN_0", rp, rs, strides=2)
        for i in range(num_blocks):
            y = CB(x, f"ConvBN_{2 * i + 1}", rp, rs)
            y = CB(y, f"ConvBN_{2 * i + 2}", rp, rs)
            x = x + y
        return x

    dp, ds = params["DarknetBody_0"], batch_stats["DarknetBody_0"]
    x = CB(x, "ConvBN_0", dp, ds)
    for i, nb in enumerate([1, 2, 8, 8, 4]):
        x = resblock(x, dp[f"ResblockBody_{i}"], ds[f"ResblockBody_{i}"], nb)
        taps[f"DarknetBody_0/ResblockBody_{i}"] = x
        if i == 2:
            y3 = x
        if i == 3:
            y2 = x
    y1 = x

    def last_layers(x, lp, ls):
        for i in range(5):
            x = CB(x, f"ConvBN_{i}", lp, ls)
        y = CB(x, "ConvBN_5", lp, ls)
        return x, y

    x, h1 = last_layers(y1, params["LastLayers_0"],
                        batch_stats["LastLayers_0"])
    h1 = darknet_conv(h1, params["DarknetConv_0"])
    taps["LastLayers_0"] = x

    x = CB(x, "ConvBN_0", params, batch_stats)
    x = upsample2x_nearest(x)
    x = np.concatenate([x, y2], axis=-1)
    x, h2 = last_layers(x, params["LastLayers_1"],
                        batch_stats["LastLayers_1"])
    h2 = darknet_conv(h2, params["DarknetConv_1"])
    taps["LastLayers_1"] = x

    x = CB(x, "ConvBN_1", params, batch_stats)
    x = upsample2x_nearest(x)
    x = np.concatenate([x, y3], axis=-1)
    _, h3 = last_layers(x, params["LastLayers_2"],
                        batch_stats["LastLayers_2"])
    h3 = darknet_conv(h3, params["DarknetConv_2"])
    return h1, h2, h3


def yolo_v4_forward(params, batch_stats, x, taps=None):
    """`yolo_v4/model.py:12-279` transcription.  Returns (z1, z2, z3)."""
    taps = taps if taps is not None else {}

    def CB(x, p, s, act="leaky", strides=1):
        return conv_bn(x, p, s, act, strides)

    def blocks_layer(x, p, s):
        # first CSP stage, full-width branches (`yolo_v4/model.py:12-50`)
        x = CB(x, p["ConvBN_0"], s["ConvBN_0"], "mish", strides=2)
        x1 = CB(x, p["ConvBN_1"], s["ConvBN_1"], "mish")
        x2_1 = CB(x, p["ConvBN_2"], s["ConvBN_2"], "mish")
        x2_2 = CB(x2_1, p["ConvBN_3"], s["ConvBN_3"], "mish")
        x2_2 = CB(x2_2, p["ConvBN_4"], s["ConvBN_4"], "mish")
        x2 = x2_1 + x2_2
        x2 = CB(x2, p["ConvBN_5"], s["ConvBN_5"], "mish")
        x = np.concatenate([x2, x1], axis=-1)
        return CB(x, p["ConvBN_6"], s["ConvBN_6"], "mish")

    def blocks_layer2(x, p, s, blocks_num):
        # CSP stage, half-width branches (`yolo_v4/model.py:52-95`)
        x = CB(x, p["ConvBN_0"], s["ConvBN_0"], "mish", strides=2)
        x1 = CB(x, p["ConvBN_1"], s["ConvBN_1"], "mish")
        x2_1 = CB(x, p["ConvBN_2"], s["ConvBN_2"], "mish")
        for i in range(blocks_num):
            x2_2 = CB(x2_1, p[f"ConvBN_{3 + 2 * i}"],
                      s[f"ConvBN_{3 + 2 * i}"], "mish")
            x2_2 = CB(x2_2, p[f"ConvBN_{4 + 2 * i}"],
                      s[f"ConvBN_{4 + 2 * i}"], "mish")
            x2_1 = x2_1 + x2_2
        x2 = CB(x2_1, p[f"ConvBN_{3 + 2 * blocks_num}"],
                s[f"ConvBN_{3 + 2 * blocks_num}"], "mish")
        x = np.concatenate([x2, x1], axis=-1)
        return CB(x, p[f"ConvBN_{4 + 2 * blocks_num}"],
                  s[f"ConvBN_{4 + 2 * blocks_num}"], "mish")

    def last_layer(x, p, s):
        # 3 convs + SPP(5/9/13, concat reversed) + 3 convs
        # (`yolo_v4/model.py:97-131`)
        x = CB(x, p["ConvBN_0"], s["ConvBN_0"])
        x = CB(x, p["ConvBN_1"], s["ConvBN_1"])
        x = CB(x, p["ConvBN_2"], s["ConvBN_2"])
        x2 = max_pool_same(x, 5)
        x3 = max_pool_same(x, 9)
        x4 = max_pool_same(x, 13)
        x = np.concatenate([x4, x3, x2, x], axis=-1)
        x = CB(x, p["ConvBN_3"], s["ConvBN_3"])
        x = CB(x, p["ConvBN_4"], s["ConvBN_4"])
        return CB(x, p["ConvBN_5"], s["ConvBN_5"])

    def last_layer2(x1, x2, p, s):
        # PAN top-down merge (`yolo_v4/model.py:133-165`)
        x1 = CB(x1, p["ConvBN_0"], s["ConvBN_0"])
        x1 = upsample2x_nearest(x1)
        x2 = CB(x2, p["ConvBN_1"], s["ConvBN_1"])
        x = np.concatenate([x2, x1], axis=-1)
        for i in range(2, 7):
            x = CB(x, p[f"ConvBN_{i}"], s[f"ConvBN_{i}"])
        return x

    def output_layer2(x, y, p, s):
        # PAN bottom-up merge (`yolo_v4/model.py:183-219`)
        x = CB(x, p["ConvBN_0"], s["ConvBN_0"], strides=2)
        x = np.concatenate([x, y], axis=-1)
        for i in range(1, 6):
            x = CB(x, p[f"ConvBN_{i}"], s[f"ConvBN_{i}"])
        y_out = CB(x, p["ConvBN_6"], s["ConvBN_6"])
        return y_out, x

    p, s = params, batch_stats
    x = CB(x, p["ConvBN_0"], s["ConvBN_0"], "mish")
    x = blocks_layer(x, p["BlocksLayer_0"], s["BlocksLayer_0"])
    taps["BlocksLayer_0"] = x
    for i, nb in enumerate([2, 8, 8, 4]):
        x = blocks_layer2(x, p[f"BlocksLayer2_{i}"], s[f"BlocksLayer2_{i}"],
                          nb)
        taps[f"BlocksLayer2_{i}"] = x
        if i == 1:
            y3 = x
        if i == 2:
            y2 = x
    y1 = x

    y1 = last_layer(y1, p["LastLayer_0"], s["LastLayer_0"])
    taps["LastLayer_0"] = y1
    y2 = last_layer2(y1, y2, p["LastLayer2_0"], s["LastLayer2_0"])
    y3 = last_layer2(y2, y3, p["LastLayer2_1"], s["LastLayer2_1"])
    taps["LastLayer2_1"] = y3

    z3 = CB(y3, p["ConvBN_1"], s["ConvBN_1"])
    z3 = darknet_conv(z3, p["DarknetConv_0"])
    z2, y2 = output_layer2(y3, y2, p["OutputLayer2_0"], s["OutputLayer2_0"])
    z2 = darknet_conv(z2, p["DarknetConv_1"])
    z1, _ = output_layer2(y2, y1, p["OutputLayer2_1"], s["OutputLayer2_1"])
    z1 = darknet_conv(z1, p["DarknetConv_2"])
    return z1, z2, z3


# ------------------------------------------------------------- EfficientDet


def _stem(x, p, s, eps):
    x = conv2d(x, p["Conv_0"]["kernel"], (2, 2), "SAME")
    b, bst = p["BatchNorm_0"], s["BatchNorm_0"]
    return swish(batch_norm(x, b["scale"], b["bias"], bst["mean"],
                            bst["var"], eps))


def _mbconv(x, p, s, args, eps):
    """`layers/mb_conv_block.py:8-160`: expand → depthwise → SE → project,
    NO residual skip (reference quirk)."""
    ci = bi = 0

    def bn(y, i):
        bp, bst = p[f"BatchNorm_{i}"], s[f"BatchNorm_{i}"]
        return batch_norm(y, bp["scale"], bp["bias"], bst["mean"],
                          bst["var"], eps)

    if args.expand_ratio != 1:
        x = swish(bn(conv2d(x, p[f"Conv_{ci}"]["kernel"], (1, 1), "SAME"),
                     bi))
        ci += 1
        bi += 1
    x = depthwise_conv2d(x, p[f"Conv_{ci}"]["kernel"],
                         tuple(args.strides), "SAME")
    x = swish(bn(x, bi))
    ci += 1
    bi += 1
    # SE (`layers/se.py:5-39`): global mean → 1×1 → swish → 1×1 → sigmoid·x
    se_p = p["SE_0"]
    se = np.mean(x, axis=(1, 2), keepdims=True)
    se = conv2d(se, se_p["Conv_0"]["kernel"], bias=se_p["Conv_0"]["bias"])
    se = swish(se)
    se = conv2d(se, se_p["Conv_1"]["kernel"], bias=se_p["Conv_1"]["bias"])
    x = sigmoid(se) * x
    x = conv2d(x, p[f"Conv_{ci}"]["kernel"], (1, 1), "SAME")
    return bn(x, bi)


def backbone_forward(params, batch_stats, x, scaled_blocks, eps=1e-3,
                     taps=None):
    """`efficientnet/backbone_model.py:12-148`: Stem + MBConv chain,
    reduction endpoints.  Returns [final, r1..r5]."""
    taps = taps if taps is not None else {}
    x = _stem(x, params["Stem_0"], batch_stats["Stem_0"], eps)
    reductions = []
    for idx, args in enumerate(scaled_blocks):
        is_last = idx == len(scaled_blocks) - 1
        next_down = (not is_last) and scaled_blocks[idx + 1].strides[0] > 1
        x = _mbconv(x, params[f"MBConvBlock_{idx}"],
                    batch_stats[f"MBConvBlock_{idx}"], args, eps)
        taps[f"MBConvBlock_{idx}"] = x
        if is_last or next_down:
            reductions.append(x)
    return [x] + reductions


def _separable_conv(x, p):
    """SeparableConv2D(depth_multiplier=1): depthwise then 1×1+bias."""
    x = depthwise_conv2d(x, p["depthwise"]["kernel"], (1, 1), "SAME")
    return conv2d(x, p["pointwise"]["kernel"],
                  bias=p["pointwise"].get("bias"))


def _resample(x, p, s, level_size, eps):
    """`layers/resample_feature_map.py:5-52`."""
    if "conv2d" in p:
        x = conv2d(x, p["conv2d"]["kernel"], bias=p["conv2d"].get("bias"))
        bp, bst = p["bn"], s["bn"]
        x = batch_norm(x, bp["scale"], bp["bias"], bst["mean"], bst["var"],
                       eps)
    h = x.shape[1]
    if h > level_size:
        x = max_pool_same(x, 3, 2)
    elif h < level_size:
        x = resize_nearest(x, level_size, level_size)
    return x


def _bifpn_node(inputs, p, s, level_size, eps):
    """Raw-scalar fast attention + OpAfterCombine
    (`layers/bifpn.py:31-74`)."""
    # a channel-matched resample has no variables at all → absent from tree
    resampled = [
        _resample(x, p.get(f"ResampleFeatureMap_{i}", {}),
                  s.get(f"ResampleFeatureMap_{i}", {}), level_size, eps)
        for i, x in enumerate(inputs)
    ]
    wsms = [np.float64(p[f"WSM_{i}"]) for i in range(len(inputs))]
    wsum = sum(wsms)
    fused = sum(r * w / (wsum + 1e-4) for r, w in zip(resampled, wsms))
    op, ost = p["OpAfterCombine_0"], s["OpAfterCombine_0"]
    y = swish(fused)
    y = _separable_conv(y, op["SeparableConv_0"])
    bp, bst = op["BatchNorm_0"], ost["BatchNorm_0"]
    return batch_norm(y, bp["scale"], bp["bias"], bst["mean"], bst["var"],
                      eps)


def bifpn_forward(inputs, p, s, levels_size, eps=1e-3):
    """One BiFPN cell over n levels (`layers/bifpn.py:77-118`)."""
    n = len(inputs)
    ls = levels_size
    node_i = 0

    def node(ins, size):
        nonlocal node_i
        out = _bifpn_node(ins, p[f"BiFPNNode_{node_i}"],
                          s[f"BiFPNNode_{node_i}"], size, eps)
        node_i += 1
        return out

    td = {}
    prev = inputs[n - 1]
    for i in range(n - 2, 0, -1):
        td[i] = node([inputs[i], prev], ls[i])
        prev = td[i]
    outs = [node([inputs[0], td[1]], ls[0])]
    for i in range(1, n - 1):
        outs.append(node([inputs[i], td[i], outs[-1]], ls[i]))
    outs.append(node([inputs[n - 1], outs[-1]], ls[n - 1]))
    return outs


def prediction_net_forward(inputs, p, s, repeats, num_anchors,
                           out_per_anchor, survival_prob, eps=1e-3):
    """ClassNet/BoxNet shared-conv + per-level-BN head
    (`layers/class_net.py:6-103`); eval mode (drop_connect inactive, the
    i>0 residual still applies)."""
    outputs = []
    for level_id in range(len(inputs)):
        image = _f64(inputs[level_id])
        for i in range(repeats):
            original = image
            image = _separable_conv(image, p[f"conv_{i}"])
            bp = p[f"bn_{i}_level_{level_id}"]
            bst = s[f"bn_{i}_level_{level_id}"]
            image = batch_norm(image, bp["scale"], bp["bias"], bst["mean"],
                               bst["var"], eps)
            image = swish(image)
            if i > 0 and survival_prob:
                image = image + original
        out = _separable_conv(image, p["predict"])
        b, h, w, _ = out.shape
        outputs.append(out.reshape(b, h, w, num_anchors, out_per_anchor))
    return outputs


def efficientdet_forward(params, batch_stats, x, cfg, scaled_blocks,
                         taps=None):
    """`efficientnet/efficientdet_net.py:10-95`: backbone → P6/P7 resample →
    BiFPN cells → heads.  Returns (boxes_outputs, classes_outputs)."""
    taps = taps if taps is not None else {}
    eps = cfg.batch_norm_epsilon
    all_feats = backbone_forward(params["backbone"],
                                 batch_stats["backbone"], x, scaled_blocks,
                                 eps)
    feats = list(all_feats[cfg.min_level : cfg.max_level + 1])
    for level in range(6, cfg.max_level + 1):
        feats.append(
            _resample(feats[-1], params.get(f"resample_p{level}", {}),
                      batch_stats.get(f"resample_p{level}", {}),
                      cfg.levels_size[level], eps))
    taps["pre_fpn"] = list(feats)

    levels_size = cfg.levels_size[cfg.min_level : cfg.max_level + 1]
    for rep in range(cfg.fpn_cell_repeats):
        feats = bifpn_forward(feats, params[f"fpn_cell_{rep}"],
                              batch_stats[f"fpn_cell_{rep}"], levels_size,
                              eps)
        taps[f"fpn_cell_{rep}"] = list(feats)

    num_anchors = len(cfg.aspect_ratios) * cfg.num_scales
    classes_outputs = prediction_net_forward(
        feats, params["class_net"]["net"], batch_stats["class_net"]["net"],
        cfg.box_class_repeats, num_anchors, cfg.num_classes,
        cfg.survival_prob, eps)
    boxes_outputs = prediction_net_forward(
        feats, params["box_net"]["net"], batch_stats["box_net"]["net"],
        cfg.box_class_repeats, num_anchors, 4, cfg.survival_prob, eps)
    return boxes_outputs, classes_outputs
