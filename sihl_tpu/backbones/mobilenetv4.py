"""MobileNetV4 feature nets (NHWC, flax-NNX).

Per Qin et al., arXiv:2404.10518 (the timm ``mobilenetv4_*`` models the
reference registers, ``src/sihl/timm_backbone.py:72-78``).  The building
block is the Universal Inverted Bottleneck (UIB) — an inverted bottleneck
with an optional depthwise conv *before* expansion and an optional one in
the middle, which specializes to the paper's four instantiations
(IB / ConvNext-like / ExtraDW / FFN).  ``hybrid`` variants interleave
Mobile-MQA attention blocks (multi-query: shared single K/V head) into
the stride-16/32 stages.

Stage widths, strides, per-stage block counts, per-block (dw_start,
dw_mid, expand) parameters, and the final 1x1 960-channel conv match the
timm ``conv_small/medium/large`` arch definitions block for block (so the
``features_only`` pyramid channels agree, incl. 960 at stride 32).  The
``hybrid`` variants place a Mobile-MQA block after every third deep UIB —
a best-effort reconstruction of timm's explicit interleave (timm is not
importable in this environment to transcribe exactly).
"""

from typing import List, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import make_conv, make_norm, _rngs
from sihl_tpu.policy import compute_dtype, param_dtype


class _ConvBN(nnx.Module):
    def __init__(self, cin, cout, k, stride=1, groups=1, act=True, rngs=None):
        self.conv = make_conv(cin, cout, k, stride=stride, groups=groups, bias=False, rngs=rngs)
        self.bn = make_norm("batch", cout, 1, rngs)
        self.act = act

    def __call__(self, x):
        x = self.bn(self.conv(x))
        return nnx.relu(x) if self.act else x


class UIB(nnx.Module):
    """Universal Inverted Bottleneck: [dw_start] -> expand 1x1 ->
    [dw_mid] -> project 1x1; residual when shapes allow."""

    def __init__(self, cin, cout, k_start, k_mid, stride, expand, rngs=None):
        mid = int(cin * expand)
        self.use_residual = stride == 1 and cin == cout
        self.dw_start = (
            _ConvBN(cin, cin, k_start, groups=cin, act=False, rngs=rngs)
            if k_start
            else None
        )
        self.expand = _ConvBN(cin, mid, 1, rngs=rngs)
        self.dw_mid = (
            _ConvBN(mid, mid, k_mid, stride=stride, groups=mid, rngs=rngs)
            if k_mid
            else None
        )
        self.project = _ConvBN(mid, cout, 1, act=False, rngs=rngs)

    def __call__(self, x):
        h = x
        if self.dw_start is not None:
            h = self.dw_start(h)
        h = self.expand(h)
        if self.dw_mid is not None:
            h = self.dw_mid(h)
        h = self.project(h)
        return x + h if self.use_residual else h


class FusedIB(nnx.Module):
    """Fused inverted bottleneck: full 3x3 expand conv -> 1x1 project."""

    def __init__(self, cin, cout, stride, expand, rngs=None):
        mid = int(cin * expand)
        self.use_residual = stride == 1 and cin == cout
        self.fused = _ConvBN(cin, mid, 3, stride=stride, rngs=rngs)
        self.project = _ConvBN(mid, cout, 1, act=False, rngs=rngs)

    def __call__(self, x):
        h = self.project(self.fused(x))
        return x + h if self.use_residual else h


class MobileMQA(nnx.Module):
    """Mobile multi-query attention block: per-head queries share one K/V
    head (arXiv:2404.10518 §4.2); pre-LN, residual."""

    def __init__(self, channels, num_heads=4, head_dim=64, rngs=None):
        self.num_heads = num_heads
        self.head_dim = head_dim
        dt, pt = compute_dtype(), param_dtype()
        self.norm = nnx.LayerNorm(channels, epsilon=1e-6, dtype=dt, param_dtype=pt, rngs=rngs)
        self.q = nnx.Linear(channels, num_heads * head_dim, use_bias=False, dtype=dt, param_dtype=pt, rngs=rngs)
        self.kv = nnx.Linear(channels, 2 * head_dim, use_bias=False, dtype=dt, param_dtype=pt, rngs=rngs)
        self.out = nnx.Linear(num_heads * head_dim, channels, use_bias=False, dtype=dt, param_dtype=pt, rngs=rngs)

    def __call__(self, x):
        b, h, w, c = x.shape
        tokens = self.norm(x.reshape(b, h * w, c))
        q = self.q(tokens).reshape(b, h * w, self.num_heads, self.head_dim)
        kv = self.kv(tokens)
        k, v = kv[..., : self.head_dim], kv[..., self.head_dim :]
        logits = (
            jnp.einsum("bqhd,bkd->bhqk", q, k).astype(jnp.float32)
            * self.head_dim**-0.5
        )
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkd->bqhd", attn, v)
        out = self.out(out.reshape(b, h * w, self.num_heads * self.head_dim))
        return x + out.reshape(b, h, w, c)


# spec entry forms:
#   ("conv", cout, k, stride)
#   ("fused", cout, stride, expand)
#   ("uib", cout, k_start, k_mid, stride, expand)
#   ("mqa",)
# a new pyramid level is emitted after the last block at each stride.
MOBILENETV4_CONFIGS = {
    "mobilenetv4_conv_small": [
        ("conv", 32, 3, 2), ("conv", 32, 1, 1),
        ("conv", 96, 3, 2), ("conv", 64, 1, 1),
        ("uib", 96, 5, 5, 2, 3.0), ("uib", 96, 0, 3, 1, 2.0),
        ("uib", 96, 0, 3, 1, 2.0), ("uib", 96, 0, 3, 1, 2.0),
        ("uib", 96, 0, 3, 1, 2.0), ("uib", 96, 3, 0, 1, 4.0),
        ("uib", 128, 3, 3, 2, 6.0), ("uib", 128, 5, 5, 1, 4.0),
        ("uib", 128, 0, 5, 1, 4.0), ("uib", 128, 0, 5, 1, 3.0),
        ("uib", 128, 0, 3, 1, 4.0), ("uib", 128, 0, 3, 1, 4.0),
        ("conv", 960, 1, 1),  # timm blocks end with cn_r1_k1_s1_c960
    ],
    "mobilenetv4_conv_medium": [
        ("fused", 48, 2, 4.0),
        ("uib", 80, 3, 5, 2, 4.0), ("uib", 80, 3, 3, 1, 2.0),
        ("uib", 160, 3, 5, 2, 6.0), ("uib", 160, 3, 3, 1, 4.0),
        ("uib", 160, 3, 3, 1, 4.0), ("uib", 160, 3, 5, 1, 4.0),
        ("uib", 160, 3, 3, 1, 4.0), ("uib", 160, 3, 0, 1, 4.0),
        ("uib", 160, 0, 0, 1, 2.0), ("uib", 160, 3, 0, 1, 4.0),
        ("uib", 256, 5, 5, 2, 6.0), ("uib", 256, 5, 5, 1, 4.0),
        ("uib", 256, 3, 5, 1, 4.0), ("uib", 256, 3, 5, 1, 4.0),
        ("uib", 256, 0, 0, 1, 4.0), ("uib", 256, 3, 0, 1, 4.0),
        ("uib", 256, 3, 5, 1, 2.0), ("uib", 256, 5, 5, 1, 4.0),
        ("uib", 256, 0, 0, 1, 4.0), ("uib", 256, 0, 0, 1, 4.0),
        ("uib", 256, 5, 0, 1, 2.0),
        ("conv", 960, 1, 1),  # timm blocks end with cn_r1_k1_s1_c960
    ],
    "mobilenetv4_conv_large": [
        ("fused", 48, 2, 4.0),
        ("uib", 96, 3, 5, 2, 4.0), ("uib", 96, 3, 3, 1, 4.0),
        ("uib", 192, 3, 5, 2, 4.0), ("uib", 192, 3, 3, 1, 4.0),
        ("uib", 192, 3, 3, 1, 4.0), ("uib", 192, 3, 3, 1, 4.0),
        ("uib", 192, 3, 5, 1, 4.0), ("uib", 192, 5, 3, 1, 4.0),
        ("uib", 192, 5, 3, 1, 4.0), ("uib", 192, 5, 3, 1, 4.0),
        ("uib", 192, 5, 3, 1, 4.0), ("uib", 192, 5, 3, 1, 4.0),
        ("uib", 192, 3, 0, 1, 4.0),
        ("uib", 512, 5, 5, 2, 4.0), ("uib", 512, 5, 5, 1, 4.0),
        ("uib", 512, 5, 5, 1, 4.0), ("uib", 512, 5, 5, 1, 4.0),
        ("uib", 512, 5, 0, 1, 4.0), ("uib", 512, 5, 3, 1, 4.0),
        ("uib", 512, 5, 0, 1, 4.0), ("uib", 512, 5, 0, 1, 4.0),
        ("uib", 512, 5, 3, 1, 4.0), ("uib", 512, 5, 5, 1, 4.0),
        ("uib", 512, 5, 0, 1, 4.0), ("uib", 512, 5, 0, 1, 4.0),
        ("uib", 512, 5, 0, 1, 4.0),
        ("conv", 960, 1, 1),  # timm blocks end with cn_r1_k1_s1_c960
    ],
}
# hybrids: conv specs with MQA blocks interleaved in the s16/s32 stages
MOBILENETV4_CONFIGS["mobilenetv4_hybrid_medium"] = []
MOBILENETV4_CONFIGS["mobilenetv4_hybrid_large"] = []
for _src, _dst in (
    ("mobilenetv4_conv_medium", "mobilenetv4_hybrid_medium"),
    ("mobilenetv4_conv_large", "mobilenetv4_hybrid_large"),
):
    _spec = []
    _deep_channels = {160, 192, 256, 512}
    _count = 0
    for _e in MOBILENETV4_CONFIGS[_src]:
        _spec.append(_e)
        if _e[0] == "uib" and _e[1] in _deep_channels and _e[4] == 1:
            _count += 1
            if _count % 3 == 0:  # an MQA block every third deep UIB
                _spec.append(("mqa",))
    MOBILENETV4_CONFIGS[_dst] = _spec


class MobileNetV4Features(nnx.Module):
    def __init__(self, name: str, input_channels: int = 3, *, rngs: Optional[nnx.Rngs] = None):
        rngs = _rngs(rngs)
        spec = MOBILENETV4_CONFIGS[name]
        stem_c = 32 if "small" in name or "medium" in name else 24
        self.stem = _ConvBN(input_channels, stem_c, 3, stride=2, rngs=rngs)
        self.blocks = nnx.List([])
        cin, stride = stem_c, 2
        last_at_stride = {}   # cumulative stride -> (block index, channels)
        for entry in spec:
            kind = entry[0]
            if kind == "conv":
                _, cout, k, s = entry
                self.blocks.append(_ConvBN(cin, cout, k, stride=s, rngs=rngs))
            elif kind == "fused":
                _, cout, s, exp = entry
                self.blocks.append(FusedIB(cin, cout, s, exp, rngs=rngs))
            elif kind == "uib":
                _, cout, ks, km, s, exp = entry
                self.blocks.append(UIB(cin, cout, ks, km, s, exp, rngs=rngs))
            else:  # mqa
                cout, s = cin, 1
                self.blocks.append(MobileMQA(cin, rngs=rngs))
            stride *= s
            last_at_stride[stride] = (len(self.blocks) - 1, cout)
            cin = cout
        # every variant's first spec block strides to 4, so level1 (s2)
        # is the stem output; levels 2-5 are the stage tails at s4..s32
        self._emit = [last_at_stride[s][0] for s in (4, 8, 16, 32)]
        self.feature_channels = [stem_c] + [
            last_at_stride[s][1] for s in (4, 8, 16, 32)
        ]
        bounds = [-1] + self._emit
        self.level_modules = [["stem"]] + [
            [("blocks", i) for i in range(bounds[lv] + 1, bounds[lv + 1] + 1)]
            for lv in range(4)
        ]

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x = self.stem(x)
        outs = [x]
        emit = set(self._emit)
        for i, block in enumerate(self.blocks):
            x = block(x)
            if i in emit:
                outs.append(x)
        return outs


def make_mobilenetv4_features(name, input_channels=3, *, rngs=None):
    return MobileNetV4Features(name, input_channels=input_channels, rngs=rngs)
