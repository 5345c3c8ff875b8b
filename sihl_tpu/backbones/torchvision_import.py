"""Port torchvision pretrained weights into native NNX feature nets.

CPU torch is used strictly as a weight-file reader at construction time;
nothing torch touches the compute path.  Conv weights transpose OIHW→HWIO,
Linear weights (out,in)→(in,out).  Requires the torchvision weight file to
be available locally (TORCH_HOME cache) — this environment has no network
egress, so ``pretrained=True`` raises a clear error if the cache is cold.

Covers every torchvision family in the registry (reference capability:
``src/sihl/torchvision_backbone.py:130-156`` loads DEFAULT weights for all
~40 archs): resnet/resnext/wide_resnet, efficientnet b0-b7 + v2 s/m/l,
mobilenet v2 / v3, convnext, densenet, shufflenet_v2, mnasnet.

The per-family layout is written once as a *walker* that yields
``(kind, native_module_or_param, torchvision_key)`` assignment specs;
:func:`load_state_dict` applies them and :func:`dump_state_dict` inverts
them (torchvision-format export, also the parity oracle for tests).  The
loader tracks consumed keys and raises if parameter tensors remain
unclaimed (classifier weights excepted), so a layout mismatch against real
weight files fails loudly instead of silently.
"""

from typing import Dict, Iterable, Iterator, Tuple

import numpy as np

Spec = Tuple[str, object, str]


def _to_hwio(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _to_oihw(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


# -- walkers ------------------------------------------------------------------
# Spec kinds: "conv" (no bias), "convb" (with bias), "conv_first" (the
# input conv — skipped when input_channels != 3), "convb_first", "bn",
# "ln", "linear", "param" (bare tensor, flattened).


def _cna(dst, prefix: str) -> Iterator[Spec]:
    """torchvision ``Conv2dNormActivation``: ``{prefix}.0`` conv, ``.1`` bn."""
    yield ("conv", dst.conv, f"{prefix}.0")
    yield ("bn", dst.bn, f"{prefix}.1")


def _walk_resnet(features) -> Iterator[Spec]:
    yield ("conv_first", features.stem.conv, "conv1")
    yield ("bn", features.stem.bn, "bn1")
    layers = [features.layer1, features.layer2, features.layer3, features.layer4]
    for i, layer in enumerate(layers, start=1):
        for j, block in enumerate(layer.blocks):
            p = f"layer{i}.{j}"
            num_convs = 3 if hasattr(block, "conv3") else 2
            for k in range(1, num_convs + 1):
                cb = getattr(block, f"conv{k}")
                yield ("conv", cb.conv, f"{p}.conv{k}")
                yield ("bn", cb.bn, f"{p}.bn{k}")
            if block.downsample is not None:
                yield ("conv", block.downsample.conv, f"{p}.downsample.0")
                yield ("bn", block.downsample.bn, f"{p}.downsample.1")


def _walk_efficientnet(features) -> Iterator[Spec]:
    """torchvision layout: ``features.0`` stem CNA; ``features.{1..N}``
    stages of MBConv/FusedMBConv (sub-modules under ``.block``); final
    ``features.{N+1}`` 1x1 head CNA."""
    from sihl_tpu.backbones.efficientnet import MBConv

    yield ("conv_first", features.stem.conv, "features.0.0")
    yield ("bn", features.stem.bn, "features.0.1")
    for si, stage in enumerate(features.stages, start=1):
        for bi, block in enumerate(stage.blocks):
            p = f"features.{si}.{bi}.block"
            if isinstance(block, MBConv):
                idx = 0
                if block.expand is not None:
                    yield from _cna(block.expand, f"{p}.{idx}")
                    idx += 1
                yield from _cna(block.depthwise, f"{p}.{idx}")
                idx += 1
                if block.se is not None:
                    yield ("convb", block.se.fc1, f"{p}.{idx}.fc1")
                    yield ("convb", block.se.fc2, f"{p}.{idx}.fc2")
                    idx += 1
                yield from _cna(block.project, f"{p}.{idx}")
            else:  # FusedMBConv
                yield from _cna(block.fused, f"{p}.0")
                if block.project is not None:
                    yield from _cna(block.project, f"{p}.1")
    yield from _cna(features.head, f"features.{len(features.stages) + 1}")


def _walk_mobilenet_v2(features) -> Iterator[Spec]:
    """Blocks at ``features.{1..17}.conv``: [expand CNA,] dw CNA, then a
    bare projection conv + bn as the last two entries."""
    yield ("conv_first", features.stem.conv, "features.0.0")
    yield ("bn", features.stem.bn, "features.0.1")
    for i, block in enumerate(features.blocks, start=1):
        p = f"features.{i}.conv"
        idx = 0
        if block.expand is not None:
            yield from _cna(block.expand, f"{p}.{idx}")
            idx += 1
        yield from _cna(block.depthwise, f"{p}.{idx}")
        idx += 1
        yield ("conv", block.project.conv, f"{p}.{idx}")
        yield ("bn", block.project.bn, f"{p}.{idx + 1}")
    yield from _cna(features.head, f"features.{len(features.blocks) + 1}")


def _walk_mobilenet_v3(features) -> Iterator[Spec]:
    yield ("conv_first", features.stem.conv, "features.0.0")
    yield ("bn", features.stem.bn, "features.0.1")
    for i, block in enumerate(features.blocks, start=1):
        p = f"features.{i}.block"
        idx = 0
        if block.expand is not None:
            yield from _cna(block.expand, f"{p}.{idx}")
            idx += 1
        yield from _cna(block.depthwise, f"{p}.{idx}")
        idx += 1
        if block.se is not None:
            yield ("convb", block.se.fc1, f"{p}.{idx}.fc1")
            yield ("convb", block.se.fc2, f"{p}.{idx}.fc2")
            idx += 1
        yield from _cna(block.project, f"{p}.{idx}")
    yield from _cna(features.head, f"features.{len(features.blocks) + 1}")


def _walk_convnext(features) -> Iterator[Spec]:
    """torchvision layout: ``features.0`` stem (conv+LN); odd indices are
    stages of CNBlock (``block.{0,2,3,5}`` + ``layer_scale``); even
    indices are downsamples (LN + 2x2 conv)."""
    yield ("convb_first", features.stem_conv, "features.0.0")
    yield ("ln", features.stem_norm, "features.0.1")
    for si, stage in enumerate(features.stages):
        fi = 1 + 2 * si
        if si > 0:
            ds = features.downsamples[si - 1]
            yield ("ln", ds.norm, f"features.{fi - 1}.0")
            yield ("convb", ds.conv, f"features.{fi - 1}.1")
        for bi, block in enumerate(stage):
            p = f"features.{fi}.{bi}"
            yield ("convb", block.depthwise, f"{p}.block.0")
            yield ("ln", block.norm, f"{p}.block.2")
            yield ("linear", block.pw1, f"{p}.block.3")
            yield ("linear", block.pw2, f"{p}.block.5")
            yield ("param", block.gamma, f"{p}.layer_scale")


def _walk_densenet(features) -> Iterator[Spec]:
    yield ("conv_first", features.conv0, "features.conv0")
    yield ("bn", features.norm0, "features.norm0")
    for bi, block in enumerate(features.blocks, start=1):
        for li, layer in enumerate(block.layers, start=1):
            p = f"features.denseblock{bi}.denselayer{li}"
            yield ("bn", layer.norm1, f"{p}.norm1")
            yield ("conv", layer.conv1, f"{p}.conv1")
            yield ("bn", layer.norm2, f"{p}.norm2")
            yield ("conv", layer.conv2, f"{p}.conv2")
    for ti, trans in enumerate(features.transitions, start=1):
        yield ("bn", trans.norm, f"features.transition{ti}.norm")
        yield ("conv", trans.conv, f"features.transition{ti}.conv")


def _walk_shufflenet(features) -> Iterator[Spec]:
    yield ("conv_first", features.conv1.conv, "conv1.0")
    yield ("bn", features.conv1.bn, "conv1.1")
    for si, stage in enumerate(features.stages, start=2):
        for ui, unit in enumerate(stage):
            p = f"stage{si}.{ui}"
            if unit.branch1_dw is not None:
                yield ("conv", unit.branch1_dw.conv, f"{p}.branch1.0")
                yield ("bn", unit.branch1_dw.bn, f"{p}.branch1.1")
                yield ("conv", unit.branch1_pw.conv, f"{p}.branch1.2")
                yield ("bn", unit.branch1_pw.bn, f"{p}.branch1.3")
            yield ("conv", unit.branch2_pw1.conv, f"{p}.branch2.0")
            yield ("bn", unit.branch2_pw1.bn, f"{p}.branch2.1")
            yield ("conv", unit.branch2_dw.conv, f"{p}.branch2.3")
            yield ("bn", unit.branch2_dw.bn, f"{p}.branch2.4")
            yield ("conv", unit.branch2_pw2.conv, f"{p}.branch2.5")
            yield ("bn", unit.branch2_pw2.bn, f"{p}.branch2.6")
    yield ("conv", features.conv5.conv, "conv5.0")
    yield ("bn", features.conv5.bn, "conv5.1")


def _walk_mnasnet(features) -> Iterator[Spec]:
    """torchvision flat ``layers.{0..16}``: stem conv/bn at 0/1, separable
    dw at 3/4, projection at 6/7, stacks at 8..13, head conv/bn at 14/15."""
    yield ("conv_first", features.stem.conv, "layers.0")
    yield ("bn", features.stem.bn, "layers.1")
    yield ("conv", features.sep_dw.conv, "layers.3")
    yield ("bn", features.sep_dw.bn, "layers.4")
    yield ("conv", features.sep_pw.conv, "layers.6")
    yield ("bn", features.sep_pw.bn, "layers.7")
    for si, stack in enumerate(features.stacks, start=8):
        for ui, unit in enumerate(stack):
            p = f"layers.{si}.{ui}.layers"
            for dst, base in (
                (unit.expand, 0),
                (unit.depthwise, 3),
                (unit.project, 6),
            ):
                yield ("conv", dst.conv, f"{p}.{base}")
                yield ("bn", dst.bn, f"{p}.{base + 1}")
    yield ("conv", features.head.conv, "layers.14")
    yield ("bn", features.head.bn, "layers.15")


_FAMILIES = (
    (("resnet", "resnext", "wide_resnet"), _walk_resnet, ("fc.",)),
    (("efficientnet_b", "efficientnet_v2"), _walk_efficientnet, ("classifier.",)),
    (("mobilenet_v2",), _walk_mobilenet_v2, ("classifier.",)),
    (("mobilenet_v3",), _walk_mobilenet_v3, ("classifier.",)),
    (("convnext_",), _walk_convnext, ("classifier.",)),
    (("densenet",), _walk_densenet, ("classifier.", "features.norm5.")),
    (("shufflenet_v2",), _walk_shufflenet, ("fc.",)),
    (("mnasnet",), _walk_mnasnet, ("classifier.",)),
)


def _family(name: str):
    for prefixes, walker, skip in _FAMILIES:
        if name.startswith(prefixes):
            return walker, skip
    raise NotImplementedError(
        f"weight import not implemented for {name} (not a torchvision arch)"
    )


# -- load ---------------------------------------------------------------------


def load_torchvision_weights(features, name: str, input_channels: int = 3) -> None:
    try:
        import torchvision
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("pretrained=True requires torchvision on host") from e

    try:
        model = torchvision.models.get_model(name, weights="DEFAULT")
    except Exception as e:
        raise RuntimeError(
            f"could not load pretrained weights for {name!r} "
            "(no network egress and no local cache?)"
        ) from e
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    load_state_dict(features, name, sd, input_channels)


def load_state_dict(features, name: str, sd, input_channels: int = 3) -> None:
    """Apply a torchvision-format numpy state dict to a native feature net;
    raises if tensors outside the classifier remain unconsumed."""
    walker, skip_prefixes = _family(name)
    used = set()

    def take(key, expect=None):
        used.add(key)
        if key not in sd:
            raise RuntimeError(
                f"weight import for {name}: missing tensor {key!r} "
                "(torchvision layout mismatch?)"
            )
        t = sd[key]
        if expect is not None and tuple(t.shape) != tuple(expect):
            raise RuntimeError(
                f"weight import for {name}: {key!r} has shape {tuple(t.shape)}, "
                f"native module expects {tuple(expect)}"
            )
        return t

    for kind, dst, key in walker(features):
        first = kind.endswith("_first")
        kind = kind.replace("_first", "")
        if kind in ("conv", "convb"):
            if first and input_channels != 3:
                used.add(f"{key}.weight")
                if kind == "convb":
                    used.add(f"{key}.bias")
                continue
            kh, kw, ci, co = dst.kernel[...].shape
            dst.kernel[...] = _to_hwio(take(f"{key}.weight", (co, ci, kh, kw)))
            if kind == "convb":
                dst.bias[...] = take(f"{key}.bias", (co,))
        elif kind == "bn":
            c = dst.scale[...].shape
            dst.scale[...] = take(f"{key}.weight", c)
            dst.bias[...] = take(f"{key}.bias", c)
            dst.mean[...] = take(f"{key}.running_mean", c)
            dst.var[...] = take(f"{key}.running_var", c)
        elif kind == "ln":
            c = dst.scale[...].shape
            dst.scale[...] = take(f"{key}.weight", c)
            dst.bias[...] = take(f"{key}.bias", c)
        elif kind == "linear":
            ci, co = dst.kernel[...].shape
            dst.kernel[...] = np.ascontiguousarray(take(f"{key}.weight", (co, ci)).T)
            dst.bias[...] = take(f"{key}.bias", (co,))
        elif kind == "param":
            t = take(key)
            if t.size != dst[...].size:
                raise RuntimeError(
                    f"weight import for {name}: {key!r} has {t.size} elements, "
                    f"native module expects {dst[...].size}"
                )
            dst[...] = t.reshape(dst[...].shape)
        else:  # pragma: no cover
            raise AssertionError(kind)

    left = [
        k
        for k in sd
        if k not in used
        and not any(k.startswith(p) for p in skip_prefixes)
        and not k.endswith("num_batches_tracked")
    ]
    if left:
        raise RuntimeError(
            f"weight import for {name} left {len(left)} unconsumed tensors, "
            f"layout mismatch? e.g. {sorted(left)[:8]}"
        )


# -- dump (torchvision-format export; also the test oracle) -------------------


def dump_state_dict(features, name: str) -> Dict[str, np.ndarray]:
    """Export a native feature net's weights in torchvision state-dict
    format (the exact inverse of :func:`load_state_dict`)."""
    walker, _ = _family(name)
    sd: Dict[str, np.ndarray] = {}
    for kind, dst, key in walker(features):
        kind = kind.replace("_first", "")
        if kind in ("conv", "convb"):
            sd[f"{key}.weight"] = _to_oihw(np.asarray(dst.kernel[...]))
            if kind == "convb":
                sd[f"{key}.bias"] = np.asarray(dst.bias[...])
        elif kind == "bn":
            sd[f"{key}.weight"] = np.asarray(dst.scale[...])
            sd[f"{key}.bias"] = np.asarray(dst.bias[...])
            sd[f"{key}.running_mean"] = np.asarray(dst.mean[...])
            sd[f"{key}.running_var"] = np.asarray(dst.var[...])
        elif kind == "ln":
            sd[f"{key}.weight"] = np.asarray(dst.scale[...])
            sd[f"{key}.bias"] = np.asarray(dst.bias[...])
        elif kind == "linear":
            sd[f"{key}.weight"] = np.ascontiguousarray(np.asarray(dst.kernel[...]).T)
            sd[f"{key}.bias"] = np.asarray(dst.bias[...])
        elif kind == "param":
            # torchvision stores layer_scale as (C, 1, 1)
            sd[key] = np.asarray(dst[...]).reshape(-1, 1, 1)
    return sd
