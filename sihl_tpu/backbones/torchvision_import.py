"""Port torchvision pretrained weights into native NNX feature nets.

CPU torch is used strictly as a weight-file reader at construction time;
nothing torch touches the compute path.  Conv weights transpose OIHW→HWIO.
Requires the torchvision weight file to be available locally (TORCH_HOME
cache) — this environment has no network egress, so ``pretrained=True``
raises a clear error if the cache is cold.
"""

import numpy as np


def _to_hwio(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _assign_convbn(convbn, sd, conv_key: str, bn_key: str) -> None:
    convbn.conv.kernel.value = _to_hwio(sd[f"{conv_key}.weight"])
    convbn.bn.scale.value = sd[f"{bn_key}.weight"]
    convbn.bn.bias.value = sd[f"{bn_key}.bias"]
    convbn.bn.mean.value = sd[f"{bn_key}.running_mean"]
    convbn.bn.var.value = sd[f"{bn_key}.running_var"]


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
    """Apply a torchvision-format numpy state dict to a native feature net."""
    if name.startswith(("resnet", "resnext", "wide_resnet")):
        _load_resnet(features, sd, input_channels)
    else:
        raise NotImplementedError(f"weight import not implemented for {name}")


def _load_resnet(features, sd, input_channels: int) -> None:
    if input_channels == 3:
        features.stem.conv.kernel.value = _to_hwio(sd["conv1.weight"])
    features.stem.bn.scale.value = sd["bn1.weight"]
    features.stem.bn.bias.value = sd["bn1.bias"]
    features.stem.bn.mean.value = sd["bn1.running_mean"]
    features.stem.bn.var.value = sd["bn1.running_var"]

    for i, layer in enumerate(
        [features.layer1, features.layer2, features.layer3, features.layer4], start=1
    ):
        for j, block in enumerate(layer.blocks):
            prefix = f"layer{i}.{j}"
            num_convs = 3 if hasattr(block, "conv3") else 2
            for k in range(1, num_convs + 1):
                _assign_convbn(
                    getattr(block, f"conv{k}"), sd, f"{prefix}.conv{k}", f"{prefix}.bn{k}"
                )
            if block.downsample is not None:
                _assign_convbn(
                    block.downsample, sd, f"{prefix}.downsample.0", f"{prefix}.downsample.1"
                )
