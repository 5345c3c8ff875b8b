"""Visualizations for embedding/self-supervised/text heads (reference
``src/sihl/visualization/{metric_learning,view_invariance_learning,
text_recognition}.py``)."""

from typing import List

import numpy as np

from sihl_tpu.heads import MetricLearning, TextRecognition, ViewInvarianceLearning
from sihl_tpu.visualization.common import finish, get_images, three_panel, to_uint8_image


@get_images.register(MetricLearning)
def _(head, config, input, target, features) -> List[np.ndarray]:
    embeddings = np.asarray(head(features))
    images = to_uint8_image(np.asarray(input))
    out = []
    for b, image in enumerate(images):
        fig, axes = three_panel(image, titles=("Input", "Embedding"))
        side = int(np.ceil(np.sqrt(embeddings.shape[1])))
        padded = np.zeros(side * side, np.float32)
        padded[: embeddings.shape[1]] = embeddings[b]
        axes[1].imshow(padded.reshape(side, side), cmap="coolwarm", vmin=-0.3, vmax=0.3)
        out.append(finish(fig))
    return out


@get_images.register(ViewInvarianceLearning)
def _(head, config, input, target, features) -> List[np.ndarray]:
    # target is the second view's feature pyramid (trainer re-encodes it)
    fig, axes = three_panel(
        to_uint8_image(np.asarray(input))[0],
        titles=("Input", "Cross-correlation"),
    )
    if target is not None:
        cc = np.asarray(head.get_correlation(features, target))
        axes[1].imshow(cc, cmap="coolwarm", vmin=-1, vmax=1)
    return [finish(fig)]


@get_images.register(TextRecognition)
def _(head, config, input, target, features) -> List[np.ndarray]:
    tokens_cfg = config.get("tokens") if config else None

    def decode(seq):
        toks = [int(t) for t in seq if int(t) != head.pad]
        if tokens_cfg is not None:
            return "".join(str(tokens_cfg[t]) for t in toks)
        return " ".join(str(t) for t in toks)

    scores, pred_tokens = (np.asarray(v) for v in head(features))
    images = to_uint8_image(np.asarray(input))
    out = []
    for b, image in enumerate(images):
        fig, axes = three_panel(image)
        axes[1].axis("off")
        if target is not None:
            axes[1].text(0.5, 0.5, decode(np.asarray(target)[b]),
                         ha="center", va="center", fontsize=12)
        axes[2].axis("off")
        axes[2].text(0.5, 0.5, decode(pred_tokens[b]),
                     ha="center", va="center", fontsize=12)
        out.append(finish(fig))
    return out
