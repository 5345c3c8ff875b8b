"""Visualization scaffolding (reference ``src/sihl/visualization/common.py``):
the 22-color palette, figure→numpy conversion, and the ``get_images``
singledispatch that per-head modules register against.

Everything here is host-side matplotlib; device arrays are pulled once.
"""

from functools import singledispatch
from io import BytesIO
from typing import List, Optional

import matplotlib

matplotlib.use("Agg")

import numpy as np
from matplotlib import pyplot as plt
from matplotlib.pyplot import Figure

COLORS = (
    (0, 0, 0),
    (230, 25, 75),
    (60, 180, 75),
    (255, 225, 25),
    (0, 130, 200),
    (245, 130, 48),
    (145, 30, 180),
    (70, 240, 240),
    (240, 50, 230),
    (210, 245, 60),
    (250, 190, 212),
    (0, 128, 128),
    (220, 190, 255),
    (170, 110, 40),
    (255, 250, 200),
    (128, 0, 0),
    (170, 255, 195),
    (128, 128, 0),
    (255, 215, 180),
    (0, 0, 128),
    (128, 128, 128),
    (255, 255, 255),
)


def plot_to_numpy(fig: Figure) -> np.ndarray:
    io_buf = BytesIO()
    fig.savefig(io_buf, format="raw", dpi=100)
    io_buf.seek(0)
    img_arr = np.reshape(
        np.frombuffer(io_buf.getvalue(), dtype=np.uint8),
        newshape=(int(fig.bbox.bounds[3]), int(fig.bbox.bounds[2]), -1),
    )[:, :, :3]
    io_buf.close()
    return np.moveaxis(img_arr, 2, 0)  # HWC -> CHW


def to_uint8_image(x: np.ndarray) -> np.ndarray:
    """NHWC float [0,1] (or already uint8) -> uint8."""
    x = np.asarray(x)
    if x.dtype == np.uint8:
        return x
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def three_panel(
    image: np.ndarray,
    titles=("Input", "Target", "Prediction"),
    figsize=(10, 5),
):
    """Standard Input/Target/Prediction panel; returns (fig, axes)."""
    fig, axes = plt.subplots(1, len(titles), figsize=figsize, dpi=100)
    axes = np.atleast_1d(axes)
    for ax, title in zip(axes, titles):
        ax.set_xticks([])
        ax.set_yticks([])
        ax.title.set_text(title)
    axes[0].axis("off")
    axes[0].imshow(image)
    return fig, axes


def finish(fig, seen_categories: Optional[List[str]] = None) -> np.ndarray:
    if seen_categories:
        fig.legend(loc="lower center", frameon=False, ncol=min(7, len(seen_categories)))
    fig.tight_layout()
    out = plot_to_numpy(fig)
    plt.close(fig)
    return out


def color_for(index: int):
    return [c / 255 for c in COLORS[index % len(COLORS)]]


def class_color_map(class_map: np.ndarray) -> np.ndarray:
    """Integer class map -> RGB uint8 via the palette."""
    palette = np.asarray(COLORS, np.uint8)
    return palette[np.clip(class_map, 0, len(COLORS) - 1) % len(COLORS)]


@singledispatch
def get_images(head, config, input, target, features) -> List[np.ndarray]:
    raise NotImplementedError(f'got unknown type "{type(head)}"')
