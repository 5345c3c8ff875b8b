"""Task heads (reference ``src/sihl/heads/__init__.py``).

Each head follows the functional protocol in :class:`sihl_tpu.heads.base.Head`.
Heads are re-exported here as they are implemented; the full reference set is

anomaly_detection, autoencoding, depth_estimation, instance_segmentation,
keypoint_detection, metric_learning, multiclass_classification,
multilabel_classification, object_detection, panoptic_segmentation,
quadrilateral_detection, regression, semantic_segmentation,
text_recognition, view_invariance_learning.
"""

from sihl_tpu.heads.base import Head, TensorShape
from sihl_tpu.heads.multiclass_classification import (
    MulticlassClassification,
    soft_ordinal_category,
)
from sihl_tpu.heads.multilabel_classification import MultilabelClassification
from sihl_tpu.heads.regression import Regression

_OPTIONAL = [
    ("sihl_tpu.heads.semantic_segmentation", ["SemanticSegmentation"]),
    ("sihl_tpu.heads.autoencoding", ["Autoencoding"]),
    ("sihl_tpu.heads.depth_estimation", ["DepthEstimation"]),
    ("sihl_tpu.heads.object_detection", ["ObjectDetection"]),
    ("sihl_tpu.heads.instance_segmentation", ["InstanceSegmentation"]),
    ("sihl_tpu.heads.keypoint_detection", ["KeypointDetection"]),
    ("sihl_tpu.heads.quadrilateral_detection", ["QuadrilateralDetection"]),
    ("sihl_tpu.heads.text_recognition", ["TextRecognition"]),
    ("sihl_tpu.heads.metric_learning", ["MetricLearning"]),
    ("sihl_tpu.heads.anomaly_detection", ["AnomalyDetection"]),
    ("sihl_tpu.heads.view_invariance_learning", ["ViewInvarianceLearning"]),
    ("sihl_tpu.heads.panoptic_segmentation", ["PanopticSegmentation"]),
]

import importlib as _importlib

for _mod, _names in _OPTIONAL:
    try:
        _m = _importlib.import_module(_mod)
        for _n in _names:
            globals()[_n] = getattr(_m, _n)
    except ImportError:
        pass

__all__ = [n for n in (
    "Head",
    "TensorShape",
    "MulticlassClassification",
    "soft_ordinal_category",
    "MultilabelClassification",
    "Regression",
    "SemanticSegmentation",
    "Autoencoding",
    "DepthEstimation",
    "ObjectDetection",
    "InstanceSegmentation",
    "KeypointDetection",
    "QuadrilateralDetection",
    "TextRecognition",
    "MetricLearning",
    "AnomalyDetection",
    "ViewInvarianceLearning",
    "PanopticSegmentation",
) if n in globals()]
