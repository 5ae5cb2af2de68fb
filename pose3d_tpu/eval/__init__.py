"""Evaluation: descriptor extraction, kNN metrics, histograms, TSV logs."""

from pose3d_tpu.eval.evaluator import (  # noqa: F401
    binary_descriptor_fn, compute_descriptors, compute_knn_tables,
    compute_histogram, compute_confusion_matrix, compute_knn_accuracy,
    compute_manifold, save_log, save_confusion_matrix, HISTOGRAM_BINS)
from pose3d_tpu.eval.predict import (  # noqa: F401
    TemplateIndex, build_template_index, predict_from_descriptors,
    predict_from_frame, predict_from_patches)
