"""Evaluation metrics (SURVEY.md L6): BSDS500 PRI and boundary-F."""

from gabor_color_image_segmentation_tpu.metrics.pri import (
    rand_index_np,
    pri_np,
    pri_jax,
)

__all__ = ["rand_index_np", "pri_np", "pri_jax"]
