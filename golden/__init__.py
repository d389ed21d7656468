"""CPU golden path — the executable parity oracle (SURVEY.md §0.3, §7.2).

The reference repo mount is empty, so this package IS the behavioural
reference for the TPU build: it implements the reference family's pipeline
with the exact library routines cited in SURVEY.md §2 (cv2.filter2D
correlation + REFLECT_101 borders, scipy-style Gaussian smoothing, sklearn
k-means/GMM semantics). It is also the CPU baseline that defines the >=100x
speedup denominator (BASELINE.md).

Pure numpy/scipy/cv2/sklearn — no JAX imports here.
"""

from golden.features import features_golden, rgb_to_lab_np
from golden.cluster import kmeans_golden, gmm_golden, maximin_init_np

__all__ = [
    "features_golden",
    "rgb_to_lab_np",
    "kmeans_golden",
    "gmm_golden",
    "maximin_init_np",
]
