"""gl_slam_tpu — a TPU-native monocular visual SLAM framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the GL-SLAM
reference (see SURVEY.md): learned feature extraction + attention matching +
sub-pixel refinement front-end, batched RANSAC two-view/PnP geometry,
fixed-capacity functional map state with covisibility retrieval, pose-only and
sliding-window Schur LM bundle adjustment, and data-parallel multi-sequence
scale-out over a device mesh.
"""

from .config import SLAMConfig, default_config, tiny_test_config

__version__ = "0.1.0"
__all__ = ["SLAMConfig", "default_config", "tiny_test_config"]
