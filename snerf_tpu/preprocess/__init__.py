"""L6 offline data-preparation toolchain (host-side numpy).

Parity targets: reference scripts/nuscenes_preprocess.py,
scripts/waymo_preprocess.py + pose.py, and the LiDAR/flow consistency
core of scripts/depth_model/scripts/YORO_1CAM_PIPELINE_REFINE.py.
External neural models (optical flow, depth completion, semantic
segmentation) are pluggable callables — see pipeline.py for the exact
file contracts the training loaders consume.
"""

from snerf_tpu.preprocess import lidar, nuscenes, waymo  # noqa: F401
