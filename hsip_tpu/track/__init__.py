"""Tracking layer (L3): detectors, tracker state machine, configs.

Parity target: the analysis layer of reference ``scripts/process_videos.py``
(FlameDetector & friends), promoted into the library proper and split at the
map/scan seam for TPU execution.
"""

from .config import (
    FileCalibration,
    FlameDetectionResult,
    FlameDetectorConfig,
    VideoSourceConfig,
)
from .detectors import (
    DETECTION_METHODS,
    detect_gradient,
    detect_half_maximum,
    detect_profile,
    detect_threshold,
)
from .spline import SmoothingSpline, fit_smoothing_spline
from .tracker import FlameDetector, FlameTracker

__all__ = [
    "FileCalibration",
    "FlameDetectionResult",
    "FlameDetectorConfig",
    "VideoSourceConfig",
    "FlameDetector",
    "FlameTracker",
    "SmoothingSpline",
    "fit_smoothing_spline",
    "detect_threshold",
    "detect_half_maximum",
    "detect_gradient",
    "detect_profile",
    "DETECTION_METHODS",
]
