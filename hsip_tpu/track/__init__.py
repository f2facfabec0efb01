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
from .batch import ScanHistory, track_collection_device
from .device_scan import DeviceScanResult, device_tracking_scan, velocities_from_positions
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
    "track_collection_device",
    "ScanHistory",
    "device_tracking_scan",
    "velocities_from_positions",
    "DeviceScanResult",
]
