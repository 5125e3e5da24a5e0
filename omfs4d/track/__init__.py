from omfs4d.track.fitter import FlameTracker, TrackerResult  # noqa: F401
from omfs4d.track.landmarks import detect_landmarks, register_detector  # noqa: F401
