"""Multi-object tracking (maps reference ultralytics/trackers/)."""

from bsyolo_tpu.trackers.byte_tracker import BYTETracker
from bsyolo_tpu.trackers.bot_sort import BOTSORT, BOTrack, ColorHistEncoder
from bsyolo_tpu.trackers.track import create_tracker, track_results

__all__ = ["BYTETracker", "BOTSORT", "BOTrack", "ColorHistEncoder", "create_tracker", "track_results"]
