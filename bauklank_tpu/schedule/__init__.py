"""Host-side scheduling: the per-voice time map."""

from bauklank_tpu.schedule.timemap import Segment, TimeMap

__all__ = ["Segment", "TimeMap"]
