"""The streaming stretch engine (state pytree + jitted step functions)."""

from bauklank_tpu.engine.config import StretchConfig, preset_default, preset_cheaper
from bauklank_tpu.engine.params import StretchParams
from bauklank_tpu.engine.core import init_state, process_chunk, StretchState
from bauklank_tpu.engine.offline import stretch_offline

__all__ = [
    "StretchConfig",
    "StretchParams",
    "StretchState",
    "init_state",
    "process_chunk",
    "stretch_offline",
    "preset_default",
    "preset_cheaper",
]
