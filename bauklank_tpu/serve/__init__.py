"""Control plane: WebSocket server, stream pool, slot allocation, serial
bridge.  Speaks the reference's wire protocols (SURVEY.md §2.3-2.4)."""

from bauklank_tpu.serve.pool import StreamPool, VoiceSlot
from bauklank_tpu.serve.livepool import LivePool
from bauklank_tpu.serve.slots import SlotAllocator
from bauklank_tpu.serve.unified import UnifiedPool

__all__ = [
    "StreamPool",
    "LivePool",
    "UnifiedPool",
    "VoiceSlot",
    "SlotAllocator",
    # imported lazily to avoid pulling websockets unless used:
    # serve.server.ControlServer, serve.client.ControlClient
]
