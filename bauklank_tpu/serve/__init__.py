"""Control plane: WebSocket server, stream pool, slot allocation, serial
bridge.  Speaks the reference's wire protocols (SURVEY.md §2.3-2.4)."""

from bauklank_tpu.serve.pool import StreamPool, VoiceSlot
from bauklank_tpu.serve.slots import SlotAllocator

__all__ = ["StreamPool", "VoiceSlot", "SlotAllocator"]
