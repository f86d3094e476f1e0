"""Host-side runtime utilities: cache, memory, progress, streaming."""

from .cache import SmartCache
from .memory import MemoryManager
from .progress import ProgressReporter

__all__ = ["MemoryManager", "ProgressReporter", "SmartCache"]
