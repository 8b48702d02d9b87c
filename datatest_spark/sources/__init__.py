from . import io, synth

__all__ = ["io", "synth"]
