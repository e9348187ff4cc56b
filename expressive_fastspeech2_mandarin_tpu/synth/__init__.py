"""High-level synthesis pipeline."""

from .synthesizer import SynthesisResult, Synthesizer

__all__ = ["Synthesizer", "SynthesisResult"]
