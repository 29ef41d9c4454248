"""Objective evaluation tools (attribute probes, verification metrics)."""

from .attribute_probe import AttributeAxes, embed_wavs, ge2e_embed_mels

__all__ = ["AttributeAxes", "embed_wavs", "ge2e_embed_mels"]
