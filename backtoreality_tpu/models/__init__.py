"""Detector model graphs (flax.linen, channels-last)."""
