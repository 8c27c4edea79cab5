"""Jitted end-to-end pipelines."""

from . import pipeline

__all__ = ["pipeline"]
