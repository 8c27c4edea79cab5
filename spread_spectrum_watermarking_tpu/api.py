"""Reference-shaped object API: Writer / Reader / Tester.

Thin host-side wrappers over the functional jitted pipelines in
:mod:`.models.pipeline`, provided so a user of the reference crate's API
(``wm::Writer``/``wm::Reader``/``wm::Tester``, reference: src/lib.rs:81-85,
src/algorithm.rs:286-715) finds the same surface. New code should prefer the
batched functional API (:func:`embed`, :func:`extract`, :func:`similarity`)
which these wrappers call.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .config import Precision, ReadConfig, WriteConfig
from .marks import as_marks
from .models import pipeline
from .ops import ranking


def _as_rgb_array(image) -> np.ndarray:
    """Accept a PIL image or array; return (H, W, 3) uint8 or float32."""
    if hasattr(image, "convert"):  # PIL
        image = np.asarray(image.convert("RGB"))
    arr = np.asarray(image)
    if arr.ndim != 3 or arr.shape[-1] != 3:
        raise ValueError(f"expected (H, W, 3) RGB image, got {arr.shape}")
    return arr


class Writer:
    """Embeds watermarks into one image (reference: src/algorithm.rs:286-433).

    Unlike the reference's eager in-place object, the DCT/ranking/embedding
    all happen inside one jitted program at :meth:`mark` time; the
    :meth:`coefficients`/:meth:`indices` accessors run the forward transform
    on demand for inspection parity (``Writer::coefficient_image``,
    src/algorithm.rs:319-321).
    """

    def __init__(self, image, config: WriteConfig = WriteConfig()):
        self._rgb = _as_rgb_array(image)
        self._config = config
        self._coeffs: Optional[np.ndarray] = None

    def coefficients(self) -> np.ndarray:
        """Y-channel DCT coefficients, shape (H, W) -- the plane the active
        tier actually ranks on (exact f32 at HIGHEST; the production bf16
        two-pass plane at the fast tiers). Reference accessor describes the
        object's real state (src/algorithm.rs:319-321); so does this."""
        if self._coeffs is None:
            self._coeffs = np.asarray(
                pipeline.rank_plane(self._rgb, self._config.precision))
        return self._coeffs

    def indices(self, n: int) -> np.ndarray:
        """Rank-ordered flat indices of the N strongest coefficients --
        exactly the indices :meth:`mark` embeds at, at every tier (the fast
        tiers rank through the same ``pipeline.rank_base`` prologue the
        jitted embed uses)."""
        import jax.numpy as jnp
        if self._config.precision is not Precision.HIGHEST:
            c = self._config
            rcfg = ReadConfig(ordering=c.ordering, precision=c.precision,
                              custom_ordering=c.custom_ordering,
                              rank_version=c.rank_version)
            idx, _ = pipeline.rank_base(self._rgb, n, rcfg)
            return np.asarray(idx)
        return np.asarray(ranking.top_indices(
            jnp.asarray(self.coefficients()), n, self._config.ordering,
            custom_metric=self._config.custom_ordering))

    def update_indices(self, ordering, custom_metric=None) -> None:
        """Re-rank with a different ordering (reference ``Writer::update_indices``,
        src/algorithm.rs:324-327): subsequent :meth:`indices`/:meth:`mark`
        calls use the new ordering against the same image. ``custom_metric``
        plays the role of the reference's ``OrderingMethod::Custom`` closure
        (src/algorithm.rs:150-151)."""
        import dataclasses

        self._config = dataclasses.replace(
            self._config, ordering=ordering, custom_ordering=custom_metric)

    def mark(self, marks, quantize: bool = True) -> np.ndarray:
        """Embed mark(s) and return the watermarked image.

        ``marks``: array-like (N,) or (M, N). Returns (H, W, 3) uint8 if
        ``quantize`` (the reference CLI's ``into_rgb8`` path) else float32.
        """
        m = as_marks(marks)
        out = pipeline.embed(self._rgb, m, self._config, quantize=quantize)
        return np.asarray(out)


class ReaderDerived:
    """Derived-image reader: coefficients only (reference: src/algorithm.rs:448-456)."""

    def __init__(self, image, config: ReadConfig = ReadConfig()):
        self._rgb = _as_rgb_array(image)
        self._config = config
        self._flat: Optional[np.ndarray] = None

    def coefficients(self) -> np.ndarray:
        if self._flat is None:
            self._flat = np.asarray(pipeline.rank_plane(
                self._rgb, self._config.precision)).reshape(-1)
        return self._flat


class Reader:
    """Base-image reader (reference: src/algorithm.rs:441-562)."""

    def __init__(self, image, config: ReadConfig = ReadConfig()):
        self._rgb = _as_rgb_array(image)
        self._config = config
        self._cache = {}  # n -> (flat, idx) at HIGHEST / (idx, vals) fast
        self._flat: Optional[np.ndarray] = None  # coefficients() memo

    @staticmethod
    def base(image, config: ReadConfig = ReadConfig()) -> "Reader":
        return Reader(image, config)

    @staticmethod
    def derived(image, config: ReadConfig = ReadConfig()) -> ReaderDerived:
        return ReaderDerived(image, config)

    @property
    def _fast(self) -> bool:
        return self._config.precision is not Precision.HIGHEST

    def _prepared(self, n: int):
        """Cached base-side work, keyed on n (the reference CLI's extraction
        cache, examples/main.rs:369-412). At HIGHEST: (full coefficient
        plane, indices). At the fast tiers: (indices, base values) from the
        same delta-exact prologue the Writer uses -- the fast tiers' bf16
        plane rounding only cancels out of detection when extraction
        transforms luma(derived) - luma(base), so no derived-independent
        coefficient plane exists to cache (pipeline.rank_base)."""
        if n not in self._cache:
            if self._fast:
                self._cache[n] = pipeline.rank_base(self._rgb, n, self._config)
            else:
                self._cache[n] = pipeline.prepare_base(
                    self._rgb, n, self._config)
        return self._cache[n]

    def coefficients(self) -> np.ndarray:
        """Flat DCT coefficient plane of the base image
        (reference accessor: src/algorithm.rs:502-504) -- the plane the
        active tier ranks on (``pipeline.rank_plane``). Computed directly --
        no ranking is needed for this view -- and memoized (at the fast
        tiers the extraction cache holds no plane, so this accessor keeps
        its own)."""
        if not self._fast:
            for flat, _ in self._cache.values():
                return np.asarray(flat)
        if self._flat is None:
            self._flat = np.asarray(pipeline.rank_plane(
                self._rgb, self._config.precision)).reshape(-1)
        return self._flat

    def indices(self, n: int) -> np.ndarray:
        pair = self._prepared(n)
        return np.asarray(pair[0] if self._fast else pair[1])

    def extract(self, derived: ReaderDerived, n: int) -> np.ndarray:
        """Extract a length-n watermark from a derived reader.

        Raises ValueError on the reference's panic conditions
        (src/algorithm.rs:550-555).
        """
        if derived._rgb.shape != self._rgb.shape:
            raise ValueError(
                "Derived coefficient length not equal to base coefficient length.")
        h, w = self._rgb.shape[:2]
        if n >= h * w:
            raise ValueError(
                "Desired extraction length exceeds available coefficients.")
        import jax.numpy as jnp
        if self._fast:
            idx, base_vals = self._prepared(n)
            return np.asarray(pipeline.extract_ranked(
                jnp.asarray(self._rgb), jnp.asarray(derived._rgb),
                idx, base_vals, self._config))
        flat, idx = self._prepared(n)
        return np.asarray(pipeline.extract_prepared(
            flat, idx, jnp.asarray(derived.coefficients()), self._config))


class Similarity:
    """Result wrapper (reference: src/algorithm.rs:668-680)."""

    def __init__(self, similarity: float):
        self.similarity = float(similarity)

    def exceeds_sigma(self, n_sigma: float) -> bool:
        return self.similarity > n_sigma

    def __repr__(self):
        return f"Similarity {{ similarity: {self.similarity} }}"


class Tester:
    """Similarity tester (reference: src/algorithm.rs:683-715)."""

    def __init__(self, extracted_watermark):
        self._extracted = np.asarray(extracted_watermark, dtype=np.float32)

    def similarity(self, comparison_watermark) -> Similarity:
        cand = np.asarray(comparison_watermark, dtype=np.float32)
        if cand.shape != self._extracted.shape:
            raise ValueError("extracted and comparison watermark lengths differ")
        sim = pipeline.similarity(self._extracted[None], cand[None])
        return Similarity(np.asarray(sim)[0, 0])

    def similarities(self, candidates) -> np.ndarray:
        """Batched sweep: test K candidate marks at once -> (K,) sims."""
        cand = as_marks(candidates)
        return np.asarray(pipeline.similarity(self._extracted[None], cand))[0]
