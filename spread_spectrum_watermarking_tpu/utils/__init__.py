"""Host-side utilities: image IO, watermark storage, debug helpers, RNG compat."""

__all__ = ["image_io", "storage", "debug", "rng_compat"]
