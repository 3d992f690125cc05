"""Serving layer: batched low-latency inference over the e2e pipeline.

Beyond-reference subsystem (the reference ships offline samplers only):
`GenerationService` wraps the one-jit Stage-1→Stage-2 pipeline behind
bucketed batch shapes, and `serve.server` exposes it over HTTP with a
linger-based request batcher so concurrent clients share XLA dispatches.
"""
from .service import GenerationService  # noqa: F401
