"""Streaming surface.

The reference is strictly batch (index once, query many — SURVEY.md §2.8), and
the north rule's resumability requirement is met with stage checkpoints
(sources/catalog.py), not Structured Streaming state.  This module provides
the two genuinely useful streaming adapters: incremental signing of newly
arrived documents (so an incremental dedup can `readStream` a documents
directory and maintain the signatures table continuously), and stateful
streaming exact-dedup with watermark-bounded state.
"""

from qalsh_spark.streaming.incremental import (
    incremental_signatures,
    streaming_exact_dedup,
)

__all__ = ["incremental_signatures", "streaming_exact_dedup"]
