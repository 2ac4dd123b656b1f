"""Streaming surface.

The reference is strictly batch (index once, query many — SURVEY.md §2.8), and
the north rule's resumability requirement is met with stage checkpoints
(sources/catalog.py), not Structured Streaming state.  This module provides
the one genuinely useful streaming adapter: incremental signing of newly
arrived documents, so an incremental dedup could `readStream` a documents
directory and maintain the signatures table continuously.
"""

from qalsh_spark.streaming.incremental import incremental_signatures

__all__ = ["incremental_signatures"]
