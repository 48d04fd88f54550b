"""Incremental processing: checkpoint manifest + resume.

The reference is a batch GUI plugin (SURVEY.md §2.9 — no streaming
operators); the north-rule's "resumable from checkpoint with
per-partition lineage + metrics" is implemented as a manifest table of
per-tile commits (``checkpoint.py``), not Structured Streaming.
"""
