"""Streaming pipeline: host ingest -> batched device compute -> writers.

Architecture (TPU-first redesign of poreplex's process-pool pipeline,
SURVEY.md §7.1): a single device program per batch stage over padded [B, T]
read batches, with host-side asyncio orchestration, double-buffered ingest,
and thread-pool writers. The per-read status lattice and report dict format
match the reference (poreplex/signal_loader.py:112-198).
"""
