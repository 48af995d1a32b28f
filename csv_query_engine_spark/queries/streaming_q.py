"""Streaming-analytics query registrations over the events table.
Batch-equivalent forms registered with oracles; true streaming variants
are exercised in tests/test_streaming.py.
"""
