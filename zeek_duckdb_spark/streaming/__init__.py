"""Structured Streaming ingestion of rotating Zeek logs."""
