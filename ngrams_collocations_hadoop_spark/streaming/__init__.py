"""Structured Streaming operators: windowed aggregations, session
windows, watermarks, and custom stateful processing."""
