"""Scalar / column-level functions (all JVM-side column expressions —
no Python UDFs in any hot path)."""
