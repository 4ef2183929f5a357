"""Physical-plan introspection: assertions that guard the §4 operator →
Spark-primitive mappings (broadcast joins, window group limits, filter
pushdown, partial aggregation)."""
