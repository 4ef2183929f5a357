"""Operator library — every operator is a composable function returning a
DataFrame, with an explicit schema contract and (where SQL-expressible) a
matching DuckDB oracle in the registry."""
