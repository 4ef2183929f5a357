"""Sources and sinks: parquet star-schema loaders, reference-shaped ngram
record derivation, TSV/text readers, and multi-sink writers."""
