"""Sources & sinks: synthetic pages corpus, Parquet layouts, lookup readers."""
