"""Sources/sinks: testdata table loader, spans table I/O (Iceberg with
parquet-dir fallback), and the deterministic synthetic corpus generator."""
