"""Sources & sinks: Iceberg-shaped catalog + deterministic fixtures."""
