"""Pure column functions + vectorized extractors."""
