"""Driver-contract query battery (queries + DuckDB oracle SQL)."""
