"""Service runtime: config, persistence, job scheduling, HTTP API (L3-L5)."""
