"""Host-side utilities: audio I/O, export, tracing."""
