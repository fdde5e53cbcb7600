"""Structured-Streaming surface: incremental (append-only) index builds."""
