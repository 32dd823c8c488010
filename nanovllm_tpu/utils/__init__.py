"""Utilities: structured metrics/logging and profiling helpers."""
