"""Shared utilities: image I/O, metrics helpers."""
