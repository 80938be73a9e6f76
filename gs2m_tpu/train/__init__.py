"""Training subsystem: optimizer, densification, staged train loop."""
