"""Checkpoint manifests and resume state."""
