"""Multi-chip scale-out: device meshes, data-parallel training, collectives."""
