"""Data layer: PLY I/O, COLMAP/Blender readers, Scene state."""
