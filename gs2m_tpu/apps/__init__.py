"""Entry-point applications: train, render (mesh extraction), metrics."""
