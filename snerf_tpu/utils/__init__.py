"""Shared utilities: metrics, image helpers, visualization colormaps."""
