"""Opaque binary payload columns + decode stubs (north-star extension)."""
