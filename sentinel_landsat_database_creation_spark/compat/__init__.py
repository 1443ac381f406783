"""Byte-exact reproduction of the reference's file formats (compat mode)."""
