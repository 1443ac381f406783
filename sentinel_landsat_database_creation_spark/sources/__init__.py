"""Readers: testdata parquet loader, CSV catalogs, binary scene listings."""
