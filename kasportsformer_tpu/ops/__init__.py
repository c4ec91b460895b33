"""Pallas TPU kernels for the hot ops (SURVEY.md §7.2 step 8)."""
