"""Batched device DP kernels (banded Smith-Waterman family)."""
