"""Persistence, visualization, profiling, preseeding utilities."""
