"""Pairwise alignment engines: NumPy oracle, JAX wavefront kernel, traceback."""
