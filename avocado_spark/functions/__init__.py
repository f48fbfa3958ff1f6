"""Column-expression kernels (SURVEY §2.8)."""
