"""CLI entry points (≈ pde_superresolution/scripts/)."""
