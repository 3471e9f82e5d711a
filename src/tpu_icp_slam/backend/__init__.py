"""Backend/global optimization: loop closure + pose-graph GN + Schur (N13/N14)."""
