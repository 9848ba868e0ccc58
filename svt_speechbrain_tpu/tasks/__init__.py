"""Task layer: complete training/eval engines for the AMT task family."""
