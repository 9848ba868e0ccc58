"""Signal/feature processing: DSP features, signal ops, augmentation, video."""
