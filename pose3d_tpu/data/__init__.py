"""Data plane: benchmark loaders, HDF5 caches, augmentation, triplet batcher."""
