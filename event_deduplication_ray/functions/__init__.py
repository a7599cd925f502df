"""Pure vectorized kernels (no Ray imports) used inside map_batches stages."""
