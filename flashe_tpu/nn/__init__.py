"""Model weights codec, flax model zoo, local trainer, HomoNN components."""
