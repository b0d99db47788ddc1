"""Neural network models (flax.linen, NWC layouts, bf16-ready)."""
