"""Training-data operators (dedup/similarity/text/multimodal) — populated next."""
