"""NERD-model aggregation family (SURVEY §2.5) — populated next."""
