"""Offline flash_attn stub (import-only; CPU parity runs use eager attention)."""
