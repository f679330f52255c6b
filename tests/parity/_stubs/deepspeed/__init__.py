"""Offline deepspeed stub (import-only; single-process CPU parity runs)."""
from . import comm  # noqa: F401
