"""Offline torchvision stub (import-only: the parity harness never
instantiates the Intern tower that uses it)."""
from . import transforms  # noqa: F401
