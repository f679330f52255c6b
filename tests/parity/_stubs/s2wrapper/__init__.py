"""Offline stand-in for the s2wrapper dependency of the reference's
vision_encoder (only imported, only needed for S2 towers — the parity
harness instantiates plain towers)."""

def forward(*args, **kwargs):
    raise NotImplementedError("s2wrapper stub: S2 towers not exercised in parity harness")
