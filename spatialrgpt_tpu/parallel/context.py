"""Sequence-parallel execution context.

The reference threads its ProcessGroupManager singleton through the model
(llava/train/sequence_parallel/globals.py:118-162, queried from
llava_arch.py:346-352 and the patched HF loss).  We keep the same
"ambient configuration" ergonomics without monkey patching: a module-level
context names the mesh axes the attention ops should use; model code reads
it only when attn_impl selects a sequence-parallel implementation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from jax.sharding import Mesh


@dataclass
class SPContext:
    mesh: Mesh
    ulysses_axis: Optional[str] = None  # e.g. "sp" or "sp_u"
    ring_axis: Optional[str] = None  # e.g. "sp_r"
    # attention impl used INSIDE the shard_map (the local compute after
    # resharding): "pallas" on TPU for the flash kernel, "xla" otherwise.
    inner_impl: str = "xla"

    @property
    def sp_degree(self) -> int:
        d = 1
        for ax in (self.ulysses_axis, self.ring_axis):
            if ax is not None:
                d *= self.mesh.shape[ax]
        return d


_CONTEXT: Optional[SPContext] = None


def set_sp_context(ctx: Optional[SPContext]) -> None:
    global _CONTEXT
    _CONTEXT = ctx


def get_sp_context() -> Optional[SPContext]:
    return _CONTEXT
