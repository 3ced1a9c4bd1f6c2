"""Static Mosaic block-shape validation.

The TPU Pallas lowering (jax pallas/mosaic/lowering.py:_check_block_mappings)
requires the last two dims of every block shape to be divisible by
(8, 128) — or equal to the respective overall array dims.  The CPU
interpreter does NOT enforce this, so a kernel can pass the whole CPU test
suite and still crash at TPU-lowering time (it happened twice: a 64-lane
packed-attention head block and a 1-sublane LayerNorm partial).  Calling
`check_block` at spec-construction time makes the constraint fail loudly on
every backend.
"""

from __future__ import annotations

from typing import Sequence

_SUBLANE_DIV = 8
_LANE_DIV = 128


def check_block(block: Sequence[int], shape: Sequence[int], what: str = ""):
    """Raise if (block, array shape) would be rejected by the Mosaic TPU
    lowering.  block/shape: full-rank block and array shapes."""
    if len(block) != len(shape):
        raise ValueError(f"{what}: block rank {block} != array rank {shape}")
    if len(block) >= 2:
        bs, ss = block[-2], shape[-2]
        if bs % _SUBLANE_DIV and bs != ss:
            raise ValueError(
                f"{what}: sublane block dim {bs} is not a multiple of "
                f"{_SUBLANE_DIV} nor the full array dim {ss} "
                f"(block {tuple(block)}, array {tuple(shape)})")
    if len(block) >= 1:
        bl, sl = block[-1], shape[-1]
        if bl % _LANE_DIV and bl != sl:
            raise ValueError(
                f"{what}: lane block dim {bl} is not a multiple of "
                f"{_LANE_DIV} nor the full array dim {sl} "
                f"(block {tuple(block)}, array {tuple(shape)})")
